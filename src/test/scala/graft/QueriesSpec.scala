package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sanity checks for the operator-demo queries; exact value parity against
  * DuckDB is the driver's gate — here we check shape, determinism, and a
  * few independently-computed values via spark.sql on the same data. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("every registered query runs and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has matching column names in its oracle (if present)") {
    // light check: oracle mentions each output column name
    SparkEntry.queries.foreach { case (name, fn) =>
      SparkEntry.oracleSql.get(name).foreach { sql =>
        val cols = fn(spark, sf).columns
        cols.foreach(c => assert(sql.toLowerCase.contains(c.toLowerCase),
          s"$name: column $c not named in oracle SQL"))
      }
    }
  }

  test("queries are deterministic across runs") {
    val name = "q1_pricing_summary"
    val a = SparkEntry.queries(name)(spark, sf).orderBy("l_returnflag", "l_linestatus").collect()
    val b = SparkEntry.queries(name)(spark, sf).orderBy("l_returnflag", "l_linestatus").collect()
    assert(a.sameElements(b))
  }

  test("q1 sums match a SQL recomputation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    li.createOrReplaceTempView("lineitem_t")
    val want = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem_t GROUP BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val got = SparkEntry.queries("q1_pricing_summary")(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == want)
  }

  test("q4 latest event agrees with a window recomputation") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    val want = ev.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q4_latest_event_per_user")(spark, sf)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("entry returns final CDC state with sha column") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("content_sha256"))
  }
}
