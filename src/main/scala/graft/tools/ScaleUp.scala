package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of the sf0.1 test tables → an "sf1" set,
  * used to evidence query-suite headroom beyond sf0.1 (VERDICT r3 next-10).
  * Replica k of a fact row shifts every key by k·(max key + 1), so joins
  * and group cardinalities scale linearly and referential integrity holds
  * within each replica. Content columns are perturbed per replica so the
  * DEDUP/ANN structure scales linearly too, instead of every original row
  * gaining 9 artificial near-duplicates:
  *  - documents.text: every whitespace token gets a `~k` suffix (k > 0),
  *    so replicas share no word n-grams/shingles with each other;
  *    n_chars is recomputed from the perturbed text.
  *  - embeddings.embedding: cyclic dimension shift by k — within a
  *    replica all pairwise cosines are EXACTLY preserved (the near-dup /
  *    ANN structure), across replicas vectors decorrelate.
  * Dimension tables (nation, region) stay fixed, as at any TPC-H scale.
  */
object ScaleUp {
  val Replicas = 10

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/dev/shm/graft-sf1"
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.BenchCdc.rm(dst)

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String, parts: Int): Unit =
      // repartition, NOT coalesce: coalesce(8) would collapse the whole
      // 10x replicate+transform pipeline into 8 tasks (24 idle cores);
      // the extra shuffle buys full parallelism for the expensive part
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1
    def shifted(df: DataFrame, shifts: Map[String, Long], k: Int)(extra: DataFrame => DataFrame): DataFrame = {
      val s = shifts.foldLeft(df) { case (d, (c, m)) =>
        d.withColumn(c, col(c) + lit(k * m))
      }
      extra(s).select(df.columns.map(col).toSeq: _*)
    }
    def replicate(df: DataFrame, shifts: Map[String, Long])
                 (extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until Replicas).map(k => shifted(df, shifts, k)(d => extra(d, k)))
        .reduce(_ unionByName _)

    // dimensions: fixed
    wr(rd("nation"), "nation", 1)
    wr(rd("region"), "region", 1)

    val docs = rd("documents")
    val dMax = maxOf(docs, "doc_id")
    wr(replicate(docs, Map("doc_id" -> dMax)) { (d, k) =>
      if (k == 0) d
      else d
        // the EXACT wsTokens class ([ \t\n\f\r]+ — \s would also split
        // \x0B, which wsTokens does not), so replica token/shingle counts
        // track replica 0's. NB the rebuild joins with single spaces:
        // whitespace RUNS are normalized, so two docs differing only in
        // runs would collapse to exact dups in replicas k>0 — the sf0.1
        // corpus is single-space throughout, so no pair structure changes
        .withColumn("text", array_join(
          transform(split(trim(col("text")), "[ \t\n\f\r]+"),
            t => concat(t, lit(s"~$k"))), " "))
        .withColumn("n_chars", length(col("text")))
    }, "documents", 8)

    val emb = rd("embeddings")
    val vMax = maxOf(emb, "vec_id")
    wr(replicate(emb, Map("vec_id" -> vMax)) { (d, k) =>
      if (k == 0) d
      else d.withColumn("embedding", concat(
        slice(col("embedding"), lit(k + 1), size(col("embedding")) - lit(k)),
        slice(col("embedding"), lit(1), lit(k))))
    }, "embeddings", 8)

    val events = rd("events")
    wr(replicate(events, Map(
      "event_id" -> maxOf(events, "event_id"),
      "user_id" -> maxOf(events, "user_id")))(), "events", 8)

    val orders = rd("orders")
    val cust = rd("customer")
    val part = rd("part")
    val supp = rd("supplier")
    val li = rd("lineitem")
    val (oMax, cMax, pMax, sMax) = (maxOf(orders, "o_orderkey"),
      maxOf(cust, "c_custkey"), maxOf(part, "p_partkey"), maxOf(supp, "s_suppkey"))
    wr(replicate(cust, Map("c_custkey" -> cMax))(), "customer", 2)
    wr(replicate(part, Map("p_partkey" -> pMax))(), "part", 2)
    wr(replicate(supp, Map("s_suppkey" -> sMax))(), "supplier", 1)
    wr(replicate(orders, Map("o_orderkey" -> oMax, "o_custkey" -> cMax))(), "orders", 8)
    wr(replicate(li, Map("l_orderkey" -> oMax, "l_partkey" -> pMax,
      "l_suppkey" -> sMax))(), "lineitem", 16)

    Seq("documents", "embeddings", "events", "lineitem", "orders").foreach { t =>
      println(s"SCALEUP $t rows=" + spark.read.parquet(s"$dst/$t.parquet").count())
    }
    spark.stop()
  }
}
