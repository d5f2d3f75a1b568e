package graft

import graft.gen.{ChangeGen, GenConfig}
import graft.ingest.BatchReplay
import graft.lake.{LakeTable, Maintenance}
import graft.merge.MergeInto
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSourceV2 surface: `spark.read.format("graft")` with time travel,
  * SQL temp views, manifest-level bucket/stats pruning, and the
  * tolerant-reader schema-evolution rule. */
class Dsv2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def build(): LakeTable = {
    val cfg = GenConfig(nEvents = 1200L)
    val work = TestSpark.tmpDir("dsv2")
    ChangeGen.writeLog(spark, cfg, s"$work/log", nBatches = 2, partitions = 2)
    val table = new LakeTable(spark, s"$work/table")
    BatchReplay.replay(spark, s"$work/log", table, numBuckets = 4, saltBuckets = 2,
      recordMeta = false)
    table
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("repo", "path").collect().map(_.toString).toSeq

  test("format(\"graft\") reads the current visible state identically to table.read()") {
    val table = build()
    val viaApi = spark.read.format("graft").load(table.root)
    assert(viaApi.schema == table.read().schema)
    assert(canon(viaApi) == canon(table.read()))
  }

  test("versionAsOf time travel matches readVersion") {
    val table = build()
    val v = table.currentSnapshot().get.version
    (0L to v).foreach { ver =>
      val viaApi = spark.read.format("graft").option("versionAsOf", ver).load(table.root)
      assert(canon(viaApi) == canon(table.readVersion(ver)), s"version $ver")
    }
  }

  test("SQL temp view over the source, with pruned columns") {
    val table = build()
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_t USING graft OPTIONS (path '${table.root}')")
    val got = spark.sql("SELECT repo, count(*) AS n FROM graft_t GROUP BY repo ORDER BY repo")
      .collect().map(_.toString).toSeq
    val want = table.read().groupBy("repo").agg(count(lit(1)).as("n")).orderBy("repo")
      .collect().map(_.toString).toSeq
    assert(got == want && got.nonEmpty)
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val desc = df.queryExecution.executedPlan.toString
    val m = "files=(\\d+)".r.findFirstMatchIn(desc)
    assert(m.isDefined, s"scan description missing file count: $desc")
    m.get.group(1).toInt
  }

  test("repo equality prunes to one bucket's files; lsn bound prunes by stats") {
    val table = build()
    val total = plannedFiles(spark.read.format("graft").load(table.root))
    val repo = table.read().select("repo").limit(1).collect().head.getString(0)
    val df = spark.read.format("graft").load(table.root).where(col("repo") === repo)
    assert(plannedFiles(df) < total, s"no bucket pruning: ${plannedFiles(df)}/$total")
    assert(canon(df) == canon(table.read().where(col("repo") === repo)))

    // lsn lower bound above the high-water mark prunes EVERY file
    val hw = table.currentSnapshot().get.highWaterLsn.get
    val none = spark.read.format("graft").load(table.root).where(col("lsn") > hw)
    assert(plannedFiles(none) == 0, "stats pruning failed")
    assert(none.count() == 0)

    // and a bound below keeps correctness (residual filter re-applied)
    val mid = table.read().agg(expr("percentile_approx(lsn, 0.5)")).collect().head.getLong(0)
    val some = spark.read.format("graft").load(table.root).where(col("lsn") > mid)
    assert(canon(some) == canon(table.read().where(col("lsn") > mid)))
  }

  test("schema evolution: old files read through DSv2 with nulls for new columns") {
    import spark.implicits._
    val table = build()
    val merge = new MergeInto(table, numBuckets = 4, saltBuckets = 2, recordMeta = false)
    val ts = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val v2 = Seq((5555555L, "U", ts, "solo/repo", "src/n.txt", "c9", "text", "body", "MIT"))
      .toDF("lsn", "op", "ts", "repo", "path", "commit", "lang", "content", "license")
    merge.apply(v2, 777L)
    val viaApi = spark.read.format("graft").load(table.root)
    assert(viaApi.schema.fieldNames.contains("license"))
    assert(canon(viaApi) == canon(table.read()))
    val lic = viaApi.where(col("repo") === "solo/repo").select("license")
      .collect().map(_.getString(0)).toSeq
    assert(lic == Seq("MIT"))
    assert(viaApi.where(col("license").isNull).count() == table.read().count() - 1)
  }

  test("tombstones are invisible through DSv2 (delete then read)") {
    import spark.implicits._
    val table = build()
    val merge = new MergeInto(table, numBuckets = 4, saltBuckets = 2, recordMeta = false)
    val victim = table.read().select("repo", "path").limit(1).collect().head
    val ts = java.sql.Timestamp.valueOf("2024-03-02 00:00:00")
    val del = Seq((6666666L, "D", ts, victim.getString(0), victim.getString(1), "cX", "text", ""))
      .toDF("lsn", "op", "ts", "repo", "path", "commit", "lang", "content")
    merge.apply(del, 778L)
    val viaApi = spark.read.format("graft").load(table.root)
    assert(viaApi.where(col("repo") === victim.getString(0) &&
      col("path") === victim.getString(1)).count() == 0)
    assert(canon(viaApi) == canon(table.read()))
  }

  test("compaction + stats keep DSv2 lsn-pruned reads empty of data IO") {
    val table = build()
    assert(Maintenance.compact(table, maxFilesPerBucket = 1) > 0)
    val hw = table.currentSnapshot().get.highWaterLsn.get
    val none = spark.read.format("graft").load(table.root).where(col("lsn") > hw)
    assert(plannedFiles(none) == 0)
  }
}
