package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` exercises the full CDC engine end-to-end: deterministic change
  * log → lake table → bucketed MERGE replay → final state with the
  * sha256(content) invariant column.
  *
  * `queries`/`oracleSql` expose the operator inventory (SURVEY.md §2 plus
  * the training-data-pipeline operators) over the driver's TPC-H-ish
  * parquet tables, each with a DuckDB-equivalent oracle.
  */
object SparkEntry {

  /** Flagship: replay a seeded change log through the lake + MERGE engine
    * and return the final visible state (rows > 0 smoke-checked). */
  def entry(spark: SparkSession): DataFrame = {
    import graft.gen.{ChangeGen, GenConfig}
    import graft.lake.LakeTable
    val work = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val cfg = GenConfig(nEvents = 2000L)
    ChangeGen.writeLog(spark, cfg, s"$work/log", nBatches = 4, partitions = 4)
    val table = new LakeTable(spark, s"$work/table")
    ingest.BatchReplay.replay(spark, s"$work/log", table,
      numBuckets = 8, saltBuckets = 2, recordMeta = false)
    table.read().withColumn("content_sha256", sha2(col("content"), 256))
  }

  /** One entry per implemented operator; (session, sfDir) => result. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Queries.all

  /** DuckDB-runnable oracle SQL per query key (same column names!). */
  def oracleSql: Map[String, String] =
    ops.Queries.oracles
}
