package graft

import graft.gen.{ChangeGen, GenConfig}
import graft.ingest.StreamingReplay
import graft.lake.LakeTable
import graft.schema.SchemaRegistry
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming replay: watermark + lsn dedup + foreachBatch MERGE,
  * exactly-once across restarts from checkpoint. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def stateOf(table: LakeTable): Map[(String, String), Long] =
    table.read().select("repo", "path", "lsn").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private def expectedOf(cfg: GenConfig): Map[(String, String), Long] =
    ChangeGen.expectedState(cfg).map { case (k, e) => k -> e.lsn }

  test("streaming replay (AvailableNow) matches the independent fold") {
    val cfg = GenConfig(nEvents = 1200L)
    val work = TestSpark.tmpDir("stream")
    ChangeGen.writeLog(spark, cfg, s"$work/log", nBatches = 4, partitions = 2)
    val table = new LakeTable(spark, s"$work/table")
    StreamingReplay.run(spark, s"$work/log", table,
      SchemaRegistry.eventSchemaV1, s"$work/cp",
      numBuckets = 4, recordMeta = false, maxFilesPerTrigger = 3)
    assert(stateOf(table) == expectedOf(cfg))
  }

  test("streaming resume: stop mid-log, restart from checkpoint, same state") {
    val cfg = GenConfig(nEvents = 1500L)
    val work = TestSpark.tmpDir("stream-resume")
    val fullLog = s"$work/log"
    // phase 1: only the first half of the log exists
    val firstHalf = GenConfig(seed = cfg.seed, nEvents = 750L,
      nRepos = cfg.nRepos, pathsPerRepo = cfg.pathsPerRepo)
    ChangeGen.writeLog(spark, firstHalf, fullLog, nBatches = 3, partitions = 2)
    val table = new LakeTable(spark, s"$work/table")
    StreamingReplay.run(spark, fullLog, table,
      SchemaRegistry.eventSchemaV1, s"$work/cp",
      numBuckets = 4, recordMeta = false, maxFilesPerTrigger = 2)
    val midState = stateOf(table)
    assert(midState.nonEmpty)

    // phase 2: the remaining events arrive as new batch dirs; same checkpoint
    import spark.implicits._
    spark.range(750L, 1500L, 1L, 2)
      .flatMap(id => ChangeGen.emittedFor(cfg, id))
      .write.mode("overwrite").parquet(s"$fullLog/batch-00099")
    StreamingReplay.run(spark, fullLog, table,
      SchemaRegistry.eventSchemaV1, s"$work/cp",
      numBuckets = 4, recordMeta = false, maxFilesPerTrigger = 2)
    assert(stateOf(table) == expectedOf(cfg))
  }
}
