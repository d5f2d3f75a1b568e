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

  test("beyond-watermark straggler: counted (not silent), healed by idempotent batch replay") {
    import spark.implicits._
    val cfg = GenConfig(nEvents = 900L)
    val work = TestSpark.tmpDir("straggler")
    ChangeGen.writeLog(spark, cfg, s"$work/log", nBatches = 2, partitions = 2)
    // a genuinely-late segment lands AFTER the log (later mtime → later
    // trigger): its event time predates everything by an hour, far past
    // the 10-minute watermark
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    Seq((9999999L, "I", ts(1735689600000L - 3600L * 1000), "org-99/straggler",
        "late.txt", "a" * 40, "scala", "late body"))
      .toDF("lsn", "op", "ts", "repo", "path", "commit", "lang", "content")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$work/log/batch-00002")
    val table = new LakeTable(spark, s"$work/table")
    StreamingReplay.run(spark, s"$work/log", table,
      SchemaRegistry.eventSchemaV1, s"$work/cp",
      numBuckets = 4, recordMeta = true, maxFilesPerTrigger = 1,
      watermark = "10 minutes")
    // the stream survived, but the stateful dedup dropped the straggler
    // before the merge — and said so in the metrics
    val st1 = stateOf(table)
    assert(!st1.contains(("org-99/straggler", "late.txt")),
      "test premise: the straggler must be beyond the watermark")
    val m = spark.read.parquet(s"${table.root}/meta/stream_metrics")
    assert(m.columns.contains("generation"))
    val lateSum = m.agg(org.apache.spark.sql.functions.sum("late_beyond_watermark"))
      .collect().head.getLong(0)
    assert(lateSum >= 1L, s"watermark drop must be observable, got $lateSum")
    // recovery: batch replay has no watermark and is idempotent over the
    // already-applied events (lsn argmax) — one pass heals the state
    graft.ingest.BatchReplay.replay(spark, s"$work/log", table,
      numBuckets = 4, saltBuckets = 2, recordMeta = false)
    val st2 = stateOf(table)
    assert(st2(("org-99/straggler", "late.txt")) == 9999999L)
    // every previously-applied key is untouched by the re-application
    st1.foreach { case (k, lsn) => assert(st2(k) == lsn, s"$k changed") }
  }

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

  test("schema evolution through the streaming path: v2 stream restarts onto an evolved table") {
    import spark.implicits._
    // generation 1: a v1 stream replays to completion
    val cfg = GenConfig(nEvents = 600L)
    val work = TestSpark.tmpDir("stream-evo")
    ChangeGen.writeLog(spark, cfg, s"$work/log1", nBatches = 2, partitions = 2)
    val table = new LakeTable(spark, s"$work/table")
    StreamingReplay.run(spark, s"$work/log1", table,
      SchemaRegistry.eventSchemaV1, s"$work/cp1",
      numBuckets = 4, recordMeta = false)
    val gen1 = stateOf(table)
    assert(gen1 == expectedOf(cfg) && table.currentSnapshot().get.schemaVersion == 1)

    // generation 2: the producer upgrades to schema v2 (adds `branch`);
    // the realistic pattern is a NEW stream run with the evolved read
    // schema (a file stream's schema is fixed per run) — the MERGE's
    // registry evolves the table on first contact, old rows read as null
    def ts(s: Long) = new java.sql.Timestamp(1767225600000L + s * 1000)
    Seq(
      (5000001L, "U", ts(1), "evo/repo", "a.txt", "e" * 40, "scala", "v2 body", "main"),
      (5000002L, "I", ts(2), "evo/repo", "b.txt", "f" * 40, "scala", "v2 new", "dev"))
      .toDF("lsn", "op", "ts", "repo", "path", "commit", "lang", "content", "branch")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$work/log2/batch-00000")
    StreamingReplay.run(spark, s"$work/log2", table,
      SchemaRegistry.eventSchemaV2, s"$work/cp2",
      numBuckets = 4, recordMeta = false)

    val snap = table.currentSnapshot().get
    assert(snap.schemaVersion == 2 && snap.schema.fieldNames.contains("branch"))
    val rows = table.read()
    assert(rows.where($"repo" === "evo/repo" && $"branch" === "main").count() == 1)
    // every generation-1 key survives with a null branch
    assert(rows.where($"branch".isNull).count() == gen1.size)
    assert(stateOf(table).size == gen1.size + 2)
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
