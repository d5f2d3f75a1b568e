package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom streaming state (flatMapGroupsWithState sessionization) against
  * the batch window-lag reference implementation. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  // file streams read directories: stage the driver's single parquet file
  lazy val events: String = {
    val dir = TestSpark.tmpDir("sess-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }
  val gap = "1 hour"

  test("streamed sessions equal batch sessions for all watermark-sealedSess sessions") {
    val work = TestSpark.tmpDir("sessionize")
    Sessionize.run(spark, events, s"$work/out", s"$work/cp", gap = gap)
    val streamed = spark.read.parquet(s"$work/out")
      .select("user_id", "session_start_ms", "session_end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(streamed.nonEmpty)

    val batch = Sessionize.batchSessions(spark, events, gap)
    val maxTs = batch.agg(max("session_end_ms")).collect().head.getLong(0)
    val gapMs = 3600000L
    val sealedSess = batch
      .where(col("session_end_ms") + gapMs <= maxTs)
      .select("user_id", "session_start_ms", "session_end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    // every watermark-sealedSess session must be streamed exactly; streamed
    // output may not contain anything else except possibly trailing
    // sessions the final no-data batch managed to seal
    assert(sealedSess subsetOf streamed,
      s"missing ${(sealedSess diff streamed).size} of ${sealedSess.size} sealedSess sessions")
    val batchAll = batch
      .select("user_id", "session_start_ms", "session_end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(streamed subsetOf batchAll, "streamed emitted a session batch mode doesn't have")
  }

  test("streaming windowed metrics: sealed windows equal the batch aggregation") {
    import graft.streaming.WindowedMetrics
    val work = TestSpark.tmpDir("winmetrics")
    WindowedMetrics.run(spark, events, s"$work/out", s"$work/cp",
      window = "1 hour", watermark = "30 minutes")
    val streamed = spark.read.parquet(s"$work/out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty)
    val all = WindowedMetrics.batch(spark, events)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // append-mode emits only watermark-sealed windows: a subset of batch,
    // and every sealed window value must be exact
    assert(streamed subsetOf all, "streamed window disagrees with batch value")
    val maxStart = all.map(_._1).max
    val surelySealed = all.filter(_._1 < maxStart - 2 * 3600)
    assert(surelySealed subsetOf streamed,
      s"missing ${(surelySealed diff streamed).size} sealed windows")
  }

  test("out-of-order file arrival: a widened watermark keeps sealed sessions exact") {
    import spark.implicits._
    // two files whose MTIME order inverts their EVENT-TIME order: file B
    // (written second → later trigger at maxFilesPerTrigger=1) holds
    // events 3 minutes OLDER than file A's maximum. With the default
    // 0-second watermark the stateful operator would drop them; a
    // watermark >= the disorder keeps them, and the stream equals the
    // batch oracle on every sealed session.
    val work = TestSpark.tmpDir("sess-ooo")
    val evDir = s"$work/events"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(evDir))
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val base = 1735689600000L
    // the file stream reads a flat directory of parquet FILES: stage each
    // single-part write as one file (mirrors the suite's events fixture)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$work/tmp-$name"
      df.repartition(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(evDir, name)): Unit
    }
    // user 1: one session whose middle events live in the late file
    stage(Seq((1L, ts(base)), (1L, ts(base + 10 * 60000L)), (2L, ts(base)),
        (2L, ts(base + 4 * 3600000L))) // user 2's far-future event seals everything
      .toDF("user_id", "ts"), "a.parquet")
    Thread.sleep(1100) // distinct mtime second → stable trigger order
    stage(Seq((1L, ts(base + 7 * 60000L)), (1L, ts(base + 8 * 60000L)))
      .toDF("user_id", "ts"), "b.parquet")
    Sessionize.run(spark, evDir, s"$work/out", s"$work/cp", gap = "15 minutes",
      maxFilesPerTrigger = 1, watermark = "10 minutes")
    val streamed = spark.read.parquet(s"$work/out")
      .select("user_id", "session_start_ms", "session_end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val batch = Sessionize.batchSessions(spark, evDir, "15 minutes")
      .select("user_id", "session_start_ms", "session_end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // user 1's single 4-event session (the late events bridge the gap)
    // must be sealed and exact — losing the late file would split it
    val u1 = batch.filter(_._1 == 1L)
    assert(u1.size == 1 && u1.head._4 == 4, s"oracle premise: $batch")
    assert(u1 subsetOf streamed, s"streamed=$streamed batch=$batch")
  }

  test("sessionization is deterministic across runs") {
    val w1 = TestSpark.tmpDir("sess-d1")
    val w2 = TestSpark.tmpDir("sess-d2")
    Sessionize.run(spark, events, s"$w1/out", s"$w1/cp", gap = gap)
    Sessionize.run(spark, events, s"$w2/out", s"$w2/cp", gap = gap)
    val a = spark.read.parquet(s"$w1/out").collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(s"$w2/out").collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
