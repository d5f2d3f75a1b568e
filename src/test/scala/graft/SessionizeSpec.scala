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

  test("out-of-order file arrival: watermark >= disorder reproduces the oracle; smaller truncates visibly") {
    import spark.implicits._
    // The event-time-timeout operator DROPS late input (Sessionize.run
    // scaladoc) — against a watermark that lags ONE batch beyond the
    // advance, so the late file must arrive two-plus batches after the
    // watermark driver for the filter to see it. Staging
    // (maxFilesPerTrigger=1, mtime-ordered):
    //   b0 a.parquet  user1 base, base+10m; user2 base+30m (wm driver)
    //   b1 b.parquet  user3 base+40m (one full batch between driver and
    //                 late file → the filter lag is consumed)
    //   b2 c.parquet  user1 base+7m, base+8m — the LATE file, 33 min of
    //                 disorder vs b1's max
    //   b3 d.parquet  user2 base+2h (final wm push so everything seals)
    // With watermark 40m (> disorder) c's rows survive, merge into the
    // still-open session → ONE 4-event session equal to the batch
    // oracle. With 0s the filter drops c's rows → user1's session is
    // silently TRUNCATED to its b0 events — the bounded-state trade the
    // scaladoc documents, both sides on the same files.
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val base = 1735689600000L
    val work = TestSpark.tmpDir("sess-ooo")
    val evDir = s"$work/events"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(evDir))
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
    val m = 60000L
    stage(Seq((1L, ts(base)), (1L, ts(base + 10 * m)), (2L, ts(base + 30 * m)))
      .toDF("user_id", "ts"), "a.parquet")
    Thread.sleep(1100) // distinct mtime second → stable trigger order
    stage(Seq((3L, ts(base + 40 * m))).toDF("user_id", "ts"), "b.parquet")
    Thread.sleep(1100)
    stage(Seq((1L, ts(base + 7 * m)), (1L, ts(base + 8 * m)))
      .toDF("user_id", "ts"), "c.parquet")
    Thread.sleep(1100)
    stage(Seq((2L, ts(base + 120 * m))).toDF("user_id", "ts"), "d.parquet")

    def u1(outDir: String): Set[(Long, Long, Int)] =
      spark.read.parquet(outDir)
        .where(col("user_id") === 1L)
        .select("session_start_ms", "session_end_ms", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // watermark >= disorder: exact batch oracle (one 4-event session)
    Sessionize.run(spark, evDir, s"$work/out-wide", s"$work/cp-wide",
      gap = "15 minutes", maxFilesPerTrigger = 1, watermark = "40 minutes")
    val oracle = Sessionize.batchSessions(spark, evDir, "15 minutes")
      .where(col("user_id") === 1L)
      .select("session_start_ms", "session_end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(oracle == Set((base, base + 10 * m, 4)), s"oracle premise: $oracle")
    assert(u1(s"$work/out-wide") == oracle,
      s"wide watermark must reproduce the oracle: ${u1(s"$work/out-wide")}")

    // watermark < disorder: the operator's late filter drops c's rows
    // and the session is truncated to its b0 events — deterministic and
    // detectable (the batch oracle over the same log disagrees)
    Sessionize.run(spark, evDir, s"$work/out-zero", s"$work/cp-zero",
      gap = "15 minutes", maxFilesPerTrigger = 1, watermark = "0 seconds")
    assert(u1(s"$work/out-zero") == Set((base, base + 10 * m, 2)),
      s"0s watermark must truncate deterministically: ${u1(s"$work/out-zero")}")
    assert(u1(s"$work/out-zero") != oracle,
      "the truncation must be visible against the batch oracle")
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
