package graft

import graft.lake.LakeTable
import graft.merge.MergeInto
import graft.schema.SchemaRegistry
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen => SGen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level fuzz of the WAL-tail parse → quarantine path (the reference
  * fuzzes its line parser for the same never-abort/never-corrupt
  * invariant: fuzz/fuzz_targets/fuzz_import_atp.rs, hook
  * src/atp/mod.rs:495-510).
  *
  * A change log is a JSONL byte stream from an untrusted upstream;
  * arbitrary lines — truncated records, wrong field types, binary junk,
  * non-object JSON — must never abort the replay and never corrupt state.
  * The engine contract under fuzz:
  *   1. `BatchReplay.replay` / `StreamingReplay.run` complete without
  *      throwing on ANY byte input;
  *   2. final state == the LWW fold of exactly the rows that parse with
  *      valid keys (computed independently, row-at-a-time in Scala);
  *   3. every parsed row with a broken key (null lsn/repo/path, op outside
  *      {I,U,D}) is counted and quarantined, none applied;
  *   4. quarantined rows are REPLAYABLE: after upstream repair they merge
  *      as ordinary events.
  */
class FuzzReplaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic scalacheck sampling (same pattern as PropertySpec: no
    * scalatestplus bridge offline). */
  private def forSamples[T](gen: SGen[T], n: Int, seed0: Long)(check: (T, Int) => Unit): Unit =
    (1 to n).foreach { i =>
      check(gen.pureApply(SGen.Parameters.default, Seed(seed0 + i)), i)
    }

  // ----- line generators --------------------------------------------------

  private def validLine(lsn: Long, repo: String, path: String, op: String,
                        content: String): String =
    s"""{"lsn":$lsn,"op":"$op","ts":"2024-01-01T00:00:${lsn % 50 + 10}.000Z",""" +
      s""""repo":"$repo","path":"$path","commit":"c$lsn","lang":"x","content":"$content"}"""

  private val genValid: SGen[Long => Array[Byte]] = for {
    repo <- SGen.oneOf("r1", "r2", "hot/repo")
    path <- SGen.oneOf("a.txt", "b/c.scala", "d")
    op <- SGen.frequency(5 -> SGen.const("U"), 2 -> SGen.const("I"), 1 -> SGen.const("D"))
    content <- SGen.alphaNumStr.map(_.take(16))
  } yield (lsn: Long) =>
    validLine(lsn, repo, path, op, content).getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private val genPoison: SGen[Long => Array[Byte]] = SGen.oneOf[Long => Array[Byte]](
    // truncated record: any proper prefix of a valid line
    for {
      f <- genValid
      cutFrac <- SGen.choose(0.05, 0.95)
    } yield (lsn: Long) => {
      val b = f(lsn)
      b.take(math.max(1, (b.length * cutFrac).toInt))
    },
    // wrong types on key fields
    SGen.oneOf(
      """{"lsn":"not a number","op":"U","ts":"2024-01-01T00:00:10.000Z","repo":"r1","path":"p","commit":"c","lang":"x","content":"y"}""",
      """{"lsn":{"nested":1},"op":"U","ts":"x","repo":"r1","path":"p","commit":"c","lang":"x","content":"y"}""",
      """{"lsn":1,"op":7,"ts":"2024-01-01T00:00:10.000Z","repo":["arr"],"path":"p","commit":"c","lang":"x","content":"y"}"""
    ).map(s => (_: Long) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
    // explicit null keys / missing keys / op outside {I,U,D}
    SGen.oneOf(
      """{"lsn":null,"op":"U","ts":"2024-01-01T00:00:10.000Z","repo":"r1","path":"p","commit":"c","lang":"x"}""",
      """{"op":"U","commit":"c"}""",
      """{"lsn":3,"op":"X","ts":"2024-01-01T00:00:10.000Z","repo":"r1","path":"p","commit":"c","lang":"x","content":"y"}"""
    ).map(s => (_: Long) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
    // valid JSON, wrong shape (non-object / wrong nesting)
    SGen.oneOf("[1,2,3]", "42", "\"just a string\"", "{}", "{\"a\":{\"b\":[]}}")
      .map(s => (_: Long) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
    // printable junk (never blank: blank lines are skipped by the reader,
    // which is fine in production but would make the sample vacuous)
    SGen.nonEmptyListOf(SGen.asciiPrintableChar).map(_.mkString.trim + "#")
      .map(s => (_: Long) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
    // binary junk: arbitrary bytes, newlines excluded so the line count is
    // what the generator says (a newline would just split into more junk)
    SGen.nonEmptyListOf(SGen.choose(0, 255).map(_.toByte))
      .map(bs => (_: Long) => bs.filterNot(b => b == '\n' || b == '\r').toArray match {
        case e if e.isEmpty => Array[Byte]('x')
        case ok => ok
      })
  )

  /** A fuzz log: interleaved valid and poison lines; lsn = global index so
    * valid events are distinct-lsn by construction. */
  private val genLog: SGen[List[Array[Byte]]] = for {
    n <- SGen.choose(20, 80)
    mks <- SGen.listOfN(n, SGen.frequency(3 -> genValid, 2 -> genPoison))
  } yield mks.zipWithIndex.map { case (mk, i) => mk(i.toLong + 1) }

  private def writeLog(lines: Seq[Array[Byte]], dir: String): Unit = {
    val d = new java.io.File(s"$dir/batch-00000")
    assert(d.mkdirs())
    val out = new java.io.FileOutputStream(new java.io.File(d, "part-0.json"))
    try lines.foreach { l => out.write(l); out.write('\n') } finally out.close()
  }

  /** The rows Spark's JSON reader actually yields for this log (whatever
    * Jackson makes of the junk — the engine contract is defined over the
    * PARSED rows), split by the merge's key-validity rule. */
  private def parsed(dir: String): (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = {
    val rows = spark.read.schema(SchemaRegistry.eventSchemaV1)
      .json(s"$dir/batch-00000").collect().toSeq
    rows.partition { r =>
      !r.isNullAt(r.fieldIndex("lsn")) && !r.isNullAt(r.fieldIndex("repo")) &&
        !r.isNullAt(r.fieldIndex("path")) &&
        !r.isNullAt(r.fieldIndex("op")) &&
        Set("I", "U", "D")(r.getString(r.fieldIndex("op")))
    }
  }

  /** Independent LWW fold of the valid rows: per (repo, path) the max-lsn
    * row wins; a D winner is absent from visible state. */
  private def lwwFold(good: Seq[org.apache.spark.sql.Row]): Map[(String, String), (Long, String)] =
    good.groupBy(r => (r.getString(3), r.getString(4)))
      .view.mapValues { rs =>
        val w = rs.maxBy(_.getLong(0))
        (w.getLong(0), w.getString(1))
      }.toMap.filter { case (_, (_, op)) => op != "D" }

  test("fuzzed JSONL batches never abort, never corrupt, quarantine exactly the bad rows") {
    forSamples(genLog, 6, 41000L) { (lines, i) =>
      val work = TestSpark.tmpDir(s"fuzz$i")
      writeLog(lines, s"$work/log")
      val (good, bad) = parsed(s"$work/log")
      val table = new LakeTable(spark, s"$work/table")
      // must not throw, whatever the bytes were
      val stats = ingest.BatchReplay.replay(spark, s"$work/log", table,
        numBuckets = 4, saltBuckets = 2, recordMeta = true, format = "json")
      assert(stats.map(_.eventsQuarantined).sum == bad.size.toLong,
        s"sample $i: quarantined ${stats.map(_.eventsQuarantined).sum} != parsed-bad ${bad.size}")
      assert(stats.map(_.eventsIn).sum == (good.size + bad.size).toLong)

      // state == independent LWW fold of exactly the valid rows
      val want = lwwFold(good)
      val gotRows =
        if (table.currentSnapshot().isEmpty) Seq.empty
        else table.read().select("repo", "path", "lsn").collect().toSeq
      val got = gotRows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want.view.mapValues(_._1).toMap, s"sample $i state diverged")

      // quarantined rows persisted (when any), schema-tolerant JSONL
      if (bad.nonEmpty) {
        val q = spark.read.json(s"${table.root}/meta/quarantine")
        assert(q.count() == bad.size.toLong)
        assert(q.columns.contains("_epoch"))
        // replayable after upstream repair: give every quarantined row
        // fresh valid keys and merge — ordinary epoch, no abort
        val before = table.read().count()
        val repaired = q.drop("_epoch")
          .withColumn("lsn", lit(900000L) + monotonically_increasing_id())
          .withColumn("op", lit("U"))
          .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
          .withColumn("repo", lit("repaired"))
          .withColumn("path", concat(lit("q/"), monotonically_increasing_id().cast("string")))
        val merge = new MergeInto(table, numBuckets = 4, saltBuckets = 2, recordMeta = false)
        val st = merge.apply(repaired, 999000L + i)
        assert(st.eventsQuarantined == 0L)
        assert(table.read().count() == before + bad.size)
      }
    }
  }

  test("fuzzed JSONL through the STREAMING replay: never aborts, same final state") {
    forSamples(genLog, 2, 42000L) { (lines, i) =>
      val work = TestSpark.tmpDir(s"fuzzs$i")
      writeLog(lines, s"$work/log")
      val (good, _) = parsed(s"$work/log")
      val table = new LakeTable(spark, s"$work/table")
      // Bounded run: an Observation registered on the micro-batch df (the
      // stream's CLONED session) only completes via an action on that same
      // session — a merge change that moves the completing action to the
      // outer session deadlocks awaitTermination forever (caught live:
      // the fresh-table fast path removed the touched-bucket scan, the
      // one cloned-session action). Fail loudly instead of hanging CI.
      val runner = new Thread(() =>
        ingest.StreamingReplay.run(spark, s"$work/log", table,
          schema = SchemaRegistry.eventSchemaV1,
          checkpoint = s"$work/cp", numBuckets = 4, saltBuckets = 2,
          recordMeta = true, format = "json"))
      val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      runner.setDaemon(true)
      runner.setUncaughtExceptionHandler((_, e) => failed.set(e))
      runner.start()
      runner.join(300000L)
      if (failed.get() != null) throw failed.get()
      assert(!runner.isAlive,
        "streaming replay did not terminate within 5 minutes — likely a " +
          "cross-session Observation deadlock (see MergeInto union-order note)")
      val want = lwwFold(good).view.mapValues(_._1).toMap
      val got =
        if (table.currentSnapshot().isEmpty) Map.empty[(String, String), Long]
        else table.read().select("repo", "path", "lsn").collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want, s"streaming sample $i state diverged")
    }
  }
}
