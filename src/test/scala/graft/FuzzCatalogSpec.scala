package graft

import graft.gen.{ChangeGen, GenConfig}
import graft.ingest.BatchReplay
import graft.lake.LakeTable
import org.scalacheck.{Gen => SGen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz of the SQL/catalog surface — the OTHER untrusted-string inlets
  * beside the WAL parse path FuzzReplaySpec covers. DDL identifiers,
  * tag/branch names, and DSv2 read options all flow into PATH resolution
  * (the `..`-traversal class was caught by review twice), and numeric
  * options flow into version arithmetic. The invariant under fuzz is
  * REFUSAL, NOT CORRUPTION:
  *   1. junk never creates/steals artifacts outside the warehouse (a
  *      sibling sentinel dir stays empty through every attempt);
  *   2. a refused operation leaves the table byte-identical (same
  *      snapshot version, same tags, same visible rows);
  *   3. junk numeric options throw loudly rather than returning a
  *      plausible-but-wrong frame.
  */
class FuzzCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic scalacheck sampling (same pattern as FuzzReplaySpec:
    * no scalatestplus bridge offline). */
  private def forSamples[T](gen: SGen[T], n: Int, seed0: Long)(check: (T, Int) => Unit): Unit =
    (1 to n).foreach { i =>
      check(gen.pureApply(SGen.Parameters.default, Seed(seed0 + i)), i)
    }

  /** Identifier junk: traversal shapes, separators, spaces, empties,
    * control chars, unicode, and the occasional VALID name (the fuzz
    * must not only test the reject path). Backquoted SQL identifiers
    * cannot carry a backquote without escaping, so that char is left to
    * the direct-API tests. */
  private val genName: SGen[String] = SGen.oneOf(
    SGen.oneOf(".", "..", "../x", "..%2F..", "a/../../b", "x/../escape/t",
      "/abs/path", "a/b", "a\\b", "", " ", "a b", "a\tb", "a\nb",
      "名前", "emoji🙂", "a;b", "a'b", "$wh", "-", "a" * 300),
    SGen.alphaNumStr.map(s => if (s.isEmpty) "t0" else s.take(20)),
    SGen.oneOf("ok_name", "tag-1", "v1.2.3", "snapshot_2024"))

  private def fileCount(dir: java.io.File): Int = {
    def loop(f: java.io.File): Int =
      if (f.isDirectory) 1 + f.listFiles().map(loop).sum else 1
    if (dir.exists()) loop(dir) else -1
  }

  test("DDL identifiers: junk refuses or lands INSIDE the warehouse; traversal never escapes") {
    val base = TestSpark.tmpDir("fuzzddl")
    val wh = s"$base/wh"
    val escape = new java.io.File(s"$base/escape") // the traversal target
    new java.io.File(wh).mkdirs()
    spark.conf.set("spark.sql.catalog.graft_fz",
      classOf[graft.lake.dsv2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_fz.warehouse", wh)
    val whCanon = new java.io.File(wh).getCanonicalPath
    forSamples(genName, 60, 0xDD1L) { (name, i) =>
      val ok =
        try {
          spark.sql(s"CREATE TABLE graft_fz.db.`$name` (lsn BIGINT, repo STRING, " +
            "path STRING) TBLPROPERTIES ('buckets'='2')")
          true
        } catch { case _: Throwable => false }
      if (ok) {
        // accepted ⇒ the name was a legal single segment and the table
        // root is strictly inside the warehouse
        assert(LakeTable.validRefName(name), s"[$i] accepted junk identifier '$name'")
        val root = new java.io.File(s"$wh/db/$name").getCanonicalPath
        assert(root.startsWith(whCanon + java.io.File.separator), s"[$i] escaped: $root")
        spark.sql(s"DROP TABLE graft_fz.db.`$name`")
      }
      // refused or not: nothing may EVER materialize outside the warehouse
      assert(!escape.exists(), s"[$i] identifier '$name' escaped the warehouse")
    }
    // and the dedicated traversal shapes are all hard refusals
    Seq("..", "../t", "a/../..", ".").foreach { bad =>
      intercept[Exception](spark.sql(
        s"CREATE TABLE graft_fz.db.`$bad` (lsn BIGINT, repo STRING, path STRING)"))
      assert(!escape.exists())
    }
  }

  test("tag/branch names: junk refuses and the table is left byte-identical") {
    val work = TestSpark.tmpDir("fuzztag")
    ChangeGen.writeLog(spark, GenConfig(nEvents = 300L), s"$work/log", nBatches = 1, partitions = 2)
    val table = new LakeTable(spark, s"$work/table")
    BatchReplay.replay(spark, s"$work/log", table, numBuckets = 2, saltBuckets = 1,
      recordMeta = false)
    val rootDir = new java.io.File(table.root)
    val sibling = new java.io.File(s"$work/sibling")
    // materialize the (empty) refs/branches parent dirs first: they
    // legitimately persist after a create+drop cycle, and the byte-
    // identity check below must not confound that residue with junk
    table.createTag("warm", table.currentSnapshot().get.version)
    table.dropTag("warm")
    table.createBranch("warmb", table.currentSnapshot().get.version)
    table.dropBranch("warmb")
    val before = (table.currentSnapshot().get.version, table.listTags().toSet,
      table.listBranches().toSet, fileCount(rootDir))
    forSamples(genName, 60, 0x7A6L) { (name, i) =>
      def attempt(f: => Unit): Boolean =
        try { f; true } catch { case _: Throwable => false }
      val tagOk = attempt(table.createTag(name, before._1))
      if (tagOk) {
        assert(LakeTable.validRefName(name), s"[$i] accepted junk tag '$name'")
        table.dropTag(name)
      }
      val brOk = attempt(table.createBranch(name, before._1): Unit)
      if (brOk) {
        assert(LakeTable.validRefName(name), s"[$i] accepted junk branch '$name'")
        table.dropBranch(name)
      }
      assert(!sibling.exists(), s"[$i] name '$name' escaped the table root")
      if (!tagOk && !brOk) {
        // a refusal must leave the table EXACTLY as it was
        val after = (table.currentSnapshot().get.version, table.listTags().toSet,
          table.listBranches().toSet, fileCount(rootDir))
        assert(after == before, s"[$i] refusal of '$name' mutated the table: $after vs $before")
      }
    }
  }

  test("DSv2 numeric/name options: junk throws loudly, never a wrong frame") {
    val work = TestSpark.tmpDir("fuzzopt")
    ChangeGen.writeLog(spark, GenConfig(nEvents = 300L), s"$work/log", nBatches = 1, partitions = 2)
    val table = new LakeTable(spark, s"$work/table")
    BatchReplay.replay(spark, s"$work/log", table, numBuckets = 2, saltBuckets = 1,
      recordMeta = false)
    val truth = table.read().count()
    val current = table.currentSnapshot().get.version
    val genJunk: SGen[String] = SGen.oneOf(
      SGen.oneOf("", " ", "NaN", "1e3", "0x10", "٣", "1 2", "--1", "+", "junk",
        "9999999999999999999999", "-", "'1'", "null", "∞"),
      SGen.chooseNum(-5L, -1L).map(_.toString),
      SGen.chooseNum(current + 1, current + 100).map(_.toString))
    val opts = Seq("versionAsOf", "changesFrom", "changesTo", "maxSplitBytes")
    forSamples(SGen.zip(SGen.oneOf(opts), genJunk), 80, 0x0975L) { case ((opt, junk), i) =>
      val r = try {
        val df = spark.read.format("graft").option(opt, junk).load(table.root)
        Some(df.collect().length.toLong)
      } catch { case _: Throwable => None }
      r.foreach { n =>
        // the only acceptable SUCCESS is a junk value that happens to
        // parse as a legal in-range number — and then the answer must
        // be the era-correct row count, never a silently-empty frame
        val v = junk.trim.toLong // throws (test failure) if junk was non-numeric
        opt match {
          case "versionAsOf" =>
            assert(v >= 0 && v <= current, s"[$i] $opt=$junk accepted out-of-range")
            assert(n == table.readVersion(v).count(), s"[$i] $opt=$junk wrong rows")
          case "changesFrom" =>
            // negative = the documented genesis sentinel (the streaming
            // source's startingVersion - 1 shape): a FULL backfill, so
            // the answer must be the whole visible state — never a
            // silently-empty frame
            if (v < 0) assert(n == truth, s"[$i] $opt=$junk genesis read wrong: $n vs $truth")
            else assert(v <= current, s"[$i] $opt=$junk accepted out-of-range")
          case "changesTo" =>
            assert(v >= 0 && v <= current, s"[$i] $opt=$junk accepted out-of-range")
          case "maxSplitBytes" =>
            assert(v > 0, s"[$i] $opt=$junk accepted non-positive")
            assert(n == truth, s"[$i] $opt=$junk changed the answer: $n vs $truth")
        }
      }
    }
    // junk branch/tag names on the read path refuse (no such ref) rather
    // than falling back to main's data
    forSamples(genName, 40, 0xB4A9L) { (name, i) =>
      Seq("branch", "tag").foreach { opt =>
        val r = try {
          Some(spark.read.format("graft").option(opt, name).load(table.root).count())
        } catch { case _: Throwable => None }
        // only a ref that actually exists may answer; none were created
        assert(r.isEmpty || name == LakeTable.MainBranch,
          s"[$i] $opt='$name' answered ${r.getOrElse(-1L)} rows without such a ref")
      }
    }
  }
}
