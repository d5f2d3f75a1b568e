package graft

import graft.lake.{CommitConflictException, LakeTable, Maintenance}
import graft.merge.MergeInto
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish branches: a branch is a separate snapshot lineage
  * sharing the root's data pool and content-addressed manifests. Risky
  * epochs merge onto the branch (invisible on main), get audited there,
  * and publish by metadata-only fast-forward; vacuum and snapshot expiry
  * treat every lineage's references as live. */
class BranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ts = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")

  private def events(rows: (Long, String, String, String, String)*) = {
    import spark.implicits._
    rows.map { case (lsn, op, repo, path, content) =>
      (lsn, op, ts, repo, path, "c", "text", content)
    }.toDF("lsn", "op", "ts", "repo", "path", "commit", "lang", "content")
  }

  private def stateOf(table: LakeTable): Map[(String, String), String] =
    table.read().select("repo", "path", "content").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  private def freshTable(): (LakeTable, MergeInto) = {
    val table = new LakeTable(spark, s"${TestSpark.tmpDir("branch")}/table")
    val merge = new MergeInto(table, numBuckets = 4, saltBuckets = 1, recordMeta = false)
    merge.apply(events((1L, "I", "r/a", "f", "one"), (2L, "I", "r/b", "f", "two")), 0L): Unit
    (table, merge)
  }

  test("WAP: branch epochs are invisible on main until fast-forward publishes them") {
    val (table, mainMerge) = freshTable()
    val fork = table.currentSnapshot().get.version

    val audit = table.createBranch("audit", fork)
    val branchMerge = new MergeInto(audit, numBuckets = 4, saltBuckets = 1, recordMeta = false)
    branchMerge.apply(events((3L, "U", "r/a", "f", "one-v2"), (4L, "I", "r/c", "f", "three")), 1L): Unit
    branchMerge.apply(events((5L, "D", "r/b", "f", null)), 2L): Unit

    // audit the staged state; main is untouched
    assert(stateOf(audit) == Map(("r/a", "f") -> "one-v2", ("r/c", "f") -> "three"))
    assert(table.currentSnapshot().get.version == fork)
    assert(stateOf(table) == Map(("r/a", "f") -> "one", ("r/b", "f") -> "two"))
    assert(table.listBranches() == Seq(("audit", fork + 2)))

    // the DSv2 surface reads the lineage the option names
    val viaDsv2 = spark.read.format("graft").option("branch", "audit").load(table.root)
      .select("repo", "path", "content").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(viaDsv2 == stateOf(audit))
    assert(spark.read.format("graft").load(table.root).count() == 2) // main unchanged

    // publish: metadata-only fast-forward
    assert(table.fastForward("audit") == fork + 2)
    assert(table.currentSnapshot().get.version == fork + 2)
    assert(stateOf(table) == stateOf(audit))
    // re-running a publish is a no-op resume, not a conflict
    assert(table.fastForward("audit") == fork + 2)
    // exactly-once survives the publish: the branch's ledger came along
    assert(mainMerge.apply(events((3L, "U", "r/a", "f", "one-v2")), 1L).skipped)
  }

  test("fast-forward fails loudly once the lineages diverge") {
    val (table, mainMerge) = freshTable()
    val fork = table.currentSnapshot().get.version
    val audit = table.createBranch("audit", fork)
    new MergeInto(audit, numBuckets = 4, saltBuckets = 1, recordMeta = false)
      .apply(events((3L, "I", "r/c", "f", "branch-side")), 1L): Unit
    // main advances independently → histories diverge
    mainMerge.apply(events((4L, "I", "r/d", "f", "main-side")), 2L): Unit
    val e = intercept[CommitConflictException](table.fastForward("audit"))
    assert(e.getMessage.contains("diverged"))
    // both lineages stay readable and correct after the failed publish
    assert(stateOf(table).contains(("r/d", "f")) && !stateOf(table).contains(("r/c", "f")))
    assert(stateOf(audit).contains(("r/c", "f")) && !stateOf(audit).contains(("r/d", "f")))
  }

  test("vacuum and snapshot expiry treat branch references as live") {
    val (table, mainMerge) = freshTable()
    val fork = table.currentSnapshot().get.version
    val audit = table.createBranch("audit", fork)
    new MergeInto(audit, numBuckets = 4, saltBuckets = 1, recordMeta = false)
      .apply(events((3L, "I", "r/c", "f", "staged")), 1L): Unit
    val staged = stateOf(audit)

    // vacuum from the MAIN handle with zero retention: the branch's data
    // dirs are unreferenced by main but must survive
    Maintenance.vacuum(table, retentionMs = 0L)
    assert(stateOf(audit) == staged, "vacuum reclaimed a live branch's files")

    // advance main twice and expire all but the newest version: files the
    // branch still references (the fork-era files) must survive
    mainMerge.apply(events((10L, "U", "r/a", "f", "one-v10")), 5L): Unit
    mainMerge.apply(events((11L, "U", "r/b", "f", "two-v11")), 6L): Unit
    Maintenance.expireSnapshots(table, keepLast = 1, olderThanMs = 0L): Unit
    assert(stateOf(audit) == staged, "expiry reclaimed files a branch references")

    // dropping the branch releases its exclusive storage to vacuum
    val before = table.dataDirNames().size
    assert(table.dropBranch("audit"))
    Maintenance.vacuum(table, retentionMs = 0L)
    assert(table.dataDirNames().size < before, "branch-only dirs were not reclaimed")
    assert(stateOf(table) == Map(("r/a", "f") -> "one-v10", ("r/b", "f") -> "two-v11"))
  }

  test("pre-fork history resolves through main; post-fork gaps fail loudly") {
    val (table, mainMerge) = freshTable() // v0
    mainMerge.apply(events((3L, "U", "r/a", "f", "one-v3")), 1L): Unit // v1
    val audit = table.createBranch("audit", 1L)
    new MergeInto(audit, numBuckets = 4, saltBuckets = 1, recordMeta = false)
      .apply(events((4L, "I", "r/c", "f", "staged")), 2L): Unit // branch v2
    // time travel BELOW the fork goes through shared ancestry (main's v0)
    assert(audit.readVersion(0L).where(col("repo") === "r/a")
      .select("content").head.getString(0) == "one")
    // a CDC range anchored before the fork spans ancestry + branch commits
    val changed = Maintenance.changesBetween(audit, 0L, 2L)
      .select("repo", "_change_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(changed == Map("r/a" -> "update_postimage", "r/c" -> "insert"))
    // versions at/above the fork missing from the branch are absent, not
    // borrowed from main (divergent histories share numbers, not content)
    val e = intercept[IllegalArgumentException](audit.snapshotAt(9L))
    assert(e.getMessage.contains("no snapshot v9 on branch"))
  }

  test("expired post-fork branch versions stay absent — never borrowed from main") {
    val (table, mainMerge) = freshTable() // main v0
    val audit = table.createBranch("audit", 0L)
    val branchMerge = new MergeInto(audit, numBuckets = 4, saltBuckets = 1, recordMeta = false)
    branchMerge.apply(events((3L, "U", "r/a", "f", "branch-v1")), 1L): Unit // branch v1
    branchMerge.apply(events((4L, "U", "r/a", "f", "branch-v2")), 2L): Unit // branch v2
    // main diverges: its v1 is a DIFFERENT history sharing the number
    mainMerge.apply(events((9L, "U", "r/a", "f", "main-v1")), 3L): Unit

    // trim the branch down to its head: v0 and v1 expire
    Maintenance.expireSnapshots(audit, keepLast = 1, olderThanMs = 0L): Unit
    assert(audit.snapshotVersions() == Seq(2L))

    // the fork point is RECORDED, so the expired branch v1 fails loudly
    // instead of silently resolving to main's divergent v1 (which the
    // earliest-surviving-snapshot inference would do: fork would "move"
    // to v2 and v1 < v2 would pass the pre-fork check)
    val e = intercept[Exception](audit.snapshotAt(1L))
    assert(e.getMessage.contains("branch"), s"unexpected: ${e.getMessage}")
    assert(!e.getMessage.contains("main-v1"))
    // the branch head and main both stay intact and divergent
    assert(stateOf(audit)(("r/a", "f")) == "branch-v2")
    assert(stateOf(table)(("r/a", "f")) == "main-v1")
  }

  test("ref-name traversal is rejected at every surface; the store survives") {
    val (table, _) = freshTable()
    intercept[IllegalArgumentException](table.forBranch(".."))
    intercept[IllegalArgumentException](table.forBranch("../../evil"))
    intercept[IllegalArgumentException](table.dropBranch(".."))
    intercept[IllegalArgumentException](table.dropBranch("main"))
    intercept[IllegalArgumentException](table.createBranch("..", 0L))
    intercept[IllegalArgumentException](table.createTag("..", 0L))
    intercept[IllegalArgumentException](table.dropTag("../x"))
    assert(table.tagVersion("..").isEmpty)
    intercept[Exception](spark.read.format("graft")
      .option("branch", "../..").load(table.root).collect())
    // nothing was deleted or created by the rejected names
    assert(table.snapshotVersions().nonEmpty)
    assert(table.branchNames().isEmpty)
    assert(stateOf(table) == Map(("r/a", "f") -> "one", ("r/b", "f") -> "two"))
  }

  test("tags pin MAIN versions: branch handles create and resolve against main") {
    val (table, mainMerge) = freshTable() // main v0
    mainMerge.apply(events((3L, "U", "r/a", "f", "main-v1")), 1L): Unit // main v1
    val audit = table.createBranch("audit", 0L)
    new MergeInto(audit, numBuckets = 4, saltBuckets = 1, recordMeta = false)
      .apply(events((4L, "U", "r/a", "f", "branch-v1")), 2L): Unit // branch v1 (divergent)

    table.createTag("release", 1L) // pins MAIN's v1
    // resolving the tag through the BRANCH handle must not return the
    // branch's divergent same-numbered snapshot
    val viaBranchHandle = audit.snapshotAtTag("release")
    assert(table.readFiles(viaBranchHandle.schema, viaBranchHandle.allFiles)
      .where(!col(graft.lake.LakeTable.DeletedCol))
      .where(col("repo") === "r/a").select("content").head.getString(0) == "main-v1")
    // same through the DSv2 surface: branch + tag reads the tagged MAIN state
    assert(spark.read.format("graft")
      .option("branch", "audit").option("tag", "release").load(table.root)
      .where(col("repo") === "r/a").select("content").head.getString(0) == "main-v1")
    // creating a tag through a branch handle also validates against main:
    // the branch has a v1 but tagging records main's, so both resolutions agree
    audit.createTag("viaBranch", 1L)
    assert(table.snapshotAtTag("viaBranch").version == 1L)
    // a version only the BRANCH has cannot be tagged (it is not a main version)
    intercept[IllegalArgumentException](audit.createTag("nope", 99L))
  }

  test("streaming to a nonexistent branch fails instead of creating an empty lineage") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val (table, _) = freshTable()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, String, String, String)]
    ms.addData((7L, "r/c", "f", "streamed"))
    val q = ms.toDF().toDF("lsn", "repo", "path", "content")
      .writeStream.format("graft")
      .option("checkpointLocation", s"${table.root}-badbranch-cp")
      .option("branch", "audti") // typo'd fork name
      .trigger(Trigger.AvailableNow())
      .start(table.root)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](q.awaitTermination())
    assert(e.getMessage.contains("audti") || e.getCause.getMessage.contains("audti"))
    // no orphan empty lineage was created for later merges to land on
    assert(table.branchNames().isEmpty)
    assert(stateOf(table) == Map(("r/a", "f") -> "one", ("r/b", "f") -> "two"))
  }

  test("streaming WAP: sink streams onto a branch; CDC reads follow the lineage") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val (table, _) = freshTable()
    val fork = table.currentSnapshot().get.version
    table.createBranch("stage", fork): Unit

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, String, String, String)]
    ms.addData((7L, "r/c", "f", "streamed"), (8L, "r/a", "f", "one-v8"))
    val q = ms.toDF().toDF("lsn", "repo", "path", "content")
      .writeStream.format("graft")
      .option("checkpointLocation", s"${table.root}-cp")
      .option("branch", "stage")
      .trigger(Trigger.AvailableNow())
      .start(table.root)
    q.awaitTermination()

    // the stream landed on the branch, not on main
    assert(table.currentSnapshot().get.version == fork)
    assert(stateOf(table.forBranch("stage")) ==
      Map(("r/a", "f") -> "one-v8", ("r/b", "f") -> "two", ("r/c", "f") -> "streamed"))
    // a branch CDC range read plans against the branch's lineage
    val changed = spark.read.format("graft")
      .option("branch", "stage").option("changesFrom", fork).load(table.root)
      .select("repo", "content").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(changed == Map("r/a" -> "one-v8", "r/c" -> "streamed"))
    // publish, then the same range read off MAIN sees the published rows
    table.fastForward("stage"): Unit
    val published = spark.read.format("graft")
      .option("changesFrom", fork).load(table.root)
      .select("repo", "content").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(published == changed)
  }

  test("SQL VERSION AS OF resolves a branch head (tags win name collisions)") {
    val wh = TestSpark.tmpDir("branchwh")
    spark.conf.set("spark.sql.catalog.graft_bwh",
      classOf[graft.lake.dsv2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_bwh.warehouse", wh)
    spark.sql("CREATE TABLE graft_bwh.db.t (lsn BIGINT, ts TIMESTAMP, repo STRING, " +
      "path STRING, commit STRING, lang STRING, content STRING) " +
      "TBLPROPERTIES ('buckets'='4')")
    spark.sql("INSERT INTO graft_bwh.db.t VALUES " +
      "(1, TIMESTAMP'2024-01-01 00:00:00', 'r1', 'a', 'c', 'scala', 'v1')")
    val table = new LakeTable(spark, s"$wh/db/t")
    val fork = table.currentSnapshot().get.version
    val audit = table.createBranch("audit", fork)
    new MergeInto(audit, numBuckets = 4, saltBuckets = 1, recordMeta = false)
      .apply(events((9L, "U", "r1", "a", "staged")), 77L): Unit

    assert(spark.sql("SELECT content FROM graft_bwh.db.t VERSION AS OF 'audit' " +
      "WHERE repo = 'r1'").head.getString(0) == "staged")
    assert(spark.sql("SELECT content FROM graft_bwh.db.t WHERE repo = 'r1'")
      .head.getString(0) == "v1") // main untouched
    // a TAG with the same name shadows the branch (immutable pin wins)
    table.createTag("audit", fork)
    assert(spark.sql("SELECT content FROM graft_bwh.db.t VERSION AS OF 'audit' " +
      "WHERE repo = 'r1'").head.getString(0) == "v1")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_bwh.db.t VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("no tag or branch"))
    spark.sql("DROP TABLE graft_bwh.db.t"): Unit
  }

  test("CALL procedures: create_branch, list_branches, fast_forward, drop_branch") {
    val (table, _) = freshTable()
    spark.conf.set("spark.sql.catalog.graft_sys",
      classOf[graft.lake.dsv2.GraftCatalog].getName)
    val root = table.root
    assert(spark.sql(s"CALL graft_sys.system.create_branch('$root', 'audit')")
      .collect().head.getLong(0) == 0L)
    new MergeInto(table.forBranch("audit"), numBuckets = 4, saltBuckets = 1, recordMeta = false)
      .apply(events((3L, "I", "r/c", "f", "staged")), 1L): Unit
    val listed = spark.sql(s"CALL graft_sys.system.list_branches('$root')").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(listed == Seq(("audit", 1L)))
    assert(spark.sql(s"CALL graft_sys.system.fast_forward('$root', 'audit')")
      .collect().head.getLong(0) == 1L)
    assert(stateOf(table).contains(("r/c", "f")))
    assert(spark.sql(s"CALL graft_sys.system.drop_branch('$root', 'audit')")
      .collect().head.getBoolean(0))
    assert(table.listBranches().isEmpty)
  }
}
