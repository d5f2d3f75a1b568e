package graft.lake.dsv2

import graft.lake.{LakeTable, Snapshot}
import graft.merge.MergeInto
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL `UPDATE` / `MERGE INTO` (and a second route for `DELETE`) as
  * DataSourceV2 DELTA-BASED row-level operations — the natural shape for
  * a CDC engine: Spark's rewrite plans compute exactly the changed rows
  * (insert / update / delete), executors stage them as JSONL change
  * events, and the batch commit folds the staged events through ONE LWW
  * MERGE epoch. Nothing is copy-on-write: like every other write surface
  * here, DML lands as ordered change events (tombstones for deletes), so
  * history, time travel, `changesBetween`, and the streaming CDC source
  * all see DML like any other epoch.
  *
  * Sequencing: DML is engine-sequenced (unlike `INSERT INTO`, the bulk
  * CDC-ingest surface, which honors the event's own `lsn`). Tombstones
  * get `highWater + 1` and upserts `highWater + 2`, so within the epoch a
  * key-changing UPDATE (tombstone old key + upsert new key) and a
  * same-key delete-then-insert both resolve to the insert, and every DML
  * row beats all pre-existing versions (`lsn <= highWater`). The commit
  * stays ordered, so incremental readers keep their `lsn > hw` pruning.
  *
  * Exactly-once: the epoch id derives from Spark's query id, so a
  * platform retry of the same DML statement is a ledger no-op, while a
  * user re-running the statement is a new epoch (same contract as
  * `INSERT INTO`). Speculative/retried tasks are handled by the standard
  * DataWriter protocol: only files named in COMMITTED task messages are
  * merged; aborted tasks delete their own staging file.
  *
  * Scale shape: the delta rows stream once through executors (no driver
  * collect, no whole-file rewrite), staging IO is O(changed rows), and
  * the merge epoch itself is the engine's single-exchange bucket-pruned
  * upsert. */
final class GraftRowLevelOperationBuilder(
    root: String, snapshot: Snapshot, visibleSchema: StructType,
    tableOptions: CaseInsensitiveStringMap, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(root, snapshot, visibleSchema, tableOptions, info.command())
}

final class GraftRowLevelOperation(
    root: String, snapshot: Snapshot, visibleSchema: StructType,
    tableOptions: CaseInsensitiveStringMap, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  GraftDeltaWrite.requireCdcColumns(visibleSchema, root)

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftRowLevelOperation[$cmd, $root]"

  /** Target-row scan: the table's own scan builder, so the command's
    * condition keeps manifest-level bucket pruning and filter pushdown. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](tableOptions.asCaseSensitiveMap())
    merged.putAll(options.asCaseSensitiveMap())
    new GraftScanBuilder(root, snapshot, visibleSchema, new CaseInsensitiveStringMap(merged))
  }

  /** The engine's natural key. Updates that reassign key columns are
    * handled in the writer (tombstone old key + upsert new key), so
    * Spark's single `update()` representation suffices. */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("repo"), Expressions.column("path"))
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  private val branch = BranchOpt.of(tableOptions)
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftDeltaWrite(root, snapshot, info, branch)
    }
}

private object GraftDeltaWrite {
  def requireCdcColumns(schema: StructType, root: String): Unit = {
    def has(n: String, t: org.apache.spark.sql.types.DataType) =
      schema.fields.exists(f => f.name == n && f.dataType == t)
    require(has("repo", StringType) && has("path", StringType) && has("lsn", LongType),
      s"row-level DML on graft.`$root` requires the CDC key/sequence columns " +
        "(repo STRING, path STRING, lsn BIGINT)")
  }
}

final class GraftDeltaWrite(root: String, snapshot: Snapshot, info: LogicalWriteInfo,
                            branch: String = graft.lake.LakeTable.MainBranch)
    extends DeltaWrite {
  override def description(): String = s"GraftDeltaWrite[$root, query=${info.queryId()}]"
  override def toBatch(): DeltaBatchWrite = {
    val spark = SparkSession.active
    // fallback must include TOMBSTONE lsns (read() hides them): a MERGE
    // INTO insert of a previously-deleted key sequenced below its
    // tombstone would silently lose the LWW argmax
    val hwm = snapshot.highWaterLsn.getOrElse(
      new LakeTable(spark, root).forBranch(branch).maxLsnOf(snapshot))
    new GraftDeltaBatchWrite(root, info.queryId(), info.schema(),
      info.rowIdSchema().orElse(null), hwm, Bridge.serializableConf(spark), branch)
  }
}

/** One staged-JSONL file per task; commit merges exactly the files the
  * winning tasks reported. */
private final case class GraftDeltaFiles(paths: Seq[String]) extends WriterCommitMessage

final class GraftDeltaBatchWrite(
    root: String, queryId: String, rowSchema: StructType, rowIdSchema: StructType,
    highWater: Long, conf: org.apache.spark.util.SerializableConfiguration,
    branch: String = graft.lake.LakeTable.MainBranch)
    extends DeltaBatchWrite {

  private val stagingDir = s"$root/_dml/$queryId"

  override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(stagingDir, rowSchema, rowIdSchema, highWater, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val files = messages.collect { case GraftDeltaFiles(ps) => ps }.flatten.toSeq
    try {
      if (files.isEmpty) return // empty delta: no new version, no empty epoch
      val stagedSchema = rowSchema.add("op", StringType, nullable = true)
      val events = spark.read.schema(stagedSchema)
        .option("timeZone", "UTC").json(files: _*)
      val table = new LakeTable(spark, root).forBranch(branch)
      val buckets = table.currentSnapshot().map(_.numBuckets).getOrElse(16)
      val qid = s"dml:$queryId".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val epoch = graft.functions.Hashing.hashBytes(qid, 0, qid.length, 0xD31AL)
      new MergeInto(table, numBuckets = buckets, saltBuckets = 2,
        recordMeta = false).apply(events, epoch): Unit
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit = {
    val p = new Path(stagingDir)
    val fs = p.getFileSystem(conf.value)
    fs.delete(p, true): Unit
  }
}

final class GraftDeltaWriterFactory(
    stagingDir: String, rowSchema: StructType, rowIdSchema: StructType,
    highWater: Long, conf: org.apache.spark.util.SerializableConfiguration)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stagingDir, rowSchema, rowIdSchema, highWater, conf,
      partitionId, taskId)
}

/** Turns Spark's delta callbacks into change events:
  *   - `insert(row)` / `reinsert(row)`    → upsert  at `highWater + 2`
  *   - `delete(meta, id)`                 → tombstone at `highWater + 1`
  *   - `update(meta, id, row)`            → upsert; if the assignment moved
  *     the key, additionally tombstone the old key
  * The staging file is created lazily on the first event, so tasks with an
  * empty delta stage nothing. Rows are written eagerly (Spark reuses the
  * InternalRow buffers between callbacks — nothing may be retained). */
final class GraftDeltaWriter(
    stagingDir: String, rowSchema: StructType, rowIdSchema: StructType,
    highWater: Long, conf: org.apache.spark.util.SerializableConfiguration,
    partitionId: Int, taskId: Long)
    extends DeltaWriter[InternalRow] {

  private val n = rowSchema.length
  private val stagedSchema = rowSchema.add("op", StringType, nullable = true)
  private val enc = new Bridge.JsonRowEncoder(stagedSchema)
  private val lsnIdx = rowSchema.fieldIndex("lsn")
  private val repoIdx = rowSchema.fieldIndex("repo")
  private val pathIdx = rowSchema.fieldIndex("path")
  private val idRepoIdx = rowIdSchema.fieldIndex("repo")
  private val idPathIdx = rowIdSchema.fieldIndex("path")

  private val file = new Path(stagingDir, f"delta-$partitionId%05d-$taskId.jsonl")
  private var out: java.io.BufferedWriter = _
  private def stream(): java.io.BufferedWriter = {
    if (out == null) {
      val fs = file.getFileSystem(conf.value)
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(file, true), java.nio.charset.StandardCharsets.UTF_8))
    }
    out
  }

  private def emitUpsert(row: InternalRow): Unit = {
    val vals = new Array[Any](n + 1)
    var i = 0
    while (i < n) { vals(i) = row.get(i, rowSchema(i).dataType); i += 1 }
    vals(lsnIdx) = highWater + 2L
    vals(n) = UTF8String.fromString("U")
    val w = stream(); w.write(enc.toJson(new GenericInternalRow(vals))); w.write('\n')
  }

  private def emitTombstone(repo: UTF8String, path: UTF8String): Unit = {
    val vals = new Array[Any](n + 1) // non-key columns stay null, as in DELETE FROM
    vals(repoIdx) = repo.clone()
    vals(pathIdx) = path.clone()
    vals(lsnIdx) = highWater + 1L
    vals(n) = UTF8String.fromString("D")
    val w = stream(); w.write(enc.toJson(new GenericInternalRow(vals))); w.write('\n')
  }

  override def insert(row: InternalRow): Unit = emitUpsert(row)
  override def reinsert(meta: InternalRow, row: InternalRow): Unit = emitUpsert(row)

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    emitTombstone(id.getUTF8String(idRepoIdx), id.getUTF8String(idPathIdx))

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    val oldRepo = id.getUTF8String(idRepoIdx)
    val oldPath = id.getUTF8String(idPathIdx)
    val keyMoved = oldRepo != row.getUTF8String(repoIdx) ||
      oldPath != row.getUTF8String(pathIdx)
    if (keyMoved) emitTombstone(oldRepo, oldPath)
    emitUpsert(row)
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) GraftDeltaFiles(Seq.empty)
    else { out.close(); out = null; GraftDeltaFiles(Seq(file.toString)) }
  }

  override def abort(): Unit = {
    close()
    val fs = file.getFileSystem(conf.value)
    if (fs.exists(file)) fs.delete(file, false): Unit
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}
