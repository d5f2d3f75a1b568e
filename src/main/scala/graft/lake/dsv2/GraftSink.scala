package graft.lake.dsv2

import graft.lake.LakeTable
import graft.merge.MergeInto
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.lit

/** Structured-Streaming sink: every micro-batch is one MERGE epoch with
  * LWW upsert semantics —
  * {{{
  *   events.writeStream.format("graft")
  *     .option("checkpointLocation", cp)
  *     .start(tableRoot)
  * }}}
  * the write-side twin of `readStream.format("graft")` (the CDC source in
  * [[GraftMicroBatchStream]]); together they SQL-surface a full
  * stream → table → stream relay without a line of Scala.
  *
  * Exactly-once: epoch ids are `hash64(checkpointLocation) + batchId` —
  * the checkpoint IS the stream-generation identity (same scheme and
  * rationale as `ingest.StreamingReplay`), so a crash-retry of a committed
  * batch is a ledger no-op and a NEW stream against the same table cannot
  * collide with a previous generation's epochs. Rows carry an optional
  * `op` column ("U"/"D"); absent, every row is an upsert. A first batch
  * into a missing table creates it (`numBuckets` option, default 16);
  * later batches validate against the table's committed bucket count.
  */
final class GraftSink(root: String, checkpoint: String,
                      numBuckets: Option[Int], saltBuckets: Int,
                      recordMeta: Boolean,
                      /** Target lineage: stream a risky backfill onto an
                        * audit branch, publish via fastForward (WAP). */
                      branch: String = LakeTable.MainBranch) extends Sink {
  private val epochBase: Long = {
    val b = checkpoint.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    graft.functions.Hashing.hashBytes(b, 0, b.length, 0L)
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val table = new LakeTable(spark, root).forBranch(branch)
    // a non-main branch must already be forked: silently creating a fresh
    // EMPTY lineage here (typo'd name, forgotten fork) would stage every
    // batch against nothing — deletes tombstone nothing, audits see only
    // the new events, and the eventual fastForward fails as "diverged"
    if (branch != LakeTable.MainBranch)
      require(table.currentSnapshot().isDefined,
        s"branch '$branch' does not exist at $root — createBranch/fork it before streaming to it")
    val buckets = table.currentSnapshot().map(_.numBuckets)
      .orElse(numBuckets).getOrElse(16)
    val merge = new MergeInto(table, numBuckets = buckets,
      saltBuckets = saltBuckets, recordMeta = recordMeta)
    // the raw per-batch df is streaming-flagged; re-expose it as a batch
    // view (what ForeachBatchSink does) so observe/write work on it
    val batch = org.apache.spark.sql.graftx.Bridge.batchView(data)
    val withOp =
      if (batch.columns.contains("op")) batch
      else batch.withColumn("op", lit("U"))
    val stats = merge.apply(withOp, epochBase + batchId)
    // A ledger-skipped batch (crash-retry of an already-committed epoch)
    // must still EVALUATE the batch plan: upstream stateful operators
    // (watermark dedup etc.) live inside it and Spark validates that every
    // state partition commits each micro-batch.
    if (stats.skipped) batch.write.format("noop").mode("overwrite").save()
  }

  override def toString: String = s"GraftSink[$root]"
}
