package graft.lake

import graft.merge.{MergeInto, MergeStats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

final case class EnrichStats(fromVersion: Option[Long], toVersion: Long,
                             initialFull: Boolean, noOp: Boolean,
                             merge: Option[MergeStats])

/** A derived LAKE TABLE maintained incrementally off the base table's CDC
  * feed — the enrichment sibling of [[MaterializedView]]'s aggregates.
  *
  * Each refresh brings `view` (a normal [[LakeTable]]: bucketed,
  * snapshot-committed, time-travelable, DSv2-readable) to
  * `enrich(post-images of base changes)`, keyed like the base by
  * (repo, path): inserts and update post-images flow through the
  * caller's `enrich` transform (typically a broadcast join to a
  * dimension plus derived columns) and LWW-merge at their base lsns;
  * base deletes become view tombstones at the TOMBSTONE's lsn, so view
  * replicas converge under the same lsn order as the base — a late
  * tombstone (unique lsn) folds exactly as it would at the base.
  * Refresh IO tracks change volume: `Maintenance.changesBetween` prunes
  * to the files actually holding post-anchor rows (a compaction-only
  * commit refreshes with zero data IO), and the merge itself touches
  * only the buckets the changed keys hash to.
  *
  * Exactly-once without coordination or side files: the merge epoch id
  * IS the base version the refresh targets, and the incremental ANCHOR
  * is read back from the view's own epoch ledger (`epochs.max`) — the
  * applied-range record is crash-atomic with the data it describes, so
  * there is no window in which the view's state and its watermark can
  * disagree. A retry of a crashed refresh replays the same range and
  * ledger-skips; a retry that targets a later base version re-derives a
  * superset range whose re-applied events are LWW-idempotent (same
  * rows, same lsns).
  *
  * The incremental path REFUSES (rather than risks wrong answers) when
  * the endpoint diff can no longer be trusted to speak the base's lsn
  * language: the anchor version was expired by snapshot retention, or
  * the base's high-water mark REGRESSED across the range (a rollback —
  * after which `changesBetween` must synthesize deletes carrying the
  * dropped row's own lsn, which would tie with the view's copy and lose
  * to the merge's target-wins rule). A view is derived data: the remedy
  * is a rebuild at a fresh root, stated in the error. Residual
  * documented limit: a rollback followed by enough re-ingest to push
  * the hwm back past its old value between two refreshes is
  * indistinguishable from ordinary progress at the endpoints; schedule
  * refreshes (or tag anchors) more often than administrative rollbacks.
  * `enrich` must preserve rows (use LEFT joins for lossy dimensions):
  * a dropped post-image leaves the view's previous value live.
  * Single maintainer, like [[Maintenance.compact]].
  */
object EnrichedView {

  /** The base version the view last refreshed to — the max applied epoch
    * in the view's own ledger (epoch id = base version by construction).
    * A snapshot with an EMPTY ledger (a catalog-created, never-refreshed
    * view table) counts as never refreshed, not a crash. */
  def lastRefreshed(view: LakeTable): Option[Long] =
    view.currentSnapshot().flatMap(_.epochs.maxOption)

  /** Columns `enrich` must preserve for the view merge to stay keyed and
    * lsn-ordered like the base. */
  private def requireContract(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    Seq("repo", "path", "lsn").foreach(c =>
      require(have(c), s"enrich() must preserve the '$c' column"))
    require(!have("op"), "enrich() must not emit an 'op' column (the refresh assigns it)")
    df
  }

  /** Bring `view` to `enrich` over the base's current version. */
  def refresh(base: LakeTable, view: LakeTable,
              enrich: DataFrame => DataFrame,
              numBuckets: Int = 16, saltBuckets: Int = 4): EnrichStats = {
    require(base.root != view.root, "the view table must live at its own root")
    val to = base.currentSnapshot().getOrElse(
      throw new IllegalStateException("cannot refresh a view of an empty base"))
    val toVersion = to.version
    val fromOpt = lastRefreshed(view)
    if (fromOpt.contains(toVersion))
      return EnrichStats(fromOpt, toVersion, initialFull = false, noOp = true, None)

    val events = fromOpt match {
      case Some(f) =>
        if (!base.snapshotVersions().contains(f))
          throw new IllegalStateException(
            s"the view's incremental anchor (base version $f) was expired by snapshot " +
              "retention; the endpoint diff is unreadable. The view is derived data — " +
              "rebuild it at a fresh root, and refresh more often than the base expires.")
        val fromHw = base.snapshotAt(f).highWaterLsn.getOrElse(Long.MinValue)
        if (to.highWaterLsn.getOrElse(Long.MinValue) < fromHw)
          throw new IllegalStateException(
            s"the base's high-water lsn regressed across the refresh range ($f -> $toVersion): " +
              "its history was rewritten (rollback). Synthesized deletes would carry " +
              "already-used lsns and tie-lose in the view merge — rebuild the view at a " +
              "fresh root instead.")
        val ch = Maintenance.changesBetween(base, f, toVersion)
        val ups = requireContract(
          enrich(ch.where(col("_change_type") =!= "delete").drop("_change_type")))
          .withColumn("op", lit("U"))
        // deletes carry the TOMBSTONE's lsn — the view tombstone slots
        // into the same LWW order as the base's
        val dels = ch.where(col("_change_type") === "delete")
          .select(col("repo"), col("path"), col("lsn"))
          .withColumn("op", lit("D"))
        ups.unionByName(dels, allowMissingColumns = true)
      case None => // first build (the view has no committed state)
        requireContract(enrich(base.readVersion(toVersion)))
          .withColumn("op", lit("U"))
    }
    val stats = new MergeInto(view, numBuckets = numBuckets,
      saltBuckets = saltBuckets, recordMeta = false).apply(events, epochId = toVersion)
    EnrichStats(fromOpt, toVersion,
      initialFull = fromOpt.isEmpty, noOp = false, Some(stats))
  }
}
