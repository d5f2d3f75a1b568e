package graft.lake

import graft.merge.{MergeInto, MergeStats}
import org.apache.hadoop.fs.Path
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
  * replicas converge under the same lsn order as the base. Refresh IO
  * tracks change volume: `Maintenance.changesBetween` prunes to the
  * files actually holding post-anchor rows (a compaction-only commit
  * refreshes with zero data IO), and the merge itself touches only the
  * buckets the changed keys hash to.
  *
  * Exactly-once without coordination: the merge epoch id IS the base
  * version the refresh targets, so a crash between the merge commit and
  * the watermark write replays the same range on retry and ledger-skips;
  * a retry that targets a LATER base version re-derives a superset range
  * whose re-applied events are LWW-idempotent (same rows, same lsns).
  * The watermark pointer (`<view>/enrich/p<baseVersion>`, highest wins,
  * tmp + atomic rename like the view/snapshot commit protocol) is
  * therefore purely an optimization — never a correctness anchor.
  *
  * If snapshot retention on the base outran the refresh cadence (the
  * anchor version was expired), the incremental range is unreadable;
  * the view is rebuilt by one full-state pass: upserts for every live
  * base row plus COMPENSATING tombstones for view keys the base no
  * longer has, sequenced at base-hwm + 1. That sequencing is sound only
  * when the base log is delivering in order (later events carry larger
  * lsns); under observed unordered delivery the rebuild refuses loudly
  * rather than risk a compensating tombstone outranking a late real
  * event. Single maintainer, like [[Maintenance.compact]].
  */
object EnrichedView {

  private def markDir(view: LakeTable) = new Path(s"${view.root}/enrich")

  private def fs(view: LakeTable, p: Path) =
    p.getFileSystem(view.spark.sparkContext.hadoopConfiguration)

  /** The base version the view last refreshed to, if any. */
  def lastRefreshed(view: LakeTable): Option[Long] = {
    val dir = markDir(view)
    val f = fs(view, dir)
    if (!f.exists(dir)) return None
    f.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("p\\d+")).map(_.drop(1).toLong).sorted.lastOption
  }

  private def writeMark(view: LakeTable, toVersion: Long): Unit = {
    val dir = markDir(view)
    val f = fs(view, dir)
    f.mkdirs(dir)
    val tmp = new Path(dir, s".p$toVersion.tmp")
    val out = f.create(tmp, true)
    try out.write(Array.emptyByteArray) finally out.close()
    require(f.rename(tmp, new Path(dir, s"p$toVersion")),
      s"enrich watermark commit failed at $toVersion")
    f.listStatus(dir).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.matches("p\\d+") && n.drop(1).toLong < toVersion) f.delete(p, false): Unit
    }
  }

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

    val anchorAlive = fromOpt.forall(f => base.snapshotVersions().contains(f))
    val events = fromOpt match {
      case Some(f) if anchorAlive =>
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
      case stale =>
        // first refresh, or expired anchor: full-state rebuild. The
        // compensating tombstones for keys the base dropped while the
        // anchor was expired are sequenced at hwm+1, which outranks
        // every live row only under ordered delivery — refuse otherwise.
        val live = requireContract(enrich(base.readVersion(toVersion)))
          .withColumn("op", lit("U"))
        if (stale.isEmpty) live
        else {
          require(to.unorderedCommits == 0L,
            "expired-anchor rebuild needs ordered log delivery (base has " +
              s"${to.unorderedCommits} unordered commits); rebuild the view at a fresh root")
          val gone = view.read().select(col("repo"), col("path"))
            .except(base.readVersion(toVersion).select(col("repo"), col("path")))
            .withColumn("lsn", lit(to.highWaterLsn.getOrElse(0L) + 1L))
            .withColumn("op", lit("D"))
          live.unionByName(gone, allowMissingColumns = true)
        }
    }
    val stats = new MergeInto(view, numBuckets = numBuckets,
      saltBuckets = saltBuckets, recordMeta = false).apply(events, epochId = toVersion)
    writeMark(view, toVersion)
    EnrichStats(fromOpt, toVersion,
      initialFull = fromOpt.isEmpty || !anchorAlive, noOp = false, Some(stats))
  }
}
