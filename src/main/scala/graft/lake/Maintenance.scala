package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance + incremental-read services over the snapshot log.
  *
  * Compaction — streaming upsert epochs leave `saltBuckets` files per
  * touched bucket per epoch; over many epochs a bucket accumulates small
  * files (the classic streaming-ingest small-file problem). `compact`
  * rewrites each oversized bucket's current winners into one file and
  * commits a new snapshot — data-identical, metadata smaller. This is a
  * pure metadata+layout operation: concurrent readers keep reading their
  * pinned snapshot (reference analogue: stage outputs replaced atomically
  * by rename, src/osm/filter.rs:381-398).
  *
  * Changes-between-versions (incremental CDC read) — the consumer-side
  * mirror of the ingest engine: given two snapshot versions, emit one
  * I/U/D row per key that changed. Bucket-level file pruning applies:
  * buckets whose file lists are identical in both snapshots cannot
  * contain changes and are never read (the reference's freshness check,
  * src/pipeline/mod.rs:29-48, at bucket granularity).
  */
object Maintenance {
  import LakeTable.DeletedCol

  /** Rewrite buckets having more than `maxFilesPerBucket` files into one
    * file each; returns the number of compacted buckets (0 → no new
    * snapshot committed). Also compacts the appended meta tables on the
    * same trigger — they accrete one small file per epoch otherwise. */
  def compact(table: LakeTable, maxFilesPerBucket: Int = 4): Int = {
    compactMeta(table, maxFilesPerBucket * 4)
    val snap = table.currentSnapshot().getOrElse(return 0)
    val byBucket = snap.files.groupBy(_.bucket)
    val oversized = byBucket.filter(_._2.size > maxFilesPerBucket).keySet
    if (oversized.isEmpty) return 0

    val newVersion = snap.version + 1
    // unique writer-suffixed dir, same protocol as MergeInto: never
    // overwrite a directory a concurrent committer may already own
    val writeDir = s"v$newVersion-${java.util.UUID.randomUUID().toString.take(8)}"
    // one output file per oversized bucket: tombstones and winners are
    // already resolved in the stored rows — this is a pure rewrite
    table.readFiles(snap.schema, snap.filesIn(oversized))
      .withColumn("b", pmod(xxhash64(col("repo")), lit(snap.numBuckets)).cast("int"))
      .repartition(oversized.size, col("b"))
      .write.mode("overwrite").option("compression", "zstd")
      .partitionBy("b").parquet(s"${table.root}/data/$writeDir")

    val newFiles = table.listDataFiles(writeDir)
    table.commitSnapshot(snap.copy(
      version = newVersion,
      files = snap.filesNotIn(oversized) ++ newFiles))
    oversized.size
  }

  /** Compact the per-epoch appended meta tables (lineage / metrics /
    * stream_metrics) down to one file each once they exceed `maxFiles`
    * parts — at 10⁵ epochs an uncompacted metrics read degrades linearly
    * in file count. Single-maintainer operation (like compact itself):
    * rewrite to a tmp dir, swap via delete + rename. */
  def compactMeta(table: LakeTable, maxFiles: Int = 16): Int = {
    val spark = table.spark
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq("lineage", "metrics", "stream_metrics").count { name =>
      val dir = new org.apache.hadoop.fs.Path(s"${table.root}/meta/$name")
      val fs = dir.getFileSystem(hconf)
      val nParts =
        if (!fs.exists(dir)) 0
        else fs.listStatus(dir).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (nParts <= maxFiles) false
      else {
        val tmp = new org.apache.hadoop.fs.Path(s"${table.root}/meta/.$name.compact")
        spark.read.parquet(dir.toString).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.delete(dir, true)
        require(fs.rename(tmp, dir), s"meta compaction swap failed for $name")
        true
      }
    }
  }

  /** Remove orphaned data directories and manifest files — left by
    * writers that crashed (or lost a commit race) between writing and
    * committing the snapshot root. An artifact is an orphan iff NO
    * committed snapshot references it; time travel keeps every
    * referenced version alive. Returns the artifacts removed. */
  def vacuum(table: LakeTable): Seq[String] = {
    val versions = table.snapshotVersions()
    val referenced: Set[String] = versions
      .flatMap(v => table.snapshotAt(v).files)
      .map(_.relPath.stripPrefix("data/").takeWhile(_ != '/')).toSet
    val orphans = table.dataDirNames().filterNot(referenced)
    orphans.foreach(table.deleteDataDir)
    val refManifests: Set[String] = versions.flatMap(table.manifestRefsOf).toSet
    val orphanManifests = table.manifestFileNames().filterNot(refManifests)
    orphanManifests.foreach(table.deleteManifest)
    orphans ++ orphanManifests
  }

  /** Incremental changes between two committed versions as CDC rows:
    * `_change_type` in {insert, update_postimage, delete} per (repo,
    * path). Only buckets whose file sets differ between the snapshots are
    * read. */
  def changesBetween(table: LakeTable, fromVersion: Long, toVersion: Long): DataFrame = {
    val from = table.snapshotAt(fromVersion)
    val to = table.snapshotAt(toVersion)
    require(from.numBuckets == to.numBuckets,
      "changesBetween across a re-bucketing is not supported")
    val fromByBucket = from.files.groupBy(_.bucket)
    val toByBucket = to.files.groupBy(_.bucket)
    val changedBuckets = (fromByBucket.keySet ++ toByBucket.keySet).filter { b =>
      fromByBucket.getOrElse(b, Nil).toSet != toByBucket.getOrElse(b, Nil).toSet
    }

    val oldDf = table.readFiles(from.schema, from.filesIn(changedBuckets))
    val newDf = table.readFiles(to.schema, to.filesIn(changedBuckets))
    val o = oldDf.select(col("repo"), col("path"), col("lsn").as("_old_lsn"),
      col(DeletedCol).as("_old_del"))
    // full outer join per key; bucket-partitioned on both sides so the
    // shuffle is bounded by changed buckets, not table size
    val joined = newDf.as("n").join(o.as("o"),
      col("n.repo") === col("o.repo") && col("n.path") === col("o.path"), "full_outer")
    // the insert branch requires a PRESENT new side: a key existing only
    // as an old tombstone (absent from `to`) must not surface as a
    // spurious all-null "insert" (latent with writers that drop keys,
    // even though current writers always rewrite buckets whole)
    val changeType =
      when(col("_old_lsn").isNull || col("_old_del"),
        when(col("n.repo").isNull || col(s"n.$DeletedCol"), lit(null))
          .otherwise(lit("insert")))
        .otherwise(
          when(col(s"n.$DeletedCol"), lit("delete"))
            .when(col("n.lsn") =!= col("_old_lsn"), lit("update_postimage"))
            .otherwise(lit(null)))
    joined
      .withColumn("_change_type", changeType)
      .where(col("_change_type").isNotNull)
      .select(col("_change_type") +:
        newDf.columns.filterNot(_ == DeletedCol).map(c => col(s"n.$c")).toIndexedSeq: _*)
  }
}
