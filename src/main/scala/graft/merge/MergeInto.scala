package graft.merge

import graft.lake.{LakeTable, Snapshot}
import graft.schema.SchemaRegistry
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Key-partitioned MERGE INTO with last-writer-wins semantics.
  *
  * Semantics per micro-batch of change events:
  *   1. dedup by `lsn` (at-least-once delivery collapse);
  *   2. copy-on-write ONLY the buckets (`pmod(xxhash64(repo), B)`) that
  *      contain changed keys — bucket pruning, the Spark rebirth of the
  *      reference's row-group min/max pruning
  *      (src/places/place_index.rs:217-221);
  *   3. per (repo, path) argmax by lsn across (old state ∪ batch) —
  *      the reference's argmax-per-group
  *      (src/pipeline/conflate/mod.rs:148-175) as one declarative
  *      `max_by(struct(*), lsn)` hash aggregate (in-batch LWW and
  *      target merge in a single exchange);
  *   4. `op = D` winners become tombstones, keeping deletes idempotent
  *      under duplicate redelivery across epochs;
  *   5. publish a new snapshot atomically; the epoch ledger makes
  *      re-delivery of a committed epoch a no-op (exactly-once).
  *
  * Scale notes (100 TB / 1000 executors):
  *   - The only wide exchange is the per-key argmax, a partial-agg-friendly
  *     hash aggregate on fine-grained (repo, path) keys — no single key is
  *     hot, so the aggregate itself cannot skew.
  *   - Hot-REPO skew shows up as hot BUCKETS (file-size and task skew),
  *     handled by salting the write repartition with
  *     `pmod(xxhash64(path), saltBuckets)` so a hot bucket fans out over
  *     many tasks/files, plus AQE skew splitting.
  *   - Untouched buckets are never read or rewritten, so steady-state cost
  *     tracks change volume, not table size.
  */
final case class MergeStats(
    epochId: Long,
    tableVersion: Long,
    skipped: Boolean,
    eventsIn: Long,
    afterLsnDedup: Long,
    keysWritten: Long,
    tombstonesWritten: Long,
    bucketsTouched: Int,
    durationMs: Long
)

final class MergeInto(
    table: LakeTable,
    numBuckets: Int = 16,
    saltBuckets: Int = 4,
    recordMeta: Boolean = true
) {
  import LakeTable.DeletedCol

  private val BucketCol = "b"

  private def bucketExpr = pmod(xxhash64(col("repo")), lit(numBuckets)).cast(IntegerType)

  /** Project df onto `schema` column-by-column; absent columns become null
    * (the tolerant-reader evolution rule, reference
    * src/places/place_index.rs:359-370). */
  private def align(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.fields.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  private def asLong(m: Map[String, Any], k: String): Long = m.get(k) match {
    case Some(l: Long) => l
    case Some(i: Int) => i.toLong
    case _ => 0L
  }

  /** Apply one epoch of change events. Idempotent per epochId. */
  def apply(events: DataFrame, epochId: Long): MergeStats = {
    val t0 = System.nanoTime()
    val snapOpt = table.currentSnapshot()
    snapOpt.find(_.epochs.contains(epochId)) match {
      case Some(s) =>
        MergeStats(epochId, s.version, skipped = true, 0, 0, 0, 0, 0,
          (System.nanoTime() - t0) / 1000000)
      case None => applyNew(events, epochId, snapOpt, t0)
    }
  }

  private def applyNew(events: DataFrame, epochId: Long,
                       snapOpt: Option[Snapshot], t0: Long): MergeStats = {
    // --- schema evolution -------------------------------------------------
    val incomingState = StructType(events.schema.fields.filterNot(_.name == "op"))
    val currentState = snapOpt.map(s => StructType(s.schema.fields.filterNot(_.name == DeletedCol)))
    val evolvedState = currentState match {
      case Some(cur) => SchemaRegistry.evolve(cur, incomingState)
      case None => incomingState
    }
    val evolvedWithOp = StructType(evolvedState.fields :+ StructField("op", StringType, nullable = false))
    val physicalSchema = evolvedState.add(StructField(DeletedCol, BooleanType, nullable = false))

    // --- source prep: lsn dedup (observed, persisted — read source once) --
    val inObs = Observation(s"merge-in-$epochId")
    val dedupObs = Observation(s"merge-dedup-$epochId")
    val deduped = align(events, evolvedWithOp)
      .observe(inObs, count(lit(1)).as("n"))
      .dropDuplicates("lsn")
      .observe(dedupObs, count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    try {
      // --- bucket pruning -------------------------------------------------
      // Touched buckets: tiny distinct over the batch (≤ numBuckets values).
      val touched = deduped.select(bucketExpr.as(BucketCol)).distinct()
        .collect().map(_.getInt(0)).toSet

      val targetFiles = snapOpt.map(_.filesIn(touched)).getOrElse(Seq.empty)
      val target = align(
        table.readFiles(snapOpt.map(_.schema).getOrElse(physicalSchema), targetFiles)
          .withColumn("op", when(col(DeletedCol), lit("D")).otherwise(lit("U"))),
        evolvedWithOp)

      // --- merge: per-key argmax by lsn ------------------------------------
      val winner = target.unionByName(deduped)
        .groupBy(col("repo"), col("path"))
        .agg(max_by(struct(evolvedWithOp.fields.map(f => col(f.name)).toIndexedSeq: _*),
          col("lsn")).as("w"))
        .select(col("w.*"))
      val outObs = Observation(s"merge-out-$epochId")
      val result = winner
        .withColumn(DeletedCol, col("op") === lit("D"))
        .drop("op")
        .withColumn(BucketCol, bucketExpr)
        .observe(outObs,
          count(lit(1)).as("keys"),
          sum(when(col(DeletedCol), 1L).otherwise(0L)).as("tombstones"))

      // --- write touched buckets (salted against hot-repo skew) ------------
      val newVersion = snapOpt.map(_.version + 1).getOrElse(0L)
      val outDir = s"${table.root}/data/v$newVersion"
      result
        .repartition(
          math.max(touched.size * saltBuckets, 1),
          col(BucketCol), pmod(xxhash64(col("path")), lit(saltBuckets)))
        .write
        .mode("overwrite")
        .option("compression", "zstd")
        .partitionBy(BucketCol)
        .parquet(outDir)

      // --- commit -----------------------------------------------------------
      val newFiles = table.listDataFiles(newVersion)
      val carried = snapOpt.map(_.filesNotIn(touched)).getOrElse(Seq.empty)
      val schemaVersion = snapOpt.map { s =>
        if (s.schema == physicalSchema) s.schemaVersion else s.schemaVersion + 1
      }.getOrElse(1)
      table.commitSnapshot(Snapshot(
        version = newVersion,
        schemaVersion = schemaVersion,
        schema = physicalSchema,
        numBuckets = numBuckets,
        epochs = snapOpt.map(_.epochs).getOrElse(Set.empty) + epochId,
        files = carried ++ newFiles
      ))

      val stats = MergeStats(epochId, newVersion, skipped = false,
        eventsIn = asLong(inObs.get, "n"),
        afterLsnDedup = asLong(dedupObs.get, "n"),
        keysWritten = asLong(outObs.get, "keys"),
        tombstonesWritten = asLong(outObs.get, "tombstones"),
        bucketsTouched = touched.size,
        durationMs = (System.nanoTime() - t0) / 1000000)
      if (recordMeta) Meta.record(table, stats, newVersion, epochId)
      stats
    } finally {
      deduped.unpersist()
    }
  }
}

/** Per-partition lineage + per-epoch metrics tables — the engine's
  * observability surface (reference analogue: atomic counters and cache
  * statistics, src/atp/mod.rs:67-72, src/places/place_index.rs:27-45).
  * Appended as small parquet tables under the lake root.
  */
object Meta {
  def record(table: LakeTable, stats: MergeStats, version: Long, epochId: Long): Unit = {
    val spark = table.spark
    import spark.implicits._
    // lineage: per bucket written this version → key count + lsn range
    spark.read
      .option("basePath", s"${table.root}/data/v$version")
      .parquet(s"${table.root}/data/v$version")
      .groupBy(col("b").cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_keys"), min("lsn").as("min_lsn"), max("lsn").as("max_lsn"))
      .withColumn("version", lit(version))
      .withColumn("epoch", lit(epochId))
      .coalesce(1)
      .write.mode("append").parquet(s"${table.root}/meta/lineage")
    Seq((epochId, version, stats.eventsIn, stats.afterLsnDedup, stats.keysWritten,
      stats.tombstonesWritten, stats.bucketsTouched, stats.durationMs))
      .toDF("epoch", "version", "events_in", "after_lsn_dedup", "keys_written",
        "tombstones_written", "buckets_touched", "duration_ms")
      .coalesce(1)
      .write.mode("append").parquet(s"${table.root}/meta/metrics")
  }

  def lineage(table: LakeTable): DataFrame =
    table.spark.read.parquet(s"${table.root}/meta/lineage")

  def metrics(table: LakeTable): DataFrame =
    table.spark.read.parquet(s"${table.root}/meta/metrics")
}
