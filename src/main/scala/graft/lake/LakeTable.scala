package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.charset.StandardCharsets

/** A snapshot of the lake table: an immutable manifest of data files plus
  * the committed-epoch ledger and the schema version.
  *
  * Commit protocol: a snapshot file `_snapshots/v{N}` is written to a tmp
  * path and atomically renamed into place; the CURRENT snapshot is simply
  * the highest N present. Rename-if-absent makes the commit atomic and
  * makes concurrent-writer conflicts detectable (the second rename fails).
  * This is the reference pipeline's exists-check + tmp-file + atomic-rename
  * checkpoint protocol (reference: src/osm/filter.rs:381-398 "renaming is an
  * atomic operation"; src/atp/mod.rs:84; src/pipeline/edits.rs:192) promoted
  * to a versioned table format.
  *
  * Exactly-once: `epochs` is the set of already-applied ingest epoch ids;
  * re-delivering a committed epoch is a no-op (idempotent sink). The
  * reference's per-stage "output exists → skip" check is the same idea at
  * stage granularity (src/pipeline/mod.rs:29-48).
  */
final case class FileEntry(bucket: Int, relPath: String)

final case class Snapshot(
    version: Long,
    schemaVersion: Int,
    schema: StructType,
    numBuckets: Int,
    epochs: Set[Long],
    files: Seq[FileEntry]
) {
  def filesIn(buckets: Set[Int]): Seq[FileEntry] = files.filter(f => buckets(f.bucket))
  def filesNotIn(buckets: Set[Int]): Seq[FileEntry] = files.filterNot(f => buckets(f.bucket))
}

object Snapshot {
  private val Header = "graft-snapshot v1"

  /** Root fields without the file list (shared by the inline and
    * manifest-split serializations). */
  private[lake] def serializeHeader(s: Snapshot): String = {
    val sb = new StringBuilder
    sb.append(Header).append('\n')
    sb.append("version=").append(s.version).append('\n')
    sb.append("schemaVersion=").append(s.schemaVersion).append('\n')
    sb.append("numBuckets=").append(s.numBuckets).append('\n')
    sb.append("epochs=").append(s.epochs.toSeq.sorted.mkString(",")).append('\n')
    sb.append("schema=").append(s.schema.json).append('\n')
    sb.toString
  }

  private[lake] def serializeFileLines(files: Seq[FileEntry]): String = {
    val sb = new StringBuilder
    files.sortBy(f => (f.bucket, f.relPath)).foreach { f =>
      sb.append("file=").append(f.bucket).append('\t').append(f.relPath).append('\n')
    }
    sb.toString
  }

  def serialize(s: Snapshot): String =
    serializeHeader(s) + serializeFileLines(s.files)

  private[lake] def parseFileLines(text: String): Seq[FileEntry] =
    text.split('\n').filter(_.startsWith("file=")).toSeq.map { ln =>
      val v = ln.stripPrefix("file=")
      val t = v.indexOf('\t')
      FileEntry(v.substring(0, t).toInt, v.substring(t + 1))
    }

  private[lake] def manifestRefs(text: String): Seq[(Int, String)] =
    text.split('\n').filter(_.startsWith("manifest=")).toSeq.map { ln =>
      val v = ln.stripPrefix("manifest=")
      val t = v.indexOf('\t')
      (v.substring(0, t).toInt, v.substring(t + 1))
    }

  def deserialize(text: String): Snapshot = {
    val lines = text.split('\n')
    require(lines.nonEmpty && lines(0) == Header, s"bad snapshot header: ${lines.headOption}")
    var version = -1L; var schemaVersion = -1; var numBuckets = -1
    var epochs = Set.empty[Long]; var schema: StructType = null
    val files = Seq.newBuilder[FileEntry]
    lines.drop(1).filter(_.nonEmpty).foreach { ln =>
      val i = ln.indexOf('=')
      val (k, v) = (ln.substring(0, i), ln.substring(i + 1))
      k match {
        case "version" => version = v.toLong
        case "schemaVersion" => schemaVersion = v.toInt
        case "numBuckets" => numBuckets = v.toInt
        case "epochs" => if (v.nonEmpty) epochs = v.split(',').map(_.toLong).toSet
        case "schema" => schema = DataType.fromJson(v).asInstanceOf[StructType]
        case "file" =>
          val t = v.indexOf('\t')
          files += FileEntry(v.substring(0, t).toInt, v.substring(t + 1))
        case _ => // forward-compatible: ignore unknown keys
      }
    }
    Snapshot(version, schemaVersion, schema, numBuckets, epochs, files.result())
  }
}

/** The lake table: bucketed Parquet data files + snapshot manifests.
  *
  * Layout:
  * {{{
  *   <root>/_snapshots/v{N}          snapshot manifests (highest N = current)
  *   <root>/data/v{N}/b={bucket}/    data files written by commit N
  * }}}
  *
  * Data is hash-bucketed by `pmod(xxhash64(repo), numBuckets)` so a MERGE
  * only rewrites the buckets that contain changed keys — the reference's
  * row-group min/max pruning (src/places/place_index.rs:217-221) reborn as
  * bucket pruning. At 100 TB / 1000 executors, numBuckets is sized so one
  * bucket ≈ a few GB; here it defaults small for local testing.
  */
final class LakeTable(
    val spark: SparkSession,
    val root: String,
    /** Split the file list into per-bucket-group manifest files once it
      * exceeds this many entries. Manifests are CONTENT-ADDRESSED
      * (g<group>-<sha16>.manifest): a commit touching k buckets rewrites
      * only the ≤k affected groups' manifests — every other group's
      * manifest already exists under the same name and is referenced for
      * free. Commit IO therefore tracks CHANGE volume, not table size
      * (the Iceberg manifest-list idea; SURVEY §9's B≫10⁵ limit). The
      * default keeps small tables on the simpler inline form. */
    val manifestSplitThreshold: Int = 4096,
    /** Bucket-group count for split manifests (group = bucket % this).
      * Size so one group ≈ a few thousand file entries at the target
      * bucket count. */
    val manifestGroupCount: Int = 64) {
  import LakeTable._

  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(hconf)

  def snapshotDir: Path = new Path(root, "_snapshots")
  def manifestDir: Path = new Path(root, "_snapshots/manifests")

  private def readText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
    new String(bytes, StandardCharsets.UTF_8)
  }

  /** Parse a snapshot root; a split root (manifest= lines) loads its
    * group manifests to rebuild the full file list. */
  private def readSnapshotFile(f: FileSystem, p: Path): Snapshot = {
    val text = readText(f, p)
    val base = Snapshot.deserialize(text) // ignores manifest= lines
    val refs = Snapshot.manifestRefs(text)
    if (refs.isEmpty) base
    else base.copy(files = refs.flatMap { case (_, name) =>
      Snapshot.parseFileLines(readText(f, new Path(manifestDir, name)))
    })
  }

  /** Highest committed snapshot, or None if the table is empty. */
  def currentSnapshot(): Option[Snapshot] = {
    val dir = snapshotDir
    val f = fs
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong)
    if (versions.isEmpty) None
    else Some(readSnapshotFile(f, new Path(dir, s"v${versions.max}")))
  }

  /** Serialize with per-group content-addressed manifests; writes any
    * missing manifest files, returns the root text. */
  private def serializeSplit(snap: Snapshot, f: FileSystem): String = {
    f.mkdirs(manifestDir)
    val groups = snap.files.groupBy(_.bucket % manifestGroupCount)
    val refs = groups.toSeq.sortBy(_._1).map { case (gid, entries) =>
      val body = Snapshot.serializeFileLines(entries)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(body.getBytes(StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
      val name = s"g$gid-$digest.manifest"
      val dst = new Path(manifestDir, name)
      if (!f.exists(dst)) {
        val tmp = new Path(manifestDir,
          s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
        val out = f.create(tmp, true)
        try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
        if (!f.rename(tmp, dst)) {
          // a concurrent writer landed the identical content first — fine
          f.delete(tmp, false)
          require(f.exists(dst), s"manifest write failed for $name")
        }
      }
      (gid, name)
    }
    Snapshot.serializeHeader(snap) +
      refs.map { case (gid, name) => s"manifest=$gid\t$name" }.mkString("", "\n", "\n")
  }

  /** Atomically publish `snap` as version `snap.version`.
    * Fails if that version already exists (conflict detection). */
  def commitSnapshot(snap: Snapshot): Unit = {
    val f = fs
    f.mkdirs(snapshotDir)
    val body =
      if (snap.files.size <= manifestSplitThreshold) Snapshot.serialize(snap)
      else serializeSplit(snap, f)
    val tmp = new Path(snapshotDir, s".v${snap.version}.tmp")
    val dst = new Path(snapshotDir, s"v${snap.version}")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, dst)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"snapshot commit conflict: ${dst} already exists (concurrent writer?)")
    }
  }

  /** The manifest names referenced by the given committed version. */
  private[graft] def manifestRefsOf(version: Long): Seq[String] = {
    val f = fs
    Snapshot.manifestRefs(readText(f, new Path(snapshotDir, s"v$version"))).map(_._2)
  }

  /** All manifest file names present on disk. */
  private[graft] def manifestFileNames(): Seq[String] = {
    val f = fs
    if (!f.exists(manifestDir)) Seq.empty
    else f.listStatus(manifestDir).filter(_.isFile).map(_.getPath.getName)
      .filter(_.endsWith(".manifest")).toSeq
  }

  private[graft] def deleteManifest(name: String): Unit = {
    fs.delete(new Path(manifestDir, name), false): Unit
  }

  /** List the parquet part-files Spark wrote under `data/<dirName>`, as
    * (bucket, rel). Writers use unique version-uuid dir names so
    * concurrent/crashed writers never share a directory; the snapshot
    * manifest records the paths, so physical dir naming is free. */
  def listDataFiles(dirName: String): Seq[FileEntry] = {
    val f = fs
    val base = new Path(root, s"data/$dirName")
    if (!f.exists(base)) return Seq.empty
    f.listStatus(base).filter(_.isDirectory).flatMap { bdir =>
      val bucket = bdir.getPath.getName.stripPrefix("b=").toInt
      f.listStatus(bdir.getPath)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => FileEntry(bucket, s"data/$dirName/b=$bucket/${s.getPath.getName}"))
    }.toSeq
  }

  /** Data directory names currently present under `data/`. */
  def dataDirNames(): Seq[String] = {
    val f = fs
    val base = new Path(root, "data")
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** All committed snapshot versions (ascending). */
  def snapshotVersions(): Seq[Long] = {
    val f = fs
    if (!f.exists(snapshotDir)) Seq.empty
    else f.listStatus(snapshotDir).map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toLong).sorted.toSeq
  }

  /** Delete a data directory (vacuum support). */
  private[graft] def deleteDataDir(dirName: String): Unit = {
    fs.delete(new Path(root, s"data/$dirName"), true): Unit
  }

  private def absolute(e: FileEntry): String = s"$root/${e.relPath}"

  /** Raw state rows (including tombstones) of the given files. Old files
    * lacking newly-evolved columns are read with the snapshot schema so the
    * missing columns surface as nulls (the reference's tolerant reader,
    * src/places/place_index.rs:359-370, done by Spark's parquet reader). */
  def readFiles(schema: StructType, entries: Seq[FileEntry]): DataFrame =
    if (entries.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(entries.map(absolute): _*)

  /** The current visible table state: tombstones filtered out. */
  def read(): DataFrame = {
    val snap = currentSnapshot().getOrElse(
      throw new IllegalStateException(s"no snapshot at $root"))
    readFiles(snap.schema, snap.files)
      .where(!org.apache.spark.sql.functions.col(DeletedCol))
      .drop(DeletedCol)
  }

  /** The committed snapshot with exactly this version (time travel). */
  def snapshotAt(version: Long): Snapshot =
    readSnapshotFile(fs, new Path(snapshotDir, s"v$version"))

  /** Visible state as of a past snapshot version (time travel). */
  def readVersion(version: Long): DataFrame = {
    val snap = snapshotAt(version)
    readFiles(snap.schema, snap.files)
      .where(!org.apache.spark.sql.functions.col(DeletedCol))
      .drop(DeletedCol)
  }
}

object LakeTable {
  /** Tombstone marker column in the physical state files. Tombstones keep
    * deletes idempotent under redelivered duplicates: a re-applied old
    * upsert for a key deleted at a higher lsn loses the lsn argmax against
    * the tombstone instead of resurrecting the key. */
  val DeletedCol = "_deleted"
}
