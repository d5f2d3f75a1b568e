package graft.tools

import graft.lake.LakeTable
import org.apache.spark.sql.functions._

/** Read-throughput probe: format("graft") row reader vs Spark's native
  * vectorized parquet scan over the same files. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("scanprobe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = "/dev/shm/graft-scanprobe"
    graft.BenchCdc.rm(work)
    graft.gen.ChangeGen.writeLog(spark,
      graft.gen.GenConfig(nEvents = 2000000L, nRepos = 500, pathsPerRepo = 400),
      s"$work/log", nBatches = 1, partitions = 16)
    val table = new LakeTable(spark, s"$work/table")
    graft.ingest.BatchReplay.replay(spark, s"$work/log", table,
      numBuckets = 8, saltBuckets = 2, recordMeta = false)
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $tag rep$i rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    val dirs = table.currentSnapshot().get.allFiles.map(f => s"${table.root}/${f.relPath}")
    time("native-parquet") {
      spark.read.parquet(dirs: _*).where(!col("_deleted"))
        .agg(sum(length(col("path"))), count(lit(1))).head; spark.read.parquet(dirs: _*).where(!col("_deleted")).count()
    }
    time("graft-dsv2") {
      val df = spark.read.format("graft").load(table.root)
      df.agg(sum(length(col("path"))), count(lit(1))).head; df.count()
    }

    // ---- wide binary-heavy leg (q28-shaped: media bytes + metadata) ----
    // The decode-bound shape: ~8 KB binary payload per row. This is where
    // the vectorized columnar path must match Spark's native scan (the
    // row-at-a-time Group decode pays an object tree per row here).
    import spark.implicits._
    val nMedia = 200000
    val media = spark.range(nMedia.toLong).select(
      col("id").as("lsn"),
      lit("U").as("op"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("ts"),
      concat(lit("repo-"), col("id") % 500).as("repo"),
      concat(lit("media/"), col("id"), lit(".bin")).as("path"),
      lit("c0").as("commit"),
      // deterministic pseudo-random 8 KB payload, unique per row
      repeat(sha2(conv(col("id").cast("string"), 10, 16), 512), 64)
        .cast("binary").as("payload"),
      (col("id") % 1000000).cast("int").as("width"))
    val mediaTable = new LakeTable(spark, s"$work/media")
    new graft.merge.MergeInto(mediaTable, numBuckets = 8, saltBuckets = 1,
      recordMeta = false).apply(media, 1L)
    val mdirs = mediaTable.currentSnapshot().get.allFiles
      .map(f => s"${mediaTable.root}/${f.relPath}")
    def mediaAgg(df: org.apache.spark.sql.DataFrame): Long = {
      df.agg(sum(length(col("payload"))), sum(col("width").cast("long")))
        .head; df.count()
    }
    time("media-native-parquet") {
      mediaAgg(spark.read.parquet(mdirs: _*).where(!col("_deleted")))
    }
    time("media-graft-columnar") {
      mediaAgg(spark.read.format("graft").load(mediaTable.root))
    }
    time("media-graft-row") {
      mediaAgg(spark.read.format("graft").option("columnar", "false")
        .load(mediaTable.root))
    }
    spark.stop()
  }
}
