package graft.tools

import graft.lake.{LakeTable, Maintenance}
import org.apache.spark.sql.functions._

/** Point-lookup probe: manifest key-range file pruning (format("graft")
  * over a byte-budget-compacted table) vs the same lookup over the full
  * file listing (native parquet scan, row-group skipping only). The
  * interesting number is planned files / tasks — the latency gap follows
  * from it and grows with table size. */
object KeyPruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("keypruneprobe")
      .config("spark.sql.shuffle.partitions", "8")
      // UTC like every graft session (Sessions.builder): the replayed
      // timestamps must not depend on the probe host's timezone
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = "/dev/shm/graft-keyprune"
    graft.BenchCdc.rm(work)
    graft.gen.ChangeGen.writeLog(spark,
      graft.gen.GenConfig(nEvents = 2000000L, nRepos = 500, pathsPerRepo = 400),
      s"$work/log", nBatches = 1, partitions = 16)
    val table = new LakeTable(spark, s"$work/table")
    graft.ingest.BatchReplay.replay(spark, s"$work/log", table,
      numBuckets = 8, saltBuckets = 2, recordMeta = false)
    // split each bucket into ~8 key-disjoint files
    val bytes = table.currentSnapshot().get.allFiles.map(f => math.max(f.nBytes, 0L)).sum
    Maintenance.compact(table, maxFilesPerBucket = 1, targetFileBytes = bytes / 64): Unit
    val snap = table.currentSnapshot().get
    val files = snap.allFiles
    println(s"PROBE layout files=${files.size} buckets=${snap.numBuckets} " +
      s"keyStats=${files.count(_.hasKeyStats)}")

    val probe = table.read().select("repo", "path").orderBy(xxhash64(col("repo"), col("path")))
      .limit(1).head
    val (repo, path) = (probe.getString(0), probe.getString(1))

    def planned(df: org.apache.spark.sql.DataFrame): String =
      "files=(\\d+)".r.findFirstMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1)).getOrElse("?")
    def time(tag: String, extra: String)(f: => Long): Unit =
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $tag rep$i rows=$n $extra secs=${(System.nanoTime() - t0) / 1e9}%.3f")
      }

    val pruned = spark.read.format("graft").load(table.root)
      .where(col("repo") === repo && col("path") === path)
    time("graft-keypruned", s"planned=${planned(pruned)}") {
      spark.read.format("graft").load(table.root)
        .where(col("repo") === repo && col("path") === path).count()
    }
    val dirs = files.map(f => s"${table.root}/${f.relPath}")
    time("native-all-files", s"planned=${dirs.size}") {
      spark.read.parquet(dirs: _*)
        .where(col("repo") === repo && col("path") === path && !col("_deleted")).count()
    }
    spark.stop()
  }
}
