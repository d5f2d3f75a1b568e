package graft.tools

import graft.lake.LakeTable
import org.apache.spark.sql.functions._

/** Read-throughput probe: format("graft") row reader vs Spark's native
  * vectorized parquet scan over the same files. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("scanprobe")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
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
    spark.stop()
  }
}
