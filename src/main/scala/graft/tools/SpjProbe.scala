package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Storage-partitioned-join measurement: two co-bucketed catalog tables
  * joined on repo, with spark.sql.sources.v2.bucketing.enabled off/on.
  * Reports wall seconds and total shuffle-write bytes per run. */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val wh = "/dev/shm/graft-spj/wh"
    graft.BenchCdc.rm("/dev/shm/graft-spj")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("spjprobe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.g", classOf[graft.lake.dsv2.GraftCatalog].getName)
      .config("spark.sql.catalog.g.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
    })

    // two tables, same 16-bucket layout, ~380k-row states from 2M events each
    Seq("a", "b").foreach { t =>
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS g.db")
      spark.sql(s"CREATE TABLE g.db.$t (lsn BIGINT, ts TIMESTAMP, repo STRING, " +
        "path STRING, commit STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='16')")
      val work = s"/dev/shm/graft-spj/gen_$t"
      graft.gen.ChangeGen.writeLog(spark,
        graft.gen.GenConfig(seed = if (t == "a") 1L else 2L, nEvents = 2000000L,
          nRepos = 2000, pathsPerRepo = 200),
        s"$work/log", nBatches = 1, partitions = 16)
      graft.ingest.BatchReplay.replay(spark, s"$work/log",
        new graft.lake.LakeTable(spark, s"$wh/db/$t"),
        numBuckets = 16, saltBuckets = 2, recordMeta = false)
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def run(tag: String): Unit = (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val r = spark.sql("SELECT a.repo, count(*) AS n " +
        "FROM g.db.a a JOIN g.db.b b ON a.repo = b.repo GROUP BY a.repo")
        .agg(sum(col("n")), count(lit(1))).head
      val secs = (System.nanoTime() - t0) / 1e9 // BEFORE the drain sleep:
      // the listener wait is instrumentation, not workload
      Thread.sleep(300) // let stage-completed events drain
      println(f"PROBE $tag rep$i secs=$secs%.2f " +
        s"shuffleBytes=${shuffleBytes.get} out=$r")
    }
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    run("spj-off")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    run("spj-on")
    spark.stop()
  }
}
