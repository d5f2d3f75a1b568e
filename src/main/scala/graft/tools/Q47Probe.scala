package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{fns}

/** Dev tool: interleaved A/B of q47's two per-gram-count plans —
  * (a) groupBy+self-join (hash agg both sides, two gram exchanges),
  * (b) count-over-window (one gram exchange + sort).
  * Usage: runMain graft.tools.Q47Probe [sfDir] [rounds] */
object Q47Probe {
  val DupSpanK = graft.ops.DedupOps.DupSpanK

  private def grams(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
      explode(fns.wordShingles(fns.wsTokens(col("text")), DupSpanK)).as("gram"))

  def joinForm(s: SparkSession, dir: String): DataFrame = {
    val pairs = grams(s, dir).groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val gramDocs = pairs.groupBy(col("gram")).agg(count(lit(1)).as("nd"))
    pairs.join(gramDocs, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_spans"),
        sum(when(col("nd") >= 2, col("c")).otherwise(0L)).as("n_dup_spans"))
  }

  def windowForm(s: SparkSession, dir: String): DataFrame = {
    val pairs = grams(s, dir).groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val wG = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    pairs.withColumn("nd", count(lit(1)).over(wG))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_spans"),
        sum(when(col("nd") >= 2, col("c")).otherwise(0L)).as("n_dup_spans"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = graft.BenchCdc.session(32)
    def time(tag: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"""{"variant":"$tag","secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    // warmup both once
    time("warm-join", joinForm(spark, sfDir))
    time("warm-window", windowForm(spark, sfDir))
    (1 to rounds).foreach { _ =>
      time("join", joinForm(spark, sfDir))
      time("window", windowForm(spark, sfDir))
    }
    spark.stop()
  }
}
