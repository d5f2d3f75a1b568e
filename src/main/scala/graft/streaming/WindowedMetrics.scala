package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Event-time tumbling-window aggregation over a stream — the engine's
  * metrics stream (SURVEY §2.8: "watermark on event ts; tumbling window
  * for metrics"). Append mode + watermark ⇒ a window row is emitted
  * exactly once, when the watermark passes its end.
  */
object WindowedMetrics {

  /** Stream hourly per-type counts/sums from a parquet events directory
    * into `outDir`; watermark bounds state and late data. */
  def run(spark: SparkSession, eventsDir: String, outDir: String, checkpoint: String,
          window: String = "1 hour", watermark: String = "30 minutes",
          maxFilesPerTrigger: Int = 4): Unit = {
    val schema = spark.read.parquet(eventsDir).schema
    val agg = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp_ltz"))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))
      .select(col("window.start").cast("long").as("window_start_sec"),
        col("event_type"), col("n"), round(col("sum_value"), 6).as("sum_value"))
    val q = agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Batch reference of the same aggregation (all windows). */
  def batch(spark: SparkSession, eventsDir: String, window: String = "1 hour"): DataFrame =
    spark.read.parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp_ltz"))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))
      .select(col("window.start").cast("long").as("window_start_sec"),
        col("event_type"), col("n"), round(col("sum_value"), 6).as("sum_value"))
}
