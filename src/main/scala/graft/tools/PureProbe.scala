package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only pinned scaling probes (run via taskset'd bare JVM):
  * `PureProbe <cores> [phase]` — times one pipeline phase so the
  * non-scaling stage of the replay can be isolated. */
object PureProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val phase = if (args.length > 1) args(1) else "pure"
    val logDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_LOG", "")
    val spark = graft.BenchCdc.session(cpus)
    import spark.implicits._

    def events = spark.read.format(sys.env.getOrElse("SPARK_GRAFT_BENCH_FORMAT", "json"))
      .schema(graft.schema.SchemaRegistry.eventSchemaV1).load(s"$logDir/batch-00000")

    def run(): Unit = phase match {
      case "pure" =>
        spark.range(0, 30000000, 1, 64)
          .select(bit_xor(xxhash64(sha2(concat(lit("payload-"), $"id".cast("string")), 256))))
          .collect(): Unit
      case "read" => events.select(bit_xor(xxhash64($"lsn"))).collect(): Unit
      case "read_sha" => events
        .select(bit_xor(xxhash64(sha2($"content", 256)))).collect(): Unit
      case "exchange" => events
        .repartition(32, pmod(xxhash64($"repo"), lit(16)), pmod(xxhash64($"path"), lit(2)))
        .select(bit_xor(xxhash64($"lsn"))).collect(): Unit
      case "agg" => events
        .repartition(32, pmod(xxhash64($"repo"), lit(16)), pmod(xxhash64($"path"), lit(2)))
        .groupBy($"repo", $"path")
        .agg(max_by(struct(events.columns.map(col).toIndexedSeq: _*), $"lsn").as("w"))
        .select(bit_xor(xxhash64($"w.lsn"))).collect(): Unit
      case "agg2" =>
        import org.apache.spark.sql.expressions.Window
        val b = pmod(xxhash64($"repo"), lit(16)).cast("int")
        val slt = pmod(xxhash64($"path"), lit(2)).cast("int")
        val w = Window.partitionBy($"b", $"_salt", $"repo", $"path").orderBy($"lsn".desc)
        events
          .withColumn("b", b).withColumn("_salt", slt)
          .repartition(32, $"b", $"_salt")
          .withColumn("rn", row_number().over(w))
          .where($"rn" === 1)
          .select(bit_xor(xxhash64($"lsn"))).collect(): Unit
      case "write2" =>
        import org.apache.spark.sql.expressions.Window
        val out = s"/dev/shm/probe-write2-$cpus"
        graft.BenchCdc.rm(out)
        val b = pmod(xxhash64($"repo"), lit(16)).cast("int")
        val slt = pmod(xxhash64($"path"), lit(2)).cast("int")
        val w = Window.partitionBy($"b", $"_salt", $"repo", $"path").orderBy($"lsn".desc)
        events
          .withColumn("b", b).withColumn("_salt", slt)
          .repartition(32, $"b", $"_salt")
          .withColumn("rn", row_number().over(w))
          .where($"rn" === 1)
          .drop("rn", "_salt")
          .write.mode("overwrite").option("compression", "zstd")
          .partitionBy("b").parquet(out)
        graft.BenchCdc.rm(out)
      case "write" =>
        val out = s"/dev/shm/probe-write-$cpus"
        graft.BenchCdc.rm(out)
        events
          .withColumn("b", pmod(xxhash64($"repo"), lit(16)).cast("int"))
          .repartition(32, $"b", pmod(xxhash64($"path"), lit(2)))
          .groupBy($"b", $"repo", $"path")
          .agg(max_by(struct(events.columns.map(col).toIndexedSeq: _*), $"lsn").as("w"))
          .select($"b", $"w.*")
          .write.mode("overwrite").option("compression", "zstd")
          .partitionBy("b").parquet(out)
        graft.BenchCdc.rm(out)
    }
    // warmup then timed
    if (phase == "pure") {
      spark.range(0, 2000000, 1, 64)
        .select(bit_xor(xxhash64(sha2(concat(lit("x"), $"id".cast("string")), 256)))).collect()
    } else run()
    val t0 = System.nanoTime()
    run()
    println(f"""{"cores":$cpus,"phase":"$phase","secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    spark.stop()
  }
}
