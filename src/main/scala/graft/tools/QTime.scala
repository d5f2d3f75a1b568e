package graft.tools

/** Dev tool: time one operator query by name. Usage:
  * runMain graft.tools.QTime <query> [sfDir] [reps] — prints secs per rep
  * and the formatted plan when SPARK_GRAFT_EXPLAIN=1. */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.BenchCdc.session(32)
    val fn = graft.SparkEntry.queries(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"""{"query":"$name","rep":$i,"secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    spark.stop()
  }
}
