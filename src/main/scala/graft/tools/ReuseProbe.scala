package graft.tools

/** Dev tool: does a query's EXECUTED plan reuse exchanges? Prints the
  * count of ReusedExchange / Exchange / parquet-scan nodes after running
  * the query (AQE folds reuse in at runtime, so static explain can lie).
  * Usage: runMain graft.tools.ReuseProbe <query> [sfDir] */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.BenchCdc.session(8)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
      val self = p.nodeName
      val kids = p.children.flatMap(collectAll) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          collectAll(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          collectAll(q.plan)
        case _ => Seq.empty
      })
      self +: kids
    }
    val nodes = collectAll(plan)
    val counts = nodes.groupBy(identity).view.mapValues(_.size).toMap
    Seq("ReusedExchange", "Exchange", "BroadcastExchange", "Scan parquet", "Generate")
      .foreach(k => println(
        s"$k=${counts.collect { case (n, c) if n.startsWith(k) => c }.sum}"))
    spark.stop()
  }
}
