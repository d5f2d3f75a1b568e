package graft

import org.apache.spark.sql.SparkSession

/** The ONE master-detection + base-session builder for the driver-contract
  * mains (Verify / Bench / BenchCdc). The cluster-passthrough contract —
  * honor an externally-provided master (spark-submit --master sets the
  * spark.master system property; some launchers export MASTER) so the
  * same mains run unchanged on a real cluster, defaulting to local[cpus]
  * in the sandbox — lived as three hand-copied snippets that had already
  * drifted (Verify used the raw env STRING as the core count and half the
  * shuffle partitions). */
object Sessions {
  def builder(appName: String, cpus: Int): SparkSession.Builder = {
    val b0 = SparkSession.builder()
    val b1 = if (sys.props.contains("spark.master") || sys.env.contains("MASTER")) b0
             else b0.master(s"local[$cpus]")
    b1.appName(appName)
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
  }
}
