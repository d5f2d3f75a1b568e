package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator-demo queries over the driver's TPC-H-ish tables, each paired
  * with a DuckDB-equivalent oracle (SparkEntry contract).
  *
  * Conventions for oracle parity:
  *  - every computed column is aliased IDENTICALLY in Spark and SQL;
  *  - monetary/quantity aggregates are summed in DECIMAL (exact, order-
  *    independent) and cast to DOUBLE at the end — bit-stable at any
  *    parallelism, matching DuckDB exactly;
  *  - window tie-breaks always include a unique key.
  *
  * Scale notes are on each query; dimension tables are broadcast.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---------------------------------------------------------------------
  // Aggregations (SURVEY §2.4)
  // ---------------------------------------------------------------------

  /** A8/A2-style grand aggregate: TPC-H Q1 shape. One hash-agg exchange on
    * low-cardinality keys; partial aggregation makes the shuffle tiny. */
  private def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
        sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc"),
        count(lit(1)).as("n_rows"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Join chain + agg: orders ⋈ customer ⋈ nation (broadcast dims). */
  private def q2RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  private val q2Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |            JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // Windows / argmax / dedup-by-key (SURVEY A1, A5, O2)
  // ---------------------------------------------------------------------

  /** Top-3 per group with deterministic tie-break (SURVEY A5 keep-first). */
  private def q3TopPartsPerBrand(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    t(s, dir, "part")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("rn"))
  }

  private val q3Sql =
    """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      |  FROM part) WHERE rn <= 3""".stripMargin

  /** Argmax per key via max_by — the engine's LWW primitive (SURVEY A1),
    * CDC-flavored: latest event per user from the events stream table. */
  private def q4LatestEventPerUser(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("event_id"), col("event_type")), col("event_id")).as("w"))
      .select(col("user_id"), col("w.event_id").as("event_id"), col("w.event_type").as("event_type"))

  private val q4Sql =
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------------
  // Semi / anti joins (SURVEY J3/J9, U3)
  // ---------------------------------------------------------------------

  private def q5SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").where(col("o_totalprice") > 200000.0)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  private val q5Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)""".stripMargin

  private def q6AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").where(col("o_totalprice") > 300000.0)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  private val q6Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin

  // ---------------------------------------------------------------------
  // Deduplication + text analysis (training-data ops)
  // ---------------------------------------------------------------------

  /** Exact dedup: canonical representative (min id) per identical text —
    * hash-groupBy dedup; at 100 TB, group on sha2(text) instead of the
    * raw text to keep shuffle rows narrow. */
  private def q7DedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(sha2(col("text"), 256).as("text_sha"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))

  private val q7Sql =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text""".stripMargin

  /** Text stats: char length + whitespace-token proxy, portable to DuckDB. */
  private def q8TextStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("len"),
        (length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit("")))).as("n_spaces"),
        col("lang"))

  private val q8Sql =
    """SELECT doc_id, LENGTH(text) AS len,
      |  LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces,
      |  lang
      |FROM documents""".stripMargin

  /** Tumbling-window event aggregation (batch view of the streaming agg). */
  private def q9EventWindowAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))

  private val q9Sql =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q36: rollup subtotal lattice with grouping id — not in the reference
    * (SURVEY §2.4 "not present: grouping sets/cube/rollup"), but table
    * stakes for an analytics engine and free in Spark: the rollup
    * expands to grouping sets BEFORE the exchange, so partial aggregation
    * still collapses the shuffle; null group keys are coalesced to a
    * sentinel so subtotal rows compare exactly. */
  private def q36Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
        col("gid"), col("sum_qty"), col("n"))

  private val q36Sql =
    """SELECT coalesce(l_returnflag, '(all)') AS rflag,
      |  coalesce(l_linestatus, '(all)') AS lstatus,
      |  GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] =
    TextOps.all ++ DedupOps.all ++ AnnOps.all ++ RelOps.all ++ MediaOps.all ++ GeoOps.all ++ TagOps.all ++ PathOps.all ++ Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_revenue_by_nation" -> (q2RevenueByNation _),
    "q3_top_parts_per_brand" -> (q3TopPartsPerBrand _),
    "q4_latest_event_per_user" -> (q4LatestEventPerUser _),
    "q5_semi_join" -> (q5SemiJoin _),
    "q6_anti_join" -> (q6AntiJoin _),
    "q7_dedup_exact" -> (q7DedupExact _),
    "q8_text_stats" -> (q8TextStats _),
    "q9_event_window_agg" -> (q9EventWindowAgg _),
    "q36_rollup" -> (q36Rollup _)
  )

  val oracles: Map[String, String] =
    TextOps.oracles ++ DedupOps.oracles ++ AnnOps.oracles ++ RelOps.oracles ++ MediaOps.oracles ++ GeoOps.oracles ++ TagOps.oracles ++ PathOps.oracles ++ Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_revenue_by_nation" -> q2Sql,
    "q3_top_parts_per_brand" -> q3Sql,
    "q4_latest_event_per_user" -> q4Sql,
    "q5_semi_join" -> q5Sql,
    "q6_anti_join" -> q6Sql,
    "q7_dedup_exact" -> q7Sql,
    "q8_text_stats" -> q8Sql,
    "q9_event_window_agg" -> q9Sql,
    "q36_rollup" -> q36Sql
  )
}
