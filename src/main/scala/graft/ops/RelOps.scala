package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator demos for the SURVEY.md §2 inventory pieces not yet covered by
  * q1–q9: run-length grouping (A4), as-of best-match join (J1/A1 in time
  * rather than space), interval/range join (J8), transitive ancestor
  * closure (J5), map tag-diff (J7), bitmask classification (F4/F5),
  * geo scalar functions (C1–C9), and the CDC LWW merge as a plain query.
  */
object RelOps {

  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  // -------------------------------------------------------------------
  // q20: run-length grouping over a sorted stream (SURVEY A4 — the
  // reference's RLE coverage encoder, src/coverage.rs:523-558, as the
  // classic lag→run-id window pattern).
  // -------------------------------------------------------------------
  def q20Rle(s: SparkSession, dir: String): DataFrame = {
    val minutes = events(s, dir)
      .select(col("event_type"),
        (floor(col("ts").cast("timestamp_ltz").cast("long") / 60)).as("minute"))
      .distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("minute"))
    minutes
      .withColumn("is_new", when(col("minute") === lag(col("minute"), 1).over(w) + 1, 0).otherwise(1))
      .withColumn("run_id", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("event_type"), col("run_id"))
      .agg(min(col("minute")).as("run_start"), count(lit(1)).as("run_len"))
      .select(col("event_type"), col("run_start"), col("run_len"))
  }

  val q20Sql: String =
    """WITH m AS (
      |  SELECT DISTINCT event_type, CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute
      |  FROM events),
      |r AS (
      |  SELECT event_type, minute,
      |    SUM(is_new) OVER (PARTITION BY event_type ORDER BY minute
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      |  FROM (
      |    SELECT event_type, minute,
      |      CASE WHEN minute = lag(minute, 1) OVER (PARTITION BY event_type ORDER BY minute) + 1
      |           THEN 0 ELSE 1 END AS is_new
      |    FROM m))
      |SELECT event_type, MIN(minute) AS run_start, COUNT(*) AS run_len
      |FROM r GROUP BY event_type, run_id""".stripMargin

  // -------------------------------------------------------------------
  // q21: as-of join — for each purchase, the most recent STRICTLY prior
  // click of the same user (SURVEY J1's best-match argmax in the time
  // dimension). Implemented as a single sort-window pass (no range
  // explosion): at 100 TB this is one shuffle on user_id + in-partition
  // sort, vs. an O(clicks×purchases) range join.
  // -------------------------------------------------------------------
  def q21AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("prior_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .withColumn("prior_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase" && col("prior_click_ts").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").cast("timestamp_ltz").cast("long").as("purchase_sec"),
        col("prior_click_id"),
        col("prior_click_ts").cast("timestamp_ltz").cast("long").as("prior_click_sec"))
  }

  val q21Sql: String =
    """SELECT event_id AS purchase_id, user_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS purchase_sec,
      |  prior_click_id,
      |  CAST(floor(epoch(prior_click_ts)) AS BIGINT) AS prior_click_sec
      |FROM (
      |  SELECT event_id, user_id, event_type, ts,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_ts,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_id
      |  FROM events WHERE event_type IN ('click', 'purchase'))
      |WHERE event_type = 'purchase' AND prior_click_ts IS NOT NULL""".stripMargin

  // -------------------------------------------------------------------
  // q22: interval/range join (SURVEY J8 — point-in-interval coverage
  // probe): events probed against a broadcast interval table. The small
  // side is always broadcast → no shuffle of the big side.
  // -------------------------------------------------------------------
  def q22RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val intervals = s.range(10)
      .select(col("id").cast("int").as("band"),
        (col("id") * 50.0).as("lo"), (col("id") * 50.0 + 30.0).as("hi"))
    events(s, dir).join(broadcast(intervals),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(25,6)")).cast("double"), 4).as("sum_value"))
      .select(col("band"), col("n"), col("sum_value"))
  }

  val q22Sql: String =
    """WITH iv AS (
      |  SELECT CAST(range AS INT) AS band, range * 50.0 AS lo, range * 50.0 + 30.0 AS hi
      |  FROM range(10))
      |SELECT band, COUNT(*) AS n,
      |  round(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 4) AS sum_value
      |FROM events JOIN iv ON value >= lo AND value < hi
      |GROUP BY band""".stripMargin

  // -------------------------------------------------------------------
  // q23: transitive ancestor closure (SURVEY J5 — relation parent-chain
  // walk, src/osm/mod.rs:391-435) as an iterative frontier⋈edges loop to
  // fixpoint. Edges: p_partkey → p_partkey >> 1 (deterministic binary
  // tree). Depth is bounded by log2(maxKey) ≈ 15-18, matching the
  // reference's bounded relation-graph depth.
  // -------------------------------------------------------------------
  /** Generic cycle-safe transitive closure by PATH DOUBLING: depth d is
    * reached in ⌈log₂ d⌉ driver iterations instead of d (the sequential
    * BFS loop was this operator's latency floor — ~18 rounds for q23's
    * binary tree; this runs 5-6). Semantics match the reference's
    * `parent_chain` walk with visited-set cycle detection
    * (`osm/mod.rs:391-435`): every reachable (node, ancestor) pair is
    * emitted exactly once, at its MINIMAL depth, and cyclic graphs
    * terminate.
    *
    * `edges(child, parent)` — one parent per child in the reference
    * (HashMap child→parent); multi-parent inputs are also handled (the
    * per-iteration min-depth aggregate collapses equal pairs reached by
    * different paths, which the old frontier anti-join missed within an
    * iteration). `seeds(node, ancestor, depth)` must be the depth-1
    * direct-parent pairs.
    *
    * Loop invariants, for iteration k (span = 2^k):
    *   - `jump` holds every exactly-2^k-step (src, dst) pair;
    *   - `acc` holds every reachable pair with min depth ≤ 2^k, AT its
    *     min depth: a pair at depth d' ∈ (2^k, 2^(k+1)] decomposes as
    *     d' − 2^k ≤ 2^k steps (already in acc, possibly at an even
    *     smaller depth — composing from there only shrinks d') plus one
    *     2^k jump, so `acc ⋈ jump` plus a min-depth groupBy advances the
    *     invariant.
    * Termination: BFS layers from a source are contiguous, so if no new
    *   pair appears in an iteration the closure is complete — and the
    *   same argument makes every recorded depth minimal at that point.
    * Each iteration shuffles O(|closure|) rows; localCheckpoint keeps
    * plans flat; the driver carries only handles and two counters. */
  def closure(edges: DataFrame, seeds: DataFrame, maxIter: Int = 30): DataFrame = {
    // depth uses IntegerType and the jump spans 2^k, so k is hard-capped
    // at 30 regardless of maxIter; a closure that has not converged by
    // then fails LOUDLY below instead of returning a silent prefix
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    var jump = edges.select(col("child").as("jsrc"), col("parent").as("jdst"))
      .localCheckpoint()
    var acc = seeds.localCheckpoint()
    var nPairs = acc.count()
    var k = 0
    var done = false
    while (!done && k < maxIter && k < 30) {
      val span = 1 << k // depth stays IntegerType; 2^30 bounds any real graph
      val extended = acc.as("a")
        .join(jump.as("j"), col("a.ancestor") === col("j.jsrc"))
        .select(col("a.node").as("node"), col("j.jdst").as("ancestor"),
          (col("a.depth") + lit(span)).as("depth"))
      val next = acc.unionByName(extended)
        .groupBy(col("node"), col("ancestor"))
        .agg(min(col("depth")).as("depth"))
        .localCheckpoint()
      val n = next.count()
      done = n == nPairs
      nPairs = n
      acc = next
      if (!done) {
        jump = jump.as("a").join(jump.as("b"), col("a.jdst") === col("b.jsrc"))
          .select(col("a.jsrc").as("jsrc"), col("b.jdst").as("jdst"))
          .dropDuplicates("jsrc", "jdst") // no-op for single-parent graphs
          .localCheckpoint()
      }
      k += 1
    }
    if (!done) throw new IllegalStateException(
      s"transitive closure did not converge within ${math.min(maxIter, 30)} " +
        "doubling rounds (graph depth > 2^rounds?) — the partial result would be wrong")
    acc
  }

  def q23Closure(s: SparkSession, dir: String): DataFrame = {
    val part = s.read.parquet(s"$dir/part.parquet")
    // child ≥ 2 ⇒ ancestor-1 frontier rows simply find no edge and stop,
    // exactly the oracle's `WHERE ancestor >= 2` recursion guard
    val edges = part.select(col("p_partkey").as("child"),
        shiftright(col("p_partkey"), 1).as("parent"))
      .where(col("child") >= 2)
    val seeds = part
      .where(col("p_partkey") % 50 === 0 && col("p_partkey") >= 2)
      .select(col("p_partkey").as("node"),
        shiftright(col("p_partkey"), 1).as("ancestor"), lit(1).as("depth"))
    closure(edges, seeds)
  }

  val q23Sql: String =
    """WITH RECURSIVE anc AS (
      |  SELECT p_partkey AS node, p_partkey >> 1 AS ancestor, 1 AS depth
      |  FROM part WHERE p_partkey % 50 = 0 AND p_partkey >= 2
      |  UNION ALL
      |  SELECT node, ancestor >> 1, depth + 1 FROM anc WHERE ancestor >= 2)
      |SELECT node, ancestor, depth FROM anc""".stripMargin

  // -------------------------------------------------------------------
  // q24: map tag-diff (SURVEY J7 — per-pair trusted-tag diff,
  // src/matchers/poi_matcher.rs:76-108): per user, the event_type→count
  // map of the first half month vs the second; map_filter keeps entries
  // whose values differ, exploded back to rows for the oracle.
  // -------------------------------------------------------------------
  def q24TagDiff(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    val perType = events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        sum(when(col("ts") < cut, 1L).otherwise(0L)).as("nf"),
        sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("ns"))
    perType
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(
        struct(col("event_type"), struct(col("nf"), col("ns"))))).as("tags"))
      .select(col("user_id"),
        explode(map_filter(col("tags"), (_, v) => v("nf") =!= v("ns"))))
      .select(col("user_id"), col("key").as("event_type"),
        col("value.nf").as("n_first"), col("value.ns").as("n_second"))
  }

  val q24Sql: String =
    """SELECT user_id, event_type,
      |  CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
      |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_second
      |FROM events
      |GROUP BY user_id, event_type
      |HAVING n_first <> n_second""".stripMargin

  // -------------------------------------------------------------------
  // q25: bitmask classification + intersect predicate (SURVEY F4/F5 —
  // the (key,value)→mask match chain and `(a & b) != 0` pre-filter).
  // -------------------------------------------------------------------
  def q25Bitmask(s: SparkSession, dir: String): DataFrame = {
    val mask =
      when(col("event_type") === "click", 1)
        .when(col("event_type") === "view", 2)
        .when(col("event_type") === "purchase", 4)
        .when(col("event_type") === "signup", 8)
        .otherwise(16)
        .bitwiseOR(when(col("value") > 250.0, 32).otherwise(0))
    events(s, dir)
      .withColumn("mask", mask)
      .where(col("mask").bitwiseAND(lit(1 | 4 | 32)) =!= 0)
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("avg_value"))
  }

  val q25Sql: String =
    """SELECT mask, COUNT(*) AS n, round(AVG(value), 4) AS avg_value FROM (
      |  SELECT (CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
      |          WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 ELSE 16 END
      |          | CASE WHEN value > 250.0 THEN 32 ELSE 0 END) AS mask, value
      |  FROM events)
      |WHERE (mask & 37) <> 0
      |GROUP BY mask""".stripMargin

  // -------------------------------------------------------------------
  // q26: geo scalar functions (SURVEY C1–C9): deterministic lat/lng per
  // customer, haversine distance to a fixed point, and a lat/lng grid
  // cell id (the S2-cell analogue) — all portable double math.
  // -------------------------------------------------------------------
  def q26Geo(s: SparkSession, dir: String): DataFrame = {
    val lat = ((col("c_custkey") * 37) % 178 - 89).cast("double") + 0.5
    val lng = ((col("c_custkey") * 73) % 356 - 178).cast("double") + 0.5
    val lat1 = radians(lat)
    val lng1 = radians(lng)
    // haversine to (12.5, 41.9)
    val lat2 = radians(lit(41.9))
    val dlat = (lat1 - lat2) / 2
    val dlng = (lng1 - radians(lit(12.5))) / 2
    val a = pow(sin(dlat), 2) + cos(lat1) * cos(lat2) * pow(sin(dlng), 2)
    val distKm = lit(2 * 6371.0088) * asin(sqrt(a))
    s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), lat.as("lat"), lng.as("lng"),
        round(distKm, 4).as("dist_km"),
        (floor((lat + 90.0) / 0.5) * 1024 + floor((lng + 180.0) / 0.5)).cast("long").as("cell_id"))
      .where(col("dist_km") < 15000.0)
  }

  val q26Sql: String =
    """SELECT c_custkey, lat, lng,
      |  round(2 * 6371.0088 * asin(sqrt(
      |    pow(sin((radians(lat) - radians(41.9)) / 2), 2)
      |    + cos(radians(lat)) * cos(radians(41.9))
      |      * pow(sin((radians(lng) - radians(12.5)) / 2), 2))), 4) AS dist_km,
      |  CAST(floor((lat + 90.0) / 0.5) * 1024 + floor((lng + 180.0) / 0.5) AS BIGINT) AS cell_id
      |FROM (
      |  SELECT c_custkey,
      |    CAST((c_custkey * 37) % 178 - 89 AS DOUBLE) + 0.5 AS lat,
      |    CAST((c_custkey * 73) % 356 - 178 AS DOUBLE) + 0.5 AS lng
      |  FROM customer)
      |WHERE round(2 * 6371.0088 * asin(sqrt(
      |    pow(sin((radians(lat) - radians(41.9)) / 2), 2)
      |    + cos(radians(lat)) * cos(radians(41.9))
      |      * pow(sin((radians(lng) - radians(12.5)) / 2), 2))), 4) < 15000.0""".stripMargin

  // -------------------------------------------------------------------
  // q27: the CDC LWW merge semantics as a plain oracle-checkable query:
  // events as a change log (lsn = event_id, delete when event_type =
  // 'error'), final visible state = per-key lsn-argmax, tombstones out.
  // This is exactly MergeInto's aggregation shape (merge/MergeInto.scala)
  // over driver-readable input.
  // -------------------------------------------------------------------
  def q27CdcLww(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("user_id").as("key"), col("event_id").as("lsn"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("value"))
      .groupBy(col("key"))
      .agg(max_by(struct(col("lsn"), col("op"), col("value")), col("lsn")).as("w"))
      .where(col("w.op") =!= "D")
      .select(col("key"), col("w.lsn").as("last_lsn"),
        round(col("w.value"), 6).as("last_value"))

  val q27Sql: String =
    """SELECT key, lsn AS last_lsn, round(value, 6) AS last_value FROM (
      |  SELECT user_id AS key, event_id AS lsn,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 AND op <> 'D'""".stripMargin

  /** q52: ordered funnel analysis (sequential pattern matching) — for
    * each user, the earliest view → click → purchase chain where every
    * later step strictly follows the prior one and the whole funnel
    * completes within [[Q52HorizonHours]] hours of the first view. The
    * sequential dependency (each step's anchor is the PREVIOUS step's
    * resolved timestamp) is what separates this from plain conditional
    * aggregation — it is the MATCH_RECOGNIZE-lite shape every
    * product-analytics pipeline runs.
    *
    * Scale shape: three chained unordered window aggregates over the
    * same user_id partitioning — ONE exchange on user_id, and the final
    * groupBy reuses that partitioning (no second shuffle). State per
    * user is three timestamps; no ordered global window, no driver
    * materialization. Null step timestamps are coalesced to -1 so the
    * output stays non-nullable integer (engine-stable compare). */
  val Q52HorizonHours = 48

  def q52Funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val horizon = expr(s"INTERVAL $Q52HorizonHours HOURS")
    val ev = events(s, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
    ev
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click"
          && col("ts") > col("t_view")
          && col("ts") <= col("t_view") + horizon, col("ts"))).over(w))
      .withColumn("t_buy",
        min(when(col("event_type") === "purchase"
          && col("ts") > col("t_click")
          && col("ts") <= col("t_view") + horizon, col("ts"))).over(w))
      .where(col("t_view").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        max(col("t_view")).cast("timestamp_ltz").cast("long").as("view_sec"),
        coalesce(max(col("t_click")).cast("timestamp_ltz").cast("long"), lit(-1L))
          .as("click_sec"),
        coalesce(max(col("t_buy")).cast("timestamp_ltz").cast("long"), lit(-1L))
          .as("buy_sec"))
      .withColumn("steps",
        lit(1) + (col("click_sec") >= 0).cast("int") + (col("buy_sec") >= 0).cast("int"))
  }

  val q52Sql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, ts FROM events
       |  WHERE event_type IN ('view', 'click', 'purchase')),
       |s1 AS (
       |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
       |    OVER (PARTITION BY user_id) AS t_view FROM ev),
       |s2 AS (
       |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view
       |      AND ts <= t_view + INTERVAL $Q52HorizonHours HOUR THEN ts END)
       |    OVER (PARTITION BY user_id) AS t_click FROM s1),
       |s3 AS (
       |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click
       |      AND ts <= t_view + INTERVAL $Q52HorizonHours HOUR THEN ts END)
       |    OVER (PARTITION BY user_id) AS t_buy FROM s2)
       |SELECT user_id,
       |  CAST(floor(epoch(max(t_view))) AS BIGINT) AS view_sec,
       |  coalesce(CAST(floor(epoch(max(t_click))) AS BIGINT), -1) AS click_sec,
       |  coalesce(CAST(floor(epoch(max(t_buy))) AS BIGINT), -1) AS buy_sec,
       |  1 + CAST(coalesce(CAST(floor(epoch(max(t_click))) AS BIGINT), -1) >= 0 AS INT)
       |    + CAST(coalesce(CAST(floor(epoch(max(t_buy))) AS BIGINT), -1) >= 0 AS INT)
       |    AS steps
       |FROM s3 WHERE t_view IS NOT NULL
       |GROUP BY user_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_rle" -> (q20Rle _),
    "q21_asof_join" -> (q21AsofJoin _),
    "q22_range_join" -> (q22RangeJoin _),
    "q23_closure" -> (q23Closure _),
    "q24_tag_diff" -> (q24TagDiff _),
    "q25_bitmask" -> (q25Bitmask _),
    "q26_geo" -> (q26Geo _),
    "q27_cdc_lww" -> (q27CdcLww _),
    "q52_funnel" -> (q52Funnel _)
  )

  val oracles: Map[String, String] = Map(
    "q20_rle" -> q20Sql,
    "q21_asof_join" -> q21Sql,
    "q22_range_join" -> q22Sql,
    "q23_closure" -> q23Sql,
    "q24_tag_diff" -> q24Sql,
    "q25_bitmask" -> q25Sql,
    "q26_geo" -> q26Sql,
    "q27_cdc_lww" -> q27Sql,
    "q52_funnel" -> q52Sql
  )
}
