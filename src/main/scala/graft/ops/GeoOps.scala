package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship computation re-expressed Spark-first: the
  * spatial best-match range join (SURVEY J1/J2 — for each query point,
  * cover its search radius with grid cells, equi-join candidates on the
  * cell key, filter by category mask and true distance, keep the argmax).
  * Reference: src/pipeline/conflate/mod.rs:125-190, src/pipeline/edits.rs:92-161.
  *
  * The covering is RADIUS-ADAPTIVE (SURVEY C5+C15, reference
  * `matchers/mod.rs:206-232` picks the radius per feature from its mask;
  * `conflate/mod.rs:131-136` covers the cap adaptively): each row's
  * category selects a 50/200/500 km radius, and the per-row cell fan-out
  * is derived from that radius and the row's latitude — wider longitude
  * spans near the poles (conservative over-covering; false candidates
  * die on the exact-distance filter), capped at the full ring when the
  * search cap contains a pole. Longitude cells wrap modulo 360° (pmod),
  * so antimeridian-straddling caps are covered correctly; points span
  * the full |lat| ≤ 88.5° range (no generator crutch).
  *
  * The covering explode turns the O(n·m) distance join into an equi-join
  * on cell ids — at 100 TB both sides shuffle once on the cell key and
  * no cross product ever materializes; the per-row fan-out stays O(1)
  * except for the vanishing pole-adjacent fraction; skew-prone hot cells
  * ride AQE + the cell granularity choice.
  */
object GeoOps {

  private val CellDeg = 5.0
  private val LngCells = 72 // 360 / CellDeg

  private def lat(key: Column): Column = (key * 37 % 178 - 89).cast("double") + 0.5
  private def lng(key: Column): Column = (key * 73 % 300 - 150).cast("double") + 0.5

  /** C5 analogue: search radius picked by category (km). */
  private def radiusKm(cat: Column): Column =
    when(cat === 0, 50.0).when(cat === 1, 200.0).otherwise(500.0)

  /** Haversine distance in km — same formula as q26 (portable math). */
  private def distKm(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val dlat = (radians(lat1) - radians(lat2)) / 2
    val dlng = (radians(lng1) - radians(lng2)) / 2
    val a = pow(sin(dlat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlng), 2)
    lit(2 * 6371.0088) * asin(sqrt(a))
  }

  private def latCell(c: Column): Column = floor((c + 90.0) / CellDeg).cast("int")
  private def lngCell(c: Column): Column = floor((c + 180.0) / CellDeg).cast("int")

  /** q29: best-match join — for each customer point, the nearest supplier
    * point of the SAME category within that category's radius (category
    * equality is the J2 brand-gate analogue; the argmax is A1; the
    * per-row covering is C5+C15). */
  def q29BestMatchJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = s.read.parquet(s"$dir/customer.parquet").select(
      col("c_custkey"),
      lat(col("c_custkey")).as("clat"), lng(col("c_custkey")).as("clng"),
      (col("c_custkey") % 3).as("cat"))
    val supp = s.read.parquet(s"$dir/supplier.parquet").select(
      col("s_suppkey"),
      lat(col("s_suppkey")).as("slat"), lng(col("s_suppkey")).as("slng"),
      (col("s_suppkey") % 3).as("cat"),
      latCell(lat(col("s_suppkey"))).as("cell_lat"),
      lngCell(lng(col("s_suppkey"))).as("cell_lng"))

    // adaptive covering: lat span from the radius (≥110 km/deg is a safe
    // under-estimate of km-per-lat-degree → over-covers); lng span from
    // the radius at the cap's worst-case |lat| edge (cos shrinks km/deg →
    // span grows), capped at the full ring when the cap nears a pole.
    val r = radiusKm(col("cat"))
    val latSpan = ceil(r / 110.0 / CellDeg).cast("int")
    val maxAbsLatEdge = least(abs(col("clat")) + r / 110.0, lit(89.9))
    val lngSpan = least(
      lit(LngCells / 2),
      ceil(r / (lit(111.32) * cos(radians(maxAbsLatEdge))) / CellDeg).cast("int"))
    // the capped full ring spans exactly one period (−36..35) so the pmod
    // wrap never lands on the same cell twice — probe cells are distinct
    // by construction and no dedup shuffle is needed
    val lngHi = when(lngSpan === LngCells / 2, lit(LngCells / 2 - 1)).otherwise(lngSpan)
    val probes = cust
      .withColumn("dlat", explode(sequence(-latSpan, latSpan)))
      .withColumn("dlng", explode(sequence(-lngSpan, lngHi)))
      .select(col("c_custkey"), col("clat"), col("clng"), col("cat"),
        (latCell(col("clat")) + col("dlat")).as("cell_lat"),
        pmod(lngCell(col("clng")) + col("dlng"), lit(LngCells)).as("cell_lng"))

    val w = Window.partitionBy(col("c_custkey")).orderBy(col("d").asc, col("s_suppkey").asc)
    probes.join(supp, Seq("cell_lat", "cell_lng", "cat"))
      .withColumn("d", distKm(col("clat"), col("clng"), col("slat"), col("slng")))
      .where(col("d") <= radiusKm(col("cat")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("c_custkey"), col("s_suppkey"), round(col("d"), 4).as("dist_km"))
  }

  /** Oracle: the exhaustive cross-product formulation (no covering),
    * with the same per-category radius. */
  val q29Sql: String =
    s"""WITH c AS (
       |  SELECT c_custkey,
       |    CAST(c_custkey * 37 % 178 - 89 AS DOUBLE) + 0.5 AS clat,
       |    CAST(c_custkey * 73 % 300 - 150 AS DOUBLE) + 0.5 AS clng,
       |    c_custkey % 3 AS cat
       |  FROM customer),
       |sp AS (
       |  SELECT s_suppkey,
       |    CAST(s_suppkey * 37 % 178 - 89 AS DOUBLE) + 0.5 AS slat,
       |    CAST(s_suppkey * 73 % 300 - 150 AS DOUBLE) + 0.5 AS slng,
       |    s_suppkey % 3 AS cat
       |  FROM supplier),
       |pairs AS (
       |  SELECT c.c_custkey, sp.s_suppkey,
       |    CASE c.cat WHEN 0 THEN 50.0 WHEN 1 THEN 200.0 ELSE 500.0 END AS r,
       |    2 * 6371.0088 * asin(sqrt(
       |      pow(sin((radians(clat) - radians(slat)) / 2), 2)
       |      + cos(radians(clat)) * cos(radians(slat))
       |        * pow(sin((radians(clng) - radians(slng)) / 2), 2))) AS d
       |  FROM c JOIN sp ON c.cat = sp.cat)
       |SELECT c_custkey, s_suppkey, round(d, 4) AS dist_km FROM (
       |  SELECT c_custkey, s_suppkey, d,
       |    ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY d ASC, s_suppkey ASC) AS rn
       |  FROM pairs WHERE d <= r)
       |WHERE rn = 1""".stripMargin

  /** q30: JSONL feature export (SURVEY S15/C13 — one JSON feature per
    * line, rendered with deterministic string building so the DuckDB
    * oracle can reproduce the exact bytes). */
  def q30JsonlExport(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey"),
        concat(
          lit("""{"type":"Feature","id":"""), col("n_nationkey"),
          lit(""","properties":{"name":""""), col("n_name"),
          lit("""","region":"""), col("n_regionkey"),
          lit("}}")).as("feature_json"))

  val q30Sql: String =
    """SELECT n_nationkey,
      |  '{"type":"Feature","id":' || n_nationkey ||
      |  ',"properties":{"name":"' || n_name || '","region":' || n_regionkey ||
      |  '}}' AS feature_json
      |FROM nation""".stripMargin

  // -------------------------------------------------------------------
  // q35: HIERARCHICAL cell ids (C1/C2/C14 at fidelity — the reference's
  // S2 ids are hierarchical: level-k parent = high bits of the child,
  // coverage.rs:10-21 coarsens by shiftright). Scheme: Morton-interleave
  // the quantized (lng, lat) at `level` bits each and prepend a 1 marker
  // bit, so id@L ∈ [4^L, 2·4^L) and parent(id) = id >> 2 — exactly the
  // shift-coarsening the reference uses. Pure codegen'd column math
  // (bit tests + shifts), identically reproducible in DuckDB.
  // -------------------------------------------------------------------
  private val FineLevel = 12
  private val CoarseLevel = 6

  private def quantize(c: Column, lo: Double, span: Double, level: Int): Column =
    least(floor((c - lo) / span * (1L << level)).cast("long"), lit((1L << level) - 1))

  private def morton(ix: Column, iy: Column, level: Int): Column =
    (0 until level).map { b =>
      shiftright(ix, b).bitwiseAND(1) * (1L << (2 * b)) +
        shiftright(iy, b).bitwiseAND(1) * (1L << (2 * b + 1))
    }.reduce(_ + _)

  private def deinterleave(m: Column, level: Int, odd: Boolean): Column =
    (0 until level).map { b =>
      shiftright(m, 2 * b + (if (odd) 1 else 0)).bitwiseAND(1) * (1L << b)
    }.reduce(_ + _)

  /** q35: leaf cell per point, rolled up to the level-6 ancestor by pure
    * bit-shift (the hierarchy property), with the ancestor's decoded
    * center — counts per coarse cell. */
  def q35HierarchicalCells(s: SparkSession, dir: String): DataFrame = {
    val pts = s.read.parquet(s"$dir/customer.parquet").select(
      col("c_custkey"),
      lat(col("c_custkey")).as("plat"), lng(col("c_custkey")).as("plng"))
    val ix = quantize(col("plng"), -180.0, 360.0, FineLevel)
    val iy = quantize(col("plat"), -90.0, 180.0, FineLevel)
    val fine = (lit(1L << (2 * FineLevel)) + morton(ix, iy, FineLevel)).as("fine_cell")
    val coarse = shiftright(col("fine_cell"), 2 * (FineLevel - CoarseLevel)).as("coarse_cell")
    val cm = col("coarse_cell") - (1L << (2 * CoarseLevel)) // strip marker bit
    val cx = deinterleave(cm, CoarseLevel, odd = false)
    val cy = deinterleave(cm, CoarseLevel, odd = true)
    pts.select(col("c_custkey"), fine)
      .select(col("c_custkey"), col("fine_cell"), coarse)
      .groupBy(col("coarse_cell"))
      .agg(count(lit(1)).as("n"), min(col("fine_cell")).as("min_fine_cell"))
      .select(col("coarse_cell"), col("n"), col("min_fine_cell"),
        round((cx + 0.5) / (1L << CoarseLevel) * 360.0 - 180.0, 6).as("center_lng"),
        round((cy + 0.5) / (1L << CoarseLevel) * 180.0 - 90.0, 6).as("center_lat"))
  }

  private def mortonSql(ix: String, iy: String, level: Int): String =
    (0 until level).map { b =>
      s"((($ix) >> $b) & 1) * ${1L << (2 * b)} + ((($iy) >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString("(", " + ", ")")

  private def deinterleaveSql(m: String, level: Int, off: Int): String =
    (0 until level).map { b =>
      s"((($m) >> ${2 * b + off}) & 1) * ${1L << b}"
    }.mkString("(", " + ", ")")

  val q35Sql: String = {
    val fineBias = 1L << (2 * FineLevel)
    val coarseBias = 1L << (2 * CoarseLevel)
    s"""WITH p AS (
       |  SELECT c_custkey,
       |    CAST(c_custkey * 37 % 178 - 89 AS DOUBLE) + 0.5 AS plat,
       |    CAST(c_custkey * 73 % 300 - 150 AS DOUBLE) + 0.5 AS plng
       |  FROM customer),
       |q AS (
       |  SELECT c_custkey,
       |    least(CAST(floor((plng - (-180.0)) / 360.0 * ${1L << FineLevel}) AS BIGINT), ${(1L << FineLevel) - 1}) AS ix,
       |    least(CAST(floor((plat - (-90.0)) / 180.0 * ${1L << FineLevel}) AS BIGINT), ${(1L << FineLevel) - 1}) AS iy
       |  FROM p),
       |f AS (SELECT c_custkey, $fineBias + ${mortonSql("ix", "iy", FineLevel)} AS fine_cell FROM q),
       |g AS (
       |  SELECT fine_cell >> ${2 * (FineLevel - CoarseLevel)} AS coarse_cell,
       |    count(*) AS n, min(fine_cell) AS min_fine_cell
       |  FROM f GROUP BY 1)
       |SELECT coarse_cell, n, min_fine_cell,
       |  round((${deinterleaveSql(s"coarse_cell - $coarseBias", CoarseLevel, 0)} + 0.5) / ${1L << CoarseLevel}.0 * 360.0 - 180.0, 6) AS center_lng,
       |  round((${deinterleaveSql(s"coarse_cell - $coarseBias", CoarseLevel, 1)} + 0.5) / ${1L << CoarseLevel}.0 * 180.0 - 90.0, 6) AS center_lat
       |FROM g""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_best_match_join" -> (q29BestMatchJoin _),
    "q30_jsonl_export" -> (q30JsonlExport _),
    "q35_hierarchical_cells" -> (q35HierarchicalCells _)
  )

  val oracles: Map[String, String] = Map(
    "q29_best_match_join" -> q29Sql,
    "q30_jsonl_export" -> q30Sql,
    "q35_hierarchical_cells" -> q35Sql
  )
}
