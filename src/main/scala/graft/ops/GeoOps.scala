package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship computation re-expressed Spark-first: the
  * spatial best-match range join (SURVEY J1/J2 — for each query point,
  * cover its search radius with cells, equi-join candidates on the cell
  * key, filter by category and true distance, keep the argmax).
  * Reference: src/pipeline/conflate/mod.rs:125-190, src/pipeline/edits.rs:92-161.
  *
  * Cells are CUBE-FACE hierarchical cells (see GeoCells): sphere →
  * cube-face chart → Morton walk, `parent(id) = id >> 2` — the real S2
  * shape the reference relies on (src/coverage.rs:4-21), replacing round
  * 2's raw lat/lng quantization whose cells degenerated toward the poles
  * (1/cos(lat) area skew → hot polar join keys). Cube cells keep the
  * global max/min cell-area ratio ≈ 5, so join-key load is bounded at
  * EVERY latitude and the pole needs no special-case covering.
  *
  * The covering is RADIUS-ADAPTIVE (SURVEY C5+C15, reference
  * `matchers/mod.rs:206-232` picks the radius per feature from its mask;
  * `conflate/mod.rs:131-136` covers the cap adaptively): each category's
  * radius selects a cell LEVEL sized to it, so per-row fan-out stays
  * ~10–25 cells for every tier. The covering explode turns the O(n·m)
  * distance join into an equi-join on (cell, cat) — at 100 TB both sides
  * shuffle once on the cell key and no cross product ever materializes;
  * false candidates die on the exact-distance filter.
  */
object GeoOps {

  private def lat(key: Column): Column = (key * 37 % 178 - 89).cast("double") + 0.5
  private def lng(key: Column): Column = (key * 73 % 300 - 150).cast("double") + 0.5

  /** C5 analogue: search radius picked by category (km) — the SINGLE
    * source for the Scala covering UDF, the Column filter, and the SQL
    * oracle CASE: a radius edited in one place cannot desynchronize the
    * cap covering from the distance filter (a covering smaller than the
    * filter radius would silently miss true matches). */
  private[ops] val RadiusByCat: Map[Int, Double] = Map(0 -> 50.0, 1 -> 200.0)
  private[ops] val RadiusDefault: Double = 500.0
  private[ops] def radiusOf(cat: Int): Double = RadiusByCat.getOrElse(cat, RadiusDefault)
  private def radiusKm(cat: Column): Column =
    RadiusByCat.foldRight(lit(RadiusDefault): Column) { case ((c, r), e) =>
      when(cat === c, r).otherwise(e)
    }
  private[ops] def radiusSqlCase(cat: String): String =
    RadiusByCat.toSeq.sortBy(_._1)
      .map { case (c, r) => s"WHEN $cat = $c THEN $r" }
      .mkString("CASE ", " ", s" ELSE $RadiusDefault END")

  /** Cell level per category: sized so the cap spans ~1–2 cells per axis
    * (level-7 cube cells ≈ 78 km across, 5 ≈ 312 km, 4 ≈ 625 km). */
  private def levelOf(cat: Int): Int = cat match {
    case 0 => 7
    case 1 => 5
    case _ => 4
  }

  /** Haversine distance in km — same formula as q26 (portable math). */
  private def distKm(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val dlat = (radians(lat1) - radians(lat2)) / 2
    val dlng = (radians(lng1) - radians(lng2)) / 2
    val a = pow(sin(dlat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlng), 2)
    lit(2 * 6371.0088) * asin(sqrt(a))
  }

  // -------------------------------------------------------------------
  // Cube-face cell id: the codegen'd CubeCell expression (one static
  // call into GeoCells.cellOf — composed Column math would re-inline the
  // face-chart whens once per Morton bit and blow past JVM codegen
  // limits). The SQL oracle fragments below reproduce the same IEEE
  // double sequence (verified exact at sf0.01/sf0.1).
  // -------------------------------------------------------------------
  private def cubeCell(latC: Column, lngC: Column, level: Int): Column =
    graft.functions.fns.cubeCell(latC, lngC, level)

  private def deinterleave(m: Column, level: Int, odd: Boolean): Column =
    (0 until level).map { b =>
      shiftright(m, 2 * b + (if (odd) 1 else 0)).bitwiseAND(1) * (1L << b)
    }.reduce(_ + _)

  /** The covering UDF — GeoCells.cover per row (the reference's
    * RegionCoverer, C15). A UDF rather than Column math because the BFS
    * with cross-face neighbor stepping is genuinely imperative; it runs
    * once per query row and fans out ~10–25 cells, so the join stays an
    * equi-join and the UDF is off every hot aggregate path. */
  private val coverUdf = udf { (latDeg: Double, lngDeg: Double, cat: Int) =>
    GeoCells.cover(latDeg, lngDeg, radiusOf(cat), levelOf(cat))
  }

  /** q29: best-match join — for each customer point, the nearest supplier
    * point of the SAME category within that category's radius (category
    * equality is the J2 brand-gate analogue; the argmax is A1; the
    * per-row covering is C5+C15). */
  def q29BestMatchJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = s.read.parquet(s"$dir/customer.parquet").select(
      col("c_custkey"),
      lat(col("c_custkey")).as("clat"), lng(col("c_custkey")).as("clng"),
      (col("c_custkey") % 3).cast("int").as("cat"))
    // supplier cell at the category's level: pure column math (codegen),
    // exactly GeoCells.cellOf
    val suppCell = (0 to 2).map { c =>
      (c, cubeCell(lat(col("s_suppkey")), lng(col("s_suppkey")), levelOf(c)))
    }.foldRight(lit(-1L): Column) { case ((c, cell), e) =>
      when(col("cat") === c, cell).otherwise(e)
    }
    val supp = s.read.parquet(s"$dir/supplier.parquet").select(
        col("s_suppkey"),
        lat(col("s_suppkey")).as("slat"), lng(col("s_suppkey")).as("slng"),
        (col("s_suppkey") % 3).cast("int").as("cat"))
      .withColumn("cell", suppCell)

    val probes = cust
      .withColumn("cell", explode(coverUdf(col("clat"), col("clng"), col("cat"))))

    val w = Window.partitionBy(col("c_custkey")).orderBy(col("d").asc, col("s_suppkey").asc)
    probes.join(supp, Seq("cell", "cat"))
      .withColumn("d", distKm(col("clat"), col("clng"), col("slat"), col("slng")))
      .where(col("d") <= radiusKm(col("cat")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("c_custkey"), col("s_suppkey"), round(col("d"), 4).as("dist_km"))
  }

  /** Oracle: the exhaustive cross-product formulation (no covering, no
    * cells — a STRONGER check than mirroring: it verifies the covering's
    * soundness, not just its arithmetic), with the same per-category
    * radius. */
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
       |    ${radiusSqlCase("c.cat")} AS r,
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
  // q35: HIERARCHICAL cube-face cell ids (C1/C2/C14 at fidelity).
  // Leaf cell at level 12, rolled up to the level-6 ancestor by pure
  // bit-shift (parent = id >> 2, face prefix preserved — exactly the
  // reference's shift-coarsening, coverage.rs:10-21), with the
  // ancestor's decoded center unprojected back to lat/lng. Pure
  // codegen'd column math, identically reproducible in DuckDB.
  // -------------------------------------------------------------------
  private val FineLevel = 12
  private val CoarseLevel = 6

  /** q35: per-point leaf cell → level-6 ancestor via shift → counts per
    * coarse cell with the decoded center. */
  def q35HierarchicalCells(s: SparkSession, dir: String): DataFrame = {
    val pts = s.read.parquet(s"$dir/customer.parquet").select(
      col("c_custkey"),
      lat(col("c_custkey")).as("plat"), lng(col("c_custkey")).as("plng"))
    val fine = cubeCell(col("plat"), col("plng"), FineLevel).as("fine_cell")
    val coarse = shiftright(col("fine_cell"), 2 * (FineLevel - CoarseLevel)).as("coarse_cell")
    // decode the coarse cell back to (face, iu, iv) → center direction →
    // lat/lng (GeoCells.cellCenter as column math)
    val face = shiftright(col("coarse_cell"), 2 * CoarseLevel) - 8
    val m = col("coarse_cell").bitwiseAND(lit((1L << (2 * CoarseLevel)) - 1))
    val n = 1L << CoarseLevel
    val uc = (deinterleave(m, CoarseLevel, odd = false) + 0.5) / n * 2 - 1
    val vc = (deinterleave(m, CoarseLevel, odd = true) + 0.5) / n * 2 - 1
    val dx = when(face === 0, lit(1.0)).when(face === 3, lit(-1.0))
      .when(face === 1, vc).when(face === 4, -vc)
      .when(face === 2, uc).otherwise(-uc)
    val dy = when(face === 0, uc).when(face === 3, -uc)
      .when(face === 1, lit(1.0)).when(face === 4, lit(-1.0))
      .when(face === 2, vc).otherwise(-vc)
    val dz = when(face === 0, vc).when(face === 3, -vc)
      .when(face === 1, uc).when(face === 4, -uc)
      .when(face === 2, lit(1.0)).otherwise(lit(-1.0))
    val centerLat = degrees(atan2(dz, sqrt(dx * dx + dy * dy)))
    val centerLng = degrees(atan2(dy, dx))
    pts.select(col("c_custkey"), fine)
      .select(col("c_custkey"), col("fine_cell"), coarse)
      .groupBy(col("coarse_cell"))
      .agg(count(lit(1)).as("n"), min(col("fine_cell")).as("min_fine_cell"))
      .select(col("coarse_cell"), col("n"), col("min_fine_cell"),
        round(centerLng, 6).as("center_lng"),
        round(centerLat, 6).as("center_lat"))
  }

  private def mortonSql(ix: String, iy: String, level: Int): String =
    (0 until level).map { b =>
      s"((($ix) >> $b) & 1) * ${1L << (2 * b)} + ((($iy) >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString("(", " + ", ")")

  private def deinterleaveSql(m: String, level: Int, off: Int): String =
    (0 until level).map { b =>
      s"((($m) >> ${2 * b + off}) & 1) * ${1L << b}"
    }.mkString("(", " + ", ")")

  private def quantizeSql(c: String, level: Int): String = {
    val n = 1L << level
    s"least(greatest(CAST(floor((($c) + 1) / 2 * $n) AS BIGINT), 0), ${n - 1})"
  }

  val q35Sql: String = {
    val n = 1L << CoarseLevel
    s"""WITH p AS (
       |  SELECT c_custkey,
       |    CAST(c_custkey * 37 % 178 - 89 AS DOUBLE) + 0.5 AS plat,
       |    CAST(c_custkey * 73 % 300 - 150 AS DOUBLE) + 0.5 AS plng
       |  FROM customer),
       |xyz AS (
       |  SELECT c_custkey,
       |    cos(radians(plat)) * cos(radians(plng)) AS x,
       |    cos(radians(plat)) * sin(radians(plng)) AS y,
       |    sin(radians(plat)) AS z
       |  FROM p),
       |fuv AS (
       |  SELECT c_custkey,
       |    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN (CASE WHEN x >= 0 THEN 0 ELSE 3 END)
       |         WHEN abs(y) >= abs(z) THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END)
       |         ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END AS face,
       |    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN y / x
       |         WHEN abs(y) >= abs(z) THEN z / y ELSE x / z END AS u,
       |    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN z / x
       |         WHEN abs(y) >= abs(z) THEN x / y ELSE y / z END AS v
       |  FROM xyz),
       |q AS (
       |  SELECT c_custkey,
       |    (8 + face) * ${1L << (2 * FineLevel)}
       |      + ${mortonSql(quantizeSql("u", FineLevel), quantizeSql("v", FineLevel), FineLevel)}
       |      AS fine_cell
       |  FROM fuv),
       |g AS (
       |  SELECT fine_cell >> ${2 * (FineLevel - CoarseLevel)} AS coarse_cell,
       |    count(*) AS n, min(fine_cell) AS min_fine_cell
       |  FROM q GROUP BY 1),
       |dec AS (
       |  SELECT coarse_cell, n, min_fine_cell,
       |    (coarse_cell >> ${2 * CoarseLevel}) - 8 AS face,
       |    (${deinterleaveSql(s"coarse_cell & ${(1L << (2 * CoarseLevel)) - 1}", CoarseLevel, 0)} + 0.5) / $n * 2 - 1 AS uc,
       |    (${deinterleaveSql(s"coarse_cell & ${(1L << (2 * CoarseLevel)) - 1}", CoarseLevel, 1)} + 0.5) / $n * 2 - 1 AS vc
       |  FROM g),
       |dir AS (
       |  SELECT coarse_cell, n, min_fine_cell,
       |    CASE face WHEN 0 THEN 1.0 WHEN 3 THEN -1.0 WHEN 1 THEN vc WHEN 4 THEN -vc
       |              WHEN 2 THEN uc ELSE -uc END AS dx,
       |    CASE face WHEN 0 THEN uc WHEN 3 THEN -uc WHEN 1 THEN 1.0 WHEN 4 THEN -1.0
       |              WHEN 2 THEN vc ELSE -vc END AS dy,
       |    CASE face WHEN 0 THEN vc WHEN 3 THEN -vc WHEN 1 THEN uc WHEN 4 THEN -uc
       |              WHEN 2 THEN 1.0 ELSE -1.0 END AS dz
       |  FROM dec)
       |SELECT coarse_cell, n, min_fine_cell,
       |  round(degrees(atan2(dy, dx)), 6) AS center_lng,
       |  round(degrees(atan2(dz, sqrt(dx * dx + dy * dy))), 6) AS center_lat
       |FROM dir""".stripMargin
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
