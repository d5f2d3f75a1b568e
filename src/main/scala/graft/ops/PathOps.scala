package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Representative-point geometry (SURVEY F3/C8/C9, reference
  * `atp/mod.rs:267-289`): for a linestring, the point at half the total
  * haversine length (`point_at_ratio_from_start(0.5)`) interpolated on
  * the great circle, and the planar length-weighted centroid
  * (`LineString::centroid`, `osm/assemble.rs:110-111`).
  *
  * Spark-first formulation: paths are rows, not arrays — a window `lag`
  * turns the ordered points of each key into segments, a running-sum
  * window accumulates central angles (sequential, deterministic order on
  * both engines), the half-length segment is the first row whose
  * cumulative angle reaches total/2, and the spherical interpolation
  * (slerp: sin((1−f)θ)/sinθ · P₁ + sin(fθ)/sinθ · P₂ on unit vectors)
  * is plain column math on that one row per key. At 100 TB this is one
  * shuffle on the path key + windows — no per-row array building, no
  * UDF, fully codegen'd.
  */
object PathOps {

  /** q33: midpoint + centroid per synthetic linestring (points derived
    * deterministically from lineitem rows; confined to a ~2° patch so
    * segments are short and the spherical math is well-conditioned). */
  def q33RepPoint(s: SparkSession, dir: String): DataFrame = {
    // DISTINCT: lineitem carries duplicate (l_orderkey, l_linenumber)
    // pairs, and lat/lng are pure functions of (key, pos) — duplicates
    // are bit-identical vertices whose only effect is a TIE in the
    // `ORDER BY pos` window (engines break it differently; the sf1 audit
    // caught the midpoint landing on a duplicated row). Dedup makes pos
    // unique per key, the window order total, and drops the degenerate
    // zero-length self-segments.
    val pts = s.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_orderkey") % 10 === 0)
      .select(
        col("l_orderkey").as("key"), col("l_linenumber").as("pos"),
        (lit(40.0) + ((col("l_orderkey") * 7 + col("l_linenumber") * 13) % 200) / 100.0).as("lat"),
        (lit(-5.0) + ((col("l_orderkey") * 11 + col("l_linenumber") * 17) % 300) / 100.0).as("lng"))
      .distinct()

    val wo = Window.partitionBy("key").orderBy("pos")
    val seg0 = pts
      .withColumn("plat", lag("lat", 1).over(wo))
      .withColumn("plng", lag("lng", 1).over(wo))
      .where(col("plat").isNotNull)
    val a = pow(sin((radians(col("lat")) - radians(col("plat"))) / 2), 2) +
      cos(radians(col("plat"))) * cos(radians(col("lat"))) *
        pow(sin((radians(col("lng")) - radians(col("plng"))) / 2), 2)
    val seg = seg0
      .withColumn("theta", lit(2.0) * asin(sqrt(a))) // central angle (rad)
      .withColumn("plen",
        sqrt(pow(col("lat") - col("plat"), 2) + pow(col("lng") - col("plng"), 2)))
    val segc = seg
      .withColumn("cum",
        sum("theta").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cumprev", coalesce(lag("cum", 1).over(wo), lit(0.0)))
      .withColumn("total", max("cum").over(Window.partitionBy("key")))

    val agg = segc.groupBy("key").agg(
      (count(lit(1)) + 1).as("n_pts"),
      sum(col("plen")).as("lsum"),
      sum((col("plat") + col("lat")) / 2 * col("plen")).as("clat_num"),
      sum((col("plng") + col("lng")) / 2 * col("plen")).as("clng_num"),
      avg(col("lat")).as("alat"), avg(col("lng")).as("alng"))

    // the segment containing the half-length point: first row (in pos
    // order) whose cumulative angle reaches total/2 — cum is monotone so
    // the pick is deterministic. BOTH comparison operands are rounded
    // (the argmax-rounding discipline every geo query uses): cum sums
    // libm-computed thetas, and JVM Math.asin vs C libm differ by ulps —
    // at 10x scale keys started landing within an ulp of the knife edge
    // and the two engines picked DIFFERENT segments (sf1 audit, 10 of
    // 136k keys). Rounding to 9 decimals absorbs ulp noise while moving
    // the boundary only for geometrically-indifferent ties.
    val mrow = segc
      .where(round(col("cum"), 9) >= round(col("total") / 2, 9))
      .withColumn("rn", row_number().over(wo))
      .where(col("rn") === 1)

    val f = (col("total") / 2 - col("cumprev")) / col("theta")
    val sA = sin((lit(1.0) - f) * col("theta")) / sin(col("theta"))
    val sB = sin(f * col("theta")) / sin(col("theta"))
    val x = sA * cos(radians(col("plat"))) * cos(radians(col("plng"))) +
      sB * cos(radians(col("lat"))) * cos(radians(col("lng")))
    val y = sA * cos(radians(col("plat"))) * sin(radians(col("plng"))) +
      sB * cos(radians(col("lat"))) * sin(radians(col("lng")))
    val z = sA * sin(radians(col("plat"))) + sB * sin(radians(col("lat")))
    val mid = mrow.select(
      col("key"),
      when(col("theta") === 0, col("lat"))
        .otherwise(degrees(atan2(z, sqrt(x * x + y * y)))).as("mid_lat"),
      when(col("theta") === 0, col("lng"))
        .otherwise(degrees(atan2(y, x))).as("mid_lng"))

    mid.join(agg, "key")
      .select(
        col("key").as("o_orderkey"), col("n_pts"),
        round(col("mid_lat"), 6).as("mid_lat"),
        round(col("mid_lng"), 6).as("mid_lng"),
        round(when(col("lsum") === 0, col("alat"))
          .otherwise(col("clat_num") / col("lsum")), 6).as("cen_lat"),
        round(when(col("lsum") === 0, col("alng"))
          .otherwise(col("clng_num") / col("lsum")), 6).as("cen_lng"))
  }

  val q33Sql: String =
    """WITH pts AS (
      |  SELECT DISTINCT l_orderkey AS key, l_linenumber AS pos,
      |    40.0 + ((l_orderkey * 7 + l_linenumber * 13) % 200) / 100.0 AS lat,
      |    -5.0 + ((l_orderkey * 11 + l_linenumber * 17) % 300) / 100.0 AS lng
      |  FROM lineitem WHERE l_orderkey % 10 = 0),
      |seg AS (
      |  SELECT *,
      |    2.0 * asin(sqrt(pow(sin((radians(lat) - radians(plat)) / 2), 2)
      |      + cos(radians(plat)) * cos(radians(lat))
      |        * pow(sin((radians(lng) - radians(plng)) / 2), 2))) AS theta,
      |    sqrt(pow(lat - plat, 2) + pow(lng - plng, 2)) AS plen
      |  FROM (
      |    SELECT key, pos, lat, lng,
      |      lag(lat) OVER (PARTITION BY key ORDER BY pos) AS plat,
      |      lag(lng) OVER (PARTITION BY key ORDER BY pos) AS plng
      |    FROM pts)
      |  WHERE plat IS NOT NULL),
      |segc AS (
      |  SELECT *,
      |    coalesce(lag(cum) OVER (PARTITION BY key ORDER BY pos), 0.0) AS cumprev,
      |    max(cum) OVER (PARTITION BY key) AS total
      |  FROM (
      |    SELECT *, sum(theta) OVER (PARTITION BY key ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |    FROM seg)),
      |agg AS (
      |  SELECT key, count(*) + 1 AS n_pts, sum(plen) AS lsum,
      |    sum((plat + lat) / 2 * plen) AS clat_num,
      |    sum((plng + lng) / 2 * plen) AS clng_num,
      |    avg(lat) AS alat, avg(lng) AS alng
      |  FROM segc GROUP BY key),
      |mrow AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY pos) AS rn
      |    FROM segc WHERE round(cum, 9) >= round(total / 2, 9))
      |  WHERE rn = 1),
      |mid AS (
      |  SELECT key,
      |    CASE WHEN theta = 0 THEN lat ELSE degrees(atan2(z, sqrt(x * x + y * y))) END AS mid_lat,
      |    CASE WHEN theta = 0 THEN lng ELSE degrees(atan2(y, x)) END AS mid_lng
      |  FROM (
      |    SELECT key, lat, lng, theta,
      |      sa * cos(radians(plat)) * cos(radians(plng)) + sb * cos(radians(lat)) * cos(radians(lng)) AS x,
      |      sa * cos(radians(plat)) * sin(radians(plng)) + sb * cos(radians(lat)) * sin(radians(lng)) AS y,
      |      sa * sin(radians(plat)) + sb * sin(radians(lat)) AS z
      |    FROM (
      |      SELECT *, sin((1.0 - f) * theta) / sin(theta) AS sa, sin(f * theta) / sin(theta) AS sb
      |      FROM (SELECT *, (total / 2 - cumprev) / theta AS f FROM mrow))))
      |SELECT m.key AS o_orderkey, a.n_pts,
      |  round(mid_lat, 6) AS mid_lat, round(mid_lng, 6) AS mid_lng,
      |  round(CASE WHEN lsum = 0 THEN alat ELSE clat_num / lsum END, 6) AS cen_lat,
      |  round(CASE WHEN lsum = 0 THEN alng ELSE clng_num / lsum END, 6) AS cen_lng
      |FROM mid m JOIN agg a ON m.key = a.key""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_rep_point" -> (q33RepPoint _)
  )

  val oracles: Map[String, String] = Map(
    "q33_rep_point" -> q33Sql
  )
}
