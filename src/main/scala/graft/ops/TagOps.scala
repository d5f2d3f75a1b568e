package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's central F4 operator at fidelity: a (key,value)→bitmask
  * classifier over a real `Map<String,String>` tags column, plus the C13
  * GeoJSON render over the same map (reference `matchers/mod.rs:60-199`
  * classify table with wildcard `("shop", _)` and negative
  * `("power","line") => 0` arms; map column `places/writer.rs:119-165`;
  * feature render `places/mod.rs:60-107`).
  *
  * Data model: a MapType(String,String) `tags` column synthesized
  * deterministically from `part` (2–3 entries/row, one always a free-text
  * `name` that matches no arm). Classification is Spark-first: explode
  * `map_entries(tags)`, broadcast-join the ~40-arm matcher table with
  * `arm.value IS NULL` meaning wildcard, pick the highest-priority arm
  * per entry (specific beats wildcard, mirroring Rust match-arm order)
  * via `min_by`, then `bit_or` the entry masks per row and drop maskless
  * rows (the reference rejects places with empty masks,
  * `places/mod.rs:25-46`).
  *
  * At 100 TB: the arms table is tiny (broadcast), the explode is a ×2–3
  * narrow fan-out, and the only shuffle is the final bit_or groupBy on
  * the row key — partial aggregation makes it a near-map-side pass.
  */
object TagOps {

  // mask bits, reference `matchers/mod.rs:36-54`
  val SHOP = 1
  val RESTAURANT = 2
  val LODGING = 4
  val SCHOOL = 8
  val TRANSIT = 16
  val PARKING = 32
  val FUEL = 64
  val SHRUBBERY = 128
  val STREET_FURNITURE = 256
  val LARGE = 512

  /** ~40 representative arms of the reference's ~140-arm classify table:
    * (key, Some(value)|None=wildcard, bits; bits=0 is a negative arm). */
  val arms: Seq[(String, Option[String], Int)] = Seq(
    ("shop", None, SHOP), // wildcard arm: any shop=* is a shop
    ("amenity", Some("restaurant"), RESTAURANT),
    ("amenity", Some("fast_food"), RESTAURANT),
    ("amenity", Some("cafe"), RESTAURANT),
    ("amenity", Some("bar"), RESTAURANT),
    ("amenity", Some("school"), SCHOOL | LARGE),
    ("amenity", Some("university"), SCHOOL | LARGE),
    ("amenity", Some("kindergarten"), SCHOOL),
    ("amenity", Some("fuel"), FUEL),
    ("amenity", Some("parking"), PARKING),
    ("amenity", Some("bench"), STREET_FURNITURE),
    ("amenity", Some("fountain"), STREET_FURNITURE),
    ("amenity", Some("waste_basket"), STREET_FURNITURE),
    ("tourism", Some("hotel"), LODGING),
    ("tourism", Some("motel"), LODGING),
    ("tourism", Some("hostel"), LODGING),
    ("tourism", Some("guest_house"), LODGING),
    ("tourism", Some("museum"), LARGE),
    ("tourism", Some("viewpoint"), STREET_FURNITURE),
    ("tourism", Some("artwork"), STREET_FURNITURE),
    ("highway", Some("bus_stop"), TRANSIT),
    ("highway", Some("street_lamp"), STREET_FURNITURE),
    ("highway", Some("crossing"), 0), // negative arm
    ("highway", Some("footway"), 0), // negative arm
    ("railway", Some("station"), TRANSIT | LARGE),
    ("railway", Some("halt"), TRANSIT),
    ("railway", Some("tram_stop"), TRANSIT),
    ("railway", Some("level_crossing"), 0), // negative arm
    ("power", Some("line"), 0), // negative arm (reference verbatim)
    ("power", Some("tower"), 0), // negative arm
    ("power", Some("generator"), LARGE),
    ("power", Some("pole"), STREET_FURNITURE),
    ("leisure", Some("garden"), SHRUBBERY),
    ("leisure", Some("park"), SHRUBBERY | LARGE),
    ("leisure", Some("pitch"), SHRUBBERY),
    ("leisure", Some("playground"), SHRUBBERY),
    ("natural", Some("tree"), SHRUBBERY),
    ("natural", Some("wood"), SHRUBBERY | LARGE),
    ("natural", Some("water"), 0), // negative arm
    ("man_made", Some("mast"), STREET_FURNITURE),
    ("man_made", Some("water_tower"), LARGE),
    ("man_made", Some("surveillance"), STREET_FURNITURE),
    ("historic", Some("memorial"), STREET_FURNITURE),
    ("historic", Some("monument"), LARGE),
    ("historic", Some("ruins"), 0) // negative arm
  )

  // deterministic tag synthesis: entry 1 key by p_partkey % 8, value by
  // (p_partkey/8) % 4 from a flat 8×4 value table; entry "name" always;
  // entry 3 (keys disjoint from entry 1 so map keys never collide) when
  // p_partkey % 3 == 0.
  val keys1: Seq[String] =
    Seq("shop", "amenity", "tourism", "highway", "power", "leisure", "railway", "building")
  val vals1: Seq[String] = Seq(
    "convenience", "supermarket", "bakery", "clothes", // shop
    "restaurant", "school", "fuel", "bench", // amenity
    "hotel", "museum", "viewpoint", "artwork", // tourism
    "bus_stop", "street_lamp", "crossing", "footway", // highway
    "line", "tower", "pole", "generator", // power
    "garden", "park", "pitch", "playground", // leisure
    "station", "halt", "tram_stop", "level_crossing", // railway
    "retail", "school", "church", "yes") // building (no arms → unmatched)
  val keys2: Seq[String] = Seq("natural", "man_made", "historic")
  val vals2: Seq[String] = Seq(
    "tree", "water", "wood", // natural
    "mast", "water_tower", "surveillance", // man_made
    "memorial", "ruins", "monument") // historic

  private def sArr(xs: Seq[String]): Column = array(xs.map(lit): _*)

  /** `part` with the synthesized MapType tags column. */
  def taggedParts(s: SparkSession, dir: String): DataFrame = {
    val p = s.read.parquet(s"$dir/part.parquet").select(col("p_partkey"), col("p_name"))
    val pk = col("p_partkey")
    val k1 = element_at(sArr(keys1), (pk % 8 + 1).cast("int"))
    val v1 = element_at(sArr(vals1), ((pk % 8) * 4 + floor(pk / 8).cast("int") % 4 + 1).cast("int"))
    val i2 = floor(pk / 3).cast("int") % 3
    val k2 = element_at(sArr(keys2), (i2 + 1).cast("int"))
    val v2 = element_at(sArr(vals2), (i2 * 3 + floor(pk / 9).cast("int") % 3 + 1).cast("int"))
    val base = array(
      struct(k1.as("key"), v1.as("value")),
      struct(lit("name").as("key"), col("p_name").as("value")))
    val entries = when(pk % 3 === 0, concat(base, array(struct(k2.as("key"), v2.as("value")))))
      .otherwise(base)
    p.select(col("p_partkey"), col("p_name"), canonicalTags(entries).as("tags"))
  }

  /** Canonical map construction: entries SORTED by key before
    * map_from_entries, so every downstream render (q32's to_json) is
    * byte-deterministic for ANY upstream construction order — the
    * reference writes its tags map sorted for exactly this reason
    * (src/places/writer.rs:162, `sorted=true`). */
  def canonicalTags(entries: Column): Column = map_from_entries(array_sort(entries))

  /** Matcher arms as a (broadcastable) DataFrame; value NULL = wildcard;
    * prio 0 = specific, 1 = wildcard (Rust match tries specific first). */
  private def armsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    arms.map { case (k, v, bits) => (k, v.orNull, bits, if (v.isDefined) 0 else 1) }
      .toDF("ak", "av", "bits", "prio")
  }

  /** q31: tag-map mask classification (F4/F5 at fidelity). */
  def q31TagMask(s: SparkSession, dir: String): DataFrame = {
    val tagged = taggedParts(s, dir)
    val entries = tagged
      .select(col("p_partkey"), size(col("tags")).as("n_tags"),
        explode(map_entries(col("tags"))).as("e"))
      .select(col("p_partkey"), col("n_tags"), col("e.key").as("k"), col("e.value").as("v"))
    val a = broadcast(armsDf(s))
    entries
      .join(a, entries("k") === a("ak") && (a("av").isNull || a("av") === entries("v")))
      .groupBy(col("p_partkey"), col("n_tags"), col("k"), col("v"))
      .agg(min_by(col("bits"), col("prio")).as("entry_mask")) // specific wins
      .groupBy(col("p_partkey"), col("n_tags"))
      .agg(expr("bit_or(entry_mask)").as("mask"))
      .where(col("mask") =!= 0) // reference rejects maskless places
  }

  // --- shared SQL fragments for the oracle (same synthesis, relational) --
  private def sqlList(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString(", ")

  private val entriesSql: String =
    s"""p AS (SELECT p_partkey, p_name FROM part),
       |e1 AS (
       |  SELECT p_partkey,
       |    [${sqlList(keys1)}][(p_partkey % 8) + 1] AS k,
       |    [${sqlList(vals1)}][(p_partkey % 8) * 4 + (p_partkey // 8) % 4 + 1] AS v
       |  FROM p),
       |en AS (SELECT p_partkey, 'name' AS k, p_name AS v FROM p),
       |e2 AS (
       |  SELECT p_partkey,
       |    [${sqlList(keys2)}][(p_partkey // 3) % 3 + 1] AS k,
       |    [${sqlList(vals2)}][((p_partkey // 3) % 3) * 3 + (p_partkey // 9) % 3 + 1] AS v
       |  FROM p WHERE p_partkey % 3 = 0),
       |entries AS (SELECT * FROM e1 UNION ALL SELECT * FROM en UNION ALL SELECT * FROM e2)""".stripMargin

  private val armsSql: String =
    arms.map { case (k, v, bits) =>
      val av = v.map(x => s"'$x'").getOrElse("NULL")
      val prio = if (v.isDefined) 0 else 1
      s"('$k', $av, $bits, $prio)"
    }.mkString(",\n    ")

  val q31Sql: String =
    s"""WITH $entriesSql,
       |arms(ak, av, bits, prio) AS (VALUES
       |    $armsSql),
       |nt AS (SELECT p_partkey, 2 + CASE WHEN p_partkey % 3 = 0 THEN 1 ELSE 0 END AS n_tags FROM p),
       |matched AS (
       |  SELECT e.p_partkey, e.k, e.v, arg_min(a.bits, a.prio) AS entry_mask
       |  FROM entries e JOIN arms a ON a.ak = e.k AND (a.av IS NULL OR a.av = e.v)
       |  GROUP BY e.p_partkey, e.k, e.v)
       |SELECT m.p_partkey, nt.n_tags, bit_or(m.entry_mask) AS mask
       |FROM matched m JOIN nt ON m.p_partkey = nt.p_partkey
       |GROUP BY m.p_partkey, nt.n_tags
       |HAVING bit_or(m.entry_mask) <> 0""".stripMargin

  /** q32: GeoJSON feature render over the real map column (C13 at
    * fidelity — arbitrary tags→properties plus injected `@`-fields,
    * reference `places/mod.rs:60-107`). The rendered map is CANONICAL:
    * all entries (tags ∪ `@`-fields) sort by key before `to_json`, so
    * the bytes are independent of construction order — matching the
    * reference's sorted map write (src/places/writer.rs:162); the
    * oracle reproduces it with an ORDER BY inside string_agg. */
  def q32GeojsonTags(s: SparkSession, dir: String): DataFrame = {
    val tagged = taggedParts(s, dir)
    val withAt = canonicalTags(concat(
      map_entries(col("tags")),
      array(
        struct(lit("@id").as("key"), col("p_partkey").cast("string").as("value")),
        struct(lit("@layer").as("key"), lit("graft").as("value")))))
    tagged.select(
      col("p_partkey"),
      concat(
        lit("""{"type":"Feature","id":"""), col("p_partkey"),
        lit(""","properties":"""), to_json(withAt), lit("}")).as("feature_json"))
  }

  val q32Sql: String =
    s"""WITH $entriesSql,
       |withat AS (
       |  SELECT p_partkey, k, v FROM entries
       |  UNION ALL SELECT p_partkey, '@id' AS k, CAST(p_partkey AS VARCHAR) AS v FROM p
       |  UNION ALL SELECT p_partkey, '@layer' AS k, 'graft' AS v FROM p),
       |props AS (
       |  SELECT p_partkey,
       |    string_agg('"' || k || '":"' || v || '"', ',' ORDER BY k) AS body
       |  FROM withat GROUP BY p_partkey)
       |SELECT p_partkey,
       |  '{"type":"Feature","id":' || p_partkey || ',"properties":{' || body || '}}'
       |    AS feature_json
       |FROM props""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_tag_mask" -> (q31TagMask _),
    "q32_geojson_tags" -> (q32GeojsonTags _)
  )

  val oracles: Map[String, String] = Map(
    "q31_tag_mask" -> q31Sql,
    "q32_geojson_tags" -> q32Sql
  )
}
