package graft.ops

import graft.functions.fns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: language ID,
  * quality scoring, token counting, fingerprinting — the per-document map
  * stage of a training-data pipeline. All are narrow (no shuffle): at
  * 100 TB these run as a single scan-project pass with whole-stage
  * codegen, bounded only by IO.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  // Marker stopwords per language for the n-gram/stopword language-ID
  // heuristic. The heuristic (not the list) is the operator under test;
  // the oracle recomputes the identical heuristic.
  private val enWords = Seq("the", "a", "of", "and", "is", "to", "in")
  private val deWords = Seq("der", "die", "das", "und", "ist", "ein")
  private val frWords = Seq("le", "la", "et", "est", "les", "un")
  private val esWords = Seq("el", "los", "de", "y", "es", "una")

  private def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  /** q10: language ID via per-language marker-token counts + deterministic
    * argmax (fixed priority on ties, 'und' when nothing matches). */
  def q10LangId(s: SparkSession, dir: String): DataFrame = {
    // materialize the token array once: four countTokensIn's over an
    // inline wsTokens would each evaluate the regex split per row
    // (multi-use non-cheap aliases survive CollapseProject)
    val toks = col("ts")
    val d = docs(s, dir).withColumn("ts", fns.wsTokens(col("text"))).select(
      col("doc_id"),
      fns.countTokensIn(toks, enWords).as("n_en"),
      fns.countTokensIn(toks, deWords).as("n_de"),
      fns.countTokensIn(toks, frWords).as("n_fr"),
      fns.countTokensIn(toks, esWords).as("n_es"),
      col("lang").as("lang_actual"))
    val g = greatest(col("n_en"), col("n_de"), col("n_fr"), col("n_es"))
    d.withColumn("lang_pred",
      when(g === 0, "und")
        .when(col("n_en") === g, "en")
        .when(col("n_de") === g, "de")
        .when(col("n_fr") === g, "fr")
        .otherwise("es"))
  }

  val q10Sql: String =
    s"""SELECT doc_id, n_en, n_de, n_fr, n_es, lang_actual,
       |  CASE WHEN greatest(n_en, n_de, n_fr, n_es) = 0 THEN 'und'
       |       WHEN n_en = greatest(n_en, n_de, n_fr, n_es) THEN 'en'
       |       WHEN n_de = greatest(n_en, n_de, n_fr, n_es) THEN 'de'
       |       WHEN n_fr = greatest(n_en, n_de, n_fr, n_es) THEN 'fr'
       |       ELSE 'es' END AS lang_pred
       |FROM (
       |  SELECT doc_id,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN (${sqlList(enWords)}))) AS n_en,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN (${sqlList(deWords)}))) AS n_de,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN (${sqlList(frWords)}))) AS n_fr,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN (${sqlList(esWords)}))) AS n_es,
       |    lang AS lang_actual
       |  FROM documents)""".stripMargin

  /** q11: document quality score from length / punctuation / stopword
    * signals — the classic pre-training quality filter shape. */
  def q11Quality(s: SparkSession, dir: String): DataFrame = {
    val toks = col("ts") // materialized once, same rationale as q10
    val d = docs(s, dir).withColumn("ts", fns.wsTokens(col("text"))).select(
      col("doc_id"),
      length(col("text")).as("n_chars_m"),
      size(toks).as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0))).as("n_punct"),
      fns.countTokensIn(toks, enWords).as("n_stop"))
    d.select(
      col("doc_id"), col("n_chars_m"), col("n_tokens"), col("n_punct"), col("n_stop"),
      round(col("n_punct").cast("double") / col("n_chars_m"), 6).as("punct_ratio"),
      round(col("n_stop").cast("double") / col("n_tokens"), 6).as("stop_ratio"),
      round(
        least(lit(1.0), col("n_tokens") / 100.0) * 0.3
          + (lit(1.0) - col("n_punct").cast("double") / col("n_chars_m")) * 0.4
          + least(lit(1.0), col("n_stop").cast("double") / col("n_tokens") * 4.0) * 0.3,
        6).as("quality"))
  }

  val q11Sql: String =
    s"""SELECT doc_id, n_chars_m, n_tokens, n_punct, n_stop,
       |  round(n_punct::DOUBLE / n_chars_m, 6) AS punct_ratio,
       |  round(n_stop::DOUBLE / n_tokens, 6) AS stop_ratio,
       |  round(least(1.0, n_tokens / 100.0) * 0.3
       |      + (1.0 - n_punct::DOUBLE / n_chars_m) * 0.4
       |      + least(1.0, n_stop::DOUBLE / n_tokens * 4.0) * 0.3, 6) AS quality
       |FROM (
       |  SELECT doc_id, length(text) AS n_chars_m,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |    len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN (${sqlList(enWords)}))) AS n_stop
       |  FROM documents)""".stripMargin

  /** q12: token counting — whitespace tokens and a BPE-ish pre-tokenizer
    * (letter runs | single digits | single symbols), the standard way to
    * estimate token budgets before running a real BPE. */
  def q12TokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(fns.wsTokens(col("text"))).as("n_ws_tokens"),
      // explicit whitespace class, NOT \s: Java's \s matches \x0B where
      // RE2's does not, so the engines would disagree on a vertical-tab
      // byte (the q39/wsTokens rule; \x0B itself counts as a symbol)
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\f\\r]"), lit(0))).as("n_bpe_tokens"),
      length(col("text")).as("n_chars_m"))

  val q12Sql: String =
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\f\r]')) AS n_bpe_tokens,
      |  length(text) AS n_chars_m
      |FROM documents""".stripMargin

  /** q13: winnowed rolling-hash fingerprints (custom codegen'd Catalyst
    * expression). The DuckDB oracle recomputes the identical Rabin–Karp
    * (direct polynomial form — equal to the rolling form in the mod-2^64
    * ring) + splitmix64 + window-min selection via SqlKernels; the
    * winnow's distinct VALUE set only needs per-window min values (the
    * ties→rightmost position rule affects positions, not values). */
  def q13Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), fns.winnowFingerprint(col("text"), n = 8, w = 4).as("fp"))
      .select(
        col("doc_id"),
        size(col("fp")).as("n_fp"),
        element_at(col("fp"), 1).as("min_fp"),
        element_at(col("fp"), -1).as("max_fp"))

  val q13Sql: String = {
    import SqlKernels._
    // n = 8 (char n-grams), w = 4 (winnow window); window-min runs in the
    // SIGNED domain to match java.util.Arrays.sort / Long.compare.
    s"""WITH codes AS (
       |  SELECT doc_id, length(text) AS n_chars, ${charCodes("text")} AS cs
       |  FROM documents),
       |grams0 AS (
       |  SELECT doc_id, i, ${polyFold("list_slice(cs, i, i + 7)", 1000003L)} AS h0
       |  FROM codes, unnest(generate_series(1, n_chars - 7)) AS t(i)),
       |grams AS (
       |  SELECT doc_id, i, ${i64("hu")} AS gh
       |  FROM ${mix64Select("grams0", "h0", "hu")} AS mx),
       |cnt AS (SELECT doc_id, count(*) AS m FROM grams GROUP BY doc_id),
       |wins AS (
       |  SELECT doc_id, i,
       |    min(gh) OVER (PARTITION BY doc_id ORDER BY i
       |                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
       |  FROM grams),
       |sel AS (
       |  SELECT DISTINCT w.doc_id, w.wmin
       |  FROM wins w JOIN cnt ON w.doc_id = cnt.doc_id
       |  WHERE w.i <= greatest(1, cnt.m - 3))
       |SELECT d.doc_id,
       |  count(s.wmin) AS n_fp,
       |  min(s.wmin) AS min_fp,
       |  max(s.wmin) AS max_fp
       |FROM documents d LEFT JOIN sel s ON d.doc_id = s.doc_id
       |GROUP BY d.doc_id""".stripMargin
  }

  /** q34: dataset-license filter at reference fidelity (F1,
    * `atp/mod.rs:160-213`): the license check is DATASET-level — one doc
    * with a denied license rejects the whole dataset (the reference
    * rejects the entire FeatureCollection file early), unless the
    * dataset carries the override marker (the `use:openstreetmap`
    * analog). Spark-first: the bad-dataset set is a tiny distinct →
    * broadcast LEFT ANTI join, so the reject never shuffles the corpus —
    * the file-level early-exit reborn as a broadcast anti-join. */
  def q34LicenseFilter(s: SparkSession, dir: String): DataFrame = {
    val lics = Seq("CC0", "CC-BY", "ODbL-denied", "proprietary", "CC-BY-SA")
    val denied = Seq("ODbL-denied", "proprietary")
    val d = docs(s, dir).select(
      col("doc_id"),
      (col("doc_id") % 25).as("dataset_id"),
      element_at(array(lics.map(lit): _*), (col("doc_id") * 13 % 5 + 1).cast("int")).as("license"))
    val overridden = col("dataset_id") % 7 === 0 // use:openstreetmap analog
    val bad = d.where(col("license").isin(denied.map(x => x: Any): _*) && !overridden)
      .select(col("dataset_id")).distinct()
    d.join(broadcast(bad), Seq("dataset_id"), "left_anti")
      .select(col("doc_id"), col("dataset_id"), col("license"))
  }

  val q34Sql: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 25 AS dataset_id,
      |    ['CC0', 'CC-BY', 'ODbL-denied', 'proprietary', 'CC-BY-SA'][CAST(doc_id * 13 % 5 + 1 AS INT)] AS license
      |  FROM documents),
      |bad AS (
      |  SELECT DISTINCT dataset_id FROM d
      |  WHERE license IN ('ODbL-denied', 'proprietary') AND dataset_id % 7 <> 0)
      |SELECT doc_id, dataset_id, license FROM d
      |WHERE dataset_id NOT IN (SELECT dataset_id FROM bad)""".stripMargin

  // q39: PII redaction — the scrub stage every training-data pipeline
  // runs before anything else. Sequential passes (emails, then phone-ish
  // digit runs on the email-redacted text so an address's digits are
  // never double-counted, then IPv4s), each pass counting then replacing.
  // Patterns stay in the Java-regex ∩ RE2 common subset (no \s, whose
  // char class differs between the engines) so the DuckDB oracle computes
  // the IDENTICAL function. Narrow scan-project: at 100 TB this is one
  // codegen'd pass, bounded by IO. PII is deterministically injected
  // (like q34's licenses) because the synthetic corpus carries none.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
  private val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def q39Redact(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(
      col("text"),
      when(col("doc_id") % 4 === 0,
        concat(lit(" contact: user"), col("doc_id").cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call +1 (555) 010-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") * 7 % 256).cast("string")))
        .otherwise(lit("")))
    docs(s, dir)
      .select(col("doc_id"), injected.as("t0"))
      .withColumn("n_email", size(regexp_extract_all(col("t0"), lit(EmailRe), lit(0))))
      .withColumn("t1", regexp_replace(col("t0"), EmailRe, "<EMAIL>"))
      .withColumn("n_phone", size(regexp_extract_all(col("t1"), lit(PhoneRe), lit(0))))
      .withColumn("t2", regexp_replace(col("t1"), PhoneRe, "<PHONE>"))
      .withColumn("n_ip", size(regexp_extract_all(col("t2"), lit(Ipv4Re), lit(0))))
      .withColumn("t3", regexp_replace(col("t2"), Ipv4Re, "<IP>"))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        length(col("t3")).as("n_chars_red"),
        sha2(col("t3"), 256).as("redacted_sha"))
  }

  val q39Sql: String =
    s"""WITH injected AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 4 = 0 THEN ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0 THEN ' call +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id * 7 % 256 AS VARCHAR) ELSE '' END
       |    AS t0
       |  FROM documents),
       |p1 AS (SELECT doc_id, t0,
       |  len(regexp_extract_all(t0, '$EmailRe')) AS n_email,
       |  regexp_replace(t0, '$EmailRe', '<EMAIL>', 'g') AS t1 FROM injected),
       |p2 AS (SELECT doc_id, n_email,
       |  len(regexp_extract_all(t1, '$PhoneRe')) AS n_phone,
       |  regexp_replace(t1, '$PhoneRe', '<PHONE>', 'g') AS t2 FROM p1),
       |p3 AS (SELECT doc_id, n_email, n_phone,
       |  len(regexp_extract_all(t2, '$Ipv4Re')) AS n_ip,
       |  regexp_replace(t2, '$Ipv4Re', '<IP>', 'g') AS t3 FROM p2)
       |SELECT doc_id, n_email, n_phone, n_ip,
       |  length(t3) AS n_chars_red, sha256(t3) AS redacted_sha
       |FROM p3""".stripMargin

  /** q40: corpus document-frequency analysis — the rare-token/quality
    * primitive behind vocabulary pruning and TF-IDF-style filtering.
    * Shape: explode words → DF per word (distinct-doc count) → join the
    * tiny vocabulary BACK onto the per-doc term counts → per-doc stats.
    * At 100 TB the vocabulary is ≪ the corpus, so the DF table is
    * BROADCAST and the corpus never shuffles twice (one exchange for the
    * per-(doc, word) count, one for the DF aggregate — both partial-agg
    * friendly). Outputs stay integer/string so the oracle compare is
    * hash-exact (no float-ulp traps); the rarest term rides a
    * `lpad(df):word` string key, making the (df, word) argmin a plain
    * byte-order min in BOTH engines. */
  def q40DocFreq(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
    val perDoc = words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    // df(w) = distinct-doc count = row count of perDoc per w: deriving it
    // FROM perDoc (instead of a second countDistinct over the raw explode)
    // makes both join inputs share one subplan, so Spark's ReuseExchange
    // scans + explodes + wide-shuffles the corpus ONCE instead of twice.
    // The summand must REFERENCE tf (`when(tf >= 1, 1)` — always 1, the
    // optimizer can't prove it): a bare count would let Catalyst strip the
    // inner count(1) from this branch (count-of-non-null → distinct-only
    // aggregate), and the de-synchronized subplan would no longer
    // canonicalize to the probe side's exchange — two full explodes again
    val dfTable = perDoc.groupBy(col("w"))
      .agg(sum(when(col("tf") >= 1, 1L)).as("df"))
    perDoc.join(broadcast(dfTable), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_terms"),
        count(lit(1)).as("n_distinct"),
        min(concat(lpad(col("df").cast("string"), 12, "0"), lit(":"), col("w")))
          .as("rarest"),
        sum(when(col("df") <= 25, 1L).otherwise(0L)).as("n_rare_terms"))
  }

  val q40Sql: String =
    """WITH words AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) > 0),
      |per_doc AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
      |dft AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY 1)
      |SELECT doc_id,
      |  CAST(sum(tf) AS BIGINT) AS n_terms,
      |  count(*) AS n_distinct,
      |  min(lpad(CAST(df AS VARCHAR), 12, '0') || ':' || w) AS rarest,
      |  CAST(sum(CASE WHEN df <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare_terms
      |FROM per_doc JOIN dft USING (w)
      |GROUP BY doc_id""".stripMargin

  /** q41: top-3 rarity-weighted terms per document (TF-IDF family with
    * the LINEAR idf variant N/df — constant N drops out of the ranking,
    * so ordering by `tf/df` is exactly ordering by tf·idf_linear). The
    * log-idf variant would put a transcendental (`ln`) on the compare
    * path, where a JVM-vs-DuckDB last-ulp disagreement could flip a
    * near-tie rank and break the hash gate; the linear variant keeps the
    * score a SINGLE IEEE division, bit-identical in both engines, with
    * term-asc tie-break. Same plan shape as q40: the DF vocabulary is
    * tiny and broadcast, the corpus shuffles once for the per-(doc,term)
    * count; the per-doc top-k window partitions by doc_id (no hot key). */
  def q41TfidfTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
    val perDoc = words.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df derived from perDoc (one row per (doc, term)) — see q40: the
    // tf-referencing summand keeps the branch canonically identical to the
    // probe side, so the second corpus explode becomes a ReusedExchange
    val dfTable = perDoc.groupBy(col("term"))
      .agg(sum(when(col("tf") >= 1, 1L)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy((col("tf") * lit(1.0) / col("df")).desc, col("term").asc)
    perDoc.join(broadcast(dfTable), Seq("term"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
  }

  val q41Sql: String =
    """WITH words AS (
      |  SELECT doc_id, term FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  WHERE length(term) > 0),
      |per_doc AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
      |dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
      |scored AS (SELECT doc_id, term, tf, df,
      |  CAST(row_number() OVER (
      |    PARTITION BY doc_id ORDER BY tf * 1.0 / df DESC, term) AS INT) AS rnk
      |  FROM per_doc JOIN dft USING (term))
      |SELECT doc_id, rnk, term, tf, df FROM scored WHERE rnk <= 3""".stripMargin

  /** q42: deterministic stratified sampling — the reproducible
    * train/eval-split primitive. A document's sample bucket is
    * `mix64(doc_id) & 127` (splitmix64 finalizer, low 7 bits — a
    * power-of-two mask so the signed-Spark and unsigned-oracle views of
    * the same 64 bits agree), and each language stratum keeps buckets
    * below its own rate: the sample is a pure function of the data, so
    * it is identical on every worker, every run, and every engine —
    * no shuffle, no state, a codegen'd scan-filter that at 100 TB is
    * exactly as parallel as the scan itself. English (the majority
    * stratum) keeps ~10%, every other language ~30% — the usual
    * rebalance-toward-minority-strata shape. */
  def q42StratifiedSample(s: SparkSession, dir: String): DataFrame =
    hashStratifiedSample(docs(s, dir), "doc_id", "lang", 38, Map("en" -> 13))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("bucket"))

  /** The reusable kernel behind q42 (and `CALL graft.system.
    * sample_stratified`): keep a row iff mix64(id) mod 128 falls under
    * its stratum's per-128 rate — shuffle-free, engine-independent,
    * identical at any parallelism. Input columns pass through + `bucket`. */
  private[graft] def hashStratifiedSample(d: DataFrame, idCol: String,
                                          stratumCol: String, defaultPer128: Int,
                                          rates: Map[String, Int]): DataFrame = {
    require(defaultPer128 >= 0 && defaultPer128 <= 128 &&
      rates.values.forall(v => v >= 0 && v <= 128), "rates are per-128 buckets")
    val bucket = graft.functions.fns.mix64(col(idCol)).bitwiseAND(lit(127L))
    // rates.toSeq.sortBy keeps the when-chain deterministic across runs
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPer128.toLong)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v.toLong)).otherwise(acc)
    }
    d.withColumn("bucket", bucket).where(col("bucket") < rate)
  }

  val q42Sql: String = {
    import SqlKernels._
    val inner =
      "(SELECT doc_id, lang, source, n_chars, doc_id::HUGEINT AS h0 FROM documents)"
    s"""SELECT doc_id, lang, source, n_chars, CAST(hu % 128 AS BIGINT) AS bucket
       |FROM ${mix64Select(inner, "h0", "hu")}
       |WHERE hu % 128 < CASE WHEN lang = 'en' THEN 13 ELSE 38 END""".stripMargin
  }

  /** q43: exact per-stratum quantiles (p50/p90 by the percentile_disc
    * rule: the value at row ⌈q·n⌉ of the sorted stratum) of document
    * length — the corpus-profiling op behind length-filter thresholds.
    * Computed relationally as a window rank + conditional aggregate, not
    * `percentile_approx`: the outputs are exact INTEGERS, so the oracle
    * compare is hash-exact and the same formulation runs in both
    * engines. One exchange on the stratum key; the per-stratum sort is
    * the spillable window sort. Approximate sketches remain the 100-TB
    * scale path when strata are huge; this is the exact baseline. */
  def q43LengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLen = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val all = Window.partitionBy(col("lang"))
    docs(s, dir)
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(byLen))
      .withColumn("n", count(lit(1)).over(all))
      .groupBy(col("lang"))
      .agg(
        max(col("n")).as("n_docs"),
        max(when(col("rn") === ceil(col("n") * lit(0.5)).cast("long"), col("n_chars")))
          .as("p50"),
        max(when(col("rn") === ceil(col("n") * lit(0.9)).cast("long"), col("n_chars")))
          .as("p90"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
  }

  val q43Sql: String =
    """WITH ranked AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT lang,
      |  max(n) AS n_docs,
      |  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN n_chars END) AS p50,
      |  max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN n_chars END) AS p90,
      |  min(n_chars) AS min_chars,
      |  max(n_chars) AS max_chars
      |FROM ranked
      |GROUP BY lang""".stripMargin

  /** q44: benchmark decontamination — flag training documents sharing
    * any word n-gram with a held-out EVAL set (the standard
    * train/test-overlap rule; web-scale pipelines use 13-grams, scaled
    * here to 4-grams to match the synthetic corpus's 10-99-token docs).
    * The eval set is a deterministic slice of the corpus
    * (`doc_id % 37 = 0` — benchmarks are tiny next to training data),
    * so the plan shape is the one that matters at 100 TB: the eval
    * gram vocabulary is built once, DISTINCT'd small, and BROADCAST;
    * the training corpus explodes its grams in place and never
    * shuffles for the join — the only exchange is the per-doc
    * count-distinct aggregation, partitioned by doc_id (no hot key). */
  def q44Decontaminate(s: SparkSession, dir: String): DataFrame =
    q44Bounded(s, dir, MaxBroadcastGrams)

  /** Broadcast budget for q44's eval-gram vocabulary (~30-byte grams →
    * ~15 MB). Real decontamination at 13-grams × dozens of benchmarks
    * reaches 10⁷–10⁸ grams — past the budget the join falls back to a
    * shuffle equi-join on the gram (fine-grained key, no hot key: a
    * perfectly scalable exchange), so the broadcast never grows
    * unboundedly with the eval set. */
  val MaxBroadcastGrams = 500000L

  /** Parameterized budget so specs can force the shuffle path. */
  private[graft] def q44Bounded(s: SparkSession, dir: String,
                                maxBroadcastGrams: Long): DataFrame = {
    val grams = docs(s, dir)
      .withColumn("ts", fns.wsTokens(col("text")))
      .where(size(col("ts")) >= 4)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("ts")) - lit(3)),
          i => concat_ws(" ", slice(col("ts"), i, lit(4))))).as("gram"))
    val evalGrams = grams.where(col("doc_id") % 37 === 0)
      .select(col("gram")).distinct()
    // measured-count gate: one cheap scan of the (small) eval slice
    val evalSide =
      if (evalGrams.count() <= maxBroadcastGrams) broadcast(evalGrams)
      else evalGrams
    grams.where(col("doc_id") % 37 =!= 0)
      .join(evalSide, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared"))
  }

  val q44Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
      |grams AS (
      |  SELECT doc_id, array_to_string(ts[i:i+3], ' ') AS gram
      |  FROM toks, unnest(generate_series(1, greatest(len(ts) - 3, 0))) AS t(i)),
      |eval_g AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 37 = 0)
      |SELECT doc_id, count(DISTINCT gram) AS n_shared
      |FROM grams
      |WHERE doc_id % 37 <> 0 AND gram IN (SELECT gram FROM eval_g)
      |GROUP BY doc_id""".stripMargin

  /** q45: repetition-based quality filter (the Gopher-rules family):
    * per document, the most-frequent-token fraction and the duplicate
    * bigram fraction, with a keep flag under fixed thresholds. Both
    * fractions are a SINGLE IEEE division (the q41 rule: no
    * transcendentals on the compare path, bit-identical across
    * engines); the top token breaks count ties lexicographically so
    * both engines pick the same witness. One exchange on doc_id
    * (the per-doc token counts); everything after is windowed inside
    * the same partitioning. */
  def q45Repetition(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).withColumn("ts", fns.wsTokens(col("text")))
    val toks = d.select(col("doc_id"), explode(col("ts")).as("t"))
    val cnt = toks.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("t").asc)
    val top = cnt
      .withColumn("rn", row_number().over(w))
      .withColumn("n_tokens", sum(col("c")).over(Window.partitionBy(col("doc_id"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("n_tokens"), col("t").as("top_token"),
        (col("c") * lit(1.0) / col("n_tokens")).as("top_frac"))
    val bigr = d.where(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("ts")) - lit(1)),
          i => concat_ws(" ", slice(col("ts"), i, lit(2))))).as("g"))
      .groupBy(col("doc_id"))
      .agg((lit(1.0) - countDistinct(col("g")) * lit(1.0) / count(lit(1)))
        .as("dup_bigram_frac"))
    top.join(bigr, Seq("doc_id"))
      .withColumn("keep", col("top_frac") < 0.15 && col("dup_bigram_frac") < 0.2)
  }

  val q45Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents),
      |cnt AS (SELECT doc_id, t, count(*) AS c FROM toks GROUP BY 1, 2),
      |top AS (
      |  SELECT doc_id, n_tokens, t AS top_token, c * 1.0 / n_tokens AS top_frac
      |  FROM (SELECT doc_id, t, c,
      |          row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, t) AS rn,
      |          CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tokens
      |        FROM cnt)
      |  WHERE rn = 1),
      |bigr AS (
      |  SELECT doc_id,
      |    1.0 - count(DISTINCT g) * 1.0 / count(*) AS dup_bigram_frac
      |  FROM (
      |    SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS g
      |    FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
      |         unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS u(i)
      |    WHERE len(ts) >= 2)
      |  GROUP BY doc_id)
      |SELECT top.doc_id, n_tokens, top_token, top_frac, dup_bigram_frac,
      |  top_frac < 0.15 AND dup_bigram_frac < 0.2 AS keep
      |FROM top JOIN bigr ON top.doc_id = bigr.doc_id""".stripMargin

  /** q46: SKETCH quantiles per language stratum — the 100-TB companion
    * to q43's exact window form. A fixed-width histogram (bucket =
    * n_chars div [[Q46BucketWidth]]) reduces the corpus to per-(lang,
    * bucket) counts in ONE map-side-combined exchange whose state is
    * bounded by (strata × value-range/width), independent of row count;
    * quantiles read off the cumulative counts as the lower edge of the
    * first bucket whose running total crosses ceil(p·n). Error bound is
    * the bucket width (documented, deterministic — unlike GK/t-digest
    * sketches whose outputs are engine-dependent and can't hash-match an
    * oracle). Histograms merge trivially across partitions/days, which
    * is exactly why production profiling pipelines ship them. A spec
    * asserts the sketch lands within one width of q43's exact answers
    * and of Spark's own percentile_approx. */
  val Q46BucketWidth = 64

  def q46HistQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Q46BucketWidth
    val hist = docs(s, dir)
      .select(col("lang"), floor(col("n_chars") / w).as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(col("lang")).orderBy(col("bucket"))
    val allW = Window.partitionBy(col("lang"))
    hist
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(allW))
      .groupBy(col("lang"))
      .agg(
        max(col("n")).as("n_docs"),
        min(when(col("cum") >= ceil(col("n") * lit(0.5)), col("bucket") * w))
          .as("p50_lo"),
        min(when(col("cum") >= ceil(col("n") * lit(0.9)), col("bucket") * w))
          .as("p90_lo"))
  }

  val q46Sql: String =
    """WITH hist AS (
      |  SELECT lang, CAST(floor(n_chars / 64.0) AS BIGINT) AS bucket, count(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT lang, bucket, c,
      |    sum(c) OVER (PARTITION BY lang ORDER BY bucket) AS cum,
      |    sum(c) OVER (PARTITION BY lang) AS n
      |  FROM hist)
      |SELECT lang,
      |  CAST(max(n) AS BIGINT) AS n_docs,
      |  min(CASE WHEN cum >= ceil(n * 0.5) THEN bucket * 64 END) AS p50_lo,
      |  min(CASE WHEN cum >= ceil(n * 0.9) THEN bucket * 64 END) AS p90_lo
      |FROM cum GROUP BY lang""".stripMargin

  /** q48: GPT-style sequence packing — concatenate every document's
    * tokens in deterministic doc_id order and cut the stream into fixed
    * [[Q48ChunkTokens]]-token training chunks; emit each document's
    * chunk span (first/last chunk id, chunk count). This is the
    * standard pretraining batch-assembly step (documents are
    * concatenated and split at fixed sequence boundaries, so a document
    * may straddle chunks) — the map from documents to training
    * sequences that every data-loader shuffle/repeat epoch needs.
    *
    * Scale shape (100 TB): the naive formulation is a GLOBAL ordered
    * window — one partition, a scale-killer. This is the classic
    * two-pass distributed prefix sum instead: doc_id is dense, so
    * `doc_id div RangeWidth` is a DETERMINISTIC range key (no sampled
    * boundaries — same result at any parallelism); pass 1 computes
    * per-range local cumsums in one exchange, pass 2 offsets on the
    * O(nDocs / RangeWidth) range summary (tiny by construction: at
    * 10¹⁰ docs and width 2²⁰, ~10⁴ rows) and broadcast-joins them
    * back. Output is all integers — hash-exact vs the oracle's global
    * window. */
  val Q48ChunkTokens = 512
  val Q48RangeWidth = 1024L

  def q48SeqPack(s: SparkSession, dir: String): DataFrame =
    q48Packed(s, dir, Q48RangeWidth)

  /** Range width parameterized so specs can force the multi-range
    * two-pass path at test scale (500 dense doc_ids fit one default
    * range) and prove the output is range-width-invariant. */
  private[graft] def q48Packed(s: SparkSession, dir: String,
                               rangeWidth: Long): DataFrame =
    packSequences(docs(s, dir)
        .select(col("doc_id"), size(fns.wsTokens(col("text"))).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", Q48ChunkTokens, rangeWidth)

  /** The reusable packing kernel behind q48 (and `CALL graft.system.
    * pack_sequences`) over any `(id, tokenCount)` frame: the two-pass
    * distributed prefix sum keyed on `id div rangeWidth` — see q48's
    * scaladoc for why this replaces the global-window scale-killer. */
  private[graft] def packSequences(d0: DataFrame, idCol: String, tokensCol: String,
                                   chunkTokens: Int, rangeWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(chunkTokens > 0 && rangeWidth > 0, "chunkTokens/rangeWidth must be positive")
    val b = chunkTokens
    val d = d0
      .select(col(idCol).as("doc_id"), col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("rk", floor(col("doc_id") / rangeWidth).cast("long"))
    val wLoc = Window.partitionBy(col("rk")).orderBy(col("doc_id"))
    val local = d.withColumn("cum_in", sum(col("n_tokens")).over(wLoc))
    // the global window here runs over the RANGE SUMMARY, not the corpus
    val wOff = Window.orderBy(col("rk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("rk")).agg(sum(col("n_tokens")).as("rsum"))
      .withColumn("off", coalesce(sum(col("rsum")).over(wOff), lit(0L)))
      .select(col("rk"), col("off"))
    local.join(broadcast(offsets), Seq("rk"))
      .withColumn("start", col("off") + col("cum_in") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("start") / b).cast("long").as("first_chunk"),
        floor((col("start") + col("n_tokens") - lit(1L)) / b).cast("long")
          .as("last_chunk"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + lit(1L))
  }

  val q48Sql: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum
      |  FROM d)
      |SELECT doc_id, n_tokens,
      |  (cum - n_tokens) // $Q48ChunkTokens AS first_chunk,
      |  (cum - 1) // $Q48ChunkTokens AS last_chunk,
      |  (cum - 1) // $Q48ChunkTokens - (cum - n_tokens) // $Q48ChunkTokens + 1 AS n_chunks
      |FROM c""".stripMargin

  /** q49: per-stratum approximate distinct counts via a KMV (k-minimum-
    * values) sketch — the 100-TB COUNT DISTINCT path. Exact per-group
    * distinct over a fine-grained universe (here: word 3-gram shingles)
    * shuffles the full universe; the KMV estimate needs only each
    * stratum's K smallest hash values, found with a two-level top-K
    * (per-(stratum, salt) K smallest inside the exchange the distinct
    * already pays, then K smallest of the 64·K survivors — the global
    * K-min is a subset of the per-salt K-mins, so no stratum-sized
    * window ever forms). KMV estimate = (K-1)·2^48/h_K (unbiased;
    * stderr ≈ 1/√(K-2) ≈ 6% at K=256), falling back to the exact count
    * in the n < K regime. Hashes are the TOP 48 bits of the engine's
    * mirrorable string hash (Hashing.hashUtf8 = FNV-1a + splitmix64):
    * 48-bit values are nonnegative longs AND exactly representable as
    * doubles, so ordering agrees between Spark (signed) and DuckDB
    * (unsigned HUGEINT) and the estimate is ONE exactly-reproducible
    * IEEE division — hash-exact across engines, which libm-dependent
    * sketches (HLL's ln, t-digest) cannot be. Production full-64-bit
    * variants move the math to integer domains; the sketch itself
    * merges associatively across partitions, days, and tables. */
  val Q49K = 256

  def q49KmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs(s, dir)
      .withColumn("ts", fns.wsTokens(col("text")))
      .select(col("lang"), explode(fns.wordShingles(col("ts"), 3)).as("gram"))
    // one map-side-combined distinct carries the heavy gram stream; the
    // per-salt rank AND the per-salt distinct count then ride a single
    // window pass over the (already small) distinct set, and the tiny
    // survivor frame is checkpointed so neither downstream consumer
    // re-runs the scan+explode pipeline (the naive two-consumer form
    // planned the whole extraction twice — two Generate nodes)
    val hashes = grams
      .select(col("lang"),
        shiftrightunsigned(fns.strHash64(col("gram")), 16).as("h48"))
      .distinct()
      .withColumn("salt", col("h48") % 64)
    val wOrd = Window.partitionBy(col("lang"), col("salt")).orderBy(col("h48"))
    val wCnt = Window.partitionBy(col("lang"), col("salt"))
    val marked = hashes
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("sc", count(lit(1)).over(wCnt))
      .where(col("rn") <= Q49K) // <= 64*K survivors per stratum
      .select(col("lang"), col("h48"), col("rn"), col("sc"))
      .localCheckpoint()
    // every salt's rn=1 row carries that salt's distinct count
    val stats = marked.where(col("rn") === 1)
      .groupBy(col("lang")).agg(sum(col("sc")).as("n_distinct_h"))
    val wl = Window.partitionBy(col("lang")).orderBy(col("h48"))
    val kth = marked.withColumn("rk", row_number().over(wl))
      .where(col("rk") === Q49K)
      .select(col("lang"), col("h48").as("hk"))
    val raw = lit((Q49K - 1).toDouble * 281474976710656.0) / col("hk").cast("double")
    stats
      .join(kth, Seq("lang"), "left")
      .select(col("lang"), col("n_distinct_h"),
        round(when(col("hk").isNull, col("n_distinct_h").cast("double"))
          .otherwise(raw), 3).as("kmv_estimate"),
        round(when(col("hk").isNull, lit(0.0))
          .otherwise((raw - col("n_distinct_h")) / col("n_distinct_h")), 6)
          .as("rel_err"))
  }

  val q49Sql: String = {
    import SqlKernels._
    s"""WITH toks AS (
       |  SELECT lang, string_split_regex(trim(text), '\\s+') AS ts FROM documents),
       |grams AS (
       |  SELECT lang, array_to_string(ts[i:i+2], ' ') AS gram
       |  FROM toks, unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS u(i)
       |  WHERE len(ts) >= 3),
       |h0 AS (SELECT lang, gram, ${fnv1aFold(charCodes("gram"))} AS h0 FROM grams),
       |hs AS (SELECT DISTINCT lang, (hu // 65536)::BIGINT AS h48
       |       FROM ${mix64Select("h0", "h0", "hu")} AS mx),
       |rk AS (SELECT lang, h48,
       |         row_number() OVER (PARTITION BY lang ORDER BY h48) AS rk
       |       FROM hs),
       |st AS (SELECT lang, count(*) AS n_distinct_h FROM hs GROUP BY lang),
       |kth AS (SELECT lang, h48 AS hk FROM rk WHERE rk = $Q49K)
       |SELECT st.lang, n_distinct_h,
       |  round(CASE WHEN hk IS NULL THEN n_distinct_h::DOUBLE
       |    ELSE (${Q49K - 1}::DOUBLE * 281474976710656::DOUBLE) / hk::DOUBLE END, 3)
       |    AS kmv_estimate,
       |  round(CASE WHEN hk IS NULL THEN 0.0::DOUBLE
       |    ELSE ((${Q49K - 1}::DOUBLE * 281474976710656::DOUBLE) / hk::DOUBLE
       |          - n_distinct_h) / n_distinct_h END, 6) AS rel_err
       |FROM st LEFT JOIN kth ON st.lang = kth.lang""".stripMargin
  }

  /** q50: deterministic weighted (PPS) sampling with Horvitz-Thompson
    * weights — "sample training docs proportional to size/quality,
    * reproducibly". Bernoulli probability-proportional-to-size: doc d
    * is kept iff u48(d) < w(d)·2^37 where u48 = top 48 bits of
    * mix64(doc_id) (uniform on [0, 2^48)) and w = n_chars, i.e.
    * p = min(1, n_chars/2048); the emitted ht_weight 1/p makes any
    * downstream sum over the sample unbiased for the corpus total
    * (Horvitz-Thompson). The sample is a pure function of the data —
    * same members on every worker, run, engine, and partitioning — and
    * the operator is a shuffle-free codegen'd scan-filter: at 100 TB it
    * parallelizes exactly as the scan does, and the weight column
    * composes with q11's quality score as w for quality-weighted
    * epochs. All arithmetic is power-of-two exact (p is an exact
    * double, the inclusion test is integer), so the oracle compare is
    * hash-exact; ht_weight is the single rounded IEEE division. */
  def q50WeightedSample(s: SparkSession, dir: String): DataFrame =
    ppsSample(docs(s, dir), "doc_id", "n_chars", 2048L)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("p"), col("ht_weight"))

  /** The reusable PPS kernel behind q50 (and `CALL graft.system.
    * sample_pps`): Bernoulli probability-proportional-to-size with
    * Horvitz-Thompson weights over any `(id, weight)` frame. `scale`
    * must be a power of two so p = min(1, w/scale) and the inclusion
    * threshold stay exactly representable (hash-exact cross-engine).
    * Input columns pass through + `p`, `ht_weight`. */
  private[graft] def ppsSample(d: DataFrame, idCol: String, weightCol: String,
                               scale: Long): DataFrame = {
    require(scale > 0 && (scale & (scale - 1)) == 0, s"scale must be a power of two: $scale")
    // past 2^48 the threshold multiplier (2^48 / scale) integer-divides
    // to 0 and EVERY row silently fails the inclusion test
    require(scale <= (1L << 48), s"scale must be <= 2^48: $scale")
    val u48 = shiftrightunsigned(fns.mix64(col(idCol)), 16)
    val p = least(lit(1.0), col(weightCol).cast("double") / lit(scale.toDouble))
    // the clamp keeps the threshold product <= 2^48 (no long overflow for
    // huge docs) and makes every p = 1 doc unconditionally included
    // (u48 < 2^48 always holds)
    d.withColumn("u48", u48)
      .where(col("u48") <
        least(col(weightCol).cast("long"), lit(scale)) * lit(281474976710656L / scale))
      .drop("u48")
      .withColumn("p", p)
      .withColumn("ht_weight", round(lit(1.0) / p, 6))
  }

  val q50Sql: String = {
    import SqlKernels._
    val inner =
      "(SELECT doc_id, lang, n_chars, doc_id::HUGEINT AS h0 FROM documents)"
    s"""SELECT doc_id, lang, n_chars,
       |  least(1.0::DOUBLE, n_chars::DOUBLE / 2048.0::DOUBLE) AS p,
       |  round(1.0::DOUBLE / least(1.0::DOUBLE, n_chars::DOUBLE / 2048.0::DOUBLE), 6)
       |    AS ht_weight
       |FROM ${mix64Select(inner, "h0", "hu")}
       |WHERE hu // 65536 < least(n_chars, 2048)::HUGEINT * 137438953472::HUGEINT""".stripMargin
  }

  /** q51: cross-document LINE-level dedup (the FineWeb/CCNet structural
    * pass): split every document into lines, drop each line that occurs
    * in ≥2 DISTINCT documents (boilerplate headers, navigation chrome,
    * repeated disclaimers), and reassemble what remains in original
    * order. Whole-doc dedup (q7) and near-dup (q14-q17) can't touch
    * this — the duplication lives INSIDE otherwise-unique documents.
    * The synthetic corpus has no newlines, so "lines" are deterministic
    * [[Q51LineTokens]]-token chunks, and a constant boilerplate header
    * is injected on every third document (q34/q39's injection pattern)
    * so the boilerplate-removal case is exercised alongside the
    * corpus's natural cross-doc duplicate chunks.
    *
    * Scale shape (100 TB): the corpus is scanned, tokenized, and
    * exploded exactly ONCE. The per-line distinct-doc count is NOT a
    * groupBy + join back (that plans a second scan+explode of the
    * corpus — caught in review, the executed plan had two Generate
    * subtrees); it is the classic dense_rank→max window pair over one
    * exchange on `line`: dense_rank orders docs within a line
    * partition, its partition max IS count(DISTINCT doc_id), and both
    * window passes share the same sort. Reassembly is the second and
    * last exchange (doc_id) with an order-restoring array_sort — no
    * global order, no driver materialization, no join. Output rows are
    * narrow (counts + sha of the reassembled text) so the op composes
    * as a pipeline stage. PlanSpec pins the shape: one scan instance,
    * exactly two shuffles. */
  val Q51LineTokens = 8

  private val Q51Boiler =
    "begin common header boilerplate license notice terms apply "

  def q51LineDedup(s: SparkSession, dir: String): DataFrame = {
    val k = Q51LineTokens
    val injected = concat(
      when(col("doc_id") % 3 === 0, lit(Q51Boiler)).otherwise(lit("")),
      col("text"))
    // ts is materialized behind an alias so the transform lambda below
    // captures an ATTRIBUTE — a non-attribute child would re-evaluate
    // the tokenizer once per line (the word_shingles lesson)
    val d = docs(s, dir).select(col("doc_id"), fns.wsTokens(injected).as("ts"))
    val nLines = ((size(col("ts")) + lit(k - 1)) / lit(k)).cast("int")
    val lines = d.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), nLines - 1),
        i => array_join(slice(col("ts"), i * k + 1, lit(k)), " ")))
        .as(Seq("pos", "line")))
    import org.apache.spark.sql.expressions.Window
    // count(DISTINCT doc_id) per line without a second aggregate+join:
    // dense_rank over (line ORDER BY doc_id), then its partition max —
    // both windows ride the same (line, doc_id) sort in one exchange
    val wOrd = Window.partitionBy(col("line")).orderBy(col("doc_id"))
    val wAll = Window.partitionBy(col("line"))
    val marked = lines
      .withColumn("rk", dense_rank().over(wOrd))
      .withColumn("nd", max(col("rk")).over(wAll))
    marked
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("nd") < 2, 1)).as("n_kept"),
        sha2(array_join(
          transform(
            array_sort(collect_list(
              when(col("nd") < 2, struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          " "), 256).as("kept_sha"))
  }

  val q51Sql: String =
    s"""WITH injected AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN '$Q51Boiler' ELSE '' END || text AS t
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, string_split_regex(trim(t), '\\s+') AS ts FROM injected),
       |lines AS (
       |  SELECT doc_id, i - 1 AS pos,
       |    array_to_string(ts[((i-1)*$Q51LineTokens+1):((i-1)*$Q51LineTokens+$Q51LineTokens)], ' ') AS line
       |  FROM toks,
       |    unnest(generate_series(1, CAST((len(ts) + ${Q51LineTokens - 1}) // $Q51LineTokens AS BIGINT))) AS u(i)),
       |dup AS (
       |  SELECT line FROM (
       |    SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY 1)
       |  WHERE nd >= 2),
       |marked AS (
       |  SELECT l.doc_id, l.pos, l.line, d.line IS NOT NULL AS isdup
       |  FROM lines l LEFT JOIN dup d ON l.line = d.line)
       |SELECT doc_id, count(*) AS n_lines,
       |  count(CASE WHEN NOT isdup THEN 1 END) AS n_kept,
       |  sha256(coalesce(
       |    string_agg(CASE WHEN NOT isdup THEN line END, ' ' ORDER BY pos),
       |    '')) AS kept_sha
       |FROM marked GROUP BY doc_id""".stripMargin

  /** q53: unicode normalization + control-character scrub — the
    * mojibake/NFC cleanup pass (C4/CCNet-style) that runs before any
    * hash-keyed dedup, because visually-identical strings with
    * different codepoint sequences ("café" composed vs decomposed)
    * otherwise land in different dedup buckets. NFC is a custom
    * codegen'd expression ([[graft.functions.fns.nfcNormalize]] →
    * java.text.Normalizer); the strip class stays in the Java∩RE2
    * regex subset so DuckDB computes the identical function
    * (`nfc_normalize` + the same class). Decomposed sequences,
    * zero-width and control characters are deterministically injected
    * (the corpus is pure ASCII — q39's pattern). Narrow codegen'd
    * scan-project: IO-bound at 100 TB. */
  private val Q53StripRe = "[\\x00-\\x1f\\x7f\\x{200b}-\\x{200d}\\x{feff}]"

  def q53UnicodeClean(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(
      col("text"),
      when(col("doc_id") % 2 === 0, lit(" cafe\u0301 nai\u0308ve")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit(" zero\u200Bwidth\u0007ctl")).otherwise(lit("")))
    docs(s, dir)
      .select(col("doc_id"), injected.as("t0"))
      .withColumn("cleaned",
        regexp_replace(fns.nfcNormalize(col("t0")), Q53StripRe, ""))
      .select(col("doc_id"),
        length(col("t0")).as("n_chars_raw"),
        length(col("cleaned")).as("n_chars_clean"),
        (col("cleaned") =!= col("t0")).as("changed"),
        sha2(col("cleaned"), 256).as("clean_sha"))
  }

  val q53Sql: String =
    s"""WITH injected AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 2 = 0
       |         THEN ' cafe' || chr(769) || ' nai' || chr(776) || 've' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0
       |         THEN ' zero' || chr(8203) || 'width' || chr(7) || 'ctl' ELSE '' END
       |    AS t0
       |  FROM documents)
       |SELECT doc_id,
       |  length(t0) AS n_chars_raw,
       |  length(regexp_replace(nfc_normalize(t0), '$Q53StripRe', '', 'g'))
       |    AS n_chars_clean,
       |  regexp_replace(nfc_normalize(t0), '$Q53StripRe', '', 'g') <> t0 AS changed,
       |  sha256(regexp_replace(nfc_normalize(t0), '$Q53StripRe', '', 'g'))
       |    AS clean_sha
       |FROM injected""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_lang_id" -> (q10LangId _),
    "q11_quality_score" -> (q11Quality _),
    "q12_token_count" -> (q12TokenCount _),
    "q13_fingerprint" -> (q13Fingerprint _),
    "q34_license_filter" -> (q34LicenseFilter _),
    "q39_redact" -> (q39Redact _),
    "q40_doc_freq" -> (q40DocFreq _),
    "q41_tfidf_topk" -> (q41TfidfTopK _),
    "q42_stratified_sample" -> (q42StratifiedSample _),
    "q43_length_quantiles" -> (q43LengthQuantiles _),
    "q44_decontaminate" -> (q44Decontaminate _),
    "q45_repetition" -> (q45Repetition _),
    "q46_hist_quantiles" -> (q46HistQuantiles _),
    "q48_seq_pack" -> (q48SeqPack _),
    "q49_kmv_distinct" -> (q49KmvDistinct _),
    "q50_weighted_sample" -> (q50WeightedSample _),
    "q51_line_dedup" -> (q51LineDedup _),
    "q53_unicode_clean" -> (q53UnicodeClean _)
  )

  val oracles: Map[String, String] = Map(
    "q10_lang_id" -> q10Sql,
    "q11_quality_score" -> q11Sql,
    "q12_token_count" -> q12Sql,
    "q13_fingerprint" -> q13Sql,
    "q34_license_filter" -> q34Sql,
    "q39_redact" -> q39Sql,
    "q40_doc_freq" -> q40Sql,
    "q41_tfidf_topk" -> q41Sql,
    "q42_stratified_sample" -> q42Sql,
    "q43_length_quantiles" -> q43Sql,
    "q44_decontaminate" -> q44Sql,
    "q45_repetition" -> q45Sql,
    "q46_hist_quantiles" -> q46Sql,
    "q48_seq_pack" -> q48Sql,
    "q49_kmv_distinct" -> q49Sql,
    "q50_weighted_sample" -> q50Sql,
    "q51_line_dedup" -> q51Sql,
    "q53_unicode_clean" -> q53Sql
  )
}
