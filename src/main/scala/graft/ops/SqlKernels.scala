package graft.ops

/** DuckDB SQL generators that reproduce graft's 64-bit hash kernels
  * (functions/Hashing.scala) exactly, so the driver's oracle can verify
  * hash-bearing queries bit-for-bit instead of recording `no_oracle`.
  *
  * DuckDB BIGINT arithmetic raises on overflow (no wrapping), so all
  * wrapping mod-2^64 math runs in HUGEINT "u-domain" — values kept in
  * [0, 2^64) — with multiplication split at 32 bits to stay inside
  * HUGEINT range. xor is only defined on BIGINT, so u-domain values are
  * round-tripped through their signed two's-complement image for bitwise
  * steps. Every generator emits a single composable SQL fragment (no
  * macros / multi-statement), so the oracle stays one SELECT.
  */
object SqlKernels {

  val Two64 = "18446744073709551616::HUGEINT"
  val Two63 = "9223372036854775808::HUGEINT"
  val Two32 = "4294967296::HUGEINT"

  // splitmix64 / FNV-1a constants as unsigned decimal literals
  val Gold = "11400714819323198485::HUGEINT" // 0x9e3779b97f4a7c15
  val C1 = "13787848793156543929::HUGEINT" // 0xbf58476d1ce4e5b9
  val C2 = "10723151780598845931::HUGEINT" // 0x94d049bb133111eb
  val FnvOffset = "14695981039346656037::HUGEINT" // 0xcbf29ce484222325
  val FnvPrime = "1099511628211::HUGEINT" // 0x100000001b3

  /** signed BIGINT expr → u-domain HUGEINT in [0, 2^64) */
  def u64(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN ($x)::HUGEINT + $Two64 ELSE ($x)::HUGEINT END)"

  /** u-domain HUGEINT → signed BIGINT (two's-complement reinterpret) */
  def i64(m: String): String =
    s"(CASE WHEN ($m) >= $Two63 THEN (($m) - $Two64)::BIGINT ELSE ($m)::BIGINT END)"

  /** (a * b) mod 2^64 for u-domain operands; 32-bit split keeps every
    * intermediate < 2^65 (HUGEINT max is 2^127-1). */
  def mulmod(a: String, b: String): String =
    s"(((($a) % $Two32) * (($b) % $Two32) + (((($a) // $Two32) * (($b) % $Two32) + (($a) % $Two32) * (($b) // $Two32)) % $Two32) * $Two32) % $Two64)"

  def addmod(a: String, b: String): String = s"((($a) + ($b)) % $Two64)"

  /** bitwise xor in u-domain (via the signed image) */
  def xoru(a: String, b: String): String = u64(s"xor(${i64(a)}, ${i64(b)})")

  /** unsigned right shift in u-domain = integer division */
  def shru(a: String, n: Int): String = {
    require(n >= 0 && n < 63)
    s"(($a) // ${1L << n}::HUGEINT)"
  }

  /** Wrap subquery `inner` (carrying u-domain column `inCol`) with the
    * splitmix64 finalizer (Hashing.mix64), adding u-domain `outCol`.
    * Chained SELECTs act as let-bindings so nothing is re-inlined. */
  def mix64Select(inner: String, inCol: String, outCol: String): String =
    s"""(SELECT * EXCLUDE (__m1, __m2, __m3), ${xoru("__m3", shru("__m3", 31))} AS $outCol FROM
       |  (SELECT *, ${mulmod(xoru("__m2", shru("__m2", 27)), C2)} AS __m3 FROM
       |    (SELECT *, ${mulmod(xoru("__m1", shru("__m1", 30)), C1)} AS __m2 FROM
       |      (SELECT *, ${addmod(inCol, Gold)} AS __m1 FROM $inner))))""".stripMargin

  /** FNV-1a-64 fold (Hashing.hashBytes, seed 0) over an INT code list
    * expr `codes` (ASCII text ⇒ codes = UTF-8 bytes), u-domain result —
    * mix64 must still be applied by the caller. */
  def fnv1aFold(codes: String): String =
    s"""list_reduce(list_prepend($FnvOffset, list_transform($codes, c -> c::HUGEINT)),
       |        (a, c) -> ${mulmod(xoru("a", "c"), FnvPrime)})""".stripMargin

  /** Rabin–Karp polynomial fold h = h*B + c mod 2^64 (Hashing.winnow's
    * rolling hash in direct form — identical in the mod-2^64 ring),
    * u-domain result, mix64 applied by the caller. */
  def polyFold(codes: String, base: Long): String =
    s"""list_reduce(list_prepend(0::HUGEINT, list_transform($codes, c -> c::HUGEINT)),
       |        (a, c) -> ${addmod(mulmod("a", s"$base::HUGEINT"), "c")})""".stripMargin

  /** Char codes of a string expr (1 row per char via list). Documents are
    * ASCII (verified), so codepoints == UTF-8 bytes == Java chars. */
  def charCodes(text: String): String =
    s"list_transform(string_split($text, ''), c -> unicode(c))"

  /** CTE chain reproducing Hashing.hyperplaneBucket for every row of a
    * CTE `src(vec_id, embedding)`: the Rademacher plane signs depend only
    * on (bit, dim) — mix64(seed ^ b<<32 ^ i) & 1 — so an nbits×dim
    * planes CTE + in-order double dot products rebuild every bucket.
    * Defines `<out>(vec_id, embedding, bucket)`; splice into a WITH list. */
  def hyperplaneCtes(src: String, out: String, nbits: Int, dim: Int, seed: Long): String =
    s"""pl0 AS (
       |  SELECT b, i, ${u64(s"xor(xor($seed::BIGINT, b << 32), i)")} AS h0
       |  FROM unnest(generate_series(0, ${nbits - 1})) AS t1(b),
       |       unnest(generate_series(0, ${dim - 1})) AS t2(i)),
       |planes AS (
       |  SELECT b, list(CASE WHEN hu % 2 = 1 THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END ORDER BY i) AS signs
       |  FROM ${mix64Select("pl0", "h0", "hu")} AS mx GROUP BY b),
       |dots AS (
       |  SELECT e.vec_id, p.b,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> p.signs[i] * e.embedding[i]::DOUBLE)) AS dot
       |  FROM $src e CROSS JOIN planes p),
       |bkt AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << b) ELSE 0 END) AS INT) AS bucket
       |  FROM dots GROUP BY vec_id),
       |$out AS (SELECT e.vec_id, e.embedding, b.bucket FROM $src e JOIN bkt b USING (vec_id))""".stripMargin

  /** Exact cosine over FLOAT list columns, double accumulation in index
    * order — mirrors Hashing.cosine INCLUDING its zero-norm guard (an
    * all-zero vector yields 0.0, not NaN/NULL: a bare division here
    * would silently diverge the oracle's DISTINCT/rank results from the
    * Scala kernel on exactly the degenerate input it defines). */
  def cosineSql(a: String, b: String): String = {
    def norm2(x: String) =
      s"list_sum(list_transform(range(1, len($x) + 1), i -> ($x)[i]::DOUBLE * ($x)[i]::DOUBLE))"
    s"""(CASE WHEN ${norm2(a)} = 0 OR ${norm2(b)} = 0 THEN 0.0
       |      ELSE list_sum(list_transform(range(1, len($a) + 1), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE))
       |      / (sqrt(${norm2(a)}) * sqrt(${norm2(b)})) END)""".stripMargin
  }
}
