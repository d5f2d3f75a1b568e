package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.IntegerType

/** SQL-name registration of graft's Catalyst expressions, so they are
  * callable from `spark.sql("...")` text as well as the Column API:
  *
  *   - `new GraftExtensions` via `spark.sql.extensions=graft.GraftExtensions`
  *     (the spark-submit / cluster path, SURVEY §7.3), or
  *   - `GraftFunctions.register(spark)` on an already-built session
  *     (e.g. the driver-owned session handed to SparkEntry.queries).
  *
  * Parameterized expressions take their static knobs as literal arguments
  * (`minhash_bands(arr, 64, 2, 7)`), folded at registration time.
  */
object GraftFunctions {

  private def arity(args: Seq[Expression], n: Int, fn: String, sig: String): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments $sig, got ${args.length}")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Number, _) => v.intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Number, _) => v.longValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> { args => arity(args, 1, "simhash64", "(array<string>)"); SimHash64(args.head) },
    "mix64" -> { args => arity(args, 1, "mix64", "(bigint)"); Mix64(args.head) },
    "minhash_sig" -> { args => arity(args, 3, "minhash_sig", "(arr, k, seed)")
      MinHashSig(args(0), intLit(args(1), "k"), longLit(args(2), "seed")) },
    "minhash_bands" -> { args => arity(args, 4, "minhash_bands", "(arr, k, rowsPerBand, seed)")
      MinHashBands(args(0), intLit(args(1), "k"), intLit(args(2), "rowsPerBand"),
        longLit(args(3), "seed")) },
    "minhash_bands_l" -> { args => arity(args, 4, "minhash_bands_l", "(arr, k, rowsPerBand, seed)")
      MinHashBandsL(args(0), intLit(args(1), "k"), intLit(args(2), "rowsPerBand"),
        longLit(args(3), "seed")) },
    "hashed_word_shingles" -> { args => arity(args, 2, "hashed_word_shingles", "(text, n)")
      HashedWordShingles(args(0), intLit(args(1), "n")) },
    "word_shingles" -> { args => arity(args, 2, "word_shingles", "(tokens, n)")
      WordShingleStrings(args(0), intLit(args(1), "n")) },
    "nfc_normalize" -> { args => arity(args, 1, "nfc_normalize", "(text)")
      NfcNormalize(args.head) },
    "str_hash64" -> { args =>
      if (args.isEmpty || args.length > 2) throw new IllegalArgumentException(
        "str_hash64 expects (text[, seed])")
      StrHash64(args(0), if (args.length > 1) longLit(args(1), "seed") else 0L) },
    "winnow_fingerprint" -> { args => arity(args, 3, "winnow_fingerprint", "(text, n, w)")
      WinnowFingerprint(args(0), intLit(args(1), "n"), intLit(args(2), "w")) },
    "cosine_sim" -> { args => arity(args, 2, "cosine_sim", "(a, b)"); CosineSim(args(0), args(1)) },
    "sorted_jaccard" -> { args => arity(args, 2, "sorted_jaccard", "(a, b)"); SortedJaccard(args(0), args(1)) },
    "hyperplane_bucket" -> { args => arity(args, 3, "hyperplane_bucket", "(vec, nbits, seed)")
      HyperplaneBucket(args(0), intLit(args(1), "nbits"), longLit(args(2), "seed")) },
    "cube_cell" -> { args => arity(args, 3, "cube_cell", "(lat, lng, level)")
      // cast lat/lng to double at registration so SQL decimal/int
      // literals work: cube_cell(47.5, 8.5, 9)
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types.DoubleType
      CubeCell(Cast(args(0), DoubleType), Cast(args(1), DoubleType),
        intLit(args(2), "level")) }
  )

  /** Register all graft functions on a live session. Idempotent. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
