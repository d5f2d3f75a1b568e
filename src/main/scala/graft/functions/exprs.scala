package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators Spark's built-ins can't
  * express efficiently (SURVEY.md §7.3): each implements both `eval` and
  * `doGenCode` (a static call into [[Hashing]]) so they stay inside
  * whole-stage codegen instead of falling back to interpreted UDF rows.
  *
  * Everything here is deterministic and foldable-safe: same input → same
  * output on every worker, which is what makes LSH/minhash bucket joins
  * correct in a distributed run.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(arr: Any): Any =
    Hashing.simhash(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, k: Int, seed: Long) extends UnaryExpression {
  require(k > 0 && k <= 512, s"minhash k out of range: $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash requires array<string>, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(arr: Any): Any =
    Hashing.minhash(arr.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.minhash($c, $k, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

case class MinHashBands(child: Expression, k: Int, rowsPerBand: Int, seed: Long)
    extends UnaryExpression {
  require(k > 0 && k <= 512 && rowsPerBand > 0 && k % rowsPerBand == 0,
    s"bad minhash banding: k=$k rowsPerBand=$rowsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires array<string>, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(arr: Any): Any =
    Hashing.minhashBands(arr.asInstanceOf[ArrayData], k, rowsPerBand, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.minhashBands($c, $k, $rowsPerBand, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

case class WinnowFingerprint(child: Expression, n: Int, w: Int) extends UnaryExpression {
  require(n > 0 && w > 0, s"winnow params out of range: n=$n w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint requires string, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(s: Any): Any =
    Hashing.winnow(s.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.winnow($c, $n, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

case class HashedWordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0 && n <= 16, s"shingle n out of range: $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hashed_word_shingles requires string, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(s: Any): Any =
    Hashing.wordShingleHashes(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.wordShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): HashedWordShingles =
    copy(child = newChild)
}

case class StrHash64(child: Expression, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"str_hash64 requires string, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(s: Any): Any =
    Hashing.hashUtf8(s.asInstanceOf[UTF8String], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.hashUtf8($c, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): StrHash64 =
    copy(child = newChild)
}

case class WordShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0 && n <= 16, s"shingle n out of range: $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires array<string>, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(arr: Any): Any =
    Hashing.wordShingleStrings(arr.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.wordShingleStrings($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleStrings =
    copy(child = newChild)
}

/** Unicode NFC normalization (Hashing.nfc): canonical composition with a
  * zero-copy ASCII fast path. DuckDB mirror: `nfc_normalize`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires string, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(s: Any): Any =
    Hashing.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class MinHashBandsL(child: Expression, k: Int, rowsPerBand: Int, seed: Long)
    extends UnaryExpression {
  require(k > 0 && k <= 512 && rowsPerBand > 0 && k % rowsPerBand == 0,
    s"bad minhash banding: k=$k rowsPerBand=$rowsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_bands_l requires array<bigint>, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(arr: Any): Any =
    Hashing.minhashBandsL(arr.asInstanceOf[ArrayData], k, rowsPerBand, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.minhashBandsL($c, $k, $rowsPerBand, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBandsL =
    copy(child = newChild)
}

case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard requires (array<bigint>, array<bigint>), got (${l.simpleString}, ${r.simpleString})")
    }
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    Hashing.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hashing.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (array<float>, array<float>), got (${l.simpleString}, ${r.simpleString})")
    }
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    Hashing.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hashing.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

case class HyperplaneBucket(child: Expression, nbits: Int, seed: Long) extends UnaryExpression {
  require(nbits > 0 && nbits <= 30, s"nbits out of range: $nbits")
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(FloatType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket requires array<float>, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(v: Any): Any =
    Hashing.hyperplaneBucket(v.asInstanceOf[ArrayData], nbits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.hyperplaneBucket($c, $nbits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** Cube-face hierarchical cell id of a lat/lng point (graft.ops.GeoCells
  * — the reference's S2 cell id, C1). A dedicated expression rather than
  * composed Column math because the face-chart whens would otherwise be
  * re-inlined once per Morton bit (CollapseProject), exploding generated
  * code past JVM limits; here codegen is one static call. */
case class CubeCell(left: Expression, right: Expression, level: Int) extends BinaryExpression {
  require(level > 0 && level <= 30, s"cell level out of range: $level")
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cube_cell requires (double, double), got (${l.simpleString}, ${r.simpleString})")
    }
  }
  override def nullSafeEval(lat: Any, lng: Any): Any =
    graft.ops.GeoCells.cellOf(lat.asInstanceOf[Double], lng.asInstanceOf[Double], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.GeoCells.cellOf($a, $b, $level)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CubeCell =
    copy(left = newLeft, right = newRight)
}

/** splitmix64 finalizer over a bigint — the deterministic hash-sampling
  * primitive (q42 stratified sampling): the same id maps to the same
  * sample bucket on every worker, every run, and in the DuckDB oracle
  * (SqlKernels.mix64Select reproduces it bit-for-bit), so a sample is a
  * reproducible PROPERTY of the data rather than a run artifact. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mix64 requires bigint, got ${t.simpleString}")
    }
  }
  override def nullSafeEval(v: Any): Any = Hashing.mix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.mix64($c)")
  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

/** Public Column API over the custom expressions + composed helpers. */
object fns {
  import org.apache.spark.sql.functions._

  def simhash64(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))

  def mix64(c: Column): Column =
    Bridge.column(Mix64(Bridge.expression(c)))

  def minhashSig(c: Column, k: Int, seed: Long = 0L): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), k, seed))

  def minhashBands(c: Column, k: Int, rowsPerBand: Int, seed: Long = 0L): Column =
    Bridge.column(MinHashBands(Bridge.expression(c), k, rowsPerBand, seed))

  /** One-pass sorted distinct word-n-gram shingle hashes of a text. */
  def hashedWordShingles(c: Column, n: Int): Column =
    Bridge.column(HashedWordShingles(Bridge.expression(c), n))

  /** FNV-1a + splitmix64 of a string (Hashing.hashUtf8) — the engine's
    * stable 64-bit string hash, DuckDB-mirrorable via
    * SqlKernels.fnv1aFold + mix64Select. */
  def strHash64(c: Column, seed: Long = 0L): Column =
    Bridge.column(StrHash64(Bridge.expression(c), seed))

  /** Unicode NFC normalization (DuckDB-mirrorable via nfc_normalize). */
  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))

  def minhashBandsFromHashes(c: Column, k: Int, rowsPerBand: Int, seed: Long = 0L): Column =
    Bridge.column(MinHashBandsL(Bridge.expression(c), k, rowsPerBand, seed))

  def winnowFingerprint(c: Column, n: Int = 8, w: Int = 4): Column =
    Bridge.column(WinnowFingerprint(Bridge.expression(c), n, w))

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  def hyperplaneBucket(c: Column, nbits: Int, seed: Long = 0L): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(c), nbits, seed))

  /** Cube-face hierarchical cell id (S2-style; parent = id >> 2). */
  def cubeCell(lat: Column, lng: Column, level: Int): Column =
    Bridge.column(CubeCell(Bridge.expression(lat), Bridge.expression(lng), level))

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  // ---------------------------------------------------------------
  // Text helpers (built-ins only → codegen'd, and DuckDB-mirrorable)
  // ---------------------------------------------------------------

  /** Whitespace tokens of trimmed text. The split class is the explicit
    * Java∩RE2 intersection [ \t\n\f\r]: Java's \s additionally matches
    * \x0B (vertical tab) while DuckDB's RE2 \s does not, so a bare \s+
    * here would diverge from every string_split_regex oracle on a \x0B
    * byte. One authority for all tokenizing queries (q10-q16, q44-q49). */
  def wsTokens(c: Column): Column = split(trim(c), "[ \t\n\f\r]+")

  /** Distinct token set (for Jaccard). */
  def tokenSet(c: Column): Column = array_distinct(wsTokens(c))

  /** Count of tokens contained in `words`. */
  def countTokensIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(lit): _*)))

  /** Word n-gram shingles, space-joined; empty array when too short.
    * A custom expression (not composed built-ins): a higher-order
    * function re-evaluates a captured non-attribute `tokens` child per
    * lambda element, so `wordShingles(wsTokens(text), n)` as
    * transform+element_at costs O(n·T) regex splits per row — the
    * expression evaluates `tokens` once (see
    * [[Hashing.wordShingleStrings]]). The coalesce preserves the old
    * composed form's NULL contract (NULL tokens → empty array, because
    * `when(size(null) >= n)` fell through to `otherwise(array())`);
    * the raw SQL function `word_shingles` null-propagates like every
    * other registered expression. */
  def wordShingles(tokens: Column, n: Int): Column =
    coalesce(
      Bridge.column(WordShingleStrings(Bridge.expression(tokens), n)),
      typedlit(Array.empty[String]))

  /** Set Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Jaccard of two sorted distinct long arrays (one merge pass). */
  def sortedJaccard(a: Column, b: Column): Column =
    Bridge.column(SortedJaccard(Bridge.expression(a), Bridge.expression(b)))

  /** Sorted distinct 64-bit hashes of an array of strings — the cheap
    * set representation for similarity joins. */
  def hashedSet(c: Column): Column =
    array_sort(array_distinct(transform(c, x => xxhash64(x))))
}
