package graft

import graft.functions.{fns, GraftFunctions, Hashing}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the custom Catalyst expressions and their kernels:
  * golden values (stability across builds), codegen/eval agreement via
  * Spark, and semantic properties (simhash locality, minhash≈jaccard,
  * winnowing edit tolerance). */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def arr(ss: String*): GenericArrayData =
    new GenericArrayData(ss.map(UTF8String.fromString).toArray[Any])

  test("hashBytes is stable (golden values)") {
    assert(Hashing.hashUtf8(UTF8String.fromString("abc"), 0L) ==
      Hashing.hashUtf8(UTF8String.fromString("abc"), 0L))
    assert(Hashing.hashUtf8(UTF8String.fromString("abc"), 0L) !=
      Hashing.hashUtf8(UTF8String.fromString("abd"), 0L))
    assert(Hashing.hashUtf8(UTF8String.fromString("abc"), 1L) !=
      Hashing.hashUtf8(UTF8String.fromString("abc"), 2L))
  }

  test("simhash: identical sets collide, near sets are near, far sets far") {
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.updated(3, "tokX").updated(17, "tokY")
    val far = (1 to 40).map(i => s"other$i")
    val h0 = Hashing.simhash(arr(base: _*))
    val h1 = Hashing.simhash(arr(near: _*))
    val h2 = Hashing.simhash(arr(far: _*))
    assert(h0 == Hashing.simhash(arr(base: _*)))
    assert(java.lang.Long.bitCount(h0 ^ h1) < java.lang.Long.bitCount(h0 ^ h2))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 16)
    assert(java.lang.Long.bitCount(h0 ^ h2) >= 16)
  }

  test("minhash estimates jaccard") {
    val a = (1 to 100).map(i => s"s$i")
    val b = (21 to 120).map(i => s"s$i") // jaccard = 80/120 ≈ 0.667
    val k = 256
    val sa = Hashing.minhash(arr(a: _*), k, 7L)
    val sb = Hashing.minhash(arr(b: _*), k, 7L)
    val agree = (0 until k).count(i => sa.getLong(i) == sb.getLong(i))
    val est = agree.toDouble / k
    assert(math.abs(est - 0.667) < 0.12, s"minhash estimate $est too far from 0.667")
  }

  test("winnowing tolerates local edits") {
    val text = "the quick brown fox jumps over the lazy dog and runs far away home"
    val edited = text.replace("jumps", "leaps")
    def set(s: String) = {
      val a = Hashing.winnow(UTF8String.fromString(s), 8, 4)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    val s1 = set(text); val s2 = set(edited)
    val overlap = s1.intersect(s2).size.toDouble / s1.union(s2).size
    assert(overlap > 0.5, s"winnow fingerprint overlap $overlap too low after 1-word edit")
    assert(set(text) == set(text))
  }

  test("cosine kernel: orthogonal/parallel/antiparallel") {
    def fa(v: Float*) = new GenericArrayData(v.toArray)
    assert(Hashing.cosine(fa(1f, 0f), fa(0f, 1f)) == 0.0)
    assert(math.abs(Hashing.cosine(fa(1f, 2f), fa(2f, 4f)) - 1.0) < 1e-12)
    assert(math.abs(Hashing.cosine(fa(1f, 0f), fa(-1f, 0f)) + 1.0) < 1e-12)
    assert(Hashing.cosine(fa(0f, 0f), fa(1f, 0f)) == 0.0) // zero-norm guard
  }

  test("expressions agree between codegen and interpreted eval") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "pack my box with five dozen liquor jugs for the long trip north now")
    ).toDF("id", "text")
    val cols = df.select(
      col("id"),
      fns.simhash64(fns.wsTokens(col("text"))).as("sh"),
      fns.minhashSig(fns.tokenSet(col("text")), 16, 3L).as("mh"),
      fns.winnowFingerprint(col("text"), 8, 4).as("fp"),
      fns.wordShingles(fns.wsTokens(col("text")), 3).as("ws3"),
      fns.cubeCell(col("id") * 37.5 - 20.0, col("id") * 91.25 - 100.0, 9).as("cell"),
      fns.mix64(col("id") * 1000003L).as("mx"))
    val on = withCodegen("CODEGEN_ONLY") { cols.collect().sortBy(_.getLong(0)) }
    val off = withCodegen("NO_CODEGEN") { cols.collect().sortBy(_.getLong(0)) }
    assert(on.map(_.toString).toSeq == off.map(_.toString).toSeq)
  }

  test("wordShingles expression matches the composed-builtins form") {
    // the old form this expression replaced (kept here as the semantic
    // oracle): transform over positions + concat_ws of element_at's —
    // correct but re-evaluates a non-attribute tokens child per element
    def oldForm(tokens: org.apache.spark.sql.Column, n: Int) =
      when(size(tokens) >= n,
        transform(sequence(lit(0), size(tokens) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(tokens, i + j + 1)): _*)))
        .otherwise(array())
    val df = Seq(
      Some("the quick brown fox jumps over the lazy dog"),
      Some("  leading and   irregular   whitespace\there "),
      Some("one two"), // shorter than n=3 → empty
      Some("solo"),
      Some(""),
      None // NULL text → both forms yield [] (the when() fell through)
    ).toDF("text")
    val got = df.select(
      fns.wordShingles(fns.wsTokens(col("text")), 3).as("neu"),
      oldForm(fns.wsTokens(col("text")), 3).as("alt"))
    got.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
    // SQL registration round-trip; the RAW function null-propagates
    // (standard expression contract), the Column helper coalesces to []
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("ws_docs")
    val viaSql = spark.sql(
      "SELECT word_shingles(split(trim(text), '\\\\s+'), 3) AS s FROM ws_docs")
      .collect().map(r => Option(r.getSeq[String](0))).toSeq
    val viaCol = df.select(fns.wordShingles(fns.wsTokens(col("text")), 3))
      .collect().map(r => Option(r.getSeq[String](0))).toSeq
    assert(viaSql.count(_.isEmpty) == 1, "raw SQL word_shingles should null-propagate")
    assert(viaCol.forall(_.isDefined), "Column helper should coalesce NULL to []")
    viaSql.zip(viaCol).foreach {
      case (Some(s), Some(c)) => assert(s == c)
      case (None, Some(c)) => assert(c.isEmpty)
      case other => fail(s"unexpected pairing: $other")
    }
  }

  test("nfc_normalize: composes decomposed sequences; ASCII is zero-copy identity") {
    val dec = "cafe\u0301 nai\u0308ve" // e+COMBINING ACUTE, i+COMBINING DIAERESIS
    val comp = "caf\u00e9 na\u00efve"
    assert(Hashing.nfc(UTF8String.fromString(dec)).toString == comp)
    assert(Hashing.nfc(UTF8String.fromString(comp)).toString == comp) // idempotent
    val ascii = UTF8String.fromString("plain ascii text 123")
    assert(Hashing.nfc(ascii) eq ascii, "ASCII fast path must return the input object")
    val df = Seq((1L, dec), (2L, "plain"), (3L, comp)).toDF("id", "s")
    val sel = df.select(col("id"), fns.nfcNormalize(col("s")).as("n"),
      length(fns.nfcNormalize(col("s"))).as("l"))
    val on = withCodegen("CODEGEN_ONLY") { sel.collect().sortBy(_.getLong(0)) }
    val off = withCodegen("NO_CODEGEN") { sel.collect().sortBy(_.getLong(0)) }
    assert(on.map(_.toString).toSeq == off.map(_.toString).toSeq)
    assert(on.head.getString(1) == comp && on.head.getInt(2) == comp.length)
    GraftFunctions.register(spark)
    // NB Spark's chr() is mod-256 (ASCII-only, unlike DuckDB's): build
    // the combining mark with a \u escape in the SQL literal instead
    assert(spark.sql("SELECT nfc_normalize('cafe\\u0301') AS n")
      .collect().head.getString(0) == "caf\u00e9")
  }

  private def withCodegen[T](mode: String)(f: => T): T = {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("hyperplane bucket: deterministic and locality-sensitive on average") {
    def fa(v: Array[Float]) = new GenericArrayData(v)
    val rnd = new scala.util.Random(5)
    var same = 0; var diff = 0; val trials = 200
    for (_ <- 1 to trials) {
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val nearV = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      val farV = Array.fill(16)(rnd.nextGaussian().toFloat)
      val b = Hashing.hyperplaneBucket(fa(v), 8, 11L)
      assert(b == Hashing.hyperplaneBucket(fa(v), 8, 11L))
      if (b == Hashing.hyperplaneBucket(fa(nearV), 8, 11L)) same += 1
      if (b == Hashing.hyperplaneBucket(fa(farV), 8, 11L)) diff += 1
    }
    assert(same > diff, s"near-collisions $same should exceed far-collisions $diff")
  }
}
