package graft

import graft.ops.{AnnOps, DedupOps, MediaOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the training-data operators that the (exact)
  * DuckDB oracles cannot express: LSH completeness vs the exhaustive
  * computation, ANN recall, simhash banding losslessness for the Hamming
  * threshold, media decode plumbing. */
class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("minhash LSH finds exactly the exhaustive near-dup pairs (recall 1.0 here)") {
    // q15 (LSH candidates → exact verify) must equal the exhaustive
    // all-pairs jaccard at the same threshold on this corpus — this is
    // what licenses q15's exhaustive SQL oracle.
    val lsh = DedupOps.q15MinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), array_distinct(graft.functions.fns.wordShingles(
        graft.functions.fns.wsTokens(col("text")), 3)).as("sh"))
    val a = d.as("a"); val b = d.as("b")
    val exact = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        round(graft.functions.fns.jaccard(col("a.sh"), col("b.sh")), 6).as("j"))
      .where(col("j") >= DedupOps.JaccardThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty && lsh == exact,
      s"LSH=${lsh.size} exact=${exact.size} diff=${(lsh diff exact).size}/${(exact diff lsh).size}")
  }

  test("simhash banding is lossless for hamming <= 3 (pigeonhole over 4 chunks)") {
    val sh = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.functions.fns.simhash64(graft.functions.fns.wsTokens(col("text"))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force nearest hamming neighbor per doc
    val brute = sh.map { case (id, h) =>
      val best = sh.iterator.filter(_._1 != id)
        .map { case (_, h2) => java.lang.Long.bitCount(h ^ h2) }.min
      id -> best
    }.toMap
    val banded = DedupOps.q16Simhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    // wherever the true nearest is <= 3, banding must have found it
    brute.foreach { case (id, d) =>
      if (d <= 3) assert(banded(id) == d, s"doc $id: banded=${banded(id)} brute=$d")
      // and the banded distance can never beat the true nearest
      if (banded(id) >= 0) assert(banded(id) >= d)
    }
  }

  test("ANN LSH achieves reasonable recall@10 vs brute force") {
    val exact = AnnOps.q18AnnBruteForce(spark, sf)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = AnnOps.q19AnnLsh(spark, sf)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      want.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    // multiprobe over 7 of 64 buckets scans ~11% of the corpus; on these
    // near-uniform embeddings recall is modest by design — the point is
    // the candidate-pruning plumbing, not this corpus's geometry.
    assert(mean > 0.15, s"mean recall@10 = $mean")
    assert(recalls.nonEmpty && approx.nonEmpty)
  }

  test("media decode stub: deterministic features, plumbing intact") {
    val f1 = MediaOps.q28MediaFeatures(spark, sf).orderBy("doc_id").collect()
    val f2 = MediaOps.q28MediaFeatures(spark, sf).orderBy("doc_id").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    assert(f1.length == 500)
    val r = f1.head
    assert(r.getAs[Int]("n_bytes") > 0)
    assert(r.getAs[Double]("byte_entropy") > 0.0)
    assert(r.getAs[Int]("n_frames") >= 1)
    // mean_byte of ASCII text must be in the printable range
    val mb = r.getAs[Double]("mean_byte")
    assert(mb > 32 && mb < 127, s"mean_byte $mb outside ASCII printable range")
  }

  test("dedup exact + jaccard agree on identical-text pairs") {
    // construct a frame with a true duplicate and assert jaccard = 1.0
    import spark.implicits._
    val df = Seq(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "en", "alpha beta gamma delta"),
      (3L, "en", "totally different words here")
    ).toDF("doc_id", "lang", "text")
    val d = df.select(col("doc_id"), col("lang"), graft.functions.fns.tokenSet(col("text")).as("toks"))
    val pairs = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        graft.functions.fns.jaccard(col("a.toks"), col("b.toks")).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) == 0.0)
  }
}
