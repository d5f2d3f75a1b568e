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
  val sf01 = "/root/testdata/sf0.01"

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

  test("simhash permuted tables are lossless for hamming <= 3 (3-of-6 block pigeonhole)") {
    val sh = DedupOps.simhashCorpus(spark, sf)
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
    // exact scheme-independent contract: nearest within <=3, else -1
    brute.foreach { case (id, d) =>
      val want = if (d <= DedupOps.SimhashHamMax) d else -1
      assert(banded(id) == want, s"doc $id: banded=${banded(id)} brute=$d")
    }
    // the planted near-identical copies make the gate non-vacuous
    assert(banded.count(_._2 >= 0) >= 10,
      s"expected planted duplicates to land within hamming 3: ${banded.count(_._2 >= 0)}")
  }

  test("simhash candidate volume stays bounded on a chunk-collision-skewed corpus") {
    import spark.implicits._
    // adversarial corpus for round 2's 4×16-bit chunk scheme: every
    // simhash shares chunk 0 (bits 0..15) but is random elsewhere —
    // chunk-equality would generate all n² pairs. The 3-of-6-block
    // tables need ~33 agreeing bits, so candidates stay ~0.
    val rnd = new scala.util.Random(42)
    val n = 400
    val rows = (0 until n).map { i =>
      (i.toLong, (rnd.nextLong() << 16) | 0x1234L)
    }
    val sh = rows.toDF("doc_id", "sh")
    val nearest = DedupOps.simhashNearest(sh).collect()
    // with random high bits, no pair sits within hamming 3: the permuted
    // tables must produce (near-)zero surviving candidates instead of n²
    assert(nearest.length <= n / 10,
      s"expected ~0 candidates on the skewed corpus, got ${nearest.length}")
    // and the candidate JOIN itself is bounded: worst bucket population
    // caps candidate pairs at ~20·n·max — linear, not n²
    val maxBucket = sh.select(col("doc_id"),
        posexplode(array(DedupOps.simhashKeys(col("sh")): _*)))
      .groupBy(col("pos"), col("col")).count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxBucket <= 4, s"worst (table,key) bucket holds $maxBucket docs")
  }

  test("q18 batch count derives from the query count; batching never changes results") {
    val base = AnnOps.q18AnnBruteForce(spark, sf).collect().map(_.toString).sorted.toSeq
    // force NB = ceil(nQueries / 3) > 1: identical output, still bounded
    // per-batch broadcasts
    val batched = AnnOps.q18Batched(spark, sf, maxBroadcastRows = 3)
    val plan = batched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "query batches must broadcast")
    assert(batched.collect().map(_.toString).sorted.toSeq == base)
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

  test("q54 recall rows equal the brute-force recall computation, above the corpus floor") {
    // q54 makes index quality ORACLE-VISIBLE (the hash-exact q19/q38
    // oracles verify candidates found, never candidates missed); this
    // spec pins its arithmetic to an independent driver-side recompute
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = sets(AnnOps.q18AnnBruteForce(spark, sf))
    val want = Map(
      "lsh" -> sets(AnnOps.q19AnnLsh(spark, sf)),
      "ivf" -> sets(AnnOps.q38AnnIvf(spark, sf)))
    val nExact = exact.valuesIterator.map(_.size).sum
    val rows = AnnOps.q54AnnRecall(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet == Set("lsh", "ivf"))
    want.foreach { case (m, approx) =>
      val hits = exact.map { case (q, s) => s.intersect(approx.getOrElse(q, Set.empty)).size }.sum
      val (gotExact, gotHit, gotRecall) = rows(m)
      assert(gotExact == nExact && gotHit == hits, s"$m: ($gotExact,$gotHit) vs ($nExact,$hits)")
      assert(math.abs(gotRecall - math.rint(hits.toDouble / nExact * 1e4) / 1e4) < 1e-9)
      // recall floor: near-uniform synthetic embeddings make high recall
      // impossible by geometry (multiprobe touches ~11% of the corpus);
      // the floor catches a COLLAPSE (empty probe set, dead bucketing),
      // the oracle hash catches any 1-neighbor drift
      assert(gotRecall > 0.15, s"$m recall collapsed: $gotRecall")
    }
  }

  test("q37 cluster assignment equals a union-find over the same pair graph") {
    val got = ops.DedupOps.q37DedupClusters(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getBoolean(2)))
    val pairs = ops.DedupOps.q15MinhashLsh(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent sequential union-find (path compression, min-root union)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(x => x -> find(x)).toMap
    assert(got.nonEmpty && got.length == want.size)
    got.foreach { case (doc, cluster, canonical) =>
      assert(want(doc) == cluster, s"doc $doc: got cluster $cluster want ${want(doc)}")
      assert(canonical == (doc == cluster))
    }
  }

  test("connected components collapse chains, cycles, and keep components apart") {
    import spark.implicits._
    // an 8-node chain (forces multiple pointer-jump rounds), a 3-cycle,
    // and an isolated pair — shapes the corpus pair graph never produces
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val lab = ops.DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 8L).foreach(i => assert(lab(i) == 1L, s"node $i -> ${lab(i)}"))
    Seq(10L, 11L, 12L).foreach(i => assert(lab(i) == 10L, s"node $i -> ${lab(i)}"))
    Seq(20L, 21L).foreach(i => assert(lab(i) == 20L, s"node $i -> ${lab(i)}"))
    assert(lab.size == 13)
  }

  test("IVF ANN: well-formed top-k and recall@10 vs brute force") {
    val exact = AnnOps.q18AnnBruteForce(spark, sf)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivfRows = AnnOps.q38AnnIvf(spark, sf)
      .select("query_id", "rank", "vec_id").collect()
    val ivf = ivfRows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    // every query answers with TopK distinct neighbors, ranks 1..TopK
    ivfRows.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length == AnnOps.TopK, s"query $q returned ${rows.length}")
      assert(rows.map(_.getInt(1)).toSet == (1 to AnnOps.TopK).toSet)
    }
    assert(ivf.keySet == exact.keySet)
    val recalls = exact.map { case (q, want) =>
      want.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    // NProbe of ~K cells scans a bounded corpus fraction; near-uniform
    // embeddings make this a plumbing floor, not a geometry claim
    assert(mean > 0.15, s"mean recall@10 = $mean")
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

  /** Run `f` with auto-broadcast disabled so "no broadcast" plan asserts
    * test OUR gating, not Spark's size-estimate auto-broadcast. */
  private def withoutAutoBroadcast[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  test("q19 probe broadcast is bounded: forced-large query set shuffle-joins, same rows") {
    val base = AnnOps.q19AnnLsh(spark, sf).collect().map(_.toString).sorted.toSeq
    withoutAutoBroadcast {
      // budget 0 ⇒ the probe side must NOT be broadcast
      val big = AnnOps.q19Bounded(spark, sf, maxBroadcastRows = 0)
      assert(!big.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        "probe side must fall back to a shuffle join past the broadcast budget")
      assert(big.collect().map(_.toString).sorted.toSeq == base)
    }
  }

  test("q38 probe broadcast is bounded: forced-large probe set shuffle-joins, same rows") {
    val base = AnnOps.q38AnnIvf(spark, sf).collect().map(_.toString).sorted.toSeq
    withoutAutoBroadcast {
      val big = AnnOps.q38Bounded(spark, sf, maxBroadcastRows = 0)
      // centroid broadcasts stay (the codebook is the index, small by
      // construction); the PROBE join must not broadcast
      val plan = big.queryExecution.executedPlan.toString
      val probeJoinBroadcasts = plan.linesIterator.count(l =>
        l.contains("BroadcastHashJoin") && l.contains("cell"))
      assert(probeJoinBroadcasts == 0,
        s"probe-cell join must shuffle past the budget:\n$plan")
      assert(big.collect().map(_.toString).sorted.toSeq == base)
    }
  }

  test("q46 histogram quantiles land within one bucket width of the exact answers") {
    val w = ops.TextOps.Q46BucketWidth
    val exact = ops.TextOps.q43LengthQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val sketch = ops.TextOps.q46HistQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(sketch.keySet == exact.keySet)
    sketch.foreach { case (lang, (p50lo, p90lo)) =>
      val (e50, e90) = exact(lang)
      // p_lo is the lower edge of the bucket holding the exact quantile
      assert(p50lo <= e50 && e50 < p50lo + w, s"$lang p50: [$p50lo,${p50lo + w}) vs $e50")
      assert(p90lo <= e90 && e90 < p90lo + w, s"$lang p90: [$p90lo,${p90lo + w}) vs $e90")
    }
    // Spark's own GK sketch agrees within the same tolerance — the
    // native alternative when strata are huge and widths must adapt
    val gk = spark.read.parquet(s"$sf/documents.parquet").groupBy(col("lang"))
      .agg(percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    gk.foreach { case (lang, p50) =>
      assert(math.abs(p50 - exact(lang)._1) <= w, s"$lang GK p50 $p50 vs ${exact(lang)._1}")
    }
  }

  test("q44 eval-gram broadcast is bounded: forced-large eval set shuffle-joins, same rows") {
    val base = ops.TextOps.q44Decontaminate(spark, sf).collect().map(_.toString).sorted.toSeq
    withoutAutoBroadcast {
      val big = ops.TextOps.q44Bounded(spark, sf, maxBroadcastGrams = 0L)
      assert(!big.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        "eval grams must fall back to a shuffle join past the broadcast budget")
      assert(big.collect().map(_.toString).sorted.toSeq == base)
    }
  }

  test("q47 dup-span fractions equal a brute-force recomputation; flags the planted dups") {
    val k = DedupOps.DupSpanK
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    val spans = texts.view.mapValues(ts => ts.sliding(k).filter(_.size == k)
      .map(_.mkString(" ")).toSeq).toMap.filter(_._2.nonEmpty)
    val gramDocs = spans.toSeq.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val want = spans.map { case (id, gs) =>
      val dup = gs.count(g => gramDocs(g) >= 2)
      id -> ((gs.size.toLong, dup.toLong, dup * 1.0 / gs.size))
    }
    val got = ops.DedupOps.q47DupSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want)
    // non-vacuous: the planted near-dup family exceeds the 0.5 flag
    val flagged = got.filter { case (_, (_, _, f)) => f >= 0.5 }.keySet
    assert(flagged.nonEmpty, "expected the planted near-dups to flag")
    // every flagged doc really shares most spans with ANOTHER doc; every
    // doc in a q15-verified near-dup pair is flagged (partial-copy signal
    // subsumes whole-doc near-dup on this corpus)
    val pairDocs = ops.DedupOps.q15MinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pairDocs.subsetOf(flagged),
      s"near-dup pair members missing from flagged: ${pairDocs diff flagged}")
  }

  test("q48 packing equals a sequential fold; output invariant to range width") {
    val b = ops.TextOps.Q48ChunkTokens
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").length.toLong)
      .sortBy(_._1)
    var cum = 0L
    val want = toks.map { case (id, n) =>
      val start = cum; cum += n
      (id, n, start / b, (start + n - 1) / b, (start + n - 1) / b - start / b + 1)
    }.toSet
    val got = ops.TextOps.q48SeqPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want)
    // chunk ids are contiguous from 0 (no gaps: every token lands somewhere)
    val chunks = got.flatMap(t => t._3 to t._4)
    assert(chunks == (0L to chunks.max).toSet)
    // the multi-range two-pass path (forced small width ⇒ many range
    // partitions with nonzero offsets) produces the identical packing
    val multi = ops.TextOps.q48Packed(spark, sf, rangeWidth = 64L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(multi == want)
  }

  test("q49 KMV: two-level top-K equals brute-force kth-min; estimate within tolerance") {
    import graft.functions.fns
    val K = ops.TextOps.Q49K
    // brute-force distinct 48-bit gram hashes per lang (same kernel)
    val hs = spark.read.parquet(s"/root/testdata/sf0.01/documents.parquet")
      .withColumn("ts", fns.wsTokens(col("text")))
      .select(col("lang"),
        explode(fns.wordShingles(col("ts"), 3)).as("gram"))
      .select(col("lang"), shiftrightunsigned(fns.strHash64(col("gram")), 16).as("h48"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted }
    val got = ops.TextOps.q49KmvDistinct(spark, sf01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == hs.size)
    got.foreach { case (lang, n, est, relErr) =>
      val sorted = hs(lang)
      assert(n == sorted.length, s"$lang exact count")
      if (sorted.length >= K) {
        val hk = sorted(K - 1) // brute-force kth smallest distinct hash
        val want = (K - 1).toDouble * 281474976710656.0 / hk.toDouble
        assert(math.abs(est - want) < 0.001, s"$lang: est=$est want=$want")
        // KMV stderr ~ 1/sqrt(K-2) ≈ 6.3%; 4σ tolerance
        assert(math.abs(relErr) < 0.25, s"$lang: relErr=$relErr")
      } else assert(est == n.toDouble && relErr == 0.0)
    }
    // at sf0.001 strata are below K: the sketch must report exactly
    ops.TextOps.q49KmvDistinct(spark, sf).collect().foreach { r =>
      if (r.getLong(1) < K) {
        assert(r.getDouble(2) == r.getLong(1).toDouble)
        assert(r.getDouble(3) == 0.0)
      }
    }
  }

  test("q50 PPS sample: deterministic membership, exact p, HT estimate unbiased-ish") {
    val d = spark.read.parquet(s"/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s1 = ops.TextOps.q50WeightedSample(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val s2 = ops.TextOps.q50WeightedSample(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(s1.toSet == s2.toSet, "sample must be a pure function of the data")
    assert(s1.nonEmpty && s1.length < d.size, "nontrivial proper sample")
    // membership matches the closed-form rule; p and ht are exact
    val members = s1.map(_._1).toSet
    d.foreach { case (id, nc) =>
      val u48 = graft.functions.Hashing.mix64(id) >>> 16
      // same clamp as the query: min(n_chars, 2048) * 2^37 <= 2^48, so the
      // signed compare is overflow-safe and p = 1 docs are always included
      val in = u48 < math.min(nc, 2048L) * 137438953472L
      assert(members.contains(id) == in, s"doc $id membership")
    }
    s1.foreach { case (id, nc, p, ht) =>
      assert(p == math.min(1.0, nc / 2048.0))
      assert(math.abs(ht - 1.0 / p) < 1e-6)
    }
    // Horvitz-Thompson: sum over sample of n_chars/p estimates the
    // corpus total; with p ∝ n_chars the per-doc HT term is constant
    // (2048), so the estimate is 2048·|sample| — check within 4σ of
    // the true total (binomial variance over ~500 docs)
    val total = d.values.sum.toDouble
    val ht = s1.map { case (_, nc, p, _) => nc / p }.sum
    assert(math.abs(ht - total) / total < 0.30, s"HT=$ht total=$total")
  }

  /** Driver-side mirror of q51: same chunking, same ≥2-distinct-docs
    * drop rule, same ordered reassembly — mirroring SPARK's edge
    * semantics, not Java's: Spark trim strips only the space char (Java
    * trim eats all <= U+0020) and functions.split keeps trailing empty
    * tokens (Java's 1-arg split drops them — hence the -1 limit). */
  private def q51Mirror(raw: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val k = ops.TextOps.Q51LineTokens
    val boiler = "begin common header boilerplate license notice terms apply "
    def lines(id: Long, text: String): Seq[String] = {
      val t = (if (id % 3 == 0) boiler else "") + text
      val stripped = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = stripped.split("[ \t\n\f\r]+", -1).toSeq
      toks.grouped(k).map(_.mkString(" ")).toSeq
    }
    val perDoc = raw.map { case (id, tx) => id -> lines(id, tx) }.toMap
    val docsPerLine = perDoc.toSeq
      .flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    perDoc.map { case (id, ls) =>
      val kept = ls.filter(l => docsPerLine(l) < 2)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      id -> ((ls.size.toLong, kept.size.toLong, sha))
    }
  }

  test("q51 line dedup equals a driver-side recomputation (order-preserving)") {
    val raw = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val want = q51Mirror(raw)
    val perDoc = raw.toMap
    val got = ops.TextOps.q51LineDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"doc $id: got ${got(id)} want $w")
    }
    // the operator must actually drop something on this corpus (the
    // injected boilerplate guarantees it)
    assert(want.values.exists { case (n, keep, _) => keep < n })
    // and reassembly preserves ORDER: an untouched (nothing-dropped,
    // non-injected) doc must hash to its ORIGINAL text re-joined with
    // single spaces — proving pos-sorted reassembly, independent of the
    // mirror's own chunk-then-join path
    val untouched = want.collectFirst {
      case (id, (n, keep, sha)) if n == keep && id % 3 != 0 => (id, sha) }
    assert(untouched.nonEmpty, "corpus should have an untouched non-injected doc")
    untouched.foreach { case (id, sha) =>
      val t = perDoc(id)
      val stripped = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val rejoined = stripped.split("[ \t\n\f\r]+", -1).mkString(" ")
      val direct = java.security.MessageDigest.getInstance("SHA-256")
        .digest(rejoined.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(sha == direct)
    }
  }

  test("q51 tokenization contract holds on adversarial whitespace docs") {
    // the sf corpora are single-space; this corpus exercises the edges
    // where Spark/DuckDB/JVM string semantics differ — leading/trailing
    // whitespace of every class, runs, CR/FF, empty-ish docs — against
    // the Spark-faithful mirror (space-only trim, kept trailing empties)
    val docs = Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      1L -> "  leading spaces then words one two three four five six",
      2L -> "trailing spaces after words one two three four five   ",
      3L -> "\ttab lead and trail\t",
      4L -> "\nnewline lead and trail\n",
      5L -> "words  with   multi    spaces and\ttabs\nand\rcrff mixed in here",
      6L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa", // dup of 0
      7L -> " ",
      8L -> "solo",
      9L -> "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    val dir = java.nio.file.Files.createTempDirectory("q51-adv").toString
    try {
      import spark.implicits._
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val want = q51Mirror(docs)
      val got = ops.TextOps.q51LineDedup(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (id, w) =>
        assert(got(id) == w, s"doc $id: got ${got(id)} want $w")
      }
      // docs 0 and 6 share every line → both fully dropped
      assert(got(0L)._2 == 0L && got(6L)._2 == 0L,
        s"exact-dup docs must lose all lines: ${got(0L)} / ${got(6L)}")
    } finally graft.BenchCdc.rm(dir)
  }

  test("q52 funnel matches a per-user sequential replay") {
    val horizon = ops.RelOps.Q52HorizonHours * 3600L
    val ev = spark.read.parquet(s"$sf01/events.parquet")
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        col("event_type"),
        col("ts").cast("timestamp_ltz").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.flatMap { case (u, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val tView = views.min
        val deadline = tView + horizon
        val tClick = es.filter(e => e._2 == "click" && e._3 > tView && e._3 <= deadline)
          .map(_._3).minOption
        val tBuy = tClick.flatMap(tc =>
          es.filter(e => e._2 == "purchase" && e._3 > tc && e._3 <= deadline)
            .map(_._3).minOption)
        Some(u -> ((tView, tClick.getOrElse(-1L), tBuy.getOrElse(-1L),
          1 + tClick.size + tBuy.size)))
      }
    }
    val got = ops.RelOps.q52Funnel(spark, sf01).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, w) => assert(got(u) == w, s"user $u: got ${got(u)} want $w") }
    // the corpus must exercise all three funnel depths
    val depths = want.values.map(_._4).toSet
    assert(depths == Set(1, 2, 3), s"funnel depths seen: $depths")
  }
}
