package graft

import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable
import graft.merge.MergeInto
import graft.schema.ChangeEvent
import org.scalacheck.{Gen => SGen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5): the replay invariants that must hold for
  * ANY event log, not just the seeded fixtures —
  *  1. replaying any permutation / any batch split of distinct-lsn events
  *     yields the lsn-max state;
  *  2. duplicating any subset of events changes nothing;
  *  3. the hashing kernels' algebraic properties.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic scalacheck sampling (no scalatestplus bridge offline):
    * draw `n` cases from fixed seeds and run the assertion on each. */
  private def forSamples[T](gen: SGen[T], n: Int)(check: (T, scala.util.Random) => Unit): Unit =
    (1 to n).foreach { i =>
      val v = gen.pureApply(SGen.Parameters.default, Seed(1000L + i))
      check(v, new scala.util.Random(5000L + i))
    }

  private def ts(i: Long) = new java.sql.Timestamp(1700000000000L + i * 1000)

  private val genEvents: SGen[List[ChangeEvent]] = for {
    n <- SGen.choose(1, 60)
    evs <- SGen.sequence[List[ChangeEvent], ChangeEvent]((0 until n).map { i =>
      for {
        repo <- SGen.oneOf("r1", "r2", "r3")
        path <- SGen.oneOf("a", "b", "c", "d")
        op <- SGen.frequency(4 -> SGen.const("U"), 1 -> SGen.const("D"), 2 -> SGen.const("I"))
        body <- SGen.alphaNumStr.map(_.take(12))
      } yield ChangeEvent(i.toLong, op, ts(i.toLong), repo, path,
        f"c$i%040d", "scala", if (op == "D") null else s"$repo/$path:$body")
    })
  } yield evs

  private def expected(evs: Seq[ChangeEvent]): Map[(String, String), Long] = {
    val state = scala.collection.mutable.Map.empty[(String, String), ChangeEvent]
    evs.sortBy(_.lsn).foreach { e =>
      if (e.op == "D") state.remove((e.repo, e.path)) else state((e.repo, e.path)) = e
    }
    state.view.mapValues(_.lsn).toMap
  }

  private def replayPermutation(evs: Seq[ChangeEvent], nBatches: Int): Map[(String, String), Long] = {
    import spark.implicits._
    val work = TestSpark.tmpDir("prop")
    val table = new LakeTable(spark, s"$work/table")
    val merge = new MergeInto(table, numBuckets = 2, saltBuckets = 2, recordMeta = false)
    val groups = evs.zipWithIndex.groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
    groups.foreach { case (epoch, batch) =>
      merge.apply(batch.map(_._1).toDF(), epoch.toLong)
    }
    table.read().select("repo", "path", "lsn").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("replay of any permutation and batch split yields the lsn-max state") {
    forSamples(genEvents, 8) { (evs, rnd) =>
      val shuffled = rnd.shuffle(evs)
      val nBatches = 1 + rnd.nextInt(3)
      assert(replayPermutation(shuffled, nBatches) == expected(evs))
    }
  }

  test("duplicating any subset of events changes nothing") {
    forSamples(genEvents, 5) { (evs, rnd) =>
      val dups = evs.filter(_ => rnd.nextBoolean())
      assert(replayPermutation(rnd.shuffle(evs ++ dups), 2) == expected(evs))
    }
  }

  test("sortedJaccard equals set-definition jaccard on arbitrary long sets") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val pairGen = for {
      a <- SGen.listOf(SGen.choose(-50L, 50L))
      b <- SGen.listOf(SGen.choose(-50L, 50L))
    } yield (a, b)
    forSamples(pairGen, 200) { case ((a, b), _) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val got = graft.functions.Hashing.sortedJaccard(
        new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray))
      val inter = sa.toSet.intersect(sb.toSet).size
      val union = sa.toSet.union(sb.toSet).size
      val want = if (union == 0) 0.0 else inter.toDouble / union
      assert(got == want)
    }
  }

  test("generator fold oracle is permutation-independent (sanity of the test oracle itself)") {
    val cfg = GenConfig(nEvents = 300L)
    val evs = ChangeGen.eventsLocal(cfg)
    val byLsnFirst = ChangeGen.expectedState(cfg)
    // re-fold a shuffled copy (dedup by lsn first, then lsn order)
    val rnd = new scala.util.Random(1)
    val shuffled = rnd.shuffle(evs)
    val byLsn = shuffled.groupBy(_.lsn).map(_._2.head).toSeq.sortBy(_.lsn)
    val state = scala.collection.mutable.Map.empty[(String, String), ChangeEvent]
    byLsn.foreach { e =>
      if (e.op == "D") state.remove((e.repo, e.path)) else state((e.repo, e.path)) = e
    }
    assert(state.toMap == byLsnFirst)
  }

  test("closure matches a Scala BFS on arbitrary (possibly cyclic) parent graphs") {
    import spark.implicits._
    // random single-parent functional graphs over 1..n — every node has
    // one outgoing edge, so cycles are common (rho-shaped components)
    val genGraph: SGen[(Int, Map[Long, Long], Seq[Long])] = for {
      n <- SGen.choose(3, 14)
      parents <- SGen.sequence[List[Long], Long](
        (1 to n).map(_ => SGen.choose(1L, n.toLong)))
      nSeeds <- SGen.choose(1, 3)
      seeds <- SGen.sequence[List[Long], Long](
        (1 to nSeeds).map(_ => SGen.choose(1L, n.toLong)))
    } yield (n, (1 to n).map(_.toLong).zip(parents).toMap, seeds.distinct)

    def bfs(edges: Map[Long, Long], seeds: Seq[Long]): Set[(Long, Long, Int)] = {
      // reference semantics: BFS over (node, ancestor) pairs, first
      // (minimal) depth wins, stop on visited — osm/mod.rs:391-435
      val out = scala.collection.mutable.Map.empty[(Long, Long), Int]
      var frontier = seeds.flatMap(s => edges.get(s).map(p => (s, p, 1)))
        .filter { case (nd, anc, d) => out.getOrElseUpdate((nd, anc), d) == d }
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap { case (nd, anc, d) =>
          edges.get(anc).map(p => (nd, p, d + 1))
        }.filter { case (nd, anc, d) =>
          if (out.contains((nd, anc))) false
          else { out((nd, anc)) = d; true }
        }
      }
      out.map { case ((nd, anc), d) => (nd, anc, d) }.toSet
    }

    forSamples(genGraph, 8) { case ((_, edges, seeds), _) =>
      val edgesDf = edges.toSeq.toDF("child", "parent")
      val seedsDf = seeds.flatMap(s => edges.get(s).map(p => (s, p, 1)))
        .toDF("node", "ancestor", "depth")
      val got = ops.RelOps.closure(edgesDf, seedsDf, maxIter = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(got.length == got.toSet.size, s"duplicate rows: ${got.toSeq}")
      assert(got.toSet == bfs(edges, seeds), s"edges=$edges seeds=$seeds")
    }
  }

  test("path bloom: zero false negatives ever; false-positive rate near design point") {
    import graft.lake.PathBloom
    val genPaths: SGen[List[String]] = for {
      n <- SGen.choose(1, 2000)
      ps <- SGen.listOfN(n, for {
        depth <- SGen.choose(1, 4)
        segs <- SGen.listOfN(depth, SGen.oneOf(
          SGen.alphaNumStr.map(_.take(12)),
          SGen.const("ファイル"), SGen.const("a b\tc"), SGen.const("")))
      } yield segs.mkString("/"))
    } yield ps
    var probes = 0L
    var fps = 0L
    forSamples(genPaths, 20) { (paths, rnd) =>
      val distinct = paths.distinct
      val bloom = PathBloom.build(
        distinct.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))).get
      // the invariant pruning correctness rests on: NO false negatives
      distinct.foreach(p => assert(PathBloom.mayContain(bloom, p), s"FN: $p"))
      // round-trip through the manifest encoding
      val rt = PathBloom.decode(PathBloom.encode(bloom))
      assert(java.util.Arrays.equals(rt, bloom))
      // fp measurement against paths that are definitely absent
      val absent = (1 to 500).map(i => s"absent/${rnd.nextLong()}/f$i.txt")
        .filterNot(distinct.toSet)
      probes += absent.size
      fps += absent.count(PathBloom.mayContain(bloom, _))
    }
    // design point: 10 bits/key (power-of-two rounded UP, so usually
    // better), k=6 → fpp ≈ 1.6% at worst; assert a loose 5% ceiling
    val fpp = fps.toDouble / probes
    assert(fpp < 0.05, f"false-positive rate $fpp%.4f over $probes probes")
  }

  test("path bloom: build declines past the size cap instead of degrading") {
    import graft.lake.PathBloom
    val maxDistinct = PathBloom.MaxBytes * 8 / PathBloom.BitsPerKey
    val tooMany = (0 to maxDistinct).map(i => s"p/$i".getBytes("UTF-8"))
    assert(PathBloom.build(tooMany).isEmpty)
    assert(PathBloom.build(Nil).isEmpty)
    // at the cap it still builds
    assert(PathBloom.build(tooMany.take(maxDistinct)).isDefined)
  }
}
