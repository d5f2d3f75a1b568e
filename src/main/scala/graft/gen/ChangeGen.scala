package graft.gen

import graft.schema.ChangeEvent
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic, hash-based change-log generator.
  *
  * Every field of every event is a pure function of (seed, lsn) — no RNG
  * state, no wall clock — so generation is reproducible at any parallelism
  * and any scale, and can run distributed via `spark.range(n).flatMap`.
  * This mirrors the reference's golden-fixture strategy (tiny deterministic
  * inputs with independently-enumerated expected outputs, reference:
  * src/places/place_index.rs:455-501) but scales to 10^10 ids because the
  * generator is itself a distributed, embarrassingly-parallel map.
  *
  * Skew: a configurable share of events land on a single "hot" repo to
  * exercise the engine's skew handling (salting + AQE), per the north rule.
  *
  * Duplicates: a configurable fraction of ids re-emit an earlier event
  * verbatim (same lsn, same payload) — the at-least-once delivery fixture
  * that `dropDuplicates(lsn)` must collapse.
  */
final case class GenConfig(
    seed: Long = 42L,
    nEvents: Long = 10000L,
    nRepos: Int = 50,
    pathsPerRepo: Int = 40,
    hotRepoPct: Int = 30,   // % of events hitting repo 0
    deletePct: Int = 5,     // % of events that are deletes
    dupPct: Int = 10,       // % of ids that also re-emit an earlier event
    dupLookback: Long = 97L // how far back the duplicate reaches
)

object ChangeGen {

  /** splitmix64 finalizer — ONE kernel ([[graft.functions.Hashing.mix64]]):
    * fixtures cross-check generator hashes against engine hashes, so a
    * second copy drifting would silently desynchronize them. */
  def mix(x0: Long): Long = graft.functions.Hashing.mix64(x0)

  private def h(seed: Long, lsn: Long, stream: Long): Long =
    mix(mix(seed ^ (stream * 0x9e3779b97f4a7c15L)) ^ lsn)

  private def pos(v: Long): Long = v & Long.MaxValue

  private val langs = Array("scala", "rust", "py", "go", "java")
  private val exts = Array("scala", "rs", "py", "go", "java")

  private val baseEpochMs = 1735689600000L // 2025-01-01T00:00:00Z, fixed

  def repoOf(cfg: GenConfig, lsn: Long): String = {
    val r = pos(h(cfg.seed, lsn, 1))
    // nRepos = 1 is the all-hot single-repo fixture (100% skew): every
    // event must land on repo 0, not divide by (nRepos - 1) = 0
    val idx =
      if (cfg.nRepos <= 1 || r % 100 < cfg.hotRepoPct) 0
      else 1 + ((r / 100) % (cfg.nRepos - 1)).toInt
    f"org-${idx % 7}%02d/repo-$idx%03d"
  }

  def pathOf(cfg: GenConfig, lsn: Long): (String, String) = {
    val p = pos(h(cfg.seed, lsn, 2))
    val i = (p % cfg.pathsPerRepo).toInt
    val li = i % langs.length
    (s"src/d${i / 16}/file_$i.${exts(li)}", langs(li))
  }

  def commitOf(cfg: GenConfig, lsn: Long): String =
    f"${h(cfg.seed, lsn, 3)}%016x${h(cfg.seed, lsn, 4)}%016x${h(cfg.seed, lsn, 5) & 0xffffffffL}%08x"

  /** Deterministic pseudo-source content; ASCII-only, byte-stable. */
  def contentOf(cfg: GenConfig, lsn: Long, repo: String, path: String): String = {
    val sb = new StringBuilder(320)
    sb.append("// ").append(repo).append('/').append(path)
      .append(" @ lsn=").append(lsn).append('\n')
    val lines = 3 + (pos(h(cfg.seed, lsn, 6)) % 10).toInt
    var i = 0
    while (i < lines) {
      val w = h(cfg.seed, lsn, 100 + i)
      sb.append("fn_").append(java.lang.Long.toHexString(pos(w) % 0xfffffL))
        .append("(x) = x * ").append((pos(w >>> 20) % 997).toString).append('\n')
      i += 1
    }
    sb.toString
  }

  def opOf(cfg: GenConfig, lsn: Long): String = {
    val o = pos(h(cfg.seed, lsn, 7)) % 100
    if (o < cfg.deletePct) "D" else if (o < 40) "I" else "U"
  }

  /** Event time: monotone in lsn with bounded (±4 min) disorder — inside
    * the engine's 10-minute watermark, so no correct event is ever late. */
  def tsOf(cfg: GenConfig, lsn: Long): java.sql.Timestamp = {
    val jitter = (h(cfg.seed, lsn, 8) % 240000L) // [-240s, +240s)
    new java.sql.Timestamp(baseEpochMs + lsn * 1000L + jitter)
  }

  /** The single event with sequence number `lsn`. */
  def eventOf(cfg: GenConfig, lsn: Long): ChangeEvent = {
    val repo = repoOf(cfg, lsn)
    val (path, lang) = pathOf(cfg, lsn)
    val op = opOf(cfg, lsn)
    val content = if (op == "D") null else contentOf(cfg, lsn, repo, path)
    ChangeEvent(lsn, op, tsOf(cfg, lsn), repo, path, commitOf(cfg, lsn), lang, content)
  }

  /** All events emitted for generator id `id`: the primary event plus,
    * for a deterministic subset of ids, a duplicate of an earlier lsn. */
  def emittedFor(cfg: GenConfig, id: Long): Seq[ChangeEvent] = {
    val primary = eventOf(cfg, id)
    val dup = pos(h(cfg.seed, id, 9)) % 100 < cfg.dupPct && id >= cfg.dupLookback
    if (dup) Seq(primary, eventOf(cfg, id - cfg.dupLookback)) else Seq(primary)
  }

  /** Distributed generation — scales to arbitrary nEvents. */
  def events(spark: SparkSession, cfg: GenConfig, partitions: Int = 32): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.range(0L, cfg.nEvents, 1L, partitions)
      .flatMap(id => emittedFor(cfg, id))
  }

  /** Local generation for small fixtures (tests). */
  def eventsLocal(cfg: GenConfig): Seq[ChangeEvent] =
    (0L until cfg.nEvents).flatMap(id => emittedFor(cfg, id))

  /** Independent, non-Spark fold of the log into the expected final state:
    * dedup by lsn, last-writer-wins by lsn per (repo, path), delete removes
    * the key. This is the test oracle the engine must match bit-for-bit. */
  def expectedState(cfg: GenConfig): Map[(String, String), ChangeEvent] = {
    val byLsn = scala.collection.mutable.LongMap.empty[ChangeEvent]
    eventsLocal(cfg).foreach(e => if (!byLsn.contains(e.lsn)) byLsn(e.lsn) = e)
    val state = scala.collection.mutable.Map.empty[(String, String), ChangeEvent]
    byLsn.values.toSeq.sortBy(_.lsn).foreach { e =>
      val k = (e.repo, e.path)
      if (e.op == "D") state.remove(k) else state(k) = e
    }
    state.toMap
  }

  /** sha256 hex of a string's UTF-8 bytes — the verified per-row invariant. */
  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** Write the log as numbered micro-batch directories so batch reads and
    * Structured Streaming file-source reads see identical bytes, and resume
    * tests can reveal batches incrementally (reference analogue: stage
    * outputs as files, src/pipeline/mod.rs:9-27).
    *
    * `format` "parquet" (pre-parsed) or "json" (JSON-lines — the raw
    * binlog/WAL-tail shape, where the engine pays the decode). */
  def writeLog(spark: SparkSession, cfg: GenConfig, dir: String,
               nBatches: Int, partitions: Int = 8,
               format: String = "parquet"): Unit = {
    import spark.implicits._
    val per = math.max(1L, (cfg.nEvents + nBatches - 1) / nBatches)
    (0 until nBatches).foreach { b =>
      val lo = b * per
      val hi = math.min(cfg.nEvents, (b + 1) * per)
      if (lo < hi) {
        val ds = spark.range(lo, hi, 1L, partitions)
          .flatMap(id => emittedFor(cfg, id))
        ds.write.mode("overwrite").format(format).save(f"$dir/batch-$b%05d")
      }
    }
  }
}
