package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic, self-contained hashing kernels backing graft's custom
  * Catalyst expressions (see exprs.scala). All functions are pure
  * (seed, bytes) → value, so results are identical at any parallelism and
  * across JVMs — required because these hashes define dedup/LSH bucket
  * identity in distributed runs.
  *
  * These are called from generated code (whole-stage codegen emits static
  * calls into this object), so every entry point takes/returns catalyst
  * runtime types (ArrayData, UTF8String) without boxing per element.
  */
object Hashing {

  /** splitmix64 finalizer (public-domain mixing function). */
  def mix64(v: Long): Long = {
    var x = v + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64 over raw bytes, then splitmix-finalized: a fast, stable
    * 64-bit string hash with good avalanche for bucket assignment. */
  def hashBytes(bytes: Array[Byte], offset: Int, len: Int, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = offset
    val end = offset + len
    while (i < end) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  def hashUtf8(s: UTF8String, seed: Long): Long = {
    val b = s.getBytes
    hashBytes(b, 0, b.length, seed)
  }

  /** Unicode NFC normalization (canonical composition) — the q53 kernel.
    * Pure ASCII (the overwhelmingly common case in a code/text corpus) is
    * detected with a byte scan and returned as-is, zero-copy; only rows
    * carrying non-ASCII bytes pay the String round-trip through
    * java.text.Normalizer. Mirrors DuckDB's `nfc_normalize`. */
  def nfc(s: UTF8String): UTF8String = {
    // scan via getByte, not getBytes: parquet/unsafe-row strings are
    // offset SLICES of a shared buffer, for which getBytes allocates
    // and copies the whole payload before the check even runs
    val n = s.numBytes()
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }

  // -------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------

  /** 64-bit SimHash of a token array: each token votes ±1 per bit of its
    * hash; the sign of each bit-sum becomes the output bit. Documents
    * differing in a few tokens land at small Hamming distance. */
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashUtf8(tokens.getUTF8String(i), 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // -------------------------------------------------------------------
  // MinHash
  // -------------------------------------------------------------------

  /** k-permutation MinHash signature of a string-set in ONE pass over the
    * input (k min-accumulators updated per element), vs. k full scans if
    * composed from built-in `transform`+`array_min`. Empty input yields
    * sentinel Long.MaxValue entries (no shingle ever hashes to it in
    * practice, so empty sets only band-collide with empty sets). */
  def minhash(shingles: ArrayData, k: Int, seed: Long): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = hashUtf8(shingles.getUTF8String(i), seed)
        var j = 0
        while (j < k) {
          // j-th "permutation" = splitmix re-mix of the base hash; cheap
          // and independent-enough for banding (standard one-hash trick).
          val h = mix64(base ^ (j * 0xff51afd7ed558ccdL))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** LSH band hashes computed directly from the minhash accumulators in
    * the same single pass: band j = mix of signature rows
    * [j*rowsPerBand, (j+1)*rowsPerBand). Returning the band hashes (not
    * the signature) keeps the downstream plan narrow AND evaluates the
    * whole k-permutation pass exactly once per input row — if the plan
    * instead computes `element_at(sig, i)` per band, Catalyst's project
    * collapsing re-inlines the full signature computation once per band
    * (measured 5× slowdown on the dedup query). */
  def minhashBands(shingles: ArrayData, k: Int, rowsPerBand: Int, seed: Long): ArrayData = {
    val sig = minhash(shingles, k, seed)
    val nBands = k / rowsPerBand
    val out = new Array[Long](nBands)
    var j = 0
    while (j < nBands) {
      var h = 0x87c37b91114253d5L ^ j
      var r = 0
      while (r < rowsPerBand) {
        h = mix64(h ^ sig.getLong(j * rowsPerBand + r))
        r += 1
      }
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  // -------------------------------------------------------------------
  // Winnowing fingerprint (rolling hash)
  // -------------------------------------------------------------------

  /** Winnowed document fingerprint: Rabin–Karp rolling hash over char
    * n-grams, then the standard winnowing selection (min hash of each
    * window of `w` consecutive n-grams, recorded once per run), returned
    * sorted+distinct. Robust to small local edits; used for document
    * fingerprint dedup/provenance. */
  def winnow(text: UTF8String, n: Int, w: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val m = len - n + 1 // number of n-grams
    val hashes = new Array[Long](m)
    val B = 1000003L
    // precompute B^(n-1) for the rolling update
    var pow = 1L
    var p = 0
    while (p < n - 1) { pow *= B; p += 1 }
    var h = 0L
    var i = 0
    while (i < n) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = mix64(h)
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + n - 1)
      hashes(i) = mix64(h)
      i += 1
    }
    // winnow: min of each window of w (ties → rightmost), dedup runs
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var min = hashes(0)
      i = 1
      while (i < m) { if (hashes(i) <= min) min = hashes(i); i += 1 }
      sel.add(min)
    } else {
      var start = 0
      var lastPick = -1
      while (start + w <= m) {
        var minIdx = start
        i = start + 1
        while (i < start + w) { if (hashes(i) <= hashes(minIdx)) minIdx = i; i += 1 }
        if (minIdx != lastPick) { sel.add(hashes(minIdx)); lastPick = minIdx }
        start += 1
      }
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Sorted distinct 64-bit hashes of the word n-gram shingles of `text`,
    * in ONE pass (tokenize + chain token hashes + sort + dedup). The
    * composed-builtins version (`transform(sequence(...), i ->
    * concat_ws(element_at(tokens, i)...))`) re-evaluates the token split
    * per ELEMENT of the lambda — ~300 splits per row, measured 2 ms/row;
    * this runs in ~µs. Shingle identity is the ordered token-hash chain,
    * which preserves set cardinalities (all jaccard math is count-based).
    */
  def wordShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // tokenize on the explicit Java∩RE2 whitespace class [ \t\n\f\r]
    // (see fns.wsTokens): Character.isWhitespace is BROADER than either
    // regex (\x0B, unicode separators) and would diverge the hashed
    // shingle universe from the string_split_regex oracles
    @inline def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && ws(s.charAt(i))) i += 1
      val start = i
      while (i < len && !ws(s.charAt(i))) i += 1
      if (i > start) {
        var h = 0xcbf29ce484222325L
        var j = start
        while (j < i) { h = (h ^ s.charAt(j)) * 0x100000001b3L; j += 1 }
        tokenHashes += mix64(h)
      }
    }
    val m = tokenHashes.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val sh = new Array[Long](m)
    var k = 0
    while (k < m) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) { h = mix64(h ^ tokenHashes(k + j)); j += 1 }
      sh(k) = h
      k += 1
    }
    java.util.Arrays.sort(sh)
    var out = sh
    var uniq = 1
    var p = 1
    while (p < m) { if (sh(p) != sh(p - 1)) { sh(uniq) = sh(p); uniq += 1 }; p += 1 }
    if (uniq < m) out = java.util.Arrays.copyOf(sh, uniq)
    new GenericArrayData(out)
  }

  private val ShingleSep = UTF8String.fromString(" ")

  /** Space-joined word n-gram shingle STRINGS over a pre-split token
    * array — the string-identity sibling of [[wordShingleHashes]], for
    * the paths whose DuckDB oracle compares the literal gram text
    * (q14's shingled view, q47's span grams). Takes the token ARRAY
    * (not the raw text) so Spark's `split(trim(text), "\\s+")` stays
    * the single tokenization authority; being a real expression, that
    * child is evaluated ONCE per row — the composed-builtins form
    * (`transform(sequence(...), i -> concat_ws(element_at(tokens, ·)))`)
    * re-evaluates a non-attribute `tokens` child per lambda ELEMENT,
    * i.e. O(n·T) regex splits per row (measured 6× on q47 at sf0.1).
    * Output is identical to the old form: `concat_ws(" ", ...)`
    * null-skip semantics via [[UTF8String.concatWs]], empty array when
    * fewer than n tokens. */
  def wordShingleStrings(tokens: ArrayData, n: Int): ArrayData = {
    val t = tokens.numElements()
    val m = t - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(ShingleSep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash band hashes over an already-hashed shingle set (long array)
    * — same banding as [[minhashBands]], skipping the string hashing. */
  def minhashBandsL(hashes: ArrayData, k: Int, rowsPerBand: Int, seed: Long): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val base = mix64(hashes.getLong(i) ^ seed)
      var j = 0
      while (j < k) {
        val h = mix64(base ^ (j * 0xff51afd7ed558ccdL))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    val nBands = k / rowsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0x87c37b91114253d5L ^ b
      var r = 0
      while (r < rowsPerBand) { h = mix64(h ^ mins(b * rowsPerBand + r)); r += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Jaccard similarity of two SORTED, DISTINCT long arrays by a single
    * merge walk — no per-call hash-set allocation (vs composing
    * `array_intersect`/`array_union`, which builds two hash sets per
    * pair; this runs once per candidate pair in similarity joins, so the
    * constant factor is the whole game). */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  // -------------------------------------------------------------------
  // Vector kernels (float embeddings)
  // -------------------------------------------------------------------

  /** Cosine similarity over float arrays, accumulated in double in index
    * order (bit-stable and matching a sequential SQL re-computation).
    * Returns 0 when either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane LSH bucket: `nbits` signed projections against
    * Rademacher (±1) planes derived deterministically from (seed, bit,
    * dim) — no stored plane matrix, any worker regenerates identically. */
  def hyperplaneBucket(v: ArrayData, nbits: Int, seed: Long): Int = {
    val n = v.numElements()
    var bucket = 0
    var b = 0
    while (b < nbits) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val sign = if ((mix64(seed ^ (b.toLong << 32) ^ i) & 1L) == 1L) 1.0 else -1.0
        s += sign * v.getFloat(i)
        i += 1
      }
      if (s > 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }
}
