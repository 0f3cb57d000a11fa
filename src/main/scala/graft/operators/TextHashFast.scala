package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** JVM fast-path twins of the TextOps hashing kernels, for use inside
  * `mapPartitions` signature stages (Dedup). Each function is
  * value-equivalent to its Catalyst/DuckDB counterpart — the contracts:
  *
  *  - tokenize ≡ `filter(split(text, "\\s+"), len > 0)` (same regex
  *    engine, empties dropped);
  *  - word-3-shingles joined by single spaces;
  *  - (h1, h2) ≡ `conv(substr(md5(s),1,15),16,10) % p` /
  *    `conv(substr(md5(s),17,15),16,10) % p`: chars 1-15 are the high 60
  *    bits of the first 8 digest bytes, chars 17-31 the low 60 bits of
  *    bytes 8-15 — computed here straight from the digest bytes;
  *  - simhash16 bit j votes on the high bit of hex nibble j+1 = bit 7−…
  *    of the digest bytes, matching `substr(md5(t), j+1, 1) IN (8..f)`.
  *
  * Equivalence is asserted in DedupSpec (fast path vs Column path) and
  * transitively by the DuckDB oracle gate.
  */
object TextHashFast {

  val P: Long = TextOps.MinhashP

  def tokenize(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  def shingles3(toks: Array[String]): Array[String] =
    if (toks.length < 3) Array.empty
    else Array.tabulate(toks.length - 2)(i =>
      toks(i) + " " + toks(i + 1) + " " + toks(i + 2))

  @inline private def be64(d: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** (h1, h2) of one shingle from one md5 — see object doc. */
  def hashPair(md: MessageDigest, s: String): (Long, Long) = {
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val h1 = (be64(d, 0) >>> 4) % P // hex chars 1..15 (drop nibble 16)
    val h2 = (be64(d, 8) >>> 4) % P // hex chars 17..31 (drop nibble 32)
    (h1, h2)
  }

  /** 60-bit key of one signature band (`len` values from `off`): the
    * h1-style md5 fold of the comma-joined band values — value-equal to
    * SQL `CAST(concat('0x', substr(md5(concat_ws(',', …)), 1, 15)) AS
    * BIGINT)` (chars 1-15 = high 60 bits of the first 8 digest bytes,
    * the [[hashPair]] convention). Collisions are ~n²/2⁶⁰ and, because
    * both engines compute the SAME key, collide identically — no
    * oracle divergence. Used for bandSize ≠ 2; r = 2 keeps the cheaper
    * arithmetic packing sig0·P + sig1 (fits a long exactly: P < 2³⁰). */
  def bandKey(md: MessageDigest, sig: Array[Long], off: Int, len: Int): Long = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < len) {
      if (i > 0) sb.append(',')
      sb.append(sig(off + i))
      i += 1
    }
    be64(md.digest(sb.toString.getBytes(StandardCharsets.UTF_8)), 0) >>> 4
  }

  /** MinHash signature: min over shingles of (h1 + i·h2) mod p. */
  def minhashSig(md: MessageDigest, shingles: Array[String], numHashes: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var si = 0
    while (si < shingles.length) {
      val (h1, h2) = hashPair(md, shingles(si))
      var i = 0
      while (i < numHashes) {
        val v = (h1 + i * h2) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      si += 1
    }
    mins
  }

  /** 16-bit SimHash over tokens — votes on the high bit of each of the
    * first 16 hex nibbles of md5(token). */
  def simhash16(md: MessageDigest, toks: Array[String]): Int = {
    val votes = new Array[Int](16)
    var ti = 0
    while (ti < toks.length) {
      val d = md.digest(toks(ti).getBytes(StandardCharsets.UTF_8))
      var j = 0
      while (j < 16) {
        // nibble j+1 (1-based hex char) = high nibble of byte j/2 when j
        // even, low nibble when odd; its high bit:
        val b = d(j / 2) & 0xff
        val nib = if (j % 2 == 0) b >>> 4 else b & 0xf
        votes(j) += (if (nib >= 8) 1 else -1)
        j += 1
      }
      ti += 1
    }
    var sim = 0; var j = 0
    while (j < 16) { if (votes(j) > 0) sim |= 1 << j; j += 1 }
    sim
  }

  /** 64-bit SimHash over tokens: bits 0..31 vote on the HIGH bit (8) of
    * md5 nibble j+1, bits 32..63 on its 4-bit — two independent
    * uniform bits per nibble, one md5 per token, and every vote is
    * expressible as a hex-char set test in SQL (the oracle's shape).
    * The 16-bit fingerprint saturates beyond ~10⁴ docs (everything
    * collides); this is the corpus-scale variant. */
  def simhash64(md: MessageDigest, toks: Array[String]): Long = {
    val votes = new Array[Int](64)
    var ti = 0
    while (ti < toks.length) {
      val d = md.digest(toks(ti).getBytes(StandardCharsets.UTF_8))
      var j = 0
      while (j < 32) {
        val b = d(j / 2) & 0xff
        val nib = if (j % 2 == 0) b >>> 4 else b & 0xf
        votes(j) += (if (nib >= 8) 1 else -1)
        votes(32 + j) += (if ((nib & 4) != 0) 1 else -1)
        j += 1
      }
      ti += 1
    }
    var sim = 0L; var j = 0
    while (j < 64) { if (votes(j) > 0) sim |= 1L << j; j += 1 }
    sim
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Winnowing fingerprints (Schleimer et al.) as a JVM kernel —
    * value-equivalent to [[TextOps.winnow]] (md5-hex char-k-grams by
    * CODEPOINT windows, lexicographic w-window min, per-doc distinct;
    * lowercase-hex ASCII makes UTF8String and java.lang.String compare
    * identically) but O(L) per doc via a monotonic deque, where the
    * Catalyst `transform(…, slice(h, i, w))` form allocates and scans
    * a w-array per window — measured ~2× on dedup_winnow's postings
    * phase at sf0.1. */
  def winnowFps(md: MessageDigest, text: String, k: Int, w: Int): Array[String] = {
    if (text == null) return Array.empty
    // codepoint addressing: Column length()/substr() count codepoints,
    // not UTF-16 units — match exactly on non-BMP text
    val cps = text.codePoints().toArray
    val L = cps.length
    if (L < k) return Array.empty
    val n = L - k + 1
    val grams = new Array[String](n)
    var i = 0
    while (i < n) {
      val d = md.digest(
        new String(cps, i, k).getBytes(StandardCharsets.UTF_8))
      val cs = new Array[Char](32)
      var j = 0
      while (j < 16) {
        cs(2 * j) = HexChars((d(j) >>> 4) & 0xf)
        cs(2 * j + 1) = HexChars(d(j) & 0xf)
        j += 1
      }
      grams(i) = new String(cs)
      i += 1
    }
    val out = new java.util.LinkedHashSet[String]()
    if (n < w) {
      var m = grams(0)
      i = 1
      while (i < n) { if (grams(i) < m) m = grams(i); i += 1 }
      out.add(m)
    } else {
      // indices of a non-decreasing gram run; head is the window min
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0
      i = 0
      while (i < n) {
        while (tail > head && grams(dq(tail - 1)) >= grams(i)) tail -= 1
        dq(tail) = i
        tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) out.add(grams(dq(head)))
        i += 1
      }
    }
    out.toArray(new Array[String](out.size))
  }
}
