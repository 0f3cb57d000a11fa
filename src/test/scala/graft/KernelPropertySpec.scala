package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized property gates for the pure-JVM kernels whose
  * correctness the distributed operators (and their perf rewrites)
  * lean on. Each property runs a few hundred SEEDED random cases
  * against a brute-force mirror — no Spark session, so the whole
  * suite is sub-second and safe to widen. The example-based specs pin
  * known edge cases; these pin the spaces between them.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("winnowFps == brute-force window minima on random unicode text") {
    val r = rng(0x11171L)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    for (case_ <- 0 until 200) {
      // mix ASCII, latin-1, CJK, and non-BMP (emoji plane) codepoints:
      // the kernel addresses CODEPOINTS, the classic UTF-16 trap
      val L = r.nextInt(40)
      val cps = Array.fill(L)(r.nextInt(4) match {
        case 0 => 'a' + r.nextInt(4)
        case 1 => 0xe0 + r.nextInt(8)
        case 2 => 0x4e00 + r.nextInt(16)
        case _ => 0x1f600 + r.nextInt(8)
      })
      val text = new String(cps, 0, cps.length)
      val k = 1 + r.nextInt(4)
      val w = 1 + r.nextInt(5)
      val got = graft.operators.TextHashFast.winnowFps(md, text, k, w).toSet
      // brute force: md5-hex each codepoint k-gram, min of every
      // w-window (global min when fewer grams than w), distinct
      val n = cps.length - k + 1
      val want: Set[String] =
        if (n <= 0) Set.empty
        else {
          val grams = (0 until n).map(i => hex(
            md.digest(new String(cps, i, k)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
          if (n < w) Set(grams.min)
          else (0 to n - w).map(i => grams.slice(i, i + w).min).toSet
        }
      assert(got == want, s"case $case_: text=${text.length} k=$k w=$w")
    }
  }

  test("topKDedup == sort-dedup-take on random streams with ties and dup ids") {
    val r = rng(0x707C1L)
    for (case_ <- 0 until 500) {
      val k = 1 + r.nextInt(6)
      val n = r.nextInt(40)
      // duplicate ids carry EQUAL distances (the real contract: a
      // multi-tree union re-scores the same vector identically) and
      // distinct ids collide on distance, exercising the id tie-break
      val dOf = Array.fill(8)(r.nextInt(5).toDouble)
      val cands = Array.fill(n) {
        val id = r.nextInt(8); (id.toLong, dOf(id))
      }
      val got = graft.operators.Exhaustive
        .topKDedup(cands.iterator, k).toList
      val want = cands.toList.distinct
        .sortBy { case (id, d) => (d, id) }.take(k)
      assert(got == want, s"case $case_: k=$k cands=${cands.toList}")
    }
  }

  test("Unigram.segment == brute-force argmax over all segmentations") {
    val r = rng(0x5E61L)
    val letters = "abc"
    for (case_ <- 0 until 300) {
      val word = Array.fill(1 + r.nextInt(7))(
        letters(r.nextInt(letters.length))).mkString
      // random vocab of substrings (plus guaranteed singles sometimes)
      val pieces = scala.collection.mutable.Map[String, Long]()
      for (_ <- 0 until r.nextInt(8)) {
        val a = r.nextInt(word.length)
        val b = a + 1 + r.nextInt(math.min(3, word.length - a))
        pieces(word.substring(a, b)) = -(1 + r.nextInt(1000)).toLong * 1000L
      }
      val maxLen = if (pieces.isEmpty) 1 else pieces.keys.map(_.length).max
      val unk = -5000000L
      val (gotPieces, gotScore) = graft.operators.Unigram.segment(
        word, pieces, math.max(1, maxLen), unk)
      // brute force all segmentations under the same piece admission
      def all(i: Int): Seq[(List[String], Long)] =
        if (i == word.length) Seq((Nil, 0L))
        else (i + 1 to math.min(word.length, i + math.max(1, maxLen)))
          .flatMap { j =>
            val p = word.substring(i, j)
            val sc = pieces.get(p)
              .orElse(if (j - i == 1) Some(unk) else None)
            sc.toSeq.flatMap(s =>
              all(j).map { case (rest, rs) => (p :: rest, s + rs) })
          }
      val cands = all(0)
      assert(cands.nonEmpty)
      val best = cands.minBy { case (ps, s) =>
        (-s, ps.length, ps.mkString(" ")) }(
        Ordering.Tuple3(Ordering.Long, Ordering.Int, Ordering.String))
      assert(gotScore == best._2,
        s"case $case_: word=$word vocab=$pieces got=$gotScore want=${best._2}")
      assert(gotPieces.toList == best._1,
        s"case $case_: word=$word vocab=$pieces " +
          s"got=${gotPieces.toList} want=${best._1}")
    }
  }

  test("bloomLogmFor: chosen size meets target fp, next smaller does not") {
    val r = rng(0xB100E1L)
    def fp(n: Long, k: Int, logm: Int): Double = {
      val m = math.pow(2.0, logm)
      math.pow(1.0 - math.exp(-k.toDouble * n / m), k)
    }
    for (case_ <- 0 until 300) {
      val n = 1L + (math.pow(10, 1 + r.nextDouble() * 6)).toLong
      val k = 1 + r.nextInt(6)
      val target = math.pow(10, -(1 + r.nextDouble() * 2)) // 1e-1..1e-3
      try {
        val logm = graft.operators.Sketches.bloomLogmFor(n, k, target)
        assert(fp(n, k, logm) <= target, s"case $case_: n=$n k=$k")
        if (logm > 5)
          assert(fp(n, k, logm - 1) > target,
            s"case $case_: not minimal, n=$n k=$k logm=$logm")
      } catch {
        case _: IllegalArgumentException =>
          assert(fp(n, k, 30) > target,
            s"case $case_: errored though logm=30 suffices, n=$n k=$k")
      }
    }
  }
}
