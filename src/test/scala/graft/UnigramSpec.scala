package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram
import graft.operators.Unigram.Piece

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: Array[Piece] = {
    val chars = ('a' to 'z').map(c => Piece(c.toString, -14000000L))
    val bi = Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd")
      .map(Piece(_, -11000000L))
    val tri = Seq("the", "ing", "and", "ion", "ent", "ati")
      .map(Piece(_, -9000000L))
    (chars ++ bi ++ tri).toArray
  }
  private val vmap = vocab.map(p => p.piece -> p.score).toMap
  private val maxLen = 3
  private val unk = vocab.map(_.score).min - 1000000L

  /** Exhaustive reference: enumerate every segmentation, pick argmax
    * under the exact tie-break contract (score DESC, npieces ASC,
    * space-joined path ASC). */
  private def brute(word: String): (String, Long) = {
    def all(pos: Int): Seq[(List[String], Long)] =
      if (pos == word.length) Seq((Nil, 0L))
      else (1 to math.min(maxLen, word.length - pos)).flatMap { l =>
        val piece = word.substring(pos, pos + l)
        val sc = vmap.get(piece)
          .orElse(if (l == 1) Some(unk) else None)
        sc.toSeq.flatMap(s =>
          all(pos + l).map { case (rest, rs) => (piece :: rest, s + rs) })
      }
    all(0).map { case (ps, s) => (ps.mkString(" "), s, ps.length) }
      .minBy { case (path, s, np) => (-s, np, path) } match {
      case (path, s, _) => (path, s)
    }
  }

  test("Viterbi segment == exhaustive argmax under the tie-break contract") {
    val words = Seq("the", "theater", "entanglement", "sanding", "onion",
      "x", "zzzz", "internationalization", "rent", "ratio", "q9q",
      "aaaaaaaaaaaa", "thethethe", "ingenting")
    words.foreach { w =>
      val (ps, s) = Unigram.segment(w, vmap, maxLen, unk)
      val (bp, bs) = brute(w)
      assert(ps.mkString(" ") == bp, s"word $w")
      assert(s == bs, s"word $w score")
      assert(ps.mkString("") == w, s"word $w must reassemble")
    }
  }

  test("unknown characters fall back to unk singles, never fail") {
    val (ps, s) = Unigram.segment("a9b", vmap, maxLen, unk)
    assert(ps.toSeq == Seq("a", "9", "b"))
    assert(s == vmap("a") + unk + vmap("b"))
    assert(Unigram.segment("", vmap, maxLen, unk)._1.isEmpty)
  }

  test("trainer learns the dominant piece and is partition-deterministic") {
    val docs = (0 until 200)
      .map(i => (i.toLong, if (i % 4 == 0) "xyxyxyxy qq" else "xyxyxy zz"))
      .toDF("doc_id", "text")
    val t1 = Unigram.train(docs, "text", vocabSize = 12, emIters = 3,
      maxPieceLen = 4, seedSize = 50, maxWords = 100)
    val t2 = Unigram.train(docs.repartition(7), "text", vocabSize = 12,
      emIters = 3, maxPieceLen = 4, seedSize = 50, maxWords = 100)
    assert(t1.toSeq == t2.toSeq, "training must not depend on partitioning")
    val ps = t1.map(_.piece).toSet
    assert(ps.contains("xy") || ps.contains("xyxy"),
      s"dominant repeat not learned: $ps")
    // coverage: every single char of the corpus survives pruning
    assert(Set("x", "y", "z", "q").subsetOf(ps), ps.toString)
  }

  test("encode round-trips text through the trained vocab") {
    val docs = Seq((1L, "the rain in spain"), (2L, "entangle the ending"))
      .toDF("doc_id", "text")
    val out = Unigram.encode(docs, "doc_id", "text", vocab)
      .as[(Long, Array[String])].collect().toMap
    assert(out(1L).mkString("") == "theraininspain")
    assert(out(2L).mkString("") == "entangletheending")
    // "the" is a vocab trigram: must be kept whole wherever a word
    // equals it exactly
    assert(out(1L).take(1).toSeq == Seq("the"))
  }

  test("save/load round-trips a vocabulary exactly") {
    val dir = java.nio.file.Files.createTempDirectory("uvocab")
      .resolve("v").toString
    Unigram.save(vocab, spark, dir)
    val back = Unigram.load(spark, dir)
    assert(back.toSeq == vocab.sortBy(_.piece).toSeq)
    // loaded vocab segments identically
    val w = "entanglement"
    val (p1, s1) = Unigram.segment(w,
      back.map(p => p.piece -> p.score).toMap, 3, unk)
    val (p2, s2) = Unigram.segment(w, vmap, maxLen, unk)
    assert(p1.toSeq == p2.toSeq && s1 == s2)
  }

  test("pieceCounts weights by word frequency with exact integer counts") {
    val words = Seq(("the", 10L), ("then", 3L)).toDF("word", "freq")
    val counts = Unigram.pieceCounts(words, vocab)
      .as[(String, Long)].collect().toMap
    // "the" → [the] ×10; "then" → [th, en] ×3 (-11M−11M = -22M beats
    // the+n at -9M−14M = -23M — longer is not always better)
    assert(counts("the") == 10L, counts.toString)
    assert(counts("th") == 3L && counts("en") == 3L, counts.toString)
    assert(!counts.contains("n"), counts.toString)
  }

  test("load refuses a corpus-sized table under the driver-collect budget") {
    val dir = java.nio.file.Files.createTempDirectory("uvbig")
      .resolve("v").toString
    (0 until 64).map(i => (s"p$i", -1000000L - i))
      .toDF("piece", "score").write.parquet(dir)
    spark.conf.set(graft.index.Batches.MaxBatchKey, "16")
    try {
      val e = intercept[IllegalArgumentException](Unigram.load(spark, dir))
      assert(e.getMessage.contains("Unigram.save"), e.getMessage)
    } finally spark.conf.unset(graft.index.Batches.MaxBatchKey)
    assert(Unigram.load(spark, dir).length == 64)
  }
}
