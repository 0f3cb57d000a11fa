package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, the SentencePiece `unigram` model)
  * — the second of the two standard subword-tokenizer families, next
  * to [[Bpe]]: instead of a greedy merge chain, a VOCABULARY of scored
  * pieces segments each word by maximum total score (Viterbi), and
  * training alternates segmentation with re-estimation (EM).
  *
  * Deviations from the paper, chosen for engine determinism and
  * documented here: (1) hard-EM (Viterbi counts) instead of
  * forward–backward expected counts — counts stay exact integers, so
  * the E-step is bit-deterministic under any partitioning; (2) pruning
  * keeps the top-`vocabSize` pieces by (count DESC, piece ASC) rather
  * than by loss-if-removed — a total order with no float compare.
  *
  * Piece scores are integer MICRO-LOG-PROBS (`round(1e6·ln p)` via
  * StrictMath — reproducible across JVMs), so segmentation everywhere
  * is exact integer arithmetic: the same Viterbi that serves a trained
  * model is SQL-replayable with pinned scores (the `unigram_tokenize`
  * oracle enumerates ALL segmentations in a recursive CTE and picks
  * the same argmax). Tie-break chain: max score, then fewest pieces,
  * then lexicographically smallest space-joined path — at a fixed
  * prefix position candidates have equal char mass and piece count, so
  * their rendered strings have equal length and prefix-wise lexical
  * choice is globally optimal.
  *
  * Scale shape (same contract as [[Bpe]]): the corpus is touched once
  * for the word-frequency table (Zipf-bounded, `maxWords`-capped);
  * seeding is one aggregation over that table's substrings; every EM
  * iteration is a `mapPartitions` Viterbi pass over the word table
  * with the piece table broadcast (piece tables are KBs–MBs), partial
  * integer counts merged driver-side. Encoding is a narrow map.
  */
object Unigram {

  /** `score` in micro-log-prob units (negative; higher = likelier). */
  case class Piece(piece: String, score: Long)

  /** Viterbi-segment one word. Pieces longer than `maxLen` are never
    * probed (pass the vocab's max piece length). Characters absent
    * from the vocab fall back to `unkScore` singles, so segmentation
    * totals stay comparable and no input fails. Returns the best
    * (pieces, totalScore) under the tie-break contract above. */
  def segment(word: String, vocab: collection.Map[String, Long], maxLen: Int,
              unkScore: Long): (Array[String], Long) = {
    val n = word.length
    if (n == 0) return (Array.empty, 0L)
    // best(i): score, npieces, path to prefix [0, i)
    val score = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val path = new Array[String](n + 1)
    val reach = new Array[Boolean](n + 1)
    score(0) = 0L; np(0) = 0; path(0) = ""; reach(0) = true
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - maxLen)
      while (start < end) {
        if (reach(start)) {
          val piece = word.substring(start, end)
          val sc = vocab.get(piece) match {
            case Some(s) => Some(s)
            case None if end - start == 1 => Some(unkScore)
            case None => None
          }
          sc.foreach { s =>
            val cScore = score(start) + s
            val cNp = np(start) + 1
            val cPath = if (np(start) == 0) piece else path(start) + " " + piece
            val better = !reach(end) || cScore > score(end) ||
              (cScore == score(end) && (cNp < np(end) ||
                (cNp == np(end) && cPath < path(end))))
            if (better) {
              score(end) = cScore; np(end) = cNp; path(end) = cPath
              reach(end) = true
            }
          }
        }
        start += 1
      }
      end += 1
    }
    (path(n).split(" "), score(n))
  }

  private def microLog(num: Long, den: Long): Long =
    math.round(1e6 * StrictMath.log(num.toDouble / den.toDouble))

  /** The E-step as a frame: Viterbi-segment each (word, freq) row
    * under `pieces` and count piece usage weighted by freq. One
    * mapPartitions pass + one small aggregation — the word table is
    * the bounded unit of work, never the corpus. */
  def pieceCounts(words: DataFrame, pieces: Array[Piece]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieces)
    words.as[(String, Long)].mapPartitions { it =>
      val ps = bc.value
      val vocab = ps.map(p => p.piece -> p.score).toMap
      val maxLen = if (ps.isEmpty) 1 else ps.map(_.piece.length).max
      val unk = (if (ps.isEmpty) 0L else ps.map(_.score).min) - 1000000L
      val acc = mutable.HashMap.empty[String, Long]
      it.foreach { case (w, f) =>
        segment(w, vocab, maxLen, unk)._1.foreach { p =>
          acc.update(p, acc.getOrElse(p, 0L) + f)
        }
      }
      acc.iterator
    }.toDF("piece", "n").groupBy("piece").agg(sum("n").as("n"))
  }

  /** Seed vocabulary: every substring of length ≤ `maxPieceLen` of the
    * capped word table, occurrence-weighted by word freq, top
    * `seedSize` by (freq DESC, piece ASC) — plus ALL single characters
    * (full coverage, so no word is unsegmentable). */
  def seedPieces(words: DataFrame, maxPieceLen: Int,
                 seedSize: Int): Array[Piece] = {
    val spark = words.sparkSession
    import spark.implicits._
    val subs = words.as[(String, Long)].flatMap { case (w, f) =>
      for {
        i <- 0 until w.length
        j <- (i + 1) to math.min(w.length, i + maxPieceLen)
      } yield (w.substring(i, j), f)
    }.toDF("piece", "freq").groupBy("piece").agg(sum("freq").as("freq"))
    val top = subs.orderBy(col("freq").desc, col("piece")).limit(seedSize)
    val chars = subs.filter(length(col("piece")) === 1)
    val seed = top.unionByName(chars).groupBy("piece")
      .agg(max("freq").as("freq"))
      .as[(String, Long)].collect()
    val total = seed.map(_._2).sum
    seed.sortBy(_._1)
      .map { case (p, f) => Piece(p, microLog(f, math.max(total, 1L))) }
  }

  /** Train a unigram vocabulary: seed → `emIters` × (Viterbi E-step,
    * integer-count M-step) → prune to `vocabSize` by (count DESC,
    * piece ASC), single characters always retained (coverage). Pieces
    * the final E-step never used are pruned first by the same order.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            emIters: Int = 4, maxPieceLen: Int = 6, seedSize: Int = 20000,
            maxWords: Int = 100000): Array[Piece] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Bpe.wordCounts(docs, textCol, maxWords)
      .as[(String, Long)].localCheckpoint(true).toDF("word", "freq")
    var pieces = seedPieces(words, maxPieceLen, seedSize)
    var iter = 0
    while (iter < emIters) {
      val counts = pieceCounts(words, pieces).as[(String, Long)].collect()
        .toMap
      val total = math.max(counts.valuesIterator.sum, 1L)
      // re-score used pieces; unused non-char pieces drop out; chars
      // survive with +1 smoothing (coverage floor)
      pieces = pieces.flatMap { p =>
        val c = counts.getOrElse(p.piece, 0L)
        if (c > 0) Some(Piece(p.piece, microLog(c, total)))
        else if (p.piece.length == 1) Some(Piece(p.piece, microLog(1L, total)))
        else None
      }.sortBy(_.piece)
      iter += 1
    }
    val lastCounts = pieceCounts(words, pieces).as[(String, Long)].collect()
      .toMap
    val keep = pieces
      .map(p => (p, lastCounts.getOrElse(p.piece, 0L)))
      .sortBy { case (p, c) => (-c, p.piece) }
      .zipWithIndex
      .filter { case ((p, _), rank) => rank < vocabSize || p.piece.length == 1 }
      .map(_._1._1)
    keep.sortBy(_.piece)
  }

  /** Persist a trained vocabulary as parquet — the tokenizer's
    * lifecycle contract, same as the index tiers' save/load: train
    * once (expensive corpus pass), serve everywhere. Pieces round-trip
    * exactly ((String, Long) columns), so load(save(v)) tokenizes
    * bit-identically (gated by the unigram_persist lane). */
  def save(pieces: Array[Piece], spark: org.apache.spark.sql.SparkSession,
           dir: String): Unit = {
    import spark.implicits._
    pieces.toSeq.toDF("piece", "score").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a persisted vocabulary, (piece ASC)-ordered — the same
    * canonical order [[train]] returns. Budget-capped collect
    * ([[graft.index.Batches]]): vocabularies are ≤ vocabSize rows by
    * contract, so a mis-pointed/corrupt path fails fast instead of
    * collecting unbounded rows driver-side. */
  def load(spark: org.apache.spark.sql.SparkSession,
           dir: String): Array[Piece] = {
    import spark.implicits._
    graft.index.Batches.bounded(
        spark.read.parquet(dir).select("piece", "score").as[(String, Long)],
        s"Unigram.load vocabulary at $dir",
        "A unigram vocabulary is vocabSize rows — check the path points " +
          "at a table written by Unigram.save, not at a corpus.")
      .sortBy(_._1).map { case (p, s) => Piece(p, s) }
  }

  /** Per-doc subword count under a trained/pinned vocabulary:
    * (id, n_subwords) — the TOKEN-BUDGET counter for packing/mixing
    * ([[Splits.packSubwords]], [[Splits.mixByTemperatureWeighted]]):
    * training budgets are denominated in the tokenizer's subwords, so
    * the pack/mix stage must count those, not whitespace tokens. Same
    * narrow broadcast-vocab map as [[encode]], count kept instead of
    * the array (no array bytes ever shuffle). */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String,
                    pieces: Array[Piece]): DataFrame =
    encode(docs, idCol, textCol, pieces)
      .select(col("id"), size(col("subwords")).cast("long").as("n_subwords"))

  /** Tokenize with a trained/pinned vocabulary: (id, subwords). One
    * narrow map, vocab broadcast — embarrassingly parallel. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             pieces: Array[Piece]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieces)
    docs.select(col(idCol).cast("long").as("id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .as[(Long, Array[String])]
      .mapPartitions { it =>
        val ps = bc.value
        val vocab = ps.map(p => p.piece -> p.score).toMap
        val maxLen = if (ps.isEmpty) 1 else ps.map(_.piece.length).max
        val unk = (if (ps.isEmpty) 0L else ps.map(_.score).min) - 1000000L
        it.map { case (id, toks) =>
          (id, toks.flatMap(w => segment(w, vocab, maxLen, unk)._1))
        }
      }
      .toDF("id", "subwords")
  }
}
