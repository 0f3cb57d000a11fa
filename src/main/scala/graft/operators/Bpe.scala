package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding trainer + encoder — the real merge-loop face of
  * tokenizer training (Sennrich et al. 2016; the reference has no text
  * surface at all, SURVEY §2.9 — this is north-star pipeline capability;
  * [[TextOps.bpeishCount]] remains as the train-free token-count
  * estimator).
  *
  * Scale shape: the corpus is touched ONCE — a word-frequency aggregation
  * (one shuffle whose key is the word; Zipf bounds the distinct-word
  * table, and `maxWords` caps it deterministically). Every merge
  * iteration then runs over the word table only: a `mapPartitions`
  * pair-count (per-partition HashMap partials, O(words × len) work, the
  * collect moves O(distinct pairs) rows) merged driver-side into one best
  * pair, then a narrow map applies the merge. 100 TB of text trains at
  * the cost of one corpus pass plus numMerges passes over a ≤maxWords
  * table.
  *
  * Determinism contract (the oracle's replay hinges on it):
  *  - the word cap orders by (freq DESC, word ASC) — a total order;
  *  - the best pair each step is (count DESC, left ASC, right ASC);
  *  - a merge applies greedily LEFT-TO-RIGHT, non-overlapping, once per
  *    step ("aaa" under (a,a) → ["aa","a"]) — exactly the semantics of
  *    a left-to-right string replace on the spaced-symbol rendering,
  *    which is how the DuckDB oracle replays the whole loop.
  */
object Bpe {

  case class Merge(step: Int, left: String, right: String, freq: Long)

  /** One merge, greedy left-to-right, non-overlapping. */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Segment one word: start from characters, apply the merge table in
    * training order (one greedy pass per merge — the same contract the
    * trainer's update step and the oracle's replace chain use). */
  def applyMerges(word: String, merges: Array[(String, String)]): Array[String] = {
    var syms = Array.tabulate(word.length)(i => word.substring(i, i + 1))
    var m = 0
    while (m < merges.length) {
      syms = applyMerge(syms, merges(m)._1, merges(m)._2)
      m += 1
    }
    syms
  }

  /** Deterministically capped word-frequency table — the ONE corpus
    * pass. (freq DESC, word ASC) totally orders the cut. */
  def wordCounts(docs: DataFrame, textCol: String, maxWords: Int): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(maxWords)

  /** Train `numMerges` merges. Stops early if no pair remains (every
    * word fully merged). Returns the merge table in training order with
    * each step's winning pair count. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 100000): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // checkpoint: iterations must re-scan the word table, not the corpus
    var words: Dataset[(Array[String], Long)] =
      wordCounts(docs, textCol, maxWords).as[(String, Long)]
        .map { case (w, f) =>
          (Array.tabulate(w.length)(i => w.substring(i, i + 1)), f)
        }
        .localCheckpoint(true)
    var since = 0
    val merges = mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val partials = words.mapPartitions { it =>
        val m = mutable.HashMap.empty[(String, String), Long]
        it.foreach { case (syms, f) =>
          var j = 0
          while (j < syms.length - 1) {
            val k = (syms(j), syms(j + 1))
            m.update(k, m.getOrElse(k, 0L) + f)
            j += 1
          }
        }
        m.iterator.map { case ((a, b), c) => (a, b, c) }
      }.collect()
      if (partials.isEmpty) exhausted = true
      else {
        val agg = mutable.HashMap.empty[(String, String), Long]
        partials.foreach { case (a, b, c) =>
          agg.update((a, b), agg.getOrElse((a, b), 0L) + c)
        }
        val ((l, r), c) = agg.minBy { case ((a, b), n) => (-n, a, b) }
        merges += Merge(step, l, r, c)
        val (nw, n) = graft.index.Lineage.compact(
          words.map { case (syms, f) => (applyMerge(syms, l, r), f) }, since)
        words = nw; since = n
      }
      step += 1
    }
    merges.toSeq
  }

  /** Persist a trained merge table as parquet — the tokenizer's
    * lifecycle contract (train once, serve everywhere). Step order is
    * the semantics (merges apply in training order), so save keeps the
    * step column and load re-sorts by it; the round-trip encodes
    * bit-identically (gated by the bpe_persist lane). */
  def save(merges: Seq[Merge], spark: org.apache.spark.sql.SparkSession,
           dir: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.step, m.left, m.right, m.freq))
      .toDF("step", "lhs", "rhs", "freq").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a persisted merge table in training (step) order. The
    * collect is budget-capped ([[graft.index.Batches]]): merge tables
    * are KBs by contract, so a corpus-sized parquet at `dir` is a
    * mis-pointed path and fails fast instead of OOMing the driver. */
  def load(spark: org.apache.spark.sql.SparkSession,
           dir: String): Seq[Merge] = {
    import spark.implicits._
    graft.index.Batches.bounded(
        spark.read.parquet(dir).select("step", "lhs", "rhs", "freq")
          .as[(Int, String, String, Long)],
        s"Bpe.load merge table at $dir",
        "A BPE merge table is numMerges rows — check the path points at " +
          "a table written by Bpe.save, not at a corpus.")
      .sortBy(_._1).map { case (st, l, r, f) => Merge(st, l, r, f) }.toSeq
  }

  /** Per-doc subword count under a trained merge table: (id,
    * n_subwords) — the BPE token-budget counter for
    * [[Splits.packSubwordsBpe]]/[[Splits.mixByTemperatureWeighted]]
    * (see [[Unigram.subwordCounts]] for why budgets count subwords). */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame =
    encode(docs, idCol, textCol, merges)
      .select(col("id"), size(col("subwords")).cast("long").as("n_subwords"))

  /** Tokenize with a trained merge table: (id, subwords ARRAY<STRING>).
    * One narrow map — encoding is embarrassingly parallel at any scale
    * (the merge table broadcasts; typical tables are KBs). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs.select(col(idCol).cast("long").as("id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .as[(Long, Array[String])]
      .map { case (id, toks) =>
        val ms = bc.value
        (id, toks.flatMap(w => applyMerges(w, ms)))
      }
      .toDF("id", "subwords")
  }
}
