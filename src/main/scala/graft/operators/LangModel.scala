package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring (beyond the reference
  * surface — the CCNet-style "does this read like the corpus" quality
  * signal: score each document by the average probability its own
  * corpus's bigram statistics assign to its word transitions; degenerate
  * or machine-generated text scores low against in-domain statistics).
  *
  * Probability model: add-one-smoothed bigram likelihood
  * `p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)` with V = distinct-unigram
  * vocabulary size. Scores stay in PROBABILITY space quantized to 1e-9
  * fixed-point BIGINTs before summation — no libm (`ln`/`pow`) in the
  * scored output, so per-doc sums are exact, order-independent, and
  * engine-portable (the repo's hash-portability contract; a log-space
  * score would ride on `ln`'s 1-ulp engine variance for every bigram).
  *
  * Scale shape: token explode → two equi-joins against the count
  * tables → per-doc sum. The bigram/unigram count tables are
  * Zipf-distributed corpus statistics — orders of magnitude smaller
  * than the corpus occurrence stream they aggregate; both joins key on
  * the gram hash, so shuffles are posting-list-sized, and the final
  * per-doc aggregate exchanges two counters per doc. Training and
  * scoring are one pass each over the corpus; nothing collects to the
  * driver.
  */
object LangModel {

  /** Fixed-point scale for quantized probabilities: 1e-9 resolution
    * holds ~9 significant digits of a [0,1] probability in a BIGINT —
    * one double multiply + floor, bit-identical on both engines.
    */
  val ProbScale = 1000000000L

  /** Per-document bigram occurrence stream: (id, w1, w2), one row per
    * adjacent token pair, duplicates kept (scoring weights repeated
    * transitions). Two-step select keeps the transform lambda on a
    * bound attribute (round-7 HOF discipline).
    */
  private[graft] def bigrams(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame =
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => struct(element_at(col("toks"), i + 1).as("w1"),
              element_at(col("toks"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
          .as("bgs"))
      .select(col(idCol), explode_outer(col("bgs")).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Train the model on a corpus: returns (unigramCounts(w1, c1),
    * bigramCounts(w1, w2, c2), vocabSize). Unigram counts are COUNTS
    * OF BIGRAM LEFT CONTEXTS (c(w1·) = Σ_w2 c(w1,w2)), the classical
    * conditional-probability denominator, so probabilities normalize:
    * Σ_w2 p(w2|w1) = 1 exactly.
    */
  def train(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, Long) = {
    val bg = bigrams(docs, idCol, textCol).filter(col("w1").isNotNull)
    val big = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val uni = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    (uni, big, vocab)
  }

  /** Score each document against trained counts: `n_bigrams` and
    * `score_q` = Σ floor(p(w2|w1)·1e9 + 0.5) over its transitions
    * (quantized-mean probability = score_q / n_bigrams / 1e9).
    * Documents with no bigram (≤1 token) report 0/0.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            uni: DataFrame, big: DataFrame, vocab: Long): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val pQ = floor(
      ((coalesce(col("c2"), lit(0L)).cast("double") + lit(1.0)) /
        (coalesce(col("c1"), lit(0L)).cast("double") + lit(vocab.toDouble)))
        * lit(ProbScale.toDouble) + lit(0.5)).cast("long")
    bg
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .select(col(idCol), when(col("w1").isNotNull, pQ).as("p_q"))
      .groupBy(col(idCol))
      .agg(count(col("p_q")).as("n_bigrams"),
        coalesce(sum(col("p_q")), lit(0L)).as("score_q"))
  }

  /** Train-on-self convenience: the in-domain quality signal. */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (uni, big, v) = train(docs, idCol, textCol)
    score(docs, idCol, textCol, uni, big, v)
  }
}
