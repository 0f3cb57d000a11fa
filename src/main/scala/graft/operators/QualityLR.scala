package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier (the fastText-classifier stage of a
  * pretraining pipeline, linear-model edition): logistic regression
  * over the engine's deterministic text features, serving as a pure
  * codegen logit expression.
  *
  * Split of responsibilities:
  *  - TRAINING ([[train]]) wraps MLlib LogisticRegression — iterative
  *    L-BFGS whose treeAggregate fold order is partitioning-dependent,
  *    so the fitted weights are spec-gated (QualityLRSpec: planted
  *    good/bad corpora separate at ≥ 0.95 holdout accuracy), not
  *    oracle-hashed.
  *  - SERVING ([[logit]]) is a fixed-order multiply-add chain over
  *    [[features]] — bit-identical on both engines, so a PINNED weight
  *    vector is oracle-gated end to end (quality_lr_logit).
  *
  * Scale shape: featurize + logit are narrow codegen maps (no UDF on
  * the serving path — the MLlib vector UDF exists only inside train's
  * one-off fit); training sees one corpus pass per L-BFGS iteration.
  */
object QualityLR {

  /** Feature vector (fixed order, all ∈ [0, 1]):
    * f0 = 1 (bias), f1 = min(n_words/100, 1), f2 = mean_wlen/10 capped,
    * f3 = alphabetic-word fraction, f4 = stopword fraction capped at
    * 5× the 2% evidence floor. Over a MATERIALIZED token column (HOF
    * discipline).
    */
  val NumFeatures = 5

  def features(toks: Column): Seq[Column] = {
    val (n, meanLen, fracAlpha, stops) = TextOps.gopherMetrics(toks)
    Seq(
      lit(1.0),
      least(lit(1.0), n.cast("double") / lit(100.0)),
      least(lit(1.0), meanLen / lit(10.0)),
      fracAlpha,
      least(lit(1.0), when(n > 0,
        stops.cast("double") / n.cast("double") * lit(10.0))
        .otherwise(lit(0.0))))
  }

  /** Left-fold multiply-add logit — the association order the oracle
    * SQL mirrors exactly (`((w0·f0 + w1·f1) + …)`). */
  def logit(toks: Column, weights: Seq[Double]): Column = {
    require(weights.length == NumFeatures,
      s"expected $NumFeatures weights, got ${weights.length}")
    features(toks).zip(weights)
      .map { case (f, w) => lit(w) * f }
      .reduce(_ + _)
  }

  /** Keep decision at the 0-logit boundary (p = 0.5). */
  def keep(toks: Column, weights: Seq[Double]): Column =
    logit(toks, weights) > lit(0.0)

  /** Fit weights on labeled docs (labelCol ∈ {0.0, 1.0}). Returns
    * (bias-first) weights aligned with [[features]]. The MLlib vector
    * assembly UDF lives only here — serving never touches it.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            maxIter: Int = 50, regParam: Double = 0.01): Array[Double] = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val spark = docs.sparkSession
    import spark.implicits._
    val withToks = docs.select(col(labelCol).cast("double").as("label"),
      TextOps.tokens(col(textCol)).as("toks"))
    val fs = features(col("toks"))
    // drop the bias feature for the fit: MLlib fits its own intercept
    val data = withToks.select(col("label"),
        array(fs.tail: _*).as("f"))
      .map(r => (r.getDouble(0),
        Vectors.dense(r.getAs[scala.collection.Seq[Double]](1).toArray)))
      .toDF("label", "features")
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).fit(data)
    model.intercept +: model.coefficients.toArray
  }
}
