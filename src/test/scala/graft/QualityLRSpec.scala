package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityLR, TextOps}

class QualityLRSpec extends SparkSpec {
  import spark.implicits._

  /** Planted corpus: label 1 = natural-looking docs (stopword-bearing
    * prose-soup), label 0 = degenerate (numeric soup / single-char
    * repeats) — the separation a quality classifier must learn. */
  private def planted = {
    val good = (0 until 120).map { i =>
      val filler = (0 until 60).map(j => s"word${(i * 61 + j * 7) % 500}")
      (1000L + i, (filler ++ Seq("the", "and", "of", "a", "is")).mkString(" "), 1.0)
    }
    val badNum = (0 until 60).map { i =>
      (2000L + i, (0 until 60).map(j => ((i + j) % 97).toString).mkString(" "), 0.0)
    }
    val badShort = (0 until 60).map { i =>
      (3000L + i, Seq.fill(8)("x").mkString(" "), 0.0)
    }
    (good ++ badNum ++ badShort).toDF("id", "text", "label")
  }

  test("train separates planted good/bad corpora at >= 0.95 accuracy") {
    val docs = planted.cache()
    val w = QualityLR.train(docs, "text", "label")
    assert(w.length == QualityLR.NumFeatures)
    val scored = docs
      .select($"label", TextOps.tokens($"text").as("toks"))
      .select($"label",
        QualityLR.keep($"toks", w.toSeq).cast("double").as("pred"))
    val acc = scored.select(avg(when($"label" === $"pred", 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("serving logit is a deterministic pure map: stable under repartition") {
    val w = Seq(-2.0, 1.5, 0.5, 1.0, 2.0)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def logits(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id", QualityLR.logit($"toks", w).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(logits(docs) == logits(docs.repartition(13)))
    // and the plan is UDF-free (codegen serving path)
    val plan = docs
      .select(TextOps.tokens($"text").as("toks"))
      .select(QualityLR.logit($"toks", w))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
