package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

class GopherSpec extends SparkSpec {
  import spark.implicits._

  private def metricsOf(text: String) = {
    val d = Seq(text).toDF("text")
      .select(TextOps.tokens($"text").as("toks"))
    val (n, ml, fa, st) = TextOps.gopherMetrics($"toks")
    d.select(n, ml, fa, st, TextOps.gopherKeep($"toks")).head()
  }

  test("metrics: counts, mean length, alpha fraction, stop hits") {
    val r = metricsOf("the cat sat on a 123 mat")
    assert(r.getLong(0) == 7L)
    // lens 3+3+3+2+1+3+3 = 18 / 7
    assert(math.abs(r.getDouble(1) - 18.0 / 7) < 1e-12)
    // "123" has no alphabetic char
    assert(math.abs(r.getDouble(2) - 6.0 / 7) < 1e-12)
    assert(r.getLong(3) >= 2L) // the, on, a ...
  }

  test("keep rule: each gate rejects independently") {
    // too short (< 50 words)
    assert(!metricsOf("the a short doc").getBoolean(4))
    val base = Seq.fill(60)("word").mkString(" ")
    // 60 plain words but zero stopword evidence
    assert(!metricsOf(base).getBoolean(4))
    // stopword evidence + length passes
    assert(metricsOf(base + " the and of par").getBoolean(4))
    // degenerate mean word length (all 1-char tokens) fails the [3,10] gate
    assert(!metricsOf(Seq.fill(60)("a b").mkString(" ")).getBoolean(4))
    // numeric-soup fails the alphabetic-fraction gate
    val numeric = (1 to 60).map(_.toString).mkString(" ") + " the and of words here"
    assert(!metricsOf(numeric).getBoolean(4))
    // empty doc: all zero metrics, rejected
    val e = metricsOf("")
    assert(e.getLong(0) == 0L && e.getDouble(1) == 0.0 && !e.getBoolean(4))
  }
}
