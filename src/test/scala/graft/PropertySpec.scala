package graft

import org.apache.spark.sql.functions._

import graft.operators.{Splits, TextOps}

/** Property-style gates for the algebraic contracts the oracle queries
  * rely on but only sample: idempotence, partition/bounds invariants,
  * totality. Inputs are seeded-generated (adversarial fragments mixed
  * with random words) and run through the SAME Column pipelines the
  * queries use — one DataFrame per property, not per case. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val fragments = Vector(
    "The!", "a,b", "  ", "UPPER", "müß€", "x", "...", "9lives",
    "tab\there", "MiXeD", "end.", "", "çava", "A-B_C")

  /** 200 seeded texts: 0–40 draws from fragments ∪ random words. */
  private def genTexts(seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until 200).map { _ =>
      val n = rnd.nextInt(41)
      Seq.fill(n) {
        if (rnd.nextBoolean()) fragments(rnd.nextInt(fragments.length))
        else rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString
      }.mkString(" ")
    }
  }

  private def viaColumn(texts: Seq[String],
                        c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), c(col("text")).as("out"))
      .orderBy("id").collect().map(_.getString(1)).toSeq

  test("normalizeText is idempotent; output alphabet is exactly [a-z0-9 ]") {
    val texts = genTexts(7L)
    val once = viaColumn(texts, TextOps.normalizeText)
    val twice = viaColumn(once, TextOps.normalizeText)
    assert(twice == once, "normalization must be its own fixed point")
    once.foreach { s =>
      assert(s == s.trim && !s.contains("  "), s"'$s'")
      assert(s.forall(ch =>
        (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9') || ch == ' '),
        s"'$s' leaked a character outside the digest-key alphabet")
    }
  }

  test("chunkTokens at stride == size partitions the token stream exactly") {
    val rows = genTexts(11L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextOps.chunkTokens(col("text"), 5, 5).as("ch"),
        TextOps.tokens(col("text")).as("toks"))
      .collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val toks = r.getAs[scala.collection.Seq[String]]("toks").toSeq
      val rejoined = r.getAs[scala.collection.Seq[String]]("ch")
        .filter(_.nonEmpty).toSeq.flatMap(_.split(" ").toSeq)
      assert(rejoined == toks, s"partition property broke on $toks")
    }
  }

  test("split fractions live in [0,1); assignment is total and matches the cuts") {
    val rnd = new scala.util.Random(13L)
    val ids = Seq.fill(500)(math.abs(rnd.nextLong()) / 2).distinct
    val rows = Splits.assign(ids.toDF("doc_id"), "doc_id")
      .select(col("doc_id"), col("split"),
        Splits.hashFrac(col("doc_id")).as("f"))
      .collect()
    assert(rows.length == ids.length)
    rows.foreach { r =>
      val f = r.getDouble(2)
      assert(f >= 0.0 && f < 1.0, s"frac $f out of range for id ${r.getLong(0)}")
      val expect = if (f < 0.8) "train" else if (f < 0.9) "val" else "test"
      assert(r.getString(1) == expect)
    }
  }
}
