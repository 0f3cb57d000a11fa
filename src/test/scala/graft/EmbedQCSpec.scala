package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbedQC

class EmbedQCSpec extends SparkSpec {
  import spark.implicits._

  // two tight synthetic clusters around orthogonal unit centroids,
  // plus one planted far-away point per cluster
  private def vec(base: Int, i: Int, far: Boolean): Array[Float] = {
    val v = new Array[Float](8)
    v(base) = 1.0f
    // small deterministic jitter on one off-axis dim
    v((base + 2) % 8) = 0.01f * (i % 5)
    if (far) v((base + 4) % 8) = 3.0f
    v
  }

  private lazy val emb = (0 until 60).map { i =>
    val cluster = i % 2
    val far = i == 10 || i == 21 // one outlier per cluster
    (i.toLong, vec(cluster, i, far))
  }.toDF("vec_id", "embedding").cache()

  private val centroids: Array[Array[Float]] = Array(
    Array.tabulate(8)(j => if (j == 0) 1.0f else 0.0f),
    Array.tabulate(8)(j => if (j == 1) 1.0f else 0.0f))

  test("flags exactly the planted far points, per cluster") {
    val out = EmbedQC.outliers(emb, "vec_id", "embedding", centroids,
        kSigma = 2)
      .select($"id", $"cluster", $"is_outlier")
      .as[(Long, Int, Boolean)].collect()
    val flagged = out.filter(_._3).map(_._1).toSet
    assert(flagged == Set(10L, 21L), out.filter(_._3).mkString(","))
    // assignment itself is sane: even ids → cluster 0, odd → 1
    out.foreach { case (id, c, _) => assert(c == (id % 2).toInt) }
  }

  test("flags are partition-deterministic (exact integer statistics)") {
    val a = EmbedQC.outliers(emb, "vec_id", "embedding", centroids)
      .select($"id", $"q_dist", $"is_outlier")
      .as[(Long, Long, Boolean)].collect().toSet
    val b = EmbedQC.outliers(emb.repartition(7), "vec_id", "embedding",
        centroids)
      .select($"id", $"q_dist", $"is_outlier")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(a == b)
  }

  test("a uniform cluster flags nothing") {
    val flat = (0 until 30)
      .map(i => (i.toLong, vec(0, 0, far = false)))
      .toDF("vec_id", "embedding")
    val n = EmbedQC.outliers(flat, "vec_id", "embedding", centroids)
      .filter($"is_outlier").count()
    assert(n == 0) // zero variance ⇒ lhs = 0 for every row, never > 0
  }

  test("flags stay exact in the former BIGINT-overflow regime") {
    // distances ~100 units → q ≈ 1e10; lhs ≈ n·q ~ 1e11, lhs² ~ 1e22 —
    // far past 2⁶³ ≈ 9.2e18, where the old long products wrapped
    // silently (r8 ADVICE). DECIMAL(38,0) lanes keep it exact: the one
    // planted far point (and only it) flags.
    val big = ((0 until 20).map { i =>
      val v = new Array[Float](8); v(0) = 100.0f + 0.01f * (i % 3); v
    } :+ { val v = new Array[Float](8); v(0) = 300.0f; v })
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val zero = Array(Array.fill(8)(0.0f))
    val out = EmbedQC.outliers(big, "vec_id", "embedding", zero, kSigma = 2)
      .select($"id", $"is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(20L), "the planted 300-unit point must flag")
    assert(out.count(_._2) == 1, out.filter(_._2).toString)
  }

  test("the exact-arithmetic bound fails loudly, not silently") {
    // one point at distance 1e7 → q = 1e20·… past the k·n·max(q) < 1e19
    // bound → raise_error, never a wrong flag
    val huge = Seq(
      (0L, { val v = new Array[Float](8); v(0) = 1e7f; v }),
      (1L, { val v = new Array[Float](8); v(0) = 1.1e7f; v }))
      .toDF("vec_id", "embedding")
    val zero = Array(Array.fill(8)(0.0f))
    val e = intercept[Throwable] {
      EmbedQC.outliers(huge, "vec_id", "embedding", zero).collect()
    }
    // either failure is loud: the k·n·max(q) raise_error guard, or —
    // when even the Σq² aggregate passes 38 digits, as here — Spark's
    // own decimal-sum overflow. What must NEVER happen is the old
    // silent BIGINT wrap.
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(x => Option(x.getMessage)).toSeq
    assert(msgs.exists(m => m.contains("exact-arithmetic bound") ||
      m.contains("ARITHMETIC_OVERFLOW")), e.toString)
  }
}
