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
}
