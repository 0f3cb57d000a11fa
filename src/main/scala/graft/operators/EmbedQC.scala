package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column quality control (beyond the reference surface):
  * flag vectors that sit anomalously far from their assigned cluster
  * centroid — the standard screen for garbled embeddings (truncated
  * inputs, encoder failures, wrong-model rows) before they poison an
  * index build or a semantic-dedup pass.
  *
  * The statistic is per-cluster: distance distributions differ
  * radically between clusters (a tight product-title cluster vs a
  * diffuse long-tail one), so a global threshold either misses or
  * floods. The rule is the usual mean + k·sigma cut, computed in
  * EXACT INTEGER arithmetic over quantized distances so the flags are
  * bit-deterministic under any partitioning and engine-replayable:
  *
  *   q        = floor(d²·scale + 0.5)          (µ-unit squared distance)
  *   outlier  ⇔ n·q − Σq > 0  ∧  (n·q − Σq)² > k²·(n·Σq² − (Σq)²)
  *
  * — the k-sigma inequality multiplied through by n², so no division
  * and no float compare ever happens. The products are formed in
  * DECIMAL(38,0), never BIGINT (the r8 ADVICE class: a long product
  * wraps silently under non-ANSI Spark while the DuckDB oracle widens
  * to HUGEINT — the engines would diverge exactly in the overflow
  * regime). Exactness bound: both sides stay under 10³⁸ iff
  * k·n·max(q) < 10¹⁹ per cluster, enforced LOUDLY — a per-row
  * raise_error fires when a cluster's k·n·max(q) exceeds the bound
  * (lower `scale` for clusters that trip it).
  *
  * Scale shape: one narrow assignment pass (centroids broadcast, the
  * [[graft.index.IVFFlat.assign]] loop with the distance kept), one
  * tiny per-cluster aggregate joined back by broadcast. The corpus
  * shuffles only for the per-cluster aggregate's partial rows.
  */
object EmbedQC {

  def outliers(emb: DataFrame, idCol: String, vecCol: String,
               centroids: Array[Array[Float]], kSigma: Int = 2,
               scale: Double = 1e6): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    require(kSigma >= 1, "kSigma must be at least 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = emb
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vector"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cents = bc.value
        it.map { case (id, v) =>
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < cents.length) {
            val cent = cents(c)
            var d = 0.0; var j = 0
            while (j < cent.length && j < v.length) {
              val t = cent(j).toDouble - v(j).toDouble
              d += t * t; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          (id, best, math.floor(bestD * scale + 0.5).toLong)
        }
      }
      .toDF("id", "cluster", "q_dist")
    // DECIMAL(38,0) lanes: q ≤ mx, so |n·q − s| ≤ n·mx and
    // n·ss − s² ≤ (n·mx)² — with k·n·mx < 10¹⁹ every product below
    // fits 38 digits exactly. Sums widen to decimal too (Σq² over a
    // huge cluster can itself pass 2⁶³).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val stats = assigned.groupBy("cluster")
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("q_dist").cast(dec)).as("__s"),
        sum(col("q_dist").cast(dec) * col("q_dist").cast(dec)).as("__ss"),
        max("q_dist").cast(dec).as("__mx"))
    val guard = when(
      lit(kSigma.toLong).cast(dec) * col("__n") * col("__mx") >=
        lit(BigDecimal(10).pow(19)).cast(dec),
      raise_error(concat(lit("EmbedQC.outliers: cluster "),
        col("cluster").cast("string"),
        lit(" exceeds the exact-arithmetic bound k·n·max(q) < 1e19 — "),
        lit("lower `scale`"))).cast(dec))
    val q = col("q_dist").cast(dec)
    val lhs = coalesce(guard, col("__n") * q - col("__s"))
    val rhs = lit(kSigma.toLong * kSigma).cast(dec) *
      (col("__n") * col("__ss") - col("__s") * col("__s"))
    assigned.join(broadcast(stats), Seq("cluster"))
      .withColumn("is_outlier", lhs > lit(0).cast(dec) && lhs * lhs > rhs)
      .select(col("id"), col("cluster"), col("q_dist"), col("is_outlier"))
  }
}
