package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Maximum-inner-product search at scale via the norm-augmentation
  * reduction (Bachrach et al., RecSys'14 — the "XBOX" transform):
  *
  *   aug(x) = [x, √(M² − ‖x‖²)]   for corpus rows, M = max ‖x‖
  *   aug(q) = [q, 0]              for queries
  *
  * gives ‖aug(q) − aug(x)‖² = ‖q‖² + M² − 2·(q·x), which is monotone
  * DECREASING in the inner product — so squared-L2 top-k on the
  * augmented vectors IS inner-product top-k on the originals. Exact in
  * real arithmetic for any k; in float storage the augmented
  * coordinate √(M²−‖x‖²) rounds to f32 like every other element, so
  * two corpus rows whose inner products differ by less than ~1e-7·M²
  * can swap ranks at the tie boundary (the oracle gate holds because
  * the test corpus has no such near-ties at the k boundary). That
  * turns every L2 index in this engine (IVFFlat, LSH,
  * PQ, IVF-PQ) into a MIPS index with zero new search machinery: augment
  * once at build time (one narrow map + one tiny max-norm agg), search
  * augmented queries, report dot products.
  *
  * [[Exhaustive.distance]]'s "negdot" metric is the brute-force face of
  * the same problem; this is its 100 TB path.
  */
object Mips {

  /** Max corpus norm M — the one driver-side scalar the transform needs
    * (an agg over a codegen'd dot, never a collect of vectors). A small
    * slack multiplier keeps the sqrt argument non-negative under float
    * rounding when the max is attained. */
  def maxNorm(emb: DataFrame, vecCol: String): Double = {
    val row = emb.agg(max(sqrt(VectorOps.dot(col(vecCol), col(vecCol))))).head()
    require(!row.isNullAt(0),
      "Mips.maxNorm: empty corpus — max norm is undefined")
    row.getDouble(0) * (1.0 + 1e-7)
  }

  /** Corpus side: append √(M² − ‖x‖²) as one extra float element.
    * Narrow map — no shuffle, composes with any index build. */
  def augmentCorpus(emb: DataFrame, vecCol: String, m: Double): DataFrame = {
    val nrm2 = VectorOps.dot(col(vecCol), col(vecCol))
    emb.withColumn(vecCol,
      concat(col(vecCol).cast("array<float>"),
        array(sqrt(greatest(lit(m * m) - nrm2, lit(0.0d))).cast("float"))))
  }

  /** Query side: append a literal zero element. */
  def augmentQueries(queries: DataFrame, vecCol: String): DataFrame =
    queries.withColumn(vecCol,
      concat(col(vecCol).cast("array<float>"), array(lit(0f))))

  /** Recompute the reported distance as −(q·x) over ORIGINAL vectors
    * for an augmented-index result (qid, id, …): the augmented sqdist
    * rank is the MIPS rank, but callers want the inner product. One
    * broadcast-probe join against the query frame, the corpus join is
    * an id equi-join. */
  def withDotDistance(result: DataFrame,
                      queries: DataFrame, qIdCol: String, qVecCol: String,
                      corpus: DataFrame, cIdCol: String, cVecCol: String)
  : DataFrame = {
    val q = queries.select(col(qIdCol).cast("long").as("qid"),
      col(qVecCol).cast("array<float>").as("_qv"))
    val c = corpus.select(col(cIdCol).cast("long").as("id"),
      col(cVecCol).cast("array<float>").as("_cv"))
    result.select(col("qid"), col("id"))
      .join(broadcast(q), "qid")
      .join(c, "id")
      .select(col("qid"), col("id"),
        (lit(0.0d) - VectorOps.dot(col("_cv"), col("_qv"))).as("distance"))
  }
}
