package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OPQ — trained orthogonal rotation for product quantization (Ge et
  * al. 2013, "Optimized Product Quantization", the non-parametric
  * alternation; public method). The data-agnostic Hadamard rotation
  * ([[graft.functions.Rotate]]) spreads energy uniformly but cannot
  * ALIGN the coordinate frame with the data: on adversarial spectra
  * (a few dominant correlated directions) the per-subspace codebooks
  * still straddle correlated dimensions and recall collapses (the 1M
  * A/B in BASELINE r8: PQ trained recall 0.130 under Hadamard). OPQ
  * learns R by alternating two exact steps:
  *
  *   1. fix R → train/encode PQ codebooks on the rotated frame Y = XR;
  *   2. fix the reconstructions Ŷ → the orthogonal R minimizing
  *      ‖XR − Ŷ‖² is the Procrustes solution R = VUᵀ from the SVD
  *      UΣVᵀ = M = Σ_rows x·ŷᵀ.
  *
  * Deployment shape (the standard one): rotation is a PREPROCESSING
  * stage — [[rotateFrame]] the corpus once, build ANY index tier over
  * the rotated frame, rotate queries with the same R. No Model type
  * changes; the rotation persists like a codebook ([[saveR]]/[[loadR]]).
  *
  * Scale shape: each alternation costs one Lloyd's pass over the
  * corpus (the [[PQ.lloydCodebooks]] single-job design) plus ONE
  * mapPartitions pass accumulating the d×d correlation M as
  * per-partition partials (d² doubles each — KBs; merged driver-side
  * in partition order so double sums are deterministic) and one d×d
  * SVD on the driver (breeze, milliseconds at embedding dims). The
  * corpus never shuffles.
  */
object Opq {

  /** Trained rotation + the codebooks of its final alternation. */
  case class Trained(r: Array[Array[Double]],
                     cbs: Array[Array[Array[Float]]],
                     params: PQ.Params)

  /** y = R·x in double, rounded to the float32 coordinate frame (the
    * [[graft.functions.Rotate.rotateF]] contract: rotated corpora are
    * "just another float corpus" to the codebooks). */
  def applyRF(v: Array[Float], r: Array[Array[Double]]): Array[Float] = {
    val d = r.length
    // strict-dimension contract (the BqMath.hammingDist discipline): a
    // shorter vector would silently yield a TRUNCATED rotation — a
    // plausible-but-wrong frame in the serving path — and a longer one
    // an opaque AIOOBE
    require(v.length == d,
      s"Opq.applyRF: vector dim ${v.length} != rotation dim $d")
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      val ri = r(i)
      var s = 0.0
      var j = 0
      while (j < v.length) { s += ri(j) * v(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /** Rotate an (id, vector) frame: one narrow map, R broadcast —
    * the preprocessing stage for corpus AND queries. Returns
    * (id LONG, vector ARRAY<FLOAT>). */
  def rotateFrame(df: DataFrame, idCol: String, vecCol: String,
                  r: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(r)
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vector"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, applyRF(v, bc.value)) }
      .toDF("id", "vector")
  }

  /** The d×d identity. */
  def identityR(d: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

  /** The [[graft.functions.Rotate]] transform as an explicit matrix —
    * the recommended [[train]] seed: R(i)(j) = (1/√d)·(−1)^popcount(i&j)
    * ·sign(j) (FWHT with the md5-addressed diagonal). OPQ's Procrustes
    * fixed point from the IDENTITY is near-identity on independent
    * decaying spectra (M is ~symmetric PSD ⇒ the SVD update returns
    * ~I — measured at 1M: identity-seeded OPQ = plain PQ recall);
    * seeding with the energy-balancing Hadamard starts the alternation
    * in a balanced frame and lets Procrustes refine FROM there. d must
    * be a power of two (pad upstream otherwise). */
  def hadamardR(d: Int): Array[Array[Double]] = {
    require((d & (d - 1)) == 0 && d > 0, s"hadamardR needs a power of two, got $d")
    val inv = 1.0 / math.sqrt(d.toDouble)
    Array.tabulate(d, d) { (i, j) =>
      val h = if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1.0 else -1.0
      val s = if (graft.functions.Rotate.signPositive(j)) 1.0 else -1.0
      inv * h * s
    }
  }

  /** PINNED exact-literal orthogonal rotation for the oracle lanes:
    * 3-4-5 Givens blocks (entries ±0.6/±0.8 — literals both engines
    * parse to identical doubles) over the pinned permutation
    * p(j) = (5j + 3) mod d (gcd(5, d) = 1 for power-of-two d, so p is
    * a bijection and the 2×2 blocks act on disjoint coordinate pairs
    * ⇒ R is exactly orthogonal). Row i: even i reads (0.6, 0.8) at
    * columns (p(i), p(i+1)); odd i reads (−0.8, 0.6) at (p(i−1), p(i)).
    */
  def pythagoreanR(d: Int): Array[Array[Double]] = {
    require(d % 2 == 0, s"pythagoreanR needs even d, got $d")
    require(d % 5 != 0, s"pythagoreanR's stride-5 permutation needs gcd(5,d)=1")
    def p(j: Int): Int = (5 * j + 3) % d
    val r = Array.fill(d, d)(0.0)
    var i = 0
    while (i < d) {
      if (i % 2 == 0) { r(i)(p(i)) = 0.6; r(i)(p(i + 1)) = 0.8 }
      else { r(i)(p(i - 1)) = -0.8; r(i)(p(i)) = 0.6 }
      i += 1
    }
    r
  }

  /** Train R by `opqIters` alternations of codebook-fit / Procrustes;
    * returns the final rotation with codebooks retrained under it.
    * `r0` seeds the alternation (identity by default; pass a Hadamard
    * matrix for warm-started spectra). Deterministic: Lloyd's is the
    * deterministic [[PQ.lloydCodebooks]], M merges partials in
    * partition order, and breeze's pure-Java SVD is reproducible. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            params: PQ.Params, opqIters: Int = 4,
            r0: Option[Array[Array[Double]]] = None): Trained = {
    require(opqIters >= 1, "opqIters must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vector"))
      .persist()
    val first = rows.as[(Long, Array[Float])].take(1)
    require(first.nonEmpty, "Opq.train: input is empty")
    val d = first(0)._2.length
    require(d % params.m == 0, s"dim $d not divisible by m=${params.m}")
    val dsub = d / params.m
    var r = r0.getOrElse(identityR(d))
    require(r.length == d && r(0).length == d, s"r0 must be $d×$d")

    var cbs: Array[Array[Array[Float]]] = null
    var kk = params.k
    var iter = 0
    while (iter < opqIters) {
      val rot = rotateFrame(rows, "id", "vector", r).persist()
      val (c, _, k2) = PQ.lloydCodebooks(rot, params)
      rot.unpersist(blocking = false)
      cbs = c; kk = k2
      // M = Σ x·ŷᵀ over the corpus — per-partition d×d partials merged
      // by a DETERMINISTIC two-level tree: partials reduce inside
      // 256-partition buckets in pid order (one small shuffle of
      // d²-double rows), bucket results fold on the driver in bucket
      // order. A flat collect would put partitions × d² doubles on the
      // driver (4 GB at 32k tasks / d = 128 — a real cluster's shape);
      // the tree keeps the driver at buckets × d² while every double
      // sums in a fixed order, so retraining is bit-reproducible.
      val bcR = spark.sparkContext.broadcast(r)
      val bcC = spark.sparkContext.broadcast(c)
      val buckets = rows.as[(Long, Array[Float])].mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val rr = bcR.value; val cc = bcC.value
        val m = new Array[Double](d * d)
        var any = false
        it.foreach { case (_, x) =>
          any = true
          val y = applyRF(x, rr)
          // ŷ = per-subspace nearest centroid of y
          val yhat = new Array[Float](d)
          var s = 0
          var off = 0
          while (s < cc.length) {
            val ci = PQ.nearestSub(cc(s), y, off)
            System.arraycopy(cc(s)(ci), 0, yhat, off, dsub)
            s += 1
            off += dsub
          }
          var i = 0
          while (i < d) {
            val xi = x(i).toDouble
            var j = 0
            while (j < d) { m(i * d + j) += xi * yhat(j); j += 1 }
            i += 1
          }
        }
        if (any) Iterator.single((pid, m)) else Iterator.empty
      }
        .groupByKey(_._1 >> 8)
        .mapGroups { (bucket, it) =>
          val sorted = it.toArray.sortBy(_._1)
          val acc = new Array[Double](d * d)
          sorted.foreach { case (_, pm) =>
            var i = 0
            while (i < d * d) { acc(i) += pm(i); i += 1 }
          }
          (bucket, acc)
        }
        .collect().sortBy(_._1)
      val m = new Array[Double](d * d)
      buckets.foreach { case (_, pm) =>
        var i = 0
        while (i < d * d) { m(i) += pm(i); i += 1 }
      }
      // tr(R·M) is maximized at R = VUᵀ for M = UΣVᵀ
      val mb = new breeze.linalg.DenseMatrix[Double](d, d)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { mb(i, j) = m(i * d + j); j += 1 }
        i += 1
      }
      val svdR = breeze.linalg.svd(mb)
      val rNew = svdR.Vt.t * svdR.U.t
      r = Array.tabulate(d, d)((a, b) => rNew(a, b))
      iter += 1
    }
    // retrain codebooks under the final rotation
    val rotF = rotateFrame(rows, "id", "vector", r).persist()
    val (cF, _, kF) = PQ.lloydCodebooks(rotF, params)
    rotF.unpersist(blocking = false)
    rows.unpersist(blocking = false)
    Trained(r, cF, params.copy(k = kF))
  }

  /** Mean squared reconstruction error of `emb` under (R, codebooks) —
    * the quantity OPQ minimizes; the A/B yardstick. One narrow pass. */
  def reconstructionError(emb: DataFrame, idCol: String, vecCol: String,
                          t: Trained): Double = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bcR = spark.sparkContext.broadcast(t.r)
    val bcC = spark.sparkContext.broadcast(t.cbs)
    val d = t.r.length
    val dsub = d / t.cbs.length
    val (errSum, n) = emb.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vector"))
      .as[(Long, Array[Float])]
      .map { case (_, x) =>
        val y = applyRF(x, bcR.value)
        val cc = bcC.value
        var e = 0.0
        var s = 0
        var off = 0
        while (s < cc.length) {
          val ci = PQ.nearestSub(cc(s), y, off)
          val cb = cc(s)(ci)
          var i = 0
          while (i < dsub) {
            val t0 = y(off + i).toDouble - cb(i).toDouble
            e += t0 * t0
            i += 1
          }
          s += 1
          off += dsub
        }
        (e, 1L)
      }
      .toDF("e", "n").agg(sum("e"), sum("n"))
      .as[(Double, Long)].head()
    errSum / math.max(1L, n)
  }

  /** One-call OPQ lifecycle: persist the WHOLE [[Trained]] — rotation,
    * the final alternation's codebooks, and params — in one directory,
    * so serving needs no hand-replumbing through PQ persistence (every
    * other tier has a one-call save/load; this is OPQ's). Layout:
    * `rotation/` ([[saveR]]'s one-row-per-matrix-row table),
    * `codebooks/` (the PQ (s, j, centroid) layout), and the ParamsIO
    * JSON. */
  def save(t: Trained, spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    saveR(t.r, spark, s"$dir/rotation")
    t.cbs.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (cv, j) => (s, j, cv.toSeq) }
    }.toSeq.toDF("s", "j", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    ParamsIO.write(spark, dir,
      s"""{"m":${t.params.m},"k":${t.params.k},"iterations":${t.params.iterations},"seed":${t.params.seed},"dim":${t.r.length}}""")
  }

  /** Restore a [[Trained]] written by [[save]]: ready to
    * [[rotateFrame]] corpora/queries and serve through
    * [[PQ.withCodebooks]] directly. */
  def load(spark: SparkSession, dir: String): Trained = {
    val json = ParamsIO.read(spark, dir)
    def num(key: String): Long = ParamsIO.num(json, key)
    val params = PQ.Params(num("m").toInt, num("k").toInt,
      num("iterations").toInt, num("seed"))
    val r = loadR(spark, s"$dir/rotation")
    require(r.length == num("dim").toInt,
      s"Opq.load: rotation is ${r.length}×${r.length} but params say dim=${num("dim")}")
    val rows = spark.read.parquet(s"$dir/codebooks").collect()
    val byS = rows.groupBy(_.getInt(0))
    val cbs = (0 until params.m).map { s =>
      byS(s).sortBy(_.getInt(1))
        .map(_.getAs[scala.collection.Seq[Float]](2).toArray)
    }.toArray
    Trained(r, cbs, params)
  }

  /** Persist the rotation like a codebook: one row per matrix row. */
  def saveR(r: Array[Array[Double]], spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    r.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
      .toDF("i", "vals").coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a persisted rotation (budget-capped collect — a rotation is
    * d rows by contract; a mis-pointed path fails fast). */
  def loadR(spark: SparkSession, dir: String): Array[Array[Double]] = {
    import spark.implicits._
    Batches.bounded(
        spark.read.parquet(dir).select("i", "vals").as[(Int, Seq[Double])],
        s"Opq.loadR rotation at $dir",
        "An OPQ rotation is d rows — check the path points at a table " +
          "written by Opq.saveR, not at a corpus.")
      .sortBy(_._1).map(_._2.toArray)
  }
}
