package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 1M-scale A/B for rotation COMPOSED into the quantized tiers
  * (BQ/SQ8 `rotated = true`, PQ.train rotated): seeded ANISOTROPIC
  * vectors (decaying spectrum x_j ~ N(0,1)/(1+j/2) — the regime of
  * real LLM embeddings, the RotatedTiersSpec generator distributed)
  * with cluster structure, recall@10 against the exhaustive truth,
  * rotated vs not at identical storage. Run:
  * sbt "runMain graft.RotScaleSmoke [n] [dim]" (SPARK_DRIVER_MEM≥48g
  * at 1M). Output: one k=v per line (BASELINE.md convention). */
object RotScaleSmoke {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Deterministic standard gaussian via Box–Muller over two hash
    * uniforms. */
  @inline private def gauss(seed: Long): Double = {
    val u1 = ((mix64(seed) >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    val u2 = ((mix64(seed ^ 0x9E3779B97F4A7C15L) >>> 11).toDouble + 0.5) /
      (1L << 53).toDouble
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 128
    val nQ = 100
    val k = 10
    val seed = 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // TopKAggExpr buffers are O(k) primitives: keep millions of
      // per-task top-k groups hash-aggregated, never sort-fallback
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // anisotropic + clustered: 64 cluster centers drawn from the same
    // decaying spectrum; point = center + noise, both spectrum-scaled.
    // No normalization — anisotropy IS the point.
    val nClusters = 64
    val centers = Array.tabulate(nClusters) { c =>
      Array.tabulate(dim)(j =>
        gauss(0xC0FFEEL + c * 7919L + j * 104729L + seed) / (1.0 + j / 2.0))
    }
    val bcCenters = spark.sparkContext.broadcast(centers)
    def mkVecs(ids: org.apache.spark.sql.Dataset[java.lang.Long]): DataFrame =
      ids.as[Long].mapPartitions { it =>
        val cents = bcCenters.value
        it.map { id =>
          val c = math.floorMod(mix64(id ^ 0xABCDEFL), nClusters.toLong).toInt
          val v = Array.tabulate(dim) { j =>
            (cents(c)(j) +
              0.35 * gauss(id * 1315423911L + j * 2654435761L + seed) /
                (1.0 + j / 2.0)).toFloat
          }
          (id, v)
        }
      }.toDF("vec_id", "embedding")

    val corpus = mkVecs(spark.range(n))
      .repartition(spark.sparkContext.defaultParallelism).cache()
    corpus.count()
    val queries = corpus.filter(col("vec_id") < nQ).cache()
    queries.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def recallOf(got: DataFrame, truth: Map[Long, Set[Long]]): Double = {
      val g = got.select(col("qid"), col("id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      truth.keys.toSeq.map(q =>
        g.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble / k)
        .sum / truth.size
    }

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n" -> n.toString += "dim" -> dim.toString += "k" -> k.toString

    val (truthRows, tExh) = timed {
      operators.Exhaustive.knnJoin(queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k).collect()
    }
    val truth = truthRows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    out += "exhaustive_search_s" -> f"$tExh%.2f"

    val (ivf, tIvfB) = timed {
      val m = index.IVFFlat.build(corpus, "vec_id", "embedding",
        index.IVFFlat.Params(k = 256, numAttempts = 1, maxIterations = 10,
          seed = seed))
      m.indexed.cache().count(); m
    }
    out += "ivf_build_s" -> f"$tIvfB%.2f"
    val ivfRecall = recallOf(
      ivf.searchMany(queries, "vec_id", "embedding", k, nprobe = 8), truth)
    out += "ivf_float_recall_at10" -> f"$ivfRecall%.3f"

    // ---- BQ: plain vs rotated sign codes (identical storage)
    for (rot <- Seq(false, true)) {
      val tag = if (rot) "rot" else "plain"
      val (bq, tC) = timed {
        val m = index.BQ.compress(ivf, rotated = rot)
        m.codes.cache().count(); m
      }
      val (res, tS) = timed {
        val df = bq.searchManyAsym(queries, "vec_id", "embedding", k,
          nprobe = 8).cache()
        df.count(); df
      }
      out += s"bq_${tag}_compress_s" -> f"$tC%.2f"
      out += s"bq_${tag}_batch100_s" -> f"$tS%.2f"
      out += s"bq_${tag}_recall_at10" -> f"${recallOf(res, truth)}%.3f"
      bq.codes.unpersist()
    }

    // ---- residual BQ (the production sign-code config): per-cell
    // recentered codes, plain vs rotated — rotation composes with the
    // residual repair
    for (rot <- Seq(false, true)) {
      val tag = if (rot) "rot" else "plain"
      val (bq, tC) = timed {
        val m = index.BQ.compressResidual(ivf, rotated = rot)
        m.codes.cache().count(); m
      }
      val (res, tS) = timed {
        val df = bq.searchManyAsym(queries, "vec_id", "embedding", k,
          nprobe = 8).cache()
        df.count(); df
      }
      out += s"bqres_${tag}_compress_s" -> f"$tC%.2f"
      out += s"bqres_${tag}_batch100_s" -> f"$tS%.2f"
      out += s"bqres_${tag}_recall_at10" -> f"${recallOf(res, truth)}%.3f"
      bq.codes.unpersist()
    }

    // ---- SQ8: plain vs rotated affine byte codes
    for (rot <- Seq(false, true)) {
      val tag = if (rot) "rot" else "plain"
      val (sq8, tC) = timed {
        val m = index.SQ8.compress(ivf, rotated = rot)
        m.codes.cache().count(); m
      }
      val (res, tS) = timed {
        val df = sq8.searchMany(queries, "vec_id", "embedding", k,
          nprobe = 8).cache()
        df.count(); df
      }
      out += s"sq8_${tag}_compress_s" -> f"$tC%.2f"
      out += s"sq8_${tag}_batch100_s" -> f"$tS%.2f"
      out += s"sq8_${tag}_recall_at10" -> f"${recallOf(res, truth)}%.3f"
      sq8.codes.unpersist()
    }

    // ---- PQ: plain vs rotated trained codebooks (m=16 → 8 bytes/dim
    // ratio 0.0625; few Lloyd iterations — the A/B is the point)
    for (rot <- Seq(false, true)) {
      val tag = if (rot) "rot" else "plain"
      val (pq, tT) = timed {
        val m = index.PQ.train(corpus, "vec_id", "embedding",
          index.PQ.Params(m = 16, k = 256, iterations = 4, seed = seed),
          rotated = rot)
        m.codes.cache().count(); m
      }
      val (res, tS) = timed {
        val df = pq.searchMany(queries, "vec_id", "embedding", k).cache()
        df.count(); df
      }
      out += s"pq_${tag}_train_s" -> f"$tT%.2f"
      out += s"pq_${tag}_batch100_s" -> f"$tS%.2f"
      out += s"pq_${tag}_recall_at10" -> f"${recallOf(res, truth)}%.3f"
      pq.codes.unpersist()
    }

    // ---- PQ under the TRAINED OPQ rotation (index/Opq: Procrustes
    // alternation) — same storage, same Lloyd budget per alternation;
    // the claim is recall above BOTH the plain and Hadamard rows on
    // this decaying-spectrum corpus
    {
      val (opq, tT) = timed {
        index.Opq.train(corpus, "vec_id", "embedding",
          index.PQ.Params(m = 16, k = 256, iterations = 2, seed = seed),
          opqIters = 10, r0 = Some(index.Opq.hadamardR(dim)))
      }
      val rotCorpus = index.Opq.rotateFrame(corpus, "vec_id", "embedding",
        opq.r).persist()
      val (pq, tE) = timed {
        val m = index.PQ.withCodebooks(rotCorpus, "id", "vector",
          opq.cbs, opq.params)
        m.codes.cache().count(); m
      }
      val rotQueries = index.Opq.rotateFrame(queries, "vec_id", "embedding",
        opq.r)
      val (res, tS) = timed {
        val df = pq.searchMany(rotQueries, "id", "vector", k).cache()
        df.count(); df
      }
      out += "pq_opq_train_s" -> f"$tT%.2f"
      out += "pq_opq_encode_s" -> f"$tE%.2f"
      out += "pq_opq_batch100_s" -> f"$tS%.2f"
      out += "pq_opq_recall_at10" -> f"${recallOf(res, truth)}%.3f"
      pq.codes.unpersist()
      rotCorpus.unpersist()
    }

    // ---- CORRELATED spectrum: dim j+d/2 nearly duplicates dim j, so
    // every correlated pair straddles the m=16 subspace grid — the
    // regime where a data-agnostic rotation (Hadamard spreads energy
    // but cannot ALIGN it) leaves recall on the table and OPQ's
    // Procrustes alternation is the published fix. Same three-way A/B
    // at identical storage.
    {
      val corr = corpus
        .select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])]
        .map { case (id, v) =>
          val c = new Array[Float](dim)
          var j = 0
          while (j < dim / 2) {
            c(j) = v(j)
            c(j + dim / 2) = v(j) + 0.05f * v(j + dim / 2)
            j += 1
          }
          (id, c)
        }.toDF("vec_id", "embedding")
        .repartition(spark.sparkContext.defaultParallelism).persist()
      corr.count()
      val qCorr = corr.filter(col("vec_id") < nQ).persist()
      val truthC = operators.Exhaustive.knnJoin(qCorr, "vec_id", "embedding",
          corr, "vec_id", "embedding", k)
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      for (rot <- Seq(false, true)) {
        val tag = if (rot) "rot" else "plain"
        val pq = index.PQ.train(corr, "vec_id", "embedding",
          index.PQ.Params(m = 16, k = 256, iterations = 4, seed = seed),
          rotated = rot)
        pq.codes.cache().count()
        val res = pq.searchMany(qCorr, "vec_id", "embedding", k)
        out += s"corr_pq_${tag}_recall_at10" -> f"${recallOf(res, truthC)}%.3f"
        pq.codes.unpersist()
      }
      val opqC = index.Opq.train(corr, "vec_id", "embedding",
        index.PQ.Params(m = 16, k = 256, iterations = 2, seed = seed),
        opqIters = 10, r0 = Some(index.Opq.hadamardR(dim)))
      val rotC = index.Opq.rotateFrame(corr, "vec_id", "embedding", opqC.r)
        .persist()
      val pqC = index.PQ.withCodebooks(rotC, "id", "vector", opqC.cbs,
        opqC.params)
      pqC.codes.cache().count()
      val resC = pqC.searchMany(
        index.Opq.rotateFrame(qCorr, "vec_id", "embedding", opqC.r),
        "id", "vector", k)
      out += "corr_pq_opq_recall_at10" -> f"${recallOf(resC, truthC)}%.3f"
      pqC.codes.unpersist()
      rotC.unpersist()
      corr.unpersist()
    }

    out.foreach { case (kk, v) => println(s"$kk=$v") }
    spark.stop()
  }
}
