package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference-scale smoke for the round-8 kNN-graph wave: a seeded ~1M
  * ×128f clustered corpus (the DedupScaleSmoke embedding regime, 10k
  * planted ε-dups), measuring
  *
  *  - IVFFlat.Model.knnJoin (corpus as its own query side): wall,
  *    shuffle-write bytes, and recall@10 against the exhaustive kNN of
  *    a 1k-query sample — the self-kNN-graph every SemDeDup-style
  *    curation pass starts from;
  *  - Dedup.semdedup end-to-end: wall, shuffle, survivor count, and
  *    planted-dup removal recall (a planted copy shares its base's
  *    cell and sits at cosine distance ≈ 1e-5, far under the 0.05
  *    threshold; same-cluster background pairs sit at ≈ 0.2).
  *
  * Prints one JSON line; numbers are committed to BASELINE.md.
  * Usage: sbt "runMain graft.KnnGraphScaleSmoke [nBase] [nDup] [k]"
  */
object KnnGraphScaleSmoke extends Serializable {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toInt else 1000000
    val nDup = if (args.length > 1) args(1).toInt else 10000
    val k = if (args.length > 2) args(2).toInt else 512
    val dim = 128
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

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    // clustered unit vectors — the DedupScaleSmoke embedding regime
    val nClusters = 128
    val noiseAmp = 0.08
    val centers = Array.tabulate(nClusters) { c =>
      val v = new Array[Double](dim)
      var norm = 0.0
      var j = 0
      while (j < dim) {
        val h = mix64(0xC0FFEEL + c * 7919L + j * 104729L + seed)
        v(j) = (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
        norm += v(j) * v(j); j += 1
      }
      val inv = 1.0 / math.sqrt(norm)
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
      v
    }
    val bcCenters = spark.sparkContext.broadcast(centers)
    def genVec(id: Long): Array[Float] = {
      val c = math.floorMod(mix64(id ^ 0xABCDEFL), nClusters.toLong).toInt
      val v = new Array[Float](dim)
      var j = 0
      var norm = 0.0
      while (j < dim) {
        val h = mix64(id * 1315423911L + j * 2654435761L + seed)
        val x = bcCenters.value(c)(j) +
          ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0) * noiseAmp
        v(j) = x.toFloat; norm += x * x; j += 1
      }
      val inv = (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
      v
    }
    val emb = spark.range(nBase + nDup).as[Long].mapPartitions { it =>
      it.map { id =>
        if (id < nBase) (id, genVec(id))
        else {
          val j = id - nBase
          val v = genVec((j * 97L) % nBase)
          var p = 0
          while (p < dim) {
            val h = mix64(j * 104729L + p * 31L + seed)
            v(p) = (v(p) +
              ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0) * 0.002).toFloat
            p += 1
          }
          (id, v)
        }
      }
    }.toDF("vec_id", "embedding")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    emb.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n" -> (nBase + nDup).toString += "dim" -> dim.toString += "k_cells" -> k.toString

    // ---- build (real MLlib k-means; wall recorded for context)
    val (model, buildS) = timed {
      index.IVFFlat.build(emb, "vec_id", "embedding",
        index.IVFFlat.Params(k = k, numAttempts = 1, maxIterations = 5))
    }
    model.indexed.cache().count()
    out += "build_s" -> f"$buildS%.1f"

    // recall@10 truth on a 1k sample, shared by every graph variant
    val sample = emb.filter(pmod(col("vec_id"), lit(1000L)) === 7L)
    val truth = operators.Exhaustive.knnJoin(sample, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 10)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallOf(g: org.apache.spark.sql.DataFrame): Double = {
      val got = g.join(sample.select(col("vec_id").as("qid")), Seq("qid"))
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      truth.keys.toSeq
        .map(q => got.getOrElse(q, Set.empty).intersect(truth(q)).size / 10.0)
        .sum / truth.size
    }

    // ---- self-kNN graph: the nprobe cost/recall CURVE (r8 left the
    // graph at nprobe=2 / recall 0.803 with the lever undocumented —
    // this measures it so graph consumers inherit a chosen default)
    for (np <- Seq(2, 4, 8)) {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val (graph, knnS) = timed {
        val g = model.knnJoin(emb, "vec_id", "embedding", k = 10, nprobe = np)
          .cache()
        g.count()
        g
      }
      Thread.sleep(500)
      out += s"knn_join_np${np}_s" -> f"$knnS%.1f"
      out += s"knn_join_np${np}_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += s"knn_join_np${np}_recall" -> f"${recallOf(graph)}%.3f"
      graph.unpersist()
    }

    // ---- quantized two-stage graph: residual sign codes (the
    // clustered-corpus coding) shortlist 4×k, exact float re-rank —
    // the 32×-fewer-scan-bytes route up the same curve
    val bq = index.BQ.compressResidual(model)
    bq.codes.cache().count()
    for (np <- Seq(2, 4)) {
      Thread.sleep(500)
      val beforeQ = shuffleBytes.get()
      val (qgraph, qS) = timed {
        val g = bq.knnJoinRefined(emb, "vec_id", "embedding", k = 10,
            factor = 4, emb, "vec_id", "embedding", nprobe = np)
          .cache()
        g.count()
        g
      }
      Thread.sleep(500)
      out += s"bq_graph_np${np}_s" -> f"$qS%.1f"
      out += s"bq_graph_np${np}_shuffle_mb" ->
        ((shuffleBytes.get() - beforeQ) / (1L << 20)).toString
      out += s"bq_graph_np${np}_recall" -> f"${recallOf(qgraph)}%.3f"
      qgraph.unpersist()
    }
    bq.codes.unpersist()

    // ---- SemDeDup end-to-end at the planted threshold: A/B of the
    // single-assignment scan (marginSq = 1, the r8 behavior — planted
    // recall 0.992, the 0.008 being cell-boundary straddle) vs top-2
    // multi-assignment (the boundary repair), with the extra pair cost
    // measured
    for ((label, msq) <- Seq(("single", 1.0), ("multi", 1.5))) {
      Thread.sleep(500)
      val before2 = shuffleBytes.get()
      val ((nKept, nPairs), semS) = timed {
        val kept = operators.Dedup.semdedup(emb, "vec_id", "embedding",
          model.centroids, maxCosDist = 0.05, marginSq = msq).count()
        val pairs = operators.Dedup.semanticPairsMulti(
          graft.index.IVFFlat.assignMulti(emb, "vec_id", "embedding",
            model.centroids, msq), maxCosDist = 0.05).count()
        (kept, pairs)
      }
      Thread.sleep(500)
      out += s"semdedup_${label}_s" -> f"$semS%.1f"
      out += s"semdedup_${label}_shuffle_mb" ->
        ((shuffleBytes.get() - before2) / (1L << 20)).toString
      out += s"semdedup_${label}_kept" -> nKept.toString
      out += s"semdedup_${label}_pairs" -> nPairs.toString
      // every planted copy should lose to its base (or a fellow copy)
      val removed = (nBase + nDup) - nKept
      out += s"semdedup_${label}_removed" -> removed.toString
      out += s"semdedup_${label}_planted_recall" -> f"${removed.toDouble / nDup}%.3f"
    }

    println(out.map { case (kk, vv) => s""""$kk":$vv""" }
      .mkString("KNNGRAPH_SMOKE {", ",", "}"))
    spark.stop()
  }
}
