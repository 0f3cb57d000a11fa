package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10M-vector ANN serving smoke — one order of magnitude over the 1M
  * rows in BASELINE.md, exercising the documented cluster-scale build
  * recipe instead of the small-corpus one: the coarse quantizer is
  * k-means trained on a SAMPLE (full-corpus Lloyd iterations at 10M+
  * are the thing a 1000-executor pipeline avoids), then one narrow
  * broadcast-centroid assign pass over the whole corpus; serving goes
  * through the BQ residual tier (32× fewer scan bytes) with float
  * re-rank. Measures wall seconds, shuffle-write MB, and recall@10 vs
  * the exhaustive oracle for each phase. Prints one JSON line per
  * phase (incremental emit — a dead phase still leaves the earlier
  * numbers); committed to BASELINE.md.
  *
  * Usage: runMain graft.AnnScaleSmoke [n] [dim] (driver mem ≥ 48g at
  * the 10M default; SPARK_GRAFT_PHASES=ivf,bq selects phases — truth
  * always runs, it feeds every recall).
  */
object AnnScaleSmoke {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 10000000
    val dim = if (args.length > 1) args(1).toInt else 128
    val nQ = 100
    val k = 10
    val seed = 42L
    val nGenClusters = 1024 // true structure: ~n/1024 per cluster
    val coarseK = sys.env.getOrElse("SPARK_GRAFT_COARSE_K", "512").toInt // cells: ~n/coarseK each
    val trainRows = 500000  // sample-trained coarse layer
    val nprobe = sys.env.getOrElse("SPARK_GRAFT_NPROBE", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
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
    val phasesEnv: Option[Set[String]] = sys.env.get("SPARK_GRAFT_PHASES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def phaseOn(name: String): Boolean = phasesEnv.forall(_.contains(name))

    // seeded clustered unit vectors (the ScaleSmoke regime, 8× more
    // centers for 10× more rows): point = normalize(center + noise)
    val noiseAmp = 0.08
    val centers = Array.tabulate(nGenClusters) { c =>
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
    val corpus = spark.range(n).as[Long].mapPartitions { it =>
      val cents = bcCenters.value
      it.map { id =>
        val c = math.floorMod(mix64(id ^ 0xABCDEFL), nGenClusters.toLong).toInt
        val v = new Array[Float](dim)
        var j = 0
        var norm = 0.0
        while (j < dim) {
          val h = mix64(id * 1315423911L + j * 2654435761L + seed)
          val x = cents(c)(j) +
            ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0) * noiseAmp
          v(j) = x.toFloat; norm += x * x; j += 1
        }
        val inv = (1.0 / math.sqrt(norm)).toFloat
        j = 0
        while (j < dim) { v(j) *= inv; j += 1 }
        (id, v)
      }
    }.toDF("vec_id", "embedding")
      .repartition(spark.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    def emit(): Unit =
      println(out.map { case (kk, vv) => s""""$kk":"$vv"""" }
        .mkString("ANNSCALE {", ",", "}"))
    def settle(): Unit = { Thread.sleep(500); System.gc() }
    var before = 0L
    def phaseStart(): Unit = { settle(); before = shuffleBytes.get() }
    def phaseMb(): Long = (shuffleBytes.get() - before) / (1L << 20)

    out += "n" -> n.toString += "dim" -> dim.toString += "k" -> k.toString
    out += "coarse_k" -> coarseK.toString += "nprobe" -> nprobe.toString

    val (nC, tGen) = timed { corpus.count() }
    out += "gen_s" -> f"$tGen%.1f" += "rows" -> nC.toString
    val queries = corpus.filter(col("vec_id") < nQ).localCheckpoint(true)

    // ---- truth: exhaustive top-k (always on — feeds every recall)
    phaseStart()
    val (truthRows, tExh) = timed {
      operators.Exhaustive.knnJoin(queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k).collect()
    }
    val truth = truthRows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    out += "exhaustive_s" -> f"$tExh%.1f"
    out += "exhaustive_shuffle_mb" -> phaseMb().toString
    emit()

    def recallOf(got: DataFrame): Double = {
      val g = got.select(col("qid"), col("id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      truth.keys.toSeq.map(q =>
        g.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble / k)
        .sum / truth.size
    }

    // ---- coarse layer: sample-train + one full assign pass
    var ivf: index.IVFFlat.Model = null
    if (phaseOn("ivf") || phaseOn("bq") || phaseOn("sq8")) {
      phaseStart()
      val (cents, tTrain) = timed {
        val sample = corpus.sample(withReplacement = false,
            trainRows.toDouble / n, seed)
          .withColumn("features", org.apache.spark.ml.functions
            .array_to_vector(col("embedding").cast("array<double>")))
        val km = new org.apache.spark.ml.clustering.KMeans()
          .setK(coarseK).setMaxIter(5).setTol(0.0).setSeed(seed)
          .setFeaturesCol("features")
        km.fit(sample).clusterCenters.map(_.toArray.map(_.toFloat))
      }
      out += "kmeans_sample_s" -> f"$tTrain%.1f"
      out += "kmeans_sample_rows" -> trainRows.toString
      val (indexed, tAssign) = timed {
        val a = index.IVFFlat.assign(corpus, "vec_id", "embedding", cents)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.count(); a
      }
      out += "assign_s" -> f"$tAssign%.1f"
      val sizes = new Array[Long](coarseK)
      indexed.groupBy("cluster").count().collect()
        .foreach(r => sizes(r.getInt(0)) = r.getLong(1))
      ivf = index.IVFFlat.Model(
        index.IVFFlat.Params(coarseK, 1, 5, seed), cents, sizes, indexed)
      out += "build_shuffle_mb" -> phaseMb().toString
      emit()
    }

    // ---- ivf: float serving off the coarse layer
    if (phaseOn("ivf")) {
      phaseStart()
      val (res, tS) = timed {
        val r = ivf.searchMany(queries, "vec_id", "embedding", k, nprobe)
          .localCheckpoint(true)
        r.count(); r
      }
      out += "ivf_search_s" -> f"$tS%.1f"
      out += "ivf_recall" -> f"${recallOf(res)}%.3f"
      out += "ivf_search_shuffle_mb" -> phaseMb().toString
      emit()
    }

    // ---- bq: residual 1-bit tier + float re-rank (the serving path
    // whose scan bytes survive 100 TB: 16 B codes vs 512 B floats)
    if (phaseOn("bq")) {
      phaseStart()
      val (bq, tC) = timed {
        val m = index.BQ.compressResidual(ivf)
        m.codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .count(); m
      }
      out += "bq_compress_s" -> f"$tC%.1f"
      out += "bq_compress_shuffle_mb" -> phaseMb().toString
      phaseStart()
      val (asym, tA) = timed {
        val r = bq.knnJoinAsym(queries, "vec_id", "embedding", k, nprobe)
          .localCheckpoint(true)
        r.count(); r
      }
      out += "bq_asym_s" -> f"$tA%.1f"
      out += "bq_asym_recall" -> f"${recallOf(asym)}%.3f"
      out += "bq_asym_shuffle_mb" -> phaseMb().toString
      emit()
      for (factor <- Seq(10, 50)) {
        phaseStart()
        val (rr, tR) = timed {
          val r = bq.knnJoinRefined(queries, "vec_id", "embedding", k,
              factor, corpus, "vec_id", "embedding", nprobe,
              broadcastShortlist = true)
            .localCheckpoint(true)
          r.count(); r
        }
        out += s"bq_rerank${factor}_s" -> f"$tR%.1f"
        out += s"bq_rerank${factor}_recall" -> f"${recallOf(rr)}%.3f"
        out += s"bq_rerank${factor}_shuffle_mb" -> phaseMb().toString
        emit()
      }
      // the pure serving path: broadcast probes + broadcast re-rank —
      // the codes table is scanned in place, the float corpus pruned
      // by its scan filter; expected shuffle ≈ result-sized
      phaseStart()
      val (sr, tSR) = timed {
        val r = bq.searchManyRefined(queries, "vec_id", "embedding", k,
            factor = 50, corpus, "vec_id", "embedding", nprobe)
          .localCheckpoint(true)
        r.count(); r
      }
      out += "bq_serve_rerank50_s" -> f"$tSR%.1f"
      out += "bq_serve_rerank50_recall" -> f"${recallOf(sr)}%.3f"
      out += "bq_serve_rerank50_shuffle_mb" -> phaseMb().toString
      emit()
    }

    // ---- sq8: the int8 middle tier at 10M (4x fewer scan bytes,
    // near-float recall — brackets BQ from the accuracy side)
    if (phaseOn("sq8")) {
      phaseStart()
      val (sq8, tC) = timed {
        val m = index.SQ8.compress(ivf)
        m.codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .count(); m
      }
      out += "sq8_compress_s" -> f"$tC%.1f"
      out += "sq8_compress_shuffle_mb" -> phaseMb().toString
      phaseStart()
      val (res, tS) = timed {
        val r = sq8.searchMany(queries, "vec_id", "embedding", k, nprobe)
          .localCheckpoint(true)
        r.count(); r
      }
      out += "sq8_search_s" -> f"$tS%.1f"
      out += "sq8_search_recall" -> f"${recallOf(res)}%.3f"
      out += "sq8_search_shuffle_mb" -> phaseMb().toString
      emit()
    }

    // ---- hnsw: routed graph index at 10M (its own phase — run it in
    // a separate JVM via SPARK_GRAFT_PHASES=hnsw when memory-tight:
    // shard graphs + corpus together are the peak footprint)
    if (phaseOn("hnsw")) {
      phaseStart()
      val (hnsw, tB) = timed {
        index.HNSW.buildRouted(corpus, "vec_id", "embedding",
          index.HNSWGraph.Params(numLayers = 8, efConstruction = 100,
            efSearch = 64, m = 16, seed = seed),
          numShards = 128, routerIterations = 10,
          maxCellFactor = 2.0, routerSampleRows = 200000L)
      }
      out += "hnsw_build_s" -> f"$tB%.1f"
      out += "hnsw_build_shuffle_mb" -> phaseMb().toString
      for (probe <- Seq(16, 0)) {
        phaseStart()
        val (res, tS) = timed {
          val r = hnsw.searchMany(queries, "vec_id", "embedding", k,
              probeShards = probe)
            .localCheckpoint(true)
          r.count(); r
        }
        val tag = if (probe == 0) "all" else probe.toString
        out += s"hnsw_search_p${tag}_s" -> f"$tS%.1f"
        out += s"hnsw_search_p${tag}_recall" -> f"${recallOf(res)}%.3f"
        out += s"hnsw_search_p${tag}_shuffle_mb" -> phaseMb().toString
        emit()
      }
    }

    spark.stop()
  }
}
