package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-scale smoke: build all three ANN indexes over a seeded
  * synthetic corpus (default 100k × 128f, ~the scale regime of the
  * reference's 1M × 300f fastText corpus, Makefile:1-2 / utils.rs:38-42)
  * and record build wall, batch search wall, single-query latency and
  * recall@10 vs the exhaustive oracle. Prints one JSON line; numbers are
  * committed to BASELINE.md.
  *
  * Usage: sbt "runMain graft.ScaleSmoke [n] [dim]"
  */
object ScaleSmoke {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
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

    // seeded CLUSTERED unit vectors (the realistic embedding regime —
    // uniform random high-dim is the adversarial case where every
    // partition-based ANN degrades to brute force): 128 unit centers,
    // point = normalize(center + noise). One truth (sqdist rank ==
    // cosine rank on the unit sphere) serves all three indexes.
    val nClusters = 128
    val noiseAmp = 0.08 // per-element → noise vector norm ≈ 0.5
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
    def mkVecs(ids: org.apache.spark.sql.Dataset[java.lang.Long]): DataFrame =
      ids.as[Long].mapPartitions { it =>
        val cents = bcCenters.value
        it.map { id =>
          val c = math.floorMod(mix64(id ^ 0xABCDEFL), nClusters.toLong).toInt
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

    val (truthRows, tExh) = timed {
      operators.Exhaustive.knnJoin(queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k).collect()
    }
    val truth = truthRows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n" -> n.toString += "dim" -> dim.toString += "k" -> k.toString
    out += "exhaustive_search_s" -> f"$tExh%.2f"

    // ---- IVFFlat: k=256 cells (~n/400 per cell), 10 iters
    val (ivf, tIvfB) = timed {
      val m = index.IVFFlat.build(corpus, "vec_id", "embedding",
        index.IVFFlat.Params(k = 256, numAttempts = 1, maxIterations = 10, seed = seed))
      m.indexed.cache().count(); m
    }
    val (ivfRes, tIvfS) = timed {
      val df = ivf.searchMany(queries, "vec_id", "embedding", k, nprobe = 8).cache()
      df.count(); df
    }
    val ivfRecall = recallOf(ivfRes, truth)
    val q0 = queries.orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<float>")).head()
      .getAs[scala.collection.Seq[Float]](0).toArray
    val (_, tIvfQ) = timed(ivf.search(q0, k).count())
    out += "ivf_build_s" -> f"$tIvfB%.2f" += "ivf_batch100_s" -> f"$tIvfS%.2f"
    out += "ivf_single_q_s" -> f"$tIvfQ%.2f" += "ivf_recall_at10" -> f"$ivfRecall%.3f"

    // ---- streaming-ingest throughput: Index::add per microbatch (the
    // foreachBatch body, Streaming.ingestIntoIVF) against the live
    // n-row index — 10 batches of 1,000 NEW rows; each add is the fused
    // frozen-centroid assign + union + Lineage-cadence compaction. The
    // per-batch wall is dominated by Spark job fixed cost, so rows/s
    // here is the floor (bigger microbatches amortize it linearly).
    {
      var live = ivf
      val (_, tIngest) = timed {
        (0 until 10).foreach { b =>
          val batch = mkVecs(spark.range(n + b * 1000L, n + (b + 1) * 1000L))
          live = live.add(batch, "vec_id", "embedding")
        }
        live.indexed.count()
      }
      // sanity: an ingested vector is findable at distance 0
      val addedId = n.toLong
      val qv = mkVecs(spark.range(addedId, addedId + 1))
        .select(col("embedding").cast("array<float>")).head()
        .getAs[scala.collection.Seq[Float]](0).toArray
      val hit = live.search(qv, 1).head()
      require(hit.getAs[Long]("id") == addedId && hit.getAs[Double]("distance") == 0.0,
        s"ingested row not found: $hit")
      out += "ivf_ingest_10x1000_s" -> f"$tIngest%.2f"
      out += "ivf_ingest_rows_per_s" -> f"${10000.0 / tIngest}%.0f"
    }

    // ---- SQ8: the same coarse cells compressed to packed int8 codes
    // (1 byte/dim + lo/scale) — the storage-scale serving tier. The
    // phase measures compress cost (one narrow pass), probed batch
    // search through the fused byte kernel, recall (expect ~flat vs
    // float IVF: per-element error ≤ (hi−lo)/510 ≈ 4e-4 on unit
    // vectors), and the code-vs-float byte footprint actually cached.
    {
      val (sq8, tSq8C) = timed {
        val m = index.SQ8.compress(ivf)
        m.codes.cache().count(); m
      }
      val (sq8Res, tSq8S) = timed {
        val df = sq8.searchMany(queries, "vec_id", "embedding", k, nprobe = 8).cache()
        df.count(); df
      }
      val sq8Recall = recallOf(sq8Res, truth)
      val codeBytes = sq8.codes.agg(
        sum(length(col("codes")) + lit(20L))).head().getLong(0)
      val floatBytes = n.toLong * (dim * 4L + 12L)
      out += "sq8_compress_s" -> f"$tSq8C%.2f"
      out += "sq8_batch100_s" -> f"$tSq8S%.2f"
      out += "sq8_recall_at10" -> f"$sq8Recall%.3f"
      out += "sq8_bytes_frac" -> f"${codeBytes.toDouble / floatBytes}%.3f"
      sq8.codes.unpersist()
    }

    // ---- BQ: the same coarse cells compressed to 1-BIT sign codes
    // (32× fewer payload bytes than float) — the first-pass shortlist
    // tier of production vector stores. Measures compress cost, the
    // probed asymmetric scan alone (recall floor at the 1-bit
    // quantization error), and the production shape: asym shortlist
    // factor×k + float re-rank of shortlist-only rows.
    {
      val (bq, tBqC) = timed {
        val m = index.BQ.compress(ivf)
        m.codes.cache().count(); m
      }
      val (bqRes, tBqS) = timed {
        val df = bq.searchManyAsym(queries, "vec_id", "embedding", k,
          nprobe = 8).cache()
        df.count(); df
      }
      val bqRecall = recallOf(bqRes, truth)
      val (bqRe, tBqR) = timed {
        val df = bq.searchManyRefined(queries, "vec_id", "embedding", k,
          factor = 10, corpus, "vec_id", "embedding", nprobe = 8).cache()
        df.count(); df
      }
      val bqReRecall = recallOf(bqRe, truth)
      val codeBytes = bq.codes.agg(
        sum(length(col("codes")) + lit(12L))).head().getLong(0)
      val floatBytes = n.toLong * (dim * 4L + 12L)
      out += "bq_compress_s" -> f"$tBqC%.2f"
      out += "bq_batch100_asym_s" -> f"$tBqS%.2f"
      out += "bq_recall_at10" -> f"$bqRecall%.3f"
      out += "bq_rerank10x_batch100_s" -> f"$tBqR%.2f"
      out += "bq_rerank10x_recall_at10" -> f"$bqReRecall%.3f"
      out += "bq_bytes_frac" -> f"${codeBytes.toDouble / floatBytes}%.3f"
      bq.codes.unpersist()

      // residual coding: sign(v − centroid) — the within-cell
      // discriminator; same storage, same probing, recall is the point.
      val (bqr, tBqrC) = timed {
        val m = index.BQ.compressResidual(ivf)
        m.codes.cache().count(); m
      }
      val (bqrRes, tBqrS) = timed {
        val df = bqr.searchManyAsym(queries, "vec_id", "embedding", k,
          nprobe = 8).cache()
        df.count(); df
      }
      val bqrRecall = recallOf(bqrRes, truth)
      val (bqrRe, tBqrR) = timed {
        val df = bqr.searchManyRefined(queries, "vec_id", "embedding", k,
          factor = 10, corpus, "vec_id", "embedding", nprobe = 8).cache()
        df.count(); df
      }
      val bqrReRecall = recallOf(bqrRe, truth)
      out += "bqres_compress_s" -> f"$tBqrC%.2f"
      out += "bqres_batch100_asym_s" -> f"$tBqrS%.2f"
      out += "bqres_recall_at10" -> f"$bqrRecall%.3f"
      out += "bqres_rerank10x_batch100_s" -> f"$tBqrR%.2f"
      out += "bqres_rerank10x_recall_at10" -> f"$bqrReRecall%.3f"
      bqr.codes.unpersist()
    }

    // ---- LSHForest: 16 trees (the recall lever, lsh.rs:132); leaf size
    // scales with n to hold the driver-held skeleton and the per-level
    // stats collect at O(n/maxNodeSize) entries (see Tree scaladoc)
    val lshLeaf = math.max(256, n / 1000)
    val (lsh, tLshB) = timed {
      val m = index.LSHForest.build(corpus, "vec_id", "embedding",
        index.LSHForest.Params(numTrees = 16, maxNodeSize = lshLeaf, seed = seed))
      m.indexed.cache().count(); m
    }
    val (lshRes, tLshS) = timed {
      val df = lsh.searchMany(queries, "vec_id", "embedding", k).cache()
      df.count(); df
    }
    val lshRecall = recallOf(lshRes, truth)
    out += "lsh_build_s" -> f"$tLshB%.2f" += "lsh_batch100_s" -> f"$tLshS%.2f"
    out += "lsh_recall_at10" -> f"$lshRecall%.3f"
    out += "lsh_max_depth" -> lsh.trees.map(_.leafSizes.keys.map(_.length).max).max.toString
    out += "lsh_leaves" -> lsh.trees.map(_.leafSizes.size).sum.toString

    // ---- LSH multi-probe: same forest, probes=8 at query time — the
    // query-side recall lever (lsh.rs:163-216 backtracking generalized
    // to boundary-distance-ordered sibling descents). Search-only cost.
    val lshMp = lsh.copy(params = lsh.params.copy(probes = 8))
    val (lshMpRes, tLshMpS) = timed {
      val df = lshMp.searchMany(queries, "vec_id", "embedding", k).cache()
      df.count(); df
    }
    val lshMpRecall = recallOf(lshMpRes, truth)
    out += "lsh_mp8_batch100_s" -> f"$tLshMpS%.2f"
    out += "lsh_mp8_recall_at10" -> f"$lshMpRecall%.3f"

    // ---- PQ: m=32 codes (16× compression at 128f), 256 cells. ADC
    // codes resolve cluster identity; the true top-10 differ by
    // intra-cluster noise at quantization-error scale, so serving uses
    // the standard shape: ADC shortlist of ~1% of the corpus + exact
    // re-rank (factor 100 → 1000 candidates at k=10).
    val (pq, tPqB) = timed {
      val m = index.PQ.train(corpus, "vec_id", "embedding",
        index.PQ.Params(m = 32, k = 256, iterations = 10, seed = seed))
      m.codes.cache().count(); m
    }
    val (pqRes, tPqS) = timed {
      val df = pq.searchMany(queries, "vec_id", "embedding", k).cache()
      df.count(); df
    }
    val pqRecall = recallOf(pqRes, truth)
    val (pqRef, tPqR) = timed {
      val df = pq.searchManyRefined(queries, "vec_id", "embedding", k,
        factor = 100, corpus, "vec_id", "embedding").cache()
      df.count(); df
    }
    val pqRefRecall = recallOf(pqRef, truth)
    out += "pq_train_s" -> f"$tPqB%.2f" += "pq_adc100_s" -> f"$tPqS%.2f"
    out += "pq_recall_at10" -> f"$pqRecall%.3f"
    out += "pq_refined100_s" -> f"$tPqR%.2f" += "pq_refined_recall_at10" -> f"$pqRefRecall%.3f"

    // ---- IVF-PQ: compose the ALREADY-trained coarse cells (ivf) with
    // the ALREADY-trained codebooks (pq; residual=false → LUTs identical
    // to flat ADC), so probed-cell vs flat ADC isolates the probing
    // effect: same quantizer, same queries — the only variable is how
    // many codes each query scans.
    val nprobe = 8
    val (ivfpq, tIvfpqB) = timed {
      val m = index.IVFPQ.build(corpus, "vec_id", "embedding",
        ivf.centroids, ivf.clusterSizes, pq.codebooks, pq.params)
      m.codes.cache().count(); m
    }
    val (ivfpqRes, tIvfpqS) = timed {
      val df = ivfpq.searchMany(queries, "vec_id", "embedding", k, nprobe).cache()
      df.count(); df
    }
    val ivfpqRecall = recallOf(ivfpqRes, truth)
    // scanned-code fraction: sum of probed-cell sizes per query (the
    // adaptive probeOrder actually used) over the full-corpus scan the
    // flat ADC comparator pays by definition
    val qVecs = queries
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val scanned = qVecs.map { case (_, qv) =>
      index.IVFFlat.probeOrder(ivf.centroids, ivf.clusterSizes, qv, k, nprobe)
        .map(c => ivf.clusterSizes(c)).sum
    }.sum
    out += "ivfpq_build_s" -> f"$tIvfpqB%.2f" += "ivfpq_batch100_s" -> f"$tIvfpqS%.2f"
    out += "ivfpq_recall_at10" -> f"$ivfpqRecall%.3f"
    out += "ivfpq_scanned_frac" -> f"${scanned.toDouble / (qVecs.length.toDouble * n)}%.4f"

    // ---- residual IVF-PQ: retrain the codebooks on v − centroid(cell)
    // against the SAME coarse cells (trainWithCoarse — no second k-means)
    // and probe identically. Quantization error shrinks from corpus
    // scale to intra-cell scale at identical storage, so ADC recall is
    // the number that should move vs the raw-encoding row above.
    val (ivfpqRes2, tIvfpqResT) = timed {
      val m = index.IVFPQ.trainWithCoarse(corpus, "vec_id", "embedding", ivf,
        index.PQ.Params(m = 32, k = 256, iterations = 10, seed = seed),
        residual = true)
      m.codes.cache().count(); m
    }
    val (ivfpqResSearch, tIvfpqResS) = timed {
      val df = ivfpqRes2.searchMany(queries, "vec_id", "embedding", k, nprobe).cache()
      df.count(); df
    }
    val ivfpqResRecall = recallOf(ivfpqResSearch, truth)
    out += "ivfpq_res_train_s" -> f"$tIvfpqResT%.2f"
    out += "ivfpq_res_batch100_s" -> f"$tIvfpqResS%.2f"
    out += "ivfpq_res_recall_at10" -> f"$ivfpqResRecall%.3f"

    // ---- HNSW: 32 shards, m=16, efSearch=64
    val (hnsw, tHnswB) = timed {
      val m = index.HNSW.build(corpus, "vec_id", "embedding",
        index.HNSWGraph.Params(numLayers = 8, efConstruction = 100,
          efSearch = 64, m = 16, seed = seed), numShards = 32)
      m.shards.cache().count(); m
    }
    val (hnswRes, tHnswS) = timed {
      val df = hnsw.searchMany(queries, "vec_id", "embedding", k).cache()
      df.count(); df
    }
    val hnswRecall = recallOf(hnswRes, truth)
    out += "hnsw_build_s" -> f"$tHnswB%.2f" += "hnsw_batch100_s" -> f"$tHnswS%.2f"
    out += "hnsw_recall_at10" -> f"$hnswRecall%.3f"

    // ---- ROUTED HNSW: shards are k-means cells with router centroids;
    // each query probes its 8 nearest of 32 cells (P/4). The recall
    // delta vs the SAME routed model's all-shard fan-out isolates
    // routing quality (identical graphs on both sides); the per-query
    // beam work drops proportionally to the scanned-shard fraction.
    val (hnswR, tHnswRB) = timed {
      // maxCellFactor = 1.0: build-optimized cap — no subshard exceeds
      // the MEAN cell size, so the straggler insert is the hash layout's
      // per-shard wall and the only routed-build premium left is the
      // router k-means itself (the serving trade: more subshard graphs
      // per probed cell; q1 latencies below price it honestly)
      val m = index.HNSW.buildRouted(corpus, "vec_id", "embedding",
        index.HNSWGraph.Params(numLayers = 8, efConstruction = 100,
          efSearch = 64, m = 16, seed = seed), numShards = 32,
        maxCellFactor = 1.0)
      m.shards.cache().count(); m
    }
    val (hnswRAll, tHnswRAllS) = timed {
      val df = hnswR.searchMany(queries, "vec_id", "embedding", k).cache()
      df.count(); df
    }
    val (hnswRP, tHnswRPS) = timed {
      val df = hnswR.searchMany(queries, "vec_id", "embedding", k,
        probeShards = 8).cache()
      df.count(); df
    }
    out += "hnswr_build_s" -> f"$tHnswRB%.2f"
    out += "hnswr_all_s" -> f"$tHnswRAllS%.2f"
    out += "hnswr_all_recall_at10" -> f"${recallOf(hnswRAll, truth)}%.3f"
    out += "hnswr_p8_s" -> f"$tHnswRPS%.2f"
    out += "hnswr_p8_recall_at10" -> f"${recallOf(hnswRP, truth)}%.3f"
    // single-query serving latency is where routing visibly pays even at
    // P=32: 8 probed cells deserialize 8 graphs, all-shard pays all 32
    // (a 100-query batch touches nearly every shard either way, so the
    // batch walls above mostly price the scan, not the routing)
    val q1 = queries.orderBy("vec_id").limit(1).cache()
    q1.count()
    val (_, tHnswRQ1All) = timed(
      hnswR.searchMany(q1, "vec_id", "embedding", k).count())
    val (_, tHnswRQ1P) = timed(
      hnswR.searchMany(q1, "vec_id", "embedding", k, probeShards = 8).count())
    out += "hnswr_q1_all_s" -> f"$tHnswRQ1All%.2f"
    out += "hnswr_q1_p8_s" -> f"$tHnswRQ1P%.2f"

    // ---- MIPS under norm skew (operators.Mips): scale each unit
    // vector by a deterministic per-id factor in [0.5, 2] — the hard
    // MIPS regime where high-norm rows dominate inner products and
    // cosine-style routing is wrong — then augment, train IVF in the
    // AUGMENTED space (k-means sees direction + norm jointly), probe
    // 8/256 vs the brute −dot truth.
    {
      val f = lit(0.5) + lit(1.5) *
        (pmod(col("vec_id") * lit(2654435761L), lit(1000L)).cast("double") / 1000.0)
      val scaled = corpus.withColumn("embedding",
        transform(col("embedding"), x => (x * f).cast("float")))
        .cache()
      scaled.count()
      val qScaled = scaled.filter(col("vec_id") < nQ).cache()
      val (mipsTruthRows, tMipsExh) = timed {
        operators.Exhaustive.knnJoin(qScaled, "vec_id", "embedding",
          scaled, "vec_id", "embedding", k, metric = "negdot").collect()
      }
      val mipsTruth = mipsTruthRows.groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val mBound = operators.Mips.maxNorm(scaled, "embedding")
      val augC = operators.Mips.augmentCorpus(scaled, "embedding", mBound)
      val augQ = operators.Mips.augmentQueries(qScaled, "embedding")
      val (mipsIvf, tMipsB) = timed {
        val mm = index.IVFFlat.build(augC, "vec_id", "embedding",
          index.IVFFlat.Params(k = 256, numAttempts = 1, maxIterations = 10,
            seed = seed))
        mm.indexed.cache().count(); mm
      }
      val (mipsRes, tMipsS) = timed {
        val df = mipsIvf.searchMany(augQ, "vec_id", "embedding", k, nprobe = 8)
          .cache()
        df.count(); df
      }
      out += "mips_exh_s" -> f"$tMipsExh%.2f"
      out += "mips_ivf_build_s" -> f"$tMipsB%.2f"
      out += "mips_ivf_batch100_s" -> f"$tMipsS%.2f"
      out += "mips_ivf_recall_at10" -> f"${recallOf(mipsRes, mipsTruth)}%.3f"
      scaled.unpersist()
    }

    println(out.map { case (kk, vv) => s""""$kk":$vv""" }
      .mkString("SCALE_SMOKE {", ",", "}"))
    spark.stop()
  }
}
