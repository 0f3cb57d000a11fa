package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 1M-scale smoke for the Model.merge lifecycle path: two independently
  * TRAINED half-corpus indexes (different centroids — the realistic
  * cross-job case) merge into one servable index, and the smoke
  * measures merge wall vs the full-rebuild alternative plus the recall
  * cost of serving under the surviving coarse grid. HNSW gets the
  * shard-union twin (merge is a blob renumber — near-zero wall).
  * Run: sbt "runMain graft.MergeScaleSmoke [n] [dim]".
  * Output: one k=v per line (the ScaleSmoke convention, recorded in
  * BASELINE.md). */
object MergeScaleSmoke {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
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

    // the ScaleSmoke clustered-unit-vector generator (same seeds)
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
    val halfA = corpus.filter(col("vec_id") % 2 === 0).cache()
    val halfB = corpus.filter(col("vec_id") % 2 === 1).cache()
    halfA.count(); halfB.count()
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

    // ---- IVFFlat cross-job merge: two separately trained halves
    // (different seeds → genuinely different centroid grids, the
    // re-assign branch), vs one full rebuild over the union.
    val params = index.IVFFlat.Params(k = 256, numAttempts = 1,
      maxIterations = 10, seed = seed)
    val (ivfA, tBuildA) = timed {
      val m = index.IVFFlat.build(halfA, "vec_id", "embedding", params)
      m.indexed.cache().count(); m
    }
    val (ivfB, tBuildB) = timed {
      val m = index.IVFFlat.build(halfB, "vec_id", "embedding",
        params.copy(seed = seed + 1000))
      m.indexed.cache().count(); m
    }
    val (merged, tMerge) = timed {
      val m = ivfA.merge(ivfB)
      m.indexed.cache().count(); m
    }
    val (mergedRes, tMergedS) = timed {
      val df = merged.searchMany(queries, "vec_id", "embedding", k, nprobe = 8)
        .cache()
      df.count(); df
    }
    val mergedRecall = recallOf(mergedRes, truth)
    val (full, tRebuild) = timed {
      val m = index.IVFFlat.build(corpus, "vec_id", "embedding", params)
      m.indexed.cache().count(); m
    }
    val (fullRes, tFullS) = timed {
      val df = full.searchMany(queries, "vec_id", "embedding", k, nprobe = 8)
        .cache()
      df.count(); df
    }
    out += "ivf_build_half_a_s" -> f"$tBuildA%.2f"
    out += "ivf_build_half_b_s" -> f"$tBuildB%.2f"
    out += "ivf_merge_s" -> f"$tMerge%.2f"
    out += "ivf_rebuild_full_s" -> f"$tRebuild%.2f"
    out += "ivf_merge_vs_rebuild" -> f"${tMerge / tRebuild}%.3f"
    out += "ivf_merged_batch100_s" -> f"$tMergedS%.2f"
    out += "ivf_merged_recall_at10" -> f"$mergedRecall%.3f"
    out += "ivf_rebuilt_recall_at10" -> f"${recallOf(fullRes, truth)}%.3f"
    out += "ivf_rebuilt_batch100_s" -> f"$tFullS%.2f"

    // ---- grid-union merge A/B: both trained grids survive (metadata
    // + a narrow renumber of the incoming rows) — zero re-assign work,
    // each half served by the grid trained FOR it; probes fan across
    // the combined 512 cells (nprobe doubled to keep the candidate
    // budget per grid comparable).
    val (gridUnion, tGU) = timed {
      val m = ivfA.mergeGridUnion(ivfB)
      m.indexed.cache().count(); m
    }
    val (guRes, tGUS) = timed {
      val df = gridUnion.searchMany(queries, "vec_id", "embedding", k,
        nprobe = 16).cache()
      df.count(); df
    }
    out += "ivf_gridunion_merge_s" -> f"$tGU%.2f"
    out += "ivf_gridunion_batch100_s" -> f"$tGUS%.2f"
    out += "ivf_gridunion_recall_at10" -> f"${recallOf(guRes, truth)}%.3f"

    // ---- SQ8 merge: same coarse grid on both sides (the compressed
    // tiers require it) — the union-only fast path. Each half carries
    // its OWN per-cell counts so the merged satAdd sizes are the true
    // totals (full sizes on both halves would double them and skew
    // adaptive probe widening).
    def cellSizes(rows: DataFrame): Array[Long] = {
      val sz = new Array[Long](full.centroids.length)
      rows.groupBy("cluster").count().collect()
        .foreach(r => sz(r.getInt(0)) = r.getLong(1))
      sz
    }
    val rowsA = full.indexed.filter(col("id") % 2 === 0)
    val rowsB = full.indexed.filter(col("id") % 2 === 1)
    val sq8A = index.SQ8.compress(
      index.IVFFlat.Model(full.params, full.centroids, cellSizes(rowsA), rowsA))
    val sq8B = index.SQ8.compress(
      index.IVFFlat.Model(full.params, full.centroids, cellSizes(rowsB), rowsB))
    val (sq8M, tSq8Merge) = timed {
      val m = sq8A.merge(sq8B)
      m.codes.cache().count(); m
    }
    val (sq8Res, tSq8S) = timed {
      val df = sq8M.searchMany(queries, "vec_id", "embedding", k, nprobe = 8)
        .cache()
      df.count(); df
    }
    out += "sq8_merge_s" -> f"$tSq8Merge%.2f"
    out += "sq8_merged_batch100_s" -> f"$tSq8S%.2f"
    out += "sq8_merged_recall_at10" -> f"${recallOf(sq8Res, truth)}%.3f"

    // ---- HNSW shard-union merge: two 8-shard half-builds → one
    // 16-shard model; merge is a renumber+union (no graph touched).
    val hp = index.HNSWGraph.Params(numLayers = 6, efConstruction = 100,
      efSearch = 64, m = 16)
    val (hA, tHBuildA) = timed {
      val m = index.HNSW.build(halfA, "vec_id", "embedding", hp, numShards = 8)
      m.shards.cache().count(); m
    }
    val (hB, tHBuildB) = timed {
      val m = index.HNSW.build(halfB, "vec_id", "embedding", hp, numShards = 8)
      m.shards.cache().count(); m
    }
    val (hM, tHMerge) = timed {
      val m = hA.merge(hB)
      m.shards.cache().count(); m
    }
    val (hRes, tHS) = timed {
      val df = hM.searchMany(queries, "vec_id", "embedding", k).cache()
      df.count(); df
    }
    out += "hnsw_build_half_a_s" -> f"$tHBuildA%.2f"
    out += "hnsw_build_half_b_s" -> f"$tHBuildB%.2f"
    out += "hnsw_merge_s" -> f"$tHMerge%.2f"
    out += "hnsw_merged_batch100_s" -> f"$tHS%.2f"
    out += "hnsw_merged_recall_at10" -> f"${recallOf(hRes, truth)}%.3f"

    out.foreach { case (kk, v) => println(s"$kk=$v") }
    spark.stop()
  }
}
