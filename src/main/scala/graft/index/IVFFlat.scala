package graft.index

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._

/** IVFFlat index — k-means partitioning + cluster-probed search, the Spark
  * re-expression of `vers/src/indexes/ivfflat.rs`.
  *
  * Design for scale (SURVEY §2.4, §4):
  *  - Build: MLlib `KMeans` (k-means|| init beats the reference's random
  *    init, ivfflat.rs:18-27 — deviation documented there as a quality bug,
  *    not a semantic contract). The reference's `num_attempts` restart loop
  *    keeping the lowest-cost run (ivfflat.rs:102-136) is preserved as a
  *    driver loop over seeds keeping min `trainingCost`.
  *  - The indexed corpus gains a `cluster` column and is written
  *    partitioned by it; a probe is then a filter on the partition column →
  *    Spark partition pruning reads only the probed clusters. This replaces
  *    the reference's in-memory inverted lists (ivfflat.rs:122-130) with a
  *    storage layout — the only structure that survives 100 TB.
  *  - Assignment: broadcast centroids + a narrow per-row argmin (no
  *    crossJoin blowup, no shuffle) — exactly the reference's rayon
  *    par_iter assignment (ivfflat.rs:29-46) in Spark's execution model.
  *  - Search: centroids are driver-side (k ≪ corpus); probe set = nearest
  *    clusters whose cumulative size covers k (the reference's adaptive
  *    widening, ivfflat.rs:168-195, computed closed-form from cluster
  *    sizes), then exact re-rank within probed clusters only. Deviation
  *    (documented): we return the global top-k over the probed set, not
  *    the reference's per-cluster-precedence fill — strictly better
  *    recall, same cost.
  *  - `add`: assign new rows against frozen centroids (centroids never
  *    retrained, matching ivfflat.rs:200-213) — but we honour the caller's
  *    id rather than shadowing it (ivfflat.rs:209 quirk, fixed per SURVEY
  *    §7).
  */
object IVFFlat {

  /** `tol` is a documented deviation from the reference's bitwise
    * convergence rule (ivfflat.rs:84-95 ≙ tol = 0): double-precision
    * centroids almost never stop moving bitwise, so tol = 0 burns
    * maxIterations × numAttempts full passes — at 100 TB every wasted
    * iteration is a full corpus scan. A tiny ε stops when centroids are
    * stationary to 1e-6, which assigns identically in practice; pass
    * tol = 0.0 for the reference's exact behavior. */
  case class Params(k: Int, numAttempts: Int = 3, maxIterations: Int = 20,
                    seed: Long = 42L, tol: Double = 1e-6)

  /** Built index: small broadcastable state (centroids + sizes) and the
    * big state as a DataFrame (id, vector, cluster). */
  case class Model(params: Params,
                   centroids: Array[Array[Float]],
                   clusterSizes: Array[Long],
                   indexed: DataFrame,
                   addsSinceCompact: Int = 0) {

    /** Probe-set for one query: nearest clusters (by sqdist of centroid)
      * until their cumulative size covers `k` — the adaptive nprobe of
      * ivfflat.rs:168-195 — never fewer than `minProbe`. */
    def probeSet(query: Array[Float], k: Int, minProbe: Int = 1): Seq[Int] =
      IVFFlat.probeOrder(centroids, clusterSizes, query, k, minProbe)

    /** Single-query search: partition-pruned scan of probed clusters →
      * exact distance → TakeOrderedAndProject. */
    def search(query: Array[Float], k: Int, minProbe: Int = 1): DataFrame = {
      val probed = probeSet(query, k, minProbe)
      graft.operators.Exhaustive.topK(
        indexed.filter(col("cluster").isin(probed: _*)),
        "id", "vector", typedlit(query), k)
    }

    /** Batch search: assign each query its probe clusters (broadcast
      * centroids, narrow), explode, equi-join on `cluster` against the
      * indexed corpus (shuffles only probed candidates, never the full
      * corpus), exact re-rank, per-query top-k.
      *
      * Scan pruning for SMALL batches (the online-serving case): the
      * probe frame is broadcast-sized by contract, so its distinct
      * cells are collectable; when the batch probes fewer than all
      * cells, the cell set rides the corpus scan as a `cluster`
      * membership filter — partition pruning on [[save]]'s
      * partitionBy(cluster) layout, min/max batch skipping on cached
      * frames — so a 10-query batch against a 10^10-row corpus reads
      * the probed fraction, not every cell. Pure pruning: the
      * equi-join below enforces the same equality, results are
      * identical (spec-gated); wide batches that touch every cell
      * skip the filter (zero overhead). */
    def searchMany(queries: DataFrame, qIdCol: String, qVecCol: String,
                   k: Int, nprobe: Int = 2): DataFrame = {
      val spark = queries.sparkSession
      val bc = spark.sparkContext.broadcast((centroids, clusterSizes))
      import spark.implicits._
      val probes = queries
        .select(col(qIdCol).cast("long").as("qid"),
                col(qVecCol).cast("array<float>").as("qvec"))
        .as[(Long, Array[Float])]
        .flatMap { case (qid, qvec) =>
          val (cents, sizes) = bc.value
          IVFFlat.probeOrder(cents, sizes, qvec, k, nprobe)
            .map(c => (qid, qvec, c))
        }
        .toDF("qid", "qvec", "cluster")
        // feeds the cell-collect probe AND the join — compute once
        .localCheckpoint(true)
      val cells = probes.select(col("cluster")).distinct()
        .collect().map(_.getInt(0))
      val scanned =
        if (cells.length < centroids.length)
          indexed.filter(col("cluster").isin(cells.toSeq: _*))
        else indexed
      // distance computed codegen-narrow, then per-query top-k via the
      // PARTIAL-aggregating heap expression: each task ships at most k
      // rows per query it touched, so the only shuffle is k-bounded —
      // never candidate-count-sized (the 10M smoke measured 579 MB of
      // (qid,id,distance) triples through the old whole-candidate
      // groupByKey drain). Probed clusters are disjoint, so ids are
      // unique per query and no dedup is needed; TopKAggExpr's
      // (distance, id) order matches topKDedup's exactly.
      scanned.join(broadcast(probes), Seq("cluster"))
        .select(col("qid"), col("id"),
          sqDist(col("vector"), col("qvec")).as("distance"))
        .groupBy(col("qid"))
        .agg(graft.functions.TopK.topK(col("distance"), col("id"), k).as("nn"))
        .select(col("qid"), explode(col("nn")).as("nn"))
        .select(col("qid"), col("nn.id").as("id"),
          col("nn.distance").as("distance"))
    }

    /** Radius (range) search on the index tier — the FAISS
      * IndexIVF.range_search counterpart: probe each query's `nprobe`
      * nearest cells and return EVERY probed point within `radius`
      * (inclusive, matching [[graft.operators.Exhaustive.rangeSearch]]).
      * Approximate exactly like probed top-k (points outside probed
      * cells are unseen); nprobe = number of cells reproduces the
      * exhaustive radius oracle bit-for-bit (ivf_range_all lane).
      * There is no top-k aggregation at all: the radius filter runs
      * inside the scan stage, so the only rows that move ARE results
      * — result size is data-dependent, write it out at scale. */
    def rangeSearchMany(queries: DataFrame, qIdCol: String, qVecCol: String,
                        radius: Double, nprobe: Int = 2): DataFrame = {
      val spark = queries.sparkSession
      val bc = spark.sparkContext.broadcast((centroids, clusterSizes))
      import spark.implicits._
      // k = 1: the adaptive cumulative-size widening is a top-k
      // concept; range search probes exactly the nprobe nearest cells
      val probes = queries
        .select(col(qIdCol).cast("long").as("qid"),
                col(qVecCol).cast("array<float>").as("qvec"))
        .as[(Long, Array[Float])]
        .flatMap { case (qid, qvec) =>
          val (cents, sizes) = bc.value
          IVFFlat.probeOrder(cents, sizes, qvec, 1, nprobe)
            .map(c => (qid, qvec, c))
        }
        .toDF("qid", "qvec", "cluster")
        .localCheckpoint(true)
      // small-batch scan pruning (the searchMany idiom) — pure pruning
      val cells = probes.select(col("cluster")).distinct()
        .collect().map(_.getInt(0))
      val scanned =
        if (cells.length < centroids.length)
          indexed.filter(col("cluster").isin(cells.toSeq: _*))
        else indexed
      scanned.join(broadcast(probes), Seq("cluster"))
        .select(col("qid"), col("id"),
          sqDist(col("vector"), col("qvec")).as("distance"))
        .filter(col("distance") <= lit(radius))
    }

    /** Corpus-scale batch kNN — [[searchMany]]'s shuffle-path twin for
      * query sides too big to broadcast (the kNN-GRAPH primitive:
      * `knnJoin(indexed corpus itself)` gives every document its k
      * approximate nearest neighbours, the input of SemDeDup-style
      * semantic curation and graph clustering). Same probe semantics
      * (adaptive order, first `nprobe` cells per query), different
      * movement plan:
      *
      *  - probes explode to (qid, qvec, cluster) and equi-JOIN on
      *    `cluster` — a shuffle join, NOT a broadcast: each side moves
      *    once, ≤ nprobe copies of the query side, never queries ×
      *    corpus. With the corpus persisted partitioned by `cluster`
      *    (the [[save]] layout) only the probe side actually moves.
      *  - distances are computed codegen-narrow on the join output,
      *    then each task cuts to k per query with bounded heaps BEFORE
      *    the per-qid merge shuffle, which therefore carries ≤
      *    (tasks × k) 24-byte triples per query — the
      *    [[graft.operators.Exhaustive.knnJoin]] partial-then-merge
      *    shape without its broadcast requirement.
      *
      * At nprobe = params.k this is the exact self-kNN join (every cell
      * probed), which is the driver-oracle face (`ivf_knn_join_all`);
      * the probed configuration is gated by `ivf_knn_join_fixed`.
      *
      * The per-query cut is [[graft.functions.TopKAggExpr]] — partial
      * aggregation holds one O(k) primitive heap per query INSIDE the
      * join stage, so candidate rows never cross a typed-Dataset
      * boundary (2.1× on a 380M-candidate probe, KnnProbe).
      *
      * nprobe is the recall/cost lever, measured at 1M/512 cells
      * (BASELINE r9): nprobe 2 → recall@10 0.803 (354 s / 1.8 GB
      * shuffle), 4 → 0.977 (565 s / 2.9 GB), 8 → 1.000 (1,244 s /
      * 5.1 GB) — wall and shuffle scale ~linearly in nprobe. FOR
      * GRAPH-BUILD CONSUMERS (mutual-kNN clustering, hard-negative
      * mining, SemDeDup feeds) use nprobe = 4: consumers inherit
      * whatever the graph missed, and 0.80 leaves a fifth of true
      * edges absent. The parameter default stays 2 (the cheap
      * exploratory setting the pinned lanes gate). */
    def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
                k: Int, nprobe: Int = 2): DataFrame = {
      val spark = queries.sparkSession
      val bc = spark.sparkContext.broadcast((centroids, clusterSizes))
      import spark.implicits._
      val probes = queries
        .select(col(qIdCol).cast("long").as("qid"),
                col(qVecCol).cast("array<float>").as("qvec"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val (cents, sizes) = bc.value
          it.flatMap { case (qid, qvec) =>
            IVFFlat.probeOrder(cents, sizes, qvec, k, nprobe)
              .map(c => (qid, qvec, c)) }
        }
        .toDF("qid", "qvec", "cluster")
      indexed.join(probes, Seq("cluster"))
        .select(col("qid"), col("id"),
          sqDist(col("vector"), col("qvec")).as("distance"))
        .groupBy(col("qid"))
        .agg(graft.functions.TopK.topK(col("distance"), col("id"), k).as("nn"))
        .select(col("qid"), explode(col("nn")).as("nn"))
        .select(col("qid"), col("nn.id").as("id"),
          col("nn.distance").as("distance"))
    }

    /** Incremental add: assign against frozen centroids, union. Caller ids
      * are honoured (fix of the ivfflat.rs:209 id-shadowing quirk).
      * Repeated adds compact their union lineage — see [[Lineage]]. */
    def add(rows: DataFrame, idCol: String, vecCol: String): Model = {
      val (df, n) = Lineage.compact(
        indexed.unionByName(assign(rows, idCol, vecCol, centroids)),
        addsSinceCompact)
      copy(indexed = df, addsSinceCompact = n)
    }

    /** Takedown — remove rows by id (right-to-be-forgotten / licensing
      * removals, the pipeline mutation the reference never needed).
      * Anti-join on id; the ids frame is takedown-sized, so it
      * broadcasts and the corpus never shuffles. clusterSizes stay
      * frozen like add's, but the drift direction FLIPS: post-remove
      * stale sizes OVERestimate cell populations, so [[probeOrder]]'s
      * cumulative-k budget fills sooner and the adaptive probe set
      * NARROWS (recall-direction). Callers serving a heavily-trimmed
      * tier should pass an explicit nprobe/minProbe or [[rebalance]].
      * Repeated removes compact lineage on the shared cadence. */
    def remove(ids: DataFrame, idCol: String): Model = {
      val del = ids.select(col(idCol).cast("long").as("id"))
      val (df, n) = Lineage.compact(
        indexed.join(broadcast(del), Seq("id"), "left_anti"),
        addsSinceCompact)
      copy(indexed = df, addsSinceCompact = n)
    }

    /** Merge another IVFFlat index into this one — cross-job/cross-day
      * compaction (two builds over disjoint corpus slices become one
      * servable index with no full rebuild). THIS model's centroids
      * survive. When the other model shares them bitwise, its rows
      * union in directly and per-cell sizes add (no job at all);
      * otherwise the other corpus re-assigns under the surviving
      * centroids — the same narrow broadcast-argmin pass add() runs —
      * and its per-cell counts are re-counted (one small aggregate over
      * the incoming rows only; the resident corpus is untouched).
      * Caller contract (as for add): id sets are disjoint. */
    def merge(other: Model): Model = {
      require(other.centroids(0).length == centroids(0).length,
        s"merge: dim mismatch (${centroids(0).length} vs ${other.centroids(0).length})")
      if (MergeOps.sameGrid(centroids, other.centroids)) {
        val (df, n) = Lineage.compact(
          indexed.unionByName(other.indexed), addsSinceCompact)
        copy(indexed = df,
          clusterSizes = MergeOps.satAdd(clusterSizes, other.clusterSizes),
          addsSinceCompact = n)
      } else {
        val reassigned = assign(other.indexed, "id", "vector", centroids)
        val extra = new Array[Long](clusterSizes.length)
        reassigned.groupBy("cluster").count().collect()
          .foreach(r => extra(r.getInt(0)) = r.getLong(1))
        val (df, n) = Lineage.compact(
          indexed.unionByName(reassigned), addsSinceCompact)
        copy(indexed = df,
          clusterSizes = MergeOps.satAdd(clusterSizes, extra),
          addsSinceCompact = n)
      }
    }

    /** Grid-union merge — the metadata-only alternative to [[merge]]
      * when the two models trained DIFFERENT centroid grids: keep both
      * grids side by side (cells k..k+k₂−1 are the other model's,
      * renumbered in a narrow map over the incoming rows only), so each
      * half keeps being served by the grid that was trained FOR it —
      * no re-assignment pass, no recount job, and no quality loss from
      * forcing one grid onto the other's data. The price is a wider
      * probe fan-out: adaptive probing now widens across k₁+k₂ cells,
      * so per-query cost grows toward 2× at equal halves — the
      * trade to re-assigning [[merge]] is merge-time work vs
      * serving-time probes. Params keep the surviving model's training
      * config; `params.k` tracks the combined cell count. Disjoint-id
      * contract. */
    def mergeGridUnion(other: Model): Model = {
      require(other.centroids(0).length == centroids(0).length,
        s"mergeGridUnion: dim mismatch (${centroids(0).length} vs ${other.centroids(0).length})")
      val off = centroids.length
      val shifted = other.indexed
        .withColumn("cluster", (col("cluster") + lit(off)).cast("int"))
      val (df, n) = Lineage.compact(
        indexed.unionByName(shifted), addsSinceCompact)
      copy(params = params.copy(k = off + other.centroids.length),
        centroids = centroids ++ other.centroids,
        clusterSizes = clusterSizes ++ other.clusterSizes,
        indexed = df, addsSinceCompact = n)
    }

    /** Warm-start re-clustering — the rebalancing job the add/remove
      * scaladocs defer to: `iterations` Lloyd's steps starting FROM the
      * current centroids over the CURRENT rows (post-add/remove drift),
      * ending with a fresh assignment and TIGHT cluster sizes. Unlike
      * [[IVFFlat.build]] there are no restarts and no re-init — this is
      * drift repair, not re-training, so it costs `iterations + 1`
      * corpus passes exactly. `indexed` is already the assignment under
      * the current centroids (add assigns on ingest, remove only
      * deletes), so the loop starts at the update step. Float-mean
      * centroid math is the production [[updateCentroids]]; the
      * remove→step→reassign composition is driver-oracle-gated via the
      * quantized-mean twin (ivf_rebalance_fixed). */
    def rebalance(iterations: Int = 1): Model = {
      require(iterations > 0, s"rebalance: iterations must be positive")
      val dim = centroids(0).length
      var cents = centroids
      var df = indexed
      var prevCkpt: org.apache.spark.sql.DataFrame = null
      for (_ <- 0 until iterations) {
        cents = updateCentroids(df, params.k, dim)
        // materialize each reassignment: left lazy, the growing
        // assign(assign(…)) chain re-executes inside the NEXT
        // update pass, the sizes count AND every serve-time scan of
        // the returned model — the checkpoint makes the op cost its
        // documented iterations+1 corpus passes exactly, each over
        // O(1)-deep blocks (same values — assign is deterministic
        // per-row math; the quantized-mean twin still gates it)
        df = assign(df, "id", "vector", cents).localCheckpoint(true)
        // the PREVIOUS iteration's blocks are dead once the new
        // checkpoint exists — release them instead of holding up to
        // iterations× corpus copies until the ContextCleaner GCs
        if (prevCkpt != null) graft.index.Residency.cool(prevCkpt)
        prevCkpt = df
      }
      val sizes = new Array[Long](params.k)
      df.groupBy("cluster").count().collect()
        .foreach(r => sizes(r.getInt(0)) = r.getLong(1))
      Model(params, cents, sizes, df)
    }

    /** Hot-cell splitting — the serve-side skew lever. Real token/
      * embedding distributions are Zipfian, and a coarse cell that
      * captured a head mode can hold 10–100× the mean cell population:
      * every query whose probe order reaches that cell then scans ALL
      * of it, so probed volume (the serving wall's currency) is
      * dominated by the hot cell no matter how small nprobe is. Unlike
      * the routed-HNSW id-hash subshards (HNSW.buildRouted — a BUILD
      * straggler fix: routing still probes all subshards together),
      * this splits hot cells GEOMETRICALLY: each cell with more than
      * `maxCellFactor` × mean rows re-clusters into ceil(size/cap)
      * sub-centroids via Lloyd's WITHIN the cell, and the sub-cells
      * join the grid as first-class cells — probe order then descends
      * into the fraction of the old hot cell nearest the query, so
      * probed volume at equal nprobe drops toward cap.
      *
      * Scale shape: all hot cells iterate TOGETHER — per Lloyd's step
      * one narrow pass over hot-cell rows only (argmin over the row's
      * OWN cell's broadcast sub-centroids) plus one small per-(cell,
      * sub) mean aggregate (Σ splits rows collected, never corpus);
      * init is a seeded id-hash row sample per hot cell; the final
      * renumber is one narrow map over the corpus; sizes recount once.
      * Cold cells keep their centroid bitwise (renumbered only). An
      * empty sub-cell keeps its previous position (the PQ empty rule —
      * a zeroed centroid would hijack probe order). Semantics: the
      * result is a plain [[Model]] over the same rows — probe-all
      * search is IDENTICAL to the unsplit index (spec-gated), smaller
      * nprobe trades recall exactly as on any grid.
      *
      * Limitation (by design): a hot cell of (near-)IDENTICAL vectors
      * — duplicate mass — cannot be split geometrically: its
      * sub-centroids converge to the same point and one Voronoi cell
      * keeps everything. That corpus shape is a dedup problem, not a
      * grid problem — run the dedup operators ([[graft.operators
      * .Dedup]]) upstream; splitting here targets dense-but-continuous
      * Zipf head modes, which real token/embedding distributions are. */
    def splitCells(maxCellFactor: Double = 2.0, iterations: Int = 4): Model = {
      require(maxCellFactor > 0.0,
        s"splitCells: maxCellFactor=$maxCellFactor must be > 0")
      require(iterations >= 1, "splitCells: iterations must be >= 1")
      val k0 = centroids.length
      val total = clusterSizes.sum
      val cap = math.max(1L,
        math.ceil(maxCellFactor * total.toDouble / k0).toLong)
      val splits = Array.tabulate(k0)(c =>
        math.max(1L, math.ceil(clusterSizes(c).toDouble / cap).toLong).toInt)
      if (splits.forall(_ == 1)) return this
      val offsets = splits.scanLeft(0)(_ + _)
      val hot = splits.indices.filter(splits(_) > 1).toSet
      val spark = indexed.sparkSession
      import spark.implicits._
      val dim = centroids(0).length
      // seeded id-hash init: the splits(c) sample rows of each hot cell
      // (serving-sized collect — Σ splits rows, never the corpus)
      val hotRows = indexed
        .filter(col("cluster").isin(hot.toSeq: _*))
      val initRows = hotRows
        .withColumn("_rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
            .orderBy(xxhash64(col("id"), lit(params.seed)), col("id"))))
        .filter(col("_rk") <= element_at(
          typedlit(splits.toSeq), col("cluster") + 1))
        .select(col("cluster"), col("_rk"), col("vector"))
        .as[(Int, Int, Array[Float])].collect()
      var sub: Map[Int, Array[Array[Float]]] = hot.iterator.map { c =>
        val rows = initRows.filter(_._1 == c).sortBy(_._2).map(_._3)
        c -> Array.tabulate(splits(c))(j => rows(j % rows.length))
      }.toMap
      // Lloyd's over all hot cells at once: per-row argmin over the
      // row's own cell's sub-centroids, then per-(cell, sub) means
      val meanAgg = new graft.operators.VectorMean(dim).toColumn
      for (_ <- 0 until iterations) {
        val bcSub = spark.sparkContext.broadcast(sub)
        val means = hotRows
          .select(col("cluster").cast("int"), col("vector").cast("array<float>"))
          .as[(Int, Array[Float])]
          .map { case (c, v) =>
            val cents = bcSub.value(c)
            var best = 0; var bestD = Double.MaxValue; var j = 0
            while (j < cents.length) {
              val d = sqDistLocal(cents(j), v)
              if (d < bestD) { bestD = d; best = j }
              j += 1
            }
            ((c, best), v)
          }
          .groupByKey(_._1).mapValues(_._2)
          .agg(meanAgg.name("mean"))
          .collect().toMap
        sub = sub.map { case (c, cents) =>
          c -> Array.tabulate(cents.length)(j =>
            means.getOrElse((c, j), cents(j))) // empty sub-cell: keep
        }
      }
      val newCents = new Array[Array[Float]](offsets.last)
      for (c <- 0 until k0) {
        if (hot(c)) {
          val cents = sub(c)
          var j = 0
          while (j < cents.length) { newCents(offsets(c) + j) = cents(j); j += 1 }
        } else newCents(offsets(c)) = centroids(c)
      }
      // final renumber: one narrow map (cold rows shift, hot rows argmin
      // into their cell's sub-centroids)
      val bcSub = spark.sparkContext.broadcast(sub)
      val bcOff = spark.sparkContext.broadcast(offsets)
      val newIndexed = indexed
        .select(col("id").cast("long"), col("vector").cast("array<float>"),
          col("cluster").cast("int"))
        .as[(Long, Array[Float], Int)]
        .map { case (id, v, c) =>
          val off = bcOff.value(c)
          val cents = bcSub.value.getOrElse(c, null)
          val nc =
            if (cents == null) off
            else {
              var best = 0; var bestD = Double.MaxValue; var j = 0
              while (j < cents.length) {
                val d = sqDistLocal(cents(j), v)
                if (d < bestD) { bestD = d; best = j }
                j += 1
              }
              off + best
            }
          (id, v, nc)
        }
        .toDF("id", "vector", "cluster")
      val sizes = new Array[Long](offsets.last)
      newIndexed.groupBy("cluster").count().collect()
        .foreach(r => sizes(r.getInt(0)) = r.getLong(1))
      Model(params.copy(k = offsets.last), newCents, sizes, newIndexed)
    }

    /** Persist: corpus partitioned by cluster (→ partition pruning on
      * probe), centroids as parquet, params as JSON (SURVEY §2.2 mapping
      * of base.rs:31-58). */
    def save(dir: String): Unit = {
      val spark = indexed.sparkSession
      import spark.implicits._
      // disjoint files — overlap the corpus write with the 1-task
      // centroid sidecar write (guide §2.6, Overlap scaladoc)
      Overlap.par2(
        indexed.write.mode("overwrite").partitionBy("cluster")
          .parquet(s"$dir/indexed"),
        centroids.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
          .toDF("cluster", "vector")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids"))
      ParamsIO.write(spark, dir,
        s"""{"k":${params.k},"numAttempts":${params.numAttempts},"maxIterations":${params.maxIterations},"seed":${params.seed},"tol":${params.tol},"sizes":${ParamsIO.longsJson(clusterSizes)}}""")
    }

    /** Pre-pay serving residency ([[Residency.warm]]): persist the
      * indexed frame if nothing holds its blocks yet (a [[IVFFlat.load]]
      * tier scans parquet) and touch every block, so the FIRST query —
      * after a load, or after a big same-JVM scan spilled the blocks to
      * disk — serves at steady state instead of paying the ~3× re-warm
      * the 100M smokes measured. Idempotent; returns this model. */
    def warm(): Model = { Residency.warm(indexed); this }

    /** Release the indexed frame's storage ([[Residency.cool]] — the
      * caveats there: a cache-backed frame recomputes on next use, a
      * checkpoint-backed one is dead after cooling). */
    def cool(): Unit = Residency.cool(indexed)
  }

  /** Shared adaptive probe-widening (single-query and batch paths MUST
    * agree — ivfflat.rs:168-195 semantics, saturating subtraction). */
  private[graft] def probeOrder(cents: Array[Array[Float]], sizes: Array[Long],
                                q: Array[Float], k: Int, minProbe: Int): Seq[Int] = {
    val order = cents.indices.sortBy(c => sqDistLocal(cents(c), q))
    var need = k.toLong
    val out = Seq.newBuilder[Int]
    var taken = 0
    for (c <- order if need > 0 || taken < minProbe) {
      out += c; taken += 1
      need -= math.min(sizes(c), need) // saturate at 0: no underflow
    }
    out.result()
  }

  private[graft] def sqDistLocal(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** Narrow per-row argmin over broadcast centroids (ivfflat.rs:29-46). */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Array[Float]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    emb.select(col(idCol).cast("long").as("id"),
               col(vecCol).cast("array<float>").as("vector"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val cents = bc.value
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cents.length) {
          val d = sqDistLocal(cents(c), v)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (id, v, best)
      }
      .toDF("id", "vector", "cluster")
  }

  /** Multi-assignment for boundary vectors — the SemDeDup
    * cell-boundary repair (VERDICT r8 #3): a vector whose
    * second-nearest cell is within the margin (d₂ ≤ marginSq·d₁ on
    * squared distances, i.e. distance ratio ≤ √marginSq) is assigned
    * to BOTH cells, so an ε-duplicate pair straddling a k-means cell
    * boundary still shares a cell in the pair scan. Emits one row per
    * assigned cell plus the row's full sorted cell-set `cells` — pair
    * generators emit each pair once via the first-shared-cell rule
    * (cluster == min(cells_a ∩ cells_b), the
    * [[graft.operators.RangeJoin]] proration idiom). marginSq = 1
    * degenerates to single assignment (ties only); pair-space cost
    * grows by the boundary fraction, never quadratically. Same narrow
    * broadcast-centroid shape as [[assign]]. */
  def assignMulti(emb: DataFrame, idCol: String, vecCol: String,
                  centroids: Array[Array[Float]],
                  marginSq: Double = 1.5): DataFrame = {
    require(marginSq >= 1.0, s"marginSq must be >= 1, got $marginSq")
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    emb.select(col(idCol).cast("long").as("id"),
               col(vecCol).cast("array<float>").as("vector"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val cents = bc.value
        var best = 0; var bestD = Double.MaxValue
        var second = -1; var secondD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          val d = sqDistLocal(cents(c), v)
          if (d < bestD) {
            second = best; secondD = bestD
            best = c; bestD = d
          } else if (d < secondD) { second = c; secondD = d }
          c += 1
        }
        val cells =
          if (second >= 0 && secondD <= marginSq * bestD)
            Array(math.min(best, second), math.max(best, second))
          else Array(best)
        cells.map(cell => (id, v, cell, cells))
      }
      .toDF("id", "vector", "cluster", "cells")
  }

  /** One Lloyd's update step: per-cluster elementwise mean with the
    * reference's empty-cluster→zero-vector rule (ivfflat.rs:47-71),
    * via the [[graft.operators.VectorMean]] aggregator (map-side
    * partial sums). The production build delegates the full iteration
    * to MLlib; this exposes the primitive. */
  def updateCentroids(indexed: DataFrame, k: Int, dim: Int): Array[Array[Float]] = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val agg = new graft.operators.VectorMean(dim).toColumn
    val means = indexed.select(col("cluster").cast("int"), col("vector").cast("array<float>"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("mean"))
      .collect().toMap
    Array.tabulate(k)(c => means.getOrElse(c, new Array[Float](dim)))
  }

  /** Build via MLlib KMeans with the reference's restart-keep-best loop
    * (ivfflat.rs:102-136). tol=0 ≈ the bitwise-convergence rule
    * (ivfflat.rs:84-95). */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            params: Params): Model = {
    val feats = emb.select(
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vector"))
      .withColumn("features",
        array_to_vector(col("vector").cast("array<double>")))
      .cache()
    var best: KMeansModel = null
    var bestCost = Double.MaxValue
    for (attempt <- 0 until params.numAttempts) {
      val km = new KMeans()
        .setK(params.k).setMaxIter(params.maxIterations)
        .setTol(params.tol).setSeed(params.seed + attempt)
        .setFeaturesCol("features")
      val m = km.fit(feats)
      val cost = m.summary.trainingCost
      if (cost < bestCost) { bestCost = cost; best = m }
    }
    val centroids = best.clusterCenters.map(_.toArray.map(_.toFloat))
    val indexed = assign(feats.drop("features"), "id", "vector", centroids)
      .cache()
    val sizes = new Array[Long](params.k)
    indexed.groupBy("cluster").count().collect()
      .foreach(r => sizes(r.getInt(0)) = r.getLong(1))
    feats.unpersist()
    Model(params, centroids, sizes, indexed)
  }

  /** Reload a saved index (base.rs:45-58 mapping). */
  def load(spark: SparkSession, dir: String): Model = {
    val json = ParamsIO.read(spark, dir)
    def intOf(key: String): Long = ParamsIO.num(json, key)
    val params = Params(intOf("k").toInt, intOf("numAttempts").toInt,
      intOf("maxIterations").toInt, intOf("seed"),
      ParamsIO.dbl(json, "tol", 1e-6))
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cluster").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("vector").toArray)
    val indexed = spark.read.parquet(s"$dir/indexed")
      .select(col("id"), col("vector"), col("cluster").cast("int").as("cluster"))
    // sizes ride in the sidecar (save writes them): no full-corpus
    // recount job at load. Fall back to the count for pre-field dirs.
    val sizes = ParamsIO.longs(json, "sizes").getOrElse {
      val s = new Array[Long](params.k)
      indexed.groupBy("cluster").count().collect()
        .foreach(r => s(r.getInt(0)) = r.getLong(1))
      s
    }
    Model(params, cents, sizes, indexed)
  }
}
