package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale dedup smoke: the dedup suite's oracle queries run on the
  * 5k-doc sf0.1 `documents` table, so this is where the 100 TB join
  * shapes face real volume — a seeded ~1M-doc synthetic corpus with
  * PLANTED near-dup pairs (dup = base doc with ~3% of tokens mutated;
  * embedding dup = base vector + ε noise), measuring per-operator wall
  * seconds, shuffle-write bytes, result size, and planted-pair recall.
  * Prints one JSON line; numbers are committed to BASELINE.md.
  *
  * The planted mutation rates sit deliberately NEAR each fingerprint's
  * sensitivity knee (3 token edits ≈ a few flipped simhash bits, Jaccard
  * ≈ 0.8) so recall is a measured property of the operator, not a
  * tautology.
  *
  * Usage: sbt "runMain graft.DedupScaleSmoke [nBase] [nDup] [lshLeaf]"
  * (SPARK_DRIVER_MEM=24g recommended at the 1M default). lshLeaf bounds
  * the embed_lsh bucket size — dedup pays ~leaf²/2 scored pairs per
  * leaf, so unlike ANN search it wants SMALL leaves (default 256).
  */
// Serializable: the corpus-generator lambdas call the (non-inlinable,
// recursive) local docTokens, whose lifted form drags the module into
// the closure — the module is stateless, so shipping it is free.
object DedupScaleSmoke extends Serializable {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toInt else 1000000
    val nDup = if (args.length > 1) args(1).toInt else 10000
    val lshLeaf = if (args.length > 2) args(2).toInt else 256
    val docLen = 100
    val vocab = 50000L
    val mutPct = 3L // ≈3 of 100 tokens mutated per planted dup
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

    // shuffle-write bytes per phase via listener deltas (local mode:
    // write side == read side; events drain within the settle sleep)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    // ---- text corpus: doc = 100 tokens from a 50k vocab, pure function
    // of id; ids ≥ nBase are planted dups of base (j*97 % nBase) with
    // ~mutPct% tokens replaced (distinct "m" prefix ⇒ guaranteed change)
    def docTokens(id: Long): Array[String] = {
      if (id < nBase) {
        Array.tabulate(docLen)(p =>
          "w" + java.lang.Long.remainderUnsigned(
            mix64(id * 1000003L + p * 7919L + seed), vocab))
      } else {
        val j = id - nBase
        val base = docTokens((j * 97L) % nBase)
        var p = 0
        while (p < docLen) {
          if (java.lang.Long.remainderUnsigned(
              mix64(0x5EEDL + j * 31L + p * 131L), 100L) < mutPct)
            base(p) = "m" + java.lang.Long.remainderUnsigned(
              mix64(j * 17L + p * 13L + seed), vocab)
          p += 1
        }
        base
      }
    }
    val docs = spark.range(nBase + nDup).as[Long]
      .map(id => (id, docTokens(id).mkString(" ")))
      .toDF("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    docs.count()
    // planted text pairs: (base, nBase + j); j*97 < nBase for the default
    // sizes so bases are distinct and doc_a < doc_b always holds
    val planted = spark.range(nDup).as[Long]
      .map(j => ((j * 97L) % nBase, nBase + j)).toDF("doc_a", "doc_b")
      .cache()
    planted.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n_base" -> nBase.toString += "n_dup" -> nDup.toString

    // SPARK_GRAFT_PHASES=minhash,jaccard,… runs a subset — the 10M
    // budget rows run ONE phase per JVM so no single run's shuffle
    // scratch exceeds the box's /tmp (a 10M jaccard alone is tens of
    // GB in flight). emit() prints the accumulated metrics after every
    // phase so a crashed run still yields its completed rows.
    val phasesEnv: Option[Set[String]] = sys.env.get("SPARK_GRAFT_PHASES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def phaseOn(name: String): Boolean = phasesEnv.forall(_.contains(name))
    def emit(): Unit =
      println(out.map { case (kk, vv) => s""""$kk":$vv""" }
        .mkString("DEDUP_SMOKE_PARTIAL {", ",", "}"))

    def phase(name: String, plantedDf: DataFrame, nPlanted: Int)
             (op: => DataFrame): Unit = {
      Thread.sleep(500) // settle listener events from the previous phase
      val before = shuffleBytes.get()
      val (res, t) = timed { val df = op; df.count(); df }
      Thread.sleep(500)
      val sb = shuffleBytes.get() - before
      val found = res.count()
      val hit = res.select(col(res.columns(0)).as("doc_a"),
          col(res.columns(1)).as("doc_b"))
        .join(plantedDf, Seq("doc_a", "doc_b")).count()
      out += s"${name}_s" -> f"$t%.1f"
      out += s"${name}_shuffle_mb" -> (sb / (1L << 20)).toString
      out += s"${name}_pairs" -> found.toString
      out += s"${name}_planted_recall" -> f"${hit.toDouble / nPlanted}%.3f"
      // let the ContextCleaner reclaim the finished phase's shuffle
      // files: with a large heap the driver may not GC for the whole
      // run, and accumulated shuffle scratch across ~10 phases is what
      // fills /tmp at 10M docs (measured: ENOSPC on a 10M run)
      System.gc()
      emit()
    }

    if (phaseOn("minhash")) phase("minhash", planted, nDup) {
      operators.Dedup.minhashBandPairs(docs, "doc_id", "text",
        numHashes = 12, bandSize = 2)
    }

    // pair → component → drop: the end-to-end dedup pipeline at corpus
    // scale. The planted graph is 10k disjoint (base, dup) edges plus
    // whatever the banding adds, so propagation converges in ~2 rounds;
    // survivors ≈ corpus − recalled planted dups.
    if (phaseOn("components")) {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val (survivors, t) = timed {
        val pairs = operators.Dedup.minhashBandPairs(docs, "doc_id", "text",
          numHashes = 12, bandSize = 2)
        operators.Dedup.keepFirstByPairs(docs, "doc_id", pairs,
          "doc_a", "doc_b").count()
      }
      Thread.sleep(500)
      out += "components_keepfirst_s" -> f"$t%.1f"
      out += "components_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += "components_survivors" -> survivors.toString
      System.gc(); emit()
    }
    // streaming-admission rule at corpus scale: drop iff any band
    // bucket is shared with a lower id (the dedup_prefix_keepfirst
    // batch face; StreamingSpec pins stream == batch, so these numbers
    // ARE the streaming ingest filter's scale envelope). Every planted
    // dup's base has a lower id, so planted drop-recall mirrors the
    // banding recall above.
    if (phaseOn("prefix")) {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val (res, t) = timed {
        val admitted = operators.Dedup.prefixKeepFirst(docs, "doc_id", "text")
        admitted.count(); admitted
      }
      Thread.sleep(500)
      val survivingDups = res.filter(col("doc_id") >= nBase).count()
      out += "prefix_keepfirst_s" -> f"$t%.1f"
      out += "prefix_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += "prefix_survivors" -> res.count().toString
      out += "prefix_planted_drop_recall" ->
        f"${(nDup - survivingDups).toDouble / nDup}%.3f"
      System.gc(); emit()
    }

    if (phaseOn("simhash")) phase("simhash64_h3", planted, nDup) {
      operators.Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3, bits = 64)
    }
    if (phaseOn("jaccard")) phase("jaccard_capped", planted, nDup) {
      operators.Dedup.jaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, dfCap = 100)
    }

    // ---- hot-shingle insurance: the dfCap blacklist has held every
    // posting list ≤ cap in the 1M run, but that corpus never PLANTED a
    // stop-shingle hot enough to trigger it. Here 30% of a smaller
    // corpus (uncapped must stay runnable — its intersect join pays
    // C(0.3·n, 2) rows for the one hot shingle, quadratic in n) share
    // one injected 3-token shingle; capped-vs-uncapped wall and shuffle
    // is the insurance payout, measured. Near-dup RESULTS are identical
    // either side: one shared shingle of ~100 puts Jaccard ≈ 0.005,
    // nowhere near threshold — the hot shingle is pure join poison.
    if (phaseOn("hot")) {
    val nHot = math.min(nBase, 20000)
    val hotDocs = spark.range(nHot).as[Long].map { id =>
      val toks = docTokens(id)
      val hot = java.lang.Long.remainderUnsigned(mix64(id ^ 0xB00L), 10L) < 3L
      val txt = if (hot)
        (toks.take(50) ++ Array("stopa", "stopb", "stopc") ++ toks.drop(50))
          .mkString(" ")
      else toks.mkString(" ")
      (id, txt)
    }.toDF("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    hotDocs.count()
    out += "hot_n" -> nHot.toString
    def hotPhase(name: String)(op: => DataFrame): Unit = {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val (res, t) = timed { val df = op; df.count(); df }
      Thread.sleep(500)
      out += s"${name}_s" -> f"$t%.1f"
      out += s"${name}_shuffle_mb" -> ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += s"${name}_pairs" -> res.count().toString
    }
    hotPhase("jac_hot_uncapped") {
      operators.Dedup.jaccardPairs(hotDocs, "doc_id", "text", threshold = 0.5)
    }
    hotPhase("jac_hot_capped") {
      operators.Dedup.jaccardPairs(hotDocs, "doc_id", "text",
        threshold = 0.5, dfCap = 100)
    }
    hotDocs.unpersist()
    System.gc(); emit()
    }

    // ---- the curation chain (pipeline_curate's exact stage order) at
    // 1M docs: langid gate (a stopword prefix makes the synthetic
    // corpus detectably English — the gate itself still runs full
    // tokenize+argmax work per doc), quality gate, per-source cap with
    // a deliberately HOT source (10% of the corpus in one source —
    // the bounded-heap fold's reason to exist), normalized exact
    // dedup, group-aware split. Measures the composed wall + shuffle,
    // not per-stage (the stages are individually phased elsewhere).
    if (phaseOn("curate")) {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val cdocs = docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 0, lit("hot"))
          .otherwise(concat(lit("s"), pmod(col("doc_id"), lit(4096))))
          .as("source"),
        concat(lit("the and of in to "), col("text")).as("text"))
      val (survivors, t) = timed {
        val gated = cdocs
          .withColumn("lang_pred", operators.TextOps.langId(col("text")))
          .withColumn("quality", operators.TextOps.qualityScore(col("text")))
          .filter(col("lang_pred") =!= "und" && col("quality") >= lit(0.5))
          .localCheckpoint(true) // gate once: sourceCap reads it twice
        val capped = operators.TermStats.sourceCap(
          gated, "doc_id", "source", "text", cap = 20)
        val deduped = operators.Dedup.exactKeepFirst(
          capped.withColumn("norm_h",
            md5(operators.TextOps.normalizeText(col("text")))),
          "doc_id", Seq("norm_h"))
        operators.Splits.assignByGroup(deduped, "source").count()
      }
      out += "curate_s" -> f"$t%.1f"
      out += "curate_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += "curate_survivors" -> survivors.toString
      System.gc(); emit()
    }

    // ---- sketches at corpus scale: the constant-shuffle answers next
    // to their exact twins. HLL vs exact distinct over ~98M 3-shingle
    // occurrences (the exact pass shuffles every distinct shingle
    // string; the sketch shuffles ≤ 2^p two-int rows), and a Bloom
    // membership pass over the train split's doc digests probed by the
    // whole corpus (fp-calibration at 1M keys; planted dups are
    // mutated, so true cross-split digest hits are ~0 by construction).
    if (phaseOn("sketches")) {
      val ex = docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, t) =>
          operators.TextHashFast.shingles3(
            operators.TextHashFast.tokenize(t)).map(s => (id, s))
        }.toDF("doc_id", "s")

      Thread.sleep(500)
      var before = shuffleBytes.get()
      val (nExact, tExact) = timed { ex.select("s").distinct().count() }
      out += "distinct_exact_s" -> f"$tExact%.1f"
      out += "distinct_exact_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += "distinct_exact_n" -> nExact.toString

      Thread.sleep(500)
      before = shuffleBytes.get()
      val (est, tHll) = timed {
        operators.Sketches.hllEstimate(
            operators.Sketches.hllRegisters(ex, "s", p = 12), p = 12)
          .head().getAs[Double]("estimate")
      }
      out += "hll_s" -> f"$tHll%.1f"
      out += "hll_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += "hll_est" -> f"$est%.0f"
      out += "hll_rel_err" -> f"${math.abs(est - nExact) / nExact}%.4f"

      Thread.sleep(500)
      before = shuffleBytes.get()
      val dig = docs.select(col("doc_id"),
        md5(operators.TextOps.normalizeText(col("text"))).as("h"))
      val sp = operators.Splits.assign(docs, "doc_id")
        .select(col("doc_id"), col("split"))
      val (flagged, tBloom) = timed {
        val train = dig.join(sp.filter(col("split") === "train"), "doc_id")
          .select("h")
          .localCheckpoint(true)
        // size the bitmap from the key count — a fixed logm=24 at 8.1M
        // train keys is fp ~ 0.37 (the r10 10M run's failure mode)
        val logm = operators.Sketches.bloomLogmFor(
          math.max(1L, train.count()), k = 3, targetFp = 0.01)
        out += "bloom_logm" -> logm.toString
        val bloom = operators.Sketches.bloomBuild(train, "h", logm = logm, k = 3)
          .localCheckpoint(true)
        val probe = dig.join(sp.filter(col("split") === "test"), "doc_id")
        operators.Sketches.bloomProbe(bloom, probe, "h", logm = logm, k = 3)
          .filter(col("maybe_member")).count()
      }
      val nTest = sp.filter(col("split") === "test").count()
      out += "bloom_s" -> f"$tBloom%.1f"
      out += "bloom_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += "bloom_flagged" -> flagged.toString
      out += "bloom_probe_n" -> nTest.toString
      System.gc(); emit()
    }

    // ---- embedding corpus: clustered unit vectors (128 centers, the
    // ScaleSmoke regime — same-cluster background pairs sit at cosine
    // distance ≈ 0.2); planted dup = base + ε noise ⇒ distance ≈ 1e-5,
    // so maxCosDist = 0.05 separates planted pairs from the background.
    // SPARK_GRAFT_SKIP_EMBED=1 skips this section — the 10M text-dedup
    // budget run's knob (the embedding ops have their own 1M smokes;
    // at 10M the extra vector corpus + LSH scoring is scratch-disk
    // pressure without new information).
    if (!phaseOn("embed") ||
        sys.env.get("SPARK_GRAFT_SKIP_EMBED").exists(_ == "1")) {
      println(out.map { case (kk, vv) => s""""$kk":$vv""" }
        .mkString("DEDUP_SMOKE {", ",", "}"))
      spark.stop()
      return
    }
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
    def genVec(id: Long, amp: Double, salt: Long): Array[Float] = {
      val c = math.floorMod(mix64(id ^ 0xABCDEFL), nClusters.toLong).toInt
      val v = new Array[Float](dim)
      var j = 0
      var norm = 0.0
      while (j < dim) {
        val h = mix64(id * 1315423911L + j * 2654435761L + seed + salt)
        val x = bcCenters.value(c)(j) +
          ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0) * amp
        v(j) = x.toFloat; norm += x * x; j += 1
      }
      val inv = (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
      v
    }
    val emb = spark.range(nBase + nDup).as[Long].mapPartitions { it =>
      it.map { id =>
        if (id < nBase) (id, genVec(id, noiseAmp, 0L))
        else {
          // dup of base b: same base vector plus ε perturbation
          val j = id - nBase
          val b = (j * 97L) % nBase
          val v = genVec(b, noiseAmp, 0L)
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
    docs.unpersist()

    phase("embed_lsh", planted, nDup) {
      operators.Dedup.embeddingPairsViaLSH(emb, "vec_id", "embedding",
        maxCosDist = 0.05,
        graft.index.LSHForest.Params(numTrees = 8, maxNodeSize = lshLeaf))
    }
    out += "embed_lsh_leaf" -> lshLeaf.toString

    println(out.map { case (kk, vv) => s""""$kk":$vv""" }
      .mkString("DEDUP_SMOKE {", ",", "}"))
    spark.stop()
  }
}
