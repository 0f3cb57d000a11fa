package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Late-interaction (MaxSim) serving at scale — the evidence run for
  * the ANN-backed stage 1 ([[operators.LateInteraction.maxSimIvf]] /
  * `maxSimSq8`): before r12, every MaxSim batch scanned ALL corpus
  * token embeddings (the engine's last per-batch full-corpus serving
  * face; the 10M smoke had to cap MaxSim at 100k docs). Two parts:
  *
  *  - **Head-to-head** (fixed 100k docs × 100 tokens = 10M token
  *    embeddings, 50k vocab — the corpus of the committed r11 row):
  *    exhaustive-shortlist serve vs IVF-probed serve vs SQ8-probed
  *    serve, same m, same truth. The IVF rows must match or beat the
  *    exhaustive row's recall at a fraction of its wall.
  *
  *  - **Scale** (`nDocs` arg × 100 tokens; 1M docs = 100M token
  *    embeddings): serve with the probe budget tuned to CONSTANT
  *    probed-token volume per query token (nprobe/k × corpusTokens ≈
  *    the head-to-head's 1.25M) — the 100 TB serving contract: wall
  *    tracks what you PROBE, not what you STORE. The scale corpus
  *    draws from a vocab ∝ corpus size so per-term multiplicity stays
  *    ~200 copies (the fixed-vocab corpus ties 10× more copies of
  *    every term at the same hash-embedding dot — a synthetic-corpus
  *    artifact that would conflate shortlist-tie crowding with the
  *    serving-scan question this smoke isolates; BASELINE documents
  *    the m-vs-multiplicity lever separately). Build is the
  *    corpus-scale recipe: sample-trained k-means + one narrow
  *    assign pass (`trainFraction`).
  *
  * Prints MAXSIM_SMOKE_PARTIAL per phase and a MAXSIM_SMOKE final
  * line; numbers go to BASELINE.md.
  *
  * Usage: sbt "runMain graft.MaxSimScaleSmoke [nDocs]"
  */
object MaxSimScaleSmoke extends Serializable {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Deterministic standard gaussian via Box–Muller over two hash
    * uniforms (the RotScaleSmoke generator's primitive). */
  @inline private def gauss(seed: Long): Double = {
    val u1 = ((mix64(seed) >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    val u2 = ((mix64(seed ^ 0x9E3779B97F4A7C15L) >>> 11).toDouble + 0.5) /
      (1L << 53).toDouble
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val docLen = 100
    val nq = 50
    val seed = 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      // The smoke MEASURES deliberately-unpruned serving configs (the
      // m/cap lever sweeps: cap=∞ at m=1024 is ~5M probe rows for the
      // 50-query batch at 20M tokens) — opt into a measurement-sized
      // serving budget so the production gate (Batches, r14/r15) does
      // not refuse the very rows the sweep exists to price. Production
      // callers keep the default 1M-row budget.
      .config(graft.index.Batches.MaxBatchKey, (1 << 24).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val inputBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n_docs" -> nDocs.toString
    def emit(): Unit =
      println(out.map { case (kk, vv) => s""""$kk":$vv""" }
        .mkString("MAXSIM_SMOKE_PARTIAL {", ",", "}"))
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def phase[T](name: String)(f: => T): T = {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val beforeIn = inputBytes.get()
      val (r, t) = timed(f)
      Thread.sleep(500)
      out += s"${name}_s" -> f"$t%.1f"
      out += s"${name}_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += s"${name}_read_mb" ->
        ((inputBytes.get() - beforeIn) / (1L << 20)).toString
      emit()
      r
    }

    // corpus generator: doc = docLen tokens from a `vocab`-sized
    // w-prefixed pool, pure function of id (the RetrievalScaleSmoke
    // recipe, vocab parameterized)
    def docTokens(id: Long, vocab: Long): Array[String] =
      Array.tabulate(docLen)(p => "w" + java.lang.Long.remainderUnsigned(
        mix64(id * 1000003L + p * 7919L + seed), vocab))
    def corpusOf(n: Long, vocab: Long) = {
      val d = spark.range(n).as[Long]
        .map(id => (id, docTokens(id, vocab).mkString(" ")))
        .toDF("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
      d
    }
    // queries: 10 tokens sampled from a known base doc — the base doc
    // must rank 1 (same truth construction as the retrieval smoke)
    def queriesOf(n: Long, vocab: Long, stride: Long) = {
      val rows = (0 until nq).map { j =>
        val b = (j * stride) % n
        (j.toLong, b, docTokens(b, vocab).take(10).mkString(" "))
      }
      val qdf = rows.map { case (q, _, t) => (q, t) }.toDF("qid", "text")
      val qToks = operators.LateInteraction
        .tokenVectors(qdf, "qid", "text")
        .withColumnRenamed("doc_id", "qid").localCheckpoint(true)
      (qToks, rows.map { case (q, b, _) => (q, b) }.toDF("qid", "base"))
    }
    def recallAt1(top: org.apache.spark.sql.DataFrame,
                  truth: org.apache.spark.sql.DataFrame): Double = {
      val hits = top.filter(col("rank") === 1).join(truth, Seq("qid"))
        .filter(col("doc_id") === col("base")).count()
      hits.toDouble / nq
    }

    // ---------------- part A: head-to-head at 10M tokens ----------------
    val skipA = sys.env.get("SPARK_GRAFT_MAXSIM_SKIP_A").contains("1")
    val nA = math.min(nDocs, 100000L)
    val vocabA = 50000L
    if (!skipA) {
    val aToks = phase("a_embed") {
      val t = operators.LateInteraction
        .tokenVectors(corpusOf(nA, vocabA), "doc_id", "text")
        .localCheckpoint(true)
      out += "a_corpus_tokens" -> t.count().toString
      t
    }
    val (aQ, aTruth) = queriesOf(nA, vocabA, 9973L)
    phase("a_exhaustive_serve") {
      val top = operators.LateInteraction.maxSimShortlisted(aQ, "qid",
        "tok_idx", "vec", aToks, "doc_id", "vec", k = 10, m = 1024)
      out += "a_exhaustive_recall_at1" -> f"${recallAt1(top, aTruth)}%.3f"
    }
    val aIvf = phase("a_ivf_build") {
      operators.LateInteraction.buildTokenIvf(aToks, "doc_id", "tok_idx",
        "vec", graft.index.IVFFlat.Params(k = 256, numAttempts = 1,
          maxIterations = 4),
        trainFraction = math.min(1.0, 2e6 / (nA * docLen).toDouble))
    }
    phase("a_ivf_serve") {
      val top = operators.LateInteraction.maxSimIvf(aQ, "qid", "tok_idx",
        "vec", aToks, "doc_id", "vec", aIvf, k = 10, m = 1024, nprobe = 32)
      out += "a_ivf_recall_at1" -> f"${recallAt1(top, aTruth)}%.3f"
    }
    // optional PLAID-cap row on the head-to-head corpus: first value
    // of SPARK_GRAFT_MAXSIM_CAP (>0) serves the IVF face pruned
    sys.env.get("SPARK_GRAFT_MAXSIM_CAP")
      .map(_.split(",").head.trim.toInt).filter(_ > 0).foreach { cp =>
        phase(s"a_ivf_serve_c$cp") {
          val top = operators.LateInteraction.maxSimIvf(aQ, "qid",
            "tok_idx", "vec", aToks, "doc_id", "vec", aIvf, k = 10,
            m = 1024, nprobe = 32, cap = cp)
          out += s"a_ivf_recall_at1_c$cp" ->
            f"${recallAt1(top, aTruth)}%.3f"
        }
      }
    // compress materializes the code table eagerly (library contract
    // since r15), so the serve phase measures probing byte codes, not
    // quantize-on-the-fly
    val aSq8 = phase("a_sq8_compress") { aIvf.compress() }
    phase("a_sq8_serve") {
      val top = operators.LateInteraction.maxSimSq8(aQ, "qid", "tok_idx",
        "vec", aToks, "doc_id", "vec", aSq8, k = 10, m = 1024, nprobe = 32)
      out += "a_sq8_recall_at1" -> f"${recallAt1(top, aTruth)}%.3f"
    }
    // residual-PQ head-to-head row (SPARK_GRAFT_MAXSIM_PQ=1): the same
    // coarse cells, stage 1 over m-byte residual-ADC codes at the SAME
    // m/nprobe as the IVF and SQ8 rows — the storage-tier A/B
    // (ColBERTv2's residual compression vs plain byte quantization)
    if (sys.env.get("SPARK_GRAFT_MAXSIM_PQ").contains("1")) {
      val aPq = phase("a_pq_compress") {
        // augmented dim 17 pads to 20 → m = 4 (dsub 5): 4 B/token
        // codes vs 17 B SQ8 vs 68 B float — codebooks Lloyd's-trained
        // on a ~2M-row sample; codes materialize eagerly in the library
        aIvf.compressPq(graft.index.PQ.Params(m = 4, k = 256,
          iterations = 4, seed = 7L),
          codebookTrainFraction =
            math.min(1.0, 2e6 / (nA * docLen).toDouble))
      }
      phase("a_pq_serve") {
        val top = operators.LateInteraction.maxSimPq(aQ, "qid", "tok_idx",
          "vec", aToks, "doc_id", "vec", aPq, k = 10, m = 1024, nprobe = 32)
        out += "a_pq_recall_at1" -> f"${recallAt1(top, aTruth)}%.3f"
      }
    }
    // streaming-ingest throughput on the token ANN tier
    // (SPARK_GRAFT_MAXSIM_INGEST=1): the ingestIntoTokenIvf
    // foreachBatch body — embed the arriving docs, trusted-bound add
    // under frozen centroids, Lineage-cadence compaction — driven
    // batch-by-batch against a live tier (the ScaleSmoke ingest-phase
    // shape). Seed = first 10% of docs; bound = the full corpus's
    // norm ceiling (the production maxNormBound contract, so every
    // batch is contractually under it and trustedBound skips the
    // per-batch guard job).
    if (sys.env.get("SPARK_GRAFT_MAXSIM_INGEST").contains("1")) {
      val seedDocs = nA / 10
      val bound = aToks.agg(max(sqrt(graft.functions.VectorOps.dot(
        col("vec"), col("vec"))))).head().getDouble(0)
      val seed = phase("a_ingest_seed_build") {
        operators.LateInteraction.buildTokenIvf(
          aToks.filter(col("doc_id") < seedDocs), "doc_id", "tok_idx",
          "vec", graft.index.IVFFlat.Params(k = 256, numAttempts = 1,
            maxIterations = 4),
          trainFraction =
            math.min(1.0, 2e6 / (seedDocs * docLen).toDouble),
          maxNormBound = bound)
      }
      val nBatches = 9
      val perBatch = (nA - seedDocs) / nBatches
      var live = seed
      phase("a_ingest") {
        val raw = corpusOf(nA, vocabA)
        val (nTok, tI) = timed {
          (0 until nBatches).foreach { b =>
            val lo = seedDocs + b * perBatch
            val hi = if (b == nBatches - 1) nA else lo + perBatch
            // the foreachBatch body verbatim: embed this batch's docs,
            // checkpoint the partial, trusted add to the live tier
            val part = operators.LateInteraction.tokenVectors(
                raw.filter(col("doc_id") >= lo && col("doc_id") < hi),
                "doc_id", "text")
              .localCheckpoint(true)
            live = live.add(part, "doc_id", "tok_idx", "vec",
              trustedBound = true)
          }
          live.ivf.indexed.count()
        }
        val ingested = (nA - seedDocs) * docLen
        out += "a_ingest_tokens_total" -> nTok.toString
        out += "a_ingest_rows_per_s" -> f"${ingested.toDouble / tI}%.0f"
      }
      // serve-snapshot recall parity with the one-shot built tier
      phase("a_ingest_serve") {
        val top = operators.LateInteraction.maxSimIvf(aQ, "qid",
          "tok_idx", "vec", aToks, "doc_id", "vec", live, k = 10,
          m = 1024, nprobe = 32)
        out += "a_ingest_recall_at1" -> f"${recallAt1(top, aTruth)}%.3f"
      }
      // PQ-TIER streaming ingest (SPARK_GRAFT_MAXSIM_PQ=1 too): the
      // ingestIntoTokenPq foreachBatch body at scale — arriving token
      // batches ENCODE against the seed's frozen coarse grid +
      // codebooks (IVFPQ.add's fused assign+encode pass; 4 B/token
      // written per row), trustedBound skips the per-microbatch norm
      // guard. rows/s + serve-snapshot recall against the same truth.
      if (sys.env.get("SPARK_GRAFT_MAXSIM_PQ").contains("1")) {
        val seedPq = phase("a_pq_ingest_seed") {
          seed.compressPq(graft.index.PQ.Params(m = 4, k = 256,
            iterations = 4, seed = 7L),
            codebookTrainFraction =
              math.min(1.0, 2e6 / (seedDocs * docLen).toDouble))
        }
        var livePq = seedPq
        phase("a_pq_ingest") {
          val raw = corpusOf(nA, vocabA)
          val (nCodes, tI) = timed {
            (0 until nBatches).foreach { b =>
              val lo = seedDocs + b * perBatch
              val hi = if (b == nBatches - 1) nA else lo + perBatch
              val part = operators.LateInteraction.tokenVectors(
                  raw.filter(col("doc_id") >= lo && col("doc_id") < hi),
                  "doc_id", "text")
                .localCheckpoint(true)
              livePq = livePq.add(part, "doc_id", "tok_idx", "vec",
                trustedBound = true)
            }
            livePq.pq.codes.count()
          }
          val ingested = (nA - seedDocs) * docLen
          out += "a_pq_ingest_codes_total" -> nCodes.toString
          out += "a_pq_ingest_rows_per_s" -> f"${ingested.toDouble / tI}%.0f"
        }
        phase("a_pq_ingest_serve") {
          val top = operators.LateInteraction.maxSimPq(aQ, "qid",
            "tok_idx", "vec", aToks, "doc_id", "vec", livePq, k = 10,
            m = 1024, nprobe = 32)
          out += "a_pq_ingest_recall_at1" ->
            f"${recallAt1(top, aTruth)}%.3f"
        }
      }
      seed.cool()
    }
    aIvf.cool()
    }

    // ---------------- part B: scale with constant probed volume ----------------
    if (nDocs > nA) {
      // vocab ∝ corpus keeps per-term multiplicity ~200 (see scaladoc)
      val vocabB = nDocs * docLen / 200L
      // DEFAULT eval corpus (r15): the decaying-spectrum CLUSTERED
      // distribution (the RotScaleSmoke generator, reshaped to token
      // bags). The legacy hash-derived uniform synthetic sits behind
      // SPARK_GRAFT_MAXSIM_UNIFORM=1, kept only to document its tie
      // artifact: it tie-crowds at 100M tokens — distinct terms
      // collide into IDENTICAL token vectors, so every tier's recall
      // row reads the same 0.54–0.62 plateau and quantization-recall
      // differences are unreadable at exactly the scale they matter.
      // Continuous clustered vectors have no ties: the float/SQ8/PQ
      // recall rows separate, and a tier > 0.05 under float at equal
      // config is a findable regression. Queries are 10 VERBATIM
      // tokens of a base doc (the same truth construction — the base
      // doc holds the per-token self-dot maximum, so rank 1 is the
      // expected truth).
      val spectrum =
        !sys.env.get("SPARK_GRAFT_MAXSIM_UNIFORM").contains("1")
      val dimT = 16
      val nClustersT = 256
      // broadcast materialized DRIVER-side before any closure captures
      // it (a lazy val would be forced on the executor, where the
      // deserialized session has no context)
      val bcTokCenters =
        if (spectrum) Some(spark.sparkContext.broadcast(
          Array.tabulate(nClustersT)(c => Array.tabulate(dimT)(j =>
            gauss(0xC0FFEEL + c * 7919L + j * 104729L + seed) /
              (1.0 + j / 2.0)))))
        else None
      // SPARK_GRAFT_MAXSIM_ZIPF=1: draw the token's cluster from a
      // log-uniform law (rank = floor((N+1)^u) − 1, P(rank r) ∝
      // 1/(r+1) — the Zipf s≈1 shape real token distributions have)
      // instead of uniformly: the head clusters then hold 10–30× the
      // mean mass and the coarse grid inherits the skew — the hot-cell
      // serving regime the splitHotCells lever targets.
      val zipf = sys.env.get("SPARK_GRAFT_MAXSIM_ZIPF").contains("1")
      def spectrumToks(n: Long): org.apache.spark.sql.DataFrame = {
        val bc = bcTokCenters.get
        spark.range(n * docLen).as[Long].mapPartitions { it =>
          val cents = bc.value
          it.map { tokId =>
            val c =
              if (zipf) {
                val u = ((mix64(tokId ^ 0xABCDEFL) >>> 11).toDouble + 0.5) /
                  (1L << 53).toDouble
                math.min(nClustersT - 1,
                  (math.pow(nClustersT + 1.0, u) - 1.0).toInt)
              } else math.floorMod(mix64(tokId ^ 0xABCDEFL),
                nClustersT.toLong).toInt
            val v = Array.tabulate(dimT) { j =>
              cents(c)(j) +
                0.35 * gauss(tokId * 1315423911L + j * 2654435761L +
                  seed) / (1.0 + j / 2.0)
            }
            // L2-normalize (the ColBERT token contract): the query's
            // verbatim self-token then attains the per-token MAXIMUM
            // dot (1.0) — the base doc IS the exact MaxSim truth, with
            // no unnormalized-MIPS "some high-norm token beats the
            // self-dot" failure and no hash-corpus tie plateau
            val nrm = math.sqrt(v.map(x => x * x).sum)
            val u = v.map(x => x / nrm)
            (tokId / docLen, tokId % docLen, u)
          }
        }.toDF("doc_id", "tok_idx", "vec")
      }
      if (spectrum) out += "b_spectrum" -> "1"
      if (zipf) out += "b_zipf" -> "1"
      val bToks = phase("b_embed") {
        val t = (if (spectrum) spectrumToks(nDocs)
          else operators.LateInteraction
            .tokenVectors(corpusOf(nDocs, vocabB), "doc_id", "text"))
          .localCheckpoint(true)
        out += "b_corpus_tokens" -> t.count().toString
        t
      }
      val (bQ, bTruth) = if (spectrum) {
        val basesDf = (0 until nq)
          .map(j => (j.toLong, (j * 99173L) % nDocs))
          .toDF("qid", "base")
        val qT = basesDf
          .join(bToks, basesDf("base") === bToks("doc_id") &&
            bToks("tok_idx") < 10)
          .select(col("qid"), col("tok_idx"), col("vec"))
          .localCheckpoint(true)
        (qT, basesDf)
      } else queriesOf(nDocs, vocabB, 99173L)
      val kB = 1024
      val bIvf = phase("b_ivf_build") {
        operators.LateInteraction.buildTokenIvf(bToks, "doc_id", "tok_idx",
          "vec", graft.index.IVFFlat.Params(k = kB, numAttempts = 1,
            maxIterations = 4),
          trainFraction = math.min(1.0, 2e6 / (nDocs * docLen).toDouble))
      }
      // probe budget sweep: the base point holds PROBED-TOKEN volume
      // per query token equal to part A's (32/256 × 10M = 1.25M), then
      // ×4 and ×16 trace the recall-vs-probe lever — the MIPS
      // augmentation coordinate flattens probe-order selectivity (the
      // XBOX transform's known geometry cost: √(M²−‖x‖²) dominates
      // cell placement for low-norm tokens), so the scale corpus needs
      // a deeper probe for the same recall; the wall increments per
      // extra probe measure the marginal cost of buying it back.
      val probedA = 1250000.0
      val nprobeB = math.max(1, math.ceil(
        probedA * kB / (nDocs * docLen).toDouble).toInt)
      out += "b_cells" -> kB.toString
      // cell-population skew of the built grid (free — driver state):
      // uniform draw reads max/mean ≈ 1–2; the Zipf draw's head cells
      // read 10–30× and are what the split lever below is for
      out += "b_cell_max" -> bIvf.ivf.clusterSizes.max.toString
      out += "b_cell_mean" -> (bIvf.ivf.clusterSizes.sum / kB).toString
      // sweep overrides: SPARK_GRAFT_MAXSIM_PROBES (csv nprobe list,
      // default base/×4/×16) and SPARK_GRAFT_MAXSIM_M (csv m list,
      // default 1024) — the two serving levers, measured independently
      val probes = sys.env.get("SPARK_GRAFT_MAXSIM_PROBES")
        .map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(nprobeB, nprobeB * 4, nprobeB * 16))
      val ms = sys.env.get("SPARK_GRAFT_MAXSIM_M")
        .map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(1024))
      // SPARK_GRAFT_MAXSIM_CAP (csv, 0 = unpruned): the PLAID
      // candidate-cap lever — at high m stage 2 is the wall (BASELINE
      // r12: m=4096 at 100M tokens) and the cap bounds it
      val caps = sys.env.get("SPARK_GRAFT_MAXSIM_CAP")
        .map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(0))
      // Every tier A/B serve row is measured TWICE: the first pass
      // re-warms storage-block residency (at 100M tokens the resident
      // frames oversubscribe the heap's storage pool, so whichever
      // phase runs first after a big scan pays block re-reads — the
      // r13 "SQ8 serve wall" was exactly this measurement-order
      // artifact, isolated r14 by interleaved repeats: sq8 114→47→36 s
      // with float controls degrading identically in between), and the
      // _warm row is the steady-state serving benchmark.
      def servedTwice(tag: String)(f: => org.apache.spark.sql.DataFrame)
      : Unit = {
        phase(tag) {
          out += tag.replace("_serve", "_recall_at1") ->
            f"${recallAt1(f, bTruth)}%.3f"
        }
        phase(tag + "_warm") { f.count() }
      }
      for (np <- probes; mm <- ms; cp <- caps) {
        val tag = s"b_ivf_serve_p${np}_m$mm" + (if (cp > 0) s"_c$cp" else "")
        val warmToo = np == probes.head && mm == ms.head && cp == caps.head
        def serve() = operators.LateInteraction.maxSimIvf(bQ, "qid",
          "tok_idx", "vec", bToks, "doc_id", "vec", bIvf, k = 10,
          m = mm, nprobe = np,
          cap = if (cp > 0) cp else Int.MaxValue)
        if (warmToo) servedTwice(tag)(serve())
        else phase(tag) {
          out += tag.replace("b_ivf_serve", "b_ivf_recall_at1") ->
            f"${recallAt1(serve(), bTruth)}%.3f"
        }
      }
      // hot-cell split A/B (SPARK_GRAFT_MAXSIM_SPLIT=factor > 0): split
      // the grid's hot cells geometrically (TokenIvf.splitHotCells) and
      // serve the base config on the split tier at the SAME nprobe (the
      // probed-volume win) and at 2× (the recall-recovery lever) — wall
      // + recall against the unsplit base serve row above. Run with
      // SPARK_GRAFT_MAXSIM_ZIPF=1, where the head cells dominate probes.
      sys.env.get("SPARK_GRAFT_MAXSIM_SPLIT").map(_.trim.toDouble)
        .filter(_ > 0).foreach { factor =>
          val bSplit = phase("b_split") {
            // warm() materializes the renumbered corpus once — serves
            // below measure probing, not the split's narrow re-map
            bIvf.splitHotCells(factor, iterations = 2).warm()
          }
          out += "b_split_cells" -> bSplit.ivf.centroids.length.toString
          out += "b_split_cell_max" -> bSplit.ivf.clusterSizes.max.toString
          // probed VOLUME at equal nprobe, unsplit vs split (driver
          // math over broadcastable coarse state): Zipf queries draw
          // from the head, and splitting puts several DENSE sub-cells
          // at the top of their probe order (displacing sparse cells),
          // so fixed-cell-count probing can scan MORE rows post-split
          // even though the hot cell shrank — the stage-1-wall tiers
          // (ADC codes) feel this; stage-2-dominated serves don't
          def probedVol(m: graft.index.IVFFlat.Model): Long = {
            val qtoks = bQ.select(col("vec").cast("array<float>")).collect()
              .map(_.getSeq[Float](0).toArray :+ 0f)
            qtoks.map { q =>
              m.centroids.indices
                .sortBy(c => {
                  var s = 0.0; var i = 0
                  val cc = m.centroids(c)
                  while (i < cc.length) {
                    val d = cc(i) - q(i); s += d * d; i += 1 }
                  s
                })
                .take(nprobeB).map(m.clusterSizes(_)).sum
            }.sum
          }
          out += "b_probed_vol" -> probedVol(bIvf.ivf).toString
          out += "b_split_probed_vol" -> probedVol(bSplit.ivf).toString
          // servedTwice: the split's corpus-sized read (the renumber
          // materialization) evicts stage-2 blocks, so the first split
          // serve pays the same re-warm the tier A/B rows document —
          // the _warm twin is the steady-state split reading
          for (np <- Seq(nprobeB, nprobeB * 2)) {
            val tag = s"b_split_serve_p${np}_m${ms.head}" +
              (if (caps.head > 0) s"_c${caps.head}" else "")
            servedTwice(tag)(operators.LateInteraction.maxSimIvf(bQ,
              "qid", "tok_idx", "vec", bToks, "doc_id", "vec", bSplit,
              k = 10, m = ms.head, nprobe = np,
              cap = if (caps.head > 0) caps.head else Int.MaxValue))
          }
          // split × compression (PQ=1): re-compress the SPLIT tier
          // (residual codes re-encode against the sub-cell centroids —
          // the lossy tiers' skew-repair route) and serve the base
          // config — the A/B against the UNSPLIT PQ serve below is the
          // deployment-shape answer: does the skew lever survive the
          // 4 B/token storage tier?
          if (sys.env.get("SPARK_GRAFT_MAXSIM_PQ").contains("1")) {
            val sPq = phase("b_split_pq_compress") {
              bSplit.compressPq(graft.index.PQ.Params(m = 4, k = 256,
                iterations = 4, seed = 7L),
                codebookTrainFraction =
                  math.min(1.0, 2e6 / (nDocs * docLen).toDouble))
            }
            // lean discipline (the r13 SQ8_LEAN lesson): the compress
            // consumed the split float tier's frames — cool it BEFORE
            // the compressed serve, so the tier serves with only its
            // own inputs resident (codes + stage-2 tokens), not under
            // eviction pressure from the resident float split tier
            bSplit.cool()
            phase("b_split_pq_warm") { sPq.warm() }
            val tag = s"b_split_pq_serve_p${nprobeB}_m${ms.head}" +
              (if (caps.head > 0) s"_c${caps.head}" else "")
            servedTwice(tag)(operators.LateInteraction.maxSimPq(bQ,
              "qid", "tok_idx", "vec", bToks, "doc_id", "vec", sPq,
              k = 10, m = ms.head, nprobe = nprobeB,
              cap = if (caps.head > 0) caps.head else Int.MaxValue))
            sPq.cool()
          }
          bSplit.cool()
        }
      // SQ8-vs-residual-PQ at EQUAL m/nprobe at scale
      // (SPARK_GRAFT_MAXSIM_PQ=1): the storage-tier A/B the token
      // frame's 100-TB bill lands on — 1 B/dim byte codes vs m-byte
      // residual codes, identical probe/candidate/rescore pipeline,
      // so wall + read deltas isolate the code scan and recall deltas
      // isolate the quantization. Same cap as the base serve row.
      //
      // RESIDENCY DISCIPLINE (lean by default, r14; LIBRARY verbs r15 —
      // the r13 SQ8_LEAN control showed ~2× of the apparent
      // SQ8-vs-float gap at 100M was exactly storage-stacking: the
      // float tier's ~35 GB checkpoint evicting blocks under the
      // compressed serve): every frame the float tier owns is consumed
      // FIRST (compress ×2, then the part-C saves), the float tier is
      // cool()ed, and each compressed tier serves with ONLY its own
      // inputs resident (its codes + the stage-2 token frame) — a
      // serving benchmark, not a storage-stacking comparison. All of
      // it through the tiers' own warm()/cool() faces now (compress
      // materializes codes eagerly; cool reaches checkpoint blocks) —
      // no persistent-RDD-id bookkeeping in the harness. Each tier is
      // warm()ed before its serve pair, so the FIRST serve row is the
      // ≤~1.2×-of-steady evidence the warm() face is for (the _warm
      // twin stays as the steady-state reference).
      val diskDirOpt =
        if (sys.env.get("SPARK_GRAFT_MAXSIM_DISK").contains("1"))
          Some(java.nio.file.Files.createTempDirectory("maxsimdisk").toString)
        else None
      var savedToDisk = false
      var bPqOpt: Option[operators.LateInteraction.TokenPq] = None
      if (sys.env.get("SPARK_GRAFT_MAXSIM_PQ").contains("1")) {
        val mAB = ms.head
        val cpAB = caps.head
        val bSq8 = phase("b_sq8_compress") { bIvf.compress() }
        val bPq = phase("b_pq_compress") {
          bIvf.compressPq(graft.index.PQ.Params(m = 4, k = 256,
            iterations = 4, seed = 7L),
            codebookTrainFraction =
              math.min(1.0, 2e6 / (nDocs * docLen).toDouble))
        }
        bPqOpt = Some(bPq)
        // the saves read the float tier / code frames — take them
        // BEFORE the lean cool (part C reloads from disk)
        diskDirOpt.foreach { dir =>
          phase("c_save") {
            operators.LateInteraction.saveTokens(bToks, dir)
            bIvf.save(s"$dir/tivf")
          }
          phase("c_pq_save") { bPq.save(s"$dir/tpq") }
          savedToDisk = true
        }
        // lean point: nothing downstream reads the float tier's
        // cluster-assigned frame (stage 2 reads bToks)
        bIvf.cool()
        val sqTag = s"b_sq8_serve_p${nprobeB}_m$mAB" +
          (if (cpAB > 0) s"_c$cpAB" else "")
        phase("b_sq8_warm_api") { bSq8.warm() }
        servedTwice(sqTag)(operators.LateInteraction.maxSimSq8(bQ, "qid",
          "tok_idx", "vec", bToks, "doc_id", "vec", bSq8, k = 10,
          m = mAB, nprobe = nprobeB,
          cap = if (cpAB > 0) cpAB else Int.MaxValue))
        bSq8.cool()
        val pqTag = s"b_pq_serve_p${nprobeB}_m$mAB" +
          (if (cpAB > 0) s"_c$cpAB" else "")
        phase("b_pq_warm_api") { bPq.warm() }
        servedTwice(pqTag)(operators.LateInteraction.maxSimPq(bQ, "qid",
          "tok_idx", "vec", bToks, "doc_id", "vec", bPq, k = 10,
          m = mAB, nprobe = nprobeB,
          cap = if (cpAB > 0) cpAB else Int.MaxValue))
        bPq.cool()
      }
      // ------- part C: ONLINE serving from the saved artifacts -------
      // SPARK_GRAFT_MAXSIM_DISK=1: save the doc-clustered token frame
      // and the cluster-partitioned tier, reload both, and serve
      // SMALL batches — the online case where the probe set covers
      // few cells and the candidate set few docs, so BOTH reads
      // should be seek-sized (read_mb ≪ stored bytes): stage 1
      // partition-prunes probed cells on the tier layout, stage 2
      // row-group-prunes candidate docs via the pushed In(doc_id).
      diskDirOpt.foreach { dir =>
        // the A/B path already saved (before its lean unpersist);
        // without the A/B the float tier is still resident here
        if (!savedToDisk) phase("c_save") {
          operators.LateInteraction.saveTokens(bToks, dir)
          bIvf.save(s"$dir/tivf")
        }
        val dToksD = operators.LateInteraction.loadTokens(spark, dir)
        val tierD = operators.LateInteraction.loadTokenIvf(spark,
          s"$dir/tivf")
        for (nb <- Seq(1, 5, 50)) {
          val qsub = bQ.filter(col("qid") < nb).localCheckpoint(true)
          // recall denominator = the batch's ACTUAL distinct qids, not
          // the nominal nb: a gap in generated qids must not silently
          // deflate (or a duplicate inflate) the reported recall
          val nq = qsub.select("qid").distinct().count()
          phase(s"c_disk_serve_q$nb") {
            val top = operators.LateInteraction.maxSimIvf(qsub, "qid",
              "tok_idx", "vec", dToksD, "doc_id", "vec", tierD, k = 10,
              m = 1024, nprobe = nprobeB, cap = 256)
            val hit = top.filter(col("rank") === 1)
              .join(bTruth, Seq("qid"))
              .filter(col("doc_id") === col("base")).count()
            out += s"c_disk_recall_at1_q$nb" -> f"${hit.toDouble / nq}%.3f"
          }
        }
        // the residual-PQ tier's disk face (when the A/B built one):
        // cluster-partitioned 4 B/token codes + the same doc-clustered
        // token frame — stage 1's disk read shrinks with the code
        // bytes (~17× under the float tier at m=4), stage 2 unchanged
        bPqOpt.foreach { _ =>
          // saved in the A/B block (c_pq_save), before its code blocks
          // were freed — reload only
          val pqD = operators.LateInteraction.loadTokenPq(spark,
            s"$dir/tpq")
          for (nb <- Seq(1, 5, 50)) {
            val qsub = bQ.filter(col("qid") < nb).localCheckpoint(true)
            val nq = qsub.select("qid").distinct().count()
            phase(s"c_pq_disk_serve_q$nb") {
              val top = operators.LateInteraction.maxSimPq(qsub, "qid",
                "tok_idx", "vec", dToksD, "doc_id", "vec", pqD, k = 10,
                m = 1024, nprobe = nprobeB, cap = 256)
              val hit = top.filter(col("rank") === 1)
                .join(bTruth, Seq("qid"))
                .filter(col("doc_id") === col("base")).count()
              out += s"c_pq_disk_recall_at1_q$nb" ->
                f"${hit.toDouble / nq}%.3f"
            }
          }
        }
        def deleteRec(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
          f.delete()
        }
        deleteRec(new java.io.File(dir))
      }
      bIvf.cool()
    }

    println(out.map { case (kk, vv) => s""""$kk":$vv""" }
      .mkString("MAXSIM_SMOKE {", ",", "}"))
    spark.stop()
  }
}
