package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-scale retrieval smoke: the BM25/DSIR suite queries run on the
  * 5k-doc sf0.1 `documents` table, so this is where their 100 TB shapes
  * face real volume — a seeded ~1M-doc synthetic corpus (100 tokens /
  * 50k vocab; every 10th doc draws from a 5k-token "domain" sub-vocab)
  * measuring per-phase wall seconds and shuffle-write bytes, plus two
  * quality numbers that make the scale rows meaningful:
  *
  *  - BM25 serving recall@1: each query is 10 tokens sampled from a
  *    known base doc — the top-ranked hit should be that doc.
  *  - DSIR selection precision: with a small in-domain target corpus,
  *    the selected top slice should be (almost) all domain docs.
  *
  * Prints one JSON line per phase (RETRIEVAL_SMOKE_PARTIAL) and a
  * final line; numbers are committed to BASELINE.md.
  *
  * Usage: sbt "runMain graft.RetrievalScaleSmoke [nDocs] [nQueries]"
  */
object RetrievalScaleSmoke extends Serializable {

  private def deleteRec(f: java.io.File): Unit = {
    // listFiles() returns null on I/O error or a concurrent-delete
    // race — cleanup must never NPE after the measurements ran
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 1000000
    val nQueries = if (args.length > 1) args(1).toInt else 1000
    val docLen = 100
    val vocab = 50000L
    val domainVocab = 5000L
    val qTerms = 10
    val seed = 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // at 10M docs the build shuffles ~1B posting rows: more (smaller)
    // shuffle partitions bound each task's live aggregation state —
    // the single-JVM local mode's GC stays incremental instead of one
    // full-heap pause that melts the heartbeat loop (observed at 10M
    // with 32 partitions on a 48g heap)
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "800s")
      .config("spark.executor.heartbeatInterval", "60s")
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

    // doc = 100 tokens, pure function of id; every 10th doc is a
    // "domain" doc over the d-prefixed 5k sub-vocab, the rest over the
    // w-prefixed 50k vocab — DSIR's measurable signal
    def docTokens(id: Long): Array[String] =
      if (id % 10L == 0L)
        Array.tabulate(docLen)(p => "d" + java.lang.Long.remainderUnsigned(
          mix64(id * 1000003L + p * 7919L + seed), domainVocab))
      else
        Array.tabulate(docLen)(p => "w" + java.lang.Long.remainderUnsigned(
          mix64(id * 1000003L + p * 7919L + seed), vocab))

    val docs = spark.range(nDocs).as[Long]
      .map(id => (id, docTokens(id).mkString(" ")))
      .toDF("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    docs.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n_docs" -> nDocs.toString += "n_queries" -> nQueries.toString
    def emit(): Unit =
      println(out.map { case (kk, vv) => s""""$kk":$vv""" }
        .mkString("RETRIEVAL_SMOKE_PARTIAL {", ",", "}"))
    def phase[T](name: String)(f: => T): T = {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val (r, t) = timed(f)
      Thread.sleep(500)
      out += s"${name}_s" -> f"$t%.1f"
      out += s"${name}_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      emit()
      r
    }

    // ---- phase 1: posting-index build (the one corpus tokenize)
    val idx = phase("bm25_build") {
      val i = operators.Retrieval.buildIndex(docs, "doc_id", "text")
      out += "n_postings" -> i.postings.count().toString
      i
    }

    // ---- phase 2: persist + load (the serving deployment path)
    val dir = java.nio.file.Files.createTempDirectory("bm25smoke").toString
    val loaded = phase("bm25_persist") {
      idx.save(dir)
      val l = operators.Retrieval.loadIndex(spark, dir)
      l.stats.count()
      l
    }
    idx.unpersist()

    // ---- phase 3: serve nQueries 10-term queries from the LOADED
    // index; query j samples every 7th token of base doc (j*9973 %
    // nDocs) — the base doc holds all 10 terms, so it should win
    val qRows = (0 until nQueries).map { j =>
      val b = (j * 9973L) % nDocs
      val toks = docTokens(b)
      (j.toLong, b, Array.tabulate(qTerms)(i => toks(i * 7)).mkString(" "))
    }
    val queries = qRows.map { case (q, _, t) => (q, t) }.toDF("qid", "qtext")
      .cache()
    queries.count()
    val truth = qRows.map { case (q, b, _) => (q, b) }.toDF("qid", "base")
    phase("bm25_serve") {
      val top = loaded.searchTopK(queries, "qid", "qtext", k = 10)
        .filter(col("rank") === 1)
      val hits = top.join(truth, Seq("qid"))
        .filter(col("doc_id") === col("base")).count()
      out += "bm25_recall_at1" -> f"${hits.toDouble / nQueries}%.3f"
    }

    // the loaded index is done serving: drop its on-disk frames so the
    // 10M run's later phases (positional save, DSIR shuffle) have the
    // disk to themselves
    loaded.unpersist()
    deleteRec(new java.io.File(dir))

    // ---- phase 3b: df-cap stopword pruning under a ZIPF vocabulary —
    // the uniform corpus has no stopwords, so build a 200k-doc Zipf
    // slice (token r drawn with p ∝ 1/rank: rank = 2^(u·17) maps a
    // uniform u onto a power-law over 2^17 ranks) where the head
    // tokens behave like 'the'/'of', then measure the capped vs
    // uncapped serve: candidate volume (shuffle) and wall must drop,
    // and the top-1 hit (which rides RARE terms) must survive.
    {
      val nz = math.min(nDocs, 200000)
      def zipfTokens(id: Long): Array[String] =
        Array.tabulate(docLen) { p =>
          val u = java.lang.Long.remainderUnsigned(
            mix64(id * 2000003L + p * 104729L + seed), 1L << 20).toDouble /
            (1L << 20).toDouble
          "z" + math.min((1L << 17) - 1, math.pow(2.0, u * 17.0).toLong)
        }
      val zdocs = spark.range(nz).as[Long]
        .map(id => (id, zipfTokens(id).mkString(" ")))
        .toDF("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism).cache()
      zdocs.count()
      val zidx = operators.Retrieval.buildIndex(zdocs, "doc_id", "text")
      zidx.postings.count()
      val zq = (0 until nQueries).map { j =>
        val bdoc = (j * 9973L) % nz
        val toks = zipfTokens(bdoc)
        (j.toLong, bdoc, Array.tabulate(qTerms)(i => toks(i * 7)).mkString(" "))
      }
      val zqs = zq.map { case (q, _, t) => (q, t) }.toDF("qid", "qtext").cache()
      zqs.count()
      val ztruth = zq.map { case (q, bdoc, _) => (q, bdoc) }.toDF("qid", "base")
      def recallOf(df: org.apache.spark.sql.DataFrame): Double =
        df.filter(col("rank") === 1).join(ztruth, Seq("qid"))
          .filter(col("doc_id") === col("base")).count().toDouble / nQueries
      phase("zipf_serve_uncapped") {
        out += "zipf_uncapped_recall" ->
          f"${recallOf(zidx.searchTopK(zqs, "qid", "qtext", k = 10))}%.3f"
      }
      phase("zipf_serve_dfcap") {
        // cap at 1% of the corpus: the Zipf head (df ≈ nz/rank) dies,
        // the discriminative tail survives
        out += "zipf_dfcap_recall" ->
          f"${recallOf(zidx.searchTopK(zqs, "qid", "qtext", k = 10,
            maxDf = Some((nz / 100).toLong)))}%.3f"
      }
      zidx.unpersist(); zdocs.unpersist(); zqs.unpersist()
    }

    // ---- phase 3c: exact phrase search at scale — 200 five-token
    // phrases lifted verbatim from known docs; every query must find
    // its source doc (exactness) and the join stays posting-sized.
    // The raw (re-tokenizing) face runs only at ≤1M docs — it pays a
    // full corpus pass per batch BY DESIGN (that's the contrast the
    // indexed face below removes); at 10M only the indexed face runs.
    val nPhrases = 200
    val pq = (0 until nPhrases).map { j =>
      val b = (j * 7919L) % nDocs
      (j.toLong, b, docTokens(b).slice(20, 25).mkString(" "))
    }
    val pqs = pq.map { case (q, _, t) => (q, t) }.toDF("qid", "phrase")
    val ptruth = pq.map { case (q, b, _) => (q, b) }.toDF("qid", "base")
    if (nDocs <= 1000000) phase("phrase_search") {
      val hits = operators.Retrieval.phraseSearch(docs, "doc_id", "text",
          pqs, "qid", "phrase")
        .join(ptruth, Seq("qid"))
        .filter(col("doc_id") === col("base")).count()
      out += "phrase_recall" -> f"${hits.toDouble / nPhrases}%.3f"
    }

    // ---- phase 3d: phrase serving FROM THE PERSISTED POSITIONAL
    // index — build positional once (THE corpus tokenize), save/load,
    // then the same phrase batch probes the stored (doc_id, term, pos)
    // frame: serve pays no corpus pass (the pass the r10 engine still
    // had at serve time). Wall split: pos_build_save = the one-time
    // index cost, phrase_indexed = the pure serve cost.
    {
      val pdir = java.nio.file.Files.createTempDirectory("posidx").toString
      val ploaded = phase("pos_build_save") {
        val pidx = operators.Retrieval.buildIndex(docs, "doc_id", "text",
          positional = true)
        pidx.save(pdir)
        pidx.unpersist()
        operators.Retrieval.loadIndex(spark, pdir)
      }
      phase("phrase_indexed") {
        val hits = ploaded.phraseSearchIndexed(pqs, "qid", "phrase")
          .join(ptruth, Seq("qid"))
          .filter(col("doc_id") === col("base")).count()
        out += "phrase_indexed_recall" -> f"${hits.toDouble / nPhrases}%.3f"
      }
      deleteRec(new java.io.File(pdir))
    }

    // ---- phase 3e: late-interaction MaxSim — 100k docs × 100 tokens
    // = 10M corpus token embeddings (dim 16; capped — the pair volume
    // is corpus-tokens × q-tokens, MaxSim's inherent cost), 50 queries
    // × 10 tokens, shortlist m = 1024. m must exceed the corpus TERM
    // MULTIPLICITY here (~200 exact copies of every term at 10M
    // tokens / 50k vocab): hash token embeddings tie all copies of a
    // term at the same max dot, and an m below the tie count keeps
    // only the lowest-doc_id copies — measured recall@1 0.040 at
    // m=16, 0.680 at m=256 (longer terms' larger norms also crowd
    // the heap above exact matches), recovering with headroom over
    // the ~200-copy tie class at m=1024. (Real model embeddings
    // break ties by context; multiplicity is this corpus's analogue.)
    // The 5B fused dots collapse map-side (TopKAggExpr heaps stage 1,
    // partial max stage 2); truth: query tokens sample a base doc,
    // which must rank 1.
    {
      val nm = math.min(nDocs.toLong, 100000L)
      val nq = 50
      val mdocs = docs.filter(col("doc_id") < nm)
      val dToks = phase("maxsim_embed") {
        val t = operators.LateInteraction
          .tokenVectors(mdocs, "doc_id", "text").localCheckpoint(true)
        out += "maxsim_corpus_tokens" -> t.count().toString
        t
      }
      val mq = (0 until nq).map { j =>
        val b = (j * 9973L) % nm
        (j.toLong, b, docTokens(b).take(10).mkString(" "))
      }
      val mqdf = mq.map { case (q, _, t) => (q, t) }.toDF("qid", "text")
      val qToks = operators.LateInteraction
        .tokenVectors(mqdf, "qid", "text")
        .withColumnRenamed("doc_id", "qid").localCheckpoint(true)
      val mtruth = mq.map { case (q, b, _) => (q, b) }.toDF("qid", "base")
      phase("maxsim_serve") {
        val top = operators.LateInteraction.maxSimShortlisted(qToks, "qid",
            "tok_idx", "vec", dToks, "doc_id", "vec", k = 10, m = 1024)
          .filter(col("rank") === 1)
        val hits = top.join(mtruth, Seq("qid"))
          .filter(col("doc_id") === col("base")).count()
        out += "maxsim_recall_at1" -> f"${hits.toDouble / nq}%.3f"
      }
    }

    // ---- phase 4: DSIR selection — target = 1000 domain docs (ids
    // 0,10,…,9990); select the top nDocs/10 and measure how much of
    // the selection is actually in-domain. m must scale with the gram
    // vocabulary: at 256 buckets every bucket mixes domain and
    // non-domain mass and the ratio flattens (measured precision 0.53
    // at 100k docs); at 2^16 buckets the models separate (the paper's
    // regime — Xie et al. use 10^4+ hashed buckets). The lr table is
    // still broadcast-sized (2^16 rows).
    phase("dsir_select") {
      val target = docs.filter(col("doc_id") < 10000L &&
        pmod(col("doc_id"), lit(10L)) === 0).select("text")
      val nSel = nDocs / 10
      val sel = operators.Dsir.selectTop(docs, "doc_id", "text",
        target, "text", n = nSel, m = 1 << 16)
      val inDomain = sel.filter(pmod(col("doc_id"), lit(10L)) === 0).count()
      out += "dsir_precision" -> f"${inDomain.toDouble / nSel}%.3f"
    }

    println(out.map { case (kk, vv) => s""""$kk":$vv""" }
      .mkString("RETRIEVAL_SMOKE {", ",", "}"))
    spark.stop()
  }
}
