package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale smoke for the curation wave (PII scrub, n-gram
  * decontamination, temperature mixing, bigram-LM scoring, Z-order
  * layout): the oracle lanes run on the 500-doc verify corpus, so this
  * is where their 100 TB shapes face real volume — a seeded ~1M-doc
  * synthetic corpus with planted PII (25% of docs) and planted
  * benchmark quoters, measuring per-phase wall seconds, shuffle-write
  * bytes, and planted-signal recall. Prints one JSON-ish line; numbers
  * are committed to BASELINE.md.
  *
  * The layout phase reports the metric that matters at scale: the
  * fraction of 256 clustered files a 2-dimensional box filter must
  * touch under Z-order vs single-column layout (footer min/max
  * pruning), computed from actual per-partition extents.
  *
  * Usage: sbt "runMain graft.CurationScaleSmoke [nDocs] [nEvents]"
  */
object CurationScaleSmoke extends Serializable {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 1000000
    val nEvents = if (args.length > 1) args(1).toInt else 4000000
    val nBench = 1000   // "benchmark" docs (eval set)
    val nQuote = 2000   // docs planted to quote an 8-gram span of a bench doc
    val docLen = 100
    val vocab = 50000L
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

    // corpus: docs [0, nBench) are the benchmark; docs [nBench,
    // nBench+nQuote) copy a 12-token span from bench doc (id % nBench)
    // into their middle (≥5 shared 8-grams ⇒ overlap ≥ 5/93 with n=8,
    // caught by a low threshold; recall measured, not assumed); 25% of
    // all docs get one planted PII instance per residue class
    def baseTokens(id: Long): Array[String] =
      Array.tabulate(docLen)(p =>
        "w" + java.lang.Long.remainderUnsigned(
          mix64(id * 1000003L + p * 7919L + seed), vocab))
    def docText(id: Long): String = {
      val toks = baseTokens(id)
      if (id >= nBench && id < nBench + nQuote) {
        val src = baseTokens(id % nBench)
        var p = 0
        while (p < 12) { toks(40 + p) = src(40 + p); p += 1 }
      }
      val pii = id % 4 match {
        case 0 => s" contact user$id@example.com now"
        case 1 => s" host 10.${id % 200}.0.${id % 250} up"
        case 2 => f" call 415-555-${id % 10000}%04d ssn 123-45-${id % 10000}%04d"
        case _ => ""
      }
      toks.mkString(" ") + pii
    }
    val docs = spark.range(nDocs).as[Long]
      .map(id => (id,
        // skewed sources: source s gets ~n/2^(s%8) docs (zipf-ish tiers)
        "s" + java.lang.Long.numberOfTrailingZeros(
          java.lang.Long.remainderUnsigned(mix64(id * 31L + 7L), 256L) | 256L),
        docText(id)))
      .toDF("doc_id", "source", "text")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    docs.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n_docs" -> nDocs.toString += "n_events" -> nEvents.toString

    def phase[T](name: String)(op: => (T, Seq[(String, String)])): Unit = {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val ((_, extras), t) = timed(op)
      Thread.sleep(500)
      out += s"${name}_s" -> f"$t%.1f"
      out += s"${name}_shuffle_mb" -> ((shuffleBytes.get() - before) / (1L << 20)).toString
      extras.foreach { case (k, v) => out += s"${name}_$k" -> v }
    }

    // -- PII scrub: narrow map over 1M docs; expect ~0 shuffle
    phase("pii_scrub") {
      import graft.operators.Pii
      val r = docs.select(
          sum(Pii.totalHits(col("text"))).as("hits"),
          sum(Pii.totalHits(Pii.redact(col("text")))).as("left"),
          sum(length(col("text"))).as("bytes")).head()
      ((), Seq(
        "hits" -> r.getLong(0).toString, "left_after" -> r.getLong(1).toString,
        "mb_scanned" -> (r.getLong(2) / (1L << 20)).toString))
    }

    // -- decontamination: 1M candidates vs 1k-bench 8-gram set
    phase("contam") {
      import graft.operators.Decontam
      val bench = docs.filter(col("doc_id") < nBench)
      val cand = docs.filter(col("doc_id") >= nBench)
      val flagged = Decontam.ngramOverlap(cand, "doc_id", "text",
          bench, "doc_id", "text", n = 8)
        .filter(col("overlap") >= 0.04)
        .select(col("doc_id")).cache()
      val nFlag = flagged.count()
      val hit = flagged.filter(col("doc_id") < nBench + nQuote).count()
      flagged.unpersist()
      ((), Seq("flagged" -> nFlag.toString,
        "planted_recall" -> f"${hit.toDouble / nQuote}%.3f"))
    }

    // -- temperature mixing on the zipf-tiered sources
    phase("mix") {
      val kept = graft.operators.Splits.mixByTemperature(
        docs, "doc_id", "source", alpha = 0.5)
      val natural = docs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val after = kept.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nMin = natural.values.min.toDouble
      // worst per-source deviation from the sqrt law, in sigmas
      val worst = natural.map { case (s, n) =>
        val exp = n * math.sqrt(nMin / n)
        math.abs(after.getOrElse(s, 0L) - exp) / (math.sqrt(exp) + 1)
      }.max
      ((), Seq("kept" -> after.values.sum.toString,
        "from" -> natural.values.sum.toString,
        "n_sources" -> natural.size.toString,
        "worst_dev_sigma" -> f"$worst%.1f"))
    }

    // -- bigram LM: train + score 1M docs (~100M transitions)
    phase("lm_score") {
      val scored = graft.operators.LangModel.selfScore(docs, "doc_id", "text")
      val r = scored.agg(count(lit(1)), sum(col("n_bigrams")),
        min(col("score_q")), max(col("score_q"))).head()
      ((), Seq("docs" -> r.getLong(0).toString,
        "bigrams" -> r.getLong(1).toString,
        "min_q" -> r.getLong(2).toString, "max_q" -> r.getLong(3).toString))
    }

    // -- Z-order layout: cluster nEvents 2-d rows into 256 ranges and
    // measure box-filter file pruning vs a single-column layout.
    // Buckets come from fixed uniform splits (the sampled-quantile
    // scale path; data here is uniform so splits ARE the quantiles).
    phase("zorder") {
      import graft.operators.Layout
      val pts = spark.range(nEvents).as[Long]
        .map(i => (i,
          java.lang.Long.remainderUnsigned(mix64(i * 3L + 1L), 1L << 16),
          java.lang.Long.remainderUnsigned(mix64(i * 5L + 2L), 1L << 16)))
        .toDF("id", "x", "y")
      val keyed = pts
        .withColumn("bu", shiftright(col("x"), 8)) // 65536 → 256 buckets
        .withColumn("bv", shiftright(col("y"), 8))
        .withColumn("zkey", Layout.interleaveBits(col("bu"), col("bv"), 8))
      def extents(df: DataFrame, keyCol: String): Array[(Long, Long, Long, Long)] =
        Layout.cluster(df, keyCol, 256)
          .select(col("x"), col("y")).rdd.mapPartitions { it =>
            var (x0, x1, y0, y1) = (Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue)
            var any = false
            it.foreach { r =>
              val x = r.getLong(0); val y = r.getLong(1); any = true
              if (x < x0) x0 = x; if (x > x1) x1 = x
              if (y < y0) y0 = y; if (y > y1) y1 = y
            }
            if (any) Iterator((x0, x1, y0, y1)) else Iterator.empty
          }.collect()
      // query box: 1/8 of each dimension → 1/64 of the plane
      val (qx0, qx1) = (8192L, 16383L)
      val (qy0, qy1) = (24576L, 32767L)
      def touched(ext: Array[(Long, Long, Long, Long)]): Int =
        ext.count { case (x0, x1, y0, y1) =>
          x1 >= qx0 && x0 <= qx1 && y1 >= qy0 && y0 <= qy1 }
      val zTouch = touched(extents(keyed, "zkey"))
      val xTouch = touched(extents(keyed.withColumn("xkey", col("x")), "xkey"))
      ((), Seq("files" -> "256",
        "z_files_touched" -> zTouch.toString,
        "singlecol_files_touched" -> xTouch.toString))
    }

    println(out.map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
