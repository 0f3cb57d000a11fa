package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DSIR selection at 10M docs — the evidence run for
  * [[operators.Dsir.selectTopThreshold]] (r12): selectTop's
  * TakeOrderedAndProject funnels partitions × n rows through ONE merge
  * task (at 10M docs / n = 1M / 192 partitions that is ~192M rows — the
  * r11 scale audit's flagged single-task skew, measured inside the
  * 1,735.6 s r11 dsir_select row), while the threshold face filters to
  * ~slack·n survivors BEFORE the exact trim, so the merge receives O(n)
  * rows no matter the corpus or partition count.
  *
  * Runs BOTH faces on the same corpus in one JVM (threshold first), so
  * the comparison is box-neutral; checks they select the same set
  * (count + precision identical by construction — DsirSpec pins
  * equality exactly at small scale; here the full 1M-row compare would
  * be another corpus-scale job, so the smoke asserts count, precision
  * and the boundary weight).
  *
  * Usage: sbt "runMain graft.DsirScaleSmoke [nDocs] [nSelect]"
  */
object DsirScaleSmoke extends Serializable {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 10000000
    val nSel = if (args.length > 1) args(1).toInt else nDocs / 10
    val docLen = 100
    val vocab = 50000L
    val domainVocab = 5000L
    val seed = 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "192")
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

    // the RetrievalScaleSmoke corpus: every 10th doc domain-vocab
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
    val target = docs.filter(col("doc_id") < 10000L &&
      pmod(col("doc_id"), lit(10L)) === 0).select("text")

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n_docs" -> nDocs.toString += "n_select" -> nSel.toString
    def emit(): Unit =
      println(out.map { case (kk, vv) => s""""$kk":$vv""" }
        .mkString("DSIR_SMOKE_PARTIAL {", ",", "}"))
    def phase[T](name: String)(f: => T): T = {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val t0 = System.nanoTime()
      val r = f
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      out += s"${name}_s" -> f"$t%.1f"
      out += s"${name}_shuffle_mb" ->
        ((shuffleBytes.get() - before) / (1L << 20)).toString
      emit()
      r
    }

    // threshold face first (the new plan); record precision and the
    // rank-n boundary weight for the cross-face identity check
    val (tCount, tPrec, tBoundary) = phase("dsir_select_threshold") {
      val sel = operators.Dsir.selectTopThreshold(docs, "doc_id", "text",
        target, "text", n = nSel, m = 1 << 16).cache()
      val c = sel.count()
      val inDomain = sel.filter(pmod(col("doc_id"), lit(10L)) === 0).count()
      val boundary = sel.filter(col("rank") === nSel)
        .select("weight_q").head().getLong(0)
      sel.unpersist()
      (c, inDomain.toDouble / nSel, boundary)
    }
    out += "threshold_count" -> tCount.toString
    out += "threshold_precision" -> f"$tPrec%.3f"
    out += "threshold_boundary_weight" -> tBoundary.toString
    emit()

    // single-JVM housekeeping between faces: ContextCleaner frees a
    // face's shuffle/checkpoint files only after a driver GC notices
    // the dereferenced lineage — at 10M docs each face peaks ~67 GB
    // of local scratch, and two faces' files alive at once would
    // ENOSPC the box (the r11 smoke measured the one-face peak at 79%
    // of disk). On a real cluster each executor holds 1/N of this.
    System.gc()
    Thread.sleep(10000)

    // legacy face, same corpus/box — the skew comparison
    val (lCount, lPrec, lBoundary) = phase("dsir_select_top") {
      val sel = operators.Dsir.selectTop(docs, "doc_id", "text",
        target, "text", n = nSel, m = 1 << 16).cache()
      val c = sel.count()
      val inDomain = sel.filter(pmod(col("doc_id"), lit(10L)) === 0).count()
      val boundary = sel.filter(col("rank") === nSel)
        .select("weight_q").head().getLong(0)
      sel.unpersist()
      (c, inDomain.toDouble / nSel, boundary)
    }
    out += "top_count" -> lCount.toString
    out += "top_precision" -> f"$lPrec%.3f"
    out += "top_boundary_weight" -> lBoundary.toString
    out += "faces_agree" ->
      (tCount == lCount && tBoundary == lBoundary).toString

    println(out.map { case (kk, vv) => s""""$kk":$vv""" }
      .mkString("DSIR_SMOKE {", ",", "}"))
    spark.stop()
  }
}
