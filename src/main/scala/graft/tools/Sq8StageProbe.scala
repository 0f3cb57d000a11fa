package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Transient diagnostic: time maxSimSq8's stage 1 and full pipeline
  * separately on the EXACT MaxSimScaleSmoke part-B token frame, to
  * localize the 100M SQ8 serve wall (BASELINE r14). */
object Sq8StageProbe {
  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val docLen = 100
    val seed = 42L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGEPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val vocab = nDocs * docLen / 200L
    def docTokens(id: Long): Array[String] =
      Array.tabulate(docLen)(p => "w" + java.lang.Long.remainderUnsigned(
        mix64(id * 1000003L + p * 7919L + seed), vocab))
    val corpus = spark.range(nDocs).as[Long]
      .map(id => (id, docTokens(id).mkString(" ")))
      .toDF("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    val bToks = timed("embed") {
      val t = operators.LateInteraction
        .tokenVectors(corpus, "doc_id", "text").localCheckpoint(true)
      println("STAGEPROBE tokens " + t.count()); t
    }
    val qRows = (0 until 50).map { j =>
      (j.toLong, (j * 99173L) % nDocs)
    }
    val qdf = qRows.map { case (q, b) => (q, docTokens(b).take(10).mkString(" ")) }
      .toDF("qid", "text")
    val bQ = operators.LateInteraction.tokenVectors(qdf, "qid", "text")
      .withColumnRenamed("doc_id", "qid").localCheckpoint(true)
    val bIvf = timed("build") {
      operators.LateInteraction.buildTokenIvf(bToks, "doc_id", "tok_idx",
        "vec", index.IVFFlat.Params(k = 1024, numAttempts = 1,
          maxIterations = 4),
        trainFraction = math.min(1.0, 2e6 / (nDocs * docLen).toDouble))
    }
    val nprobe = 13
    def candDocs(hits: org.apache.spark.sql.DataFrame): Long =
      hits.select((col("qid") / 1000L).cast("long").as("q"),
        shiftright(col("id"), operators.LateInteraction.TokIdxBits)
          .as("doc")).distinct().count()
    def augQ = {
      val aq = operators.Mips.augmentQueries(
        bQ.select(col("qid"), col("tok_idx"), col("vec")), "vec")
      aq.withColumn("qid2", col("qid") * 1000L + col("tok_idx"))
        .select(col("qid2"), col("vec").as("qvec2"))
    }
    timed("float_full") {
      println("rows " + operators.LateInteraction.maxSimIvf(bQ, "qid",
        "tok_idx", "vec", bToks, "doc_id", "vec", bIvf, k = 10, m = 1024,
        nprobe = nprobe).count())
    }
    timed("cand_float") {
      println("float cand-doc pairs " + candDocs(
        bIvf.ivf.searchMany(augQ, "qid2", "qvec2", 1024, nprobe)))
    }
    val bSq8 = timed("compress") {
      val c = bIvf.compress()
      c.copy(sq8 = c.sq8.copy(codes = c.sq8.codes.localCheckpoint(true)))
    }
    timed("sq8_stage1_only") {
      println("hits " + bSq8.sq8.searchMany(augQ, "qid2", "qvec2", 1024,
        nprobe).count())
    }
    timed("cand_sq8") {
      println("sq8 cand-doc pairs " + candDocs(
        bSq8.sq8.searchMany(augQ, "qid2", "qvec2", 1024, nprobe)))
    }
    def sq8Full(tag: String): Unit = timed(tag) {
      println("rows " + operators.LateInteraction.maxSimSq8(bQ, "qid",
        "tok_idx", "vec", bToks, "doc_id", "vec", bSq8, k = 10, m = 1024,
        nprobe = nprobe).count())
    }
    def floatStage2Control(tag: String): Unit = timed(tag) {
      // the float tier stays resident in this diagnostic: identical
      // pipeline, interleaved with the sq8 runs — if BOTH degrade with
      // JVM age the wall is environmental, not the sq8 kernel
      println("rows " + operators.LateInteraction.maxSimIvf(bQ, "qid",
        "tok_idx", "vec", bToks, "doc_id", "vec", bIvf, k = 10, m = 1024,
        nprobe = nprobe).count())
    }
    sq8Full("sq8_full_1")
    floatStage2Control("float_ctrl_1")
    sq8Full("sq8_full_2")
    floatStage2Control("float_ctrl_2")
    sq8Full("sq8_full_3")
    spark.stop()
  }
}
