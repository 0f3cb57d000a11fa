package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink-layout smoke at 10M+ rows: measured evidence for the two
  * write-side operators whose value IS their effect on later I/O —
  * `Layout.writeSized` (are real output files near the target size,
  * and what does calibration cost?) and `sources.Bucketed` (how many
  * shuffle bytes does the bucketed layout delete from a fact⋈fact
  * join+agg vs the identical query off raw parquet?). Prints one JSON
  * line per phase; numbers go to BASELINE.md.
  *
  * Usage: runMain graft.LayoutScaleSmoke [nFact] (default 20M fact
  * rows + 10M dim rows; SPARK_GRAFT_PHASES=sized,bucket selects).
  */
object LayoutScaleSmoke {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nFact = if (args.length > 0) args(0).toInt else 20000000
    val nDim = nFact / 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
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
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    def emit(): Unit =
      println(out.map { case (kk, vv) => s""""$kk":"$vv"""" }
        .mkString("LAYOUTSCALE {", ",", "}"))
    var before = 0L
    def phaseStart(): Unit =
      { Thread.sleep(500); System.gc(); before = shuffleBytes.get() }
    def phaseMb(): Long = (shuffleBytes.get() - before) / (1L << 20)

    // fact: (fk -> dim key, qty, payload ~40 B); dim: (key, tag)
    val fact = spark.range(nFact).select(
      (pmod(col("id") * 2654435761L, lit(nDim.toLong))).as("fk"),
      (pmod(col("id") * 97L, lit(50L)) + 1L).as("qty"),
      md5(col("id").cast("string")).as("payload"))
    val dim = spark.range(nDim).select(
      col("id").as("key"),
      concat(lit("t"), pmod(col("id"), lit(16L))).as("tag"))
    out += "n_fact" -> nFact.toString += "n_dim" -> nDim.toString

    if (phaseOn("sized")) {
      phaseStart()
      val dir = java.nio.file.Files
        .createTempDirectory("layout_sized").toString + "/t"
      val target = 64L << 20
      val ((nFiles, bpr), tW) = timed {
        operators.Layout.writeSized(fact, dir,
          targetFileBytes = target, sortCols = Seq("fk"))
      }
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      val sizes = files.map(_.length())
      out += "sized_wall_s" -> f"$tW%.1f"
      out += "sized_bytes_per_row" -> f"$bpr%.1f"
      out += "sized_files" -> nFiles.toString
      out += "sized_target_mb" -> (target >> 20).toString
      out += "sized_min_mb" -> (sizes.min >> 20).toString
      out += "sized_max_mb" -> (sizes.max >> 20).toString
      out += "sized_rows_back" ->
        spark.read.parquet(dir).count().toString
      out += "sized_shuffle_mb" -> phaseMb().toString
      emit()
    }

    if (phaseOn("bucket")) {
      val base = java.nio.file.Files
        .createTempDirectory("layout_bucket").toString
      def joinAgg(f: DataFrame, d: DataFrame): Long =
        f.join(d, f("fk") === d("key"))
          .groupBy(col("fk"), col("tag"))
          .agg(sum(col("qty")).as("s"), count(lit(1)).as("n"))
          .count()
      // raw parquet twin first (write plain copies so both paths read
      // from disk, not from the in-memory range)
      fact.write.mode("overwrite").parquet(s"$base/fact_raw")
      dim.write.mode("overwrite").parquet(s"$base/dim_raw")
      val fRaw = spark.read.parquet(s"$base/fact_raw")
      val dRaw = spark.read.parquet(s"$base/dim_raw")
      phaseStart()
      val (nRaw, tRaw) = timed { joinAgg(fRaw, dRaw) }
      out += "join_raw_wall_s" -> f"$tRaw%.1f"
      out += "join_raw_shuffle_mb" -> phaseMb().toString
      out += "join_raw_groups" -> nRaw.toString
      emit()
      phaseStart()
      val (_, tWb) = timed {
        sources.Bucketed.write(fact, "smoke_fact", s"$base/fact_b",
          numBuckets = 64, bucketCol = "fk")
        sources.Bucketed.write(dim, "smoke_dim", s"$base/dim_b",
          numBuckets = 64, bucketCol = "key")
      }
      out += "bucket_write_wall_s" -> f"$tWb%.1f"
      out += "bucket_write_shuffle_mb" -> phaseMb().toString
      phaseStart()
      val (nB, tB) = timed {
        joinAgg(sources.Bucketed.table(spark, "smoke_fact"),
          sources.Bucketed.table(spark, "smoke_dim"))
      }
      out += "join_bucketed_wall_s" -> f"$tB%.1f"
      out += "join_bucketed_shuffle_mb" -> phaseMb().toString
      out += "join_bucketed_groups" -> nB.toString
      out += "join_groups_equal" -> (nB == nRaw).toString
      emit()
    }

    spark.stop()
  }
}
