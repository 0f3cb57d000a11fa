package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale smoke for the bucketized range joins: 10M points vs 1M
  * intervals (point-in-interval) and 1M vs 1M (interval overlap) over
  * a 30-day second-granularity domain — the shape of sessionizing a
  * day of event logs against a window table. A naive non-equi join
  * here is 10^13 candidate pairs; the smoke proves the bucketed plans
  * complete in seconds with posting-list-sized shuffles, and pins
  * exactness against the naive join on a subsample slice.
  *
  * Interval mix: ~5% empty (hi == lo), the rest 1–19 s spans, plus one
  * DAY-long outlier per 100k intervals (diverted to the broadcast
  * branch at the default longCap — the branch the 100-TB story needs,
  * because real window tables always carry a few huge ranges).
  * Run: sbt "runMain graft.RangeScaleSmoke [nPoints] [nIntervals]".
  * Output: one k=v per line (the ScaleSmoke convention, recorded in
  * BASELINE.md). */
object RangeScaleSmoke {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nPoints = if (args.length > 0) args(0).toInt else 10000000
    val nIv = if (args.length > 1) args(1).toInt else 1000000
    val domain = 2592000L // 30 days in seconds
    val width = 16L
    val seed = 42L
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

    val points = spark.range(nPoints).as[Long]
      .map(i => (i, java.lang.Long.remainderUnsigned(mix64(i * 31L + seed), domain)))
      .toDF("pid", "p")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    points.count()

    def mkIntervals(n: Int, salt: Long, lid: String, llo: String, lhi: String): DataFrame =
      spark.range(n).as[Long].map { i =>
        val lo = java.lang.Long.remainderUnsigned(mix64(i * 131L + salt), domain)
        val span =
          if (i % 100000L == 0L) 86400L // the broadcast-diverted outliers
          else java.lang.Long.remainderUnsigned(mix64(i * 17L + salt + 7L), 20L)
        (i, lo, lo + span)
      }.toDF(lid, llo, lhi)
        .repartition(spark.sparkContext.defaultParallelism).cache()

    val ivs = mkIntervals(nIv, seed + 1000L, "iid", "lo", "hi")
    ivs.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n_points" -> nPoints.toString += "n_intervals" -> nIv.toString

    def phase(name: String)(op: => Long): Unit = {
      Thread.sleep(500)
      val before = shuffleBytes.get()
      val (rows, t) = timed(op)
      Thread.sleep(500)
      out += s"${name}_s" -> f"$t%.1f"
      out += s"${name}_shuffle_mb" -> ((shuffleBytes.get() - before) / (1L << 20)).toString
      out += s"${name}_rows" -> rows.toString
    }

    phase("point_in_interval") {
      operators.RangeJoin.pointInInterval(points, "p", ivs, "lo", "hi",
        width = width, longCap = 64).count()
    }

    val bIvs = mkIntervals(nIv, seed + 2000L, "bid", "blo", "bhi")
    bIvs.count()
    phase("interval_overlap") {
      operators.RangeJoin.intervalOverlap(ivs, "lo", "hi", bIvs, "blo", "bhi",
        width = width, longCap = 64).count()
    }

    // exactness on a subsample slice, vs the naive non-equi join
    val pSlice = points.filter(col("pid") < 50000).cache()
    val ivSlice = ivs.filter(col("iid") < 500).cache()
    val gotP = operators.RangeJoin.pointInInterval(pSlice, "p", ivSlice,
        "lo", "hi", width = width, longCap = 64)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naiveP = pSlice.crossJoin(ivSlice)
      .filter($"p" >= $"lo" && $"p" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    out += "slice_exact" -> (gotP == naiveP).toString
    out += "slice_pairs" -> naiveP.size.toString

    out.foreach { case (k, v) => println(s"$k=$v") }
    spark.stop()
  }
}
