package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sketches at 100M rows — one order of magnitude over the 10M budget
  * rows: the point of a sketch at 100 TB is WHAT CROSSES THE SHUFFLE
  * (registers / bottom-R hashes / bitmap words vs the distinct-value
  * stream itself), so this smoke puts the sketch and its exact twin
  * side by side at 100M rows and records wall + shuffle MB + error.
  * Bloom sizing goes through `Sketches.bloomLogmFor` on the measured
  * train-key count (the r10 under-sizing lesson, automated). Prints
  * one JSON line per phase; numbers go to BASELINE.md.
  *
  * Usage: runMain graft.SketchScaleSmoke [n] [nDistinct]
  * (SPARK_GRAFT_PHASES=hll,exact,kmv,bloom selects phases).
  */
object SketchScaleSmoke {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val nDistinct = if (args.length > 1) args(1).toLong else (n * 4) / 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
        .mkString("SKETCHSCALE {", ",", "}"))
    var before = 0L
    def phaseStart(): Unit =
      { Thread.sleep(500); System.gc(); before = shuffleBytes.get() }
    def phaseMb(): Long = (shuffleBytes.get() - before) / (1L << 20)

    // 100M string values over nDistinct keys (multiplicative-hash
    // spread, so every partition sees the full key range — the
    // adversarial case for partial distinct aggregation)
    val vals = spark.range(n).select(
      concat(lit("v"),
        pmod(col("id") * 2654435761L, lit(nDistinct))).as("s"))
    out += "n" -> n.toString += "n_distinct_true" -> nDistinct.toString

    if (phaseOn("hll")) {
      phaseStart()
      val (est, tH) = timed {
        operators.Sketches.hllEstimate(
            operators.Sketches.hllRegisters(vals, "s", p = 14), p = 14)
          .head().getAs[Double]("estimate")
      }
      out += "hll_s" -> f"$tH%.1f"
      out += "hll_shuffle_mb" -> phaseMb().toString
      out += "hll_rel_err" ->
        f"${math.abs(est - nDistinct) / nDistinct}%.4f"
      emit()
    }

    if (phaseOn("exact")) {
      phaseStart()
      val (exact, tE) = timed {
        vals.agg(countDistinct(col("s"))).head().getLong(0)
      }
      out += "exact_s" -> f"$tE%.1f"
      out += "exact_shuffle_mb" -> phaseMb().toString
      out += "exact_n" -> exact.toString
      emit()
    }

    if (phaseOn("kmv")) {
      phaseStart()
      val (est, tK) = timed {
        operators.Sketches.kmvEstimate(
            operators.Sketches.kmvSketch(vals, "s", r = 4096), r = 4096)
          .head().getAs[Double]("estimate")
      }
      out += "kmv_s" -> f"$tK%.1f"
      out += "kmv_shuffle_mb" -> phaseMb().toString
      out += "kmv_rel_err" ->
        f"${math.abs(est - nDistinct) / nDistinct}%.4f"
      emit()
    }

    if (phaseOn("bloom")) {
      phaseStart()
      // train on even keys, probe odd keys (guaranteed disjoint):
      // every flagged probe is a FALSE positive — fp is measured
      // directly, at the size bloomLogmFor picks for the key count
      val train = spark.range(nDistinct).filter(col("id") % 2 === 0)
        .select(concat(lit("v"), col("id")).as("s"))
      val probes = spark.range(nDistinct).filter(col("id") % 2 === 1)
        .limit(2000000).select(concat(lit("v"), col("id")).as("s"))
      val nTrain = nDistinct / 2 + (nDistinct % 2)
      val logm = operators.Sketches.bloomLogmFor(nTrain, k = 3,
        targetFp = 0.02)
      out += "bloom_logm" -> logm.toString
      val (bloom, tB) = timed {
        operators.Sketches.bloomBuild(train, "s", logm = logm, k = 3)
          .localCheckpoint(true)
      }
      out += "bloom_build_s" -> f"$tB%.1f"
      out += "bloom_build_shuffle_mb" -> phaseMb().toString
      phaseStart()
      val (flagged, tP) = timed {
        operators.Sketches.bloomProbe(bloom, probes, "s",
            logm = logm, k = 3)
          .filter(col("maybe_member")).count()
      }
      val nProbe = probes.count()
      out += "bloom_probe_s" -> f"$tP%.1f"
      out += "bloom_probe_shuffle_mb" -> phaseMb().toString
      out += "bloom_observed_fp" -> f"${flagged.toDouble / nProbe}%.4f"
      emit()
    }

    spark.stop()
  }
}
