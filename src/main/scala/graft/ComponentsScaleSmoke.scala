package graft

import org.apache.spark.sql.SparkSession

/** Corpus-scale smoke for the pointer-halving component closure: 1M
  * nodes arranged as 1,000 chains of depth 1,000 — the adversarial
  * shape for label propagation. One-hop propagation needs 999 rounds
  * (and silently mislabels under the 50-round budget); halving must
  * close the chains in ~log₂(1000) ≈ 10 rounds. The smoke verifies
  * every label exactly (label = chain base, a closed-form ground
  * truth) and records wall + shuffle.
  * Run: sbt "runMain graft.ComponentsScaleSmoke [nChains] [depth]".
  * Output: one k=v per line (the ScaleSmoke convention, recorded in
  * BASELINE.md). */
object ComponentsScaleSmoke {

  def main(args: Array[String]): Unit = {
    val nChains = if (args.length > 0) args(0).toInt else 1000
    val depth = if (args.length > 1) args(1).toInt else 1000
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

    // node id = chain * depth + pos; edges link consecutive positions
    val edges = spark.range(nChains.toLong * (depth - 1)).as[Long]
      .map { i =>
        val chain = i / (depth - 1)
        val pos = i % (depth - 1)
        val a = chain * depth + pos
        (a, a + 1)
      }
      .toDF("a", "b")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    edges.count()

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n_nodes" -> (nChains.toLong * depth).toString
    out += "chain_depth" -> depth.toString

    val t0 = System.nanoTime()
    val labels = operators.Dedup.components(edges, "a", "b")
    val wrong = labels
      .filter(org.apache.spark.sql.functions.expr(
        s"comp <> CAST(id / $depth AS BIGINT) * $depth"))
      .count()
    val t = (System.nanoTime() - t0) / 1e9
    out += "components_s" -> f"$t%.1f"
    out += "shuffle_mb" -> (shuffleBytes.get() / (1L << 20)).toString
    out += "mislabeled" -> wrong.toString
    out += "labels" -> labels.count().toString

    out.foreach { case (k, v) => println(s"$k=$v") }
    spark.stop()
  }
}
