package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-1-only serve harness for the compressed single-vector tiers —
  * the isolation rig for the SQ8 100M serve wall (BASELINE r13/r14):
  * identical synthetic corpus, identical coarse grid, identical probe
  * batch, then ONE timed `searchMany` per tier (float / SQ8 / IVFPQ)
  * with NO stage 2, no MaxSim machinery, no saves — whatever separates
  * the tiers here is the stage-1 kernel/join itself, not residency or
  * pipeline context.
  *
  * Args: nRows (default 100M), dim (default 17 — the augmented token
  * width), then k=1024 cells, nprobe=13, batch=500 queries, m=1024
  * per-query hits: the MaxSimScaleSmoke part-B serving point.
  */
object Sq8ServeSmoke {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val dim = if (args.length > 1) args(1).toInt else 17
    val nCells = 1024
    val nprobe = 13
    val nQ = 500
    val m = 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SQ8SERVE $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // clustered corpus: cell centers on a hash lattice, points = center
    // + noise — gives the coarse grid real structure at zero build cost
    val cents = Array.tabulate(nCells)(c =>
      Array.tabulate(dim)(j =>
        (mix64(c * 104729L + j * 7919L) % 1000L).toFloat / 250f))
    val bc = spark.sparkContext.broadcast(cents)
    val corpus = timed("gen+checkpoint") {
      val df = spark.range(n).as[Long].mapPartitions { it =>
        val cs = bc.value
        it.map { id =>
          val c = math.floorMod(mix64(id ^ 0xF00DL), nCells.toLong).toInt
          val v = Array.tabulate(dim)(j => cs(c)(j) +
            (mix64(id * 31L + j * 131L) % 200L).toFloat / 500f)
          (id, v)
        }
      }.toDF("id", "vector")
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      println(s"SQ8SERVE rows ${df.count()}")
      df
    }
    val assigned = timed("assign+checkpoint") {
      index.IVFFlat.assign(corpus, "id", "vector", cents)
        .localCheckpoint(true)
    }
    val sizes = new Array[Long](nCells)
    assigned.groupBy("cluster").count().collect()
      .foreach(r => sizes(r.getInt(0)) = r.getLong(1))
    val ivf = index.IVFFlat.Model(
      index.IVFFlat.Params(nCells), cents, sizes, assigned)
    val queries = corpus.filter(col("id") < nQ)
      .withColumnRenamed("vector", "qv").localCheckpoint(true)

    timed("float_serve") {
      println("SQ8SERVE float rows " +
        ivf.searchMany(queries, "id", "qv", m, nprobe).count())
    }
    val sq8 = timed("sq8_compress") {
      val c = index.SQ8.compress(ivf)
      c.copy(codes = c.codes.localCheckpoint(true))
    }
    timed("sq8_serve") {
      println("SQ8SERVE sq8 rows " +
        sq8.searchMany(queries, "id", "qv", m, nprobe).count())
    }
    spark.stop()
  }
}
