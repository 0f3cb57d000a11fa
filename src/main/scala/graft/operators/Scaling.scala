package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism repair for compute-heavy narrow stages (optimization
  * guide §2.5 "input skew": one huge unsplittable file → repartition
  * immediately after the read).
  *
  * Spark sizes scan splits by BYTES (`spark.sql.files.maxPartitionBytes`),
  * which assumes per-row work proportional to row size. Several engine
  * stages break that assumption hard: the token-embedding explode
  * (dozens of md5 grams per row), and the exhaustive MaxSim
  * corpus × broadcast-query-token join (|q-tokens| fused dot products
  * per corpus row). A corpus that fits one parquet split then runs the
  * whole stage on ONE core — measured 6.5 s single-task on a 32-core
  * box for maxsim_exact at sf0.1 — while every other core idles.
  *
  * [[widen]] round-robin-repartitions such a frame up to the session's
  * default parallelism, but ONLY when the planned scan yields fewer
  * partitions than cores. At production scale (thousands of splits per
  * corpus) the guard makes it a no-op — no exchange is added — so this
  * is scale-adaptive, not a local-mode constant: the partition count
  * derives from the input and the session, never from a tuned number.
  *
  * Correctness: round-robin placement only changes WHICH task computes
  * a row (Spark's sort-before-repartition keeps the assignment
  * deterministic under retries, SPARK-23207); every consumer below is
  * per-row compute or an order-free aggregate, so results are
  * bit-identical — gated by the unchanged oracle hashes of every lane
  * that crosses this path.
  */
object Scaling {
  /** Repartition `df` to the session's default parallelism iff its
    * current plan yields fewer partitions; otherwise return it
    * unchanged (no exchange added). Caller contract: `df`'s plan must
    * be narrow (scan/project/filter/generate only) — `.rdd` on a plan
    * containing exchanges would execute those stages eagerly under AQE.
    * Callers also own the is-this-frame-big question: widening a
    * serving-sized frame buys nothing and taxes every downstream job
    * with `cores` tasks (measured +1–2 s per 50-doc maxsim lane when
    * this was applied unconditionally), so only corpus-sized frames
    * should come here. */
  def widen(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** [[widen]] for PROJECT/FILTER-shaped consumers (regex gate
    * chains). A bare round-robin exchange does not protect those:
    * Catalyst sinks deterministic projections and filters below the
    * repartition, putting the compute back on the single pre-exchange
    * scan task (profiled on pipeline_pretrain: the whole redact/gopher
    * chain ran as one 2.7 s map-side task under plain [[widen]]).
    * Generate/explode consumers don't sink, which is why [[widen]]
    * suffices for the embed/shingle call sites. When widening fires,
    * materialize the repartitioned scan as a checkpoint BARRIER — a
    * LogicalRDD leaf nothing can be pushed below — so the downstream
    * compute really runs at session width. The extra materialization
    * only exists when the guard fires, i.e. never at production scale
    * (a corpus with ≥ cores scan splits passes through untouched). */
  def widenEager(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores)
      df.repartition(cores).localCheckpoint(true)
    else df
  }

  /** Size-calibrated variant for frames whose on-disk footprint is
    * known (loaded artifacts): target partitions = bytes /
    * `bytesPerPartition`, clamped to [1, cores]; widen only when the
    * plan currently yields fewer. The default target is deliberately
    * far below the scan-split default (512 KB vs 128 MB) because the
    * consumers are compute-dense per byte — fused dot-product kernels
    * over every row — not byte-bound scans; a serving-sized artifact
    * (≤ the target) stays at its natural width, so tiny tiers never
    * pay the fan-out tax. */
  def widenBySize(df: DataFrame, bytes: Long,
                  bytesPerPartition: Long = 512L << 10): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val want = math.min(cores.toLong, math.max(1L,
      (bytes + bytesPerPartition - 1) / bytesPerPartition)).toInt
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Recursive byte size of a filesystem path (0 when absent) — the
    * artifact-size input to [[widenBySize]] at load time. */
  def pathBytes(spark: org.apache.spark.sql.SparkSession,
                dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // absent path → 0 (widenBySize no-op) is the intended degrade;
    // fatal errors (OOM, interrupt) must NOT be swallowed into a
    // silent serving-width collapse
    try fs.getContentSummary(p).getLength
    catch { case scala.util.control.NonFatal(_) => 0L }
  }
}
