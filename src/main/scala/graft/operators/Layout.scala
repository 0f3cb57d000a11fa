package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout via Z-order (Morton) interleaving
  * (beyond the reference surface — the write-side optimization that
  * makes 100 TB readable: co-locating rows that are close in SEVERAL
  * filter dimensions at once means a query filtering on any of them
  * prunes most files by min/max footer stats, where a single-column
  * sort only serves its leading column).
  *
  * The key math is pure integer bit-interleaving — engine-portable
  * (shifts/masks behave identically in Spark and the DuckDB oracle) and
  * codegen-friendly (a fixed unrolled expression tree, no UDF).
  *
  * Scale shape: computing the key is a narrow map. CLUSTERING by it is
  * one range-exchange + local sort (`repartitionByRange(zkey)`), the
  * same shuffle a plain sort-by-column write pays — Z-order changes
  * WHAT you sort by, not how much you shuffle. Bucketization at scale
  * uses fixed range splits or a sampled quantile map (computed once,
  * broadcast); the exact-rank `ntile` path below is the oracle-checkable
  * face for bounded inputs.
  */
object Layout {

  /** Interleave the low `bits` bits of two bucket ids: bit i of `a`
    * lands at position 2i+1, bit i of `b` at 2i — the Morton code.
    * Unrolled OR-free form (disjoint bit positions sum safely).
    */
  def interleaveBits(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 16, "interleave supports 1..16 bits/dim")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_ + _)
  }

  /** Exact-rank bucketization of `orderCol` into 2^bits equal-frequency
    * buckets (0-based), totally ordered by the tiebreaker for
    * determinism. One global window — the ORACLE-CHECKABLE face; at
    * corpus scale substitute a sampled-quantile bucket map (same
    * downstream key math).
    */
  def rankBucket(orderCol: Column, tieCol: Column, bits: Int = 8): Column =
    (ntile(1 << bits).over(
      org.apache.spark.sql.expressions.Window.orderBy(orderCol, tieCol)) - 1)
      .cast("long")

  /** Z-cluster a frame by a precomputed `zkey`: range-partition on the
    * key and sort within partitions, so every output file covers one
    * compact tile of the multi-dim space (tight min/max footers on ALL
    * interleaved dimensions).
    */
  def cluster(df: DataFrame, zkeyCol: String, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, col(zkeyCol))
      .sortWithinPartitions(col(zkeyCol))

  /** Hilbert-curve key for two `bits`-bit bucket ids — the
    * better-locality alternative to [[interleaveBits]] (the Hilbert
    * walk visits grid cells in a path where CONSECUTIVE keys are
    * always grid neighbours, so range-clustered files cover even
    * tighter tiles than Morton order; the property LayoutSpec pins).
    *
    * The classical xy2d loop carries mutable (x, y, d) state across
    * `bits` levels; expressed Spark-natively as one chained PROJECTION
    * per level over bound attribute columns — no UDF, no lambda, and
    * no expression blow-up (multi-referenced aliases block projection
    * collapse), so the whole key stays inside whole-stage codegen.
    * The oracle replays the identical chain as per-level CTEs.
    */
  def withHilbertKey(df: DataFrame, xCol: String, yCol: String,
                     bits: Int = 8, out: String = "hkey"): DataFrame = {
    require(bits >= 1 && bits <= 16, "hilbert supports 1..16 bits/dim")
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    for (lvl <- (bits - 1) to 0 by -1) {
      val s = 1L << lvl
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
      cur = cur
        .withColumn("__hd", col("__hd") +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hy"))
              .otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hx"))
              .otherwise(col("__hx")))
            .otherwise(col("__hy")))
      cur = cur
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
    }
    cur.withColumn(out, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry", "__nx", "__ny")
  }

  /** THE SCALE PATH for bucketization: 2^bits − 1 approximate quantile
    * split points (one `approx_percentile` aggregate — a sketch, no
    * global sort, no window) applied as a broadcast-literal bucket
    * expression. Equal-frequency like [[rankBucket]] up to sketch
    * accuracy, at a per-row cost of a 255-term codegen fold instead of
    * a corpus-wide single-partition sort. Skewed columns stay
    * equal-frequency — the property uniform `width_bucket` splits lose.
    *
    * Returns (bucketColumn, splits). Not oracle-gated (the sketch is
    * approximate by design); LayoutSpec gates bucket balance on skewed
    * data and tile-boundedness of the composed Z-key.
    */
  /** Size-targeted parquet write — the output-compaction operator: a
    * 100-TB pipeline stage that inherits its parent's partitioning
    * writes whatever file sizes the shuffle left behind (thousands of
    * KB-scale files after a selective filter, or multi-GB monoliths
    * after a coalesce), and both extremes poison the NEXT reader:
    * small files cost a task+open each, oversized files break
    * split-parallelism for non-splittable stages and straggle.
    *
    * Calibration is MEASURED, not guessed: a `sampleRows`-row slice is
    * written to a scratch dir in the real output format, so the
    * per-row estimate includes parquet encoding + compression exactly
    * as configured. File count = ceil(rows × bytesPerRow / target),
    * laid out round-robin, or range-clustered by `sortCols` (footer
    * min/max stats then prune on those columns — compose with a
    * [[interleaveBits]]/[[withHilbertKey]] key for multi-dim pruning).
    * A dictionary-heavy column compresses better at full scale than in
    * the sample, so real files land at-or-under target — the safe
    * side. Cost: one count job + one sample write + the output
    * exchange the re-layout requires anyway.
    *
    * Returns (files written, calibrated bytes/row). Data fidelity is
    * oracle-gated (layout_write_sized: read-back ≡ source); size
    * behavior is gated in LayoutSpec.
    */
  def writeSized(df: DataFrame, path: String,
                 targetFileBytes: Long = 128L << 20,
                 sortCols: Seq[String] = Nil,
                 sampleRows: Int = 10000): (Int, Double) = {
    require(targetFileBytes > 0 && sampleRows > 0,
      "targetFileBytes and sampleRows must be positive")
    val spark = df.sparkSession
    val cached = df.localCheckpoint(true) // count + sample + write: one lineage
    try {
      val total = cached.count()
      if (total == 0L) {
        cached.limit(0).write.mode("overwrite").parquet(path)
        return (0, 0.0)
      }
      val scratch = java.nio.file.Files
        .createTempDirectory("write_sized_probe").toString
      cached.limit(sampleRows).coalesce(1).write
        .mode("overwrite").parquet(scratch)
      val sampled = math.min(total, sampleRows.toLong)
      val sampleBytes = new java.io.File(scratch).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.length()).sum
      val bytesPerRow = sampleBytes.toDouble / sampled
      val nFiles = math.max(1L,
        math.ceil(total * bytesPerRow / targetFileBytes).toLong).toInt
      val laid =
        if (sortCols.isEmpty) cached.repartition(nFiles)
        else cached
          .repartitionByRange(nFiles, sortCols.map(col).toIndexedSeq: _*)
          .sortWithinPartitions(sortCols.map(col).toIndexedSeq: _*)
      laid.write.mode("overwrite").parquet(path)
      (nFiles, bytesPerRow)
    } finally cached.unpersist()
  }

  def quantileBuckets(df: DataFrame, valueCol: String,
                      bits: Int = 8): (Column, Array[Double]) = {
    require(bits >= 1 && bits <= 12, "quantileBuckets supports 1..12 bits")
    val k = 1 << bits
    val probs = (1 until k).map(_.toDouble / k)
    val splits = df.select(
        percentile_approx(col(valueCol).cast("double"),
          typedLit(probs), lit(10000)).as("s"))
      .head().getAs[scala.collection.Seq[Double]](0).toArray
    // bucket = number of split points ≤ v — a codegen fold over the
    // broadcast literal array; monotone, total, null-free for non-null v
    val b = aggregate(typedLit(splits.toSeq), lit(0L),
      (acc, s) => acc + when(col(valueCol).cast("double") >= s, 1L).otherwise(0L))
    (b, splits)
  }
}
