package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-vector affine int8 quantization — the storage-scale path for
  * embedding columns (4× fewer bytes than float32 before parquet
  * encoding; at 100 TB the embedding table is usually the biggest
  * single column, so this is the difference between one copy and four).
  * Codes live as ARRAY<BIGINT> holding 0..255 here (parquet dictionary/
  * bit-packing stores them as bytes on disk; a TINYINT cast at the sink
  * is the caller's choice).
  *
  * Precision contract (shared with the DuckDB oracle): rounding is
  * `floor(z + 0.5)` — NOT `round()`, whose half-even vs half-up
  * behaviour differs across engines — and every operand is widened to
  * double first. A constant vector (hi == lo) quantizes to all-zero
  * codes and dequantizes to lo exactly.
  */
object Quant {

  /** Per-vector range lo (double). */
  def int8Lo(vec: Column): Column = array_min(vec).cast("double")

  /** Per-vector range hi (double). */
  def int8Hi(vec: Column): Column = array_max(vec).cast("double")

  /** Affine scale (hi − lo)/255; 0.0 for constant vectors. */
  def int8Scale(vec: Column): Column =
    (int8Hi(vec) - int8Lo(vec)) / lit(255.0d)

  /** Codes in 0..255 as ARRAY<BIGINT>: floor((x − lo)/scale + 0.5).
    * lo/hi ride in as zip_with ARGUMENTS via array_repeat (evaluated
    * once per row); referenced inside the lambda body they would
    * re-run the O(d) array_min/max per element — O(d²) per row (the
    * winnow lesson; this was the gap between SQ8 compress at ~15 s
    * and BQ compress at ~0.3 s on the 100k smoke). */
  def int8Codes(vec: Column): Column = {
    val params = array_repeat(
      struct(int8Lo(vec).as("lo"), int8Hi(vec).as("hi")), size(vec))
    zip_with(vec, params, (x, p) => {
      val lo = p.getField("lo"); val hi = p.getField("hi")
      val scale = (hi - lo) / lit(255.0d)
      when(hi === lo, lit(0L))
        .otherwise(floor((x.cast("double") - lo) / scale + lit(0.5d))
          .cast("long"))
    })
  }

  /** Dequantized values lo + code·scale (ARRAY<DOUBLE>). */
  def int8Dequant(vec: Column): Column = {
    val params = array_repeat(
      struct(int8Lo(vec).as("lo"), int8Scale(vec).as("scale")), size(vec))
    zip_with(int8Codes(vec), params,
      (c, p) => p.getField("lo") + c.cast("double") * p.getField("scale"))
  }

  /** Max |x − dequant(x)| per vector — the quantization error radius;
    * bounded by scale/2 (+ float ulps), pinned in spec. 0.0-seeded
    * greatest-fold (abs ≥ 0 makes the seed neutral, so the fold equals
    * DuckDB's first-element-seeded list_reduce bit-for-bit). */
  def int8MaxAbsErr(vec: Column): Column =
    aggregate(
      zip_with(vec, int8Dequant(vec), (x, d) => abs(x.cast("double") - d)),
      lit(0.0d), (acc, e) => greatest(acc, e))
}
