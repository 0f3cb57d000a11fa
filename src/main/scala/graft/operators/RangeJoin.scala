package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe range joins (beyond the reference surface — vers is
  * vectors-only): point-in-interval lookups and interval-overlap
  * pairing, the two non-equi joins every event/log/lineage pipeline
  * hits (ts-in-session, IP-in-CIDR-block, read-overlaps-transaction).
  *
  * Spark plans a raw non-equi join as BroadcastNestedLoopJoin (small
  * side) or a cartesian product (neither side small) — O(|L|·|R|) work
  * that dies long before 100 TB. The standard fix, implemented here,
  * is BUCKETIZATION: quantize the range coordinate into fixed-width
  * buckets, explode each interval to the buckets it covers, and
  * equi-join on the bucket id with the exact predicate as a residual
  * filter. Work becomes O(|points| + |intervals|·avgSpan/width +
  * |matches|), all of it shuffle-partitioned equi-join — AQE handles
  * bucket skew like any hot key.
  *
  * The classic failure mode — one huge interval exploding into
  * millions of buckets — is bounded by `longCap`: intervals spanning
  * more than `longCap` buckets are diverted to a broadcast non-equi
  * join instead. In real corpora long intervals are rare (that is WHY
  * they are long), so the diverted side stays broadcast-sized; the
  * caps make the worst case explicit instead of latent.
  *
  * Coordinates are integral (cast to LONG for bucketing); callers with
  * timestamps pass epoch seconds/micros, callers with IPs pass the
  * packed integer. Intervals are half-open [lo, hi) — empty intervals
  * (hi <= lo) match nothing.
  */
object RangeJoin {

  /** Mathematical floor-division of an integral column by w, in pure
    * 64-bit integer arithmetic: (a − pmod(a, w)) is the exact floor
    * multiple and `IntegralDivide` divides it without a double round
    * trip — exact over the whole LONG range (epoch nanoseconds
    * included; the r8 ADVICE flagged the former double-division form,
    * which silently misbuckets beyond 2⁵³). Sole edge: a within w of
    * Long.MinValue underflows the subtraction — unreachable for real
    * coordinates (timestamps, packed IPs, locality keys). */
  private[graft] def fdiv(a: Column, w: Long): Column = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    GraftShims.column(IntegralDivide(
      GraftShims.expression((a.cast("long") - pmod(a.cast("long"), lit(w)))),
      GraftShims.expression(lit(w)))).cast("long")
  }

  /** Join `points` to every interval of `intervals` containing them:
    * emit pointCol ∈ [loCol, hiCol). Output = all point columns + all
    * interval columns (names must not collide). `width` is the bucket
    * size in coordinate units — pick it near the MEDIAN interval
    * length so typical intervals explode to ~1–2 buckets; `longCap`
    * diverts intervals wider than that many buckets to the broadcast
    * path (keep the product rare·broadcast small).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      width: Long, longCap: Int = 64): DataFrame = {
    require(width > 0, "bucket width must be positive")
    require(longCap >= 1, "longCap must be at least 1")
    val clash = points.columns.intersect(intervals.columns)
    require(clash.isEmpty, s"point/interval column names collide: ${clash.mkString(",")}")
    require(!(points.columns ++ intervals.columns).contains("__bucket"),
      "__bucket is reserved")
    val loL = col(loCol).cast("long")
    val hiL = col(hiCol).cast("long")
    val nonEmpty = intervals.filter(hiL > loL)
    val bLo = fdiv(loL, width)
    val bHi = fdiv(hiL - lit(1L), width) // last covered bucket, inclusive
    val contains =
      col(pointCol).cast("long") >= loL && col(pointCol).cast("long") < hiL

    // longCap == Int.MaxValue: no diversion branch at all — the plan is
    // a single equi-join (the shape PlanSpec pins); the caller asserts
    // intervals are bounded. Any other cap adds the broadcast side as a
    // separate union branch (an empty diverted side still PLANS as a
    // nested-loop join — keeping it out of the no-cap config matters).
    val divert = longCap != Int.MaxValue
    val shortSide =
      if (divert) nonEmpty.filter(bHi - bLo < lit(longCap.toLong)) else nonEmpty
    val bucketed = points
      .withColumn("__bucket", fdiv(col(pointCol).cast("long"), width))
      .join(shortSide.withColumn("__bucket", explode(sequence(bLo, bHi))),
        Seq("__bucket"))
      .drop("__bucket")
      .filter(contains)

    if (!divert) bucketed
    else bucketed.unionByName(points.join(
      broadcast(nonEmpty.filter(bHi - bLo >= lit(longCap.toLong))), contains))
  }

  /** Pair every `a` interval with every overlapping `b` interval:
    * [aLo, aHi) ∩ [bLo, bHi) ≠ ∅, i.e. aLo < bHi && bLo < aHi. Both
    * sides bucketize; a pair overlapping in several shared buckets is
    * emitted EXACTLY once by the proration rule `bucket ==
    * max(floor(aLo/w), floor(bLo/w))` — the first bucket both
    * intervals cover, a per-row filter, no distinct/shuffle needed.
    * Long intervals on either side divert to the broadcast path
    * (deduplicated by the same rule against the bucketed halves:
    * a pair joins the broadcast path iff AT LEAST one side is long,
    * so the two paths partition the match set).
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      width: Long, longCap: Int = 64): DataFrame = {
    require(width > 0, "bucket width must be positive")
    require(longCap >= 1, "longCap must be at least 1")
    val clash = a.columns.intersect(b.columns)
    require(clash.isEmpty, s"a/b column names collide: ${clash.mkString(",")}")
    require(!(a.columns ++ b.columns).exists(Set("__bucket", "__bbucket")),
      "__bucket/__bbucket are reserved")
    def loL(c: String) = col(c).cast("long")
    val aNE = a.filter(loL(aHi) > loL(aLo))
    val bNE = b.filter(loL(bHi) > loL(bLo))
    val aSpanLong = fdiv(loL(aHi) - lit(1L), width) - fdiv(loL(aLo), width) >=
      lit(longCap.toLong)
    val bSpanLong = fdiv(loL(bHi) - lit(1L), width) - fdiv(loL(bLo), width) >=
      lit(longCap.toLong)
    val overlaps = loL(aLo) < loL(bHi) && loL(bLo) < loL(aHi)

    def exploded(df: DataFrame, lo: String, hi: String) = df.withColumn(
      "__bucket",
      explode(sequence(fdiv(loL(lo), width), fdiv(loL(hi) - lit(1L), width))))

    // Same diversion contract as [[pointInInterval]]: Int.MaxValue ⇒
    // single-plan bucketed equi-join, no nested-loop union branches.
    val divert = longCap != Int.MaxValue
    val aShort = if (divert) aNE.filter(!aSpanLong) else aNE
    val bShort = if (divert) bNE.filter(!bSpanLong) else bNE
    val bucketed = exploded(aShort, aLo, aHi)
      .join(exploded(bShort, bLo, bHi)
        .withColumnRenamed("__bucket", "__bbucket"),
        col("__bucket") === col("__bbucket"))
      .filter(overlaps)
      .filter(col("__bucket") ===
        greatest(fdiv(loL(aLo), width), fdiv(loL(bLo), width)))
      .drop("__bucket", "__bbucket")

    if (!divert) bucketed
    else {
      // Pairs with at least one long side: long-a × all-b, plus
      // short-a × long-b (the first term already covers long × long).
      val longA = aNE.filter(aSpanLong)
      val longB = bNE.filter(bSpanLong)
      val viaLongA = bNE.join(broadcast(longA), overlaps)
        .select(bucketed.columns.map(col).toIndexedSeq: _*)
      val viaLongB = aNE.filter(!aSpanLong).join(broadcast(longB), overlaps)
        .select(bucketed.columns.map(col).toIndexedSeq: _*)
      bucketed.unionByName(viaLongA).unionByName(viaLongB)
    }
  }
}
