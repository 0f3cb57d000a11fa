package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable probabilistic sketches for corpus-scale statistics —
  * the O(KB-per-partition) answers to questions whose exact forms need
  * a corpus-wide shuffle:
  *
  *  - [[hllRegisters]]/[[hllEstimate]]: HyperLogLog cardinality
  *    (Flajolet et al. 2007). "How many distinct n-grams does this
  *    100 TB corpus have?" exactly costs a distinct-shuffle of every
  *    n-gram occurrence; the sketch is a map-side `groupBy(bucket).
  *    agg(max(rho))` whose shuffle is ≤ m=2^p rows of two ints TOTAL
  *    (partial max-aggregation folds everything else map-side).
  *  - [[bloomBuild]]/[[bloomProbe]]: Bloom-filter membership. The
  *    100 TB face of the contamination audit: instead of equi-joining
  *    the test corpus against billions of train n-grams (a full
  *    shuffle of the big side), build an m-bit bitmap (m/8 bytes,
  *    broadcastable at even 1e10 grams), and probe map-side with
  *    false-positive rate (1−e^{−kn/m})^k and ZERO false negatives.
  *
  * Both sketches are deterministic functions of the data — no RNG, no
  * JVM hash: every hash is derived from md5 hex prefixes (the
  * [[Splits.hashFrac]] idiom), so DuckDB replicates registers, bitmaps
  * and estimates bit-for-bit, and the driver oracle gates them like
  * any exact operator. Mirrors the role of the reference's exhaustive
  * oracle (utils.rs:68-82): a cheap certified summary next to an
  * expensive exact path.
  */
object Sketches {

  /** 60-bit portable hash: md5 hex prefix, optionally salted. Salt goes
    * IN FRONT of the value so multi-hash sketches get independent
    * streams ("0x"-free decimal conv — exact for 15 hex digits). */
  def hash60(c: Column, salt: Int = 0): Column = {
    val keyed = if (salt == 0) c.cast("string")
      else concat(lit(s"$salt|"), c.cast("string"))
    conv(substring(md5(keyed), 1, 15), 16, 10).cast("long")
  }

  // ---------------- HyperLogLog ----------------

  /** HLL registers over `valueCol` occurrences (duplicates are free —
    * max() absorbs them; no distinct pass): bucket = low p bits,
    * rho = 1 + leading-zero count of the remaining w = 60−p bits.
    * Returns (bucket INT, rho INT), one row per NON-EMPTY bucket,
    * ≤ 2^p rows. The only shuffle is the partial-aggregated
    * (bucket, max rho) pairs — constant-size regardless of corpus. */
  def hllRegisters(df: DataFrame, valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range [4,16]")
    val w = 60 - p
    val h = hash60(col(valueCol))
    val bucket = h.bitwiseAND(lit((1L << p) - 1)).cast("int")
    // rest > 0: its bit length is floor(log2 rest)+1 → rho = w+1−len;
    // the ltrim('0') makes the length read identical whether an
    // engine's bin() zero-pads or not. rest == 0 (all w bits zero) is
    // special-cased to rho = w+1.
    val rest = shiftright(h, p)
    val rho = when(rest === 0L, lit(w + 1))
      .otherwise(lit(w + 1) - length(ltrim(bin(rest), "0"))).cast("int")
    df.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho"))
  }

  /** HLL estimate from a register table, with the standard small-range
    * correction: the raw estimator α_m·m²/Σ2^{−M_j} (empty buckets
    * contribute 2^0) is biased high below ~2.5·m (an empty input reads
    * ~0.72·m), so when raw ≤ 2.5·m and empty buckets exist the estimate
    * switches to linear counting m·ln(m/empty) (Flajolet et al. 2007
    * §4) — an empty register table then estimates exactly 0. The raw Σ
    * is a SORTED-by-bucket left fold seeded with the empty-bucket count
    * — every addend is a power of two, every rounding decision
    * identical in any IEEE engine, so the raw branch is oracle-gateable
    * at full double precision; the ln in the corrected branch is libm
    * (1-ulp engine variance possible), so oracle lanes gate it
    * QUANTIZED (see sketch_hll_small). One row: (m, nonempty,
    * estimate). */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    def raw =
      lit(alpha) * lit(m.toDouble) * lit(m.toDouble) /
        aggregate(col("regs"),
          (lit(m) - col("nonempty")).cast("double"),
          (acc, r) => acc + pow(lit(2.0d), -r.getField("rho").cast("double")))
    registers
      .agg(count(lit(1)).cast("int").as("nonempty"),
        sort_array(collect_list(struct(col("bucket"), col("rho"))))
          .as("regs"))
      .select(lit(m).as("m"), col("nonempty"),
        when(col("nonempty") < m && raw <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) /
            (lit(m) - col("nonempty")).cast("double")))
          .otherwise(raw)
          .as("estimate"))
  }

  /** Per-key HLL registers: one independent register table per value of
    * `keyCol` — "distinct URLs per domain", "distinct shingles per
    * source" — in ONE pass. Returns (key, bucket, rho), ≤ keys · 2^p
    * rows; the only shuffle is the partial-aggregated
    * (key, bucket, max rho) triples, bounded by keys · m and never by
    * the corpus (the per-key face of [[hllRegisters]] — same hash,
    * same register contract, so per-key tables merge with the global
    * one's monoid: max by (key, bucket)). */
  def hllRegistersByKey(df: DataFrame, keyCol: String, valueCol: String,
                        p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range [4,16]")
    val w = 60 - p
    val h = hash60(col(valueCol))
    val bucket = h.bitwiseAND(lit((1L << p) - 1)).cast("int")
    val rest = shiftright(h, p)
    val rho = when(rest === 0L, lit(w + 1))
      .otherwise(lit(w + 1) - length(ltrim(bin(rest), "0"))).cast("int")
    df.select(col(keyCol), bucket.as("bucket"), rho.as("rho"))
      .groupBy(col(keyCol), col("bucket")).agg(max("rho").as("rho"))
  }

  /** Per-key HLL estimates from a [[hllRegistersByKey]] table: the
    * [[hllEstimate]] arithmetic (sorted-by-bucket fold, small-range
    * linear-counting switch) applied independently per key. One row
    * per key present in the registers: (key, nonempty, estimate) —
    * keys with no rows never appear (their estimate is 0). */
  def hllEstimateByKey(registers: DataFrame, keyCol: String,
                       p: Int): DataFrame = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    def raw =
      lit(alpha) * lit(m.toDouble) * lit(m.toDouble) /
        aggregate(col("regs"),
          (lit(m) - col("nonempty")).cast("double"),
          (acc, r) => acc + pow(lit(2.0d), -r.getField("rho").cast("double")))
    registers
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("int").as("nonempty"),
        sort_array(collect_list(struct(col("bucket"), col("rho"))))
          .as("regs"))
      .select(col(keyCol), col("nonempty"),
        when(col("nonempty") < m && raw <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) /
            (lit(m) - col("nonempty")).cast("double")))
          .otherwise(raw)
          .as("estimate"))
  }

  // ---------------- Bloom filter ----------------

  /** Smallest logm whose 2^logm-bit filter holds `nKeys` at ≤
    * `targetFp` false-positive rate with k hashes (fp ≈
    * (1 − e^{−k·n/m})^k, the standard estimate). Size the bitmap from
    * the key count instead of guessing: the 10M budget smoke measured
    * the under-sizing failure mode — logm = 24 at 8.1M train keys is
    * fp ≈ 0.37, flagging 45% of probes (BASELINE.md r10 row). Errors
    * past logm = 30 (a 128 MB bitmap; beyond it revisit k or fp). */
  def bloomLogmFor(nKeys: Long, k: Int = 3, targetFp: Double = 0.01): Int = {
    require(nKeys > 0, s"bloomLogmFor: nKeys must be positive, got $nKeys")
    require(k >= 1, s"bloomLogmFor: k must be >= 1, got $k")
    require(targetFp > 0 && targetFp < 1,
      s"bloomLogmFor: targetFp in (0,1), got $targetFp")
    (5 to 30).find { logm =>
      val m = math.pow(2.0, logm)
      math.pow(1.0 - math.exp(-k.toDouble * nKeys / m), k) <= targetFp
    }.getOrElse(throw new IllegalArgumentException(
      s"bloomLogmFor: no logm <= 30 reaches fp $targetFp for $nKeys keys " +
        s"at k=$k — relax targetFp or raise k toward the optimum"))
  }

  /** Build an m = 2^logm bit Bloom filter over `valueCol` with k salted
    * hash positions per value: returns (word LONG, bits LONG) — the
    * bitmap packed 32 bits/row (bit 32..63 unused: engines that check
    * signed-shift overflow, DuckDB included, refuse 1::BIGINT << 63,
    * and the oracle must replicate the words bit-for-bit), ≤ m/32 rows
    * (m/4 bytes), broadcastable. Shuffle is the partial-aggregated
    * (word, bit_or) pairs — bounded by the bitmap size, never by the
    * corpus. */
  def bloomBuild(df: DataFrame, valueCol: String, logm: Int, k: Int): DataFrame = {
    require(logm >= 6 && logm <= 30, s"logm=$logm out of range [6,30]")
    require(k >= 1 && k <= 8, s"k=$k out of range [1,8]")
    val mask = (1L << logm) - 1
    val positions = (0 until k).map(i => hash60(col(valueCol), salt = i + 1)
      .bitwiseAND(lit(mask)))
    df.select(explode(array(positions: _*)).as("pos"))
      .select(shiftright(col("pos"), 5).as("word"),
        expr("shiftleft(1L, cast(pos & 31 as int))").as("m1"))
      .groupBy("word").agg(expr("bit_or(m1)").as("bits"))
  }

  /** Probe: appends `maybe_member` = true iff ALL k salted bit
    * positions are set in the filter (no false negatives; false
    * positives at the (1−e^{−kn/m})^k rate). Plan shape: k chained
    * BroadcastHashJoins against the (word, bits) bitmap — every lookup
    * is map-side, the probed corpus NEVER shuffles, no self-join, no
    * row ids. At 100 TB the probe is a streaming narrow pipeline. */
  def bloomProbe(bloom: DataFrame, df: DataFrame, valueCol: String,
                 logm: Int, k: Int): DataFrame = {
    val mask = (1L << logm) - 1
    val out = (0 until k).foldLeft(df) { (acc, i) =>
      val b = bloom.select(col("word").as(s"__w$i"), col("bits").as(s"__b$i"))
      acc
        .withColumn(s"__pos$i",
          hash60(col(valueCol), salt = i + 1).bitwiseAND(lit(mask)))
        .withColumn(s"__w$i", shiftright(col(s"__pos$i"), 5))
        .withColumn(s"__m$i",
          expr(s"shiftleft(1L, cast(__pos$i & 31 as int))"))
        .join(broadcast(b), Seq(s"__w$i"), "left")
    }
    val allSet = (0 until k)
      .map(i => col(s"__b$i").isNotNull &&
        col(s"__b$i").bitwiseAND(col(s"__m$i")) === col(s"__m$i"))
      .reduce(_ && _)
    out.withColumn("maybe_member", allSet)
      .drop((0 until k).flatMap(i =>
        Seq(s"__pos$i", s"__w$i", s"__m$i", s"__b$i")): _*)
  }

  // ---------------- KMV (bottom-k) sketch ----------------

  /** KMV / bottom-R distinct sketch (Bar-Yossef et al. 2002): the R
    * smallest 60-bit portable hashes over the DISTINCT values of
    * `valueCol`. Returns ≤ R rows (h LONG), unordered (callers order).
    *
    * Plan shape: each task folds its rows into a bounded distinct
    * bottom-R set (O(R) memory, duplicates absorbed locally), emits
    * ≤ R hashes, and the global cut is `orderBy(h).limit(R)` —
    * TakeOrderedAndProject, so the only movement is ≤ tasks × R longs.
    * The exact distinct count this estimates costs a corpus-wide
    * distinct shuffle (1,874 MB vs 1 MB at the 1M HLL smoke,
    * BASELINE.md) — KMV buys the same answer class PLUS a mergeable
    * uniform sample of the value space.
    *
    * Mergeable: bottomR(A ∪ B) = bottomR(bottomR(A) ∪ bottomR(B)) with
    * duplicate hashes collapsed — the monoid
    * [[graft.streaming.Streaming.ingestKmv]] folds per micro-batch. */
  def kmvSketch(df: DataFrame, valueCol: String, r: Int): DataFrame = {
    require(r >= 2 && r <= (1 << 16), s"r=$r out of range [2, 65536]")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(hash60(col(valueCol)).as("h")).as[Long]
      .mapPartitions { it =>
        val set = new java.util.TreeSet[java.lang.Long]()
        it.foreach { h =>
          if (!set.contains(h)) {
            if (set.size < r) set.add(h)
            else if (h < set.last) { set.add(h); set.pollLast() }
          }
        }
        scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator())
          .asScala.map(Long.unbox)
      }
      .toDF("h")
      // the same value seen in TWO partitions emits its hash from both
      // bounded folds — collapse before the cut (the dedup shuffle sees
      // only the ≤ tasks × R candidate hashes, never the corpus)
      .dropDuplicates("h")
      .orderBy(col("h")).limit(r)
  }

  /** Set-overlap estimates from TWO KMV sketches (Beyer et al. 2007,
    * the theta-sketch idiom): combine `skA`/`skB` (each a ≤ R-row
    * (h LONG) frame from [[kmvSketch]]) into the bottom-R of their
    * union K, then
    *
    *  - Jaccard ≈ |{h ∈ K : h ∈ A ∧ h ∈ B}| / |K| — valid because
    *    K's threshold θ = max(K) is ≤ both per-sketch thresholds, so
    *    below θ sketch membership ⟺ set membership;
    *  - |A ∪ B| from K via the [[kmvEstimate]] estimator;
    *  - |A ∩ B| = Jaccard · |A ∪ B|.
    *
    * Under capacity (|K| < R) all three are EXACT. This is the O(KB)
    * answer to "how much does corpus A overlap corpus B?" (train/eval
    * leakage triage, cross-source duplication rate): the corpora are
    * each folded ONCE into an R-row sketch and never joined — the
    * exact form is an equi-join that shuffles the smaller corpus'
    * whole value set. All arithmetic is count ratios and the KMV
    * divide over exactly-representable operands — bit-portable,
    * oracle-gated un-quantized. One row:
    * (r, n_held, n_both, jaccard, union_est, inter_est). */
  def kmvOverlap(skA: DataFrame, skB: DataFrame, r: Int): DataFrame = {
    require(r >= 2 && r <= (1 << 16), s"r=$r out of range [2, 65536]")
    val k = skA.select(col("h"), lit(1).as("ina"), lit(0).as("inb"))
      .unionAll(skB.select(col("h"), lit(0).as("ina"), lit(1).as("inb")))
      .groupBy("h").agg(max("ina").as("ina"), max("inb").as("inb"))
      .orderBy(col("h")).limit(r)
    val two60 = lit(1152921504606846976L).cast("double") // 2^60 exact
    k.agg(count(lit(1)).cast("int").as("n_held"),
        max(col("h")).as("h_r"),
        coalesce(sum(col("ina") * col("inb")), lit(0L)).cast("long")
          .as("n_both"))
      .select(lit(r).as("r"), col("n_held"), col("n_both"),
        when(col("n_held") === 0, lit(0.0d))
          .otherwise(col("n_both").cast("double") / col("n_held").cast("double"))
          .as("jaccard"),
        when(col("n_held") < r, col("n_held").cast("double"))
          .otherwise(lit((r - 1).toDouble) * two60 / col("h_r").cast("double"))
          .as("union_est"))
      .withColumn("inter_est", col("jaccard") * col("union_est"))
  }

  /** Distinct-count estimate from a KMV sketch: when the sketch holds
    * fewer than R hashes the count is EXACT (= n_held); at capacity the
    * R-th smallest hash h_R estimates density on [0, 2^60) and the
    * unbiased estimator is (R−1) · 2^60 / h_R. All arithmetic is one
    * double multiply + divide over exactly-representable operands —
    * bit-portable, oracle-gated un-quantized. One row:
    * (r, n_held, estimate). */
  def kmvEstimate(sketch: DataFrame, r: Int): DataFrame = {
    val two60 = lit(1152921504606846976L).cast("double") // 2^60 exact
    sketch
      .agg(count(lit(1)).cast("int").as("n_held"),
        max(col("h")).as("h_r"))
      .select(lit(r).as("r"), col("n_held"),
        when(col("n_held") < r, col("n_held").cast("double"))
          .otherwise(lit((r - 1).toDouble) * two60 / col("h_r").cast("double"))
          .as("estimate"))
  }

  /** Content-addressed uniform row sample: the rows whose hash60(id) is
    * among the R smallest — the row-sampling face of [[kmvSketch]]
    * (deterministic, repartition-stable; re-sampling a union re-ranks,
    * so samples merge exactly like the sketch). The R winning hashes
    * come from the bounded fold above and broadcast back as a semi-join
    * key — the corpus never shuffles and is scanned twice (once to
    * rank, once to select), both narrow. Ids must be distinct. */
  def bottomKSample(df: DataFrame, idCol: String, r: Int): DataFrame = {
    val winners = kmvSketch(df.select(col(idCol)), idCol, r)
    df.withColumn("__h", hash60(col(idCol)))
      .join(broadcast(winners.withColumnRenamed("h", "__h")),
        Seq("__h"), "left_semi")
      .drop("__h")
  }

  /** Nearest-rank quantiles of `valueCol` over a (sample-sized) frame:
    * for each q the element at rank max(1, ⌈q·n⌉) in value order —
    * integer ranks only, no interpolation, so the answer is an ACTUAL
    * data value and bit-portable however the engines round. Meant for
    * the ≤ R rows of [[bottomKSample]] (the global sort window is
    * sample-sized — never call this on a corpus; the corpus-scale
    * alternative is approx_percentile, cf. Layout.quantileBuckets).
    * Returns (q DOUBLE, value) per requested quantile. */
  def sampleQuantiles(sample: DataFrame, valueCol: String,
                      qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = sample
      .select(col(valueCol).as("value"))
      .withColumn("rn", row_number().over(Window.orderBy(col("value"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    val qdf = sample.sparkSession.createDataFrame(
      qs.map(Tuple1(_))).toDF("q")
    ranked.join(broadcast(qdf),
        col("rn") === greatest(lit(1L),
          ceil(col("q") * col("n").cast("double")).cast("long")))
      .select(col("q"), col("value"))
  }

  // ---------------- Count-min sketch ----------------

  /** Build a depth×2^logw count-min sketch over `valueCol` occurrences:
    * returns (row INT, col LONG, cnt LONG), ≤ depth·2^logw counters.
    * The shuffle is the partial-aggregated counter table — bounded by
    * the sketch dimensions, never the corpus. Estimates overcount,
    * never undercount (each row's counter absorbs every colliding
    * value), with error ≤ ε·N at ε = e/2^logw, δ = e^{−depth}. */
  def cmsBuild(df: DataFrame, valueCol: String, logw: Int, depth: Int): DataFrame = {
    require(logw >= 4 && logw <= 24, s"logw=$logw out of range [4,24]")
    require(depth >= 1 && depth <= 8, s"depth=$depth out of range [1,8]")
    val mask = (1L << logw) - 1
    val rows = (0 until depth).map(i =>
      struct(lit(i).as("row"),
        hash60(col(valueCol), salt = i + 1).bitwiseAND(lit(mask)).as("col")))
    df.select(explode(array(rows: _*)).as("rc"))
      .select(col("rc.row").as("row"), col("rc.col").as("col"))
      .groupBy("row", "col").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimate: min over the depth counters addressed by the
    * value's salted hashes — depth chained BroadcastHashJoins, the
    * probed frame never shuffles (the [[bloomProbe]] plan shape). */
  def cmsLookup(cms: DataFrame, df: DataFrame, valueCol: String,
                logw: Int, depth: Int): DataFrame = {
    val mask = (1L << logw) - 1
    val out = (0 until depth).foldLeft(df) { (acc, i) =>
      val slice = cms.filter(col("row") === i)
        .select(col("col").as(s"__c$i"), col("cnt").as(s"__n$i"))
      acc
        .withColumn(s"__c$i",
          hash60(col(valueCol), salt = i + 1).bitwiseAND(lit(mask)))
        .join(broadcast(slice), Seq(s"__c$i"), "left")
    }
    val counters = (0 until depth).map(i => coalesce(col(s"__n$i"), lit(0L)))
    val est = if (counters.size == 1) counters.head else least(counters: _*)
    out.withColumn("cms_count", est)
      .drop((0 until depth).flatMap(i => Seq(s"__c$i", s"__n$i")): _*)
  }
}
