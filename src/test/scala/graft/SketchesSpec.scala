package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hll registers: buckets in range, rho in [1, w+1], duplicates free") {
    val vals = spark.range(2000).select(col("id").cast("string").as("v"))
    val regs = Sketches.hllRegisters(vals, "v", p = 8).collect()
    assert(regs.nonEmpty && regs.length <= 256)
    regs.foreach { r =>
      val b = r.getInt(0); val rho = r.getInt(1)
      assert(b >= 0 && b < 256)
      assert(rho >= 1 && rho <= 53, s"bucket $b rho $rho")
    }
    // HLL is a max-sketch: feeding every value three times changes nothing
    val dup = vals.union(vals).union(vals)
    val regsDup = Sketches.hllRegisters(dup, "v", p = 8)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1)))
    val regsOnce = Sketches.hllRegisters(vals, "v", p = 8)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(regsDup.toSeq == regsOnce.toSeq)
  }

  test("hll estimate within 3 standard errors at p=10") {
    val n = 50000
    val vals = spark.range(n).select(col("id").cast("string").as("v"))
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(vals, "v", p = 10), p = 10)
      .head().getAs[Double]("estimate")
    val se = 1.04 / math.sqrt(1024.0) // ≈ 3.25%
    assert(math.abs(est - n) / n < 3 * se,
      s"estimate $est vs exact $n (rel ${math.abs(est - n) / n})")
  }

  test("hll estimate is deterministic across recomputation") {
    val vals = spark.range(3000).select(col("id").cast("string").as("v"))
    def go() = Sketches.hllEstimate(
      Sketches.hllRegisters(vals, "v", p = 8), p = 8)
      .head().getAs[Double]("estimate")
    assert(go() == go())
  }

  test("bloom: zero false negatives, bounded false positives") {
    val n = 20000
    val members = spark.range(n).select(concat(lit("m"),
      col("id").cast("string")).as("v"))
    val bloom = Sketches.bloomBuild(members, "v", logm = 18, k = 3)
    // every member probes true — the no-false-negative contract
    val fn = Sketches.bloomProbe(bloom, members, "v", logm = 18, k = 3)
      .filter(!col("maybe_member")).count()
    assert(fn == 0)
    // disjoint probes: fp rate ≤ 3× the analytic (1−e^{−kn/m})^k
    val strangers = spark.range(n).select(concat(lit("x"),
      col("id").cast("string")).as("v"))
    val fp = Sketches.bloomProbe(bloom, strangers, "v", logm = 18, k = 3)
      .filter(col("maybe_member")).count()
    val m = (1 << 18).toDouble
    val analytic = math.pow(1.0 - math.exp(-3.0 * n / m), 3)
    assert(fp.toDouble / n <= 3 * analytic + 0.01,
      s"fp rate ${fp.toDouble / n} vs analytic $analytic")
  }

  test("bloom filter fits its claimed footprint") {
    val members = spark.range(5000).select(col("id").cast("string").as("v"))
    val bloom = Sketches.bloomBuild(members, "v", logm = 14, k = 3)
    assert(bloom.count() <= (1 << 14) / 32) // ≤ m/32 packed words
  }

  test("cms never undercounts; exact at generous width") {
    // 1000 values with frequency id%7+1
    val vals = spark.range(1000).select(col("id").cast("string").as("v"),
        (col("id") % 7 + 1).cast("int").as("f"))
      .select(explode(sequence(lit(1), col("f"))).as("rep"), col("v"))
      .select(col("v"))
    val exact = vals.groupBy("v").agg(count(lit(1)).as("n"))
    val cms = Sketches.cmsBuild(vals, "v", logw = 16, depth = 3)
    val probed = Sketches.cmsLookup(cms, exact, "v", logw = 16, depth = 3)
      .select(col("v"), col("n"), col("cms_count")).collect()
    assert(probed.length == 1000)
    probed.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"undercount at ${r.getString(0)}")
    }
    // at w=65536 with 1000 keys collisions are rare: ≥ 99% exact
    val exactHits = probed.count(r => r.getLong(2) == r.getLong(1))
    assert(exactHits >= 990, s"only $exactHits exact")
  }

  test("bloom probe plan: no shuffle on the probed side") {
    val members = spark.range(1000).select(col("id").cast("string").as("v"))
    val bloom = Sketches.bloomBuild(members, "v", logm = 14, k = 3)
      .localCheckpoint(true)
    val probes = spark.range(1000).select(col("id").cast("string").as("v"))
    val df = Sketches.bloomProbe(bloom, probes, "v", logm = 14, k = 3)
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(flatten)) ++ p.subqueries.flatMap(flatten)
    val shuffles = flatten(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // k chained BroadcastHashJoins: membership is a map-side lookup;
    // any shuffle means the probe corpus started moving
    assert(shuffles.isEmpty,
      s"probe plan shuffles:\n${df.queryExecution.executedPlan.toString.take(800)}")
  }

  test("hllEstimate switches to linear counting below 2.5m") {
    import spark.implicits._
    val p = 8; val m = 1 << p
    // 30 distinct values « 2.5·m = 640: raw HLL is biased high here,
    // linear counting is within a few percent
    val small = spark.range(30).select(col("id").cast("string").as("v"))
    val est = Sketches.hllEstimate(Sketches.hllRegisters(small, "v", p), p)
      .head()
    val nonempty = est.getInt(1)
    val expected = m * math.log(m.toDouble / (m - nonempty))
    assert(math.abs(est.getDouble(2) - expected) < 1e-9)
    assert(math.abs(est.getDouble(2) - 30.0) / 30.0 < 0.15)
    // empty input → estimate exactly 0 (ln(m/m)), not 0.72·m
    val empty = spark.emptyDataset[String].toDF("v")
    val e0 = Sketches.hllEstimate(Sketches.hllRegisters(empty, "v", p), p)
      .head()
    assert(e0.getInt(1) == 0 && e0.getDouble(2) == 0.0)
    // far above the threshold the raw estimator is untouched
    val big = spark.range(100000).select(col("id").cast("string").as("v"))
    val eb = Sketches.hllEstimate(Sketches.hllRegisters(big, "v", p), p)
      .head()
    assert(math.abs(eb.getDouble(2) - 100000.0) / 100000.0 < 0.2)
  }

  test("kmv: duplicates free, merge law, under-capacity exact") {
    val vals = spark.range(5000).select(col("id").cast("string").as("v"))
    val once = Sketches.kmvSketch(vals, "v", r = 128)
      .orderBy("h").collect().map(_.getLong(0))
    assert(once.length == 128 && once.toSeq == once.toSeq.sorted)
    // duplicates are free
    val dup = Sketches.kmvSketch(vals.union(vals), "v", r = 128)
      .orderBy("h").collect().map(_.getLong(0))
    assert(dup.toSeq == once.toSeq)
    // merge law: bottomR(A ∪ B) == bottomR(bottomR(A) ∪ bottomR(B))
    val a = vals.filter(col("v").substr(1, 1) =!= "1")
    val b = vals.filter(col("v").substr(1, 1) === "1")
    val merged = Sketches.kmvSketch(a, "v", 128)
      .unionByName(Sketches.kmvSketch(b, "v", 128))
      .dropDuplicates("h").orderBy("h").limit(128)
      .collect().map(_.getLong(0))
    assert(merged.toSeq == once.toSeq)
    // under capacity the estimate is the exact distinct count
    val small = spark.range(77).select(col("id").cast("string").as("v"))
    val es = Sketches.kmvEstimate(Sketches.kmvSketch(small, "v", 128), 128)
      .head()
    assert(es.getInt(1) == 77 && es.getDouble(2) == 77.0)
  }

  test("kmv estimate within 3 standard errors at r=1024") {
    val n = 50000
    val vals = spark.range(n).select(col("id").cast("string").as("v"))
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(vals, "v", 1024), 1024)
      .head().getAs[Double]("estimate")
    val se = 1.0 / math.sqrt(1024.0 - 2) // ≈ 3.1%
    assert(math.abs(est - n) / n < 3 * se,
      s"estimate $est vs exact $n (rel ${math.abs(est - n) / n})")
  }

  test("bottomKSample is deterministic and repartition-stable; quantiles are data values") {
    val docs = spark.range(1000)
      .select(col("id").as("doc_id"), (col("id") % 37).as("len"))
    val s1 = Sketches.bottomKSample(docs, "doc_id", 100)
      .orderBy("doc_id").collect().map(_.getLong(0))
    val s2 = Sketches.bottomKSample(docs.repartition(13), "doc_id", 100)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(s1.length == 100 && s1.toSeq == s2.toSeq)
    val qs = Sketches.sampleQuantiles(
        Sketches.bottomKSample(docs, "doc_id", 100), "len", Seq(0.5, 0.9))
      .orderBy("q").collect()
    assert(qs.length == 2)
    val lens = docs.select("len").collect().map(_.getLong(0)).toSet
    qs.foreach(r => assert(lens.contains(r.getLong(1))))
    // q=1.0 nearest-rank is the sample max
    val qmax = Sketches.sampleQuantiles(
        Sketches.bottomKSample(docs, "doc_id", 100), "len", Seq(1.0))
      .head().getLong(1)
    val smax = Sketches.bottomKSample(docs, "doc_id", 100)
      .agg(max("len")).head().getLong(0)
    assert(qmax == smax)
  }

  test("bloomLogmFor sizes the bitmap from the key count") {
    // the 10M smoke's failure mode: 8.1M keys at logm=24/k=3 is
    // fp≈0.37 — the helper must size well past it
    assert(Sketches.bloomLogmFor(8100000L, k = 3, targetFp = 0.01) >= 27)
    // and the chosen size actually meets the target, the next below doesn't
    val n = 1000000L
    val lm = Sketches.bloomLogmFor(n, k = 3, targetFp = 0.01)
    def fp(logm: Int) =
      math.pow(1.0 - math.exp(-3.0 * n / math.pow(2.0, logm)), 3)
    assert(fp(lm) <= 0.01 && fp(lm - 1) > 0.01, s"logm=$lm")
    // measured calibration at small scale: build at the chosen size,
    // probe disjoint keys, observed fp within 3x of target
    import spark.implicits._
    val keys = (0 until 20000).map(i => s"k$i").toDF("h")
    val probes = (0 until 20000).map(i => s"p$i").toDF("h")
    val lmS = Sketches.bloomLogmFor(20000L, k = 3, targetFp = 0.01)
    val bloom = Sketches.bloomBuild(keys, "h", logm = lmS, k = 3)
      .localCheckpoint(true)
    val flagged = Sketches.bloomProbe(bloom, probes, "h", logm = lmS, k = 3)
      .filter(col("maybe_member")).count()
    assert(flagged <= (20000 * 0.03).toLong, s"observed fp ${flagged / 20000.0}")
    // unreachable targets error instead of silently under-sizing
    intercept[IllegalArgumentException](
      Sketches.bloomLogmFor(Long.MaxValue / 4, k = 3, targetFp = 1e-9))
  }

  test("kmvOverlap under capacity is exact (jaccard, union, intersection)") {
    import spark.implicits._
    // |A|=60, |B|=50, |A∩B|=30 → |A∪B|=80, J=0.375; r=256 holds it all
    val a = (0 until 60).map(i => s"v$i").toDF("v")
    val b = (30 until 80).map(i => s"v$i").toDF("v")
    val row = Sketches.kmvOverlap(
      Sketches.kmvSketch(a, "v", r = 256),
      Sketches.kmvSketch(b, "v", r = 256), r = 256).head()
    assert(row.getAs[Int]("n_held") == 80)
    assert(row.getAs[Long]("n_both") == 30L)
    assert(row.getAs[Double]("jaccard") == 30.0 / 80.0)
    assert(row.getAs[Double]("union_est") == 80.0)
    assert(row.getAs[Double]("inter_est") == (30.0 / 80.0) * 80.0)
    // disjoint sets → zero overlap, exactly
    val c = (1000 until 1050).map(i => s"v$i").toDF("v")
    val dz = Sketches.kmvOverlap(
      Sketches.kmvSketch(a, "v", r = 256),
      Sketches.kmvSketch(c, "v", r = 256), r = 256).head()
    assert(dz.getAs[Long]("n_both") == 0L &&
      dz.getAs[Double]("jaccard") == 0.0 &&
      dz.getAs[Double]("inter_est") == 0.0)
  }

  test("kmvOverlap at capacity estimates a planted 50% overlap") {
    import spark.implicits._
    // |A|=|B|=20k, |A∩B|=10k → |A∪B|=30k, J=1/3
    val a = (0 until 20000).map(i => s"v$i").toDF("v")
    val b = (10000 until 30000).map(i => s"v$i").toDF("v")
    val row = Sketches.kmvOverlap(
      Sketches.kmvSketch(a, "v", r = 512),
      Sketches.kmvSketch(b, "v", r = 512), r = 512).head()
    assert(row.getAs[Int]("n_held") == 512)
    // SE ≈ sqrt(J(1−J)/r) ≈ 0.021 → 3σ band; union SE ≈ 1/sqrt(r)
    val j = row.getAs[Double]("jaccard")
    assert(math.abs(j - 1.0 / 3.0) < 0.07, s"jaccard $j")
    val u = row.getAs[Double]("union_est")
    assert(math.abs(u - 30000.0) / 30000.0 < 0.14, s"union $u")
    val i = row.getAs[Double]("inter_est")
    assert(math.abs(i - 10000.0) / 10000.0 < 0.25, s"inter $i")
  }

  test("per-key HLL equals the global HLL run on each key's slice") {
    import spark.implicits._
    // skewed per-key cardinalities: key k holds (k+1)·300 values
    val df = (0 until 4).flatMap(k =>
      (0 until (k + 1) * 300).map(i => (s"key$k", s"k$k-v$i")))
      .toDF("key", "v")
    val byKey = Sketches.hllEstimateByKey(
        Sketches.hllRegistersByKey(df, "key", "v", p = 8), "key", p = 8)
      .collect().map(r => (r.getString(0),
        (r.getInt(1), r.getAs[Double]("estimate")))).toMap
    assert(byKey.keySet == Set("key0", "key1", "key2", "key3"))
    (0 until 4).foreach { k =>
      val slice = df.filter(col("key") === s"key$k").select("v")
      val g = Sketches.hllEstimate(
        Sketches.hllRegisters(slice, "v", p = 8), p = 8).head()
      assert(byKey(s"key$k") == ((g.getAs[Int]("nonempty"),
        g.getAs[Double]("estimate"))), s"key$k")
    }
    // and the per-key registers fold back to the global ones: max by
    // bucket across keys == registers of the un-keyed stream
    val folded = Sketches.hllRegistersByKey(df, "key", "v", p = 8)
      .groupBy("bucket").agg(max("rho").as("rho"))
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1)))
    val global = Sketches.hllRegisters(df.select("v"), "v", p = 8)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(folded.toSeq == global.toSeq)
  }
}
