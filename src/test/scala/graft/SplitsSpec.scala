package graft

import org.apache.spark.sql.functions._

import graft.operators.Splits

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet").cache()

  test("split assignment is content-addressed: stable under repartition, ~cut-proportioned") {
    val a = Splits.assign(docs, "doc_id")
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical under a different physical layout — membership depends
    // on content only, never on partitioning (the anti-`sample()` claim)
    val b = Splits.assign(docs.repartition(17), "doc_id")
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val byCut = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byCut.keySet == Set("train", "val", "test"))
    // 500 docs: binomial(500, 0.8) stays within ±6σ ≈ ±54 of 400
    assert(math.abs(byCut("train") - 400) < 55, byCut.toString)
    assert(byCut("val") > 10 && byCut("test") > 10, byCut.toString)
  }

  test("sampleStratified: per-stratum rates, repartition-stable, split-independent") {
    val rates = Map("en" -> 0.5, "zh" -> 0.0)
    val kept = Splits.sampleStratified(docs, "doc_id", "lang", rates)
      .select($"doc_id", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // rate 0 drops the stratum entirely; default 1.0 keeps others whole
    assert(!kept.exists(_._2 == "zh"))
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBy = kept.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    totals.filterNot(t => Set("en", "zh")(t._1)).foreach { case (l, n) =>
      assert(keptBy.getOrElse(l, 0L) == n, s"default-rate stratum $l") }
    // en keeps ~half: binomial bound, ±6σ of n/2
    val en = totals("en")
    assert(math.abs(keptBy("en") - en / 2.0) < 6 * math.sqrt(en * 0.25), keptBy.toString)
    // content-addressed: identical under a different physical layout
    val again = Splits.sampleStratified(docs.repartition(13), "doc_id", "lang", rates)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept.map(_._1).toSet)
    // the sample hash is salted: en survivors are NOT just the en docs
    // of any one split (independence from assign's fraction)
    val trainIds = Splits.assign(docs, "doc_id")
      .filter($"split" === "train").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val enKept = kept.filter(_._2 == "en").map(_._1).toSet
    assert((enKept -- trainIds).nonEmpty && (trainIds -- enKept).nonEmpty)
  }

  test("assignByGroup keeps every doc of a source in one split; no cross-split leak surface within groups") {
    val rows = Splits.assignByGroup(docs, "source")
      .select($"doc_id", $"source", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // group-atomicity: one split per source
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._3).distinct.length == 1, s"source $src split across splits")
    }
    // stable under repartition, like assign
    val again = Splits.assignByGroup(docs.repartition(13), "source")
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, _, sp) => assert(again(id) == sp) }
    // a same-source pair can never straddle a split boundary: the
    // prevention face of crossSplitPairs' detection
    val bySrc = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(bySrc.values.forall(_.size == 1))
  }

  test("crossSplitPairs flags a planted train→test near-dup leak") {
    import graft.operators.Dedup
    // driver-side twin of the md5 split fraction, to plant ids by split
    def frac(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) / 4294967296.0
    }
    val base = docs.select($"doc_id", $"text")
    val sp = Splits.assign(base, "doc_id")
      .select($"doc_id", $"split", $"text").collect()
    val train = sp.find(r => r.getString(1) == "train"
      && r.getString(2).trim.split("\\s+").length >= 3).get
    val testId = (100000L to 100100L).find(frac(_) >= 0.9).get
    // the leak: a test doc that is an exact copy of a train doc
    val leaked = base.unionByName(
      Seq((testId, train.getString(2))).toDF("doc_id", "text"))
    val hits = Splits.crossSplitPairs(
        Dedup.minhashBandPairs(leaked, "doc_id", "text"), "doc_a", "doc_b",
        Splits.assign(leaked, "doc_id").select($"doc_id", $"split"), "doc_id")
      .collect()
    val hit = hits.find(r => r.getLong(1) == testId)
    assert(hit.isDefined, s"planted leak not flagged: ${hits.length} rows")
    assert(hit.get.getLong(0) == train.getLong(0))
    assert(hit.get.getString(2) == "train" && hit.get.getString(3) == "test")
  }

  test("packTokens: greedy lane packing — bins contiguous, budget-bounded, deterministic") {
    val budget = 200
    val out = Splits.packTokens(docs, "doc_id", "text",
      budget = budget, shards = 4).cache()
    assert(out.count() == docs.count())
    val lanes = out.select($"split", $"shard", $"doc_id", $"n_tokens", $"bin")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    lanes.values.foreach { lane =>
      // recompute the greedy rule locally: bin = exclusive prefix-sum
      // over id order, integer-divided by budget
      var prior = 0L
      lane.foreach { case (_, n, bin) =>
        assert(bin == prior / budget, lane.take(5).toString)
        prior += n
      }
      // bins start at 0 and are monotone in id order (a doc larger than
      // the whole budget may straddle past bins — ids never move back)
      val bins = lane.map(_._3)
      assert(bins.head == 0L && bins.zip(bins.tail).forall(p => p._2 >= p._1))
    }
    // shard lanes partition the corpus deterministically
    val again = Splits.packTokens(docs.repartition(13), "doc_id", "text",
      budget = budget, shards = 4)
      .select($"doc_id", $"bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.select($"doc_id", $"bin").collect()
      .foreach(r => assert(again(r.getLong(0)) == r.getLong(1)))
  }

  test("mixByTemperature: per-stratum keep rates track (n_min/n_s)^(1-alpha)") {
    val natural = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = natural.values.min
    val kept = Splits.mixByTemperature(docs, "doc_id", "lang", alpha = 0.5)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    natural.foreach { case (l, n) =>
      val expected = n * math.sqrt(nMin.toDouble / n)
      // binomial noise: ±4 sigma
      val sigma = math.sqrt(expected) + 1
      assert(math.abs(kept.getOrElse(l, 0L) - expected) <= 4 * sigma,
        s"$l: kept ${kept.getOrElse(l, 0L)} vs expected $expected")
    }
    // the smallest stratum keeps everything (rate exactly 1)
    val smallest = natural.minBy(_._2)._1
    assert(kept(smallest) == natural(smallest))
  }

  test("mixByTemperature: alpha=1 is a no-op; membership repartition-stable") {
    val all = Splits.mixByTemperature(docs, "doc_id", "lang", alpha = 1.0)
    assert(all.count() == docs.count())
    val a = Splits.mixByTemperature(docs, "doc_id", "lang")
      .select($"doc_id").as[Long].collect().toSet
    val b = Splits.mixByTemperature(docs.repartition(11), "doc_id", "lang")
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("calibratePerGroup: per-group quantile buckets keep equal fractions") {
    val cal = Splits.calibratePerGroup(docs, "lang", "n_chars", buckets = 4)
      .select($"doc_id", $"lang", $"q_rank", $"q_bucket").cache()
    // rank within [0,1]; bucket within [0,4)
    val rows = cal.collect()
    rows.foreach { r =>
      val (rank, b) = (r.getDouble(2), r.getInt(3))
      assert(rank >= 0.0 && rank <= 1.0)
      assert(b >= 0 && b < 4)
    }
    // "keep top quartile of every group" keeps ~1/4 of each group
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val top = cal.filter($"q_bucket" === 3).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.filter(_._2 >= 20).foreach { case (l, n) =>
      val frac = top.getOrElse(l, 0L).toDouble / n
      assert(frac > 0.10 && frac < 0.40, s"$l: $frac of $n")
    }
    // repartition-stable (window is content-ordered, not partition-ordered)
    val again = Splits.calibratePerGroup(docs.repartition(13), "lang",
        "n_chars", buckets = 4)
      .select($"doc_id", $"q_bucket").as[(Long, Int)].collect().toMap
    val base = cal.select($"doc_id", $"q_bucket").as[(Long, Int)]
      .collect().toMap
    assert(again == base)
  }

  test("packSubwords budgets by Viterbi subword counts, not whitespace") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").cache()
    val pieces = SparkEntry.UnigramPinned
    val sub = Splits.packSubwords(docs, "doc_id", "text", pieces,
        budget = 500, shards = 4)
      .select($"doc_id", $"n_tokens", $"bin")
      .as[(Long, Long, Long)].collect()
    assert(sub.nonEmpty)
    // per-doc counts equal an independently computed segment-and-sum
    val vmap = pieces.map(p => p.piece -> p.score).toMap
    val maxLen = pieces.map(_.piece.length).max
    val unk = pieces.map(_.score).min - 1000000L
    val direct = docs.as[(Long, String)].collect().map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty)
        .map(w => graft.operators.Unigram.segment(w, vmap, maxLen, unk)
          ._1.length.toLong).sum
    }.toMap
    sub.foreach { case (id, n, _) =>
      assert(n == direct(id), s"doc $id: packed $n vs direct ${direct(id)}")
    }
    // subword counts differ from whitespace counts (the budget is a
    // different denomination, not a relabeling)
    val ws = Splits.packTokens(docs, "doc_id", "text", budget = 500,
        shards = 4)
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    assert(sub.count { case (id, n, _) => n != ws(id) } > sub.length / 2)
    // BPE variant packs by its own denomination and stays consistent
    val ms = graft.operators.Bpe.train(docs.limit(40), "text",
      numMerges = 8, maxWords = 100).map(m => (m.left, m.right))
    val bpe = Splits.packSubwordsBpe(docs, "doc_id", "text", ms,
        budget = 500, shards = 4)
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    val enc = graft.operators.Bpe.encode(docs, "doc_id", "text", ms)
      .select($"id", size($"subwords").cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(bpe == enc)
  }

  test("mixByTemperatureWeighted: keep rates track token mass, not doc count") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"source", $"text").cache()
    val w = docs.withColumn("wt",
      size(graft.operators.TextOps.tokens($"text")).cast("long"))
    val kept = Splits.mixByTemperatureWeighted(w, "doc_id", "source", "wt",
      alpha = 0.5)
    // per-source kept token mass ∝ sqrt-flattened: rate_s ≈ sqrt(w_min/w_s)
    val mass = w.groupBy("source").agg(sum($"wt").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wMin = mass.values.min.toDouble
    val keptN = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalN = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mass.foreach { case (s, m) =>
      val expRate = math.sqrt(wMin / m.toDouble)
      val gotRate = keptN.getOrElse(s, 0L).toDouble / totalN(s)
      assert(math.abs(gotRate - expRate) < 0.25,
        s"$s: got $gotRate expected ~$expRate")
    }
    // content-addressed: repartition-stable membership
    val a = kept.select($"doc_id").as[Long].collect().toSet
    val b = Splits.mixByTemperatureWeighted(w.repartition(11), "doc_id",
      "source", "wt", alpha = 0.5).select($"doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("mixByTemperatureWeighted: a zero-mass source cannot zero the corpus") {
    // one source whose docs all weigh 0: w_min must come from the
    // POSITIVE sources (not collapse to 0 and filter everything), and
    // the zero-mass docs keep rate 1 (they consume no token budget)
    val w = (
      (0 until 40).map(i => (i.toLong, "big", 10L)) ++
      (40 until 60).map(i => (i.toLong, "small", 5L)) ++
      (60 until 70).map(i => (i.toLong, "empty", 0L))
    ).toDF("doc_id", "source", "wt")
    val kept = Splits.mixByTemperatureWeighted(w, "doc_id", "source", "wt",
      alpha = 0.5)
    val bySrc = kept.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every zero-mass doc survives; the positive sources mix normally
    // (small is the min-mass source → rate 1 → all 20 kept)
    assert(bySrc.getOrElse("empty", 0L) == 10L, bySrc.toString)
    assert(bySrc.getOrElse("small", 0L) == 20L, bySrc.toString)
    assert(bySrc.getOrElse("big", 0L) > 0L, bySrc.toString)
    // all-zero corpus: everything keeps (nothing to flatten)
    val allZero = (0 until 10).map(i => (i.toLong, s"s${i % 2}", 0L))
      .toDF("doc_id", "source", "wt")
    assert(Splits.mixByTemperatureWeighted(allZero, "doc_id", "source", "wt",
      alpha = 0.5).count() == 10L)
  }

  test("sampleWeightedTopK: exact k, repartition-stable, estimator tracks mass") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val k = 200
    val samp = Splits.sampleWeightedTopK(docs, "doc_id", "n_chars", k)
      .localCheckpoint(true)
    assert(samp.count() == k)
    // content-addressed: the selected id set ignores partitioning
    val again = Splits.sampleWeightedTopK(docs.repartition(17), "doc_id",
      "n_chars", k)
    val ids = samp.select("doc_id").as[Long].collect().toSet
    assert(again.select("doc_id").as[Long].collect().toSet == ids)
    // priority-sampling estimator: sum(est_w) over the sample estimates
    // the corpus' total weight; over a per-source slice, that source's
    // mass — the audit-by-sample property (one fixed draw: loose bands)
    val total = docs.agg(sum(col("n_chars").cast("long"))).head().getLong(0)
    val est = samp.agg(sum(col("est_w"))).head().getDouble(0)
    assert(math.abs(est - total) / total < 0.15,
      s"total $total est $est")
    val perSrcTrue = docs.groupBy("source")
      .agg(sum(col("n_chars").cast("long")).as("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSrcEst = samp.groupBy("source").agg(sum(col("est_w")).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    perSrcTrue.foreach { case (src, w) =>
      val e = perSrcEst.getOrElse(src, 0.0)
      assert(math.abs(e - w) / w < 0.5, s"source $src true $w est $e")
    }
    // weighted: heavy rows are over-represented vs uniform sampling
    val meanAll = total.toDouble / docs.count()
    val meanSamp = samp.agg(avg(col("n_chars").cast("double")))
      .head().getDouble(0)
    assert(meanSamp > meanAll, s"sample mean $meanSamp vs corpus $meanAll")
    samp.unpersist()
  }

  test("sampleWeightedPerGroup: per-group k, per-group tau, small groups whole") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val k = 30
    val out = Splits.sampleWeightedPerGroup(docs, "doc_id", "n_chars",
      "lang", k).localCheckpoint(true)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) == math.min(n, k.toLong),
        s"$lang: corpus $n sample ${got.getOrElse(lang, 0L)}")
    }
    // per-group slice of the stratified operator == the global operator
    // run on that group alone (same salt => same priorities)
    val langs = sizes.keys.toSeq.sorted.take(2)
    langs.foreach { lang =>
      val alone = Splits.sampleWeightedTopK(
          docs.filter(col("lang") === lang), "doc_id", "n_chars", k)
        .select($"doc_id", $"est_w").as[(Long, Double)].collect().toSet
      val sliced = out.filter(col("lang") === lang)
        .select($"doc_id", $"est_w").as[(Long, Double)].collect().toSet
      assert(sliced == alone, s"$lang")
    }
    // small groups: everything kept with est_w = w
    sizes.filter(_._2 <= k).keys.foreach { lang =>
      assert(out.filter(col("lang") === lang)
        .filter(col("est_w") =!= col("n_chars").cast("double")).count() == 0L)
    }
    out.unpersist()
  }

  test("sampleWeightedTopK: corpus smaller than k keeps all, est_w = w") {
    import spark.implicits._
    val tiny = (0 until 7).map(i => (i.toLong, (i + 1) * 10))
      .toDF("doc_id", "wt")
    val out = Splits.sampleWeightedTopK(tiny, "doc_id", "wt", k = 50)
      .collect()
    assert(out.length == 7)
    assert(out.forall(r => r.getAs[Double]("est_w") == r.getAs[Int]("wt").toDouble))
  }
}
