package graft

import org.apache.spark.sql.functions._

import graft.operators.{Exhaustive, Retrieval}

/** Gates for lexical retrieval (BM25 over posting joins), reciprocal-
  * rank fusion, hybrid lexical+vector search, and exact radius search. */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("bm25 ranks rare-term matches above common-term matches") {
    // 'zebra' appears in one doc, 'the' in all four: a query holding
    // both must rank the zebra doc first (idf dominates), and a doc
    // sharing no term must not appear at all
    val docs = Seq(
      (0L, "the zebra grazes"),
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "entirely disjoint words here")).toDF("doc_id", "text")
    val qs = Seq((0L, "the zebra")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext",
        k = 10)
      .orderBy(col("rank")).collect()
    assert(got.map(_.getAs[Long]("doc_id")).head == 0L)
    // doc 3 shares no query term → absent; docs 1 and 2 match 'the'
    assert(!got.map(_.getAs[Long]("doc_id")).contains(3L))
    assert(got.length == 3)
    // scores strictly ordered and positive idf path sane
    val scores = got.map(_.getAs[Long]("score_q"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bm25 length normalization: same tf, shorter doc scores higher") {
    val docs = Seq(
      (0L, "apple pie"),
      (1L, "apple pie with a very long tail of extra filler words")
    ).toDF("doc_id", "text")
    val qs = Seq((0L, "apple")).toDF("qid", "qtext")
    val byDoc = Retrieval.bm25(docs, "doc_id", "text", qs, "qid", "qtext")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q"))
      .toMap
    assert(byDoc(0L) > byDoc(1L), s"length norm inverted: $byDoc")
  }

  test("bm25 query terms are distinct and scores are symmetric in term order") {
    val docs = Seq((0L, "alpha beta"), (1L, "beta gamma")).toDF("doc_id", "text")
    val q1 = Seq((0L, "alpha beta")).toDF("qid", "qtext")
    val q2 = Seq((0L, "beta alpha beta")).toDF("qid", "qtext")
    def m(q: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25(docs, "doc_id", "text", q, "qid", "qtext")
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_hit"), r.getAs[Long]("score_q"))).toSet
    assert(m(q1) == m(q2))
  }

  test("bm25 index save/load round-trip serves the identical ranking") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val qs = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val built = graft.operators.Retrieval.buildIndex(docs, "doc_id", "text")
    val want = built.searchTopK(qs, "qid", "qtext", k = 10)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    built.save(dir)
    built.unpersist()
    val re = graft.operators.Retrieval.loadIndex(spark, dir)
    val got = re.searchTopK(qs, "qid", "qtext", k = 10)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(re.k1 == 1.2 && re.b == 0.75)
    // stats frame round-trips exact double bits (no decimal re-parse)
    val a = built.stats.head(); val b2 = re.stats.head()
    assert(java.lang.Double.doubleToLongBits(a.getAs[Double]("avgdl")) ==
      java.lang.Double.doubleToLongBits(b2.getAs[Double]("avgdl")))
  }

  test("rrfFuse: overlap beats single-list rank-1; absent side contributes 0") {
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("qid", "id", "rank")
    val b = Seq((0L, 11L, 1L), (0L, 12L, 2L)).toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(a, b).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("rrf")).toMap
    assert(got.keySet == Set(10L, 11L, 12L))
    assert(got(10L) == 1.0 / 61.0)
    assert(got(12L) == 1.0 / 62.0)
    assert(got(11L) == 1.0 / 62.0 + 1.0 / 61.0)
    assert(got(11L) > got(10L) && got(10L) > got(12L))
  }

  test("rrfFuseAll: two lists == rrfFuse; three lists sum all three terms") {
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("qid", "id", "rank")
    val b = Seq((0L, 11L, 1L), (0L, 12L, 2L)).toDF("qid", "id", "rank")
    val c = Seq((0L, 12L, 1L), (0L, 13L, 3L)).toDF("qid", "id", "rank")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id")) ->
        r.getAs[Double]("rrf")).toMap
    // pairwise face: bit-identical to rrfFuse (same IEEE ops)
    assert(asMap(Retrieval.rrfFuseAll(Seq(a, b))) ==
      asMap(Retrieval.rrfFuse(a, b)))
    // triple face: every list contributes its own 1/(60+rank) term,
    // absent-from-a-list contributes exactly 0
    val got = asMap(Retrieval.rrfFuseAll(Seq(a, b, c)))
    assert(got.keySet.map(_._2) == Set(10L, 11L, 12L, 13L))
    assert(got((0L, 12L)) == 1.0 / 62.0 + 1.0 / 61.0)
    assert(got((0L, 13L)) == 1.0 / 63.0)
    assert(got((0L, 11L)) == 1.0 / 62.0 + 1.0 / 61.0)
    assert(got((0L, 10L)) == 1.0 / 61.0)
    assertThrows[IllegalArgumentException](Retrieval.rrfFuseAll(Seq(a)))
  }

  test("hybridSearch fuses the two rankers over real tables") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qs = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val qv = emb.filter(col("vec_id") < 3)
    val got = Retrieval.hybridSearch(docs, "doc_id", "text",
      emb, "vec_id", "embedding", qs, "qid", "qtext",
      qv, "vec_id", "embedding", k = 10)
    val rows = got.collect()
    // 3 queries, each ≤ 20 fused candidates, ranks contiguous from 1
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (_, rs) =>
      assert(rs.length >= 10 && rs.length <= 20)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
    }
    // the vector rank-1 for qid=q is q itself (self distance 0); its
    // fused score therefore ≥ 1/61 and it must sit in the fused list
    assert(rows.count(r => r.getAs[Long]("qid") == r.getAs[Long]("id")) == 3)
  }

  test("maxDf stopword pruning: capped terms vanish from scoring and candidates") {
    // 'the' is in all 4 docs (df=4); with maxDf=3 it must contribute
    // nothing — doc 3, which matches ONLY 'the', drops out of the
    // candidate set entirely (the scale win), and the zebra doc's
    // score equals a query without 'the'
    val docs = Seq(
      (0L, "the zebra grazes"),
      (1L, "the cat sat"),
      (2L, "the dog sat"),
      (3L, "the")).toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(docs, "doc_id", "text")
    val qBoth = Seq((0L, "the zebra")).toDF("qid", "qtext")
    val qZebra = Seq((0L, "zebra")).toDF("qid", "qtext")
    val capped = idx.searchMany(qBoth, "qid", "qtext", maxDf = Some(3L))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hit"), r.getAs[Long]("score_q"))).toMap
    val noStop = idx.searchMany(qZebra, "qid", "qtext")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hit"), r.getAs[Long]("score_q"))).toMap
    assert(capped == noStop) // only the zebra doc, scored identically
    assert(capped.keySet == Set(0L))
  }

  test("phraseSearch: verbatim order-sensitive matches with occurrence counts") {
    val docs = Seq(
      (0L, "the quick brown fox jumps"),
      (1L, "quick brown shoes and quick brown fox again quick brown fox"),
      (2L, "brown quick fox"),      // right terms, wrong ORDER
      (3L, "quick brown"),          // phrase at the very end boundary
      (4L, "quick quick quick")).toDF("doc_id", "text")
    val qs = Seq((0L, "quick brown fox"), (1L, "quick quick"))
      .toDF("qid", "phrase")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
        qs, "qid", "phrase")
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))
        -> r.getAs[Long]("n_occ")).toMap
    // q0: doc0 once, doc1 twice, doc2 is scrambled → absent, doc3 lacks fox
    // q1 "quick quick" (REPEATED term): doc4 has 2 overlapping occurrences
    assert(got == Map((0L, 0L) -> 1L, (0L, 1L) -> 2L, (1L, 4L) -> 2L),
      got.toString)
  }

  test("phraseSearch == brute-force sliding-window count on a seeded random corpus") {
    // tiny alphabet (3 tokens) maximizes repeated terms, overlapping
    // occurrences, and phrase-at-boundary cases — the traps of the
    // anchor/offset formulation
    val r = new scala.util.Random(0x9817A5EL)
    val vocab = Vector("a", "b", "c")
    def randSeq(max: Int) = Seq.fill(r.nextInt(max))(vocab(r.nextInt(3)))
    val docToks = (0 until 50).map(i => i.toLong -> randSeq(15)).toMap
    val qToks = (0 until 12).map(i => i.toLong -> (1 to (1 + r.nextInt(3)))
      .map(_ => vocab(r.nextInt(3)))).toMap
    val docs = docToks.toSeq.sortBy(_._1)
      .map { case (i, t) => (i, t.mkString(" ")) }.toDF("doc_id", "text")
    val qs = qToks.toSeq.sortBy(_._1)
      .map { case (i, t) => (i, t.mkString(" ")) }.toDF("qid", "phrase")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text", qs, "qid", "phrase")
      .collect().map(row => (row.getAs[Long]("qid"), row.getAs[Long]("doc_id"))
        -> row.getAs[Long]("n_occ")).toMap
    val want = (for {
      (q, ph) <- qToks.toSeq; (d, ts) <- docToks.toSeq
      n = ts.sliding(ph.size).count(w => w.size == ph.size && w == ph)
      if n > 0
    } yield (q, d) -> n.toLong).toMap
    assert(got == want)
  }

  test("add/remove/merge re-derive the statistics: lifecycle == scratch build") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val qs = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val lo = docs.filter(col("doc_id") < 250)
    val hi = docs.filter(col("doc_id") >= 250)
    def rank(idx: graft.operators.Retrieval.Bm25Index) =
      idx.searchTopK(qs, "qid", "qtext", k = 10)
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val full = rank(graft.operators.Retrieval.buildIndex(docs, "doc_id", "text"))
    val loOnly = rank(graft.operators.Retrieval.buildIndex(lo, "doc_id", "text"))
    // add == scratch build on the union
    assert(rank(graft.operators.Retrieval.buildIndex(lo, "doc_id", "text")
      .add(hi, "doc_id", "text")) == full)
    // merge of two shard builds == scratch build
    assert(rank(graft.operators.Retrieval.buildIndex(lo, "doc_id", "text")
      .merge(graft.operators.Retrieval.buildIndex(hi, "doc_id", "text"))) == full)
    // remove == scratch build on the remainder (avgdl/idf shrink too)
    assert(rank(graft.operators.Retrieval.buildIndex(docs, "doc_id", "text")
      .remove(hi.select("doc_id"), "doc_id")) == loOnly)
    assert(full != loOnly) // the statistics actually moved
  }

  test("RM3 expansion surfaces docs sharing NO original query term") {
    // query 'alpha' seeds doc 0; doc 0 also contains 'beta'; doc 1 is
    // pure 'beta' — invisible to the original query, reachable only
    // through expansion. fbTerms=0 must reproduce plain BM25 exactly.
    val docs = Seq(
      (0L, "alpha beta beta"),
      (1L, "beta beta gamma"),
      (2L, "delta epsilon zeta")).toDF("doc_id", "text")
    val qs = Seq((0L, "alpha")).toDF("qid", "qtext")
    val idx = Retrieval.buildIndex(docs, "doc_id", "text")
    val plain = idx.searchTopK(qs, "qid", "qtext", k = 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(plain == Set(0L)) // only the seed doc matches 'alpha'
    val expanded = idx.searchExpanded(qs, "qid", "qtext", k = 10,
        fbDocs = 1, fbTerms = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank"))
      .toMap
    // expansion pooled doc 0's terms (beta tf=2, alpha excluded as an
    // original term) → doc 1 now scores via 'beta'
    assert(expanded.keySet == Set(0L, 1L), expanded.toString)
    val noExp = idx.searchExpanded(qs, "qid", "qtext", k = 10,
      fbDocs = 1, fbTerms = 0)
    val plainFull = idx.searchTopK(qs, "qid", "qtext", k = 10)
    assert(noExp.collect().map(_.toSeq).toSeq ==
      plainFull.collect().map(_.toSeq).toSeq)
  }

  test("bm25 == brute-force reference on a seeded random corpus") {
    // one random corpus + query batch, scored start-to-finish by a
    // straight-line Scala mirror (tf/df/dl maps, rational idf, the
    // exact double operand order, 1e-9 floor-quantization) — pins the
    // whole posting-join pipeline against the definition, including
    // ties, repeated query terms, and docs sharing no terms
    val r = new scala.util.Random(0xB2501L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def randDoc() = Seq.fill(1 + r.nextInt(12))(vocab(r.nextInt(vocab.size)))
    val docToks = (0 until 60).map(i => i.toLong -> randDoc()).toMap
    val qToks = (0 until 8).map(i => i.toLong -> randDoc()).toMap
    val docs = docToks.toSeq.sortBy(_._1)
      .map { case (i, t) => (i, t.mkString(" ")) }.toDF("doc_id", "text")
    val qs = qToks.toSeq.sortBy(_._1)
      .map { case (i, t) => (i, t.mkString(" ")) }.toDF("qid", "qtext")
    val got = Retrieval.bm25(docs, "doc_id", "text", qs, "qid", "qtext")
      .collect().map(row => (row.getAs[Long]("qid"), row.getAs[Long]("doc_id"))
        -> (row.getAs[Long]("n_hit"), row.getAs[Long]("score_q"))).toMap
    // brute force
    val tf: Map[(Long, String), Long] = docToks.toSeq
      .flatMap { case (d, ts) => ts.map(t => (d, t)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df: Map[String, Long] = tf.keys.toSeq.map(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dl: Map[Long, Long] = docToks.view.mapValues(_.size.toLong).toMap
    val nDocs = dl.count(_._2 > 0).toLong
    val avgdl = dl.values.sum.toDouble / nDocs.toDouble
    val want = (for {
      (q, ts) <- qToks.toSeq; t <- ts.distinct
      d <- docToks.keys if tf.contains((d, t))
    } yield {
      val tfd = tf((d, t)).toDouble
      val idf = (nDocs.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5)
      val s = idf * ((tfd * 2.2) /
        (tfd + 1.2 * (0.25 + 0.75 * (dl(d).toDouble / avgdl))))
      ((q, d), math.floor(s * 1000000000.0 + 0.5).toLong)
    }).groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    assert(got == want)
  }

  test("rangeSearch equals the distance-filtered exhaustive join, radius inclusive") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
    // pick the radius as some query's true 10-NN distance so the
    // boundary row itself is exercised (inclusive contract)
    val full = Exhaustive.knnJoin(qs, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 10)
    val radius = full.agg(max("distance")).head().getDouble(0)
    val got = Exhaustive.rangeSearch(qs, "vec_id", "embedding",
        emb, "vec_id", "embedding", radius)
      .select("qid", "id", "distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val emb2 = emb.select(col("vec_id").as("id"), col("embedding").as("cvec"))
    val want = qs.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .crossJoin(emb2)
      .select(col("qid"), col("id"),
        Exhaustive.distance("sqdist")(col("cvec"), col("qvec")).as("distance"))
      .filter(col("distance") <= radius)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    // boundary row present: at least one pair sits exactly at radius
    assert(got.exists(_._3 == radius))
    // self-pairs at distance 0 all present
    assert((0L until 5L).forall(q => got.contains((q, q, 0.0))))
  }

  test("positional index: phraseSearchIndexed == phraseSearch, incl. save/load") {
    val docs = Seq(
      (0L, "the quick brown fox jumps"),
      (1L, "quick brown shoes and quick brown fox again quick brown fox"),
      (2L, "brown quick fox"),
      (3L, "quick brown"),
      (4L, "quick quick quick")).toDF("doc_id", "text")
    val qs = Seq((0L, "quick brown fox"), (1L, "quick quick"))
      .toDF("qid", "phrase")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))
        -> r.getAs[Long]("n_occ")).toMap
    val want = asMap(Retrieval.phraseSearch(docs, "doc_id", "text",
      qs, "qid", "phrase"))
    val idx = Retrieval.buildIndex(docs, "doc_id", "text", positional = true)
    assert(asMap(idx.phraseSearchIndexed(qs, "qid", "phrase")) == want)
    // persisted positions serve identically after a round-trip; the
    // same loaded index still answers BM25 (one index, both faces)
    val dir = java.nio.file.Files.createTempDirectory("pos_idx").toString
    idx.save(dir)
    val loaded = Retrieval.loadIndex(spark, dir)
    assert(loaded.positions.isDefined)
    assert(asMap(loaded.phraseSearchIndexed(qs, "qid", "phrase")) == want)
    assert(loaded.searchTopK(Seq((0L, "quick brown")).toDF("qid", "qtext"),
      "qid", "qtext", k = 3).count() > 0)
    idx.unpersist()
    // non-positional build refuses phrase serving loudly
    val plain = Retrieval.buildIndex(docs, "doc_id", "text")
    intercept[IllegalStateException] {
      plain.phraseSearchIndexed(qs, "qid", "phrase")
    }
    plain.unpersist()
  }

  test("phraseSearchIndexed beyond 10k distinct terms: broadcast semi-join prune, same results") {
    // 20k distinct query terms — far over the literal-In cutover; the
    // prune must become a broadcast join on `term`, never a 20k-literal
    // In expression in the plan, and results must be unchanged
    val docs = Seq(
      (0L, "t00001 t00002 t00003"),
      (1L, "t00002 t00003 t00004"),
      (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(docs, "doc_id", "text", positional = true)
    val wide = (0 until 20000).map(i => (i.toLong, f"t$i%05d t${i + 1}%05d"))
      .toDF("qid", "phrase")
    val got = idx.phraseSearchIndexed(wide, "qid", "phrase")
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "wide batch must prune via broadcast semi-join:\n" + p.take(1200))
    assert(!p.contains("t19999, t"), "20k-literal In leaked into the plan")
    val hits = got.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))
        -> r.getAs[Long]("n_occ")).toMap
    // the two phrases present verbatim in the corpus still match
    assert(hits((1L, 0L)) == 1L) // "t00001 t00002" in doc 0
    assert(hits((2L, 0L)) == 1L) // "t00002 t00003" in doc 0
    assert(hits((2L, 1L)) == 1L) // ... and doc 1
    // a narrow batch on the same index still plans the literal In path
    val narrow = idx.phraseSearchIndexed(
      Seq((0L, "alpha beta")).toDF("qid", "phrase"), "qid", "phrase")
    narrow.collect()
    idx.unpersist()
  }

  test("positional lifecycle: add/remove keep positions consistent with rebuild") {
    val a = Seq((0L, "x y z"), (1L, "y z y z")).toDF("doc_id", "text")
    val b = Seq((2L, "z x y z x y"), (3L, "x y")).toDF("doc_id", "text")
    val qs = Seq((0L, "y z"), (1L, "x y")).toDF("qid", "phrase")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))
        -> r.getAs[Long]("n_occ")).toMap
    val incr = Retrieval.buildIndex(a, "doc_id", "text", positional = true)
      .add(b, "doc_id", "text")
    val scratch = Retrieval.buildIndex(a.unionByName(b), "doc_id", "text",
      positional = true)
    assert(asMap(incr.phraseSearchIndexed(qs, "qid", "phrase")) ==
      asMap(scratch.phraseSearchIndexed(qs, "qid", "phrase")))
    val removed = scratch.remove(Seq(1L, 2L).toDF("doc_id"), "doc_id")
    val rebuilt = Retrieval.buildIndex(
      a.unionByName(b).filter(!col("doc_id").isin(1L, 2L)),
      "doc_id", "text", positional = true)
    assert(asMap(removed.phraseSearchIndexed(qs, "qid", "phrase")) ==
      asMap(rebuilt.phraseSearchIndexed(qs, "qid", "phrase")))
    Seq(incr, scratch, rebuilt).foreach(_.unpersist())
  }

  test("unpersist releases the build-time posting cache") {
    val docs = Seq((0L, "a b c"), (1L, "b c d")).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val idx = Retrieval.buildIndex(docs, "doc_id", "text")
    idx.postings.count() // materialize the cache
    assert(spark.sparkContext.getPersistentRDDs.keySet.size > before.size,
      "buildIndex should cache the posting frame")
    idx.unpersist()
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "unpersist must release the posting cache")
  }
}
