package graft

import org.apache.spark.sql.functions._

import graft.operators.{Exhaustive, Mips}

class MipsSpec extends SparkSpec {
  import spark.implicits._

  // synthetic NON-normalized corpus: norms spread over [0.5, 4.5], so
  // inner-product rank genuinely differs from cosine/L2 rank and the
  // augmentation is doing real work (the parquet embeddings are unit
  // vectors, where MIPS degenerates to cosine)
  private def mkCorpus(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val rnd = new scala.util.Random(1234L + i)
      val scale = 0.5f + 4f * i.toFloat / n
      (i.toLong, Array.fill(dim) {
        (rnd.nextGaussian().toFloat / math.sqrt(dim.toFloat).toFloat) * scale
      })
    }

  test("norm augmentation: aug corpus norms are all M; queries gain a zero") {
    val corpus = mkCorpus(60, 16).toDF("vec_id", "embedding")
    val m = Mips.maxNorm(corpus, "embedding")
    val aug = Mips.augmentCorpus(corpus, "embedding", m)
    aug.select(col("embedding")).collect().foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]](0)
      assert(v.length == 17)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - m) < 1e-3, s"augmented norm $nrm != M $m")
    }
    val qv = Mips.augmentQueries(corpus.limit(1), "embedding")
      .select(col("embedding")).head().getAs[scala.collection.Seq[Float]](0)
    assert(qv.length == 17 && qv.last == 0f)
  }

  test("L2 top-k on augmented vectors IS inner-product top-k (exact, any k)") {
    val rows = mkCorpus(80, 16)
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
    val m = Mips.maxNorm(corpus, "embedding")
    val aug = Mips.augmentCorpus(corpus, "embedding", m)
    val qAug = Mips.augmentQueries(queries, "embedding")
    // augmented L2 exhaustive vs brute negdot — id sequences must match
    // exactly per query, in order
    val viaAug = Exhaustive.knnJoin(qAug, "vec_id", "embedding",
        aug, "vec_id", "embedding", k = 7, metric = "sqdist")
      .orderBy($"qid", $"distance", $"id")
      .select($"qid", $"id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val brute = Exhaustive.knnJoin(queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 7, metric = "negdot")
      .orderBy($"qid", $"distance", $"id")
      .select($"qid", $"id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    assert(viaAug.keySet == Set(0L, 1L, 2L))
    viaAug.keys.foreach(q => assert(viaAug(q) == brute(q), s"query $q"))
    // and the MIPS rank is NOT the plain-L2-on-originals rank somewhere
    // — i.e. the augmentation is doing real work, not a no-op relabel
    // (the "cosine" metric would be vacuous here: 1−dot is rank-equal
    // to negdot by construction)
    val l2 = Exhaustive.knnJoin(queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 7, metric = "sqdist")
      .orderBy($"qid", $"distance", $"id")
      .select($"qid", $"id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    assert(viaAug.exists { case (q, ids) => l2(q) != ids },
      "corpus failed to distinguish MIPS from plain L2 — test is vacuous")
  }

  test("MIPS composes with SQ8: augmented byte index recovers brute negdot top-k") {
    // the norm-augmentation reduction works over ANY L2 index; SQ8 is
    // an L2 index, so MIPS-over-packed-int8 falls out by composition —
    // quantization error is the only recall surface (probe-all here, so
    // routing is exact; expect near-perfect agreement at small scale)
    val rows = mkCorpus(120, 16)
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 5)
    val m = Mips.maxNorm(corpus, "embedding")
    val aug = Mips.augmentCorpus(corpus, "embedding", m)
    val cents = aug.filter($"vec_id" < 4).orderBy($"vec_id")
      .select(col("embedding").cast("array<float>")).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    val ivf = graft.index.IVFFlat.Model(
      graft.index.IVFFlat.Params(cents.length), cents,
      Array.fill(cents.length)(Long.MaxValue),
      graft.index.IVFFlat.assign(aug, "vec_id", "embedding", cents))
    val sq8 = graft.index.SQ8.compress(ivf)
    val got = sq8.searchMany(Mips.augmentQueries(queries, "embedding"),
        "vec_id", "embedding", k = 5, nprobe = cents.length)
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = Exhaustive.knnJoin(queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 5, metric = "negdot")
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = brute.keys.toSeq.map(q =>
      got.getOrElse(q, Set.empty).intersect(brute(q)).size / 5.0).sum / brute.size
    assert(recall >= 0.9, s"MIPS-over-SQ8 recall $recall")
  }
}
