package graft

import org.apache.spark.sql.functions._

import graft.functions.{Quant, Sq8Math}
import graft.index.{IVFFlat, SQ8}

class SQ8Spec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  private lazy val ivf = IVFFlat.build(emb, "vec_id", "embedding",
    IVFFlat.Params(k = 8, numAttempts = 1, maxIterations = 10))
  private lazy val sq8 = SQ8.compress(ivf)

  test("packU8 stores exactly one byte per dimension") {
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val lens = sq8.codes.select(length(col("codes"))).distinct()
      .collect().map(_.getInt(0))
    assert(lens.toSeq == Seq(dims))
  }

  test("sq8Dist over packed codes == sqDist over dequantized vectors") {
    // the fused byte kernel must be bit-identical to dequantize-then-
    // sqDist — the precision contract the DuckDB oracle relies on
    val q = emb.orderBy("vec_id").select(col("embedding").cast("array<float>"))
      .head().getAs[scala.collection.Seq[Float]](0).toArray
    val fused = sq8.codes
      .select(col("id"),
        Sq8Math.sq8Dist(col("codes"), col("lo"), col("scale"),
          typedlit(q)).as("d"))
    val viaDeq = emb.select(col("vec_id").cast("long").as("id"),
        graft.functions.ArrayMath.sqDistFused(
          Quant.int8Dequant(col("embedding")), typedlit(q.map(_.toDouble)))
          .as("d"))
    val joined = fused.alias("a").join(viaDeq.alias("b"), "id")
      .select(col("a.d").as("da"), col("b.d").as("db"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("probe-all search is exact over the dequantized corpus") {
    val truth = emb.filter($"vec_id" < 3).orderBy("vec_id")
      .select(col("embedding").cast("array<float>")).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    truth.zipWithIndex.foreach { case (q, qi) =>
      val got = sq8.search(q, k = 5, minProbe = sq8.params.k)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val want = emb.select(col("vec_id").cast("long").as("id"),
          graft.functions.ArrayMath.sqDistFused(
            Quant.int8Dequant(col("embedding")), typedlit(q.map(_.toDouble)))
            .as("d"))
        .orderBy(col("d"), col("id")).limit(5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.toSeq == want.toSeq, s"query $qi")
    }
  }

  test("quantized recall@10 vs float exhaustive >= 0.9 at probe-all") {
    val queries = emb.filter($"vec_id" < 20)
    val exact = graft.operators.Exhaustive.knnJoin(
        queries, "vec_id", "embedding", emb, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = sq8.searchMany(queries, "vec_id", "embedding",
        k = 10, nprobe = sq8.params.k)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size / 10.0
    }
    assert(recalls.sum / recalls.size >= 0.9)
  }

  test("searchMany at nprobe=k agrees with single-query probe-all") {
    val q = emb.filter($"vec_id" === 7)
    val qv = q.select(col("embedding").cast("array<float>")).head()
      .getAs[scala.collection.Seq[Float]](0).toArray
    val batch = sq8.searchMany(q, "vec_id", "embedding", k = 5,
        nprobe = sq8.params.k)
      .orderBy("distance", "id")
      .select("id", "distance").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val single = sq8.search(qv, k = 5, minProbe = sq8.params.k)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(batch.toSeq == single.toSeq)
  }

  test("add then search finds the added row at distance ~0; remove hides it") {
    val newId = 999999L
    val vec = emb.filter($"vec_id" === 0)
      .select(col("embedding").cast("array<float>")).head()
      .getAs[scala.collection.Seq[Float]](0).toArray
    val added = sq8.add(Seq((newId, vec)).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val hits = added.search(vec, k = 2, minProbe = added.params.k).collect()
    assert(hits.exists(_.getLong(0) == newId))
    // quantization reconstructs within the error radius, not exactly
    val dNew = hits.find(_.getLong(0) == newId).get.getDouble(1)
    assert(dNew < 1e-3)
    val removed = added.remove(Seq(newId).toDF("vec_id"), "vec_id")
    val after = removed.search(vec, k = 2, minProbe = removed.params.k).collect()
    assert(!after.exists(_.getLong(0) == newId))
  }

  test("save/load round-trips codes, centroids and search results") {
    val dir = java.nio.file.Files.createTempDirectory("sq8idx").toString
    sq8.save(dir)
    val back = SQ8.load(spark, dir)
    assert(back.params == sq8.params)
    assert(back.centroids.length == sq8.centroids.length)
    assert(back.codes.count() == sq8.codes.count())
    val q = emb.filter($"vec_id" === 3)
      .select(col("embedding").cast("array<float>")).head()
      .getAs[scala.collection.Seq[Float]](0).toArray
    val a = sq8.search(q, 5, minProbe = sq8.params.k)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = back.search(q, 5, minProbe = back.params.k)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("refined search with corpus-wide shortlist equals float exhaustive") {
    val queries = emb.filter($"vec_id" < 5)
    val refined = sq8.searchManyRefined(queries, "vec_id", "embedding",
        k = 10, factor = 1000, emb, "vec_id", "embedding",
        nprobe = sq8.params.k)
      .orderBy("qid", "distance", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = graft.operators.Exhaustive.knnJoin(
        queries, "vec_id", "embedding", emb, "vec_id", "embedding", 10)
      .orderBy("qid", "distance", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(refined.toSeq == exact.toSeq)
  }

  test("rangeSearchMany probe-all == radius filter over dequantized distances") {
    val queries = emb.filter($"vec_id" < 5)
    // radius from a true kNN distance so the boundary row is exercised
    val radius = sq8.searchMany(queries, "vec_id", "embedding",
        k = 10, nprobe = sq8.params.k)
      .agg(max("distance")).head().getDouble(0)
    val got = sq8.rangeSearchMany(queries, "vec_id", "embedding",
        radius, nprobe = sq8.params.k)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"),
        r.getAs[Double]("distance"))).toSet
    // reference: dequantized distance on every (query, code) pair
    val want = sq8.codes.crossJoin(
        queries.select($"vec_id".as("qid"),
          $"embedding".cast("array<double>").as("qvec")))
      .select($"qid", $"id",
        Sq8Math.sq8Dist($"codes", $"lo", $"scale", $"qvec").as("distance"))
      .filter($"distance" <= radius)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"),
        r.getAs[Double]("distance"))).toSet
    assert(got == want)
    assert(got.exists(_._3 == radius), "inclusive boundary row missing")
    // probed subset at nprobe=1 never invents rows
    val probed = sq8.rangeSearchMany(queries, "vec_id", "embedding",
        radius, nprobe = 1)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"),
        r.getAs[Double]("distance"))).toSet
    assert(probed.subsetOf(got))
  }

  test("constant vector codes pack to zero bytes and dequantize to lo") {
    val df = Seq((1L, Array.fill(4)(0.5f))).toDF("id", "v")
    val packed = df.select(
      Sq8Math.packU8(Quant.int8Codes(col("v"))).as("codes"),
      Sq8Math.sq8Dist(Sq8Math.packU8(Quant.int8Codes(col("v"))),
        Quant.int8Lo(col("v")), Quant.int8Scale(col("v")),
        typedlit(Array.fill(4)(0.5f))).as("d")).head()
    assert(packed.getAs[Array[Byte]](0).forall(_ == 0.toByte))
    assert(packed.getDouble(1) == 0.0)
  }
}
