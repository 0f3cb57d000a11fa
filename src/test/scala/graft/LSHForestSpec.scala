package graft

import org.apache.spark.sql.functions._

import graft.index.LSHForest
import graft.operators.Exhaustive

class LSHForestSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("degenerate forest (maxNodeSize > n) equals exhaustive search") {
    val model = LSHForest.build(emb, "vec_id", "embedding",
      LSHForest.Params(numTrees = 2, maxNodeSize = 1000))
    assert(model.trees.forall(_.planes.isEmpty))
    val queries = emb.filter(col("vec_id") < 5)
    val got = model.searchMany(queries, "vec_id", "embedding", k = 10)
      .select("qid", "id", "distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._3, t._2))
    val truth = Exhaustive.knnJoin(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 10)
      .select("qid", "id", "distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._3, t._2))
    assert(got.sameElements(truth))
  }

  private lazy val model = LSHForest.build(emb, "vec_id", "embedding",
    LSHForest.Params(numTrees = 8, maxNodeSize = 64))

  test("build: every row keeps its id once; leaves respect maxNodeSize") {
    assert(model.indexed.count() == emb.count()) // no exact dups in data
    model.trees.foreach { t =>
      assert(t.leafSizes.values.sum == emb.count())
      // all leaves ≤ maxNodeSize unless a degenerate split got capped
      val oversized = t.leafSizes.filter(_._2 > model.params.maxNodeSize)
      assert(oversized.isEmpty, s"oversized leaves: $oversized")
    }
  }

  test("self-query: every query finds itself at distance 0") {
    val queries = emb.filter(col("vec_id") < 20)
    val got = model.searchMany(queries, "vec_id", "embedding", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 20)
    got.foreach { case (qid, id, d) => assert(qid == id && d == 0.0) }
  }

  test("recall@10 vs exhaustive with 8 trees on near-uniform data >= 0.5") {
    val queries = emb.filter(col("vec_id") < 20)
    val truth = Exhaustive.knnJoin(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 10)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = model.searchMany(queries, "vec_id", "embedding", k = 10)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val mean = truth.keys.toSeq
      .map(q => got.getOrElse(q, Set.empty).intersect(truth(q)).size / 10.0)
      .sum / truth.size
    assert(mean >= 0.5, s"mean recall@10 = $mean")
  }

  test("save/load round-trip preserves search results") {
    val dir = java.nio.file.Files.createTempDirectory("lsh").toString
    model.save(dir)
    val re = LSHForest.load(spark, dir)
    assert(re.params == model.params)
    assert(re.trees.map(_.planes.size) == model.trees.map(_.planes.size))
    val queries = emb.filter(col("vec_id") === 11)
    val before = model.searchMany(queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._3)
    val after = re.searchMany(queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._3)
    assert(before.sameElements(after))
  }

  test("add: new row lands in every tree's leaf and is findable") {
    import spark.implicits._
    val v = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<float>")).head()
      .getAs[scala.collection.Seq[Float]](0).toArray.map(x => x + 1e-3f)
    val added = model.add(Seq((888888L, v)).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val hit = added.search(v, k = 1).head()
    assert(hit.getAs[Long]("id") == 888888L)
    assert(hit.getAs[Double]("distance") == 0.0)
  }
}
