package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class ExtensionsSpec extends SparkSpec {

  test("graft_* SQL functions register and match the Column API") {
    new GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions {}) // smoke construct
    // register into the live session the same way the extension does
    val ext = new GraftExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext(holder)
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    // inject via FunctionRegistry directly (same builders)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import graft.functions.{DotExpr, SqDistExpr}
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sqdist", exprs => SqDistExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotExpr(exprs(0), exprs(1)), "scala_udf")
    val viaSql = spark.sql(
      """SELECT a.vec_id qid, b.vec_id id,
        |  graft_sqdist(a.embedding, b.embedding) d,
        |  graft_dot(a.embedding, b.embedding) p
        |FROM emb_sql a JOIN emb_sql b ON b.vec_id < 3 AND a.vec_id = 0
        |ORDER BY id""".stripMargin).collect()
    val viaCol = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") === 0).select(col("embedding").as("qa"))
      .crossJoin(spark.read.parquet(s"$sf0001/embeddings.parquet")
        .filter(col("vec_id") < 3).select(col("vec_id"), col("embedding")))
      .select(col("vec_id"),
        graft.functions.VectorOps.sqDist(col("qa"), col("embedding")).as("d"),
        graft.functions.VectorOps.dot(col("qa"), col("embedding")).as("p"))
      .orderBy("vec_id").collect()
    assert(viaSql.length == 3)
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getDouble(2) == c.getDouble(1) && s.getDouble(3) == c.getDouble(2))
    }
  }

  test("LSH-prefiltered embedding pairs find the planted near-dup (scale path)") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val near = emb.filter(col("vec_id") === 3)
      .withColumn("vec_id", lit(77777L))
      .withColumn("embedding", transform(col("embedding"), x => x + lit(1e-5f)))
    val pairs = Dedup.embeddingPairsViaLSH(emb.unionByName(near),
      "vec_id", "embedding", maxCosDist = 0.01)
    val hits = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.contains((3L, 77777L)))
    // and agrees with the exact operator on what it does return
    val exact = Dedup.embeddingPairs(emb.unionByName(near),
      "vec_id", "embedding", maxCosDist = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.toSet.subsetOf(exact))
  }
}
