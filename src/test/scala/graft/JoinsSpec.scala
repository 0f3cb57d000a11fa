package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends SparkSpec {

  private lazy val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select(col("l_orderkey").as("okey"), col("l_linenumber"),
      col("l_quantity"))
  private lazy val o = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey").as("okey"), col("o_orderpriority"))

  test("saltedJoin is row-identical to the plain equi-join") {
    val plain = l.join(o, Seq("okey"))
      .groupBy("okey", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val salted = Joins.saltedJoin(l, o, Seq("okey"),
        concat_ws("_", col("okey"), col("l_linenumber")), s = 8)
      .groupBy("okey", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(salted == plain)
  }

  test("a hot key's rows actually spread over multiple salts") {
    import spark.implicits._
    // one synthetic hot key with 1000 lines against a 1-row dim side
    val hotL = spark.range(1000)
      .select(lit(42L).as("okey"), col("id").as("line"))
    val hotR = Seq((42L, "P")).toDF("okey", "prio")
    val spread = Joins.saltedJoin(hotL, hotR, Seq("okey"),
        concat_ws("_", col("okey"), col("line")), s = 8)
    assert(spread.count() == 1000)
    // measure the salt distribution the join actually used
    val salts = hotL.withColumn("salt",
        pmod(graft.operators.Sketches.hash60(
          concat_ws("_", col("okey"), col("line"))), lit(8L)))
      .groupBy("salt").count().collect()
    assert(salts.length == 8, s"expected all 8 salts used, got ${salts.length}")
    assert(salts.map(_.getLong(1)).max < 1000,
      "hot key must not concentrate in one salt")
  }
}
