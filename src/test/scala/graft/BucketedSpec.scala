package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Gates for [[sources.Bucketed]] — the shuffle-elimination layout:
  * the whole point of the sink is plan shape, so the gates are plan
  * gates: a bucketed fact⋈fact join plus a same-key aggregation must
  * contain ZERO shuffle exchanges, while the identical query off raw
  * parquet shuffles both sides; and the writer's repartition-first
  * contract must yield exactly one file per bucket (the property that
  * keeps bucket sort metadata usable and file counts flat at scale).
  * Values are gated twice: here against the shuffling twin, and by the
  * bucket_join_colocated oracle lane.
  */
class BucketedSpec extends SparkSpec {

  // same AQE-descending collector as PlanSpec (private there)
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a +: flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: flatten(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      r +: flatten(r.child)
    case _ => p +: p.children.flatMap(flatten)
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    flatten(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])

  test("bucketed join + same-key agg is exchange-free; twin shuffles; values equal") {
    val base = java.nio.file.Files.createTempDirectory("bucketed_spec").toString
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"),
        floor(col("l_quantity").cast("double") * 100.0 + 0.5)
          .cast("long").as("qty_c"))
    sources.Bucketed.write(o, "bspec_o", s"$base/o", numBuckets = 4,
      bucketCol = "o_orderkey")
    sources.Bucketed.write(l, "bspec_l", s"$base/l", numBuckets = 4,
      bucketCol = "l_orderkey")

    def agg(lf: org.apache.spark.sql.DataFrame,
            of: org.apache.spark.sql.DataFrame) =
      lf.join(of, lf("l_orderkey") === of("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderpriority"))
        .agg(sum(col("qty_c")).as("sum_qty_c"), count(lit(1)).as("n"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = agg(sources.Bucketed.table(spark, "bspec_l"),
        sources.Bucketed.table(spark, "bspec_o"))
      val got = bucketed.collect()
      assert(shuffles(bucketed) == 0,
        "bucketed scan→join→agg must not exchange:\n" +
          bucketed.queryExecution.executedPlan.toString.take(1500))

      val twin = agg(l, o)
      val want = twin.collect()
      assert(shuffles(twin) >= 2,
        "the raw-parquet twin should shuffle both join sides:\n" +
          twin.queryExecution.executedPlan.toString.take(1500))

      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(got.map(key).sortBy(t => (t._1, t._2)).toSeq ==
        want.map(key).sortBy(t => (t._1, t._2)).toSeq)
      assert(got.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("writer emits exactly one data file per bucket") {
    val base = java.nio.file.Files.createTempDirectory("bucketed_files").toString
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    sources.Bucketed.write(o, "bspec_files", s"$base/t", numBuckets = 4,
      bucketCol = "o_orderkey")
    val files = new java.io.File(s"$base/t").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files.length == 4,
      s"expected one file per bucket, got ${files.map(_.getName).mkString(", ")}")
    // round-trip: catalog read sees every row exactly once
    assert(sources.Bucketed.table(spark, "bspec_files").count() == o.count())

    // bucket pruning: an equality filter on the bucket column scans
    // exactly one bucket file — at 100 TB, point lookups touch 1/n of
    // the table without any index structure
    // the auto-bucketed-scan rule turns bucketed reading off for
    // filter-only plans (no partitioning consumer) — pin it on so the
    // pruning path is observable
    val prevAuto = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      val key = o.select(min(col("o_orderkey"))).head().getLong(0)
      val pruned = sources.Bucketed.table(spark, "bspec_files")
        .filter(col("o_orderkey") === key)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
        plan.take(1200))
      assert(pruned.count() == 1)
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
  }
}
