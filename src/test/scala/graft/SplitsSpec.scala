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
}
