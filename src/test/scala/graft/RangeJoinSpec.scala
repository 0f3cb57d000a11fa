package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Seeded deterministic fixtures: hash-derived pseudo-random longs so
  // every run (and the naive reference join) sees identical data.
  private def h(i: Int, salt: Int): Long = {
    var x = i.toLong * 2654435761L + salt.toLong * 40503L
    x ^= (x >>> 16); x *= 0x45d9f3b3335b369L; x ^= (x >>> 32)
    math.abs(x)
  }

  private lazy val points = (0 until 400)
    .map(i => (i.toLong, h(i, 1) % 10000 - 2000)) // includes negatives
    .toDF("pid", "p").cache()

  // mixed spans: mostly short, a few very long (exercise the broadcast
  // diversion), some empty (hi <= lo), negative coordinates
  private lazy val intervals = (0 until 150).map { i =>
    val lo = h(i, 2) % 9000 - 2500
    val span = if (i % 29 == 0) 5000L + h(i, 3) % 3000
               else if (i % 7 == 0) 0L // empty
               else h(i, 3) % 120
    (i.toLong, lo, lo + span)
  }.toDF("iid", "lo", "hi").cache()

  private def naivePoints(): Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("pointInInterval matches the naive non-equi join exactly") {
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        width = 64, longCap = 8)
      .select($"pid", $"iid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate emissions")
    assert(got.toSet == naivePoints())
  }

  test("pointInInterval is width-invariant (width changes the plan, not the answer)") {
    val expected = naivePoints()
    for (w <- Seq(1L, 13L, 1000L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
          width = w, longCap = 4)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicates at width $w")
      assert(got.toSet == expected, s"mismatch at width $w")
    }
  }

  test("pointInInterval half-open boundary semantics") {
    val pts = Seq((1L, 10L), (2L, 19L), (3L, 20L), (4L, 9L))
      .toDF("pid", "p")
    val ivs = Seq((7L, 10L, 20L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", width = 5)
      .select($"pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // lo inclusive, hi exclusive
  }

  private lazy val bIntervals = (0 until 130).map { i =>
    val lo = h(i, 5) % 9000 - 2500
    val span = if (i % 31 == 0) 4000L + h(i, 6) % 4000 else h(i, 6) % 150
    (i.toLong, lo, lo + span)
  }.toDF("bid", "blo", "bhi").cache()

  test("intervalOverlap matches the naive overlap join, each pair exactly once") {
    val expected = intervals.crossJoin(bIntervals)
      .filter($"hi" > $"lo" && $"bhi" > $"blo" &&
        $"lo" < $"bhi" && $"blo" < $"hi")
      .select($"iid", $"bid").as[(Long, Long)].collect().toSet
    for ((w, cap) <- Seq((32L, 6), (256L, 6), (4096L, Int.MaxValue))) {
      val got = RangeJoin.intervalOverlap(intervals, "lo", "hi",
          bIntervals, "blo", "bhi", width = w, longCap = cap)
        .select($"iid", $"bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"pair emitted more than once at width $w")
      assert(got.toSet == expected, s"mismatch at width $w")
    }
  }

  test("bucketed-only path plans as equi-join: no nested-loop, no cartesian") {
    // no-diversion config (longCap = MaxValue): the plan must be ONE
    // hash equi-join on the bucket key — no nested-loop branch even in
    // planning (an empty diverted side would still plan as one)
    val shortIvs = intervals.filter($"hi" - $"lo" < 120 && $"hi" > $"lo")
    val plan = RangeJoin.pointInInterval(points, "p", shortIvs, "lo", "hi",
        width = 64, longCap = Int.MaxValue)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("coordinates beyond 2^53 bucketize exactly (epoch-nanosecond range)") {
    // the r8 ADVICE class: fdiv through a double misbuckets above 2^53
    // (epoch nanos ~1.7e18) — fdiv is now pure integer arithmetic, so
    // adjacent nano-scale points land in their true buckets
    val base = 1700000000000000000L // ≈ 2026 in epoch nanos, > 2^60
    val pts = (0L until 8L).map(i => (i, base + i)).toDF("pid", "p")
    val ivs = Seq((100L, base + 2L, base + 5L), // covers p ∈ {2,3,4}
                  (200L, base - 10L, base + 1L)) // covers p ∈ {0}
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi",
        width = 2, longCap = Int.MaxValue)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val want = pts.crossJoin(ivs).filter($"p" >= $"lo" && $"p" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == want, s"got $got want $want")
    assert(want == Set((2L, 100L), (3L, 100L), (4L, 100L), (0L, 200L)))
  }
}
