package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton code in plain Scala. */
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  test("interleaveBits matches the reference Morton code over the full 8-bit grid") {
    val grid = for (a <- 0L until 256L by 17L; b <- 0L until 256L by 13L)
      yield (a, b)
    val df = grid.toDF("a", "b")
      .select($"a", $"b", Layout.interleaveBits($"a", $"b", 8).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1), 8),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // corners of the space
    val corners = Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L)).toDF("a", "b")
      .select(Layout.interleaveBits($"a", $"b", 8)).as[Long].collect()
    assert(corners.toSeq == Seq(0L, 65535L, 43690L, 21845L))
  }

  test("zbin prefix tiles the plane: every bin bounded 16x16 in BOTH dimensions") {
    val events = spark.read.parquet(s"$sf001/events.parquet")
    val b = events.select($"event_id",
        Layout.rankBucket($"user_id", $"event_id", 8).as("bu"),
        Layout.rankBucket($"value", $"event_id", 8).as("bv"))
      .withColumn("zbin",
        shiftright(Layout.interleaveBits($"bu", $"bv", 8), 8))
    val spans = b.groupBy("zbin").agg(
        (max($"bu") - min($"bu")).as("du"), (max($"bv") - min($"bv")).as("dv"))
      .agg(max($"du"), max($"dv")).head()
    assert(spans.getLong(0) <= 15L && spans.getLong(1) <= 15L)
    // contrast: binning by bu alone leaves bv unbounded (~full range) —
    // the reason single-column sort cannot serve two filter dimensions
    val naive = b.groupBy(shiftright($"bu", 4)).agg(
        (max($"bv") - min($"bv")).as("dv")).agg(max($"dv")).head().getLong(0)
    assert(naive > 200L, s"naive layout should leave bv unbounded, got $naive")
  }

  test("quantileBuckets: equal-frequency on skewed data, composes into bounded z-tiles") {
    // heavily skewed column (quadratic density) — uniform splits would
    // put ~half the rows in the top bucket pair
    val df = spark.range(40000L)
      .select($"id", ($"id" * $"id" % 65536L).as("v"),
        ($"id" * 2654435761L % 65536L).as("u"))
    val (bCol, splits) = Layout.quantileBuckets(df, "v", 6)
    assert(splits.length == 63 && splits.toSeq == splits.sorted.toSeq)
    val counts = df.select(bCol.as("b")).groupBy("b").count()
      .collect().map(_.getLong(1))
    val expected = 40000.0 / 64
    // approx sketch at accuracy 10000: every bucket within 30% of fair share
    assert(counts.length == 64)
    assert(counts.forall(c => c > expected * 0.7 && c < expected * 1.3),
      counts.sorted.mkString(","))
    // composed z-key from two quantile-bucketed dims still tiles
    val (uCol, _) = Layout.quantileBuckets(df, "u", 6)
    val spans = df.select(bCol.as("bv"), uCol.as("bu"))
      .withColumn("zbin", shiftright(Layout.interleaveBits($"bu", $"bv", 6), 6))
      .groupBy("zbin").agg((max($"bu") - min($"bu")).as("du"),
        (max($"bv") - min($"bv")).as("dv"))
      .agg(max($"du"), max($"dv")).head()
    assert(spans.getLong(0) <= 7L && spans.getLong(1) <= 7L)
  }

  test("hilbert key: a true space-filling walk — bijective and neighbour-continuous") {
    val bits = 5
    val n = 1 << bits // 32x32 grid
    val grid = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    val keyed = Layout.withHilbertKey(grid, "x", "y", bits)
      .select($"hkey", $"x", $"y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // bijection onto 0 .. n²−1
    assert(keyed.map(_._1).toSeq == (0L until (n.toLong * n)).toSeq)
    // THE Hilbert property: consecutive keys are grid neighbours
    keyed.sliding(2).foreach {
      case Array((_, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
          s"($x1,$y1) -> ($x2,$y2) not adjacent")
      case _ =>
    }
  }

  test("hilbert 256-key segments tile at least as tightly as Morton bins") {
    val events = spark.read.parquet(s"$sf001/events.parquet")
    val b = events.select($"event_id",
      Layout.rankBucket($"user_id", $"event_id", 8).as("bu"),
      Layout.rankBucket($"value", $"event_id", 8).as("bv"))
    val spans = Layout.withHilbertKey(b, "bu", "bv", 8)
      .withColumn("hbin", shiftright($"hkey", 8))
      .groupBy("hbin").agg((max($"bu") - min($"bu")).as("du"),
        (max($"bv") - min($"bv")).as("dv"))
      .agg(max($"du"), max($"dv")).head()
    assert(spans.getLong(0) <= 15L && spans.getLong(1) <= 15L, spans.toString)
  }

  test("cluster() range-partitions by zkey: partitions hold disjoint sorted key ranges") {
    val events = spark.read.parquet(s"$sf001/events.parquet")
    val keyed = events.select($"event_id",
        Layout.rankBucket($"user_id", $"event_id", 8).as("bu"),
        Layout.rankBucket($"value", $"event_id", 8).as("bv"))
      .withColumn("zkey", Layout.interleaveBits($"bu", $"bv", 8))
    val parts = Layout.cluster(keyed, "zkey", 8)
      .select($"zkey").rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val ks = it.map(_.getLong(0)).toArray
        if (ks.isEmpty) Iterator.empty
        else Iterator((pid, ks.head, ks.last, ks.sameElements(ks.sorted)))
      }.collect().sortBy(_._1)
    assert(parts.forall(_._4), "each partition sorted within itself")
    parts.sliding(2).foreach {
      case Array((_, _, hiA, _), (_, loB, _, _)) => assert(hiA <= loB)
      case _ =>
    }
  }

  test("writeSized: sample-calibrated file count, sizes near target, lossless") {
    val src = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val out = java.nio.file.Files.createTempDirectory("ws_spec").toString + "/t"
    val (nFiles, bpr) = graft.operators.Layout.writeSized(src, out,
      targetFileBytes = 64L << 10, sortCols = Seq("l_orderkey"))
    assert(bpr > 0.0)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files.length == nFiles, s"$nFiles planned, ${files.length} on disk")
    assert(nFiles > 1, "60k rows at 64 KB target must split")
    // every file within a loose band of target: the calibration claim.
    // (footers + dictionary amortization make small files noisy — 3x band)
    files.foreach { f =>
      assert(f.length() < 3L * (64L << 10), s"${f.getName}: ${f.length()} B")
    }
    // lossless: count and content survive
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    assert(back.agg(sum(col("l_orderkey"))).head().getLong(0) ==
      src.agg(sum(col("l_orderkey"))).head().getLong(0))
    // range-clustered: per-file l_orderkey extents don't interleave
    val extents = back.select(input_file_name().as("f"), col("l_orderkey"))
      .groupBy("f").agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    extents.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB,
        s"file extents interleave: $hiA > $loB")
      case _ =>
    }
  }

  test("writeSized: corpus under one target lands in exactly one file") {
    val src = spark.read.parquet(s"$sf001/region.parquet")
    val out = java.nio.file.Files.createTempDirectory("ws_one").toString + "/t"
    val (nFiles, _) = graft.operators.Layout.writeSized(src, out,
      targetFileBytes = 128L << 20)
    assert(nFiles == 1)
    assert(spark.read.parquet(out).count() == src.count())
  }

  test("z-clustered layout reads fewer bytes than random for a 2-dim filter") {
    // the data-skipping claim MEASURED: same rows, same filter, two
    // layouts — the z-clustered files carry tight min/max footers on
    // BOTH interleaved dimensions, so parquet row-group stats prune
    // most of the corpus; a random layout's per-file ranges each span
    // the whole domain and prune nothing
    val n = 200000
    val rows = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(256L)).as("x"),
      pmod(col("id") * 97L, lit(256L)).as("y"),
      md5(col("id").cast("string")).as("payload"))
      .withColumn("zkey", graft.operators.Layout.interleaveBits(
        col("x"), col("y"), 8))
    val base = java.nio.file.Files.createTempDirectory("zskip").toString
    Layout.cluster(rows, "zkey", numPartitions = 32)
      .write.parquet(s"$base/clustered")
    rows.repartition(32) // round-robin: every file spans both domains
      .write.parquet(s"$base/random")

    val readBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) readBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      })
    def bytesFor(dir: String): (Long, Long) = {
      Thread.sleep(500) // let prior tasks' end events drain
      val before = readBytes.get()
      val cnt = spark.read.parquet(dir)
        .filter(col("x") >= 32 && col("x") < 48 &&
          col("y") >= 96 && col("y") < 112).count()
      Thread.sleep(500)
      (cnt, readBytes.get() - before)
    }
    val (cClustered, bClustered) = bytesFor(s"$base/clustered")
    val (cRandom, bRandom) = bytesFor(s"$base/random")
    assert(cClustered == cRandom && cClustered > 0,
      s"layouts must agree: $cClustered vs $cRandom")
    // a 16x16 tile of a 256x256 domain is 1/256 of the data; with 32
    // z-clustered files the filter touches a handful of row-groups.
    // Demand at least a 3x read cut (observed ~10x+; 3x keeps the gate
    // robust to footer overhead at this corpus size)
    assert(bClustered * 3 <= bRandom,
      s"z-clustering must cut scan bytes: clustered=$bClustered random=$bRandom")
  }
}
