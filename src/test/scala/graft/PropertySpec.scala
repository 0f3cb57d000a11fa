package graft

import org.apache.spark.sql.functions._

import graft.operators.{Splits, TextOps}

/** Property-style gates for the algebraic contracts the oracle queries
  * rely on but only sample: idempotence, partition/bounds invariants,
  * totality. Inputs are seeded-generated (adversarial fragments mixed
  * with random words) and run through the SAME Column pipelines the
  * queries use — one DataFrame per property, not per case. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val fragments = Vector(
    "The!", "a,b", "  ", "UPPER", "müß€", "x", "...", "9lives",
    "tab\there", "MiXeD", "end.", "", "çava", "A-B_C")

  /** 200 seeded texts: 0–40 draws from fragments ∪ random words. */
  private def genTexts(seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until 200).map { _ =>
      val n = rnd.nextInt(41)
      Seq.fill(n) {
        if (rnd.nextBoolean()) fragments(rnd.nextInt(fragments.length))
        else rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString
      }.mkString(" ")
    }
  }

  private def viaColumn(texts: Seq[String],
                        c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), c(col("text")).as("out"))
      .orderBy("id").collect().map(_.getString(1)).toSeq

  test("normalizeText is idempotent; output alphabet is exactly [a-z0-9 ]") {
    val texts = genTexts(7L)
    val once = viaColumn(texts, TextOps.normalizeText)
    val twice = viaColumn(once, TextOps.normalizeText)
    assert(twice == once, "normalization must be its own fixed point")
    once.foreach { s =>
      assert(s == s.trim && !s.contains("  "), s"'$s'")
      assert(s.forall(ch =>
        (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9') || ch == ' '),
        s"'$s' leaked a character outside the digest-key alphabet")
    }
  }

  test("chunkTokens at stride == size partitions the token stream exactly") {
    val rows = genTexts(11L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextOps.chunkTokens(col("text"), 5, 5).as("ch"),
        TextOps.tokens(col("text")).as("toks"))
      .collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val toks = r.getAs[scala.collection.Seq[String]]("toks").toSeq
      val rejoined = r.getAs[scala.collection.Seq[String]]("ch")
        .filter(_.nonEmpty).toSeq.flatMap(_.split(" ").toSeq)
      assert(rejoined == toks, s"partition property broke on $toks")
    }
  }

  test("split fractions live in [0,1); assignment is total and matches the cuts") {
    val rnd = new scala.util.Random(13L)
    val ids = Seq.fill(500)(math.abs(rnd.nextLong()) / 2).distinct
    val rows = Splits.assign(ids.toDF("doc_id"), "doc_id")
      .select(col("doc_id"), col("split"),
        Splits.hashFrac(col("doc_id")).as("f"))
      .collect()
    assert(rows.length == ids.length)
    rows.foreach { r =>
      val f = r.getDouble(2)
      assert(f >= 0.0 && f < 1.0, s"frac $f out of range for id ${r.getLong(0)}")
      val expect = if (f < 0.8) "train" else if (f < 0.9) "val" else "test"
      assert(r.getString(1) == expect)
    }
  }

  test("packCounted replays as a local prefix-sum per lane; repartition-stable") {
    val rnd = new scala.util.Random(17L)
    val counts = (0 until 400)
      .map(i => (i.toLong * 3 + 1, (rnd.nextInt(300) + 1).toLong))
    val df = counts.toDF("doc_id", "n")
    val got = Splits.packCounted(df, "doc_id", "n", budget = 500, shards = 4)
      .select(col("doc_id"), col("split"), col("shard"), col("n_tokens"),
        col("bin"))
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got.length == counts.length)
    // local replay: within each (split, shard) lane sorted by id, bin =
    // floor(exclusive-prefix-sum / budget)
    got.groupBy(t => (t._2, t._3)).foreach { case (_, lane) =>
      var acc = 0L
      lane.sortBy(_._1).foreach { case (_, _, _, n, bin) =>
        assert(bin == acc / 500, s"bin $bin vs ${acc / 500} at acc $acc")
        acc += n
      }
    }
    // bins are non-decreasing in id within a lane, starting at 0
    got.groupBy(t => (t._2, t._3)).foreach { case (_, lane) =>
      val bins = lane.sortBy(_._1).map(_._5)
      assert(bins.head == 0L)
      assert(bins.zip(bins.tail).forall { case (a, b) => b >= a })
    }
    // repartition-stable (content-addressed lanes + order)
    val again = Splits.packCounted(df.repartition(13), "doc_id", "n",
        budget = 500, shards = 4)
      .select(col("doc_id"), col("bin")).as[(Long, Long)].collect().toMap
    assert(again == got.map(t => t._1 -> t._5).toMap)
  }

  test("pHash is a function of decoded pixels: format- and upscale-invariant") {
    import graft.operators.Multimodal
    // the same pixel grid through PNG and BMP (both lossless) must
    // hash identically, and a 2x nearest-neighbor upscale samples the
    // same 32x32 grid so the hash is bit-identical too
    def img(scale: Int, fmt: String): Array[Byte] = {
      val base = 64
      val im = new java.awt.image.BufferedImage(base * scale, base * scale,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until base * scale; x <- 0 until base * scale) {
        val (ox, oy) = (x / scale, y / scale)
        val g = math.max(0, math.min(255,
          128 + ((ox * ox - oy * oy) / 16) % 100 +
            (if ((ox / 8 + oy / 8) % 2 == 0) 40 else -40)))
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos)
      bos.toByteArray
    }
    val hPng = Multimodal.phash64(img(1, "png")).get
    val hBmp = Multimodal.phash64(img(1, "bmp")).get
    val hUp = Multimodal.phash64(img(2, "png")).get
    assert(hPng == hBmp, "lossless formats must decode to the same hash")
    assert(hPng == hUp, "2x nearest-neighbor upscale must sample identically")
  }
}
