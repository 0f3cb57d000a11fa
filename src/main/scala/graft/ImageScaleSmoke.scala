package graft

import org.apache.spark.sql.SparkSession

/** Corpus-scale smoke for the image perceptual-dedup path
  * ([[graft.operators.Multimodal.imagePhash]] →
  * [[graft.operators.Dedup.imagePhashPairs]] → keep-first): nBase real
  * 64×64 PNGs (photo-like multi-bump textures, encoded with ImageIO in
  * the executors) plus nDup planted near-duplicates of base id % nBase
  * cycling three dup classes — +10 luminance block (re-encode-grade),
  * MIRROR, and 180° ROTATION (the dihedral classes the canonical
  * unsigned-min hash must catch) —,
  * measuring fingerprint wall (decode+DCT per image), pair-join wall +
  * shuffle (the 64-bit pigeonhole chunk join at maxHamming = 4: 5
  * chunks of ~13 bits, so candidate fanout is bucket-bounded), planted
  * removal recall, and the false-pair count among unrelated images.
  * Run: sbt "runMain graft.ImageScaleSmoke [nBase] [nDup]".
  * Output: one k=v per line (BASELINE.md convention). */
object ImageScaleSmoke {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Photo-like 64×64 gray texture: 10 deterministic ±110 bumps (the
    * SparkEntry fixture formula, id-parameterized). Variants: 0 =
    * original, 1 = +10 luminance block (re-encode-grade), 2 = MIRROR,
    * 3 = 180° ROTATION — the dihedral dup classes the canonical hash
    * must catch. */
  private def png(imgSeed: Long, variant: Int): Array[Byte] = {
    def gray0(x: Int, y: Int): Int = {
      var g = 128
      var b = 0
      while (b < 10) {
        val h = mix64(imgSeed * 1000003L + b * 7919L + 17L)
        val cx = java.lang.Long.remainderUnsigned(h, 64L).toInt
        val cy = java.lang.Long.remainderUnsigned(h >>> 17, 64L).toInt
        val amp = if ((h >>> 40) % 2 == 0) 110 else -110
        val d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
        if (d2 < 144) g += amp * (144 - d2) / 144
        b += 1
      }
      g
    }
    def gray(x: Int, y: Int): Int = variant match {
      case 1 => if (x >= 20 && x < 32 && y >= 20 && y < 32) gray0(x, y) + 10
                else gray0(x, y)
      case 2 => gray0(63 - x, y)
      case 3 => gray0(63 - x, 63 - y)
      case _ => gray0(x, y)
    }
    val im = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val g = math.max(0, math.min(255, gray(x, y)))
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toInt else 200000
    val nDup = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    // ids [0, nBase) originals; [nBase, nBase+nDup) copies of base
    // id % nBase, cycling the three dup classes (perturbed / mirrored /
    // 180°-rotated) by id % 3. PNG bytes are generated (and later
    // decoded) in the executors — the corpus never sits on the driver.
    val media = spark.range(nBase + nDup).as[Long]
      .mapPartitions(_.map { id =>
        val isDup = id >= nBase
        (id, png(if (isDup) id % nBase else id,
          if (isDup) 1 + (id % 3).toInt else 0))
      })
      .toDF("id", "content")
      .repartition(spark.sparkContext.defaultParallelism).persist()
    val nBytes = media.selectExpr("sum(length(content))").as[Long].head()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n_images" -> (nBase + nDup).toString
    out += "png_mb" -> (nBytes / (1L << 20)).toString

    // ---- fingerprint: decode + 32×32 DCT per image, 8 B out
    Thread.sleep(500)
    val b0 = shuffleBytes.get()
    val (fps, tFp) = timed {
      val f = graft.operators.Multimodal.imagePhash(media).persist()
      f.count()
      f
    }
    Thread.sleep(500)
    out += "phash_s" -> f"$tFp%.1f"
    out += "phash_shuffle_mb" -> ((shuffleBytes.get() - b0) / (1L << 20)).toString

    // ---- pairs: the 64-bit pigeonhole join over the fingerprints
    Thread.sleep(500)
    val b1 = shuffleBytes.get()
    val (pairs, tP) = timed {
      val p = graft.operators.Dedup
        .imagePhashPairs(media, maxHamming = 4).persist()
      p.count()
      p
    }
    Thread.sleep(500)
    out += "pairs_s" -> f"$tP%.1f"
    out += "pairs_shuffle_mb" -> ((shuffleBytes.get() - b1) / (1L << 20)).toString
    val nPairs = pairs.count()
    out += "pairs_found" -> nPairs.toString
    // planted = pairs linking a dup to its base family; false = rest
    import org.apache.spark.sql.functions.{col, lit}
    val planted = pairs.filter(
      (col("doc_b") >= nBase && col("doc_a") === col("doc_b") % nBase) ||
        (col("doc_a") >= nBase && col("doc_b") >= nBase &&
          col("doc_a") % nBase === col("doc_b") % nBase)).count()
    out += "pairs_planted" -> planted.toString
    out += "pairs_other" -> (nPairs - planted).toString
    // per-dup-class hit counts (1 = perturbed, 2 = mirrored, 3 = rot180)
    val dupHit = pairs.filter(col("doc_b") >= nBase &&
        col("doc_a") === col("doc_b") % nBase)
      .select((col("doc_b") % 3).as("cls")).groupBy("cls").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // variant = 1 + (id % 3): cls 0 → perturb, 1 → mirror, 2 → rot180
    Seq(0L -> "perturb", 1L -> "mirror", 2L -> "rot180").foreach { case (c, name) =>
      out += s"dup_hits_$name" -> dupHit.getOrElse(c, 0L).toString
    }

    // ---- keep-first over the pair graph: every planted dup should drop
    val (nKept, tK) = timed {
      graft.operators.Dedup.keepFirstByPairs(media, "id", pairs.toDF(),
        "doc_a", "doc_b").count()
    }
    out += "keepfirst_s" -> f"$tK%.1f"
    out += "kept" -> nKept.toString
    val removedPlanted = (nBase + nDup) - nKept
    out += "planted_recall" ->
      f"${math.min(removedPlanted, nDup).toDouble / nDup}%.3f"

    out.foreach { case (k, v) => println(s"$k=$v") }
    spark.stop()
  }
}
