package graft

import org.apache.spark.sql.SparkSession

/** Corpus-scale smoke for the unigram-LM tokenizer trainer: the claim
  * under test is the [[graft.operators.Bpe]] scale contract — ONE
  * corpus pass (word-frequency aggregation over ~50M tokens), then
  * seeding + every EM iteration runs over the Zipf-bounded word table
  * only, with piece tables broadcast. Also pins bit-determinism at
  * scale: retraining on a repartitioned corpus must produce the
  * IDENTICAL vocabulary (the hard-EM integer-count design exists for
  * exactly this).
  * Run: sbt "runMain graft.UnigramScaleSmoke [nDocs]".
  * Output: one k=v per line (the ScaleSmoke convention, recorded in
  * BASELINE.md). */
object UnigramScaleSmoke {

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 500000
    val docLen = 100
    val vocab = 50000L
    val seed = 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Zipf-ish draw: rank r selected with weight ~ 1/(r+1) via two
    // mixes (cheap approximation — what matters is a realistic skewed
    // word table, not the exact exponent)
    def word(h: Long): String = {
      val u = (h >>> 11).toDouble / (1L << 53).toDouble
      val r = (math.pow(vocab.toDouble, u) - 1.0).toLong
      "w" + r
    }
    val docs = spark.range(nDocs).as[Long]
      .map { id =>
        val sb = new StringBuilder
        var p = 0
        while (p < docLen) {
          if (p > 0) sb.append(' ')
          sb.append(word(mix64(id * 1000003L + p * 7919L + seed)))
          p += 1
        }
        (id, sb.toString)
      }
      .toDF("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    docs.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    out += "n_docs" -> nDocs.toString += "n_tokens" -> (nDocs.toLong * docLen).toString

    val (pieces, tTrain) = timed {
      operators.Unigram.train(docs, "text", vocabSize = 8192, emIters = 2,
        maxPieceLen = 4, seedSize = 30000, maxWords = 50000)
    }
    out += "train_s" -> f"$tTrain%.1f"
    out += "vocab_size" -> pieces.length.toString

    val (pieces2, tTrain2) = timed {
      operators.Unigram.train(docs.repartition(17), "text", vocabSize = 8192,
        emIters = 2, maxPieceLen = 4, seedSize = 30000, maxWords = 50000)
    }
    out += "retrain_s" -> f"$tTrain2%.1f"
    out += "deterministic" -> (pieces.toSeq == pieces2.toSeq).toString

    val (nSub, tEnc) = timed {
      operators.Unigram.encode(docs, "doc_id", "text", pieces)
        .selectExpr("sum(size(subwords))").as[Long].head()
    }
    out += "encode_s" -> f"$tEnc%.1f"
    out += "encoded_subwords" -> nSub.toString

    // -- subword-budget packing + token-weighted mixing over the full
    // corpus under the TRAINED vocab: counting is the same narrow
    // Viterbi map as encode (no subword arrays ever shuffle — only the
    // (id, count) pairs move through the lane window), so the claim
    // under test is corpus-linear wall + count-sized shuffle
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val before = shuffleBytes.get()
    val ((nBins, totTok), tPack) = timed {
      val packed = operators.Splits.packSubwords(docs, "doc_id", "text",
        pieces, budget = 2048, shards = 64)
      packed.selectExpr("count(distinct split || '/' || shard || '/' || bin)",
          "sum(n_tokens)")
        .as[(Long, Long)].head()
    }
    out += "pack_s" -> f"$tPack%.1f"
    out += "pack_shuffle_mb" -> ((shuffleBytes.get() - before) / (1L << 20)).toString
    out += "pack_bins" -> nBins.toString
    out += "pack_tokens" -> totTok.toString

    val before2 = shuffleBytes.get()
    val (keptTok, tMix) = timed {
      // zipf-ish source tiers (source s_k gets ~n/2^(k+1) docs, via
      // trailing zeros of a hash: x & -x isolates the lowest set bit,
      // bit_count(lowbit - 1) counts the zeros below it) so the
      // temperature flattening has real mass skew to flatten
      val withSrc = docs.withColumn("source",
        org.apache.spark.sql.functions.expr(
          "concat('s', cast(bit_count(((pmod(hash(doc_id), 256) + 256) & " +
            "-(pmod(hash(doc_id), 256) + 256)) - 1) as string))"))
      val counted = operators.Unigram.subwordCounts(
          withSrc, "doc_id", "text", pieces)
        .withColumnRenamed("id", "doc_id")
        .join(withSrc.select("doc_id", "source"), "doc_id")
      operators.Splits.mixByTemperatureWeighted(counted, "doc_id", "source",
          "n_subwords", alpha = 0.5)
        .selectExpr("sum(n_subwords)").as[Long].head()
    }
    out += "mix_s" -> f"$tMix%.1f"
    out += "mix_shuffle_mb" -> ((shuffleBytes.get() - before2) / (1L << 20)).toString
    out += "mix_kept_tokens" -> keptTok.toString

    out.foreach { case (k, v) => println(s"$k=$v") }
    spark.stop()
  }
}
