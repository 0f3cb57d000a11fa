package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._
import graft.operators.TextOps._

/** Deduplication operators for LLM-data pipelines (driver north star;
  * the exact-dup shape generalizes lsh.rs:113-130's bit-pattern dedup).
  *
  * Every operator is pair/cluster-producing and shuffle-disciplined:
  *  - exact: one hash-shuffle on the content key;
  *  - MinHash-LSH: candidates meet only inside a band bucket
  *    (explode × numBands, then equi-join — posting-list sized, never
  *    all-pairs);
  *  - SimHash: pigeonhole chunk join (split the fingerprint into
  *    maxHamming+1 chunks; any pair within the radius must share one) —
  *    candidate set is complete, no crossJoin at scale;
  *  - n-gram Jaccard: shingle inverted-index equi-join, per-pair
  *    intersection counts vs per-doc sizes;
  *  - embedding cosine: brute pair scan kept for exactness at oracle
  *    scale; at 100 TB compose with LSHForest/IVFFlat buckets as the
  *    candidate prefilter (same join shape as MinHash bands).
  */
object Dedup {

  /** Keep-first exact dedup over arbitrary key columns. */
  def exactKeepFirst(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Near-dup candidate pairs via MinHash banding: docs sharing at least
    * one of numHashes/bandSize band buckets, with the shared-band count.
    * Docs with < 3 tokens have no signature and never pair. */
  def minhashBandPairs(docs: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 12, bandSize: Int = 2): DataFrame = {
    require(numHashes % bandSize == 0)
    val numBands = numHashes / bandSize
    val sh = shingles(col(textCol))
    val sigs = docs
      .select(col(idCol).cast("long").as("id"), sh.as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id") +:
        (0 until numHashes).map(i => minhash(col("sh"), i).as(s"mh_$i")): _*)
    val bands = sigs.select(col("id"), posexplode(array(
      (0 until numBands).map(b => md5(concat_ws("|",
        (0 until bandSize).map(r => col(s"mh_${b * bandSize + r}")): _*))): _*
    ))).toDF("id", "band", "key")
    bands.as("l").join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact n-gram Jaccard over distinct word-3-shingle sets, via the
    * shingle inverted index; pairs with similarity ≥ threshold.
    * Division is exact-int-to-double → engine-portable bits. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.5): DataFrame = {
    val ex = docs
      .select(col(idCol).cast("long").as("id"),
        explode(array_distinct(shingles(col(textCol)))).as("sh"))
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = ex.as("l").join(ex.as("r"),
        col("l.sh") === col("r.sh") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup pairs within a Hamming radius, via pigeonhole
    * chunking: the 16-bit fingerprint splits into maxHamming+1 chunks;
    * any pair with ≤ maxHamming differing bits shares ≥ 1 chunk, so the
    * chunk equi-join is a complete candidate generator. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 2): DataFrame = {
    val nChunks = maxHamming + 1
    val bitsPer = 16 / nChunks
    val fp = docs.select(col(idCol).cast("long").as("id"),
      simhash16(col(textCol)).as("sim"))
    val chunks = fp.select(col("id"), col("sim"), posexplode(array(
      (0 until nChunks).map { c =>
        // chunk c: bits [c*bitsPer, ...) — last chunk takes the remainder
        val lo = c * bitsPer
        val width = if (c == nChunks - 1) 16 - lo else bitsPer
        shiftright(col("sim"), lo).bitwiseAND(lit((1 << width) - 1))
      }: _*))).toDF("id", "sim", "chunk", "ckey")
    val cand = chunks.as("l").join(chunks.as("r"),
        col("l.chunk") === col("r.chunk") && col("l.ckey") === col("r.ckey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"),
        col("l.sim").as("sa"), col("r.sim").as("sb"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding near-dup pairs under cosine distance < threshold. Exact
    * pair scan (oracle-checkable); see class doc for the 100 TB path. */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     maxCosDist: Double = 0.2): DataFrame = {
    val v = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    v.as("l").join(v.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        cosineDistance(col("l.vec"), col("r.vec")).as("distance"))
      .filter(col("distance") < maxCosDist)
      .orderBy(col("id_a"), col("id_b"))
  }
}
