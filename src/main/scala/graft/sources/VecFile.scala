package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.VectorOps.normalizeF

/** fastText `.vec` text-format source — the reference's only input format
  * (`vers/src/utils.rs:7-66`): one header line `n dim`, then per line
  * `word f1 … fdim` whitespace-separated. Reproduces the loader's
  * semantics: every vector is L2-normalized on load (utils.rs:48), an
  * optional holdout word is diverted to a separate frame instead of the
  * corpus (utils.rs:38-42, the "queen" test), and ids are dense 0..n−1 in
  * file order (utils.rs:44-47).
  *
  * Dense file-order ids are assigned DISTRIBUTED: `zipWithIndex` runs
  * one per-split line count, prefix-sums the counts on the driver, and
  * stamps ids in a narrow map — no single-partition window, no global
  * sort, so an arbitrarily large `.vec` file loads at full parallelism
  * (text splits are offset-ordered and narrow ops preserve per-split
  * row order, so the index IS the file order, deterministically).
  *
  * Order contract: "file order" is guaranteed for a SINGLE file path
  * (splits of one file are offset-ordered). For a directory or glob,
  * ids are dense over Spark's file-enumeration order — stable for a
  * fixed listing, but the concatenation order across files is the
  * enumerator's, not the caller's (pass one file when ids must equal
  * line numbers, the reference's contract — utils.rs loads one file).
  *
  * The parse lineage (split + normalize + holdout filter) is persisted
  * (MEMORY_AND_DISK) around `zipWithIndex`, which needs one extra
  * count job: without the persist that lineage runs twice — once for
  * the per-split counts, once for the read (r8 ADVICE). Call
  * [[Loaded.unpersist]] once the corpus is materialized downstream.
  */
object VecFile {

  case class Loaded(corpus: DataFrame /* id, word, vector */,
                    holdout: DataFrame /* word, vector */,
                    private val cached: org.apache.spark.rdd.RDD[Row]) {
    /** Release the parse cache once the corpus has been materialized
      * (written, checkpointed, or indexed) downstream. */
    def unpersist(): Unit = { cached.unpersist(blocking = false); () }
  }

  def read(spark: SparkSession, path: String,
           holdoutWord: Option[String] = None): Loaded = {
    val lines = spark.read.text(path)
    val parsed = lines
      .withColumn("parts", split(trim(col("value")), "\\s+"))
      .filter(size(col("parts")) > 2) // drops the `n dim` header line
      .select(col("parts").getItem(0).as("word"),
        normalizeF(expr("slice(parts, 2, size(parts) - 1)").cast("array<float>"))
          .as("vector"))
    val holdout = holdoutWord.map(w => parsed.filter(col("word") === w))
      .getOrElse(parsed.limit(0))
    val kept = holdoutWord.map(w => parsed.filter(col("word") =!= w))
      .getOrElse(parsed)
    val keptRdd = kept.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = StructType(
      StructField("id", LongType, nullable = false) +: kept.schema.fields)
    val corpus = spark.createDataFrame(
      keptRdd.zipWithIndex.map { case (r, i) => Row.fromSeq(i +: r.toSeq) },
      schema)
    Loaded(corpus, holdout.select(col("word"), col("vector")), keptRdd)
  }
}
