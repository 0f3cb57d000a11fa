package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.normalizeF

/** fastText `.vec` text-format source — the reference's only input format
  * (`vers/src/utils.rs:7-66`): one header line `n dim`, then per line
  * `word f1 … fdim` whitespace-separated. Reproduces the loader's
  * semantics: every vector is L2-normalized on load (utils.rs:48), an
  * optional holdout word is diverted to a separate frame instead of the
  * corpus (utils.rs:38-42, the "queen" test), and ids are dense 0..n−1 in
  * file order (utils.rs:44-47).
  *
  * Scale note: `monotonically_increasing_id` is NOT dense; dense ranks
  * need a total order. File order = (file line order) is reconstructed
  * per-partition-offset-free via a window over the input order column —
  * at 100 TB you'd pre-shard `.vec` into parquet once and never re-rank;
  * this source exists for reference parity.
  */
object VecFile {

  case class Loaded(corpus: DataFrame /* id, word, vector */,
                    holdout: DataFrame /* word, vector */)

  /** Rows above this refuse the single-partition dense-rank window —
    * the reference-parity path is for embedding files that fit one
    * task; larger corpora should land in parquet once (see scale note
    * above). Override via `graft.vecfile.maxRows`. */
  val MaxRowsKey = "graft.vecfile.maxRows"
  val DefaultMaxRows: Long = 10000000L

  def read(spark: SparkSession, path: String,
           holdoutWord: Option[String] = None): Loaded = {
    val maxRows = spark.conf.getOption(MaxRowsKey).map(_.toLong)
      .getOrElse(DefaultMaxRows)
    // capped count (the Batches.bounded trick): the guard must not
    // itself scan an over-budget file end-to-end; +1 for the header
    // line, +1 as the over-budget sentinel
    val nLines = spark.read.text(path).limit((maxRows + 2).toInt).count()
    require(nLines <= maxRows + 1,
      s".vec file exceeds $MaxRowsKey=$maxRows vector rows: the dense-id " +
        "ranking is a single-partition window (reference-parity only, " +
        "utils.rs:44-47) — convert the file to parquet with pre-assigned " +
        "ids for corpora beyond one task's memory")
    val lines = spark.read.text(path)
      .withColumn("_file_order", monotonically_increasing_id())
    val parsed = lines
      .withColumn("parts", split(trim(col("value")), "\\s+"))
      .filter(size(col("parts")) > 2) // drops the `n dim` header line
      .select(col("_file_order"), col("parts").getItem(0).as("word"),
        normalizeF(expr("slice(parts, 2, size(parts) - 1)").cast("array<float>"))
          .as("vector"))
    val holdout = holdoutWord.map(w => parsed.filter(col("word") === w))
      .getOrElse(parsed.limit(0))
    val kept = holdoutWord.map(w => parsed.filter(col("word") =!= w))
      .getOrElse(parsed)
    val w = Window.orderBy(col("_file_order"))
    val corpus = kept
      .withColumn("id", row_number().over(w).cast("long") - 1)
      .select(col("id"), col("word"), col("vector"))
    Loaded(corpus, holdout.select(col("word"), col("vector")))
  }
}
