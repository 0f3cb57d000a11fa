package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed parquet sink + catalog reader — the shuffle-elimination
  * layout for repeated fact-to-fact joins (beyond the reference
  * surface, which persists per-index files only, base.rs:31-58; this
  * is the relational sink a 100-TB pipeline needs).
  *
  * Why bucketing matters at scale: a fact⋈fact equi-join (orders ⋈
  * lineitem, doc ids ⋈ dedup verdicts, vectors ⋈ cluster assignments)
  * shuffles BOTH sides every time it runs. Writing each side once,
  * hash-bucketed on the join key with the SAME bucket count, makes
  * every later join on that key exchange-free: Spark's scan reports
  * `HashPartitioning(key, n)` straight from the catalog, so SortMerge
  * join needs no Exchange on either side, and a following groupBy on
  * the same key reuses the partitioning too — a scan→join→agg plan
  * with ZERO shuffles (BucketedSpec gates exactly that). At 100 TB
  * the one-time bucketed write replaces a per-query double shuffle of
  * the two largest tables in the warehouse.
  *
  * File layout contract: rows are repartitioned by Spark's OWN bucket
  * hash (`HashPartitioning` on the bucket column, numBuckets ways)
  * BEFORE the write, so each task holds exactly one bucket and writes
  * exactly one file. Without this, every task writes a file per bucket
  * it happens to see — tasks × buckets small files, and the per-bucket
  * `sortBy` metadata becomes useless to the reader (Spark only trusts
  * bucket sort order when a bucket is a single file). numBuckets is a
  * layout decision sized like shuffle partitions: target < a few GB
  * per bucket at the table's full scale.
  */
object Bucketed {

  /** Write `df` as an external bucketed parquet table named `table`
    * at `path`, bucketed `numBuckets` ways on `bucketCol`, each
    * bucket one file sorted by `sortCols` (default: the bucket column
    * — sorted buckets let the reader skip the join-side sort as well).
    * Replaces any existing table of that name. */
  def write(df: DataFrame, table: String, path: String, numBuckets: Int,
            bucketCol: String, sortCols: Seq[String] = Nil): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val sorts = if (sortCols.nonEmpty) sortCols else Seq(bucketCol)
    df.repartition(numBuckets, col(bucketCol))
      .write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back through the catalog. Must go through
    * `spark.table`, not `spark.read.parquet(path)` — the bucket spec
    * lives in catalog metadata; a raw path read sees plain files and
    * re-shuffles. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
