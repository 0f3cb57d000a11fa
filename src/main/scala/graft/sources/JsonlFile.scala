package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines corpus source (beyond the reference surface — vers loads
  * only fastText `.vec`): the de-facto interchange format of web-scale
  * training data (Common-Crawl derivatives, Dolma, RedPajama all ship
  * newline-delimited JSON, usually gzip-sharded).
  *
  * Built on Spark's native json reader — distributed, splittable for
  * plain files, per-file parallel for `.gz` shards (gzip is not
  * splittable; at 100 TB the parallelism unit is the shard file, which
  * is exactly how those corpora are published: many ~100 MB–1 GB
  * shards). An EXPLICIT caller schema is required, never inference:
  * schema inference is a full extra pass over the corpus and a
  * stability hazard (a single odd shard flips a field's type for the
  * whole read). With an explicit schema Spark parses only the
  * projected fields per line.
  *
  * Malformed lines are data, not exceptions (a crawl always contains
  * truncated shards): PERMISSIVE mode routes every unparseable line to
  * a quarantine frame carrying the raw text, so ingest can count,
  * sample, and re-drive them instead of failing the job — the same
  * corrupt-is-data contract as [[graft.operators.Multimodal]] decode.
  */
object JsonlFile {

  /** `good` = parsed rows in the caller's schema; `quarantine` = raw
    * text of lines that failed to parse (column `raw`). */
  case class Loaded(good: DataFrame, quarantine: DataFrame)

  private val CorruptCol = "__graft_corrupt"

  /** Read newline-delimited JSON under `path` (file, directory, or
    * glob; mixed plain / `.gz` shards fine) with the given schema.
    *
    * Reads through the TEXT source + `from_json` rather than
    * `spark.read.json`: identical parse work and split behavior, but
    * (a) the raw line survives for quarantine verbatim (the json
    * reader's corrupt column is a re-rendering), and (b) it sidesteps
    * the json scan's refusal to answer corrupt-column-only queries
    * (Spark prunes the data fields and then rejects the plan).
    * Column pruning is EXPLICIT here: pass `project` with the fields a
    * query needs and only those parse (Catalyst's own from_json
    * pruning is disabled the moment a corrupt-record column is
    * configured, so relying on the optimizer would silently parse
    * everything). With a projection, quarantine still catches every
    * syntactically malformed line; type mismatches confined to
    * UNPROJECTED fields go unseen — the standard lazy-parse trade.
    * Each frame triggers its own scan — at scale, persist `good` (or
    * write it out) rather than re-reading.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           project: Seq[String] = Nil): Loaded = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not contain the reserved column $CorruptCol")
    val projected: StructType =
      if (project.isEmpty) schema
      else {
        val bad = project.filterNot(schema.fieldNames.contains)
        require(bad.isEmpty, s"projected fields not in schema: $bad")
        StructType(schema.fields.filter(f => project.contains(f.name)))
      }
    val withCorrupt = projected.add(CorruptCol, StringType, nullable = true)
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol)
    val parsed = spark.read.textFile(path).toDF("raw")
      .select(col("raw"),
        from_json(col("raw"), withCorrupt, opts).as("__j"))
    val good = parsed.filter(col(s"__j.$CorruptCol").isNull)
      .select(projected.fieldNames.map(f => col(s"__j.$f").as(f)).toIndexedSeq: _*)
    val quarantine = parsed.filter(col(s"__j.$CorruptCol").isNotNull)
      .select(col("raw"))
    Loaded(good, quarantine)
  }

  /** Write a frame back out as sharded ndjson — the publishing half of
    * the interchange contract (gzip-sharded by default, the format
    * those corpora ship in; gzip shards are the parallelism unit on
    * re-read, so pick `shards` near the consumer's task parallelism,
    * not 1). `shards = None` keeps the input partitioning (no extra
    * shuffle). */
  def write(df: DataFrame, path: String, compress: Boolean = true,
            shards: Option[Int] = None): Unit = {
    shards.foreach(s => require(s > 0, "shards must be positive"))
    val base = shards.map(df.repartition(_)).getOrElse(df)
    val w = base.write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }
}
