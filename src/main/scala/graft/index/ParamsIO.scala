package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Index-params sidecar IO through the Hadoop filesystem API, so
  * `save(dir)`/`load(dir)` work wherever the parquet components go
  * (hdfs://, s3a://, file:) instead of silently assuming the driver's
  * local filesystem. One tiny JSON parser for the flat numeric objects
  * the indexes write (shared — previously triplicated). */
object ParamsIO {

  def write(spark: SparkSession, dir: String, json: String): Unit = {
    val p = new Path(dir, "params.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, dir: String): String = {
    val p = new Path(dir, "params.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Value of a numeric field in a flat JSON object. */
  def num(json: String, key: String): Long =
    s""""$key":(-?\\d+)""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(s"missing $key in $json"))
      .group(1).toLong

  /** Floating-point field, with a default for sidecars written before
    * the field existed. */
  def dbl(json: String, key: String, default: Double): Double =
    s""""$key":(-?[\\d.eE+-]+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toDouble).getOrElse(default)

  /** Long-array field (`"key":[1,2,3]`), None when absent — how the
    * index tiers carry per-cluster sizes in the sidecar so load skips
    * the full-codes recount job (sizes are k longs, driver-sized by
    * the same contract as the collected centroids). Absent = sidecar
    * written before the field existed → caller falls back to the
    * count. */
  def longs(json: String, key: String): Option[Array[Long]] =
    s""""$key":\\[([^\\]]*)\\]""".r.findFirstMatchIn(json).map { m =>
      val body = m.group(1).trim
      if (body.isEmpty) Array.empty[Long]
      else body.split(",").map(_.trim.toLong)
    }

  /** [[longs]]'s writer face. */
  def longsJson(sizes: Array[Long]): String = sizes.mkString("[", ",", "]")
}
