package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scaling

/** Gates for the r15 parallelism-repair helper: widen() must fan a
  * narrow under-parallel frame out to the session's cores, stay a
  * no-op on already-wide frames (the at-scale contract: no exchange
  * added), and never change row contents; widenBySize must calibrate
  * by artifact bytes. */
class ScalingSpec extends AnyFunSuite with SparkSpec {

  test("widen fans a one-partition frame out to defaultParallelism") {
    val cores = spark.sparkContext.defaultParallelism
    val df = spark.range(1000).toDF("id").coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    val w = Scaling.widen(df)
    assert(w.rdd.getNumPartitions == cores)
    // contents identical (round-robin only moves rows between tasks)
    assert(w.agg(sum("id")).head.getLong(0) == 499500L)
    assert(w.count() == 1000L)
  }

  test("widen is a no-op when the frame is already at least core-wide") {
    val cores = spark.sparkContext.defaultParallelism
    val df = spark.range(1000).toDF("id").repartition(cores + 3)
    val w = Scaling.widen(df)
    // no exchange added: same partition count, same plan object
    assert(w.rdd.getNumPartitions == cores + 3)
    assert(w eq df)
  }

  test("widenBySize calibrates partitions by artifact bytes, clamped") {
    val cores = spark.sparkContext.defaultParallelism
    val df = spark.range(100).toDF("id").coalesce(1)
    // below one target's worth of bytes: stays at its natural width
    assert(Scaling.widenBySize(df, bytes = 1000,
      bytesPerPartition = 4096) eq df)
    // 10 targets' worth: 10 partitions (or cores if smaller)
    val want = math.min(cores, 10)
    assert(Scaling.widenBySize(df, bytes = 10 * 4096,
      bytesPerPartition = 4096).rdd.getNumPartitions == want)
    // huge artifact: clamped to cores
    assert(Scaling.widenBySize(df, bytes = Long.MaxValue / 2,
      bytesPerPartition = 4096).rdd.getNumPartitions == cores)
  }

  test("pathBytes reads a directory's recursive size; 0 when absent") {
    val tmp = java.nio.file.Files.createTempDirectory("scaling_spec")
    spark.range(10).write.mode("overwrite")
      .parquet(tmp.resolve("t").toString)
    assert(Scaling.pathBytes(spark, tmp.resolve("t").toString) > 0L)
    assert(Scaling.pathBytes(spark, tmp.resolve("missing").toString) == 0L)
  }
}
