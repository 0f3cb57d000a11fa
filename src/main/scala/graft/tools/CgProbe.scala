package graft
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CgProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = SparkEntry.fixedCentroids(emb)
    val sq8 = graft.index.SQ8.compress(graft.index.IVFFlat.Model(
      graft.index.IVFFlat.Params(cents.length), cents,
      Array.fill(cents.length)(Long.MaxValue),
      graft.index.IVFFlat.assign(emb, "vec_id", "embedding", cents)))
    val df = sq8.searchMany(emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, 2)
    df.collect()
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/cg/sq8_codegen.txt"), code.getBytes)
    println("WROTE /tmp/cg/sq8_codegen.txt")
    spark.stop()
  }
}
