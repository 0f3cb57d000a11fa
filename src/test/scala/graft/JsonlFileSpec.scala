package graft

import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.JsonlFile

class JsonlFileSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("meta", StructType(Seq(
      StructField("lang", StringType),
      StructField("stars", LongType))))))

  private def line(i: Int): String =
    if (i % 9 == 4) s"""{"id": $i, "text": "truncat"""
    else {
      val lang = Seq("en", "de", "fr")(i % 3)
      s"""{"id": $i, "text": "doc $i body", "meta": {"lang": "$lang", "stars": ${i * 3 % 7}}}"""
    }

  private lazy val dir = {
    val d = Files.createTempDirectory("jsonl")
    Files.writeString(d.resolve("part-0.jsonl"),
      (0 until 15).map(line).mkString("", "\n", "\n"))
    val gz = new GZIPOutputStream(
      Files.newOutputStream(d.resolve("part-1.jsonl.gz")))
    gz.write((15 until 30).map(line).mkString("", "\n", "\n").getBytes("UTF-8"))
    gz.close()
    d.toString
  }

  test("good rows parse across plain and gzip shards with nested fields") {
    val loaded = JsonlFile.read(spark, dir, schema)
    val got = loaded.good
      .select($"id", $"text", $"meta.lang", $"meta.stars")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val expected = (0 until 30).filter(_ % 9 != 4).map { i =>
      (i.toLong, s"doc $i body", Seq("en", "de", "fr")(i % 3), (i * 3 % 7).toLong)
    }
    assert(got.toSeq == expected)
  }

  test("malformed lines land in quarantine with their raw text") {
    val q = JsonlFile.read(spark, dir, schema).quarantine
      .as[String].collect().sorted
    val expected = (0 until 30).filter(_ % 9 == 4).map(line).sorted
    assert(q.toSeq == expected.toSeq)
  }

  test("explicit projection prunes the parse to the selected fields only") {
    val loaded = JsonlFile.read(spark, dir, schema, project = Seq("id"))
    val plan = loaded.good.queryExecution.optimizedPlan.toString
    // the from_json schema must carry only id (+ corrupt col): parse
    // cost follows the projection, not the full declared schema
    assert(plan.contains("from_json"), plan)
    assert(!plan.contains("meta") && !plan.contains("text,String"), plan)
    // and results stay correct, quarantine still fires on bad syntax
    assert(loaded.good.count() == 27) // corrupt i = 4, 13, 22
    assert(loaded.quarantine.count() == 3)
    intercept[IllegalArgumentException] {
      JsonlFile.read(spark, dir, schema, project = Seq("nope"))
    }
  }

  test("reserved corrupt column is rejected in caller schemas") {
    val bad = StructType(Seq(StructField("__graft_corrupt", StringType)))
    intercept[IllegalArgumentException] {
      JsonlFile.read(spark, dir, bad)
    }
  }

  test("write → read round-trips through gzip ndjson shards") {
    val out = Files.createTempDirectory("jsonlw").resolve("out").toString
    val df = (0 until 100).map(i => (i.toLong, s"text $i")).toDF("id", "text")
    JsonlFile.write(df, out, compress = true, shards = Some(4))
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.count(_.endsWith(".json.gz")) == 4, files.mkString(","))
    val rtSchema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val back = JsonlFile.read(spark, out, rtSchema)
    assert(back.quarantine.count() == 0)
    val got = back.good.as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == (0 until 100).map(i => (i.toLong, s"text $i")))
  }
}
