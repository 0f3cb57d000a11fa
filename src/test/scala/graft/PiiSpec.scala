package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String) = Seq(s).toDF("t")

  private def counts(s: String): (Long, Long, Long, Long) = {
    val r = one(s).select(
      Pii.countEmails($"t").cast("long"), Pii.countIpv4($"t").cast("long"),
      Pii.countPhones($"t").cast("long"), Pii.countSsns($"t").cast("long"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("each pattern detects its class and only its class") {
    assert(counts("mail me at a.b+c@mail-host.example.org today") == ((1L, 0L, 0L, 0L)))
    assert(counts("server 192.168.0.1 and 10.0.0.255 up") == ((0L, 2L, 0L, 0L)))
    assert(counts("call 415-555-0123 or 415.555.9999") == ((0L, 0L, 2L, 0L)))
    assert(counts("ssn 123-45-6789 on file") == ((0L, 0L, 0L, 1L)))
    // the 3-3-4 phone shape and 3-2-4 ssn shape never cross-match
    assert(counts("415-555-0123") == ((0L, 0L, 1L, 0L)))
    assert(counts("123-45-6789") == ((0L, 0L, 0L, 1L)))
    // digit runs inside words don't fire the \b-bounded patterns
    assert(counts("version v123-45-6789x and 1.2.3.4567") == ((0L, 0L, 0L, 0L)))
  }

  test("redact replaces every class and leaves no redactable residue") {
    val dirty = "a@b.co then 10.1.2.3 then 415-555-0123 then 123-45-6789 end"
    val red = one(dirty).select(Pii.redact($"t")).head().getString(0)
    assert(red == s"${Pii.EmailTag} then ${Pii.IpTag} then ${Pii.PhoneTag} " +
      s"then ${Pii.SsnTag} end")
    // idempotent: redacting redacted text changes nothing
    val twice = one(red).select(Pii.redact($"t")).head().getString(0)
    assert(twice == red)
  }

  test("email-before-ip order: dotted-quad hosts redact as one email token") {
    val red = one("x@1.2.3.4.net ok").select(Pii.redact($"t")).head().getString(0)
    assert(red == s"${Pii.EmailTag} ok")
  }

  test("augmented corpus carries one planted instance per residue class") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count()
    val aug = SparkEntry.piiAugmented(docs)
    val r = aug.select(
      sum(Pii.countEmails($"t").cast("long")),
      sum(Pii.countIpv4($"t").cast("long")),
      sum(Pii.countPhones($"t").cast("long")),
      sum(Pii.countSsns($"t").cast("long")),
      sum(Pii.totalHits($"t"))).head()
    val perClass = n / 4
    assert(r.getLong(0) == perClass && r.getLong(1) == perClass &&
      r.getLong(2) == perClass && r.getLong(3) == perClass)
    assert(r.getLong(4) == 4 * perClass)
    // redaction strips all of it
    val left = aug.select(sum(Pii.totalHits(Pii.redact($"t")))).head().getLong(0)
    assert(left == 0L)
  }
}
