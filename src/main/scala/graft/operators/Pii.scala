package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation (beyond the
  * reference surface — vers is vectors-only — per the driver's north
  * star: the scrub stage every public-web pretraining corpus runs
  * before anything else sees the text).
  *
  * Engine-portability contract: every pattern uses only the regex
  * subset Java `java.util.regex` and RE2 (the DuckDB oracle's engine)
  * interpret identically — character classes, bounded repetition,
  * alternation, `\b` word boundaries, `\d` = [0-9]. No backreferences,
  * no lookaround, so the same pattern string is pasted verbatim into
  * the oracle SQL.
  *
  * Scale shape: pure narrow per-row maps (regexp_count /
  * regexp_replace inside whole-stage codegen) — no shuffle, no state,
  * no UDF. At 100 TB this is scan-bound; the only knob that matters is
  * that the patterns are anchored enough (digit-led, `\b`-bounded) to
  * keep the NFA linear on long documents, which the RE2-compatible
  * subset guarantees by construction.
  */
object Pii {

  /** The four scrub classes of a standard pretraining pass. Patterns
    * are deliberately conservative (precision over recall): a false
    * redaction destroys training signal, a miss is caught by the next
    * pipeline stage.
    */
  val EmailRe: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** NANP-shaped 3-3-4 with `-` or `.` separators (distinct from the
    * 3-2-4 SSN shape, so redaction order between them is immaterial).
    */
  val PhoneRe: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val SsnRe: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Replacement tokens kept free of regex metacharacters and of
    * digits/`@` so one redaction can never create a fresh match for a
    * later pattern (the chain in [[redact]] is order-insensitive
    * except email-before-ip, pinned below).
    */
  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"
  val SsnTag = "<SSN>"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailRe))
  def countIpv4(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def countPhones(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def countSsns(text: Column): Column = regexp_count(text, lit(SsnRe))

  /** Redact all four classes. Email first: an email's host part can
    * contain a dotted quad (`a@1.2.3.4.net`-style), and redacting the
    * whole address as one token beats leaving `<IP>` debris inside it.
    * SSN before phone is cosmetic (the shapes are disjoint); IP last.
    */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, EmailTag)
    val s = regexp_replace(e, SsnRe, SsnTag)
    val p = regexp_replace(s, PhoneRe, PhoneTag)
    regexp_replace(p, Ipv4Re, IpTag)
  }

  /** Total PII hits of all classes (the admission-gate score: docs
    * above a threshold are typically dropped rather than redacted).
    */
  def totalHits(text: Column): Column =
    (countEmails(text) + countIpv4(text) + countPhones(text) +
      countSsns(text)).cast("long")
}
