package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join shapes for skewed corpora. A hot join key (one crawl domain,
  * one degenerate dedup digest, one null-ish default id) sends its
  * whole group through ONE reducer of a shuffle join — at 100 TB that
  * single task is the job's wall-clock. Spark's AQE skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`) handles the sorted-shuffle
  * case at runtime; [[saltedJoin]] is the PLANNED mitigation for when
  * the skew is known and the join must stay deterministic in shape —
  * e.g. inside a fixed production pipeline or under a non-AQE engine.
  */
object Joins {

  /** Salted inner equi-join: result-identical to
    * `left.join(right, keys)`, but the left side's rows spread over
    * `s` sub-keys so a hot key occupies `s` reducers instead of one.
    *
    *  - LEFT (the big, skewed side) gains `__salt = hash60(saltFrom)
    *    mod s` — content-addressed (md5, the [[Splits]] idiom), so the
    *    spread is deterministic and repartition-stable. `saltFrom`
    *    must vary WITHIN a hot key group (a row id, a line number) —
    *    salting by the join key itself would re-concentrate the group.
    *  - RIGHT (the smaller side) replicates ×s via explode, so every
    *    (key, salt) cell still sees the full right group: each left row
    *    meets each matching right row exactly once — equality with the
    *    plain join is an identity, not an approximation (oracle lane
    *    join_salted gates it against the un-salted SQL).
    *
    * Cost model: right side ships s× (bounded: s ≤ 64 and the right
    * side of a skew-salted join is dimension-sized; if the right side
    * is also corpus-scale, salt the other way or pre-aggregate). The
    * left side — the one that matters — still moves exactly once.
    * Requires distinct column names across sides for `keys`. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFrom: Column, s: Int): DataFrame = {
    require(s >= 1 && s <= 64, s"salt fan-out s=$s out of range [1,64]")
    val l = left.withColumn("__salt",
      pmod(Sketches.hash60(saltFrom), lit(s.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until s).map(i => lit(i)): _*)))
    // pin a shuffle join: salting exists precisely for the case where
    // the right side can NOT broadcast — letting the optimizer broadcast
    // a test-scale right side would silently drop the salt from the
    // exchange keys and the operator would gate nothing
    l.join(r.hint("merge"), keys :+ "__salt").drop("__salt")
  }
}
