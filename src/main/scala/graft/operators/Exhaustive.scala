package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._

/** Brute-force exact top-k nearest-neighbour search — the reference's
  * oracle (`vers/src/utils.rs:68-82`: sqdist to every vector, sort, take k)
  * re-expressed as declarative plans.
  *
  * Two shapes:
  *  - [[topK]]: one query vector (a driver-side literal) against the corpus →
  *    `orderBy(dist).limit(k)`, which Catalyst executes as
  *    `TakeOrderedAndProject` — a per-partition bounded heap + driver merge,
  *    no full sort, no shuffle of the corpus. This is exactly the
  *    reference's bounded-heap top-k, distributed.
  *  - [[knnJoin]]: a query *table* against the corpus — broadcast the small
  *    query side (never shuffle the 100 TB corpus), nested-loop join, then
  *    per-query `row_number ≤ k` window. The window shuffles only
  *    (queries × k-ish candidates), not the corpus.
  *
  * At 100 TB the corpus side stays where it is: both shapes scan it once,
  * fully parallel, with column pruning (only id + vector read).
  */
object Exhaustive {

  /** Distance selector: squared L2 (IVFFlat/LSH metric) or cosine distance
    * on pre-normalized vectors (HNSW metric). */
  def distance(metric: String)(a: Column, b: Column): Column = metric match {
    case "sqdist" => sqDist(a, b)
    case "cosine" => cosineDistance(a, b)
    case other    => throw new IllegalArgumentException(s"unknown metric $other")
  }

  /** Exact top-k for a single query vector given as a literal column
    * (e.g. `typedLit(vec)`). Result: (idCol, distance) ascending. */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
           query: Column, k: Int, metric: String = "sqdist"): DataFrame =
    corpus
      .select(col(idCol), distance(metric)(col(vecCol), query).as("distance"))
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)

  /** Bounded top-k with dedup-by-id over (id, distance) candidates —
    * the executor-local merge kernel shared by the index searches
    * (LSH forest union, lsh.rs:266-282). Keeps the k smallest by
    * (distance, id); duplicate ids (same candidate reached via several
    * trees/shards, bit-identical distance) are dropped via heap
    * membership — O(k) per candidate, no unbounded seen-set. Output
    * ascending by (distance, id). */
  def topKDedup(it: Iterator[(Long, Double)], k: Int): Iterator[(Long, Double)] = {
    // max-heap on (distance, id): root = current worst of the kept k
    val ord = Ordering.by[(Long, Double), (Double, Long)](t => (t._2, t._1))
    val heap = new scala.collection.mutable.PriorityQueue[(Long, Double)]()(ord)
    it.foreach { case cand @ (id, d) =>
      if (heap.size < k) {
        if (!heap.exists(_._1 == id)) heap.enqueue(cand)
      } else {
        val (wid, wd) = heap.head
        if (d < wd || (d == wd && id < wid)) {
          if (!heap.exists(_._1 == id)) { heap.dequeue(); heap.enqueue(cand) }
        }
      }
    }
    heap.dequeueAll.reverseIterator
  }

  /** Batch exact kNN: every row of `queries` against every row of `corpus`,
    * keep the k nearest per query. Ties broken by id so results are
    * deterministic. The query side is broadcast — REQUIRED at scale: the
    * corpus must not move. */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
              corpus: DataFrame, cIdCol: String, cVecCol: String,
              k: Int, metric: String = "sqdist"): DataFrame = {
    val q = broadcast(queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qvec")))
    val c = corpus.select(col(cIdCol).as("id"), col(cVecCol).as("cvec"))
    val scored = c.join(q)
      .select(col("qid"), col("id"),
        distance(metric)(col("cvec"), col("qvec")).as("distance"))
    val w = Window.partitionBy("qid")
      .orderBy(col("distance").asc, col("id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }
}
