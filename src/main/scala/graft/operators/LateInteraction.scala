package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.dot

/** Late-interaction (multi-vector) retrieval — ColBERT-style MaxSim
  * (Khattab & Zaharia 2020, public): each query and document is a BAG
  * of token embeddings, and
  *
  *   score(q, d) = Σ over q-tokens of ( max over d-tokens of ⟨qtok, dtok⟩ )
  *
  * — every query token independently finds its best-matching document
  * token, so exact-term, paraphrase and partial matches all contribute
  * without a single pooled vector washing them out. Completes the
  * engine's retrieval matrix (lexical BM25 / dense kNN / hybrid RRF /
  * phrase / late-interaction) beyond the reference's single-vector
  * surface (vers serves one embedding per item, base.rs:27-58).
  *
  * Precision contract: per-pair dots run the fused codegen kernel in
  * double and are quantized to 1e-6 BIGINTs BEFORE max/sum — floor is
  * monotone, so max commutes with the quantization, and the integer
  * max-then-sum is order-free (the BM25 score_q discipline). With
  * integer-valued token embeddings ([[tokenVectors]]) every step is
  * exact, which is what makes maxsim_exact a full DuckDB replay.
  *
  * Scale shapes:
  *  - [[maxSim]] (exhaustive, the oracle face): q-token frame is
  *    broadcast (serving-sized — queries × ≤32 tokens), the d-token
  *    corpus is scanned ONCE in place; the pair volume collapses
  *    map-side through a partial max into (docs × q-tokens) rows, and
  *    the rank-k cut is a WindowGroupLimit. The corpus never shuffles.
  *  - [[maxSimShortlisted]] (the serving face): per-q-token top-`m`
  *    d-tokens (TopKAggExpr partial heaps — the knnJoin kernel) yield
  *    a candidate doc set of ≤ queries × tokens × m, and only those
  *    docs are scored exactly — the pair volume drops from
  *    |corpus-tokens| × |q-tokens| to |candidate-tokens| × |q-tokens|
  *    (the BQ broadcast-shortlist re-rank shape). m ≥ corpus token
  *    count reproduces [[maxSim]] exactly (spec gate).
  */
object LateInteraction {

  /** Integer token-embedding frame (doc_id, tok_idx, vec ARRAY<DOUBLE>
    * with integer values): each token embeds as the hashing-trick fold
    * of its character trigrams plus the whole term ([[TextOps
    * .hashEmbedding]] — model-free, engine-portable md5 hashing), so
    * morphologically close tokens share trigram coordinates and dot
    * products are EXACT integers. The production path swaps this for
    * real model token embeddings (same frame shape); this constructor
    * is what makes the whole MaxSim pipeline oracle-replayable with no
    * model in the loop. */
  def tokenVectors(docs: DataFrame, idCol: String, textCol: String,
                   dim: Int = 16): DataFrame = {
    val term = col("term")
    // char trigrams; terms shorter than 3 chars contribute just the
    // whole-term gram (sequence() would descend for stop < start)
    val tris = when(length(term) >= 3,
        transform(sequence(lit(1), length(term) - 2),
          i => term.substr(i, lit(3))))
      .otherwise(array())
    val grams = concat(array(term), tris)
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("tok_idx", "term")))
      .select(col("doc_id"), col("tok_idx").cast("long").as("tok_idx"),
        TextOps.hashEmbedding(grams, dim).cast("array<double>").as("vec"))
  }

  /** Persist a token-embedding frame — the multi-vector tier's index
    * artifact (ColBERT persists exactly this: one embedding row per
    * document token). The frame is written canonical (doc_id, tok_idx,
    * vec) so [[loadTokens]] serves either face with zero recompute —
    * embedding the corpus (a model forward pass in production, the
    * hashing trick here) happens ONCE at build, never at serve; this is
    * the same serve-from-the-persisted-index contract the BM25 and
    * vector tiers gate (reference anchor: base.rs:31-58). Lifecycle
    * extensions compose on the frame itself: add = unionByName of a
    * disjoint-doc_id token frame, remove = broadcast anti-join on
    * doc_id — both then re-[[saveTokens]]. */
  def saveTokens(toks: DataFrame, dir: String): Unit =
    toks.select(col("doc_id").cast("long"), col("tok_idx").cast("long"),
        col("vec").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$dir/tokens")

  /** Reload a saved token frame (columns doc_id, tok_idx, vec). */
  def loadTokens(spark: org.apache.spark.sql.SparkSession,
                 dir: String): DataFrame =
    spark.read.parquet(s"$dir/tokens")

  /** Quantized per-pair similarity: floor(⟨a,b⟩ · 1e6 + 0.5) as BIGINT. */
  private def simQ(a: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column) =
    floor(dot(a, b) * lit(1000000.0d) + lit(0.5d)).cast("long")

  /** The max-then-sum reduction over a scored (qid, doc_id, qtok, s_q)
    * pair frame, ranked top-`k` per query. Shared by both faces. */
  private def reduceAndRank(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_q").desc, col("doc_id").asc)
    pairs
      .groupBy(col("qid"), col("doc_id"), col("qtok"))
      .agg(max(col("s_q")).as("m_q"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("m_q")).as("score_q"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("score_q"), col("rank"))
  }

  /** Exhaustive MaxSim top-`k`: every query token against every corpus
    * token. Output (qid, doc_id, score_q, rank), rank 1 = best, ties
    * by doc_id ascending. Token frames carry (id, tok_idx, vec); a
    * repeated query token contributes once PER OCCURRENCE (each
    * tok_idx carries its own max — the paper's Σ runs over token
    * positions). The oracle face — [[maxSimShortlisted]] serves. */
  def maxSim(qToks: DataFrame, qIdCol: String, qTokIdxCol: String,
             qVecCol: String,
             dToks: DataFrame, dIdCol: String, dVecCol: String,
             k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val q = broadcast(qToks.select(col(qIdCol).cast("long").as("qid"),
      col(qTokIdxCol).cast("long").as("qtok"),
      col(qVecCol).cast("array<double>").as("qvec")))
    val d = dToks.select(col(dIdCol).cast("long").as("doc_id"),
      col(dVecCol).cast("array<double>").as("dvec"))
    reduceAndRank(
      d.join(q).select(col("qid"), col("doc_id"), col("qtok"),
        simQ(col("dvec"), col("qvec")).as("s_q")), k)
  }

  /** Shortlisted MaxSim: stage 1 keeps each query token's top-`m`
    * corpus tokens by dot (TopKAggExpr partial heaps — only
    * (q-tokens × m) ids cross the shuffle), the union of their doc
    * ids per query is the candidate set; stage 2 scores ONLY candidate
    * docs exactly (broadcast candidate+query side, corpus-token scan
    * pruned at the join). Approximate exactly like every shortlist
    * tier: a doc outside all per-token top-m lists is unseen; `m` is
    * the recall lever, and m ≥ the corpus token count reproduces
    * [[maxSim]] bit-for-bit. */
  def maxSimShortlisted(qToks: DataFrame, qIdCol: String, qTokIdxCol: String,
                        qVecCol: String,
                        dToks: DataFrame, dIdCol: String, dVecCol: String,
                        k: Int, m: Int): DataFrame = {
    require(k >= 1 && m >= 1, s"k=$k m=$m must be >= 1")
    val q = broadcast(qToks.select(col(qIdCol).cast("long").as("qid"),
      col(qTokIdxCol).cast("long").as("qtok"),
      col(qVecCol).cast("array<double>").as("qvec")))
    val d = dToks.select(col(dIdCol).cast("long").as("doc_id"),
      col(dVecCol).cast("array<double>").as("dvec"))
    // per-(qid, qtok) top-m doc tokens by LARGEST dot = smallest −dot
    // (the MIPS reduction); duplicate doc_ids inside one heap are fine
    // — the shortlist is only a candidate-doc generator
    val cand = d.join(q)
      .select(col("qid"), col("qtok"),
        (lit(0.0d) - dot(col("dvec"), col("qvec"))).as("negdot"),
        col("doc_id"))
      .groupBy(col("qid"), col("qtok"))
      .agg(graft.functions.TopK.topK(col("negdot"), col("doc_id"), m).as("nn"))
      .select(col("qid"), explode(col("nn.id")).as("doc_id"))
      .distinct()
    val probe = broadcast(cand.join(q, Seq("qid")))
    reduceAndRank(
      d.join(probe, Seq("doc_id")).select(col("qid"), col("doc_id"),
        col("qtok"), simQ(col("dvec"), col("qvec")).as("s_q")), k)
  }
}
