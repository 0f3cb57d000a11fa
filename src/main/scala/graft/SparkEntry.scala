package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorOps._
import graft.operators.Exhaustive

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here has a DuckDB-equivalent in [[oracleSql]]; numeric
  * columns are computed in double precision with identical element order on
  * both engines (bit-identical results) or in DECIMAL (exact), so the
  * driver's hash compare is stable. Column aliases match exactly.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_exhaustive")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H-Q1-shaped pricing summary: grouped sums as DECIMAL (exact,
    // order-independent → hash-stable across engines).
    "q1_agg" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Exhaustive top-10 by squared L2 for 5 query vectors — the reference's
    // oracle (utils.rs:68-82) as a broadcast kNN join (SURVEY §2.7).
    "knn_exhaustive" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      Exhaustive.knnJoin(queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, metric = "sqdist")
        .orderBy(col("qid"), col("distance"), col("id"))
    }),

    // Same shape under cosine distance (1 − a·b on pre-normalized vectors,
    // the HNSW metric, base.rs:128-156).
    "knn_cosine" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      Exhaustive.knnJoin(queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, metric = "cosine")
        .orderBy(col("qid"), col("distance"), col("id"))
    }),

    // Exact dedup, keep-first (lsh.rs:113-130 semantics on text docs):
    // group-by full content, keep the smallest id.
    "dedup_exact" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    }),

    // Token counting over the documents table (whitespace tokenizer).
    "text_tokens" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
          col("n_chars"))
        .orderBy(col("doc_id"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        | sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "knn_exhaustive" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS id,
        |    list_reduce(list_transform(list_zip(c.embedding, q.embedding),
        |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
        |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
        |      (a, b) -> a + b) AS distance
        |  FROM embeddings c, embeddings q WHERE q.vec_id < 5)
        |SELECT qid, id, distance FROM scored
        |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY distance, id) <= 10
        |ORDER BY qid, distance, id""".stripMargin,

    "knn_cosine" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS id,
        |    1.0 - list_reduce(list_transform(list_zip(c.embedding, q.embedding),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
        |      (a, b) -> a + b) AS distance
        |  FROM embeddings c, embeddings q WHERE q.vec_id < 5)
        |SELECT qid, id, distance FROM scored
        |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY distance, id) <= 10
        |ORDER BY qid, distance, id""".stripMargin,

    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id, len(string_split_regex(text, '\s+')) AS n_tokens, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
