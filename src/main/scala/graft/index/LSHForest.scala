package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._

/** Random-hyperplane forest — the Spark re-expression of
  * `vers/src/indexes/lsh.rs` (Annoy-style data-dependent bisector trees,
  * not classic hash-table LSH; see SURVEY §2.5).
  *
  * Build (lsh.rs:58-161), level-synchronous instead of recursive:
  *  - exact-dup elimination first (lsh.rs:113-130) via keep-first on the
  *    vector value;
  *  - each tree is a column of bucket-path strings on the ONE corpus
  *    DataFrame — `numTrees` paths per row, corpus never duplicated;
  *  - per level: nodes still ≥ maxNodeSize sample 2 points
  *    (deterministically, by min xxhash64 — the reference's unseeded
  *    `thread_rng` sampling at lsh.rs:64 is a documented deviation, SURVEY
  *    §7 determinism note), plane = perpendicular bisector (normal = b−a
  *    through the midpoint, lsh.rs:72-80), rows split by the sign test
  *    `coeffs·p + const ≥ 0` (lsh.rs:27-29);
  *  - planes live driver-side (≤ corpus/maxNodeSize per tree — small);
  *    big state stays distributed. A node whose split leaves one side
  *    empty (degenerate plane) re-samples next level with a different
  *    salt; depth is capped.
  *
  * Search (lsh.rs:163-216, 264-282): descend each tree driver-side to the
  * query's leaf; the reference backtracks into siblings until n candidates
  * — we compute the equivalent closed-form: walk up from the leaf until
  * the subtree holds ≥ n rows, then take every leaf under that prefix.
  * Candidates = equi-join on exact leaf paths (partition-prunable), union
  * across trees, dedup, exact re-rank, top-k (lsh.rs:266-282).
  */
object LSHForest {

  case class Params(numTrees: Int = 4, maxNodeSize: Int = 64,
                    maxDepth: Int = 24, seed: Long = 42L)

  /** plane per inner node: path → (coeffs, constant); sizes per leaf. */
  case class Tree(planes: Map[String, (Array[Double], Double)],
                  leafSizes: Map[String, Long])

  case class Model(params: Params, trees: IndexedSeq[Tree],
                   indexed: DataFrame /* id, vector, path_0..path_{T-1} */) {

    /** Leaf path for one query in one tree (pure driver-side descent). */
    private def leafPath(t: Tree, q: Array[Float]): String = {
      var path = ""
      while (t.planes.contains(path)) {
        val (coeffs, const) = t.planes(path)
        // same fold shape as pointIsAbove: terms from 0.0, const last
        var s = 0.0; var i = 0
        while (i < coeffs.length) { s += coeffs(i) * q(i); i += 1 }
        s += const
        path += (if (s >= 0) "1" else "0")
      }
      path
    }

    /** Widen the leaf prefix until its subtree covers n rows
      * (the closed-form of the reference's sibling backtracking,
      * lsh.rs:196-213), then enumerate the exact leaves under it. */
    private def candidateLeaves(t: Tree, leaf: String, n: Long): Seq[String] = {
      var prefix = leaf
      def sizeUnder(p: String): Long =
        t.leafSizes.iterator.filter(_._1.startsWith(p)).map(_._2).sum
      while (prefix.nonEmpty && sizeUnder(prefix) < n) prefix = prefix.dropRight(1)
      t.leafSizes.keys.filter(_.startsWith(prefix)).toSeq
    }

    /** Batch top-k: per query per tree, probe leaves; union; dedup by id
      * (lsh.rs:266-272 DashSet union); exact re-rank; top-k. */
    def searchMany(queries: DataFrame, qIdCol: String, qVecCol: String,
                   k: Int): DataFrame = {
      val spark = queries.sparkSession
      import spark.implicits._
      val bcTrees = spark.sparkContext.broadcast(trees)
      val probes = queries
        .select(col(qIdCol).cast("long").as("qid"),
                col(qVecCol).cast("array<float>").as("qvec"))
        .as[(Long, Array[Float])]
        .flatMap { case (qid, qvec) =>
          bcTrees.value.iterator.zipWithIndex.flatMap { case (t, ti) =>
            candidateLeaves(t, leafPath(t, qvec), k.toLong)
              .map(p => (qid, qvec, ti, p))
          }
        }
        .toDF("qid", "qvec", "tree", "path")
      // per-tree equi-join on the exact leaf path, then union of candidates
      val perTree = (0 until params.numTrees).map { ti =>
        indexed.join(
            broadcast(probes.filter(col("tree") === ti).drop("tree")),
            col(s"path_$ti") === col("path"))
          .select(col("qid"), col("id"), col("vector"), col("qvec"))
      }
      val cands = perTree.reduce(_ unionByName _)
        .dropDuplicates("qid", "id")
        .select(col("qid"), col("id"),
          sqDist(col("vector"), col("qvec")).as("distance"))
      val w = Window.partitionBy("qid")
        .orderBy(col("distance").asc, col("id").asc)
      cands.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
    }

    /** Single-query search. */
    def search(query: Array[Float], k: Int): DataFrame = {
      val spark = indexed.sparkSession
      import spark.implicits._
      searchMany(Seq((0L, query)).toDF("qid", "qvec"), "qid", "qvec", k)
        .drop("qid")
    }

    /** Incremental add: descend existing planes for each new row (planes
      * frozen). Deviation from lsh.rs:218-251 (eager leaf re-split): leaves
      * may temporarily exceed maxNodeSize; rebuild compacts them — at
      * Spark scale a periodic rebuild job is the right maintenance shape. */
    def add(rows: DataFrame, idCol: String, vecCol: String): Model = {
      val spark = rows.sparkSession
      import spark.implicits._
      val bcTrees = spark.sparkContext.broadcast(trees)
      val T = params.numTrees
      val appended = rows
        .select(col(idCol).cast("long").as("id"),
                col(vecCol).cast("array<float>").as("vector"))
        .as[(Long, Array[Float])]
        .map { case (id, v) =>
          (id, v, bcTrees.value.map(t => leafPath(t, v)))
        }
        .toDF("id", "vector", "paths")
      val withCols = (0 until T).foldLeft(appended) { (df, ti) =>
        df.withColumn(s"path_$ti", col("paths").getItem(ti))
      }.drop("paths")
      val newSizes = withCols
        .select(array((0 until T).map(ti => col(s"path_$ti")): _*).as("ps"))
        .collect().flatMap(_.getAs[scala.collection.Seq[String]](0).zipWithIndex)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val newTrees = trees.zipWithIndex.map { case (t, ti) =>
        val bump = newSizes.collect { case ((p, i), n) if i == ti => p -> n }
        t.copy(leafSizes = t.leafSizes ++ bump.map { case (p, n) =>
          p -> (t.leafSizes.getOrElse(p, 0L) + n) })
      }
      copy(trees = newTrees, indexed = indexed.unionByName(withCols))
    }

    def save(dir: String): Unit = {
      val spark = indexed.sparkSession
      import spark.implicits._
      indexed.write.mode("overwrite").parquet(s"$dir/indexed")
      trees.zipWithIndex.flatMap { case (t, ti) =>
        t.planes.map { case (p, (c, k0)) => (ti, p, c, k0, -1L) } ++
          t.leafSizes.map { case (p, n) => (ti, p, Array.empty[Double], 0.0, n) }
      }.toDF("tree", "path", "coeffs", "const", "leaf_n")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/trees")
      ParamsIO.write(spark, dir,
        s"""{"numTrees":${params.numTrees},"maxNodeSize":${params.maxNodeSize},"maxDepth":${params.maxDepth},"seed":${params.seed}}""")
    }
  }

  /** Perpendicular-bisector plane through the midpoint of (a, b)
    * (lsh.rs:72-80): normal = b − a, constant = −normal·midpoint.
    * Double precision throughout, element order fixed → reproducible in
    * SQL for the oracle. */
  private[graft] def bisectorPlane(a: Array[Float], b: Array[Float]): (Array[Double], Double) = {
    val n = Array.tabulate(a.length)(i => b(i).toDouble - a(i).toDouble)
    var const = 0.0
    var i = 0
    while (i < n.length) { const -= n(i) * ((a(i).toDouble + b(i).toDouble) / 2.0); i += 1 }
    (n, const)
  }

  /** Sign test as a Column over broadcast-literal plane (lsh.rs:27-29).
    * Terms fold from 0.0 and the constant is added LAST — the exact shape
    * `list_reduce(...) + const` takes in the DuckDB oracle, so the score
    * is bit-identical across engines. */
  def pointIsAbove(vec: Column, coeffs: Array[Double], const: Double): Column = {
    val score = aggregate(
      zip_with(typedlit(coeffs), vec, (c, x) => c * x.cast("double")),
      lit(0.0d), (acc, x) => acc + x) + lit(const)
    score >= 0
  }

  def build(emb: DataFrame, idCol: String, vecCol: String,
            params: Params): Model = {
    val spark = emb.sparkSession
    val T = params.numTrees

    // exact-dup elimination, keep-first by id (lsh.rs:113-130)
    val wDup = Window.partitionBy(col("vector")).orderBy(col("id").asc)
    var df = emb
      .select(col(idCol).cast("long").as("id"),
              col(vecCol).cast("array<float>").as("vector"))
      .withColumn("_rn", row_number().over(wDup)).filter(col("_rn") === 1)
      .drop("_rn")
    df = (0 until T).foldLeft(df)((d, ti) => d.withColumn(s"path_$ti", lit("")))
      .cache()

    val planes = Array.fill(T)(scala.collection.mutable.Map.empty[String, (Array[Double], Double)])

    var level = 0
    var activeAny = true
    while (activeAny && level < params.maxDepth) {
      // nodes still too big, per tree — one aggregation over all trees
      val sizes: Map[(Int, String), Long] = (0 until T).flatMap { ti =>
        df.groupBy(col(s"path_$ti")).count().collect()
          .map(r => (ti, r.getString(0)) -> r.getLong(1))
      }.toMap
      val toSplit = sizes.filter { case ((_, _), n) => n > params.maxNodeSize }
      activeAny = toSplit.nonEmpty
      if (activeAny) {
        // deterministic 2-point sample per (tree, node): min-hash ranking
        val newPlanes: Map[(Int, String), (Array[Double], Double)] =
          (0 until T).flatMap { ti =>
            val nodes = toSplit.keys.collect { case (t, p) if t == ti => p }.toSeq
            if (nodes.isEmpty) Seq.empty
            else {
              val wS = Window.partitionBy(col(s"path_$ti"))
                .orderBy(xxhash64(col("id"), lit(params.seed + level * 131 + ti)))
              df.filter(col(s"path_$ti").isin(nodes: _*))
                .withColumn("_rk", row_number().over(wS))
                .filter(col("_rk") <= 2)
                .select(col(s"path_$ti").as("p"), col("_rk"), col("vector"))
                .collect()
                .groupBy(_.getString(0))
                .collect { case (p, rows) if rows.length == 2 =>
                  val sorted = rows.sortBy(_.getInt(1))
                  val a = sorted(0).getAs[scala.collection.Seq[Float]]("vector").toArray
                  val b = sorted(1).getAs[scala.collection.Seq[Float]]("vector").toArray
                  (ti, p) -> bisectorPlane(a, b)
                }
            }
          }.toMap
        // append the side bit to each split node's path, all trees one pass
        val prev = df
        df = (0 until T).foldLeft(df) { (d, ti) =>
          val treePlanes = newPlanes.collect { case ((t, p), pl) if t == ti => p -> pl }
          if (treePlanes.isEmpty) d
          else {
            val cases = treePlanes.foldLeft(when(lit(false), lit(""))) {
              case (acc, (p, (coeffs, const))) =>
                acc.when(col(s"path_$ti") === p,
                  concat(col(s"path_$ti"),
                    when(pointIsAbove(col("vector"), coeffs, const), lit("1"))
                      .otherwise(lit("0"))))
            }
            d.withColumn(s"path_$ti", coalesce(cases, col(s"path_$ti")))
          }
        }.cache()
        df.count() // materialize before releasing the previous level's cache
        prev.unpersist()
        // degenerate-split guard: a node that produced an empty side keeps
        // its (unchanged-size) child; re-sampling happens next level via
        // the level-salted hash. Record planes only for effective splits.
        newPlanes.foreach { case ((ti, p), pl) => planes(ti)(p) = pl }
      }
      level += 1
    }

    val finalDf = df
    val leafSizes: IndexedSeq[Map[String, Long]] = (0 until T).map { ti =>
      finalDf.groupBy(col(s"path_$ti")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // prune plane entries that never actually split (both-children-empty
    // impossible; one-empty yields a child == leaf path with same rows)
    val treesOut = (0 until T).map { ti =>
      Tree(planes(ti).toMap, leafSizes(ti))
    }
    Model(params, treesOut, finalDf)
  }

  def load(spark: SparkSession, dir: String): Model = {
    val json = ParamsIO.read(spark, dir)
    def num(key: String): Long = ParamsIO.num(json, key)
    val params = Params(num("numTrees").toInt, num("maxNodeSize").toInt,
      num("maxDepth").toInt, num("seed"))
    val rows = spark.read.parquet(s"$dir/trees").collect()
    val trees = (0 until params.numTrees).map { ti =>
      val mine = rows.filter(_.getInt(0) == ti)
      val planes = mine.filter(_.getLong(4) == -1L).map { r =>
        r.getString(1) -> (r.getAs[scala.collection.Seq[Double]](2).toArray, r.getDouble(3))
      }.toMap
      val leaves = mine.filter(_.getLong(4) >= 0L).map { r =>
        r.getString(1) -> r.getLong(4)
      }.toMap
      Tree(planes, leaves)
    }
    Model(params, trees, spark.read.parquet(s"$dir/indexed"))
  }
}
