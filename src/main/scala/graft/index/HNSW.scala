package graft.index

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.normalizeF

/** Sharded HNSW as a Spark operator (SURVEY §2.6, §7 "hard parts").
  *
  * The reference builds ONE graph with strictly sequential inserts
  * (hnsw.rs:472-475) — inherently single-machine. The Spark-native design
  * that survives 100 TB is sharding: partition the corpus into P shards,
  * build an independent [[HNSWGraph]] per shard inside `mapPartitions`
  * (executor-local, all shards in parallel, zero driver state), and keep
  * the serialized subgraphs distributed as a Dataset of blobs. A query
  * fans out to every shard (queries are the SMALL side — broadcast),
  * beam-searches each subgraph locally, and the per-shard top-k unions
  * into a global top-k (same union-then-rerank shape as the reference's
  * multi-tree LSH search, lsh.rs:264-282). Recall matches a monolithic
  * graph searching with the same total ef because every shard is probed.
  *
  * Vectors are L2-normalized at ingest (the index's contract — the
  * reference's callers normalize on load, utils.rs:48,136), making
  * cosine distance = 1 − dot inside the graph valid.
  */
object HNSW {

  case class ShardBlob(shard: Int, blob: Array[Byte])

  case class Model(params: HNSWGraph.Params, numShards: Int,
                   shards: Dataset[ShardBlob]) {

    /** Batch top-k: broadcast queries, search every shard locally,
      * global per-query top-k merge.
      *
      * Scale envelope: the query batch is collected and broadcast —
      * driver + executor memory is O(nQueries × dim × 4B), i.e. ~0.5 GB
      * per million 128f queries. That is the right trade as long as the
      * query side is the SMALL side (the serving contract); for a
      * corpus-sized "query" set (join-all-against-all), don't use an
      * ANN serving index — use the bucketed dedup path
      * (Dedup.embeddingPairsViaLSH), which never materializes a side. */
    def searchMany(queries: DataFrame, qIdCol: String, qVecCol: String,
                   k: Int): DataFrame = {
      val spark = queries.sparkSession
      import spark.implicits._
      val qRows = queries
        .select(col(qIdCol).cast("long"),
          normalizeF(col(qVecCol).cast("array<float>")))
        .as[(Long, Array[Float])].collect()
      val bcQ = spark.sparkContext.broadcast(qRows)
      // per-shard k results shuffle as (qid, id, distance) triples; the
      // global per-query merge is one bounded-heap pass (shards partition
      // the corpus, so ids are distinct across shards)
      shards.flatMap { s =>
        val g = deserialize(s.blob)
        bcQ.value.iterator.flatMap { case (qid, qv) =>
          g.searchKnn(qv, k).map { case (id, d) => (qid, id, d) }
        }
      }
        .groupByKey(_._1)
        .flatMapGroups { (qid, it) =>
          graft.operators.Exhaustive.topKDedup(it.map(t => (t._2, t._3)), k)
            .map { case (id, d) => (qid, id, d) }
        }
        .toDF("qid", "id", "distance")
    }

    def search(query: Array[Float], k: Int): DataFrame = {
      val spark = shards.sparkSession
      import spark.implicits._
      searchMany(Seq((0L, query)).toDF("qid", "qvec"), "qid", "qvec", k)
        .drop("qid")
    }

    /** Incremental add: route each new row to a shard (hash by id),
      * deserialize, insert (preserving per-shard sequential semantics),
      * re-serialize. Only touched shards rebuild their blob.
      *
      * Scale envelope: the add batch is collected and broadcast (same
      * O(batch × dim × 4B) driver budget as [[searchMany]]) — sized for
      * streaming micro-batches (Streaming.ingestIntoIVF-style), not bulk
      * loads. For a corpus-sized ingest, rebuild with [[HNSW.build]],
      * which routes rows to shards via a repartition, never the driver. */
    def add(rows: DataFrame, idCol: String, vecCol: String): Model = {
      val spark = rows.sparkSession
      import spark.implicits._
      val P = numShards
      val newRows = rows
        .select(col(idCol).cast("long"),
          normalizeF(col(vecCol).cast("array<float>")))
        .as[(Long, Array[Float])].collect()
        .groupBy { case (id, _) => math.floorMod(id, P.toLong).toInt }
      val bcNew = spark.sparkContext.broadcast(newRows)
      val updated = shards.map { s =>
        bcNew.value.get(s.shard) match {
          case None => s
          case Some(add) =>
            val g = deserialize(s.blob)
            add.foreach { case (id, v) => g.insert(id, v) }
            ShardBlob(s.shard, serialize(g))
        }
      }
      copy(shards = updated.cache())
    }

    def save(dir: String): Unit = {
      val spark = shards.sparkSession
      import spark.implicits._
      shards.toDF("shard", "blob").write.mode("overwrite").parquet(s"$dir/shards")
      val p = params
      ParamsIO.write(spark, dir,
        s"""{"numLayers":${p.numLayers},"efConstruction":${p.efConstruction},"efSearch":${p.efSearch},"m":${p.m},"seed":${p.seed},"numShards":$numShards}""")
    }
  }

  private[index] def serialize(g: HNSWGraph): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(g); oos.close()
    bos.toByteArray
  }

  private[index] def deserialize(b: Array[Byte]): HNSWGraph =
    new ObjectInputStream(new ByteArrayInputStream(b))
      .readObject().asInstanceOf[HNSWGraph]

  /** Build P independent shard graphs in parallel. Rows are routed to
    * shards by `hash(id) % P` (stable under reordering) and inserted in
    * ascending-id order within a shard → fully deterministic. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            params: HNSWGraph.Params, numShards: Int = 0): Model = {
    val spark = emb.sparkSession
    import spark.implicits._
    val P = if (numShards > 0) numShards
            else spark.sparkContext.defaultParallelism
    val rows = emb.select(
        col(idCol).cast("long").as("id"),
        normalizeF(col(vecCol).cast("array<float>")).as("vector"))
      .withColumn("shard", pmod(col("id"), lit(P)).cast("int"))
      .repartition(P, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Array[Float], Int)]
    val built = rows.mapPartitions { it =>
      // a shard is a deliberately RAM-sized graph (the unit a single
      // executor core can beam-search), so materializing the partition's
      // rows to group them by shard is within the executor's budget
      it.toSeq.groupBy(_._3).iterator.map { case (shard, grp) =>
        val g = HNSWGraph.build(params,
          grp.iterator.map { case (id, v, _) => (id, v) })
        ShardBlob(shard, serialize(g))
      }
    }.cache()
    // every residue class 0..P-1 must own a blob, or Model.add would
    // silently drop rows routed to an absent shard (empty corpus slices
    // are legal). ONE job materializes the graphs and reports which
    // shards exist (no separate distinct() + count() passes); gaps get
    // empty graphs.
    val present = built.map(_.shard).collect().toSet
    val gaps = (0 until P).filterNot(present)
      .map(sh => ShardBlob(sh, serialize(new HNSWGraph(params))))
    val shards =
      if (gaps.isEmpty) built
      else built.unionByName(spark.createDataset(gaps))
    Model(params, P, shards)
  }

  def load(spark: SparkSession, dir: String): Model = {
    import spark.implicits._
    val json = ParamsIO.read(spark, dir)
    def num(key: String): Long = ParamsIO.num(json, key)
    val params = HNSWGraph.Params(num("numLayers").toInt,
      num("efConstruction").toInt, num("efSearch").toInt,
      num("m").toInt, num("seed"))
    val shards = spark.read.parquet(s"$dir/shards")
      .select(col("shard").cast("int"), col("blob")).as[ShardBlob]
    Model(params, num("numShards").toInt, shards.cache())
  }
}
