package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings.embedding: array<float>`, TESTDATA.md) — the similarity-
  * search leg of the BASELINE.json north star.
  *
  * Two paths:
  *  - [[bruteTopK]]: exact baseline — broadcast the (small) query set
  *    against every vector; one narrow pass + a per-query top-k window.
  *    Scales linearly in corpus size: the right answer when queries ≪ corpus.
  *  - [[ivfTopK]]: IVF-style bucketed ANN — assign vectors to their nearest
  *    centroid once (narrow, broadcast centroids), then probe only the
  *    `nprobe` closest centroid buckets per query. At 100 TB the probe
  *    touches `nprobe/nlist` of the corpus; the cluster assignment is a
  *    one-off materialization, exactly how a production vector pipeline
  *    would pre-partition parquet by cluster id for partition pruning.
  */
object Similarity {

  /** Exact cosine top-k for each query vector (`vec_id < nQueries`),
    * self-match excluded. Deterministic: ranked on (rounded cosine desc,
    * neighbor id). */
  def bruteTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = embeddings
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(VectorOps.cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("q_id", "rk")
  }

  /** Cluster assignment: nearest (by cosine) of the `nlist` centroids.
    * Centroids here are the deterministic seed vectors `vec_id < nlist`
    * (a k-means refinement would slot in identically). */
  def assignClusters(embeddings: DataFrame, nlist: Int): DataFrame = {
    val centroids = embeddings.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy("vec_id").orderBy(desc("c_cos"), asc("c_id"))
    embeddings.join(broadcast(centroids))
      .withColumn("c_cos", VectorOps.cosine(col("c_emb"), col("embedding")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id"))
  }

  /** IVF ANN: probe the `nprobe` nearest centroid buckets per query, exact
    * cosine inside the probed buckets only. Returns the same shape as
    * [[bruteTopK]] (rows-only harness check; recall vs. brute is pinned in
    * SimilaritySpec). */
  def ivfTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val assigned = assignClusters(embeddings, nlist)
    val centroids = embeddings.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // per query: the nprobe closest centroids
    val wq = Window.partitionBy("q_id").orderBy(desc("qc_cos"), asc("c_id"))
    val probed = queries.join(broadcast(centroids))
      .withColumn("qc_cos", VectorOps.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nprobe)
      .select("q_id", "q_emb", "c_id")
    // candidates = vectors in probed buckets (join keyed on cluster id)
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))
    probed.join(assigned, Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(VectorOps.cosine(col("q_emb"), col("embedding")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("q_id", "rk")
  }
}
