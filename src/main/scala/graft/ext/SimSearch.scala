package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §7.6).
  *
  * Baseline: brute-force cosine top-k — the small query set is broadcast, so
  * the corpus streams through one scan with no shuffle until the final
  * per-query top-k (a `TakeOrderedAndProject`-style window over k rows).
  *
  * Scale path: LSH-bucketed search (random hyperplane signs) — each vector
  * maps to a bucket id; candidates are joined within buckets only, cutting
  * the pair space from |corpus|×|queries| to per-bucket volumes. An IVF
  * (k-means coarse quantizer) drops in the same way once centroids exist.
  */
object SimSearch {

  /** dot(a, b) computed in double; float inputs widen exactly. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force top-k neighbors for each query vector. `queries` should be
    * small (it is broadcast); `corpus` can be arbitrarily large. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val sims = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim_r6"))
  }

  /** Embedding-cosine near-duplicate pairs: every (a < b) pair above the
    * similarity threshold. Brute force — O(n²) pairs — which is the exact
    * baseline; at corpus scale the same thresholding runs over [[lshTopK]]
    * buckets instead so the pair space stays per-bucket. */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot(v, h_i) packed into a
    * long. Hyperplanes are derived deterministically from xxhash64 so driver
    * and executors agree without shipping state. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    // h_p[d] = ±1 from a hash of (plane, dim) — a cheap deterministic
    // Rademacher hyperplane; adequate for bucketing, no RNG state needed.
    // Planes unroll at plan-build time so the bit-pack can use literal shifts.
    (0 until nPlanes).map { p =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, d) => x.cast("double") *
            when(xxhash64(lit(p), d).bitwiseAND(1) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucketed ANN: exact cosine, but only within matching LSH buckets.
    * Recall < 1 by construction; multiply probes by also checking buckets at
    * hamming distance 1 (`probeNeighbors = true`). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 6, dim: Int = 64,
              probeNeighbors: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      lshBucket(col(vecCol), nPlanes, dim).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), nPlanes, dim).as("bucket0"))
    val probes =
      if (!probeNeighbors) qBase.select(col("query_id"), col("q_vec"), col("bucket0").as("bucket"))
      else qBase.select(col("query_id"), col("q_vec"),
        explode(array_union(array(col("bucket0")),
          array((0 until nPlanes).map(p =>
            col("bucket0").bitwiseXOR(lit(1L << p))): _*))).as("bucket"))
    val sims = c.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("sim"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("sim")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
