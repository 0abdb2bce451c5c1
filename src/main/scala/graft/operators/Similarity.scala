package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star similarity-search operators).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set,
  *    score every candidate with the codegen'd [[graft.functions.CosineSimilarity]]
  *    expression (one scan over candidates), rank per query.
  *  - [[lshTopK]]: scale path — random-hyperplane signatures bucket both
  *    sides; only same-bucket pairs are scored, turning the cross product
  *    into an equi join. Multi-probe (emitting each vector into every
  *    bucket within hamming distance 1 of its signature) trades compute
  *    for recall without re-shuffling.
  */
object Similarity {

  /** Exact top-k neighbors per query vector. Queries must be small enough
    * to broadcast (the driver enforces nothing — at 100 TB you batch the
    * query set). Ties break on neighbor id.
    */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      k: Int): DataFrame = {
    VectorFunctions.register(candidates.sparkSession)
    val pairs = candidates.join(broadcast(queries), col("qid") =!= col("cid"))
      .withColumn("sim", VectorFunctions.cosineSim(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"), col("sim"))
  }

  /** Deterministic pseudo-random ±1 hyperplane component for (seed, bit, dim):
    * parity of a xxhash-style avalanche over the packed indices.
    */
  private def planeSign(seed: Long, bit: Int, d: Int): Double = {
    var h = seed ^ (bit.toLong * 0x9E3779B97F4A7C15L) ^ (d.toLong * 0xC2B2AE3D27D4EB4FL)
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    if ((h & 1L) == 1L) 1.0 else -1.0
  }

  /** Random-hyperplane signature as an Int column built from codegen'd
    * builtins: bit j = [dot(v, plane_j) >= 0], planes are ±1 vectors from
    * [[planeSign]]. `aggregate` keeps the dot inside codegen.
    */
  def signature(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val bitCols = (0 until bits).map { j =>
      val dot = aggregate(
        zip_with(vec, typedLit((0 until dim).map(d => planeSign(seed, j, d))),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, 1 << j).otherwise(0)
    }
    bitCols.reduce(_ + _)
  }

  /** ANN top-k: score only same-signature-bucket pairs. Recall is tuned by
    * `bits` (fewer bits → bigger buckets → higher recall, more compute).
    */
  def lshTopK(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (cid, cvec)
      k: Int,
      dim: Int,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    VectorFunctions.register(candidates.sparkSession)
    val q = queries.withColumn("bucket", signature(col("qvec"), dim, bits, seed))
    val c = candidates.withColumn("bucket", signature(col("cvec"), dim, bits, seed))
    val scored = c.alias("c").join(broadcast(q.alias("q")),
        col("q.bucket") === col("c.bucket") && col("qid") =!= col("cid"))
      .withColumn("sim", VectorFunctions.cosineSim(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"), col("sim"))
  }
}
