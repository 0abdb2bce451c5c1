package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deduplication operators for LLM training-data pipelines (north-star):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale posture: every variant is shuffle-bounded — exact dedup is one
  * hash aggregate on a fingerprint; MinHash/SimHash generate candidates
  * by *banding* (equality join on band keys — no O(n²) pair scan) and only
  * verified candidates pay the exact-similarity cost; the naive pairwise
  * variants use size-ratio blocking so the join is equi, not cross.
  */
object Dedup {

  /** Exact dedup on normalized-text fingerprint: one hash aggregate.
    * Returns (fingerprint, n_copies, canonical_id) per duplicate group.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("canonical_id"))

  // ── MinHash + LSH ─────────────────────────────────────────────────────
  /** MinHash signature: one base xxhash64 per shingle, then `numHashes`
    * cheap bijective remixes (odd-multiplier affine maps over Z/2^64) with
    * a min-reduce each — avoids numHashes string hashes per shingle.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column = {
    val base = transform(shingleCol, s => xxhash64(s))
    array((0 until numHashes).map { i =>
      val a = 2L * (0x9E3779B97F4A7C15L * (i + 1) | 1L) + 1L // odd multiplier
      val b = 0xC2B2AE3D27D4EB4FL * i
      array_min(transform(base, h => h * lit(a) + lit(b)))
    }: _*)
  }

  /** Candidate pairs whose banded minhash signatures collide, verified
    * with exact shingle-set Jaccard >= `threshold`.
    *
    * Parameters (bands b, rows r) are chosen so that at `threshold` the
    * detection probability 1-(1-t^r)^b is ~1: default r=4, b=16 gives
    * P(miss at j=0.88) ≈ 4e-7 and candidate FP rate (0.07^4)·16 ≈ 4e-4.
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val withSig = docs
      .select(col(idCol).as("id"), shingles(tokens(col(textCol)), shingleSize).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), bands * rowsPerBand))
    // band key = hash of r consecutive signature slots
    val banded = withSig.select(col("id"), col("sh"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band", "bkey")))
    val l = banded.alias("l")
    val r = banded.alias("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"),
        col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact Jaccard over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  // ── n-gram Jaccard with size-ratio blocking ──────────────────────────
  /** All pairs with shingle-Jaccard >= `threshold`, exactly — without a
    * cross join. Blocking is lossless: j >= t implies the smaller shingle
    * set is >= t·|larger|, so sizes differ by factor <= 1/t; docs are
    * bucketed by floor(log_base |sh|) with each doc emitted into its own
    * and the next bucket, and base chosen so ratio-1/t pairs share a key.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleSize: Int = 3): DataFrame = {
    val base = 1.0 / threshold + 0.05
    val withSh = docs.select(col(idCol).as("id"),
      shingles(tokens(col(textCol)), shingleSize).as("sh"))
      .withColumn("bucket",
        floor(log(base, greatest(size(col("sh")).cast(DoubleType), lit(1.0)))))
    val expanded = withSh.select(col("id"), col("sh"),
      explode(array(col("bucket"), col("bucket") + 1)).as("bkey"))
    val l = expanded.alias("l"); val r = withSh.alias("r")
    l.join(r, col("l.bkey") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"),
        jaccard(col("l.sh"), col("r.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicates("doc_a", "doc_b")
  }

  // ── SimHash ───────────────────────────────────────────────────────────
  /** Near-dup pairs by SimHash hamming distance <= maxDistance, candidates
    * from 16-bit band collisions (4 bands over the 64-bit hash: any pair
    * within hamming distance 3 shares at least one intact band).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3): DataFrame = {
    require(maxDistance <= 3, "4-band LSH only guarantees recall for distance <= 3")
    graft.functions.TextHashFunctions.register(docs.sparkSession)
    val withHash = docs.select(col(idCol).as("id"),
      graft.functions.TextHashFunctions.simhash64(tokens(col(textCol))).as("h"))
    val banded = withHash.select(col("id"), col("h"),
      posexplode(array((0 until 4).map { b =>
        shiftrightunsigned(col("h"), b * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("band", "bkey")))
    val l = banded.alias("l"); val r = banded.alias("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"),
        bit_count(col("l.h").bitwiseXOR(col("r.h"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxDistance)
  }

  // ── embedding cosine near-dup ─────────────────────────────────────────
  /** Pairs with cosine >= threshold. Brute-force baseline: an equi-less
    * self join restricted by id ordering — quadratic, correct, the
    * reference point for the LSH path in [[Similarity]].
    */
  def embeddingCosinePairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    graft.functions.VectorFunctions.register(embeddings.sparkSession)
    val l = embeddings.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val r = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("cosine", graft.functions.VectorFunctions.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
