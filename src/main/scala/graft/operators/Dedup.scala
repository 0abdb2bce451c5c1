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
  /** MinHash signature over a *pre-hashed* shingle array (`baseHashCol` =
    * one xxhash64 long per shingle): slot i = min over shingles of
    * xxhash64(i, h). Re-hashing the 8-byte base long per slot keeps all
    * arithmetic overflow-free under ANSI mode (no raw 64-bit multiply)
    * while paying only numHashes cheap long-hashes per shingle — the
    * expensive string hash happens once, in `baseHashCol`.
    */
  def minhashSignature(baseHashCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(baseHashCol, h => xxhash64(lit(i), h)))
    }: _*)

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
    val shingled = docs
      .select(col(idCol).as("id"), shingles(tokens(col(textCol)), shingleSize).as("sh"))
    val withSig = shingled
      .withColumn("hb", transform(col("sh"), s => xxhash64(s)))
      .withColumn("sig", minhashSignature(col("hb"), bands * rowsPerBand))
    // band key = hash of r consecutive signature slots. Only (id, band key)
    // enters the join — the shuffle payload is O(bands × ids), not
    // O(bands × corpus shingle bytes); shingles re-attach after the
    // candidate set is deduplicated to one row per pair.
    val banded = withSig.select(col("id"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band", "bkey")))
    val l = banded.alias("l")
    val r = banded.alias("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    attachShingles(candidates, shingled)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Re-attach each side's shingle set to an id-pair relation and compute
    * exact Jaccard — two equi joins shuffled by id, paid once per
    * *surviving* candidate pair.
    */
  private def attachShingles(pairs: DataFrame, shingled: DataFrame): DataFrame =
    pairs
      .join(shingled.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingled.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))

  /** Exact Jaccard over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  // ── n-gram Jaccard with size-ratio blocking ──────────────────────────
  /** All pairs with shingle-Jaccard >= `threshold`, exactly — without a
    * cross join. Blocking is lossless: j >= t implies the smaller shingle
    * set is >= t·|larger|, so sizes differ by factor <= 1/t and bucket
    * numbers floor(log_base |sh|) differ by at most 1 (base > 1/t).
    * Blocking is *symmetric* — BOTH sides expand into {bucket, bucket+1},
    * so a qualifying pair lands on a shared key whichever side has the
    * smaller id (same- and adjacent-bucket pairs always share a key;
    * one-sided expansion misses pairs whose lower-id doc sits in the
    * higher bucket).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      shingleSize: Int = 3): DataFrame = {
    val base = 1.0 / threshold + 0.05
    val shingled = docs.select(col(idCol).as("id"),
      shingles(tokens(col(textCol)), shingleSize).as("sh"))
    val expanded = shingled
      .withColumn("bucket",
        floor(log(base, greatest(size(col("sh")).cast(DoubleType), lit(1.0)))))
      .select(col("id"), explode(array(col("bucket"), col("bucket") + 1)).as("bkey"))
    val l = expanded.alias("l"); val r = expanded.alias("r")
    val candidates = l.join(r,
        col("l.bkey") === col("r.bkey") && col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    attachShingles(candidates, shingled)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
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

  /** Scale path for embedding near-dup: random-hyperplane LSH buckets
    * generate candidates (equi join, no cross product); the left side is
    * multi-probed to hamming distance 1, so any pair whose signatures
    * differ in ≤ 1 bit is considered; exact cosine verifies. Recall vs
    * [[embeddingCosinePairs]] is measured in DedupSpec.
    */
  def embeddingNearDupPairsLsh(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    graft.functions.VectorFunctions.register(embeddings.sparkSession)
    val sig = Similarity.signature(col("v"), dim, bits, seed)
    val base = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", sig)
    // One side expands into hamming-1 probes, the other keeps its single
    // bucket: a pair matches iff hamming ≤ 1, and at most once (probe
    // values are distinct) — no pair-dedup shuffle needed.
    val l = base.select(col("id").as("id_a"), col("v").as("v_a"),
      explode(Similarity.probes(col("bucket"), bits)).as("probe"))
    val r = base.select(col("id").as("id_b"), col("v").as("v_b"), col("bucket"))
    l.join(r, col("probe") === col("bucket") && col("id_a") < col("id_b"))
      .withColumn("cosine", graft.functions.VectorFunctions.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
