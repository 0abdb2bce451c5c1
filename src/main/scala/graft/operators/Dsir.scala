package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR (Xie et al. 2023, "Data Selection via Importance Resampling")
  * as reusable engine capabilities: hashed-bigram features, per-bucket
  * log-likelihood-ratio terms, per-doc weights, and the Gumbel-top-k
  * without-replacement resample. The registered queries
  * (`pipeline_dsir_weights` / `pipeline_dsir_resample`,
  * queries/PipelineQueries.scala) compose exactly these functions.
  *
  * HASH KERNELS — the replayability/throughput trade (r13 verdict item
  * 6): the bigram → bucket hash is the corpus-sized kernel of the whole
  * pipeline (every token position pays one hash), and the two modes are
  *  - [[HashKernel.Md5]]: `md5(bigram)` prefix → bucket. Engine-
  *    replayable — DuckDB computes the identical digest, which is what
  *    makes the registered queries exact-oracle-checkable. Cost: md5 is
  *    a cryptographic digest; SCALING.md measured the DSIR pair
  *    md5-kernel-BOUND at sf10 (369 s, ~6× over an xxhash64 run of the
  *    same plan).
  *  - [[HashKernel.Xx64]]: `xxhash64(bigram)` → bucket — Spark's
  *    codegen'd non-cryptographic hash, the kernel a production 100 TB
  *    run should use. Same plan, same schema, same per-doc feature
  *    COUNTS (bucketing changes which bucket a bigram lands in, never
  *    how many bigrams a doc has), deterministic across partitionings —
  *    but not replayable by an external SQL oracle, so the md5 form
  *    keeps the correctness gate and DsirSpec pins the xx64 twin's
  *    SHAPE equivalence instead (schema ≡, n_features ≡, repeated-run
  *    determinism, resample size ≡).
  */
object Dsir {

  /** Bigram → bucket hash kernel (see object scaladoc). */
  sealed trait HashKernel
  object HashKernel {
    /** Oracle-replayable md5-prefix bucketing (the registered form). */
    case object Md5 extends HashKernel
    /** Production xxhash64 bucketing (~6× on the corpus-sized kernel). */
    case object Xx64 extends HashKernel
  }

  private def bucket(bg: Column, buckets: Int, hash: HashKernel): Column =
    hash match {
      case HashKernel.Md5 =>
        pmod(conv(substring(md5(bg), 1, 4), 16, 10).cast("long"),
          lit(buckets.toLong))
      case HashKernel.Xx64 =>
        pmod(xxhash64(bg), lit(buckets.toLong))
    }

  /** The hashed-bigram feature table (doc_id, lang, h): one row per
    * token position — the ONE corpus-sized pass of the pipeline, a
    * narrow explode+hash map inside the scan. Callers that score the
    * whole corpus should checkpoint/persist the result once (the
    * resample query does; at 100 TB the persisted (doc, h) table is
    * ~3% of corpus bytes, the artifact an ingest pipeline keeps beside
    * the text).
    */
  def hashedBigramFeatures(
      docs: DataFrame, // (doc_id, lang, text)
      buckets: Int = 1024,
      hash: HashKernel = HashKernel.Md5): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    val bigrams = transform(
      sequence(lit(1), greatest(size(toks) - 1, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(2))))
    docs.select(col("doc_id"), col("lang"), explode(bigrams).as("bg"))
      .select(col("doc_id"), col("lang"),
        bucket(col("bg"), buckets, hash).as("h"))
  }

  /** Per-bucket importance terms in micro-nats: add-one-smoothed
    * ln(p_tgt(h)/p_raw(h)) over bag-of-hashed-bigram unigram models,
    * floor-quantized to BIGINT BEFORE the per-doc sum so the reduction
    * is order-free integer addition (ln/IEEE engine-parity is only
    * needed per-term). Target = the `lang == targetLang` slice, raw =
    * everything. One |buckets|-row aggregate + a 1-row totals broadcast.
    */
  def llrTerms(
      feats: DataFrame, // (doc_id, lang, h)
      buckets: Int = 1024,
      targetLang: String = "en"): DataFrame = {
    val counts = feats.groupBy(col("h")).agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("n_tgt"))
    val totals = counts.agg(sum(col("n_raw")).as("nr"),
      sum(col("n_tgt")).as("nt"))
    counts.crossJoin(broadcast(totals))
      .select(col("h"),
        floor(log(
          ((col("n_tgt") + 1L) * (col("nr") + buckets.toLong)).cast("double") /
            ((col("n_raw") + 1L) * (col("nt") + buckets.toLong)).cast("double"))
          * 1000000.0d).cast("long").as("term_micro"))
  }

  /** Per-doc summed LLR weight: (doc_id, lang, n_features,
    * dsir_micro_nats). The join is against the broadcast |buckets|-row
    * term table — map-side, no row-scaled recombine.
    */
  def docWeights(
      feats: DataFrame, // (doc_id, lang, h)
      terms: DataFrame): DataFrame = // (h, term_micro)
    feats.join(broadcast(terms), "h")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_features"),
        sum(col("term_micro")).as("dsir_micro_nats"))

  /** Gumbel-top-k without-replacement resample (Vieira 2014): the k
    * largest (score + Gumbel) keys are a sample w.p. ∝ exp(score), so
    * priorities stay in log space. The Gumbel is a pure function of
    * doc_id (md5-uniform u = (h₃₂+0.5)/2³², G = −ln(−ln u)) — seeded,
    * replayable, partitioning-proof. TakeOrdered bounded top-k — no
    * global sort. Returns (doc_id, lang).
    */
  def gumbelResample(
      scored: DataFrame, // (doc_id, lang, dsir_micro_nats)
      k: Int): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5d)) / lit(4294967296.0d)
    scored
      .select(col("doc_id"), col("lang"),
        (col("dsir_micro_nats").cast("double") / lit(1000000.0d)
          - log(-log(u))).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"))
  }
}
