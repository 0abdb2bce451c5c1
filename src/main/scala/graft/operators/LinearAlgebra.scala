package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact fixed-point linear algebra over embedding corpora — the PCA /
  * common-direction toolkit (whitening, Mu & Viswanath'18
  * "all-but-the-top" postprocessing). Everything after the one-time
  * q = floor(x·2^20) quantization is BIGINT arithmetic with truncating
  * power-of-two rescales, so every aggregate is order-independent —
  * partitioning-proof and bit-identical across engines, where
  * double-precision iterations could never hash-match (rationale and the
  * DIV/`//` truncation-parity check in the embed_pca_power QueryDef).
  */
object LinearAlgebra {

  /** (vec_id, d ∈ 1..64, q = floor(x_d·2^20)) with the in-plan
    * overflow-envelope guard: the rescale tiers in
    * [[pcaPowerDirection]]/[[abttResidualStats]] bound intermediates for
    * corpora ≤ 1e5 vectors; beyond that the job fails loudly
    * (raise_error) instead of silently overflowing — larger corpora
    * re-tier the shifts or block-aggregate, same algorithm shape.
    */
  def quantized(emb: DataFrame): DataFrame = {
    val guarded = emb.crossJoin(broadcast(
      emb.agg(count(lit(1)).as("nvec"))
        .select(when(col("nvec") <= 100000L, col("nvec"))
          .otherwise(raise_error(concat(lit("LinearAlgebra: corpus "),
            col("nvec").cast("string"),
            lit(" exceeds the 1e5 fixed-point overflow envelope — " +
              "re-tier the rescale shifts")))).as("nvec"))))
    guarded
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("d"),
        floor(col("x").cast("double") * lit(1048576.0)).cast("long").as("q"))
  }

  /** Dominant principal direction after `iterations` integer power-method
    * steps: returns the 64-row (d, v) frame with ‖v‖ ≈ 2^20. Per
    * iteration: v ← X^T(Xv) as two integer matvec aggregates (rescaled
    * s DIV 2^26, w DIV 2^26), then an integer renormalize via
    * floor(sqrt(Σw²)) — Σw² stays < 2^53 so the double sqrt is correctly
    * rounded on an exactly-representable input.
    */
  def pcaPowerDirection(emb: DataFrame, iterations: Int = 3): DataFrame =
    powerFromQ(emb.sparkSession, quantized(emb).localCheckpoint(true),
      iterations)

  /** Power iteration over an already-materialized quantized frame. `q` is
    * eagerly localCheckpoint-ed by the callers: the iteration DAG
    * references it 2× per step and ABTT 2× more, so without truncation
    * the corpus×64 explode would re-execute ~9 times per action
    * (values are unchanged — checkpoint materializes exact computed
    * rows). Memory: ≤ 1e5 vectors × 64 dims ≈ 6.4M narrow rows, inside
    * the same envelope the overflow guard already pins. The returned
    * 64-row direction is checkpointed too — downstream branches
    * (broadcast probes, Σu²) reuse it instead of replaying the
    * 3-iteration pyramid per reference.
    */
  private def powerFromQ(
      spark: org.apache.spark.sql.SparkSession,
      q: DataFrame,
      iterations: Int): DataFrame = {
    def iterate(v: DataFrame): DataFrame = {
      val t = q.join(broadcast(v), "d")
        .groupBy(col("vec_id")).agg(sum(col("q") * col("v")).as("s"))
        .selectExpr("vec_id", "s DIV 67108864 AS t")
      val w = q.join(t, "vec_id")
        .groupBy(col("d")).agg(sum(col("q") * col("t")).as("w"))
        .selectExpr("d", "w DIV 67108864 AS w2")
      val n2 = w.agg(sum(col("w2") * col("w2")).as("n2"))
      w.crossJoin(broadcast(n2))
        .selectExpr("d",
          "(w2 * 1048576) DIV greatest(CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT), 1) AS v")
    }
    import spark.implicits._
    val v0 = spark.range(1, 65)
      .select($"id".cast("int").as("d"),
        when($"id" === 1, 1048576L).otherwise(0L).as("v"))
    (1 to iterations).foldLeft(v0)((v, _) => iterate(v))
      .localCheckpoint(true)
  }

  /** All-but-the-top residual statistics: project out the dominant
    * direction and report per-label L1 residual mass — EXACTLY, with no
    * division at all: with u = v DIV 2^10 (‖u‖≈2^10) the residual scaled
    * by U2 = Σu² is r_d = U2·q_d − s·u_d (s = Σ_d q_d·u_d), pure BIGINT;
    * per-vector L1 = (Σ_d |r_d|) DIV 2^26 rescales once. A vector lying
    * ON the common direction gets residual ≈ 0; anisotropy shows as the
    * spread between labels. Plan: the pca direction (64-row broadcast) +
    * one s-aggregate + one residual aggregate per vector, then the
    * |labels|-row rollup — nothing corpus-sized leaves the executors.
    */
  def abttResidualStats(emb: DataFrame, iterations: Int = 3): DataFrame = {
    val q = quantized(emb).localCheckpoint(true) // shared by power + residual
    val u = powerFromQ(emb.sparkSession, q, iterations)
      .selectExpr("d", "v DIV 1024 AS u")
    val u2 = u.agg(sum(col("u") * col("u")).as("u2"))
    val s = q.join(broadcast(u), "d")
      .groupBy(col("vec_id")).agg(sum(col("q") * col("u")).as("s"))
    val perVec = q.join(s, "vec_id").join(broadcast(u), "d")
      .crossJoin(broadcast(u2))
      .select(col("vec_id"), abs(col("u2") * col("q") - col("s") * col("u")).as("ar"))
      .groupBy(col("vec_id")).agg(sum(col("ar")).as("l1"))
      .selectExpr("vec_id", "l1 DIV 67108864 AS res_l1")
    emb.select(col("vec_id"), col("label")).join(perVec, "vec_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("res_l1")).as("sum_res"),
        min(col("res_l1")).as("min_res"), max(col("res_l1")).as("max_res"))
  }
}
