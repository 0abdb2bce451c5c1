package graft.queries

/** Generators for the ANSI-SQL twins of the *deterministic* approximate
  * operators (random-hyperplane LSH, md5 SimHash).
  *
  * The hyperplane matrices are pure functions of the seed — data
  * independent — so the oracle SQL can restate them as literal ±1 chains
  * and replay the exact algorithm (bucketing, probes, exact-cosine
  * verify) the Spark operator runs. Floating-point parity holds because
  * the chains reproduce the kernel's accumulation order exactly:
  * [[graft.functions.SketchKernels.rhSignature]] computes
  * `dot += v(d) * (±1)` sequentially in d over doubles, and a
  * left-associative `(0.0 + e[1] - e[2] …)` chain is the same IEEE-754
  * operation sequence.
  */
object OracleGen {

  /** `(0.0 + e[1] - e[2] … )` — dot(v, plane_j) with the kernel's ±1
    * weights, 1-based SQL array indexing.
    */
  def dotChain(seed: Long, j: Int, dim: Int, arr: String): String = {
    val sb = new StringBuilder("(0.0")
    var d = 0
    while (d < dim) {
      val w = graft.functions.SketchKernels.planeWeight(seed, j, d)
      sb.append(if (w > 0) " + " else " - ").append(arr).append('[').append(d + 1).append(']')
      d += 1
    }
    sb.append(')').toString
  }

  /** Fixed-width signature: Σ 2^j over planes with dot ≥ 0, as BIGINT. */
  def sigExpr(seed: Long, bits: Int, dim: Int, arr: String): String =
    (0 until bits).map { j =>
      s"(CASE WHEN ${dotChain(seed, j, dim, arr)} >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", "\n + ", ")::BIGINT")

  /** Signature whose width is a runtime column (`nbitsCol`): plane j only
    * contributes when j < nbits — the SQL twin of the corpus-auto-sized
    * bucket space in [[graft.operators.Dedup.embeddingNearDupPairsLsh]].
    */
  def sigExprMasked(seed: Long, maxBits: Int, dim: Int, arr: String, nbitsCol: String): String =
    (0 until maxBits).map { j =>
      s"(CASE WHEN $j < $nbitsCol AND ${dotChain(seed, j, dim, arr)} >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", "\n + ", ")::BIGINT")

  /** Parse hex chars 17..32 of an md5 hex string (= digest bytes 8..15,
    * big-endian) as one base-16 integer — the SQL twin of
    * [[graft.functions.TextKernels.md5Low64]].
    */
  def md5Low64Expr(md5Col: String): String =
    (0 until 16).map { p =>
      val mult = java.math.BigInteger.valueOf(16).pow(15 - p)
      s"(strpos('0123456789abcdef', $md5Col[${17 + p}])::HUGEINT - 1) * $mult::HUGEINT"
    }.mkString("(", "\n + ", ")")

  /** Parse the FIRST `n` hex chars of an md5 hex string as one base-16
    * integer — the SQL twin of Spark `conv(substring(md5(x),1,n),16,10)`
    * (n ≤ 15 so the value stays inside BIGINT).
    */
  def md5PrefixExpr(md5Col: String, n: Int): String = {
    require(n >= 1 && n <= 15, "md5 prefix nibbles in [1, 15]")
    (0 until n).map { p =>
      val mult = java.math.BigInteger.valueOf(16).pow(n - 1 - p)
      s"(strpos('0123456789abcdef', $md5Col[${p + 1}]) - 1) * $mult"
    }.mkString("(", "\n + ", ")")
  }

  /** The per-table seed schedule of [[graft.operators.Similarity.lshTopK]]. */
  def lshTableSeed(seed: Long, t: Int): Long = seed + 0x9E3779B97F4A7C15L * t
}
