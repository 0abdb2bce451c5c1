package graft

import org.scalatest.funsuite.AnyFunSuite

/** Saturation guard (SCALING.md methodology; r6 verdict item 9): the
  * approximate dedup operators have FIXED or corpus-sized key spaces
  * whose failure mode is quadratic — bucket occupancy grows ∝ n, so
  * within-bucket candidate pairs grow ∝ n², invisible at sf0.1. Both
  * historical walls (dedup_simhash 29.9×, dedup_embedding_lsh 17.1× at
  * 10× data, SCALING.md) would trip this spec; their fixed shapes
  * (sub-banding, corpus-auto-sized bucket bits) measure ≤ 8×.
  *
  * Runs only when tools/gen_sf1.py output is present (the data is
  * gitignored and driver-cleaned between rounds), so routine `sbt test`
  * stays fast; the scaling pass re-arms it by generating sf1.
  *
  * One timed pass per (query, sf) after a warmup — noisier than the
  * bench's min-of-2, hence the generous 12× bar: a healthy sub-linear
  * operator measures ≤ 8× even with noise, a quadratic wall ≥ 17×.
  */
class ScalingSmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf01 = "/root/testdata/sf0.1"
  private val sf1 = "/root/repo/sf1"

  private def timeOnce(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private val guarded =
    Seq("dedup_simhash", "dedup_embedding_lsh", "dedup_minhash_lsh")

  test("approximate dedup operators stay sub-quadratic at 10× data") {
    assume(new java.io.File(s"$sf1/documents.parquet").exists(),
      "sf1 not generated (tools/gen_sf1.py)")
    // warm up EVERY guarded query, not just the first — each has its own
    // codegen/JIT startup, and a warmup landing inside a timed sf0.1 run
    // inflates that query's denominator (r7 advice)
    guarded.foreach(timeOnce(_, sf01))
    val offenders = guarded.flatMap { name =>
      val small = timeOnce(name, sf01)
      val big = timeOnce(name, sf1)
      val ratio = big / math.max(small, 0.05)
      info(f"$name%-22s sf0.1 $small%5.2fs  sf1 $big%5.2fs  ratio $ratio%4.1f×")
      if (ratio > 12.0) Some(f"$name $ratio%.1f× at 10× data") else None
    }
    assert(offenders.isEmpty,
      "bucket-space saturation (quadratic wall): " + offenders.mkString(", "))
  }
}
