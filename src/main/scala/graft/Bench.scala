package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line (driver contract).
  *
  * Hygiene (round-1/2 verdicts): a discarded warmup pass first absorbs
  * JVM/codegen startup (~4 s); each query then runs TWICE and reports the
  * min — a single pass was shown (r2 verdict) to pick up ~2× GC/compile
  * noise on whichever query draws the unlucky JIT/GC pause, min-of-2
  * makes round-over-round deltas signal; queries run in sorted name order
  * so "first query" is stable; the action is a noop-datasource write,
  * which materializes every output row — `.count()` lets Catalyst drop
  * ORDER BYs and skip column evaluation, under-measuring sort work.
  * A failed query records -1 (the r1 sentinel) and its name in a
  * `"failed"` list, never an elapsed time, so broken queries can't
  * masquerade as valid timings.
  *
  * Contamination canary (r10 verdict item 1): BENCH_r10 recorded 238 s
  * where an idle re-run measured 94 s — the driver's bench shared the
  * machine with other load, and nothing in the artifact could tell a
  * contended run from a real regression. So the suite now times a fixed
  * calibration probe (`proj_alias_literal`, a no-table constant
  * projection, plus a 600 k-row range aggregate — work that no engine
  * change should move) BEFORE and AFTER the suite and emits
  * `"canary":{"pre":s,"post":s,"floor":s,"contended":bool}`. The floor
  * is the idle-machine cost measured at r10 (~0.08 s with margin);
  * BOTH probes exceeding 3× floor (min(pre,post), see the inline
  * rationale) flags `"contended":true`, telling the judge the totals
  * are load-poisoned, not regressed; a transient spike shows as
  * pre/post asymmetry in the emitted fields. A canary probe that
  * itself fails records -1, never aborts the artifact.
  *
  * The printed line must fit the driver's 2000-char stdout-tail capture:
  * BENCH_r01–r03 all show `parsed: null` because the full per-query map
  * (126 queries × full-precision doubles ≈ 4.5 KB) overflows the window,
  * leaving the judge with no machine-readable perf numbers. So the line
  * carries the full-suite total plus a fixed HEADLINE subset of per-query
  * times (3-decimal), ≈ 900 chars; the complete per-query map is written
  * to BENCH_FULL.json beside the repo for inspection.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** One timed pass; None on failure. */
    def runOnce(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }

    /** min of two passes; -1 sentinel if either pass fails. */
    def run(name: String): Double =
      (runOnce(name), runOnce(name)) match {
        case (Some(a), Some(b)) => math.min(a, b)
        case _                  => -1.0
      }

    // ── contamination canary: fixed-cost probe timed before/after the
    //    suite; engine changes can't move it, so movement == machine load
    val canaryFloor = 0.08 // idle-machine cost (measured r10/r11)
    def canaryOnce(): Double = try {
      val t0 = System.nanoTime()
      if (SparkEntry.queries.contains("proj_alias_literal"))
        SparkEntry.queries("proj_alias_literal")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      spark.range(600000L).selectExpr("sum(id) AS s", "count(*) AS n")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    } catch { case e: Throwable =>
      // a failed probe must degrade to a sentinel, never abort the
      // artifact — the suite's own timings are still worth emitting
      System.err.println(s"[bench] canary failed: ${e.getMessage}")
      -1.0
    }
    def canary(): Double = math.min(canaryOnce(), canaryOnce())

    // optional args: run only the named queries (local profiling aid);
    // the driver passes none and gets the full sorted suite
    val names =
      if (args.nonEmpty) args.toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    runOnce("q1_pricing_summary") // discarded warmup
    canaryOnce() // discarded: absorbs the canary's own codegen compile,
                 // so `pre` measures machine load, not first-run JIT
    val canaryPre = canary()
    val results = names.map(n => n -> run(n))
    val canaryPost = canary()
    // min, not max: `pre` sits ~2× floor even on an idle box (JIT
    // tiering hasn't finished after one discarded pass), while a
    // load-poisoned run (the r10 artifact: every query ~2.5×, probes
    // 6–17× floor THROUGHOUT) elevates both probes. min can only trip
    // when contention spans the whole suite — exactly the case where
    // the totals are untrustworthy; a transient spike shows up as
    // pre/post asymmetry in the emitted fields instead.
    val contended =
      math.min(canaryPre, canaryPost) > 3.0 * canaryFloor

    def r3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum

    // Representative slice across operator families: TPC-H analogs, the
    // dedup/ANN hot paths, join/snapshot/profile, pipeline, streaming,
    // text, multimodal. Membership-filtered so a renamed query can never
    // break the bench.
    val headline = Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
      "q17_small_quantity_revenue", "q18_large_volume_customer",
      "q20_dominant_share_supplier", "q21_sole_fault_supplier",
      "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_clusters",
      "dedup_simhash", "dedup_embedding_lsh", "sim_topk_brute", "sim_topk_ivf",
      "join_asof_latest_order", "join_salted_skew", "snapshot_scd2_history",
      "agg_profile_stats", "pipeline_daily_run", "pipeline_corpus_curation",
      "streaming_sessionization", "text_lang_quality", "window_running_sum",
      "multimodal_json_extract", "model_incremental",
      "q9_product_type_profit", "q19_disjunctive_revenue",
      "pipeline_decontaminate", "text_fingerprint_rolling", "sim_topk_lsh",
      "join_asof_nearest", "window_funnel_stages", "text_quality_gopher",
      "agg_bitmap_distinct", "agg_hll_mergeable_bounds", "streaming_late_drop",
      "maintenance_zorder", "streaming_interval_join_outer",
      "dedup_ingest_loop", "sim_index_probe",
      "sim_topk_ivfpq", "text_bm25_search", "text_lm_score")
    val byName = results.toMap
    val head = headline.filter(byName.contains).map(n => n -> byName(n))

    val canaryJson =
      s"""{"pre":${r3(canaryPre)},"post":${r3(canaryPost)},"floor":$canaryFloor,"contended":$contended}"""

    val fullJson =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","nq":${results.size},"canary":$canaryJson,"queries":${jmap(results)},"failed":$failed,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), fullJson + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_FULL.json write failed: ${e.getMessage}") }

    val line =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","nq":${results.size},"canary":$canaryJson,"queries":${jmap(head)},"failed":$failed,"full":"BENCH_FULL.json","sf":"$sfDir"}"""
    if (line.length > 1800) // stay under the 2000-char tail minus sbt trailer
      System.err.println(s"[bench] WARNING printed line ${line.length} chars")
    println(line)
    spark.stop()
  }
}
