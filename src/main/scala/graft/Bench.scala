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
  * itself fails records -1, never aborts the artifact. The bracket has
  * a blind spot — contention that starts after `pre` and ends before
  * `post` (the r12 driver artifact: mid-alphabet queries 2-30× high,
  * both probes clean) — so the probe ALSO runs every 50 queries and
  * the artifact carries `"windows":[...]` + `"contended_windows":[...]`
  * (1-based indexes of blocks whose probe exceeded 3× floor) +
  * `"n_contended_windows"`. The top-level `contended` flips when the
  * bracket trips OR when ≥2 windows trip (r13 verdict item 2: the
  * driver artifact carried contended_windows [3,4,8,9] yet read
  * `"contended":false` — a gate reading one boolean was misled).
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
      // Shuffle FILES (unlike RDD blocks, which the per-pass release
      // sweep frees) are only deleted when ContextCleaner sees the
      // shuffle dependency get GC'd — across a heavy multi-query run at
      // big sf they accumulate until the disk fills (the sf10 ktruss
      // measurement died on SPILL_OUT_OF_MEMORY/ENOSPC with ~70 GB of
      // dead shuffle files from the six previous queries still on
      // disk). The 2-min periodic driver GC bounds that accumulation;
      // at sf0.1 suite pace it fires ~4 times (~1 s total).
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Release every persisted RDD block after a pass. The iterative
      * queries (graph family, dedup_clusters, MMR) barrier 3-6
      * localCheckpoint frames each; ContextCleaner only reclaims those
      * blocks when GC happens to collect the RDD reference, so across a
      * 452-query suite they accumulate, heap pressure mounts, and
      * whichever query draws the resulting GC pauses pays 2-4× — the r12
      * cross-run volatility (ktruss 3.7 / 11.4 / 15.0 s on identical
      * code). Deterministic release after every pass makes each query
      * start from the same zero-resident state. Nothing else persists
      * blocks across queries: Tables.load memoizes PLANS (no .cache()),
      * so the sweep can be unconditional.
      */
    def releaseCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))

    /** One timed pass; None on failure. Block release runs OUTSIDE the
      * timed window: it is bench hygiene, not query cost.
      */
    def runOnce(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      val r = try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
      releaseCheckpoints()
      r
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
    // Mid-suite canary windows (r12 verdict item 3): the r12 driver run
    // was load-poisoned 2-30× across the mid-alphabet block while BOTH
    // bracketing probes read clean — contention that starts after `pre`
    // and ends before `post` is invisible to the bracket. A single-pass
    // probe every `windowEvery` queries localizes it: window i covers
    // queries [i·50, (i+1)·50). Single pass, not min-of-2 — JIT is warm
    // mid-suite and the probe's JOB is to see transient load.
    val windowEvery = 50
    val winTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val results = names.zipWithIndex.map { case (n, i) =>
      if (i > 0 && i % windowEvery == 0) winTimes += canaryOnce()
      n -> run(n)
    }
    val canaryPost = canary()
    // min, not max: `pre` sits ~2× floor even on an idle box (JIT
    // tiering hasn't finished after one discarded pass), while a
    // load-poisoned run (the r10 artifact: every query ~2.5×, probes
    // 6–17× floor THROUGHOUT) elevates both probes. min can only trip
    // when contention spans the whole suite — exactly the case where
    // the totals are untrustworthy. The bracket alone is NOT enough
    // (r13 verdict item: the driver artifact carried
    // contended_windows [3,4,8,9] yet "contended":false because both
    // bracketing probes read clean), so the top-level flag ALSO flips
    // when ≥2 mid-suite windows trip — one tripped window can be a
    // single transient (cron tick, page-cache flush) and stays
    // localizable via contended_windows without poisoning the flag,
    // but two+ means a material share of the suite ran under load.
    val bracketContended =
      math.min(canaryPre, canaryPost) > 3.0 * canaryFloor
    val contendedWindows = winTimes.zipWithIndex
      .collect { case (t, i) if t > 3.0 * canaryFloor => i + 1 }
    val contended = bracketContended || contendedWindows.size >= 2

    def r3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum

    // The suite's TOP SPENDERS first (r12 verdict item 4: every query
    // >2 s in a clean full run must be headline-visible, or a real
    // regression there is invisible at the gate — the clean-r12 >2 s set
    // is the graph family, entity blocking, negative candidates, the
    // ingest loop, theil_sen, mips_norm), then a representative slice
    // across operator families. Membership-filtered so a renamed query
    // can never break the bench.
    val headline = Seq(
      "graph_ktruss_peel", "graph_kcore_peel", "graph_neighbor_jaccard",
      "graph_triangle_doulion", "pipeline_dsir_weights",
      "pipeline_dsir_resample", "sim_index_sq8",
      "join_entity_blocking", "sample_negative_candidates",
      "dedup_ingest_loop", "graph_copurchase_projection", "graph_hits_power",
      "graph_harmonic_centrality", "graph_bfs_distance", "agg_theil_sen",
      "sim_topk_mips_norm", "graph_label_propagation",
      "dedup_semdedup_cells", "dedup_semdedup_twolevel",
      "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
      "q9_product_type_profit", "q17_small_quantity_revenue",
      "q18_large_volume_customer", "q21_sole_fault_supplier",
      "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_clusters",
      "dedup_embedding_lsh", "sim_topk_brute", "sim_topk_ivf",
      "sim_topk_pq", "sim_index_probe",
      "join_asof_latest_order", "join_salted_skew", "snapshot_scd2_history",
      "agg_profile_stats", "pipeline_daily_run", "pipeline_corpus_curation",
      "pipeline_decontaminate", "streaming_sessionization",
      "streaming_interval_join_outer", "text_lang_quality",
      "text_fingerprint_rolling", "maintenance_zorder", "model_incremental")
    val byName = results.toMap
    val head = headline.filter(byName.contains).map(n => n -> byName(n))

    // windows: one probe per 50-query block; contended_windows lists the
    // 1-based block indexes whose probe exceeded 3× floor, so a judge can
    // localize a contamination window without re-running the suite
    val winJson = winTimes.map(r3).mkString("[", ",", "]")
    val winBad = contendedWindows.map(_.toString).mkString("[", ",", "]")
    // machine_speed (r14 verdict item 6): median probe / floor — ONE
    // number a gate can normalize totals with across differently-loaded
    // sessions (the r14 adjudication had to re-derive it by hand from
    // the window arrays). 1.0–2.0 ≈ idle box; the r14 contended driver
    // session read ~2.5–3.5 on the same engine.
    val probeSamples = (Seq(canaryPre, canaryPost) ++ winTimes)
      .filter(_ >= 0).sorted
    val machineSpeed =
      if (probeSamples.isEmpty) -1.0
      else probeSamples(probeSamples.size / 2) / canaryFloor
    val canaryJson =
      s"""{"pre":${r3(canaryPre)},"post":${r3(canaryPost)},"floor":$canaryFloor,"machine_speed":${r3(machineSpeed)},"contended":$contended,"n_contended_windows":${contendedWindows.size},"windows":$winJson,"contended_windows":$winBad}"""

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
