package graft

import org.scalatest.funsuite.AnyFunSuite

import BenchPolicy._

/** Pins Bench's adjudication policy (VERDICT r17 task 2): ~250 lines
  * of bench decisions were untested while three rounds' adjudication
  * rode on them. Every case here is a scenario a past round actually
  * hit — the clean run, the endpoint-window run, the mid-suite window
  * (r17's 4.4× interleaved sample), the probe failure, the degraded
  * first-ever run, the cold spark-canary key — plus the three
  * ADVICE-r17 fixes (degraded first-seen per-query seeds, uncalibrated
  * spark-leg adjudication, unpersisted best_total reporting). */
class BenchPolicySpec extends AnyFunSuite {

  private def verdict(
      rBefore: Double = 1.2, rAfter: Double = 1.2,
      fBefore: Double = 2.0, fAfter: Double = 2.0,
      readings: Seq[Double] = Seq(0.35, 0.36),
      recorded: Option[Double] = Some(0.336)) =
    CanaryVerdict(rBefore, rAfter, fBefore, fAfter, readings, recorded)

  // ---- deviation gate ----------------------------------------------

  test("deviation gate: >2x best AND >50ms absolute") {
    assert(isDeviation(sec = 0.90, best = 0.40))
    assert(!isDeviation(sec = 0.79, best = 0.40)) // under 2x
    assert(!isDeviation(sec = 0.024, best = 0.010)) // 2.4x but 14ms — noise
    assert(!isDeviation(sec = 0.80, best = 0.40)) // exactly 2x is not >
  }

  test("deviations: failed queries never gate; no-best queries never gate") {
    val rs = Seq(
      QueryResult("a", 1.00, ok = true, 0.4), // 2.5x its 0.4 best
      QueryResult("b", 1.00, ok = false, 0.4), // failed — time-to-failure
      QueryResult("c", 1.00, ok = true, 0.4)) // no recorded best
    val best = Map("a" -> 0.4, "b" -> 0.1)
    val d = deviations(rs, best.get)
    assert(d.map(_._1) == Seq("a"))
    assert(math.abs(d.head._2 - 2.5) < 1e-9)
  }

  // ---- local host-factor assignment --------------------------------

  test("local factor is the slower of the two enclosing samples") {
    // blocks of CanarySampleEvery queries; samples s(b), s(b+1) enclose b
    val samples = IndexedSeq(0.3, 0.9, 0.4)
    assert(localCanaryOf(samples, 0) == 0.9) // block 0: max(0.3, 0.9)
    assert(localCanaryOf(samples, CanarySampleEvery - 1) == 0.9)
    assert(localCanaryOf(samples, CanarySampleEvery) == 0.9) // block 1: max(0.9, 0.4)
  }

  test("local factor clamps the tail block to the last sample") {
    // suite length not a multiple of the sample stride: the final
    // queries' block index would address samples(b+1) past the end
    val samples = IndexedSeq(0.3, 0.5)
    val lastQuery = 2 * CanarySampleEvery - 1 // block 1, but only 2 samples
    assert(localCanaryOf(samples, lastQuery) == 0.5) // max(s(1), s(1))
  }

  // ---- rerun merge --------------------------------------------------

  test("rerun merge keeps the min and the factor of the min-supplying pass") {
    val first = QueryResult("q", 0.80, ok = true, localCanary = 1.4)
    val second = QueryResult("q", 0.45, ok = true, localCanary = 0.35)
    val kept = mergeRerun(first, Some(second))
    assert(kept.sec == 0.45 && kept.localCanary == 0.35)
    // and symmetrically: first pass faster keeps FIRST pass's factor
    val kept2 = mergeRerun(second, Some(first))
    assert(kept2.sec == 0.45 && kept2.localCanary == 0.35)
  }

  test("rerun merge: a throwing pass never supplies the kept time") {
    val okPass = QueryResult("q", 0.90, ok = true, localCanary = 0.4)
    val failFast = QueryResult("q", 0.01, ok = false, localCanary = 0.4)
    assert(mergeRerun(okPass, Some(failFast)) == okPass)
    assert(mergeRerun(failFast, Some(okPass)) == okPass)
    // both failed: faster time-to-failure, still not ok
    val kept = mergeRerun(QueryResult("q", 0.30, ok = false, 0.4), Some(failFast))
    assert(!kept.ok && kept.sec == 0.01)
    // no second pass at all
    assert(mergeRerun(okPass, None) == okPass)
  }

  // ---- degraded flag: all disjuncts ---------------------------------

  test("clean run: no leg flags") {
    val v = verdict()
    assert(!v.degraded && !v.degradedByAluOrFault && !v.degradedBySpark)
  }

  test("endpoint ALU window flags (either endpoint)") {
    assert(verdict(rBefore = 2.1).degraded)
    assert(verdict(rAfter = 1.9).degraded)
    assert(!verdict(rBefore = 1.79, rAfter = 1.79).degraded)
  }

  test("fault-path collapse flags; probe failure (-1) never flags") {
    assert(verdict(fBefore = 0.25).degraded) // the r17 caught window
    assert(verdict(fAfter = 0.02).degraded)
    assert(!verdict(fBefore = -1.0, fAfter = -1.0).degraded) // unknown, not degraded
    assert(!verdict(fBefore = FaultFloor + 0.01).degraded)
  }

  test("mid-suite spark window flags even when endpoints read clean") {
    // the r17 scenario: before/after ~1x of best, one interleaved
    // sample at 4.4x — the window opened and closed INSIDE the suite
    val v = verdict(readings = Seq(0.34, 1.473, 0.35), recorded = Some(0.336))
    assert(v.degradedBySpark && v.degraded)
    assert(!v.degradedByAluOrFault)
  }

  test("spark leg uses the ratcheted best as denominator, not the run's own min") {
    // all readings uniformly 2.2x the recorded best: a self-normalized
    // denominator would read ~1x and miss it
    val v = verdict(readings = Seq(0.74, 0.75, 0.76), recorded = Some(0.336))
    assert(v.degradedBySpark)
    assert(math.abs(v.sparkBest - 0.336) < 1e-9)
  }

  // ---- ADVICE r17 low: uncalibrated spark leg ------------------------

  test("uncalibrated spark leg reports but never adjudicates") {
    // no recorded spark_canary key: a uniformly degraded run
    // self-normalizes (all ratios ~1) — the leg must not pretend to
    // have adjudicated; only ALU/fault legs can flag such a run
    val v = verdict(readings = Seq(1.40, 1.45, 1.42), recorded = None)
    assert(!v.sparkCalibrated)
    assert(!v.degradedBySpark && !v.degraded)
    // ALU/fault legs still cover the uncalibrated window
    assert(verdict(readings = Seq(1.4), recorded = None, fBefore = 0.1).degraded)
  }

  test("uncalibrated run with a flapping window flags on its own spread " +
      "(the r18 c8 seeding refused)") {
    // VERDICT r18 #5: the r18 8-core run ran at a NEW cpu-count key
    // (uncalibrated — degradedBySpark can't fire), its ALU/fault legs
    // read clean, and its interleaved samples spanned 6.2× of the
    // eventually-recorded 0.277 best — yet it escaped the degraded
    // flag and seeded the n193 total ~1.7× inflated. The run's OWN
    // max/min spread needs no calibration: past the 2× bound the
    // window flapped mid-suite whatever the absolute level.
    val v = verdict(readings = Seq(0.30, 1.72, 0.45, 0.28), recorded = None)
    assert(!v.sparkCalibrated && !v.degradedBySpark)
    assert(v.degradedBySparkSpread && v.degraded)
    // ...so the fresh total/query seeds are refused
    assert(!seedTotal(anyFailed = false, prevBest = None, degraded = v.degraded))
    assert(!seedQuery(alreadyRecorded = false, ok = true, degraded = v.degraded))
    // a genuinely steady uncalibrated run still passes (spread ~1×)
    val steady = verdict(readings = Seq(1.40, 1.45, 1.42), recorded = None)
    assert(!steady.degradedBySparkSpread && !steady.degraded)
    // a -1 probe failure drops OUT of the pool instead of disabling
    // the guard (round-19 review): steady positives stay clean, and a
    // real flap still flags with a failed probe in the mix
    val failedSteady = verdict(readings = Seq(-1.0, 0.35, 0.36), recorded = None)
    assert(!failedSteady.degradedBySparkSpread)
    val failedFlap = verdict(readings = Seq(-1.0, 0.30, 1.72), recorded = None)
    assert(failedFlap.degradedBySparkSpread && failedFlap.degraded)
    // ...and a -1 cannot poison sparkBest's denominator either
    assert(failedFlap.sparkBest > 0)
  }

  test("first spark-canary best only seeds from a window the other legs read clean") {
    val cleanFirst = verdict(recorded = None)
    assert(cleanFirst.seedSparkBest)
    val degradedFirst = verdict(recorded = None, fBefore = 0.1)
    assert(!degradedFirst.seedSparkBest) // a best born inflated weakens the 2x bound
    // once calibrated, the min-ratchet is always safe (minima)
    val calibratedDegraded = verdict(recorded = Some(0.336), fBefore = 0.1)
    assert(calibratedDegraded.seedSparkBest)
  }

  // ---- seed rules -----------------------------------------------------

  test("total seed: never from failures; fresh series never from a degraded run") {
    assert(seedTotal(anyFailed = false, prevBest = None, degraded = false))
    assert(!seedTotal(anyFailed = false, prevBest = None, degraded = true))
    // existing series: a degraded run may still LOWER the best (min)
    assert(seedTotal(anyFailed = false, prevBest = Some(50.0), degraded = true))
    assert(!seedTotal(anyFailed = true, prevBest = Some(50.0), degraded = false))
  }

  test("per-query seed mirrors the total rule (ADVICE r17 medium)") {
    // a query FIRST benched inside a degraded window must not seed its
    // inflated time as the gate's denominator
    assert(!seedQuery(alreadyRecorded = false, ok = true, degraded = true))
    assert(seedQuery(alreadyRecorded = false, ok = true, degraded = false))
    // existing bests always ratchet — minima cannot be poisoned
    assert(seedQuery(alreadyRecorded = true, ok = true, degraded = true))
    // a failed pass never writes anything
    assert(!seedQuery(alreadyRecorded = true, ok = false, degraded = false))
  }

  test("degraded flag skips every FRESH seed (the bench-before-commit ratchet skip)") {
    // VERDICT r17 task 5: a mid-round degraded window can't seed
    // anything — total series, first-seen query, or first spark best
    val v = verdict(rBefore = 2.5, recorded = None)
    assert(v.degraded)
    assert(!seedTotal(anyFailed = false, prevBest = None, degraded = v.degraded))
    assert(!seedQuery(alreadyRecorded = false, ok = true, degraded = v.degraded))
    assert(!v.seedSparkBest)
  }

  // ---- best_total reporting (ADVICE r17 low) --------------------------

  test("best_total echoes only persisted values") {
    // seeded: min(total, prev)
    assert(reportedBestTotal(seeded = true, total = 48.0, prevBest = Some(50.0))
      .contains(48.0))
    assert(reportedBestTotal(seeded = true, total = 52.0, prevBest = Some(50.0))
      .contains(50.0))
    // not seeded, prior exists: echo the prior
    assert(reportedBestTotal(seeded = false, total = 48.0, prevBest = Some(50.0))
      .contains(50.0))
    // degraded first-ever run: nothing persisted, nothing reported
    assert(reportedBestTotal(seeded = false, total = 63.3, prevBest = None).isEmpty)
  }

  // ---- the JSON line ---------------------------------------------------

  test("renderJson: golden line for a replayed degraded-window run") {
    // a BENCH_r17-shaped input: clean endpoints, one 4.4x interleaved
    // sample, one surviving deviation stamped with its local factor,
    // total NOT seeded (fresh n-series + degraded)
    val v = verdict(readings = Seq(0.35, 1.473, 0.36), recorded = Some(0.336))
    val s = RunSummary(
      total = 52.5, sfDir = "/root/testdata/sf0.1",
      loadBefore = 0.52, loadAfter = 1.4, reran = true,
      results = Seq(QueryResult("q01", 0.5, ok = true, 0.35),
        QueryResult("q02", 1.2, ok = true, 1.473)),
      deviations = Seq("q02" -> 2.4),
      deviationHostFactors = Seq("q02" -> 4.38),
      failed = Nil,
      t1Before = 0.56, tnBefore = 0.67, t1After = 0.55, tnAfter = 0.66,
      verdict = v, sparkBefore = 0.35, sparkAfter = 0.36,
      samplesMax = 1.473,
      totalSeeded = false, bestTotal = None,
      jobs = Seq("q01" -> 2, "q02" -> 5))
    val json = renderJson(s)
    assert(json ==
      """{"metric":"total","value":52.5,"unit":"sec","queries":{"q01":0.5,"q02":1.2},"sf":"/root/testdata/sf0.1","load_before":0.52,"load_after":1.4,"reran":true,"best_total":null,"total_seeded":false,"deviations":{"q02":2.4},"deviation_host_factors":{"q02":4.38},"jobs":{"q01":2,"q02":5},"failed":[],"canary":{"t1_before":0.560,"tn_before":0.670,"ratio_before":1.20,"t1_after":0.550,"tn_after":0.660,"ratio_after":1.20,"bound":1.8,"fault_gbps_before":2.00,"fault_gbps_after":2.00,"fault_floor":1.0,"spark_before":0.350,"spark_after":0.360,"spark_best":0.336,"spark_bound":2.0,"spark_samples_max":1.473,"spark_calibrated":true},"degraded":true}""")
    // single line, driver-parseable
    assert(!json.contains("\n"))
    // the head-capture summary line (VERDICT r18 #4): well-formed,
    // queries-less, and under a DISTINCT metric name so no parser can
    // mistake it for the full record
    assert(renderSummaryJson(s) ==
      """{"metric":"total_summary","value":52.5,"unit":"sec","n_queries":2,"sf":"/root/testdata/sf0.1","degraded":true}""")
  }

  test("renderJson: clean seeded run reports its best_total and total_seeded") {
    val v = verdict()
    val s = RunSummary(
      total = 48.9, sfDir = "sf", loadBefore = 0.5, loadAfter = 0.6,
      reran = false, results = Seq(QueryResult("q01", 0.5, ok = true, 0.35)),
      deviations = Nil, deviationHostFactors = Nil, failed = Nil,
      t1Before = 0.5, tnBefore = 0.6, t1After = 0.5, tnAfter = 0.6,
      verdict = v, sparkBefore = 0.35, sparkAfter = 0.36, samplesMax = 0.36,
      totalSeeded = true,
      bestTotal = reportedBestTotal(seeded = true, 48.9, Some(52.5)))
    val json = renderJson(s)
    assert(json.contains(""""best_total":48.9"""))
    assert(json.contains(""""total_seeded":true"""))
    assert(json.contains(""""degraded":false"""))
  }
}
