package graft
import org.apache.spark.sql.SparkSession

/** Bench main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query gets one untimed warmup execution (triggers plan codegen
  * compilation + JVM JIT — measured ~10× inflation on first touch),
  * then TWO timed executions; the per-query number is the MIN of the
  * two and the reported total is the sum of per-query minima. That
  * shields the recorded number from one-off GC pauses and scheduler
  * noise, but note the methodology when comparing across rounds:
  * round-1 numbers were single-pass. Queries run in name order so
  * timings are comparable across rounds.
  *
  * Host-contention hygiene (two rounds of driver numbers were
  * contention artifacts): the 1-minute load average is captured before
  * and after into the JSON, and the suite reruns once (per-query
  * minima across both runs, `"reran":true`) when the run deviates from
  * the recorded bests — either the TOTAL >1.3× its best, or ANY query
  * >2× its own best. Totals across rounds compare different query
  * counts, so `bench_best.json` records a per-query best
  * (`{sfKey}/q/{name}` keys) alongside the total; queries still >2×
  * their best after the rerun are surfaced in `"deviations"` so a real
  * per-query regression cannot hide inside suite growth.
  */
object Bench {

  private def loadAvg(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Exception => -1.0 }

  /** Multi-core canary (round 17): rounds 15 and 16 both lost hours to
    * phantom deviation sets from degraded-host windows that neither the
    * load average nor a single-thread probe could see (NEXT.md's
    * diagnosis: multi-core throughput/steal outside the guest's view).
    * This measures it directly: a fixed ALU kernel runs once on ONE
    * thread (t1) and then once per hardware thread concurrently (tn).
    * On a healthy idle host the per-thread work is constant so
    * tn ≈ t1; contention shows as tn/t1 rising while t1 stays flat —
    * the exact signature of the r16 degradation. The ratio (not tn
    * alone) is the signal, so the bound survives JIT/CPU-model
    * differences. Runs before AND after the suite; a run is
    * `degraded` when either ratio exceeds [[CanaryBound]], and a
    * degraded run never SEEDS a new total-series best (per-query bests
    * are minima, which inflated times cannot poison, so those still
    * update).
    */
  private def canaryKernel(seed: Long, iters: Long): Long = {
    var h = seed; var i = 0L
    while (i < iters) {
      h = h * 6364136223846793005L + 1442695040888963407L
      h ^= h >>> 17
      i += 1
    }
    h
  }

  /** Min-ratio trial of 3 (a one-off GC pause or timer tick must not
    * flag a healthy run; sustained steal inflates every trial).
    * Returns (t1 seconds, tn seconds, ratio) of the best trial. */
  private def canary(): (Double, Double, Double) =
    (1 to 3).map(_ => canaryOnce()).minBy(_._3)

  /** (t1 seconds, tn seconds, ratio). */
  private def canaryOnce(): (Double, Double, Double) = {
    val threads = Runtime.getRuntime.availableProcessors()
    val work = 300000000L // ~0.3 s single-thread on this class of host
    var sink = canaryKernel(1, work / 4) // JIT warmup, untimed
    val s1 = System.nanoTime()
    sink ^= canaryKernel(2, work)
    val t1 = (System.nanoTime() - s1) / 1e9
    val acc = new java.util.concurrent.atomic.AtomicLong(sink)
    val ts = (0 until threads).map { i =>
      new Thread(() => { acc.addAndGet(canaryKernel(i + 3L, work)); () })
    }
    val sn = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    val tn = (System.nanoTime() - sn) / 1e9
    if (acc.get == 42L) println("") // blackhole — never true in practice
    (t1, tn, tn / t1)
  }

  /** Calibrated round 17 on the quiet host (the same class of window
    * as r16's clean 48.94 s run): clean trials read 1.10–1.45
    * (min-of-3 ≈ 1.10; the residue over 1.0 is all-core frequency vs
    * single-core turbo plus ~6% ambient steal measured via
    * /proc/stat), while a mildly contended window during calibration
    * read 1.8–2.5 across ALL trials. CPU-steal degradation inflates
    * every core equally, so 1.8 on the min-of-3 sits well above
    * clean jitter and at the floor of that failure mode. */
  private val CanaryBound = 1.8

  /** Page-fault-path probe (round 17, second canary leg). The round-17
    * degraded window was caught IN THE ACT and root-caused: per-query
    * times inflated 2× while the ALU canary read a clean 1.03–1.20 —
    * CPU and steady-state DRAM were fine (an in-place copy measured
    * 18 GB/s) but FIRST-TOUCH of freshly-mapped memory measured
    * 0.01–0.3 GB/s vs the healthy multi-GB/s, i.e. the guest/host
    * page-fault/zeroing path was degraded. Spark exercises exactly
    * that path continuously (heap growth, shuffle/scan buffers, page
    * cache), which is why queries inflate while ALU work doesn't.
    * `allocateDirect` mmaps + zeroes fresh anonymous memory, so its
    * timing is dominated by the fault path; one byte per 4 KiB page
    * re-touches to keep the probe honest if the allocation ever stops
    * zeroing eagerly. Returns GB/s; max-of-3 (healthy-biased, the
    * mirror of the ratio's min-of-3 — a one-off stall must not flag a
    * healthy run, sustained degradation keeps every trial low). */
  private def faultProbeOnce(): Double = {
    val bytes = 256 << 20
    try {
      val t0 = System.nanoTime()
      val buf = java.nio.ByteBuffer.allocateDirect(bytes)
      var p = 0
      while (p < bytes) { buf.put(p, 1.toByte); p += 4096 }
      val dt = (System.nanoTime() - t0) / 1e9
      bytes / dt / 1e9
    } catch {
      // direct-memory exhaustion is a probe failure, not host
      // degradation — report unknown rather than a false flag
      case _: OutOfMemoryError => -1.0
    } finally System.gc() // release the 256 MB before the next trial
  }

  private def faultProbe(): Double = {
    val vals = (1 to 3).map(_ => faultProbeOnce()).filter(_ > 0)
    if (vals.isEmpty) -1.0 else vals.max
  }

  /** Provisional floor, set from the caught window: degraded trials
    * read 0.01–0.3 GB/s (max-of-3 ≤ 0.3) while even a mildly busy
    * healthy host clears 1 GB/s with the fault path intact. Recalibrate
    * upward toward ~2 once a clean-window reading exists (NEXT.md
    * round-17 note). -1 (probe failure) never flags. */
  private val FaultFloor = 0.7

  /** Third canary leg (round 17): a fixed SYNTHETIC Spark job — pure
    * compute (range → mod-key hash agg), no data files, and never
    * touched by engine changes — timed min-of-2 after one warmup and
    * ratcheted in bench_best.json like any query. Its inflation over
    * its own best is a direct measurement of the host factor on
    * Spark-SHAPED work (JVM alloc + shuffle + codegen), the quantity
    * the ALU and fault legs only approximate: suite deviations that
    * co-move with this ratio are the host's; deviations while this
    * reads ~1× are a real regression. Keyed by the cpu count (its
    * cost scales with local[n]). */
  private def sparkCanary(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.sum
    def job(): Unit = {
      spark.range(100000000L)
        .selectExpr("id % 1000 as k", "id")
        .groupBy("k").agg(sum("id")).count()
      ()
    }
    job() // warmup (codegen compile)
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      job()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  /** Spark-canary inflation over its recorded best that flags a run
    * degraded: 2× mirrors the per-query deviation gate. */
  private val SparkCanaryBound = 2.0

  /** One un-warmed timed synthetic job — the suite-INTERLEAVED sample
    * (warmup happens once per JVM via [[sparkCanary]] before the
    * suite). The round-17 windows proved endpoint sampling blind:
    * one run's before/after canaries read clean while nine mid-run
    * queries inflated 2–2.8× — the degradation came and went INSIDE
    * the suite. Sampling every [[CanarySampleEvery]] queries costs
    * ~12 s per full pass and gives every query a local host-factor
    * reading, so each deviation carries its own adjudication. */
  private def sparkCanaryOnce(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.sum
    val t0 = System.nanoTime()
    spark.range(100000000L)
      .selectExpr("id % 1000 as k", "id")
      .groupBy("k").agg(sum("id")).count()
    (System.nanoTime() - t0) / 1e9
  }

  private val CanarySampleEvery = 16

  /** Per-query results plus the interleaved canary samples.
    * localCanarySec is the slower of the two samples ENCLOSING the
    * query's block — conservative: a window that began anywhere in the
    * block shows in at least one of them. */
  private def runSuite(spark: SparkSession, sfDir: String,
      warm: Boolean): (Seq[(String, Double, Boolean, Double)], Seq[Double]) = {
    val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
    // (name, seconds, ok): a throwing pass measures time-to-failure,
    // not query cost — it must never become the per-query number that
    // updates the recorded best (a ~10 ms analysis failure would
    // otherwise poison the deviation gate into a permanent phantom
    // regression once the query is fixed). The min is taken over the
    // SUCCESSFUL passes; a query with no successful pass reports its
    // time-to-failure with ok=false and never updates a best.
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((name, fn), i) =>
        if (i % CanarySampleEvery == 0) samples += sparkCanaryOnce(spark)
        if (warm) {
          try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
          Caches.releaseAll()
        }
        // two timed passes, report the min — shields the recorded
        // number from one-off GC pauses / scheduler noise
        val passes = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).count(); true }
            catch { case _: Throwable => false }
          val dt = (System.nanoTime() - t0) / 1e9
          Caches.releaseAll() // per-request cache arena
          (dt, ok)
        }
        val good = passes.filter(_._2).map(_._1)
        if (good.nonEmpty) (name, good.min, true)
        else (name, passes.map(_._1).min, false)
      }
    samples += sparkCanaryOnce(spark)
    val withLocal = timed.zipWithIndex.map { case ((name, t, ok), i) =>
      val b = i / CanarySampleEvery
      val local = math.max(samples(b), samples(math.min(b + 1, samples.length - 1)))
      (name, t, ok, local)
    }
    (withLocal, samples.toSeq)
  }

  def main(args: Array[String]): Unit = {
    // standalone host-health probe (calibration + quick degraded-window
    // checks without paying a suite run): prints 5 canary trials
    if (args.contains("canary-only")) {
      (1 to 5).foreach { i =>
        val (t1, tn, r) = canaryOnce()
        val f = faultProbeOnce()
        println(f"[canary] trial $i t1=$t1%.3fs tn=$tn%.3fs ratio=$r%.2f fault=$f%.2fGB/s load=${loadAvg()}%.2f")
      }
      return
    }
    // host-probe: the spark-canary leg standalone (needs a session,
    // ~1 min) — compare the printed seconds against bench_best.json's
    // spark_canary_c{cpus} to find a clean window before a re-best run
    if (args.contains("host-probe")) {
      val cpus0 = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      val s = SparkSession.builder().master(s"local[$cpus0]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      sparkCanary(s) // warmup + 2 (discarded — JIT/codegen settle)
      (1 to 5).foreach { i =>
        val t = sparkCanaryOnce(s)
        println(f"[host-probe] trial $i spark=$t%.3fs load=${loadAvg()}%.2f")
      }
      s.stop()
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val loadBefore = loadAvg()
    val (c1Before, cnBefore, crBefore) = canary()
    val faultBefore = faultProbe()
    val scBefore = sparkCanary(spark)
    var (results, samples1) = runSuite(spark, sfDir, warm = true)
    var allSamples = samples1
    def total0 = results.map(_._2).sum
    var total = total0

    // recorded bests for this sf dir: flat JSON of `{sfKey}/n{count}` →
    // best total plus `{sfKey}/q/{name}` → best per-query time. The
    // TOTAL best is keyed by the query COUNT it measured — totals from
    // different suite sizes are incomparable (a grown suite could never
    // beat a smaller suite's total, freezing the gate), so a new query
    // starts a fresh total series while the per-query bests carry over.
    val bestPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BEST", "bench_best.json"))
    val sfKey = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    def qKey(name: String) = s"$sfKey/q/$name"
    val totalKey = s"$sfKey/n${SparkEntry.queries.size}"
    val recorded: Map[String, Double] =
      try {
        val txt = java.nio.file.Files.readString(bestPath)
        """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Exception => Map.empty[String, Double] }
    val prevBest = recorded.get(totalKey)

    def perQueryDeviations(rs: Seq[(String, Double, Boolean, Double)]): Seq[(String, Double)] =
      rs.flatMap { case (name, t, ok, _) =>
        if (!ok) None
        else recorded.get(qKey(name)).filter(b => t > 2.0 * b && t - b > 0.05)
          .map(b => name -> t / b)
      }

    var reran = false
    if (prevBest.exists(b => total > 1.3 * b) ||
        perQueryDeviations(results).nonEmpty) {
      // likely host contention — rerun once, keep per-query minima
      // (minima over SUCCESSFUL passes only; ok = succeeded in either
      // run). The local canary travels with whichever pass supplied
      // the kept time, so a deviation's host factor describes the
      // window its REPORTED number was actually measured in.
      val (secondSeq, samples2) = runSuite(spark, sfDir, warm = false)
      allSamples = allSamples ++ samples2
      val second = secondSeq.map(r => r._1 -> (r._2, r._3, r._4)).toMap
      results = results.map { case (k, v, ok, lc) =>
        second.get(k) match {
          case Some((v2, ok2, lc2)) if ok && ok2 =>
            if (v2 < v) (k, v2, true, lc2) else (k, v, true, lc)
          case Some((v2, true, lc2)) if !ok => (k, v2, true, lc2)
          case Some((_, false, _)) if ok => (k, v, true, lc)
          case Some((v2, _, lc2)) =>
            if (v2 < v) (k, v2, false, lc2) else (k, v, false, lc)
          case None => (k, v, ok, lc)
        }
      }
      total = total0
      reran = true
    }
    // deviations that SURVIVE the rerun are candidate regressions
    val deviations = perQueryDeviations(results)
    val failed = results.collect { case (k, _, false, _) => k }

    // post-suite canary: degradation can begin mid-run (the r16 n192
    // seed was born exactly that way), so either window flags the run
    val (c1After, cnAfter, crAfter) = canary()
    val faultAfter = faultProbe()
    val scAfter = sparkCanary(spark)
    val scKey = s"spark_canary_c$cpus"
    val scBest =
      (recorded.get(scKey).toSeq ++ Seq(scBefore, scAfter) ++ allSamples).min
    def scRatio(t: Double) = t / scBest
    // each surviving deviation stamped with the host factor of the
    // window its kept time was measured in — a factor well above 1 is
    // the host's window, a factor ≈1 is a real regression. This is the
    // per-deviation adjudication rounds 15–17 did by hand.
    val localOf = results.map(r => r._1 -> r._4).toMap
    val deviationHostFactors =
      deviations.map { case (name, _) => name -> scRatio(localOf(name)) }
    def faultBad(f: Double) = f > 0 && f < FaultFloor
    val degraded = crBefore > CanaryBound || crAfter > CanaryBound ||
      faultBad(faultBefore) || faultBad(faultAfter) ||
      scRatio(allSamples.max) > SparkCanaryBound ||
      scRatio(scBefore) > SparkCanaryBound ||
      scRatio(scAfter) > SparkCanaryBound

    // a total that includes time-to-failure entries is artificially low
    // — it must neither persist as the best nor be reported as one.
    // A DEGRADED run never seeds a fresh total series (that inflated
    // seed becomes the gate's denominator until a quiet run ratchets
    // it); it may still LOWER an existing best, since an improvement
    // measured under contention is a fortiori real.
    val newBest =
      if (failed.isEmpty) math.min(total, prevBest.getOrElse(total))
      else prevBest.getOrElse(total)
    val seedTotal = failed.isEmpty && (prevBest.isDefined || !degraded)
    try {
      val updated = recorded ++
        (results.collect { case (k, v, true, _) =>
          qKey(k) -> math.min(v, recorded.getOrElse(qKey(k), v))
        } ++ Seq(scKey -> scBest) ++
          (if (seedTotal) Seq(totalKey -> newBest) else Nil))
      java.nio.file.Files.writeString(bestPath,
        updated.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    } catch { case _: Exception => () } // best-file is advisory only

    val loadAfter = loadAvg()
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val canaryJson = f"""{"t1_before":$c1Before%.3f,"tn_before":$cnBefore%.3f,"ratio_before":$crBefore%.2f,"t1_after":$c1After%.3f,"tn_after":$cnAfter%.3f,"ratio_after":$crAfter%.2f,"bound":$CanaryBound,"fault_gbps_before":$faultBefore%.2f,"fault_gbps_after":$faultAfter%.2f,"fault_floor":$FaultFloor,"spark_before":$scBefore%.3f,"spark_after":$scAfter%.3f,"spark_best":$scBest%.3f,"spark_bound":$SparkCanaryBound,"spark_samples_max":${allSamples.max}%.3f}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(results.map(r => r._1 -> r._2))},"sf":"$sfDir","load_before":$loadBefore,"load_after":$loadAfter,"reran":$reran,"best_total":$newBest,"deviations":${jmap(deviations)},"deviation_host_factors":${jmap(deviationHostFactors)},"failed":$failedJson,"canary":$canaryJson,"degraded":$degraded}""")
    spark.stop()
  }
}
