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

  /** (name, seconds, ok). A throwing pass measures time-to-failure,
    * not query cost — it must never become the per-query number that
    * updates the recorded best (a ~10 ms analysis failure would
    * otherwise poison the deviation gate into a permanent phantom
    * regression once the query is fixed). The min is taken over the
    * SUCCESSFUL passes; a query with no successful pass reports its
    * time-to-failure with ok=false and never updates a best.
    */
  private def runSuite(spark: SparkSession, sfDir: String,
      warm: Boolean): Seq[(String, Double, Boolean)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (warm) {
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        Caches.releaseAll()
      }
      // two timed passes, report the min — shields the recorded number
      // from one-off GC pauses / scheduler noise on a busy host
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

  def main(args: Array[String]): Unit = {
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
    var results = runSuite(spark, sfDir, warm = true)
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

    def perQueryDeviations(rs: Seq[(String, Double, Boolean)]): Seq[(String, Double)] =
      rs.flatMap { case (name, t, ok) =>
        if (!ok) None
        else recorded.get(qKey(name)).filter(b => t > 2.0 * b && t - b > 0.05)
          .map(b => name -> t / b)
      }

    var reran = false
    if (prevBest.exists(b => total > 1.3 * b) ||
        perQueryDeviations(results).nonEmpty) {
      // likely host contention — rerun once, keep per-query minima
      // (minima over SUCCESSFUL passes only; ok = succeeded in either run)
      val second = runSuite(spark, sfDir, warm = false)
        .map(r => r._1 -> (r._2, r._3)).toMap
      results = results.map { case (k, v, ok) =>
        second.get(k) match {
          case Some((v2, ok2)) if ok && ok2 => (k, math.min(v, v2), true)
          case Some((v2, true)) if !ok => (k, v2, true)
          case Some((_, false)) if ok => (k, v, true)
          case Some((v2, _)) => (k, math.min(v, v2), false)
          case None => (k, v, ok)
        }
      }
      total = total0
      reran = true
    }
    // deviations that SURVIVE the rerun are candidate regressions
    val deviations = perQueryDeviations(results)
    val failed = results.collect { case (k, _, false) => k }

    // a total that includes time-to-failure entries is artificially low
    // — it must neither persist as the best nor be reported as one
    val newBest =
      if (failed.isEmpty) math.min(total, prevBest.getOrElse(total))
      else prevBest.getOrElse(total)
    try {
      val updated = recorded ++
        (results.collect { case (k, v, true) =>
          qKey(k) -> math.min(v, recorded.getOrElse(qKey(k), v))
        } ++ (if (failed.isEmpty) Seq(totalKey -> newBest) else Nil))
      java.nio.file.Files.writeString(bestPath,
        updated.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    } catch { case _: Exception => () } // best-file is advisory only

    val loadAfter = loadAvg()
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(results.map(r => r._1 -> r._2))},"sf":"$sfDir","load_before":$loadBefore,"load_after":$loadAfter,"reran":$reran,"best_total":$newBest,"deviations":${jmap(deviations)},"failed":$failedJson}""")
    spark.stop()
  }
}
