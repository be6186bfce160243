package graft

import org.apache.spark.sql.SparkSession

/** The fixed synthetic Spark job behind the spark-canary leg — pure
  * compute (range → mod-key hash agg), no data files, never touched by
  * engine changes, so its timing moves ONLY with the host. Shared by
  * [[Bench]] (endpoint + interleaved samples, ratcheted best in
  * bench_best.json under `spark_canary_c{cpus}`) and
  * `graft.tools.ScaleStress` (per-row host-factor stamping, round 18 —
  * a stress row measured inside a degraded window must say so itself
  * instead of being explained after the fact). */
object HostCanary {

  /** One execution of the synthetic job (unmeasured — for warmup). */
  def sparkJobOnce(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.sum
    spark.range(100000000L)
      .selectExpr("id % 1000 as k", "id")
      .groupBy("k").agg(sum("id")).count()
    ()
  }

  /** One timed execution, seconds. */
  def sparkJobTimed(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    sparkJobOnce(spark)
    (System.nanoTime() - t0) / 1e9
  }

  /** The ratcheted spark-canary best for this cpu count, from the same
    * best-file Bench maintains — None when never recorded (ratios
    * against it are then unknowable; see
    * [[BenchPolicy.CanaryVerdict.sparkCalibrated]]). */
  def recordedBest(cpus: Int,
      path: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_BEST",
        "bench_best.json")): Option[Double] =
    try {
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      val key = s"spark_canary_c$cpus"
      s""""${java.util.regex.Pattern.quote(key)}"\\s*:\\s*([0-9.eE+-]+)""".r
        .findFirstMatchIn(txt).map(_.group(1).toDouble)
    } catch { case _: Exception => None }
}
