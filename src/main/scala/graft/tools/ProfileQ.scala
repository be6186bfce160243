package graft.tools

import org.apache.spark.sql.SparkSession

/** Profiling harness: run named [[graft.SparkEntry]] queries N times
  * against SPARK_GRAFT_SF_DIR (one untimed warmup, then N timed
  * passes; prints min/mean/all). Finer-grained than [[graft.Bench]]
  * for chasing a single query's regression — used in round 14 to
  * isolate the rank-fusion presence-window cost on the hybrid find.
  *
  * Usage: runMain graft.tools.ProfileQ q104_find_fields_hybrid[,more] [passes]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args(0).split(",").toSeq
    val n = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => println(s"$name warmup FAILED: $e") }
      graft.Caches.releaseAll()
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Caches.releaseAll()
        dt
      }
      println(f"$name: min=${times.min}%.3f mean=${times.sum / n}%.3f all=" +
        times.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
