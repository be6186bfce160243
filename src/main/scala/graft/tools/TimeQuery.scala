package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time named queries standalone (min of 3 after warm) — the
  * single-query adjudication tool for bench deviations (per-query
  * bests compare runs from hosts at different loads; this isolates one
  * query on the current host).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .appName("graft-timequery").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Long =
        try fn(spark, sfDir).count()
        finally graft.Caches.releaseAll()
      val (min, times, _) = Timing.measure(run())
      println(f"[timequery] $name%-32s min=$min%6.3fs runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
