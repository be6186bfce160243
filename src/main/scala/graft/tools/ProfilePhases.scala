package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase profiler (round 18, optimization): splits one query's cost
  * into the three places a request spends time —
  *   build: the `queries(name)(spark, dir)` call itself (API-side
  *          eager work: query-vector collects, density probes,
  *          fallback page collects, fuzzy expansions);
  *   plan:  forcing `queryExecution.executedPlan` on the returned
  *          frame (Catalyst analysis + optimization + physical
  *          planning of whatever is still lazy);
  *   exec:  the terminal `.count()` (the bench's timed action) on the
  *          already-planned frame.
  * The bench times build+plan+exec together; this attributes the
  * total so the optimization targets the right phase (guide §1:
  * decide whether the time is compute, planning, or driver work).
  *
  * Usage: runMain graft.tools.ProfilePhases q104_find_fields_hybrid[,more] [passes]
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.isEmpty || args(0) == "all")
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try { fn(spark, sfDir).count() } // warmup: codegen + JIT + memos
      catch { case e: Throwable => println(s"$name warmup FAILED: $e") }
      graft.Caches.releaseAll()
      val phases = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        graft.Caches.releaseAll()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      // min of each phase independently (noise shielding, same spirit
      // as the bench's min-of-2)
      val b = phases.map(_._1).min
      val p = phases.map(_._2).min
      val e = phases.map(_._3).min
      println(f"[phases] $name%-36s total=${b + p + e}%6.3f build=$b%6.3f plan=$p%6.3f exec=$e%6.3f")
    }
    spark.stop()
  }
}
