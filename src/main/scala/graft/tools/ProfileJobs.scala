package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Job/stage/task profiler (round 18, optimization): counts the Spark
  * jobs, stages and tasks one query pays end-to-end (construction
  * collects + the terminal count), via a listener. A request that
  * launches several jobs serializes their scheduling latency — the
  * number to minimize for serving-shaped work (guide §1.2 step 1:
  * don't pay passes you don't need).
  *
  * Usage: runMain graft.tools.ProfileJobs q104_find_fields_hybrid[,more|all]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.isEmpty || args(0) == "all")
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
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
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try { fn(spark, sfDir).count() } // warmup (memos, codegen)
      catch { case e: Throwable => println(s"$name warmup FAILED: $e") }
      graft.Caches.releaseAll()
      // settle listener events from the warmup before counting
      // (listenerBus is private[spark]; a short sleep drains it — the
      // counts here are diagnostics, off-by-a-straggler is fine)
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Caches.releaseAll()
      Thread.sleep(300)
      println(f"[jobs] $name%-36s t=$dt%6.3f jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d")
    }
    spark.stop()
  }
}
