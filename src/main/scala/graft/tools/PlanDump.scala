package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump a named query's executed plan (same view the
  * ScaleDesignSpec pins read) for shape debugging.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .appName("graft-plandump").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
