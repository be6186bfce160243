package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the curate keeper-selection shapes (round 18):
  * the corpus-window form (`oldShape` — the shape Pipeline.curate
  * SHIPS, plus an ids-only projection there) vs the component-side
  * anti-join (`newShape` — tried this round and REJECTED on these
  * numbers: old min 1.438 s vs new 2.007 s at sf0.1). Same host, same
  * JVM, alternating passes, so a flapping host window cannot
  * masquerade as a code delta.
  */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    import graft.operators.Dedup
    import graft.functions.TextFunctions

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("lang") === "en")
    def base(): (DataFrame, DataFrame) = {
      val toks = TextFunctions.tokens(col("text"))
      val qualityPred = element_at(transform(array(toks), t =>
        size(t) >= 30 &&
          round(TextFunctions.meanTokenLen(t), 4).between(4.2, 5.0)), 1)
      val quality = docs.where(qualityPred)
      val keepExact = quality.join(
        Dedup.exactKeepList(docs, "doc_id", "text")
          .select(col("keep_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      val pairs = Dedup.minHashLshFromSignatures(
        graft.sources.IndexStore.signatures(spark, sfDir)
          .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi"),
        "doc_id", numHashes = 8, bandSize = 2, minEstJaccard = 0.25)
      val comp = Dedup.dedupClusters(pairs, "a", "b")
        .withColumnRenamed("node", "doc_id")
      (keepExact, comp)
    }
    def oldShape(): Long = {
      val (keepExact, comp) = base()
      import org.apache.spark.sql.expressions.Window
      val r = keepExact.join(comp, Seq("doc_id"), "left")
        .withColumn("__grp", coalesce(col("component"), col("doc_id")))
        .withColumn("__keep",
          min(col("doc_id")).over(Window.partitionBy("__grp")))
        .where(col("doc_id") === col("__keep"))
        .drop("component", "__grp", "__keep")
        .count()
      graft.Caches.releaseAll(); r
    }
    def newShape(): Long = {
      val (keepExact, comp) = base()
      val compSurvivors = comp.join(keepExact.select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      val keepers = compSurvivors.groupBy("component")
        .agg(min(col("doc_id")).as("__keep"))
      val losers = comp.join(keepers, Seq("component"))
        .where(col("doc_id") =!= col("__keep"))
        .select(col("doc_id"))
      val r = keepExact.join(losers, Seq("doc_id"), "left_anti").count()
      graft.Caches.releaseAll(); r
    }
    oldShape(); newShape() // warmup both
    val n = 5
    val times = (1 to n).flatMap { _ =>
      val t0 = System.nanoTime(); val c1 = oldShape()
      val t1 = System.nanoTime(); val c2 = newShape()
      val t2 = System.nanoTime()
      assert(c1 == c2, s"shapes disagree: $c1 vs $c2")
      Seq(("old", (t1 - t0) / 1e9), ("new", (t2 - t1) / 1e9))
    }
    Seq("old", "new").foreach { k =>
      val ts = times.collect { case (`k`, t) => t }
      println(f"[curate-ab] $k min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
