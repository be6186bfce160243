package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the paragraph-BM25 family (round-10 task #1):
  * times each sub-plan of q90/q91/q102 in isolation so the verdict's
  * "where do the 2 s go" question gets a measured answer.
  */
object ProfileBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val terms = Seq("spark", "query")
    val ix = graft.sources.IndexStore.tables(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Long): Unit = Timing.time(label)(f)

    time("par_postings full count")(ix.parPostings.get.count())
    time("par_doclengths full count")(ix.parDocLengths.get.count())
    time("matched postings (term IN)")(
      ix.parPostings.get.where(col("term").isInCollection(terms)).count())
    time("fieldpar matched (term IN)")(
      ix.fieldParPostings.get.where(col("term").isInCollection(terms)).count())
    time("dls agg stats")(
      ix.parDocLengths.get.agg(count(lit(1)), avg("dl")).collect().length.toLong)
    time("bm25 scoreFromPostings (no topk)")(
      graft.functions.Bm25.scoreFromPostings(ix.parPostings.get,
        ix.parDocLengths.get, "paragraph_id", terms).count())
    time("q90 searchFromPostings")(
      graft.functions.Bm25.searchFromPostings(ix.parPostings.get,
        ix.parDocLengths.get, "paragraph_id", terms, 15).count())
    val base = docs.where(col("lang") === "en")
    time("base docs filter count")(base.count())
    val idParts = split(col("paragraph_id"), "/")
    time("dls ⋉ doc prefix")(
      ix.parDocLengths.get.join(
        base.select(col("doc_id").cast("string").as("__allowed_doc")).distinct(),
        idParts.getItem(0) === col("__allowed_doc"), "left_semi").count())
    time("q91 full findParagraphs")(
      graft.api.Find.findParagraphs(
        graft.api.Find.Corpus(docs, "doc_id", "text", index = Some(ix)),
        graft.api.Find.FindRequest(query = terms.mkString(" "),
          filter = Some(graft.operators.FilterExpr.Eq("lang", "en")), topK = 20,
          paragraphBm25 = true)).count())
    time("q102 full findParagraphs")(
      graft.api.Find.findParagraphs(
        graft.api.Find.Corpus(docs, "doc_id", "text", index = Some(ix)),
        graft.api.Find.FindRequest(query = terms.mkString(" "),
          fields = Seq("a"), paragraphBm25 = true, topK = 20)).count())
    spark.stop()
  }
}
