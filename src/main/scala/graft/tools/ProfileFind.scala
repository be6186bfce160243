package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the fields-restricted hybrid find (q104 — the
  * slowest non-capstone query after round 10): times each stage of the
  * request in isolation so the residual cost has a measured breakdown
  * (NEXT.md round-11 candidate #1).
  */
object ProfileFind {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile-find").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.api.Find
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ix = graft.sources.IndexStore.tables(spark, sfDir)
    val vix = graft.sources.IndexStore.vectorIndex(spark, sfDir)
    val terms = Seq("spark", "query") // SparkEntry.QueryTerms (private)

    def time(label: String)(f: => Long): Unit = Timing.time(label)(f)

    time("qv collect")(
      emb.where(col("vec_id") === 0).select("embedding").collect().length.toLong)
    val qv = emb.where(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)

    val fieldsTab = ix.fields.get
    time("fields-table spec scan")(
      fieldsTab.where(col("field_type") === "c").count())
    val allowed = docs.join(
      fieldsTab.where(col("field_type") === "c").select("doc_id"),
      Seq("doc_id"), "left_semi").select("doc_id")
    time("allowed-ids count (density probe)")(allowed.count())

    time("bm25 postings, no allow-set")(
      graft.functions.Bm25.scoreFromPostings(ix.postings, ix.docLengths,
        "doc_id", terms).count())
    time("bm25 postings, allowed = docs⋉fields(c)")(
      graft.functions.Bm25.scoreFromPostings(ix.postings, ix.docLengths,
        "doc_id", terms, allowed = Some(allowed)).count())
    val allowedCached = graft.Caches.cache(allowed)
    allowedCached.count()
    time("bm25 postings, allowed CACHED")(
      graft.functions.Bm25.scoreFromPostings(ix.postings, ix.docLengths,
        "doc_id", terms, allowed = Some(allowedCached)).count())
    graft.Caches.releaseAll()

    val corpus = Find.Corpus(docs, "doc_id", "text", Some(emb),
      index = Some(ix), vectorIndex = Some(vix), annBruteThreshold = 1)
    time("keyword-only find (fields=c)")(
      Find.find(corpus, Find.FindRequest(query = terms.mkString(" "),
        fields = Seq("c"), topK = 20)).count())
    time("semantic-only find (fields=c, brute)")(
      Find.find(corpus, Find.FindRequest(queryVector = Some(qv),
        fields = Seq("c"), topK = 20)).count())
    try {
      time("hybrid find (q104 shape)")(
        Find.find(corpus, Find.FindRequest(query = terms.mkString(" "),
          queryVector = Some(qv), fields = Seq("c"), topK = 20)).count())
    } finally graft.Caches.releaseAll()
    time("hybrid find unrestricted (no fields)")(
      Find.find(corpus, Find.FindRequest(query = terms.mkString(" "),
        queryVector = Some(qv), topK = 20)).count())
    spark.stop()
  }
}
