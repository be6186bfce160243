package graft

import graft.functions.Bm25
import graft.sources.Ingest

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // 3-doc corpus: "spark" in docs 1,2 (df=2); "query" only in doc 3 (df=1)
  private val corpus = Seq(
    (1L, "spark spark engine"),
    (2L, "spark fast"),
    (3L, "query planner")).toDF("doc_id", "text")

  private def idf(n: Double, df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
  private def tfn(tf: Double, dl: Double, avgdl: Double, k1: Double = 1.2, b: Double = 0.75) =
    tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

  test("score matches hand-computed BM25 (Lucene idf, k1=1.2 b=0.75)") {
    val got = Bm25.score(corpus, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val avgdl = (3.0 + 2.0 + 2.0) / 3
    val expected = Map(
      1L -> idf(3, 2) * tfn(2, 3, avgdl),
      2L -> idf(3, 2) * tfn(1, 2, avgdl),
      3L -> idf(3, 1) * tfn(1, 2, avgdl))
    expected.foreach { case (id, exp) =>
      assert(math.abs(got(id) - exp) < 1e-9, s"doc $id: got ${got(id)} want $exp")
    }
  }

  test("rare terms outscore common terms at equal tf/dl") {
    val got = Bm25.score(corpus, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc3 ("query", df=1, tf=1, dl=2) must beat doc2 ("spark", df=2, tf=1, dl=2)
    assert(got(3L) > got(2L))
  }

  test("search returns deterministic top-k with id tiebreak") {
    val rows = Bm25.search(corpus, "doc_id", "text", Seq("spark"), 2)
      .collect().map(_.getLong(0))
    assert(rows.sameElements(Array(1L, 2L)))
  }

  // at-rest index tables for the posting-path parity tests
  private lazy val postings = Ingest.termPostings(corpus, "doc_id", "text")
  private lazy val dls = Bm25.docLengths(corpus, "doc_id", "text")

  test("scoreFromPostings(allowed) equals score() over the prefiltered corpus") {
    val allowedIds = Seq(1L, 3L).toDF("doc_id")
    val filtered = corpus.where($"doc_id".isin(1L, 3L))
    val direct = Bm25.score(filtered, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaPostings = Bm25.scoreFromPostings(postings, dls, "doc_id",
        Seq("spark", "query"), allowed = Some(allowedIds))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaPostings.keySet == direct.keySet)
    direct.foreach { case (id, exp) =>
      assert(math.abs(viaPostings(id) - exp) < 1e-12,
        s"doc $id: postings ${viaPostings(id)} vs direct $exp")
    }
    // the restriction changes df/avgdl, not just the candidate set:
    // doc 1's score must differ from the unfiltered corpus run
    val unfiltered = Bm25.score(corpus, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(viaPostings(1L) - unfiltered(1L)) > 1e-9,
      "allowed must restrict corpus statistics, not only candidates")
  }

  test("scoreAllFromPostings equals scoreAll (AND semantics from the pruned posting scan)") {
    val withBoth = Seq((4L, "spark query engine")).toDF("doc_id", "text")
      .unionByName(corpus)
    val p = Ingest.termPostings(withBoth, "doc_id", "text")
    val d = Bm25.docLengths(withBoth, "doc_id", "text")
    val direct = Bm25.scoreAll(withBoth, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val via = Bm25.scoreAllFromPostings(p, d, "doc_id", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(via.keySet == direct.keySet && via.keySet == Set(4L))
    direct.foreach { case (id, exp) => assert(math.abs(via(id) - exp) < 1e-12) }
  }

  test("searchFromPostings equals search (rounding, order, cut)") {
    val direct = Bm25.search(corpus, "doc_id", "text", Seq("spark", "query"), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val via = Bm25.searchFromPostings(postings, dls, "doc_id",
        Seq("spark", "query"), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(via.sameElements(direct))
  }

  test("at-rest df + cached stats path equals the live-aggregation path") {
    // round 18: termPostings denormalizes df; an unrestricted request
    // reading it (plus inlined (N, avgdl) literals) must score
    // bit-identically to the per-request aggregation
    val stats = Bm25.corpusStats(dls, "doc_id")
    val live = Bm25.scoreFromPostings(postings, dls, "doc_id",
        Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val atRest = Bm25.scoreFromPostings(postings, dls, "doc_id",
        Seq("spark", "query"), cachedStats = Some(stats),
        atRestDfCol = Some("df"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(atRest == live, s"at-rest $atRest vs live $live")
    // the at-rest plan reads ONE posting subtree and aggregates nothing
    // but the final per-doc sum: no broadcast join, no second scan
    val plan = Bm25.scoreFromPostings(postings, dls, "doc_id",
      Seq("spark", "query"), cachedStats = Some(stats),
      atRestDfCol = Some("df")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"at-rest BM25 plan still joins:\n$plan")
    // an `allowed` restriction must IGNORE the at-rest column (its
    // population is the unrestricted corpus)
    val restricted = Bm25.scoreFromPostings(postings, dls, "doc_id",
        Seq("spark", "query"), allowed = Some(Seq(1L, 3L).toDF("doc_id")),
        atRestDfCol = Some("df"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val restrictedLive = Bm25.scoreFromPostings(postings, dls, "doc_id",
        Seq("spark", "query"), allowed = Some(Seq(1L, 3L).toDF("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(restricted == restrictedLive)
  }

  test("a NULL dl posting row fails loudly instead of silently nulling the score") {
    // the shape a mixed-layout segment root produces: a multi-path
    // read schema-unions old (dl-less) and new postings, nulling dl
    // for old segments' rows — scoring must raise, not drop the doc
    val mixed = Seq((1L, "spark", 2L, Some(3L)), (2L, "spark", 1L, None))
      .toDF("doc_id", "term", "tf", "dl")
    val e = intercept[Exception] {
      Bm25.scoreFromPostings(mixed, dls, "doc_id", Seq("spark")).collect()
    }
    assert(e.getMessage.contains("NULL dl") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL dl")),
      s"wrong error: $e")
  }
}
