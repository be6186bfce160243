package graft

import graft.functions.Bm25

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
}
