package graft

import graft.operators.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1L to 100L).map(i => (i, (i % 10).toDouble)).toDF("id", "score")

  test("searchAfter pages are disjoint and union to the global top-N") {
    val p1 = TopK.topK(df, "score", "id", 10).collect()
    val last = p1.last
    val p2 = TopK.searchAfter(df, "score", "id",
      TopK.Cursor(last.getDouble(1), last.getLong(0)), 10).collect()
    val all = (p1 ++ p2).map(_.getLong(0))
    assert(all.distinct.length == 20)
    // identical to a single top-20
    val top20 = TopK.topK(df, "score", "id", 20).collect().map(_.getLong(0))
    assert(all.sameElements(top20))
  }

  test("page walks cursors to the requested page") {
    val p3 = TopK.page(df, "score", "id", k = 10, page = 3).collect().map(_.getLong(0))
    val top30 = TopK.topK(df, "score", "id", 30).collect().map(_.getLong(0))
    assert(p3.sameElements(top30.drop(20)))
  }

  test("suggest falls back to fuzzy when exact prefix is empty") {
    val terms = Seq(("spark", 10L), ("spars", 4L), ("flink", 2L)).toDF("term", "freq")
    val exact = TopK.suggestWithFuzzyFallback(terms, "term", "freq", "spar", 5)
      .collect().map(_.getString(0))
    assert(exact.sameElements(Array("spark", "spars"))) // prefix hit
    val fuzzy = TopK.suggestWithFuzzyFallback(terms, "term", "freq", "spurk", 5)
      .collect().map(_.getString(0))
    assert(fuzzy.sameElements(Array("spark"))) // levenshtein 1
  }

  test("searchAfterWithSkips removes already-shown ids and keeps the page full") {
    val data = (1L to 40L).map(i => (i, (100 - i).toDouble)).toDF("id", "score")
    // cursor at global rank 10 (id 10); ids 12 and 14 already shown
    val cur = TopK.Cursor(90.0, 10L)
    val got = TopK.searchAfterWithSkips(data, "score", "id", cur,
        skip = Seq(12L, 14L), k = 10)
      .collect().map(_.getLong(0))
    // rows after the cursor minus the skips, still k rows deep
    assert(got.sameElements(Array(11L, 13L, 15L, 16L, 17L, 18L, 19L, 20L, 21L, 22L)))
    // empty skip degrades to plain searchAfter
    val plain = TopK.searchAfterWithSkips(data, "score", "id", cur, Nil, 5)
      .collect().map(_.getLong(0))
    assert(plain.sameElements(Array(11L, 12L, 13L, 14L, 15L)))
  }

  test("fuzzy-prefix suggest completes a typo'd stem") {
    val terms = Seq(("window", 10L), ("windows", 6L), ("windowing", 3L),
      ("widow", 2L), ("wind", 9L), ("summer", 5L)).toDF("term", "freq")
    // "qindow" (substituted first char) still completes the window
    // family — the whole point of prefix (not whole-term) fuzziness
    val got = TopK.suggestFuzzyPrefix(terms, "term", "freq", "qindow", 5)
      .collect().map(_.getString(0))
    assert(got.toSet == Set("window", "windows", "windowing"))
    // exact prefix is distance 0 — subsumed
    val exact = TopK.suggestFuzzyPrefix(terms, "term", "freq", "window", 5)
      .collect().map(_.getString(0))
    assert(exact.contains("window") && exact.contains("windows"))
  }
}
