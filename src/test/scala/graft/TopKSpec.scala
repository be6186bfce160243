package graft

import org.apache.spark.sql.functions.{col, explode}
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

  test("symSpellMatchTerms equals the levenshtein scan on a randomized dictionary") {
    import graft.functions.TextFunctions
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // seeded generator over a tiny alphabet: dense coverage of
    // ins/del/sub/transpose collisions without flaky randomness
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    def word() = (1 to (1 + rnd.nextInt(7)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val dict = (1 to 300).map(_ => word()).distinct
    val deletes = dict.toDF("term").select(
      explode(TextFunctions.deleteVariants(col("term"))).as("variant"),
      col("term"))
    (1 to 25).map(_ => word()).distinct.foreach { q =>
      val expected = dict.filter(t => lev(t, q) <= 1).toSet
      val sym = TopK.symSpellMatchTerms(deletes, q)
        .collect().map(_.getString(0)).toSet
      assert(sym == expected, s"'$q': symspell $sym != levenshtein $expected")
    }
  }
}
