package graft

import graft.operators.{Dedup, PhraseSearch}

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox and the quick brown dog"),
    (2L, "brown quick the reversed words"),
    (3L, "quick brown at the start")).toDF("doc_id", "text")

  test("phraseOccurrences counts consecutive matches only") {
    val got = PhraseSearch.phraseOccurrences(docs, "doc_id", "text",
        Seq("quick", "brown"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L)) // doc2 has the words, not the phrase
  }

  test("three-term phrase alignment") {
    val got = PhraseSearch.phraseOccurrences(docs, "doc_id", "text",
        Seq("the", "quick", "brown"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
  }

  test("winnowing: identical docs share all fingerprints; edited doc shares most") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (4L, "completely different words in this unrelated document here now"))
      .toDF("doc_id", "text")
    val fp1 = Dedup.winnowFingerprints(corpus.where($"doc_id" === 1), "doc_id", "text")
      .count()
    val pairs = Dedup.winnowPairs(corpus, "doc_id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == fp1) // identical → full overlap
    assert(pairs.get((1L, 3L)).exists(n => n >= 1 && n < fp1)) // edit → partial
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }
}
