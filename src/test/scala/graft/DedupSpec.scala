package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),   // near dup
    (4L, "completely different content about spark engines today"))
    .toDF("doc_id", "text")

  test("exactStats counts distinct fingerprints") {
    val r = Dedup.exactStats(docs, "doc_id", "text").collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
  }

  test("exactKeepList keeps min id per duplicate group") {
    val kept = Dedup.exactKeepList(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(kept(1L) == 2) // group of docs 1,2 kept as 1 with 2 members
    assert(kept(3L) == 1 && kept(4L) == 1)
  }

  test("minHashLsh finds exact dup with est 1.0 and near dup above threshold") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 8, bandSize = 2, minEstJaccard = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngramJaccardPairs computes exact jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    // docs 1 and 3 share 4 of 7+7 distinct 3-shingles → J = 4/10
    assert(math.abs(pairs((1L, 3L)) - 0.4) < 1e-9)
  }
}
