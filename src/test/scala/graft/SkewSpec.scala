package graft

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one key — the shape that hot-spots a shuffle
  private val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("key", "v")

  test("salted count equals direct groupBy count") {
    val direct = skewed.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, "key", saltFactor = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted pair counts equal the plain inverted-index join on a degenerate corpus") {
    // stop-shingle fixture: every doc contains "the quick brown" → one
    // bucket holds the whole corpus; salting must not change the pairs
    import graft.operators.Dedup
    val docs = (1 to 30).map(i =>
        (i.toLong, s"the quick brown item$i thing${i % 7} extra${i % 3} word$i"))
      .toDF("doc_id", "text")
    def pairs(salt: Int) =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.0,
          saltFactor = salt, hotThreshold = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val plain = pairs(1)
    val salted = pairs(8)
    assert(plain.nonEmpty && salted == plain)
  }

  test("salted sum equals direct sum") {
    val direct = skewed.groupBy("key").sum("v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(skewed, "key", "v", saltFactor = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, v) => assert(math.abs(salted(k) - v) < 1e-9) }
  }
}
