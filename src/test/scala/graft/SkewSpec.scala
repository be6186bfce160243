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

  test("salted sum equals direct sum") {
    val direct = skewed.groupBy("key").sum("v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(skewed, "key", "v", saltFactor = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, v) => assert(math.abs(salted(k) - v) < 1e-9) }
  }
}
