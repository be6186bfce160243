package graft

import graft.operators.RankFusion

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  private val kw = Seq((10L, 5.0), (20L, 3.0), (30L, 1.0)).toDF("id", "score")
  private val sem = Seq((20L, 0.9), (40L, 0.8)).toDF("id", "score")

  test("rrf sums 1/(k+rank) per source, k=60") {
    val got = RankFusion.rrf(Seq(("kw", kw, 1.0), ("sem", sem, 1.0)), "id", "score")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(math.abs(got(10L)._1 - 1.0 / 61) < 1e-12)
    assert(math.abs(got(20L)._1 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(got(40L)._1 - 1.0 / 62) < 1e-12)
    assert(got(20L)._2 == 2) // in both lists
  }

  test("rrf respects per-source weights") {
    val got = RankFusion.rrf(Seq(("kw", kw, 2.0), ("sem", sem, 0.5)), "id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(10L) - 2.0 / 61) < 1e-12)
    assert(math.abs(got(40L) - 0.5 / 62) < 1e-12)
  }

  test("weightedCombSum min-max normalizes each list") {
    val got = RankFusion.weightedCombSum(Seq(("kw", kw, 1.0), ("sem", sem, 1.0)), "id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // kw: 5→1.0, 3→0.5, 1→0.0 ; sem: 0.9→1.0, 0.8→0.0
    assert(math.abs(got(10L) - 1.0) < 1e-12)
    assert(math.abs(got(20L) - (0.5 + 1.0)) < 1e-12)
    assert(math.abs(got(30L) - 0.0) < 1e-12)
    assert(math.abs(got(40L) - 0.0) < 1e-12)
  }
}
