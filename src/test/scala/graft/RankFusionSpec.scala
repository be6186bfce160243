package graft

import graft.operators.RankFusion

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  private val kw = Seq((10L, 5.0), (20L, 3.0), (30L, 1.0)).toDF("id", "score")
  private val sem = Seq((20L, 0.9), (40L, 0.8)).toDF("id", "score")
  private val empty = Seq.empty[(Long, Double)].toDF("id", "score")

  test("rrf sums 1/(k+rank) per source, 0-based rank, k=60") {
    val got = RankFusion.rrf(Seq(("kw", kw, 1.0), ("sem", sem, 1.0)), "id", "score")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // rank is 0-based like the reference's enumerate (rank_fusion.py:
    // 161-165): the top item of each list contributes 1/(60+0)
    assert(math.abs(got(10L)._1 - 1.0 / 60) < 1e-12)
    assert(math.abs(got(20L)._1 - (1.0 / 61 + 1.0 / 60)) < 1e-12)
    assert(math.abs(got(40L)._1 - 1.0 / 61) < 1e-12)
    assert(got(20L)._2 == 2) // in both lists
  }

  test("rrf respects per-source weights") {
    val got = RankFusion.rrf(Seq(("kw", kw, 2.0), ("sem", sem, 0.5)), "id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(10L) - 2.0 / 60) < 1e-12)
    assert(math.abs(got(40L) - 0.5 / 61) < 1e-12)
  }

  // the reference's upstream unit vectors (tests/search/unit/
  // test_rank_fusion.py test_reciprocal_rank_fusion_algorithm): the
  // three-source mixed case pins 0-based contributions per list
  test("rrf matches the upstream three-source test vectors") {
    val k = Seq(("k-1", 1.0), ("k-2", 4.0), ("k-3", 3.0)).toDF("id", "score")
    val s = Seq(("s-1", 0.2), ("s-2", 0.3), ("s-3", 0.6), ("s-4", 0.4))
      .toDF("id", "score")
    val g = Seq(("g-1", 1.0), ("g-2", 1.0)).toDF("id", "score")
    val got = RankFusion.rrf(
        Seq(("keyword", k, 1.0), ("semantic", s, 1.0), ("graph", g, 1.0)),
        "id", "score", k = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expected = Map(
      "k-2" -> 1.0 / 20, "s-3" -> 1.0 / 20, "g-1" -> 1.0 / 20,
      "k-3" -> 1.0 / 21, "s-4" -> 1.0 / 21, "g-2" -> 1.0 / 21,
      "k-1" -> 1.0 / 22, "s-2" -> 1.0 / 22,
      "s-1" -> 1.0 / 23)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(math.abs(got(id) - e) < 1e-12, s"$id: ${got(id)} vs $e")
    }
  }

  test("single non-empty source skips fusion and keeps original scores") {
    // the reference's base fuse() (rank_fusion.py:74-90): presence is
    // a property of the RESULT sets — a request shaped for two sources
    // whose second list came back empty returns the survivor's
    // original, unweighted scores (upstream vectors: 'only keyword
    // results (we maintain original scores)')
    val got = RankFusion.rrf(Seq(("kw", kw, 2.0), ("sem", empty, 1.0)),
        "id", "score")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == Map(10L -> (5.0, 1L), 20L -> (3.0, 1L), 30L -> (1.0, 1L)),
      got.toString)
    val gotW = RankFusion.weightedCombSum(
        Seq(("kw", empty, 1.0), ("sem", sem, 3.0)), "id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotW == Map(20L -> 0.9, 40L -> 0.8), gotW.toString)
  }

  test("weightedCombSum multiplies RAW scores by the list weight (upstream multi-match vector)") {
    import spark.implicits._
    // test_rank_fusion.py test_weighted_comb_sum_rank_fusion: keyword
    // w=2, semantic w=0.5, graph w=1.5 (the default_weight slot);
    // expected raw-score sums like 0.3*2.0 + 6*0.5 — NO normalization
    val kw3 = Seq(("r-1", 0.1), ("r-2", 0.5), ("r-4", 0.3)).toDF("id", "score")
    val sem3 = Seq(("r-1", 2.0), ("r-3", 3.0), ("r-4", 6.0), ("r-5", 6.0))
      .toDF("id", "score")
    val graph3 = Seq(("r-1", 1.0), ("r-6", 1.0)).toDF("id", "score")
    val got = RankFusion.weightedCombSum(
        Seq(("keyword", kw3, 2.0), ("semantic", sem3, 0.5),
          ("graph", graph3, 1.5)), "id", "score")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expected = Map(
      "r-4" -> (0.3 * 2.0 + 6 * 0.5), "r-5" -> 6 * 0.5,
      "r-1" -> (0.1 * 2.0 + 2 * 0.5 + 1.0 * 1.5), "r-3" -> 3 * 0.5,
      "r-6" -> 1.0 * 1.5, "r-2" -> 0.5 * 2.0)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(math.abs(got(id) - e) < 1e-12, s"$id: ${got(id)} vs $e")
    }
  }

  test("n_sources counts DISTINCT lists: a duplicated id within one list reports the same through fused and single-list paths") {
    import spark.implicits._
    // id "a" appears TWICE in the keyword list; n_sources must count
    // lists-with-the-id, not rows — the single-list passthrough dedups
    // by id and reports 1, so the fused path must agree on the same
    // duplicated input (ADVICE r14)
    val dup = Seq(("a", 5.0), ("a", 3.0), ("b", 1.0)).toDF("id", "score")
    val other = Seq(("b", 2.0)).toDF("id", "score")
    val single = RankFusion.rrf(Seq(("kw", dup, 1.0)), "id", "score")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val fused = RankFusion.rrf(
        Seq(("kw", dup, 1.0), ("sem", other, 1.0)), "id", "score")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(single("a") == 1L && fused("a") == 1L,
      s"duplicated-id n_sources must be 1 on both paths: $single vs $fused")
    assert(fused("b") == 2L)
    val comb = RankFusion.weightedCombSum(
        Seq(("kw", dup, 1.0), ("sem", other, 1.0)), "id", "score")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(comb("a") == 1L && comb("b") == 2L)
  }
}
