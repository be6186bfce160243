package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion over scored result lists — pure DataFrame ops
  * (window + groupBy), no UDFs.
  *
  * Reference: ReciprocalRankFusion and WeightedCombSum in
  * `nucliadb/src/nucliadb/search/search/rank_fusion.py:106-254`;
  * RRF constant k=60, per-source boost weights, dedup by paragraph id.
  *
  * Scale design: every input list is CUT to the fusion window
  * (≤ MAX_RANK_FUSION_WINDOW = 500 rows, enforced here — the reference
  * clamps identically, `nucliadb_models/src/nucliadb_models/search.py:352`)
  * with a TakeOrderedAndProject top-k BEFORE any window function runs,
  * so fusion operates on tiny data regardless of corpus size. The
  * rank window partitions on a constant: its input is already bounded
  * by the cut, so single-partition execution is by construction safe.
  */
object RankFusion {

  val DefaultK = 60

  /** Hard cap on per-list fusion input (reference
    * MAX_RANK_FUSION_WINDOW). Cutting a list to the top `window` rows
    * in (score desc, id asc) order leaves the ranks of surviving rows
    * unchanged — identical to ranking the full list and keeping
    * rank ≤ window. */
  val MaxWindow = 500

  /** Deterministic rank within one already-bounded list: score desc,
    * id asc tiebreak. The constant partition key keeps the plan an
    * explicit (bounded) single-partition window. */
  private def ranked(df: DataFrame, idCol: String, scoreCol: String, window: Int): DataFrame =
    TopK.topK(df, scoreCol, idCol, window)
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(TopK.constPartitionKey(col(idCol)))
            .orderBy(col(scoreCol).desc, col(idCol).asc)))

  /** Reciprocal Rank Fusion: score(d) = Σ_lists w_l / (k + rank_l(d)).
    *
    * @param lists (sourceName → (df with idCol+scoreCol, weight))
    * @return (idCol, rrf_score, n_sources) — un-rounded
    */
  def rrf(
      lists: Seq[(String, DataFrame, Double)],
      idCol: String,
      scoreCol: String,
      k: Int = DefaultK,
      window: Int = MaxWindow): DataFrame =
    rrfFused(lists, idCol, scoreCol, k, window)
      .select(col(idCol),
        when(col("__nl") === 1, col("__orig_max"))
          .otherwise(col("__rrf")).as("rrf_score"),
        col("n_sources"))

  /** [[rrf]] plus score PROVENANCE — the raw-retrieval (/retrieve)
    * response shape (`nucliadb_models/retrieval.py:154-240` Scores:
    * current value + per-source history): one `score_<name>` column
    * per input list holds the id's ORIGINAL index score there (null
    * when the id didn't appear in that list), and `n_present_sources`
    * is the GLOBAL count of lists with any results — the `fuse()`
    * skip predicate (`rank_fusion.py:74-90`), letting the caller tell
    * a fused score (source=rank_fusion) from a single-source
    * passthrough (source=index). Fusion semantics identical to [[rrf]]
    * (shared cut/rank/skip core).
    */
  def rrfWithScores(
      lists: Seq[(String, DataFrame, Double)],
      idCol: String,
      scoreCol: String,
      k: Int = DefaultK,
      window: Int = MaxWindow): DataFrame = {
    val srcSel = lists.map { case (name, _, _) => col(s"score_$name") }
    rrfFused(lists, idCol, scoreCol, k, window)
      .select(Seq(col(idCol),
        when(col("__nl") === 1, col("__orig_max"))
          .otherwise(col("__rrf")).as("rrf_score"),
        col("n_sources"),
        col("__nl").cast("long").as("n_present_sources")) ++ srcSel: _*)
  }

  /** Shared RRF internals: cut + rank each list, union, and aggregate
    * the fused score, the single-nonempty-source skip resolution
    * inputs, and the per-source score pivots. */
  private def rrfFused(
      lists: Seq[(String, DataFrame, Double)],
      idCol: String,
      scoreCol: String,
      k: Int,
      window: Int): DataFrame = {
    require(lists.map(_._1).distinct.size == lists.size,
      "rank-fusion source names must be distinct")
    // rank is 0-BASED like the reference's enumerate (`rank_fusion.py:
    // 161-165` — the top item contributes 1/(k+0), pinned by the
    // upstream unit vectors); row_number() is 1-based, hence the -1
    val contributions = lists.zipWithIndex.map { case ((_, df, w), i) =>
      ranked(df, idCol, scoreCol, window)
        .select(col(idCol),
          col(scoreCol).cast("double").as("__orig"),
          (lit(w) / (lit(k.toDouble) + col("rank") - lit(1))).as("contrib"),
          lit(i).as("__list"))
    }
    // the reference SKIPS fusion when only one source has RESULTS
    // (`rank_fusion.py:74-90` fuse() — presence is a property of the
    // result sets, not the request): the surviving list keeps its
    // ORIGINAL scores, unweighted. Presence is decided on the fused
    // union itself (already ≤ lists×window rows) with one bounded
    // constant-partition window — no extra driver action per request
    val unioned = contributions.reduce(_ unionByName _)
      .withColumn("__n_lists",
        size(collect_set(col("__list")).over(
          Window.partitionBy(TopK.constPartitionKey(col(idCol))))))
    val srcAggs = lists.zipWithIndex.map { case ((name, _, _), i) =>
      max(when(col("__list") === i, col("__orig"))).as(s"score_$name")
    }
    unioned
      .groupBy(idCol)
      .agg(sum("contrib").as("__rrf"),
        (Seq(max(col("__orig")).as("__orig_max"),
          max(col("__n_lists")).as("__nl"),
          count(lit(1)).as("n_sources")) ++ srcAggs): _*)
  }

  /** Weighted CombSum over RAW scores:
    * wCombSUM(d) = Σ_lists w_l · S_l(d) — the reference multiplies
    * each list's score by its weight and sums, with NO per-list
    * normalization (`rank_fusion.py:188-254` `score += item.score *
    * weight`; upstream vector `test_rank_fusion.py` pins
    * `0.3*2.0 + 6*0.5`). Comparing raw scores across heterogeneous
    * lists is the documented caveat of the algorithm itself.
    */
  def weightedCombSum(
      lists: Seq[(String, DataFrame, Double)],
      idCol: String,
      scoreCol: String,
      window: Int = MaxWindow): DataFrame = {
    val weighted = lists.zipWithIndex.map { case ((_, df, w), i) =>
      val cut = TopK.topK(df, scoreCol, idCol, window)
      cut.select(col(idCol),
        col(scoreCol).cast("double").as("__orig"),
        (col(scoreCol).cast("double") * lit(w)).as("contrib"),
        lit(i).as("__list"))
    }
    // same single-nonempty-source skip as [[rrf]] — the base-class
    // fuse() contract (`rank_fusion.py:74-90`) applies to both
    // algorithms: one surviving list returns original unweighted
    // scores
    val unioned = weighted.reduce(_ unionByName _)
      .withColumn("__n_lists",
        size(collect_set(col("__list")).over(
          Window.partitionBy(TopK.constPartitionKey(col(idCol))))))
    unioned
      .groupBy(idCol)
      .agg(sum("contrib").as("__sum"),
        max(col("__orig")).as("__orig_max"),
        max(col("__n_lists")).as("__nl"),
        count(lit(1)).as("n_sources"))
      .select(col(idCol),
        when(col("__nl") === 1, col("__orig_max"))
          .otherwise(col("__sum")).as("fused_score"),
        col("n_sources"))
  }
}
