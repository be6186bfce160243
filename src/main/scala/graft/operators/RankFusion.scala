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

  /** Tag + union the window-cut lists, then compute PER-LIST rank,
    * the global presence count, and the union in ONE single-partition
    * window pass (the union is ≤ lists × window rows by construction):
    *
    *  - `rank`: deterministic rank WITHIN each list (score desc, id
    *    asc tiebreak) — a global row_number ordered (list, score desc,
    *    id) minus the count of earlier lists' rows (a range frame on
    *    the list tag), so no per-list window/exchange is needed;
    *  - `__n_lists`: how many lists have RESULTS — the reference's
    *    fuse() skip predicate (`rank_fusion.py:74-90`: presence is a
    *    property of the result sets, not the request).
    *
    * All three window specs share the constant partition key, so the
    * whole pass is one exchange of the bounded union (r13 shipped one
    * window PER list plus a presence window between union and
    * aggregate — measured 1.5× on the hybrid find; this shape is one
    * exchange cheaper than even the pre-presence plan, and keeps the
    * per-list sub-search subtrees running in parallel inside the one
    * action).
    */
  private def taggedRanked(
      lists: Seq[(String, DataFrame, Double)],
      idCol: String,
      scoreCol: String,
      window: Int): DataFrame = {
    require(lists.map(_._1).distinct.size == lists.size,
      "rank-fusion source names must be distinct")
    val tagged = lists.zipWithIndex.map { case ((_, df, w), i) =>
      TopK.topK(df, scoreCol, idCol, window)
        .select(col(idCol),
          col(scoreCol).cast("double").as("__orig"),
          lit(w).as("__w"), lit(i).as("__list"))
    }
    val w0 = Window.partitionBy(TopK.constPartitionKey(col(idCol)))
    val wOrd = w0.orderBy(col("__list").asc, col("__orig").desc,
      col(idCol).asc)
    val wPrior = w0.orderBy(col("__list"))
      .rangeBetween(Window.unboundedPreceding, -1)
    // all three window columns in ONE projection: Catalyst extracts
    // them into one stacked Window group over a single exchange of the
    // union — two separate withColumns re-project the constant key
    // under a fresh attribute and EnsureRequirements inserts a second
    // (pointless) exchange between the window nodes
    tagged.reduce(_ unionByName _)
      .select(col("*"),
        (row_number().over(wOrd) - count(lit(1)).over(wPrior)).as("rank"),
        size(collect_set(col("__list")).over(w0)).as("__n_lists"))
  }

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
    // a single INPUT list is always the fuse() passthrough (empty
    // stays empty, nonempty keeps original scores) — no window; the
    // bounded groupBy keeps the operator's dedup-by-id contract (a
    // duplicated id keeps its best score, like the fused aggregate)
    if (lists.size == 1)
      TopK.topK(lists.head._2, scoreCol, idCol, window)
        .groupBy(col(idCol))
        .agg(max(col(scoreCol)).cast("double").as("rrf_score"))
        .withColumn("n_sources", lit(1L))
    else rrfFused(lists, idCol, scoreCol, k, window)
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
    if (lists.size == 1)
      // single-input passthrough, same shape: the one source's score
      // is both the current score and its own history column (dedup
      // by id like the fused aggregate)
      TopK.topK(lists.head._2, scoreCol, idCol, window)
        .groupBy(col(idCol))
        .agg(max(col(scoreCol)).cast("double").as("rrf_score"))
        .select(col(idCol), col("rrf_score"),
          lit(1L).as("n_sources"),
          lit(1L).as("n_present_sources"),
          col("rrf_score").as(s"score_${lists.head._1}"))
    else rrfFused(lists, idCol, scoreCol, k, window)
      .select(Seq(col(idCol),
        when(col("__nl") === 1, col("__orig_max"))
          .otherwise(col("__rrf")).as("rrf_score"),
        col("n_sources"),
        col("__nl").cast("long").as("n_present_sources")) ++ srcSel: _*)
  }

  /** Shared RRF internals: one tagged-union window pass
    * ([[taggedRanked]]), then aggregate the fused score, the
    * single-nonempty-source skip resolution inputs, and the
    * per-source score pivots. */
  private def rrfFused(
      lists: Seq[(String, DataFrame, Double)],
      idCol: String,
      scoreCol: String,
      k: Int,
      window: Int): DataFrame = {
    // rank is 0-BASED like the reference's enumerate (`rank_fusion.py:
    // 161-165` — the top item contributes 1/(k+0), pinned by the
    // upstream unit vectors); the within-list rank is 1-based, hence
    // the -1
    val ranked = taggedRanked(lists, idCol, scoreCol, window)
      .withColumn("contrib",
        col("__w") / (lit(k.toDouble) + col("rank") - lit(1)))
    val srcAggs = lists.zipWithIndex.map { case ((name, _, _), i) =>
      max(when(col("__list") === i, col("__orig"))).as(s"score_$name")
    }
    ranked
      .groupBy(idCol)
      .agg(sum("contrib").as("__rrf"),
        // n_sources counts the LISTS an id appears in (distinct tags,
        // not rows): an id duplicated WITHIN one list must report the
        // same n_sources through the fused path as through the
        // single-list passthrough (which dedups by id and emits 1)
        (Seq(max(col("__orig")).as("__orig_max"),
          max(col("__n_lists")).as("__nl"),
          countDistinct(col("__list")).as("n_sources")) ++ srcAggs): _*)
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
    // same single-nonempty-source skip as [[rrf]] — the base-class
    // fuse() contract (`rank_fusion.py:74-90`) applies to both
    // algorithms: one surviving list returns original unweighted
    // scores. Presence rides the shared tagged-union window pass.
    if (lists.size == 1)
      return TopK.topK(lists.head._2, scoreCol, idCol, window)
        .groupBy(col(idCol))
        .agg(max(col(scoreCol)).cast("double").as("fused_score"))
        .withColumn("n_sources", lit(1L))
    taggedRanked(lists, idCol, scoreCol, window)
      .withColumn("contrib", col("__orig") * col("__w"))
      .groupBy(idCol)
      .agg(sum("contrib").as("__sum"),
        max(col("__orig")).as("__orig_max"),
        max(col("__n_lists")).as("__nl"),
        // distinct list tags, like [[rrf]] — see rrfFused's note
        countDistinct(col("__list")).as("n_sources"))
      .select(col(idCol),
        when(col("__nl") === 1, col("__orig_max"))
          .otherwise(col("__sum")).as("fused_score"),
        col("n_sources"))
  }
}
