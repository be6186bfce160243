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
      window: Int = MaxWindow): DataFrame = {
    val contributions = lists.map { case (_, df, w) =>
      ranked(df, idCol, scoreCol, window)
        .select(col(idCol),
          (lit(w) / (lit(k.toDouble) + col("rank"))).as("contrib"))
    }
    contributions.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum("contrib").as("rrf_score"),
        count(lit(1)).as("n_sources"))
  }

  /** Weighted CombSum with per-list min-max normalization:
    * score(d) = Σ_lists w_l · (s − min_l)/(max_l − min_l).
    * Reference: `rank_fusion.py:188-254`.
    */
  def weightedCombSum(
      lists: Seq[(String, DataFrame, Double)],
      idCol: String,
      scoreCol: String,
      window: Int = MaxWindow): DataFrame = {
    val normalized = lists.map { case (_, df, w) =>
      val cut = TopK.topK(df, scoreCol, idCol, window)
      val win = Window.partitionBy(TopK.constPartitionKey(col(idCol)))
      val mn = min(col(scoreCol)).over(win)
      val mx = max(col(scoreCol)).over(win)
      cut.select(col(idCol),
        when(mx === mn, lit(1.0))
          .otherwise((col(scoreCol) - mn) / (mx - mn))
          .multiply(lit(w)).as("contrib"))
    }
    normalized.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum("contrib").as("fused_score"),
        count(lit(1)).as("n_sources"))
  }
}
