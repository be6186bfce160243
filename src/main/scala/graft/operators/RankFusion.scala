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
  * Scale design: each input list is already a top-window (≤500 rows,
  * MAX_RANK_FUSION_WINDOW) so fusion operates on tiny data regardless of
  * corpus size; ranks are computed per-source with a window function and
  * the fuse is a hash aggregation on the id.
  */
object RankFusion {

  val DefaultK = 60

  /** Deterministic rank within one list: score desc, id asc tiebreak. */
  private def ranked(df: DataFrame, idCol: String, scoreCol: String): DataFrame =
    df.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol).asc)))

  /** Reciprocal Rank Fusion: score(d) = Σ_lists w_l / (k + rank_l(d)).
    *
    * @param lists (sourceName → (df with idCol+scoreCol, weight))
    * @return (idCol, rrf_score, n_sources) — un-rounded
    */
  def rrf(
      lists: Seq[(String, DataFrame, Double)],
      idCol: String,
      scoreCol: String,
      k: Int = DefaultK): DataFrame = {
    val contributions = lists.map { case (_, df, w) =>
      ranked(df, idCol, scoreCol)
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
      scoreCol: String): DataFrame = {
    val normalized = lists.map { case (_, df, w) =>
      val win = Window.partitionBy()
      val mn = min(col(scoreCol)).over(win)
      val mx = max(col(scoreCol)).over(win)
      df.select(col(idCol),
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
