package graft.operators

import org.apache.spark.sql.DataFrame

/** Prefilter: evaluate field-level filters once, push the surviving id
  * set into the paragraph/vector/graph searches as a semi-join.
  *
  * Reference: `nidx_text/src/prefilter.rs` +
  * `nidx/src/searcher/shard_search.rs:175-208` — the text index computes
  * `PrefilterResult::{All,None,Some(ids)}` and `None` cancels every
  * sub-query. In Spark the same plan falls out of a LEFT SEMI join:
  * Catalyst pushes the filter to the fields scan, broadcasts the
  * (small) surviving id set, and empty-relation propagation gives the
  * `None` shortcut for free.
  */
object Prefilter {

  /** Keep rows of `df` whose `keyCol` appears in `allowed` (left semi —
    * no duplication, no columns added). */
  def semiJoin(df: DataFrame, keyCol: String, allowed: DataFrame): DataFrame =
    df.join(allowed.select(keyCol).distinct(), Seq(keyCol), "left_semi")

  /** NOT-filter / exclusion analog (deleted entities, hidden ids). */
  def antiJoin(df: DataFrame, keyCol: String, excluded: DataFrame): DataFrame =
    df.join(excluded.select(keyCol).distinct(), Seq(keyCol), "left_anti")
}
