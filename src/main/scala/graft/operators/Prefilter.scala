package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    // no .distinct() on the build side (round 19, guide §2.4): LEFT
    // SEMI is duplicate-insensitive, every engine call site passes a
    // key-unique allowed frame (a doc-store projection or a filter of
    // one), and the dedup cost a 2-stage shuffle PER CONSUMER — the
    // same reasoning findParagraphs' doc semi-join recorded in round
    // 15. A caller with a duplicate-heavy allowed set dedups at the
    // call site (it owns the size/memory trade — see [[antiJoin]],
    // whose graph-hop exclusion sets DO duplicate and keep it).
    df.join(allowed.select(keyCol), Seq(keyCol), "left_semi")

  /** NOT-filter / exclusion analog (deleted entities, hidden ids). */
  def antiJoin(df: DataFrame, keyCol: String, excluded: DataFrame): DataFrame =
    df.join(excluded.select(keyCol).distinct(), Seq(keyCol), "left_anti")

  /** Bloom-prefiltered semi-join — the explicit runtime-filter shape
    * for a BIG fact side: a Bloom filter built from the allowed key set
    * (one sketch-sized aggregate, collected like a query vector) is
    * applied IN THE FACT SCAN via `might_contain`, so the fact side
    * discards non-matching rows before any join machinery touches
    * them; the semi-join then removes the Bloom's false positives.
    * Result is EXACTLY [[semiJoin]] (the bloom pass is a superset
    * filter, the join is exact — q77's oracle is the plain semi-join),
    * but at 100 TB the fact-to-join row volume drops by the filter's
    * selectivity instead of shuffling every row to discover
    * non-membership.
    *
    * @param expectedItems sizing for the sketch (false-positive rate
    *   degrades, never correctness, if underestimated)
    */
  def bloomSemiJoin(df: DataFrame, keyCol: String, allowed: DataFrame,
      expectedItems: Long = 100000L, numBits: Long = 800000L): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // xxhash64 is TYPE-sensitive (an int and a long with equal values
    // hash differently), so a type mismatch between the two key columns
    // would silently discard true matches in the bloom pass — where the
    // plain semi-join's implicit cast would keep them. Refuse instead.
    require(df.schema(keyCol).dataType == allowed.schema(keyCol).dataType,
      s"bloom key type mismatch: ${df.schema(keyCol).dataType} vs " +
        s"${allowed.schema(keyCol).dataType} — cast one side first")
    // BloomFilterAggregate/BloomFilterMightContain are what Spark's own
    // InjectRuntimeFilter rule plants; SQL exposes no public alias, so
    // bridge the Catalyst expressions directly. NOTE: constructing this
    // DataFrame runs one eager job (the sketch build collect, like a
    // centroid fetch); the cached key set serves both the sketch and
    // the verify join.
    val keys = graft.Caches.cache(allowed.select(col(keyCol)).distinct())
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(keyCol))),
        ColumnBridge.expression(lit(expectedItems)),
        ColumnBridge.expression(lit(numBits))).toAggregateExpression())
    val bloom = keys.agg(bloomAgg.as("bf")).collect().head.getAs[Array[Byte]](0)
    if (bloom == null) df.limit(0) // empty allowed set → None shortcut
    else df
      .where(ColumnBridge.column(BloomFilterMightContain(
        ColumnBridge.expression(lit(bloom)),
        ColumnBridge.expression(xxhash64(col(keyCol))))))
      .join(keys, Seq(keyCol), "left_semi")
  }
}
