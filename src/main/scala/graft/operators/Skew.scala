package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A hot key (one language dominating facet counts, one band bucket in
  * a degenerate LSH corpus) concentrates a shuffle partition. Salting
  * splits each key into `saltFactor` sub-keys for a partial aggregate,
  * then combines partials — the classic two-stage shape; AQE's skew
  * handling covers joins, this covers aggregations whose partials are
  * algebraic (count/sum/min/max).
  *
  * The salt is deterministic (hash of the whole row mod saltFactor), so
  * results are reproducible.
  */
object Skew {

  /** count(*) per key, salted. Identical result to
    * `df.groupBy(key).count()`, but the first shuffle distributes each
    * key over `saltFactor` reducers.
    */
  def saltedCount(df: DataFrame, keyCol: String, saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(saltFactor)))
    salted.groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))
  }

  /** Generic salted sum of `valueCol` per key. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String, saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(saltFactor)))
    salted.groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("sum_" + valueCol))
  }
}
