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

  /** Skew-safe pair-intersection counts from an inverted index
    * (idCol, keyCol): the self-equi-join on the key — the hot-bucket
    * hazard in every shingle/band dedup join — salted on HOT keys only.
    * Keys with more than `hotThreshold` postings are detected with one
    * cheap aggregate (broadcast back); left rows of a hot key spread
    * deterministically over `saltFactor` sub-buckets, right rows
    * replicate to all of them, so every qualifying (a, b) pair still
    * meets exactly once per shared key and the result is IDENTICAL to
    * the unsalted join (asserted in SkewSpec). Cold keys pay zero
    * overhead (salt 0, no replication).
    */
  def saltedPairCounts(
      posting: DataFrame,
      idCol: String,
      keyCol: String,
      saltFactor: Int,
      hotThreshold: Long): DataFrame = {
    val hot = broadcast(
      posting.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
        .where(col("__n") > hotThreshold)
        .select(col(keyCol), lit(true).as("__hot")))
    val flagged = posting.join(hot, Seq(keyCol), "left")
    val left = flagged
      .withColumn("__salt",
        when(col("__hot"), pmod(hash(col(idCol)), lit(saltFactor))).otherwise(lit(0)))
      .select(col(idCol).as("a"), col(keyCol), col("__salt"))
    val right = flagged
      .withColumn("__salt",
        explode(when(col("__hot"), sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .select(col(idCol).as("b"), col(keyCol), col("__salt"))
    left.join(right, Seq(keyCol, "__salt"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
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
