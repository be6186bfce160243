package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prompt-context packing for the RAG flow — the retrieval→context
  * step of `/ask` (`nucliadb/src/nucliadb/search/search/chat/prompt.py`):
  * take the fused text blocks best-first and keep them while the
  * cumulative token count fits the model's context budget.
  *
  * The input is cut to the top `window` blocks (TakeOrderedAndProject)
  * BEFORE the running-sum window, so the single-partition window only
  * ever sees a bounded list. The cut cannot change the result as long
  * as `window ≥ budget` and every block has ≥1 token: the running sum
  * is nondecreasing along the (score desc, id asc) order, so every row
  * within the budget sits inside the first `budget` rows. The cut is
  * deterministic: the same order drives the ranking and the sum.
  */
object ContextBuilder {

  /** Cap on how many candidate blocks enter the packing window. */
  val MaxWindow = 500

  def pack(
      hits: DataFrame,
      idCol: String,
      scoreCol: String,
      tokensCol: String,
      budget: Long,
      window: Int = MaxWindow): DataFrame = {
    require(window >= budget,
      s"packing window $window must cover the token budget $budget")
    val bounded = graft.operators.TopK.topK(hits, scoreCol, idCol, window)
    val w = Window.partitionBy(graft.operators.TopK.constPartitionKey(col(idCol)))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounded.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .where(col("cum_tokens") <= budget)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
  }
}
