package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prompt-context packing for the RAG flow — the retrieval→context
  * step of `/ask` (`nucliadb/src/nucliadb/search/search/chat/prompt.py`):
  * take the fused text blocks best-first and keep them while the
  * cumulative token count fits the model's context budget.
  *
  * One window pass over an already top-k'd list (driver-scale input);
  * the cut is deterministic: (score desc, id asc) order on both the
  * ranking and the running sum.
  */
object ContextBuilder {

  def pack(
      hits: DataFrame,
      idCol: String,
      scoreCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .where(col("cum_tokens") <= budget)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
  }
}
