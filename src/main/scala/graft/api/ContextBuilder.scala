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

  /** `/augment`'s conversation answer-or-after context
    * (`search/augmentor/fields.py:704-727` conversation_answer_or_after):
    * for each matched conversation message, if the message is a
    * QUESTION return the FIRST later ANSWER-typed message; otherwise
    * return the next `expansion` messages
    * (CONVERSATION_MESSAGE_CONTEXT_EXPANSION = 15) for context — the
    * augment step that turns a conversation hit into a usable prompt
    * block.
    *
    * Scale shape: the (top-k-bounded) hit list joins the message table
    * on its conversation key, pruning the scan to matched
    * conversations; the per-hit window partitions on (rid, field, hit
    * split) — bounded by one conversation's length, never the corpus.
    *
    * @param hits (ridCol, fieldCol, splitCol) — the matched messages
    * @return (ridCol, fieldCol, hit_split, ctx_split, ctx_type,
    *         ctx_text) — context messages per hit, in split order
    */
  def conversationAnswerOrAfter(
      messages: DataFrame, ridCol: String, fieldCol: String,
      splitCol: String, typeCol: String, textCol: String,
      hits: DataFrame,
      expansion: Int = 15): DataFrame = {
    // distinct: duplicate hit rows (two subqueries fused without
    // dedup) would multiply every context row inside the hit's window
    // partition and corrupt the row_number counts; hit lists are
    // top-k bounded, so the distinct is a bounded exchange
    val h = hits.select(col(ridCol), col(fieldCol),
      col(splitCol).cast("int").as("hit_split")).distinct()
    val hitType = messages.select(col(ridCol), col(fieldCol),
      col(splitCol).cast("int").as("hit_split"),
      col(typeCol).as("__hit_type"))
    val later = messages.join(h, Seq(ridCol, fieldCol))
      .where(col(splitCol).cast("int") > col("hit_split"))
      .join(hitType, Seq(ridCol, fieldCol, "hit_split"))
    val w = Window
      .partitionBy(col(ridCol), col(fieldCol), col("hit_split"))
      .orderBy(col(splitCol).cast("int").asc)
    val question = later
      .where(col("__hit_type") === "QUESTION" && col(typeCol) === "ANSWER")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val after = later
      .where(col("__hit_type") =!= "QUESTION")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= expansion)
    question.unionByName(after)
      .select(col(ridCol), col(fieldCol), col("hit_split"),
        col(splitCol).cast("int").as("ctx_split"),
        col(typeCol).as("ctx_type"), col(textCol).as("ctx_text"))
  }
}
