package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Post-fusion reranking.
  *
  * Reference: `search/search/rerankers.py:99-175` — NoopReranker keeps
  * the fused order; PredictReranker sends the top window
  * (= min(2·top_k, 200)) of paragraph texts plus the query to an
  * external cross-encoder and re-sorts by its scores.
  *
  * The external model is isolated behind [[Scorer]]; [[TokenOverlap]]
  * is the deterministic stand-in used in tests/oracles (exactly like
  * the reference fixtures pin the query embedding to `[0.5,0.5,0.5]`).
  * A real model plugs in as a `mapPartitions`/`mapInPandas`-style
  * batch scorer without touching the windowing logic — which is the
  * scale-relevant part: only `window` rows ever reach the model.
  */
object Rerankers {

  val MaxWindow = 200

  /** Cross-encoder abstraction: produce a score column from the query
    * terms and the hydrated document text. */
  trait Scorer {
    def score(queryTerms: Seq[String], textCol: Column): Column
  }

  /** Deterministic stand-in: token-set Jaccard between query and doc. */
  object TokenOverlap extends Scorer {
    def score(queryTerms: Seq[String], textCol: Column): Column = {
      val toks = array_distinct(TextFunctions.tokens(textCol))
      val inter = size(filter(toks, t => t.isInCollection(queryTerms)))
      round(inter / (lit(queryTerms.size) + size(toks) - inter).cast("double"), 6)
    }
  }

  /** Keep the fused order (NoopReranker). */
  def noop(fused: DataFrame, scoreCol: String, idCol: String, topK: Int): DataFrame =
    TopK.topK(fused, scoreCol, idCol, topK)

  /** PredictReranker shape: take the top `min(2·topK, 200)` fused rows,
    * hydrate text, re-score with the model, re-sort by model score
    * (id tiebreak), cut to topK.
    */
  def predict(
      fused: DataFrame,
      scoreCol: String,
      idCol: String,
      docs: DataFrame,
      textCol: String,
      queryTerms: Seq[String],
      topK: Int,
      scorer: Scorer = TokenOverlap): DataFrame = {
    val window = math.min(2 * topK, MaxWindow)
    TopK.topK(fused, scoreCol, idCol, window)
      .join(docs.select(col(idCol), col(textCol)), idCol)
      .withColumn("rerank_score", scorer.score(queryTerms, col(textCol)))
      .select(col(idCol), col("rerank_score"))
      .orderBy(col("rerank_score").desc, col(idCol).asc)
      .limit(topK)
  }
}
