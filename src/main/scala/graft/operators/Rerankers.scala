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

  /** Executor-side BATCH scorer — the real cross-encoder call shape:
    * an inference service scores (query, text) pairs in fixed-size
    * batches. Implementations hold per-partition state (a client, a
    * loaded model) initialized once per partition in
    * [[predictBatched]]. */
  trait BatchScorer extends Serializable {
    def scoreBatch(queryTerms: Seq[String], texts: Seq[String]): Seq[Double]
  }

  /** Deterministic batch stand-in computing exactly [[TokenOverlap]]'s
    * math in Scala — rankings match the column version bit-for-bit. */
  object TokenOverlapBatch extends BatchScorer {
    def scoreBatch(queryTerms: Seq[String], texts: Seq[String]): Seq[Double] =
      texts.map { t =>
        val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
        val inter = toks.count(queryTerms.contains)
        val raw = inter.toDouble / (queryTerms.size + toks.length - inter)
        // HALF_UP to match Spark's round() exactly
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
  }

  /** [[predict]] with a batched executor-side model call: the top
    * window hydrates, then `mapPartitions` groups rows into
    * `batchSize` chunks and calls the scorer once per chunk — the
    * inference-service pattern (N rows per RPC, client init once per
    * partition), same shape as the multimodal decoder. Only the
    * bounded window ever reaches the model; results are identical to
    * [[predict]] when the scorers compute the same math (spec-pinned).
    */
  def predictBatched(
      fused: DataFrame,
      scoreCol: String,
      idCol: String,
      docs: DataFrame,
      textCol: String,
      queryTerms: Seq[String],
      topK: Int,
      scorer: BatchScorer = TokenOverlapBatch,
      batchSize: Int = 32): DataFrame = {
    val spark = fused.sparkSession
    import spark.implicits._
    val window = math.min(2 * topK, MaxWindow)
    val hydrated = TopK.topK(fused, scoreCol, idCol, window)
      .join(docs.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
    val scored = hydrated.mapPartitions { rows =>
      // per-partition client/model init goes here (once, not per row)
      rows.grouped(batchSize).flatMap { batch =>
        val scores = scorer.scoreBatch(queryTerms, batch.map(_._2))
        batch.map(_._1).zip(scores)
      }
    }.toDF(idCol, "rerank_score")
    scored
      .orderBy(col("rerank_score").desc, col(idCol).asc)
      .limit(topK)
  }

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
