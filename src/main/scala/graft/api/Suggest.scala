package graft.api

import org.apache.spark.sql.DataFrame

import graft.operators.{GraphOps, TopK}

/** `/suggest` endpoint analog (SURVEY §3.4): paragraph-term suggest
  * (exact prefix, then fuzzy fill when empty —
  * `nidx_paragraph/src/reader.rs:58-90`, default k=10) merged with
  * entity prefix search on the relation index.
  */
object Suggest {

  final case class SuggestResponse(terms: DataFrame, entities: Option[DataFrame])

  def suggest(
      termFreq: DataFrame, termCol: String, freqCol: String,
      entities: Option[(DataFrame, String)], // (nodes, valueCol)
      query: String,
      topK: Int = 10): SuggestResponse =
    SuggestResponse(
      TopK.suggestWithFuzzyFallback(termFreq, termCol, freqCol, query.toLowerCase, topK),
      entities.map { case (nodes, valueCol) =>
        GraphOps.prefixSearch(nodes, valueCol, query, topK)
      })
}
