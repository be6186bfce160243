package graft.api

import org.apache.spark.sql.DataFrame

import graft.operators.{GraphOps, TopK}

/** `/suggest` endpoint analog (SURVEY §3.4): paragraph-term suggest —
  * the LAST query term is the completion stem; exact prefix matches
  * first, and when that pass is empty the stem reruns as a fuzzy
  * PREFIX automaton so a typo'd stem still completes
  * (`nidx_paragraph/src/reader.rs:58-139`,
  * `nidx_paragraph/src/fuzzy_query.rs:55-120`, default k=10) — merged
  * with entity prefix search on the relation index.
  */
object Suggest {

  final case class SuggestResponse(terms: DataFrame, entities: Option[DataFrame])

  def suggest(
      termFreq: DataFrame, termCol: String, freqCol: String,
      entities: Option[(DataFrame, String)], // (nodes, valueCol)
      query: String,
      topK: Int = 10): SuggestResponse = {
    val lastTerm = query.toLowerCase.trim.split("\\s+").last
    val exact = TopK.suggestPrefix(termFreq, termCol, freqCol, lastTerm, topK)
    val terms =
      if (!exact.isEmpty) exact
      else TopK.suggestFuzzyPrefix(termFreq, termCol, freqCol, lastTerm, topK)
    SuggestResponse(terms,
      entities.map { case (nodes, valueCol) =>
        GraphOps.prefixSearch(nodes, valueCol, query, topK)
      })
  }
}
