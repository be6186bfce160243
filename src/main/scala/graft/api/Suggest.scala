package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** The reference's suggest-query split
    * (`nidx/src/searcher/shard_suggest.rs:198-210`
    * split_suggest_query): the last `maxGroup` words produce the
    * compound suffix prefixes — "anna ko" suggests against both
    * "anna ko" (the compound entity) and "ko" (a fresh entity stem).
    */
  def splitSuggestQuery(query: String, maxGroup: Int = 3): Seq[String] = {
    val ws = query.toLowerCase.trim.split("\\s+")
      .filter(_.nonEmpty).toSeq.takeRight(maxGroup)
    ws.indices.map(i => ws.drop(i).mkString(" "))
  }

  /** Entity suggest the way the reference's relation index serves it
    * (`nidx_relation/src/lib.rs:216-260` relation::suggest): each
    * compound prefix of [[splitSuggestQuery]] that reaches
    * `minPrefixLen` becomes a FUZZY-PREFIX node match (distance 1 —
    * `FUZZY_DISTANCE`), OR-ed over the node values; distinct matches,
    * alphabetical, top-k. A typo'd entity stem still completes —
    * [[suggest]]'s exact-prefix entity pass is the fast common case,
    * this is the endpoint-faithful form.
    */
  def suggestEntitiesFuzzy(
      nodes: DataFrame, valueCol: String, query: String,
      topK: Int = 10, distance: Int = 1, minPrefixLen: Int = 2): DataFrame = {
    // the fuzzy-prefix matcher requires stems longer than the
    // distance (at-or-below-distance stems match everything); surface
    // the constraint at the API boundary instead of mid-plan
    require(minPrefixLen > distance,
      s"minPrefixLen $minPrefixLen must exceed the fuzzy distance $distance")
    val prefixes = splitSuggestQuery(query).filter(_.length >= minPrefixLen)
    if (prefixes.isEmpty)
      nodes.select(col(valueCol).as("value")).limit(0)
    else
      nodes.where(prefixes
          .map(p => GraphOps.fuzzyPrefixMatch(col(valueCol), p, distance))
          .reduce(_ || _))
        .select(col(valueCol).as("value")).distinct()
        .orderBy(col("value").asc)
        .limit(topK)
  }

  /** MERGED /suggest — the reference endpoint runs paragraph suggest
    * and entity prefix search in ONE call and returns both merged
    * (`nidx/src/searcher/shard_suggest.rs:45-160` builds the paragraph
    * and relation requests from the same query and combines their
    * responses). Here both sources land in one DataFrame:
    * (suggestion, source, freq) — `paragraph` rows from the
    * paragraph-derived term dictionary ([[graft.sources.Ingest.buildIndex]]'s
    * `par_termfreq`, exact-prefix first with the fuzzy-prefix fallback),
    * `entity` rows from the relation-node prefix search (freq 0: the
    * relation index ranks alphabetically, not by frequency). Each
    * source is top-k-bounded before the union, so the merge is a
    * driver-window-sized sort — deterministic order (source, freq desc,
    * suggestion).
    */
  def suggestMerged(
      parTermFreq: DataFrame,
      entities: DataFrame,
      valueCol: String,
      query: String,
      topK: Int = 10): DataFrame = {
    // ONE suggest pass produces both sources — stem treatment and the
    // fuzzy fallback live in [[suggest]] alone, so the two endpoints
    // cannot drift
    val resp = suggest(parTermFreq, "term", "freq",
      Some((entities, valueCol)), query, topK)
    resp.terms.select(col("term").as("suggestion"),
        lit("paragraph").as("source"), col("freq"))
      .unionByName(resp.entities.get
        .select(col("value").as("suggestion"), lit("entity").as("source"),
          lit(0L).as("freq")))
      .orderBy(col("source").asc, col("freq").desc, col("suggestion").asc)
  }
}
