package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{FilterExpr, GraphOps, TopK}

/** `/suggest` endpoint analog (SURVEY §3.4): paragraph-term suggest —
  * the LAST query term is the completion stem; exact prefix matches
  * first, and when that pass is empty the stem reruns as a fuzzy
  * PREFIX automaton so a typo'd stem still completes
  * (`nidx_paragraph/src/reader.rs:58-139`,
  * `nidx_paragraph/src/fuzzy_query.rs:55-120`, default k=10) — merged
  * with entity prefix search on the relation index.
  */
object Suggest {

  /** The reference's SuggestOptions feature selector
    * (`nucliadb_models/search.py:116-118`; `parse_suggest` appends one
    * proto feature per selected option, `query_parser/parsers/
    * suggest.py:58-63`): PARAGRAPH = term-dictionary completion,
    * ENTITIES = relation-node completion. The endpoint default is
    * both; a request selecting neither gets an empty response (the
    * engine runs only the requested sub-searches). */
  sealed trait Feature
  object Feature {
    case object Paragraph extends Feature
    case object Entities extends Feature
    val All: Set[Feature] = Set(Paragraph, Entities)
  }

  final case class SuggestResponse(terms: DataFrame, entities: Option[DataFrame])

  /** EAGER-COLLECTION CONTRACT (round 18, ADVICE r18 low): [[suggest]]
    * and [[suggestFiltered]] execute the exact-prefix page AT CALL TIME
    * (one bounded collect of ≤ topK rows — the collected-page
    * discipline that removed the isEmpty-probe job), so `terms` is a
    * local relation and execution failures surface at construction,
    * not at the caller's terminal action. Memory is bounded by topK;
    * callers building a response they never consume still pay the one
    * page execution. */
  def suggest(
      termFreq: DataFrame, termCol: String, freqCol: String,
      entities: Option[(DataFrame, String)], // (nodes, valueCol)
      query: String,
      topK: Int = 10): SuggestResponse = {
    val lastTerm = query.toLowerCase.trim.split("\\s+").last
    // the exact page COLLECTS once (≤ topK rows — the find-fallback
    // collected-page discipline, round 18): the emptiness check and
    // the response share one execution instead of an isEmpty probe
    // job plus a second run of the same plan in the terminal action
    val terms = TopK.collectedPageOrElse(
      TopK.suggestPrefix(termFreq, termCol, freqCol, lastTerm, topK))(
      TopK.suggestFuzzyPrefix(termFreq, termCol, freqCol, lastTerm, topK))
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

  /** FILTERED /suggest — the reference's SuggestRequest carries a
    * field/security prefilter plus a paragraph filter, computes ONE
    * prefilter result over the text index and feeds it to BOTH the
    * paragraph suggest and the relation (entity) suggest
    * (`nidx/src/searcher/shard_suggest.rs:131-160`: `field_filter` +
    * `security` → `text_searcher.prefilter(...)`, then
    * `paragraph_searcher.suggest(&request, &prefilter)` and
    * `relation_searcher.suggest(prefixes, &prefilter, top_k)`;
    * `PrefilterResult::None` short-circuits to an empty response).
    *
    * Spark shape: the filter compiles to a `Column` on the doc table;
    * the allowed-id projection restricts the PARAGRAPH POSTING PAIR by
    * its id prefix (one broadcastable semi-join — the corpus-wide
    * par_termfreq dictionary cannot serve a filtered request, so the
    * dictionary rolls up from the restricted postings, the same rollup
    * ingest runs corpus-wide), and the same allowed set semi-joins the
    * entity nodes on their resource provenance. Repeated paragraphs
    * stay excluded (`search_query.rs:150-167` suggest_query requires
    * repeated_in_field = 0). An empty allowed set empties both sources
    * for free.
    *
    * @param entities (nodes, valueCol, resourceCol): resourceCol is the
    *   node's resource provenance — REQUIRED when a filter is present
    *   (the reference's relation prefilter intersects on it,
    *   `nidx_relation/src/reader.rs:261-272`)
    */
  def suggestFiltered(
      parPostings: DataFrame,
      docs: DataFrame,
      docId: String,
      filter: Option[FilterExpr],
      entities: Option[(DataFrame, String, Option[String])],
      query: String,
      topK: Int = 10,
      bindings: FilterExpr.Bindings = FilterExpr.Bindings(),
      // the reference's paragraph_filter (`nodereader.proto:452` on
      // SuggestRequest → the paragraph suggest's filtering_formula):
      // a PARAGRAPH-label expression; needs the labeled paragraph
      // table to resolve ids
      paragraphFilter: Option[FilterExpr] = None,
      paragraphs: Option[DataFrame] = None,
      // the proto's FilterOperator on SuggestRequest
      // (`nodereader.proto:454`, AND default): OR keeps a posting row
      // when its doc is allowed OR its paragraph's labels match
      filterOperatorOr: Boolean = false): SuggestResponse = {
    val allowed: Option[DataFrame] = filter.map(f =>
      docs.where(FilterExpr.compile(f, bindings))
        .select(col(docId).cast("string").as("__allowed_doc")))
    val dict = filteredDictionary(parPostings, allowed, paragraphFilter,
      paragraphs, filterOperatorOr)
    val lastTerm = query.toLowerCase.trim.split("\\s+").last
    // collected page, like [[suggest]]: one execution serves the
    // emptiness check and the response
    val terms = TopK.collectedPageOrElse(
      TopK.suggestPrefix(dict, "term", "freq", lastTerm, topK))(
      TopK.suggestFuzzyPrefix(dict, "term", "freq", lastTerm, topK))
    SuggestResponse(terms,
      entities.map { case (nodes, valueCol, resCol) =>
        suggestEntitiesFiltered(nodes, valueCol, resCol, allowed, query, topK)
      })
  }

  /** The RESTRICTED suggest dictionary — [[suggestFiltered]]'s rollup
    * over the prefilter-restricted, repeated-excluded posting rows,
    * split out (round 18) so the plan pin can read the LAZY shape (the
    * response page is a collected local relation since the
    * collected-page discipline landed). `allowed` is the one-column
    * `__allowed_doc` (string) frame. */
  private[graft] def filteredDictionary(
      parPostings: DataFrame,
      allowed: Option[DataFrame],
      paragraphFilter: Option[FilterExpr] = None,
      paragraphs: Option[DataFrame] = None,
      filterOperatorOr: Boolean = false): DataFrame = {
    // default suggest semantics: ingest-marked repeated paragraphs stay
    // out of the dictionary (same contract as the at-rest par_termfreq)
    val base0 = Find.excludeRepeated(parPostings, withDuplicates = false)
    val parAllowed: Option[DataFrame] = paragraphFilter.map { pf =>
      val par = paragraphs.getOrElse(throw new IllegalArgumentException(
        "a paragraph_filter needs the labeled paragraph table"))
      require(par.columns.contains("p_labels"),
        "paragraph_filter needs a paragraph table with p_labels — " +
          "attach paragraph labels at ingest")
      par.where(FilterExpr.compile(pf,
          FilterExpr.Bindings(labelsCol = "p_labels")))
        .select("paragraph_id")
    }
    val docPrefix = split(col("paragraph_id"), "/").getItem(0)
    val restricted = (allowed, parAllowed) match {
      case (Some(a), Some(pa)) if filterOperatorOr =>
        // one either-passes clause (filter_query's Should occurs)
        base0.join(a.withColumn("__doc_ok", lit(true)),
            docPrefix === col("__allowed_doc"), "left")
          .join(pa.withColumn("__lab_ok", lit(true)),
            Seq("paragraph_id"), "left")
          .where(coalesce(col("__doc_ok"), lit(false)) ||
            coalesce(col("__lab_ok"), lit(false)))
          .drop("__allowed_doc", "__doc_ok", "__lab_ok")
      case _ =>
        val withPar = parAllowed match {
          case None => base0
          case Some(pa) => base0.join(pa, Seq("paragraph_id"), "left_semi")
        }
        allowed match {
          case None => withPar
          case Some(a) => withPar.join(a,
            docPrefix === col("__allowed_doc"), "left_semi")
        }
    }
    restricted.groupBy(col("term"))
      .agg(sum("tf").cast("long").as("freq"))
  }

  /** The entity side of [[suggestFiltered]] on its own — the
    * provenance semi-join (when an allowed-doc set restricts) followed
    * by the reference's actual relation-suggest matcher: compound
    * suffix prefixes, each a FUZZY-prefix node match at distance 1,
    * stems under MIN_SUGGEST_PREFIX_LENGTH=2 dropped
    * (`nidx_relation/src/lib.rs:216-260`; the prefilter restricts the
    * nodes BEFORE matching, `shard_suggest.rs:131-160`'s order). The
    * ENTITIES-only feature selection serves this directly — the
    * paragraph dictionary is never touched.
    *
    * @param allowed one-column frame of allowed doc ids named
    *   `__allowed_doc` (string), as [[suggestFiltered]] builds it */
  def suggestEntitiesFiltered(
      nodes: DataFrame, valueCol: String, resourceCol: Option[String],
      allowed: Option[DataFrame], query: String, topK: Int = 10): DataFrame = {
    val filteredNodes = (allowed, resourceCol) match {
      case (Some(a), Some(rc)) => nodes.join(a,
        col(rc).cast("string") === col("__allowed_doc"), "left_semi")
      case (Some(_), None) => throw new IllegalArgumentException(
        "a filtered entity suggest needs the nodes table to declare " +
          "its resource provenance column")
      case _ => nodes
    }
    suggestEntitiesFuzzy(filteredNodes, valueCol, query, topK)
  }

  /** [[suggestFiltered]] merged into the single-response shape of
    * [[suggestMerged]] — (suggestion, source, freq). */
  def suggestFilteredMerged(
      parPostings: DataFrame,
      docs: DataFrame,
      docId: String,
      filter: Option[FilterExpr],
      entities: (DataFrame, String, Option[String]),
      query: String,
      topK: Int = 10,
      bindings: FilterExpr.Bindings = FilterExpr.Bindings()): DataFrame = {
    val resp = suggestFiltered(parPostings, docs, docId, filter,
      Some(entities), query, topK, bindings)
    resp.terms.select(col("term").as("suggestion"),
        lit("paragraph").as("source"), col("freq"))
      .unionByName(resp.entities.get
        .select(col("value").as("suggestion"), lit("entity").as("source"),
          lit(0L).as("freq")))
      .orderBy(col("source").asc, col("freq").desc, col("suggestion").asc)
  }

  /** [[suggestMerged]] with the ENDPOINT-FAITHFUL entity matcher: the
    * reference's open /suggest builds the relation request identically
    * with or without a prefilter (`shard_suggest.rs:45-160` — always
    * the compound-stem FUZZY-prefix suggest), so the same stem must
    * complete the same entities filtered or not; the Engine facade
    * serves THIS form, while [[suggestMerged]]'s exact-prefix entity
    * pass remains as the fast common-case operator. */
  def suggestMergedFuzzy(
      parTermFreq: DataFrame,
      entities: DataFrame,
      valueCol: String,
      query: String,
      topK: Int = 10): DataFrame = {
    val resp = suggest(parTermFreq, "term", "freq", None, query, topK)
    resp.terms.select(col("term").as("suggestion"),
        lit("paragraph").as("source"), col("freq"))
      .unionByName(suggestEntitiesFuzzy(entities, valueCol, query, topK)
        .select(col("value").as("suggestion"), lit("entity").as("source"),
          lit(0L).as("freq")))
      .orderBy(col("source").asc, col("freq").desc, col("suggestion").asc)
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
