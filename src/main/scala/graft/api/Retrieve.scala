package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{FilterExpr, RankFusion, Rerankers, TopK}

/** The raw-retrieval endpoint — `POST /kb/{kbid}/retrieve`
  * (`search/api/v1/retrieve.py:77-139`,
  * `search/search/query_parser/parsers/retrieve.py`): find's retrieval
  * core WITHOUT hydration or resource composition, driven by a
  * low-level [[RawQuery]] where each sub-search (keyword / semantic /
  * graph) is independently present and independently configured
  * (per-index min_score, keyword synonyms, explicit vector +
  * vectorset), and the response reports SCORE PROVENANCE per match
  * (`nucliadb_models/retrieval.py:154-240`): the current score with
  * its source (index / rank_fusion / reranker) and type, plus the
  * per-source index-score history.
  *
  * Spark shape: the same [[Find.retrievalLists]] core builds the three
  * scored lists; [[RankFusion.rrfWithScores]] fuses them carrying the
  * per-source pivots and the global single-nonempty-source skip flag;
  * the optional predict reranker re-scores the bounded window. Every
  * post-list stage operates on ≤ fusion-window rows — response-sized
  * by construction.
  */
object Retrieve {

  /** `retrieval.py:34-37` KeywordQuery: its own query text, its own
    * min_score, opt-in synonym expansion (unlike find, where the
    * synonyms map applies whenever provided). */
  final case class KeywordQuery(
      query: String,
      minScore: Double = 0.0,
      withSynonyms: Boolean = false)

  /** `retrieval.py:40-43` SemanticQuery: retrieve never calls Predict —
    * the caller supplies the vector AND names the vectorset (enforced,
    * `parsers/retrieve.py:289-292`). A vector longer than the set's
    * dimension is matryoshka-cut to it (`parsers/retrieve.py:296-315`);
    * a shorter one is an invalid-query error. */
  /** `annNprobe`/`annRerank` are this engine's at-rest IVF-PQ serving
    * knobs (the same surface [[Find.FindRequest]] exposes — not part of
    * the reference's request model): None = the cost-model defaults;
    * full probes + full rerank = the exact-oracle configuration. */
  final case class SemanticQuery(
      query: Seq[Float],
      vectorset: String,
      minScore: Double = -1.0,
      annNprobe: Option[Int] = None,
      annRerank: Option[Int] = None)

  /** `retrieval.py:50-55` RawQuery — each sub-search independently
    * optional; at least one must be present. */
  final case class RawQuery(
      keyword: Option[KeywordQuery] = None,
      semantic: Option[SemanticQuery] = None,
      graph: Option[GraphSearch.PathQuery] = None)

  /** `search.py:375-398` ReciprocalRankFusion config: k, optional
    * window (clamped to [topK, 500]; default min(topK, 500),
    * `parsers/common.py:222-247`), per-retriever boosting weights.
    * RRF is the only fusion the retrieve surface exposes
    * (`retrieval.py:147` RankFusionName has one member). */
  final case class RrfConfig(
      k: Int = RankFusion.DefaultK,
      window: Option[Int] = None,
      keywordBoost: Double = 1.0,
      semanticBoost: Double = 1.0,
      graphBoost: Double = 1.0)

  /** `parsers/common.py:250-275`: noop, or the predict cross-encoder
    * over a window (by-name default min(2·topK, 200); explicit window
    * clamped to [topK, 200]). */
  sealed trait Reranker
  case object NoopReranker extends Reranker
  final case class PredictReranker(window: Option[Int] = None) extends Reranker

  /** `retrieval.py:143-151` RetrievalRequest. Security and hidden-
    * resource enforcement compile into `filter` like every other doc
    * restriction ([[FilterExpr.Security]] — the Engine facade threads
    * its bindings), matching the engine-wide convention. */
  final case class RetrievalRequest(
      query: RawQuery,
      topK: Int = 20,
      filter: Option[FilterExpr] = None,
      withDuplicates: Boolean = false,
      rankFusion: RrfConfig = RrfConfig(),
      reranker: Option[Reranker] = None,
      // the synonym dictionary consulted when keyword.withSynonyms —
      // the reference fetches the KB's custom synonyms
      // (`fetcher.py` get_synonyms); this engine binds them per request
      synonyms: Map[String, Seq[String]] = Map.empty)

  /** Run the raw retrieval. Returns one row per match, ordered
    * (score desc, id asc), limited to topK:
    * (docId, score, score_source, score_type,
    *  keyword_score, semantic_score, graph_score, prerank_score,
    *  n_sources)
    * where score_source ∈ index|rank_fusion|reranker and score_type ∈
    * keyword|semantic|graph|rrf|reranker mirror the reference's
    * Scores model; the nullable per-source columns are the history
    * (null = the id did not appear in that sub-search), and
    * prerank_score preserves the pre-reranker fused score (null when
    * no reranker ran).
    */
  def retrieve(corpus: Find.Corpus, req: RetrievalRequest): DataFrame = {
    require(req.topK > 0 && req.topK <= RankFusion.MaxWindow,
      s"topK must be in (0, ${RankFusion.MaxWindow}] (RetrievalRequest.top_k bounds)")
    // window resolution (`parsers/common.py:222-247` + the reranker
    // widening `parsers/retrieve.py:143-150`)
    val fusionWindow0 = req.rankFusion.window
      .map(w => math.min(math.max(w, req.topK), RankFusion.MaxWindow))
      .getOrElse(math.min(req.topK, RankFusion.MaxWindow))
    val rerankWindow = req.reranker.collect { case PredictReranker(w) =>
      w.map(x => math.min(math.max(x, req.topK), Rerankers.MaxWindow))
        .getOrElse(math.min(2 * req.topK, Rerankers.MaxWindow))
    }
    val fusionWindow = math.max(fusionWindow0, rerankWindow.getOrElse(0))

    val kw = req.query.keyword
    val sem = req.query.semantic
    val findReq = Find.FindRequest(
      query = kw.map(_.query).getOrElse(""),
      queryVector = sem.map(matryoshkaCut(corpus, _)),
      vectorset = sem.map(_.vectorset),
      filter = req.filter,
      topK = req.topK,
      keywordMinScore = kw.map(_.minScore).getOrElse(0.0),
      semanticMinScore = sem.map(_.minScore).getOrElse(-1.0),
      annNprobe = sem.flatMap(_.annNprobe),
      annRerank = sem.flatMap(_.annRerank),
      keywordWeight = req.rankFusion.keywordBoost,
      semanticWeight = req.rankFusion.semanticBoost,
      graphWeight = req.rankFusion.graphBoost,
      synonyms = if (kw.exists(_.withSynonyms)) req.synonyms else Map.empty,
      graphQuery = req.query.graph,
      withDuplicates = req.withDuplicates)
    val (_, terms, lists) = Find.retrievalLists(corpus, findReq)
    require(lists.nonEmpty,
      "retrieve needs a keyword, semantic, or graph query")

    // rounded BEFORE any cut so window membership matches the engine-
    // wide 6-decimal fused-score contract (identity on a skip-case
    // passthrough — index scores are already rounded)
    val fused0 = RankFusion.rrfWithScores(lists, corpus.docId, "score",
        req.rankFusion.k, fusionWindow)
      .withColumn("rrf_score", round(col("rrf_score"), 6))
    // stable schema: absent sub-searches still contribute (null)
    // history columns
    val fused = Seq("keyword", "semantic", "graph").foldLeft(fused0) {
      (df, n) =>
        if (df.columns.contains(s"score_$n")) df
        else df.withColumn(s"score_$n", lit(null).cast("double"))
    }
    // current-score provenance before any reranker: fused requests
    // carry the rank-fusion score (source=rank_fusion, type=rrf); a
    // single-nonempty-source request passed through untouched
    // (`rank_fusion.py:74-90`), so the current score IS the index
    // score with the surviving sub-search's own type
    val typed = fused
      .withColumn("score_source",
        when(col("n_present_sources") === 1, lit("index"))
          .otherwise(lit("rank_fusion")))
      .withColumn("score_type",
        when(col("n_present_sources") > 1, lit("rrf"))
          .when(col("score_keyword").isNotNull, lit("keyword"))
          .when(col("score_semantic").isNotNull, lit("semantic"))
          .otherwise(lit("graph")))

    // reranker: only the predict reranker re-scores, and only when a
    // textual keyword query exists to compare against
    // (`api/v1/retrieve.py:97-104`); the final topK cut always applies
    val paged = rerankWindow match {
      case Some(w) if kw.exists(_.query.nonEmpty) && terms.nonEmpty =>
        TopK.topK(typed, "rrf_score", corpus.docId, w)
          .join(corpus.docs.select(col(corpus.docId), col(corpus.text)),
            corpus.docId)
          .withColumn("rerank_score",
            Rerankers.TokenOverlap.score(terms, col(corpus.text)))
          .drop(corpus.text)
          .withColumn("prerank_score", round(col("rrf_score"), 6))
          .withColumn("score", col("rerank_score"))
          .withColumn("score_source", lit("reranker"))
          .withColumn("score_type", lit("reranker"))
          .orderBy(col("rerank_score").desc, col(corpus.docId).asc)
          .limit(req.topK)
      case _ =>
        TopK.topK(typed, "rrf_score", corpus.docId, req.topK)
          .withColumn("prerank_score", lit(null).cast("double"))
          .withColumn("score", col("rrf_score"))
    }
    paged.select(
      col(corpus.docId),
      round(col("score"), 6).as("score"),
      col("score_source"), col("score_type"),
      col("score_keyword").as("keyword_score"),
      col("score_semantic").as("semantic_score"),
      col("score_graph").as("graph_score"),
      col("prerank_score"),
      col("n_sources"))
      .orderBy(col("score").desc, col(corpus.docId).asc)
  }

  /** The matryoshka cut (`parsers/retrieve.py:296-315` via
    * `fetcher.py:375-395`): when the named set binds an at-rest index,
    * its centroid dimension is the set's trained dimension — a longer
    * caller vector keeps its first dim components, a shorter one is
    * invalid. Sets without a bound index pass the vector through (the
    * brute branch scores whatever dimensions agree). */
  private def matryoshkaCut(
      corpus: Find.Corpus, sq: SemanticQuery): Seq[Float] = {
    val bound = corpus.vectorIndexes.get(sq.vectorset)
      .orElse(if (sq.vectorset == corpus.defaultVectorset) corpus.vectorIndex
              else None)
    bound match {
      case Some(ix) if ix.centroids.nonEmpty =>
        val dim = ix.centroids.head._2.size
        if (sq.query.length < dim)
          throw new IllegalArgumentException(
            s"Invalid vector length ${sq.query.length} for vectorset " +
              s"'${sq.vectorset}' — the set's embedding size is $dim")
        else if (sq.query.length > dim) sq.query.take(dim)
        else sq.query
      case _ => sq.query
    }
  }
}
