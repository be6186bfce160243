package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Facets, FilterExpr}
import graft.sources.{Ingest, IndexStore}

/** The engine's single public entry point — one at-rest root directory
  * owns everything a knowledge box owns in the reference (resources,
  * text/paragraph/vector/relation indexes, `nidx/README.md:13-35`), and
  * every serving endpoint the reference exposes over HTTP
  * (`/find`, `/search`, `/suggest`, `/graph`, `/catalog` —
  * SURVEY.md §3) is a method over that root.
  *
  * Layout under `root`:
  * {{{
  *   docs/      the document store (docId, textCol, extra columns)
  *   text/      Ingest.buildIndex output (postings, paragraphs, …)
  *   vectors/   Ingest.buildVectorIndexSets output (per-set IVF-PQ)
  *   raw_vectors/   the raw vector table, partitioned by vectorset
  *   graph/     Ingest.relationIndex output (sorted edge copies
  *              [+ edge_resources provenance])
  * }}}
  *
  * Ingest methods are batch jobs (run once per corpus build / refresh
  * cycle — production pipelines run them from the ingest stream);
  * serving methods are declarative DataFrame plans over the at-rest
  * tables, exactly the operators the 130+ driver queries exercise
  * individually. The facade adds no new semantics — it PINS the
  * composition: which tables each endpoint binds and which request
  * knobs reach which operator.
  *
  * Serving handles (vector-index models, table plans) are memoized per
  * Engine instance; construct one Engine per (session, root) and reuse
  * it across requests, like the reference's shard readers.
  *
  * STREAMED corpora are served by [[Engine.forStream]]: the same
  * endpoint surface over LSM segments
  * ([[graft.streaming.IncrementalIndex.segmentTables]] /
  * segmentVectorTables / segmentEdges), handles memoized per segment
  * WATERMARK. LSM segments carry the index tables but not the document
  * payloads — the source of truth lives upstream of the indexes, as in
  * the reference's KV store (`docs/internal/KV.md`) — so a streamed
  * serving root pairs the segment tables with the caller's doc store
  * rather than this facade's `docs/` directory.
  */
class Engine(
    val spark: SparkSession,
    val root: String,
    val docId: String = "doc_id",
    val textCol: String = "text",
    val labelsCol: String = "labels",
    val securityCol: String = "security_groups",
    // the set an unnamed vector request searches (`config.rs:100-126`:
    // every kb has a default vectorset); None = the first indexed set
    // in name order
    val defaultVectorset: Option[String] = None) {

  private def p(sub: String) = s"$root/$sub"

  /** The ONE set of column bindings every endpoint's doc-filter compile
    * uses — an Engine constructed over non-default labels/security/text
    * columns must bind them in find/suggest/graph exactly like in
    * search/catalog, or Facet/Security leaves silently hit the wrong
    * (possibly absent) columns. */
  protected val bindings: FilterExpr.Bindings = FilterExpr.Bindings(
    labelsCol = labelsCol, textCol = textCol, securityCol = securityCol)

  // ------------------------------------------------------------------
  // ingest side
  // ------------------------------------------------------------------

  /** Index a document corpus: persists the doc store and builds the
    * full text-side index family ([[Ingest.buildIndex]]: doc + paragraph
    * posting pairs, fields, termfreq dictionaries, shingle/band/
    * signature tables, positions, …). */
  def ingestDocuments(
      docs: DataFrame,
      langCol: Option[String] = None,
      conversations: Option[DataFrame] = None): Unit = {
    docs.write.mode("overwrite").parquet(p("docs"))
    // conversations persist at MESSAGE grain alongside the index: the
    // /augment conversation selectors read whole messages (the
    // reference reads maindb), which the split-chunked paragraph
    // tables cannot reconstruct. A re-ingest WITHOUT conversations
    // must also delete the previous store — serving the old corpus's
    // messages against the new docs would be silently wrong
    conversations match {
      case Some(c) => c.write.mode("overwrite").parquet(p("conversations"))
      case None =>
        val pth = new org.apache.hadoop.fs.Path(p("conversations"))
        val fs = pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(pth)) fs.delete(pth, true)
    }
    Ingest.buildIndex(spark.read.parquet(p("docs")), docId, textCol,
      p("text"), withVectors = false, langCol = langCol,
      conversations = conversations)
    invalidateServing()
  }

  /** A re-ingest rewrites part files under `root` — every memoized
    * handle AND the shared per-(session, path) plan cache must rebind,
    * or serving reads stale/deleted file listings. */
  private def invalidateServing(): Unit = synchronized {
    IndexStore.invalidatePrefix(spark, root)
    vixCache.clear()
    metaMemo = None
    provenanceMemo = None
    tablesMemo = None
    convMemo = None
    // cached filter-population BM25 stats describe the OLD corpus —
    // re-register after a re-ingest (cheap; serving with stale stats
    // would silently break the filter-then-score contract)
    filterStatsMemo = Map.empty
    // the at-rest facet count table counted the OLD corpus too
    facetCountsMemo = None
  }

  // at-rest per-facet resource-count table (round 18): when
  // registered, /catalog/facets filters this instead of aggregating
  // the corpus; cleared on re-ingest. @volatile: invalidateServing
  // clears it under synchronized while catalogFacets reads it
  // lock-free — a serving thread must never keep seeing the
  // pre-re-ingest table
  @volatile private var facetCountsMemo: Option[DataFrame] = None

  // precomputed per-restriction BM25 population stats, threaded into
  // every corpus() so restricted find/findParagraphs skip the
  // per-request population aggregation (the one corpus-fraction-linear
  // piece of a restricted request); cleared on re-ingest
  private var filterStatsMemo: Map[Find.RestrictionKey, Find.CachedBm25Stats] =
    Map.empty

  /** Precompute and register the BM25 population stats for a KNOWN hot
    * filter (e.g. a language facet): every later find/findParagraphs
    * whose filter equals it structurally — and whose other knobs are
    * at defaults — serves from two literals instead of aggregating the
    * filtered population per request. Cleared automatically when a
    * re-ingest invalidates serving. */
  def cacheFilterStats(filter: FilterExpr): Unit =
    cacheRestrictionStats(Find.RestrictionKey(filter = Some(filter)))

  /** [[cacheFilterStats]] generalized to the request's FULL restriction
    * surface (round 19, VERDICT r18 #1): a `fields=` spec, a paragraph
    * label formula, and the OR operator are population restrictions
    * exactly like the doc filter, so a KNOWN hot combination registers
    * once and every later request whose restriction normalizes to the
    * key serves its stats (and the semantic density-probe count) from
    * the registration instead of re-aggregating per request. */
  def cacheRestrictionStats(key0: Find.RestrictionKey): Unit = {
    val key = Find.RestrictionKey.of(key0.filter, key0.fields,
      key0.paragraphFilter, key0.filterOperatorOr)
    val stats = Find.cachedStatsFor(corpus(), key)
    synchronized { filterStatsMemo += key -> stats }
  }

  /** Index embeddings: one IVF-PQ index per named vectorset, each with
    * its own similarity/normalization config (`config.rs:102-137`).
    * `vectors` must hold exactly ([[docId]], `embedding`, `vectorset`)
    * — the facade's column contract (the serving side binds these
    * names; corpora with other names rename before ingest). */
  def ingestVectors(
      vectors: DataFrame,
      configs: Map[String, Ingest.VectorSetConfig] = Map.empty,
      numCentroids: Int = 16,
      m: Int = 16): Unit = {
    require(vectors.columns.sorted.sameElements(
        Array(docId, "embedding", "vectorset").sorted),
      s"ingestVectors needs exactly ($docId, embedding, vectorset); " +
        s"got ${vectors.columns.mkString(", ")}")
    vectors.write.mode("overwrite").partitionBy("vectorset")
      .parquet(p("raw_vectors"))
    Ingest.buildVectorIndexSets(spark.read.parquet(p("raw_vectors")),
      docId, "embedding", "vectorset", p("vectors"),
      numCentroids = numCentroids, m = m, configs = configs)
    invalidateServing()
  }

  /** Index relation triplets ([[Ingest.relationIndex]]: distinct
    * triplets + multiplicity in src- and dst-sorted copies, plus the
    * per-resource provenance table when `resourceCol` is given — that
    * table is what lets [[graph]] accept a security/filter prefilter). */
  def ingestRelations(
      edges: DataFrame,
      srcCol: String, relCol: String, dstCol: String,
      facetsCol: Option[String] = None,
      typedCols: Seq[String] = Nil,
      resourceCol: Option[String] = None): Unit = {
    Ingest.relationIndex(edges, srcCol, relCol, dstCol, p("graph"),
      facetsCol = facetsCol, typedCols = typedCols,
      resourceCol = resourceCol)
    invalidateServing()
  }

  // whether the relation ingest recorded edge provenance — one FS
  // probe per instance, not per request; invalidated by ingestRelations
  private var provenanceMemo: Option[Boolean] = None
  protected def hasProvenance: Boolean = synchronized {
    provenanceMemo.getOrElse {
      val pth = new org.apache.hadoop.fs.Path(p("graph") + "/edge_resources")
      val b = pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(pth)
      provenanceMemo = Some(b)
      b
    }
  }

  // ------------------------------------------------------------------
  // serving side
  // ------------------------------------------------------------------

  /** The at-rest doc store. */
  def docs: DataFrame = IndexStore.readParquetMemo(spark, p("docs"))

  /** The bound text-index tables — memoized per instance (tablesAt
    * pays driver-side FS existence probes for the optional tables;
    * the serving path must not pay them per request). */
  private var tablesMemo: Option[IndexStore.IndexTables] = None
  def index: IndexStore.IndexTables = synchronized {
    tablesMemo.getOrElse {
      val t = IndexStore.tablesAt(spark, p("text"))
      tablesMemo = Some(t)
      t
    }
  }

  private val vixCache =
    scala.collection.mutable.Map[String, IndexStore.VectorIndex]()

  /** The served per-vectorset ANN index (centroid/codebook literals
    * collected once per Engine instance). */
  def vectorIndex(vs: String): IndexStore.VectorIndex = synchronized {
    vixCache.getOrElseUpdate(vs, {
      val raw = IndexStore.readParquetMemo(spark, p("raw_vectors"))
        .where(col("vectorset") === vs)
      IndexStore.vectorIndexSetAt(spark, p("vectors"), vs,
        raw.select(raw.columns.filterNot(_ == "vectorset").map(col): _*))
    })
  }

  // (hasVectors, vectorset names) — read once per Engine instance, not
  // per request (the serving path must not pay driver-side FS I/O per
  // find); invalidated by ingestVectors
  private var metaMemo: Option[(Boolean, Seq[String])] = None
  private def vectorMeta: (Boolean, Seq[String]) = synchronized {
    metaMemo.getOrElse {
      val exists = new org.apache.hadoop.fs.Path(p("raw_vectors"))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(p("raw_vectors")))
      val m: (Boolean, Seq[String]) =
        if (!exists) (false, Nil)
        else {
          val meta = Ingest.readText(spark, p("vectors") + "/vector_meta.json")
          (true, """"vectorsets":\s*\[([^\]]*)\]""".r.findFirstMatchIn(meta)
            .map(_.group(1).split(",")
              .map(_.trim.stripPrefix("\"").stripSuffix("\""))
              .filter(_.nonEmpty).toSeq)
            .getOrElse(Nil))
        }
      metaMemo = Some(m)
      m
    }
  }

  /** Names of the indexed vectorsets, from the persisted meta (empty
    * for a docs-only corpus). */
  def vectorsets: Seq[String] = vectorMeta._2

  /** The [[Find.Corpus]] binding every find-family request uses —
    * exposed so callers can tune cost-model knobs via `copy`. A
    * docs-only corpus (no [[ingestVectors]] run) binds no vector side:
    * keyword-only retrieval works, a queryVector request fails in
    * `Find.find` with its own missing-vectors contract.
    */
  def corpus(vectorsetsWanted: Seq[String] = Nil): Find.Corpus = {
    val (hasVectors, allSets) = vectorMeta
    // an explicit default naming a set that was never indexed is a
    // config error — loud, never silently brute-forced
    defaultVectorset.foreach(d => require(allSets.isEmpty || allSets.contains(d),
      s"defaultVectorset '$d' is not an indexed vectorset " +
        s"(have: ${allSets.mkString(", ")})"))
    val sets0 = if (vectorsetsWanted.nonEmpty) vectorsetsWanted else allSets
    // a wanted-subset that excludes the default still BINDS the default
    // set's index: named requests use only their set, but an unnamed
    // request must resolve the default's similarity/normalize config —
    // a silent cosine fallback is the degradation this exists to
    // prevent. Binding costs one memoized handle, not per-request work.
    val sets = (sets0 ++
      defaultVectorset.filter(d => sets0.nonEmpty && allSets.contains(d))).distinct
    Find.Corpus(docs, docId, textCol,
      vectors =
        if (hasVectors) Some(IndexStore.readParquetMemo(spark, p("raw_vectors")))
        else None,
      vecId = docId,
      vectorsetCol = if (hasVectors) Some("vectorset") else None,
      index = Some(index),
      vectorIndexes =
        if (hasVectors) sets.map(vs => vs -> vectorIndex(vs)).toMap
        else Map.empty,
      defaultVectorset = defaultVectorset
        .orElse(sets.headOption).getOrElse("default"),
      // graph-source retrieval (FindRequest.graphQuery) binds the
      // provenance table when the relation ingest recorded one
      graphEdges =
        if (hasProvenance) Some(edgeTable(withProvenance = true)) else None,
      filterBindings = bindings,
      cachedFilterStats = filterStatsMemo)
  }

  /** `POST /kb/{kbid}/find` — hybrid retrieval (SURVEY §3.1). */
  def find(req: Find.FindRequest): DataFrame = Find.find(corpus(), req)

  // ------------------------------------------------------------------
  // search configurations (stored request presets)
  // ------------------------------------------------------------------

  /** The KB's named search configurations (`nucliadb_models/
    * configuration.py`; managed by the writer API, read at serve time).
    * The reference persists them in its KV metadata store — storage
    * plumbing of the Blob/KV class COVERAGE documents out of engine
    * scope; this registry is the per-KB (per-Engine) serving view. */
  private val searchConfigs =
    scala.collection.mutable.Map[String, Engine.SearchConfiguration]()

  def setSearchConfiguration(name: String,
      cfg: Engine.SearchConfiguration): Unit =
    synchronized { searchConfigs(name) = cfg }

  def deleteSearchConfiguration(name: String): Unit =
    synchronized { searchConfigs -= name }

  /** `/find?search_configuration=name` (`search/api/v1/find.py:
    * 208-226`): resolve the stored preset — unknown name and non-find
    * kind are the endpoint's 400s — and run find on the merged
    * request. The reference merges the two exclude_unset model dumps
    * with the REQUEST winning (`find.py:221-223` dict union); this API
    * mirrors the union by keeping both sides partial
    * ([[Engine.FindConfig]]): effective = defaults, then the config's
    * set fields, then the request's. */
  def findWithConfiguration(name: String,
      overrides: Engine.FindConfig = Engine.FindConfig()): DataFrame = {
    val cfg = synchronized(searchConfigs.get(name)).getOrElse(
      throw new IllegalArgumentException("Search configuration not found"))
    val fc = cfg match {
      case Engine.FindSearchConfiguration(c) => c
      case _ => throw new IllegalArgumentException(
        "This search configuration is not valid for `find`")
    }
    find(overrides.over(fc.over(Find.FindRequest())))
  }

  /** `/find` in paragraph mode — the reference's actual retrieval unit. */
  def findParagraphs(req: Find.FindRequest): DataFrame =
    Find.findParagraphs(corpus(), req)

  /** `POST /kb/{kbid}/retrieve` — raw retrieval over the same
    * [[Find.retrievalLists]] core, no hydration, per-match score
    * provenance (`search/api/v1/retrieve.py:77-139`). */
  def retrieve(req: Retrieve.RetrievalRequest): DataFrame =
    Retrieve.retrieve(corpus(), req)

  /** `GET /kb/{kbid}/resource/{rid}/search` — paragraph search scoped
    * to one resource (`search/api/v1/resource/search.py`). */
  def resourceSearch(rid: Any, query: String, topK: Int = 20,
      filter: Option[FilterExpr] = None,
      fields: Seq[String] = Nil,
      highlight: Boolean = false,
      bm25: Boolean = false,
      withDuplicates: Boolean = false): DataFrame =
    Search.resourceSearch(corpus(), rid, query, topK, filter, fields,
      highlight, bm25, withDuplicates)

  /** `POST /kb/{kbid}/hydrate` — hydrate a paragraph-id set with
    * optional positional-neighbour expansion
    * (`search/api/v1/hydrate.py`). */
  def hydrate(ids: Seq[String],
      h: Hydrate.Hydration = Hydrate.Hydration()): DataFrame =
    Hydrate.paragraphs(corpus(), ids, h)

  /** `POST /kb/{kbid}/augment` — typed per-id augmentation
    * (`search/api/v1/augment.py`): resource props, field text/labels/
    * entities, conversation selectors, paragraph neighbours.
    * Entity detection binds this engine's relation-node values when
    * relations are ingested ([[Augment.Bindings.entityNodes]] wins if
    * the caller passes its own). */
  def augment(req: Augment.AugmentRequest,
      bind: Augment.Bindings = Augment.Bindings()): Augment.Augmented = {
    val b =
      if (bind.entityNodes.isDefined || !hasProvenance) bind
      else bind.copy(entityNodes = Some((
        graphNodesTable.select(col("value")).distinct(), "value")))
    Augment.augment(corpus(), req, conversationStore, b)
  }

  /** The /ask prompt-context build over a find page
    * (`search/search/chat/prompt.py`): RAG strategy + size cap.
    * `hits` is a find/findParagraphs response carrying
    * (paragraph_id, text, order). */
  def promptContext(hits: DataFrame,
      strategy: PromptContext.Strategy = PromptContext.Default,
      maxSize: Option[Long] = None,
      bind: PromptContext.Bindings = PromptContext.Bindings(),
      metadata: Option[PromptContext.MetadataExtension] = None): DataFrame =
    PromptContext.build(corpus(), hits, strategy, maxSize, bind,
      conversations = conversationStore, metadata = metadata)

  // message-grain conversation store probe, one FS check per instance
  // (invalidated by re-ingest like every other serving memo)
  private var convMemo: Option[Option[Augment.ConversationStore]] = None
  protected def conversationStore: Option[Augment.ConversationStore] =
    synchronized {
      convMemo.getOrElse {
        val pth = new org.apache.hadoop.fs.Path(p("conversations"))
        val exists = pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(pth)
        val s =
          if (!exists) None
          else {
            val df = spark.read.parquet(p("conversations"))
            Some(Augment.ConversationStore(df, docId, "field_id", "split",
              textCol,
              mtypeCol = if (df.columns.contains("mtype")) Some("mtype")
                else None))
          }
        convMemo = Some(s)
        s
      }
    }

  /** `GET /kb/{kbid}/search` — multi-list response (SURVEY §3.2).
    * A doc store carrying a `created` column (the conventional name,
    * like the typed edge columns) binds the parser's default sort:
    * an empty-query request with no explicit sort serves the
    * created-DESC recency listing (`parsers/search.py:168-182`);
    * without the column the default sort has nothing to order by and
    * the empty-query request keeps returning empty lists. */
  def search(req: Search.SearchRequest): Search.SearchResponse =
    Search.search(docs, docId, textCol, labelsCol,
      paragraphs = Some((index.paragraphs, "paragraph_id", "p_text")),
      req = req, index = Some(index), bindings = bindings,
      createdCol = Some("created").filter(docs.columns.contains),
      // the SEMANTIC feature serves this engine's vector store (the
      // same per-set indexes + similarity configs find uses); engines
      // without ingested vectors serve no sentences list
      semanticCorpus = Some(corpus()))

  /** `GET /kb/{kbid}/suggest` (SURVEY §3.4) — merged paragraph + entity
    * completion; `filter` applies the reference's field/security
    * prefilter to BOTH sources (`shard_suggest.rs:131-160`). Entity
    * nodes are the relation index's node values with their resource
    * provenance (requires [[ingestRelations]] with `resourceCol`).
    * BOTH branches run the relation-suggest fuzzy-prefix entity
    * matcher (the reference builds the relation request identically
    * with or without a prefilter, `shard_suggest.rs:45-160`) — the
    * same stem completes the same entities filtered or not. */
  def suggest(query: String, topK: Int = 10,
      filter: Option[FilterExpr] = None,
      features: Set[Suggest.Feature] = Suggest.Feature.All): DataFrame = {
    val ix = index
    // full-surface requests keep the exact merged code paths the
    // oracle queries pin; single-feature requests run ONLY the
    // selected sub-search (the reference appends one proto feature per
    // option and the engine skips the other index entirely,
    // `query_parser/parsers/suggest.py:58-63`) — feature selection
    // must not cost the unselected side's jobs
    if (features == Suggest.Feature.All) filter match {
      case None =>
        Suggest.suggestMergedFuzzy(parTermFreq,
          graphNodesTable.select("value"), "value", query, topK)
      case Some(f) =>
        Suggest.suggestFilteredMerged(
          ix.parPostings.getOrElse(throw new IllegalStateException(
            s"suggest needs the paragraph posting pair — $parPostingsRemedy")),
          docs, docId, Some(f),
          (graphNodesTable, "value", Some("resource_id")),
          query, topK, bindings = bindings)
    }
    else if (features.isEmpty) // featureless request: empty response,
      // response-shaped (the engine ran no sub-search)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("suggestion",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("freq",
            org.apache.spark.sql.types.LongType, nullable = false))))
    else if (features == Set[Suggest.Feature](Suggest.Feature.Paragraph)) {
      val terms = filter match {
        case None =>
          Suggest.suggest(parTermFreq, "term", "freq", None, query, topK).terms
        case Some(f) =>
          Suggest.suggestFiltered(
            ix.parPostings.getOrElse(throw new IllegalStateException(
              s"suggest needs the paragraph posting pair — $parPostingsRemedy")),
            docs, docId, Some(f), None, query, topK, bindings = bindings).terms
      }
      terms.select(col("term").as("suggestion"),
          lit("paragraph").as("source"), col("freq"))
        .orderBy(col("freq").desc, col("suggestion").asc)
    } else {
      val allowed = filter.map(f =>
        docs.where(FilterExpr.compile(f, bindings))
          .select(col(docId).cast("string").as("__allowed_doc")))
      Suggest.suggestEntitiesFiltered(graphNodesTable, "value",
          Some("resource_id"), allowed, query, topK)
        .select(col("value").as("suggestion"), lit("entity").as("source"),
          lit(0L).as("freq"))
        .orderBy(col("suggestion").asc)
    }
  }

  /** The remedy named when the paragraph posting pair is missing —
    * batch roots rebuild via ingest; the streamed override says
    * recompact/re-stream instead (batch ingest is refused there). */
  protected def parPostingsRemedy: String = "run ingestDocuments"

  /** The corpus-wide `(term, freq)` suggest dictionary the unfiltered
    * suggest serves — batch roots read the ingest-materialized
    * `par_termfreq`; the streamed override rolls it up from the
    * winner-filtered segment postings. */
  protected def parTermFreq: DataFrame =
    IndexStore.readParquetMemo(spark, p("text") + "/par_termfreq")

  /** Node values of the relation index with resource provenance —
    * the entity-suggest source (src and dst of every provenance row).
    * A corpus without relations (or whose relation ingest skipped
    * `resourceCol`) serves an empty node set: suggest then completes
    * from the paragraph dictionary alone, like a kb with no entities. */
  protected def graphNodesTable: DataFrame = {
    if (!hasProvenance)
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("resource_id",
            org.apache.spark.sql.types.StringType))))
    else {
      val er = IndexStore.readParquetMemo(spark, p("graph") + "/edge_resources")
      er.select(explode(array(col("src"), col("dst"))).as("value"),
        col("resource_id"))
    }
  }

  /** The graph [[GraphSearch.EdgeTable]] over the at-rest relation
    * index: the deduped src-sorted copy for open queries, the
    * provenance table when a prefilter needs per-resource rows.
    *
    * The typed dimensions (node type/subtype, relation type —
    * `nidx_relation/src/schema.rs:41-48`) bind BY CONVENTION when the
    * ingest wrote them: [[ingestRelations]] passes `typedCols` through
    * under the caller's names, and a corpus ingested with the
    * conventional `src_type`/`src_subtype`/`dst_type`/`dst_subtype`/
    * `rel_type` columns serves typed path constraints — and
    * [[findRelations]] deletions, which compile to subtype-constrained
    * paths — through this facade; other names need a hand-built
    * [[GraphSearch.EdgeTable]]. */
  def edgeTable(withProvenance: Boolean = false): GraphSearch.EdgeTable = {
    val df = IndexStore.readParquetMemo(spark,
      p("graph") + (if (withProvenance) "/edge_resources" else "/edges"))
    def bound(c: String): Option[String] = Some(c).filter(df.columns.contains)
    GraphSearch.EdgeTable(df, "src", "rel", "dst",
      srcTypeCol = bound("src_type"), srcSubtypeCol = bound("src_subtype"),
      dstTypeCol = bound("dst_type"), dstSubtypeCol = bound("dst_subtype"),
      relTypeCol = bound("rel_type"),
      resourceCol = if (withProvenance) Some("resource_id") else None)
  }

  /** Compile a doc-table prefilter into the allowed-resource id set the
    * graph/suggest endpoints intersect with. */
  def allowedResources(f: FilterExpr): DataFrame =
    docs.where(FilterExpr.compile(f, bindings)).select(docId)

  /** A filtered graph query needs per-resource edge rows — the same
    * contract GraphSearch.applyPrefilter enforces, raised HERE so a
    * provenance-less corpus fails with the remedy spelled out rather
    * than a raw path-not-found on `graph/edge_resources`. */
  private def requireProvenanceFor(filter: Option[FilterExpr]): Unit =
    require(filter.isEmpty || hasProvenance,
      "a filtered graph query needs edge provenance — ingest relations " +
        "with resourceCol so edge_resources is written")

  /** `POST /kb/{kbid}/graph` — path search (SURVEY §3.3); with `filter`
    * the prefilter pushes into the relation search exactly like the
    * reference (`query_planner.rs:154-166`). */
  def graph(q: GraphSearch.PathQuery, topK: Int = 50,
      filter: Option[FilterExpr] = None): DataFrame = {
    requireProvenanceFor(filter)
    GraphSearch.search(edgeTable(filter.nonEmpty), q, topK,
      allowedResources = filter.map(allowedResources))
  }

  /** `POST /kb/{kbid}/graph/nodes`. */
  def graphNodes(q: GraphSearch.PathQuery, topK: Int = 50,
      filter: Option[FilterExpr] = None): DataFrame = {
    requireProvenanceFor(filter)
    GraphSearch.nodesSearch(edgeTable(filter.nonEmpty), q, topK,
      allowedResources = filter.map(allowedResources))
  }

  /** Find's RELATIONS feature (`features=[relations]`): the distance-1
    * neighbour subgraph of the query's entry points — explicit
    * `query_entities` or detected ones — merged into per-entry
    * directional relation rows ([[GraphSearch.relationsSubgraph]];
    * `parsers/find.py:169-201`, `merge.py:426-477`). A `filter`
    * prefilters through resource provenance like every graph query;
    * the deduped open-query edge copy carries no resource ids, so
    * `resource_id` is null there (prefiltered requests serve it). */
  def findRelations(
      entryPoints: Seq[GraphSearch.EntryPoint],
      deletedEntities: Map[String, Seq[String]] = Map.empty,
      deletedGroups: Seq[String] = Nil,
      topK: Int = 50,
      filter: Option[FilterExpr] = None): DataFrame = {
    requireProvenanceFor(filter)
    val t = edgeTable(filter.nonEmpty)
    // deletions compile to subtype-constrained typed paths
    // (GraphSearch.relationsSubgraph — the reference groups deleted
    // entities per subtype, parsers/unit_retrieval.py:178-185), so an
    // edge table without subtype columns cannot evaluate them: reject
    // UP FRONT with the remedy instead of letting the path compiler
    // throw a bare column-missing error mid-plan (ADVICE r15)
    require((deletedEntities.isEmpty && deletedGroups.isEmpty) ||
        (t.srcSubtypeCol.isDefined && t.dstSubtypeCol.isDefined),
      "deleted_entities/deleted_entity_groups need node subtype columns " +
        "on the edge tables — ingest relations with typedCols named " +
        "(src_type, src_subtype, dst_type, dst_subtype, rel_type), or " +
        "call GraphSearch.relationsSubgraph with a typed EdgeTable " +
        "(streamed roots carry untyped (resource, rel, dst) edges and " +
        "cannot serve deletions)")
    GraphSearch.relationsSubgraph(t, entryPoints,
      deletedEntities, deletedGroups, topK,
      allowedResources = filter.map(allowedResources))
  }

  /** /search's RELATIONS feature — the SAME distance-1 subgraph merge
    * as find's ([[findRelations]]; `merge.py:534-537` routes both
    * surfaces to merge_relations_results), except the /search parser
    * builds its RelationQuery from DETECTED entities only, with NO
    * deletions (`parsers/search.py:158-163` _parse_relation_query —
    * empty deleted_entity_groups/deleted_entities; /search has no
    * query_entities param). The reference detects via the external
    * Predict NER — fixture-isolated here like query embeddings:
    * detection runs the engine's own entity matcher
    * ([[GraphRag.queryEntities]], the suggest-methodology fuzzy word
    * match over this corpus's relation nodes), or the caller passes
    * explicit `entryPoints` to stand in for the external model's
    * output. */
  def searchRelations(query: String, topK: Int = 50,
      filter: Option[FilterExpr] = None,
      entryPoints: Option[Seq[GraphSearch.EntryPoint]] = None): DataFrame = {
    val eps = entryPoints.getOrElse(
      // bounded by queryEntities' own top-50 cut — a driver list by
      // construction, like every graph frontier
      GraphRag.queryEntities(edgeTable(), query).collect()
        .map(r => GraphSearch.EntryPoint(r.getString(0))).toSeq)
    // NER detecting nothing is the COMMON case for arbitrary queries —
    // the reference serves an empty relations section (the parser
    // builds RelationQuery(entry_points=[]) and the merge iterates
    // nothing), never an error; explicit empty entryPoints get the
    // same empty response shape
    if (eps.isEmpty) {
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq("entry_point", "direction", "entity", "entity_type",
          "entity_subtype", "relation_label", "relation_type", "resource_id")
          .map(StructField(_, StringType))))
    }
    else findRelations(eps, topK = topK, filter = filter)
  }

  /** `POST /kb/{kbid}/graph/relations`. */
  def graphRelations(q: GraphSearch.PathQuery, topK: Int = 50,
      filter: Option[FilterExpr] = None): DataFrame = {
    requireProvenanceFor(filter)
    GraphSearch.relationsSearch(edgeTable(filter.nonEmpty), q, topK,
      allowedResources = filter.map(allowedResources))
  }

  /** `/catalog` — faceted browsing over the doc store (SURVEY §3.5):
    * title query-match mode + optional filter + facet counts + sort +
    * OFFSET pagination, the reference's PG-backed catalog shape
    * (`common/catalog/pg.py`).
    *
    * @param sort (column, ascending) — the reference's
    *   created/modified/title sort (`pg.py:242-258`, `ORDER BY field
    *   dir`); the id rides as tiebreak so pages are deterministic
    *   (PG leaves equal-key order arbitrary). None = id order (the
    *   reference's no-sort order is PG-arbitrary; id order is the
    *   deterministic analog).
    * @param pageNumber OFFSET pagination exactly like the reference
    *   (`pg.py:261-262`, `LIMIT page_size OFFSET page_size *
    *   page_number`) — catalog is a browse surface with shallow pages
    *   by contract; deep cursors belong to find's search_after
    * @param withStatus the deprecated-but-served processing-status
    *   filter ([[Facets.withStatusExpr]] — `parsers/catalog.py:150-157`
    *   maps it onto `/n/s/...` status facets); it belongs to the
    *   old-filter bag, so it ANDs with `filter` like the reference ANDs
    *   it with the parsed old filters (`parse_old_filters` appends it
    *   to the same bool_and)
    * @param hidden the catalog's hidden tri-state
    *   ([[Facets.hiddenExpr]] — `parsers/catalog.py:67-77`: Some(true)
    *   = only hidden resources, Some(false) = exclude them, None =
    *   nothing); ANDed onto whatever filter parsed, exactly the
    *   reference's wrap */
  def catalog(
      titleCol: String,
      titleQuery: Option[(Facets.CatalogMatch, String)] = None,
      filter: Option[FilterExpr] = None,
      facetPrefixes: Seq[String] = Nil,
      topK: Int = 20,
      sort: Option[(String, Boolean)] = None,
      pageNumber: Int = 0,
      withStatus: Option[Facets.ProcessingStatus] = None,
      hidden: Option[Boolean] = None): Search.SearchResponse = {
    require(pageNumber >= 0, "pageNumber must be >= 0")
    val effFilter = (filter.toSeq ++
      withStatus.map(Facets.withStatusExpr).toSeq ++
      hidden.map(Facets.hiddenExpr).toSeq) match {
      case Nil => None
      case Seq(one) => Some(one)
      case both => Some(FilterExpr.And(both))
    }
    val base0 = effFilter.map(f => docs.where(FilterExpr.compile(f, bindings)))
      .getOrElse(docs)
    val base = titleQuery.map { case (m, q) =>
      base0.where(Facets.catalogMatch(col(titleCol), m, q))
    }.getOrElse(base0)
    val ordered = sort match {
      case Some((f, asc)) =>
        base.orderBy(if (asc) col(f).asc else col(f).desc, col(docId).asc)
      case None => base.orderBy(col(docId).asc)
    }
    val page =
      if (pageNumber == 0) ordered.limit(topK)
      else ordered.offset(pageNumber * topK).limit(topK)
    Search.SearchResponse(
      documents = Some(page),
      paragraphs = None,
      facets =
        if (facetPrefixes.isEmpty) None
        else Some(Facets.facetCounts(base, labelsCol, facetPrefixes)
          .orderBy("facet")))
  }

  /** `GET /kb/{kbid}/catalog/facets` — resource counts per facet path
    * over the whole doc store ([[Facets.catalogFacets]];
    * `search/api/v1/catalog.py:200-214`). `prefixes` are the request's
    * (prefix, depth) pairs — empty lists every facet.
    *
    * With [[cacheCatalogFacetCounts]] registered, requests serve from
    * the at-rest count table instead of re-aggregating the corpus —
    * identical output, cost ∝ |distinct facet paths| instead of rows
    * (the round-18 measured-linear slope's escape hatch, DESIGN.md). */
  def catalogFacets(
      prefixes: Seq[(String, Option[Int])] = Nil): DataFrame =
    facetCountsMemo match {
      case Some(counts) => Facets.catalogFacetsAtRest(counts, prefixes)
      case None => Facets.catalogFacets(docs, labelsCol, prefixes)
    }

  /** Build and register the at-rest per-facet count table (round 18):
    * one aggregation over the doc store, written under the index root,
    * after which every /catalog/facets request filters the small
    * table (facet-population-sized — the label taxonomy, not the
    * corpus). Counts are additive over resources, so an incremental
    * deployment maintains the table by summing segment deltas; this
    * facade rebuilds on explicit re-registration and DROPS the table
    * on re-ingest (serving stale counts would silently miscount —
    * same invalidation contract as the filter-stats cache). */
  def cacheCatalogFacetCounts(): Unit = {
    // persist-and-bind through the ONE shared step (round 19) — the
    // overwrite deletes the previous registration's part files, and
    // persistServingTable drops any memoized reader before re-binding
    val bound = IndexStore.persistServingTable(spark,
      Facets.catalogFacetCounts(docs, labelsCol), p("catalog_facet_counts"))
    synchronized { facetCountsMemo = Some(bound) }
  }
}

object Engine {

  /** A stored search preset's find side (`nucliadb_models/
    * configuration.py:52` — FindConfig IS a FindRequest minus the
    * `search_configuration` field itself): every field optional, a set
    * field supplies the value for a request that left it unset. The
    * merge contract is the endpoint's dict union of exclude_unset
    * dumps (`find.py:221-223`, request wins); one representable
    * divergence: a request cannot explicitly RESET an optional the
    * config set (pydantic's explicit-null would; an Option-partial
    * cannot distinguish unset from reset). */
  final case class FindConfig(
      query: Option[String] = None,
      queryVector: Option[Seq[Float]] = None,
      filter: Option[FilterExpr] = None,
      topK: Option[Int] = None,
      semanticMinScore: Option[Double] = None,
      keywordMinScore: Option[Double] = None,
      vectorset: Option[String] = None,
      rerank: Option[Boolean] = None,
      paragraphBm25: Option[Boolean] = None,
      fields: Option[Seq[String]] = None,
      withDuplicates: Option[Boolean] = None,
      highlight: Option[Boolean] = None) {
    /** Overlay this partial's SET fields onto `base`. */
    def over(base: Find.FindRequest): Find.FindRequest = base.copy(
      query = query.getOrElse(base.query),
      queryVector = queryVector.orElse(base.queryVector),
      filter = filter.orElse(base.filter),
      topK = topK.getOrElse(base.topK),
      semanticMinScore = semanticMinScore.getOrElse(base.semanticMinScore),
      keywordMinScore = keywordMinScore.getOrElse(base.keywordMinScore),
      vectorset = vectorset.orElse(base.vectorset),
      rerank = rerank.getOrElse(base.rerank),
      paragraphBm25 = paragraphBm25.getOrElse(base.paragraphBm25),
      fields = fields.getOrElse(base.fields),
      withDuplicates = withDuplicates.getOrElse(base.withDuplicates),
      highlight = highlight.getOrElse(base.highlight))
  }

  /** The discriminated-kind preset union (`configuration.py:55-70`).
    * The ask kind stores its RETRIEVAL portion (the ask pipeline's
    * find request — our /ask surface composes over find, q93/q165+);
    * its generative knobs (generative_model, prompts) are
    * external-service parameters of the documented-out predict class.
    * Kind mismatch at serve time is the endpoint's 400. */
  sealed trait SearchConfiguration
  final case class FindSearchConfiguration(config: FindConfig)
      extends SearchConfiguration
  final case class AskSearchConfiguration(config: FindConfig)
      extends SearchConfiguration

  /** Per-vectorset serving spec for a streamed root: the batch-trained
    * IVF centroids + PQ codebook the segments encode against (the SAME
    * model passed to the stream's
    * [[graft.streaming.IncrementalIndex.SegmentVectorSpec]] — the
    * reference reuses the vectorset config's quantization across
    * segments, `nidx_vector/src/indexer.rs`), plus the set's
    * similarity/normalization config (`config.rs:102-137`). */
  final case class StreamVectorSpec(
      centroids: Seq[(Int, Seq[Float])],
      codebook: Seq[(Int, Seq[Float])],
      m: Int,
      similarity: graft.functions.VectorFunctions.Similarity =
        graft.functions.VectorFunctions.Similarity.Cosine,
      normalized: Boolean = false)

  /** Serve a STREAMED (LSM-segment) corpus through the full Engine
    * endpoint surface: find/findParagraphs/search/suggest/graph/catalog
    * run over [[graft.streaming.IncrementalIndex.segmentTables]] /
    * segmentVectorTables / segmentEdges with latest-wins across
    * segments, exactly the tables the stream
    * ([[graft.streaming.IncrementalIndex.startIndexSegments]]) and the
    * compactor maintain. `docs` is the caller's doc store (segments
    * carry indexes, not payloads — the reference's KV split); its rows
    * must reflect the same latest-wins state the caller's pipeline
    * maintains upstream.
    *
    * Handles are memoized per segment WATERMARK (the live-segment
    * listing): each access compares one driver-side FS listing and
    * rebinds exactly when the stream lands a segment or compaction
    * folds the set — the streamed analog of the batch facade's
    * re-ingest invalidation, with no explicit invalidate call to miss.
    */
  def forStream(
      spark: SparkSession,
      indexRoot: String,
      docs: DataFrame,
      docId: String = "rid",
      textCol: String = "text",
      seqCol: String = "seq",
      labelsCol: String = "labels",
      securityCol: String = "security_groups",
      vectorSpecs: Map[String, StreamVectorSpec] = Map.empty,
      defaultVectorset: Option[String] = None): StreamEngine =
    new StreamEngine(spark, indexRoot, docs, docId, textCol, seqCol,
      labelsCol, securityCol, vectorSpecs, defaultVectorset)
}

/** [[Engine.forStream]]'s implementation: every batch-root table
  * accessor overridden with its segment-served equivalent; the batch
  * ingest methods are refused (a streamed root's segments are written
  * by the stream, and a batch overwrite under it would corrupt the
  * LSM layout). Public so callers can reach the streamed-only
  * maintenance surface ([[compact]]). */
final class StreamEngine private[api] (
    spark0: SparkSession,
    indexRoot: String,
    docsDf: DataFrame,
    docId0: String,
    textCol0: String,
    val seqCol: String,
    labelsCol0: String,
    securityCol0: String,
    vectorSpecs: Map[String, Engine.StreamVectorSpec],
    defaultVectorset0: Option[String])
  extends Engine(spark0, indexRoot, docId0, textCol0, labelsCol0,
    securityCol0, defaultVectorset0) {

  import graft.streaming.IncrementalIndex

  /** Everything bound for one segment watermark: rebuilding is a few
    * driver-side plan constructions plus one count per vectorset (the
    * nVectors the find cost model reads) — paid once per segment-set
    * change, not per request. */
  private final case class Served(
      watermark: Seq[String],
      tables: IndexStore.IndexTables,
      vix: Map[String, IndexStore.VectorIndex],
      rawAll: Option[DataFrame],
      edges: Option[DataFrame],
      messages: Option[DataFrame],
      termFreq: DataFrame)

  private var servedMemo: Option[Served] = None

  /** Per-request snapshot pin: a composed endpoint (suggest reads the
    * index tables then the node projection; graph checks provenance
    * then binds edges) must derive EVERY table from ONE watermark
    * resolution — a segment landing or compaction between two `served`
    * reads would serve one request from two different segment sets,
    * the straddle corpus() already avoids by capturing a single
    * snapshot. The endpoint overrides below pin the snapshot for the
    * duration of the call; nested resolutions reuse the pin. */
  private val pinnedServed = new ThreadLocal[Served]

  private def withSnapshot[A](body: => A): A =
    if (pinnedServed.get() != null) body
    else {
      pinnedServed.set(resolveServed())
      try body finally pinnedServed.remove()
    }

  private def served: Served = {
    val pinned = pinnedServed.get()
    if (pinned != null) pinned else resolveServed()
  }

  private def resolveServed(): Served = synchronized {
    val wm = IncrementalIndex.liveSegments(spark, indexRoot)
    require(wm.nonEmpty, s"no live segments under $indexRoot — " +
      "start the stream (IncrementalIndex.startIndexSegments) first")
    servedMemo match {
      case Some(s) if s.watermark == wm => s
      case _ =>
        // EVERY table of the snapshot derives from the ONE `wm` listing
        // (the `…At` accessors): a fold or segment landing between two
        // internal re-listings would otherwise memoize a Served whose
        // tables span two different segment sets — the cross-table
        // straddle the per-request pin cannot repair once it's baked
        // into the snapshot itself
        val tables = IncrementalIndex.segmentTablesAt(spark, wm,
          docId, seqCol)
        val perSet = vectorSpecs.toSeq.sortBy(_._1).map { case (vs, spec) =>
          val (codes, raw) =
            IncrementalIndex.segmentVectorTablesAt(spark, wm,
              docId, seqCol, vs)
          val vix = IndexStore.VectorIndex(
            spec.centroids, spec.codebook, spec.m,
            nVectors = raw.count(),
            codes = codes,
            assignments = codes.select(col(docId), col("centroid_id")),
            raw = raw.select(col(docId), col("embedding")),
            similarity = spec.similarity, normalized = spec.normalized)
          (vs, vix, raw)
        }
        // ANY-carry binding (round 15): a mixed root — a stream that
        // gained relationsCol/messagesCol mid-life — serves the
        // optional tables from the CARRYING subset (global winners keep
        // it degrade-not-stale) instead of hiding them until a
        // compaction pass heals the fold
        val edges =
          if (IncrementalIndex.segmentsCarryAnyAt(spark, wm, "edges"))
            Some(IncrementalIndex.segmentEdgesAt(spark, wm, docId, seqCol))
          else None
        val messages =
          if (IncrementalIndex.segmentsCarryAnyAt(spark, wm, "messages"))
            Some(IncrementalIndex.segmentMessagesAt(spark, wm, docId, seqCol))
          else None
        // per-watermark BM25 population stats (round 18): the (N,
        // avgdl) aggregations every unrestricted keyword request was
        // paying live, computed at most ONCE per segment-set change —
        // LAZILY (per the r18 review): the thunks memoize on first
        // keyword use, so a segment landing never taxes requests that
        // issue no keyword query (a vector-only workload pays
        // nothing). Values identical to the live aggregation: same
        // count + avg over the same winner-filtered rows. df still
        // aggregates live (a per-segment at-rest df cannot describe
        // the cross-segment winner population).
        lazy val lazyDocStats = Some(graft.functions.Bm25.corpusStats(
          tables.docLengths, docId))
        lazy val lazyParStatsXrep = tables.parDocLengths.map(pdl =>
          graft.functions.Bm25.corpusStats(
            Find.excludeRepeated(pdl, withDuplicates = false),
            "paragraph_id"))
        val statTables = tables.copy(
          docStats = () => lazyDocStats,
          parStatsXrep = () => lazyParStatsXrep)
        val s = Served(wm, statTables,
          perSet.map(t => t._1 -> t._2).toMap,
          perSet.map(_._3).reduceOption(_ unionByName _),
          edges,
          messages,
          IncrementalIndex.segmentTermFreqAt(spark, wm, docId, seqCol))
        servedMemo = Some(s)
        s
    }
  }

  override def docs: DataFrame = docsDf
  override def index: IndexStore.IndexTables = served.tables
  override def vectorsets: Seq[String] = vectorSpecs.keys.toSeq.sorted
  override def vectorIndex(vs: String): IndexStore.VectorIndex =
    served.vix.getOrElse(vs, throw new IllegalArgumentException(
      s"vectorset '$vs' has no StreamVectorSpec on this streamed engine " +
        s"(have: ${vectorsets.mkString(", ")})"))
  override protected def hasProvenance: Boolean = served.edges.nonEmpty
  override protected def parTermFreq: DataFrame = served.termFreq

  /** Streamed conversation store: message-grain rows served from the
    * snapshot's segments with latest-wins (round 14 — streams passing
    * `messagesCol` to [[IncrementalIndex.writeSegment]] serve the
    * /augment and /ask Conversational selectors over a live root; a
    * root without the table keeps the batch-only bound: no store). */
  override protected def conversationStore: Option[Augment.ConversationStore] =
    served.messages.map(df =>
      Augment.ConversationStore(df, docId, "field_id", "split", "mtext",
        mtypeCol = Some("mtype")))

  /** Streamed relations are (docId, rel, dst) with the RESOURCE as the
    * source node (`noderesources.proto:201-209` — IndexRelations ride
    * the broker message, resource node as source), so every edge's
    * provenance IS its source id: the provenance-bearing EdgeTable
    * binds `docId` as resourceCol and filtered graph queries need no
    * separate edge_resources table. */
  override def edgeTable(withProvenance: Boolean = false): GraphSearch.EdgeTable =
    edgeTableOf(served.edges.getOrElse(throw new IllegalArgumentException(
      "this streamed root carries no relation edges — stream with " +
        "relationsCol so segments write them")), withProvenance)

  /** Build the serving EdgeTable from a SNAPSHOT's edge frame — takes
    * the frame, not a fresh `served` resolution, so a caller holding
    * one watermark snapshot (corpus()) binds edges from the SAME
    * segment set as its index tables; two independent `served` reads
    * could straddle a segment landing mid-request and fuse keyword
    * results over one watermark with graph candidates over another.
    * Node VALUES are strings whatever the doc id type (the node
    * projections union src and dst into one value column); the
    * untouched id rides along as the provenance column so the
    * prefilter semi-join stays type-exact against the doc store. */
  private def edgeTableOf(e: DataFrame,
      withProvenance: Boolean): GraphSearch.EdgeTable = {
    val typed = e.select(col(docId).cast("string").as("__src"),
      col("rel"), col("dst"), col(docId).as("__resource"))
    GraphSearch.EdgeTable(typed, "__src", "rel", "dst",
      resourceCol = if (withProvenance) Some("__resource") else None)
  }

  override protected def parPostingsRemedy: String =
    "recompact (or re-stream) the older segments so every live " +
      "segment carries par_postings/par_doclengths"

  override protected def graphNodesTable: DataFrame =
    served.edges match {
      case None => spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("resource_id",
            org.apache.spark.sql.types.StringType))))
      case Some(e) => e.select(
        explode(array(col(docId).cast("string"), col("dst"))).as("value"),
        col(docId).as("resource_id"))
    }

  // streamed filter-stats cache: registration only records the
  // filter; the stats compute lazily per WATERMARK (the corpus
  // changes every segment landing/compaction, and serving stale
  // population stats would silently break filter-then-score) — one
  // aggregation per registered filter per watermark change, amortized
  // across every request served from that segment set
  private var registeredFilters: Set[Find.RestrictionKey] = Set.empty
  private var statsWatermark: Seq[String] = Nil
  private var streamFilterStats: Map[Find.RestrictionKey, Find.CachedBm25Stats] =
    Map.empty
  override def cacheRestrictionStats(key0: Find.RestrictionKey): Unit = {
    val key = Find.RestrictionKey.of(key0.filter, key0.fields,
      key0.paragraphFilter, key0.filterOperatorOr)
    // eager validation AT THE CALLER (analysis only, no job, no
    // segments needed — registration legitimately precedes stream
    // start): a key the streamed serving cannot compute would
    // otherwise throw inside the stats recompute of every later
    // request — filtered or not — bricking the engine with no
    // deregister API. The batch override fails at the caller too.
    // Streamed segment roots never write a fields table (serveFrom
    // binds only the posting/doclength/paragraph trio), so a fields
    // key is refused UP FRONT with the remedy (the r16
    // refusal precedent, like cacheCatalogFacetCounts); a
    // paragraph-label key needs segment paragraphs that carry
    // p_labels (a per-root layout property — constant across folds).
    require(key.fields.isEmpty,
      "cacheRestrictionStats with a fields key on a streamed engine: " +
        "segment roots write no fields table, so the restricted " +
        "population cannot be computed. Serve field restrictions " +
        "from a batch-ingested corpus, or extend the segment writer " +
        "with the fields synthesis first.")
    key.paragraphFilter.foreach { pf =>
      // layout check when the root already has segments (p_labels is
      // a per-root layout property, constant across folds); a
      // PRE-START registration defers it — parSearchFrames' own
      // require then names the same remedy at first use
      if (IncrementalIndex.liveSegments(spark, indexRoot).nonEmpty)
        require(index.paragraphs.columns.contains("p_labels"),
          "cacheRestrictionStats with a paragraphFilter key: this " +
            "root's segment paragraphs carry no p_labels — attach " +
            "paragraph labels at the stream sink first")
      FilterExpr.compile(pf, FilterExpr.Bindings(labelsCol = "p_labels"))
      ()
    }
    key.filter.foreach(f =>
      docs.where(FilterExpr.compile(f, bindings)).queryExecution.analyzed)
    synchronized {
      registeredFilters += key
      statsWatermark = Nil // recompute (incl. the new entry) on next use
    }
  }

  /** A streamed root's corpus changes with every segment landing, so a
    * materialized count table would silently serve stale counts —
    * refused UP FRONT with the remedy (the r16 deletion-rejection
    * precedent): counts are additive over resources, so a streaming
    * deployment maintains the table at the SINK by summing per-segment
    * deltas (`union → groupBy(facet).sum`); this facade keeps the
    * corpus-aggregation path, which already serves the live
    * latest-wins view. */
  override def cacheCatalogFacetCounts(): Unit =
    throw new UnsupportedOperationException(
      "cacheCatalogFacetCounts on a streamed engine: the corpus changes " +
        "per segment and a materialized count table would serve stale " +
        "counts. Maintain the table at the stream sink instead (facet " +
        "counts are additive over resources — sum per-segment deltas); " +
        "catalogFacets here serves the live corpus-aggregation path.")

  override def corpus(vectorsetsWanted: Seq[String] = Nil): Find.Corpus = {
    val s = served
    defaultVectorset.foreach(d => require(s.vix.isEmpty || s.vix.contains(d),
      s"defaultVectorset '$d' has no StreamVectorSpec " +
        s"(have: ${vectorsets.mkString(", ")})"))
    val c0 = Find.Corpus(docs, docId, textCol,
      vectors = s.rawAll,
      vecId = docId,
      vectorsetCol = s.rawAll.map(_ => "vectorset"),
      index = Some(s.tables),
      vectorIndexes = s.vix,
      defaultVectorset = defaultVectorset
        .orElse(vectorsets.headOption).getOrElse("default"),
      // from the SAME snapshot as the index tables — never a second
      // `served` resolution that could land on a newer watermark
      graphEdges = s.edges.map(e => edgeTableOf(e, withProvenance = true)),
      filterBindings = bindings)
    if (registeredFilters.isEmpty) c0
    else c0.copy(cachedFilterStats = synchronized {
      if (statsWatermark != s.watermark) {
        streamFilterStats = registeredFilters.iterator
          .map(k => k -> Find.cachedStatsFor(c0, k)).toMap
        statsWatermark = s.watermark
      }
      streamFilterStats
    })
  }

  // each composed endpoint runs under ONE pinned watermark snapshot —
  // every table it touches resolves from the same segment set even if
  // the stream lands a segment or a compaction folds mid-request
  override def find(req: Find.FindRequest): DataFrame =
    withSnapshot(super.find(req))
  override def findParagraphs(req: Find.FindRequest): DataFrame =
    withSnapshot(super.findParagraphs(req))
  override def retrieve(req: Retrieve.RetrievalRequest): DataFrame =
    withSnapshot(super.retrieve(req))
  override def resourceSearch(rid: Any, query: String, topK: Int,
      filter: Option[FilterExpr], fields: Seq[String],
      highlight: Boolean, bm25: Boolean, withDuplicates: Boolean): DataFrame =
    withSnapshot(super.resourceSearch(rid, query, topK, filter, fields,
      highlight, bm25, withDuplicates))
  override def hydrate(ids: Seq[String], h: Hydrate.Hydration): DataFrame =
    withSnapshot(super.hydrate(ids, h))
  override def augment(req: Augment.AugmentRequest,
      bind: Augment.Bindings): Augment.Augmented =
    withSnapshot(super.augment(req, bind))
  override def promptContext(hits: DataFrame,
      strategy: PromptContext.Strategy,
      maxSize: Option[Long],
      bind: PromptContext.Bindings,
      metadata: Option[PromptContext.MetadataExtension]): DataFrame =
    withSnapshot(super.promptContext(hits, strategy, maxSize, bind, metadata))
  override def search(req: Search.SearchRequest): Search.SearchResponse =
    withSnapshot(super.search(req))
  override def suggest(query: String, topK: Int,
      filter: Option[FilterExpr],
      features: Set[Suggest.Feature]): DataFrame =
    withSnapshot(super.suggest(query, topK, filter, features))
  override def graph(q: GraphSearch.PathQuery, topK: Int,
      filter: Option[FilterExpr]): DataFrame =
    withSnapshot(super.graph(q, topK, filter))
  override def graphNodes(q: GraphSearch.PathQuery, topK: Int,
      filter: Option[FilterExpr]): DataFrame =
    withSnapshot(super.graphNodes(q, topK, filter))
  override def graphRelations(q: GraphSearch.PathQuery, topK: Int,
      filter: Option[FilterExpr]): DataFrame =
    withSnapshot(super.graphRelations(q, topK, filter))

  /** Streamed-only maintenance: ONE tiered compaction pass over the
    * root — the manual trigger for callers not running
    * [[graft.streaming.IncrementalIndex.AutoCompact]] on the stream
    * (the reference exposes the same split: a scheduler loop plus
    * on-demand merge jobs, `scheduler.rs` / `merge_task.rs`). The
    * watermark memo rebinds on the next request automatically — the
    * live-segment listing changes when groups fold.
    *
    * @param committedBatchId the stream checkpoint's commit watermark
    *   ([[graft.streaming.IncrementalIndex.committedBatchId]]) if the
    *   caller has it; `None` keeps every subsumed entry (safe default)
    * @return the folded groups (segment names), for observability
    */
  def compact(
      settings: IncrementalIndex.LogMergeSettings =
        IncrementalIndex.LogMergeSettings(),
      committedBatchId: Option[Long] = None): Seq[Seq[String]] =
    IncrementalIndex.compactSegmentsTiered(spark, indexRoot, docId,
      seqCol, settings, committedBatchId)

  private def refuseBatchIngest(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"$what is a batch-root operation — this engine serves a streamed " +
        "root whose segments are written by " +
        "IncrementalIndex.startIndexSegments; a batch overwrite under " +
        "it would corrupt the LSM layout")
  override def ingestDocuments(docs: DataFrame, langCol: Option[String],
      conversations: Option[DataFrame]): Unit =
    refuseBatchIngest("ingestDocuments")
  override def ingestVectors(vectors: DataFrame,
      configs: Map[String, Ingest.VectorSetConfig],
      numCentroids: Int, m: Int): Unit =
    refuseBatchIngest("ingestVectors")
  override def ingestRelations(edges: DataFrame, srcCol: String,
      relCol: String, dstCol: String, facetsCol: Option[String],
      typedCols: Seq[String], resourceCol: Option[String]): Unit =
    refuseBatchIngest("ingestRelations")
}
