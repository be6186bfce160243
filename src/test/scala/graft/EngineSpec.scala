package graft

import org.apache.spark.sql.functions._

import graft.api.{Engine, Find, GraphSearch, Search}
import graft.api.GraphSearch.{NodeMatch, PathQuery}
import graft.operators.{Facets, FilterExpr}
import graft.sources.Ingest

/** End-to-end facade spec: ONE Engine over one root directory drives
  * every serving endpoint the reference exposes — ingest → find /
  * findParagraphs / search / suggest / graph(+nodes/relations) /
  * catalog — pinning which at-rest tables each endpoint binds and
  * which request knobs reach which operator.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = graft.sources.IndexStore.deleteOnExit(
    java.nio.file.Files.createTempDirectory("graft-engine-").toString)

  private lazy val engine: Engine = {
    val e = new Engine(spark, root)
    val docs = Seq(
      (1L, "the little prince visits planets and meets a fox", "en", Seq("/l/genre/fiction")),
      (2L, "zarathustra speaks of the overman in the mountains", "de", Seq("/l/genre/philosophy")),
      (3L, "database engines scan columns and prune partitions", "en", Seq("/l/genre/tech")),
      (4L, "the prince asks the fox about taming and friendship", "en", Seq("/l/genre/fiction")))
      .toDF("doc_id", "text", "lang", "labels")
    e.ingestDocuments(docs, langCol = Some("lang"))
    // two vectorsets over the same ids — `sem` cosine, `semdot` the
    // same vectors under a dot config (the reference's paragraph
    // default similarity)
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.2f)),
      (2L, Seq(0.0f, 2.0f, 0.0f, 0.2f)),
      (3L, Seq(0.0f, 0.0f, 3.0f, 0.2f)),
      (4L, Seq(0.9f, 0.1f, 0.0f, 0.2f)))
      .toDF("doc_id", "embedding")
    e.ingestVectors(
      vecs.select(col("doc_id"), col("embedding"), lit("sem").as("vectorset"))
        .unionByName(vecs.select(col("doc_id"), col("embedding"),
          lit("semdot").as("vectorset"))),
      configs = Map("semdot" -> Ingest.VectorSetConfig(similarity = "dot")),
      numCentroids = 2, m = 2)
    e.ingestRelations(
      Seq(
        ("prince", "MEETS", "fox", 1L),
        ("prince", "MEETS", "fox", 4L),
        ("prince", "VISITS", "planet", 1L),
        ("zarathustra", "SPEAKS_OF", "overman", 2L))
        .toDF("s", "r", "d", "rid"),
      "s", "r", "d", resourceCol = Some("rid"))
    e
  }

  test("find: hybrid keyword+vector through the facade, then page 2 via search_after") {
    val req = Find.FindRequest(query = "prince fox",
      queryVector = Some(Seq(1.0f, 0.0f, 0.0f, 0.2f)),
      vectorset = Some("sem"), topK = 2)
    val page1 = engine.find(req).collect()
    assert(page1.length == 2)
    assert(page1.map(_.getLong(0)).toSet == Set(1L, 4L),
      page1.mkString(",")) // both keyword and vector agree: prince docs
    val last = page1.last
    val page2 = engine.find(req.copy(searchAfter = Some(Find.FindCursor(
        last.getDouble(1), last.getLong(0), page1.map(_.getLong(0)).toSeq))))
      .collect().map(_.getLong(0))
    assert(page2.nonEmpty && page2.toSet.intersect(page1.map(_.getLong(0)).toSet).isEmpty,
      s"page 2 must be disjoint: ${page2.toSeq}")
  }

  test("find: the dot-configured vectorset serves dot scores end to end") {
    val req = Find.FindRequest(
      queryVector = Some(Seq(1.0f, 1.0f, 1.0f, 0.0f)), topK = 4)
    val cos = engine.find(req.copy(vectorset = Some("sem")))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val dot = engine.find(req.copy(vectorset = Some("semdot")))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // cosine normalizes doc 2/3's larger norms away; dot rewards them —
    // doc 3 (0,0,3,.2) tops dot, while cosine ranks by angle
    assert(dot.head._1 == 3L, dot.mkString(","))
    assert(dot.map(_._1).toSeq != cos.map(_._1).toSeq,
      s"dot and cosine must order differently here: ${dot.toSeq} vs ${cos.toSeq}")
  }

  test("findParagraphs: BM25 paragraph mode with a label prefilter") {
    val hits = engine.findParagraphs(Find.FindRequest(query = "prince",
        filter = Some(FilterExpr.Facet("/l/genre/fiction")),
        paragraphBm25 = true, topK = 5))
      .collect()
    assert(hits.map(_.getLong(0)).toSet == Set(1L, 4L), hits.mkString(","))
  }

  test("search: document list + facet counts from one request") {
    val resp = engine.search(Search.SearchRequest(query = "prince",
      faceted = Seq("/l/genre")))
    assert(resp.documents.get.collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    val facets = resp.facets.get.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(facets("/l/genre/fiction") == 2L, facets.toString)
  }

  test("suggest: open and security/filter-prefiltered completion, both sources") {
    val open = engine.suggest("pr").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(open.contains(("prince", "entity")), open.mkString(","))
    assert(open.exists { case (s, src) => s.startsWith("pr") && src == "paragraph" })
    // filter to german docs: the paragraph stem list and entity list
    // both restrict — 'prince' (docs 1/4) disappears, zarathustra stays
    val de = engine.suggest("za",
        filter = Some(FilterExpr.Eq("lang", "de"))).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(de.contains(("zarathustra", "entity")), de.mkString(","))
    val dePrince = engine.suggest("pr",
        filter = Some(FilterExpr.Eq("lang", "de"))).collect()
    assert(dePrince.isEmpty, dePrince.mkString(","))
    // the OPEN branch runs the same fuzzy-prefix entity matcher as the
    // filtered one (shard_suggest builds the relation request
    // identically either way): a typo'd stem completes unfiltered too,
    // and a 1-char stem returns no entities instead of everything
    val typo = engine.suggest("zer").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(typo.contains(("zarathustra", "entity")), typo.mkString(","))
    assert(engine.suggest("z").collect()
      .forall(_.getString(1) == "paragraph"))
  }

  test("suggest: feature selection runs only the requested sub-search") {
    import graft.api.Suggest.Feature
    // each single-feature response is exactly its side of the merged one
    val merged = engine.suggest("pr").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val parOnly = engine.suggest("pr", features = Set(Feature.Paragraph))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val entOnly = engine.suggest("pr", features = Set(Feature.Entities))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(parOnly.nonEmpty && parOnly.forall(_._2 == "paragraph"))
    assert(entOnly.nonEmpty && entOnly.forall(_._2 == "entity"))
    assert((parOnly ++ entOnly).toSet == merged.toSet,
      s"feature split must partition the merged response: " +
        s"${(parOnly ++ entOnly).toSet} vs ${merged.toSet}")
    // the prefilter applies inside a single-feature request too:
    // entity-only under lang=de keeps zarathustra, drops prince
    val entDe = engine.suggest("za",
        filter = Some(FilterExpr.Eq("lang", "de")),
        features = Set(Feature.Entities)).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(entDe.contains(("zarathustra", "entity")) &&
      entDe.forall(_._2 == "entity"), entDe.mkString(","))
    assert(engine.suggest("pr",
        filter = Some(FilterExpr.Eq("lang", "de")),
        features = Set(Feature.Paragraph)).collect().isEmpty)
    // featureless request: empty response in the response shape
    val none = engine.suggest("pr", features = Set.empty)
    assert(none.columns.toSeq == Seq("suggestion", "source", "freq"))
    assert(none.collect().isEmpty)
  }

  test("graph: path/nodes/relations with and without a prefilter") {
    val q = PathQuery.Path(src = NodeMatch.Exact("prince"))
    assert(engine.graph(q).collect().map(_.getString(2)).toSet
      == Set("fox", "planet"))
    // only doc 4's relations: the VISITS edge (doc 1 only) drops
    val filtered = engine.graph(q,
        filter = Some(FilterExpr.Facet("/l/genre/fiction")))
    assert(filtered.collect().map(_.getString(2)).toSet == Set("fox", "planet"))
    val doc4 = engine.graph(q, filter = Some(FilterExpr.Keyword("taming")))
      .collect().map(_.getString(2)).toSet
    assert(doc4 == Set("fox"), doc4.toString)
    assert(engine.graphNodes(q).collect().map(_.getString(0)).toSet
      == Set("prince", "fox", "planet"))
    assert(engine.graphRelations(q, filter = Some(FilterExpr.Keyword("taming")))
      .collect().map(_.getString(0)).toSeq == Seq("MEETS"))
  }

  test("docs-only corpus: keyword retrieval works with no vector ingest; vector request fails loudly") {
    val r2 = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-engine-txt-").toString)
    val e2 = new Engine(spark, r2)
    e2.ingestDocuments(Seq(
        (1L, "alpha beta gamma", "en", Seq.empty[String]),
        (2L, "beta delta", "en", Seq.empty[String]))
      .toDF("doc_id", "text", "lang", "labels"))
    assert(e2.vectorsets.isEmpty)
    val hits = e2.find(Find.FindRequest(query = "beta", topK = 5))
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L))
    // a vector request against a docs-only corpus is a caller bug and
    // must fail with Find's own contract, not an FS read error
    intercept[IllegalArgumentException] {
      e2.find(Find.FindRequest(queryVector = Some(Seq(1.0f))))
    }
  }

  test("unnamed vector request serves the DEFAULT set's index and config") {
    engine // force fixture ingest
    val eDot = new Engine(spark, root, defaultVectorset = Some("semdot"))
    val unnamed = eDot.find(Find.FindRequest(
        queryVector = Some(Seq(1.0f, 1.0f, 1.0f, 0.0f)), topK = 4))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val named = eDot.find(Find.FindRequest(
        queryVector = Some(Seq(1.0f, 1.0f, 1.0f, 0.0f)), topK = 4,
        vectorset = Some("semdot")))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // the default set's DOT config must apply to the unnamed request —
    // not a silent cosine fallback (doc 3's big norm tops dot)
    assert(unnamed.sameElements(named), s"${unnamed.toSeq} vs ${named.toSeq}")
    assert(unnamed.head._1 == 3L, unnamed.mkString(","))
  }

  test("findParagraphs pages with search_after: disjoint pages reproduce the full cut") {
    val req = Find.FindRequest(query = "prince fox", paragraphBm25 = true,
      topK = 1)
    val full = engine.findParagraphs(req.copy(topK = 3)).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val page1 = engine.findParagraphs(req).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val page2 = engine.findParagraphs(req.copy(searchAfter =
        Some(Find.FindCursor(page1.last._2, page1.last._1,
          page1.map(_._1).toSeq))))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert((page1 ++ page2).sameElements(full.take(2)),
      s"paged walk must reproduce the composed order: " +
        s"${(page1 ++ page2).toSeq} vs ${full.toSeq}")
  }

  test("re-ingest on a live engine rebinds every serving handle (no stale file listings)") {
    val r3 = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-engine-re-").toString)
    val e3 = new Engine(spark, r3)
    def corpusOf(tag: String) = Seq(
        (1L, s"alpha $tag first", "en", Seq.empty[String]),
        (2L, s"beta $tag second", "en", Seq.empty[String]))
      .toDF("doc_id", "text", "lang", "labels")
    e3.ingestDocuments(corpusOf("old"))
    assert(e3.find(Find.FindRequest(query = "old")).count() == 2)
    // overwrite the corpus in place: the memoized table handles and the
    // shared per-path plan cache must rebind — a stale file listing
    // would throw FileNotFound or serve the old rows
    e3.ingestDocuments(corpusOf("new"))
    assert(e3.find(Find.FindRequest(query = "old")).count() == 0)
    assert(e3.find(Find.FindRequest(query = "new")).count() == 2)
    // same for a re-run vector ingest (new index, new meta)
    def vecsOf(x: Float) = Seq(
        (1L, Seq(x, 0.0f, 0.0f, 0.1f)), (2L, Seq(0.0f, x, 0.0f, 0.1f)))
      .toDF("doc_id", "embedding")
      .select(col("doc_id"), col("embedding"), lit("s").as("vectorset"))
    e3.ingestVectors(vecsOf(1.0f), numCentroids = 1, m = 2)
    assert(e3.find(Find.FindRequest(
      queryVector = Some(Seq(1.0f, 0.0f, 0.0f, 0.0f)), topK = 1))
      .collect().head.getLong(0) == 1L)
    e3.ingestVectors(vecsOf(-1.0f), numCentroids = 1, m = 2)
    // with negated vectors the nearest flips to doc 2
    assert(e3.find(Find.FindRequest(
      queryVector = Some(Seq(-1.0f, 0.0f, 0.0f, 0.0f)), topK = 1))
      .collect().head.getLong(0) == 1L)
    assert(e3.find(Find.FindRequest(
      queryVector = Some(Seq(0.0f, -1.0f, 0.0f, 0.0f)), topK = 1))
      .collect().head.getLong(0) == 2L)
  }

  test("catalog: title match modes + facet rollup over the doc store") {
    val resp = engine.catalog("text",
      titleQuery = Some((Facets.CatalogMatch.Words, "prince fox")),
      facetPrefixes = Seq("/l/genre"))
    assert(resp.documents.get.collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(resp.facets.get.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
      .apply("/l/genre/fiction") == 2L)
  }

  test("search configurations: stored preset merges under the request (find.py:208-226)") {
    import graft.api.Engine.{AskSearchConfiguration, FindConfig, FindSearchConfiguration}
    engine.setSearchConfiguration("preset", FindSearchConfiguration(
      FindConfig(query = Some("prince fox"), topK = Some(1))))
    // the caller sends nothing: the preset's query and page size serve
    val viaCfg = engine.findWithConfiguration("preset")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val direct = engine.find(Find.FindRequest(query = "prince fox", topK = 1))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaCfg == direct && viaCfg.size == 1)
    // the request's set fields WIN over the config's (the dict union)
    assert(engine.findWithConfiguration("preset",
      FindConfig(topK = Some(2))).count() == 2)
    // unknown name and non-find kind are the endpoint's 400s
    intercept[IllegalArgumentException] {
      engine.findWithConfiguration("missing")
    }
    engine.setSearchConfiguration("askish", AskSearchConfiguration(FindConfig()))
    intercept[IllegalArgumentException] {
      engine.findWithConfiguration("askish")
    }
    engine.deleteSearchConfiguration("preset")
    intercept[IllegalArgumentException] {
      engine.findWithConfiguration("preset")
    }
  }

  test("findRelations: entry-point subgraph through the facade, prefiltered") {
    import graft.api.GraphSearch.EntryPoint
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(5))).toSeq.sorted
    // open query: the deduped edge copy, prince's 1-hop OUT neighbours
    assert(shape(engine.findRelations(Seq(EntryPoint("prince")))) == Seq(
      ("prince", "out", "fox", "MEETS"),
      ("prince", "out", "planet", "VISITS")))
    // destination entry collects IN rows
    assert(shape(engine.findRelations(Seq(EntryPoint("overman")))) == Seq(
      ("overman", "in", "zarathustra", "SPEAKS_OF")))
    // the find prefilter reaches the relation sub-search
    // (query_planner.rs:154-166): philosophy docs exclude the
    // prince-provenance edges entirely
    assert(shape(engine.findRelations(Seq(EntryPoint("prince"),
      EntryPoint("zarathustra")),
      filter = Some(FilterExpr.Facet("/l/genre/philosophy")))) == Seq(
      ("zarathustra", "out", "overman", "SPEAKS_OF")))
  }

  test("findRelations: deletions through the facade bind typed edge tables or reject up front (ADVICE r15)") {
    import graft.api.GraphSearch.EntryPoint
    // the shared fixture ingested UNTYPED relations: a deletion request
    // is rejected up front with the remedy, not a mid-plan column error
    val rejected = intercept[IllegalArgumentException] {
      engine.findRelations(Seq(EntryPoint("prince")),
        deletedEntities = Map("animal" -> Seq("fox")))
    }
    assert(rejected.getMessage.contains("typedCols"), rejected.getMessage)
    // a corpus ingested with the CONVENTIONAL typed column names serves
    // deletions end-to-end through the same facade (edgeTable binds
    // src_type/src_subtype/dst_type/dst_subtype/rel_type when present)
    val rt = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-engine-typed-").toString)
    val et = new Engine(spark, rt)
    et.ingestRelations(
      Seq(
        ("prince", "MEETS", "fox", "ENTITY", "person", "ENTITY", "animal", "ENTITY", 1L),
        ("prince", "VISITS", "planet", "ENTITY", "person", "ENTITY", "place", "ENTITY", 1L),
        ("prince", "MEETS", "rose", "ENTITY", "person", "ENTITY", "plant", "ENTITY", 4L))
        .toDF("s", "r", "d", "src_type", "src_subtype",
          "dst_type", "dst_subtype", "rel_type", "rid"),
      "s", "r", "d",
      typedCols = Seq("src_type", "src_subtype", "dst_type", "dst_subtype",
        "rel_type"),
      resourceCol = Some("rid"))
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(4), r.getString(5))).toSeq.sorted
    // the typed output columns serve real values now, not nulls
    assert(shape(et.findRelations(Seq(EntryPoint("prince")))) == Seq(
      ("prince", "out", "fox", "animal", "MEETS"),
      ("prince", "out", "planet", "place", "VISITS"),
      ("prince", "out", "rose", "plant", "MEETS")))
    // a deleted NODE (per-subtype, the parser's split) removes its
    // paths only
    assert(shape(et.findRelations(Seq(EntryPoint("prince")),
      deletedEntities = Map("animal" -> Seq("fox")))) == Seq(
      ("prince", "out", "planet", "place", "VISITS"),
      ("prince", "out", "rose", "plant", "MEETS")))
    // a deleted GROUP drops every path touching the subtype
    assert(shape(et.findRelations(Seq(EntryPoint("prince")),
      deletedGroups = Seq("plant")))
      == Seq(
        ("prince", "out", "fox", "animal", "MEETS"),
        ("prince", "out", "planet", "place", "VISITS")))
    // the provenance table carries the typed columns too: a filtered
    // deletion request works end-to-end... the filter needs a doc
    // store, so ingest one bound to the edge provenance ids
    et.ingestDocuments(Seq(
        (1L, "the little prince", "en", Seq("/l/genre/fiction")),
        (4L, "the rose chapter", "en", Seq("/l/genre/poetry")))
      .toDF("doc_id", "text", "lang", "labels"))
    assert(shape(et.findRelations(Seq(EntryPoint("prince")),
      deletedEntities = Map("animal" -> Seq("fox")),
      filter = Some(FilterExpr.Facet("/l/genre/poetry")))) == Seq(
      ("prince", "out", "rose", "plant", "MEETS")))
  }

  test("searchRelations: /search's RELATIONS feature = find's merge over detected entities, no deletions") {
    import graft.api.GraphSearch.EntryPoint
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(5))).toSeq.sorted
    // detection runs the engine's entity matcher over the relation
    // nodes (the external Predict NER's stand-in): 'prince' and 'fox'
    // are detected in the query, stopword-ish tokens match nothing
    val detected = engine.searchRelations("the prince and the fox")
    // the prince→fox path touches TWO entry points but lands only
    // under its ORIGIN (the reference's elif, merge.py:450-475)
    assert(shape(detected) == Seq(
      ("prince", "out", "fox", "MEETS"),
      ("prince", "out", "planet", "VISITS")))
    // identical to find's RELATIONS merge with the same entry points
    // and no deletions — one merge serves both surfaces
    assert(shape(detected) == shape(engine.findRelations(
      Seq(EntryPoint("fox"), EntryPoint("prince")))))
    // explicit entry points stand in for the external detector's output
    assert(shape(engine.searchRelations("ignored",
      entryPoints = Some(Seq(EntryPoint("overman"))))) == Seq(
      ("overman", "in", "zarathustra", "SPEAKS_OF")))
    // NER detecting NOTHING is the common case for arbitrary queries:
    // the reference serves an empty relations section, never an error
    // (the parser builds RelationQuery(entry_points=[]) and the merge
    // iterates nothing) — empty frame, response-shaped
    val none = engine.searchRelations("how do i reset my password")
    assert(none.collect().isEmpty)
    assert(none.columns.toSeq == Seq("entry_point", "direction", "entity",
      "entity_type", "entity_subtype", "relation_label", "relation_type",
      "resource_id"))
  }

  test("catalog: with_status maps onto /n/s facets (parsers/catalog.py:150-157)") {
    import Facets.ProcessingStatus
    val r4 = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-engine-ws-").toString)
    val e4 = new Engine(spark, r4)
    e4.ingestDocuments(Seq(
        (1L, "processed doc", "en", Seq("/n/s/PROCESSED", "/l/genre/a")),
        (2L, "errored doc", "en", Seq("/n/s/ERROR", "/q/h")),
        (3L, "pending doc", "en", Seq("/n/s/PENDING")))
      .toDF("doc_id", "text", "lang", "labels"))
    def ids(s: ProcessingStatus, f: Option[FilterExpr] = None): Set[Long] =
      e4.catalog("text", withStatus = Some(s), filter = f)
        .documents.get.collect().map(_.getLong(0)).toSet
    // PROCESSED admits BOTH the PROCESSED and ERROR facets (the
    // parser's explicit bool_or)
    assert(ids(ProcessingStatus.Processed) == Set(1L, 2L))
    // every other requested status is the parser's single else branch:
    // the PENDING facet
    assert(ids(ProcessingStatus.Pending) == Set(3L))
    assert(ids(ProcessingStatus.Error) == Set(3L))
    assert(ids(ProcessingStatus.Blocked) == Set(3L))
    // with_status belongs to the old-filter bag: it ANDs with the
    // request's other filters (parse_old_filters appends to one
    // bool_and)
    assert(ids(ProcessingStatus.Processed,
      f = Some(FilterExpr.Facet("/l/genre/a"))) == Set(1L))
    // the hidden tri-state (parsers/catalog.py:67-77): true = ONLY
    // hidden, false = exclude, None = nothing; ANDs with with_status
    def hids(h: Option[Boolean]) =
      e4.catalog("text", hidden = h)
        .documents.get.collect().map(_.getLong(0)).toSet
    assert(hids(Some(true)) == Set(2L))
    assert(hids(Some(false)) == Set(1L, 3L))
    assert(hids(None) == Set(1L, 2L, 3L))
    assert(e4.catalog("text", withStatus = Some(ProcessingStatus.Processed),
        hidden = Some(false))
      .documents.get.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("forStream: full endpoint surface over a streamed root; watermark rebind + post-compaction parity") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IncrementalIndex
    import graft.streaming.IncrementalIndex.SegmentVectorSpec
    import StreamingSpec.Rel
    val root = java.nio.file.Files.createTempDirectory("graft-engstream-")
      .toString + "/index"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-engstream-ck-")
      .toString
    def vec(i: Long): Seq[Float] =
      Seq.tabulate(4)(d => math.sin(i * 13 + d).toFloat)
    // the per-KB ANN model trains ONCE in batch (indexer.rs reuse
    // contract); every segment encodes against it and forStream serves
    // with the same literals
    val modelDir = java.nio.file.Files.createTempDirectory("graft-engstream-m-")
      .toString
    graft.sources.Ingest.buildVectorIndex(
      Seq(1L -> vec(1), 2L -> vec(2), 3L -> vec(3)).toDF("rid", "embedding"),
      "rid", "embedding", modelDir, numCentroids = 2, numCodewords = 4, m = 2)
    val cents = spark.read.parquet(s"$modelDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val cb = spark.read.parquet(s"$modelDir/codebook")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq

    val input = MemoryStream[(Long, Long, String, Boolean, Seq[Rel], Seq[Float])]
    val updates = input.toDF()
      .toDF("rid", "seq", "text", "deleted", "rels", "embedding")
    val q = IncrementalIndex.startIndexSegments(updates, root, ckpt,
      idCol = "rid", textCol = "text", relationsCol = Some("rels"),
      vectors = Some(SegmentVectorSpec("embedding", cents, cb, m = 2)))
    try {
      input.addData(
        (1L, 1L, "the little prince visits planets", false,
          Seq(Rel("MENTIONS", "prince")), vec(1)),
        (2L, 1L, "zarathustra speaks of the overman", false,
          Seq(Rel("MENTIONS", "zarathustra")), vec(2)))
      q.processAllAvailable()
      val docs1 = Seq((1L, "the little prince visits planets", "en"),
        (2L, "zarathustra speaks of the overman", "de"))
        .toDF("rid", "text", "lang")
      val e = Engine.forStream(spark, root, docs1,
        vectorSpecs = Map("default" -> Engine.StreamVectorSpec(cents, cb, m = 2)))
      // find: keyword, hybrid with the streamed vector pair, paragraphs
      assert(e.find(Find.FindRequest(query = "prince"))
        .collect().map(_.getLong(0)).toSeq == Seq(1L))
      val hybrid = e.find(Find.FindRequest(query = "prince",
          queryVector = Some(vec(1)))).collect()
      assert(hybrid.head.getLong(0) == 1L &&
        hybrid.head.getLong(2) == 2L, // keyword AND semantic evidence
        hybrid.mkString(","))
      assert(e.findParagraphs(Find.FindRequest(query = "prince",
          paragraphBm25 = true))
        .collect().map(_.getLong(0)).toSeq == Seq(1L))
      // search + suggest (open and filtered) + graph (open and filtered)
      assert(e.search(graft.api.Search.SearchRequest(query = "overman"))
        .documents.get.collect().map(_.getLong(0)).toSeq == Seq(2L))
      val sug = e.suggest("prin").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(sug.contains(("prince", "paragraph")) &&
        sug.contains(("prince", "entity")), sug.mkString(","))
      val de = e.suggest("za", filter = Some(FilterExpr.Eq("lang", "de")))
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(de.contains(("zarathustra", "entity")), de.mkString(","))
      assert(e.suggest("prin", filter = Some(FilterExpr.Eq("lang", "de")))
        .collect().isEmpty)
      val mentionsPrince = PathQuery.Path(dst = NodeMatch.Exact("prince"))
      assert(e.graph(mentionsPrince).collect().length == 1)
      assert(e.graph(mentionsPrince,
        filter = Some(FilterExpr.Eq("lang", "de"))).collect().isEmpty)
      assert(e.graphNodes(PathQuery.Path()).collect()
        .map(_.getString(0)).toSet.contains("zarathustra"))
      // find's RELATIONS feature over the streamed root: value-only
      // entries serve (the resource node is the edge source); deletions
      // compile to subtype-constrained paths the streamed
      // (resource, rel, dst) edges can never evaluate — rejected UP
      // FRONT with the remedy, not a mid-plan column error (ADVICE r15)
      import graft.api.GraphSearch.EntryPoint
      assert(e.findRelations(Seq(EntryPoint("prince"))).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
        == Seq(("prince", "in", "1")))
      val rej = intercept[IllegalArgumentException] {
        e.findRelations(Seq(EntryPoint("prince")),
          deletedGroups = Seq("person"))
      }
      assert(rej.getMessage.contains("subtype"), rej.getMessage)
      // batch ingest against a streamed root is refused loudly
      intercept[UnsupportedOperationException] { e.ingestDocuments(docs1) }

      // NEW SEGMENT: update doc 1, tombstone doc 2, add doc 3 — the
      // SAME engine instance rebinds on the changed watermark
      input.addData(
        (1L, 2L, "the prince tames a fox", false,
          Seq(Rel("MENTIONS", "fox")), vec(1)),
        (2L, 2L, "gone", true, Seq.empty[Rel], vec(2)),
        (3L, 2L, "database engines scan columns", false,
          Seq(Rel("MENTIONS", "database")), vec(3)))
      q.processAllAvailable()
      assert(e.graph(PathQuery.Path(dst = NodeMatch.Exact("fox")))
        .collect().length == 1, "new segment must be visible without rebind")
      assert(e.graph(PathQuery.Path(dst = NodeMatch.Exact("zarathustra")))
        .collect().isEmpty, "tombstoned doc's edges must vanish")

      // a fresh engine over the updated doc store: tombstone enforced in
      // keyword retrieval, then COMPACTION parity on every source
      val docs2 = Seq((1L, "the prince tames a fox", "en"),
        (3L, "database engines scan columns", "en"))
        .toDF("rid", "text", "lang")
      val e2 = Engine.forStream(spark, root, docs2,
        vectorSpecs = Map("default" -> Engine.StreamVectorSpec(cents, cb, m = 2)))
      assert(e2.find(Find.FindRequest(query = "overman")).collect().isEmpty,
        "postings of a tombstoned doc must lose the winner join")
      def snapshot() = (
        e2.find(Find.FindRequest(query = "prince fox",
            queryVector = Some(vec(1)))).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq,
        e2.suggest("prin").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq,
        e2.graph(PathQuery.Path(dst = NodeMatch.Exact("fox"))).collect().length)
      val before = snapshot()
      assert(before._1.head._1 == 1L && before._3 == 1)
      IncrementalIndex.compactSegments(spark, root)
      assert(snapshot() == before,
        "compaction must not change any endpoint's results")
    } finally q.stop()
  }

  test("cacheFilterStats: prefiltered find serves identical results from cached population stats") {
    val f: FilterExpr = FilterExpr.Eq("lang", "en")
    val req = Find.FindRequest(query = "prince fox", filter = Some(f))
    val preq = req.copy(paragraphBm25 = true)
    def snap() = (
      engine.find(req).collect()
        .map(r => (r.getLong(0), r.getAs[Double]("fused"))).toSeq,
      engine.findParagraphs(preq).collect()
        .map(r => (r.getLong(0), r.getAs[Double]("best_score"))).toSeq)
    val before = snap()
    assert(before._1.nonEmpty && before._2.nonEmpty)
    engine.cacheFilterStats(f)
    assert(snap() == before,
      "cached population stats must not change any prefiltered score")
  }

  test("cacheCatalogFacetCounts: at-rest serving identical, dropped on re-ingest, refused on streamed") {
    val r5 = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-engfc-").toString)
    val e5 = new Engine(spark, r5)
    e5.ingestDocuments(Seq(
        (1L, "alpha", "en", Seq("/l/genre/fiction", "/s/p/en")),
        (2L, "beta", "de", Seq("/l/genre/philosophy")),
        (3L, "gamma", "en", Seq("/l/genre/tech", "/s/p/en")))
      .toDF("doc_id", "text", "lang", "labels"), langCol = Some("lang"))
    val prefixes = Seq(("/l", Some(1)), ("/s", None))
    def snap() = e5.catalogFacets(prefixes).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = snap()
    assert(before("/l/genre") == 3L && before("/s/p/en") == 2L, before.toString)
    e5.cacheCatalogFacetCounts()
    assert(snap() == before,
      "at-rest serving must be indistinguishable from the corpus aggregation")
    // RE-registration: the overwrite deletes the previous part files —
    // a stale memoized reader would list them and throw (or serve the
    // old counts); the rebuild must invalidate before re-memoizing
    e5.cacheCatalogFacetCounts()
    assert(snap() == before,
      "re-registration must serve from the rebuilt table, not stale file listings")
    // the empty-prefix (every facet) request serves at rest too
    assert(e5.catalogFacets(Nil).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      .apply("/l/genre/tech") == 1L)
    // re-ingest: the table counted the OLD corpus — memo must drop and
    // the next request re-aggregate the new one
    e5.ingestDocuments(Seq(
        (1L, "alpha", "en", Seq("/l/genre/fiction")))
      .toDF("doc_id", "text", "lang", "labels"), langCol = Some("lang"))
    // the depth-1 "/l" gate admits /l and /l/genre only (4-part
    // leaves excluded), and the /s subtree is gone from the corpus
    val after = snap()
    assert(after == Map("/l" -> 1L, "/l/genre" -> 1L), after.toString)
    // a streamed engine refuses registration up front (its corpus
    // changes per segment; a materialized table would serve stale
    // counts) — the corpus-aggregation path keeps serving
    val se = Engine.forStream(spark,
      java.nio.file.Files.createTempDirectory("graft-engfcs-").toString,
      Seq((1L, "alpha", 1L)).toDF("rid", "text", "seq"))
    val ex = intercept[UnsupportedOperationException] {
      se.cacheCatalogFacetCounts()
    }
    assert(ex.getMessage.contains("stream sink"))
    // ...and a restriction-stats key the streamed serving cannot
    // compute is refused AT REGISTRATION too (round-19 review):
    // segment roots write no fields table, so accepting a fields key
    // would brick every later request inside the per-watermark stats
    // recompute (no deregister API)
    val fx = intercept[IllegalArgumentException] {
      se.cacheRestrictionStats(
        graft.api.Find.RestrictionKey(fields = Seq("a")))
    }
    assert(fx.getMessage.contains("no fields table"), fx.getMessage)
  }

  test("forStream: engine-triggered tiered compaction rebinds the watermark in place") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IncrementalIndex
    import graft.streaming.IncrementalIndex.LogMergeSettings
    val root = java.nio.file.Files.createTempDirectory("graft-engcomp-")
      .toString + "/index"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-engcomp-ck-")
      .toString
    val input = MemoryStream[(Long, Long, String, Boolean)]
    val updates = input.toDF().toDF("rid", "seq", "text", "deleted")
    val q = IncrementalIndex.startIndexSegments(updates, root, ckpt,
      idCol = "rid", textCol = "text")
    try {
      input.addData((1L, 1L, "the little prince visits planets", false))
      q.processAllAvailable()
      input.addData((2L, 2L, "zarathustra speaks of the overman", false))
      q.processAllAvailable()
      input.addData((1L, 3L, "the prince tames a fox", false),
        (3L, 3L, "database engines scan columns", false))
      q.processAllAvailable()
      val docs = Seq((1L, "the prince tames a fox"),
        (2L, "zarathustra speaks of the overman"),
        (3L, "database engines scan columns")).toDF("rid", "text")
      val e = Engine.forStream(spark, root, docs)
      // a registered hot filter rides across the compaction below: its
      // population stats recompute at the new watermark, results stay
      // identical to the unregistered engine's
      val hotFilter: FilterExpr = FilterExpr.Keyword("the")
      val hotReq = Find.FindRequest(query = "prince fox",
        filter = Some(hotFilter))
      val plainHot = e.find(hotReq).collect()
        .map(r => (r.getLong(0), r.getAs[Double]("fused"))).toSeq
      e.cacheFilterStats(hotFilter)
      assert(e.find(hotReq).collect()
        .map(r => (r.getLong(0), r.getAs[Double]("fused"))).toSeq == plainHot,
        "streamed cached stats must not change prefiltered scores")
      def snapshot() = (
        e.find(Find.FindRequest(query = "prince fox")).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq,
        e.suggest("zarat").collect().map(_.getString(0)).toSeq,
        e.search(graft.api.Search.SearchRequest(query = "database"))
          .documents.get.collect().map(_.getLong(0)).toSeq)
      val before = snapshot()
      assert(before._1.map(_._1) == Seq(1L) && before._2 == Seq("zarathustra")
        && before._3 == Seq(3L), before.toString)
      // the engine's own maintenance trigger folds the small tail...
      val plan = e.compact(LogMergeSettings(minSegments = 2,
        topBucketMaxRecords = 100000, bottomBucketThreshold = 2),
        committedBatchId = IncrementalIndex.committedBatchId(spark, ckpt))
      // group members come back in planMerges' records-DESC order;
      // membership is what matters here
      assert(plan.map(_.sorted) == Seq(Seq("seg_000000000",
        "seg_000000001", "seg_000000002")), plan.toString)
      val live = IncrementalIndex.liveSegments(spark, root)
        .map(p => new org.apache.hadoop.fs.Path(p).getName)
      assert(live == Seq("seg_000000002c"), live.toString)
      // ...and the SAME engine instance serves identically from the
      // folded set — the watermark memo rebinds with no explicit call
      assert(snapshot() == before,
        "engine-triggered compaction must not change any endpoint's results")
      // the registered filter's stats recomputed at the NEW watermark
      assert(e.find(hotReq).collect()
        .map(r => (r.getLong(0), r.getAs[Double]("fused"))).toSeq == plainHot,
        "cached stats must survive the watermark rebind unchanged")
      // nothing left to fold: the maintenance call is idempotent
      assert(e.compact(LogMergeSettings(minSegments = 2,
        topBucketMaxRecords = 100000, bottomBucketThreshold = 2)).isEmpty)
    } finally q.stop()
  }

  test("augment: re-ingesting without conversations clears the persisted message store") {
    val r4 = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-engine-conv-").toString)
    val e4 = new Engine(spark, r4)
    val docs = Seq((1L, "alpha beta gamma", "en", Seq.empty[String]))
      .toDF("doc_id", "text", "lang", "labels")
    val convs = Seq((1L, "chat", "0", "hello there"))
      .toDF("doc_id", "field_id", "split", "text")
    e4.ingestDocuments(docs, conversations = Some(convs))
    val req = graft.api.Augment.AugmentRequest(fields = Seq(
      graft.api.Augment.FieldAugment(given = Seq("1/c/chat"),
        fullConversation = true)))
    assert(e4.augment(req).messages.count() == 1)
    // re-ingest WITHOUT conversations: the old message store must not
    // keep serving against the new corpus
    e4.ingestDocuments(docs)
    assert(e4.augment(req).messages.count() == 0,
      "a conversation-less re-ingest must clear the persisted store")
  }
}
