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
}
