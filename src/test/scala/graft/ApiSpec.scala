package graft

import graft.api.{Find, GraphSearch, Search, Suggest}
import graft.api.GraphSearch.{EdgeTable, NodeMatch, PathQuery}
import graft.api.Search.SearchRequest

/** Endpoint-level parity tests: /graph path queries on the
  * people_and_places fixture (`search_relations.rs` cases), /search
  * multi-list responses, /suggest exact→fuzzy, and vectorset selection.
  */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    ("Anastasia", "LIVE_IN", "Barcelona"),
    ("Anna", "LIVE_IN", "Berlin"),
    ("Anna", "IS_FRIEND", "Anastasia"),
    ("Apollo", "BORN_IN", "Olympus"),
    ("Rosa Parks", "BORN_IN", "Tuskegee"))
    .toDF("src", "rel", "dst")
  private val table = EdgeTable(edges, "src", "rel", "dst")

  private def paths(q: PathQuery): Seq[(String, String, String)] =
    GraphSearch.search(table, q).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

  test("graph: exact node + relation filter") {
    assert(paths(PathQuery.Path(src = NodeMatch.Exact("Anna"), rel = Some("LIVE_IN")))
      == Seq(("Anna", "LIVE_IN", "Berlin")))
  }

  test("graph: prefix matches several nodes; fuzzy distance 2 hits Anastasia") {
    assert(paths(PathQuery.Path(src = NodeMatch.Prefix("An"))).map(_._1).toSet
      == Set("Anastasia", "Anna"))
    assert(paths(PathQuery.Path(src = NodeMatch.Fuzzy("Anastas", 2))).map(_._1).toSet
      == Set("Anastasia"))
  }

  test("graph: words match and undirected orientation") {
    assert(paths(PathQuery.Path(src = NodeMatch.Words("parks")))
      == Seq(("Rosa Parks", "BORN_IN", "Tuskegee")))
    // directed: Anastasia only as source of LIVE_IN; undirected also
    // finds her as destination of IS_FRIEND
    assert(paths(PathQuery.Path(src = NodeMatch.Exact("Anastasia"))).size == 1)
    assert(paths(PathQuery.Path(src = NodeMatch.Exact("Anastasia"), undirected = true))
      .toSet == Set(("Anastasia", "LIVE_IN", "Barcelona"), ("Anna", "IS_FRIEND", "Anastasia")))
  }

  test("graph: resource prefilter intersects all three projections; empty set empties; missing column fails loudly") {
    // people_and_places with per-resource provenance (reader.rs:261-272
    // apply_prefilter: the prefilter term set intersects the query)
    val er = Seq(
      ("Anastasia", "LIVE_IN", "Barcelona", "r1"),
      ("Anna", "LIVE_IN", "Berlin", "r2"),
      ("Anna", "IS_FRIEND", "Anastasia", "r2"),
      ("Apollo", "BORN_IN", "Olympus", "r3"))
      .toDF("src", "rel", "dst", "resource_id")
    val t = EdgeTable(er, "src", "rel", "dst",
      resourceCol = Some("resource_id"))
    def allowed(ids: String*) = Some(ids.toDF("rid"))
    val q = PathQuery.Path(src = NodeMatch.Prefix("An"))
    assert(GraphSearch.search(t, q, allowedResources = allowed("r2"))
      .collect().map(_.getString(0)).toSet == Set("Anna"))
    assert(GraphSearch.nodesSearch(t, q, allowedResources = allowed("r2"))
      .collect().map(_.getString(0)).toSet
      == Set("Anna", "Berlin", "Anastasia"))
    assert(GraphSearch.relationsSearch(t, q, allowedResources = allowed("r1"))
      .collect().map(_.getString(0)).toSeq == Seq("LIVE_IN"))
    // PrefilterResult::None shortcut: nothing allowed → nothing returned
    assert(GraphSearch.search(t, q,
      allowedResources = Some(Seq.empty[String].toDF("rid"))).collect().isEmpty)
    // a prefiltered search against a table without provenance is a bug
    intercept[IllegalArgumentException] {
      GraphSearch.search(table, q, allowedResources = allowed("r1"))
    }
  }

  test("graph: OR and NOT compose") {
    val q = PathQuery.Or(Seq(
      PathQuery.Path(rel = Some("BORN_IN")),
      PathQuery.Path(src = NodeMatch.Exact("Anna"), rel = Some("IS_FRIEND"))))
    assert(paths(q).map(_._2).toSet == Set("BORN_IN", "IS_FRIEND"))
    val notQ = PathQuery.Not(PathQuery.Path(rel = Some("LIVE_IN")))
    assert(paths(notQ).map(_._2).toSet == Set("BORN_IN", "IS_FRIEND"))
    // AND — the proto's bool_and (graph_query_parser.rs:666-690), the
    // composition find's RELATIONS feature uses for entry AND NOT
    // deleted (unit_retrieval.py:178-185)
    val andQ = PathQuery.And(Seq(
      PathQuery.Path(src = NodeMatch.Prefix("An")),
      PathQuery.Not(PathQuery.Path(rel = Some("LIVE_IN")))))
    assert(paths(andQ) == Seq(("Anna", "IS_FRIEND", "Anastasia")))
  }

  test("find relations: per-entry directional subgraph (merge.py:426-477)") {
    import graft.api.GraphSearch.EntryPoint
    def rows(eps: Seq[EntryPoint], t: EdgeTable = table,
        del: Map[String, Seq[String]] = Map.empty) =
      GraphSearch.relationsSubgraph(t, eps, deletedEntities = del)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(5)))
        .toSeq.sorted
    // origin-match takes precedence (the reference's elif): the
    // Anna→Anastasia path lands ONLY under its origin Anna even though
    // both endpoints are entry points
    assert(rows(Seq(EntryPoint("Anna"), EntryPoint("Anastasia"))) == Seq(
      ("Anastasia", "out", "Barcelona", "LIVE_IN"),
      ("Anna", "out", "Anastasia", "IS_FRIEND"),
      ("Anna", "out", "Berlin", "LIVE_IN")))
    // a destination-side entry collects IN rows
    assert(rows(Seq(EntryPoint("Barcelona"))) == Seq(
      ("Barcelona", "in", "Anastasia", "LIVE_IN")))
    // deleted nodes exclude every path touching them (undirected
    // (value, subtype) match — needs the typed columns)
    val typed = Seq(
      ("Anna", "LIVE_IN", "Berlin", "e", "person", "e", "city"),
      ("Anna", "IS_FRIEND", "Anastasia", "e", "person", "e", "person"))
      .toDF("src", "rel", "dst", "st", "ss", "dt", "ds")
    val tt = EdgeTable(typed, "src", "rel", "dst",
      srcTypeCol = Some("st"), srcSubtypeCol = Some("ss"),
      dstTypeCol = Some("dt"), dstSubtypeCol = Some("ds"))
    assert(rows(Seq(EntryPoint("Anna")), tt,
      del = Map("city" -> Seq("Berlin"))) == Seq(
      ("Anna", "out", "Anastasia", "IS_FRIEND")))
    // no entry points is a caller bug, not an empty response
    intercept[IllegalArgumentException] {
      GraphSearch.relationsSubgraph(table, Nil)
    }
  }

  private val docs = Seq(
    (1L, "spark engine spark runs fast", Seq("/s/p/en")),
    (2L, "query planner for spark", Seq("/s/p/en")),
    (3L, "langsamer tabellen scan", Seq("/s/p/de")))
    .toDF("doc_id", "text", "labels")

  test("search: separate document list + facets; only_faceted fast path") {
    val resp = Search.search(docs, "doc_id", "text", "labels", None,
      SearchRequest(query = "spark", faceted = Seq("/s/p")))
    val docList = resp.documents.get.collect().map(_.getLong(0))
    assert(docList.sameElements(Array(1L, 2L))) // doc1 tf=2 ranks first
    assert(resp.facets.get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("/s/p/en" -> 2L, "/s/p/de" -> 1L))
    val fo = Search.search(docs, "doc_id", "text", "labels", None,
      SearchRequest(query = "spark", faceted = Seq("/s/p"), onlyFaceted = true))
    assert(fo.documents.isEmpty && fo.facets.nonEmpty)
    // merge-side sort direction (OrderBy.OrderType): the cut page
    // re-orders by the attribute DESC when asked
    val asc = Search.search(docs, "doc_id", "text", "labels", None,
        SearchRequest(query = "spark", sortField = Some("doc_id")))
      .documents.get.collect().map(_.getLong(0)).toSeq
    val desc = Search.search(docs, "doc_id", "text", "labels", None,
        SearchRequest(query = "spark", sortField = Some("doc_id"),
          sortDesc = true))
      .documents.get.collect().map(_.getLong(0)).toSeq
    assert(asc == asc.sorted && desc == asc.reverse, s"$asc vs $desc")
  }

  test("search highlight: document and paragraph lists return marked text") {
    import org.apache.spark.sql.functions.lit
    val pars = Seq(
      ("1/t/body/0-5", "spark engine spark runs fast", 1L),
      ("2/t/body/0-4", "query planner for spark", 2L))
      .toDF("paragraph_id", "p_text", "doc_id")
    val resp = Search.search(docs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "spark", highlight = true))
    val docRows = resp.documents.get.collect()
    // the hydrated text column carries the marks; order stays
    // (score desc, id)
    assert(docRows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(docRows.forall(_.getString(2).contains("<mark>spark</mark>")),
      docRows.mkString(","))
    val parRows = resp.paragraphs.get.collect()
    assert(parRows.map(_.getString(0)).toSeq
      == Seq("1/t/body/0-5", "2/t/body/0-4"))
    assert(parRows.forall(_.getString(2).contains("<mark>spark</mark>")),
      parRows.mkString(","))
    // sortField still re-orders the marked page
    val sorted = Search.search(docs, "doc_id", "text", "labels", None,
        SearchRequest(query = "spark", highlight = true,
          sortField = Some("doc_id"), sortDesc = true))
      .documents.get.collect()
    assert(sorted.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(sorted.forall(_.getAs[String]("text").contains("<mark>spark</mark>")),
      sorted.mkString(","))
    // sorting by the TEXT column itself while highlighting: the sort
    // join already carries textCol, so no second hydration join (the
    // duplicate-column ambiguity), and the order follows the RAW text,
    // not the marked-up string
    val byText = Search.search(docs, "doc_id", "text", "labels", None,
        SearchRequest(query = "spark", highlight = true,
          sortField = Some("text")))
      .documents.get.collect()
    assert(byText.map(_.getAs[String]("text")).toSeq
      == byText.map(_.getAs[String]("text")).toSeq.sortBy(_
        .replace("<mark>", "").replace("</mark>", "")),
      byText.mkString(","))
    assert(byText.forall(_.getAs[String]("text").contains("<mark>spark</mark>")),
      byText.mkString(","))
  }

  test("search: index-side date order selects the page BY DATE at score 0.0") {
    import org.apache.spark.sql.functions.{col, concat, lit, to_date}
    // doc1 (best score for "spark", tf=2) carries the OLDEST date;
    // doc3 is the newest overall but matches nothing
    val dated = docs.withColumn("created",
      to_date(concat(lit("2021-01-0"), col("doc_id").cast("string"))))
    val resp = Search.search(dated, "doc_id", "text", "labels", None,
      SearchRequest(query = "spark", topK = 1,
        orderBy = Some(Search.OrderByDate("created"))))
    val row = resp.documents.get.collect().head
    // the newest MATCH — a different result set than the score page
    // re-sorted (that would keep doc1), and never the non-match doc3
    assert(row.getLong(0) == 2L && row.getDouble(1) == 0.0, row.toString)
    val asc = Search.search(dated, "doc_id", "text", "labels", None,
        SearchRequest(query = "spark", topK = 5,
          orderBy = Some(Search.OrderByDate("created", desc = false))))
      .documents.get.collect().map(_.getLong(0)).toSeq
    assert(asc == Seq(1L, 2L), asc.toString) // asc flips; doc3 absent
    // EMPTY query = the AllQuery match-all recency listing, with the
    // doc filter applied (parsers/search.py empty-query default)
    val listing = Search.search(dated, "doc_id", "text", "labels", None,
        SearchRequest(query = "", topK = 5,
          filter = Some(graft.operators.FilterExpr.Facet("/s/p/en")),
          orderBy = Some(Search.OrderByDate("created"))))
      .documents.get.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(listing == Seq((2L, 0.0), (1L, 0.0)), listing.toString)
    // but a zero-TERM non-empty query (phrase-only / stopword-only) is
    // NOT the match-all listing — AllQuery only builds for a truly
    // empty search string (search_query.rs:100-104); the no-terms
    // contract holds under an order exactly like on the score path
    for (q <- Seq("\"spark engine\"", "the")) {
      val r = Search.search(dated, "doc_id", "text", "labels", None,
        SearchRequest(query = q, topK = 5,
          orderBy = Some(Search.OrderByDate("created"))))
      assert(r.documents.isEmpty, s"query '$q' must not list the corpus")
    }

    val pars = Seq(
      ("1/t/body/0-5", "spark engine spark runs fast", 1L),
      ("2/t/body/0-4", "query planner for spark", 2L))
      .toDF("paragraph_id", "p_text", "doc_id")
    val presp = Search.search(dated, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "spark", topK = 1,
        orderBy = Some(Search.OrderByDate("created"))))
    assert(presp.paragraphs.get.collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
      == Seq(("2/t/body/0-4", 0.0)))
    // the fuzzy fallback applies whatever the collector (reader.rs
    // wraps do_search): a typo'd query still serves the date-ordered
    // expanded page
    val fb = Search.search(dated, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "sparkk", topK = 1,
        orderBy = Some(Search.OrderByDate("created"))))
    assert(fb.paragraphs.get.collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
      == Seq(("2/t/body/0-4", 0.0)))
    // the reference's single sort param routes to exactly one side
    intercept[IllegalArgumentException] {
      Search.search(dated, "doc_id", "text", "labels", None,
        SearchRequest(query = "spark", sortField = Some("doc_id"),
          orderBy = Some(Search.OrderByDate("created"))))
    }
  }

  test("search: offset skips rows in response order (models/search.py:509-515)") {
    // score-order response is doc1 (tf=2) then doc2 — offset 1 serves
    // the second row as a one-row page
    val r = Search.search(docs, "doc_id", "text", "labels", None,
      SearchRequest(query = "spark", topK = 1, offset = 1))
    assert(r.documents.get.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // offset beyond the matches is an empty page, not an error
    val beyond = Search.search(docs, "doc_id", "text", "labels", None,
      SearchRequest(query = "spark", topK = 5, offset = 2))
    assert(beyond.documents.get.collect().isEmpty)
    val pars = Seq(
      ("1/t/body/0-5", "spark engine spark runs fast", 1L),
      ("2/t/body/0-4", "query planner for spark", 2L))
      .toDF("paragraph_id", "p_text", "doc_id")
    // the paragraph list skips in its own order...
    val pr = Search.search(docs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "spark", topK = 5, offset = 1))
    assert(pr.paragraphs.get.collect().map(_.getString(0)).toSeq
      == Seq("2/t/body/0-4"))
    // ...and the fuzzy fallback composes with it: the typo'd query
    // expands first, THEN the offset skips the expanded page's head
    val fbOff = Search.search(docs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "sparkk", topK = 5, offset = 1))
    assert(fbOff.paragraphs.get.collect().map(_.getString(0)).toSeq
      == Seq("2/t/body/0-4"))
    // reference bound: 0 <= offset <= 1000
    intercept[IllegalArgumentException] {
      Search.search(docs, "doc_id", "text", "labels", None,
        SearchRequest(query = "spark", offset = 1001))
    }
  }

  test("search: min_score drops sub-threshold rows post-cut and disables the fallback") {
    val pars = Seq(
      ("1/t/body/0-5", "spark engine spark runs fast", 1L),
      ("2/t/body/0-4", "query planner for spark", 2L))
      .toDF("paragraph_id", "p_text", "doc_id")
    // paragraph scores: doc1 has 2 'spark' tokens, doc2 has 1 — the
    // threshold keeps only the 2-hit paragraph; the page shrank, it
    // did not refill
    val r = Search.search(docs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "spark", topK = 5, minScore = 1.5))
    assert(r.paragraphs.get.collect().map(_.getString(0)).toSeq
      == Seq("1/t/body/0-5"))
    // the doc list's bm25 page drops its tail the same way: with the
    // threshold above every bm25 score the page is empty, not refilled
    val hi = Search.search(docs, "doc_id", "text", "labels", None,
      SearchRequest(query = "spark", topK = 5, minScore = 100.0))
    assert(hi.documents.get.collect().isEmpty)
    // a non-zero min_score disables the refuzz (reader.rs:128: the
    // trigger is empty AND topK > 0 AND min_score == 0) — the typo'd
    // query serves the empty exact page instead of expanding
    val fb = Search.search(docs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "sparkk", topK = 5, minScore = 0.5))
    assert(fb.paragraphs.get.collect().isEmpty)
    // ...and with min_score 0 the same request refuzzes (the existing
    // fallback contract, unchanged)
    val fb0 = Search.search(docs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "sparkk", topK = 5))
    assert(fb0.paragraphs.get.collect().nonEmpty)
  }

  test("search: empty query with no sort defaults to created DESC when createdCol binds") {
    import org.apache.spark.sql.functions.{col, concat, lit, to_date}
    val dated = docs.withColumn("created",
      to_date(concat(lit("2021-01-0"), col("doc_id").cast("string"))))
    // the parser's default sort (parsers/search.py:168-182): sort None
    // + empty query → CREATED DESC — the recency listing without an
    // explicit orderBy
    val r = Search.search(dated, "doc_id", "text", "labels", None,
      SearchRequest(query = "", topK = 2), createdCol = Some("created"))
    assert(r.documents.get.collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSeq
      == Seq((3L, 0.0), (2L, 0.0)))
    // an explicit order wins over the default (sort is only defaulted
    // when the request carries none)
    val explicitAsc = Search.search(dated, "doc_id", "text", "labels", None,
      SearchRequest(query = "", topK = 3,
        orderBy = Some(Search.OrderByDate("created", desc = false))),
      createdCol = Some("created"))
    assert(explicitAsc.documents.get.collect().map(_.getLong(0)).toSeq
      == Seq(1L, 2L, 3L))
    // a NON-empty query keeps score order — the parser's other branch
    // (SCORE DESC) is this API's existing default path
    val scored = Search.search(dated, "doc_id", "text", "labels", None,
      SearchRequest(query = "spark", topK = 2), createdCol = Some("created"))
    assert(scored.documents.get.collect().map(_.getLong(0)).toSeq
      == Seq(1L, 2L)) // tf order, not date order
    // unbound createdCol: the corpus has no recency order to serve —
    // the empty-query no-sort request keeps returning no lists
    val unbound = Search.search(dated, "doc_id", "text", "labels", None,
      SearchRequest(query = "", topK = 2))
    assert(unbound.documents.isEmpty)
    // a merge-side attribute sort counts as an explicit sort too: the
    // default must not override it (and a zero-term query still serves
    // no score page under it)
    val attr = Search.search(dated, "doc_id", "text", "labels", None,
      SearchRequest(query = "", topK = 2, sortField = Some("doc_id")),
      createdCol = Some("created"))
    assert(attr.documents.isEmpty)
  }

  test("search fallback union: localSideOf pins the positional schema correspondence") {
    import org.apache.spark.sql.functions.{col, lit}
    val orig = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    // the union side exactly as search() builds it: side+position
    // prefixes, then the __side tag
    val pref = orig.toDF(orig.columns.zipWithIndex
        .map { case (c, i) => s"__p_${i}_$c" }: _*)
      .withColumn("__side", lit("p"))
    val all = pref.collect()
    val sideIdx = pref.schema.fieldIndex("__side")
    // well-formed: round-trips rows and schema
    val back = Search.localSideOf(pref.schema, all, sideIdx, "p", orig)
    assert(back.schema == orig.schema)
    assert(back.collect().toSeq == orig.collect().toSeq)
    // a side whose columns were REORDERED since the union build fails
    // loudly (the prefixed name no longer exists at that position)
    intercept[IllegalArgumentException] {
      Search.localSideOf(pref.schema, all, sideIdx, "p",
        orig.select(col("name"), col("id")))
    }
    // same names and positions but a DIFFERENT datatype: the name
    // lookup alone would mis-map — the correspondence assert catches it
    intercept[IllegalArgumentException] {
      Search.localSideOf(pref.schema, all, sideIdx, "p",
        orig.select(col("id").cast("int").as("id"), col("name")))
    }
  }

  test("search: SEMANTIC sentences list — shared scorer, offset inflates but never skips, min_score.semantic drops") {
    import org.apache.spark.sql.functions.col
    import graft.api.Find
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.8f, 0.6f)),
      (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val c = Find.Corpus(docs, "doc_id", "text", vectors = Some(vecs))
    def run(req: SearchRequest) = Search.search(
      docs, "doc_id", "text", "labels", None, req,
      semanticCorpus = Some(c))
    def sent(r: Search.SearchResponse): Seq[(Long, Double)] =
      r.sentences.map(_.collect()
        .map(x => (x.getLong(0), x.getDouble(1))).toSeq).getOrElse(Nil)
    // cosine vs (1,0): doc1 = 1.0, doc2 = 0.8, doc3 = 0.0
    val base = run(SearchRequest(query = "spark", topK = 2,
      queryVector = Some(Seq(1.0f, 0.0f))))
    assert(sent(base) == Seq((1L, 1.0), (2L, 0.8)))
    // min_score.semantic drops sub-threshold hits (index-side)
    assert(sent(run(SearchRequest(query = "spark", topK = 3,
      queryVector = Some(Seq(1.0f, 0.0f)), minScoreSemantic = 0.5)))
      == Seq((1L, 1.0), (2L, 0.8)))
    // the OFFSET quirk: the fetch inflates to offset+topK for every
    // sub-query but the merge never skips the sentences
    // (merge_vectors_results takes no offset) — with topK=1, offset=1
    // the doc list serves row 2 while the semantic list serves the
    // top 2
    val off = run(SearchRequest(query = "spark", topK = 1, offset = 1,
      queryVector = Some(Seq(1.0f, 0.0f))))
    assert(off.documents.get.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(sent(off) == Seq((1L, 1.0), (2L, 0.8)))
    // the request filter prefilters the vector search like every
    // sub-search (docs 1-2 are /s/p/en, doc 3 /s/p/de)
    assert(sent(run(SearchRequest(query = "spark", topK = 3,
      queryVector = Some(Seq(0.0f, 1.0f)),
      filter = Some(graft.operators.FilterExpr.Facet("/s/p/de")))))
      == Seq((3L, 1.0)))
    // no query vector / no semantic corpus / only_faceted → no list
    assert(run(SearchRequest(query = "spark", topK = 2)).sentences.isEmpty)
    assert(Search.search(docs, "doc_id", "text", "labels", None,
      SearchRequest(query = "spark", topK = 2,
        queryVector = Some(Seq(1.0f, 0.0f)))).sentences.isEmpty)
    assert(run(SearchRequest(query = "spark", faceted = Seq("/s/p"),
      onlyFaceted = true,
      queryVector = Some(Seq(1.0f, 0.0f)))).sentences.isEmpty)
    // the paragraph-fallback union path carries the semantic side too
    // (typo'd query: paragraphs refuzz, sentences unchanged)
    val pars = Seq(
      ("1/t/body/0-5", "spark engine spark runs fast", 1L),
      ("2/t/body/0-4", "query planner for spark", 2L))
      .toDF("paragraph_id", "p_text", "doc_id")
    val fb = Search.search(docs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "sparkk", topK = 2,
        queryVector = Some(Seq(1.0f, 0.0f))),
      semanticCorpus = Some(c))
    assert(fb.paragraphs.get.collect().nonEmpty) // refuzzed
    assert(sent(fb) == Seq((1L, 1.0), (2L, 0.8)))
  }

  test("search: a user vector never disables the semantic list — exact-match-only and empty queries included (should_disable_vector_search parity)") {
    // the reference silently drops the SEMANTIC feature for
    // exact-match-only ('"…"') or empty queries ONLY when no user
    // vector is given (`should_disable_vector_search`,
    // parsers/common.py:73-83); `has_user_vectors` short-circuits to
    // never-disable. The no-vector leg needs the Predict-fetched
    // embedding (the external carve-out, COVERAGE.md), so the
    // user-vector leg is the only one this API can express — sentences
    // serve iff a queryVector is given, consistent by construction.
    // Pinned here so a future "optimize away the semantic side on
    // degenerate queries" change fails loudly against the reference.
    import graft.api.Find
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val c = Find.Corpus(docs, "doc_id", "text", vectors = Some(vecs))
    def sent(q: String): Seq[Long] = Search.search(
        docs, "doc_id", "text", "labels", None,
        SearchRequest(query = q, topK = 2,
          queryVector = Some(Seq(1.0f, 0.0f))),
        semanticCorpus = Some(c))
      .sentences.map(_.collect().map(_.getLong(0)).toSeq).getOrElse(Nil)
    assert(sent("\"spark engine\"") == Seq(1L, 2L)) // exact-match-only
    assert(sent("") == Seq(1L, 2L))                 // empty (AllQuery leg)
    assert(sent("spark") == Seq(1L, 2L))            // plain, for contrast
  }

  test("search: with_synonyms expands both text lists; rejected with the semantic feature") {
    val pars = Seq(
      ("1/t/body/0-5", "spark engine spark runs fast", 1L),
      ("2/t/body/0-4", "query planner for spark", 2L),
      ("3/t/body/0-3", "langsamer tabellen scan", 3L))
      .toDF("paragraph_id", "p_text", "doc_id")
    // 'engine' expands to {engine, planner}: doc2/par2 (no 'engine')
    // now match via the synonym — both lists carry them
    val syn = Map("engine" -> Seq("planner"))
    val r = Search.search(docs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "engine", topK = 5, synonyms = syn))
    assert(r.documents.get.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(r.paragraphs.get.collect().map(_.getString(0)).toSet
      == Set("1/t/body/0-5", "2/t/body/0-4"))
    // without the synonyms, doc2 never matches 'engine'
    val plain = Search.search(docs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "engine", topK = 5))
    assert(plain.documents.get.collect().map(_.getLong(0)).toSet == Set(1L))
    // the parser's validation: synonyms + the semantic feature is an
    // InvalidQueryError ("only supported on paragraph and document
    // search", parsers/search.py:126-137) — same message here
    val e = intercept[IllegalArgumentException] {
      Search.search(docs, "doc_id", "text", "labels", None,
        SearchRequest(query = "engine", topK = 5, synonyms = syn,
          queryVector = Some(Seq(1.0f, 0.0f))))
    }
    assert(e.getMessage.contains("only supported on paragraph and document"))
    // the validation runs BEFORE the only_faceted fast path — the
    // reference's _validate_request raises for the request regardless
    // of only_faceted
    intercept[IllegalArgumentException] {
      Search.search(docs, "doc_id", "text", "labels", None,
        SearchRequest(query = "engine", topK = 5, synonyms = syn,
          queryVector = Some(Seq(1.0f, 0.0f)),
          faceted = Seq("/s/p"), onlyFaceted = true))
    }
    // ...but an EMPTY query with synonyms is fine (the reference gates
    // on `self.item.query` being truthy)
    Search.search(docs, "doc_id", "text", "labels", None,
      SearchRequest(query = "", topK = 5, synonyms = syn,
        queryVector = Some(Seq(1.0f, 0.0f))))
    // ...while a WHITESPACE-ONLY query still rejects: Python
    // truthiness — " " is truthy in `self.item.query`, so the
    // reference raises for it too (ADVICE r17: isEmpty, not
    // trim.isEmpty)
    val eWs = intercept[IllegalArgumentException] {
      Search.search(docs, "doc_id", "text", "labels", None,
        SearchRequest(query = " ", topK = 5, synonyms = syn,
          queryVector = Some(Seq(1.0f, 0.0f))))
    }
    assert(eWs.getMessage.contains("only supported on paragraph and document"))
  }

  test("catalog/facets: per-resource ancestor sets, LIKE prefixes, SPLIT_PART depth gate") {
    import graft.operators.Facets
    val d = Seq(
      (1L, Seq("/l/a/x", "/l/a/y")), // shared ancestors /l and /l/a
      (2L, Seq("/l/b")),
      (3L, Seq("/li/z")), // a STRING-prefix match for '/l%' (pg LIKE)
      (4L, Seq("/m/c", "orphan", ""))) // slash-less + empty labels:
      // extract_facets' `parts[1:]` is EMPTY for them — no facet, and
      // in particular no phantom from sequence(2,1)'s descending step
      .toDF("rid", "labels")
    def counts(ps: Seq[(String, Option[Int])]) =
      Facets.catalogFacets(d, "labels", ps).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // no prefixes: every ancestor path, deduplicated PER RESOURCE —
    // doc 1's two /l/a labels contribute ONE /l and ONE /l/a
    // (extract_facets returns a set, pg.py:484-493)
    assert(counts(Nil) == Map(
      "/l" -> 2L, "/l/a" -> 1L, "/l/a/x" -> 1L, "/l/a/y" -> 1L,
      "/l/b" -> 1L, "/li" -> 1L, "/li/z" -> 1L, "/m" -> 1L, "/m/c" -> 1L))
    // the reference's prefix filter is a plain SQL LIKE '{prefix}%' —
    // a STRING prefix, so '/l' admits '/li' too (parity includes it)
    assert(counts(Seq(("/l", None))).keySet
      == Set("/l", "/l/a", "/l/a/x", "/l/a/y", "/l/b", "/li", "/li/z"))
    // depth 0 under '/l': SPLIT_PART(facet, '/', 3) = '' keeps the
    // 2-part facets only ('/l' and the LIKE-matched '/li')
    assert(counts(Seq(("/l", Some(0)))).keySet == Set("/l", "/li"))
    // depth 1 adds the 3-part children, still dropping the leaves
    assert(counts(Seq(("/l", Some(1)))).keySet
      == Set("/l", "/l/a", "/l/b", "/li", "/li/z"))
    // prefixes OR-join, each with its own depth
    assert(counts(Seq(("/l/a", Some(0)), ("/m", None))).keySet
      == Set("/l/a", "/m", "/m/c"))
  }

  test("suggest: exact prefix first, fuzzy fill when empty, entity prefix list") {
    val tf = Seq(("spark", 10L), ("spars", 3L), ("scan", 5L)).toDF("term", "freq")
    val nodes = edges.select($"src".as("value"))
    val exact = Suggest.suggest(tf, "term", "freq", Some((nodes, "value")), "spar")
    assert(exact.terms.collect().map(_.getString(0)).sameElements(Array("spark", "spars")))
    assert(exact.entities.get.collect().map(_.getString(0)).isEmpty) // no 'spar' entities
    val fuzzy = Suggest.suggest(tf, "term", "freq", Some((nodes, "value")), "spurk")
    assert(fuzzy.terms.collect().map(_.getString(0)).sameElements(Array("spark")))
  }

  test("suggestMerged: one response carries both sources, fuzzy fallback intact") {
    val tf = Seq(("anchor", 10L), ("anvil", 3L), ("scan", 5L)).toDF("term", "freq")
    val nodes = edges.select($"src".as("value"))
    // entity prefix match is case-sensitive (reference relation-index
    // semantics); the term stem lowercases before the dictionary lookup
    val merged = Suggest.suggestMerged(tf, nodes, "value", "An")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // entity rows first (source asc), alphabetical; then terms by freq
    assert(merged.sameElements(Array(
      ("Anastasia", "entity", 0L), ("Anna", "entity", 0L),
      ("anchor", "paragraph", 10L), ("anvil", "paragraph", 3L))), merged.mkString(","))
    // typo'd stem: term side falls back to the fuzzy prefix automaton
    val fuzzy = Suggest.suggestMerged(tf, nodes, "value", "ancor")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(fuzzy.contains(("anchor", "paragraph")), fuzzy.mkString(","))
  }

  test("paragraph_filter applies to classic search and suggest (nodereader.proto:423,452)") {
    import graft.operators.FilterExpr
    import org.apache.spark.sql.functions.{array, col, lit, when}
    val sdocs = Seq((1L, "alpha beta", "en")).toDF("doc_id", "text", "lang")
      .withColumn("labels", array().cast("array<string>"))
    val pars = Seq(
      ("1/t/body/0-2", "alpha beta", Seq("/p/lead")),
      ("1/t/body/2-4", "alpha gamma", Seq("/p/body")))
      .toDF("paragraph_id", "p_text", "p_labels")
      .withColumn("doc_id", lit(1L))
    // classic /search: only the lead paragraph survives the filter
    val resp = Search.search(sdocs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "alpha",
        paragraphFilter = Some(FilterExpr.Facet("/p/lead"))))
    assert(resp.paragraphs.get.collect().map(_.getString(0)).toSeq
      == Seq("1/t/body/0-2"))
    // suggest: the dictionary rolls up only labeled paragraphs' rows
    val posts = Seq(
      ("1/t/body/0-2", "alpha", 1L), ("1/t/body/0-2", "beta", 1L),
      ("1/t/body/2-4", "alpha", 1L), ("1/t/body/2-4", "gamma", 1L))
      .toDF("paragraph_id", "term", "tf")
    val sugg = Suggest.suggestFiltered(posts, sdocs, "doc_id",
      filter = None, entities = None, query = "al",
      paragraphFilter = Some(FilterExpr.Facet("/p/lead")),
      paragraphs = Some(pars))
    assert(sugg.terms.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("alpha", 1L))) // not 2 — the body row is filtered out
    // classic search honors the OR operator the same way
    val orSearch = Search.search(sdocs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "alpha",
        filter = Some(FilterExpr.Eq("lang", "xx")),
        paragraphFilter = Some(FilterExpr.Facet("/p/lead")),
        filterOperatorOr = true))
    assert(orSearch.paragraphs.get.collect().map(_.getString(0)).toSeq
      == Seq("1/t/body/0-2"))
    val andSearch = Search.search(sdocs, "doc_id", "text", "labels",
      Some((pars, "paragraph_id", "p_text")),
      SearchRequest(query = "alpha",
        filter = Some(FilterExpr.Eq("lang", "xx")),
        paragraphFilter = Some(FilterExpr.Facet("/p/lead"))))
    assert(andSearch.paragraphs.get.collect().isEmpty)
    // FilterOperator OR: a doc prefilter matching nothing still keeps
    // the label-matching rows (either clause passes)
    val orSugg = Suggest.suggestFiltered(posts, sdocs, "doc_id",
      filter = Some(FilterExpr.Eq("lang", "xx")), entities = None,
      query = "al",
      paragraphFilter = Some(FilterExpr.Facet("/p/lead")),
      paragraphs = Some(pars), filterOperatorOr = true)
    assert(orSugg.terms.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("alpha", 1L)))
    val andSugg = Suggest.suggestFiltered(posts, sdocs, "doc_id",
      filter = Some(FilterExpr.Eq("lang", "xx")), entities = None,
      query = "al",
      paragraphFilter = Some(FilterExpr.Facet("/p/lead")),
      paragraphs = Some(pars))
    assert(andSugg.terms.collect().isEmpty)
    // missing labels/table fail loudly
    intercept[IllegalArgumentException] {
      Suggest.suggestFiltered(posts, sdocs, "doc_id", None, None, "al",
        paragraphFilter = Some(FilterExpr.Facet("/p/lead")))
    }
    intercept[IllegalArgumentException] {
      Search.search(sdocs, "doc_id", "text", "labels",
        Some((pars.drop("p_labels"), "paragraph_id", "p_text")),
        SearchRequest(query = "alpha",
          paragraphFilter = Some(FilterExpr.Facet("/p/lead"))))
        .paragraphs.get.collect()
    }
  }

  test("suggestFiltered: one prefilter restricts both sources (shard_suggest.rs:131-160)") {
    import graft.operators.FilterExpr
    // two docs; only doc 1 is english. Posting rows embed the doc in
    // the paragraph id prefix, exactly like the at-rest pair.
    val sdocs = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    val posts = Seq(
      ("1/t/body/0-5", "anchor", 4L), ("1/t/body/0-5", "scan", 1L),
      ("2/t/body/0-5", "anchor", 9L), ("2/t/body/0-5", "anvil", 2L))
      .toDF("paragraph_id", "term", "tf")
    val nodes = Seq(("Anastasia", 1L), ("Anna", 2L))
      .toDF("value", "resource_id")
    val resp = Suggest.suggestFiltered(posts, sdocs, "doc_id",
      Some(FilterExpr.Eq("lang", "en")),
      Some((nodes, "value", Some("resource_id"))), "An")
    // paragraph dictionary = doc 1's rollup only (anchor 4, not 13;
    // anvil gone); entity side keeps only doc 1's node
    assert(resp.terms.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("anchor", 4L)))
    assert(resp.entities.get.collect().map(_.getString(0)).toSeq
      == Seq("Anastasia"))
    // no filter → corpus-wide behavior, both nodes
    val open = Suggest.suggestFiltered(posts, sdocs, "doc_id", None,
      Some((nodes, "value", Some("resource_id"))), "An")
    assert(open.terms.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("anchor", 13L), ("anvil", 2L)))
    assert(open.entities.get.collect().map(_.getString(0)).toSeq
      == Seq("Anastasia", "Anna"))
    // a filtered entity source without provenance is a caller bug
    intercept[IllegalArgumentException] {
      Suggest.suggestFiltered(posts, sdocs, "doc_id",
        Some(FilterExpr.Eq("lang", "en")),
        Some((nodes, "value", None)), "An").entities.get.collect()
    }
    // PrefilterResult::None shortcut: no doc matches → both sides empty
    val none = Suggest.suggestFiltered(posts, sdocs, "doc_id",
      Some(FilterExpr.Eq("lang", "fr")),
      Some((nodes, "value", Some("resource_id"))), "An")
    assert(none.terms.collect().isEmpty && none.entities.get.collect().isEmpty)
  }

  test("filtered entity suggest is fuzzy-prefix: a typo'd stem completes after the provenance semi-join") {
    import graft.operators.FilterExpr
    val sdocs = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    val posts = Seq(("1/t/body/0-5", "zeta", 1L))
      .toDF("paragraph_id", "term", "tf")
    val nodes = Seq(("Anastasia", 1L), ("Anna", 2L), ("Bob", 1L))
      .toDF("value", "resource_id")
    // "Amn" is within 1 edit of the "An"/"Ann" prefixes — plain prefix
    // search returns nothing for it; the relation-suggest matcher
    // (fuzzy-prefix d=1, lib.rs:216-260) still completes, and the
    // prefilter keeps only doc 1's provenance (Anna is doc 2's)
    val resp = Suggest.suggestFiltered(posts, sdocs, "doc_id",
      Some(FilterExpr.Eq("lang", "en")),
      Some((nodes, "value", Some("resource_id"))), "Amn")
    assert(resp.entities.get.collect().map(_.getString(0)).toSeq
      == Seq("Anastasia"))
    // a 1-char stem is below MIN_SUGGEST_PREFIX_LENGTH=2 — no entity
    // subquery at all (lib.rs:60,225), empty not everything
    val short = Suggest.suggestFiltered(posts, sdocs, "doc_id",
      Some(FilterExpr.Eq("lang", "en")),
      Some((nodes, "value", Some("resource_id"))), "A")
    assert(short.entities.get.collect().isEmpty)
    // and the PARAGRAPH fuzzy fallback obeys the same regime: an
    // at-or-below-distance stem with no exact-prefix hits returns
    // EMPTY, never the whole dictionary (levenshtein(t[1,1], 'a') <= 1
    // would otherwise admit every term — 'zeta' is not a completion
    // of 'a')
    assert(short.terms.collect().isEmpty, short.terms.collect().mkString(","))
  }

  test("graph: edge facet filter excludes generated relations") {
    import org.apache.spark.sql.functions.col
    val withFacets = Seq(
      ("Anna", "LIVE_IN", "Berlin", Seq("/g")),       // machine-generated
      ("Anna", "IS_FRIEND", "Anastasia", Seq.empty[String]))
      .toDF("src", "rel", "dst", "facets")
    val t = EdgeTable(withFacets, "src", "rel", "dst", Some("facets"))
    val kept = withFacets
      .where(GraphSearch.compile(PathQuery.Path(src = NodeMatch.Exact("Anna")), t) &&
        GraphSearch.facetFilter(t, include = Nil, exclude = Seq("/g")))
      .collect().map(_.getString(1))
    assert(kept.sameElements(Array("IS_FRIEND")))
  }

  test("catalog: all six title query-match modes compile to correct predicates") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Facets
    import graft.operators.Facets.CatalogMatch._
    val rows = Seq("The Little Prince", "little prince", "Prince of Persia",
      "Database Engines", "the-little-prince").toDF("title")
    def m(mode: Facets.CatalogMatch, q: String, cs: Boolean = false) =
      rows.where(Facets.catalogMatch(col("title"), mode, q, cs))
        .collect().map(_.getString(0)).toSet
    assert(m(Exact, "little prince") == Set("little prince"))
    // StartsWith is case-insensitive for titles (pg_trgm ILIKE)…
    assert(m(StartsWith, "the little") == Set("The Little Prince"))
    // …and case-sensitive for slugs (btree LIKE)
    assert(m(StartsWith, "the-", cs = true) == Set("the-little-prince"))
    assert(m(EndsWith, "prince") ==
      Set("The Little Prince", "little prince", "the-little-prince"))
    assert(m(Contains, "of per") == Set("Prince of Persia"))
    // Words: token-set containment, order-independent
    assert(m(Words, "prince little") ==
      Set("The Little Prince", "little prince", "the-little-prince"))
    // Fuzzy: a typo'd word still matches (levenshtein 1)
    assert(m(Fuzzy, "prinze") ==
      Set("The Little Prince", "little prince", "Prince of Persia",
        "the-little-prince"))
    // …and a MULTI-word typo'd query matches per word (the reference's
    // pg_trgm word similarity is word-scoped too)
    assert(m(Fuzzy, "littl prinze") ==
      Set("The Little Prince", "little prince", "the-little-prince"))
  }

  test("augment: conversation answer-or-after pulls the answer for questions, context otherwise") {
    import graft.api.ContextBuilder
    val msgs = Seq(
      ("c1", "chat", "0", "QUESTION", "what is spark"),
      ("c1", "chat", "1", "OTHER", "let me think"),
      ("c1", "chat", "2", "ANSWER", "a distributed engine"),
      ("c1", "chat", "3", "OTHER", "thanks"),
      ("c1", "chat", "10", "OTHER", "ten sorts after two"))
      .toDF("rid", "field", "split", "mtype", "mtext")
    def ctx(hitSplit: String) = ContextBuilder.conversationAnswerOrAfter(
        msgs, "rid", "field", "split", "mtype", "mtext",
        Seq(("c1", "chat", hitSplit)).toDF("rid", "field", "split"),
        expansion = 2)
      .collect().map(r => (r.getInt(3), r.getString(4))).toSeq.sortBy(_._1)
    // a QUESTION hit skips the OTHER message and lands on the ANSWER
    assert(ctx("0") == Seq((2, "ANSWER")), ctx("0").toString)
    // a non-question hit pulls the next `expansion` messages in
    // NUMERIC split order (10 after 3, not between 1 and 2)
    assert(ctx("2") == Seq((3, "OTHER"), (10, "OTHER")), ctx("2").toString)
    // a hit with nothing after it yields no context
    assert(ctx("10").isEmpty)
  }

  test("suggest: fuzzy-prefix entity search completes typo'd and compound stems") {
    import graft.api.Suggest
    val nodes = Seq("Anastasia", "Anna Kournikova", "Berlin", "Kolkata")
      .toDF("value")
    // typo'd stem: "anq" is distance 1 from the "ann"/"ana" prefixes
    val typo = Suggest.suggestEntitiesFuzzy(nodes, "value", "anq")
      .collect().map(_.getString(0)).toSet
    assert(typo == Set("Anastasia", "Anna Kournikova"), typo.toString)
    // compound split: "anna ko" matches the compound entity via the
    // full stem AND Kolkata via the "ko" suffix stem
    assert(Suggest.splitSuggestQuery("one two three four") ==
      Seq("two three four", "three four", "four"))
    val compound = Suggest.suggestEntitiesFuzzy(nodes, "value", "anna ko")
      .collect().map(_.getString(0)).toSet
    assert(compound == Set("Anna Kournikova", "Kolkata"), compound.toString)
    // stems below the min prefix length are dropped; an all-short
    // query suggests nothing rather than everything
    assert(Suggest.suggestEntitiesFuzzy(nodes, "value", "a").count() == 0)
  }

  test("graph: typed path constraints match node type/subtype and relation type") {
    import graft.api.GraphSearch.{NodeSpec, RelSpec}
    val typed = Seq(
      ("Anna", "entity", "person", "LIVE_IN", "ENTITY", "Berlin", "entity", "place"),
      ("Anna", "entity", "person", "ABOUT", "ABOUT", "Climate", "label", "topic"),
      ("Erin", "entity", "person", "LIVE_IN", "ENTITY", "Berlin", "entity", "place"))
      .toDF("src", "st", "ss", "rel", "rt", "dst", "dt", "ds")
    val t = EdgeTable(typed, "src", "rel", "dst",
      srcTypeCol = Some("st"), srcSubtypeCol = Some("ss"),
      dstTypeCol = Some("dt"), dstSubtypeCol = Some("ds"),
      relTypeCol = Some("rt"))
    def run(q: PathQuery) = GraphSearch.search(t, q, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    // dst subtype narrows to places; relation type narrows further
    assert(run(PathQuery.TypedPath(dst = NodeSpec(subtype = Some("place")))) ==
      Set(("Anna", "Berlin"), ("Erin", "Berlin")))
    assert(run(PathQuery.TypedPath(
      src = NodeSpec(value = NodeMatch.Exact("Anna")),
      rel = RelSpec(relType = Some("ABOUT")))) == Set(("Anna", "Climate")))
    // undirected: the typed constraint travels WITH the endpoint — a
    // source-side place constraint matches Berlin in either orientation
    assert(run(PathQuery.TypedPath(
      src = NodeSpec(value = NodeMatch.Exact("Berlin"), subtype = Some("place")),
      undirected = true)) == Set(("Anna", "Berlin"), ("Erin", "Berlin")))
    // a typed constraint against a table without that column fails
    // loudly instead of silently matching everything
    val untyped = EdgeTable(typed, "src", "rel", "dst")
    intercept[IllegalArgumentException] {
      GraphSearch.compile(
        PathQuery.TypedPath(src = NodeSpec(nodeType = Some("entity"))), untyped)
    }
    ()
  }

  test("trainset generators produce task-shaped projections") {
    import graft.sources.{Ingest, Trainsets}
    val d = Seq((1L, (1 to 45).map(i => s"w$i").mkString(" "), Seq("/l/a/b")))
      .toDF("doc_id", "text", "labels")
    val par = Ingest.splitParagraphs(d, "doc_id", "text")
    val pc = Trainsets.paragraphClassification(par, d, "doc_id", "labels").collect()
    assert(pc.length == 3 && pc.forall(_.getSeq[String](2) == Seq("/l/a/b")))
    val tc = Trainsets.tokenClassification(par).collect()
    assert(tc.forall(r => r.getSeq[String](1).size == r.getSeq[String](2).size))
    val qa = Trainsets.adjacentPairs(par, "doc_id").collect()
    assert(qa.length == 2) // 3 paragraphs → 2 adjacent pairs
  }

  test("find: vectorset selection picks the right embedding space") {
    val vecs = Seq(
      (1L, "en-small", Seq(1.0f, 0.0f)), (2L, "en-small", Seq(0.0f, 1.0f)),
      (1L, "multi", Seq(0.0f, 1.0f)), (2L, "multi", Seq(1.0f, 0.0f)))
      .toDF("vec_id", "vectorset", "embedding")
    val corpus = Find.Corpus(docs.where($"doc_id" < 3), "doc_id", "text",
      Some(vecs), vectorsetCol = Some("vectorset"))
    def top(vs: String) = Find.find(corpus, Find.FindRequest(
        queryVector = Some(Seq(1.0f, 0.0f)), vectorset = Some(vs),
        semanticMinScore = 0.9)).collect().map(_.getLong(0)).toSeq
    assert(top("en-small") == Seq(1L))
    assert(top("multi") == Seq(2L)) // same query, different space
  }
}
