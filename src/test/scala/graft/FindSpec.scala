package graft

import graft.api.{Find, QueryParser}
import graft.api.Find.{Corpus, FindRequest}
import graft.operators.FilterExpr

/** Behavior-parity tests for the /find pipeline on the reference's own
  * fixture corpora (FIXTURES.md: little_prince, thus_spoke_zarathustra;
  * sentence vector pinned to [0.5, 0.5, 0.5] exactly like
  * `nidx/nidx_tests/src/lib.rs:105-125`).
  */
class FindSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("lp", "The little prince is a novella about a young prince who visits planets", Seq("/s/p/en", "/l/genre/fiction")),
    ("zar", "Thus spoke Zarathustra is a philosophical novel by Nietzsche", Seq("/s/p/de", "/l/genre/philosophy")),
    ("misc", "An unrelated document about database engines", Seq("/s/p/en")))
    .toDF("rid", "text", "labels")

  private val vectors = Seq(
    ("lp", Seq(0.5f, 0.5f, 0.5f)),
    ("zar", Seq(1.0f, 0.0f, 0.0f)),
    ("misc", Seq(0.0f, 1.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  private val corpus = Corpus(docs, "rid", "text", Some(vectors))

  private def ids(req: FindRequest): Seq[String] =
    Find.find(corpus, req).collect().map(_.getString(0)).toSeq

  test("query grammar: phrases, exclusions, stop words") {
    val p = QueryParser.parse("""the "little prince" -fox planets""")
    assert(p.terms == Seq("planets")) // "the" is a stop word
    assert(p.phrases == Seq("little prince"))
    assert(p.excluded == Seq("fox"))
  }

  test("advanced query grammar: OR default, AND/NOT, parens, phrases; lenient on noise") {
    import graft.api.QueryParser.BoolQuery._
    val q = QueryParser.parseAdvanced("(scan OR filter) AND batch AND NOT merge")
    assert(q.contains(And(And(Or(Term("scan"), Term("filter")),
      Term("batch")), Not(Term("merge")))))
    // bare adjacency defaults to OR — tantivy's Should conjunction
    assert(QueryParser.parseAdvanced("alpha beta")
      .contains(Or(Term("alpha"), Term("beta"))))
    // MUST-NOT conjoins negatively with the positives (tantivy clause
    // semantics: Should + MustNot = positives AND NOT negatives) —
    // never OR'd in, which would defeat the exclusion
    assert(QueryParser.parseAdvanced("batch -merge")
      .contains(And(Term("batch"), Not(Term("merge")))))
    assert(QueryParser.parseAdvanced("-alpha \"two words\"")
      .contains(And(Phrase("two words"), Not(Term("alpha")))))
    // a negated GROUP keeps its negation
    assert(QueryParser.parseAdvanced("batch -(merge OR scan)")
      .contains(And(Term("batch"), Not(Or(Term("merge"), Term("scan"))))))
    // must-not-ONLY matches NOTHING — a boolean query without a
    // positive scorer is empty in tantivy/Lucene, not the complement
    assert(QueryParser.parseAdvanced("NOT merge").contains(MatchNone))
    // lenient: empty / all-noise yields None, like parse_query_lenient;
    // stray repeated ORs are noise, not structural errors
    assert(QueryParser.parseAdvanced("").isEmpty)
    assert(QueryParser.parseAdvanced("  !!  ").isEmpty)
    assert(QueryParser.parseAdvanced("a OR OR b")
      .contains(Or(Term("a"), Term("b"))))
    assert(QueryParser.parseAdvanced("OR OR a").contains(Term("a")))
    // structural breakage is a caller bug
    intercept[IllegalArgumentException] {
      QueryParser.parseAdvanced("(a AND b")
    }
  }

  test("advanced query intersects the keyword list as a MUST clause") {
    // a positive clause plus an explicit NOT clause — the must-not
    // conjoins (a bare "NOT prince" alone would match NOTHING: no
    // positive scorer, pinned below)
    val hits = ids(FindRequest(query = "novella philosophical",
      advancedQuery = Some("novel NOT prince")))
    assert(hits == Seq("zar"), hits.toString)
    // OR across two docs keeps both
    val both = ids(FindRequest(query = "novella philosophical",
      advancedQuery = Some("prince OR nietzsche")))
    assert(both.toSet == Set("lp", "zar"), both.toString)
    // must-not adjacency excludes (tantivy clause semantics)
    val excl = ids(FindRequest(query = "novella philosophical",
      advancedQuery = Some("novel -prince")))
    assert(excl == Seq("zar"), excl.toString)
    // the MUST clause applies even with an EMPTY main query: the
    // advanced tree IS the text match (uniform score), so a
    // vector-only request cannot bypass it
    val advOnly = Find.find(corpus, FindRequest(
        queryVector = Some(Seq(1.0f, 0.0f, 0.0f)),
        advancedQuery = Some("philosophical")))
      .collect().map(_.getString(0))
    assert(advOnly.headOption.contains("zar") && advOnly.length <= 3,
      advOnly.mkString(","))
    // and an advanced-only request works as a plain boolean retrieval
    val pureAdv = ids(FindRequest(advancedQuery = Some("planets OR nietzsche")))
    assert(pureAdv.toSet == Set("lp", "zar"), pureAdv.toString)
    // a NOISE advanced query behaves as ABSENT (lenient parse → None),
    // never as an unfiltered full-corpus list: alone it fails the
    // no-retrieval-source require; with a vector it leaves the
    // semantic list untouched (n_sources stays 1)
    intercept[IllegalArgumentException] {
      Find.find(corpus, FindRequest(advancedQuery = Some("!!")))
    }
    val noisy = Find.find(corpus, FindRequest(
        queryVector = Some(Seq(0.5f, 0.5f, 0.5f)),
        advancedQuery = Some("!!")))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(noisy.forall(_._2 == 1L), noisy.mkString(","))
    // must-not-only matches nothing (tantivy: no positive scorer)
    val none = ids(FindRequest(advancedQuery = Some("-prince")))
    assert(none.isEmpty, none.toString)
  }

  test("keyword find ranks the matching document first") {
    assert(ids(FindRequest(query = "prince")) == Seq("lp"))
    assert(ids(FindRequest(query = "nietzsche")) == Seq("zar"))
  }

  test("quoted phrase requires exact containment") {
    assert(ids(FindRequest(query = "\"little prince\"")) == Seq("lp"))
    assert(ids(FindRequest(query = "\"prince little\"")).isEmpty)
  }

  test("excluded terms drop matches") {
    assert(ids(FindRequest(query = "novella prince -planets")).isEmpty)
    assert(ids(FindRequest(query = "prince -unrelated")) == Seq("lp"))
  }

  test("semantic find with min_score 0.7 (reference default)") {
    val got = Find.find(corpus, FindRequest(
        queryVector = Some(Seq(0.5f, 0.5f, 0.5f)), semanticMinScore = 0.7))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("lp")) // cos=1.0; others ≈0.577 < 0.7
    assert(math.abs(got("lp") - 1.0) < 1e-9)
  }

  test("hybrid find fuses keyword + semantic; doc in both lists leads") {
    val rows = Find.find(corpus, FindRequest(
        query = "prince",
        queryVector = Some(Seq(0.5f, 0.5f, 0.5f)),
        semanticMinScore = 0.0))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(rows.head._1 == "lp" && rows.head._2 == 2) // both sources
  }

  test("label prefilter pushes into both lists; empty prefilter empties the result") {
    assert(ids(FindRequest(query = "prince nietzsche database",
      filter = Some(FilterExpr.Facet("/s/p/de")))) == Seq("zar"))
    assert(ids(FindRequest(query = "prince",
      filter = Some(FilterExpr.Facet("/s/p/fr")))).isEmpty)
    // semantic list honors the prefilter too (lp is filtered out)
    assert(ids(FindRequest(queryVector = Some(Seq(0.5f, 0.5f, 0.5f)),
      semanticMinScore = 0.0,
      filter = Some(FilterExpr.Facet("/l/genre/philosophy")))) == Seq("zar"))
  }

  test("composeResources groups hits under resources, sorted by score with id tiebreak") {
    val hits = Seq(
      ("lp", "lp/t/body/0-20", 0.9), ("lp", "lp/t/body/20-40", 0.9),
      ("lp", "lp/t/body/40-60", 0.5), ("zar", "zar/t/body/0-20", 0.7))
      .toDF("rid", "pid", "score")
    val rows = Find.composeResources(hits, "rid", "pid", "score").collect()
    assert(rows.map(_.getString(0)).sameElements(Array("lp", "zar")))
    val lp = rows(0)
    assert(lp.getDouble(1) == 0.9 && lp.getLong(2) == 3)
    assert(lp.getSeq[String](3) == Seq("lp/t/body/0-20", "lp/t/body/20-40", "lp/t/body/40-60"))
  }

  test("keyword min_score cuts low-scoring matches") {
    val all = Find.find(corpus, FindRequest(query = "prince novella unrelated"))
      .collect().map(_.getString(0))
    assert(all.toSet == Set("lp", "misc"))
    val cut = Find.find(corpus, FindRequest(query = "prince novella unrelated",
        keywordMinScore = 2.0)).collect().map(_.getString(0))
    assert(cut.toSeq == Seq("lp")) // misc's single weak term falls below
  }

  test("degenerate requests: empty query rejected; stopword-only query rejected") {
    intercept[IllegalArgumentException] { Find.find(corpus, FindRequest()) }
    // "the a an" parses to zero terms → same as empty
    intercept[IllegalArgumentException] {
      Find.find(corpus, FindRequest(query = "the a an"))
    }
    // vector-only request is fine
    assert(ids(FindRequest(query = "the a an",
      queryVector = Some(Seq(0.5f, 0.5f, 0.5f)), semanticMinScore = 0.9)) == Seq("lp"))
  }

  test("doc-level find honors fields=: both lists restricted; missing tables fail loudly") {
    // index with a conversation on ONE doc: fields=["c"] must narrow the
    // hybrid result to that doc across BOTH retrieval lists — the
    // reference prefilter applies field filters to every sub-search
    // (query_planner.rs:293-378)
    val dir = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-findfields-").toString)
    val convs = Seq(("zar", "chat", "0", "spoke of engines")).toDF("rid", "field_id", "split", "text")
    graft.sources.Ingest.buildIndex(docs, "rid", "text", dir,
      withVectors = false, conversations = Some(convs))
    val ix = graft.sources.IndexStore.IndexTables(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclengths"),
      spark.read.parquet(s"$dir/paragraphs"),
      fields = Some(spark.read.parquet(s"$dir/fields")),
      fieldParagraphs = Some(spark.read.parquet(s"$dir/field_paragraphs")))
    val c = corpus.copy(index = Some(ix))
    val restricted = Find.find(c, FindRequest(query = "novel prince",
      queryVector = Some(Seq(0.5f, 0.5f, 0.5f)), fields = Seq("c")))
      .collect().map(_.getString(0)).toSeq
    assert(restricted == Seq("zar"),
      s"fields=[c] must admit only the conversation carrier: $restricted")
    // a field spec over an index without the fields table fails loudly
    // instead of silently ignoring the restriction (ADVICE r9)
    val bare = corpus // no index bound
    val e = intercept[IllegalArgumentException] {
      Find.find(bare, FindRequest(query = "novel", fields = Seq("c")))
    }
    assert(e.getMessage.contains("field filters need a bound index"))
  }

  test("cached filter stats: prefiltered find/findParagraphs scores identical; guard knobs fall back to live stats") {
    import graft.functions.Bm25
    val dir = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-cachedstats-").toString)
    graft.sources.Ingest.buildIndex(docs, "rid", "text", dir,
      withVectors = false)
    val ix = graft.sources.IndexStore.IndexTables(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclengths"),
      spark.read.parquet(s"$dir/paragraphs"),
      parPostings = Some(spark.read.parquet(s"$dir/par_postings")),
      parDocLengths = Some(spark.read.parquet(s"$dir/par_doclengths")),
      fields = Some(spark.read.parquet(s"$dir/fields")),
      fieldParagraphs = Some(spark.read.parquet(s"$dir/field_paragraphs")),
      fieldParPostings = Some(spark.read.parquet(s"$dir/fieldpar_postings")),
      fieldParDocLengths = Some(spark.read.parquet(s"$dir/fieldpar_doclengths")))
    val f: FilterExpr = FilterExpr.Facet("/s/p/en")
    val base = corpus.copy(index = Some(ix))
    val cached = base.copy(
      cachedFilterStats = Map(Find.RestrictionKey(filter = Some(f)) -> Find.cachedStatsFor(base, f)))
    val req = FindRequest(query = "prince database", filter = Some(f))
    val preq = req.copy(paragraphBm25 = true)
    def rows(c: Corpus, r: FindRequest) = Find.find(c, r).collect()
      .map(x => (x.getString(0), x.getAs[Double]("fused"))).toSeq
    def prows(c: Corpus, r: FindRequest) = Find.findParagraphs(c, r)
      .collect().map(x => (x.getString(0), x.getAs[Double]("best_score"))).toSeq
    // correctly-built cache: scores EXACTLY equal the live aggregation
    assert(rows(cached, req) == rows(base, req), "doc-level cached stats diverged")
    assert(prows(cached, preq) == prows(base, preq), "paragraph cached stats diverged")
    // the fast path provably ENGAGES: a poisoned cache changes scores
    val poisoned = base.copy(cachedFilterStats = Map(Find.RestrictionKey(filter = Some(f)) -> Find.CachedBm25Stats(
      doc = Some(Bm25.CorpusStats(1000000L, 1000.0)),
      paragraph = Some(Bm25.CorpusStats(1000000L, 1000.0)))))
    assert(rows(poisoned, req) != rows(base, req),
      "the doc fast path never engaged — the poisoned stats were ignored")
    assert(prows(poisoned, preq) != prows(base, preq),
      "the paragraph fast path never engaged")
    // ...and DISENGAGES when any other knob narrows the population:
    // the poisoned entry must be ignored and live stats aggregate
    val phraseReq = req.copy(query = "\"database engines\" prince")
    assert(rows(poisoned, phraseReq) == rows(base, phraseReq),
      "phrases narrow the population — cache must not apply")
    val fieldsReq = preq.copy(fields = Seq("t"))
    assert(prows(poisoned, fieldsReq) == prows(base, fieldsReq),
      "fields= narrows the population — cache must not apply")
    val dupReq = preq.copy(withDuplicates = true)
    assert(prows(poisoned, dupReq) == prows(base, dupReq),
      "withDuplicates changes the population — cache must not apply")
  }

  test("restriction-key stats (round 19): fields / label / OR keys serve " +
      "cached populations identically, and each fast path provably engages") {
    import graft.functions.Bm25
    import org.apache.spark.sql.functions.{array, col, lit, when}
    val dir = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-restrictkey-").toString)
    graft.sources.Ingest.buildIndex(docs, "rid", "text", dir,
      withVectors = false)
    val labeled = spark.read.parquet(s"$dir/paragraphs")
      .withColumn("p_labels",
        when(col("start") === 0, array(lit("/p/lead")))
          .otherwise(array(lit("/p/body"))))
    val ix = graft.sources.IndexStore.IndexTables(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclengths"),
      labeled,
      parPostings = Some(spark.read.parquet(s"$dir/par_postings")),
      parDocLengths = Some(spark.read.parquet(s"$dir/par_doclengths")),
      fields = Some(spark.read.parquet(s"$dir/fields")),
      fieldParagraphs = Some(spark.read.parquet(s"$dir/field_paragraphs")),
      fieldParPostings = Some(spark.read.parquet(s"$dir/fieldpar_postings")),
      fieldParDocLengths = Some(spark.read.parquet(s"$dir/fieldpar_doclengths")))
    val base = corpus.copy(index = Some(ix))
    def rows(c: Corpus, r: FindRequest) = Find.find(c, r).collect()
      .map(x => (x.getString(0), x.getAs[Double]("fused"))).toSeq
    def prows(c: Corpus, r: FindRequest) = Find.findParagraphs(c, r)
      .collect().map(x => (x.getString(0), x.getAs[Double]("best_score"))).toSeq
    def cachedWith(key: Find.RestrictionKey) =
      base.copy(cachedFilterStats = Map(key -> Find.cachedStatsFor(base, key,
        // with the at-rest df tables too (round 19) — the equality
        // asserts below then cover stats AND df serving
        dfDir = Some(graft.sources.IndexStore.deleteOnExit(
          java.nio.file.Files.createTempDirectory("graft-rk-df-")
            .toString)))))
    def poisonedWith(key: Find.RestrictionKey) =
      base.copy(cachedFilterStats = Map(key -> Find.CachedBm25Stats(
        doc = Some(Bm25.CorpusStats(1000000L, 1000.0)),
        paragraph = Some(Bm25.CorpusStats(1000000L, 1000.0)))))
    // fake df table under REAL stats: proves the df fast path itself
    // engages (a wrong df must change scores)
    def dfPoisonedWith(key: Find.RestrictionKey) = {
      val fake = Seq(("prince", 999999L), ("database", 999999L),
        ("novel", 999999L)).toDF("term", "df")
      base.copy(cachedFilterStats = Map(key ->
        Find.cachedStatsFor(base, key)
          .copy(docDf = Some(fake), parDf = Some(fake))))
    }

    // FIELDS key: doc-level find AND paragraph-BM25 find (q102/q104)
    val fk = Find.RestrictionKey(fields = Seq("a"))
    val fReq = FindRequest(query = "prince database", fields = Seq("a"))
    val fPReq = fReq.copy(paragraphBm25 = true)
    assert(rows(cachedWith(fk), fReq) == rows(base, fReq),
      "fields-key doc stats diverged")
    assert(prows(cachedWith(fk), fPReq) == prows(base, fPReq),
      "fields-key paragraph stats diverged")
    assert(rows(poisonedWith(fk), fReq) != rows(base, fReq),
      "fields-key doc fast path never engaged")
    assert(prows(poisonedWith(fk), fPReq) != prows(base, fPReq),
      "fields-key paragraph fast path never engaged")
    assert(rows(dfPoisonedWith(fk), fReq) != rows(base, fReq),
      "fields-key doc DF table never engaged")
    assert(prows(dfPoisonedWith(fk), fPReq) != prows(base, fPReq),
      "fields-key paragraph DF table never engaged")

    // PARAGRAPH-LABEL key (q139)
    val lk = Find.RestrictionKey(
      paragraphFilter = Some(FilterExpr.Facet("/p/lead")))
    val lReq = FindRequest(query = "prince database", paragraphBm25 = true,
      paragraphFilter = Some(FilterExpr.Facet("/p/lead")))
    assert(prows(cachedWith(lk), lReq) == prows(base, lReq),
      "label-key stats diverged")
    assert(prows(poisonedWith(lk), lReq) != prows(base, lReq),
      "label-key fast path never engaged")

    // FILTER×LABEL OR key (q143) — and its normalization: registering
    // with the un-normalized constructor must still hit
    val ok = Find.RestrictionKey(
      filter = Some(FilterExpr.Facet("/s/p/de")),
      paragraphFilter = Some(FilterExpr.Facet("/p/lead")),
      filterOperatorOr = true)
    val oReq = FindRequest(query = "prince database novel",
      paragraphBm25 = true,
      filter = Some(FilterExpr.Facet("/s/p/de")),
      paragraphFilter = Some(FilterExpr.Facet("/p/lead")),
      filterOperatorOr = true)
    assert(prows(cachedWith(ok), oReq) == prows(base, oReq),
      "OR-key stats diverged")
    assert(prows(poisonedWith(ok), oReq) != prows(base, oReq),
      "OR-key fast path never engaged")

    // the density-probe count rides the registration: a poisoned
    // nAllowed flips the brute-vs-index branch input — pin that the
    // REGISTERED count equals the live count instead (same integer)
    val fkStats = Find.cachedStatsFor(base, fk)
    assert(fkStats.nAllowed.contains(
        Find.docLevelBase(base, None, Seq("a")).select("rid").count()),
      "registered nAllowed must equal the live density-probe count")
  }

  test("rerank reorders the fused window by model overlap") {
    val rows = Find.find(corpus, FindRequest(
        query = "prince planets database", rerank = true))
      .collect().map(_.getString(0))
    assert(rows.head == "lp") // two query terms vs one for misc
  }

  test("graph source fuses as a third list at the constant score; prefilter inherited; provenance required") {
    import graft.api.GraphSearch
    import GraphSearch.{EdgeTable, NodeMatch, PathQuery}
    // entity edges with doc provenance: both prince docs carry a
    // PRINCE entity, zar carries an OVERMAN entity
    val edges = Seq(
      ("prince", "MENTIONS", "character", "lp"),
      ("overman", "MENTIONS", "concept", "zar"))
      .toDF("src", "rel", "dst", "resource_id")
    val gCorpus = corpus.copy(graphEdges = Some(
      EdgeTable(edges, "src", "rel", "dst", resourceCol = Some("resource_id"))))
    val gq = PathQuery.Path(src = NodeMatch.Exact("prince"))
    // graph-only request: constant-score list, id order
    val graphOnly = Find.find(gCorpus, FindRequest(graphQuery = Some(gq)))
      .collect().map(_.getString(0)).toSeq
    assert(graphOnly == Seq("lp"), graphOnly.toString)
    // hybrid: the graph evidence adds a source for lp
    val hybrid = Find.find(gCorpus, FindRequest(query = "novella",
        graphQuery = Some(gq)))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(hybrid("lp") == 2L, hybrid.toString) // keyword + graph
    // the main request's filter applies to the relation sub-search too
    val filtered = Find.find(gCorpus, FindRequest(
        filter = Some(FilterExpr.Facet("/s/p/de")), graphQuery = Some(gq)))
      .collect()
    assert(filtered.isEmpty, filtered.mkString(","))
    // a graph query without bound provenance is a caller bug
    intercept[IllegalArgumentException] {
      Find.find(corpus.copy(graphEdges = Some(
          EdgeTable(edges, "src", "rel", "dst"))),
        FindRequest(graphQuery = Some(gq)))
    }
  }

  test("search_after pages the fused order: pages disjoint, union = full cut, rerank forced off") {
    // hybrid request over the 3-doc corpus, paged 1-at-a-time
    val req = FindRequest(query = "prince zarathustra database",
      queryVector = Some(Seq(0.5f, 0.5f, 0.5f)), topK = 1)
    val full = Find.find(corpus, req.copy(topK = 3))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    var shown = Seq.empty[Any]
    var cursor: Option[Find.FindCursor] = None
    val paged = (1 to 3).flatMap { _ =>
      val page = Find.find(corpus,
          req.copy(searchAfter = cursor))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      page.lastOption.foreach { case (id, score) =>
        shown = shown ++ page.map(_._1)
        cursor = Some(Find.FindCursor(score, id, shown))
      }
      page
    }
    assert(paged.map(_._1).distinct.size == 3, "pages must be disjoint")
    assert(paged.sameElements(full),
      s"paged walk must reproduce the full fused cut: $paged vs ${full.toSeq}")
    // search_after wins over rerank — the cursor points into the fused
    // order, so a rerank request pages the same order (find.py:96-99)
    val p2rerank = Find.find(corpus, req.copy(rerank = true,
        searchAfter = Some(Find.FindCursor(full(0)._2, full(0)._1,
          Seq(full(0)._1)))))
      .collect().map(_.getString(0))
    assert(p2rerank.headOption.contains(full(1)._1))
  }

  test("paragraph-mode find groups paragraph hits under resources with prefilter") {
    val res = Find.findParagraphs(corpus, FindRequest(
        query = "prince planets",
        filter = Some(FilterExpr.Facet("/s/p/en"))))
      .collect()
    val byDoc = res.map(r => r.getString(0) ->
      (r.getDouble(1), r.getLong(2))).toMap
    assert(byDoc.contains("lp") && !byDoc.contains("zar")) // filtered to /s/p/en
    assert(!byDoc.contains("misc")) // no matching terms
    val (best, nHits) = byDoc("lp")
    assert(best >= 1.0 && nHits >= 1)
    // exclusions drop paragraphs containing the excluded term
    val excl = Find.findParagraphs(corpus, FindRequest(query = "prince -planets"))
      .collect().map(_.getString(0))
    assert(excl.isEmpty || !excl.contains("misc"))
  }

  test("paragraph search excludes repeated_in_field rows unless with_duplicates") {
    // 40 tokens where the second 20-token window repeats the first —
    // the ingest marker flags window #2; the reference's default
    // search mode must not return it, with_duplicates must
    val w20 = (1 to 18).map(i => s"w$i").mkString("needle alpha ", " ", "")
    val dup = Seq(("d1", s"$w20 $w20")).toDF("rid", "text")
    val dupCorpus = Corpus(dup, "rid", "text")
    def hits(withDup: Boolean): Seq[String] =
      Find.findParagraphs(dupCorpus,
          FindRequest(query = "needle", withDuplicates = withDup))
        .collect().flatMap(_.getSeq[String](3)).toSeq
    val deduped = hits(withDup = false)
    assert(deduped == Seq("d1/t/body/0-20"), deduped.toString)
    val all = hits(withDup = true)
    assert(all.toSet == Set("d1/t/body/0-20", "d1/t/body/20-40"), all.toString)
  }

  test("paragraph-label filter enforced: labeled rows only, unlabeled corpus fails loudly (old-filter parExpr lands here)") {
    import graft.api.OldFilters
    import org.apache.spark.sql.functions.{array, col, lit, when}
    // two 20-token windows per doc; the ingest-attached label tags the
    // lead window /p/lead — the paragraph-kind side of the label split
    val w = (1 to 18).map(i => s"t$i").mkString("needle x ", " ", "")
    val w2 = (1 to 20).map(i => s"u$i needle".split(" ")(0)).mkString(" ") // distinct window
    val docs2 = Seq(("d1", s"$w needle ${w2.split(" ").drop(1).mkString(" ")}"))
      .toDF("rid", "text")
    val c = Corpus(docs2, "rid", "text")
    // the old-filter parser routes paragraph-kind labelsets to the
    // paragraph expression — that output is exactly what
    // FindRequest.paragraphFilter enforces
    val (_, parExpr) = OldFilters.parse(
      OldFilters.Params(labelFilters = Seq(OldFilters.Lit("/l/pkind/lead"))),
      paragraphLabelsets = Set("pkind"))
    assert(parExpr.nonEmpty)
    // unlabeled corpus: enforcement must fail loudly, never silently
    // return unfiltered hits
    intercept[IllegalArgumentException] {
      Find.findParagraphs(c, FindRequest(query = "needle",
        paragraphFilter = parExpr)).collect()
    }
    // labeled corpus (inline paragraph table with p_labels): only the
    // lead window survives the filter
    val ix = graft.sources.IndexStore.IndexTables(
      postings = spark.emptyDataFrame, docLengths = spark.emptyDataFrame,
      paragraphs = graft.sources.Ingest.splitParagraphs(docs2, "rid", "text")
        .withColumn("p_labels",
          when(col("start") === 0, array(lit("/l/pkind/lead")))
            .otherwise(array(lit("/l/pkind/body")))))
    val hits = Find.findParagraphs(Corpus(docs2, "rid", "text",
        index = Some(ix)),
        FindRequest(query = "needle", paragraphFilter = parExpr))
      .collect().flatMap(_.getSeq[String](3)).toSeq
    assert(hits == Seq("d1/t/body/0-20"), hits.toString)
    // FilterOperator OR: a doc prefilter matching NOTHING still keeps
    // the label-matching paragraphs (either clause passes); under the
    // default AND it empties the result
    val lc = Corpus(docs2.withColumn("lang",
        org.apache.spark.sql.functions.lit("en")), "rid", "text",
      index = Some(ix))
    val orHits = Find.findParagraphs(lc,
        FindRequest(query = "needle", paragraphFilter = parExpr,
          filter = Some(FilterExpr.Eq("lang", "xx")),
          filterOperatorOr = true))
      .collect().flatMap(_.getSeq[String](3)).toSeq
    assert(orHits == Seq("d1/t/body/0-20"), orHits.toString)
    val andHits = Find.findParagraphs(lc,
        FindRequest(query = "needle", paragraphFilter = parExpr,
          filter = Some(FilterExpr.Eq("lang", "xx"))))
      .collect()
    assert(andHits.isEmpty, andHits.mkString(","))
  }

  test("highlight=true marks terms in the hydrated text, phrase merged to one span") {
    val rows = Find.find(corpus, FindRequest(
        query = "\"little prince\" novella", highlight = true))
      .select("rid", "text").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("lp"))
    val marked = rows.head.getString(1)
    // phrase tokens merge into ONE span; the loose term marks alone
    assert(marked.contains("<mark>little prince</mark>"), marked)
    assert(marked.contains("<mark>novella</mark>"), marked)
    assert(!marked.contains("<mark>little</mark>"), marked)
    // opt-in: the default request returns the raw text
    val raw = Find.find(corpus, FindRequest(query = "\"little prince\" novella"))
      .select("text").collect().head.getString(0)
    assert(!raw.contains("<mark>"), raw)
  }

  test("semanticMinScore DEFAULT is include-all (-1.0) — recorded divergence from the reference's 0.7 facade default") {
    // the reference HTTP layer defaults to the vectorset's trained
    // threshold (0.7 absent one, common.py:38) — a MODEL property this
    // engine does not assume; parity callers pass 0.7 explicitly (the
    // "min_score 0.7" test above)
    assert(FindRequest().semanticMinScore == -1.0)
    val all = Find.find(corpus, FindRequest(
        queryVector = Some(Seq(0.5f, 0.5f, 0.5f))))
      .collect()
    assert(all.length == 3, s"include-all default must keep every doc: ${all.length}")
  }

  test("graph-source provenance absent from the doc store never consumes fused slots") {
    import graft.api.GraphSearch
    import graft.api.GraphSearch.{EdgeTable, NodeMatch, PathQuery}
    val edges = Seq(
      ("n1", "REL", "x", "lp"),
      ("n2", "REL", "x", "ghost")) // provenance id not in the doc store
      .toDF("src", "rel", "dst", "resource_id")
    val c = corpus.copy(graphEdges = Some(
      EdgeTable(edges, "src", "rel", "dst", resourceCol = Some("resource_id"))))
    val got = Find.find(c, FindRequest(
        graphQuery = Some(PathQuery.Path(rel = Some("REL"))), topK = 2))
      .collect()
    // without the doc semi-join the orphan survives fusion + topK(2)
    // and vanishes at hydration — a 1-row page; with it, lp fills the
    // page alone and every returned row is hydrated
    assert(got.map(_.getString(0)).toSeq == Seq("lp"), got.mkString(","))
    assert(got.forall(!_.isNullAt(3)))
    // a restricted request keeps the existing allowedIds intersection
    val filtered = Find.find(c, FindRequest(
        graphQuery = Some(PathQuery.Path(rel = Some("REL"))),
        filter = Some(FilterExpr.Facet("/s/p/en")), topK = 2))
      .collect().map(_.getString(0)).toSeq
    assert(filtered == Seq("lp"), filtered.toString)
  }

  test("composeResources bounds each resource's hits array to the response window") {
    import org.apache.spark.sql.functions.col
    val hits = Seq(
      ("d1", "d1/p0", 5.0), ("d1", "d1/p1", 4.0), ("d1", "d1/p2", 3.0),
      ("d1", "d1/p3", 2.0), ("d2", "d2/p0", 1.0))
      .toDF("rid", "pid", "score")
    val unbounded = Find.composeResources(hits, "rid", "pid", "score")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getSeq[String](3)))
    assert(unbounded.head == (("d1", 4L, Seq("d1/p0", "d1/p1", "d1/p2", "d1/p3"))))
    val bounded = Find.composeResources(hits, "rid", "pid", "score",
        maxHits = Some(2))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getSeq[String](3)))
    // the array is cut to the window — best_score and n_hits still
    // cover EVERY hit, and the kept ids are the top of the same order
    assert(bounded.head == (("d1", 4L, Seq("d1/p0", "d1/p1"))))
    assert(bounded(1) == (("d2", 1L, Seq("d2/p0"))))
    // and findParagraphs threads its topK as the window: a doc with
    // more matching paragraphs than topK returns a topK-sized array
    val w = (1 to 120).map(i => if (i % 2 == 0) s"w$i" else "needle")
      .mkString(" ")
    val docs1 = Seq(("d1", w)).toDF("rid", "text")
    val found = Find.findParagraphs(Corpus(docs1, "rid", "text"),
        FindRequest(query = "needle", topK = 2)).collect()
    assert(found.length == 1)
    val (nHits, arr) = (found.head.getLong(2), found.head.getSeq[String](3))
    assert(nHits > 2, s"fixture must overflow the window: $nHits")
    assert(arr.length == 2, arr.toString)
  }

  test("findParagraphs highlight hydrates each hit as (id, marked text) in composed order") {
    val docs1 = Seq(("d1", "the needle hides here; a second needle too"))
      .toDF("rid", "text")
    val got = Find.findParagraphs(Corpus(docs1, "rid", "text"),
        FindRequest(query = "needle", topK = 5, highlight = true))
      .collect()
    assert(got.length == 1)
    val hits = got.head.getSeq[org.apache.spark.sql.Row](3)
    assert(hits.nonEmpty)
    // structs carry the id and the MARKED text, same order as the id
    // array form (score desc, id asc)
    assert(hits.forall(h => h.getString(1).contains("<mark>needle</mark>")),
      hits.mkString(","))
    assert(hits.map(_.getString(0)) == hits.map(_.getString(0)).sorted)
    // default stays the id-array shape
    val plain = Find.findParagraphs(Corpus(docs1, "rid", "text"),
        FindRequest(query = "needle", topK = 5))
      .collect().head.getSeq[String](3)
    assert(plain.forall(_.startsWith("d1/")), plain.toString)
  }

  test("advanced term with internal separators compiles to the tokenizer's conjunction") {
    import graft.api.QueryParser.BoolQuery._
    assert(QueryParser.parseAdvanced("state-of-the-art")
      .contains(And(And(And(Term("state"), Term("of")), Term("the")),
        Term("art"))))
    // end-to-end: the clause matches a doc whose TOKENS contain the
    // parts (the glued 'stateoftheart' token never exists)
    val d = Seq(("a", "a state-of-the-art engine"), ("b", "plain art"))
      .toDF("rid", "text")
    val hit = Find.find(Corpus(d, "rid", "text"),
        FindRequest(advancedQuery = Some("state-of-the-art")))
      .collect().map(_.getString(0)).toSeq
    assert(hit == Seq("a"), hit.toString)
  }

  test("jsonSchemaPrequeries: property order, description composition, bounds") {
    import graft.api.Find
    val pre = Find.jsonSchemaPrequeries(
      """{"name": "b", "parameters": {"properties": {
        |  "title": {"type": "string", "description": "the book title"},
        |  "author": {"type": "string", "description": ""},
        |  "isbn": {"type": "string"}
        |}}}""".stripMargin)
    // one prequery per property IN SCHEMA ORDER, query = name or
    // "name: description" (empty description = name only), weight 1.0,
    // top_k hard-coded 10 (ask.py:1068-1078)
    assert(pre.map(_._1.query) ==
      Seq("title: the book title", "author", "isbn"))
    assert(pre.forall { case (r, w) => w == 1.0 && r.topK == 10 &&
      !r.highlight && !r.withDuplicates })
    // template knobs (the AskRequest carry-over) survive
    val tpl = Find.FindRequest(semanticMinScore = 0.4,
      vectorset = Some("mini"))
    val withTpl = Find.jsonSchemaPrequeries(
      """{"parameters": {"properties": {"x": {}}}}""", tpl)
    assert(withTpl.head._1.vectorset.contains("mini") &&
      withTpl.head._1.semanticMinScore == 0.4)
    // no properties -> Nil (the reference returns None)
    assert(Find.jsonSchemaPrequeries("""{"parameters": {}}""").isEmpty)
    assert(Find.jsonSchemaPrequeries("""{}""").isEmpty)
    // > 15 properties = the reference's AnswerJsonSchemaTooLong
    val big = (1 to 16)
      .map(i => "\"p" + i + "\": {\"type\": \"string\"}").mkString(",")
    intercept[IllegalArgumentException] {
      Find.jsonSchemaPrequeries(
        "{\"parameters\": {\"properties\": {" + big + "}}}")
    }
    intercept[IllegalArgumentException] {
      Find.jsonSchemaPrequeries("not json {")
    }
  }

  test("paragraph fuzzy fallback: typo'd terms rerun at 0.5 boost; exact hits, nonzero min_score, and short terms never fall back") {
    import graft.api.Find
    val docs = Seq((1L, "spark engine runs"), (2L, "query planner spark"))
      .toDF("doc_id", "text")
    val corpus = Find.Corpus(docs, "doc_id", "text")
    def bestScores(q: String, minScore: Double = 0.0): Seq[(Long, Double)] =
      Find.findParagraphs(corpus,
          Find.FindRequest(query = q, topK = 5,
            keywordMinScore = minScore))
        .select("doc_id", "best_score")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    // typo: exact page empty -> lev-1 expansion (sparkk -> spark),
    // scores carry the reference's 0.5 fuzzy boost
    assert(bestScores("sparkk") == Seq((1L, 0.5), (2L, 0.5)),
      s"fallback page wrong: ${bestScores("sparkk")}")
    // exact hits never fall back (and never scale)
    assert(bestScores("spark") == Seq((1L, 1.0), (2L, 1.0)))
    // the reference gates the fallback on min_score == 0
    // (reader.rs:120): a nonzero min_score returns the empty page
    assert(bestScores("sparkk", minScore = 0.1).isEmpty,
      "nonzero min_score must suppress the fuzzy fallback")
    // a term under MIN_FUZZY_LEN stays EXACT in the expansion
    // (fuzzy_parser.rs:35) - a 2-char typo matches nothing
    assert(bestScores("zq").isEmpty, "short terms must not fuzzy")
    // the LAST term expands as a fuzzy PREFIX at >= 4 chars
    // (last_fuzzy_term_as_prefix): "quer" completes to "query"
    assert(bestScores("quer") == Seq((2L, 0.5)),
      s"fuzzy-prefix fallback wrong: ${bestScores("quer")}")
  }

  test("topK above the reference's 200 cap skips the fallback and keeps the distributed plan") {
    import graft.api.{Find, Search}
    val docs = Seq((1L, "spark engine runs"), (2L, "query planner spark"))
      .toDF("doc_id", "text")
    val corpus = Find.Corpus(docs, "doc_id", "text")
    def page(topK: Int) = Find.findParagraphs(corpus,
      Find.FindRequest(query = "sparkk", topK = topK))
    // inside the bound: typo falls back (collected local page)
    assert(page(200).count() == 2)
    assert(page(200).queryExecution.logical.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    // above it: no fallback (empty exact page), plan stays distributed
    assert(page(201).count() == 0)
    assert(!page(201).queryExecution.logical.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    // /search's paragraph list follows the same gate
    val respIn = Search.search(docs, "doc_id", "text", "text",
      Some((graft.sources.Ingest.splitParagraphs(docs, "doc_id", "text"),
        "paragraph_id", "p_text")),
      Search.SearchRequest(query = "sparkk", topK = 200))
    assert(respIn.paragraphs.get.count() == 2, "in-bound search must fall back")
    val respOut = Search.search(docs, "doc_id", "text", "text",
      Some((graft.sources.Ingest.splitParagraphs(docs, "doc_id", "text"),
        "paragraph_id", "p_text")),
      Search.SearchRequest(query = "sparkk", topK = 201))
    assert(respOut.paragraphs.get.count() == 0,
      "above-bound search must not fall back")
  }
}
