package graft

import org.apache.spark.sql.functions._

import graft.api.{Find, Retrieve, Search}
import graft.api.Find.Corpus
import graft.api.Retrieve._
import graft.operators.FilterExpr

/** Behavior tests for the raw-retrieval surface (`/retrieve`,
  * `search/api/v1/retrieve.py`) and the resource-scoped search
  * (`/resource/{rid}/search`).
  */
class RetrieveSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("lp", "The little prince is a novella about a young prince who visits planets", Seq("/s/p/en")),
    ("zar", "Thus spoke Zarathustra is a philosophical novel by Nietzsche", Seq("/s/p/de")),
    ("misc", "An unrelated document about database engines", Seq("/s/p/en")))
    .toDF("rid", "text", "labels")

  private val vectors = Seq(
    ("lp", Seq(0.5f, 0.5f, 0.5f)),
    ("zar", Seq(1.0f, 0.0f, 0.0f)),
    ("misc", Seq(0.0f, 1.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  private val corpus = Corpus(docs, "rid", "text", Some(vectors))

  private def raw(kw: Option[KeywordQuery] = None,
      sem: Option[SemanticQuery] = None) = RawQuery(keyword = kw, semantic = sem)

  test("dual-source retrieve fuses with provenance: source=rank_fusion/type=rrf, history columns, find parity") {
    val req = RetrievalRequest(raw(
      kw = Some(KeywordQuery("prince novel")),
      sem = Some(SemanticQuery(Seq(0.5f, 0.5f, 0.5f), "default"))))
    val rows = Retrieve.retrieve(corpus, req).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("score_source") == "rank_fusion"))
    assert(rows.forall(_.getAs[String]("score_type") == "rrf"))
    // graph never queried → its history column is all null
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("graph_score"))))
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("prerank_score"))))
    // every vector matches cosine > -1 → all three docs in the
    // semantic list; keyword list holds the term carriers only
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("semantic_score"))))
    val kwScores = rows.map(r =>
      r.getAs[String]("rid") -> Option(r.getAs[java.lang.Double]("keyword_score"))).toMap
    assert(kwScores("lp").isDefined && kwScores("zar").isDefined)
    assert(kwScores("misc").isEmpty, "misc carries neither query term")
    // the fused scores equal find's on the same request: the corpus is
    // smaller than every window, so the min(topK,500) retrieve window
    // and find's 500 admit identical lists
    val found = Find.find(corpus, Find.FindRequest(query = "prince novel",
        queryVector = Some(Seq(0.5f, 0.5f, 0.5f))))
      .select("rid", "fused").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getAs[Double]("score") == found(r.getAs[String]("rid"))))
  }

  test("request-shaped single source skips fusion: current score IS the index score with its own type") {
    val kwOnly = Retrieve.retrieve(corpus,
      RetrievalRequest(raw(kw = Some(KeywordQuery("prince"))))).collect()
    assert(kwOnly.nonEmpty)
    kwOnly.foreach { r =>
      assert(r.getAs[String]("score_source") == "index")
      assert(r.getAs[String]("score_type") == "keyword")
      assert(r.getAs[Double]("score") == r.getAs[Double]("keyword_score"))
    }
    val semOnly = Retrieve.retrieve(corpus,
      RetrievalRequest(raw(sem = Some(SemanticQuery(Seq(1f, 0f, 0f), "default"))))).collect()
    semOnly.foreach { r =>
      assert(r.getAs[String]("score_source") == "index")
      assert(r.getAs[String]("score_type") == "semantic")
      assert(r.getAs[Double]("score") == r.getAs[Double]("semantic_score"))
    }
  }

  test("result-shaped skip (rank_fusion.py:74-90): an empty keyword list leaves the semantic survivor untouched") {
    val rows = Retrieve.retrieve(corpus, RetrievalRequest(raw(
      kw = Some(KeywordQuery("xylophone")), // term matches nothing
      sem = Some(SemanticQuery(Seq(0.5f, 0.5f, 0.5f), "default"))))).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("score_source") == "index")
      assert(r.getAs[String]("score_type") == "semantic")
      assert(r.getAs[Double]("score") == r.getAs[Double]("semantic_score"))
      assert(r.isNullAt(r.fieldIndex("keyword_score")))
    }
  }

  test("topK bounds enforce the RetrievalRequest model (gt=0, le=500)") {
    val req = RetrievalRequest(raw(kw = Some(KeywordQuery("prince"))))
    intercept[IllegalArgumentException] {
      Retrieve.retrieve(corpus, req.copy(topK = 0))
    }
    intercept[IllegalArgumentException] {
      Retrieve.retrieve(corpus, req.copy(topK = 501))
    }
    // at least one sub-search must be present
    intercept[IllegalArgumentException] {
      Retrieve.retrieve(corpus, RetrievalRequest(RawQuery()))
    }
  }

  test("predict reranker re-scores with provenance; prerank preserves the fused score; semantic-only gates it off") {
    val base = RetrievalRequest(raw(
      kw = Some(KeywordQuery("prince novel")),
      sem = Some(SemanticQuery(Seq(0.5f, 0.5f, 0.5f), "default"))))
    val plain = Retrieve.retrieve(corpus, base).collect()
      .map(r => r.getAs[String]("rid") -> r.getAs[Double]("score")).toMap
    val reranked = Retrieve.retrieve(corpus,
      base.copy(reranker = Some(PredictReranker()))).collect()
    assert(reranked.nonEmpty)
    reranked.foreach { r =>
      assert(r.getAs[String]("score_source") == "reranker")
      assert(r.getAs[String]("score_type") == "reranker")
      // history: the pre-rerank fused score is exactly the
      // no-reranker run's current score
      assert(r.getAs[Double]("prerank_score") == plain(r.getAs[String]("rid")))
    }
    // the reference only reranks when a textual keyword query exists
    // (`api/v1/retrieve.py:97-104`)
    val semOnly = Retrieve.retrieve(corpus, RetrievalRequest(
      raw(sem = Some(SemanticQuery(Seq(0.5f, 0.5f, 0.5f), "default"))),
      reranker = Some(PredictReranker()))).collect()
    semOnly.foreach(r => assert(r.getAs[String]("score_type") == "semantic"))
    // noop reranker never re-scores
    val noop = Retrieve.retrieve(corpus,
      base.copy(reranker = Some(NoopReranker))).collect()
    noop.foreach(r => assert(r.getAs[String]("score_type") == "rrf"))
  }

  test("keyword synonyms expand only when the sub-query opts in") {
    val syn = Map("story" -> Seq("novella"))
    val off = Retrieve.retrieve(corpus, RetrievalRequest(
      raw(kw = Some(KeywordQuery("story"))), synonyms = syn)).collect()
    assert(off.isEmpty, "no doc contains 'story' and synonyms were not requested")
    val on = Retrieve.retrieve(corpus, RetrievalRequest(
      raw(kw = Some(KeywordQuery("story", withSynonyms = true))),
      synonyms = syn)).collect()
    assert(on.map(_.getAs[String]("rid")).toSeq == Seq("lp"))
  }

  test("matryoshka cut: a longer vector truncates to the set's indexed dimension; a shorter one is invalid") {
    val fakeIx = graft.sources.IndexStore.VectorIndex(
      centroids = Seq((0, Seq(1f, 0f, 0f))), codebook = Nil, m = 1,
      nVectors = 3, codes = vectors.limit(0),
      assignments = vectors.limit(0), raw = vectors)
    val c = corpus.copy(vectorIndexes = Map("default" -> fakeIx))
    def run(v: Seq[Float]) = Retrieve.retrieve(c, RetrievalRequest(
        raw(sem = Some(SemanticQuery(v, "default"))))).collect()
      .map(r => (r.getAs[String]("rid"), r.getAs[Double]("score"))).toSeq
    assert(run(Seq(0.5f, 0.5f, 0.5f, 9f, 9f)) == run(Seq(0.5f, 0.5f, 0.5f)))
    val e = intercept[IllegalArgumentException] { run(Seq(0.5f)) }
    assert(e.getMessage.contains("Invalid vector length"))
  }

  // ---------------- resource-scoped search ---------------- //

  private lazy val resourceIx = {
    val dir = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-ressearch-").toString)
    val convs = Seq(("zar", "chat", "0", "spoke of engines"))
      .toDF("rid", "field_id", "split", "text")
    graft.sources.Ingest.buildIndex(docs, "rid", "text", dir,
      withVectors = false, conversations = Some(convs))
    graft.sources.IndexStore.IndexTables(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclengths"),
      spark.read.parquet(s"$dir/paragraphs"),
      parPostings = Some(spark.read.parquet(s"$dir/par_postings")),
      parDocLengths = Some(spark.read.parquet(s"$dir/par_doclengths")),
      fields = Some(spark.read.parquet(s"$dir/fields")),
      fieldParagraphs = Some(spark.read.parquet(s"$dir/field_paragraphs")),
      fieldParPostings = Some(spark.read.parquet(s"$dir/fieldpar_postings")),
      fieldParDocLengths = Some(spark.read.parquet(s"$dir/fieldpar_doclengths")))
  }
  private lazy val resCorpus = corpus.copy(index = Some(resourceIx))

  test("resource search scopes to the rid key filter in both scoring modes") {
    for (bm25 <- Seq(false, true)) {
      val hits = Search.resourceSearch(resCorpus, "lp", "prince", bm25 = bm25)
        .collect()
      assert(hits.nonEmpty)
      assert(hits.forall(_.getAs[String]("paragraph_id").startsWith("lp/")),
        s"bm25=$bm25 leaked beyond the resource")
      // same resource, a query its text doesn't carry → empty
      assert(Search.resourceSearch(resCorpus, "zar", "prince",
        bm25 = bm25).isEmpty)
      // unknown resource → empty, never an error
      assert(Search.resourceSearch(resCorpus, "nope", "prince",
        bm25 = bm25).isEmpty)
    }
  }

  test("resource search: doc filter evaluates on the one resource row; fields restrict; highlight marks") {
    // lp is /s/p/en — a German-source filter empties the request
    assert(Search.resourceSearch(resCorpus, "lp", "prince",
      filter = Some(FilterExpr.Facet("/s/p/de"))).isEmpty)
    assert(Search.resourceSearch(resCorpus, "lp", "prince",
      filter = Some(FilterExpr.Facet("/s/p/en"))).count() > 0)
    // fields=c admits only the conversation paragraphs
    val conv = Search.resourceSearch(resCorpus, "zar", "spoke",
      fields = Seq("c")).collect()
    assert(conv.nonEmpty)
    assert(conv.forall(r => r.getAs[String]("paragraph_id").split("/")(1) == "c"))
    // body search on the same rid+query returns body rows only
    val body = Search.resourceSearch(resCorpus, "zar", "spoke").collect()
    assert(body.forall(r => r.getAs[String]("paragraph_id").split("/")(1) == "t"))
    // highlight marks the matched term in the hydrated page text
    val marked = Search.resourceSearch(resCorpus, "lp", "prince",
      highlight = true).collect()
    assert(marked.forall(_.getAs[String]("text").contains("<mark>prince</mark>")))
    val unmarked = Search.resourceSearch(resCorpus, "lp", "prince").collect()
    assert(unmarked.forall(!_.getAs[String]("text").contains("<mark>")))
  }

  test("resource search: empty exact page refuzzes like the unscoped reader") {
    // the reference serves /resource/{rid}/search through the SAME
    // paragraph reader (resource/search.py builds a plain
    // ParagraphSearchRequest; reader.rs:104-139 refuzzes an empty page
    // at topK > 0, min_score 0) — a misspelled rid-scoped query reruns
    // with the dictionary expansion at the 0.5 boost, the rid
    // restriction riding the rerun
    for (bm25 <- Seq(false, true)) {
      val exact = Search.resourceSearch(resCorpus, "lp", "prince",
        bm25 = bm25).collect()
      val fuzzy = Search.resourceSearch(resCorpus, "lp", "prinse",
        bm25 = bm25).collect()
      assert(fuzzy.map(_.getAs[String]("paragraph_id")).toSeq
        == exact.map(_.getAs[String]("paragraph_id")).toSeq,
        s"bm25=$bm25: the expanded page must serve the exact page's rows")
      // the reference's 0.5 fuzzy boost halves every score
      val exactScores = exact.map(r => r.getAs[String]("paragraph_id") ->
        r.getAs[Double]("score")).toMap
      fuzzy.foreach { r =>
        assert(math.abs(r.getAs[Double]("score") -
          exactScores(r.getAs[String]("paragraph_id")) * 0.5) < 1e-3,
          s"bm25=$bm25: fuzzy score must be the exact score at 0.5 boost")
      }
      // the rid restriction rides the rerun: the same typo against a
      // resource whose text never carried the term stays empty
      assert(Search.resourceSearch(resCorpus, "zar", "prinse",
        bm25 = bm25).isEmpty, s"bm25=$bm25 fallback leaked beyond the rid")
      // a topK above the reference's le=200 bound keeps the
      // distributed plan and skips the fallback, like /search and find
      assert(Search.resourceSearch(resCorpus, "lp", "prinse",
        topK = 201, bm25 = bm25).isEmpty)
    }
    // highlight marks the EXPANDED term on the fallback page
    val marked = Search.resourceSearch(resCorpus, "lp", "prinse",
      highlight = true).collect()
    assert(marked.nonEmpty &&
      marked.forall(_.getAs[String]("text").contains("<mark>prince</mark>")))
  }
}
