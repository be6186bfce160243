package graft

import graft.api.{Find, GraphRag, GraphSearch}
import graft.api.GraphRag.Config
import graft.api.GraphSearch.EdgeTable

/** Behavior tests for the /ask graph rag strategy
  * (`search/search/graph_strategy.py`). */
class GraphRagSpec extends SparkSpec {
  import spark.implicits._

  // a small provenance-bearing graph: rose → parks → boulevard chain
  // plus an unrelated component; rel_type gates entity-to-entity
  private val edges = Seq(
    ("rosa parks", "LIVED_IN", "detroit", "ENTITY", "r1", "r1/t/body/0-20"),
    ("rosa parks", "BORN_IN", "tuskegee", "ENTITY", "r2", "r2/t/body/0-20"),
    ("detroit", "PART_OF", "michigan", "ENTITY", "r3", "r3/t/body/20-40"),
    ("detroit", "HAS_LABEL", "city", "ABOUT", "r4", "r4/t/body/0-20"),
    ("zeppelin", "MADE", "albums", "ENTITY", "r9", null))
    .toDF("src", "rel", "dst", "rel_type", "res", "par")
  private val t = EdgeTable(edges, "src", "rel", "dst",
    relTypeCol = Some("rel_type"), resourceCol = Some("res"))

  test("query entities: per-word fuzzy WORDS match at distance 1, undirected") {
    // "rose" ~ "rosa" (dist 1, word of "rosa parks"); "hamiltn" matches
    // nothing; detroit appears as BOTH src and dst — one entry
    val got = GraphRag.queryEntities(t, "rose hamiltn detroit")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("detroit", "rosa parks"))
  }

  test("one hop: frontier relations, entity-to-entity only, triplet blocks with provenance pids") {
    val out = GraphRag.retrieve(t, "rose parks", Config(hops = 1,
      topK = 10, relationTextAsParagraphs = true),
      paragraphCol = Some("par")).collect()
    // frontier = {rosa parks} (fuzzy "rose"→"rosa", exact "parks");
    // its two ENTITY relations match; the ABOUT edge and the other
    // component never enter
    val texts = out.map(_.getAs[String]("text")).toSeq
    assert(texts.toSet == Set("- rosa parks LIVED_IN detroit",
      "- rosa parks BORN_IN tuskegee"))
    // single-occurrence triplets keep their paragraph provenance
    assert(out.map(_.getAs[String]("paragraph_id")).toSet ==
      Set("r1/t/body/0-20", "r2/t/body/0-20"))
  }

  test("two hops: the explored set excludes walked entities; discovered nodes drive hop 2") {
    // with the default 0.02 threshold the hop-2 triplet (zero token
    // overlap with the query) is DROPPED by the per-hop ranking — the
    // reference's `score <= score_threshold` skip; admit it explicitly
    val out = GraphRag.retrieve(t, "rose parks", Config(hops = 2,
      topK = 10, relationTextAsParagraphs = true,
      scoreThreshold = -1.0),
      paragraphCol = Some("par")).collect()
    val texts = out.map(_.getAs[String]("text")).toSet
    // hop 2 explores detroit/tuskegee; detroit→michigan is ENTITY and
    // enters; detroit→city is ABOUT and is filtered; the path back to
    // rosa parks is excluded (explored)
    assert(texts == Set("- rosa parks LIVED_IN detroit",
      "- rosa parks BORN_IN tuskegee", "- detroit PART_OF michigan"))
    // at the default threshold the zero-overlap hop-2 triplet drops
    val pruned = GraphRag.retrieve(t, "rose parks", Config(hops = 2,
      topK = 10, relationTextAsParagraphs = true),
      paragraphCol = Some("par")).collect()
    assert(pruned.map(_.getAs[String]("text")).toSet ==
      Set("- rosa parks LIVED_IN detroit", "- rosa parks BORN_IN tuskegee"))
  }

  test("without relation_text_as_paragraphs only paragraph-bearing relations survive; blocks hydrate") {
    // index over two docs so r1/r3's paragraphs hydrate
    val docs = Seq(
      ("r1", (1 to 25).map(i => s"a$i").mkString(" ")),
      ("r3", (1 to 45).map(i => s"b$i").mkString(" ")))
      .toDF("rid", "text")
    val dir = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-graphrag-").toString)
    graft.sources.Ingest.buildIndex(docs, "rid", "text", dir,
      withVectors = false)
    val ix = graft.sources.IndexStore.IndexTables(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclengths"),
      spark.read.parquet(s"$dir/paragraphs"))
    val out = GraphRag.retrieve(t, "rose parks detroit",
      Config(hops = 2, topK = 10),
      corpus = Some(Find.Corpus(docs, "rid", "text", index = Some(ix))),
      paragraphCol = Some("par")).collect()
    val byPid = out.map(r => r.getAs[String]("paragraph_id") -> r).toMap
    // r2's paragraph survives too but its doc isn't indexed → null text
    assert(byPid.keySet == Set("r1/t/body/0-20", "r2/t/body/0-20",
      "r3/t/body/20-40"))
    assert(byPid("r1/t/body/0-20").getAs[String]("text") ==
      (1 to 20).map(i => s"a$i").mkString(" "))
    assert(byPid("r3/t/body/20-40").getAs[String]("text") ==
      (21 to 40).map(i => s"b$i").mkString(" "))
    assert(byPid("r2/t/body/0-20").getAs[String]("text") == null)
  }

  test("containment merge: a span inside a kept span merges with max score") {
    val e2 = Seq(
      ("x", "REL_A", "y", "ENTITY", "r1", "r1/t/body/0-40"),
      ("x", "REL_B", "z", "ENTITY", "r1", "r1/t/body/10-30"))
      .toDF("src", "rel", "dst", "rel_type", "res", "par")
    val t2 = EdgeTable(e2, "src", "rel", "dst",
      relTypeCol = Some("rel_type"), resourceCol = Some("res"))
    val out = GraphRag.retrieve(t2, "x", Config(hops = 1, topK = 10),
      paragraphCol = Some("par")).collect()
    // 10-30 is contained in 0-40 → one block
    assert(out.map(_.getAs[String]("paragraph_id")).toSeq ==
      Seq("r1/t/body/0-40"))
  }

  test("ranking prunes to topK by the fixture scorer; threshold drops zero-overlap triplets") {
    val out = GraphRag.retrieve(t, "rose parks detroit",
      Config(hops = 2, topK = 1, relationTextAsParagraphs = true),
      paragraphCol = Some("par")).collect()
    assert(out.length == 1)
    // the kept triplet maximizes token overlap with the query
    assert(out.head.getAs[String]("text") == "- rosa parks LIVED_IN detroit")
    val none = GraphRag.retrieve(t, "rose parks",
      Config(hops = 1, topK = 10, relationTextAsParagraphs = true,
        scoreThreshold = 1.0), paragraphCol = Some("par"))
    assert(none.count() == 0)
  }

  test("an edge whose BOTH endpoints are query entities is ONE path: provenance survives, no duplicate slot") {
    // "parks detroit": both endpoints of the LIVED_IN edge enter the
    // frontier; the undirected view matches it in both orientations,
    // but it must dedup to one occurrence — so the single-occurrence
    // pid rule keeps the edge's REAL paragraph provenance
    val out = GraphRag.retrieve(t, "parks detroit", Config(hops = 1,
      topK = 10, relationTextAsParagraphs = true),
      paragraphCol = Some("par")).collect()
    val byText = out.map(r => r.getAs[String]("text") ->
      r.getAs[String]("paragraph_id")).toMap
    assert(byText("- rosa parks LIVED_IN detroit") == "r1/t/body/0-20")
  }

  test("mode A without resource provenance fails fast with the remedy") {
    val bare = EdgeTable(edges, "src", "rel", "dst")
    val e = intercept[IllegalArgumentException] {
      GraphRag.retrieve(bare, "rose", Config(relationTextAsParagraphs = true))
    }
    assert(e.getMessage.contains("resourceCol"))
  }

  test("fuzzy word match ignores empty split tokens (padded node values)") {
    val padded = Seq((" xyz ", "REL", "wvu", "ENTITY", "r1", null))
      .toDF("src", "rel", "dst", "rel_type", "res", "par")
    val tp = EdgeTable(padded, "src", "rel", "dst",
      relTypeCol = Some("rel_type"), resourceCol = Some("res"))
    // a 1-char query word must NOT match " xyz " via its empty split
    // token (levenshtein("", "q") = 1 would have admitted it)
    val got = GraphRag.queryEntities(tp, "q").collect()
    assert(got.isEmpty)
  }

  test("no matching query entities: empty blocks with a stable schema") {
    val out = GraphRag.retrieve(t, "qqqqqq zzzzzz", Config(hops = 2))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("paragraph_id", "rid", "score", "text"))
  }
}
