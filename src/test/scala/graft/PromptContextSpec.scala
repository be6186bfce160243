package graft

import graft.api.{Find, PromptContext}
import graft.api.Find.Corpus
import graft.api.PromptContext._

/** Behavior tests for the /ask prompt-context RAG strategies
  * (`search/search/chat/prompt.py`). */
class PromptContextSpec extends SparkSpec {
  import spark.implicits._

  // a: 45 tokens → paragraphs 0-20, 20-40, 40-45; b: 25 → 0-20, 20-25
  private val aText = (1 to 45).map(i => s"a$i").mkString(" ")
  private val bText = (1 to 25).map(i => s"b$i").mkString(" ")
  private val docs = Seq(("a", aText), ("b", bText)).toDF("rid", "text")

  private lazy val ix = {
    val dir = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-promptctx-").toString)
    graft.sources.Ingest.buildIndex(docs, "rid", "text", dir,
      withVectors = false)
    graft.sources.IndexStore.IndexTables(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclengths"),
      spark.read.parquet(s"$dir/paragraphs"),
      fieldParagraphs = Some(spark.read.parquet(s"$dir/field_paragraphs")))
  }
  private lazy val corpus = Corpus(docs, "rid", "text", index = Some(ix))

  private def hitsDf(rows: (String, String)*) =
    rows.zipWithIndex.map { case ((pid, text), i) => (pid, text, i.toLong) }
      .toDF("paragraph_id", "text", "order")

  private def collectBlocks(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("pos").collect()
      .map(r => (r.getAs[String]("block_id"), r.getAs[String]("text")))

  private val aPar0 = (1 to 20).map(i => s"a$i").mkString(" ")
  private val aPar1 = (21 to 40).map(i => s"a$i").mkString(" ")
  private val aPar2 = (41 to 45).map(i => s"a$i").mkString(" ")
  private val bPar0 = (1 to 20).map(i => s"b$i").mkString(" ")
  private val bPar1 = (21 to 25).map(i => s"b$i").mkString(" ")

  test("default: hit paragraphs in relevance order, cleaned of highlight marks") {
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("b/t/body/0-20", s"  <mark>$bPar0</mark> "),
        ("a/t/body/0-20", aPar0))))
    assert(out.toSeq == Seq(("b/t/body/0-20", bPar0),
      ("a/t/body/0-20", aPar0)))
  }

  test("full_resource: kept resources' hits delete, their whole-field blocks append; other hits stay") {
    // hit order interleaves a, b — first-appearance order is [a, b];
    // count=1 keeps only a: a-hits delete, b's hit keeps its slot,
    // a's field blocks land at the END (_build_context pre-insertion
    // + the strategy's delete-then-append)
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("a/t/body/20-40", aPar1), ("b/t/body/0-20", bPar0),
        ("a/t/body/0-20", aPar0)),
      FullResource(count = 1)))
    assert(out.map(_._1).toSeq ==
      Seq("b/t/body/0-20", "a/t/body", "a/a/title"))
    assert(out(1)._2 == aText)
    assert(out(2)._2 == (1 to 5).map(i => s"a$i").mkString(" "))
  }

  test("full_resource include_remaining flag is a no-op under the endpoint flow") {
    val hits = hitsDf(("a/t/body/20-40", aPar1), ("b/t/body/0-20", bPar0),
      ("b/t/body/20-25", bPar1))
    val without = collectBlocks(PromptContext.build(corpus, hits,
      FullResource(count = 1)))
    val withFlag = collectBlocks(PromptContext.build(corpus, hits,
      FullResource(count = 1, includeRemainingTextBlocks = true)))
    assert(without.toSeq == withFlag.toSeq)
    assert(without.map(_._1).toSeq ==
      Seq("b/t/body/0-20", "b/t/body/20-25", "a/t/body", "a/a/title"))
  }

  test("hierarchy: the first hit per resource rewrites in place to the composed block; other hits keep plain blocks") {
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("a/t/body/20-40", aPar1), ("b/t/body/0-20", bPar0),
        ("a/t/body/0-20", aPar0)),
      Hierarchy()))
    assert(out.map(_._1).toSeq ==
      Seq("a/t/body/20-40", "b/t/body/0-20", "a/t/body/0-20"))
    val aBlock = out(0)._2
    assert(aBlock.startsWith(
      s"DOCUMENT: ${(1 to 5).map(i => s"a$i").mkString(" ")} \n SUMMARY: "))
    // resource content holds BOTH of a's hits in hit order
    assert(aBlock.contains(s"\n EXTRACTED BLOCK: \n $aPar1 \n\n "))
    assert(aBlock.indexOf(aPar1) < aBlock.indexOf(aPar0))
    // trailing whitespace stripped (_clean_paragraph_text)
    assert(aBlock == aBlock.trim)
    // the NON-first hit keeps its pre-inserted plain text
    assert(out(2)._2 == aPar0)
  }

  test("hierarchy extraTokens extends each span's tail in token units") {
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("a/t/body/0-20", aPar0)), Hierarchy(extraTokens = 3)))
    assert(out.head._2.contains(
      (1 to 23).map(i => s"a$i").mkString(" ")))
  }

  test("field_extension: hits keep their slots; named fields append in rid × spec order") {
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("b/t/body/0-20", bPar0), ("a/t/body/0-20", aPar0)),
      FieldExtension(fields = Seq("a/title"))))
    assert(out.map(_._1).toSeq ==
      Seq("b/t/body/0-20", "a/t/body/0-20", "b/a/title", "a/a/title"))
    assert(out(2)._2 == (1 to 5).map(i => s"b$i").mkString(" "))
  }

  test("field_extension deletes hit blocks that belong to a named field") {
    val titleText = (1 to 5).map(i => s"a$i").mkString(" ")
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("a/a/title/0-5", titleText), ("a/t/body/0-20", aPar0)),
      FieldExtension(fields = Seq("a/title"))))
    // the a/title HIT deletes (its field is extended); the body hit
    // stays; the field block replaces the deleted hit at the end
    assert(out.map(_._1).toSeq == Seq("a/t/body/0-20", "a/a/title"))
  }

  test("neighbouring: hits keep their slots; neighbours append in (hit, rank) walk order") {
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("a/t/body/20-40", aPar1), ("a/t/body/40-45", aPar2)),
      Neighbouring(before = 1, after = 1)))
    // both hits stay in relevance order; hit1's neighbour 0-20 appends
    // (40-45 skips — it IS a hit); hit2's neighbour 20-40 skips too
    assert(out.map(_._1).toSeq ==
      Seq("a/t/body/20-40", "a/t/body/40-45", "a/t/body/0-20"))
    assert(out(2)._2 == aPar0)
  }

  test("cap: blocks drop whole from the end while removal keeps the total over the limit; the boundary block trims") {
    // sizes: 20, 10, 30 chars; max 25 → block3 removable (50-30=20 < 25
    // → trim? current=60, removing 30 leaves 30 >= 25 → DROP; then
    // current=30, removing block2's 10 leaves 20 < 25 → trim block2 to
    // 25-20=5 chars
    val blocks = hitsDf(
      ("p1", "x" * 20), ("p2", "y" * 10), ("p3", "z" * 30))
    val out = collectBlocks(PromptContext.build(corpus, blocks,
      Default, maxSize = Some(25)))
    assert(out.map(_._1).toSeq == Seq("p1", "p2"))
    assert(out(0)._2 == "x" * 20)
    assert(out(1)._2 == "y" * 5)
  }

  private val convs = Seq(
    ("a", "chat", "0", "how fast is the scan"),
    ("a", "chat", "1", "let me check"),
    ("a", "chat", "2", "sixty rows per tick"),
    ("a", "chat", "3", "thanks"),
    ("a", "chat", "4", "anytime"))
    .toDF("rid", "field_id", "split", "mtext")
  private val store = graft.api.Augment.ConversationStore(
    convs, "rid", "field_id", "split", "mtext")

  test("conversational: hits keep their slots; first message + deque window append at the end") {
    // hit id = the at-rest whole-message TOKEN span ("sixty rows per
    // tick" = 4 tokens) — the unit message block ids share
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("a/c/chat/2/0-4", "sixty rows per tick"),
        ("b/t/body/0-20", bPar0)),
      Conversational(maxMessages = 3), conversations = Some(store)))
    // both hits first (relevance slots), then first message (split 0)
    // and the window ranks 2..4 → splits 1,2,3; the split-2 message
    // block id EQUALS the hit id → keep-first (the hit's slot)
    assert(out.map(_._1).toSeq == Seq(
      "a/c/chat/2/0-4", "b/t/body/0-20",
      "a/c/chat/0/0-5", "a/c/chat/1/0-3", "a/c/chat/3/0-1"))
    assert(out.count(_._1 == "a/c/chat/2/0-4") == 1)
  }

  test("conversational full: the whole conversation expands once per field") {
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("a/c/chat/1/0-3", "let me check"),
        ("a/c/chat/3/0-1", "thanks")),
      Conversational(full = true), conversations = Some(store)))
    // both hits enter; the SECOND c-hit of the same field does not
    // re-expand (analyzed_fields); all five messages present once
    val ids = out.map(_._1)
    assert(ids.count(_.startsWith("a/c/chat/0/")) == 1)
    assert(ids.count(_.startsWith("a/c/chat/4/")) == 1)
    assert(ids.distinct.length == ids.length)
    assert(ids.head == "a/c/chat/1/0-3")
  }

  test("conversational without a store: hits only") {
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("a/c/chat/2/0-4", "sixty rows per tick")),
      Conversational()))
    assert(out.map(_._1).toSeq == Seq("a/c/chat/2/0-4"))
  }

  test("metadata extension suffixes blocks and moves extended blocks to the end (pop-reinsert order)") {
    import graft.api.PromptContext.MetadataType._
    val docsMeta = Seq(
      ("a", aText, "srcA", Seq("/l/red", "/l/blue/dark")),
      ("b", bText, null.asInstanceOf[String], Seq.empty[String]))
      .toDF("rid", "text", "source", "labels")
    val c = Corpus(docsMeta, "rid", "text")
    val out = collectBlocks(PromptContext.build(c,
      hitsDf(("a/t/body/0-20", aPar0), ("b/t/body/0-20", bPar0)),
      Default,
      bind = Bindings(originCol = Some("source")),
      metadata = Some(MetadataExtension(Set(Origin, ClassificationLabels)))))
    // b has neither origin nor labels → untouched, keeps slot 1 → now
    // FIRST; a extended by both passes (labels last) → moves to end
    assert(out.map(_._1).toSeq == Seq("b/t/body/0-20", "a/t/body/0-20"))
    val aText2 = out(1)._2
    assert(aText2.startsWith(aPar0))
    val originAt = aText2.indexOf("\n\nDOCUMENT METADATA AT ORIGIN:\nsource_id: srcA\n")
    val labelsAt = aText2.indexOf("\n\nDOCUMENT CLASSIFICATION LABELS:")
    assert(originAt > 0 && labelsAt > originAt,
      s"suffixes in pass order: $aText2")
    // label lines sorted, leaf (parent) rendering
    assert(aText2.contains("\n - dark (/l/blue)"))
    assert(aText2.contains("\n - red (/l)"))
    assert(aText2.indexOf(" - dark") < aText2.indexOf(" - red"))
    assert(out(0)._2 == bPar0)
  }

  test("metadata extension NERs: per-field detected entities grouped by sorted families") {
    import graft.api.PromptContext.MetadataType._
    val docsMeta = Seq(("b", bText + " red widget and blue bolt", "x"))
      .toDF("rid", "text", "source")
    val c = Corpus(docsMeta, "rid", "text")
    val dict = Seq(("red widget", "tool"), ("blue bolt", "part"),
      ("green gear", "part")).toDF("value", "family")
    val out = collectBlocks(PromptContext.build(c,
      hitsDf(("b/t/body/0-20", bPar0)),
      Default,
      bind = Bindings(entityNodes = Some(EntityNodes(dict, "value",
        Some("family")))),
      metadata = Some(MetadataExtension(Set(Ners)))))
    val t = out.head._2
    assert(t.contains("\n\nDOCUMENT NAMED ENTITIES (NERs):"))
    assert(t.contains("\n - part:\n   - blue bolt"))
    assert(t.contains("\n - tool:\n   - red widget"))
    assert(t.indexOf(" - part:") < t.indexOf(" - tool:"))
    assert(!t.contains("green gear"))
  }

  test("hierarchy: a hit whose resource is missing from the doc store keeps its hit text") {
    val out = collectBlocks(PromptContext.build(corpus,
      hitsDf(("zzz/t/body/0-20", "orphan text"), ("a/t/body/0-20", aPar0)),
      Hierarchy()))
    assert(out.map(_._1).toSeq ==
      Seq("zzz/t/body/0-20", "a/t/body/0-20"))
    // the orphan's composed block falls back to its hit text and an
    // empty DOCUMENT header
    assert(out(0)._2.startsWith("DOCUMENT:  \n SUMMARY:"))
    assert(out(0)._2.contains("orphan text"))
  }

  test("cap under the limit is a no-op; exact-fit boundary drops the block whose removal lands on the cap") {
    val under = collectBlocks(PromptContext.build(corpus,
      hitsDf(("p1", "x" * 5)), Default, maxSize = Some(100)))
    assert(under.toSeq == Seq(("p1", "x" * 5)))
    // sizes 25, 10, max 25: removing block2 leaves exactly 25 >= max →
    // whole-block drop, block1 untouched (the reference's >= branch)
    val exact = collectBlocks(PromptContext.build(corpus,
      hitsDf(("p1", "x" * 25), ("p2", "y" * 10)), Default,
      maxSize = Some(25)))
    assert(exact.toSeq == Seq(("p1", "x" * 25)))
  }
}
