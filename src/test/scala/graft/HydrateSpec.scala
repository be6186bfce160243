package graft

import graft.api.{Find, Hydrate}
import graft.api.Find.Corpus
import graft.api.Hydrate.{Hydration, Neighbours}

/** Behavior tests for the paragraph-set hydration endpoint
  * (`/hydrate`, `search/api/v1/hydrate.py`). */
class HydrateSpec extends SparkSpec {
  import spark.implicits._

  // 45 tokens → 3 body chunks (0-20, 20-40, 40-45)
  private val longText = (1 to 45).map(i => s"w$i").mkString(" ")
  private val docs = Seq(
    ("a", longText),
    ("b", "short doc"))
    .toDF("rid", "text")

  private lazy val ix = {
    val dir = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-hydrate-").toString)
    val convs = Seq(
      ("a", "chat", "0", (1 to 25).map(i => s"c$i").mkString(" ")))
      .toDF("rid", "field_id", "split", "text")
    graft.sources.Ingest.buildIndex(docs, "rid", "text", dir,
      withVectors = false, conversations = Some(convs))
    graft.sources.IndexStore.IndexTables(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclengths"),
      spark.read.parquet(s"$dir/paragraphs"),
      fieldParagraphs = Some(spark.read.parquet(s"$dir/field_paragraphs")))
  }
  private lazy val corpus = Corpus(docs, "rid", "text", index = Some(ix))

  private def byId(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getAs[String]("paragraph_id") -> r).toMap

  test("requested paragraphs hydrate with text; invalid and unknown ids skip silently") {
    val out = Hydrate.paragraphs(corpus,
      Seq("a/t/body/0-20", "not an id", "zzz/t/body/0-20", "a/t/body/7-9"))
      .collect()
    assert(out.map(_.getAs[String]("paragraph_id")).toSeq == Seq("a/t/body/0-20"))
    val r = out.head
    assert(r.getAs[String]("text") == (1 to 20).map(i => s"w$i").mkString(" "))
    assert(r.getAs[String]("field") == "a/t/body")
    assert(r.getAs[String]("rid") == "a")
    assert(r.getAs[Boolean]("requested"))
  }

  test("neighbour expansion: ordered refs on requested rows, text-only neighbour rows, field-bounded") {
    val out = Hydrate.paragraphs(corpus, Seq("a/t/body/20-40"),
      Hydration(neighbours = Some(Neighbours(before = 1, after = 1))))
      .collect()
    val m = byId(out)
    assert(m.keySet == Set("a/t/body/0-20", "a/t/body/20-40", "a/t/body/40-45"))
    val target = m("a/t/body/20-40")
    assert(target.getAs[scala.collection.Seq[String]]("related_before").toSeq == Seq("a/t/body/0-20"))
    assert(target.getAs[scala.collection.Seq[String]]("related_after").toSeq == Seq("a/t/body/40-45"))
    // neighbour rows are text-only: no related refs, requested=false
    val nb = m("a/t/body/0-20")
    assert(!nb.getAs[Boolean]("requested"))
    assert(nb.isNullAt(nb.fieldIndex("related_before")))
    assert(nb.getAs[String]("text") == (1 to 20).map(i => s"w$i").mkString(" "))
    // the window never crosses a field boundary: the conversation
    // field's chunks share the resource but are a different group
    assert(!m.keySet.exists(_.startsWith("a/c/")))
  }

  test("first/last paragraphs truncate the window like n_previous/n_next at the edges") {
    val out = Hydrate.paragraphs(corpus, Seq("a/t/body/0-20"),
      Hydration(neighbours = Some(Neighbours(before = 2, after = 2))))
      .collect()
    val m = byId(out)
    val target = m("a/t/body/0-20")
    assert(target.getAs[scala.collection.Seq[String]]("related_before").toSeq == Seq.empty)
    assert(target.getAs[scala.collection.Seq[String]]("related_after").toSeq ==
      Seq("a/t/body/20-40", "a/t/body/40-45"))
  }

  test("a paragraph both requested and neighbour-pulled keeps its requested hydration") {
    val out = Hydrate.paragraphs(corpus,
      Seq("a/t/body/0-20", "a/t/body/20-40"),
      Hydration(neighbours = Some(Neighbours(before = 1, after = 0))))
      .collect()
    val m = byId(out)
    assert(out.length == 2, "no duplicate rows for the overlap")
    // 0-20 is a neighbour of 20-40 AND requested → requested wins
    val r = m("a/t/body/0-20")
    assert(r.getAs[Boolean]("requested"))
    assert(r.getAs[scala.collection.Seq[String]]("related_before").toSeq == Seq.empty)
  }

  test("conversation splits order within their own split group") {
    val out = Hydrate.paragraphs(corpus, Seq("a/c/chat/0/0-20"),
      Hydration(neighbours = Some(Neighbours(before = 1, after = 1))))
      .collect()
    val m = byId(out)
    assert(m.keySet == Set("a/c/chat/0/0-20", "a/c/chat/0/20-25"))
    assert(m("a/c/chat/0/0-20").getAs[scala.collection.Seq[String]]("related_after").toSeq ==
      Seq("a/c/chat/0/20-25"))
    assert(m("a/c/chat/0/0-20").getAs[String]("field") == "a/c/chat")
  }

  test("text=false suppresses text; resourceTitle joins the synthesized title; empty request → empty frame") {
    val noText = Hydrate.paragraphs(corpus, Seq("a/t/body/0-20"),
      Hydration(text = false)).collect()
    assert(noText.head.isNullAt(noText.head.fieldIndex("text")))
    val titled = Hydrate.paragraphs(corpus, Seq("b/t/body/0-2"),
      Hydration(resourceTitle = true)).collect()
    assert(titled.head.getAs[String]("title") == "short doc")
    val empty = Hydrate.paragraphs(corpus, Seq("garbage"), Hydration())
    assert(empty.isEmpty)
    assert(empty.columns.contains("related_after"))
  }
}
