package graft

import graft.api.{Augment, Find}
import graft.api.Augment._
import graft.api.Find.Corpus

/** Behavior tests for the `/augment` endpoint
  * (`search/api/v1/augment.py`, `search/augmentor/`). */
class AugmentSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("a", "alpha beta gamma delta epsilon zeta eta", "sum-a", "srcA",
      Seq("/l/red", "/l/red/dark"), Seq("g1")),
    ("b", "red widget spec and blue bolt notes", "sum-b", "srcB",
      Seq("/l/blue"), Seq.empty[String]),
    ("c", "plain doc", null.asInstanceOf[String], "srcC",
      Seq.empty[String], Seq.empty[String]))
    .toDF("rid", "text", "summary", "source", "labels", "security_groups")

  // conversation with 6 messages; split "10" pins numeric ordering
  private val convs = Seq(
    ("a", "chat", "0", "QUESTION", "how fast is the scan"),
    ("a", "chat", "1", "OTHER", "let me check"),
    ("a", "chat", "2", "ANSWER", "sixty rows per tick"),
    ("a", "chat", "3", "OTHER", "thanks"),
    ("a", "chat", "4", "OTHER", "anytime"),
    ("a", "chat", "10", "OTHER", "postscript"))
    .toDF("rid", "field_id", "split", "mtype", "mtext")
  private val store = ConversationStore(convs, "rid", "field_id", "split",
    "mtext", mtypeCol = Some("mtype"))

  private val entities = Seq("red widget", "blue bolt", "green gear")
    .toDF("value")
  private val bindings = Bindings(summaryCol = Some("summary"),
    originCol = Some("source"), entityNodes = Some((entities, "value")))

  private val corpus = Corpus(docs, "rid", "text")

  private def messages(req: AugmentRequest) =
    Augment.augment(corpus, req, Some(store)).messages
      .orderBy($"rid", $"field_id", $"split".cast("int")).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[String]("mtext")))

  test("resource props: selected columns fill, unknown rids skip, per-entry prop merge") {
    val out = Augment.augment(corpus, AugmentRequest(resources = Seq(
        ResourceAugment(given = Seq("a", "zzz"), title = true,
          classificationLabels = true),
        ResourceAugment(given = Seq("a", "b"), summary = true,
          security = true, origin = true))),
      bind = bindings).resources.orderBy("rid").collect()
    assert(out.map(_.getAs[String]("rid")).toSeq == Seq("a", "b"))
    val a = out(0)
    // entry 1 gave title+labels, entry 2 gave summary/security/origin —
    // the rid gets the union (augmentor.py per-rid select merge)
    assert(a.getAs[String]("title") == "alpha beta gamma delta epsilon")
    assert(a.getAs[scala.collection.Seq[String]]("labels").toSeq ==
      Seq("/l/red", "/l/red/dark"))
    assert(a.getAs[String]("summary") == "sum-a")
    assert(a.getAs[scala.collection.Seq[String]]("security").toSeq == Seq("g1"))
    assert(a.getAs[String]("origin") == "srcA")
    val b = out(1)
    assert(b.getAs[String]("title") == null) // b was only in entry 2
    assert(b.getAs[String]("summary") == "sum-b")
  }

  test("field text + labels + detected entities; invalid/unknown field ids skip") {
    val out = Augment.augment(corpus, AugmentRequest(fields = Seq(
        FieldAugment(given = Seq("b/t/body", "b/a/title", "zzz/t/body",
          "b/t/nosuch", "garbage"), text = true, classificationLabels = true,
          entities = true))),
      bind = bindings).fields
      .orderBy("rid", "field_type", "field_id").collect()
    assert(out.map(r => (r.getAs[String]("field_type"),
      r.getAs[String]("field_id"))).toSeq == Seq(("a", "title"), ("t", "body")))
    val body = out(1)
    assert(body.getAs[String]("text") == "red widget spec and blue bolt notes")
    assert(body.getAs[scala.collection.Seq[String]]("labels").toSeq ==
      Seq("/l/blue"))
    assert(body.getAs[scala.collection.Seq[String]]("entities").toSeq ==
      Seq("blue bolt", "red widget")) // sorted; green gear absent
    val title = out(0)
    assert(title.getAs[String]("text") == "red widget spec and blue")
  }

  test("nested resource fields augment expands to the resource's fields with a type filter") {
    val out = Augment.augment(corpus, AugmentRequest(resources = Seq(
        ResourceAugment(given = Seq("a"), fieldsText = true,
          fieldTypeFilter = Seq("t")))),
      Some(store), bindings).fields.collect()
    assert(out.map(r => (r.getAs[String]("field_type"),
      r.getAs[String]("field_id"))).toSeq == Seq(("t", "body")))
    assert(out.head.getAs[String]("text") ==
      "alpha beta gamma delta epsilon zeta eta")
  }

  test("conversation fields ride the fields frame with null text; messages carry the content") {
    val res = Augment.augment(corpus, AugmentRequest(fields = Seq(
        FieldAugment(given = Seq("a/c/chat"), text = true))),
      Some(store), bindings)
    val f = res.fields.collect()
    assert(f.map(r => (r.getAs[String]("field_type"),
      r.getAs[String]("field_id"))).toSeq == Seq(("c", "chat")))
    assert(f.head.getAs[String]("text") == null)
    // text on a split-less conversation id = FULL conversation
    // (fields.py:289-299), numerically ordered (10 after 4)
    val m = res.messages.orderBy($"split".cast("int")).collect()
      .map(_.getAs[String]("split")).toSeq
    assert(m == Seq("0", "1", "2", "3", "4", "10"))
  }

  test("text on a split-bearing conversation id selects that single message") {
    assert(messages(AugmentRequest(fields = Seq(
      FieldAugment(given = Seq("a/c/chat/2"), text = true)))).toSeq ==
      Seq(("2", "sixty rows per tick")))
  }

  test("maxConversationMessages: first message plus the window ending (n-1)/2 past the anchor") {
    // anchor split 3, size 3 → window ends at rank(3)+1 = split 4,
    // spans splits {2,3,4}; plus the FIRST message (split 0)
    assert(messages(AugmentRequest(fields = Seq(
      FieldAugment(given = Seq("a/c/chat/3"),
        maxConversationMessages = Some(3))))).map(_._1).toSeq ==
      Seq("0", "2", "3", "4"))
  }

  test("window with a missing anchor yields the conversation tail (deque semantics)") {
    assert(messages(AugmentRequest(fields = Seq(
      FieldAugment(given = Seq("a/c/chat/99"),
        maxConversationMessages = Some(2))))).map(_._1).toSeq ==
      Seq("0", "4", "10")) // first + last-2 tail
  }

  test("split-less id with maxConversationMessages returns only the first message") {
    assert(messages(AugmentRequest(fields = Seq(
      FieldAugment(given = Seq("a/c/chat"),
        maxConversationMessages = Some(3))))).map(_._1).toSeq == Seq("0"))
  }

  test("answer-or-after: QUESTION anchor pulls the first later ANSWER only") {
    assert(messages(AugmentRequest(fields = Seq(
      FieldAugment(given = Seq("a/c/chat/0"),
        conversationAnswerOrAfter = true)))).toSeq ==
      Seq(("2", "sixty rows per tick")))
  }

  test("answer-or-after: non-question anchor expands to the following messages") {
    assert(messages(AugmentRequest(fields = Seq(
      FieldAugment(given = Seq("a/c/chat/3"),
        conversationAnswerOrAfter = true)))).map(_._1).toSeq ==
      Seq("4", "10"))
  }

  test("selected messages dedup across selectors (the (page,index)-keyed merge)") {
    // full + window both select split 2; it appears once
    val m = messages(AugmentRequest(fields = Seq(
      FieldAugment(given = Seq("a/c/chat/2"), text = true,
        fullConversation = true))))
    assert(m.map(_._1).toSeq == Seq("0", "1", "2", "3", "4", "10"))
  }

  test("answer-or-after is rank-based: zero-padded and non-numeric split idents resolve") {
    val convs2 = Seq(
      ("z", "chat", "00", "QUESTION", "q"),
      ("z", "chat", "01", "OTHER", "noise"),
      ("z", "chat", "02", "ANSWER", "ans"),
      ("z", "intro", "first", "OTHER", "hello"),
      ("z", "intro", "second", "OTHER", "world"))
      .toDF("rid", "field_id", "split", "mtype", "mtext")
    val st = ConversationStore(convs2, "rid", "field_id", "split", "mtext",
      mtypeCol = Some("mtype"))
    val m = Augment.augment(corpus, AugmentRequest(fields = Seq(
        FieldAugment(given = Seq("z/c/chat/00"),
          conversationAnswerOrAfter = true))),
      Some(st)).messages.collect()
    assert(m.map(r => (r.getAs[String]("split"),
      r.getAs[String]("mtext"))).toSeq == Seq(("02", "ans")))
    // fully non-numeric idents order lexicographically after numerics
    // (the splitConversationParagraphs convention) and still expand
    val m2 = Augment.augment(corpus, AugmentRequest(fields = Seq(
        FieldAugment(given = Seq("z/c/intro/first"),
          conversationAnswerOrAfter = true))),
      Some(st)).messages.collect()
    assert(m2.map(_.getAs[String]("mtext")).toSeq == Seq("world"))
  }

  test("no conversation store: conversation selectors yield an empty messages frame") {
    val res = Augment.augment(corpus, AugmentRequest(fields = Seq(
      FieldAugment(given = Seq("a/c/chat"), fullConversation = true))))
    assert(res.messages.count() == 0)
  }

  test("empty request: all four frames empty with stable schemas") {
    val res = Augment.augment(corpus, AugmentRequest())
    assert(res.resources.count() == 0)
    assert(res.fields.count() == 0)
    assert(res.messages.count() == 0)
    assert(res.paragraphs.count() == 0)
    assert(res.resources.columns.toSeq ==
      Seq("rid", "title", "summary", "labels", "security", "origin"))
    assert(res.paragraphs.columns.contains("related_before"))
  }
}
