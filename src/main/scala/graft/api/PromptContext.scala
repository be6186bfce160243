package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The /ask prompt-context build with RAG strategies —
  * `search/search/chat/prompt.py`: the deterministic step between
  * retrieval and the LLM call that turns a find page into the ordered,
  * size-capped text-block map (`CappedPromptContext`) the prompt is
  * assembled from.
  *
  * INSERTION-ORDER MODEL (the endpoint's `PromptContextBuilder
  * ._build_context`, prompt.py:1199-1310): when a strategy is chosen,
  * every hit paragraph FIRST enters the context in relevance order
  * (prompt.py:1205-1208); the strategy then deletes blocks in place
  * and APPENDS its own blocks at the end (a dict: deletes keep the
  * rest in order, new keys append, re-setting an existing key keeps
  * its slot). Each strategy's shape under that model:
  *
  *  - [[Default]] — no strategy: just the hit paragraphs in relevance
  *    order (`default_prompt_context`, prompt.py:240-276; the
  *    conversation answer-expansion for semantic c-hits is
  *    [[ContextBuilder.conversationAnswerOrAfter]] — q130 — and
  *    composes on top);
  *  - [[FullResource]] — the hits of the top-`count` resources
  *    (first-appearance order) DELETE; those resources' whole-field
  *    texts append at the end; other resources' hits stay in place
  *    (`full_resource_prompt_context`, prompt.py:278-352);
  *  - [[Hierarchy]] — each resource's FIRST hit block is rewritten in
  *    place to the composed DOCUMENT/SUMMARY/RESOURCE CONTENT text;
  *    its other hits keep their plain blocks (the strategy clears only
  *    its copied list's texts — the pre-inserted context blocks remain,
  *    `hierarchy_prompt_context`, prompt.py:960-1067 under
  *    :1205-1208's pre-insertion);
  *  - [[FieldExtension]] — hit blocks belonging to a named field
  *    delete; the named fields of every hit resource append at the end
  *    in rid-order × spec-order (`field_extension_prompt_context`,
  *    prompt.py:577-625 — the code appends; its docstring's "beginning
  *    of the context" is stale);
  *  - [[Neighbouring]] — hits stay; their positional field neighbours
  *    append at the end in (hit, rank) walk order, skipping any id
  *    already present (`neighbouring_paragraphs_prompt_context`,
  *    prompt.py:672-767);
  *  - [[Conversational]] — hits stay; each conversation field's
  *    messages append at the end, walked per first-hit-of-field
  *    (prompt.py:803-958).
  *
  * The input page is a find RESPONSE — ≤ the find window (500) by
  * contract — so, exactly like the reference's in-memory
  * `ordered_paragraphs` list, it collects driver-side; all TEXT
  * hydration stays distributed (pruned scans via typed-In pushdown,
  * request-scoped joins).
  *
  * Documented divergences:
  *  - field extracted texts come from this store's field synthesis
  *    (t/body = the document text, a/title = the title synthesis;
  *    conversation fields are message-grain and not hydrated here);
  *  - [[Hierarchy]]'s `count` extends paragraphs by TOKENS (this
  *    store's span unit) where the reference extends by characters;
  *    its SUMMARY header is empty unless the corpus binds a summary
  *    column — same as a reference kb whose resources carry none;
  *  - [[FullResource]]'s `apply_to` label exclusions are not taken
  *    (this store's labels are corpus fixtures);
  *  - after the cap, `pos` renumbers contiguously (the reference
  *    returns a dict whose order is the same surviving sequence).
  */
object PromptContext {

  sealed trait Strategy
  /** prompt.py:240-276. */
  case object Default extends Strategy
  /** prompt.py:278-352 — `count` resources.
    * `includeRemainingTextBlocks` is carried for API parity but is a
    * NO-OP under the endpoint flow: the remaining hits were already
    * pre-inserted by _build_context and never deleted, and re-setting
    * an existing dict key keeps its slot (prompt.py:348-352 traced). */
  final case class FullResource(
      count: Int, includeRemainingTextBlocks: Boolean = false)
    extends Strategy
  /** prompt.py:960-1067 — `extraTokens` extends each hit's span tail. */
  final case class Hierarchy(extraTokens: Int = 0) extends Strategy
  /** prompt.py:577-625 — `fields` are `{type}/{id}` specs. */
  final case class FieldExtension(fields: Seq[String]) extends Strategy
  /** prompt.py:672-767. */
  final case class Neighbouring(before: Int, after: Int) extends Strategy
  /** prompt.py:803-958 — every hit enters in order; the FIRST hit of
    * each conversation field additionally pulls messages: the whole
    * conversation (`full`) or the first message + the deque window of
    * `maxMessages` around the hit's split. Message blocks key
    * `{rid}/c/{fid}/{ident}/0-{len}`. `attachments_text`/`images` are
    * not taken (this store holds no attachment refs). */
  final case class Conversational(
      full: Boolean = false, maxMessages: Int = 15) extends Strategy

  /** `MetadataExtensionStrategy` types
    * (`nucliadb_models/search.py:1283-1299`). */
  sealed trait MetadataType
  object MetadataType {
    case object Origin extends MetadataType
    case object ClassificationLabels extends MetadataType
    case object Ners extends MetadataType
    case object Extra extends MetadataType
  }

  /** The metadata-extension strategy
    * (`extend_prompt_context_with_metadata`, prompt.py:355-566) — the
    * one strategy that COMPOSES with any other: applied after the main
    * strategy and before the cap, it suffixes each block whose
    * resource/field carries the selected metadata. */
  final case class MetadataExtension(types: Set[MetadataType])

  /** The dictionary field-entity detection matches against:
    * `familyCol` groups the NERs rendering; absent, every entity
    * renders under the single family "entity". */
  final case class EntityNodes(
      nodes: DataFrame, valueCol: String, familyCol: Option[String] = None)

  /** Column bindings for props the [[Find.Corpus]] doesn't name. */
  final case class Bindings(
      summaryCol: Option[String] = None,
      originCol: Option[String] = None,
      extraCol: Option[String] = None,
      entityNodes: Option[EntityNodes] = None)

  /** Build the context for a find page. `hits` must carry
    * (paragraph_id, text, order) — the find response's paragraphs and
    * their relevance order. Returns (block_id, text, pos) in insertion
    * order after the [[cap]]. `bind.summaryCol` feeds [[Hierarchy]]'s
    * SUMMARY header; `metadata` composes the metadata-extension
    * strategy over the main strategy's blocks (the endpoint's own
    * composition, prompt.py:1244-1262 & 1301-1309). */
  def build(
      corpus: Find.Corpus,
      hits: DataFrame,
      strategy: Strategy = Default,
      maxSize: Option[Long] = None,
      bind: Bindings = Bindings(),
      conversations: Option[Augment.ConversationStore] = None,
      metadata: Option[MetadataExtension] = None): DataFrame = {
    val spark = corpus.docs.sparkSession
    // the reference's ordered_paragraphs is an in-memory list; a find
    // page is ≤ the 500-block window by contract
    val page: Seq[(String, String, Long)] = hits
      .select(col("paragraph_id").cast("string"),
        col("text").cast("string"),
        col("order").cast("long"))
      .orderBy(col("order").asc)
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val blocks = strategy match {
      case Default => defaultBlocks(spark, page)
      case s: FullResource => fullResourceBlocks(spark, corpus, page, s)
      case s: Hierarchy =>
        hierarchyBlocks(spark, corpus, page, s, bind.summaryCol)
      case s: FieldExtension => fieldExtensionBlocks(spark, corpus, page, s)
      case s: Neighbouring => neighbouringBlocks(spark, corpus, page, s)
      case s: Conversational =>
        conversationalBlocks(spark, page, s, conversations)
    }
    val extended = metadata match {
      case None => blocks
      case Some(m) => metadataExtended(blocks, corpus, page, m, bind)
    }
    cap(extended, maxSize)
  }

  /** `_clean_paragraph_text` (prompt.py:1327-1333): strip + drop
    * highlight marks — prompts never carry response markup. Python's
    * strip() trims ALL whitespace (Spark's trim() only spaces), so the
    * strip is a regex over both ends. */
  private def cleanText(c: Column): Column =
    regexp_replace(regexp_replace(c, "</?mark>", ""), "^\\s+|\\s+$", "")

  private def ridOf(pid: String): String = pid.takeWhile(_ != '/')

  /** Resources in first-appearance order over the page. */
  private def orderedRids(page: Seq[(String, String, Long)]): Seq[String] =
    page.map(t => ridOf(t._1)).distinct

  private def blocksDf(
      spark: SparkSession,
      rows: Seq[(String, String, Long)]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("block_id", StringType), StructField("text", StringType),
      StructField("__seq", LongType)))
    // a LOCAL relation (LocalTableScan), not parallelize: the page is
    // already driver-resident (≤ the 500-block find window), and an
    // RDD-backed frame turns every strategy's hit-block leg into its
    // own scan stage (round 18 — the localPage discipline)
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*),
      schema)
  }

  private def defaultBlocks(
      spark: SparkSession, page: Seq[(String, String, Long)]): DataFrame =
    blocksDf(spark, page.zipWithIndex.map { case ((pid, text, _), i) =>
      (pid, text, i.toLong)
    }).withColumn("text", cleanText(col("text")))

  /** The requested resources' field synthesis, pruned by typed-In
    * pushdown before any tokenizing (the [[graft.sources.Ingest
    * .fieldsTable]] convention: t/body = the document text, a/title =
    * the first-five-token title). */
  private def fieldBlocks(
      corpus: Find.Corpus, rids: Seq[String]): DataFrame = {
    val pruned = corpus.docs
      .where(Augment.ridPredicate(corpus.docs.schema, corpus.docId, rids))
    graft.sources.Ingest.fieldsTable(pruned, corpus.docId, corpus.text)
      .select(col(corpus.docId).cast("string").as("rid"),
        col("field_type"), col("field_id"), col("f_text"))
  }

  private def fullResourceBlocks(
      spark: SparkSession,
      corpus: Find.Corpus,
      page: Seq[(String, String, Long)],
      s: FullResource): DataFrame = {
    val kept = orderedRids(page).take(s.count)
    val keptSet = kept.toSet
    val ridRank = kept.zipWithIndex.toMap
    import spark.implicits._
    // pre-inserted hits of NON-hydrated resources stay in place; the
    // hydrated resources' hits delete (their field blocks replace them
    // at the END of the context)
    val hitRows = blocksDf(spark, page.zipWithIndex.collect {
      case ((pid, text, _), i) if !keptSet.contains(ridOf(pid)) =>
        (pid, text, i.toLong)
    }).withColumn("text", cleanText(col("text")))
    val rankDf = ridRank.toSeq.toDF("rid", "__rid_rank")
    // field order within a resource: t/body first, then a/title —
    // deterministic where the reference walks storage order
    val fieldRows = fieldBlocks(corpus, kept)
      .join(broadcast(rankDf), Seq("rid"))
      .select(
        concat_ws("/", col("rid"), col("field_type"), col("field_id"))
          .as("block_id"),
        col("f_text").as("text"),
        (col("__rid_rank") * 10 +
          when(col("field_type") === "t", 0).otherwise(1) + AppendBase)
          .cast("long").as("__seq"))
    hitRows.unionByName(fieldRows)
  }

  /** Strategy base offset: strategy-appended blocks land after every
    * pre-inserted hit slot. */
  private val AppendBase = 1000000L

  private def hierarchyBlocks(
      spark: SparkSession,
      corpus: Find.Corpus,
      page: Seq[(String, String, Long)],
      s: Hierarchy,
      summaryCol: Option[String]): DataFrame = {
    import spark.implicits._
    if (page.isEmpty) return blocksDf(spark, Nil)
    val rids = orderedRids(page)
    // parse each hit's span; non-parsing ids keep their stored text
    val hitsDf = page.zipWithIndex.map { case ((pid, text, _), i) =>
      val parts = pid.split("/")
      val span = parts.lastOption.flatMap { seg =>
        val m = "^(\\d+)-(\\d+)$".r.findFirstMatchIn(seg)
        m.map(g => (g.group(1).toInt, g.group(2).toInt))
      }
      (pid, ridOf(pid), text, span.map(_._1).getOrElse(-1),
        span.map(_._2).getOrElse(-1), i.toLong)
    }.toDF("pid", "rid", "text", "s", "e", "__hit_idx")
    val pruned = corpus.docs
      .where(Augment.ridPredicate(corpus.docs.schema, corpus.docId, rids))
    val toks = pruned.select(
      col(corpus.docId).cast("string").as("rid"),
      graft.functions.TextFunctions.tokens(col(corpus.text)).as("__t"),
      summaryCol.map(c => col(c).cast("string")).getOrElse(lit(""))
        .as("__summary"))
    // extended text: the stored span + extraTokens more (token grain —
    // the reference's extra CHARACTERS, in this store's span unit);
    // only t/body spans extend (other fields keep their hit text). The
    // doc join is LEFT: a hit whose resource is missing from the doc
    // store keeps its hit text and an empty title, like the
    // reference's get_paragraph_text-on-missing-field ""
    val isBody = col("pid").like("%/t/body/%")
    val ext = hitsDf.join(toks, Seq("rid"), "left")
      .withColumn("__ext",
        when(isBody && col("s") >= 0 && col("__t").isNotNull,
          concat_ws(" ", slice(col("__t"), col("s") + 1,
            col("e") - col("s") + lit(s.extraTokens max 0))))
          .otherwise(col("text")))
      .withColumn("__title",
        coalesce(concat_ws(" ", slice(col("__t"), 1, 5)), lit("")))
      .withColumn("__summary", coalesce(col("__summary"), lit("")))
    // one composed block per resource, anchored at its FIRST hit; the
    // per-resource part list sorts by hit order explicitly (struct
    // array_sort — no reliance on window evaluation order)
    val withPart = ext.withColumn("__part",
      concat(lit("\n EXTRACTED BLOCK: \n "), col("__ext"), lit(" \n\n ")))
    val partsAgg = withPart.groupBy("rid").agg(
      array_join(transform(
        array_sort(collect_list(struct(col("__hit_idx"), col("__part")))),
        x => x.getField("__part")), "").as("__twh"),
      min(col("__hit_idx")).as("__first_idx"))
    val composed = withPart
      .join(partsAgg, Seq("rid"))
      .where(col("__hit_idx") === col("__first_idx"))
      .select(col("pid").as("block_id"),
        cleanText(concat(lit("DOCUMENT: "), col("__title"),
          lit(" \n SUMMARY: "), col("__summary"),
          lit(" \n RESOURCE CONTENT: "), col("__twh"))).as("text"),
        col("__hit_idx").as("__seq"))
    // the resource's OTHER hits keep their pre-inserted plain blocks
    // in place: the strategy clears only its deep-copied list's texts,
    // never the context entries _build_context inserted
    val firstIdx = page.zipWithIndex
      .groupBy { case ((pid, _, _), _) => ridOf(pid) }
      .map { case (_, xs) => xs.map(_._2).min }.toSet
    val plain = blocksDf(spark, page.zipWithIndex.collect {
      case ((pid, text, _), i) if !firstIdx.contains(i) =>
        (pid, text, i.toLong)
    }).withColumn("text", cleanText(col("text")))
    composed.unionByName(plain)
  }

  private def fieldExtensionBlocks(
      spark: SparkSession,
      corpus: Find.Corpus,
      page: Seq[(String, String, Long)],
      s: FieldExtension): DataFrame = {
    import spark.implicits._
    val rids = orderedRids(page)
    val ridRank = rids.zipWithIndex.toMap
    // rid order × field-spec order (get_matching_field_ids walks
    // resources outer, specs inner)
    val specRank = s.fields.map(_.stripPrefix("/").stripSuffix("/"))
      .zipWithIndex.toMap
    val rankDf = ridRank.toSeq.toDF("rid", "__rid_rank")
    val specDf = specRank.toSeq.map { case (spec, r) =>
      val parts = spec.split("/")
      (parts(0), if (parts.length > 1) parts(1) else "", r)
    }.toDF("field_type", "field_id", "__spec_rank")
    val fieldRows = fieldBlocks(corpus, rids)
      .join(broadcast(rankDf), Seq("rid"))
      .join(broadcast(specDf), Seq("field_type", "field_id"))
      .select(
        concat_ws("/", col("rid"), col("field_type"), col("field_id"))
          .as("block_id"),
        col("f_text").as("text"),
        (col("__rid_rank") * 100 + col("__spec_rank") + AppendBase)
          .cast("long").as("__seq"))
    // pre-inserted hits stay in place UNLESS they belong to a named
    // extension field (those delete — the field block replaces them at
    // the end, prompt.py:608-613); the final re-add loop
    // (prompt.py:622-625) is a no-op on keys already present
    val specSet = specRank.keySet
    val para = blocksDf(spark, page.zipWithIndex.collect {
      case ((pid, text, _), i)
          if !specSet.contains(pid.split("/").drop(1).take(2).mkString("/")) =>
        (pid, text, i.toLong)
    }).withColumn("text", cleanText(col("text")))
    para.unionByName(fieldRows)
  }

  private def neighbouringBlocks(
      spark: SparkSession,
      corpus: Find.Corpus,
      page: Seq[(String, String, Long)],
      s: Neighbouring): DataFrame = {
    import spark.implicits._
    if (page.isEmpty) return blocksDf(spark, Nil)
    val ix = corpus.index.getOrElse(throw new IllegalArgumentException(
      "neighbouring strategy needs a bound index"))
    // the at-rest paragraph rows of the hit fields, ranked in span
    // order — the SHARED /hydrate group recipe
    // ([[Hydrate.rankedFieldParagraphs]]: request-sized group set →
    // broadcast-able IN prunes the scan before the window)
    val groups = page.map(t => t._1.substring(0,
      t._1.lastIndexOf('/') max 0)).filter(_.nonEmpty).distinct
    val ranked = Hydrate.rankedFieldParagraphs(ix, groups)
    val hitsDf = page.zipWithIndex.map { case ((pid, _, _), i) =>
      (pid, i.toLong)
    }.toDF("__hit_pid", "__hit_idx")
    val anchors = ranked.join(hitsDf, col("__pid") === col("__hit_pid"))
      .select(col("__hit_pid"), col("__hit_idx"), col("__grp").as("__agrp"),
        col("__rank").as("__arank"))
    // pre-inserted hit blocks stay in their relevance slots (the
    // strategy's own self-add is a no-op on present keys); neighbours
    // append at the END in (hit, rank) walk order, skipping ids that
    // are hits themselves (retrieved_paragraphs_ids check)
    val hitRows = blocksDf(spark, page.zipWithIndex.map {
      case ((pid, text, _), i) => (pid, text, i.toLong)
    }).withColumn("text", cleanText(col("text")))
    val hitIds = page.map(_._1).toSet
    val nbRows = ranked.join(anchors,
        col("__grp") === col("__agrp") &&
          col("__rank") =!= col("__arank") &&
          col("__rank") >= col("__arank") - s.before &&
          col("__rank") <= col("__arank") + s.after)
      .where(!col("__pid").isInCollection(hitIds) &&
        length(col("__txt")) > 0)
      .select(col("__pid").as("block_id"), col("__txt").as("text"),
        (col("__hit_idx") * 1000 + 1 + col("__rank") - col("__arank") +
          lit(s.before) + AppendBase).cast("long").as("__seq"))
    // keep-first dedup among neighbours (dict insertion: an
    // already-present block never re-inserts)
    dedupKeepFirst(hitRows.unionByName(nbRows))
  }

  /** `conversation_prompt_context` (prompt.py:803-958): every hit
    * block in order; the first hit of each conversation field expands
    * to message blocks — the WHOLE conversation (`full`) or the first
    * message plus the deque window of `maxMessages` ending
    * (n−1)/2 past the hit's split (the same window semantics as
    * [[Augment]]'s maxConversationMessages, prompt.py:893-907); blocks
    * already in the context never re-insert. */
  private def conversationalBlocks(
      spark: SparkSession,
      page: Seq[(String, String, Long)],
      s: Conversational,
      conversations: Option[Augment.ConversationStore]): DataFrame = {
    import spark.implicits._
    val hitBlocks = blocksDf(spark,
      page.zipWithIndex.map { case ((pid, text, _), i) =>
        (pid, text, i.toLong)
      }).withColumn("text", cleanText(col("text")))
    val cs = conversations match {
      case None => return dedupKeepFirst(hitBlocks)
      case Some(c) => c
    }
    // conversation hits ({rid}/c/{fid}/{mident}/...), field-dedup'd on
    // FIRST appearance (analyzed_fields, prompt.py:829-832)
    val cHits = page.zipWithIndex.flatMap { case ((pid, _, _), i) =>
      pid.split("/") match {
        case Array(rid, "c", fid, mident, _*) => Some((rid, fid, mident, i))
        case _ => None
      }
    }.groupBy(t => (t._1, t._2)).values.map(_.minBy(_._4)).toSeq
      .sortBy(_._4)
    if (cHits.isEmpty) return dedupKeepFirst(hitBlocks)

    val rids = cHits.map(_._1).distinct
    val ranked = cs.df
      .where(Augment.ridPredicate(cs.df.schema, cs.ridCol, rids))
      .select(col(cs.ridCol).cast("string").as("rid"),
        col(cs.fieldCol).cast("string").as("fid"),
        col(cs.splitCol).cast("string").as("split"),
        col(cs.textCol).cast("string").as("mtext"))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("rid"), col("fid"))
          // try_cast: non-numeric idents order after numeric ones
          // instead of throwing under ANSI cast
          .orderBy(col("split").try_cast("int").asc_nulls_last,
            col("split").asc)))
    // message blocks key the WHOLE-message span `{rid}/c/{fid}/{split}
    // /0-{len}` (prompt.py:858,880,914). The reference's len is
    // CHARACTERS of its char-offset extracted text; this store's span
    // unit is TOKENS, so the id uses the message's token count — the
    // same unit as the at-rest conversation paragraph ids, so a hit
    // covering the whole message dedups exactly like the reference's
    val msgBlock = concat(col("rid"), lit("/c/"), col("fid"), lit("/"),
      col("split"), lit("/0-"),
      size(graft.functions.TextFunctions.tokens(col("mtext"))))
    val anchorsDf = cHits.map { case (r, f, m, i) => (r, f, m, i.toLong) }
      .toDF("rid", "fid", "__mident", "__hit_idx")

    val msgRows =
      if (s.full) ranked.join(broadcast(anchorsDf), Seq("rid", "fid"))
        .select(msgBlock.as("block_id"),
          cleanText(col("mtext")).as("text"),
          (col("__hit_idx") * 10000 + 1 + col("__rank") + AppendBase)
            .cast("long").as("__seq"))
      else {
        // ONE pass (round 19, VERDICT r18 #2 — the q164 fusion shape):
        // anchorsDf carries one anchor per conversation (first-hit
        // field dedup above), so the broadcast join never multiplies
        // rows; the anchor's rank and the conversation length are
        // window aggregates over the SAME (rid, fid) clustering as the
        // ranking window (no second exchange, no maxRanks groupBy),
        // and a row emits its first-message and/or windowed sequence
        // slots via one array explode — a rank-1 message inside the
        // window yields both slots, exactly the former union's rows.
        val wConv = Window.partitionBy(col("rid"), col("fid"))
        val half = ((s.maxMessages - 1) / 2).toLong
        val fused = ranked
          .withColumn("__max_rank", max(col("__rank")).over(wConv))
          .join(broadcast(anchorsDf), Seq("rid", "fid"))
          .withColumn("__arank",
            max(when(col("split") === col("__mident"), col("__rank")))
              .over(Window.partitionBy(col("rid"), col("fid"),
                col("__mident"), col("__hit_idx"))))
          .withColumn("__end",
            least(coalesce(col("__arank") + half, col("__max_rank")),
              col("__max_rank")).cast("int"))
        val firstSeq = when(col("__rank") === 1,
          (col("__hit_idx") * 10000 + 1 + AppendBase).cast("long"))
        val winSeq = when(
          col("__rank") > col("__end") - s.maxMessages &&
            col("__rank") <= col("__end"),
          (col("__hit_idx") * 10000 + 100 + col("__rank") + AppendBase)
            .cast("long"))
        fused.select(msgBlock.as("block_id"),
            cleanText(col("mtext")).as("text"),
            explode(filter(array(firstSeq, winSeq), x => x.isNotNull))
              .as("__seq"))
      }
    dedupKeepFirst(hitBlocks.unionByName(msgRows))
  }

  /** Dict insertion semantics: a block id already present never
    * re-inserts — keep the earliest sequence slot's text (min-by on
    * the (seq, text) struct, not first(), which is order-dependent). */
  private def dedupKeepFirst(blocks: DataFrame): DataFrame =
    blocks.groupBy(col("block_id"))
      .agg(min(struct(col("__seq"), col("text"))).as("__m"))
      .select(col("block_id"), col("__m").getField("text").as("text"),
        col("__m").getField("__seq").as("__seq"))

  /** `extend_prompt_context_with_metadata` (prompt.py:355-566): each
    * selected type walks the context's blocks in their pre-extension
    * order and, for blocks whose resource/field carries that metadata,
    * POPS and RE-APPENDS the block with the suffix added — so a block
    * extended by a later pass moves behind blocks only touched by
    * earlier ones. Closed form: suffixes concatenate in the fixed pass
    * order (origin → labels → ners → extra, the if-chain at
    * prompt.py:374-393) and the new sequence is (index of the LAST
    * pass that touched the block, original position).
    *
    * Rendering divergences, documented: origin/extra dump the ONE
    * bound column as a single-key yaml line (the reference dumps its
    * Origin/Extra models — same shape for a store with one set
    * field); label lines sort (the reference iterates a Python set —
    * unordered); NERs are DETECTED against the bound dictionary like
    * q163, families sorted, where the reference reads stored per-field
    * entities in dict-insertion order. */
  private def metadataExtended(
      blocks: DataFrame,
      corpus: Find.Corpus,
      page: Seq[(String, String, Long)],
      m: MetadataExtension,
      bind: Bindings): DataFrame = {
    import MetadataType._
    val rids = orderedRids(page)
    if (rids.isEmpty) return blocks
    val ordered = blocks
      .withColumn("__pos0", row_number().over(
        Window.partitionBy(graft.operators.TopK.constPartitionKey(
          col("block_id"))).orderBy(col("__seq").asc, col("block_id").asc)))
      .withColumn("__parts", split(col("block_id"), "/"))
      // USER_CONTEXT-style unparseable ids skip extension entirely
      // (parse_text_block_id ValueError, prompt.py:364-370)
      .withColumn("__rid",
        when(size(col("__parts")) >= 3, col("__parts").getItem(0)))
      .withColumn("__ftype", col("__parts").getItem(1))
      .withColumn("__fid", col("__parts").getItem(2))
    val pruned = corpus.docs
      .where(Augment.ridPredicate(corpus.docs.schema, corpus.docId, rids))

    def docCol(name: String): Option[DataFrame] =
      if (!corpus.docs.schema.fieldNames.contains(name)) None
      else Some(pruned.select(col(corpus.docId).cast("string").as("__rid"),
        col(name).as("__v")))

    var out = ordered
    // ORIGIN (prompt.py:407-436): yaml of the bound origin column
    if (m.types.contains(Origin) && bind.originCol.isDefined)
      out = docCol(bind.originCol.get) match {
        case None => out
        case Some(d) => out.join(
          d.select(col("__rid"),
            concat(lit("\n\nDOCUMENT METADATA AT ORIGIN:\nsource_id: "),
              col("__v").cast("string"), lit("\n")).as("__sfx_origin")),
          Seq("__rid"), "left")
      }
    if (!out.columns.contains("__sfx_origin"))
      out = out.withColumn("__sfx_origin", lit(null).cast("string"))
    // CLASSIFICATION LABELS (prompt.py:439-482): resource labels as
    // " - {label} ({labelset})" lines, facet paths split leaf/parent
    if (m.types.contains(ClassificationLabels)) {
      val b = corpus.filterBindings
      out = docCol(b.labelsCol) match {
        case None => out
        case Some(d) => out.join(
          d.select(col("__rid"),
            when(size(col("__v")) > 0,
              concat(lit("\n\nDOCUMENT CLASSIFICATION LABELS:"),
                array_join(sort_array(transform(col("__v"), l => {
                  val leaf = element_at(split(l, "/"), -1)
                  val parent = l.substr(lit(1),
                    greatest(length(l) - length(leaf) - 1, lit(0))
                      .cast("int"))
                  concat(lit("\n - "), leaf, lit(" ("), parent, lit(")"))
                })), ""))).as("__sfx_labels")),
          Seq("__rid"), "left")
      }
    }
    if (!out.columns.contains("__sfx_labels"))
      out = out.withColumn("__sfx_labels", lit(null).cast("string"))
    // NERS (prompt.py:485-532): detected per FIELD against the bound
    // dictionary, grouped by family
    if (m.types.contains(Ners) && bind.entityNodes.isDefined) {
      val en = bind.entityNodes.get
      // the SHARED whole-token detection join (Augment.entityMatchRows
      // — one matching convention for /augment entities and this pass)
      val ners = Augment.entityMatchRows(fieldBlocks(corpus, rids),
          en.nodes, en.valueCol, en.familyCol)
        .select(col("rid").as("__rid"), col("field_type").as("__ftype"),
          col("field_id").as("__fid"), col("__entity"), col("__family"))
        .groupBy(col("__rid"), col("__ftype"), col("__fid"), col("__family"))
        .agg(concat(lit("\n - "), col("__family"), lit(":"),
          array_join(transform(sort_array(collect_set(col("__entity"))),
            t => concat(lit("\n   - "), t)), "")).as("__fam_line"))
        .groupBy(col("__rid"), col("__ftype"), col("__fid"))
        .agg(concat(lit("\n\nDOCUMENT NAMED ENTITIES (NERs):"),
          array_join(sort_array(collect_list(col("__fam_line"))), ""))
          .as("__sfx_ners"))
      out = out.join(ners, Seq("__rid", "__ftype", "__fid"), "left")
    }
    if (!out.columns.contains("__sfx_ners"))
      out = out.withColumn("__sfx_ners", lit(null).cast("string"))
    // EXTRA (prompt.py:535-566)
    if (m.types.contains(Extra) && bind.extraCol.isDefined)
      out = docCol(bind.extraCol.get) match {
        case None => out
        case Some(d) => out.join(
          d.select(col("__rid"),
            concat(lit("\n\nDOCUMENT EXTRA METADATA:\n"),
              col("__v").cast("string"), lit("\n")).as("__sfx_extra")),
          Seq("__rid"), "left")
      }
    if (!out.columns.contains("__sfx_extra"))
      out = out.withColumn("__sfx_extra", lit(null).cast("string"))

    val passes = Seq(col("__sfx_origin"), col("__sfx_labels"),
      col("__sfx_ners"), col("__sfx_extra"))
    val lastIdx = passes.zipWithIndex.map { case (c, i) =>
      when(c.isNotNull, lit(i + 1)).otherwise(lit(0))
    }.reduce((a, b) => greatest(a, b))
    out
      .withColumn("text", concat(col("text") +:
        passes.map(c => coalesce(c, lit(""))): _*))
      .select(col("block_id"), col("text"),
        (lastIdx.cast("long") * 100000000L + col("__pos0")).as("__seq"))
  }

  /** `CappedPromptContext.cap` (prompt.py:132-161): walk blocks in
    * REVERSE insertion order while the total character size exceeds
    * `maxSize` — a block whose removal still leaves the total at or
    * above the cap drops whole; the boundary block trims its tail to
    * fit. Closed form over the insertion-order running sum: with
    * P(k) = Σ len(text₁..textₖ), block k keeps fully when P(k) ≤ max,
    * trims to (max − P(k−1)) chars when P(k−1) < max, drops otherwise. */
  private def cap(blocks: DataFrame, maxSize: Option[Long]): DataFrame = {
    val ordered = blocks
      .withColumn("pos", row_number().over(
        Window.partitionBy(graft.operators.TopK.constPartitionKey(
          col("block_id"))).orderBy(col("__seq").asc, col("block_id").asc)))
    maxSize match {
      case None => ordered.select(col("block_id"), col("text"), col("pos"))
        .orderBy(col("pos"))
      case Some(max) =>
        val w = Window.partitionBy(graft.operators.TopK.constPartitionKey(
            col("block_id")))
          .orderBy(col("pos").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ordered
          .withColumn("__p", sum(length(col("text")).cast("long")).over(w))
          .withColumn("__p0", col("__p") - length(col("text")))
          .where(col("__p") <= max || col("__p0") < max)
          .withColumn("text",
            when(col("__p") <= max, col("text"))
              .otherwise(col("text").substr(lit(1),
                (lit(max) - col("__p0")).cast("int"))))
          .withColumn("pos", row_number().over(
            Window.partitionBy(graft.operators.TopK.constPartitionKey(
              col("block_id"))).orderBy(col("pos").asc)))
          .select(col("block_id"), col("text"), col("pos"))
          .orderBy(col("pos"))
    }
  }
}
