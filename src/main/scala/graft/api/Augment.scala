package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The internal data-augmentation endpoint — `POST /kb/{kbid}/augment`
  * (`search/api/v1/augment.py:99-161`, `search/augmentor/augmentor.py`,
  * `nucliadb_models/augment.py:59-258`): given typed id sets
  * (resources, fields, paragraphs) and per-kind prop selections,
  * return the selected stored content — the building block the /ask
  * prompt assembly and ingestion agents hydrate context with.
  *
  * The request surface mirrors `AugmentRequest`: a list of resource
  * augments (title/summary/classification labels/security/origin plus
  * a nested all-fields augment), field augments (extracted text,
  * labels, detected entities, and the conversation selectors: full
  * conversation, first-message + centered window, answer-or-after),
  * and paragraph augments (text + positional neighbours). Unknown or
  * invalid ids skip silently, never error (`augmentor/fields.py:84-95`
  * returns None for missing resources/fields; the response simply
  * omits them).
  *
  * Spark shape: every `given` list is request-sized by construction,
  * so each kind resolves as ONE pruned scan — the id set becomes an
  * `isInCollection` predicate (broadcast-able IN) on the doc store /
  * field synthesis / conversation table, and all later joins are
  * request-scoped. Per-conversation windows partition on the field
  * key (bounded by one conversation's length, never the corpus); the
  * entity-detection join broadcasts the dictionary-scale entity table
  * against the handful of requested field texts.
  *
  * Documented divergences, all deliberate:
  *  - the response is four flat DataFrames (resources / fields /
  *    conversation messages / paragraphs) instead of nested pydantic
  *    maps — the relational rendering of the same payload, with
  *    conversation messages long-form (a row per selected message)
  *    rather than a list inside each field;
  *  - field classification labels serve the RESOURCE's labels: this
  *    store keeps labels at resource grain, where the reference merges
  *    per-field computed labels (`fields.py:497-520`);
  *  - field entities are DETECTED against the bound entity dictionary
  *    (whole-token containment, the q92 values-in-text contract)
  *    instead of read from stored per-field extracted metadata — same
  *    fixture-isolation bound as query-side NER;
  *  - multiple paragraph augments merge to one effective hydration
  *    (union of ids, OR of text, max of neighbour radii) — equivalent
  *    to the reference's per-id prop-union merge when entries don't
  *    overlap, simpler when they do;
  *  - file thumbnails / paragraph images / attachments are not taken:
  *    binary blob serving is out of this engine's scope (SURVEY §2.1).
  */
object Augment {

  /** The conversation store at MESSAGE grain — augment reads messages
    * from resource data (the reference reads maindb,
    * `fields.py:300-310`), not from the chunked paragraph index.
    * `mtypeCol` carries the reference's Message.type (QUESTION/ANSWER/
    * OTHER) used by answer-or-after; absent means no message is a
    * QUESTION (every hit expands to messages-after). */
  final case class ConversationStore(
      df: DataFrame,
      ridCol: String,
      fieldCol: String,
      splitCol: String,
      textCol: String,
      mtypeCol: Option[String] = None)

  /** Column bindings for props the [[Find.Corpus]] doesn't name:
    * summary/origin doc columns and the entity dictionary
    * (`nodes`, value column) field-entity detection matches against. */
  final case class Bindings(
      summaryCol: Option[String] = None,
      originCol: Option[String] = None,
      entityNodes: Option[(DataFrame, String)] = None)

  /** `AugmentResources` (`nucliadb_models/augment.py:66-92`) — the
    * deep-show slice this store carries (origin/security) plus the
    * select props and the nested all-fields augment
    * (`augment.py:166-190` parse_first_augments resources branch). */
  final case class ResourceAugment(
      given: Seq[String],
      title: Boolean = false,
      summary: Boolean = false,
      classificationLabels: Boolean = false,
      security: Boolean = false,
      origin: Boolean = false,
      fieldsText: Boolean = false,
      fieldsClassificationLabels: Boolean = false,
      fieldTypeFilter: Seq[String] = Nil)

  /** `AugmentFields` (`nucliadb_models/augment.py:161-195`). Given ids
    * are `{rid}/{type}/{id}` or `{rid}/c/{id}/{split}` (the split
    * anchors the conversation selectors). */
  final case class FieldAugment(
      given: Seq[String],
      text: Boolean = false,
      classificationLabels: Boolean = false,
      entities: Boolean = false,
      fullConversation: Boolean = false,
      maxConversationMessages: Option[Int] = None,
      conversationAnswerOrAfter: Boolean = false)

  /** `AugmentParagraphs` (`nucliadb_models/augment.py:226-237`). */
  final case class ParagraphAugment(
      given: Seq[String],
      text: Boolean = true,
      neighboursBefore: Int = 0,
      neighboursAfter: Int = 0)

  final case class AugmentRequest(
      resources: Seq[ResourceAugment] = Nil,
      fields: Seq[FieldAugment] = Nil,
      paragraphs: Seq[ParagraphAugment] = Nil)

  /** The flat rendering of `AugmentResponse`:
    *  - `resources`: (rid, title, summary, labels, security, origin) —
    *    a row per given resource found, unselected props null;
    *  - `fields`: (rid, field_type, field_id, text, labels, entities)
    *    — conversation fields carry null text here (their text lives
    *    in `messages`, like the reference's AugmentedConversationField);
    *  - `messages`: (rid, field_id, split, mtext) — the distinct
    *    selected conversation messages in split order;
    *  - `paragraphs`: the [[Hydrate.paragraphs]] shape. */
  final case class Augmented(
      resources: DataFrame,
      fields: DataFrame,
      messages: DataFrame,
      paragraphs: DataFrame)

  /** How many messages answer-or-after pulls when the anchor is not a
    * question (`fields.py:66-68` CONVERSATION_MESSAGE_CONTEXT_EXPANSION). */
  val MessageContextExpansion = 15

  /** A pushdown-friendly id-set predicate: the request's STRING rids
    * convert to the id column's type driver-side, so the IN reaches
    * the parquet scan as `PushedFilters: In(doc_id, ...)` — a cast on
    * the COLUMN side would block pushdown and read the full store at
    * 100 TB. Ids that don't convert (the reference's invalid-id skip)
    * simply never match. */
  private[api] def ridPredicate(
      schema: org.apache.spark.sql.types.StructType,
      idCol: String, rids: Seq[String]): Column = {
    import org.apache.spark.sql.types._
    schema(idCol).dataType match {
      case StringType => col(idCol).isInCollection(rids)
      case LongType | IntegerType | ShortType =>
        val vs = rids.flatMap(r => scala.util.Try(r.toLong).toOption)
        if (vs.isEmpty) lit(false) else col(idCol).isInCollection(vs)
      case _ => col(idCol).cast("string").isInCollection(rids)
    }
  }

  def augment(
      corpus: Find.Corpus,
      req: AugmentRequest,
      conversations: Option[ConversationStore] = None,
      bind: Bindings = Bindings()): Augmented = {
    val spark = corpus.docs.sparkSession
    Augmented(
      resources = augmentResources(spark, corpus, req.resources, bind),
      fields = augmentFields(spark, corpus, fieldAugments(req), bind,
        conversations),
      messages = augmentMessages(spark, req, conversations),
      paragraphs = augmentParagraphs(spark, corpus, req.paragraphs))
  }

  // ------------------------------------------------------------------
  // resources
  // ------------------------------------------------------------------

  /** The reference merges select lists per rid across augment entries
    * (`augmentor.py:137-151` setdefault + extend): an rid named by two
    * entries gets the union of their props. Rendered here as one
    * per-entry projection union'd and re-merged per rid with
    * ignore-null firsts — request-sized rows throughout. */
  private def augmentResources(
      spark: SparkSession,
      corpus: Find.Corpus,
      entries: Seq[ResourceAugment],
      bind: Bindings): DataFrame = {
    val selected = entries.filter(e => e.given.nonEmpty &&
      (e.title || e.summary || e.classificationLabels || e.security ||
        e.origin))
    if (selected.isEmpty) return emptyResources(spark)

    val b = corpus.filterBindings
    def optCol(selectedProp: Boolean, name: String, tpe: String): Column = {
      val present = corpus.docs.schema.fieldNames.contains(name)
      if (selectedProp && present) col(name).cast(tpe)
      else lit(null).cast(tpe)
    }

    val perEntry = selected.map { e =>
      val rids = e.given.distinct
      corpus.docs
        .where(ridPredicate(corpus.docs.schema, corpus.docId, rids))
        .select(
          col(corpus.docId).cast("string").as("rid"),
          (if (e.title)
            concat_ws(" ", slice(
              graft.functions.TextFunctions.tokens(col(corpus.text)), 1, 5))
           else lit(null).cast("string")).as("title"),
          bind.summaryCol.map(c => optCol(e.summary, c, "string"))
            .getOrElse(lit(null).cast("string")).as("summary"),
          optCol(e.classificationLabels, b.labelsCol, "array<string>")
            .as("labels"),
          optCol(e.security, b.securityCol, "array<string>").as("security"),
          bind.originCol.map(c => optCol(e.origin, c, "string"))
            .getOrElse(lit(null).cast("string")).as("origin"))
    }
    perEntry.reduce(_ unionByName _)
      .groupBy("rid")
      .agg(
        first(col("title"), ignoreNulls = true).as("title"),
        first(col("summary"), ignoreNulls = true).as("summary"),
        first(col("labels"), ignoreNulls = true).as("labels"),
        first(col("security"), ignoreNulls = true).as("security"),
        first(col("origin"), ignoreNulls = true).as("origin"))
  }

  private def emptyResources(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("rid", StringType), StructField("title", StringType),
        StructField("summary", StringType),
        StructField("labels", ArrayType(StringType)),
        StructField("security", ArrayType(StringType)),
        StructField("origin", StringType))))
  }

  // ------------------------------------------------------------------
  // fields
  // ------------------------------------------------------------------

  /** Explicit field augments plus the nested all-fields augments of
    * each resource entry (`augment.py:166-190`: fields.text /
    * fields.classification_labels over the resource's fields with an
    * optional type filter). Nested entries pass a rid-only given — the
    * expansion to concrete field ids happens against the field
    * synthesis below, so unknown fields never materialize. */
  private final case class EffectiveFieldAugment(
      explicitIds: Seq[String],          // full field ids
      resourceRids: Seq[String],         // rid-only (nested augments)
      fieldTypeFilter: Seq[String],
      text: Boolean,
      labels: Boolean,
      entities: Boolean)

  private def fieldAugments(req: AugmentRequest): Seq[EffectiveFieldAugment] = {
    val explicit = req.fields
      .filter(e => e.given.nonEmpty && (e.text || e.classificationLabels ||
        e.entities))
      .map(e => EffectiveFieldAugment(e.given, Nil, Nil, e.text,
        e.classificationLabels, e.entities))
    val nested = req.resources
      .filter(e => e.given.nonEmpty && (e.fieldsText ||
        e.fieldsClassificationLabels))
      .map(e => EffectiveFieldAugment(Nil, e.given, e.fieldTypeFilter,
        e.fieldsText, e.fieldsClassificationLabels, entities = false))
    explicit ++ nested
  }

  /** All at-rest fields of the requested resources, text included:
    * the t/body + a/title synthesis ([[graft.sources.Ingest.fieldsTable]]
    * convention) plus one row per conversation field (text null — a
    * conversation's text is message-grain, served via `messages`).
    * The docs scan prunes to the requested rids BEFORE the synthesis
    * tokenizes anything. */
  private def candidateFields(
      corpus: Find.Corpus,
      rids: Seq[String],
      conversations: Option[ConversationStore]): DataFrame = {
    val pruned = corpus.docs
      .where(ridPredicate(corpus.docs.schema, corpus.docId, rids))
    val synth = graft.sources.Ingest
      .fieldsTable(pruned, corpus.docId, corpus.text)
      .select(col(corpus.docId).cast("string").as("rid"),
        col("field_type"), col("field_id"), col("f_text"))
    conversations match {
      case None => synth
      case Some(cs) => synth.unionByName(cs.df
        .where(ridPredicate(cs.df.schema, cs.ridCol, rids))
        .select(col(cs.ridCol).cast("string").as("rid"),
          lit("c").as("field_type"),
          col(cs.fieldCol).cast("string").as("field_id"))
        .distinct()
        .withColumn("f_text", lit(null).cast("string")))
    }
  }

  private def augmentFields(
      spark: SparkSession,
      corpus: Find.Corpus,
      entries: Seq[EffectiveFieldAugment],
      bind: Bindings,
      conversations: Option[ConversationStore]): DataFrame = {
    if (entries.isEmpty) return emptyFields(spark)
    val b = corpus.filterBindings

    val perEntry = entries.map { e =>
      // lenient id parse ({rid}/{type}/{id}[/{split}]); invalid skip
      val parsed = e.explicitIds.flatMap { id =>
        val parts = id.split("/")
        if (parts.length == 3 || parts.length == 4)
          Some((parts(0), parts(1), parts(2)))
        else None
      }.distinct
      val rids = (parsed.map(_._1) ++ e.resourceRids).distinct
      if (rids.isEmpty) emptyFields(spark)
      else {
        val cand = candidateFields(corpus, rids, conversations)
        val wanted =
          if (parsed.nonEmpty) {
            val keys = parsed.map { case (r, t, f) => s"$r/$t/$f" }
            cand.where(concat_ws("/", col("rid"), col("field_type"),
              col("field_id")).isInCollection(keys))
          } else {
            val typed =
              if (e.fieldTypeFilter.isEmpty) cand
              else cand.where(col("field_type")
                .isInCollection(e.fieldTypeFilter))
            typed
          }
        val labelled =
          if (!e.labels) wanted.withColumn("labels",
            lit(null).cast("array<string>"))
          else {
            val present = corpus.docs.schema.fieldNames.contains(b.labelsCol)
            if (!present) wanted.withColumn("labels",
              lit(null).cast("array<string>"))
            else wanted.join(
              // the labels side prunes to the requested rids too — an
              // unpruned projection would scan the whole doc store to
              // serve a request-sized lookup
              corpus.docs
                .where(ridPredicate(corpus.docs.schema, corpus.docId, rids))
                .select(col(corpus.docId).cast("string").as("rid"),
                  col(b.labelsCol).cast("array<string>").as("labels")),
              Seq("rid"), "left")
          }
        val withEnts =
          if (!e.entities) labelled.withColumn("entities",
            lit(null).cast("array<string>"))
          else bind.entityNodes match {
            case None => labelled.withColumn("entities",
              lit(null).cast("array<string>"))
            case Some((nodes, valueCol)) =>
              labelled.join(detectedEntities(labelled, nodes, valueCol),
                  Seq("rid", "field_type", "field_id"), "left")
          }
        withEnts.select(col("rid"), col("field_type"), col("field_id"),
          (if (e.text) when(col("field_type") =!= "c", col("f_text"))
           else lit(null).cast("string")).as("text"),
          col("labels"), col("entities"))
      }
    }
    perEntry.reduce(_ unionByName _)
      .groupBy("rid", "field_type", "field_id")
      .agg(
        first(col("text"), ignoreNulls = true).as("text"),
        first(col("labels"), ignoreNulls = true).as("labels"),
        first(col("entities"), ignoreNulls = true).as("entities"))
  }

  /** The ONE whole-token entity-detection join — the q92
    * values-in-text contract vectorized per field: an entity value
    * matches when it appears space-bounded in the normalized field
    * text. The entity table is dictionary-scale and BROADCASTS against
    * the request-sized field rows. Shared by /augment field entities
    * and the /ask metadata-extension NER pass so the matching
    * convention cannot drift between them. `fields` must carry
    * (rid, field_type, field_id, f_text); returns one row per
    * (field, matched entity) with the entity's family (`familyCol`,
    * or the constant "entity"). */
  private[api] def entityMatchRows(
      fields: DataFrame, nodes: DataFrame, valueCol: String,
      familyCol: Option[String] = None): DataFrame = {
    val normText = concat(lit(" "),
      trim(regexp_replace(lower(col("f_text")), "[^a-z0-9]+", " ")),
      lit(" "))
    val normValue = concat(lit(" "),
      trim(regexp_replace(lower(col(valueCol)), "[^a-z0-9]+", " ")),
      lit(" "))
    fields
      .where(col("f_text").isNotNull)
      .select(col("rid"), col("field_type"), col("field_id"),
        normText.as("__nt"))
      .join(broadcast(nodes.select(col(valueCol).as("__entity"),
        familyCol.map(c => col(c).cast("string"))
          .getOrElse(lit("entity")).as("__family"),
        normValue.as("__nv"))), col("__nt").contains(col("__nv")))
      .select(col("rid"), col("field_type"), col("field_id"),
        col("__entity"), col("__family"))
  }

  /** Sorted matched-value array per field ([[entityMatchRows]]). */
  private def detectedEntities(
      fields: DataFrame, nodes: DataFrame, valueCol: String): DataFrame =
    entityMatchRows(fields, nodes, valueCol)
      .groupBy("rid", "field_type", "field_id")
      .agg(sort_array(collect_set(col("__entity"))).as("entities"))

  private def emptyFields(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("rid", StringType), StructField("field_type", StringType),
        StructField("field_id", StringType), StructField("text", StringType),
        StructField("labels", ArrayType(StringType)),
        StructField("entities", ArrayType(StringType)))))
  }

  // ------------------------------------------------------------------
  // conversation messages
  // ------------------------------------------------------------------

  /** One request-sized anchor row per (given id × selector). */
  private final case class Anchor(
      rid: String, fid: String, split: Option[String],
      selector: String, size: Int)

  /** The conversation selectors (`fields.py:568-700`), resolved over
    * the message store in split order:
    *  - `text=true` on a c-type id: the id's split message when the id
    *    carries one, the FULL conversation otherwise
    *    (`fields.py:289-299`);
    *  - `fullConversation`: FullSelector over every given c field;
    *  - `maxConversationMessages=n`: the FIRST message plus a WINDOW
    *    of n ending (n-1)/2 past the id's split anchor
    *    (`augment.py:259-272`; `fields.py:656-683` — deque semantics:
    *    a missing anchor yields the conversation TAIL);
    *  - `conversationAnswerOrAfter`: QUESTION anchors pull the first
    *    later ANSWER, others the next 15 messages
    *    ([[ContextBuilder.conversationAnswerOrAfter]]).
    * Selected messages dedup on (rid, field, split) — the reference's
    * (page, index)-keyed merge map (`fields.py:283-285`). */
  private def augmentMessages(
      spark: SparkSession,
      req: AugmentRequest,
      conversations: Option[ConversationStore]): DataFrame = {
    val cs = conversations match {
      case None => return emptyMessages(spark)
      case Some(c) => c
    }
    // parse given c-type ids once per entry
    def convIds(e: FieldAugment): Seq[(String, String, Option[String])] =
      e.given.flatMap { id =>
        id.split("/") match {
          case Array(rid, "c", fid) => Some((rid, fid, None))
          case Array(rid, "c", fid, split) => Some((rid, fid, Some(split)))
          case _ => None
        }
      }.distinct

    val anchors = req.fields.flatMap { e =>
      val ids = convIds(e)
      val text = if (!e.text) Nil else ids.map { case (r, f, s) =>
        Anchor(r, f, s, if (s.isDefined) "message" else "full", 0)
      }
      val full = if (!e.fullConversation) Nil else ids.map {
        case (r, f, _) => Anchor(r, f, None, "full", 0)
      }
      val windowed = e.maxConversationMessages match {
        case None => Nil
        case Some(n) => ids.flatMap { case (r, f, s) =>
          Anchor(r, f, None, "first", 0) ::
            s.map(sp => Anchor(r, f, Some(sp), "window", n)).toList
        }
      }
      val aoa = if (!e.conversationAnswerOrAfter) Nil else ids.collect {
        case (r, f, Some(s)) => Anchor(r, f, Some(s), "aoa", 0)
      }
      text ++ full ++ windowed ++ aoa
    }.distinct
    if (anchors.isEmpty) return emptyMessages(spark)

    import spark.implicits._
    val rids = anchors.map(_.rid).distinct
    // ONE pruned, ranked view of the requested conversations — and
    // (round 19, VERDICT r18 #2) ONE pass over it: the former
    // per-selector joins each re-instantiated this window subtree
    // (4-5 replicas + a maxRanks aggregation + per-selector
    // row_numbers → 15-17 Spark jobs on the q164-class), where every
    // selector is really just a rank predicate given three
    // per-(anchor × conversation) aggregates. So: broadcast-join ALL
    // anchors onto the ranked view once, compute those aggregates as
    // window functions over the SAME (rid, fid)-clustered data (their
    // partition keys are supersets of the ranked window's hash
    // partitioning — no second exchange), and keep each row by its
    // anchor's selector predicate. Guide §2.4: one shuffle answering
    // several questions. Numeric splits order numerically, the
    // splitConversationParagraphs convention. Assumes the store's
    // (rid, field, split) message key is unique — the reference's
    // (page, index) map key.
    val ranked = cs.df
      .where(ridPredicate(cs.df.schema, cs.ridCol, rids))
      .select(col(cs.ridCol).cast("string").as("rid"),
        col(cs.fieldCol).cast("string").as("fid"),
        col(cs.splitCol).cast("string").as("split"),
        col(cs.textCol).cast("string").as("mtext"),
        cs.mtypeCol.map(c => col(c).cast("string"))
          .getOrElse(lit("OTHER")).as("mtype"))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("rid"), col("fid"))
          // try_cast: non-numeric idents order after numeric ones (the
          // splitConversationParagraphs convention) instead of
          // throwing under ANSI cast
          .orderBy(col("split").try_cast("int").asc_nulls_last,
            col("split").asc)))
      // conversation length as a window aggregate over the SAME
      // partition — replaces the former maxRanks groupBy exchange
      .withColumn("__max_rank", max(col("__rank")).over(
        Window.partitionBy(col("rid"), col("fid"))))

    val anchorsDf = anchors
      .map(a => (a.rid, a.fid, a.split.orNull, a.selector, a.size))
      .toDF("rid", "fid", "__anchor", "__sel", "__size")

    // per-(anchor × conversation) aggregates, ONE window layer each:
    // the anchor's rank + message type, then (depending on it) the
    // first later ANSWER's rank. Partitioning by the anchor identity
    // keeps concurrent anchors of one conversation independent.
    val wAnchor = Window.partitionBy(col("rid"), col("fid"),
      col("__sel"), col("__anchor"), col("__size"))
    val joined = ranked.join(broadcast(anchorsDf), Seq("rid", "fid"))
      .withColumn("__arank",
        max(when(col("split") === col("__anchor"), col("__rank")))
          .over(wAnchor))
      .withColumn("__atype",
        max(when(col("split") === col("__anchor"), col("mtype")))
          .over(wAnchor))
    val resolved = joined.withColumn("__answer_rank",
      min(when(col("mtype") === "ANSWER" && col("__rank") > col("__arank"),
        col("__rank"))).over(wAnchor))

    // deque semantics for `window`: it ENDS (size-1)/2 past the anchor
    // (capped at the conversation end; a missing anchor ends at the
    // tail) and spans `size` messages back from there
    val half = floor((col("__size") - 1) / 2.0).cast("int")
    val winEnd = least(coalesce(col("__arank") + half, col("__max_rank")),
      col("__max_rank"))
    // answer-or-after, RANK-based over the same ordered view (not
    // through [[ContextBuilder.conversationAnswerOrAfter]]'s int-cast
    // contract): message idents are arbitrary strings in the reference
    // (zero-padded or non-numeric splits must not silently drop), and
    // `ranked`'s ordering already handles both. QUESTION anchors keep
    // exactly the first later ANSWER; others the next 15; a missing
    // anchor (null __arank/__atype) keeps nothing — the former
    // inner-join-on-hitRanks behavior.
    val keep = when(col("__sel") === "full", lit(true))
      .when(col("__sel") === "message", col("split") === col("__anchor"))
      .when(col("__sel") === "first", col("__rank") === 1)
      .when(col("__sel") === "window",
        col("__rank") > winEnd - col("__size") && col("__rank") <= winEnd)
      .when(col("__sel") === "aoa",
        when(col("__atype") === "QUESTION",
            col("__rank") === col("__answer_rank"))
          .otherwise(col("__atype").isNotNull &&
            col("__rank") > col("__arank") &&
            col("__rank") <= col("__arank") + MessageContextExpansion))
      .otherwise(lit(false))

    resolved.where(coalesce(keep, lit(false)))
      .select(col("rid"), col("fid").as("field_id"), col("split"),
        col("mtext"))
      .dropDuplicates("rid", "field_id", "split")
  }

  private def emptyMessages(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("rid", StringType), StructField("field_id", StringType),
        StructField("split", StringType), StructField("mtext", StringType))))
  }

  // ------------------------------------------------------------------
  // paragraphs
  // ------------------------------------------------------------------

  private def augmentParagraphs(
      spark: SparkSession,
      corpus: Find.Corpus,
      entries: Seq[ParagraphAugment]): DataFrame = {
    val given = entries.flatMap(_.given).distinct
    if (given.isEmpty || corpus.index.isEmpty)
      return emptyParagraphs(spark)
    val text = entries.exists(_.text)
    val before = entries.map(_.neighboursBefore).max
    val after = entries.map(_.neighboursAfter).max
    Hydrate.paragraphs(corpus, given,
      Hydrate.Hydration(text = text,
        neighbours = if (before == 0 && after == 0) None
          else Some(Hydrate.Neighbours(before, after))))
  }

  // the canonical Hydrate schema — one definition, no drift between
  // the empty and hydrated paragraph frames
  private def emptyParagraphs(spark: SparkSession): DataFrame =
    Hydrate.emptyResult(spark, Hydrate.Hydration())
}
