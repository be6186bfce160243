package graft.api

import graft.operators.FilterExpr
import graft.operators.FilterExpr._

/** Legacy filter-string parser — the pre-expression filter surface
  * every existing client speaks
  * (`nucliadb/src/nucliadb/search/search/query_parser/old_filters.py:48-260`):
  * `filters=["/l/set/label"]` label strings (with friendly aliases),
  * `keyword_filters=`, creation/modification date params, `fields=` and
  * `key_filters=`. Parsing produces the same typed [[FilterExpr]] tree
  * the modern surface compiles, split into a FIELD expression and a
  * PARAGRAPH expression: classification labels whose labelset is
  * declared paragraph-kind apply to the paragraph index, everything
  * else to the field/document index (`old_filters.py:151-219`
  * split_labels / is_paragraph_label).
  */
object OldFilters {

  /** Friendly → system label aliases
    * (`nucliadb_models/src/nucliadb_models/labels.py:34-66`). */
  val LabelAliases: Map[String, String] = Map(
    "icon" -> "n/i",
    "metadata.status" -> "n/s",
    "metadata.language" -> "s/p",
    "metadata.languages" -> "s/s",
    "origin.tags" -> "t",
    "origin.metadata" -> "m",
    "origin.path" -> "p",
    "origin.source-id" -> "u/s",
    "classification.labels" -> "l",
    "entities" -> "e",
    "field" -> "f",
    "field-values" -> "fg",
    "generated.data-augmentation" -> "g/da")

  /** `/metadata.language/en` → `/s/p/en`; system labels pass through.
    * Invalid labels (empty / missing leading slash) are rejected, as in
    * `filters.py:57-62` translate_label. */
  def translateLabel(literal: String): String = {
    require(literal.nonEmpty, "Invalid empty label")
    require(literal.startsWith("/"), s"Invalid label. It must start with a `/`: $literal")
    val parts = literal.split("/", -1)
    if (parts.length > 1 && LabelAliases.contains(parts(1)))
      (Seq("", LabelAliases(parts(1))) ++ parts.drop(2)).mkString("/")
    else literal
  }

  /** A label is a paragraph label iff it is `/l/<labelset>/<label>`
    * (≥4 segments) and the labelset is declared PARAGRAPHS-kind
    * (`old_filters.py:221-241`). */
  def isParagraphLabel(label: String, paragraphLabelsets: Set[String]): Boolean = {
    if (!label.startsWith("/l/")) return false
    val parts = label.split("/", -1)
    parts.length >= 4 && paragraphLabelsets.contains(parts(2))
  }

  /** The legacy `Filter` model: a bare string literal or one of the
    * all/any/none/not_all combinators (`nucliadb_models.search.Filter`). */
  sealed trait Old
  final case class Lit(value: String) extends Old
  final case class All(values: Seq[String]) extends Old
  final case class AnyOf(values: Seq[String]) extends Old
  final case class NoneOf(values: Seq[String]) extends Old
  final case class NotAll(values: Seq[String]) extends Old

  /** The old request parameter bag (`old_filters.py:36-45`
    * OldFilterParams); dates are ISO strings. */
  final case class Params(
      labelFilters: Seq[Old] = Nil,
      keywordFilters: Seq[Old] = Nil,
      rangeCreationStart: Option[String] = None,
      rangeCreationEnd: Option[String] = None,
      rangeModificationStart: Option[String] = None,
      rangeModificationEnd: Option[String] = None,
      fields: Seq[String] = Nil,
      keyFilters: Seq[String] = Nil)

  /** Column bindings for the legacy parameters that address fixed
    * schema columns. */
  final case class Schema(
      createdCol: String = "created_at",
      modifiedCol: String = "modified_at",
      fieldTypeCol: String = "field_type",
      fieldIdCol: String = "field_id",
      resourceCol: String = "rid")

  private def andOf(es: Seq[FilterExpr]): FilterExpr =
    if (es.size == 1) es.head else And(es)
  private def orOf(es: Seq[FilterExpr]): FilterExpr =
    if (es.size == 1) es.head else Or(es)

  /** Split one label filter into (field labels, paragraph labels) with
    * the requested combinator; paragraph labels only compose under AND
    * (`old_filters.py:197-201`). */
  private def splitLabels(
      values: Seq[String],
      paragraphLabelsets: Set[String],
      or: Boolean,
      negate: Boolean): (Option[FilterExpr], Option[FilterExpr]) = {
    val translated = values.map(translateLabel)
    val (par, field) = translated.partition(isParagraphLabel(_, paragraphLabelsets))
    require(par.isEmpty || !or,
      "Paragraph labels can only be used with 'all' filter")
    def leaf(l: String): FilterExpr =
      if (negate) Not(Facet(l)) else Facet(l)
    val combine: Seq[FilterExpr] => FilterExpr = if (or) orOf else andOf
    (if (field.isEmpty) None else Some(combine(field.map(leaf))),
      if (par.isEmpty) None else Some(combine(par.map(leaf))))
  }

  private def labelToExprs(
      f: Old, paragraphLabelsets: Set[String]): (Option[FilterExpr], Option[FilterExpr]) =
    f match {
      case Lit(v) =>
        val l = translateLabel(v)
        if (isParagraphLabel(l, paragraphLabelsets)) (None, Some(Facet(l)))
        else (Some(Facet(l)), None)
      case All(vs) => splitLabels(vs, paragraphLabelsets, or = false, negate = false)
      case AnyOf(vs) => splitLabels(vs, paragraphLabelsets, or = true, negate = false)
      case NoneOf(vs) => splitLabels(vs, paragraphLabelsets, or = false, negate = true)
      case NotAll(vs) => splitLabels(vs, paragraphLabelsets, or = true, negate = true)
    }

  private def keywordToExpr(f: Old): FilterExpr = f match {
    case Lit(v) => Keyword(v)
    case All(vs) => andOf(vs.map(Keyword))
    case AnyOf(vs) => orOf(vs.map(Keyword))
    case NoneOf(vs) => Not(orOf(vs.map(Keyword)))
    case NotAll(vs) => Not(andOf(vs.map(Keyword)))
  }

  /** The (field_type, optional field_id) pairs a `fields=` spec list
    * compiles to (`old_filters.py:48-260` field handling) — the ONE
    * parse of the `{type}` / `{type}/{id}` spec syntax, shared by the
    * structural fields-table path ([[parse]]) and the paragraph-BM25
    * id-prefix path ([[graft.api.Find.findParagraphs]]) so the two
    * cannot drift. */
  def fieldSpecs(fields: Seq[String]): Seq[(String, Option[String])] =
    fields.map { field =>
      val parts = field.split("/", -1)
      if (parts.length > 1) (parts(0), Some(parts(1))) else (parts(0), None)
    }

  /** Parse the legacy parameter bag →
    * (field filter expression, paragraph filter expression) —
    * the contract of `parse_old_filters`. */
  def parse(
      p: Params,
      paragraphLabelsets: Set[String] = Set.empty,
      schema: Schema = Schema()): (Option[FilterExpr], Option[FilterExpr]) = {
    val filters = scala.collection.mutable.ArrayBuffer.empty[FilterExpr]
    val paragraph = scala.collection.mutable.ArrayBuffer.empty[FilterExpr]

    p.labelFilters.foreach { f =>
      val (fieldE, parE) = labelToExprs(f, paragraphLabelsets)
      fieldE.foreach(filters += _)
      parE.foreach(paragraph += _)
    }

    p.keywordFilters.foreach(f => filters += keywordToExpr(f))

    if (p.rangeCreationStart.isDefined || p.rangeCreationEnd.isDefined)
      filters += DateRange(schema.createdCol, p.rangeCreationStart, p.rangeCreationEnd)
    if (p.rangeModificationStart.isDefined || p.rangeModificationEnd.isDefined)
      filters += DateRange(schema.modifiedCol, p.rangeModificationStart, p.rangeModificationEnd)

    if (p.fields.nonEmpty) {
      val fieldExprs = fieldSpecs(p.fields).map {
        case (ftype, Some(fid)) =>
          And(Seq(Eq(schema.fieldTypeCol, ftype), Eq(schema.fieldIdCol, fid)))
        case (ftype, None) => Eq(schema.fieldTypeCol, ftype)
      }
      filters += orOf(fieldExprs)
    }

    if (p.keyFilters.nonEmpty) {
      val keyExprs = p.keyFilters.map { key =>
        val parts = key.split("/", -1)
        if (parts.length == 1) Eq(schema.resourceCol, parts(0))
        else {
          val fieldExpr =
            if (parts.length > 2)
              And(Seq(Eq(schema.fieldTypeCol, parts(1)), Eq(schema.fieldIdCol, parts(2))))
            else Eq(schema.fieldTypeCol, parts(1))
          And(Seq(Eq(schema.resourceCol, parts(0)), fieldExpr))
        }
      }
      filters += orOf(keyExprs)
    }

    (if (filters.isEmpty) None else Some(andOf(filters.toSeq)),
      if (paragraph.isEmpty) None else Some(andOf(paragraph.toSeq)))
  }
}
