package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Filter expression ADT → Spark `Column` compiler.
  *
  * Direct analog of the reference's `FilterExpression` proto tree
  * (`nidx/nidx_protos/nodereader.proto:287-331`) and its compilation to
  * tantivy queries (`nidx_text/src/search_query.rs:156-217`
  * filter_to_query). Compiling to a `Column` means Catalyst gets the
  * whole predicate declaratively: AND/OR/NOT trees fold into a single
  * scan filter, push down to Parquet (`PushedFilters`), and participate
  * in partition pruning — the Spark-native form of the reference's
  * "prefilter pushdown" (`nidx/src/searcher/shard_search.rs:175-208`).
  */
sealed trait FilterExpr

object FilterExpr {
  final case class And(ops: Seq[FilterExpr]) extends FilterExpr
  final case class Or(ops: Seq[FilterExpr]) extends FilterExpr
  final case class Not(op: FilterExpr) extends FilterExpr
  /** Facet/label match: labels array contains the given path, or a
    * descendant of it (hierarchical, `/l/set/label` style). */
  final case class Facet(path: String) extends FilterExpr
  /** Exact keyword occurs in the text column (tokenized membership). */
  final case class Keyword(word: String) extends FilterExpr
  /** Equality on an arbitrary column (resource id, field id, status…). */
  final case class Eq(column: String, value: Any) extends FilterExpr
  /** Inclusive date range on a timestamp column; bounds are ISO strings
    * interpreted in the session timezone; either bound optional. */
  final case class DateRange(column: String, from: Option[String], to: Option[String]) extends FilterExpr
  /** Inclusive numeric range; either bound optional. */
  final case class NumRange(column: String, lo: Option[Double], hi: Option[Double]) extends FilterExpr
  /** Security: row is public (no groups) or shares ≥1 access group
    * (`nidx_text/src/search_query.rs:66-90`). */
  final case class Security(userGroups: Seq[String]) extends FilterExpr
  /** JSON path predicates on a string JSON column — the typed leaf set
    * of the reference's JSON index (`nidx/nidx_json/src/search.rs:29-56`:
    * Text/Boolean/Int/IntRange/Float/FloatRange/Date/DateRange inside
    * the same And/Or/Not tree). Each compiles to a single-parse native
    * expression ([[graft.functions.expr.JsonScan]]) — extraction and
    * comparison in ONE scan of the JSON text per row, immune to the
    * optimizer's per-reference re-inlining of `get_json_object`. */
  final case class JsonNumRange(column: String, path: String, lo: Option[Double], hi: Option[Double]) extends FilterExpr
  /** Decoded-string equality at `$.path` (reference Text leaf). */
  final case class JsonText(column: String, path: String, value: String) extends FilterExpr
  /** Boolean equality at `$.path` (reference Boolean leaf). */
  final case class JsonBool(column: String, path: String, value: Boolean) extends FilterExpr
  /** ISO-date range at `$.path`, lexicographic = chronological
    * (reference Date/DateRange leaves); either bound optional. */
  final case class JsonDateRange(column: String, path: String, from: Option[String], to: Option[String]) extends FilterExpr

  /** Column-name bindings for the schema the filter runs against. */
  final case class Bindings(
      labelsCol: String = "labels",
      textCol: String = "text",
      securityCol: String = "security_groups")

  def compile(f: FilterExpr, b: Bindings = Bindings()): Column = f match {
    case And(ops) => ops.map(compile(_, b)).reduce(_ && _)
    case Or(ops) => ops.map(compile(_, b)).reduce(_ || _)
    case Not(op) => !compile(op, b)
    case Facet(path) =>
      // exact label or hierarchical descendant ("/l/a" matches "/l/a/b")
      exists(col(b.labelsCol), l => l === path || l.startsWith(path + "/"))
    case Keyword(word) =>
      array_contains(graft.functions.TextFunctions.tokens(col(b.textCol)), word)
    case Eq(c, v) => col(c) === lit(v)
    case DateRange(c, from, to) =>
      range(col(c), from.map(s => lit(s).cast("timestamp")),
        to.map(s => lit(s).cast("timestamp")))
    case NumRange(c, lo, hi) =>
      range(col(c), lo.map(lit), hi.map(lit))
    case Security(groups) =>
      size(col(b.securityCol)) === 0 ||
        arrays_overlap(col(b.securityCol), lit(groups.toArray))
    case JsonNumRange(c, path, lo, hi) =>
      jsonPred(graft.functions.expr.JsonNumBetween(_, path, lo, hi), c)
    case JsonText(c, path, v) =>
      jsonPred(graft.functions.expr.JsonStrEq(_, path, v), c)
    case JsonBool(c, path, v) =>
      jsonPred(graft.functions.expr.JsonBoolEq(_, path, v), c)
    case JsonDateRange(c, path, from, to) =>
      jsonPred(graft.functions.expr.JsonStrBetween(_, path, from, to), c)
  }

  private def jsonPred(
      f: org.apache.spark.sql.catalyst.expressions.Expression =>
        org.apache.spark.sql.catalyst.expressions.Expression,
      column: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(f(ColumnBridge.expression(col(column))))
  }

  private def range(c: Column, lo: Option[Column], hi: Option[Column]): Column =
    (lo, hi) match {
      case (Some(l), Some(h)) => c >= l && c <= h
      case (Some(l), None) => c >= l
      case (None, Some(h)) => c <= h
      case (None, None) => lit(true)
    }
}
