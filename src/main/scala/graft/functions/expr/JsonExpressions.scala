package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-predicate JSON expressions: one parse per row per predicate.
  *
  * The reference indexes JSON attributes once at ingest and evaluates
  * typed predicate leaves against the index
  * (`nidx/nidx_json/src/search.rs:29-56`, `nidx_json/src/lib.rs:144-147`).
  * The Spark pitfall this file removes: a range predicate composed from
  * `get_json_object(c, p) >= lo && get_json_object(c, p) <= hi` parses
  * the JSON string TWICE per row, and binding the extraction in a
  * projected column does not help — Catalyst pushes the filter through
  * the projection and re-inlines the extraction per reference. Each
  * expression here evaluates its ENTIRE predicate (extract + compare)
  * in a single scan of the JSON text, stays inside whole-stage codegen
  * (the generated code is one static call), and cannot be split by the
  * optimizer. For repeated querying the right shape is still a
  * materialized typed column ([[graft.sources.Ingest.jsonFields]]) with
  * parquet pushdown; these expressions are the single-pass fallback for
  * ad-hoc predicates on raw JSON.
  */
object JsonScan {

  /** Extract the decoded value of `path` ("a" or "a.b.c") from a JSON
    * object string in one scan. Scalars decode (strings unescape,
    * numbers/booleans return their literal text); objects/arrays return
    * their raw JSON slice (enables dotted-path recursion). Returns null
    * for absent keys, JSON null, or malformed input.
    *
    * Numeric scalars keep their LITERAL form ("-2.5e3" stays "-2.5e3"
    * where `get_json_object` would normalize to "-2500.0") — numeric
    * predicates parse either form identically; string-equality belongs
    * on text attributes only, mirroring the reference's typed JSON
    * leaves (`nidx_json/src/search.rs:29-56`).
    */
  def extract(json: UTF8String, path: UTF8String): UTF8String = {
    if (json == null || path == null) return null
    var value = json.toString
    val parts = path.toString.split('.')
    var i = 0
    while (i < parts.length) {
      if (value == null) return null
      value = extractTopLevel(value, parts(i))
      i += 1
    }
    if (value == null) null else UTF8String.fromString(value)
  }

  /** One top-level field lookup: scan the object, skipping nested
    * structures and escaped strings; decode the matched scalar. */
  private def extractTopLevel(json: String, key: String): String = {
    val n = json.length
    var i = skipWs(json, 0)
    if (i >= n || json.charAt(i) != '{') return null
    i += 1
    while (i < n) {
      i = skipWs(json, i)
      if (i >= n || json.charAt(i) == '}') return null
      if (json.charAt(i) != '"') return null
      val keyEnd = stringEnd(json, i)
      if (keyEnd < 0) return null
      val matches = decodeString(json, i, keyEnd) == key
      i = skipWs(json, keyEnd)
      if (i >= n || json.charAt(i) != ':') return null
      i = skipWs(json, i + 1)
      val valueEnd = valueEndIndex(json, i)
      if (valueEnd < 0) return null
      if (matches) {
        if (json.charAt(i) == '"') return decodeString(json, i, valueEnd)
        val raw = json.substring(i, valueEnd)
        return if (raw == "null") null else raw
      }
      i = skipWs(json, valueEnd)
      if (i < n && json.charAt(i) == ',') i += 1
      else return null // '}' or malformed — no more keys
    }
    null
  }

  @inline private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    i
  }

  /** End index (exclusive) of the string literal starting at `start`
    * (must be '"'); handles backslash escapes. -1 if unterminated. */
  private def stringEnd(s: String, start: Int): Int = {
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** Decode the JSON string literal occupying [start, end). */
  private def decodeString(s: String, start: Int, end: Int): String = {
    val sb = new java.lang.StringBuilder(end - start)
    var i = start + 1
    while (i < end - 1) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < end - 1) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' if i + 6 <= end - 1 =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** End index (exclusive) of the value starting at `start`: string,
    * balanced object/array, or bare scalar token. -1 if malformed. */
  private def valueEndIndex(s: String, start: Int): Int = {
    if (start >= s.length) return -1
    s.charAt(start) match {
      case '"' => stringEnd(s, start)
      case '{' | '[' =>
        var depth = 0
        var i = start
        while (i < s.length) {
          s.charAt(i) match {
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' =>
              depth -= 1; i += 1
              if (depth == 0) return i
            case '"' =>
              val e = stringEnd(s, i)
              if (e < 0) return -1
              i = e
            case _ => i += 1
          }
        }
        -1
      case _ =>
        var i = start
        while (i < s.length && !",}] \t\n\r".contains(s.charAt(i))) i += 1
        i
    }
  }

  // ---- static predicate helpers (called from codegen) ---- //

  def numBetween(json: UTF8String, path: UTF8String,
      lo: Double, hi: Double, hasLo: Boolean, hasHi: Boolean): Boolean = {
    val v = extract(json, path)
    if (v == null) return false
    try {
      val d = java.lang.Double.parseDouble(v.toString.trim)
      (!hasLo || d >= lo) && (!hasHi || d <= hi)
    } catch { case _: NumberFormatException => false }
  }

  def strEq(json: UTF8String, path: UTF8String, value: UTF8String): Boolean = {
    val v = extract(json, path)
    v != null && v.equals(value)
  }

  def boolEq(json: UTF8String, path: UTF8String, value: Boolean): Boolean = {
    val v = extract(json, path)
    v != null && {
      val s = v.toString
      (value && s == "true") || (!value && s == "false")
    }
  }

  /** Lexicographic range on the decoded string value — chronological
    * for ISO-8601 dates, the reference's JSON date representation. */
  def strBetween(json: UTF8String, path: UTF8String,
      lo: UTF8String, hi: UTF8String): Boolean = {
    val v = extract(json, path)
    v != null &&
      (lo == null || v.compareTo(lo) >= 0) &&
      (hi == null || v.compareTo(hi) <= 0)
  }
}

/** Base for single-parse JSON predicates over a string JSON column. */
abstract class JsonPredicateExpression extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string JSON column, got ${child.dataType.simpleString}")
}

/** `lo ≤ cast_double(json[path]) ≤ hi` in one parse (either bound
  * optional). Missing key / non-number → false. */
case class JsonNumBetween(child: Expression, path: String,
    lo: Option[Double], hi: Option[Double]) extends JsonPredicateExpression {
  override def prettyName: String = "json_num_between"
  private val pathU = UTF8String.fromString(path)

  override def nullSafeEval(json: Any): Any =
    JsonScan.numBetween(json.asInstanceOf[UTF8String], pathU,
      lo.getOrElse(0.0), hi.getOrElse(0.0), lo.isDefined, hi.isDefined)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, json => {
      val p = ctx.addReferenceObj("path", pathU)
      s"""${ev.value} = graft.functions.expr.JsonScan.numBetween(
         |  $json, $p, ${lo.getOrElse(0.0)}, ${hi.getOrElse(0.0)},
         |  ${lo.isDefined}, ${hi.isDefined});""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): JsonNumBetween =
    copy(child = c)
}

/** `json[path] == value` on the decoded string in one parse. */
case class JsonStrEq(child: Expression, path: String, value: String)
    extends JsonPredicateExpression {
  override def prettyName: String = "json_str_eq"
  private val pathU = UTF8String.fromString(path)
  private val valueU = UTF8String.fromString(value)

  override def nullSafeEval(json: Any): Any =
    JsonScan.strEq(json.asInstanceOf[UTF8String], pathU, valueU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, json => {
      val p = ctx.addReferenceObj("path", pathU)
      val v = ctx.addReferenceObj("value", valueU)
      s"${ev.value} = graft.functions.expr.JsonScan.strEq($json, $p, $v);"
    })

  override protected def withNewChildInternal(c: Expression): JsonStrEq =
    copy(child = c)
}

/** `json[path] == true|false` in one parse. */
case class JsonBoolEq(child: Expression, path: String, value: Boolean)
    extends JsonPredicateExpression {
  override def prettyName: String = "json_bool_eq"
  private val pathU = UTF8String.fromString(path)

  override def nullSafeEval(json: Any): Any =
    JsonScan.boolEq(json.asInstanceOf[UTF8String], pathU, value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, json => {
      val p = ctx.addReferenceObj("path", pathU)
      s"${ev.value} = graft.functions.expr.JsonScan.boolEq($json, $p, $value);"
    })

  override protected def withNewChildInternal(c: Expression): JsonBoolEq =
    copy(child = c)
}

/** Lexicographic (ISO-date) range on `json[path]` in one parse; either
  * bound optional. */
case class JsonStrBetween(child: Expression, path: String,
    lo: Option[String], hi: Option[String]) extends JsonPredicateExpression {
  override def prettyName: String = "json_str_between"
  private val pathU = UTF8String.fromString(path)
  private val loU = lo.map(UTF8String.fromString).orNull
  private val hiU = hi.map(UTF8String.fromString).orNull

  override def nullSafeEval(json: Any): Any =
    JsonScan.strBetween(json.asInstanceOf[UTF8String], pathU, loU, hiU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, json => {
      val p = ctx.addReferenceObj("path", pathU)
      val l = if (lo.isDefined) ctx.addReferenceObj("lo", loU) else "null"
      val h = if (hi.isDefined) ctx.addReferenceObj("hi", hiU) else "null"
      s"""${ev.value} = graft.functions.expr.JsonScan.strBetween(
         |  $json, $p, (org.apache.spark.unsafe.types.UTF8String) $l,
         |  (org.apache.spark.unsafe.types.UTF8String) $h);""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): JsonStrBetween =
    copy(child = c)
}
