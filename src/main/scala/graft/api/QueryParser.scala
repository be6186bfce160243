package graft.api

import graft.functions.TextFunctions

/** Keyword query grammar — the paragraph search parser analog
  * (`nidx/nidx_paragraph/src/query_parser.rs:69-113`): bare literals,
  * `"quoted"` exact phrases, `-excluded` terms; stop words removed from
  * bare literals (never from phrases).
  */
object QueryParser {

  final case class ParsedQuery(
      terms: Seq[String],
      phrases: Seq[String],
      excluded: Seq[String]) {
    def isEmpty: Boolean = terms.isEmpty && phrases.isEmpty
  }

  private val PhraseRe = "\"([^\"]*)\"".r

  /** Parse with a language-specific stop-word list (defaults to en). */
  def parse(query: String, lang: String): ParsedQuery = {
    val stop = TextFunctions.stopWordsFor(lang)
    val p = parse(query)
    // base parse removes en stop words from bare terms; additionally
    // drop the target language's stop words
    p.copy(terms = p.terms.filterNot(stop.contains))
  }

  def parse(query: String): ParsedQuery = {
    val phrases = PhraseRe.findAllMatchIn(query).map(_.group(1).trim.toLowerCase)
      .filter(_.nonEmpty).toSeq
    val rest = PhraseRe.replaceAllIn(query, " ")
    val raw = rest.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val (excludedRaw, included) = raw.partition(_.startsWith("-"))
    val excluded = excludedRaw.map(_.drop(1)).filter(_.nonEmpty)
      .map(t => t.replaceAll("[^a-z0-9]+", "")).filter(_.nonEmpty)
    val terms = included
      .map(t => t.replaceAll("[^a-z0-9]+", ""))
      .filter(t => t.nonEmpty && !TextFunctions.StopWords.contains(t))
    ParsedQuery(terms.distinct, phrases.distinct, excluded.distinct)
  }

  // ------------------------------------------------------------------
  // advanced query (tantivy grammar subset)
  // ------------------------------------------------------------------

  /** Boolean query tree for the `advanced_query` surface — the tantivy
    * grammar the reference forwards verbatim and parses leniently as a
    * MUST clause intersected with the main query
    * (`nidx_paragraph/src/search_query.rs:202-210`,
    * `nidx_text/src/reader.rs:378-383`; the python layer emits it for
    * synonym expansion as `term1 (term2 OR syn) term3`,
    * `query_parser/parsers/common.py:200-218`). Subset supported:
    * bare terms, `"quoted phrases"`, `AND`/`OR`/`NOT` (upper-case
    * keywords), `-term` must-not, parentheses; space-separated clauses
    * default to OR — tantivy's default `Occur::Should` conjunction.
    */
  sealed trait BoolQuery
  object BoolQuery {
    final case class Term(t: String) extends BoolQuery
    final case class Phrase(p: String) extends BoolQuery
    final case class And(l: BoolQuery, r: BoolQuery) extends BoolQuery
    final case class Or(l: BoolQuery, r: BoolQuery) extends BoolQuery
    final case class Not(q: BoolQuery) extends BoolQuery
    /** A clause list with ONLY must-not clauses — in tantivy/Lucene a
      * boolean query without a positive scorer matches NOTHING, not
      * the complement; this marker compiles to false. */
    case object MatchNone extends BoolQuery
  }

  /** Recursive-descent parse of the advanced-query grammar. Lenient
    * like the reference's `parse_query_lenient`: an empty or
    * all-noise query returns None rather than failing the request;
    * structural errors (unbalanced parens) throw — they are caller
    * bugs, not user noise.
    *
    * MUST-NOT semantics (tantivy's): negated clauses (`NOT x`, `-x`,
    * `-(…)`) in a clause list CONJOIN negatively with the positive
    * clauses — `batch -merge` means batch AND NOT merge, never
    * batch OR NOT merge; the positives among themselves default to OR
    * (tantivy's `Occur::Should`), explicit `AND` conjoins. */
  def parseAdvanced(query: String): Option[BoolQuery] = {
    val toks = tokenizeAdvanced(query)
    if (toks.isEmpty) return None
    val (q, rest) = parseClauses(toks)
    require(rest.isEmpty, s"unbalanced advanced query at: ${rest.mkString(" ")}")
    q
  }

  private def tokenizeAdvanced(q: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < q.length) {
      q.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => buf += "("; i += 1
        case ')' => buf += ")"; i += 1
        // '-' is the must-not marker whatever follows it (term, group
        // or phrase) — emitted as NOT so `-(a OR b)` negates the group
        case '-' => buf += "NOT"; i += 1
        case '"' =>
          val end = q.indexOf('"', i + 1)
          require(end >= 0, s"unterminated quote in advanced query: $q")
          buf += ("\"" + q.substring(i + 1, end)); i = end + 1
        case _ =>
          val end = q.indexWhere(c => c.isWhitespace || c == '(' || c == ')', i)
          val stop = if (end < 0) q.length else end
          buf += q.substring(i, stop); i = stop
      }
    }
    buf.toList
  }

  /** A clause list (adjacency or OR between clauses): positives fold
    * with OR, top-level negations fold into AND NOT — the tantivy
    * boolean-clause model ([(Should p…), (MustNot n…)] matches
    * (p₁∨p₂∨…) ∧ ¬(n₁∨n₂∨…)); a list with ONLY must-not clauses
    * matches NOTHING (no positive scorer — Lucene/tantivy semantics),
    * surfaced as [[BoolQuery.MatchNone]]. Stray/repeated OR keywords
    * are user noise and skip leniently. */
  private def parseClauses(toks: List[String]): (Option[BoolQuery], List[String]) = {
    val pos = scala.collection.mutable.ListBuffer.empty[BoolQuery]
    val neg = scala.collection.mutable.ListBuffer.empty[BoolQuery]
    var rest = toks
    var continue = true
    while (continue) {
      // explicit OR ≡ adjacency (Should); repeated ORs are noise
      val afterOr = rest.dropWhile(_ == "OR")
      if (afterOr.isEmpty || afterOr.head == ")") {
        rest = afterOr; continue = false
      } else {
        val (q, t2) = parseAnd(afterOr)
        if (t2 == afterOr) { rest = afterOr; continue = false }
        else {
          q.foreach {
            case BoolQuery.Not(x) => neg += x
            case other => pos += other
          }
          rest = t2
        }
      }
    }
    val p = pos.reduceOption(BoolQuery.Or.apply)
    val n = neg.reduceOption(BoolQuery.Or.apply)
    val q = (p, n) match {
      case (Some(a), Some(b)) => Some(BoolQuery.And(a, BoolQuery.Not(b)))
      case (Some(a), None) => Some(a)
      case (None, Some(_)) => Some(BoolQuery.MatchNone)
      case (None, None) => None
    }
    (q, rest)
  }

  private def parseAnd(toks: List[String]): (Option[BoolQuery], List[String]) = {
    var (acc, rest) = parseUnary(toks)
    var continue = true
    while (continue) rest match {
      case "AND" :: tail =>
        val (r, t2) = parseUnary(tail)
        acc = (acc, r) match {
          case (Some(a), Some(b)) => Some(BoolQuery.And(a, b))
          case (a, None) => a
          case (None, b) => b
        }
        rest = t2
      case _ => continue = false
    }
    (acc, rest)
  }

  private def parseUnary(toks: List[String]): (Option[BoolQuery], List[String]) =
    toks match {
      case "NOT" :: tail =>
        val (q, rest) = parseUnary(tail)
        (q.map(BoolQuery.Not.apply), rest)
      case "(" :: tail =>
        val (q, rest) = parseClauses(tail)
        rest match {
          case ")" :: t2 => (q, t2)
          case _ => throw new IllegalArgumentException(
            "unbalanced parenthesis in advanced query")
        }
      case t :: tail if t.startsWith("\"") =>
        val p = t.drop(1).trim.toLowerCase
        (if (p.isEmpty) None else Some(BoolQuery.Phrase(p)), tail)
      case t :: tail if t != ")" && t != "AND" && t != "OR" =>
        // a term with internal separators ("state-of-the-art") splits
        // into the tokens the main tokenizer would emit (it splits on
        // non-alphanumerics) and conjoins them — collapsing to one
        // glued token would produce a term no tokenizer output can
        // ever equal, silently matching nothing. Conjunction, not
        // phrase: the compiled Phrase is substring containment of the
        // space-joined form, which the separator-bearing original
        // text does not contain.
        val parts = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val q = parts.map(p => BoolQuery.Term(p): BoolQuery)
          .reduceOption(BoolQuery.And(_, _))
        (q, tail)
      case rest => (None, rest)
    }

  /** Compile a [[BoolQuery]] to a `Column` predicate over the document:
    * terms are token membership (the same tokenizer that built the
    * postings), phrases are lowercase containment — the MUST-clause
    * semantics the reference intersects with the keyword search.
    * `toksCol` must be a STAGED tokens column (one `withColumn`, so a
    * multi-term tree never re-runs the tokenizer per leaf — the same
    * let-binding discipline as the shingle builder). */
  def compileAdvanced(q: BoolQuery,
      toksCol: org.apache.spark.sql.Column,
      textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array_contains, lower}
    def go(b: BoolQuery): org.apache.spark.sql.Column = b match {
      case BoolQuery.Term(t) => array_contains(toksCol, t)
      case BoolQuery.Phrase(p) => lower(textCol).contains(p)
      case BoolQuery.And(l, r) => go(l) && go(r)
      case BoolQuery.Or(l, r) => go(l) || go(r)
      case BoolQuery.Not(x) => !go(x)
      case BoolQuery.MatchNone => org.apache.spark.sql.functions.lit(false)
    }
    go(q)
  }
}
