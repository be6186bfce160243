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
}
