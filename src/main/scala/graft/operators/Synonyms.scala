package graft.operators

/** Query-side synonym expansion: `term → (term OR syn1 OR syn2)`.
  *
  * Reference: `search/search/query_parser/parsers/common.py:174-219` —
  * synonyms are applied to the query string before retrieval, never to
  * the index. Same here: a driver-side rewrite producing an expanded
  * term list (broadcast-sized by construction), so the posting lookup
  * stays a pruned scan.
  */
object Synonyms {
  def expand(terms: Seq[String], synonyms: Map[String, Seq[String]]): Seq[String] =
    (terms ++ terms.flatMap(t => synonyms.getOrElse(t, Nil))).distinct
}
