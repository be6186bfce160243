package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Positional phrase search — the index-level form of quoted-phrase
  * matching (`nidx_paragraph/src/query_parser.rs` exact clauses match
  * against tantivy's positional postings, not substring containment).
  *
  * A positions table (docId, pos, term) is the posting list with
  * positions; a phrase of n terms matches where all n terms align to
  * consecutive positions — expressed as n position-shifted self-joins
  * on (doc, start). At scale the positions table is ingest-time state
  * partitioned by term, and each join leg is a term-pruned scan.
  */
object PhraseSearch {

  /** (docId, pos, term) — one row per token occurrence, 0-based. */
  def positions(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))

  /** Count exact phrase occurrences per document (from-raw-text form —
    * production serves [[phraseOccurrencesFromPositions]] over the
    * positional posting table built at ingest). */
  def phraseOccurrences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame =
    phraseOccurrencesFromPositions(positions(docs, idCol, textCol), idCol, phrase)

  /** Phrase occurrences served from an at-rest positional posting
    * table (idCol, pos, term) — the tantivy positions contract: each
    * join leg is a `term = t` PRUNED scan of the positions table (the
    * predicate pushes into parquet), so a phrase query reads only its
    * terms' postings, never the corpus text.
    */
  def phraseOccurrencesFromPositions(
      positions: DataFrame,
      idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val aligned = phrase.zipWithIndex.map { case (t, i) =>
      positions.where(col("term") === t)
        .select(col(idCol), (col("pos") - i).as("start"))
    }
    aligned.reduce((a, b) => a.join(b, Seq(idCol, "start")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_occurrences"))
  }
}
