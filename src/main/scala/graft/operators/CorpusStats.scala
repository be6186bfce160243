package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-relative text statistics — quality signals that need the
  * corpus distribution, unlike the per-row scores in
  * [[graft.functions.TextFunctions]] (length/punctuation/stopword
  * ratios are absolute; "how typical is this document's vocabulary"
  * is relative).
  */
object CorpusStats {

  /** Unigram log-probability quality score: avg over a document's
    * tokens of ln(corpus probability of the token) — the
    * KenLM-perplexity stand-in every large-scale quality pipeline
    * applies (documents full of rare/garbage tokens score lowest).
    * Also emits the type-token ratio (distinct/total tokens), the
    * complementary repetitiveness signal.
    *
    * Scale shape: one shuffle for the term-frequency dictionary (hash
    * agg with map-side partials), one broadcast of that dictionary
    * (vocabulary-sized, not corpus-sized) back onto the token stream,
    * one shuffle for the per-document aggregate. The corpus total is a
    * 1-row broadcast.
    *
    * @return (idCol, logprob, ttr) — both rounded at 4
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    // cache the vocabulary-sized dictionary: without it the total
    // aggregate re-runs the corpus scan + term aggregation (exchange
    // reuse does not fire across the re-analyzed branches); registered
    // with graft.Caches for release after the query's terminal action
    val freq = graft.Caches.cache(toks.groupBy("term").agg(count(lit(1)).as("tf")))
    val total = freq.agg(sum(col("tf")).cast("double").as("__n"))
    toks
      .join(broadcast(freq), "term")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        round(avg(log(col("tf") / col("__n"))), 4).as("logprob"),
        round(countDistinct(col("term")).cast("double") / count(lit(1)), 4).as("ttr"))
  }
}
