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

  /** Language-ID prediction against a trained trigram profile TABLE
    * ([[graft.sources.Ingest.trainLangProfiles]]) — the join-based
    * serving shape: explode doc trigrams once, broadcast-join the
    * (driver-scale) profile rows, and aggregate per (doc, lang) with
    * map-side combine, so the shuffle carries |docs|×|langs| partial
    * sums, never the trigram stream. Unseen trigrams contribute
    * `floor`: Σ_occ coalesce(logp, floor) = Σ_matched (logp − floor) +
    * floor × n_trigrams, which the inner join + per-doc trigram count
    * computes without materializing misses. Scores round at 4,
    * prediction = argmax (lang-asc tiebreak) — identical semantics to
    * the per-row literal form
    * ([[graft.functions.TextFunctions.langIdFromProfiles]]), which
    * suits tiny models in single-row paths; this form is the corpus-
    * scan path (Spark's higher-order lambdas are interpreted, so at
    * corpus scale the codegen'd join wins ~10×).
    *
    * @return (idCol, predicted, score)
    */
  def langIdPredict(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, floor: Double = -20.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cache the trigram arrays: both the match branch and the per-doc
    // count branch read them, and the (interpreted) higher-order
    // trigram build is the expensive part of this plan — computed once,
    // released by the serving layer via graft.Caches
    val base = graft.Caches.cache(docs
      .withColumn("__tris", TextFunctions.charTrigrams(col(textCol)))
      .select(col(idCol), col("__tris"), size(col("__tris")).as("__n")))
    val tri = base.select(col(idCol), explode(col("__tris")).as("tg"))
    val matched = tri.join(broadcast(profiles), "tg")
      .groupBy(col(idCol), col("plang"))
      .agg(sum(col("logp") - lit(floor)).as("__m"))
    val langs = profiles.select("plang").distinct()
    val scored = base.select(col(idCol), col("__n"))
      .crossJoin(broadcast(langs))
      .join(matched, Seq(idCol, "plang"), "left")
      .withColumn("score",
        round(coalesce(col("__m"), lit(0.0)) + lit(floor) * col("__n"), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("plang").asc)
    scored.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(idCol), col("plang").as("predicted"), col("score"))
  }

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
