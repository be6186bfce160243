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

  /** [[unigramLogProb]] served from the AT-REST index pair — the
    * request-time shape: `postings` (term, id, tf, …) already holds
    * each document's distinct terms with their in-doc counts, and
    * `termFreq` (term, freq) is the corpus dictionary rolled up at
    * ingest, so a request pays NO tokenize pass and NO corpus-wide
    * term aggregation. Identical scores by algebra: the per-occurrence
    * average equals the tf-weighted average Σ tf·ln p / Σ tf, and
    * TTR = distinct/total = posting-row count / Σ tf (postings are
    * distinct per (term, id) by construction). Plan: one posting scan
    * ⨝ broadcast dictionary → one per-doc aggregate; the corpus total
    * is a 1-row broadcast off the vocabulary-sized dictionary.
    */
  def unigramLogProbFromPostings(postings: DataFrame, termFreq: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val total = termFreq.agg(sum(col("freq")).cast("double").as("__n"))
    postings.join(broadcast(termFreq), "term")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        round(sum(col("tf") * log(col("freq") / col("__n"))) / sum(col("tf")), 4)
          .as("logprob"),
        round(count(lit(1)).cast("double") / sum(col("tf")), 4).as("ttr"))
  }

  /** Interpolated bigram log-probability — the CCNet/KenLM-style
    * perplexity filter one order up from [[unigramLogProb]]: per
    * bigram occurrence (w1,w2) the score is
    * ln(λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/N), averaged per document —
    * word-salad documents (real words, impossible transitions) score
    * low even when their unigram profile looks normal. c(w1) is the
    * plain unigram count (the MLE boundary approximation: a token's
    * final occurrence in a doc still counts in the denominator).
    *
    * Scale shape: the unigram dictionary is vocabulary-sized →
    * broadcast (as in [[unigramLogProb]]); the BIGRAM dictionary is
    * NOT broadcast — bigram vocabularies grow with the corpus, so
    * the bigram stream joins its own count table on the bigram key
    * (one hash-partitioned shuffle each side; AQE broadcasts it when
    * it is small). One final per-doc aggregate. Docs with < 2 tokens
    * have no bigrams and drop out (inner-join semantics).
    *
    * @return (idCol, bigram_lp rounded at 4, n_bigrams)
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.7): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    // cache the token arrays: three consumers read them (unigram freq,
    // bigram freq, the scored bigram stream) and the interpreted
    // tokenize is the expensive part — the langIdPredict trade. At
    // true corpus scale the freq tables come from the at-rest posting
    // build instead (Ingest.termPostings); this form is the
    // train-and-score-in-one-pass shape
    val base = graft.Caches.cache(docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__t")))
    val uni = base.select(explode(col("__t")).as("term"))
    val freq = graft.Caches.cache(
      uni.groupBy("term").agg(count(lit(1)).as("c1")))
    val total = freq.agg(sum(col("c1")).cast("double").as("__n"))
    val (bw1, bw2) = TextFunctions.bigramPair(col("bigram"))
    val bg = base.select(col(idCol),
        explode(TextFunctions.shingles(col("__t"), 2)).as("bigram"))
      .withColumn("w1", bw1)
      .withColumn("w2", bw2)
    val bfreq = bg.groupBy("bigram").agg(count(lit(1)).as("c12"))
    bg.join(bfreq, "bigram")
      .join(broadcast(freq.withColumnRenamed("term", "w1")), "w1")
      .join(broadcast(freq.withColumnRenamed("term", "w2")
        .withColumnRenamed("c1", "c2")), "w2")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        round(avg(log(
          lit(lambda) * col("c12") / col("c1") +
            lit(1 - lambda) * col("c2") / col("__n"))), 4).as("bigram_lp"),
        count(lit(1)).as("n_bigrams"))
  }

  /** [[bigramLogProb]] served from the AT-REST bigram pair — the
    * request-time shape: `bigrams` (id, w1, w2, tf) holds each
    * document's distinct bigrams with in-doc counts, `bigramFreq`
    * (w1, w2, freq) is the corpus dictionary rolled up at ingest, and
    * `termFreq` (term, freq) supplies the unigram interpolation terms.
    * No tokenize pass, no corpus-wide aggregation at request time, and
    * the (w1, w2) dictionary join reuses the shared bucket layout
    * exchange-free (plan-pinned in ScaleDesignSpec) — the bigram
    * dictionary grows with the corpus, so unlike the unigram side it
    * must never rely on a broadcast. Identical scores by the same
    * algebra as [[unigramLogProbFromPostings]]: tf-weighted average ≡
    * per-occurrence average, n_bigrams = Σ tf.
    */
  def bigramLogProbFromPostings(bigrams: DataFrame, bigramFreq: DataFrame,
      termFreq: DataFrame, lambda: Double = 0.7,
      idCol: String = "doc_id"): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val total = termFreq.agg(sum(col("freq")).cast("double").as("__n"))
    val uni1 = termFreq.select(col("term").as("w1"), col("freq").as("c1"))
    val uni2 = termFreq.select(col("term").as("w2"), col("freq").as("c2"))
    bigrams.join(bigramFreq, Seq("w1", "w2"))
      .join(broadcast(uni1), "w1")
      .join(broadcast(uni2), "w2")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        round(sum(col("tf") * log(
          lit(lambda) * col("freq") / col("c1") +
            lit(1 - lambda) * col("c2") / col("__n"))) / sum(col("tf")), 4)
          .as("bigram_lp"),
        sum(col("tf")).as("n_bigrams"))
  }

  /** Domain-likeness scoring — the fastText-style quality filter
    * (GPT-3/CCNet keep pages that "look like" a curated corpus):
    * a multinomial Naive-Bayes log-odds of the `target` class vs the
    * rest, trained on the corpus itself with add-one smoothing over
    * the joint vocabulary, averaged per token occurrence so long
    * documents aren't favored. score(d) = avg_t [ln P(t|target) −
    * ln P(t|rest)], P(t|c) = (c_c(t)+1)/(T_c+V). Positive = the
    * document's vocabulary resembles the target class more than the
    * rest of the corpus.
    *
    * Scale shape: identical to [[unigramLogProb]] — one shuffle for
    * the per-term class counts (map-side partials), the
    * vocabulary-sized count table broadcasts back onto the token
    * stream, one per-doc aggregate; totals are a 1-row broadcast.
    *
    * @return (idCol, labelCol, odds rounded at 4)
    */
  def classLikeness(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, target: String): DataFrame = {
    // a typo'd target would make ct = 0 for every term and silently
    // degenerate the odds into a corpus-rarity ranking — fail loudly
    // instead (one pruned-scan probe; this is a corpus-training op,
    // not a per-request path). Same silent-wrong-answer guard as
    // Trainsets.splitLeakage's trainName require.
    require(!docs.where(col(labelCol) === lit(target)).isEmpty,
      s"target class '$target' has no rows in column '$labelCol'")
    val toks = docs.select(col(idCol), col(labelCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val isT = col(labelCol) === lit(target)
    val counts = graft.Caches.cache(toks.groupBy("term").agg(
      sum(when(isT, 1L).otherwise(0L)).as("ct"),
      sum(when(isT, 0L).otherwise(1L)).as("cr")))
    val totals = counts.agg(
      sum(col("ct")).cast("double").as("__tt"),
      sum(col("cr")).cast("double").as("__tr"),
      count(lit(1)).cast("double").as("__v"))
    toks.join(broadcast(counts), "term")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(
        max(col(labelCol)).as(labelCol),
        round(avg(
          log((col("ct") + 1) / (col("__tt") + col("__v"))) -
            log((col("cr") + 1) / (col("__tr") + col("__v")))), 4).as("odds"))
  }

  /** [[classLikeness]] served from the at-rest posting table — the
    * same move as [[unigramLogProbFromPostings]]: no tokenize pass at
    * request time (the tokenizing form pays the regex split TWICE —
    * once materializing the count cache, once in the scoring plan).
    * Class labels join on from `docClasses` (idCol, labelCol) — one
    * narrow corpus join instead of two tokenize passes; the
    * per-occurrence average becomes the tf-weighted form
    * Σ tf·odds / Σ tf, which is algebraically identical
    * (equality-tested in TrainsetsSpec).
    *
    * @return (idCol, labelCol, odds rounded at 4)
    */
  def classLikenessFromPostings(postings: DataFrame, docClasses: DataFrame,
      idCol: String, labelCol: String, target: String): DataFrame = {
    val p = postings.join(docClasses.select(col(idCol), col(labelCol)), idCol)
    val isT = col(labelCol) === lit(target)
    val counts = graft.Caches.cache(p.groupBy("term").agg(
      sum(when(isT, col("tf")).otherwise(0L)).as("ct"),
      sum(when(isT, 0L).otherwise(col("tf"))).as("cr")))
    // totals collapse to three literals off the CACHED count table
    // (vocab-sized — a driver-scale read, like a query-vector
    // literal), and the collect doubles as the typo'd-target guard:
    // a target with zero token mass would silently degenerate the
    // odds into a corpus-rarity ranking. The tokenizing form pays a
    // separate corpus-probe job for the same guard.
    val t = counts.agg(
      sum(col("ct")).cast("double"),
      sum(col("cr")).cast("double"),
      count(lit(1)).cast("double")).first()
    val (tt, tr, v) =
      if (t.isNullAt(0)) (0.0, 0.0, 0.0)
      else (t.getDouble(0), t.getDouble(1), t.getDouble(2))
    require(tt > 0,
      s"target class '$target' has no token mass in column '$labelCol'")
    val odds = log((col("ct") + 1) / lit(tt + v)) -
      log((col("cr") + 1) / lit(tr + v))
    p.join(broadcast(counts), "term")
      .groupBy(col(idCol))
      .agg(
        max(col(labelCol)).as(labelCol),
        round(sum(col("tf") * odds) / sum(col("tf")), 4).as("odds"))
  }

  /** Vocabulary-drift report between two corpus snapshots — the
    * dataset-release QA diff: for each term, its relative frequency in
    * snapshot A vs snapshot B and the shift, top-k by absolute shift.
    * A release that silently gains a scraper's boilerplate or loses a
    * source shows up here before it shows up in model evals.
    *
    * Scale shape: one tokenize+aggregate per snapshot (vocabulary-
    * sized outputs), a vocabulary-sized outer join, 1-row totals —
    * both corpora stream through exactly once.
    *
    * @return (term, pa, pb, delta) — delta = pb − pa rounded at 6,
    *         ordered by |delta| desc (term asc ties), top k
    */
  def vocabularyDrift(a: DataFrame, b: DataFrame, textCol: String,
      k: Int = 20): DataFrame = {
    def freq(d: DataFrame, cname: String) = d
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as(cname))
    val fa = freq(a, "__ca")
    val fb = freq(b, "__cb")
    val joined = fa.join(fb, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val totals = joined.agg(
      sum(col("__ca")).cast("double").as("__ta"),
      sum(col("__cb")).cast("double").as("__tb"))
    val pa = round(col("__ca") / col("__ta"), 6)
    val pb = round(col("__cb") / col("__tb"), 6)
    joined.crossJoin(broadcast(totals))
      .select(col("term"), pa.as("pa"), pb.as("pb"),
        round(col("__cb") / col("__tb") - col("__ca") / col("__ta"), 6).as("delta"))
      .orderBy(abs(col("delta")).desc, col("term").asc)
      .limit(k)
  }

  /** Per-language tokenizer fertility — BPE-style pre-tokens per
    * whitespace word ([[TextFunctions.bpePreTokenCount]] over
    * whitespace words): the budget-calibration metric for
    * multilingual mixes (a language with fertility 2× eats twice the
    * context window per word, so token budgets must be set per
    * language, not per word count). Narrow per-row counters + one
    * per-language aggregate.
    *
    * @return (langCol, n_docs, fertility) — fertility = total
    *         pre-tokens / total whitespace words, rounded at 4
    */
  def tokenizerFertility(docs: DataFrame, langCol: String,
      textCol: String): DataFrame = {
    val words = size(filter(split(col(textCol), " "), w => w =!= ""))
    docs
      .select(col(langCol),
        TextFunctions.bpePreTokenCount(col(textCol)).cast("long").as("__t"),
        words.cast("long").as("__w"))
      .where(col("__w") > 0)
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("__t")) / sum(col("__w")).cast("double"), 4).as("fertility"))
  }

  /** Domain-level quality gating — the C4/RefinedWeb curation move one
    * level above per-document scores: average the per-doc quality
    * signal over each source domain and keep only documents from
    * domains whose MEAN clears the bar (a domain full of borderline
    * docs is usually boilerplate/spam even when individual docs
    * squeak past a per-doc threshold). Domain mean rounds at 4 BEFORE
    * the comparison so the gate is reproducible across engines.
    *
    * Scale shape: the per-doc score is a narrow scan-stage expression;
    * ONE aggregation shuffle produces the domain-sized mean table,
    * which broadcasts back onto the corpus — the corpus side never
    * shuffles.
    *
    * @return (idCol, domainCol, domain_quality) for kept documents
    */
  def domainQualityGate(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, minMean: Double): DataFrame = {
    // token-less docs carry no quality evidence (their score is 0/0):
    // they drop here, matching the tokenizing oracle's semantics.
    // cached: both the domain aggregate and the final join read this
    // doc-sized projection, and without the cache the corpus tokenize
    // + scoring pass would run twice per request
    val dq = graft.Caches.cache(docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .where(size(col("__toks")) > 0)
      .select(col(idCol), col(domainCol),
        TextFunctions.qualityScore(col("__toks")).as("__q")))
    val dm = dq.groupBy(col(domainCol))
      .agg(round(avg(col("__q")), 4).as("domain_quality"))
      .where(col("domain_quality") >= minMean)
    dq.join(broadcast(dm), domainCol)
      .select(col(idCol), col(domainCol), col("domain_quality"))
  }

  /** Per-document top-k tf-idf keywords — the keyword-extraction pass
    * that labels/tags a corpus for curation dashboards and
    * weak-supervision tasks. Served from the at-rest posting table
    * ([[graft.sources.Ingest.termPostings]]: one row per (term, doc)
    * with tf precomputed — no tokenize pass at request time): document
    * frequency is a rollup of the SAME posting rows (count of rows per
    * term ≡ count of docs), idf = ln((N+1)/(df+1)), score = tf·idf.
    * Stopwords are excluded up front so the "keywords" are content
    * terms.
    *
    * Scale shape: one hash-agg shuffle for the df dictionary
    * (vocabulary-sized output), a broadcast of that dictionary back
    * onto the postings, and ONE exchange on the doc id for the
    * bounded per-document window (partition = one document's terms,
    * never the corpus). The corpus doc count is a 1-row broadcast —
    * pass the at-rest doc-lengths table (one row per tokenized doc,
    * [[graft.sources.IndexStore.docLengths]]) so it costs a count of
    * doc-sized rows; without it the count falls back to a distinct
    * over the posting table (correct, but a corpus-column dedup
    * shuffle the lengths table makes unnecessary).
    *
    * @return (idCol, term, score, rank) — rank 1..k per document
    */
  def tfidfKeywords(postings: DataFrame, idCol: String, k: Int = 3,
      stopWords: Seq[String] = TextFunctions.StopWords,
      docLengths: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = postings.where(!col("term").isin(stopWords: _*))
    val dfTab = p.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    // docLengths holds exactly the docs with ≥1 token — the same doc
    // set a distinct over the postings would produce
    val nDocs = docLengths
      .map(_.agg(count(lit(1)).cast("double").as("__n")))
      .getOrElse(postings.agg(countDistinct(col(idCol)).cast("double").as("__n")))
    val scored = p.join(broadcast(dfTab), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log((col("__n") + 1) / (col("__df") + 1)), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("score"),
        col("rank").cast("long").as("rank"))
  }

  /** Corpus-release shingle overlap — the dataset-versioning dual of
    * [[vocabularyDrift]]: how much VERBATIM n-gram content two corpus
    * snapshots share (Jaccard over their distinct shingle sets), the
    * release-to-release contamination/reuse report that decides
    * whether a "new" crawl actually adds data. Membership granularity
    * is the same hashed shingle the dedup family keys on, so the
    * measurement agrees with what near-dup dedup would collapse.
    *
    * Scale shape: both sides aggregate to their DISTINCT shingle sets
    * (hash aggs with map-side partials), then one full-outer join on
    * the shingle key counts the three regions in a single pass — fed
    * from the at-rest bucketed shingle tables
    * ([[graft.sources.IndexStore.shingles]]), the join reuses the
    * bucket layout, and nothing corpus-sized reaches the driver (the
    * output is ONE row).
    *
    * @param a,b (id, shingle) posting tables (duplicates fine)
    * @return one row (n_a, n_b, n_common, jaccard) — jaccard rounded
    *         at 6
    */
  def shingleOverlap(a: DataFrame, b: DataFrame): DataFrame = {
    val sa = a.select(col("shingle")).distinct()
      .withColumn("__in_a", lit(1))
    val sb = b.select(col("shingle")).distinct()
      .withColumn("__in_b", lit(1))
    sa.join(sb, Seq("shingle"), "full_outer")
      .agg(
        sum(coalesce(col("__in_a"), lit(0))).cast("long").as("n_a"),
        sum(coalesce(col("__in_b"), lit(0))).cast("long").as("n_b"),
        sum(when(col("__in_a").isNotNull && col("__in_b").isNotNull, 1)
          .otherwise(0)).cast("long").as("n_common"))
      .select(col("n_a"), col("n_b"), col("n_common"),
        round(col("n_common") /
          (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4): per
    * language, rank documents by their LM score and split into equal
    * head/middle/tail thirds — the standard training-data layout where
    * "head" (lowest perplexity ≡ highest log-prob) is the cleanest
    * slice and downstream mixes sample per bucket. `scored` carries one
    * LM score per doc (higher = better, e.g.
    * [[bigramLogProbFromPostings]]'s `bigram_lp`); ties break on id so
    * the assignment is deterministic and engine-portable (SQL ntile
    * semantics: earlier buckets take the remainder rows).
    *
    * Scale note: ntile needs a per-language global sort, and language
    * is a HOT key (one language can carry most of a 100 TB corpus) —
    * this exact form is the oracle semantics and the right tool up to
    * partition-sized languages. At full scale assign by score-boundary
    * comparison instead ([[perplexityBucketsApprox]]): per-language
    * approximate percentile boundaries (a bounded aggregate) broadcast
    * back into a scan-stage comparison — no sort, no skewed window;
    * agreement vs the exact form is measured in TrainsetsSpec.
    *
    * @return scored + (bucket ∈ buckets)
    */
  def perplexityBuckets(scored: DataFrame, idCol: String, langCol: String,
      scoreCol: String,
      buckets: Seq[String] = Seq("head", "middle", "tail")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets.nonEmpty, "need at least one bucket name")
    val w = Window.partitionBy(col(langCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    scored.withColumn("__nt", ntile(buckets.size).over(w))
      .withColumn("bucket", element_at(typedlit(buckets), col("__nt")))
      .drop("__nt")
  }

  /** The 100 TB shape of [[perplexityBuckets]]: per-language APPROX
    * percentile boundaries of the score (one bounded aggregate —
    * |languages| × |buckets−1| doubles), broadcast back and assigned by
    * comparison in the scan stage. No per-language sort, so a dominant
    * language costs a scan, not a single-reducer window. Bucket
    * boundaries are approximate (percentile_approx), so rows near a
    * boundary may land one bucket off the exact tertile — the
    * agreement rate is measured in TrainsetsSpec.
    */
  def perplexityBucketsApprox(scored: DataFrame, idCol: String,
      langCol: String, scoreCol: String,
      buckets: Seq[String] = Seq("head", "middle", "tail"),
      accuracy: Int = 10000): DataFrame = {
    require(buckets.nonEmpty, "need at least one bucket name")
    val n = buckets.size
    // boundaries at the (1/n, 2/n, …) quantiles of the DESC order ≡
    // (1−i/n) quantiles of the natural order
    val qs = (1 until n).map(i => 1.0 - i.toDouble / n)
    val bounds = scored.groupBy(col(langCol))
      .agg(percentile_approx(col(scoreCol), typedlit(qs), lit(accuracy))
        .as("__bounds"))
    // bucket = count of boundaries the score is strictly below, +1
    val rank = (lit(1) + aggregate(col("__bounds"), lit(0),
      (acc, b) => acc + when(col(scoreCol) < b, 1).otherwise(0)))
    scored.join(broadcast(bounds), langCol)
      .withColumn("bucket", element_at(typedlit(buckets), rank))
      .drop("__bounds")
  }
}
