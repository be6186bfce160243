package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based BM25 scoring over a document corpus.
  *
  * The reference scores full-text matches with tantivy's BM25
  * (`nidx/nidx_text/src/reader.rs:367-451`); tantivy keeps per-segment
  * term statistics. Spark-first re-expression: corpus statistics (doc
  * length, avgdl, document frequency) are DataFrames and the score is a
  * map-side join + aggregation — no UDF, no collect, fully codegen'd.
  *
  * Scale design (100 TB): `docLengths` and the posting lists (`tf`) are
  * precomputable tables (the analog of tantivy segments); the per-query
  * work is then a broadcast semi-join of the tiny query-term list
  * against the posting table — the shuffle is only on the (small)
  * matching subset, grouped by doc id. `stats` (N, avgdl) is a 1-row
  * broadcast. Nothing here is proportional to corpus size at query time
  * except the posting lookup, which Parquet/Delta predicate pushdown on
  * `term` turns into a pruned scan.
  */
object Bm25 {

  case class Params(k1: Double = 1.2, b: Double = 0.75)

  /** Precomputed population statistics — the (N, avgdl) pair the
    * scorer otherwise aggregates from the (restricted) doclengths
    * table per request. For a KNOWN filter population (a hot facet
    * like `lang = en`), compute once at ingest with [[corpusStats]]
    * and pass through [[scoreFromPostings]]'s `cachedStats`: the
    * per-request population scan disappears — the one deliberately
    * corpus-fraction-linear piece of a prefiltered find
    * (filter-then-score stats) becomes two literals. */
  final case class CorpusStats(nDocs: Long, avgdl: Double)

  /** Aggregate [[CorpusStats]] for a (possibly restricted) doclengths
    * population — the ingest-time companion of `cachedStats`. The
    * caller owns the population definition: pass EXACTLY the frame the
    * serving path would restrict to (e.g. repeated-excluded paragraph
    * doclengths semi-joined to the filter's doc ids), or the cached
    * scores silently drift from the filter-then-score contract. */
  def corpusStats(docLengths: DataFrame, idCol: String,
      allowed: Option[DataFrame] = None): CorpusStats = {
    val dls = allowed match {
      case Some(ids) => graft.operators.Prefilter.semiJoin(docLengths, idCol, ids)
      case None => docLengths
    }
    val r = dls.agg(count(lit(1)).as("n"), avg(col("dl")).as("a"))
      .collect().head
    CorpusStats(r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
  }

  /** Token stream (docId, term) — one row per occurrence. */
  def tokenStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))

  /** Score every document that matches ≥1 query term.
    * Returns (idCol, score: double) — raw, un-rounded.
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene/tantivy form)
    * tfn = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      params: Params = Params()): DataFrame = {
    val terms = queryTerms.distinct
    val tok = tokenStream(docs, idCol, textCol)
    // ONE aggregation pass computes per-doc length AND the per-term tf
    // columns (conditional counts) — the corpus is tokenized and
    // shuffled once, not once for dl and again for matches.
    val perDoc = tok.groupBy(idCol).agg(
      count(lit(1)).as("dl"),
      terms.map(t =>
        sum(when(col("term") === t, 1L).otherwise(0L)).as(s"__tf_$t")): _*)
    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // long form: (id, dl, term, tf) for matching terms only
    val tfEntries = terms.flatMap(t => Seq(lit(t), col(s"__tf_$t")))
    val longForm = perDoc.select(col(idCol), col("dl"),
        explode(map(tfEntries: _*)).as(Seq("term", "tf")))
      .where(col("tf") > 0)
      .withColumn("tf", col("tf").cast("double"))
    val df = longForm.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    val k1 = lit(params.k1)
    val b = lit(params.b)
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = (col("tf") * (k1 + lit(1.0))) /
      (col("tf") + k1 * (lit(1.0) - b + b * col("dl") / col("avgdl")))

    longForm.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", idf * tfn)
      .groupBy(idCol)
      .agg(sum(col("term_score")).as("score"))
  }

  /** BM25 over a precomputed posting table — the production path.
    *
    * `postings` is the ingest-time inverted index
    * ([[graft.sources.Ingest.termPostings]]: term, id, tf) and
    * `docLengths` the per-doc token counts; both are plain tables (the
    * tantivy-segment analog). At query time the `term IN (...)`
    * predicate pushes into the parquet scan — the engine reads only the
    * matching posting rows, never re-tokenizes the corpus. Score math is
    * identical to [[score]].
    */
  def scoreFromPostings(
      postings: DataFrame,
      docLengths: DataFrame,
      idCol: String,
      queryTerms: Seq[String],
      params: Params = Params(),
      allowed: Option[DataFrame] = None,
      cachedStats: Option[CorpusStats] = None,
      atRestDfCol: Option[String] = None,
      // a registered (term, df) table for THIS restricted population
      // (round 19, VERDICT r18 #1 "optionally per-term df"): when set,
      // the per-request df aggregation — which re-instantiates the
      // whole restricted posting subtree a second time — becomes one
      // pruned scan of the small dictionary joined broadcast. The
      // CALLER asserts the table was counted over exactly the
      // restricted population in hand (the registration builds it
      // from the same shared frames). Takes precedence over
      // `atRestDfCol`; only meaningful with `cachedStats` (else the
      // doclengths side still aggregates).
      cachedDf: Option[DataFrame] = None): DataFrame = {
    // `allowed` restricts the searchable corpus to a prefiltered id set
    // (the reference's PrefilterResult pushed into the index search).
    // Both the postings AND the stats tables are restricted, so scores
    // equal [[score]] run over exactly the allowed documents — the
    // engine's filter-then-score contract (every oracle computes BM25
    // over the filtered corpus). DELIBERATE divergence from the
    // reference: tantivy keeps segment-GLOBAL statistics and a
    // prefilter only masks candidate docs (`nidx_text/src/reader.rs`),
    // so its prefiltered scores reflect the unfiltered df/avgdl. Either
    // choice is defensible; this one keeps scores self-consistent
    // within the visible corpus (a doc's score is independent of
    // documents the caller cannot see).
    val dls = allowed match {
      case Some(ids) => graft.operators.Prefilter.semiJoin(docLengths, idCol, ids)
      case None => docLengths
    }
    // a cached (N, avgdl) replaces the population aggregation with two
    // INLINE literals (round 18: the former 1-row crossJoin frame still
    // cost a BroadcastExchange build job per request under AQE); with
    // dl denormalized on the postings, the doclengths table then never
    // enters the plan at all
    val stats = cachedStats match {
      case Some(_) => None
      case None => Some(dls.agg(
        count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl")))
    }
    // postings written by the current ingest denormalize `dl` onto each
    // row (tantivy's per-posting fieldnorm) — then the per-row lengths
    // join vanishes and `docLengths` is read only for the (broadcast,
    // 1-row) stats aggregate. Older posting tables without the column
    // take the join path unchanged. A NULL dl on the fast path fails
    // loudly: a multi-path segment read silently nulls the column for
    // segments written before it existed (schema union, not a
    // unionByName error), and a null would otherwise null the score
    // and drop the doc — raise instead, naming the remedy.
    val hasDl = postings.columns.contains("dl")
    // at-rest df (round 18): ingest denormalizes each term's document
    // frequency onto its posting rows (the tantivy term dictionary
    // stores exactly this doc_freq), so an UNRESTRICTED request skips
    // the per-request df aggregation — one pruned scan scores directly.
    // Opt-in by the CALLER (it asserts the frame in hand is the exact
    // population the stored df was counted over); never valid with an
    // `allowed` restriction, which changes the population.
    val atDf = atRestDfCol.filter(c =>
      cachedDf.isEmpty && // a registered restricted df table wins
        allowed.isEmpty && postings.columns.contains(c) &&
        postings.columns.contains("dl")) // df and dl denormalize together
    val matched = postings.where(col("term").isInCollection(queryTerms))
    val restricted = allowed match {
      case Some(ids) => graft.operators.Prefilter.semiJoin(matched, idCol, ids)
      case None => matched
    }
    val baseCols = Seq(col(idCol), col("term"),
      col("tf").cast("double").as("tf")) ++
      (if (hasDl) Seq(coalesce(col("dl"), raise_error(lit(
          "posting row with NULL dl — this root mixes segments written " +
            "before the dl column existed; recompact from source"))
          .cast(restricted.schema("dl").dataType)).as("dl"))
       else Nil) ++
      // ADVICE r18 (medium): guard the at-rest df like dl above — a
      // root mixing pre-r18 posting files (no df column) with new ones
      // schema-unions to a NULLABLE df, and a null idf would silently
      // null the term's contribution (wrong scores / dropped docs)
      // instead of failing loudly
      atDf.map(c => coalesce(col(c), raise_error(lit(
          "posting row with NULL df — this root mixes segments written " +
            "before the at-rest df column existed; recompact from source"))
          .cast(restricted.schema(c).dataType)).cast("double").as("df")).toSeq
    val tf = restricted.select(baseCols: _*)

    val k1 = lit(params.k1)
    val b = lit(params.b)
    // cached stats inline as literals — same doubles the aggregation
    // would produce, zero plan nodes
    val (nDocsCol, avgdlCol) = cachedStats match {
      case Some(cs) => (lit(cs.nDocs.toDouble), lit(cs.avgdl))
      case None => (col("n_docs"), col("avgdl"))
    }
    val idf = log(lit(1.0) +
      (nDocsCol - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = (col("tf") * (k1 + lit(1.0))) /
      (col("tf") + k1 * (lit(1.0) - b + b * col("dl") / avgdlCol))

    val withDf = (cachedDf, atDf) match {
      case (Some(dfTab), _) =>
        // registered restricted df: pruned dictionary scan, broadcast
        // — every term with a surviving tf row has an entry (the
        // table was counted over the same restricted rows), so the
        // inner join drops nothing
        val pruned = dfTab.where(col("term").isInCollection(queryTerms))
          .select(col("term"), col("df").cast("double").as("df"))
        if (hasDl) tf.join(broadcast(pruned), "term")
        else tf.join(broadcast(pruned), "term").join(dls, idCol)
      case (None, Some(_)) => tf
      case (None, None) =>
        val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
        if (hasDl) tf.join(broadcast(df), "term")
        else tf.join(broadcast(df), "term").join(dls, idCol)
    }
    stats.fold(withDf)(st => withDf.crossJoin(broadcast(st)))
      .withColumn("term_score", idf * tfn)
      .groupBy(idCol)
      .agg(sum(col("term_score")).as("score"))
  }

  /** Top-k BM25 over the at-rest posting index — [[search]] served from
    * [[graft.sources.Ingest.termPostings]]/[[docLengths]] tables instead
    * of a query-time tokenize (the reference never tokenizes at search
    * time: `nidx/nidx_text/src/reader.rs:367-451` serves tantivy
    * segment postings built at ingest). Same rounding and tie-break as
    * [[search]].
    */
  def searchFromPostings(
      postings: DataFrame,
      docLengths: DataFrame,
      idCol: String,
      queryTerms: Seq[String],
      k: Int,
      params: Params = Params(),
      cachedStats: Option[CorpusStats] = None,
      atRestDfCol: Option[String] = None): DataFrame =
    scoreFromPostings(postings, docLengths, idCol, queryTerms, params,
        cachedStats = cachedStats, atRestDfCol = atRestDfCol)
      .withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** AND-default scoring served from the posting index — [[scoreAll]]
    * without the query-time tokenize: the all-terms-matched id set is a
    * grouped count over the SAME pruned posting scan the scorer reads.
    */
  def scoreAllFromPostings(
      postings: DataFrame,
      docLengths: DataFrame,
      idCol: String,
      queryTerms: Seq[String],
      params: Params = Params(),
      allowed: Option[DataFrame] = None,
      cachedStats: Option[CorpusStats] = None,
      atRestDfCol: Option[String] = None,
      cachedDf: Option[DataFrame] = None): DataFrame = {
    val matched = postings.where(col("term").isInCollection(queryTerms))
    val restricted = allowed match {
      case Some(ids) => graft.operators.Prefilter.semiJoin(matched, idCol, ids)
      case None => matched
    }
    val allMatched = restricted
      .groupBy(idCol)
      .agg(countDistinct(col("term")).as("nt"))
      .where(col("nt") === queryTerms.distinct.size)
      .select(idCol)
    scoreFromPostings(postings, docLengths, idCol, queryTerms, params, allowed,
        cachedStats = cachedStats, atRestDfCol = atRestDfCol,
        cachedDf = cachedDf)
      .join(allMatched, Seq(idCol), "left_semi")
  }

  /** Per-doc token counts (id, dl) — companion table for
    * [[scoreFromPostings]], built once at ingest. */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenStream(docs, idCol, textCol).groupBy(idCol).agg(count(lit(1)).as("dl"))

  /** AND-default scoring (tantivy's QueryParser default,
    * `nidx_text/src/search_query.rs:92-126`): only documents containing
    * EVERY query term are scored. Expressed as a semi-join against the
    * all-terms-matched id set — the conjunctive filter composes with the
    * same scoring plan.
    */
  def scoreAll(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      params: Params = Params()): DataFrame = {
    val allMatched = tokenStream(docs, idCol, textCol)
      .where(col("term").isInCollection(queryTerms))
      .groupBy(idCol)
      .agg(countDistinct(col("term")).as("nt"))
      .where(col("nt") === queryTerms.distinct.size)
      .select(idCol)
    score(docs, idCol, textCol, queryTerms, params)
      .join(allMatched, Seq(idCol), "left_semi")
  }

  /** Top-k BM25 search: deterministic order (rounded score desc, id asc)
    * so ties cut identically across engines. Spark executes the
    * order+limit as TakeOrderedAndProject — the distributed analog of the
    * reference's per-segment TopDocs + k-way shard merge
    * (`nidx/src/searcher/shard_merge.rs:177-210`).
    */
  def search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      params: Params = Params()): DataFrame =
    score(docs, idCol, textCol, queryTerms, params)
      .withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
}
