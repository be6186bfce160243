package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-k / pagination operators.
  *
  * `orderBy(...).limit(k)` compiles to TakeOrderedAndProject: per-
  * partition heaps + a driver-side k-way merge — exactly the shape of
  * the reference's per-segment TopDocs + multi-shard merge
  * (`nidx_text/src/reader.rs:386-387`,
  * `nidx/src/searcher/shard_merge.rs:54-100`), with partitions playing
  * the role of shards. No full sort, no extra shuffle.
  */
object TopK {

  /** Deterministic top-k by score with id tiebreak. */
  def topK(df: DataFrame, scoreCol: String, idCol: String, k: Int): DataFrame =
    df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(k)

  /** A collected response page as a LOCAL relation — same schema, rows
    * in page order; bounded by the caller's top-k cut by construction.
    * Lives here (not in the api layer) so operator-level fallbacks can
    * use it without an operators→api dependency. */
  def localPage(
      src: DataFrame, rows: Array[org.apache.spark.sql.Row]): DataFrame =
    src.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), src.schema)

  /** The collected-page-or-fallback idiom (round 18): execute the
    * BOUNDED exact page once; a nonempty page serves as a local
    * relation (the emptiness check and the response share one
    * execution), the empty page takes the fallback frame. */
  def collectedPageOrElse(exact: DataFrame)(fallback: => DataFrame): DataFrame = {
    val rows = exact.collect()
    if (rows.nonEmpty) localPage(exact, rows) else fallback
  }

  /** Constant-but-non-foldable partition key (always 0): pins a window
    * whose input is ALREADY bounded (by a prior top-k cut) to one
    * explicit partition. A literal key would be pruned by constant
    * folding, leaving an empty partition spec — and the unpartitioned-
    * window warning — even though the execution is identical; deriving
    * the constant from a column keeps the spec intact. */
  def constPartitionKey(c: Column): Column = pmod(xxhash64(c), lit(1))

  /** Keyset cursor for deep pagination: strictly-after position in the
    * (score desc, id asc) total order.
    */
  final case class Cursor(score: Double, id: Long)

  /** search_after — keyset pagination
    * (`nodereader.proto:382-386`, `search/search/search_after.py`).
    * The reference's cursor is (score, shard_id, docaddr); ours is
    * (score, stable row key), deterministic across partitions. Unlike
    * OFFSET pagination this stays O(k) per page at any depth: the
    * predicate pushes into the scan and the top-k heap never holds more
    * than k rows.
    */
  def searchAfter(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      cursor: Cursor,
      k: Int): DataFrame =
    searchAfterAny(df, scoreCol, idCol, cursor.score, cursor.id, k)

  /** Id-type-agnostic [[searchAfter]] — the reference's cursor carries
    * STRING paragraph ids (`search/search/find.py` SearchAfterToken),
    * so the keyset predicate must work for any orderable id column;
    * `id` becomes a literal of its runtime type. */
  def searchAfterAny(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      score: Double,
      id: Any,
      k: Int): DataFrame =
    topK(
      df.where(col(scoreCol) < score ||
        (col(scoreCol) === score && col(idCol) > lit(id))),
      scoreCol, idCol, k)

  /** search_after with a shown-item skip set — the find endpoint's
    * cross-page dedup (`nucliadb/src/nucliadb/search/search/find.py:95-126`):
    * the cursor token carries the ids already shown to the client, the
    * engine widens the retrieval window by |skip| (`top_k += len(skip)`),
    * fetches strictly after the cursor, removes the already-shown ids,
    * and cuts back to k. This keeps pages disjoint even when scores
    * shift between requests and an already-shown item re-qualifies
    * after the cursor — the keyset predicate alone cannot. The skip set
    * is driver-scale (≤ items already shown) and compiles to a literal
    * NOT IN predicate in the scan.
    */
  def searchAfterWithSkips(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      cursor: Cursor,
      skip: Seq[Long],
      k: Int): DataFrame =
    searchAfterWithSkipsAny(df, scoreCol, idCol, cursor.score, cursor.id,
      skip, k)

  /** Id-type-agnostic [[searchAfterWithSkips]] (see [[searchAfterAny]]). */
  def searchAfterWithSkipsAny(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      score: Double,
      id: Any,
      skip: Seq[Any],
      k: Int): DataFrame = {
    val widened = searchAfterAny(df, scoreCol, idCol, score, id, k + skip.size)
    val kept =
      if (skip.isEmpty) widened
      else widened.where(!col(idCol).isInCollection(skip))
    kept.orderBy(col(scoreCol).desc, col(idCol).asc).limit(k)
  }

  /** Fetch page `page` (1-based) by walking cursors — the driver-side
    * loop a paginating client performs. Each hop is an O(k) top-k job.
    */
  def page(df: DataFrame, scoreCol: String, idCol: String, k: Int, page: Int): DataFrame = {
    var cur: Option[Cursor] = None
    var result = topK(df, scoreCol, idCol, k)
    var p = 1
    while (p < page) {
      val last = result.select(col(scoreCol), col(idCol)).collect().lastOption
      last match {
        case Some(row) =>
          cur = Some(Cursor(row.getDouble(0), row.getLong(1)))
          result = searchAfter(df, scoreCol, idCol, cur.get, k)
        case None => result = result.limit(0)
      }
      p += 1
    }
    result
  }

  /** Suggest: exact-prefix matches ranked by frequency — analog of the
    * paragraph suggest path (`nidx_paragraph/src/reader.rs:58-90`,
    * default k=10). `termFreq` is a (term, freq) dictionary table.
    */
  def suggestPrefix(termFreq: DataFrame, termCol: String, freqCol: String,
      prefix: String, k: Int = 10): DataFrame =
    termFreq.where(col(termCol).startsWith(prefix))
      .orderBy(col(freqCol).desc, col(termCol).asc)
      .limit(k)

  /** Fuzzy-PREFIX suggest — the reference's last-term treatment: the
    * final query term runs as a fuzzy prefix automaton, so a typo'd
    * stem still completes ("qindow" → "window", "windows";
    * `nidx_paragraph/src/fuzzy_query.rs:55-120`,
    * `query_parser/fuzzy_parser.rs:41-42`). A term matches when some
    * prefix of it is within `maxDist` edits of the query stem; since an
    * edit changes length by at most one, checking prefix lengths
    * |q|−d … |q|+d is exhaustive. The predicate is a pure codegen'd
    * expression over the term dictionary — no joins, no shuffle beyond
    * the top-k cut.
    */
  def suggestFuzzyPrefix(termFreq: DataFrame, termCol: String,
      freqCol: String, query: String, k: Int = 10, maxDist: Int = 1): DataFrame = {
    val q = query.toLowerCase
    // a stem at or below the edit distance would match EVERY term (the
    // empty prefix qualifies — levenshtein(t[1,1], q) ≤ dist holds for
    // any first char), turning the fallback into the whole dictionary;
    // the relation side gates the same regime behind
    // MIN_SUGGEST_PREFIX_LENGTH (= dist + 1) and the paragraph
    // fallback returns empty for it, never everything
    if (q.length <= maxDist)
      return termFreq.where(lit(false))
        .orderBy(col(freqCol).desc, col(termCol).asc).limit(k)
    val lens = (q.length - maxDist to q.length + maxDist).filter(_ > 0).distinct
    val pred = lens.map(l =>
        levenshtein(substring(col(termCol), 1, l), lit(q)) <= maxDist)
      .reduce(_ || _)
    termFreq.where(pred)
      .orderBy(col(freqCol).desc, col(termCol).asc)
      .limit(k)
  }

  /** SymSpell distance-1 term match against the at-rest deletion-
    * neighborhood table ([[graft.functions.TextFunctions.deleteVariants]]
    * materialized over the term dictionary at ingest): the query's own
    * ≤ |q|+1 deletion variants become a literal `variant IN (...)`
    * predicate — pushed into the (variant-sorted) deletes scan as a
    * row-group-pruning lookup — and only the CANDIDATE terms pay a
    * levenshtein verify (the intersection over-matches at distance 2,
    * e.g. transpositions). The scalable replacement for scanning the
    * whole dictionary with a levenshtein predicate: per query the scan
    * cost is the pruned lookup, the verify cost ≤ |candidates|.
    */
  def symSpellMatchTerms(deletes: DataFrame, query: String): DataFrame = {
    val q = query.toLowerCase
    val qVariants =
      (q +: (0 until q.length).map(i => q.substring(0, i) + q.substring(i + 1))).distinct
    deletes.where(col("variant").isInCollection(qVariants))
      .select("term").distinct()
      .where(levenshtein(col("term"), lit(q)) <= 1)
  }

  /** Exact-then-fuzzy fallback (reference reruns with Levenshtein
    * automaton distance 1 only when the exact pass is empty,
    * `nidx_paragraph/src/reader.rs:104-139`). Driver-side adaptive
    * branch, mirroring the reference's two-pass design.
    */
  def suggestWithFuzzyFallback(termFreq: DataFrame, termCol: String,
      freqCol: String, query: String, k: Int = 10): DataFrame =
    collectedPageOrElse(
      suggestPrefix(termFreq, termCol, freqCol, query, k))(
      termFreq
        .where(levenshtein(col(termCol), lit(query)) <= 1)
        .orderBy(col(freqCol).desc, col(termCol).asc)
        .limit(k))
}
