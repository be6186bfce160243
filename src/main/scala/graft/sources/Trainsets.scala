package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Trainset generators — task-shaped projections of the index tables
  * for ML export (`nucliadb_protos/dataset.proto:9-17` task types,
  * `nucliadb/src/nucliadb/train/generators/`). Each generator is a
  * pure projection/explode over the already-materialized tables; export
  * is `Ingest.exportTrainset` (partitioned parquet ≈ the Arrow batch
  * stream).
  */
object Trainsets {

  /** FIELD_CLASSIFICATION: (text, labels) per field/document. */
  def fieldClassification(docs: DataFrame, idCol: String, textCol: String,
      labelsCol: String): DataFrame =
    docs.select(col(idCol).as("field_id"), col(textCol).as("text"),
      col(labelsCol).as("labels"))

  /** PARAGRAPH_CLASSIFICATION: (paragraph_id, text, labels) — one row
    * per paragraph, labels inherited from the parent document. */
  def paragraphClassification(paragraphs: DataFrame, docs: DataFrame,
      idCol: String, labelsCol: String): DataFrame =
    paragraphs.select(col(idCol), col("paragraph_id"), col("p_text").as("text"))
      .join(docs.select(col(idCol), col(labelsCol).as("labels")), idCol)
      .select("paragraph_id", "text", "labels")

  /** TOKEN_CLASSIFICATION: (paragraph_id, tokens, tags) — token arrays
    * with an (entity-less) O tag per token; a NER pipeline overwrites
    * `tags`. The shape (aligned arrays) is the contract. */
  def tokenClassification(paragraphs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("p_text"))
    paragraphs.select(col("paragraph_id"), toks.as("tokens"),
      transform(toks, _ => lit("O")).as("tags"))
  }

  /** TOKEN_CLASSIFICATION with REAL gazetteer tags — the NER trainset
    * the reference exports once entities are detected
    * (`train/generators/token_classifier.py` emits per-token BIO
    * labels). `entities` is a driver-scale gazetteer of 1- or 2-token
    * phrases (the same bounded-dictionary contract as
    * [[graft.operators.GraphOps.detectEntities]]): a token starting any
    * phrase tags `B`, the continuation of a 2-token phrase tags `I`
    * (a simultaneous new match wins — `B` beats `I`), everything else
    * `O`. One narrow explode + two windows keyed by paragraph; tags
    * stay position-aligned with the tokens.
    *
    * @return (paragraph_id, tokens, tags) — space-joined, pos-aligned
    */
  def tokenClassificationNer(paragraphs: DataFrame,
      entities: Seq[Seq[String]]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(entities.nonEmpty && entities.forall(p => p.size == 1 || p.size == 2),
      "gazetteer phrases must be 1 or 2 tokens")
    val singles = entities.filter(_.size == 1).map(_.head)
    val pairs = entities.filter(_.size == 2).map(_.mkString(" "))
    val w = Window.partitionBy(col("paragraph_id")).orderBy(col("pos"))
    val tokd = paragraphs.select(col("paragraph_id"),
      posexplode(TextFunctions.tokens(col("p_text"))).as(Seq("pos", "term")))
    val withNext = tokd.withColumn("__next", lead(col("term"), 1).over(w))
    // tokens never contain spaces, so a lone term can't equal a pair
    val pairStart =
      if (pairs.isEmpty) lit(false)
      else concat_ws(" ", col("term"), col("__next")).isInCollection(pairs)
    val isB =
      (if (singles.isEmpty) lit(false) else col("term").isInCollection(singles)) ||
        pairStart
    val tagged = withNext
      .withColumn("__pair_start", pairStart)
      .withColumn("tag",
        when(isB, "B")
          .when(coalesce(lag(col("__pair_start"), 1).over(w), lit(false)), "I")
          .otherwise("O"))
    tagged.groupBy("paragraph_id")
      .agg(
        array_join(transform(sort_array(collect_list(struct(col("pos"), col("term")))),
          _.getField("term")), " ").as("tokens"),
        array_join(transform(sort_array(collect_list(struct(col("pos"), col("tag")))),
          _.getField("tag")), " ").as("tags"))
  }

  /** SENTENCE_CLASSIFICATION / QA pairs: (question, answer) rows from
    * consecutive paragraph pairs — the self-supervised stand-in the
    * reference generates from field streams. */
  def adjacentPairs(paragraphs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("start"))
    paragraphs
      .withColumn("next_text", lead(col("p_text"), 1).over(w))
      .where(col("next_text").isNotNull)
      .select(col(idCol), col("p_text").as("question"),
        col("next_text").as("answer"))
  }

  /** SENTENCE_CLASSIFICATION: one row per sentence with the parent
    * document's label (`train/generators/sentence_classifier.py`
    * analog). Sentences split on terminal punctuation runs; ids follow
    * the `{parent}/s{i}` suffix convention. A narrow explode — no
    * shuffle.
    */
  def sentenceClassification(docs: DataFrame, idCol: String,
      textCol: String, labelCol: String): DataFrame =
    docs.select(col(idCol), col(labelCol).as("labels"),
        posexplode(split(col(textCol), "[.!?]+\\s*")).as(Seq("i", "text")))
      .where(length(trim(col("text"))) > 0)
      .select(
        concat(col(idCol).cast("string"), lit("/s"), col("i")).as("sentence_id"),
        trim(col("text")).as("text"), col("labels"))

  /** QUESTION_ANSWER with retrieval context
    * (`train/generators/question_answer_streaming.py` shape: question,
    * answer, context paragraphs): the self-supervised projection over
    * the paragraph table — question = paragraph i, answer = paragraph
    * i+1, context = up to `contextSize` paragraphs preceding the
    * question in the same document. One window over the doc key; at
    * scale the paragraph table is already partitioned by doc.
    */
  def questionAnswerWithContext(paragraphs: DataFrame, idCol: String,
      contextSize: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("start"))
    paragraphs
      .withColumn("answer", lead(col("p_text"), 1).over(w))
      .withColumn("context",
        collect_list(col("p_text")).over(w.rowsBetween(-contextSize, -1)))
      .where(col("answer").isNotNull)
      .select(col(idCol), col("paragraph_id").as("question_id"),
        col("p_text").as("question"), col("answer"), col("context"))
  }

  /** FIELD_STREAMING (`dataset.proto` task type; the generator streams
    * every extracted field's text keyed by its field uid): one row per
    * typed field, `{rid}/{field_type}/{field_id}` ids — a pure
    * projection of the fields hierarchy ([[Ingest.fieldsTable]]).
    */
  def fieldStreaming(fields: DataFrame, idCol: String): DataFrame =
    fields.select(
      Ingest.fieldUid(col(idCol), col("field_type"), col("field_id"))
        .as("field_uid"),
      col("f_text").as("text"))

  /** PARAGRAPH_STREAMING (`dataset.proto:15`; the generator
    * `train/generators/paragraph_streaming.py:61-97` streams every
    * field's paragraphs "ordered as if they were read sequentially
    * from each field"): one (id, text) item per paragraph, keyed
    * `{rid}/{field_type}/{field_id}/{start}-{end}` — split fields
    * (conversations) keep their split level in the id exactly as the
    * reference emits it. A pure projection of the at-rest paragraph
    * hierarchy: body rows from the main paragraph table, non-body and
    * conversation rows from field_paragraphs — no tokenize, no join,
    * scan-only at any scale. Position metadata rides along as
    * (p_start, p_end) token offsets.
    */
  def paragraphStreaming(
      paragraphs: DataFrame,
      fieldParagraphs: Option[DataFrame]): DataFrame = {
    def proj(df: DataFrame): DataFrame = df.select(
      col("paragraph_id").as("id"), col("p_text").as("text"),
      col("start").cast("long").as("p_start"),
      col("end").cast("long").as("p_end"))
    fieldParagraphs.map(fp => proj(paragraphs).unionByName(proj(fp)))
      .getOrElse(proj(paragraphs))
  }

  /** IMAGE_CLASSIFICATION (`dataset.proto:83-90`) — faithfully EMPTY:
    * the reference's generator is dead code ("image classifications
    * are no longer supported, as the page selection annotations were
    * removed from the API" — `train/generators/image_classifier.py:
    * 43-53`, an unconditional empty yield), so the parity surface is
    * the correctly-SHAPED empty item stream, not an image pipeline.
    * Columns mirror the proto's ImageClassification (selections JSON,
    * page_uri). This retires the "no image bytes in the sandbox"
    * environment bound for this task — the reference ships none
    * either; generic binary-column plumbing stays in
    * [[graft.multimodal.Multimodal]]. */
  def imageClassification(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("selections", StringType),
        StructField("page_uri", StringType))))
  }

  /** First `width` hex chars of md5(id · salt) — THE deterministic-
    * membership contract shared by the sampling/packing family (and
    * mirrored verbatim by each oracle's
    * `substring(md5(CAST(id AS VARCHAR) || salt), 1, width)`). The
    * salt separates purposes: members chosen by one pass must not
    * correlate with another pass cutting on the same id hash
    * (see [[temperatureMixture]] for the concrete failure). */
  private def saltedHexPrefix(idCol: String, salt: String, width: Int) =
    substring(
      md5(concat(col(idCol).cast("string"), lit(salt)).cast("binary")),
      1, width)

  /** Deterministic hash sampling for reproducible trainset cuts: keep
    * rows whose md5(id) hex digest starts with one of `hexPrefixes`
    * (each single hex digit ≈ 1/16 of the data; two digits ≈ 1/256).
    * Unlike RNG-seeded `sample()`, the cut is a pure function of the
    * id — stable across engines, partitionings, reruns, and incremental
    * appends (a row's membership never changes), which is what makes
    * train/eval splits reproducible at 100 TB. The predicate is
    * codegen'd and pushes no shuffle.
    */
  def hashSample(df: DataFrame, idCol: String, hexPrefixes: Seq[String]): DataFrame = {
    val prefix = substring(md5(col(idCol).cast("string").cast("binary")), 1,
      hexPrefixes.head.length)
    df.where(prefix.isInCollection(hexPrefixes))
  }

  /** Balanced per-key sampling: keep at most `perKey` rows per key,
    * chosen by deterministic hash order (md5 of the id, id tiebreak) —
    * the data-mixing step that caps a dominant language/source before
    * training. Unlike per-key `sample()`, membership is a pure function
    * of (key, the group's id set): stable across reruns and
    * partitionings. One shuffle on the key; the per-key window is
    * bounded by the cap. A pathologically hot key still funnels its
    * rows through one partition before the cap — use
    * [[balancedSampleSkewSafe]] (identical output, two-phase) when the
    * key distribution is skewed.
    */
  def balancedSample(df: DataFrame, keyCol: String, idCol: String,
      perKey: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= perKey).drop("__rn")
  }

  /** [[balancedSample]] with the hot-key funnel bounded BY CONSTRUCTION:
    * phase 1 pre-caps per (key, salt) — a deterministic id-hash salt
    * spreads each key over `salts` reducers, so no single partition
    * ever drains more than its salt's slice of a hot key — and phase 2
    * runs the exact global window on the ≤ perKey × salts survivors
    * per key. Identical output to the single-window form
    * (equality-tested): every row in the global top-perKey of its key
    * under the (md5, id) order is also in the top-perKey of its own
    * salt slice, so phase 1 never discards a winner. Same determinism
    * properties — membership is a pure function of (key, id set).
    */
  def balancedSampleSkewSafe(df: DataFrame, keyCol: String, idCol: String,
      perKey: Int, salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hash = md5(col(idCol).cast("string").cast("binary"))
    val salt = pmod(xxhash64(col(idCol)), lit(salts.toLong))
    val w1 = Window.partitionBy(col(keyCol), salt).orderBy(hash, col(idCol))
    val pre = df.withColumn("__rn1", row_number().over(w1))
      .where(col("__rn1") <= perKey).drop("__rn1")
    balancedSample(pre, keyCol, idCol, perKey)
  }

  /** Temperature-flattened mixture sampling — the multilingual /
    * multi-source data-mixing pass (α-smoothing of source shares, as in
    * XLM-R-style multilingual sampling): a key with n_k rows is
    * sampled toward the flattened share q_k = n_k^α / Σ_j n_j^α of
    * `targetRows`, i.e. keep rate r_k = min(1, targetRows·q_k / n_k).
    * α = 1 preserves the natural mix; α = 0 equalizes keys; 0 < α < 1
    * upsamples the tail relative to the head (rates clamp at 1 — this
    * operator only downsamples, it never duplicates rows).
    *
    * Membership is DETERMINISTIC, not RNG: a row is kept iff the first
    * 8 hex digits of md5(id · "#mix") fall below the key's rate
    * threshold — the same pure-function-of-the-id contract as
    * [[hashSample]], so membership survives reruns, partitionings, and
    * incremental appends, and the threshold comparison is a codegen'd
    * string predicate. The hash is SALTED with a purpose tag ("#mix"):
    * [[hashSplit]]/[[hashSample]] cut on the UNsalted md5(id), and an
    * unsalted mixture would correlate with them — a key downsampled to
    * rate r keeps only ids whose hash prefix < r, which after an
    * unsalted 12/2/2 hashSplit would put EVERY surviving row of any
    * r ≤ 0.75 key into 'train' (empty val/test). Null-key rows are
    * excluded from the mix and the rate computation. The rate table is
    * one tiny per-key aggregate broadcast back onto the corpus: cost at
    * 100 TB is the unavoidable counting pass plus one narrow filtered
    * scan, no corpus-side join shuffle.
    */
  def temperatureMixture(df: DataFrame, keyCol: String, idCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(targetRows >= 0, s"targetRows must be >= 0, got $targetRows")
    // null-key rows are EXCLUDED from the mix and from the rate
    // computation (an equi-join can never return them, so counting
    // them would only deflate every real key's share silently) — a
    // corpus with null keys must bucket them explicitly first
    val in = df.where(col(keyCol).isNotNull)
    val counts = in.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("double").as("__n"))
    val z = counts.agg(sum(pow(col("__n"), lit(alpha))).as("__z"))
    val rates = counts.crossJoin(broadcast(z))
      .withColumn("__r",
        least(lit(1.0),
          lit(targetRows.toDouble) * pow(col("__n"), lit(alpha)) /
            col("__z") / col("__n")))
      // string-comparable threshold on the md5 hex prefix; a full-keep
      // rate maps to 'g' (> every hex digit) because %08x of 2^32 is
      // the 9-char "100000000", which sorts BELOW 8-char hex strings —
      // and the floored value clamps at 2^32−1 because a rate just
      // below 1 can round UP to exactly 2^32 in double arithmetic and
      // hit the same 9-char trap past the >= 1 guard
      .withColumn("__th",
        when(col("__r") >= 1, lit("g")).otherwise(
          format_string("%08x",
            least(floor(col("__r") * lit(4294967296.0)).cast("long"),
              lit(4294967295L)))))
      .select(col(keyCol), col("__th"))
    in.join(broadcast(rates), keyCol)
      .where(saltedHexPrefix(idCol, "#mix", 8) < col("__th"))
      .drop("__th")
  }

  /** Concat-and-chunk sequence packing — the pretraining batch-prep
    * pass that concatenates documents and cuts the stream into
    * fixed-`budget` token training sequences (a document belongs to
    * the sequence containing its first token; long documents straddle
    * chunk boundaries, exactly like the concatenated-stream packing
    * every GPT-style pipeline uses). Token counts are the BPE
    * pre-token upper bound ([[TextFunctions.bpePreTokenCount]]).
    *
    * The stream order is DETERMINISTIC and PARALLEL: documents are
    * bucketed into 16^`binHexWidth` independent streams by a salted
    * md5 prefix of the id ("#pack" — salted for the same reason as
    * [[temperatureMixture]]: the unsalted md5(id) prefix already
    * drives [[hashSplit]]/[[hashSample]] membership, and packing order
    * must not correlate with split membership), and each bin is packed
    * in id order. Membership and offsets are pure functions of (id set,
    * budget) — stable across reruns and partitionings. Scale shape: ONE
    * shuffle (hash by bin) and a per-bin running sum; bins bound the
    * window-partition size (pick binHexWidth so corpus/16^w fits an
    * executor's slice) and there is NO global order — the 100 TB cost
    * is a narrow scan plus one exchange.
    *
    * @return one row per doc: (idCol, bin, n_tok, seq, tok_offset) —
    *         seq = chunk index within the bin, tok_offset = the doc's
    *         first-token offset within that chunk
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, binHexWidth: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(binHexWidth >= 1 && binHexWidth <= 8,
      s"binHexWidth must be in [1,8], got $binHexWidth")
    import org.apache.spark.sql.expressions.Window
    val bin = saltedHexPrefix(idCol, "#pack", binHexWidth)
    val base = df.select(col(idCol), bin.as("bin"),
      TextFunctions.bpePreTokenCount(col(textCol)).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("bin")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("__before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq", floor(col("__before") / budget))
      .withColumn("tok_offset", col("__before") % budget)
      .drop("__before")
  }

  /** Eval-set contamination score per document: the fraction of the
    * document's distinct word `n`-gram shingles that also occur in
    * `evalDocs` (the benchmark/eval corpus a trainset must be
    * decontaminated against). Eval shingles are a broadcast set — the
    * corpus side is one narrow pass plus a broadcast left join, no
    * corpus shuffle; the per-doc denominator rides along with each
    * shingle row (same trick as the n-gram Jaccard join).
    *
    * @return (idCol, contamination ∈ [0,1] rounded at 4)
    */
  def contaminationScores(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, n: Int): DataFrame = {
    val arr = array_distinct(
      TextFunctions.shingles(TextFunctions.tokens(col(textCol)), n))
    // project the shingle array BEFORE exploding: a sibling projection
    // next to a generator is re-evaluated per exploded row, which would
    // re-tokenize each document once per shingle
    val docSh = docs.select(col(idCol), arr.as("__ss"), size(arr).as("sz"))
      .select(col(idCol), explode(col("__ss")).as("s"), col("sz"))
    val evalSh = evalDocs.select(explode(arr).as("s")).distinct()
    docSh.join(broadcast(evalSh.withColumn("__hit", lit(1))), Seq("s"), "left")
      .groupBy(col(idCol))
      .agg(round(sum(coalesce(col("__hit"), lit(0))).cast("double") / first(col("sz")), 4)
        .as("contamination"))
  }

  /** [[contaminationScores]] served from the at-rest hashed-shingle
    * posting table ([[Ingest.buildIndex]]'s `shingles`: idCol, shingle,
    * sz) — both the corpus side and the eval side are semi-joins into
    * the same table, so a request pays no tokenize/shingle pass at all.
    * Hashed-shingle membership equals string-set membership barring a
    * 64-bit collision (the q17 trade, documented there). `evalIds`
    * is the eval corpus as an id set.
    */
  def contaminationFromShingles(sh: DataFrame, idCol: String,
      evalIds: DataFrame): DataFrame = {
    val evalSh = sh.join(evalIds.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col("shingle")).distinct()
    sh.join(broadcast(evalSh.withColumn("__hit", lit(1))), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(round(sum(coalesce(col("__hit"), lit(0))).cast("double") / first(col("sz")), 4)
        .as("contamination"))
  }

  /** Split-leakage audit — for every held-out (non-`trainName`)
    * document, the fraction of its shingles that also occur in the
    * TRAIN split: the post-split QA pass that catches near-duplicate
    * pairs straddling the split boundary (they inflate eval scores).
    *
    * Unlike [[contaminationFromShingles]] (whose eval set is a tiny
    * benchmark → broadcast), the train side here is CORPUS-scale, so
    * nothing is broadcast and no id join builds it: [[hashSplit]] is a
    * pure function of the id, so the split tag is a NARROW expression
    * on the shingle table itself, which preserves the table's
    * bucketed-on-`shingle` layout through the filter. The distinct
    * train-shingle set is then a bucket-local aggregate and the probe
    * join reuses the same layout — the ONLY exchange at any corpus
    * size is the final per-doc aggregate (plan-pinned in
    * ScaleDesignSpec).
    *
    * @return (idCol, split, contamination rounded at 4) for held-out docs
    */
  def splitLeakage(sh: DataFrame, idCol: String,
      splits: Seq[(String, Int)], trainName: String = "train"): DataFrame = {
    // a trainName absent from the splits would tag nothing as train →
    // empty train set → every held-out doc reports 0 leakage: the
    // audit would silently pass instead of failing loudly
    require(splits.exists(_._1 == trainName),
      s"trainName '$trainName' is not one of the split names: ${splits.map(_._1)}")
    val tagged = hashSplit(sh, idCol, splits)
    val trainSh = tagged.where(col("split") === trainName)
      .select(col("shingle")).distinct()
    tagged.where(col("split") =!= trainName)
      .join(trainSh.withColumn("__hit", lit(1)), Seq("shingle"), "left")
      .groupBy(col(idCol), col("split"))
      .agg(round(sum(coalesce(col("__hit"), lit(0))).cast("double") / first(col("sz")), 4)
        .as("contamination"))
  }

  /** Deterministic train/val/test split: the first hex digit of
    * md5(id) buckets each row into one of 16 slots; `splits` assigns
    * slot COUNTS to named splits in order (e.g. train→12, val→2,
    * test→2 ≈ 75/12.5/12.5). Membership is a pure function of the id —
    * a row never migrates between splits across reruns or appends, the
    * property a reproducible 100 TB pipeline needs and seeded
    * `randomSplit` cannot give (its assignment depends on
    * partitioning). Adds a `split` column.
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 16, "split slot counts must sum to 16")
    val digit = substring(md5(col(idCol).cast("string").cast("binary")), 1, 1)
    val hex = "0123456789abcdef"
    val bounds = splits.scanLeft(0) { case (acc, (_, n)) => acc + n }
    val expr0 = splits.zip(bounds).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), lo)) =>
        when(digit >= lit(hex(lo).toString), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr0)
  }
}
