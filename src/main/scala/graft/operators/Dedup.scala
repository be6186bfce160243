package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication family for training-data pipelines.
  *
  * Exact dedup = content-hash groupBy; near-dup = MinHash+LSH
  * (shingle → minhash signature → band → bucket join) with n-gram
  * Jaccard as the exact verifier. All hashing uses md5 hex strings with
  * lexicographic min — deterministic and engine-portable (the DuckDB
  * oracle computes the identical signature).
  *
  * Scale design: the LSH band join is the only pairwise step and its
  * candidate set is |bucket|² per band bucket, not |corpus|² — the
  * standard sub-quadratic near-dup shape. Signatures are one narrow
  * shuffle (doc → 8 minhashes); band buckets hash-partition evenly
  * unless the corpus is degenerate (then salt the band key).
  */
object Dedup {

  /** (docId, shingle) distinct pairs — word n-gram shingles. */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol),
        explode(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), n)).as("shingle"))
      .distinct()

  /** Exact-dup summary: total docs vs distinct normalized fingerprints. */
  def exactStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(TextFunctions.fingerprint(col(textCol))).as("n_unique"))

  /** Exact dedup keep-list: min doc id per fingerprint + group size. */
  def exactKeepList(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature rows: (docId, i, h) for i in 0..numHashes-1 where
    * h = min over shingles of md5(i || '|' || shingle) (hex string;
    * lexicographic min is a valid uniform minhash order).
    */
  def minHashes(shingles: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val hashIdx = broadcast(
      shingles.sparkSession.range(numHashes).select(col("id").cast("int").as("i")))
    shingles.crossJoin(hashIdx)
      .withColumn("h",
        md5(concat(col("i").cast("string"), lit("|"), col("shingle")).cast("binary")))
      .groupBy(col(idCol), col("i"))
      .agg(min(col("h")).as("h"))
  }

  /** Candidate pairs sharing ≥1 LSH band (band = concat of `bandSize`
    * consecutive minhashes), verified by estimated Jaccard = fraction of
    * equal minhash components ≥ `minEstJaccard`.
    * Returns (a, b, est_jaccard) with a < b.
    */
  def minHashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 8,
      bandSize: Int = 2,
      minEstJaccard: Double = 0.5): DataFrame = {
    val sh = shingleSet(docs, idCol, textCol, shingleSize)
    val mh = minHashes(sh, idCol, numHashes).cache()
    // band value: concat of the hashes in each band, in i order
    val bands = mh.withColumn("band", floor(col("i") / bandSize))
      .groupBy(col(idCol), col("band"))
      .agg(concat_ws("", sort_array(collect_list(struct(col("i"), col("h"))))
        .getField("h")).as("bv"))
    val a = bands.select(col(idCol).as("a"), col("band"), col("bv"))
    val b = bands.select(col(idCol).as("b"), col("band"), col("bv"))
    val candidates = a.join(b, Seq("band", "bv")).where(col("a") < col("b"))
      .select("a", "b").distinct()
    // estimate: fraction of matching signature components
    val ha = mh.select(col(idCol).as("a"), col("i"), col("h").as("ha"))
    val hb = mh.select(col(idCol).as("b"), col("i"), col("h").as("hb"))
    candidates.join(ha, "a").join(hb, Seq("b", "i"))
      .groupBy("a", "b")
      .agg(round(sum(when(col("ha") === col("hb"), 1).otherwise(0)) /
        lit(numHashes.toDouble), 4).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle
    * (inverted-index join — sub-quadratic when shingles are selective).
    * Returns (a, b, jaccard) with a < b, jaccard ≥ threshold.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double): DataFrame = {
    val sh = shingleSet(docs, idCol, textCol, n).cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val x = sh.select(col(idCol).as("a"), col("shingle"))
    val y = sh.select(col(idCol).as("b"), col("shingle"))
    val inter = x.join(y, "shingle").where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col(idCol).as("b"), col("sz").as("szb")), "b")
      .withColumn("jaccard",
        round(col("inter") / (col("sza") + col("szb") - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** SimHash signature per document (default 16 bits, engine-portable):
    * bit b is the sign of Σ over distinct terms of ±1, where a term
    * votes +1 iff the b-th hex digit of md5(term) has its high bit set
    * (digit ∈ 8..f — an unbiased coin per (term, b)). Near-dups then
    * reduce to low Hamming distance between signatures
    * ([[simHashPairs]]) — the signature computation is one narrow pass +
    * two aggregations; no pairwise work.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    val highHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val pos = broadcast(docs.sparkSession.range(1, bits + 1)
      .select(col("id").cast("int").as("b")))
    docs.select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
      .withColumn("h", md5(col("term").cast("binary")))
      .crossJoin(pos)
      .withColumn("vote",
        when(expr("substring(h, b, 1)").isin(highHex: _*), 1).otherwise(-1))
      .groupBy(col(idCol), col("b"))
      .agg(sum(col("vote")).as("s"))
      .withColumn("bit", when(col("s") >= 0, lit("1")).otherwise(lit("0")))
      .groupBy(col(idCol))
      .agg(concat_ws("", sort_array(collect_list(struct(col("b"), col("bit"))))
        .getField("bit")).as("simhash"))
  }

  /** Candidate near-dup pairs with Hamming distance ≤ maxDist between
    * SimHash signatures. All-pairs at test scale; the scale path blocks
    * on signature bands (split the bit string, join on band equality)
    * exactly like MinHash-LSH.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, maxDist: Int = 3): DataFrame = {
    val sig = simHash(docs, idCol, textCol, bits)
    val a = sig.select(col(idCol).as("a"), col("simhash").as("sa"))
    val b = sig.select(col(idCol).as("b"), col("simhash").as("sb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("hamming",
        size(filter(zip_with(split(col("sa"), ""), split(col("sb"), ""),
          (x, y) => x =!= y), v => v)).cast("long"))
      .where(col("hamming") <= maxDist)
      .select("a", "b", "hamming")
  }

  /** Embedding near-dup pairs: cosine ≥ threshold. Exact all-pairs at
    * test scale; at 100 TB the same call composes with
    * [[VectorSearch.ivfAssign]] to block by cluster first.
    */
  def embeddingNearDups(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val a = vectors.select(col(idCol).as("a"), col(vecCol).as("va"))
    val b = vectors.select(col(idCol).as("b"), col(vecCol).as("vb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("score", round(cosine(asDouble(col("va")), asDouble(col("vb"))), 6))
      .where(col("score") >= threshold)
      .select("a", "b", "score")
  }
}
