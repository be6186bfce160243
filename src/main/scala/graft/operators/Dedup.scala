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

  /** Exact-dup summary: total docs vs distinct normalized fingerprints. */
  def exactStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(TextFunctions.fingerprint(col(textCol))).as("n_unique"))

  /** Exact dedup keep-list: min doc id per fingerprint + group size. */
  def exactKeepList(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature table: one row per doc with `numHashes` columns
    * h0..h{n-1}, where h_i = min over shingles of md5(i || '|' ||
    * shingle) (hex string; lexicographic min is a valid uniform minhash
    * order). All hash functions are evaluated in ONE pass over the
    * shingle rows (wide projection + single hash aggregation) — no
    * numHashes-fold row blowup, one shuffle keyed by doc id.
    */
  def minHashSignatures(shingles: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val hashed = shingles.select(
      col(idCol) +: (0 until numHashes).map(i =>
        md5(concat(lit(s"$i|"), col("shingle")).cast("binary")).as(s"h$i")): _*)
    val aggs = (0 until numHashes).map(i => min(col(s"h$i")).as(s"h$i"))
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate pairs sharing ≥1 LSH band (band = concat of `bandSize`
    * consecutive minhashes), verified by estimated Jaccard = fraction of
    * equal minhash components ≥ `minEstJaccard`.
    * Returns (a, b, est_jaccard) with a < b.
    *
    * This is the from-raw-text form (one signature pass per request);
    * production serves [[minHashLshFromSignatures]] over the signature
    * table [[graft.sources.Ingest.buildIndex]] materializes at ingest —
    * signatures are a pure per-document function (no corpus
    * statistics), so the at-rest table is valid for any corpus subset
    * via a semi-join.
    */
  def minHashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 8,
      bandSize: Int = 2,
      minEstJaccard: Double = 0.5): DataFrame = {
    // no distinct: min over duplicate shingles equals min over the set,
    // so the signature aggregation absorbs multiset rows in its partial
    // (map-side) phase — one shuffle keyed by doc instead of two
    val sh = docs.select(col(idCol),
      explode(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleSize))
        .as("shingle"))
    val sig = graft.Caches.cache(minHashSignatures(sh, idCol, numHashes))
    minHashLshFromSignatures(sig, idCol, numHashes, bandSize, minEstJaccard)
  }

  /** [[minHashLsh]] served from a precomputed signature table
    * ([[minHashSignatures]]'s schema: idCol, h0..h{n-1}) — the at-rest
    * path: the per-request cost is the band bucket join and the
    * signature-estimate joins, never a corpus tokenize.
    */
  def minHashLshFromSignatures(
      sig: DataFrame,
      idCol: String,
      numHashes: Int = 8,
      bandSize: Int = 2,
      minEstJaccard: Double = 0.5): DataFrame =
    minHashLshFromBands(signatureBands(sig, idCol, numHashes, bandSize),
      sig, idCol, numHashes, minEstJaccard)

  /** LSH band rows (id, band, bv) exploded from a signature table — the
    * candidate-bucket key. Materialized at ingest (bucketed on
    * (band, bv)) so the pair self-join reuses the at-rest layout; also
    * the inline step of [[minHashLshFromSignatures]].
    */
  def signatureBands(sig: DataFrame, idCol: String,
      numHashes: Int = 8, bandSize: Int = 2): DataFrame = {
    // loud guard against a table built with different parameters: a
    // width mismatch would silently estimate Jaccard over a subset of
    // the signature components and change keep/drop decisions
    val widthOnDisk = sig.columns.count(_.matches("h\\d+"))
    require(widthOnDisk == numHashes,
      s"signature table has $widthOnDisk hash columns, caller expects $numHashes " +
        "— rebuild the index or pass the table's numHashes")
    val nBands = numHashes / bandSize
    val bandCols = (0 until nBands).map { bi =>
      struct(lit(bi).as("band"),
        concat((0 until bandSize).map(j => col(s"h${bi * bandSize + j}")): _*).as("bv"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.bv").as("bv"))
  }

  /** [[minHashLshFromSignatures]] with the band rows supplied from the
    * at-rest table ([[graft.sources.Ingest.buildIndex]] writes them
    * bucketed on (band, bv)): the candidate self-join scans
    * co-partitioned buckets with no per-request exchange, and only the
    * signature-estimate joins (candidate-bounded) shuffle.
    *
    * PAIRING CONTRACT: `bands` must be the explode of THIS `sig` table
    * ([[signatureBands]]) — the builder writes both in one
    * [[graft.sources.Ingest.buildIndex]] run and records `num_hashes`
    * in `text_meta.json`. The band rows carry no width columns, so a
    * stale bands table next to a rebuilt signature table cannot be
    * detected here (the width guard below covers the signature side
    * only); rebuild both together.
    */
  def minHashLshFromBands(
      bands: DataFrame,
      sig: DataFrame,
      idCol: String,
      numHashes: Int = 8,
      minEstJaccard: Double = 0.5): DataFrame = {
    require(bands.columns.toSet == Set(idCol, "band", "bv"),
      s"bands table must be ($idCol, band, bv) rows, got ${bands.columns.mkString(",")}")
    val widthOnDisk = sig.columns.count(_.matches("h\\d+"))
    require(widthOnDisk == numHashes,
      s"signature table has $widthOnDisk hash columns, caller expects $numHashes " +
        "— rebuild the index or pass the table's numHashes")
    val candidates = bands.select(col(idCol).as("a"), col("band"), col("bv"))
      .join(bands.select(col(idCol).as("b"), col("band"), col("bv")), Seq("band", "bv"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    // estimate from the signature columns directly (two narrow joins)
    val sa = sig.select(col(idCol).as("a") +:
      (0 until numHashes).map(i => col(s"h$i").as(s"a_h$i")): _*)
    val sb = sig.select(col(idCol).as("b") +:
      (0 until numHashes).map(i => col(s"h$i").as(s"b_h$i")): _*)
    val matches = (0 until numHashes)
      .map(i => when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
      .reduce(_ + _)
    candidates.join(sa, "a").join(sb, "b")
      .withColumn("est_jaccard", round(matches / lit(numHashes.toDouble), 4))
      .where(col("est_jaccard") >= minEstJaccard)
      .select("a", "b", "est_jaccard")
  }

  /** Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle
    * (inverted-index join — sub-quadratic when shingles are selective).
    * Returns (a, b, jaccard) with a < b, jaccard ≥ threshold.
    *
    * Stop-shingle hot buckets (a shingle present in a large fraction of
    * the corpus) concentrate the join on one reducer; `saltFactor > 1`
    * routes buckets larger than `hotThreshold` through
    * [[Skew.saltedPairCounts]] — identical result, skew spread over
    * `saltFactor` reducers.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      saltFactor: Int = 1,
      hotThreshold: Long = 1000): DataFrame = {
    // Set semantics come from array_distinct WITHIN each document — a
    // narrow map in the scan projection — so no corpus-wide distinct
    // shuffle is ever paid. 8-byte hashed shingle keys: the inverted-
    // index join shuffles fixed-width longs instead of ~25-byte strings
    // (Jaccard only needs set membership, not the text — same counts
    // barring a 64-bit collision, ~1e-7 for 10⁶ distinct shingles, and
    // any collision fails the exact oracle loudly rather than silently).
    // The per-doc set size rides along with each posting row, so the
    // jaccard denominator needs no join back to a sizes table.
    val arr = array_distinct(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), n))
    val sh = graft.Caches.cache(docs
      .select(col(idCol), transform(arr, s => xxhash64(s)).as("ss"), size(arr).as("sz"))
      .select(col(idCol), explode(col("ss")).as("shingle"), col("sz")))
    ngramJaccardFromShingles(sh, idCol, threshold, saltFactor, hotThreshold)
  }

  /** Cluster-size histogram over connected components — the dedup
    * REPORT every curation run emits (the size distribution is what
    * tunes the similarity threshold: a fat tail of giant clusters
    * means the bar is too low, all-size-2 means it is too high).
    * Input is [[dedupClusters]] output; two bounded aggregations
    * (component-sized, then histogram-sized).
    *
    * @return (cluster_size, n_clusters) ascending by size
    */
  def clusterSizeHistogram(comp: DataFrame): DataFrame =
    comp.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).cast("long").as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"))

  /** Per-document duplicated-n-gram fraction — the exact-substring
    * dedup signal of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better"): for each document, the fraction
    * of its distinct shingles that also occur in at least one OTHER
    * document. Curation pipelines cut documents above a dup-fraction
    * threshold (heavily templated / syndicated text) where pairwise
    * near-dup misses them (the copies spread over MANY partners, so no
    * single pair clears a Jaccard bar).
    *
    * Served from the at-rest hashed-shingle posting table
    * ([[graft.sources.Ingest.buildIndex]]), which is BUCKETED on
    * `shingle`: both the occurrence count and the join back of the
    * duplicate-shingle set are bucket-local (no exchange — the same
    * layout reuse as [[ngramJaccardFromShingles]]), so the only
    * shuffle at any corpus size is the final per-document aggregate.
    * Crucially there is no pairwise work at all: cost is linear in the
    * posting table, not quadratic in duplicate cluster size.
    *
    * @return (idCol, n_shingles, n_dup, dup_frac)
    */
  def duplicatedShingleFraction(sh: DataFrame, idCol: String): DataFrame = {
    // one row per (doc, shingle) in the at-rest table, so count(*) per
    // shingle counts documents; >= 2 means "occurs elsewhere too"
    val dup = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= 2)
    sh.join(dup.select("shingle"), Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_dup"),
        first(col("sz")).cast("long").as("n_shingles"))
      .withColumn("dup_frac", round(col("n_dup") / col("n_shingles"), 4))
      .select(col(idCol), col("n_shingles"), col("n_dup"), col("dup_frac"))
  }

  /** [[ngramJaccardPairs]] served from a precomputed hashed-shingle
    * posting table (idCol, shingle: long, sz) — the at-rest path
    * ([[graft.sources.Ingest.buildIndex]] materializes it): the
    * per-request cost is the inverted-index join alone, never the
    * corpus tokenize+shingle pass. Like MinHash signatures, shingle
    * sets are a pure per-document function, so any corpus subset
    * serves via semi-join.
    */
  def ngramJaccardFromShingles(
      sh: DataFrame,
      idCol: String,
      threshold: Double,
      saltFactor: Int = 1,
      hotThreshold: Long = 1000): DataFrame = {
    val inter =
      if (saltFactor > 1) {
        val sizes = sh.groupBy(col(idCol)).agg(first(col("sz")).as("sz"))
        Skew.saltedPairCounts(sh, idCol, "shingle", saltFactor, hotThreshold)
          .join(sizes.select(col(idCol).as("a"), col("sz").as("sza")), "a")
          .join(sizes.select(col(idCol).as("b"), col("sz").as("szb")), "b")
      } else {
        val x = sh.select(col(idCol).as("a"), col("shingle"), col("sz").as("sza"))
        val y = sh.select(col(idCol).as("b"), col("shingle"), col("sz").as("szb"))
        x.join(y, "shingle").where(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("inter"),
            first(col("sza")).as("sza"), first(col("szb")).as("szb"))
      }
    inter
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
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val highHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    // one ±1 vote ARRAY per (doc, term) row; the native elementwise-sum
    // aggregate folds them per doc in a single hash aggregation — no
    // bits-fold row explosion (previously terms × bits rows) and one
    // shuffle instead of two
    val votes = transform(sequence(lit(1), lit(bits)), b =>
      when(col("h").substr(b, lit(1)).isin(highHex: _*), 1).otherwise(-1))
    val sums = ColumnBridge.column(
      graft.functions.expr.ElementwiseSum(ColumnBridge.expression(col("votes")))
        .toAggregateExpression())
    docs.select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
      .withColumn("h", md5(col("term").cast("binary")))
      .select(col(idCol), votes.as("votes"))
      .groupBy(col(idCol))
      .agg(sums.as("sums"))
      .select(col(idCol),
        concat_ws("", transform(col("sums"),
          s => when(s >= 0, lit("1")).otherwise(lit("0")))).as("simhash"))
  }

  /** Near-dup pairs with Hamming distance ≤ maxDist between SimHash
    * signatures, found by LOSSLESS band blocking: the signature is split
    * into `maxDist + 1` contiguous bands and candidates are pairs equal
    * in ≥1 band. Pigeonhole guarantees completeness — `maxDist`
    * differing bits can dirty at most `maxDist` of the `maxDist + 1`
    * bands, so every qualifying pair shares a clean band. The result is
    * IDENTICAL to the all-pairs scan, but the pair generation is a
    * bucket equi-join (|bucket|² per band value, not |corpus|²) — the
    * same sub-quadratic shape the reference's segmented index gives its
    * candidate scans (`nidx/nidx_vector/src/segment.rs:626-660`).
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, maxDist: Int = 3): DataFrame = {
    val sig = simHash(docs, idCol, textCol, bits)
    val nBands = maxDist + 1
    val starts = (0 to nBands).map(i => i * bits / nBands)
    val bandCols = (0 until nBands).map { i =>
      struct(lit(i).as("band"),
        substring(col("simhash"), starts(i) + 1, starts(i + 1) - starts(i)).as("bv"))
    }
    val bands = sig.select(col(idCol), explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.bv").as("bv"))
    val cand = bands.select(col(idCol).as("a"), col("band"), col("bv"))
      .join(bands.select(col(idCol).as("b"), col("band"), col("bv")), Seq("band", "bv"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    val sa = sig.select(col(idCol).as("a"), col("simhash").as("__sa"))
    val sb = sig.select(col(idCol).as("b"), col("simhash").as("__sb"))
    cand.join(sa, "a").join(sb, "b")
      .withColumn("hamming",
        graft.functions.VectorFunctions.hamming(col("__sa"), col("__sb")).cast("long"))
      .where(col("hamming") <= maxDist)
      .select("a", "b", "hamming")
  }

  /** Winnowing fingerprints (rolling-hash document fingerprinting, the
    * MOSS scheme): hash every word `k`-gram, slide a window of `w`
    * consecutive hashes, keep each window's minimum — a position-robust
    * fingerprint set whose overlap survives local edits. Hashes are md5
    * strings (engine-portable); the window min is a sliding window
    * function, so the whole computation is one narrow pass + one
    * distinct.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs.select(col(idCol),
      posexplode(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), k))
        .as(Seq("pos", "shingle")))
      .withColumn("h", md5(col("shingle").cast("binary")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    sh.withColumn("fp", min(col("h")).over(win))
      .select(col(idCol), col("fp")).distinct()
  }

  /** Near-dup pairs by shared winnowing fingerprints (≥ minShared). */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2): DataFrame = {
    val fp = winnowFingerprints(docs, idCol, textCol, k, w)
    fp.select(col(idCol).as("a"), col("fp"))
      .join(fp.select(col(idCol).as("b"), col("fp")), "fp")
      .where(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Connected components over near-dup pairs → dedup clusters: the
    * "keep one per duplicate group" step every near-dup pipeline ends
    * with (pairs alone don't dedup — transitive groups do). Each round
    * takes the min over a node's own and its neighbors' labels, then
    * POINTER-JUMPS (label ← label's label, path halving) — the jump
    * doubles the propagated distance per round, so convergence is
    * O(log diameter) rounds, not O(diameter); a chain corpus that
    * plain propagation walks in hundreds of rounds closes in ~10.
    * The driver loop stops at the fixpoint (one count per round).
    *
    * Scale shape: every round is ONE shuffle (the min-aggregation of
    * neighbor-contributed labels union own labels) plus broadcast
    * joins of the label table for the jump and the convergence check;
    * only docs that appear in a pair participate — a small fraction of
    * the corpus. `broadcastLabels = false` switches those joins to
    * shuffles for pathological pair sets too large to broadcast. The
    * component label is monotone non-increasing and always a reachable
    * min, so intermediate states are valid and the fixpoint is the
    * true component minimum = the keep-id. localCheckpoint (eager)
    * truncates lineage every round — without it the logical plan
    * doubles per iteration (each round references the previous twice:
    * step + jump) and Catalyst analysis, not the data, becomes the
    * bottleneck.
    *
    * @return (node, component) — component = min doc id of the group
    */
  /** Cost-model entry point: a pair set that fits the driver
    * comfortably (≤ `driverPairLimit` edges; the default 2¹⁸ costs on
    * the order of tens of MB on the driver — boxed Rows + the
    * union-find's node map, NOT two raw longs per edge) resolves with
    * an in-process union-find — identical min-label components
    * (equality-tested in DedupSpec), none of the distributed fixpoint's
    * per-round job overhead — while anything larger runs the O(log d)
    * fixpoint. The same brute-vs-index duality as the vector cost model
    * (`segment.rs:626-660`): near-dup pair sets are orders of magnitude
    * smaller than their corpus, so even 100 TB corpora often land in
    * the driver branch; the probe is bounded by construction
    * (`limit(driverPairLimit + 1)` decides the branch, so at most
    * limit+1 rows ever reach the driver). `driverPairLimit = 0` forces
    * the distributed path. Null-id edges are dropped up front on both
    * branches (a null never joins in the distributed rounds either).
    */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25, broadcastLabels: Boolean = true,
      roundsPerCheckpoint: Int = 1,
      driverPairLimit: Int = 1 << 18): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val nonNull = pairs.where(col(aCol).isNotNull && col(bCol).isNotNull)
    val dt = pairs.schema(aCol).dataType
    val orderable = dt == LongType || dt == IntegerType || dt == StringType
    if (driverPairLimit > 0 && orderable && dt == pairs.schema(bCol).dataType) {
      val probeN = math.min(driverPairLimit.toLong + 1, Int.MaxValue.toLong).toInt
      val probe = nonNull.select(col(aCol), col(bCol)).limit(probeN).collect()
      if (probe.length <= driverPairLimit)
        return unionFindComponents(probe, dt, pairs.sparkSession)
      // over the limit: fall through to the distributed fixpoint (the
      // pair plan recomputes — only ever paid past the driver bound)
    }
    dedupClustersWithStats(nonNull, aCol, bCol, maxIter, broadcastLabels,
      roundsPerCheckpoint)._1
  }

  /** Driver-side union-find over a bounded pair list: path-compressed
    * forest, then each component labels with its MINIMUM member — the
    * exact fixpoint the distributed rounds converge to, computed in one
    * pass. Deterministic for any orderable id type.
    */
  private def unionFindComponents(rows: Array[org.apache.spark.sql.Row],
      dt: org.apache.spark.sql.types.DataType,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    // boxed Integer values: a primitive-Int map would silently unbox a
    // missing key's null to 0 and alias every node to index 0
    val index = new java.util.HashMap[Any, Integer]()
    val values = scala.collection.mutable.ArrayBuffer[Any]()
    val parent = scala.collection.mutable.ArrayBuffer[Int]()
    def id(v: Any): Int = {
      val got = index.get(v)
      if (got ne null) got.intValue
      else {
        val i = values.length
        index.put(v, Integer.valueOf(i)); values += v; parent += i; i
      }
    }
    def find(i0: Int): Int = {
      var i = i0
      while (parent(i) != i) { parent(i) = parent(parent(i)); i = parent(i) }
      i
    }
    rows.foreach { r =>
      val (a, b) = (find(id(r.get(0))), find(id(r.get(1))))
      if (a != b) parent(a) = b
    }
    @annotation.nowarn("cat=other-match-analysis")
    val lt: (Any, Any) => Boolean = dt match {
      case org.apache.spark.sql.types.LongType =>
        (x, y) => x.asInstanceOf[Long] < y.asInstanceOf[Long]
      case org.apache.spark.sql.types.IntegerType =>
        (x, y) => x.asInstanceOf[Int] < y.asInstanceOf[Int]
      case org.apache.spark.sql.types.StringType =>
        // UTF-8 BINARY comparison — Spark's UTF8String order, NOT Java's
        // UTF-16 compareTo (they disagree on non-BMP code points, which
        // would let the two cost-model branches pick different labels)
        (x, y) => java.util.Arrays.compareUnsigned(
          x.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    }
    val minOfRoot = new java.util.HashMap[Int, Any]()
    values.indices.foreach { i =>
      val r = find(i)
      val cur = minOfRoot.get(r)
      if (cur == null || lt(values(i), cur)) minOfRoot.put(r, values(i))
    }
    val out: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(values.indices.map(i =>
        org.apache.spark.sql.Row(values(i), minOfRoot.get(find(i)))): _*)
    spark.createDataFrame(out,
      StructType(Seq(StructField("node", dt), StructField("component", dt))))
  }

  /** Keep-BEST-member selection per near-dup cluster — the curation
    * choice modern pipelines make instead of the min-id keeper
    * [[dedupClusters]]'s component label implies: within each
    * connected component of the pair graph, keep the member that
    * maximizes `scoreCol` (length, quality score, …), smallest id on
    * ties. `clusters` is [[dedupClusters]] output (node, component);
    * `scored` carries (idCol, scoreCol).
    *
    * Scale shape: one broadcast-or-shuffle join to attach scores, then
    * a window partitioned BY COMPONENT — bounded by the largest
    * near-dup cluster, not the corpus (a pathological boilerplate
    * mega-cluster funnels through one partition, but such clusters are
    * exactly what boilerplate removal deletes upstream).
    *
    * @return (component, keeper, scoreCol) — one row per component
    */
  def keepBestInCluster(clusters: DataFrame, scored: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // LEFT join + nulls-last order: a member missing from `scored`
    // (e.g. scores computed only for an upstream-filtered subset) can
    // still never beat a scored sibling, but an all-unscored component
    // keeps its min-id member instead of VANISHING — an inner join
    // would silently delete every member of such a cluster through the
    // downstream keep-list
    val joined = clusters.join(
      scored.select(col(idCol).as("node"), col(scoreCol)), Seq("node"), "left")
    val w = Window.partitionBy(col("component"))
      .orderBy(col(scoreCol).desc_nulls_last, col("node").asc)
    joined.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("component"), col("node").as("keeper"), col(scoreCol))
  }

  /** [[dedupClusters]] + the number of propagation rounds executed —
    * the observable the O(log d) convergence assertions measure.
    * `maxIter` bounds propagation ROUNDS (the seed aggregation counts
    * as round 1); `roundsPerCheckpoint` controls how many rounds run
    * between eager checkpoints — measured at sf0.1 pair sets (q74
    * shape), batching LOST to one-round-per-checkpoint (the extra
    * cache materializations cost more than the saved checkpoint +
    * count), so the default is 1; the knob stays for pair graphs with
    * long chains, where halving the fixed per-checkpoint overhead wins.
    */
  def dedupClustersWithStats(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25, broadcastLabels: Boolean = true,
      roundsPerCheckpoint: Int = 1): (DataFrame, Int) = {
    require(roundsPerCheckpoint >= 1, "roundsPerCheckpoint must be >= 1")
    val bc: DataFrame => DataFrame = if (broadcastLabels) broadcast else identity
    val fwd = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
    // the cache pins partitioning (AQE will not re-coalesce a cached
    // relation), so right-size it explicitly: near-dup pair sets are
    // orders of magnitude smaller than the corpus, and every round
    // rescans this table — spark.sql.shuffle.partitions-many near-empty
    // tasks per round would dominate the loop
    val edges = fwd.union(fwd.select(col("y").as("x"), col("x").as("y")))
      .distinct().coalesce(math.max(1, pairs.sparkSession.sparkContext
        .defaultParallelism / 8)).cache()
    // seed with the first propagation round directly — min(self, min
    // neighbor) is one aggregation over edges (every node appears as x
    // since edges carry both orientations), saving a full loop round
    // with its convergence count
    var labels = edges.groupBy(col("x")).agg(min(col("y")).as("__m"))
      .select(col("x").as("node"), least(col("x"), col("__m")).as("component"))
      .localCheckpoint(true)
    // one propagation round: min(own, neighbors') labels + path halving.
    // The stepped cache is lazy — both sides of the path-halving
    // self-join read it, and it fills inside the checkpoint's job — and
    // is handed back for release once the round's output is pinned.
    def round(lbl: DataFrame): (DataFrame, Seq[DataFrame]) = {
      val contrib = edges
        .join(bc(lbl).select(col("node").as("y"), col("component").as("c")), "y")
        .select(col("x").as("node"), col("c"))
      val stepped = contrib
        .union(lbl.select(col("node"), col("component").as("c")))
        .groupBy("node").agg(min("c").as("component"))
        .cache()
      val halved = stepped
        .join(bc(stepped).select(col("node").as("component"), col("component").as("__cc")),
          Seq("component"), "left")
        .select(col("node"), coalesce(col("__cc"), col("component")).as("component"))
      (halved, Seq(stepped))
    }
    var changed = 1L
    var rounds = 1 // the seed aggregation above is round 1
    try {
      while (changed > 0 && rounds < maxIter) {
        // `roundsPerCheckpoint` propagation rounds per eager checkpoint
        // + convergence count. Intermediate rounds stay cached (each is
        // read twice by the next round's path-halving self-join) and
        // release once the batch's output is pinned; labels are
        // monotone non-increasing, so an extra round past convergence
        // is a no-op and batching never changes the fixpoint.
        val n = math.min(roundsPerCheckpoint, maxIter - rounds)
        var cur = labels
        val toRelease = scala.collection.mutable.Buffer[DataFrame]()
        (1 to n).foreach { i =>
          val (stepped, cs) = round(cur)
          toRelease ++= cs
          cur = if (i == n) stepped
            else { val c = stepped.cache(); toRelease += c; c }
        }
        val next = cur.localCheckpoint(true)
        toRelease.foreach(_.unpersist())
        changed = next.as("n").join(bc(labels).as("o"), "node")
          .where(col("n.component") =!= col("o.component")).count()
        labels = next
        rounds += n
      }
    } finally edges.unpersist()
    (labels, rounds)
  }

  /** Embedding near-dup pairs with IVF-cluster blocking: each vector is
    * assigned to its `multiAssign` nearest centroids (rounded cosine
    * desc, centroid-id tiebreak — deterministic and engine-portable),
    * candidates are pairs sharing ≥1 assigned cluster, and candidates
    * are verified with the exact cosine ≥ threshold.
    *
    * Scale shape: the centroid set is driver-scale (like a query
    * vector), so assignment is pure codegen'd array math on a broadcast
    * literal — no join, no corpus shuffle; pair generation is a bucket
    * equi-join on cluster id (Σ|cluster|² work, not |corpus|²). This is
    * the blocked-candidates duality of the reference's per-segment scan
    * (`nidx/nidx_vector/src/segment.rs:626-660`): recall is governed by
    * `multiAssign`/centroid count exactly as nprobe governs IVF search
    * recall, and is measured against [[embeddingNearDupsExact]] in
    * DedupSpec.
    */
  def embeddingNearDups(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      centroids: DataFrame,
      cidCol: String,
      cvecCol: String,
      multiAssign: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions._
    val cents: Seq[(Int, Seq[Float])] = centroids
      .select(col(cidCol).cast("int"), col(cvecCol))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1)
    // per-row top-m clusters: score the literal centroid array in one
    // codegen'd pass, sort by (-score, cid), slice m
    val scoredCents = transform(typedlit(cents), c =>
      struct((-round(cosine(col(vecCol), c.getField("_2")), 6)).as("neg"),
        c.getField("_1").as("cid")))
    val topM = slice(sort_array(scoredCents), 1, multiAssign)
    // carry the vector through the cluster join: score candidates in the
    // same pass and dedup only the (few) surviving pairs — no second
    // join back to the corpus, no distinct over the candidate set.
    // cached: BOTH sides of the self-join read this projection, and
    // without the cache the per-row centroid scoring pass (the |C|
    // cosines per vector) runs twice per request
    val assign = graft.Caches.cache(vectors.select(col(idCol), col(vecCol),
      explode(topM.getField("cid")).as("__cid")))
    val a = assign.select(col(idCol).as("a"), col(vecCol).as("__va"), col("__cid"))
    val b = assign.select(col(idCol).as("b"), col(vecCol).as("__vb"), col("__cid"))
    a.join(b, "__cid")
      .where(col("a") < col("b"))
      .withColumn("score", round(cosine(col("__va"), col("__vb")), 6))
      .where(col("score") >= threshold)
      .select("a", "b", "score").distinct()
  }

  /** Exact all-pairs embedding near-dup — the correctness oracle for
    * [[embeddingNearDups]] at test scale (O(n²); never run this on a
    * full corpus).
    */
  def embeddingNearDupsExact(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val a = vectors.select(col(idCol).as("a"), col(vecCol).as("va"))
    val b = vectors.select(col(idCol).as("b"), col(vecCol).as("vb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("score", round(cosine(col("va"), col("vb")), 6))
      .where(col("score") >= threshold)
      .select("a", "b", "score")
  }

  /** Cross-document repeated-paragraph (boilerplate) detection — the
    * RefinedWeb/MassiveText curation rule: a paragraph whose text
    * recurs in ≥ `minDocs` DISTINCT documents is boilerplate (cookie
    * banners, navigation chrome, license footers) and is dropped from
    * every document before training. Served from the at-rest paragraph
    * table: one hash over the paragraph text, one (hash → distinct-doc
    * count) aggregation, one broadcast-able semi-join back — no
    * all-pairs work, so the shape holds at any corpus size (the
    * duplicate-hash table is tiny relative to the corpus by the same
    * head-heavy skew that makes boilerplate worth removing).
    *
    * @return the flagged paragraph rows: (parIdCol, idCol, n_docs)
    */
  def boilerplateParagraphs(
      pars: DataFrame,
      idCol: String,
      parIdCol: String,
      textCol: String,
      minDocs: Int = 2): DataFrame = {
    val hashed = pars.select(col(idCol), col(parIdCol),
      md5(col(textCol).cast("binary")).as("__h"))
    val hot = hashed.groupBy("__h")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
    hashed.join(hot, "__h")
      .select(col(parIdCol), col(idCol), col("n_docs"))
  }
}
