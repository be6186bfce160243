package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.functions.VectorFunctions.Similarity

/** Dense-vector retrieval operators.
  *
  * The reference's vector index is per-segment HNSW with a brute-force
  * fallback chosen by a cost model
  * (`nidx/nidx_vector/src/segment.rs:477-660`). The Spark-first
  * re-expression: brute-force scoring IS the correctness oracle (and is
  * embarrassingly parallel — each partition scores its slice, the top-k
  * merge is TakeOrderedAndProject); the scale path prunes candidates
  * with IVF-style cluster assignment ([[ivfAssign]]/[[ivfSearch]]) or a
  * 1-bit signature pre-score ([[signaturePrescore]], RaBitQ analog) —
  * both reduce the scanned fraction, the same duality the reference's
  * `use_hnsw` cost model expresses.
  *
  * All scores are computed in double precision on broadcast query
  * vectors; corpus-side data never shuffles for a search — only the
  * per-partition top-k survivors move.
  */
object VectorSearch {

  /** Brute-force top-k for a single query vector (broadcast).
    * `queries` must be 1 row: (qid, vector). Deterministic cut:
    * rounded score desc, id asc. `similarity` selects the configured
    * scoring function (cosine default; Dot for dot-configured
    * vectorsets, `nidx_vector/src/config.rs:56-60`).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      k: Int,
      minScore: Double = -1.0,
      similarity: Similarity = Similarity.Cosine): DataFrame =
    corpus.crossJoin(broadcast(query.select(col(queryVecCol).as("__qv"))))
      .withColumn("score",
        round(graft.functions.VectorFunctions.score(
          similarity, col(vecCol), col("__qv")), 6))
      .where(col("score") >= minScore)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** Batch kNN join: top-k corpus neighbors per query row.
    *
    * Broadcast the (small) query set, score every (corpus, query) pair
    * in the scan, then cut to k per query with the bounded-heap
    * aggregate [[graft.functions.expr.TopKByScore]] rather than a
    * per-query window: the window shape shuffles all |corpus|×|queries|
    * scored rows into |queries| reducers (one reducer drains an entire
    * corpus per query), while the aggregate partial-combines map-side so
    * the exchange carries only |queries|×partitions buffers of ≤k
    * entries. Order and tie-breaks (score desc, id asc on rounded
    * scores) are identical to the window form.
    *
    * Null handling: corpus rows with a null id or embedding are
    * EXCLUDED (filtered explicitly below; the heap aggregate would skip
    * them anyway) — a null vector has no defined similarity, so it can
    * never be a neighbor. A query whose id never matches any corpus row
    * yields no output rows.
    */
  def knnJoin(
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val scored = corpus
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .crossJoin(
        broadcast(queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"))))
      .withColumn("score",
        round(cosine(col(vecCol), col("__qv")), 6))
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val topk = ColumnBridge.column(
      graft.functions.expr.TopKByScore(
          ColumnBridge.expression(col("score")),
          ColumnBridge.expression(col(idCol)), k)
        .toAggregateExpression())
    scored.groupBy(col("__qid"))
      .agg(topk.as("__top"))
      .select(col("__qid").as(qidCol), posexplode(col("__top")))
      .select(col(qidCol), col("col.id").as(idCol),
        col("col.score").as("score"), (col("pos") + 1).as("rank"))
  }

  /** Multi-vector MaxSim (ColBERT-style,
    * `nidx_vector/src/searcher.rs:345-394`, `multivector.rs`):
    * score(group) = Σ_q max_{v∈group} cos(q, v). `groupCol` identifies
    * the multi-vector document.
    */
  def maxSim(
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      corpus: DataFrame,
      groupCol: String,
      vecCol: String): DataFrame =
    corpus.crossJoin(
        broadcast(queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"))))
      .withColumn("score", cosine(col(vecCol), col("__qv")))
      .groupBy(col(groupCol), col("__qid"))
      .agg(max(col("score")).as("best"))
      .groupBy(col(groupCol))
      .agg(round(sum(col("best")), 4).as("maxsim_score"))

  /** IVF cluster assignment: nearest centroid per vector (argmax cosine,
    * centroid-id tiebreak). At scale this becomes the partitioning
    * column — searches then scan only the `nprobe` nearest clusters.
    */
  def ivfAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      cidCol: String,
      cvecCol: String): DataFrame = {
    val scored = corpus.crossJoin(
        broadcast(centroids.select(col(cidCol).as("__cid"), col(cvecCol).as("__cv"))))
      .withColumn("score",
        round(cosine(col(vecCol), col("__cv")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("__cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") === 1)
      .select(col(idCol), col("__cid").as("centroid_id"), col("score"))
  }

  /** One k-means iteration over the corpus: assign every vector to its
    * nearest centroid ([[ivfAssign]]) and recompute each centroid as
    * the member mean — the IVF TRAINING step (the reference sidesteps
    * training by using HNSW; the Spark-scale path trains coarse
    * centroids with exactly this loop, typically on a sample).
    * Per iteration: one scan for assignment (broadcast centroids,
    * codegen scoring) and ONE hash aggregation whose buffer is the
    * native [[graft.functions.expr.ElementwiseSumDouble]] — member
    * vectors combine map-side, so the shuffle carries |centroids|
    * partial sums per partition, never the corpus. Empty clusters drop
    * (standard k-means behavior).
    *
    * @return (centroid_id, cvec array<double>, n_members)
    */
  def kmeansStep(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      cidCol: String,
      cvecCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val assigned = ivfAssign(corpus, idCol, vecCol, centroids, cidCol, cvecCol)
      .select(col(idCol), col("centroid_id"))
    val sumAgg = ColumnBridge.column(
      graft.functions.expr.ElementwiseSumDouble(ColumnBridge.expression(col(vecCol)))
        .toAggregateExpression())
    corpus.join(assigned, idCol)
      .groupBy(col("centroid_id"))
      .agg(sumAgg.as("__sum"), count(lit(1)).as("n_members"))
      .select(col("centroid_id"),
        transform(col("__sum"), x => x / col("n_members")).as(cvecCol),
        col("n_members"))
  }

  /** IVF probe search: rank centroids against the query, keep the
    * `nprobe` nearest, and brute-force only vectors assigned to those
    * clusters. At scale `assignments` is precomputed at ingest and the
    * corpus is partitioned by centroid id, so the probe is partition
    * pruning; here the assignment join expresses the same plan.
    * Approximate by construction — recall vs [[bruteForceTopK]] is
    * measured in AnnRecallSpec.
    */
  def ivfSearch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      assignments: DataFrame, // (idCol, centroid_id) from ivfAssign
      centroids: DataFrame,
      cidCol: String,
      cvecCol: String,
      query: DataFrame,
      queryVecCol: String,
      k: Int,
      nprobe: Int): DataFrame = {
    val candidates = ivfCandidates(corpus, idCol, assignments,
      centroids, cidCol, cvecCol, query, queryVecCol, nprobe)
    bruteForceTopK(candidates, idCol, vecCol, query, queryVecCol, k)
  }

  /** Shared coarse-probe step: rank centroids against the query, keep
    * the `nprobe` nearest, and cut the corpus to their members (a
    * broadcast of the probe list + one left-semi join ≡ partition
    * pruning when the corpus is stored by centroid id). Used by both
    * [[ivfSearch]] and [[ivfPqSearch]] so probe semantics cannot
    * drift between the two.
    */
  private def ivfCandidates(
      corpus: DataFrame,
      idCol: String,
      assignments: DataFrame,
      centroids: DataFrame,
      cidCol: String,
      cvecCol: String,
      query: DataFrame,
      queryVecCol: String,
      nprobe: Int): DataFrame = {
    val probes = bruteForceTopK(centroids, cidCol, cvecCol, query, queryVecCol, nprobe)
      .select(col(cidCol).as("centroid_id"))
    val candidateIds = assignments
      .join(broadcast(probes), "centroid_id")
      .select(idCol)
    corpus.join(candidateIds, Seq(idCol), "left_semi")
  }

  /** Multi-probe LSH bucket search: bucket = first `prefixBits` of the
    * sign signature; probe the query's bucket plus every hamming-1
    * neighbor bucket, then brute-force only those buckets' vectors. At
    * scale the bucket is a partition column, so each probe is a pruned
    * partition read; the probe list (prefixBits+1 buckets) is computed
    * from the single query row driver-side.
    */
  def lshBucketSearch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      k: Int,
      prefixBits: Int): DataFrame = {
    // sign only the prefix components — no full-dim signature per row
    def bucketOf(v: Column) = signBits(slice(v, 1, prefixBits))
    val qBucketOpt = query
      .select(bucketOf(col(queryVecCol)).as("b"))
      .collect().headOption.map(_.getString(0)).filter(_ != null)
    qBucketOpt match {
      case None => // empty/null query → empty result, like the siblings
        corpus.select(col(idCol), lit(0.0).as("score")).limit(0)
      case Some(qBucket) =>
        // short vectors yield short buckets; probe only existing bits
        val bits = math.min(prefixBits, qBucket.length)
        val probes = qBucket +: (0 until bits).map { i =>
          val flipped = if (qBucket.charAt(i) == '1') '0' else '1'
          qBucket.updated(i, flipped)
        }
        val bucketed = corpus.withColumn("__bucket", bucketOf(col(vecCol)))
        bruteForceTopK(
          bucketed.where(col("__bucket").isInCollection(probes)),
          idCol, vecCol, query, queryVecCol, k)
    }
  }

  /** RaBitQ search with the ε error-bound candidate window
    * (`nidx_vector/src/vector_types/rabitq.rs:26-48,202-243`): per
    * vector, a 1-bit quantization yields a cheap cosine ESTIMATE plus a
    * per-vector error bound err = sqrt((1−d²)/d²)·ε/√D where d is the
    * cosine between the vector and its own binary representation; the
    * reference reranks a candidate exactly only while its upper bound
    * (est + err) can still beat the current k-th best. The set-level
    * form of that early-termination heap: let kthLower = k-th largest
    * (est − err); every vector with est + err < kthLower can never
    * enter the top-k, so the exact rerank set is {est + err ≥ kthLower}
    * — an ADAPTIVE window replacing a fixed rerank count, with
    * guaranteed recall whenever the error bound holds (ε=1.9 ≈ the
    * paper's recommendation).
    *
    * Estimator math (normalized q, v; repr(v) = sign(v)/√D):
    * est = (q·repr)/(v̂·repr) = dot(q̂, sign(v))·‖v‖/L1(v), and
    * d = v̂·repr = L1(v)/(‖v‖·√D). Cheap pass = two codegen'd dot
    * products per row, no raw-vector rerank work; only the bounded
    * candidate set pays full cosines. Both passes are scans — the
    * kth-lower threshold is a broadcast 1-row aggregate.
    */
  def rabitqSearch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      k: Int,
      epsilon: Double = 1.9): DataFrame = {
    val q = broadcast(query.select(col(queryVecCol).as("__qv")))
    val signv = transform(col(vecCol), x => when(x > 0, 1.0).otherwise(-1.0))
    val dim = size(col(vecCol)).cast("double")
    val l1 = dot(col(vecCol), signv) // Σ|v_i|
    val l2 = sqrt(dot(col(vecCol), col(vecCol)))
    val qn = col("__qv") // q normalized inside cosine-style ratio below
    // est = dot(q, sign(v)) / ‖q‖ · ‖v‖ / L1(v); d = L1/(‖v‖·√D)
    val estimated = corpus.crossJoin(q)
      .withColumn("__est",
        round(dot(qn, signv) / sqrt(dot(qn, qn)) * l2 / l1, 6))
      .withColumn("__d", l1 / (l2 * sqrt(dim)))
      .withColumn("__err",
        round(sqrt((lit(1.0) - col("__d") * col("__d")) /
          (col("__d") * col("__d"))) * lit(epsilon) / sqrt(dim), 6))
    val kthLower = estimated
      .select((col("__est") - col("__err")).as("__lower"), col(idCol))
      .orderBy(col("__lower").desc, col(idCol).asc)
      .limit(k)
      .agg(min("__lower").as("__kth_lower"))
    val candidates = estimated.crossJoin(broadcast(kthLower))
      .where(col("__est") + col("__err") >= col("__kth_lower"))
    candidates
      .withColumn("score", round(cosine(col(vecCol), col("__qv")), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Product-quantization code assignment: the vector is split into `m`
    * contiguous subvectors and each is replaced by the id of its nearest
    * codeword (min squared L2, rounded at 6, codeword-id tiebreak —
    * deterministic and engine-portable). `codebook` is one shared
    * codeword list applied per subspace, `(cid, full-dim vector)` with
    * cids 1..K in order; subspace j uses each codeword's j-th slice.
    *
    * Scale shape: the codebook is driver-scale (like IVF centroids), so
    * assignment is pure codegen'd array math on broadcast literals — one
    * narrow scan, no shuffle. The m small ints per row replace the full
    * float vector: 64-dim float32 → 4 bytes is the 64× compression that
    * makes a 100 TB embedding column scannable; the same
    * memory-vs-recall dial the reference turns with 1-bit RaBitQ
    * quantization (`nidx_vector/src/vector_types/rabitq.rs:25-40`),
    * with PQ sitting between 1-bit codes and raw floats.
    *
    * @return (idCol, __c0..__c{m-1}) one codeword id per subspace
    */
  /** Per-subspace nearest-codeword struct (d, cid): the argmin is the
    * head of the sorted (rounded distance, codeword id) array — shared
    * by code assignment, training, and distortion measurement.
    * ‖sv − cw‖² = sv·sv − 2·sv·cw + ‖cw‖²; the array() wrapper is a
    * let binding so the subvector slice is evaluated once per row, not
    * once per codeword.
    */
  private def pqNearest(vecCol: String, codebook: Seq[(Int, Seq[Float])],
      m: Int)(j: Int): Column = {
    val dim = codebook.head._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // per-subspace literal: (cid, codeword slice, precomputed ‖cw‖²)
    val cbLit = typedlit(codebook.map { case (cid, cw) =>
      val sub = cw.slice(j * subDim, (j + 1) * subDim)
      (cid, sub, sub.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    })
    element_at(transform(array(slice(col(vecCol), j * subDim + 1, subDim)), sv =>
      element_at(sort_array(transform(cbLit, c =>
        struct(
          round(dot(sv, sv) - lit(2.0) * dot(sv, c.getField("_2")) + c.getField("_3"), 6)
            .as("d"),
          c.getField("_1").as("cid")))), 1)), 1)
  }

  def pqCodes(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebook: Seq[(Int, Seq[Float])],
      m: Int): DataFrame = {
    val nearest = pqNearest(vecCol, codebook, m) _
    corpus.select(col(idCol) +:
      (0 until m).map(j => nearest(j).getField("cid").as(s"__c$j")): _*)
  }

  /** Mean PQ quantization distortion: avg over vectors of
    * Σ_j ‖sv_j − nearest codeword_j‖² — the objective Lloyd iterations
    * ([[pqTrain]]) monotonically decrease. One narrow scan + one global
    * aggregate.
    */
  def pqDistortion(corpus: DataFrame, vecCol: String,
      codebook: Seq[(Int, Seq[Float])], m: Int): Double = {
    val nearest = pqNearest(vecCol, codebook, m) _
    corpus.select(
        (0 until m).map(j => nearest(j).getField("d")).reduce(_ + _).as("__d"))
      .agg(avg("__d")).collect().head.getDouble(0)
  }

  /** PQ codebook training: `iters` Lloyd rounds per subspace, all
    * subspaces in the same pass. Each round is one scan (assignment is
    * codegen'd literal-array math, then one explode to (subspace, code,
    * subvector) rows) and ONE hash aggregation whose buffer is the
    * native elementwise-sum aggregate — partials combine map-side, so
    * the shuffle carries m×K partial sums per partition, never the
    * corpus (the same shape as [[kmeansStep]]). The m×K centroid table
    * is collected driver-side per round (driver-scale, like the
    * centroid literals everywhere else). Empty codewords keep their
    * previous value. Codewords are returned full-dim (slice j is
    * subspace j's centroid), so the result drops into
    * [[pqCodes]]/[[pqAdcSearch]] unchanged.
    */
  def pqTrain(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      init: Seq[(Int, Seq[Float])],
      m: Int,
      iters: Int): Seq[(Int, Seq[Float])] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dim = init.head._2.length
    val subDim = dim / m
    var codebook = init
    (1 to iters).foreach { _ =>
      val nearest = pqNearest(vecCol, codebook, m) _
      val entries = corpus.select(explode(array((0 until m).map { j =>
          struct(lit(j).as("j"), nearest(j).getField("cid").as("cid"),
            slice(col(vecCol), j * subDim + 1, subDim).cast("array<double>").as("sv"))
        }: _*)).as("e"))
        .select(col("e.j").as("j"), col("e.cid").as("cid"), col("e.sv").as("sv"))
      val sums = ColumnBridge.column(
        graft.functions.expr.ElementwiseSumDouble(ColumnBridge.expression(col("sv")))
          .toAggregateExpression())
      val centroids = entries.groupBy("j", "cid")
        .agg(sums.as("__sum"), count(lit(1)).as("n"))
        .select(col("j"), col("cid"),
          transform(col("__sum"), x => x / col("n")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      codebook = codebook.map { case (cid, cw) =>
        val updated = (0 until m).flatMap { j =>
          centroids.get((j, cid))
            .map(_.map(_.toFloat))
            .getOrElse(cw.slice(j * subDim, (j + 1) * subDim))
        }
        (cid, updated)
      }
    }
    codebook
  }

  /** PQ search with asymmetric distance computation (ADC): the query
    * stays full-precision and each corpus vector is scored from its PQ
    * code alone — score ≈ Σ_j q_subⱼ · codeword(codeⱼ)ⱼ, a per-subspace
    * table lookup. The m×K lookup table is computed driver-side from the
    * query and broadcast as a literal, so the scan reads ONLY the code
    * columns (the raw vector column is never touched — at rest that is
    * a 64× smaller column scan). Approximate by construction; recall vs
    * [[bruteForceTopK]] is measured in AnnRecallSpec.
    */
  /** ADC lookup table for subspace `j` as an array literal:
    * adc(j)(cid) = q_subⱼ · codeword(cid)_subⱼ, rounded at 6 so the
    * estimate is engine-portable. */
  private def adcLit(queryVec: Seq[Float], codebook: Seq[(Int, Seq[Float])],
      m: Int)(j: Int): Column = {
    val subDim = codebook.head._2.length / m
    typedlit(codebook.map { case (_, cw) =>
      val s = j * subDim
      val d = (0 until subDim).foldLeft(0.0) { (acc, i) =>
        acc + queryVec(s + i).toDouble * cw(s + i).toDouble
      }
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    })
  }

  def pqAdcSearch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Seq[Float],
      codebook: Seq[(Int, Seq[Float])],
      m: Int,
      k: Int): DataFrame = {
    require(codebook.map(_._1) == (1 to codebook.size), "codebook cids must be 1..K in order")
    val adc = adcLit(queryVec, codebook, m) _
    val codes = pqCodes(corpus, idCol, vecCol, codebook, m)
    val est = round(
      (0 until m).map(j => element_at(adc(j), col(s"__c$j"))).reduce(_ + _), 6)
    codes.withColumn("est", est)
      .select(col(idCol), col("est"))
      .orderBy(col("est").desc, col(idCol).asc)
      .limit(k)
  }

  /** PQ codes packed into ONE BinaryType column — the at-rest layout:
    * byte j of `code` is subspace j's codeword id (1..K ≤ 255), so a
    * billion-vector corpus stores m bytes per vector and the ADC scan
    * reads a single fixed-width binary column instead of m int columns
    * (or the 4·dim-byte raw vector — 64× wider at dim=64, m=16). The
    * pack is pure codegen'd column work: hex-encode each code, concat,
    * unhex.
    */
  def pqCodesBinary(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebook: Seq[(Int, Seq[Float])],
      m: Int): DataFrame = {
    require(codebook.size <= 255, "binary PQ codes hold one byte per subspace")
    val codes = pqCodes(corpus, idCol, vecCol, codebook, m)
    codes.select(col(idCol),
      unhex(concat((0 until m).map(j =>
        lpad(hex(col(s"__c$j")), 2, "0")): _*)).as("code"))
  }

  /** ADC search over an at-rest binary code table ([[pqCodesBinary]]'s
    * output read back from parquet) — the serving-side pair of
    * [[pqAdcSearch]]: identical estimates and cut, but the scan touches
    * ONLY (id, code); the raw vector column does not exist in the
    * table. Byte j decodes with a substring of the hex encoding — all
    * codegen'd built-ins, no UDF.
    */
  def pqAdcSearchFromCodes(
      codes: DataFrame,
      idCol: String,
      codeCol: String,
      queryVec: Seq[Float],
      codebook: Seq[(Int, Seq[Float])],
      m: Int,
      k: Int): DataFrame = {
    require(codebook.map(_._1) == (1 to codebook.size), "codebook cids must be 1..K in order")
    val adc = adcLit(queryVec, codebook, m) _
    val hexed = hex(col(codeCol))
    val est = round(
      (0 until m).map(j => element_at(adc(j),
        conv(substring(hexed, j * 2 + 1, 2), 16, 10).cast("int"))).reduce(_ + _), 6)
    codes.withColumn("est", est)
      .select(col(idCol), col("est"))
      .orderBy(col("est").desc, col(idCol).asc)
      .limit(k)
  }

  /** PQ-ADC prescore + exact rerank (the IVF-PQ production shape): the
    * cheap code-only ADC pass nominates `rerank` candidates, then only
    * those read their raw vectors for an exact cosine — the same
    * two-pass contract as [[signaturePrescore]], with PQ's finer
    * estimate nominating a far smaller rerank set for equal recall.
    */
  def pqSearchReranked(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Seq[Float],
      codebook: Seq[(Int, Seq[Float])],
      m: Int,
      k: Int,
      rerank: Int): DataFrame = {
    val candidates = pqAdcSearch(corpus, idCol, vecCol, queryVec, codebook, m, rerank)
      .select(col(idCol))
    corpus.join(candidates, Seq(idCol), "left_semi")
      .withColumn("score", round(cosine(col(vecCol), typedlit(queryVec)), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-PQ: the canonical billion-scale ANN composition — coarse IVF
    * probing prunes to `nprobe` clusters' members (at rest: partition
    * pruning on the centroid-id column), PQ-ADC scores ONLY those
    * members from their codes (at rest: the pruned scan reads the
    * m-byte code column, not the raw vectors), and an exact rerank of
    * the ADC top `rerank` pays full-precision cosines for a bounded
    * set. Every stage narrows the previous one; the raw vector column
    * is touched only for `rerank` rows. Recall vs exact brute force is
    * measured in AnnRecallSpec.
    */
  def ivfPqSearch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      assignments: DataFrame, // (idCol, centroid_id) from ivfAssign
      centroids: DataFrame,
      cidCol: String,
      cvecCol: String,
      queryVec: Seq[Float],
      codebook: Seq[(Int, Seq[Float])],
      m: Int,
      k: Int,
      nprobe: Int,
      rerank: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val query = Seq(Tuple1(queryVec)).toDF("__q")
    val candidates = ivfCandidates(corpus, idCol, assignments,
      centroids, cidCol, cvecCol, query, "__q", nprobe)
    pqSearchReranked(candidates, idCol, vecCol, queryVec, codebook, m, k, rerank)
  }

  /** Driver-side cosine for probing the (driver-scale) centroid list —
    * same double-precision accumulation order as the codegen
    * [[graft.functions.expr.CosineSimilarity]], so probe ranking agrees
    * with the Spark-side scores bit-for-bit.
    */
  def cosineLocal(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
  }

  /** Rank the centroid list against a query driver-side and keep the
    * `nprobe` nearest (rounded score desc, cid asc — the same order
    * [[bruteForceTopK]] would produce). The centroid list is
    * driver-scale (like a query vector), so probing costs no Spark job.
    * The probe ranks with the SET'S configured similarity — a
    * dot-configured index trains and probes in dot space, so cluster
    * selection agrees with the final scoring.
    */
  def probeCentroids(centroids: Seq[(Int, Seq[Float])], queryVec: Seq[Float],
      nprobe: Int, similarity: Similarity = Similarity.Cosine): Seq[Int] =
    centroids
      .map { case (cid, cv) =>
        val s = BigDecimal(
            graft.functions.VectorFunctions.scoreLocal(similarity, queryVec, cv))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (cid, s)
      }
      .sortBy { case (cid, s) => (-s, cid) }
      .take(nprobe).map(_._1)

  /** IVF-PQ search SERVED FROM THE AT-REST INDEX
    * ([[graft.sources.Ingest.buildVectorIndex]]'s tables) — the
    * production `/find` semantic path. Three narrowing stages:
    *
    *  1. probe: rank the driver-scale centroid list in-process and keep
    *     `nprobe` clusters — on the centroid-partitioned `codes` table
    *     the resulting `centroid_id IN (...)` predicate is parquet
    *     PARTITION PRUNING (no row filtering, no full scan);
    *  2. ADC: score the pruned clusters' members from their m-byte
    *     binary codes alone via broadcast lookup tables
    *     ([[pqAdcSearchFromCodes]]) and keep the top `rerank`;
    *  3. exact rerank: only those `rerank` ids read their raw vectors
    *     (a semi-join into the embedding table) for full-precision
    *     cosines, cut to k with `minScore`.
    *
    * The raw embedding column is touched for exactly `rerank` rows per
    * query regardless of corpus size — the same bounded-rerank contract
    * as the reference's RaBitQ path
    * (`nidx_vector/src/vector_types/rabitq.rs:25-40`). Approximate by
    * construction (probe pruning bounds recall exactly as nprobe does
    * for [[ivfSearch]]); recall is measured in AnnRecallSpec, and the
    * q84 serving parameters are verified to reach full recall on the
    * test corpora.
    *
    * `codes` may be pre-filtered by the caller (e.g. excluding the
    * query row) — any such predicate composes with the partition
    * pruning.
    */
  def ivfPqSearchAtRest(
      codes: DataFrame,
      raw: DataFrame,
      idCol: String,
      codeCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Float])],
      codebook: Seq[(Int, Seq[Float])],
      m: Int,
      queryVec: Seq[Float],
      k: Int,
      nprobe: Int,
      rerank: Int,
      minScore: Double = -1.0,
      similarity: Similarity = Similarity.Cosine): DataFrame = {
    // probe and exact-rerank both use the SET'S configured similarity
    // (`config.rs:56-60` similarity_function); the ADC middle stage is
    // a dot-product estimate either way — for Dot it IS the estimate of
    // the final score, for Cosine it is the same angular proxy the
    // cosine path has always reranked from
    val probes = probeCentroids(centroids, queryVec, nprobe, similarity)
    val pruned = codes.where(col("centroid_id").isInCollection(probes))
    val candidates = pqAdcSearchFromCodes(
        pruned, idCol, codeCol, queryVec, codebook, m, rerank)
      .select(col(idCol))
    raw.join(candidates, Seq(idCol), "left_semi")
      .withColumn("score", round(graft.functions.VectorFunctions.score(
        similarity, col(vecCol), typedlit(queryVec)), 6))
      .where(col("score") >= minScore)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** RaBitQ-style two-pass: cheap 1-bit signature hamming pre-score over
    * everything, full-precision rerank of the top `rerank` candidates
    * (`nidx_vector/src/vector_types/rabitq.rs:25-40`, rerank factor 100,
    * limit 2000).
    */
  def signaturePrescore(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      k: Int,
      rerank: Int = 2000): DataFrame = {
    val withSig = corpus.withColumn("__sig", signBits(col(vecCol)))
    val q = broadcast(query.select(
      col(queryVecCol).as("__qv"),
      signBits(col(queryVecCol)).as("__qsig")))
    val candidates = withSig.crossJoin(q)
      .withColumn("__ham", hamming(col("__sig"), col("__qsig")))
      .orderBy(col("__ham").asc, col(idCol).asc)
      .limit(rerank)
    candidates
      .withColumn("score",
        round(cosine(col(vecCol), col("__qv")), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
