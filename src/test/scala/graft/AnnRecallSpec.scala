package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorSearch

/** Recall of the approximate ANN paths against the exact brute-force
  * oracle on the real test embeddings — the measurement SURVEY §7.4
  * demands ("pruning must be measured against exact top-k", mirroring
  * the reference's own brute-vs-HNSW duality).
  */
class AnnRecallSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  private lazy val corpus = emb.where(col("vec_id") >= 10)
  private lazy val query = emb.where(col("vec_id") === 0)

  private def recallOf(approx: Array[Long], exact: Array[Long]): Double =
    approx.toSet.intersect(exact.toSet).size.toDouble / exact.length

  private lazy val exactTop10: Array[Long] =
    VectorSearch.bruteForceTopK(corpus, "vec_id", "embedding", query, "embedding", 10)
      .collect().map(_.getLong(0))

  test("signature prescore (RaBitQ analog) reaches high recall with a 100-candidate rerank") {
    val approx = VectorSearch.signaturePrescore(
        corpus, "vec_id", "embedding", query, "embedding", k = 10, rerank = 100)
      .collect().map(_.getLong(0))
    val r = recallOf(approx, exactTop10)
    info(f"signature prescore recall@10 (rerank=100/490): $r%.2f")
    assert(r >= 0.5, s"recall $r too low")
  }

  test("rabitq ε-bound window reaches full recall on real embeddings") {
    val approx = VectorSearch.rabitqSearch(
        corpus, "vec_id", "embedding", query, "embedding", k = 10)
      .collect().map(_.getLong(0))
    val r = recallOf(approx, exactTop10)
    info(f"rabitq ε=1.9 adaptive-window recall@10: $r%.2f")
    assert(r >= 0.9, s"recall $r too low")
  }

  test("multi-probe LSH bucket search recall") {
    val approx = VectorSearch.lshBucketSearch(
        corpus, "vec_id", "embedding", query, "embedding", k = 10, prefixBits = 4)
      .collect().map(_.getLong(0))
    val r = recallOf(approx, exactTop10)
    info(f"multi-probe LSH recall@10 (prefix=4 bits, 5 probes/16 buckets): $r%.2f")
    assert(r >= 0.5, s"recall $r too low")
  }

  test("lshBucketSearch degenerate inputs: empty query → empty; prefixBits beyond dim → clamped") {
    val empty = VectorSearch.lshBucketSearch(
      corpus, "vec_id", "embedding", query.limit(0), "embedding", k = 5, prefixBits = 4)
    assert(empty.collect().isEmpty)
    // 64-dim vectors, prefixBits far beyond dim: clamped, must not
    // throw (a full-dim bucket rarely has hamming-1 neighbors, so the
    // result may legitimately be empty)
    val clamped = VectorSearch.lshBucketSearch(
      corpus, "vec_id", "embedding", query, "embedding", k = 5, prefixBits = 200)
    assert(clamped.columns.toSeq == Seq("vec_id", "score"))
    clamped.collect() // no exception is the assertion
  }

  test("PQ-ADC search: codes are deterministic, estimate recall is measured") {
    val cb = emb.where(col("vec_id").between(1, 16))
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val qv = query.select("embedding").collect().head.getSeq[Float](0)
    // codes: one id per subspace, all within the codebook, stable across runs
    val codes = VectorSearch.pqCodes(corpus, "vec_id", "embedding", cb, m = 16)
    val row = codes.orderBy("vec_id").limit(1).collect().head
    (1 to 16).foreach(i => assert((1 to 16).contains(row.getInt(i)), s"code out of range: $row"))
    assert(codes.orderBy("vec_id").limit(1).collect().head == row) // deterministic
    val approx = VectorSearch.pqAdcSearch(
        corpus, "vec_id", "embedding", qv, cb, m = 16, k = 10)
      .collect().map(_.getLong(0))
    val r = recallOf(approx, exactTop10)
    info(f"pq-adc recall@10 (m=16 subspaces, K=16 data-drawn codewords): $r%.2f")
    assert(r >= 0.5, s"recall $r too low")
    // the production composition: ADC nominates, raw vectors rerank
    val reranked = VectorSearch.pqSearchReranked(
        corpus, "vec_id", "embedding", qv, cb, m = 16, k = 10, rerank = 100)
      .collect().map(_.getLong(0))
    val rr = recallOf(reranked, exactTop10)
    info(f"pq-adc + exact rerank@100 recall@10: $rr%.2f")
    assert(rr >= r, "rerank must not lose recall")
    assert(rr >= 0.9, s"reranked recall $rr too low")
  }

  test("pqTrain: Lloyd rounds monotonically decrease quantization distortion") {
    val init = emb.where(col("vec_id").between(1, 16))
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val d0 = VectorSearch.pqDistortion(corpus, "embedding", init, m = 16)
    val t1 = VectorSearch.pqTrain(corpus, "vec_id", "embedding", init, m = 16, iters = 1)
    val d1 = VectorSearch.pqDistortion(corpus, "embedding", t1, m = 16)
    val t3 = VectorSearch.pqTrain(corpus, "vec_id", "embedding", t1, m = 16, iters = 2)
    val d3 = VectorSearch.pqDistortion(corpus, "embedding", t3, m = 16)
    info(f"pq distortion: init=$d0%.4f 1 round=$d1%.4f 3 rounds=$d3%.4f")
    assert(d1 <= d0 + 1e-4, s"one Lloyd round must not increase distortion ($d0 -> $d1)")
    assert(d3 <= d1 + 1e-4, s"further rounds must not increase distortion ($d1 -> $d3)")
    val qv = query.select("embedding").collect().head.getSeq[Float](0)
    val trained = VectorSearch.pqAdcSearch(corpus, "vec_id", "embedding", qv, t3, m = 16, k = 10)
      .collect().map(_.getLong(0))
    info(f"pq-adc recall@10 with trained codebooks: ${recallOf(trained, exactTop10)}%.2f")
  }

  test("IVF-PQ composition: probe -> code-scan -> exact rerank recall") {
    val centroids = emb.where(col("vec_id") < 10)
    val assignments = VectorSearch.ivfAssign(
      corpus, "vec_id", "embedding", centroids, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id"))
    val cb = emb.where(col("vec_id").between(1, 16))
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val qv = query.select("embedding").collect().head.getSeq[Float](0)
    val approx = VectorSearch.ivfPqSearch(corpus, "vec_id", "embedding",
        assignments, centroids, "vec_id", "embedding",
        qv, cb, m = 16, k = 10, nprobe = 5, rerank = 60)
      .collect().map(_.getLong(0))
    val r = recallOf(approx, exactTop10)
    info(f"ivf-pq recall@10 (nprobe=5/10 clusters, rerank=60): $r%.2f")
    assert(r >= 0.5, s"recall $r too low")
    // full probe + full-width rerank must recover brute force exactly
    val full = VectorSearch.ivfPqSearch(corpus, "vec_id", "embedding",
        assignments, centroids, "vec_id", "embedding",
        qv, cb, m = 16, k = 10, nprobe = 10, rerank = 1000)
      .collect().map(_.getLong(0))
    assert(recallOf(full, exactTop10) == 1.0)
  }

  test("q84 at-rest IVF-PQ serving parameters reach full recall on every test corpus") {
    // the q84 oracle is the EXACT top-20, so the served result must
    // equal brute force bit-for-bit — on the correctness corpus
    // (sf0.01) and the bench corpus (sf0.1) alike
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val exact = VectorSearch.bruteForceTopK(
          e.where(col("vec_id") =!= 0), "vec_id", "embedding",
          e.where(col("vec_id") === 0), "embedding", 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val served = SparkEntry.queries("q84_ann_at_rest")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(served.sameElements(exact),
        s"$dir: at-rest serving diverged from exact top-20:\n" +
          s"served=${served.mkString(",")}\nexact=${exact.mkString(",")}")
    }
  }

  test("filtered find through the index equals the brute path at oracle-parity knobs") {
    // the q95 contract generalized: for several filters of varying
    // density ABOVE the branch threshold, the codes-served filtered
    // find must equal the exact filtered cosine ranking (all clusters
    // probed, rerank ≥ allowed set)
    import graft.api.Find
    import graft.operators.{FilterExpr, VectorSearch}
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val vix = graft.sources.IndexStore.vectorIndex(spark, dir)
    val qv = emb.where(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
    val corpus = Find.Corpus(docs, "doc_id", "text", Some(emb),
      index = Some(graft.sources.IndexStore.tables(spark, dir)),
      vectorIndex = Some(vix), annBruteThreshold = 1)
    Seq[FilterExpr](
        FilterExpr.Eq("lang", "en"),                       // ~44%
        FilterExpr.NumRange("n_chars", Some(0), Some(400))) // broad band
      .foreach { f =>
        val served = Find.find(corpus, Find.FindRequest(queryVector = Some(qv),
            filter = Some(f), topK = 10, annNprobe = Some(vix.centroids.size)))
          .select("doc_id", "fused")
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        val allowed = docs.where(FilterExpr.compile(f)).select(col("doc_id"))
        val exact = VectorSearch.bruteForceTopK(
            emb.join(allowed.withColumnRenamed("doc_id", "vec_id"), "vec_id"),
            "vec_id", "embedding", emb.where(col("vec_id") === 0), "embedding", 10)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        assert(served.sameElements(exact),
          s"filter $f: served=${served.mkString(",")} exact=${exact.mkString(",")}")
      }
  }

  test("per-vectorset at-rest index reaches full recall per set at oracle-parity knobs") {
    val dir = "/root/testdata/sf0.01"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    Seq(("default", 64), ("mrl16", 16)).foreach { case (vs, dim) =>
      val vix = graft.sources.IndexStore.vectorIndexSet(spark, dir, vs)
      val raw = vix.raw
      val qv = raw.where(col("vec_id") === 0)
        .select("embedding").collect().head.getSeq[Float](0)
      assert(qv.length == dim)
      val exact = VectorSearch.bruteForceTopK(
          raw.where(col("vec_id") =!= 0), "vec_id", "embedding",
          raw.where(col("vec_id") === 0), "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val served = VectorSearch.ivfPqSearchAtRest(
          vix.codes.where(col("vec_id") =!= 0), raw.where(col("vec_id") =!= 0),
          "vec_id", "code", "embedding", vix.centroids, vix.codebook, vix.m,
          qv, k = 10, nprobe = vix.centroids.size, rerank = 1000)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(served.sameElements(exact), s"vectorset $vs diverged")
    }
  }

  test("at-rest probe pruning trades recall for scanned clusters (the nprobe dial)") {
    // on the near-random test embeddings pruned probes lose tail items
    // — measured here, which is exactly why q84's serving config
    // probes all clusters for its exact oracle
    val dir = "/root/testdata/sf0.1"
    val vix = graft.sources.IndexStore.vectorIndex(spark, dir)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val qv = e.where(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
    val exact = VectorSearch.bruteForceTopK(
        e.where(col("vec_id") =!= 0), "vec_id", "embedding",
        e.where(col("vec_id") === 0), "embedding", 20)
      .collect().map(_.getLong(0))
    def run(np: Int) = VectorSearch.ivfPqSearchAtRest(
        vix.codes.where(col("vec_id") =!= 0),
        vix.raw.where(col("vec_id") =!= 0),
        "vec_id", "code", "embedding",
        vix.centroids, vix.codebook, vix.m, qv,
        k = 20, nprobe = np, rerank = 200)
      .collect().map(_.getLong(0))
    val rs = Seq(4, 8, 16).map(np => np -> recallOf(run(np), exact))
    info(rs.map { case (np, r) => f"nprobe=$np → recall@20 $r%.2f" }.mkString(", "))
    assert(rs.last._2 == 1.0, "probing every cluster must equal brute force")
    assert(rs.map(_._2) == rs.map(_._2).sorted, "recall must not decrease with nprobe")
  }

  test("per-vectorset probe pruning: the named-set (mrl16) index has its own nprobe-recall curve") {
    // the two-level (vectorset, centroid) pruning path — evidence that
    // PRUNED probes over a named set behave like the default index's
    // dial, not just oracle parity at exhaustive nprobe
    val dir = "/root/testdata/sf0.01"
    val vix = graft.sources.IndexStore.vectorIndexSet(spark, dir, "mrl16")
    val raw = vix.raw
    val qv = raw.where(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0)
    val exact = VectorSearch.bruteForceTopK(
        raw.where(col("vec_id") =!= 0), "vec_id", "embedding",
        raw.where(col("vec_id") === 0), "embedding", 20)
      .collect().map(_.getLong(0))
    def run(np: Int) = VectorSearch.ivfPqSearchAtRest(
        vix.codes.where(col("vec_id") =!= 0),
        raw.where(col("vec_id") =!= 0),
        "vec_id", "code", "embedding",
        vix.centroids, vix.codebook, vix.m, qv,
        k = 20, nprobe = np, rerank = 200)
      .collect().map(_.getLong(0))
    val nps = Seq(math.max(1, vix.centroids.size / 4),
      math.max(1, vix.centroids.size / 2), vix.centroids.size)
    val rs = nps.map(np => np -> recallOf(run(np), exact))
    info(rs.map { case (np, r) => f"mrl16 nprobe=$np → recall@20 $r%.2f" }.mkString(", "))
    assert(rs.last._2 == 1.0,
      "probing every cluster of the named set must equal brute force")
    assert(rs.map(_._2) == rs.map(_._2).sorted,
      "named-set recall must not decrease with nprobe")
  }

  test("Find semantic list served from the index agrees with the brute path on an unfiltered request") {
    import graft.api.Find
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val qv = e.where(col("vec_id") === 7)
      .select("embedding").collect().head.getSeq[Float](0)
    val req = Find.FindRequest(query = "spark query",
      queryVector = Some(qv), topK = 10)
    val ix = graft.sources.IndexStore.tables(spark, dir)
    val vix = graft.sources.IndexStore.vectorIndex(spark, dir)
    def run(c: Find.Corpus) = Find.find(c, req)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = run(Find.Corpus(docs, "doc_id", "text", Some(e), index = Some(ix)))
    // threshold 0 forces the index path regardless of corpus size
    val indexed = run(Find.Corpus(docs, "doc_id", "text", Some(e),
      index = Some(ix), vectorIndex = Some(vix), annBruteThreshold = 0))
    // the index path is approximate by contract (nprobe = K/2 prunes
    // half the clusters): the fused top-10 must agree strongly with
    // the exact path, not bit-for-bit
    val overlap = indexed.map(_._1).toSet.intersect(brute.map(_._1).toSet).size
    info(s"find index-path top-10 overlap with brute: $overlap/10")
    assert(overlap >= 8,
      s"index path diverged:\nindexed=${indexed.mkString(",")}\nbrute=${brute.mkString(",")}")
    // the API plan itself serves the code table, never a raw-vector scan
    // on the semantic list side (raw vectors appear only in the bounded
    // rerank semi-join)
    val apiPlan = Find.find(Find.Corpus(docs, "doc_id", "text", Some(e),
        index = Some(ix), vectorIndex = Some(vix), annBruteThreshold = 0), req)
      .queryExecution.executedPlan.toString
    assert(apiPlan.contains("/codes") && apiPlan.contains("code:binary"),
      s"Find.find's semantic list must scan the at-rest code table:\n$apiPlan")
    // a full-probe full-rerank request recovers the brute result exactly
    val exactReq = req.copy(annNprobe = Some(vix.centroids.size),
      annRerank = Some(vix.nVectors.toInt))
    val exactIndexed = Find.find(Find.Corpus(docs, "doc_id", "text", Some(e),
        index = Some(ix), vectorIndex = Some(vix), annBruteThreshold = 0), exactReq)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(exactIndexed.sameElements(brute),
      "full-probe + full-rerank index path must equal the brute path")
    // and at the default threshold the cost model picks brute → exact
    val auto = run(Find.Corpus(docs, "doc_id", "text", Some(e),
      index = Some(ix), vectorIndex = Some(vix)))
    assert(auto.sameElements(brute),
      "below the brute threshold the cost model must serve the exact path")
  }

  test("IVF probe search trades recall for scanned fraction") {
    val centroids = emb.where(col("vec_id") < 10)
    val assignments = VectorSearch.ivfAssign(
      corpus, "vec_id", "embedding", centroids, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id")).cache()
    def run(nprobe: Int) = {
      val approx = VectorSearch.ivfSearch(corpus, "vec_id", "embedding",
          assignments, centroids, "vec_id", "embedding",
          query, "embedding", k = 10, nprobe = nprobe)
        .collect().map(_.getLong(0))
      recallOf(approx, exactTop10)
    }
    val r3 = run(3)
    val r10 = run(10)
    info(f"ivf recall@10: nprobe=3 → $r3%.2f, nprobe=10 → $r10%.2f")
    assert(r10 == 1.0, "probing every cluster must equal brute force")
    assert(r3 <= r10)
  }

  test("dot-configured vectorset serves dot scores; cosine set orders differently on the same vectors") {
    import graft.api.Find
    import graft.functions.VectorFunctions.Similarity
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val qv = emb.where(col("vec_id") === 0)
      .select(slice(col("embedding"), 1, 16)).collect().head.getSeq[Float](0)
    def served(vs: String) = {
      val vix = graft.sources.IndexStore.vectorIndexSet(spark, dir, vs)
      Find.find(
          Find.Corpus(docs, "doc_id", "text",
            Some(graft.sources.IndexStore.vectorsetTable(emb)),
            vectorsetCol = Some("vectorset"),
            vectorIndexes = Map(vs -> vix), annBruteThreshold = 1),
          Find.FindRequest(queryVector = Some(qv), vectorset = Some(vs),
            topK = 20, annNprobe = Some(vix.centroids.size),
            annRerank = Some(vix.nVectors.toInt)))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    val dotRes = served("dot16")
    val cosRes = served("mrl16")
    // the set's config selected the scoring function: the dot result is
    // the exact brute-force DOT top-k over the truncated vectors
    val sliced = emb.select(col("vec_id"), slice(col("embedding"), 1, 16).as("v"))
    val bruteDot = VectorSearch.bruteForceTopK(sliced, "vec_id", "v",
        sliced.where(col("vec_id") === 0), "v", 20,
        similarity = Similarity.Dot)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(dotRes.sameElements(bruteDot),
      "full-probe full-rerank dot set must equal brute-force dot")
    // unnormalized fixture vectors: dot and cosine must rank differently
    assert(!dotRes.map(_._1).sameElements(cosRes.map(_._1)),
      "dot and cosine configs returned the same order — fixture vectors " +
        "would have to be norm-uniform for that")
  }

  test("normalize-on-ingest: a normalize+dot set ranks like cosine and normalizes the query (vector_normalization.rs)") {
    import graft.api.Find
    import graft.functions.VectorFunctions
    import graft.sources.Ingest
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mini = emb.where(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"), lit("nd").as("vectorset"))
    val out = graft.sources.IndexStore.deleteOnExit(
      java.nio.file.Files.createTempDirectory("graft-normdot-").toString)
    Ingest.buildVectorIndexSets(mini, "vec_id", "embedding", "vectorset", out,
      numCentroids = 4, configs = Map("nd" ->
        Ingest.VectorSetConfig(similarity = "dot", normalizeVectors = true)))
    // the persisted meta carries the config — serving behavior is a
    // property of the index, not the request
    val meta = Ingest.readText(spark, s"$out/vector_meta.json")
    assert(meta.contains(""""nd": {"similarity": "dot", "normalize": true}"""), meta)
    // hand-bind the served index (the IndexStore fixture loader is
    // sfDir-bound; this mirrors what it does, normalized raw included)
    val cents = spark.read.parquet(s"$out/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1), r.getLong(2))).sortBy(_._1)
    val cb = spark.read.parquet(s"$out/codebook").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val rawNorm = mini.select(col("vec_id"),
      transform(VectorFunctions.normalize(col("embedding")), _.cast("float"))
        .as("embedding"))
    val vix = graft.sources.IndexStore.VectorIndex(
      centroids = cents.map(c => (c._1, c._2)).toSeq, codebook = cb, m = 16,
      nVectors = cents.map(_._3).sum,
      codes = spark.read.parquet(s"$out/codes"),
      assignments = spark.read.parquet(s"$out/assignments"),
      raw = rawNorm,
      similarity = VectorFunctions.Similarity.Dot, normalized = true)
    // UNNORMALIZED query in the request — the engine must normalize it
    // (searcher.rs:246-249) before probing and scoring
    val qv = emb.where(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0)
    val res = Find.find(
        Find.Corpus(docs, "doc_id", "text", Some(mini),
          vectorsetCol = Some("vectorset"), defaultVectorset = "nd",
          vectorIndexes = Map("nd" -> vix), annBruteThreshold = 1),
        Find.FindRequest(queryVector = Some(qv), vectorset = Some("nd"),
          topK = 10, annNprobe = Some(vix.centroids.size),
          annRerank = Some(vix.nVectors.toInt)))
      .collect().map(_.getLong(0))
    // dot over normalized vectors ≡ cosine over the raw vectors — the
    // reference's normalize trick makes the two rankings coincide
    val bruteCos = VectorSearch.bruteForceTopK(mini, "vec_id", "embedding",
        emb.where(col("vec_id") === 0), "embedding", 10)
      .collect().map(_.getLong(0))
    assert(res.sameElements(bruteCos),
      s"normalize+dot must rank like cosine: ${res.toSeq} vs ${bruteCos.toSeq}")
  }
}
