package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),   // near dup
    (4L, "completely different content about spark engines today"))
    .toDF("doc_id", "text")

  test("exactStats counts distinct fingerprints") {
    val r = Dedup.exactStats(docs, "doc_id", "text").collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
  }

  test("exactKeepList keeps min id per duplicate group") {
    val kept = Dedup.exactKeepList(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(kept(1L) == 2) // group of docs 1,2 kept as 1 with 2 members
    assert(kept(3L) == 1 && kept(4L) == 1)
  }

  test("minHashLsh finds exact dup with est 1.0 and near dup above threshold") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 8, bandSize = 2, minEstJaccard = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("dedupClusters groups transitive pairs into components labeled by min id") {
    // chain 1-2, 2-3 plus isolated pair 10-11: components {1,2,3} and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val comp = Dedup.dedupClusters(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a longer chain exercises >1 propagation round (diameter 4)
    val chain = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)).toDF("a", "b")
    val c2 = Dedup.dedupClusters(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2.values.toSet == Set(1L) && c2.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("dedupClusters equals a union-find oracle on randomized graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 120
      val edges = (1 to 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        // component label = min node id reachable = root under
        // min-merging union-find restricted to touched nodes
        v -> find(v.toInt).toLong
      }.toMap
      // BOTH branches of the cost model must produce the same labels:
      // the driver union-find (default — this pair set is under the
      // limit) and the distributed fixpoint (forced via limit 0)
      val viaDriver = Dedup.dedupClusters(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDriver == expected, s"trial $trial: driver path diverged")
      val viaFixpoint = Dedup.dedupClusters(edges.toDF("a", "b"), "a", "b",
          driverPairLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaFixpoint == expected, s"trial $trial: fixpoint diverged")
      // a limit smaller than the edge count falls back to the fixpoint
      val viaFallback = Dedup.dedupClusters(edges.toDF("a", "b"), "a", "b",
          driverPairLimit = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaFallback == expected, s"trial $trial: over-limit fallback diverged")
    }
    // string ids take the driver branch too (orderable) — min is
    // lexicographic, matching the distributed least() semantics
    val spairs = Seq(("rB", "rC"), ("rA", "rB"), ("rX", "rY")).toDF("a", "b")
    val sGot = Dedup.dedupClusters(spairs, "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sGot == Map("rA" -> "rA", "rB" -> "rA", "rC" -> "rA",
      "rX" -> "rX", "rY" -> "rX"))
  }

  test("elementwise_sum native aggregate sums arrays per group across partitions") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val rows = (1 to 100).map(i => (i % 3, Seq(i, -i, 2 * i)))
    val df = rows.toDF("g", "v").repartition(7) // force partial + merge
    val agg = ColumnBridge.column(
      graft.functions.expr.ElementwiseSum(ColumnBridge.expression(col("v")))
        .toAggregateExpression())
    val got = df.groupBy("g").agg(agg.as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> Seq(rs.map(_._2(0).toLong).sum, rs.map(_._2(1).toLong).sum, rs.map(_._2(2).toLong).sum)
    }
    assert(got == want)
  }

  test("simHashPairs band blocking is lossless vs all-pairs hamming") {
    // pigeonhole: maxDist+1 bands guarantee every pair with hamming <=
    // maxDist shares a band — band-join result must equal brute force
    import org.apache.spark.sql.functions._
    val corpus = docs
    for (maxDist <- Seq(1, 3)) {
      val banded = Dedup.simHashPairs(corpus, "doc_id", "text",
          bits = 16, maxDist = maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val sig = Dedup.simHash(corpus, "doc_id", "text", bits = 16)
      val brute = sig.select(col("doc_id").as("a"), col("simhash").as("sa"))
        .crossJoin(sig.select(col("doc_id").as("b"), col("simhash").as("sb")))
        .where(col("a") < col("b"))
        .withColumn("hamming",
          graft.functions.VectorFunctions.hamming(col("sa"), col("sb")).cast("long"))
        .where(col("hamming") <= maxDist)
        .select("a", "b", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(banded == brute, s"maxDist=$maxDist")
    }
  }

  test("simHashPairs plan has no cartesian product") {
    val plan = Dedup.simHashPairs(docs, "doc_id", "text", bits = 16, maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(20).mkString("\n"))
  }

  test("embeddingNearDups blocked finds constructed near-dups with full recall") {
    // genuine near-dup structure: v and v+tiny noise (cosine ~0.999) —
    // the regime the operator targets; blocking must not lose them
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(_ => Array.fill(16)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      val jittered = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, jittered.toSeq))
    }
    val vecs = rows.toDF("vec_id", "embedding")
    import org.apache.spark.sql.functions.col
    val blocked = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.98,
        centroids = vecs.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
        multiAssign = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embeddingNearDupsExact(vecs, "vec_id", "embedding", 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && blocked == exact,
      s"recall ${blocked.size}/${exact.size}")
  }

  test("embeddingNearDups plan has no cartesian product over the corpus") {
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    import org.apache.spark.sql.functions.col
    val plan = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", 0.5,
        vecs.where(col("vec_id") < 8), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(20).mkString("\n"))
  }

  test("ngramJaccardPairs computes exact jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    // docs 1 and 3 share 4 of 7+7 distinct 3-shingles → J = 4/10
    assert(math.abs(pairs((1L, 3L)) - 0.4) < 1e-9)
  }

  test("boilerplateParagraphs flags text recurring across distinct docs, not within one doc") {
    val pars = Seq(
      (1L, "1/t/body/0-3", "cookie banner text"),
      (2L, "2/t/body/0-3", "cookie banner text"),   // cross-doc dup → flag
      (3L, "3/t/body/0-3", "unique body one"),
      (3L, "3/t/body/3-6", "repeated inside doc"),
      (3L, "3/t/body/6-9", "repeated inside doc"))  // same doc twice → NOT boilerplate
      .toDF("doc_id", "paragraph_id", "p_text")
    val got = Dedup.boilerplateParagraphs(pars, "doc_id", "paragraph_id", "p_text")
      .collect().map(r => (r.getString(0), r.getLong(2))).sorted
    assert(got.toSeq == Seq(("1/t/body/0-3", 2L), ("2/t/body/0-3", 2L)), got.mkString(","))
  }

  test("keepBestInCluster keeps the max-score member, min id on ties") {
    import spark.implicits._
    // components: {1,2,3} (chain) and {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val scores = Seq(
      (1L, 10L), (2L, 40L), (3L, 40L), // tie at 40 → min id 2 wins
      (5L, 7L), (6L, 9L))
      .toDF("doc_id", "quality")
    val got = Dedup.keepBestInCluster(
        Dedup.dedupClusters(pairs, "a", "b"), scores, "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq((1L, 2L, 40L), (5L, 6L, 9L)), got.mkString(","))
    // partial score coverage must not drop clusters: unscored members
    // lose to any scored sibling, and an all-unscored component keeps
    // its min-id member rather than vanishing
    val partial = Seq((3L, 40L)).toDF("doc_id", "quality")
    val sparse = Dedup.keepBestInCluster(
        Dedup.dedupClusters(pairs, "a", "b"), partial, "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted
    assert(sparse.toSeq == Seq((1L, 3L, 40L), (5L, 5L, -1L)), sparse.mkString(","))
  }

  test("clusterSizeHistogram counts components per size") {
    import spark.implicits._
    // components: {1,2,3} (size 3) and {10,11}, {20,21} (two of size 2)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a", "b")
    val h = Dedup.clusterSizeHistogram(Dedup.dedupClusters(pairs, "a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(2L -> 2L, 3L -> 1L), h.toString)
  }

  test("duplicatedShingleFraction: exact dups 1.0, partial in between, unique absent") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    // the at-rest shingle shape Ingest.buildIndex writes: distinct
    // hashed shingles per doc with the set size denormalized
    val arr = array_distinct(
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3))
    val sh = docs
      .select(col("doc_id"), transform(arr, x => xxhash64(x)).as("ss"),
        size(arr).as("sz"))
      .select(col("doc_id"), explode(col("ss")).as("shingle"), col("sz"))
    val r = Dedup.duplicatedShingleFraction(sh, "doc_id").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    // docs 1 and 2 are identical → every shingle occurs elsewhere
    assert(r(1L)._3 == 1.0 && r(2L)._3 == 1.0)
    // doc 3 differs in one token of nine → windows touching it (3 of
    // its 7 shingles) are unique, the other 4 are shared
    assert(r(3L) == ((7L, 4L, 0.5714)))
    // doc 4 shares nothing → no duplicated shingles, absent from the
    // result (its dup_frac is 0 by definition)
    assert(!r.contains(4L))
  }
}
