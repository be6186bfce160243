package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.IncrementalIndex

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("mergeLatest keeps max-seq per key and drops tombstones") {
    val updates = Seq(
      ("r1", 1L, "v1", false),
      ("r1", 3L, "v3", false),
      ("r1", 2L, "v2", false),
      ("r2", 1L, "x1", false),
      ("r2", 2L, "x2", true)) // tombstone wins
      .toDF("rid", "seq", "value", "deleted")
    val got = IncrementalIndex.mergeLatest(updates, "rid", "seq")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got == Map("r1" -> "v3"))
  }

  test("conversation split append: composite key adds new splits, replaces re-sent ones") {
    val existing = Seq(
      ("conv1", "s1", 1L, "hello", false),
      ("conv1", "s2", 1L, "how are you", false))
      .toDF("field", "split", "seq", "text", "deleted")
    val incoming = Seq(
      ("conv1", "s3", 2L, "new message", false),       // append
      ("conv1", "s2", 2L, "how are you, edited", false)) // replace
      .toDF("field", "split", "seq", "text", "deleted")
    val got = IncrementalIndex.mergeLatest(
        existing.unionByName(incoming), Seq("field", "split"), "seq")
      .collect().map(r => r.getString(1) -> r.getString(3)).toMap
    assert(got == Map("s1" -> "hello", "s2" -> "how are you, edited",
      "s3" -> "new message"))
  }

  test("incremental upsert stream is idempotent and latest-wins across batches") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft-inc").toString + "/table"
    val ckptDir = Files.createTempDirectory("graft-ckpt").toString
    val input = MemoryStream[(String, Long, String, Boolean)]
    val updates = input.toDF().toDF("rid", "seq", "value", "deleted")
    val q = IncrementalIndex.start(updates, tableDir, ckptDir)
    try {
      input.addData(("r1", 1L, "a", false), ("r2", 1L, "b", false))
      q.processAllAvailable()
      input.addData(("r1", 2L, "a2", false), ("r2", 2L, "b2", true),
        ("r1", 1L, "a", false)) // replayed duplicate — at-least-once
      q.processAllAvailable()
      val got = IncrementalIndex.bucketedTable(spark, tableDir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == Map("r1" -> (2L, "a2"))) // r2 tombstoned, dup ignored
      // the tombstone row itself stays AT REST (serve-time filter), so
      // a replayed op older than the delete finds it and loses
      val atRest = spark.read.parquet(tableDir)
        .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
      assert(atRest("r2"), "r2's tombstone row must persist in the table")
      input.addData(("r2", 1L, "b", false)) // at-least-once replay, pre-delete
      q.processAllAvailable()
      assert(IncrementalIndex.bucketedTable(spark, tableDir)
        .where($"rid" === "r2").isEmpty,
        "a replayed older op must not resurrect a deleted doc")
    } finally q.stop()
  }

  test("bucketed merge rewrites only touched bucket directories; tombstones persist at rest") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val tableDir = Files.createTempDirectory("graft-bkt").toString + "/table"
    val nb = 8
    def bucketOf(key: String): Long = spark.range(1)
      .select(pmod(xxhash64(lit(key)), lit(nb.toLong))).collect().head.getLong(0)
    def batch(rows: (String, Long, String, Boolean)*) =
      rows.toDF("rid", "seq", "value", "deleted")
    def dirState(): Map[String, Map[String, Long]] =
      new java.io.File(tableDir).listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap
      }.toMap
    // pick 4 keys landing in distinct buckets (hash-dependent, so scan)
    val keys = Iterator.from(1).map(i => s"r$i")
      .scanLeft((Seq.empty[String], Set.empty[Long])) { case ((ks, bs), k) =>
        val b = bucketOf(k)
        if (bs(b)) (ks, bs) else (ks :+ k, bs + b)
      }
      .dropWhile(_._1.size < 4).next()._1
    val bks = keys.map(k => k -> bucketOf(k)).toMap
    // stable aliases for the roles below
    val Seq(r1, r2, r3, r4) = keys
    IncrementalIndex.mergeBatchBucketed(
      batch(keys.map(k => (k, 1L, s"$k-v1", false)): _*),
      tableDir, "rid", "seq", nb)
    val before = dirState()
    assert(before.keySet == bks.values.map(b => s"__bucket=$b").toSet)
    // batch 2 touches ONLY r1 (update) and r4 (full tombstone)
    IncrementalIndex.mergeBatchBucketed(
      batch((r1, 2L, s"$r1-v2", false), (r4, 2L, "gone", true)),
      tableDir, "rid", "seq", nb)
    val after = dirState()
    // untouched buckets: byte-identical file listings, same mtimes
    Seq(r2, r3).foreach { k =>
      val d = s"__bucket=${bks(k)}"
      assert(after(d) == before(d), s"untouched bucket $d was rewritten")
    }
    // touched update bucket rewrote; the tombstoned key's bucket keeps
    // its directory — the tombstone ROW stays at rest so an older
    // replayed op cannot resurrect the doc (serve-time filter drops it)
    assert(after(s"__bucket=${bks(r1)}") != before(s"__bucket=${bks(r1)}"))
    assert(after.contains(s"__bucket=${bks(r4)}"),
      "a tombstoned key's bucket must keep its tombstone row")
    val got = IncrementalIndex.bucketedTable(spark, tableDir)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got == Map(r1 -> s"$r1-v2", r2 -> s"$r2-v1", r3 -> s"$r3-v1"))
    // replay an op OLDER than r4's tombstone: still dead after merge
    IncrementalIndex.mergeBatchBucketed(
      batch((r4, 1L, s"$r4-v1", false)), tableDir, "rid", "seq", nb)
    assert(!IncrementalIndex.bucketedTable(spark, tableDir)
      .collect().map(_.getString(0)).contains(r4),
      "replayed pre-delete op must not resurrect the tombstoned key")
  }

  test("segmented index: per-batch segments, latest-wins serving, compaction preserves results") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.Bm25
    val root = Files.createTempDirectory("graft-seg").toString + "/index"
    val ckpt = Files.createTempDirectory("graft-segck").toString
    val input = MemoryStream[(String, Long, String, Boolean)]
    val updates = input.toDF().toDF("rid", "seq", "value", "deleted")
    val q = IncrementalIndex.startIndexSegments(updates, root, ckpt,
      idCol = "rid", textCol = "value")
    try {
      input.addData(("r1", 1L, "spark engine", false),
        ("r2", 1L, "query planner", false))
      q.processAllAvailable()
      input.addData(("r1", 2L, "spark query spark", false), // update
        ("r2", 2L, "gone", true),                           // tombstone
        ("r3", 2L, "fast spark scan", false))               // new
      q.processAllAvailable()

      def scores(): Map[String, Double] = {
        val ix = IncrementalIndex.segmentTables(spark, root)
        Bm25.scoreFromPostings(ix.postings, ix.docLengths, "rid", Seq("spark"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      }
      // expected = batch-free index over the merged corpus state
      val merged = Seq(("r1", "spark query spark"), ("r3", "fast spark scan"))
        .toDF("rid", "value")
      val expected = Bm25.score(merged, "rid", "value", Seq("spark"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val before = scores()
      assert(before.keySet == Set("r1", "r3"), s"tombstone/update wrong: $before")
      expected.foreach { case (k, v) => assert(math.abs(before(k) - v) < 1e-12) }
      // the streamed corpus serves the FIND API: the segment tables
      // bind straight into Corpus and match a find over the merged
      // batch corpus with a batch-built index
      import graft.api.Find
      def findOver(docs: org.apache.spark.sql.DataFrame,
          ix: graft.sources.IndexStore.IndexTables) =
        Find.find(Find.Corpus(docs, "rid", "value", index = Some(ix)),
            Find.FindRequest(query = "spark", topK = 5))
          .collect().map(r => (r.getString(0), r.getDouble(1)))
      val mergedDocs = merged
      val batchDir = Files.createTempDirectory("graft-segix").toString
      graft.sources.Ingest.buildIndex(mergedDocs, "rid", "value", batchDir,
        withVectors = false)
      val batchIx = graft.sources.IndexStore.IndexTables(
        spark.read.parquet(s"$batchDir/postings"),
        spark.read.parquet(s"$batchDir/doclengths"),
        spark.read.parquet(s"$batchDir/paragraphs"))
      val viaSegments = findOver(mergedDocs, IncrementalIndex.segmentTables(spark, root))
      val viaBatch = findOver(mergedDocs, batchIx)
      assert(viaSegments.sameElements(viaBatch),
        s"streamed index diverged from batch index:\n$viaSegments\n$viaBatch")
      // two segments live → compaction folds to one live segment (the
      // folded inputs linger masked until the next pass's delete retry)
      IncrementalIndex.compactSegments(spark, root)
      val segs = IncrementalIndex.liveSegments(spark, root)
      assert(segs.length == 1, segs.mkString(","))
      assert(scores() == before)
      // at-least-once replay of an op OLDER than a compacted tombstone
      // must not resurrect the deleted doc — the folded manifest keeps
      // the tombstone row
      input.addData(("r2", 1L, "query planner", false))
      q.processAllAvailable()
      assert(scores().keySet == Set("r1", "r3"),
        "compaction must keep tombstones so replayed older ops stay dead")
    } finally q.stop()
  }

  test("corpus-quality scoring serves identically from streamed segments") {
    // the at-rest corpus-stat family (unigramLogProbFromPostings)
    // composes with the streamed surface: segment postings
    // (winner-filtered) + the segment termFreq rollup must score every
    // surviving doc exactly like the one-pass form over the merged
    // batch corpus — updates included (r2's newer text wins)
    import graft.operators.CorpusStats
    val root = Files.createTempDirectory("graft-segstats").toString + "/index"
    def seg(bid: Long, rows: (String, Long, String, Boolean)*): Unit =
      IncrementalIndex.writeSegment(
        rows.toDF("rid", "seq", "value", "deleted"),
        f"$root/seg_$bid%09d", "rid", "value", "seq")
    seg(0L, ("r1", 1L, "spark engine spark", false),
      ("r2", 1L, "query planner", false))
    seg(1L, ("r2", 2L, "query planner rewrites query trees", false),
      ("r3", 2L, "fast scans", false))
    val ix = IncrementalIndex.segmentTables(spark, root)
    val tf = IncrementalIndex.segmentTermFreq(spark, root)
    val got = CorpusStats.unigramLogProbFromPostings(ix.postings, tf, "rid")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val merged = Seq(
      ("r1", "spark engine spark"),
      ("r2", "query planner rewrites query trees"),
      ("r3", "fast scans")).toDF("rid", "value")
    val want = CorpusStats.unigramLogProb(merged, "rid", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == want, s"streamed corpus-stat divergence: $got vs $want")
  }

  test("compaction recovers a crash between commit-rename and input deletes") {
    import graft.functions.Bm25
    val root = Files.createTempDirectory("graft-segcrash").toString + "/index"
    def seg(bid: Long, rows: (String, Long, String, Boolean)*): Unit =
      IncrementalIndex.writeSegment(
        rows.toDF("rid", "seq", "value", "deleted"),
        f"$root/seg_$bid%09d", "rid", "value", "seq")
    def scores(): Map[String, Double] = {
      val ix = IncrementalIndex.segmentTables(spark, root)
      Bm25.scoreFromPostings(ix.postings, ix.docLengths, "rid", Seq("spark"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    seg(0L, ("r1", 1L, "spark engine", false))
    seg(1L, ("r1", 2L, "spark query spark", false),
      ("r2", 2L, "fast spark scan", false))
    IncrementalIndex.compactSegments(spark, root)
    val expected = scores()
    // simulate the crash window: a folded input resurfaces on disk
    // AFTER its covering segment committed (rename done, delete lost).
    // It holds r1/r2's WINNING (id, seq) rows — the exact shape that
    // would double postings if it ever re-entered the segment listing
    seg(1L, ("r1", 2L, "spark query spark", false),
      ("r2", 2L, "fast spark scan", false))
    // a reader between crash and the next compaction skips the stale
    // input (it is named in the covering segment's subsumed.txt)
    assert(scores() == expected, "stale subsumed input must stay masked")
    // the next compaction retries the lost delete and carries the
    // subsumed set forward, so even after the covering segment (whose
    // manifest was the only mask) is itself folded and deleted, the
    // stale input's rows never double-count
    seg(5L, ("r3", 5L, "spark stream", false))
    IncrementalIndex.compactSegments(spark, root)
    assert(!new java.io.File(root, "seg_000000001").exists(),
      "compaction start must delete on-disk dirs already marked subsumed")
    val after = scores()
    assert(after.keySet == Set("r1", "r2", "r3"))
    // r1's BM25 tf must reflect ONE copy of its newest row (df/length
    // stats shift with r3's arrival, so compare against a fresh oracle)
    val oracle = Bm25.score(
      Seq(("r1", "spark query spark"), ("r2", "fast spark scan"),
        ("r3", "spark stream")).toDF("rid", "value"),
      "rid", "value", Seq("spark"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    oracle.foreach { case (k, v) => assert(math.abs(after(k) - v) < 1e-12,
      s"$k: ${after(k)} != $v — duplicated segment rows inflate stats") }
  }

  test("compaction prunes carried subsumed entries once they cannot recur") {
    val root = Files.createTempDirectory("graft-segprune").toString + "/index"
    def seg(bid: Long, rows: (String, Long, String, Boolean)*): Unit =
      IncrementalIndex.writeSegment(
        rows.toDF("rid", "seq", "value", "deleted"),
        f"$root/seg_$bid%09d", "rid", "value", "seq")
    // the pruned manifest of the LIVE (covering) segments — folded
    // inputs now linger on disk until the next pass's delete retry
    // (grace-deferred deletion), and their stale manifests must not
    // pollute the assertion on what the covering segment carries
    def subsumedOf(): Set[String] = {
      val dirs = new java.io.File(root).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("seg_"))
      def entries(d: java.io.File): Seq[String] = {
        val f = new java.io.File(d, "subsumed.txt")
        if (f.exists()) scala.io.Source.fromFile(f).getLines().toSeq else Nil
      }
      val masked = dirs.flatMap(entries).toSet
      dirs.filterNot(d => masked(d.getName)).flatMap(entries).toSet
    }
    seg(0L, ("r1", 1L, "spark a", false))
    seg(1L, ("r1", 2L, "spark b", false))
    IncrementalIndex.compactSegments(spark, root)
    assert(subsumedOf() == Set("seg_000000000", "seg_000000001"))
    seg(2L, ("r2", 3L, "spark c", false))
    // commit watermark 2: batches ≤2 can never replay, their absent
    // dirs prune; the absent c-name of the folded compacted segment
    // prunes regardless (only its rename could create it)
    IncrementalIndex.compactSegments(spark, root, committedBatchId = Some(2L))
    assert(subsumedOf() == Set("seg_000000001c", "seg_000000002"),
      s"pruned manifest wrong: ${subsumedOf()}")
    // no watermark: batch entries stay (a replay could still recreate
    // them), only the absent compacted name ages out
    seg(3L, ("r3", 4L, "spark d", false))
    IncrementalIndex.compactSegments(spark, root)
    assert(subsumedOf() == Set("seg_000000002", "seg_000000002c", "seg_000000003"),
      s"watermark-less manifest wrong: ${subsumedOf()}")
    // a retained entry still masks its replayed segment
    seg(2L, ("r2", 3L, "spark c", false))
    val ix = IncrementalIndex.segmentTables(spark, root)
    assert(ix.postings.select("rid").distinct().count() == 3,
      "replayed subsumed segment must stay masked after pruning")
  }

  test("grace TTL: a watermark-pinned reader spanning TWO compaction passes keeps its files until the TTL elapses") {
    import graft.streaming.IncrementalIndex.LogMergeSettings
    val root = Files.createTempDirectory("graft-seggrace").toString + "/index"
    def seg(bid: Long, rows: (String, Long, String, Boolean)*): Unit =
      IncrementalIndex.writeSegment(
        rows.toDF("rid", "seq", "value", "deleted"),
        f"$root/seg_$bid%09d", "rid", "value", "seq")
    seg(0L, ("r1", 1L, "spark engine", false))
    seg(1L, ("r2", 2L, "spark query", false))
    val ttl = LogMergeSettings(minSegments = 2, graceMaxAgeMs = 3600000L)
    // a long analytic request pins the PRE-fold watermark
    val pinned = IncrementalIndex.liveSegments(spark, root)
    // pass 1 folds the pair; pass 2 is the retry that deleted the
    // inputs under the r13 one-interval bound — with the TTL it must
    // keep them (the fold stamps `_subsumed_at`, the retry compares age)
    IncrementalIndex.compactSegmentsTiered(spark, root, "rid", "seq", ttl)
    IncrementalIndex.compactSegmentsTiered(spark, root, "rid", "seq", ttl)
    assert(pinned.forall(d => new java.io.File(d.stripPrefix("file:"))
        .exists()),
      s"two-pass-spanning reader lost its files: $pinned")
    // the pinned reader still serves its snapshot intact
    val tabs = IncrementalIndex.segmentTablesAt(spark, pinned, "rid", "seq")
    assert(tabs.postings.select("rid").distinct().count() == 2,
      "pinned snapshot unreadable after two passes")
    // a pass with the TTL elapsed (0 ms) finally deletes the inputs
    IncrementalIndex.compactSegmentsTiered(spark, root, "rid", "seq",
      ttl.copy(graceMaxAgeMs = 0L))
    assert(!new java.io.File(root, "seg_000000000").exists() &&
      !new java.io.File(root, "seg_000000001").exists(),
      "elapsed-TTL retry must delete the folded inputs")
    // serving state unchanged throughout
    val ix = IncrementalIndex.segmentTables(spark, root)
    assert(ix.postings.select("rid").distinct().count() == 2)
  }

  test("committedBatchId reads the stream checkpoint's commit watermark") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-ckpt").toString
    assert(IncrementalIndex.committedBatchId(spark, s"$dir/cp").isEmpty)
    val input = MemoryStream[(String, Long, String, Boolean)]
    val q = IncrementalIndex.startIndexSegments(
      input.toDF().toDF("rid", "seq", "value", "deleted"),
      s"$dir/index", s"$dir/cp", textCol = "value")
    try {
      input.addData(("r1", 1L, "spark", false))
      q.processAllAvailable()
      input.addData(("r2", 2L, "query", false))
      q.processAllAvailable()
      assert(IncrementalIndex.committedBatchId(spark, s"$dir/cp").contains(1L))
    } finally q.stop()
  }

  test("segmented phrase + paragraph BM25 match a batch index, incl. post-compaction") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.Bm25
    import graft.operators.PhraseSearch
    val root = Files.createTempDirectory("graft-segpp").toString + "/index"
    val ckpt = Files.createTempDirectory("graft-segppck").toString
    val input = MemoryStream[(String, Long, String, Boolean)]
    val updates = input.toDF().toDF("rid", "seq", "value", "deleted")
    val q = IncrementalIndex.startIndexSegments(updates, root, ckpt,
      idCol = "rid", textCol = "value")
    try {
      input.addData(("r1", 1L, "fast spark scan here", false),
        ("r2", 1L, "fast spark planner", false))
      q.processAllAvailable()
      input.addData(("r1", 2L, "slow fast spark fast spark scan", false), // update
        ("r2", 2L, "gone", true),                                         // tombstone
        ("r3", 2L, "spark fast spark", false))                            // new
      q.processAllAvailable()
      val merged = Seq(("r1", "slow fast spark fast spark scan"),
        ("r3", "spark fast spark")).toDF("rid", "value")
      val batchDir = Files.createTempDirectory("graft-segppix").toString
      graft.sources.Ingest.buildIndex(merged, "rid", "value", batchDir,
        withVectors = false)
      def phrase(positions: org.apache.spark.sql.DataFrame) =
        PhraseSearch.phraseOccurrencesFromPositions(
            positions, "rid", Seq("fast", "spark"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viaBatchPhrase = phrase(spark.read.parquet(s"$batchDir/positions"))
      assert(viaBatchPhrase == Map("r1" -> 2L, "r3" -> 1L), s"$viaBatchPhrase")
      def parBm25(ix: graft.sources.IndexStore.IndexTables) =
        Bm25.scoreFromPostings(ix.parPostings.get, ix.parDocLengths.get,
            "paragraph_id", Seq("spark"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val viaBatchPar = parBm25(graft.sources.IndexStore.IndexTables(
        spark.read.parquet(s"$batchDir/postings"),
        spark.read.parquet(s"$batchDir/doclengths"),
        spark.read.parquet(s"$batchDir/paragraphs"),
        parPostings = Some(spark.read.parquet(s"$batchDir/par_postings")),
        parDocLengths = Some(spark.read.parquet(s"$batchDir/par_doclengths"))))
      val viaBatchSuggest = graft.operators.TopK.suggestPrefix(
          spark.read.parquet(s"$batchDir/termfreq"), "term", "freq", "s", 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val viaBatchDups = graft.operators.Dedup.minHashLshFromSignatures(
          spark.read.parquet(s"$batchDir/signatures"), "rid",
          minEstJaccard = 0.2)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      def check(): Unit = {
        assert(phrase(IncrementalIndex.segmentPositions(spark, root))
          == viaBatchPhrase, "streamed phrase occurrences diverged")
        val streamed = parBm25(IncrementalIndex.segmentTables(spark, root))
        assert(streamed.keySet == viaBatchPar.keySet, s"$streamed")
        viaBatchPar.foreach { case (k, v) =>
          assert(math.abs(streamed(k) - v) < 1e-12, s"$k: ${streamed(k)} != $v") }
        // suggest dictionary + near-dup signatures serve identically
        val sSuggest = graft.operators.TopK.suggestPrefix(
            IncrementalIndex.segmentTermFreq(spark, root), "term", "freq", "s", 5)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(sSuggest == viaBatchSuggest, s"$sSuggest != $viaBatchSuggest")
        val sDups = graft.operators.Dedup.minHashLshFromSignatures(
            IncrementalIndex.segmentSignatures(spark, root)
              .select("rid", (0 until 8).map(i => s"h$i"): _*),
            "rid", minEstJaccard = 0.2)
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
        assert(sDups == viaBatchDups, s"$sDups != $viaBatchDups")
      }
      check()
      IncrementalIndex.compactSegments(spark, root)
      check()
    } finally q.stop()
  }

  test("segmented ANN: streamed corpus serves ivfPqSearchAtRest identically to a batch index, incl. post-compaction") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.VectorSearch
    import graft.streaming.IncrementalIndex.SegmentVectorSpec
    val root = Files.createTempDirectory("graft-segvec").toString + "/index"
    val ckpt = Files.createTempDirectory("graft-segvecck").toString
    // deterministic 8-dim vectors; rid i carries vector f(i, seq)
    def vec(i: Long, seq: Long): Array[Float] =
      Array.tabulate(8)(d => math.sin(i * 31 + seq * 7 + d).toFloat)
    val finalState = // merged corpus after updates + tombstone
      Seq(1L -> vec(1, 2), 3L -> vec(3, 2), 4L -> vec(4, 1), 5L -> vec(5, 2))
    // the per-KB model trains ONCE in batch over the final corpus and
    // every segment encodes against it (indexer.rs reuse contract)
    val batchDir = Files.createTempDirectory("graft-segvecb").toString
    graft.sources.Ingest.buildVectorIndex(
      finalState.toDF("rid", "embedding"), "rid", "embedding", batchDir,
      numCentroids = 2, numCodewords = 4, m = 4)
    val vixDir = batchDir
    val cents = spark.read.parquet(s"$vixDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val cb = spark.read.parquet(s"$vixDir/codebook")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val spec = SegmentVectorSpec("embedding", cents, cb, m = 4)

    val input = MemoryStream[(Long, Long, String, Boolean, Array[Float])]
    val updates = input.toDF().toDF("rid", "seq", "text", "deleted", "embedding")
    val q = IncrementalIndex.startIndexSegments(updates, root, ckpt,
      idCol = "rid", textCol = "text", vectors = Some(spec))
    try {
      input.addData((1L, 1L, "a", false, vec(1, 1)), (2L, 1L, "b", false, vec(2, 1)),
        (4L, 1L, "d", false, vec(4, 1)))
      q.processAllAvailable()
      input.addData((1L, 2L, "a2", false, vec(1, 2)), // update: new vector wins
        (2L, 2L, "gone", true, vec(2, 2)),            // tombstone
        (3L, 2L, "c", false, vec(3, 2)), (5L, 2L, "e", false, vec(5, 2)))
      q.processAllAvailable()

      val qv = vec(9, 9).toSeq
      def search(codes: org.apache.spark.sql.DataFrame,
          raw: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
        VectorSearch.ivfPqSearchAtRest(codes, raw, "rid", "code", "embedding",
            cents, cb, m = 4, qv, k = 4, nprobe = cents.size, rerank = 10)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val expected = search(spark.read.parquet(s"$vixDir/codes"),
        finalState.toDF("rid", "embedding"))
      assert(expected.map(_._1).toSet == Set(1L, 3L, 4L, 5L),
        s"fixture must surface the merged live docs: $expected")
      val (sCodes, sRaw) = IncrementalIndex.segmentVectorTables(spark, root)
      assert(search(sCodes, sRaw) == expected,
        "streamed segments must serve the batch index's exact results")
      // compaction folds codes + vectors; results unchanged
      IncrementalIndex.compactSegments(spark, root)
      val segs = IncrementalIndex.liveSegments(spark, root)
      // liveSegments returns scheme-qualified paths (file:/…) — go
      // through the URI for the java.io.File probe
      assert(segs.length == 1 &&
          new java.io.File(
            new org.apache.hadoop.fs.Path(segs.head).toUri.getPath,
            "codes").exists(),
        "compaction must fold the vector pair into the surviving segment")
      val (cCodes, cRaw) = IncrementalIndex.segmentVectorTables(spark, root)
      assert(search(cCodes, cRaw) == expected,
        "post-compaction segments must serve identical results")
    } finally q.stop()
  }

  test("segmented ANN: an all-tombstone batch writes NO vector pair and the root stays servable") {
    import graft.streaming.IncrementalIndex.SegmentVectorSpec
    val root = Files.createTempDirectory("graft-segvec-tomb").toString + "/index"
    def vec(i: Long): Array[Float] =
      Array.tabulate(4)(d => math.cos(i * 13 + d).toFloat)
    val batchDir = Files.createTempDirectory("graft-segvec-tombm").toString
    graft.sources.Ingest.buildVectorIndex(
      Seq(1L -> vec(1), 2L -> vec(2)).toDF("rid", "embedding"),
      "rid", "embedding", batchDir, numCentroids = 2, numCodewords = 4, m = 2)
    def pairs(sub: String) = spark.read.parquet(s"$batchDir/$sub")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val spec = SegmentVectorSpec("embedding", pairs("centroids"),
      pairs("codebook"), m = 2)
    IncrementalIndex.writeSegment(
      Seq((1L, 1L, "a", false, vec(1)), (2L, 1L, "b", false, vec(2)))
        .toDF("rid", "seq", "text", "deleted", "embedding"),
      f"$root/seg_${0}%09d", "rid", "text", "seq", vectors = Some(spec))
    // the all-tombstone batch: zero live rows to encode — a partitioned
    // write of the empty pair would leave a schema-less codes dir that
    // poisons every later read; the segment must simply not carry one
    IncrementalIndex.writeSegment(
      Seq((2L, 2L, "gone", true, vec(2)))
        .toDF("rid", "seq", "text", "deleted", "embedding"),
      f"$root/seg_${1}%09d", "rid", "text", "seq", vectors = Some(spec))
    assert(!new java.io.File(s"$root/seg_000000001/codes").exists(),
      "an all-tombstone segment must not write a codes dir")
    val (codes, raw) = IncrementalIndex.segmentVectorTables(spark, root)
    assert(raw.select("rid").collect().map(_.getLong(0)).toSeq == Seq(1L),
      "the tombstone must still mask the dead doc's vectors")
    assert(codes.select("rid").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("segmented ANN: per-vectorset segment codes serve each named set independently") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.VectorSearch
    import graft.streaming.IncrementalIndex.SegmentVectorSpec
    val root = Files.createTempDirectory("graft-segvs").toString + "/index"
    val ckpt = Files.createTempDirectory("graft-segvsck").toString
    def vec(i: Long, seq: Long): Array[Float] =
      Array.tabulate(8)(d => math.cos(i * 17 + seq * 5 + d).toFloat)
    val finalState =
      Seq(1L -> vec(1, 2), 2L -> vec(2, 1), 3L -> vec(3, 2), 4L -> vec(4, 2))
    // one batch-trained model per vectorset (v8 full-dim, v4 matryoshka)
    def train(dim: Int): (String, Seq[(Int, Seq[Float])], Seq[(Int, Seq[Float])]) = {
      val dir = Files.createTempDirectory(s"graft-segvs$dim").toString
      graft.sources.Ingest.buildVectorIndex(
        finalState.map { case (i, v) => (i, v.take(dim)) }.toDF("rid", "embedding"),
        "rid", "embedding", dir, numCentroids = 2, numCodewords = 4, m = 4)
      val c = spark.read.parquet(s"$dir/centroids")
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
      val cb = spark.read.parquet(s"$dir/codebook")
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
      (dir, c, cb)
    }
    val (dir8, c8, cb8) = train(8)
    val (dir4, c4, cb4) = train(4)
    val sets = Map(
      "v8" -> SegmentVectorSpec("emb8", c8, cb8, m = 4),
      "v4" -> SegmentVectorSpec("emb4", c4, cb4, m = 4))

    val input = MemoryStream[(Long, Long, String, Boolean, Array[Float], Array[Float])]
    val updates = input.toDF()
      .toDF("rid", "seq", "text", "deleted", "emb8", "emb4")
    val q = IncrementalIndex.startIndexSegments(updates, root, ckpt,
      idCol = "rid", textCol = "text", vectorSets = sets)
    try {
      input.addData((1L, 1L, "a", false, vec(1, 1), vec(1, 1).take(4)),
        (2L, 1L, "b", false, vec(2, 1), vec(2, 1).take(4)),
        (5L, 1L, "e", false, vec(5, 1), vec(5, 1).take(4)))
      q.processAllAvailable()
      input.addData((1L, 2L, "a2", false, vec(1, 2), vec(1, 2).take(4)),
        (5L, 2L, "gone", true, vec(5, 2), vec(5, 2).take(4)),
        (3L, 2L, "c", false, vec(3, 2), vec(3, 2).take(4)),
        (4L, 2L, "d", false, vec(4, 2), vec(4, 2).take(4)))
      q.processAllAvailable()

      def check(): Unit = Seq(("v8", 8, dir8, c8, cb8), ("v4", 4, dir4, c4, cb4))
        .foreach { case (vs, dim, bdir, cents, cb) =>
          val qv = vec(7, 3).take(dim).toSeq
          def search(codes: org.apache.spark.sql.DataFrame,
              raw: org.apache.spark.sql.DataFrame) =
            VectorSearch.ivfPqSearchAtRest(codes, raw, "rid", "code", "embedding",
                cents, cb, m = 4, qv, k = 4, nprobe = cents.size, rerank = 10)
              .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
          val expected = search(spark.read.parquet(s"$bdir/codes"),
            finalState.map { case (i, v) => (i, v.take(dim)) }.toDF("rid", "embedding"))
          assert(expected.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
          val (sc, sr) = IncrementalIndex.segmentVectorTables(spark, root,
            vectorset = vs)
          assert(search(sc, sr) == expected,
            s"vectorset $vs diverged from its batch index")
        }
      check()
      IncrementalIndex.compactSegments(spark, root)
      check()
    } finally q.stop()
  }

  test("streamingDedup drops cross-batch duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = IncrementalIndex.streamingDedup(
      input.toDF().toDF("ts", "key"), "ts", Seq("key"))
    val q = out.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), "a"))
      q.processAllAvailable()
      input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "a"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "b"))
      q.processAllAvailable()
      val keys = spark.sql("SELECT key FROM dd").collect().map(_.getString(0)).sorted
      assert(keys.sameElements(Array("a", "b"))) // 'a' deduped across batches
    } finally q.stop()
  }

  test("streamingSessionCounts keeps per-user state across batches (mapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.IncrementalIndex.{UserEvent, UserSessions}
    val input = MemoryStream[UserEvent]
    val out = IncrementalIndex.streamingSessionCounts(input.toDS(), gapSeconds = 60)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("update").start()
    try {
      // batch 1: user 1 has two events 10s apart → one session
      input.addData(UserEvent(1L, 0L), UserEvent(1L, 10000L))
      q.processAllAvailable()
      // batch 2: user 1 returns 5 min later (new session); user 2 appears
      input.addData(UserEvent(1L, 310000L), UserEvent(2L, 0L))
      q.processAllAvailable()
      val got = spark.sql("SELECT user, max(n_sessions), max(n_events) FROM sess GROUP BY user")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == Map(1L -> (2L, 3L), 2L -> (1L, 1L)))
    } finally q.stop()
  }

  test("transformWithState sessionization matches the mapGroupsWithState semantics") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.IncrementalIndex.UserEvent
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[UserEvent]
      val out = IncrementalIndex.streamingSessionCountsTws(input.toDS(), gapSeconds = 60)
      val q = out.writeStream.format("memory").queryName("sess_tws")
        .outputMode("update").start()
      try {
        input.addData(UserEvent(1L, 0L), UserEvent(1L, 10000L))
        q.processAllAvailable()
        input.addData(UserEvent(1L, 310000L), UserEvent(2L, 0L))
        q.processAllAvailable()
        val got = spark.sql(
            "SELECT user, max(n_sessions), max(n_events) FROM sess_tws GROUP BY user")
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(got == Map(1L -> (2L, 3L), 2L -> (1L, 1L)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-batch parity: windowed counts equal the batch aggregation over the same events") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(21)
    val events = (1 to 300).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${rnd.nextInt(6)}%02d:${rnd.nextInt(60)}%02d:00"),
        Seq("click", "view", "buy")(rnd.nextInt(3)))
    }
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = IncrementalIndex.windowedCounts(
      input.toDF().toDF("ts", "etype"), "ts", "etype")
    val q = out.writeStream.format("memory").queryName("sbp")
      .outputMode("complete").start()
    try {
      // deliver across three micro-batches — same rows, different arrival
      events.grouped(100).foreach { g => input.addData(g: _*); q.processAllAvailable() }
      val streamed = spark.sql("SELECT * FROM sbp")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = events.toDF("ts", "etype")
        .groupBy(window(col("ts"), "1 hour"), col("etype"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("etype"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("windowedCounts aggregates per tumbling window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = IncrementalIndex.windowedCounts(
      input.toDF().toDF("ts", "etype"), "ts", "etype")
    val q = out.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
        (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "click"),
        (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view"))
      q.processAllAvailable()
      val got = spark.sql("SELECT etype, n FROM wc")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("compaction heals NULL dl posting rows from a mixed pre-dl/post-dl root") {
    import graft.functions.Bm25
    // two segments, then strip the denormalized dl column from segment
    // 1's posting tables — the pre-dl layout. The multi-path read over
    // the mixed root either drops dl entirely (old schema sampled:
    // legacy join path) or fills segment 1's rows with NULL (new schema
    // sampled) — compaction must end in a healthy root either way,
    // never bake nulls that make the BM25 null-dl guard permanent.
    val root = Files.createTempDirectory("graft-heal").toString + "/index"
    IncrementalIndex.writeSegment(
      Seq(("r1", 1L, "fast spark scan spark", false))
        .toDF("rid", "seq", "value", "deleted"),
      s"$root/seg_000000001", "rid", "value", "seq")
    IncrementalIndex.writeSegment(
      Seq(("r2", 2L, "spark planner here", false))
        .toDF("rid", "seq", "value", "deleted"),
      s"$root/seg_000000002", "rid", "value", "seq")
    def stripDl(p: String): Unit = {
      val tmp = p + "__tmp"
      spark.read.parquet(p).drop("dl").write.parquet(tmp)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(p))
      assert(new java.io.File(tmp).renameTo(new java.io.File(p)))
    }
    stripDl(s"$root/seg_000000001/postings")
    stripDl(s"$root/seg_000000001/par_postings")
    IncrementalIndex.compactSegments(spark, root)
    val ix = IncrementalIndex.segmentTables(spark, root)
    // if the compacted postings carry dl, it must be null-free
    for (post <- Seq(ix.postings) ++ ix.parPostings)
      if (post.columns.contains("dl"))
        assert(post.where(post("dl").isNull).isEmpty,
          "compaction persisted NULL dl rows")
    // and BM25 scores equal a batch index over the same merged corpus
    val batchDir = Files.createTempDirectory("graft-healix").toString
    graft.sources.Ingest.buildIndex(
      Seq(("r1", "fast spark scan spark"), ("r2", "spark planner here"))
        .toDF("rid", "value"),
      "rid", "value", batchDir, withVectors = false)
    def scores(post: org.apache.spark.sql.DataFrame,
        dls: org.apache.spark.sql.DataFrame, id: String) =
      Bm25.scoreFromPostings(post, dls, id, Seq("spark"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = scores(spark.read.parquet(s"$batchDir/postings"),
      spark.read.parquet(s"$batchDir/doclengths"), "rid")
    val streamed = scores(ix.postings, ix.docLengths, "rid")
    assert(streamed.keySet == batch.keySet, s"$streamed != $batch")
    batch.foreach { case (k, v) =>
      assert(math.abs(streamed(k) - v) < 1e-12, s"$k: ${streamed(k)} != $v") }
    val batchPar = scores(spark.read.parquet(s"$batchDir/par_postings"),
      spark.read.parquet(s"$batchDir/par_doclengths"), "paragraph_id")
    val streamedPar = scores(ix.parPostings.get, ix.parDocLengths.get,
      "paragraph_id")
    assert(streamedPar == batchPar ||
      (streamedPar.keySet == batchPar.keySet &&
        batchPar.forall { case (k, v) => math.abs(streamedPar(k) - v) < 1e-12 }),
      s"$streamedPar != $batchPar")
  }

  test("streamed suggest latency vs live segment count (1 vs 8 vs 64) stays within the compaction contract") {
    // segmentTermFreq rolls up the winner-filtered postings of ALL live
    // segments per request — correct by construction, but its cost
    // grows with the live-segment count between compactions. This pins
    // the measured growth and the contract that bounds it (DESIGN.md:
    // compaction folds live segments; suggest cost is ∝ live segments,
    // so the cadence bounds request latency).
    val root = Files.createTempDirectory("graft-sugsegs").toString
    def writeSegs(from: Int, until: Int): Unit = (from until until).foreach { b =>
      val rows = (0 until 4).map(i =>
        (s"r${b}_$i", b.toLong, s"spark query term$b suggest word$i", false))
      IncrementalIndex.writeSegment(rows.toDF("rid", "seq", "value", "deleted"),
        f"$root/seg_$b%09d", "rid", "value", "seq")
    }
    def timeSuggest(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        val tf = IncrementalIndex.segmentTermFreq(spark, root)
        graft.operators.TopK.suggestPrefix(tf, "term", "freq", "sp", 10).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm (plan + file listing)
      Seq(once(), once()).min
    }
    writeSegs(0, 1)
    val t1 = timeSuggest()
    writeSegs(1, 8)
    val t8 = timeSuggest()
    writeSegs(8, 64)
    val t64 = timeSuggest()
    info(f"suggest latency: 1 seg $t1%.3fs, 8 segs $t8%.3fs, 64 segs $t64%.3fs")
    // correctness across all 64 segments: every term is still served
    val tf = IncrementalIndex.segmentTermFreq(spark, root)
    val sparkFreq = tf.where($"term" === "spark").collect().head.getLong(1)
    assert(sparkFreq == 64 * 4, s"spark freq $sparkFreq != 256")
    // compaction restores single-segment cost — the cadence contract:
    // fold, then the same request serves one segment again
    IncrementalIndex.compactSegments(spark, root)
    val tc = timeSuggest()
    info(f"suggest latency after compaction: $tc%.3fs")
    val tfc = IncrementalIndex.segmentTermFreq(spark, root)
    assert(tfc.where($"term" === "spark").collect().head.getLong(1) == 64 * 4)
    // loose flakiness-proof bounds, calibrated to the pathology they
    // guard against: the per-dir read + union shape this pins out
    // measured ~50× the 1-segment cost at 64 segments (34.6 s vs
    // 0.7 s), while the healthy multi-path shape is 3-6× — a 25×
    // envelope separates the two with generous host-noise margin
    assert(t64 < math.max(t1, 0.3) * 25,
      f"64-segment suggest $t64%.3fs blew past the multi-path envelope " +
        f"(1 seg $t1%.3fs) — did a per-segment eager read return?")
    assert(tc < math.max(t8, 0.3) * 5,
      f"post-compaction suggest $tc%.3fs did not return near single-segment cost")
  }

  test("mixed pre-/post-repeated_in_field roots: serving keeps old rows, compaction heals") {
    import org.apache.spark.sql.functions.col
    import graft.api.Find
    import graft.api.Find.{Corpus, FindRequest}
    val root = Files.createTempDirectory("graft-segmixed").toString + "/index"
    def seg(bid: Long, rows: (String, Long, String, Boolean)*): Unit =
      IncrementalIndex.writeSegment(
        rows.toDF("rid", "seq", "value", "deleted"),
        f"$root/seg_$bid%09d", "rid", "value", "seq")
    seg(0L, ("r1", 1L, "alpha beta gamma", false))
    // strip the flag from segment 0's paragraph tables — the
    // pre-upgrade layout; the multi-path read will fill NULLs
    def stripFlag(dir: String): Unit = {
      val df = spark.read.parquet(dir).drop("repeated_in_field")
      val rows = java.util.Arrays.asList(df.collect(): _*)
      spark.createDataFrame(rows, df.schema)
        .write.mode("overwrite").parquet(dir)
    }
    Seq("paragraphs", "par_postings", "par_doclengths")
      .foreach(s => stripFlag(f"$root/seg_${0L}%09d/$s"))
    seg(1L, ("r2", 2L, "delta epsilon", false))
    def defaultHits(): Set[String] = {
      val ix = IncrementalIndex.segmentTables(spark, root)
      val docs = Seq(("r1", "alpha beta gamma"), ("r2", "delta epsilon"))
        .toDF("rid", "value")
      Find.findParagraphs(Corpus(docs, "rid", "value", index = Some(ix)),
          FindRequest(query = "alpha"))
        .collect().map(_.getString(0)).toSet
    }
    // default (exclude-repeated) mode must NOT drop the old segment's
    // rows just because their flag reads NULL
    assert(defaultHits() == Set("r1"), defaultHits().toString)
    IncrementalIndex.compactSegments(spark, root)
    assert(defaultHits() == Set("r1"), "post-compaction old rows lost")
    // and compaction HEALED the nulls at rest — false, not null
    val healed = IncrementalIndex.segmentTables(spark, root).paragraphs
    assert(healed.columns.contains("repeated_in_field") &&
      healed.where(col("repeated_in_field").isNull).isEmpty,
      "compaction must bake false, never null")
  }

  test("streamed suggest dictionary excludes repeated windows like the batch rollup (ADVICE r10)") {
    import org.apache.spark.sql.functions.col
    // one doc whose text repeats a full 20-token window: ingest marks
    // the second window repeated_in_field, and the suggest dictionary
    // must not count it — in batch (par_termfreq contract) OR streamed
    val root = Files.createTempDirectory("graft-sugrep").toString + "/index"
    val window = (1 to 20).map(i => s"tok$i").mkString(" ")
    val text = s"$window $window"
    IncrementalIndex.writeSegment(
      Seq(("r1", 1L, text, false)).toDF("rid", "seq", "value", "deleted"),
      f"$root/seg_${0L}%09d", "rid", "value", "seq")
    val tf = IncrementalIndex.segmentTermFreq(spark, root)
    val tok1 = tf.where(col("term") === "tok1").collect()
    // doc-level rollup would say 2; the paragraph rollup with the
    // repeated exclusion says 1 — the reference's suggest_query
    // requires repeated_in_field = 0 (search_query.rs:150-167)
    assert(tok1.map(_.getLong(1)).toSeq == Seq(1L),
      s"streamed dictionary counted the repeated window: ${tok1.mkString(",")}")
    // and it matches the batch dictionary of the same document
    val batchDir = Files.createTempDirectory("graft-sugrep-batch").toString
    graft.sources.Ingest.buildIndex(
      Seq(("r1", text)).toDF("rid", "value"), "rid", "value", batchDir,
      withVectors = false)
    val batchTok1 = spark.read.parquet(s"$batchDir/par_termfreq")
      .where(col("term") === "tok1").collect().map(_.getLong(1)).toSeq
    assert(batchTok1 == Seq(1L), s"batch dictionary: $batchTok1")
  }

  test("segmented relation index: latest-wins edges, updates replace, compaction preserves") {
    import graft.api.GraphSearch
    import graft.api.GraphSearch.{EdgeTable, NodeMatch, PathQuery}
    val root = Files.createTempDirectory("graft-segedges").toString + "/index"
    def seg(bid: Long,
        rows: (String, Long, String, Boolean, Seq[StreamingSpec.Rel])*): Unit =
      IncrementalIndex.writeSegment(
        rows.toDF("rid", "seq", "value", "deleted", "relations"),
        f"$root/seg_$bid%09d", "rid", "value", "seq",
        relationsCol = Some("relations"))
    seg(0L,
      ("r1", 1L, "text one", false,
        Seq(StreamingSpec.Rel("mentions", "spark"), StreamingSpec.Rel("about", "engines"))),
      ("r2", 1L, "text two", false, Seq(StreamingSpec.Rel("mentions", "duck"))))
    seg(1L,
      // r2's update REPLACES its relations (duck → goose), r1 is
      // tombstoned — its seg0 edges must vanish with it
      ("r2", 2L, "text two v2", false, Seq(StreamingSpec.Rel("mentions", "goose"))),
      ("r3", 2L, "text three", false, Seq(StreamingSpec.Rel("mentions", "spark"))),
      ("r1", 2L, "", true, Seq.empty[StreamingSpec.Rel]))
    def results(): Set[(String, String, String)] =
      GraphSearch.search(
          EdgeTable(IncrementalIndex.segmentEdges(spark, root), "rid", "rel", "dst"),
          PathQuery.Path(), topK = 50)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = Set(("r2", "mentions", "goose"), ("r3", "mentions", "spark"))
    assert(results() == want, s"streamed edge serving diverged: ${results()}")
    // a dst-constrained path query matches only the surviving rows
    val sparkDst = GraphSearch.search(
        EdgeTable(IncrementalIndex.segmentEdges(spark, root), "rid", "rel", "dst"),
        PathQuery.Path(dst = NodeMatch.Exact("spark")), topK = 50)
      .collect().map(_.getString(0)).toSet
    assert(sparkDst == Set("r3"), "tombstoned r1's edge resurfaced")
    IncrementalIndex.compactSegments(spark, root)
    assert(results() == want, "post-compaction edge divergence")
  }

  test("segmented conversation store: latest-wins messages, updates replace, tombstones remove, compaction preserves") {
    val root = Files.createTempDirectory("graft-segmsgs").toString + "/index"
    def seg(bid: Long,
        rows: (String, Long, String, Boolean, Seq[StreamingSpec.Msg])*): Unit =
      IncrementalIndex.writeSegment(
        rows.toDF("rid", "seq", "value", "deleted", "msgs"),
        f"$root/seg_$bid%09d", "rid", "value", "seq",
        messagesCol = Some("msgs"))
    def m(split: Int, mtype: String, text: String) =
      StreamingSpec.Msg("chat", split, mtype, text)
    seg(0L,
      ("r1", 1L, "text one", false,
        Seq(m(0, "QUESTION", "stale q"), m(1, "ANSWER", "stale a"))),
      ("r2", 1L, "text two", false, Seq(m(0, "OTHER", "keep me"))))
    seg(1L,
      // r1's update REPLACES its conversation (the stale seg-0
      // messages must lose the winner join); r2 is tombstoned — its
      // messages die with the doc
      ("r1", 2L, "text one v2", false,
        Seq(m(0, "QUESTION", "real q"), m(1, "ANSWER", "real a"),
          m(2, "OTHER", "real tail"))),
      ("r2", 2L, "", true, Seq.empty[StreamingSpec.Msg]))
    def served(): Set[(String, Int, String)] =
      IncrementalIndex.segmentMessagesAt(spark,
          IncrementalIndex.liveSegments(spark, root))
        .select("rid", "split", "mtext")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .toSet
    val want = Set(("r1", 0, "real q"), ("r1", 1, "real a"),
      ("r1", 2, "real tail"))
    assert(served() == want, s"streamed message serving diverged: ${served()}")
    IncrementalIndex.compactSegments(spark, root)
    assert(served() == want, "post-compaction message divergence")
  }

  test("mixed root SERVES optional tables from the carrying subset before any compaction (degrade, never stale)") {
    import graft.api.GraphSearch
    import graft.api.GraphSearch.{EdgeTable, NodeMatch, PathQuery}
    val root = Files.createTempDirectory("graft-mixserve").toString + "/index"
    def m(split: Int, text: String) =
      StreamingSpec.Msg("chat", split, "OTHER", text)
    // seg 0: PRE-UPGRADE layout — no messages, no edges tables
    IncrementalIndex.writeSegment(
      Seq(("r1", 1L, "old text", false), ("r3", 1L, "three", false))
        .toDF("rid", "seq", "value", "deleted"),
      f"$root/seg_${0L}%09d", "rid", "value", "seq")
    // seg 1: post-upgrade — carries BOTH optional tables; r1's update
    // moves its winner here, r2 is new here
    IncrementalIndex.writeSegment(
      Seq(
        ("r1", 2L, "new text", false, Seq(m(0, "r1 live")),
          Seq(StreamingSpec.Rel("likes", "spark"))),
        ("r2", 1L, "two", false, Seq(m(0, "r2 will go stale")),
          Seq(StreamingSpec.Rel("likes", "stale-target"))))
        .toDF("rid", "seq", "value", "deleted", "msgs", "relations"),
      f"$root/seg_${1L}%09d", "rid", "value", "seq",
      messagesCol = Some("msgs"), relationsCol = Some("relations"))
    // seg 2: ANOTHER pre-upgrade-shaped segment updates r2 — its
    // winner row now lives in a NON-carrying segment, so r2's seg-1
    // messages/edges must stop serving (degrade, never stale)
    IncrementalIndex.writeSegment(
      Seq(("r2", 2L, "two v2", false))
        .toDF("rid", "seq", "value", "deleted"),
      f"$root/seg_${2L}%09d", "rid", "value", "seq")

    def servedMsgs(): Set[(String, String)] =
      IncrementalIndex.segmentMessagesAt(spark,
          IncrementalIndex.liveSegments(spark, root))
        .select("rid", "mtext")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    def servedEdges(): Set[(String, String)] =
      IncrementalIndex.segmentEdgesAt(spark,
          IncrementalIndex.liveSegments(spark, root))
        .select("rid", "dst")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // BEFORE any compaction: the carrying subset serves; r2's stale
    // carried rows lose the global winner join
    assert(servedMsgs() == Set(("r1", "r1 live")),
      s"mixed-root message serve diverged: ${servedMsgs()}")
    assert(servedEdges() == Set(("r1", "spark")),
      s"mixed-root edge serve diverged: ${servedEdges()}")
    // the Engine facade binds both off the same mixed root
    val eng = graft.api.Engine.forStream(spark, root,
      Seq(("r1", "new text"), ("r2", "two v2"), ("r3", "three"))
        .toDF("rid", "value"),
      docId = "rid", textCol = "value")
    val viaEngine = GraphSearch.search(eng.edgeTable(),
        PathQuery.Path(dst = NodeMatch.Exact("spark")), topK = 10)
      .collect().map(_.getString(0)).toSet
    assert(viaEngine == Set("r1"), s"engine mixed-root graph: $viaEngine")
    val msgs = eng.augment(graft.api.Augment.AugmentRequest(fields = Seq(
        graft.api.Augment.FieldAugment(given = Seq("r1/c/chat"),
          fullConversation = true),
        graft.api.Augment.FieldAugment(given = Seq("r2/c/chat"),
          fullConversation = true))))
      .messages.select("rid", "mtext")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(msgs == Set(("r1", "r1 live")),
      s"engine mixed-root conversation store: $msgs")
    // compaction heals the fold toward all-carrying; the serve answers
    // must not change
    IncrementalIndex.compactSegments(spark, root)
    assert(servedMsgs() == Set(("r1", "r1 live")), "post-compaction msgs")
    assert(servedEdges() == Set(("r1", "spark")), "post-compaction edges")
  }

  test("startIndexSegments threads messagesCol: a LIVE stream's segments serve the conversation store end to end") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-livemsgs").toString + "/index"
    val ckpt = Files.createTempDirectory("graft-livemsgsck").toString
    val input = MemoryStream[(String, Long, String, Boolean,
      Seq[StreamingSpec.Msg])]
    val updates = input.toDF().toDF("rid", "seq", "value", "deleted", "msgs")
    val q = IncrementalIndex.startIndexSegments(updates, root, ckpt,
      idCol = "rid", textCol = "value", messagesCol = Some("msgs"))
    try {
      input.addData(("r1", 1L, "spark chat", false,
        Seq(StreamingSpec.Msg("chat", 0, "QUESTION", "stale hi"))))
      q.processAllAvailable()
      input.addData(("r1", 2L, "spark chat v2", false,
        Seq(StreamingSpec.Msg("chat", 0, "QUESTION", "hello again"),
          StreamingSpec.Msg("chat", 1, "ANSWER", "yo"))))
      q.processAllAvailable()
      val served = IncrementalIndex.segmentMessagesAt(spark,
          IncrementalIndex.liveSegments(spark, root))
        .select("rid", "split", "mtext")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .toSet
      assert(served == Set(("r1", 0, "hello again"), ("r1", 1, "yo")),
        s"live-stream message store wrong: $served")
      // the Engine facade binds the store off the same root — the
      // /augment conversation selectors serve a LIVE stream, which the
      // round-14 review found unreachable before messagesCol was
      // threaded through startIndexSegments
      import graft.api.{Augment, Engine}
      val eng = Engine.forStream(spark, root,
        Seq(("r1", "spark chat v2")).toDF("rid", "value"),
        docId = "rid", textCol = "value")
      val msgs = eng.augment(Augment.AugmentRequest(fields = Seq(
          Augment.FieldAugment(given = Seq("r1/c/chat"),
            fullConversation = true))))
        .messages.select("split", "mtext")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(msgs == Set(("0", "hello again"), ("1", "yo")),
        s"streamed augment conversation wrong: $msgs")
    } finally q.stop()
  }

  test("log-merge policy: size buckets, min-segment gate, oversize skip, ceiling split, deletion forcing") {
    import graft.streaming.IncrementalIndex.{LogMergeSettings, planMerges}
    val s = LogMergeSettings(minSegments = 3, topBucketMaxRecords = 1000,
      bottomBucketThreshold = 4, bucketSizeLog = 1.0)
    // same-size small segments fold together; the oversize one never
    // merges unforced (tantivy's top-bucket ceiling)
    assert(planMerges(s, Seq(("a", 10, false), ("b", 10, false),
      ("c", 10, false), ("big", 5000, false))) == Seq(Seq("a", "b", "c")))
    // below the min-segment gate nothing folds…
    assert(planMerges(s, Seq(("a", 10, false), ("b", 10, false))).isEmpty)
    // …unless a member carries deletion pressure (forced)
    assert(planMerges(s, Seq(("a", 10, false), ("b", 10, true)))
      == Seq(Seq("a", "b")))
    // a >bucketSizeLog gap in log2(records) cuts a new bucket — sizes
    // 512 and 8 never fold together. Under the 1000 ceiling the l
    // bucket's running sum passes the ceiling at its second member
    // (1024 > 1000); the split cuts a 2-member group below
    // minSegments=3, so the l group is DROPPED, not emitted
    // (log_merge.rs:87-108 ceiling-split semantics)
    assert(planMerges(s, Seq(("s1", 8, false), ("s2", 8, false),
      ("s3", 8, false), ("l1", 512, false), ("l2", 512, false),
      ("l3", 512, false)))
      == Seq(Seq("s1", "s2", "s3")))
    // with the ceiling lifted past 3×512 both buckets fold, each to
    // its own group — the sizes still never mix
    assert(planMerges(s.copy(topBucketMaxRecords = 2000),
      Seq(("s1", 8, false), ("s2", 8, false), ("s3", 8, false),
        ("l1", 512, false), ("l2", 512, false), ("l3", 512, false)))
      == Seq(Seq("l1", "l2", "l3"), Seq("s1", "s2", "s3")))
    // a group splits when its record sum passes the ceiling, so one
    // fold never produces an over-ceiling segment
    assert(planMerges(LogMergeSettings(minSegments = 2,
        topBucketMaxRecords = 100, bottomBucketThreshold = 4),
      Seq(("a", 60, false), ("b", 60, false), ("c", 60, false),
        ("d", 60, false)))
      == Seq(Seq("a", "b"), Seq("c", "d")))
    // an oversize segment folds ALONE only when forced (deletions
    // must apply — merge_task.rs's force path)
    assert(planMerges(s, Seq(("big", 5000, true))) == Seq(Seq("big")))
  }

  test("log-merge policy: upstream test vectors (log_merge.rs #[cfg(test)])") {
    import graft.streaming.IncrementalIndex.{LogMergeSettings, planMerges}
    // test_log_merge_scheduling_forced_merge (log_merge.rs:119-147)
    val forcedS = LogMergeSettings(minSegments = 3,
      topBucketMaxRecords = 1000, bottomBucketThreshold = 5,
      bucketSizeLog = 1.0)
    assert(planMerges(forcedS,
      Seq(("1", 50, false), ("2", 50, false))).isEmpty)
    assert(planMerges(forcedS,
      Seq(("1", 50, false), ("2", 50, true))).size == 1)
    assert(planMerges(forcedS, Seq(("1", 2000, false))).isEmpty)
    assert(planMerges(forcedS, Seq(("1", 2000, true))).size == 1)
    // test_log_merge_scheduling_not_enough_segments_merge (:149-158)
    // + test_log_merge_scheduling_same_size_segments (:160-178),
    // both at the reference DEFAULT settings (settings.rs:228-255)
    val defaults = LogMergeSettings(minSegments = 3)
    assert(planMerges(defaults,
      Seq(("1", 50, false), ("2", 50, false))).isEmpty)
    assert(planMerges(defaults,
      Seq(("1", 50, false), ("2", 50, false), ("3", 50, false)))
      == Seq(Seq("1", "2", "3")))
    // test_log_merge_scheduling_all_buckets (:180-228): dynamic bucket
    // cuts, the over-ceiling 1001 skipped, the solo 500 below
    // minSegments, the bottom bucket pooling everything ≤ threshold
    val allS = LogMergeSettings(minSegments = 2,
      topBucketMaxRecords = 1000, bottomBucketThreshold = 50,
      bucketSizeLog = 1.0)
    val jobs = planMerges(allS, Seq(
      ("7", 1001, false), ("3", 1000, false), ("12", 501, false),
      ("13", 500, false), ("11", 249, false), ("9", 125, false),
      ("5", 124, false), ("4", 63, false), ("6", 62, false),
      ("10", 51, false), ("1", 50, false), ("2", 10, false),
      ("8", 20, false)))
    assert(jobs == Seq(
      Seq("3", "12"),              // top bucket (1000, 501) — ceiling-split emits at 1501
      Seq("11", "9"),              // 249, 125
      Seq("5", "4"),               // 124, 63
      // bottom bucket (62, 51, 50, 20, 10). The reference keeps the
      // caller's order (its vector lists 10 before 20, both clamped
      // to the threshold); planMerges sorts canonically by records
      // DESC, so 20 ("8") precedes 10 ("2") — same group membership
      Seq("6", "10", "1", "8", "2")),
      jobs.toString)
  }

  test("tiered compaction folds only the small bucket; the big segment is never rewritten; serving unchanged") {
    import graft.functions.Bm25
    import graft.streaming.IncrementalIndex.LogMergeSettings
    val root = Files.createTempDirectory("graft-tiered").toString + "/index"
    // four 3-doc segments + one 100-doc segment above the ceiling
    (0 until 4).foreach { b =>
      val rows = (0 until 3).map(i =>
        (s"r${b}_$i", b.toLong, s"spark query word${b}_$i", false))
      IncrementalIndex.writeSegment(rows.toDF("rid", "seq", "value", "deleted"),
        f"$root/seg_$b%09d", "rid", "value", "seq")
    }
    val bigRows = (0 until 100).map(i =>
      (s"big_$i", 4L, s"spark corpus doc$i", false))
    IncrementalIndex.writeSegment(bigRows.toDF("rid", "seq", "value", "deleted"),
      f"$root/seg_${4}%09d", "rid", "value", "seq")
    def scores(): Map[String, Double] = {
      val ix = IncrementalIndex.segmentTables(spark, root)
      Bm25.scoreFromPostings(ix.postings, ix.docLengths, "rid", Seq("query"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    val before = scores()
    val bigMtime = new java.io.File(s"$root/seg_000000004").lastModified()
    val plan = IncrementalIndex.compactSegmentsTiered(spark, root,
      settings = LogMergeSettings(minSegments = 3,
        topBucketMaxRecords = 50, bottomBucketThreshold = 2))
    // exactly the four small segments fold into one group
    assert(plan == Seq((0 until 4).map(b => f"seg_$b%09d")),
      plan.toString)
    val segNames = IncrementalIndex.liveSegments(spark, root)
      .map(p => new org.apache.hadoop.fs.Path(p).getName).sorted
    assert(segNames == Seq("seg_000000003c", "seg_000000004"), segNames)
    // the over-ceiling segment was not rewritten (cost tracks NEW
    // data, not the corpus — the policy's whole point)
    assert(new java.io.File(s"$root/seg_000000004").lastModified() == bigMtime)
    assert(scores() == before, "tiered fold must not change serving")
    // a second pass finds nothing to do (one small-compacted + one big)
    // — and its start retries the grace-deferred input deletes, so the
    // folded inputs leave the disk exactly one pass later
    assert(IncrementalIndex.compactSegmentsTiered(spark, root,
      settings = LogMergeSettings(minSegments = 3,
        topBucketMaxRecords = 50, bottomBucketThreshold = 2)).isEmpty)
    val onDisk = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg_"))
      .map(_.getName).sorted.toSeq
    assert(onDisk == Seq("seg_000000003c", "seg_000000004"),
      s"the next pass must delete the folded inputs: $onDisk")
  }

  test("deletion-pressure lone fold: an oversize segment sheds its masked rows without merging; dead tombstones purge") {
    import graft.functions.Bm25
    import graft.streaming.IncrementalIndex.LogMergeSettings
    val root = Files.createTempDirectory("graft-pressure").toString + "/index"
    // one oversize segment (100 docs) + a later small segment
    // tombstoning 40 of them — the dead weight lives in the BIG one
    IncrementalIndex.writeSegment(
      (0 until 100).map(i => (s"d_$i", 1L, s"spark corpus doc$i", false))
        .toDF("rid", "seq", "value", "deleted"),
      f"$root/seg_${0}%09d", "rid", "value", "seq")
    IncrementalIndex.writeSegment(
      (0 until 40).map(i => (s"d_$i", 2L, "", true))
        .toDF("rid", "seq", "value", "deleted"),
      f"$root/seg_${1}%09d", "rid", "value", "seq")
    val s = LogMergeSettings(minSegments = 3, topBucketMaxRecords = 50,
      bottomBucketThreshold = 2, maxDeletions = 30)
    def served(): Set[String] = {
      val ix = IncrementalIndex.segmentTables(spark, root)
      Bm25.scoreFromPostings(ix.postings, ix.docLengths, "rid", Seq("corpus"))
        .collect().map(_.getString(0)).toSet
    }
    val before = served()
    assert(before == (40 until 100).map(i => s"d_$i").toSet)
    // pass 1: the oversize segment's 40 masked rows (> maxDeletions)
    // force a LONE fold — nothing merges with it, the dead rows drop
    assert(IncrementalIndex.compactSegmentsTiered(spark, root, settings = s)
      == Seq(Seq("seg_000000000")))
    assert(spark.read.parquet(s"$root/seg_000000000c/docs").count() == 60,
      "the pressure fold must physically drop the masked rows")
    assert(served() == before, "pressure fold must not change serving")
    // pass 2: with the masked rows gone the tombstones mask NOTHING —
    // dead-tombstone pressure purges the tombstone segment entirely
    assert(IncrementalIndex.compactSegmentsTiered(spark, root, settings = s)
      == Seq(Seq("seg_000000001")))
    assert(spark.read.parquet(s"$root/seg_000000001c/docs").count() == 0,
      "a tombstone with nothing left to mask is itself dead")
    assert(served() == before, "tombstone purge must not change serving")
    // pass 3: nothing left under pressure — the fully-purged segment
    // is NOT droppable yet (no commit watermark: its masked batch
    // could still replay, so its manifest must stay)
    assert(IncrementalIndex.compactSegmentsTiered(spark, root,
      settings = s).isEmpty)
    assert(IncrementalIndex.liveSegments(spark, root)
      .exists(_.endsWith("seg_000000001c")),
      "without a watermark the empty segment's mask must survive")
    // pass 4: with the commit watermark past the masked batch, the
    // 0-row segment serves nothing and masks nothing that can return —
    // it deletes outright instead of lingering in the live listing
    // (and inflating AutoCompact's maxLiveSegments trigger) forever
    assert(IncrementalIndex.compactSegmentsTiered(spark, root,
      settings = s, committedBatchId = Some(1L)).isEmpty)
    val liveNames = IncrementalIndex.liveSegments(spark, root)
      .map(p => new org.apache.hadoop.fs.Path(p).getName)
    assert(liveNames == Seq("seg_000000000c"),
      s"the purged empty segment must drop from the live set: $liveNames")
    assert(!new java.io.File(s"$root/seg_000000001c").exists(),
      "the purged empty segment must leave the disk")
    assert(served() == before, "empty-segment purge must not change serving")
  }

  test("auto-compaction: a long-running stream folds its segment tail on cadence; serving parity") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.Bm25
    import graft.streaming.IncrementalIndex.{AutoCompact, LogMergeSettings}
    val root = Files.createTempDirectory("graft-autocomp").toString + "/index"
    val ckpt = Files.createTempDirectory("graft-autocompck").toString
    val input = MemoryStream[(String, Long, String, Boolean)]
    val updates = input.toDF().toDF("rid", "seq", "value", "deleted")
    // every 2 committed batches one tiered pass runs; these settings
    // fold any >=2 live small segments into one
    val q = IncrementalIndex.startIndexSegments(updates, root, ckpt,
      idCol = "rid", textCol = "value",
      autoCompact = Some(AutoCompact(everyBatches = 2,
        settings = LogMergeSettings(minSegments = 2,
          topBucketMaxRecords = 100000, bottomBucketThreshold = 2))))
    def live(): Seq[String] = IncrementalIndex.liveSegments(spark, root)
      .map(p => new org.apache.hadoop.fs.Path(p).getName).sorted
    try {
      input.addData(("r1", 1L, "spark engine", false),
        ("r2", 1L, "query planner", false))
      q.processAllAvailable() // bid 0 — no compaction yet (cadence 2)
      assert(live() == Seq("seg_000000000"), live().toString)
      input.addData(("r3", 2L, "columnar spark scan", false))
      q.processAllAvailable() // bid 1 — pass #1 folds seg0+seg1
      assert(live() == Seq("seg_000000001c"),
        s"stream must fold automatically at the cadence: ${live()}")
      input.addData(("r1", 3L, "spark query spark", false), // update
        ("r2", 3L, "gone", true))                           // tombstone
      q.processAllAvailable() // bid 2 — off-cadence, segment accumulates
      assert(live() == Seq("seg_000000001c", "seg_000000002"), live().toString)
      input.addData(("r4", 4L, "fast spark join", false))
      q.processAllAvailable() // bid 3 — pass #2 folds everything again
      assert(live() == Seq("seg_000000003c"),
        s"the threshold crossing must fold without a manual call: ${live()}")
      // serving parity: the auto-folded root scores like a batch-built
      // index over the merged corpus state (r2 tombstoned, r1 updated)
      val ix = IncrementalIndex.segmentTables(spark, root)
      val got = Bm25.scoreFromPostings(ix.postings, ix.docLengths,
          "rid", Seq("spark"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val merged = Seq(("r1", "spark query spark"),
        ("r3", "columnar spark scan"), ("r4", "fast spark join"))
        .toDF("rid", "value")
      val expected = Bm25.score(merged, "rid", "value", Seq("spark"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expected.keySet &&
        got.forall { case (k, v) => math.abs(v - expected(k)) < 1e-9 },
        s"auto-compacted serving diverged: $got vs $expected")
    } finally q.stop()
  }

  test("auto-compaction: segment-count pressure folds mid-cadence") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.IncrementalIndex.{AutoCompact, LogMergeSettings}
    val root = Files.createTempDirectory("graft-segpress").toString + "/index"
    val ckpt = Files.createTempDirectory("graft-segpressck").toString
    val input = MemoryStream[(String, Long, String, Boolean)]
    val updates = input.toDF().toDF("rid", "seq", "value", "deleted")
    // cadence effectively never fires — only the listing bound can
    // trigger; the settings fold any >=2 small live segments
    val q = IncrementalIndex.startIndexSegments(updates, root, ckpt,
      idCol = "rid", textCol = "value",
      autoCompact = Some(AutoCompact(everyBatches = 100,
        settings = LogMergeSettings(minSegments = 2,
          topBucketMaxRecords = 100000, bottomBucketThreshold = 2),
        maxLiveSegments = Some(2))))
    def live(): Seq[String] = IncrementalIndex.liveSegments(spark, root)
      .map(p => new org.apache.hadoop.fs.Path(p).getName).sorted
    try {
      input.addData(("r1", 1L, "spark engine", false))
      q.processAllAvailable() // 1 live <= 2: no pass
      input.addData(("r2", 2L, "query planner", false))
      q.processAllAvailable() // 2 live <= 2: still no pass
      assert(live() == Seq("seg_000000000", "seg_000000001"),
        s"under the bound nothing may fold: ${live()}")
      input.addData(("r3", 3L, "columnar scan", false))
      q.processAllAvailable() // 3 live > 2: pressure pass folds all
      assert(live() == Seq("seg_000000002c"),
        s"crossing maxLiveSegments must fold mid-cadence: ${live()}")
    } finally q.stop()
  }
}

object StreamingSpec {
  /** Message-carried relation (rel label, destination node) — the
    * streamed analog of IndexRelations rows. */
  final case class Rel(rel: String, dst: String)

  /** Conversation message riding a segment write (field, split, type,
    * text) — the streamed analog of the message-grain store. */
  final case class Msg(field_id: String, split: Int, mtype: String,
    mtext: String)
}
