package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Ingest
import graft.operators.Rerankers

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, (1 to 45).map(i => s"w$i").mkString(" ")), // 45 tokens → 3 paragraphs
    (2L, "just five little words here"),
    (3L, "")) // empty → no paragraphs
    .toDF("doc_id", "text")

  test("splitParagraphs chunks by token windows with reference-style ids") {
    val par = Ingest.splitParagraphs(docs, "doc_id", "text", parTokens = 20)
      .collect().map(r => (r.getString(1), r.getLong(4)))
    val ids = par.map(_._1).sorted
    assert(ids.sameElements(Array(
      "1/t/body/0-20", "1/t/body/20-40", "1/t/body/40-45", "2/t/body/0-5")))
    assert(par.toMap.apply("1/t/body/40-45") == 5)
  }

  test("paragraph text is the exact token slice") {
    val p = Ingest.splitParagraphs(docs, "doc_id", "text", parTokens = 20)
      .where(col("paragraph_id") === "1/t/body/20-40")
      .select("p_text").as[String].head()
    assert(p == (21 to 40).map(i => s"w$i").mkString(" "))
  }

  test("bench corpus carries no organic repeated windows (oracle invariant)") {
    // q97/q70/q136's oracles count ALL tokens/paragraphs while the
    // engine excludes repeated_in_field rows from suggest dictionaries
    // and paragraph lists — equal only while the corpus has no repeated
    // 20-token window. Pinned over EVERY sf dir the verify/bench
    // harness reads (ADVICE r10: the generator is shared today, but a
    // regen at one scale factor must not silently diverge the oracles
    // at another). The marking itself is exercised by q129's fixture.
    // Cost note: sf0.1's index build is already paid by the bench/spec
    // suite via the shared IndexStore memo, so this is a scan per dir,
    // not an extra build.
    import org.apache.spark.sql.functions.col
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val pars = graft.sources.IndexStore.paragraphs(spark, s"/root/testdata/$sf")
      assert(pars.where(col("repeated_in_field")).isEmpty,
        s"$sf testdata now contains repeated windows — update the " +
          "q97/q70/q136 oracles")
    }
  }

  test("bench corpus: no doc yields more than 20 paragraph windows (oracle invariant)") {
    // findParagraphs bounds each resource's hits ARRAY to the response
    // window (composeResources maxHits = topK, all 20 in the
    // findParagraphs oracles) while the q68/q91/q102/q104/q105/q139/
    // q143 oracles aggregate ALL of a doc's hits — parity is exact
    // only while no fixture doc carries more matching windows than the
    // window. Matching ⊆ all windows, so pin the per-doc window COUNT
    // over every sf dir the harness reads; a corpus regen with longer
    // docs must update those oracles with a per-doc rank cut.
    import org.apache.spark.sql.functions.{col, count, lit, max}
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val pars = graft.sources.IndexStore.paragraphs(spark, s"/root/testdata/$sf")
      val mx = pars.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).collect().head.getLong(0)
      assert(mx <= 20,
        s"$sf testdata now has a doc with $mx windows (> topK 20) — " +
          "bound the findParagraphs oracles' hits with a per-doc rank cut")
    }
  }

  test("splitParagraphs marks repeated_in_field: first occurrence clean, later copies flagged") {
    val w = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq(
      ("a", s"$w $w tail words here"), // windows: w, w(repeat), tail
      ("b", w))                        // single window — never repeated
      .toDF("rid", "text")
    val got = Ingest.splitParagraphs(d, "rid", "text")
      .collect().map(r => r.getString(1) -> r.getBoolean(6)).toMap
    assert(got == Map(
      "a/t/body/0-20" -> false, "a/t/body/20-40" -> true,
      "a/t/body/40-43" -> false, "b/t/body/0-20" -> false), got.toString)
  }

  test("chunkWithOverlap: stride windows share context, last window only if it adds tokens") {
    // 45 tokens, size 20 / stride 15 → [0,20) [15,35) [30,45): the
    // would-be 4th window [45,...) starts past the end and is absent
    val ch = Ingest.chunkWithOverlap(docs, "doc_id", "text",
        chunkTokens = 20, strideTokens = 15)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getInt(3), r.getString(5)))
    val d1 = ch.filter(_._1.startsWith("1/")).sortBy(_._2)
    assert(d1.map(c => (c._2, c._3)).sameElements(Array((0, 20), (15, 35), (30, 45))))
    assert(d1(1)._4 == (16 to 35).map(i => s"w$i").mkString(" "))
    // short doc → one chunk covering everything; empty doc → none
    assert(ch.count(_._1.startsWith("2/")) == 1 &&
      ch.find(_._1.startsWith("2/")).get._3 == 5)
    assert(!ch.exists(_._1.startsWith("3/")))
    // a doc whose last stride window would be fully contained emits no
    // contained chunk: 20 tokens at size 20 → exactly one window
    val one = Ingest.chunkWithOverlap(
      Seq((9L, (1 to 20).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 20, strideTokens = 15)
    assert(one.count() == 1)
  }

  test("termPostings aggregates tf per (term, doc)") {
    val tp = Ingest.termPostings(Seq((1L, "a b a")).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tp == Map("a" -> 2L, "b" -> 1L))
  }

  test("chunkWithOverlap with stride == size degenerates to splitParagraphs") {
    val a = Ingest.chunkWithOverlap(docs, "doc_id", "text",
        chunkTokens = 20, strideTokens = 20)
      .select("chunk_id", "n_tokens", "c_text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val b = Ingest.splitParagraphs(docs, "doc_id", "text", parTokens = 20)
      .select("paragraph_id", "n_tokens", "p_text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(a == b, s"zero-overlap chunking must equal the paragraph split: $a vs $b")
  }

  test("relationIndex collapses duplicate triplets; both sorted copies hold the same rows") {
    val out = Files.createTempDirectory("graft-relidx").toString
    val edges = Seq(
      ("S1", "SUPPLIES", "P1"), ("S1", "SUPPLIES", "P1"), // dup collapses
      ("S1", "SUPPLIES", "P2"), ("S2", "SELLS", "P1"))
      .toDF("s", "r", "d")
    Ingest.relationIndex(edges, "s", "r", "d", out)
    def rows(sub: String) = spark.read.parquet(s"$out/$sub")
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getLong(3)))
      .toSet
    // the collapsed duplicate keeps its multiplicity as the weight n
    val want = Set(("S1", "SUPPLIES", "P1", 2L), ("S1", "SUPPLIES", "P2", 1L),
      ("S2", "SELLS", "P1", 1L))
    assert(rows("edges") == want)
    assert(rows("edges_by_dst") == want)
  }

  test("relationIndex keeps sorted distinct facet unions; facetFilter serves at rest") {
    import graft.api.GraphSearch
    import graft.api.GraphSearch.{EdgeTable, NodeMatch, PathQuery}
    val out = Files.createTempDirectory("graft-relfac").toString
    val edges = Seq(
      ("S1", "SUPPLIES", "P1", Seq("/g")),        // generated occurrence
      ("S1", "SUPPLIES", "P1", Seq.empty[String]), // plus a human one
      ("S2", "SELLS", "P1", Seq.empty[String]))
      .toDF("s", "r", "d", "f")
    Ingest.relationIndex(edges, "s", "r", "d", out, facetsCol = Some("f"))
    val atRest = spark.read.parquet(s"$out/edges")
    val fac = atRest.collect()
      .map(x => (x.getString(0), x.getSeq[String](4))).toMap
    assert(fac("S1") == Seq("/g") && fac("S2") == Seq.empty)
    // excluding /g drops the generated-provenance edge at rest
    val t = EdgeTable(atRest, "src", "rel", "dst", facetsCol = Some("facets"))
    val kept = GraphSearch.search(
        t.copy(edges = atRest.where(GraphSearch.facetFilter(t, Nil, Seq("/g")))),
        PathQuery.Path(dst = NodeMatch.Exact("P1")), topK = 10)
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("S2"))
  }

  test("trainset export writes hive-partitioned parquet; compact resizes files") {
    val out = Files.createTempDirectory("graft-train").toString
    Ingest.exportTrainset(
      docs.withColumn("task", lit("field_classification")), out, "task")
    val back = spark.read.parquet(out)
    assert(back.count() == 3 && back.columns.contains("task"))

    val compacted = Files.createTempDirectory("graft-compact").toString
    Ingest.compact(spark, out, compacted, numFiles = 1)
    assert(spark.read.parquet(compacted).count() == 3)
    val files = new java.io.File(compacted).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
  }

  test("tfidfVectors emits deterministic L2-normalized float embeddings") {
    val emb = Ingest.tfidfVectors(docs.where(col("doc_id") < 3), "doc_id", "text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(emb.values.forall(_.length == 16))
    val norm = math.sqrt(emb(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    val again = Ingest.tfidfVectors(docs.where(col("doc_id") < 3), "doc_id", "text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(emb(1L) == again(1L))
  }

  test("snapshot export/import round-trips with schema and count validation") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val labels = Seq((1L, Seq("/l/a")), (2L, Seq("/l/b"))).toDF("doc_id", "labels")
    Ingest.exportSnapshot(Map("docs" -> docs, "labels" -> labels), dir)
    val loaded = Ingest.importSnapshot(spark, dir)
    assert(loaded.keySet == Set("docs", "labels"))
    assert(loaded("docs").count() == 2)
    assert(loaded("docs").schema.map(f => (f.name, f.dataType)) ==
      docs.schema.map(f => (f.name, f.dataType)))
    // a truncated snapshot must refuse to import
    val docsDir = new java.io.File(s"$dir/docs")
    docs.limit(1).write.mode("overwrite").parquet(docsDir.toString)
    intercept[IllegalArgumentException](Ingest.importSnapshot(spark, dir))
  }

  test("record-stream export/import: ordered typed stream round-trips and refuses tampering") {
    val dir = Files.createTempDirectory("graft-stream").toString + "/snap"
    val docs = Seq((1L, "alpha text", Seq(0.5f, 1.0f)), (2L, "beta text", Seq(0.25f, 0.0f)))
      .toDF("doc_id", "text", "vec")
    val edges = Seq(("a", "b", "rel"), ("b", "c", "rel")).toDF("src", "dst", "kind")
    Ingest.exportStream(Map("docs" -> (docs, "doc_id"), "edges" -> (edges, "src")), dir)

    // the stream itself is one dataset with the envelope schema
    val stream = spark.read.parquet(s"$dir/stream")
    assert(stream.columns.toSeq == Seq("record_type", "key", "payload"))

    val loaded = Ingest.importStream(spark, dir)
    assert(loaded.keySet == Set("docs", "edges"))
    // value-level round trip, both directions
    assert(loaded("docs").exceptAll(docs).count() == 0)
    assert(docs.exceptAll(loaded("docs")).count() == 0)
    assert(loaded("edges").exceptAll(edges).count() == 0)

    // an empty table round-trips as rows:0 instead of crashing export
    val dir2 = Files.createTempDirectory("graft-stream").toString + "/snap2"
    Ingest.exportStream(
      Map("docs" -> (docs, "doc_id"), "none" -> (docs.limit(0), "doc_id")), dir2)
    val loaded2 = Ingest.importStream(spark, dir2)
    assert(loaded2("none").count() == 0 && loaded2("docs").count() == 2)

    // injected record types not in the manifest must refuse to import
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row("evil", "1", "{}"))),
        stream.schema)
      .write.mode("append").parquet(s"$dir2/stream")
    intercept[IllegalArgumentException](Ingest.importStream(spark, dir2))

    // a tampered stream (dropped record) must refuse to import
    stream.where(!(col("record_type") === "docs" && col("key") === "2"))
      .write.mode("overwrite").parquet(s"$dir/stream2")
    val f1 = new java.io.File(s"$dir/stream"); val f2 = new java.io.File(s"$dir/stream2")
    f1.listFiles().foreach(_.delete()); f1.delete(); f2.renameTo(f1)
    intercept[IllegalArgumentException](Ingest.importStream(spark, dir))
  }

  test("buildIndex → search round trip: postings BM25 and self-vector search work off the built tables") {
    val corpus = Seq(
      (1L, "spark is a fast engine for spark jobs"),
      (2L, "query planners rewrite query trees"),
      (3L, "storage formats and table scans")).toDF("doc_id", "text")
    val out = Files.createTempDirectory("graft-index").toString + "/idx"
    Ingest.buildIndex(corpus, "doc_id", "text", out, embeddingDim = 16)

    // keyword search over the built postings (production BM25 path)
    val postings = spark.read.parquet(s"$out/postings")
    val dl = spark.read.parquet(s"$out/doclengths")
    val kw = graft.functions.Bm25
      .scoreFromPostings(postings, dl, "doc_id", Seq("spark"))
      .collect().map(_.getLong(0))
    assert(kw.sameElements(Array(1L)))

    // vector search over the built tf-idf vectors: each doc's own
    // vector must be its top-1 neighbor
    val vecs = spark.read.parquet(s"$out/vectors")
    val q = vecs.where(col("doc_id") === 2).select("embedding")
    val top = graft.operators.VectorSearch
      .bruteForceTopK(vecs, "doc_id", "embedding", q, "embedding", k = 1)
      .collect().head
    assert(top.getLong(0) == 2L && top.getDouble(1) == 1.0)

    // paragraph table carries reference-format ids
    val pids = spark.read.parquet(s"$out/paragraphs")
      .select("paragraph_id").as[String].collect()
    assert(pids.forall(_.matches("\\d+/t/body/\\d+-\\d+")))

    // bigram LM pair: the at-rest serving form (tf-weighted over the
    // built posting/dictionary tables) must equal the tokenizing
    // one-pass form on every doc
    val bgAtRest = graft.operators.CorpusStats.bigramLogProbFromPostings(
        spark.read.parquet(s"$out/bigrams"),
        spark.read.parquet(s"$out/bigramfreq"),
        spark.read.parquet(s"$out/termfreq"), lambda = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val bgTok = graft.operators.CorpusStats
      .bigramLogProb(corpus, "doc_id", "text", lambda = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(bgAtRest == bgTok,
      s"at-rest bigram scoring must equal the one-pass form: $bgAtRest vs $bgTok")

    // the PAR deletion neighborhood is written, binds through
    // tablesAt, and the deletes-routed fallback expansion serves the
    // same paragraphs as the fixture-less scan path (round 15):
    // "sparkk" falls back to "spark" through the variant lookup
    val ix = graft.sources.IndexStore.tablesAt(spark, out)
    assert(ix.parDeletes.nonEmpty, "buildIndex must write par_deletes")
    import graft.api.Find
    val viaIndex = Find.findParagraphs(
        Find.Corpus(corpus, "doc_id", "text", index = Some(ix)),
        Find.FindRequest(query = "sparkk", topK = 5))
      .select("doc_id", "best_score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val inline = Find.findParagraphs(
        Find.Corpus(corpus, "doc_id", "text"),
        Find.FindRequest(query = "sparkk", topK = 5))
      .select("doc_id", "best_score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(viaIndex == inline && viaIndex.map(_._1) == Set(1L),
      s"deletes-routed fallback diverged: $viaIndex vs $inline")
  }

  test("predict reranker rescales the fused window by model score") {
    val fused = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "fscore")
    val corpus = Seq((1L, "nothing relevant here"), (2L, "spark query spark"),
      (3L, "query only")).toDF("id", "text")
    val got = Rerankers.predict(fused, "fscore", "id", corpus, "text",
        Seq("spark", "query"), topK = 3)
      .collect().map(_.getLong(0))
    // doc2 contains both terms → highest overlap; doc1 none → last
    assert(got.sameElements(Array(2L, 3L, 1L)))
  }

  test("batched reranker matches the column scorer exactly") {
    val rnd = new scala.util.Random(5)
    val vocab = Seq("spark", "query", "table", "fast", "scan", "row", "agg")
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(8)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      .toDF("id", "text")
    val fused = (1L to 60L).map(i => (i, rnd.nextDouble())).toDF("id", "fscore")
    val terms = Seq("spark", "query")
    val columnar = Rerankers.predict(fused, "fscore", "id", corpus, "text",
        terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val batched = Rerankers.predictBatched(fused, "fscore", "id", corpus, "text",
        terms, topK = 10, batchSize = 7)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(batched.sameElements(columnar))
  }
}
