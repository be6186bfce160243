package graft

import org.apache.spark.sql.functions._

import graft.sources.Trainsets

/** Trainset-shaping operators: deterministic sampling/balancing and
  * eval-set decontamination (the cuts a reproducible training-data
  * pipeline applies between dedup and export).
  */
class TrainsetsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1 to 200).map(i =>
    (i.toLong, if (i % 4 == 0) "minor" else "major"))
  private lazy val df = rows.toDF("id", "key")

  test("sentenceClassification splits on terminal punctuation and inherits labels") {
    val docs = Seq(
      (1L, "First sentence. Second one! A third? ", "en"),
      (2L, "no punctuation at all", "fr"),
      (3L, "", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Trainsets.sentenceClassification(docs, "doc_id", "text", "lang")
      .orderBy("sentence_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("1/s0", "First sentence", "en"),
      ("1/s1", "Second one", "en"),
      ("1/s2", "A third", "en"),
      ("2/s0", "no punctuation at all", "fr")))
  }

  test("questionAnswerWithContext pairs consecutive paragraphs with bounded preceding context") {
    val pars = Seq(
      (1L, "1/t/body/0-2", 0, "p one"),
      (1L, "1/t/body/2-4", 2, "p two"),
      (1L, "1/t/body/4-6", 4, "p three"),
      (1L, "1/t/body/6-8", 6, "p four"),
      (2L, "2/t/body/0-2", 0, "solo")) // single paragraph → no pair
      .toDF("doc_id", "paragraph_id", "start", "p_text")
    val got = Trainsets.questionAnswerWithContext(pars, "doc_id", contextSize = 2)
      .orderBy("question_id")
      .collect().map(r => (r.getString(2), r.getString(3), r.getSeq[String](4)))
    assert(got.toSeq == Seq(
      ("p one", "p two", Seq()),
      ("p two", "p three", Seq("p one")),
      ("p three", "p four", Seq("p one", "p two"))))
  }

  test("trained trigram language profiles classify distinctive text correctly") {
    import graft.functions.TextFunctions
    import graft.sources.Ingest
    // distinctive character statistics per "language"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (2L, "the rain in spain stays mainly in the plain every day", "en"),
      (3L, "zzz zzyzx zzap jazz fizz buzz pizzazz zigzag zodiac zest", "zz"),
      (4L, "zany zebras zigzag through dizzy mazes with zeal and buzz", "zz"))
      .toDF("doc_id", "text", "lang")
    val profiles = Ingest.trainLangProfiles(corpus, "text", "lang", topK = 50)
    val model = profiles.collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> rows.map(r => r.getString(1) -> r.getDouble(2)).toMap }
      .toSeq.sortBy(_._1)
    assert(model.map(_._1) == Seq("en", "zz"))
    val got = Seq("the fox stays in the rain", "fuzzy jazz buzzes zigzag")
      .toDF("text")
      .select(TextFunctions.langIdFromProfiles(col("text"), model))
      .as[String].collect()
    assert(got.toSeq == Seq("en", "zz"))
    // model is deterministic: retraining yields identical rows
    val again = Ingest.trainLangProfiles(corpus, "text", "lang", topK = 50)
      .collect().toSet
    assert(again == profiles.collect().toSet)
    // the join-based corpus-scan form predicts identically to the
    // per-row literal form
    val viaJoin = graft.operators.CorpusStats
      .langIdPredict(corpus, "doc_id", "text", profiles)
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaLiteral = corpus
      .select(col("doc_id"),
        TextFunctions.langIdFromProfiles(col("text"), model).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaJoin == viaLiteral)
  }

  test("balancedSample caps every key and is stable across reruns and partitionings") {
    val s1 = Trainsets.balancedSample(df, "key", "id", 10)
    val counts = s1.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("major" -> 10L, "minor" -> 10L))
    val ids1 = s1.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Trainsets.balancedSample(df.repartition(13), "key", "id", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "membership must not depend on partitioning")
  }

  test("balancedSample keeps whole groups smaller than the cap") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "key")
    assert(Trainsets.balancedSample(tiny, "key", "id", 10).count() == 3)
  }

  test("tokenClassificationNer: BIO tags align with tokens, B beats I on overlap") {
    val pars = Seq(
      ("p1", "fast spark query runs"),   // pair at 0-1, single at 2
      ("p2", "fast spark spark"),        // pair then bare non-entity spark
      ("p3", "slow table"),              // all O
      ("p4", "query fast"))              // single, dangling pair-start token
      .toDF("paragraph_id", "p_text")
    val got = Trainsets.tokenClassificationNer(pars,
        Seq(Seq("query"), Seq("fast", "spark")))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got("p1") == ("fast spark query runs", "B I B O"))
    assert(got("p2") == ("fast spark spark", "B I O"))
    assert(got("p3") == ("slow table", "O O"))
    assert(got("p4") == ("query fast", "B O"), "trailing 'fast' has no next token")
    // overlap: 'fast spark' pair + 'spark' single → the continuation
    // position re-matches as B (B beats I)
    val overlap = Trainsets.tokenClassificationNer(
        Seq(("p5", "fast spark runs")).toDF("paragraph_id", "p_text"),
        Seq(Seq("spark"), Seq("fast", "spark")))
      .collect().head.getString(2)
    assert(overlap == "B B O", overlap)
  }

  test("balancedSampleSkewSafe equals the single-window cut on a skewed fixture; salt spreads phase 1") {
    // one pathologically hot key (50k rows) + small keys — the shape
    // whose single-partition funnel the two-phase form bounds
    val skewed = spark.range(50000).select($"id", lit("hot").as("key"))
      .unionByName(spark.range(50000, 50040).select($"id", lit("cold").as("key")))
      .unionByName(spark.range(50040, 50041).select($"id", lit("one").as("key")))
    val exact = Trainsets.balancedSample(skewed, "key", "id", 15)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val twoPhase = Trainsets.balancedSampleSkewSafe(skewed, "key", "id", 15)
    val got = twoPhase.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == exact, "two-phase cut must be row-identical to the exact window")
    // the executed plan runs TWO windows and the first partitions by
    // (key, salt) — the hot key is spread before any global funnel
    val p = twoPhase.queryExecution.executedPlan.toString
    assert(p.contains("pmod"),
      s"phase-1 window must partition by the id-hash salt:\n$p")
    assert("windowspecdefinition".r.findAllIn(p.toLowerCase).size >= 2,
      s"two windows expected (pre-cap + exact):\n$p")
    // salts=1 degenerates to the exact form (sanity on the salt math)
    val degenerate = Trainsets.balancedSampleSkewSafe(skewed, "key", "id", 15, salts = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(degenerate == exact)
  }

  test("temperatureMixture flattens shares toward the tail, clamps at 1, and is deterministic") {
    // head key 160 rows, tail keys 30/10 — α=0.5 upsamples the tail
    // RELATIVE share while only ever downsampling absolute rows
    val mix = spark.range(160).select($"id", lit("en").as("k"))
      .unionByName(spark.range(160, 190).select($"id", lit("fr").as("k")))
      .unionByName(spark.range(190, 200).select($"id", lit("zh").as("k")))
    val got = Trainsets.temperatureMixture(mix, "k", "id", alpha = 0.5, targetRows = 100)
    val counts = got.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Map("en" -> 160.0, "fr" -> 30.0, "zh" -> 10.0)
    val z = n.values.map(math.sqrt).sum
    // expected take per key = min(n_k, 100·√n_k/z); md5 membership is
    // binomial-ish around it — assert within a generous band
    n.foreach { case (k, nk) =>
      val expect = math.min(nk, 100 * math.sqrt(nk) / z)
      val gotK = counts.getOrElse(k, 0L).toDouble
      assert(math.abs(gotK - expect) <= math.max(6, 0.5 * expect),
        s"key $k: got $gotK, expected ≈$expect")
      assert(gotK <= nk, "downsample-only: never more rows than the key has")
    }
    // flattening: the head key's share of the sample < its corpus share
    val total = counts.values.sum.toDouble
    assert(counts("en") / total < 160.0 / 200.0)
    // α=1 with target ≥ corpus keeps everything (rates clamp at 1)
    assert(Trainsets.temperatureMixture(mix, "k", "id", 1.0, 10000).count() == 200)
    // determinism + partitioning invariance: same membership set
    val a = got.select("id").collect().map(_.getLong(0)).toSet
    val b = Trainsets.temperatureMixture(mix.repartition(7), "k", "id", 0.5, 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "membership must be a pure function of the id")
    // composition with hashSplit stays independent (the "#mix" salt):
    // an UNsalted membership hash would put every surviving row of a
    // rate ≤ 0.75 key below hex 'c' — i.e. all-train, empty val/test
    val split = Trainsets.hashSplit(got, "id",
      Seq("train" -> 12, "val" -> 2, "test" -> 2))
    assert(split.where(col("split") =!= "train").count() > 0,
      "mixture membership must not starve the val/test splits")
  }

  test("packSequences: concat-and-chunk invariants hold and assignment is partition-invariant") {
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("word").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Trainsets.packSequences(docs, "doc_id", "text",
      budget = 5, binHexWidth = 1)
    val rows = packed.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 40, "packing keeps every document")
    // replay each bin's stream: seq/tok_offset must equal the running
    // concat-and-chunk assignment in id order
    rows.groupBy(_._2).foreach { case (bin, rs) =>
      var before = 0L
      rs.sortBy(_._1).foreach { case (id, _, nTok, seq, off) =>
        assert(nTok == id % 7 + 1, s"doc $id token count")
        assert(seq == before / 5, s"doc $id in bin $bin: seq")
        assert(off == before % 5, s"doc $id in bin $bin: offset")
        before += nTok
      }
    }
    // pure function of (id set, budget): partitioning must not matter
    val again = Trainsets.packSequences(docs.repartition(7), "doc_id",
        "text", budget = 5, binHexWidth = 1)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("unigramLogProbFromPostings equals the tokenizing form on every doc") {
    import graft.operators.CorpusStats
    import graft.sources.Ingest
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta delta"),
      (3L, "gamma"),
      (4L, ""), // token-less doc drops out of both forms
      (5L, "alpha delta delta epsilon zeta zeta zeta"))
      .toDF("doc_id", "text")
    val postings = Ingest.termPostings(docs, "doc_id", "text")
    val termFreq = postings.groupBy("term")
      .agg(sum("tf").cast("long").as("freq"))
    val atRest = CorpusStats.unigramLogProbFromPostings(postings, termFreq)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val tokenized = CorpusStats.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(atRest == tokenized,
      s"tf-weighted at-rest form must equal the per-occurrence form: $atRest vs $tokenized")
    assert(!atRest.contains(4L), "token-less docs drop from both forms")
  }

  test("bigramLogProb matches the hand-computed interpolated score") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (1L, "a b a b"), // bigrams: (a,b) ×2, (b,a)
      (2L, "a a"),     // bigram: (a,a)
      (3L, "x"))       // no bigram — drops out
      .toDF("doc_id", "text")
    val byId = CorpusStats.bigramLogProb(docs, "doc_id", "text", lambda = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // corpus: a=4, b=2, x=1, N=7; bigrams: "a b"=2, "b a"=1, "a a"=1
    def s(c12: Double, c1: Double, c2: Double) =
      math.log(0.5 * c12 / c1 + 0.5 * c2 / 7.0)
    val d1 = (2 * s(2, 4, 2) + s(1, 2, 4)) / 3.0
    val d2 = s(1, 4, 4)
    assert(byId.keySet == Set(1L, 2L), "doc 3 has no bigrams")
    assert(byId(1L) == (BigDecimal(d1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 3L))
    assert(byId(2L) == (BigDecimal(d2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 1L))
  }

  test("classLikeness: add-one NB log-odds ranks target-vocabulary docs first") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (1L, "a a b", "t"),
      (2L, "b c", "r"),
      (3L, "a c", "r"))
      .toDF("doc_id", "text", "source")
    val got = CorpusStats.classLikeness(docs, "doc_id", "text", "source", "t")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // ct: a=2 b=1 c=0, cr: a=1 b=1 c=2, tt=3, tr=4, V=3
    def odds(ct: Double, cr: Double) =
      math.log((ct + 1) / 6.0) - math.log((cr + 1) / 7.0)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ("t", r4((2 * odds(2, 1) + odds(1, 1)) / 3.0)))
    assert(got(2L) == ("r", r4((odds(1, 1) + odds(0, 2)) / 2.0)))
    assert(got(3L) == ("r", r4((odds(2, 1) + odds(0, 2)) / 2.0)))
    // the target-class doc must out-score the rest
    assert(got(1L)._2 > got(2L)._2 && got(1L)._2 > got(3L)._2)
  }

  test("tfidfKeywords: rare frequent terms win, stopwords excluded, k bounds per doc") {
    import graft.operators.CorpusStats
    import graft.sources.Ingest
    val docs = Seq(
      (1L, "the zebra zebra zebra common"), // zebra: tf 3, df 1
      (2L, "the common words common here"),
      (3L, "the common zoo"))
      .toDF("doc_id", "text")
    val got = CorpusStats.tfidfKeywords(
        Ingest.termPostings(docs, "doc_id", "text"), "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> (r.getString(1), r.getDouble(2)))
      .toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def idf(df: Double) = math.log(4.0 / (df + 1)) // N=3 docs
    // doc 1: zebra 3·idf(1) beats common 1·idf(3); "the" (stopword) absent
    assert(got((1L, 1L)) == ("zebra", r4(3 * idf(1))))
    assert(got((1L, 2L)) == ("common", r4(1 * idf(3))))
    // doc 2: words/here tie at 1·idf(1)=ln2 → term-asc ranks "here"
    // first; common (2·idf(3)=0) falls off at k=2
    assert(got((2L, 1L)) == ("here", r4(idf(1))))
    assert(got((2L, 2L)) == ("words", r4(idf(1))))
    // k bounds every doc at 2 rows
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)) && !got.contains((3L, 3L)))
  }

  test("vocabularyDrift ranks the shifted terms with correct signs") {
    import graft.operators.CorpusStats
    val a = Seq((1L, "alpha alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    // B drops one alpha and gains two deltas → alpha shifts down,
    // delta appears from nothing
    val b = Seq((1L, "alpha beta delta"), (2L, "beta gamma delta")).toDF("doc_id", "text")
    val got = CorpusStats.vocabularyDrift(a, b, "text", k = 10)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A: alpha 2/5, beta 2/5, gamma 1/5; B: alpha 1/6, beta 2/6, gamma 1/6, delta 2/6
    assert(got("alpha") == ((0.4, r6(1.0 / 6), r6(1.0 / 6 - 0.4))))
    assert(got("delta") == ((0.0, r6(2.0 / 6), r6(2.0 / 6))))
    assert(got("delta")._3 > 0 && got("alpha")._3 < 0)
    // absent-from-B terms would show pb = 0 (full outer join keeps them)
    val gone = CorpusStats.vocabularyDrift(a,
        Seq((1L, "beta")).toDF("doc_id", "text"), "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(gone("alpha") == 0.0 && gone("gamma") == 0.0)
  }

  test("tokenizerFertility counts pre-tokens per whitespace word by language") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (1L, "plain words here", "en"),          // 3 words → 3 pre-tokens
      (2L, "don't stop-me now", "en"),         // 3 words → 7 pre-tokens
      (3L, "abc", "fr"),                        // 1 word → 1 pre-token
      (4L, "", "fr"))                           // 0 words → dropped
      .toDF("doc_id", "text", "lang")
    val got = CorpusStats.tokenizerFertility(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // en: don't → don + 't (2), stop-me → stop + -me... pre-tokens:
    // "don"+"'t"? pattern: ' ?[a-z0-9]+| ?[^a-z0-9\s ]+' over
    // "don't stop-me now" → don, ', t, stop, -, me, now = 7
    assert(got("en") == ((2L, BigDecimal(10.0 / 6).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("fr") == ((1L, 1.0)))
  }

  test("classLikenessFromPostings equals the tokenizing form on every doc") {
    import graft.operators.CorpusStats
    import graft.sources.Ingest
    val docs = Seq(
      (1L, "a a b", "t"),
      (2L, "b c", "r"),
      (3L, "a c c c", "r"),
      (4L, "", "r")) // token-less doc drops from both forms
      .toDF("doc_id", "text", "source")
    val atRest = CorpusStats.classLikenessFromPostings(
        Ingest.termPostings(docs, "doc_id", "text"), docs, "doc_id", "source", "t")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val tokenized = CorpusStats.classLikeness(docs, "doc_id", "text", "source", "t")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(atRest == tokenized,
      s"tf-weighted at-rest form must equal the per-occurrence form: $atRest vs $tokenized")
    assert(!atRest.contains(4L))
  }

  test("domainQualityGate keeps whole domains by mean, drops token-less docs") {
    import graft.operators.CorpusStats
    val docs = Seq(
      // domain "good": diverse non-stopword text → high mean
      (1L, "alpha beta gamma delta", "good"),
      (2L, "epsilon zeta eta theta", "good"),
      // domain "bad": repetitive + stopword-heavy → low mean
      (3L, "the the the the a a", "bad"),
      (4L, "the a the a the a", "bad"),
      (5L, "", "good")) // token-less → no quality evidence, dropped
      .toDF("doc_id", "text", "source")
    val kept = CorpusStats.domainQualityGate(docs, "doc_id", "text", "source",
        minMean = 1.0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet == Set(1L, 2L), s"got $kept")
    assert(kept.values.toSet == Set("good"))
    // the gate is on the DOMAIN mean: a low bar keeps both domains
    val loose = CorpusStats.domainQualityGate(docs, "doc_id", "text", "source",
        minMean = -10.0)
      .collect().map(_.getLong(0)).toSet
    assert(loose == Set(1L, 2L, 3L, 4L))
  }

  test("contaminationScores: eval docs score 1.0, disjoint docs 0.0, partial in between") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta nothing shared here at all"),
      (3L, "utterly unrelated words compose this document body"))
      .toDF("doc_id", "text")
    val scores = Trainsets.contaminationScores(
        docs, "doc_id", "text", docs.where(col("doc_id") === 1), n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) == 1.0)
    assert(scores(3L) == 0.0)
    assert(scores(2L) > 0.0 && scores(2L) < 1.0,
      s"doc 2 shares a prefix but not the tail: ${scores(2L)}")
  }

  test("perplexityBuckets: exact tertiles per language; approx boundary form agrees on real data") {
    import graft.operators.CorpusStats
    val scored = Seq(
      // en: 7 docs, scores 7..1 → head {7,6,5} middle {4,3} tail {2,1}
      (1L, "en", 7.0), (2L, "en", 6.0), (3L, "en", 5.0), (4L, "en", 4.0),
      (5L, "en", 3.0), (6L, "en", 2.0), (7L, "en", 1.0),
      // de: 2 docs → ntile gives head {20}, middle {10}, no tail
      (8L, "de", 20.0), (9L, "de", 10.0))
      .toDF("doc_id", "lang", "score")
    val exact = CorpusStats.perplexityBuckets(scored, "doc_id", "lang", "score")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(Seq(1L, 2L, 3L).forall(exact(_) == "head"), exact.toString)
    assert(Seq(4L, 5L).forall(exact(_) == "middle"))
    assert(Seq(6L, 7L).forall(exact(_) == "tail"))
    assert(exact(8L) == "head" && exact(9L) == "middle")
    // the 100 TB boundary form: agreement measured on the real corpus
    // scores (the whole point of approx boundaries is avoiding the
    // per-language sort, at the cost of boundary-adjacent flips)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        (col("n_chars") % 97).cast("double").as("score"))
    val e = CorpusStats.perplexityBuckets(docs, "doc_id", "lang", "score")
      .select("doc_id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = CorpusStats.perplexityBucketsApprox(docs, "doc_id", "lang", "score")
      .select("doc_id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val agree = e.keys.count(k => e(k) == a(k)).toDouble / e.size
    info(f"approx-vs-exact bucket agreement on sf0.001: $agree%.3f")
    assert(agree >= 0.9, f"approx boundaries diverged too far: $agree%.3f")
  }

  test("imageClassification is the reference's faithfully-empty stream, response-shaped") {
    // the reference generator is dead code (image_classifier.py:43-53:
    // "no longer supported... page selection annotations were removed
    // from the API", an unconditional empty yield) — parity is the
    // SHAPE, not an image pipeline
    val df = Trainsets.imageClassification(spark)
    assert(df.collect().isEmpty)
    assert(df.columns.toSeq == Seq("selections", "page_uri"))
  }
}
