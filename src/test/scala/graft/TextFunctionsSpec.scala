package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("langid case fold is locale-independent (Turkish-I trap)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.expr.CaseFold
    val orig = java.util.Locale.getDefault
    try {
      // under tr_TR, default-locale lowercase maps I -> ı (dotless) —
      // the divergence ADVICE r9 flagged; the shared fold must ignore
      // the JVM default and match Locale.ROOT on every side
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      assert("ISTANBUL".toLowerCase != "ISTANBUL".toLowerCase(java.util.Locale.ROOT),
        "precondition: tr_TR default locale not in effect")
      val s = "QUERY İSTANBUL" // non-ASCII: forces the slow path
      assert(CaseFold.lowerRoot(UTF8String.fromString(s)).toString ==
        s.toLowerCase(java.util.Locale.ROOT))
      // the codegen'd trigram path folds identically
      val tris = Seq(s).toDF("text")
        .select(charTrigrams(col("text"))).as[Seq[String]].head()
      assert(tris == s.toLowerCase(java.util.Locale.ROOT).sliding(3).toSeq)
    } finally java.util.Locale.setDefault(orig)
  }

  test("redactPii masks emails and IPv4s; counts audit them") {
    val df = Seq("mail a.user+tag@sub.example.org or 192.168.0.1 and bob@x.io done")
      .toDF("text")
    val clean = df.select(redactPii(col("text"))).as[String].head()
    assert(clean == "mail <EMAIL> or <IP> and <EMAIL> done", clean)
    val (e, i) = piiCounts(col("text"))
    val counts = df.select(e.cast("long"), i.cast("long")).as[(Long, Long)].head()
    assert(counts == (2L, 1L))
    // version-like dotted runs with an alpha neighbor don't match the
    // bounded IPv4 pattern's word edges
    val v = Seq("spark v4.1.2.9beta").toDF("text")
      .select(redactPii(col("text"))).as[String].head()
    assert(v == "spark v4.1.2.9beta", v)
    // an IP-shaped email local part is ONE redaction (email wins) and
    // the audit counts must agree with what redactPii actually did
    val overlap = Seq("from 1.2.3.4@x.io ok").toDF("text")
    val (oe, oi) = piiCounts(col("text"))
    assert(overlap.select(redactPii(col("text"))).as[String].head() ==
      "from <EMAIL> ok")
    assert(overlap.select(oe.cast("long"), oi.cast("long"))
      .as[(Long, Long)].head() == (1L, 0L))
  }

  test("tokens lowercases, splits on non-alnum, drops empties") {
    val out = Seq("The quick, brown FOX!  ").toDF("text")
      .select(tokens(col("text"))).as[Seq[String]].head()
    assert(out == Seq("the", "quick", "brown", "fox"))
  }

  test("shingles produce n-grams; short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(shingles(tokens(col("text")), 3)).as[Seq[String]].collect()
    assert(df(0) == Seq("a b c", "b c d"))
    assert(df(1).isEmpty)
  }

  test("normalize collapses whitespace and lowercases") {
    val out = Seq("  Foo   BAR\tbaz ").toDF("t")
      .select(normalize(col("t"))).as[String].head()
    assert(out == "foo bar baz")
  }

  test("highlight wraps terms in <mark>") {
    val out = Seq("spark runs a query fast").toDF("t")
      .select(highlight(col("t"), Seq("spark", "query"))).as[String].head()
    assert(out == "<mark>spark</mark> runs a <mark>query</mark> fast")
  }

  test("highlightWithPhrases merges adjacent phrase tokens into one span") {
    val df = Seq("spark query runs; a spark engine, one query, spark,query done")
      .toDF("t")
    val out = df.select(highlightWithPhrases(col("t"),
      Seq(Seq("spark", "query")), Seq("spark", "query"))).as[String].head()
    assert(out == "<mark>spark query</mark> runs; a <mark>spark</mark> engine, " +
      "one <mark>query</mark>, <mark>spark,query</mark> done")
    // adjacent occurrences each merge; non-adjacent tokens stay separate
    val two = Seq("spark query spark query").toDF("t")
      .select(highlightWithPhrases(col("t"),
        Seq(Seq("spark", "query")), Nil)).as[String].head()
    assert(two == "<mark>spark query</mark> <mark>spark query</mark>")
  }

  test("highlight is case-insensitive like retrieval; regex metachars in terms degrade, never crash") {
    // retrieval tokenizes through lower(), so a doc found for "prince"
    // must mark "Prince" — the marking keeps the original case
    val cased = Seq("The Little Prince visits planets").toDF("t")
      .select(highlight(col("t"), Seq("little", "prince"))).as[String].head()
    assert(cased == "The <mark>Little</mark> <mark>Prince</mark> visits planets")
    // a synonym-expanded term like "c++" cannot sit on \b anchors —
    // it marks nothing, but the request must not die on a
    // PatternSyntaxException (dangling '+')
    val meta = Seq("c++ and c here").toDF("t")
      .select(highlight(col("t"), Seq("c++", "here"))).as[String].head()
    assert(meta == "c++ and c <mark>here</mark>", meta)
    // an intervening CAPITALIZED word is another token — never merged
    // into a phrase span (the separator class excludes both cases)
    val noMerge = Seq("spark THE query").toDF("t")
      .select(highlightWithPhrases(col("t"),
        Seq(Seq("spark", "query")), Nil)).as[String].head()
    assert(noMerge == "<mark>spark</mark> THE <mark>query</mark>", noMerge)
    // case-blind phrase merge: marked spans keep their case and still
    // fuse into one span
    val casedPhrase = Seq("Spark Query done").toDF("t")
      .select(highlightWithPhrases(col("t"),
        Seq(Seq("spark", "query")), Nil)).as[String].head()
    assert(casedPhrase == "<mark>Spark Query</mark> done", casedPhrase)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq("Hello  World", "hello world", "hello worlds").toDF("t")
      .select(fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("gopher full-rule signals: hand-computed ratios and the keep verdict") {
    val page = Seq(
      // 9 words (the `-` counts as a non-alpha word), 1 of 2 lines
      // bulleted, stop words {the, of} → keep
      "the best of both worlds\n- a bullet line",
      // symbol-heavy: 8 '#' of 10 words → symbol 0.8, alpha 0.2 → drop
      "the of\n# # # # # # # #",
      // both lines end with an ellipsis → ellipsis_frac 1.0 → drop
      "the story of it all...\ncontinues forever...",
      // only one distinct stop word → drop
      "the quick brown fox\nthe fox again")
      .toDF("t")
    val sig = gopherRuleSignals(col("t"))
    val got = page.select(sig.getField("hash_ratio"),
        sig.getField("ellipsis_ratio"),
        sig.getField("alpha_frac"), sig.getField("bullet_frac"),
        sig.getField("ellipsis_frac"), sig.getField("n_stop"),
        gopherRulesKeep(sig))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getBoolean(6)))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((0.0, 0.0, r4(8.0 / 9), 0.5, 0.0, 2L, true)), got(0).toString)
    assert(got(1) == ((0.8, 0.0, 0.2, 0.0, 0.0, 2L, false)), got(1).toString)
    assert(got(2) == ((0.0, r4(2.0 / 7), 1.0, 0.0, 1.0, 2L, false)), got(2).toString)
    assert(got(3)._6 == 1L && !got(3)._7, got(3).toString)
    // word-less text: ratios report 0.0 (never NaN), verdict false
    val empty = Seq("\n\n").toDF("t")
      .select(gopherRuleSignals(col("t")).as("s"))
      .select(col("s.hash_ratio"), col("s.alpha_frac"), col("s.n_stop"))
      .collect().head
    assert(empty.getDouble(0) == 0.0 && empty.getDouble(1) == 0.0 &&
      empty.getLong(2) == 0L, empty.toString)
  }

  test("c4 line rules keep terminal-punctuated ≥3-word lines; page rules drop wholesale") {
    val page = Seq(Seq(
      "A good long sentence here.",   // kept
      "short one.",                   // 2 words → dropped
      "Please enable javascript now.", // javascript → dropped
      "Ends with a bang!",            // kept
      "no terminal punctuation here", // dropped
      "  padded but fine?  "          // trim then kept
    ).mkString("\n")).toDF("t")
    val kept = page.select(c4KeptLines(col("t"))).as[Seq[String]].head()
    assert(kept == Seq("A good long sentence here.", "Ends with a bang!",
      "  padded but fine?  "))
    val drops = Seq("fine text here.", "has lorem ipsum inside.",
      "code { return 1; }").toDF("t")
      .select(c4DocDrop(col("t"))).as[Boolean].collect()
    assert(drops.sameElements(Array(false, true, true)))
  }

  test("foldAccents folds latin accents for entity matching") {
    val out = Seq("Café MÜLLER in Ångström's Grüße").toDF("t")
      .select(foldAccents(col("t"))).as[String].head()
    assert(out == "cafe muller in angstrom's gruse") // ß folds to single s (translate is 1:1)
  }

  test("per-language stopword removal") {
    val toks = Seq(Seq("der", "schnelle", "fuchs", "und", "der", "hund")).toDF("t")
    val out = toks.select(removeStopwords(col("t"), "de")).as[Seq[String]].head()
    assert(out == Seq("schnelle", "fuchs", "hund"))
    // unknown language falls back to en
    val en = toks.select(removeStopwords(col("t"), "xx")).as[Seq[String]].head()
    assert(en.contains("der") && en.contains("und"))
  }

  test("language-aware query parse drops that language's stop words") {
    val p = graft.api.QueryParser.parse("el motor de busqueda es rapido", "es")
    assert(p.terms == Seq("motor", "busqueda", "rapido"))
  }

  test("multilingual tokens add CJK char-unigrams; latin text unchanged") {
    val rows = Seq(
      ("mixed", "Spark 处理数据 fast"),
      ("kana", "データベース"),
      ("hangul", "데이터 engine"),
      ("latin", "plain latin text 42")).toDF("id", "text")
    val toks = rows.select(col("id"), tokensMultilingual(col("text")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(toks("mixed") == Seq("spark", "fast", "处", "理", "数", "据"))
    // chōonpu 'ー' is script=Common, not Katakana — correctly dropped
    assert(toks("kana") == Seq("デ", "タ", "ベ", "ス"))
    assert(toks("hangul").contains("데") && toks("hangul").contains("engine"))
    // latin-only input identical to the plain tokenizer
    val plain = rows.where(col("id") === "latin")
      .select(tokens(col("text"))).collect().head.getSeq[String](0)
    assert(toks("latin") == plain)
  }

  test("hashSample is a pure function of the id: stable and append-invariant") {
    import graft.sources.Trainsets
    val a = (1L to 200L).map(i => (i, s"doc$i")).toDF("id", "text")
    val sampleA = Trainsets.hashSample(a, "id", Seq("0", "1"))
      .select("id").collect().map(_.getLong(0)).toSet
    // same rows sampled after appending new data (membership never flips)
    val b = (1L to 400L).map(i => (i, s"doc$i")).toDF("id", "text")
    val sampleB = Trainsets.hashSample(b, "id", Seq("0", "1"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sampleA.nonEmpty && sampleA.subsetOf(sampleB))
    assert((sampleB -- sampleA).forall(_ > 200L))
    // ~2/16 of ids expected; loose bounds
    assert(sampleA.size > 200 * 2 / 16 / 2 && sampleA.size < 200 * 2 / 16 * 2)
  }

  test("meanTokenLen computes the average token length") {
    val df = Seq(("a", "ab abcd")).toDF("id", "text")
    val got = df.select(meanTokenLen(tokens(col("text")))).collect().head.getDouble(0)
    assert(math.abs(got - 3.0) < 1e-9)
  }

  test("quality score favors diverse non-stopword text") {
    val rows = Seq(
      ("diverse", "alpha beta gamma delta epsilon zeta"),
      ("repetitive", "alpha alpha alpha alpha alpha alpha"),
      ("stopwordy", "the a an and or of the a an and")).toDF("id", "text")
    val scored = rows.select(col("id"),
        qualityScore(tokens(col("text"))).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scored("diverse") > scored("repetitive"))
    assert(scored("diverse") > scored("stopwordy"))
  }

  test("dedupLines keeps first occurrences and blank lines, drops later duplicates, null-safe") {
    val rows = Seq(
      ("a", "keep me\ndup\n\ndup\n  dup  \nother\n\nkeep me"),
      ("b", ""),
      ("c", null))
      .toDF("id", "text")
    val got = rows.select(col("id"),
        graft.functions.TextFunctions.dedupLines(col("text")).as("t"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // trimmed-identical lines collapse to the FIRST (original text
    // kept, so "dup" survives, "  dup  " does not); BOTH blank lines
    // survive in place; order preserved → kept =
    // [keep me, dup, "", other, ""]
    assert(got("a").contains("keep me\ndup\n\nother\n"),
      got("a").toString)
    assert(got("b").contains(""))
    assert(got("c").isEmpty)
  }

  test("gopherRepetitionSignals: hand-computed duplicate-line and top-n-gram fractions") {
    // doc 1: 5 non-empty trimmed lines, "dup" twice → 1 duplicate of 5
    // lines (0.2); dup chars 3 of 2·3+5+7+20 = 38. Top 2-gram of the
    // full token stream is "go go" ×3 (len 5) over 42 joined chars.
    val docs = Seq(
      (1L, "dup\n  dup  \nlineo\nlineooo\ngo go go go stop end"),
      (2L, ""), // degenerate: no lines, no tokens → all zeros, kept
      // no repeats, long enough that even a single-occurrence 4-gram
      // stays under the 0.16 char bar (7/51)
      (3L, ('a' to 'z').mkString(" ")))
      .toDF("doc_id", "text")
    val sig = graft.functions.TextFunctions
      .gopherRepetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(6))).toMap
    val (dlf, dlcf, top2, keep1) = sig(1L)
    assert(dlf == 0.2, s"5 lines, 1 dup occurrence: $dlf") // 1/5 lines
    // dup chars 3 / total line chars 3+3+5+7+20... line 5 = the go-line
    // (20 chars): 3 / 38
    assert(math.abs(dlcf - math.rint(3.0 / 38 * 10000) / 10000) < 1e-9, dlcf.toString)
    // joined tokens of the whole text: "dup dup lineo lineooo go go go
    // go stop end" = 42 chars; "go go" ×3 × 5 chars = 15/42
    assert(math.abs(top2 - math.rint(15.0 / 42 * 10000) / 10000) < 1e-9, top2.toString)
    assert(!keep1, "75% top-2-gram coverage must fail the 0.20 bar")
    assert(sig(2L) == ((0.0, 0.0, 0.0, true)), sig(2L).toString)
    val (d3, dc3, _, keep3) = sig(3L)
    assert(d3 == 0.0 && dc3 == 0.0 && keep3)
  }
}
