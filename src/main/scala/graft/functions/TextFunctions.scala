package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/tokenization scalar surface of the engine.
  *
  * The reference keeps its scalar functions in tokenizer/normalizer code
  * rather than a SQL function library (see
  * `nidx/nidx_paragraph/src/query_parser/tokenizer.rs`,
  * `nidx_relation/src/schema.rs:123-137` normalize/normalize_words).
  * Here every function is a composition of codegen'd Spark built-ins —
  * no UDFs — so the whole text pipeline stays inside WholeStageCodegen
  * and pushes down through Catalyst.
  */
object TextFunctions {

  /** Tokenizer regex: split on any non-alphanumeric run. Mirrors the
    * reference's lowercase+split tokenizer
    * (`nidx_paragraph/src/query_parser/tokenizer.rs`).
    */
  val TokenPattern = "[^a-z0-9]+"

  /** English stop words — analog of
    * `nidx_paragraph/src/query_parser/stop_words.rs` (trimmed list; the
    * engine only needs determinism, not linguistic completeness).
    */
  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be")

  /** lower + split + drop empties. Pure built-ins → codegen friendly. */
  def tokens(text: Column): Column =
    filter(split(lower(text), TokenPattern), t => t =!= "")

  /** Mean token length — a Gopher-style document-quality signal
    * (symbol-heavy or fragmentary text falls outside the natural-
    * language band). Pure built-ins, codegen'd.
    */
  def meanTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
      .cast("double") / size(toks)

  /** Multilingual tokenization: the latin/digit word tokens of
    * [[tokens]] PLUS character unigrams for unsegmented CJK scripts
    * (Han, Hiragana, Katakana, Hangul) — the tantivy-style fallback the
    * reference relies on for languages without whitespace word
    * boundaries. Pure built-ins (`regexp_extract_all`), codegen
    * friendly; latin-only text is unchanged, so existing tokenization
    * oracles keep their semantics.
    */
  def tokensMultilingual(text: Column): Column =
    concat(tokens(text),
      regexp_extract_all(text,
        lit("[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]"), lit(0)))

  /** Unicode-ish normalization for graph node matching
    * (`nidx_relation/src/schema.rs:123-137`): lowercase + collapse
    * whitespace. Accent-sensitive; compose with [[foldAccents]] for the
    * reference's accent-folding node matching.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  private val AccentFrom = "àáâãäåāæçćčèéêëēėęìíîïīįñńòóôõöøōœšùúûüūýÿžß"
  private val AccentTo = "aaaaaaaaccceeeeeeeiiiiiinnoooooooosuuuuuyyzs"

  /** Latin accent folding via `translate` (codegen'd, no UDF) —
    * `normalize_words` analog for accented entity names
    * ("José" matches "jose"). Note æ/œ/ß fold to single letters.
    */
  def foldAccents(text: Column): Column =
    translate(lower(text), AccentFrom, AccentTo)

  /** Per-language stop-word sets (reference keeps multi-language lists,
    * `nidx_paragraph/src/query_parser/stop_words.rs`). `en` is
    * [[StopWords]]; unknown languages fall back to en.
    */
  val StopWordsByLang: Map[String, Seq[String]] = Map(
    "en" -> StopWords,
    "es" -> Seq("el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "zu", "in", "ist", "von"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "en", "est", "du"))

  def stopWordsFor(lang: String): Seq[String] =
    StopWordsByLang.getOrElse(lang, StopWords)

  /** Remove a language's stop words from a token array. */
  def removeStopwords(toks: Column, lang: String): Column =
    array_except(toks, lit(stopWordsFor(lang).toArray))

  /** Count of tokens that are stop words. */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(StopWords)))

  /** Word n-gram shingles over a token array (1-based slice).
    * Returns an empty array when the doc is shorter than n.
    * Used by the dedup family (MinHash / Jaccard), see
    * [[graft.operators.Dedup]].
    */
  def shingles(toks: Column, n: Int): Column = {
    // Two evaluation traps avoided here. (1) The naive form —
    // slice(toks, i+1, n) inside a transform lambda — re-evaluates the
    // WHOLE toks expression per element (the token split is inlined by
    // the optimizer → O(len²) per document). (2) Even the arrays_zip
    // form references toks n+3 times per row, re-running the tokenizer
    // regex each time. The single-element-array wrapper is a let
    // binding: `array(toks)` evaluates toks exactly ONCE, and every
    // reference inside the lambda is to the lambda variable (an
    // attribute read, not a recompute). Measured ~2× on the shingle
    // build at bench scale.
    def build(t: Column): Column = {
      val m = size(t) - (n - 1)
      val shifted = (0 until n).map(i => slice(t, lit(i + 1), m).as(s"w$i"))
      when(size(t) >= n,
        transform(arrays_zip(shifted: _*),
          s => concat_ws(" ", (0 until n).map(i => s.getField(s"w$i")): _*)))
        .otherwise(array().cast("array<string>"))
    }
    element_at(transform(array(toks), build(_)), 1)
  }

  /** (w1, w2) decomposition of a "w1 w2" bigram shingle — the ONE
    * definition of the bigram pair contract, shared by the ingest-time
    * bigram tables ([[graft.sources.Ingest.buildIndex]]) and the
    * one-pass scorer ([[graft.operators.CorpusStats.bigramLogProb]])
    * so the two can never drift. Lossless because tokens cannot
    * contain spaces (the tokenizer splits on non-alphanumerics). */
  def bigramPair(bigram: Column): (Column, Column) =
    (substring_index(bigram, " ", 1), substring_index(bigram, " ", -1))

  /** Highlight query terms with <mark>…</mark> — analog of the find
    * endpoint's highlighting (`search/search/paragraphs.py`). Word
    * boundaries anchor the match so a term marks only whole tokens
    * (the reference's ematch is token-level, not substring), and the
    * match is CASE-INSENSITIVE like retrieval itself (the tokenizer
    * lowercases — a doc retrieved for "prince" must mark "Prince").
    * Terms are regex-escaped here: the find endpoint feeds
    * synonym-expanded terms, and a synonym like "c++" must degrade to
    * marking nothing (its \b anchors cannot sit on non-word chars)
    * rather than crash the request with a PatternSyntaxException.
    * Both (?i) and the escapes are RE2-compatible, so the DuckDB
    * oracles compute the identical marking.
    */
  def highlight(text: Column, terms: Seq[String]): Column =
    regexp_replace(text,
      "(?i)\\b(" + terms.map(regexEscape).mkString("|") + ")\\b",
      "<mark>$1</mark>")

  /** RE2-safe escape of regex metacharacters in a literal term. */
  private def regexEscape(t: String): String =
    t.replaceAll("""([\\.\[\]{}()*+?^$|])""", """\\$1""")

  /** Highlight with EXACT-MATCH phrase spans: loose terms (plus the
    * phrase tokens) mark individually first, then each quoted phrase's
    * adjacent marked tokens MERGE into one `<mark>…</mark>` span —
    * `<mark>spark</mark>, <mark>query</mark>` becomes
    * `<mark>spark, query</mark>`. This is the hydration-side threading
    * of the index's exact-match spans (`nodereader.proto:123` ematches;
    * the reference carries paragraph ematch offsets into the rendered
    * text_block). Merge-after-mark keeps every regex RE2-compatible (no
    * lookaround), so the DuckDB oracle computes the identical marking.
    * The separator class excludes '<' so a merge can never swallow a
    * mark tag; phrase tokens separated by another marked token do not
    * merge (they are not a phrase occurrence).
    */
  def highlightWithPhrases(text: Column, phrases: Seq[Seq[String]],
      terms: Seq[String]): Column = {
    val termMarked = highlight(text, (terms ++ phrases.flatten).distinct)
    phrases.filter(_.nonEmpty).foldLeft(termMarked) { (t, p) =>
      // (?i) mirrors the term marking (the marked spans keep the
      // original case, so the merge must match them case-blind); the
      // separator class excludes letters of EITHER case — an
      // intervening capitalized word ("spark THE query") is another
      // token, never part of a phrase occurrence
      val pattern = "(?i)" + p.map(tok => s"<mark>(${regexEscape(tok)})</mark>")
        .mkString("([^a-zA-Z0-9<]+)")
      val repl = "<mark>" +
        (1 to 2 * p.size - 1).map(i => s"$$$i").mkString + "</mark>"
      regexp_replace(t, pattern, repl)
    }
  }

  /** Deterministic document fingerprint: md5 of normalized text.
    * Exact-dedup key (content hash).
    */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning", §2.2): keep a line only if it ends
    * in a terminal punctuation mark (`.` `!` `?` `"`), has at least
    * `minWords` whitespace-separated words, and does not mention
    * "javascript" (the boilerplate-warning rule). Returns the ARRAY of
    * kept lines in document order — callers reassemble with
    * `array_join(_, "\n")` or count with `size`. Pure built-ins (split
    * + higher-order filter + string predicates, no regex beyond the
    * newline split), so the whole rule evaluates per-row inside the
    * scan stage with no shuffle at any corpus size, and the identical
    * `list_filter` form runs in the DuckDB oracle.
    */
  def c4KeptLines(text: Column, minWords: Int = 3): Column =
    filter(split(text, "\n"), l => {
      val lt = trim(l)
      (endswith(lt, lit(".")) || endswith(lt, lit("!")) ||
        endswith(lt, lit("?")) || endswith(lt, lit("\""))) &&
        size(filter(split(lt, " "), w => w =!= "")) >= minWords &&
        !lower(lt).contains(lit("javascript"))
    })

  /** The Gopher stop-word presence list (Rae et al. 2021 §A1.1: a
    * document must contain at least TWO of these). */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** FULL Gopher document-quality rule signals (Rae et al. 2021
    * §A1.1) — the line/symbol rules beyond the token-count and
    * mean-word-length band ([[meanTokenLen]], q64):
    *
    *  - `hash_ratio`: `#` occurrences / words ≤ 0.1
    *  - `ellipsis_ratio`: `...` occurrences / words ≤ 0.1
    *    (the paper tests EACH symbol's ratio separately)
    *  - `alpha_frac`: fraction of words with ≥1 alphabetic char ≥ 0.8
    *  - `bullet_frac`: fraction of lines starting `- ` ≤ 0.9
    *  - `ellipsis_frac`: fraction of lines ending `...` ≤ 0.3
    *  - `n_stop`: DISTINCT [[GopherStopWords]] present, must be ≥ 2
    *
    * All ratios round at 4; a word-less text reports 0.0 ratios (and
    * fails the keep verdict through the stop-word floor) instead of
    * NaN. Pure built-ins — the whole rule set evaluates per-row
    * inside the scan stage, no shuffle at any corpus size; patterns
    * are RE2-safe so the DuckDB oracle computes identically.
    *
    * @return struct(hash_ratio, ellipsis_ratio, alpha_frac,
    *         bullet_frac, ellipsis_frac, n_stop)
    */
  def gopherRuleSignals(text: Column): Column = {
    // DOUBLE let-binding (the shingles trick, nested): the outer array
    // binds the text expression once; the inner struct binds each
    // derived split once — every lambda reference below is an
    // attribute read, never a re-run of the tokenizer/split
    element_at(transform(array(text), t0 =>
      element_at(transform(array(struct(
          t0.as("raw"),
          tokens(t0).as("toks"),
          filter(split(t0, "[ \n]+"), w => w =!= "").as("words"),
          split(t0, "\n").as("lines"))), b => {
        val raw = b.getField("raw")
        val words = b.getField("words")
        val nWords = size(words).cast("double")
        val lines = b.getField("lines")
        val nLines = size(lines).cast("double")
        def ratio(n: Column): Column =
          when(nWords === 0, 0.0).otherwise(round(n / nWords, 4))
        struct(
          ratio(regexp_count(raw, lit("#"))).as("hash_ratio"),
          ratio(regexp_count(raw, lit("\\.\\.\\."))).as("ellipsis_ratio"),
          ratio(size(filter(words, w => w.rlike("[a-zA-Z]"))))
            .as("alpha_frac"),
          round(size(filter(lines, l => trim(l).startsWith("- "))) / nLines, 4)
            .as("bullet_frac"),
          round(size(filter(lines, l => trim(l).endsWith("..."))) / nLines, 4)
            .as("ellipsis_frac"),
          // array_intersect = distinct common elements — the
          // distinct-presence count in ONE pass over the tokens
          size(array_intersect(b.getField("toks"),
            array(GopherStopWords.map(lit): _*))).cast("long").as("n_stop"))
      }), 1)), 1)
  }

  /** The Gopher keep verdict over [[gopherRuleSignals]] output. */
  def gopherRulesKeep(sig: Column): Column =
    sig.getField("hash_ratio") <= 0.1 &&
      sig.getField("ellipsis_ratio") <= 0.1 &&
      sig.getField("alpha_frac") >= 0.8 &&
      sig.getField("bullet_frac") <= 0.9 &&
      sig.getField("ellipsis_frac") <= 0.3 &&
      sig.getField("n_stop") >= 2

  /** C4's page-level drop rules: any page containing "lorem ipsum"
    * (placeholder text) or a curly bracket (source code) is removed
    * wholesale (same paper, §2.2). Composes with [[c4KeptLines]]:
    * line rules trim, page rules discard.
    */
  def c4DocDrop(text: Column): Column =
    lower(text).contains(lit("lorem ipsum")) || text.contains(lit("{"))

  /** PII masking for training corpora — the standard pre-training
    * redaction pass (emails and IPv4 addresses, the two
    * deterministically-matchable classes; names/addresses need NER and
    * are out of regex scope). Patterns are RE2-safe (no lookaround/
    * backreferences) so the engine's Java-regex behavior and the
    * DuckDB-RE2 oracle agree, and both run as codegen'd
    * `regexp_replace`/`regexp_count` — a narrow per-row transform, no
    * shuffle at any corpus size.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace every email with `<EMAIL>` and every IPv4 with `<IP>`.
    * Emails first: an email's domain can contain digit runs that the
    * IP pattern would otherwise partially match. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      Ipv4Pattern, "<IP>")

  /** (n_emails, n_ips) — the redaction audit stats a curation run
    * reports per shard, counting exactly what [[redactPii]] replaces:
    * IPs are counted on the email-redacted text, so an IP-shaped email
    * local part (masked by the email pass) is not double-reported as
    * an IP redaction that never happened. */
  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(EmailPattern)),
      regexp_count(regexp_replace(text, EmailPattern, "<EMAIL>"),
        lit(Ipv4Pattern)))

  /** BPE-style PRE-tokenizer count — the unit LLM token budgets are
    * estimated in (GPT-2-family pre-tokenization splits words, number
    * runs, and punctuation runs with their leading space; actual BPE
    * merges only subdivide within pre-tokens, so this upper-bounds and
    * tracks the real token count). The whitespace class is EXPLICIT
    * (`\\x09\\x0a\\x0c\\x0d` + space) because Java's `\\s` includes
    * vertical tab while RE2's does not — with the literal class both
    * engines count identically; no lookaround, one codegen'd
    * regexp_extract_all per row, no shuffle.
    */
  def bpePreTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit(" ?[a-z0-9]+| ?[^a-z0-9\\x09\\x0a\\x0c\\x0d ]+"), lit(0)))

  /** All character trigrams of the lowercased text (multiset, in
    * order); empty for texts shorter than 3 chars. The array() wrapper
    * is the usual let binding — the lowercase runs once per row, and
    * every lambda reference is an attribute read. Case folds through
    * the LOCALE-INDEPENDENT [[graft.functions.expr.LowerRoot]] — the
    * same [[graft.functions.expr.CaseFold]] the serving-side
    * [[graft.functions.expr.LangIdPredict]] uses, so trigram keys
    * match across JVM default locales (ADVICE r9: `lower()` delegates
    * non-ASCII to the default locale).
    */
  def charTrigrams(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val folded = ColumnBridge.column(
      graft.functions.expr.LowerRoot(ColumnBridge.expression(text)))
    element_at(transform(array(folded), t =>
      when(length(t) >= 3,
        transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
        .otherwise(array().cast("array<string>"))), 1)
  }

  /** Language ID against TRAINED char-trigram profiles
    * ([[graft.sources.Ingest.trainLangProfiles]] read back from
    * parquet and collected driver-side — the model is a broadcast
    * literal like IVF centroids): score(lang) = Σ over the text's
    * trigram OCCURRENCES of the profile's log-probability, `floor` for
    * unseen trigrams; prediction = argmax with lang-ascending
    * tiebreak. One codegen'd pass per row via the native
    * [[graft.functions.expr.LangIdPredict]] expression — no join, no
    * shuffle, no interpreted lambdas; the serving shape of a real
    * (fastText-style) language identifier with an honestly small
    * model. For models too large to ride as a reference object, the
    * join-based [[graft.operators.CorpusStats.langIdPredict]] computes
    * the identical prediction (equality-tested).
    */
  def langIdFromProfiles(text: Column,
      profiles: Seq[(String, Map[String, Double])],
      floor: Double = -20.0): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expr.LangIdPredict(
      ColumnBridge.expression(text), profiles, floor))
  }

  /** The term plus its distance-1 DELETION variants (SymSpell
    * neighborhood): "abc" → [abc, bc, ac, ab]. Two strings are within
    * Levenshtein 1 (ins/del/sub) iff their variant sets intersect, so
    * materializing this over the term dictionary turns fuzzy matching
    * into an equality lookup — the scalable analog of the reference's
    * Levenshtein automaton over the tantivy FST
    * (`nidx_paragraph/src/fuzzy_query.rs:55-120`). The intersection
    * over-matches at distance 2 (e.g. transposition), so callers verify
    * survivors with one levenshtein per CANDIDATE.
    */
  def deleteVariants(term: Column): Column =
    array_distinct(concat(array(term),
      transform(sequence(lit(1), length(term)), i =>
        concat(term.substr(lit(1), i - lit(1)),
          term.substr(i + lit(1), length(term))))))

  /** Keyword profiles for heuristic language identification. With real
    * corpora these are per-language stop-word/character-n-gram profiles;
    * the mechanism (score per profile, argmax with first-wins tiebreak)
    * is what matters.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow", "table"),
    "es" -> Seq("data", "query", "agg", "row"),
    "de" -> Seq("window", "merge", "batch", "join"))

  /** n-gram-heuristic language ID: count profile hits in the token
    * array, return the first profile with the maximal score.
    */
  def langId(toks: Column): Column = {
    val scores = LangProfiles.map { case (l, ws) =>
      l -> size(filter(toks, t => t.isInCollection(ws)))
    }
    def argmax(rest: Seq[(String, Column)]): Column = rest match {
      case Seq((l, _)) => lit(l)
      case (l, s) +: tail =>
        when(tail.map(_._2).foldLeft(lit(true))((acc, t) => acc && s >= t), lit(l))
          .otherwise(argmax(tail))
    }
    argmax(scores)
  }

  /** Heuristic quality score for training-data filtering:
    * lexical diversity (unique/total tokens) scaled by log doc length,
    * penalized by stop word ratio. Deterministic, built-ins only.
    */
  def qualityScore(toks: Column): Column = {
    val n = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double")
    val stop = stopwordCount(toks).cast("double")
    (uniq / n) * log(lit(1.0) + n) - lit(0.5) * (stop / n)
  }

  import org.apache.spark.sql.DataFrame

  /** Gopher REPETITION rules (Rae et al. 2021 §A1.1 Table A1 — the
    * within-document repetition family complementing
    * [[gopherRuleSignals]]'s quality rules and q65's corpus-level
    * top-bigram coverage): duplicate-line fractions and the
    * top-{2,3,4}-gram character fractions. Deterministic,
    * oracle-portable definitions:
    *
    *  - lines = trimmed, non-empty `\n` splits; every occurrence of an
    *    identical line after its first is a DUPLICATE;
    *    `dup_line_frac` = duplicate occurrences / lines and
    *    `dup_line_char_frac` = their characters / all line characters;
    *  - top n-gram = the document's most frequent word n-gram (ties
    *    break lexicographically); `top{n}_char_frac` = (occurrences ×
    *    characters of the n-gram, joining spaces included) /
    *    characters of the space-joined token text.
    *
    * Shape: two explode + hash-aggregate passes (lines; n-grams for
    * n∈{2,3,4} in ONE union-free explode) with map-side partial
    * aggregation and a bounded per-(doc, n) top-1 window — the q65
    * scale-correct repetition shape. Deliberately NOT per-row
    * quadratic array work: a 10k-line document costs its row count,
    * never its square, so the pass survives long documents at corpus
    * scale. Documents with no lines / too few tokens report 0.0.
    *
    * @return (idCol, dup_line_frac, dup_line_char_frac,
    *          top2_char_frac, top3_char_frac, top4_char_frac, keep) —
    *          keep per the Gopher thresholds (≤0.30 dup lines, ≤0.20
    *          dup line chars, ≤0.20/0.18/0.16 top-2/3/4-gram chars)
    */
  /** Remove duplicate lines WITHIN a document — the transform pair of
    * [[gopherRepetitionSignals]]'s detection (RefinedWeb applies
    * line-level dedup as a cleaning step, not only a filter): every
    * line whose trimmed form already appeared earlier in the document
    * is dropped, first occurrences keep their original (untrimmed)
    * text and order. Pure per-row array work in the scan stage — the
    * cross-document boilerplate rule stays in
    * [[graft.operators.Dedup.boilerplateParagraphs]]; this one needs
    * no corpus state at all. Blank lines are structure, not content —
    * they are never dropped. Null text propagates null.
    */
  def dedupLines(text: Column): Column = {
    val out = dedupLinesNonNull(text)
    when(text.isNull, lit(null).cast("string")).otherwise(out)
  }

  private def dedupLinesNonNull(text: Column): Column = {
    // accumulate (seen-trimmed-lines, kept-lines); O(L²) membership
    // over the row's OWN lines — line counts are document-local, and
    // the alternative (explode + window) would shuffle the corpus for
    // a per-row transform
    val folded = aggregate(
      split(text, "\n"),
      struct(array().cast("array<string>").as("seen"),
        array().cast("array<string>").as("kept")),
      (acc, l) => {
        val t = trim(l)
        when(t =!= "" && array_contains(acc.getField("seen"), t), acc)
          .otherwise(struct(
            array_union(acc.getField("seen"), array(t)).as("seen"),
            concat(acc.getField("kept"), array(l)).as("kept")))
      })
    concat_ws("\n", folded.getField("kept"))
  }

  def gopherRepetitionSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = docs.select(col(idCol),
      explode(filter(transform(split(col(textCol), "\n"), trim(_)),
        l => l =!= "")).as("__line"))
    val lineSig = lines.groupBy(col(idCol), col("__line"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        round(sum(col("c") - 1) / sum(col("c")), 4).as("dup_line_frac"),
        round(sum((col("c") - 1) * length(col("__line"))) /
          sum(col("c") * length(col("__line"))), 4).as("dup_line_char_frac"))
    // one explode carries all three n-gram sizes; the joined-token
    // character total rides along as a per-doc constant
    val toks = tokens(col(textCol))
    val grams = docs.select(col(idCol),
        length(concat_ws(" ", toks)).cast("double").as("__chars"),
        explode(flatten(array(Seq(2, 3, 4).map(n =>
          transform(shingles(toks, n),
            g => struct(lit(n).as("n"), g.as("g")))): _*))).as("__ng"))
      .select(col(idCol), col("__chars"),
        col("__ng.n").as("__n"), col("__ng.g").as("__g"))
    val w = Window.partitionBy(col(idCol), col("__n"))
      .orderBy(col("c").desc, col("__g").asc)
    val topGram = grams.groupBy(col(idCol), col("__chars"), col("__n"), col("__g"))
      .agg(count(lit(1)).as("c"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .withColumn("__frac",
        round(col("c") * length(col("__g")) / col("__chars"), 4))
      .groupBy(col(idCol))
      .agg(
        max(when(col("__n") === 2, col("__frac"))).as("top2_char_frac"),
        max(when(col("__n") === 3, col("__frac"))).as("top3_char_frac"),
        max(when(col("__n") === 4, col("__frac"))).as("top4_char_frac"))
    val sig = docs.select(col(idCol))
      .join(lineSig, Seq(idCol), "left")
      .join(topGram, Seq(idCol), "left")
      .select(col(idCol) +:
        Seq("dup_line_frac", "dup_line_char_frac", "top2_char_frac",
          "top3_char_frac", "top4_char_frac")
          .map(c => coalesce(col(c), lit(0.0)).as(c)): _*)
    sig.withColumn("keep",
      col("dup_line_frac") <= 0.30 && col("dup_line_char_frac") <= 0.20 &&
        col("top2_char_frac") <= 0.20 && col("top3_char_frac") <= 0.18 &&
        col("top4_char_frac") <= 0.16)
  }
}
