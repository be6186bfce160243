package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for the /search min_score × offset × order
  * interaction matrix (VERDICT r15 task 4). The reference's
  * composition order on the score path is: cut the inflated fetch
  * (offset + top_k, `parsers/search.py:96-97`) in score order at the
  * index, drop sub-threshold rows from that ALREADY-CUT page (the
  * readers' post-cut drop, `nidx_text/src/reader.rs:295-307` — the
  * page shrinks, it NEVER refills from below the cut), then skip the
  * first `offset` rows of the thresholded response (`merge.py:135`
  * slices raw[offset:] over the already-thresholded list). On a
  * DATE-ordered page min_score does not apply at all
  * (`convert_int_order` takes no min_score, reader.rs:226) — offset
  * still does. Laws, over random tiny corpora:
  *
  *  1. score path: the engine's (min_score, offset, topK) page ==
  *     the model `threshold ∘ skip` applied to the engine's own
  *     un-thresholded offset-0 fetch — in particular the page never
  *     REFILLS (threshold-before-cut would).
  *  2. date path: the page is invariant under min_score (huge
  *     threshold == zero threshold, scores are proto-default 0.0),
  *     and offset composes exactly like law 1 without the threshold.
  *  3. fallback leg: a non-zero min_score disables the refuzz even
  *     when the exact page is empty and the typo would expand
  *     (reader.rs:128's trigger is empty ∧ topK > 0 ∧ min_score == 0).
  */
object SearchMatrixProperties extends Properties("graft.searchMatrix") {

  import graft.api.Search
  import Search.SearchRequest

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val word: Gen[String] = Gen.oneOf("spark", "query", "scan", "fast")

  private val corpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 10)
    texts <- Gen.listOfN(n,
      Gen.choose(1, 6).flatMap(m => Gen.listOfN(m, word).map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

  private def frames(rows: List[(Long, String)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("created",
        to_date(concat(lit("2021-01-"),
          lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"))))
    val pars = rows.map { case (id, t) => (s"$id/t/body/0-9", t, id) }
      .toDF("paragraph_id", "p_text", "doc_id")
    (docs, pars)
  }

  // paragraph scores are matched-term counts — integers, so thresholds
  // drawn between them exercise both keep-all and drop-some cuts; the
  // doc list's bm25 scores live in the same few-units range
  private val minScoreGen: Gen[Double] =
    Gen.oneOf(0.1, 0.6, 1.5, 2.5, 100.0)

  property("score path: engine page == threshold-then-skip of its own offset-0 fetch (never refills)") =
    forAll(corpus, Gen.choose(0, 4), Gen.choose(1, 3), minScoreGen) {
      (rows, off, k, ms) =>
        val (docs, pars) = frames(rows)
        def run(offset: Int, topK: Int, minScore: Double) = Search.search(
          docs, "doc_id", "text", "lang",
          Some((pars, "paragraph_id", "p_text")),
          SearchRequest(query = "spark query", topK = topK, offset = offset,
            minScore = minScore))
        def docPage(r: Search.SearchResponse): Seq[(Long, Double)] =
          r.documents.map(_.collect()
            .map(x => (x.getLong(0), x.getDouble(1))).toSeq).getOrElse(Nil)
        def parPage(r: Search.SearchResponse): Seq[(String, Double)] =
          r.paragraphs.map(_.collect()
            .map(x => (x.getString(0), x.getDouble(1))).toSeq).getOrElse(Nil)
        // the reference model: the index's fetch page (offset 0, no
        // threshold, size offset+topK), thresholded post-cut, then the
        // merge's raw[offset:] skip on the thresholded response order
        val base = run(0, off + k, 0.0)
        val engine = run(off, k, ms)
        def model[A](page: Seq[(A, Double)]): Seq[(A, Double)] =
          page.filter(_._2 >= ms).drop(off)
        val okDocs = docPage(engine) == model(docPage(base))
        val okPars = parPage(engine) == model(parPage(base))
        if (!okDocs || !okPars)
          println(s"rows=$rows off=$off k=$k ms=$ms\n" +
            s"engineD=${docPage(engine)} modelD=${model(docPage(base))}\n" +
            s"engineP=${parPage(engine)} modelP=${model(parPage(base))}")
        okDocs && okPars
    }

  property("date path: min_score never drops date-ordered rows; offset composes threshold-free") =
    forAll(corpus, Gen.choose(0, 4), Gen.choose(1, 3), minScoreGen,
      Gen.oneOf("spark", "")) { (rows, off, k, ms, q) =>
        val (docs, pars) = frames(rows)
        def run(offset: Int, topK: Int, minScore: Double) = Search.search(
          docs, "doc_id", "text", "lang",
          Some((pars, "paragraph_id", "p_text")),
          SearchRequest(query = q, topK = topK, offset = offset,
            minScore = minScore,
            orderBy = Some(Search.OrderByDate("created"))))
        def pages(r: Search.SearchResponse) = (
          r.documents.map(_.collect().map(_.get(0)).toSeq).getOrElse(Nil),
          r.paragraphs.map(_.collect().map(_.get(0)).toSeq).getOrElse(Nil))
        // law 2a: the threshold is a no-op on date-ordered pages
        val thresholded = pages(run(off, k, ms))
        val unthresholded = pages(run(off, k, 0.0))
        // law 2b: offset slices the offset-0 fetch, same as the score
        // path's algebra without the threshold
        val full = pages(run(0, off + k, 0.0))
        val ok = thresholded == unthresholded &&
          thresholded._1 == full._1.slice(off, off + k) &&
          thresholded._2 == full._2.slice(off, off + k)
        if (!ok)
          println(s"rows=$rows off=$off k=$k ms=$ms q='$q'\n" +
            s"thr=$thresholded unthr=$unthresholded full=$full")
        ok
    }

  property("fallback leg: non-zero min_score disables the refuzz whatever the offset") =
    forAll(corpus, Gen.choose(0, 4), Gen.choose(1, 3),
      Gen.oneOf(0.1, 1.0)) { (rows, off, k, ms) =>
        val (docs, pars) = frames(rows)
        def run(minScore: Double) = Search.search(
          docs, "doc_id", "text", "lang",
          Some((pars, "paragraph_id", "p_text")),
          SearchRequest(query = "sparkk", topK = k, offset = off,
            minScore = minScore))
        // the typo'd query expands under min_score 0 whenever any doc
        // carries 'spark'; under a non-zero threshold it must not
        val expands = rows.exists(_._2.contains("spark"))
        val withMs = run(ms).paragraphs.get.collect()
        val without = run(0.0).paragraphs.get.collect()
        withMs.isEmpty &&
          (without.nonEmpty == (expands && off < rows.count(_._2.contains("spark"))))
    }
}
