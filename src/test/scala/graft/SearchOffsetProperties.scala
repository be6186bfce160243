package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for /search offset pagination
  * (`models/search.py:509-515` + `parsers/search.py:96-97` +
  * `merge.py:135,351`): a request with offset o and page k must serve
  * EXACTLY rows o..o+k of the same request's offset-0 fetch at o+k —
  * the parser's fetch-inflation + the merge's `raw[offset:]` skip, as
  * one algebraic law. Random tiny corpora drive all three paths: the
  * score page, the index-side date order, and (via typo'd queries)
  * the fuzzy-fallback page, whose trigger must read the PRE-skip page
  * — an offset that empties the page must NOT refuzz a non-empty
  * exact response.
  */
object SearchOffsetProperties extends Properties("graft.searchOffset") {

  import graft.api.Search
  import Search.SearchRequest

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val word: Gen[String] = Gen.oneOf("spark", "query", "scan", "fast")

  private val corpus: Gen[(List[(Long, String)], String, Boolean)] = for {
    n <- Gen.choose(2, 10)
    texts <- Gen.listOfN(n,
      Gen.choose(1, 5).flatMap(m => Gen.listOfN(m, word).map(_.mkString(" "))))
    // "sparkk" exercises the fuzzy fallback (empty exact page at
    // topK > 0, min_score 0), plain words the exact path
    q <- Gen.oneOf("spark", "query", "sparkk", "queryy")
    dateOrder <- Gen.oneOf(true, false)
  } yield (texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) },
    q, dateOrder)

  property("offset page == rows o..o+k of the offset-0 fetch (all paths)") =
    forAll(corpus, Gen.choose(0, 4), Gen.choose(1, 3)) {
      case ((rows, q, dateOrder), off, k) =>
        import spark.implicits._
        import org.apache.spark.sql.functions._
        val docs = rows.toDF("doc_id", "text")
          .withColumn("lang", lit("en"))
          .withColumn("created",
            to_date(concat(lit("2021-01-"),
              lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"))))
        val pars = rows.map { case (id, t) => (s"$id/t/body/0-9", t, id) }
          .toDF("paragraph_id", "p_text", "doc_id")
        val ob =
          if (dateOrder) Some(Search.OrderByDate("created")) else None
        def run(offset: Int, topK: Int) = Search.search(
          docs, "doc_id", "text", "lang",
          Some((pars, "paragraph_id", "p_text")),
          SearchRequest(query = q, topK = topK, offset = offset,
            orderBy = ob))
        def docIds(r: Search.SearchResponse): Seq[Long] =
          r.documents.map(_.collect().map(_.getLong(0)).toSeq)
            .getOrElse(Nil)
        def parIds(r: Search.SearchResponse): Seq[String] =
          r.paragraphs.map(_.collect().map(_.getString(0)).toSeq)
            .getOrElse(Nil)
        val paged = run(off, k)
        val full = run(0, off + k)
        val okDocs = docIds(paged) == docIds(full).slice(off, off + k)
        val okPars = parIds(paged) == parIds(full).slice(off, off + k)
        if (!okDocs || !okPars)
          println(s"q=$q off=$off k=$k dateOrder=$dateOrder rows=$rows\n" +
            s"pagedD=${docIds(paged)} fullD=${docIds(full)}\n" +
            s"pagedP=${parIds(paged)} fullP=${parIds(full)}")
        okDocs && okPars
    }
}
