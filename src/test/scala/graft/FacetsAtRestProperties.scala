package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for the round-19 at-rest label-facet family (VERDICT
  * r18 #8 — the q193 additive-counts argument extended to q05/q06/q60):
  *
  *  - serving [[graft.operators.Facets.facetCountsFromTable]] over the
  *    unfiltered label-occurrence count table equals the live
  *    [[graft.operators.Facets.facetCounts]] for every prefix set (the
  *    prefix gate tests only the facet value, so it commutes with the
  *    count);
  *  - [[graft.operators.Facets.rollupFromCounts]] over the
  *    per-combination base counts equals the live
  *    [[graft.operators.Facets.rollupCounts]] (grouping sets are
  *    additive — ROLLUP count(*) ≡ ROLLUP sum(n) over the
  *    pre-aggregation), including null level values;
  *  - the maintenance story: counts of DISJOINT row sets sum — the
  *    union's count table equals the per-half tables merged by
  *    `union → groupBy(facet).sum(n)`, for both the label counts and
  *    the ancestor-path rollup ([[graft.operators.Facets.pathRollup]]).
  */
object FacetsAtRestProperties extends Properties("graft.facetsAtRest") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val label: Gen[String] = Gen.oneOf(
    "", "orphan", "/s/p", "/s/p/en", "/s/p/de", "/s/p/en/x",
    "/sq/p/en", "/u/s/src0", "/u/s/src1", "/u/", "/s//p")

  private val labelRows: Gen[List[List[String]]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.choose(0, 4).flatMap(m => Gen.listOfN(m, label))))

  private def labelsDf(rows: Seq[Seq[String]]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case (ls, i) => (i.toLong, ls) }
      .toDF("rid", "labels")
  }

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  property("facetCounts served from the count table == live, every prefix set") =
    forAll(labelRows,
      Gen.choose(0, 3).flatMap(k => Gen.listOfN(k,
        Gen.oneOf("/s/p", "/u/s", "/s", "/sq", "/u")))) { (rows, prefixes) =>
      val df = labelsDf(rows)
      val counts = graft.operators.Facets.facetCounts(df, "labels", Nil)
      val served = toMap(graft.operators.Facets
        .facetCountsFromTable(counts, prefixes))
      val live = toMap(graft.operators.Facets
        .facetCounts(df, "labels", prefixes))
      if (served != live)
        println(s"rows=$rows prefixes=$prefixes\nserved=$served\nlive=$live")
      served == live
    }

  private val level: Gen[String] =
    Gen.oneOf("b1", "b2", "b3", "ALL", null: String)

  property("rollupFromCounts over base counts == live rollupCounts (nulls included)") =
    forAll(Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.zip(level, level)))) { rows =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = rows.toDF("a", "b")
      val cols = Seq("a", "b")
      // sorted MULTISET of raw rollup rows: a data-null level and a
      // rollup subtotal produce distinct rows with identical display
      // values — multiplicity must match, not just per-key sums
      def collectRollup(r: org.apache.spark.sql.DataFrame): Seq[(String, String, Long)] =
        r.collect().map(x =>
          (String.valueOf(x.getString(0)), String.valueOf(x.getString(1)),
            x.getLong(2))).toSeq.sorted
      val live = collectRollup(graft.operators.Facets.rollupCounts(df, cols))
      val base = df.groupBy("a", "b").agg(count(lit(1)).as("n"))
      val served = collectRollup(graft.operators.Facets
        .rollupFromCounts(base, cols))
      if (served != live)
        println(s"rows=$rows\nserved=$served\nlive=$live")
      served == live
    }

  property("counts are additive: disjoint halves merge to the union's table") =
    forAll(labelRows) { rows =>
      import org.apache.spark.sql.functions._
      val (h1, h2) = rows.splitAt(rows.size / 2)
      def merged(build: Seq[Seq[String]] => org.apache.spark.sql.DataFrame) =
        toMap(build(h1).unionByName(build(h2))
          .groupBy("facet").agg(sum("n").cast("long").as("n")))
      def whole(build: Seq[Seq[String]] => org.apache.spark.sql.DataFrame) =
        toMap(build(rows))
      def labelCounts(rs: Seq[Seq[String]]) =
        graft.operators.Facets.facetCounts(labelsDf(rs), "labels", Nil)
      def pathCounts(rs: Seq[Seq[String]]) =
        graft.operators.Facets.pathRollup(labelsDf(rs), "labels")
      (h1.isEmpty || h2.isEmpty) ||
        (merged(labelCounts) == whole(labelCounts) &&
          merged(pathCounts) == whole(pathCounts))
    }
}
