package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pin for `/catalog/facets` ([[graft.operators.Facets.catalogFacets]])
  * against a plain-Scala model of the reference algorithm:
  * `extract_facets` (pg.py:484-493 — per-resource SET of every label's
  * ancestor paths, built with Python-split semantics that KEEP empty
  * segments) counted per facet under the endpoint's filters
  * (pg.py:175-206 — plain SQL `LIKE '{prefix}%'` string prefixes,
  * OR-joined, each optionally AND `SPLIT_PART(facet, '/',
  * parts(prefix) + depth + 1) = ''`). Random label sets include the
  * edge shapes: empty labels, slash-less labels (no ancestors — the
  * sequence(2,1) phantom guard), trailing-slash labels (an EMPTY last
  * segment is a real ancestor step), and /l-vs-/li string-prefix
  * collisions.
  */
object CatalogFacetsProperties extends Properties("graft.catalogFacets") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session

  // the reference's extract_facets, verbatim semantics: Python split
  // keeps empty segments; parts[1:] of a slash-less label is empty
  private def extractFacets(labels: Seq[String]): Set[String] =
    labels.flatMap { label =>
      val parts = label.split("/", -1).toSeq
      parts.drop(1).scanLeft("") { case (acc, part) => acc + "/" + part }
        .drop(1)
    }.toSet

  // SPLIT_PART(facet, '/', n) = '' — '' when n exceeds the part count
  // or the nth part is empty (Postgres semantics, 1-based)
  private def splitPartEmpty(facet: String, n: Int): Boolean = {
    val parts = facet.split("/", -1)
    n > parts.length || parts(n - 1).isEmpty
  }

  private def model(
      rows: Seq[Seq[String]],
      prefixes: Seq[(String, Option[Int])]): Map[String, Long] = {
    val perResource = rows.map(extractFacets)
    val admitted: String => Boolean =
      if (prefixes.isEmpty) _ => true
      else facet => prefixes.exists { case (p, d) =>
        facet.startsWith(p) && d.forall(depth =>
          splitPartEmpty(facet, p.split("/", -1).length + depth + 1))
      }
    perResource.flatMap(_.filter(admitted).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private val label: Gen[String] = Gen.oneOf(
    "", "orphan", "/l", "/l/a", "/l/b", "/l/a/x", "/l/a/x/deep",
    "/li/z", "/m/c", "/l/", "/m//d")

  private val prefix: Gen[(String, Option[Int])] = for {
    p <- Gen.oneOf("", "/l", "/l/a", "/li", "/m")
    d <- Gen.option(Gen.choose(0, 2))
  } yield (p, d)

  property("engine counts == reference-model counts on random label sets") =
    forAll(
      Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
        Gen.choose(0, 4).flatMap(m => Gen.listOfN(m, label)))),
      Gen.choose(0, 3).flatMap(k => Gen.listOfN(k, prefix))) {
      (rows, prefixes) =>
        import spark.implicits._
        val df = rows.zipWithIndex
          .map { case (ls, i) => (i.toLong, ls) }.toDF("rid", "labels")
        val got = graft.operators.Facets
          .catalogFacets(df, "labels", prefixes)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val want = model(rows, prefixes)
        if (got != want)
          println(s"rows=$rows prefixes=$prefixes\ngot=$got\nwant=$want")
        got == want
    }

  // round 18: the at-rest serving path — filtering the UNFILTERED
  // count table must equal counting the filtered rows for EVERY
  // prefix/depth request (the gates test only the facet value, so
  // they commute with the per-facet count; this is the correctness
  // claim q193 and Engine.cacheCatalogFacetCounts ride on)
  property("at-rest count-table serving == corpus aggregation for every request") =
    forAll(
      Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
        Gen.choose(0, 4).flatMap(m => Gen.listOfN(m, label)))),
      Gen.choose(0, 3).flatMap(k => Gen.listOfN(k, prefix))) {
      (rows, prefixes) =>
        import spark.implicits._
        val df = rows.zipWithIndex
          .map { case (ls, i) => (i.toLong, ls) }.toDF("rid", "labels")
        val counts = graft.operators.Facets.catalogFacetCounts(df, "labels")
        val atRest = graft.operators.Facets
          .catalogFacetsAtRest(counts, prefixes)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val direct = graft.operators.Facets
          .catalogFacets(df, "labels", prefixes)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        if (atRest != direct)
          println(s"rows=$rows prefixes=$prefixes\natRest=$atRest\ndirect=$direct")
        atRest == direct
    }
}
