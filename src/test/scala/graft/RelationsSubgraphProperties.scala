package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for find's RELATIONS feature
  * ([[graft.api.GraphSearch.relationsSubgraph]]) against a plain-Scala
  * model of the reference's composition and merge
  * (`parsers/unit_retrieval.py:102-185` + `merge.py:426-477`): a path
  * matches when an undirected exact TYPED entry path admits it AND no
  * deleted (value, subtype) node and no deleted subtype group touches
  * either endpoint; the merge attributes by entry VALUE with
  * origin-first precedence (out under the origin, else in under the
  * destination). Random narrow-alphabet graphs force the collision
  * cases — same value under different subtypes, both endpoints entry
  * values, deletions intersecting entries.
  */
object RelationsSubgraphProperties
    extends Properties("graft.relationsSubgraph") {

  import graft.api.GraphSearch
  import GraphSearch.{EdgeTable, EntryPoint}

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private final case class E(src: String, rel: String, dst: String,
      st: String, ss: String, dt: String, ds: String, rt: String)

  /** The reference model over one edge list. */
  private def model(
      edges: Seq[E],
      eps: Seq[EntryPoint],
      deleted: Map[String, Seq[String]],
      groups: Seq[String]): Set[(String, String, String, String, String, String, String)] = {
    def epAdmits(e: E): Boolean = eps.exists { ep =>
      (e.src == ep.value && ep.nodeType.forall(_ == e.st) &&
        ep.subtype.forall(_ == e.ss)) ||
      (e.dst == ep.value && ep.nodeType.forall(_ == e.dt) &&
        ep.subtype.forall(_ == e.ds))
    }
    def deletedTouches(e: E): Boolean = deleted.exists { case (sub, vs) =>
      vs.exists(v => (e.src == v && e.ss == sub) || (e.dst == v && e.ds == sub))
    }
    def groupTouches(e: E): Boolean =
      groups.exists(g => e.ss == g || e.ds == g)
    val epVals = eps.map(_.value).toSet
    edges.filter(e => epAdmits(e) && !deletedTouches(e) && !groupTouches(e))
      .flatMap { e =>
        if (epVals.contains(e.src))
          Some((e.src, "out", e.dst, e.dt, e.ds, e.rel, e.rt))
        else if (epVals.contains(e.dst))
          Some((e.dst, "in", e.src, e.st, e.ss, e.rel, e.rt))
        else None // unreachable: exact-value entry match implies membership
      }.toSet
  }

  private val value: Gen[String] = Gen.oneOf("a", "b", "c", "d")
  private val subtype: Gen[String] = Gen.oneOf("x", "y")
  private val ntype: Gen[String] = Gen.oneOf("T", "U")

  private val edge: Gen[E] = for {
    s <- value; r <- Gen.oneOf("r1", "r2"); d <- value
    st <- ntype; ss <- subtype; dt <- ntype; ds <- subtype
    rt <- Gen.oneOf("R", "Q")
  } yield E(s, r, d, st, ss, dt, ds, rt)

  private val entryPoint: Gen[EntryPoint] = for {
    v <- value
    t <- Gen.option(ntype)
    s <- Gen.option(subtype)
  } yield EntryPoint(v, t, s)

  private val scenario: Gen[(List[E], List[EntryPoint],
      Map[String, Seq[String]], List[String])] = for {
    ne <- Gen.choose(1, 15)
    edges <- Gen.listOfN(ne, edge)
    nep <- Gen.choose(1, 2)
    eps <- Gen.listOfN(nep, entryPoint)
    del <- Gen.option(for { s <- subtype; v <- value } yield Map(s -> Seq(v)))
    grp <- Gen.option(subtype)
  } yield (edges.distinct, eps.distinct,
    del.getOrElse(Map.empty), grp.toList)

  property("matches the plain-Scala reference-merge model on random graphs") =
    forAll(scenario) { case (edges, eps, del, groups) =>
      import spark.implicits._
      val df = edges.map(e => (e.src, e.rel, e.dst, e.st, e.ss, e.dt, e.ds, e.rt))
        .toDF("src", "rel", "dst", "st", "ss", "dt", "ds", "rt")
      val t = EdgeTable(df, "src", "rel", "dst",
        srcTypeCol = Some("st"), srcSubtypeCol = Some("ss"),
        dstTypeCol = Some("dt"), dstSubtypeCol = Some("ds"),
        relTypeCol = Some("rt"))
      // topK far above any scenario so the page cut never binds —
      // the cut contract is pinned elsewhere (q49/q127 order)
      val got = GraphSearch.relationsSubgraph(t, eps,
          deletedEntities = del, deletedGroups = groups, topK = 10000)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4), r.getString(5), r.getString(6)))
        .toSet
      val want = model(edges, eps, del, groups)
      if (got != want)
        println(s"edges=$edges eps=$eps del=$del groups=$groups\n" +
          s"got=$got\nwant=$want")
      got == want
    }
}
