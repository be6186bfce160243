package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Mirrors the reference's people_and_places graph fixture semantics
  * (FIXTURES.md; `nidx/tests/integration/search_relations.rs`).
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    ("Anastasia", "LIVE_IN", "Barcelona"),
    ("Anna", "LIVE_IN", "Berlin"),
    ("Apollo", "BORN_IN", "Olympus"),
    ("Anna", "IS_FRIEND", "Anastasia"),
    ("Rosa Parks", "BORN_IN", "Tuskegee"))
    .toDF("src", "rel", "dst")

  test("neighbors returns both directions tagged") {
    val got = GraphOps.neighbors(edges, "src", "dst", "Anastasia")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("out", "Barcelona"), ("in", "Anna")))
  }

  test("fuzzy node match at distance 1-2 (Anastas ~ Anastasia at 2)") {
    val nodes = edges.select(col("src").as("v")).distinct()
    assert(nodes.where(GraphOps.fuzzyMatch(col("v"), "Anastas", 2))
      .collect().map(_.getString(0)).toSet == Set("Anastasia"))
    assert(nodes.where(GraphOps.fuzzyMatch(col("v"), "Ana", 1))
      .collect().map(_.getString(0)).toSet == Set("Anna"))
  }

  test("prefix and words match") {
    val nodes = edges.select(col("src").as("v")).distinct()
    assert(nodes.where(GraphOps.prefixMatch(col("v"), "An"))
      .collect().map(_.getString(0)).toSet == Set("Anastasia", "Anna"))
    assert(nodes.where(GraphOps.wordsMatch(col("v"), "parks"))
      .collect().map(_.getString(0)).toSet == Set("Rosa Parks"))
  }

  test("twoHop traverses via bridge with dedup and limit") {
    val e1 = Seq(("s1", "o1"), ("s1", "o2")).toDF("src", "dst")
    val e2 = Seq(("o1", "c1"), ("o2", "c1"), ("o2", "c2")).toDF("src", "dst")
    val got = GraphOps.twoHop(e1, "src", "dst", e2, "src", "dst", "s1", 10)
      .collect().map(_.getString(0))
    assert(got.sameElements(Array("c1", "c2")))
  }

  test("iterativeExpand walks ranked hops without revisiting explored nodes") {
    // A -[x2]- B, A - C, B - D, C - D, D - E; seeds = {A}
    val g = Seq(
      ("A", "r", "B"), ("A", "r", "B"), ("A", "r", "C"),
      ("B", "r", "D"), ("C", "r", "D"), ("D", "r", "E"))
      .toDF("src", "rel", "dst")
    val seeds = Seq("A").toDF("node")
    val got = GraphOps.iterativeExpand(g, "src", "rel", "dst", seeds, "node",
        hops = 2, topPerHop = 10)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(3), r.getLong(4)))
      .toSet
    // hop 1: A's neighbors (B support 2, C support 1); hop 2: from B and
    // C to D (two distinct relations), never back to explored A/B/C
    assert(got == Set(
      (1, "A", "B", 2L), (1, "A", "C", 1L),
      (2, "B", "D", 1L), (2, "C", "D", 1L)))
  }

  test("fuzzyPrefixMatch equals the some-prefix-within-distance definition") {
    // served regime: |query| > distance (the suggest path guarantees
    // it via minPrefixLen), so the empty prefix can never qualify and
    // the bounded |q|±d length OR is exact
    val rnd = new scala.util.Random(11)
    def rndStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val values = (1 to 80).map(_ => rndStr(1 + rnd.nextInt(7))).distinct
    val df = values.toDF("v")
    for (_ <- 1 to 8; d <- Seq(1, 2)) {
      val q = rndStr(d + 1 + rnd.nextInt(3)) // |q| > d
      val expected = values.filter(v =>
        (1 to v.length).exists(l => lev(v.take(l), q) <= d)).toSet
      val got = df.where(GraphOps.fuzzyPrefixMatch(col("v"), q, d))
        .collect().map(_.getString(0)).toSet
      assert(got == expected, s"q=$q d=$d: $got vs $expected")
    }
  }

  test("iterativeExpandFrom with at-rest weights equals the raw-edge count form") {
    // the weighted form over distinct (triplet, n) rows must reproduce
    // the per-request duplicate count exactly — the at-rest serving
    // contract of Ingest.relationIndex
    val g = Seq(
      ("A", "r", "B"), ("A", "r", "B"), ("A", "r", "C"),
      ("B", "r", "D"), ("C", "r", "D"), ("D", "r", "E"))
      .toDF("src", "rel", "dst")
    val weighted = g.groupBy("src", "rel", "dst")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).cast("long").as("n"))
    val und = weighted.select(col("src").as("node"), col("rel"),
        col("dst").as("nbr"), col("n"))
      .unionByName(weighted.select(col("dst").as("node"), col("rel"),
        col("src").as("nbr"), col("n")))
    val seeds = Seq("A").toDF("node")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(3), r.getLong(4))).toSet
    val got = asSet(GraphOps.iterativeExpandFrom(und, seeds, "node",
      hops = 2, topPerHop = 10, weightCol = Some("n")))
    val want = asSet(GraphOps.iterativeExpand(g, "src", "rel", "dst",
      seeds, "node", hops = 2, topPerHop = 10))
    assert(got == want, s"$got vs $want")
  }

  test("iterativeExpand hop-2 frontier reaches farther when topPerHop allows") {
    val g = Seq(("A", "r", "B"), ("B", "r", "C"), ("C", "r", "D"))
      .toDF("src", "rel", "dst")
    val seeds = Seq("A").toDF("node")
    val hops3 = GraphOps.iterativeExpand(g, "src", "rel", "dst", seeds, "node",
        hops = 3, topPerHop = 5)
      .collect().map(r => (r.getInt(0), r.getString(3))).toSet
    assert(hops3 == Set((1, "B"), (2, "C"), (3, "D")))
  }

  test("nodesSearch and relationsSearch project the path results' node/label sets") {
    import graft.api.GraphSearch
    import graft.api.GraphSearch.{EdgeTable, NodeMatch, PathQuery}
    val edges = Seq(
      ("alice", "WORKS_AT", "acme"),
      ("alice", "KNOWS", "bob"),
      ("bob", "WORKS_AT", "globex"),
      ("carol", "KNOWS", "alice"))
      .toDF("src", "rel", "dst")
    val t = EdgeTable(edges, "src", "rel", "dst")
    // undirected match on alice: her triplets in either orientation
    val q = PathQuery.Path(src = NodeMatch.Exact("alice"), undirected = true)
    val nodes = GraphSearch.nodesSearch(t, q).collect().map(_.getString(0))
    assert(nodes.toSeq == Seq("acme", "alice", "bob", "carol"))
    val rels = GraphSearch.relationsSearch(t, q).collect().map(_.getString(0))
    assert(rels.toSeq == Seq("KNOWS", "WORKS_AT"))
    // directed: only alice-as-source triplets remain
    val directed = GraphSearch.nodesSearch(t,
      PathQuery.Path(src = NodeMatch.Exact("alice"))).collect().map(_.getString(0))
    assert(directed.toSeq == Seq("acme", "alice", "bob"))
  }
}
