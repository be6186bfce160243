package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Knowledge-graph retrieval over an `edges` DataFrame
  * (src, rel, dst [+ metadata columns]).
  *
  * Reference: the relation index's path queries
  * (`nidx/nidx_relation/src/reader.rs:100-260`,
  * `graph_query_parser.rs:33-867`): node match by exact / prefix /
  * words / fuzzy, undirected = query both orientations, 1-hop neighbor
  * expansion for the legacy `relations` feature
  * (`search/search/query_parser/parsers/unit_retrieval.py:102-186`), and
  * top-unique-N collection (`top_unique_n.rs:20-159`).
  *
  * Scale design: edges hash-partition by src (and a dst-keyed copy or
  * secondary bucket for reverse lookups); node-match predicates push to
  * the scan; fuzzy matching joins against the (small) distinct-node
  * dictionary, never the full edge list.
  */
object GraphOps {

  /** Undirected 1-hop neighborhood of a node: out-edges ∪ in-edges,
    * tagged with direction. Matches the reference's both-orientations
    * expansion for undirected paths.
    */
  def neighbors(edges: DataFrame, srcCol: String, dstCol: String, node: Any): DataFrame = {
    val out = edges.where(col(srcCol) === lit(node))
      .select(lit("out").as("dir"), col(dstCol).as("node")).distinct()
    val in = edges.where(col(dstCol) === lit(node))
      .select(lit("in").as("dir"), col(srcCol).as("node")).distinct()
    out.unionByName(in)
  }

  /** 2-hop reachability through a bridge relation: nodes reachable from
    * `start` via edges1 ⨝ edges2, deduplicated, top-unique-N
    * (`top_unique_n.rs` analog = distinct + orderBy + limit).
    */
  def twoHop(
      edges1: DataFrame, src1: String, dst1: String,
      edges2: DataFrame, src2: String, dst2: String,
      start: Any, k: Int): DataFrame =
    edges1.where(col(src1) === lit(start))
      .select(col(dst1).as("bridge"))
      .join(edges2.select(col(src2).as("bridge"), col(dst2).as("node")), "bridge")
      .select("node").distinct()
      .orderBy(col("node").asc)
      .limit(k)

  /** Node-match predicate family (graph_query_parser.rs):
    * exact / prefix / any-word / fuzzy(dist). */
  def exactMatch(c: Column, v: String): Column = c === v
  def prefixMatch(c: Column, p: String): Column = c.startsWith(p)
  def wordsMatch(c: Column, word: String): Column =
    array_contains(split(lower(c), "\\s+"), word.toLowerCase)
  def fuzzyMatch(c: Column, v: String, dist: Int): Column =
    levenshtein(lower(c), lit(v.toLowerCase)) <= dist

  /** Fuzzy WORDS node match (`MatchLocation::Words` + fuzzy): the node
    * matches when ANY word of its value is within edit distance `dist`
    * of the query word — the /ask graph strategy's query-entity
    * detection unit (`graph_strategy.py:479-487`). */
  def fuzzyWordsMatch(c: Column, word: String, dist: Int = 1): Column =
    // empty split tokens (padded/double whitespace) must not match —
    // levenshtein("", w) = |w| would admit any ≤dist-char query word
    exists(filter(split(lower(c), "\\s+"), w => w =!= ""),
      w => levenshtein(w, lit(word.toLowerCase)) <= dist)

  /** Fuzzy PREFIX node match — tantivy's
    * `FuzzyTermQuery::new_prefix(term, d)` semantics
    * (`graph_query_parser.rs:536-537`): the node matches iff SOME
    * prefix of its value is within edit distance `dist` of the query.
    * A prefix with |len − |q|| > dist can never qualify (length
    * difference lower-bounds edit distance), so the test is an exact
    * bounded OR over the 2·dist+1 candidate prefix lengths — pure
    * codegen'd expressions, no UDF.
    */
  def fuzzyPrefixMatch(c: Column, v: String, dist: Int = 1): Column = {
    val q = v.toLowerCase
    // |q| ≤ dist would make the EMPTY prefix qualify — tantivy's
    // automaton then matches every term, and the bounded length OR
    // (which starts at length 1) would silently diverge from it.
    // The reference never reaches that regime (suggest enforces
    // MIN_SUGGEST_PREFIX_LENGTH=2 > FUZZY_DISTANCE=1); fail loudly
    // instead of returning a wrong result set
    require(q.length > dist,
      s"fuzzy-prefix stem '$v' must be longer than distance $dist " +
        "(an at-or-below-distance stem matches every node)")
    val lens = math.max(1, q.length - dist) to (q.length + dist)
    lens.map(l => levenshtein(lower(substring(c, 1, l)), lit(q)) <= dist)
      .reduce(_ || _)
  }

  /** Iterative ranked neighbor expansion — the graph RAG strategy loop
    * (`nucliadb/src/nucliadb/search/search/graph_strategy.py:315-460`):
    * hop 0 starts from query-matched seed entities; each hop finds the
    * undirected neighbors of the frontier excluding already-explored
    * nodes (`find_graph_neighbours`, `graph_strategy.py:931-977`),
    * ranks the discovered relations (the reference scores them with an
    * external reranker/generative model — here the deterministic
    * stand-in is edge support count, the [[graft.operators.Rerankers]]
    * Scorer pattern), keeps the `topPerHop` best, and the surviving
    * NEW nodes become the next frontier.
    *
    * Scale shape: the loop is driver-side over `hops` (2–3 in
    * practice) and the frontier/explored sets are DRIVER-scale by
    * construction (≤ seeds + hops·topPerHop node values — the
    * reference carries the same lists in `entities_to_explore` /
    * `explored_entities`), so they compile into literal IN predicates
    * that push into the edge scan; each hop is one pushed-filter scan +
    * hash aggregate + top-k, and the corpus-sized edge table never
    * shuffles beyond the aggregation.
    *
    * @return (hop, node, rel, neighbor, support) — the kept relations
    *         per hop, support = distinct edge occurrences
    */
  def iterativeExpand(
      edges: DataFrame, srcCol: String, relCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      hops: Int, topPerHop: Int): DataFrame = {
    val undirected = edges
      .select(col(srcCol).as("node"), col(relCol).as("rel"), col(dstCol).as("nbr"))
      .unionByName(edges
        .select(col(dstCol).as("node"), col(relCol).as("rel"), col(srcCol).as("nbr")))
    iterativeExpandFrom(undirected, seeds, seedCol, hops, topPerHop, None)
  }

  /** [[iterativeExpand]] over a PRE-BUILT undirected relation table
    * (node, rel, nbr[, weight]) — the at-rest serving form: the two
    * sorted copies of [[graft.sources.Ingest.relationIndex]] provide
    * exactly the two orientations, each pruning its frontier IN
    * predicate through its own sort key, and `weightCol` (the at-rest
    * triplet multiplicity `n`) replaces the per-request duplicate
    * count, so a hop scans the distinct-triplet table instead of
    * re-deriving and re-counting the raw fact edges.
    */
  def iterativeExpandFrom(
      undirected: DataFrame,
      seeds: DataFrame, seedCol: String,
      hops: Int, topPerHop: Int,
      weightCol: Option[String]): DataFrame = {
    val support = weightCol
      .map(w => sum(col(w)).cast("long").as("support"))
      .getOrElse(count(lit(1)).as("support"))
    // driver-memory guard (ADVICE r10): the loop accumulates at most
    // hops×topPerHop rows on the driver — cheap at the endpoint's
    // request sizes, a foot-gun if a caller cranks topPerHop to corpus
    // scale. Same ceiling class as the union-find pair bound.
    require(hops.toLong * topPerHop <= (1L << 20),
      s"iterativeExpandFrom would accumulate up to ${hops.toLong * topPerHop} " +
        "driver rows (hops × topPerHop > 2^20) — use a distributed " +
        "traversal for corpus-scale expansions")
    var frontier: Seq[Any] = seeds.select(col(seedCol)).distinct()
      .collect().map(_.get(0)).toSeq
    var explored: Seq[Any] = frontier
    // every hop result is ≤ topPerHop rows by construction (the
    // reference carries the same bounded lists), and the loop has to
    // collect each hop anyway to build the next frontier — so the
    // kept relations accumulate as DRIVER rows and the result is one
    // local relation. Unioning the per-hop DataFrames instead would
    // re-execute every hop's scan a second time when the caller runs
    // the union (measured ~2× the expansion cost at bench scale).
    val acc = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    var schema: Option[org.apache.spark.sql.types.StructType] = None
    var hop = 0
    while (hop < hops && frontier.nonEmpty) {
      val hopRels = undirected
        .where(col("node").isInCollection(frontier) &&
          !col("nbr").isInCollection(explored))
        .groupBy("node", "rel", "nbr")
        .agg(support)
        .orderBy(col("support").desc, col("node").asc, col("nbr").asc, col("rel").asc)
        .limit(topPerHop)
        .withColumn("hop", lit(hop + 1))
        .select("hop", "node", "rel", "nbr", "support")
      val collected = hopRels.collect() // the hop's ONE action
      schema = schema.orElse(Some(hopRels.schema))
      acc ++= collected
      // topPerHop rows — driver-scale cursor state, like a page cut
      val newNodes = collected.map(_.get(3)).distinct.toSeq
      explored = (explored ++ newNodes).distinct
      frontier = newNodes
      hop += 1
    }
    schema match {
      case Some(sc) =>
        // LOCAL relation, not an RDD detour (ADVICE r10): the rows are
        // already on the driver and bounded by hops×topPerHop, so a
        // LocalRelation-backed DataFrame avoids the parallelize job and
        // keeps the plan a leaf callers can cheaply re-filter. Callers
        // needing pushdown into the EDGE scans must filter via the path
        // query/seeds instead — this result is post-expansion output.
        val session = undirected.sparkSession
        session.createDataFrame(
          java.util.Arrays.asList(acc.toSeq: _*), sc)
      case None =>
        undirected.select(lit(0).as("hop"), col("node"), col("rel"),
          col("nbr"), lit(0L).as("support")).limit(0)
    }
  }

  /** Entity prefix search for suggest
    * (`nidx_relation/src/reader.rs` prefix search): distinct node values
    * with the prefix, alphabetical, top-k.
    */
  def prefixSearch(nodes: DataFrame, valueCol: String, prefix: String, k: Int): DataFrame =
    nodes.where(col(valueCol).startsWith(prefix))
      .select(col(valueCol).as("value")).distinct()
      .orderBy(col("value").asc)
      .limit(k)

  /** Query entity detection against the entity-node table — the
    * gazetteer form of the reference's Predict-API NER step (detected
    * entity values become graph entry points,
    * `search/search/query_parser/parsers/unit_retrieval.py:102-140`;
    * the external model is isolated behind this same
    * values-in-the-query contract). Whole-token phrase containment:
    * the query normalizes to space-delimited tokens driver-side (a
    * literal) and an entity matches when its value appears
    * space-bounded — one codegen'd predicate over the entity scan, no
    * join, no tokenize of anything corpus-sized.
    */
  def detectEntities(nodes: DataFrame, valueCol: String, query: String): DataFrame = {
    val norm = " " + query.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim + " "
    // the SAME normalization applies to the entity value column — an
    // entity stored as "Red Widget" or "blue-bolt" must still match
    // the normalized query
    val normValue =
      trim(regexp_replace(lower(col(valueCol)), "[^a-z0-9]+", " "))
    nodes.where(lit(norm).contains(concat(lit(" "), normValue, lit(" "))))
  }
}
