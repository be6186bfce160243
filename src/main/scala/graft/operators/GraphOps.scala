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

  /** Entity prefix search for suggest
    * (`nidx_relation/src/reader.rs` prefix search): distinct node values
    * with the prefix, alphabetical, top-k.
    */
  def prefixSearch(nodes: DataFrame, valueCol: String, prefix: String, k: Int): DataFrame =
    nodes.where(col(valueCol).startsWith(prefix))
      .select(col(valueCol).as("value")).distinct()
      .orderBy(col("value").asc)
      .limit(k)
}
