package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Graph path search API — `POST /kb/{kbid}/graph` (SURVEY §3.3).
  *
  * The reference parses a PathQuery tree (OR/NOT over
  * (source)-[relation]->(destination) triplet constraints, node match
  * by exact/prefix/words/fuzzy, undirected = both orientations) into
  * tantivy boolean queries (`nidx_relation/src/graph_query_parser.rs`).
  * Here the same tree compiles to a `Column` predicate over the edges
  * DataFrame — Catalyst folds it into the scan. Top-k unique paths
  * mirror `top_unique_n.rs` as distinct + orderBy + limit.
  */
object GraphSearch {

  /** Node match constraint family (graph_query_parser.rs node queries). */
  sealed trait NodeMatch
  object NodeMatch {
    case object Any extends NodeMatch
    final case class Exact(value: String) extends NodeMatch
    final case class Prefix(prefix: String) extends NodeMatch
    final case class Words(word: String) extends NodeMatch
    final case class Fuzzy(value: String, distance: Int = 1) extends NodeMatch
    /** tantivy fuzzy-prefix (`FuzzyTermQuery::new_prefix`) — the match
      * kind `/suggest`'s entity search uses (`nidx_relation/src/lib.rs:
      * 226-235`, MatchLocation::Prefix + FUZZY_DISTANCE 1). */
    final case class FuzzyPrefix(value: String, distance: Int = 1) extends NodeMatch

    def compile(m: NodeMatch, c: Column): Column = m match {
      case Any => lit(true)
      case Exact(v) => GraphOps.exactMatch(c, v)
      case Prefix(p) => GraphOps.prefixMatch(c, p)
      case Words(w) => GraphOps.wordsMatch(c, w)
      case Fuzzy(v, d) => GraphOps.fuzzyMatch(c, v, d)
      case FuzzyPrefix(v, d) => GraphOps.fuzzyPrefixMatch(c, v, d)
    }
  }

  /** Typed node constraint — the reference's full node triple (value,
    * node_type ∈ {ENTITY, LABEL, RESOURCE, USER}, subtype):
    * `graph_query_parser.rs:55-60` and the indexed `source_type`/
    * `source_subtype` columns (`nidx_relation/src/schema.rs:41-46`). */
  final case class NodeSpec(
      value: NodeMatch = NodeMatch.Any,
      nodeType: Option[String] = None,
      subtype: Option[String] = None)

  /** Typed relation constraint — label + relation_type ∈ {CHILD,
    * ABOUT, ENTITY, COLAB, SYNONYM, OTHER}
    * (`graph_query_parser.rs:62-65`, `utils.proto:30-37`). */
  final case class RelSpec(
      label: Option[String] = None,
      relType: Option[String] = None)

  /** Path query tree: triplet constraints composed with OR/AND/NOT —
    * the proto's full boolean algebra (`graph_query.proto` BoolOr/
    * BoolAnd/BoolNot, parsed at `graph_query_parser.rs:666-690`; the
    * expression-syntax sub-parser exposes only OR/NOT but the find
    * RELATIONS feature composes entry points AND NOT deleted nodes
    * through the proto, `parsers/unit_retrieval.py:178-185`).
    * [[PathQuery.Path]] is the value-only form; [[PathQuery.TypedPath]]
    * adds the node-type/subtype/relation-type dimensions of the typed
    * data model. */
  sealed trait PathQuery
  object PathQuery {
    final case class Path(
        src: NodeMatch = NodeMatch.Any,
        rel: Option[String] = None,
        dst: NodeMatch = NodeMatch.Any,
        undirected: Boolean = false) extends PathQuery
    final case class TypedPath(
        src: NodeSpec = NodeSpec(),
        rel: RelSpec = RelSpec(),
        dst: NodeSpec = NodeSpec(),
        undirected: Boolean = false) extends PathQuery
    final case class Or(ops: Seq[PathQuery]) extends PathQuery
    final case class And(ops: Seq[PathQuery]) extends PathQuery
    final case class Not(op: PathQuery) extends PathQuery
  }

  /** `facetsCol` (optional `array<string>`) carries edge provenance
    * facets like `/g` generated-by (`noderesources.proto:201-205`);
    * the typed columns carry the reference's node type/subtype and
    * relation type (`nidx_relation/src/schema.rs:41-48`) — required
    * only when a [[PathQuery.TypedPath]] constrains that dimension. */
  final case class EdgeTable(edges: DataFrame, srcCol: String, relCol: String,
      dstCol: String, facetsCol: Option[String] = None,
      srcTypeCol: Option[String] = None, srcSubtypeCol: Option[String] = None,
      dstTypeCol: Option[String] = None, dstSubtypeCol: Option[String] = None,
      relTypeCol: Option[String] = None,
      // resource provenance of each edge row (the reference's
      // `resource_field_id` term, `nidx_relation/src/schema.rs` +
      // `reader.rs:261-272`) — required only for PREFILTERED searches;
      // bind [[graft.sources.Ingest.relationIndex]]'s `edge_resources`
      // table to search at per-resource granularity
      resourceCol: Option[String] = None)

  /** The prefilter intersection the reference applies to every graph
    * query (`reader.rs:261-272` apply_prefilter: `PrefilterResult::Some`
    * becomes a resource-id term-set intersected with the path query;
    * the query planner feeds the SAME prefilter result to relations as
    * to every other sub-search, `query_planner.rs:154-166`). Spark
    * shape: one LEFT SEMI join of the matching edge rows against the
    * allowed resource ids (first column of `allowed`) — broadcastable
    * when the prefilter is selective, and an EMPTY allowed set empties
    * the result for free (the `PrefilterResult::None` shortcut).
    */
  private def applyPrefilter(t: EdgeTable, matched: DataFrame,
      allowed: Option[DataFrame]): DataFrame =
    allowed match {
      case None => matched
      case Some(ids) =>
        val rc = t.resourceCol.getOrElse(throw new IllegalArgumentException(
          "a prefiltered graph search needs the EdgeTable to declare its " +
            "resource provenance column (bind the edge_resources table)"))
        matched.join(
          ids.select(ids.columns.head).toDF("__allowed_res"),
          col(rc) === col("__allowed_res"), "left_semi")
    }

  /** Facet filter on edges (include/exclude provenance facets). */
  def facetFilter(t: EdgeTable, include: Seq[String], exclude: Seq[String] = Nil): Column =
    t.facetsCol match {
      case None => lit(true)
      case Some(c) =>
        val inc = include.map(f => array_contains(col(c), f)).foldLeft(lit(true))(_ && _)
        val exc = exclude.map(f => !array_contains(col(c), f)).foldLeft(lit(true))(_ && _)
        inc && exc
    }

  def compile(q: PathQuery, t: EdgeTable): Column = q match {
    case PathQuery.Or(ops) => ops.map(compile(_, t)).reduce(_ || _)
    case PathQuery.And(ops) => ops.map(compile(_, t)).reduce(_ && _)
    case PathQuery.Not(op) => !compile(op, t)
    case PathQuery.Path(src, rel, dst, undirected) =>
      val relPred = rel.map(col(t.relCol) === _).getOrElse(lit(true))
      val fwd = NodeMatch.compile(src, col(t.srcCol)) &&
        NodeMatch.compile(dst, col(t.dstCol)) && relPred
      if (!undirected) fwd
      else fwd || (NodeMatch.compile(src, col(t.dstCol)) &&
        NodeMatch.compile(dst, col(t.srcCol)) && relPred)
    case PathQuery.TypedPath(src, rel, dst, undirected) =>
      // a typed constraint against a table that never declared that
      // column is a caller bug — fail loudly, not trivially-true
      def typed(c: Option[String], v: Option[String], what: String): Column =
        v match {
          case None => lit(true)
          case Some(x) =>
            val cc = c.getOrElse(throw new IllegalArgumentException(
              s"$what constraint needs the EdgeTable to declare its column"))
            col(cc) === x
        }
      // an endpoint's (type, subtype) columns travel WITH the endpoint
      // when `undirected` swaps the value match — a source-typed
      // constraint must match the dst columns in the reversed
      // orientation, exactly like the value does
      def endpoint(n: NodeSpec, valueCol: String, typeCol: Option[String],
          subCol: Option[String]): Column =
        NodeMatch.compile(n.value, col(valueCol)) &&
          typed(typeCol, n.nodeType, "node-type") &&
          typed(subCol, n.subtype, "node-subtype")
      val relPred = rel.label.map(col(t.relCol) === _).getOrElse(lit(true)) &&
        typed(t.relTypeCol, rel.relType, "relation-type")
      val fwd = endpoint(src, t.srcCol, t.srcTypeCol, t.srcSubtypeCol) &&
        endpoint(dst, t.dstCol, t.dstTypeCol, t.dstSubtypeCol) && relPred
      if (!undirected) fwd
      else fwd || (endpoint(src, t.dstCol, t.dstTypeCol, t.dstSubtypeCol) &&
        endpoint(dst, t.srcCol, t.srcTypeCol, t.srcSubtypeCol) && relPred)
  }

  /** Run a path query: matching triplets, deduplicated, top-k in
    * deterministic (src, rel, dst) order. `allowedResources` (an
    * optional 1-column id set — a compiled FilterExpr/Security
    * prefilter result) intersects via [[applyPrefilter]]; it requires
    * an [[EdgeTable]] with resource provenance. */
  def search(t: EdgeTable, q: PathQuery, topK: Int = 50,
      allowedResources: Option[DataFrame] = None): DataFrame =
    applyPrefilter(t, t.edges.where(compile(q, t)), allowedResources)
      .select(col(t.srcCol).as("source"), col(t.relCol).as("relation"),
        col(t.dstCol).as("destination"))
      .distinct()
      .orderBy("source", "relation", "destination")
      .limit(topK)

  /** `/graph/nodes` — the same path-query engine projected to the
    * UNIQUE node values of every matching triplet (both endpoints),
    * top-k in value order (`search/api/v1/graph.py:93-111`: the nodes
    * response is the path results' node set). */
  def nodesSearch(t: EdgeTable, q: PathQuery, topK: Int = 50,
      allowedResources: Option[DataFrame] = None): DataFrame =
    applyPrefilter(t, t.edges.where(compile(q, t)), allowedResources)
      .select(explode(array(col(t.srcCol), col(t.dstCol))).as("value"))
      .distinct()
      .orderBy("value")
      .limit(topK)

  /** `/graph/relations` — projected to the UNIQUE relation labels of
    * every matching triplet (`search/api/v1/graph.py:124-145`). */
  def relationsSearch(t: EdgeTable, q: PathQuery, topK: Int = 50,
      allowedResources: Option[DataFrame] = None): DataFrame =
    applyPrefilter(t, t.edges.where(compile(q, t)), allowedResources)
      .select(col(t.relCol).as("label"))
      .distinct()
      .orderBy("label")
      .limit(topK)

  /** One query entry point for find's RELATIONS feature — the user's
    * explicit `query_entities` entry (`parsers/find.py:188-197`: value
    * exact, type/subtype optional) or a detected entity standing in
    * for the external NER (`fetcher.get_detected_entities`). */
  final case class EntryPoint(
      value: String,
      nodeType: Option[String] = None,
      subtype: Option[String] = None)

  /** Find's RELATIONS feature: the distance-1 neighbour subgraph of
    * the query's entry points, as one DirectionalRelation row per
    * matched path (`merge.py:426-477` merge_relations_results over the
    * legacy relation query, `parsers/unit_retrieval.py:102-185`
    * _apply_relation_query).
    *
    * Query shape (the reference's exact composition): OR of one
    * undirected exact typed path per entry point, AND NOT the deleted
    * nodes (one undirected (value, subtype) path each — the request
    * groups them per subtype but the parser splits, there is no OR at
    * node-value level), AND NOT the deleted subtype groups. The find
    * prefilter reaches this sub-search like every other
    * (`query_planner.rs:154-166`).
    *
    * Merge shape: a path whose ORIGIN is an entry point value is an
    * OUT relation under that entry; otherwise a path whose destination
    * is one is an IN relation under it — the reference's elif, so a
    * path between two entry points lands only under its origin
    * (`merge.py:450-475`). Entry points with no matching path
    * contribute no rows (the reference serializes them as empty
    * subgraphs — response-shaping, not retrieval). Typed output
    * columns are null when the EdgeTable doesn't declare them.
    *
    * Scale shape: entry values are a request-sized IN predicate at the
    * scan (no join); the page cut runs BEFORE the merge projection at
    * the request's result window in deterministic triplet order (the
    * reference cuts paths at result_per_page in the index,
    * `reader.rs:114-136`); the direction tagging is a scan-stage
    * when/otherwise over the cut page. */
  def relationsSubgraph(
      t: EdgeTable,
      entryPoints: Seq[EntryPoint],
      deletedEntities: Map[String, Seq[String]] = Map.empty,
      deletedGroups: Seq[String] = Nil,
      topK: Int = 50,
      allowedResources: Option[DataFrame] = None): DataFrame = {
    require(entryPoints.nonEmpty, "relations feature needs entry points " +
      "(detected or explicit query_entities)")
    def orOf(qs: Seq[PathQuery]): PathQuery =
      if (qs.size == 1) qs.head else PathQuery.Or(qs)
    val eps = orOf(entryPoints.map(ep => PathQuery.TypedPath(
      src = NodeSpec(NodeMatch.Exact(ep.value), ep.nodeType, ep.subtype),
      undirected = true)))
    val deleted = deletedEntities.toSeq.sortBy(_._1).flatMap { case (st, vs) =>
      vs.map(v => PathQuery.TypedPath(
        src = NodeSpec(NodeMatch.Exact(v), subtype = Some(st)),
        undirected = true))
    }
    val groups = deletedGroups.map(g => PathQuery.TypedPath(
      src = NodeSpec(subtype = Some(g)), undirected = true))
    val sub = Seq(Some(eps),
      if (deleted.nonEmpty) Some(PathQuery.Not(orOf(deleted))) else None,
      if (groups.nonEmpty) Some(PathQuery.Not(orOf(groups))) else None).flatten
    val q = if (sub.size == 1) sub.head else PathQuery.And(sub)
    val page = applyPrefilter(t, t.edges.where(compile(q, t)), allowedResources)
      .orderBy(col(t.srcCol), col(t.relCol), col(t.dstCol))
      .limit(topK)
    def opt(c: Option[String]): Column =
      c.map(col).getOrElse(lit(null).cast("string"))
    // membership is by entry VALUE alone, deliberately ignoring the
    // entry's typed constraints: the reference keys its subgraphs by
    // `entry_point.value` and attributes every path whose origin value
    // matches ANY key (`merge.py:434-450` — `relations.entities[
    // entry_point.value]`, `if origin.value in relations.entities`),
    // so a path matched via one entry's typed query can land under a
    // same-valued other entry — parity includes that edge case
    val epVals = entryPoints.map(_.value)
    val isOut = col(t.srcCol).isInCollection(epVals)
    val isIn = col(t.dstCol).isInCollection(epVals)
    page
      // belt over the query's own guarantee (every matched path has at
      // least one entry endpoint): a row tagging as neither direction
      // never reaches the output
      .where(isOut || isIn)
      .select(
        when(isOut, col(t.srcCol)).otherwise(col(t.dstCol)).as("entry_point"),
        when(isOut, lit("out")).otherwise(lit("in")).as("direction"),
        when(isOut, col(t.dstCol)).otherwise(col(t.srcCol)).as("entity"),
        when(isOut, opt(t.dstTypeCol)).otherwise(opt(t.srcTypeCol))
          .as("entity_type"),
        when(isOut, opt(t.dstSubtypeCol)).otherwise(opt(t.srcSubtypeCol))
          .as("entity_subtype"),
        col(t.relCol).as("relation_label"),
        opt(t.relTypeCol).as("relation_type"),
        opt(t.resourceCol).as("resource_id"))
  }

  /** Over-request clamp for semantic node/edge matches — relation
    * labels carry multiple vectors (one per field occurrence), so the
    * planner asks for topK×10 clamped to [50, 200] to keep duplicates
    * from crowding out unique labels (`query_planner.rs:44-58`,
    * GRAPH_VECTOR_OVERREQUEST_FACTOR/_MIN/_MAX). */
  def vectorOverRequest(topK: Int): Int =
    math.min(200, math.max(50, topK * 10))

  /** Graph semantic EDGE match — the `vector_edge_requests` side of the
    * reference's graph planner (`query_planner.rs:96-140`): the
    * relation constraint is a VECTOR, not a term. The edge-label
    * vectorset is searched for the [[vectorOverRequest]] nearest labels
    * above `edgeMinScore`, the surviving labels become the relation
    * term set (the q46 node variant's dual), and matching edges rank by
    * their relation's similarity.
    *
    * Scale shape: the label search is a broadcast-query brute-force
    * top-k over the (label-sized, not corpus-sized) vectorset; the
    * resulting ≤200-row label list broadcasts into the edge scan as an
    * equi-join — the edge table never shuffles.
    */
  def semanticEdgeSearch(
      t: EdgeTable,
      relVectors: DataFrame,
      relIdCol: String,
      relVecCol: String,
      query: DataFrame,
      queryVecCol: String,
      pathFilter: PathQuery = PathQuery.Path(),
      topK: Int = 50,
      edgeMinScore: Double = -1.0,
      // the reference's relation-edge vectorsets default to DOT
      // similarity (`nidx_vector/src/config.rs:150-160`
      // for_relation_edges); cosine kept as this engine's historical
      // default — pass Dot for reference-default parity
      similarity: graft.functions.VectorFunctions.Similarity =
        graft.functions.VectorFunctions.Similarity.Cosine): DataFrame = {
    val topRels = graft.operators.VectorSearch.bruteForceTopK(
      relVectors, relIdCol, relVecCol, query, queryVecCol,
      vectorOverRequest(topK), edgeMinScore, similarity)
    // The surviving label list is DRIVER-SCALE BY CONSTRUCTION — the
    // over-request clamp caps it at 200 (`query_planner.rs:44-58`), the
    // same bounded-collect contract as the clamped graph frontiers. It
    // lands in the edge scan as a `relation IN (...)` predicate, which
    // pushes into the parquet reader (row-group pruning at rest) so the
    // dedup exchange carries only matching edges; an empty label list
    // (everything under edgeMinScore) short-circuits without touching
    // the edge table at all. rel_score is a function of the relation,
    // so distinct after the filter equals distinct-then-join.
    val labelRows = topRels.collect()
    if (labelRows.isEmpty)
      return t.edges.select(col(t.srcCol).as("source"),
        col(t.relCol).as("relation"), col(t.dstCol).as("destination"),
        lit(0.0).as("rel_score")).limit(0)
    val labels = labelRows.map(_.get(0))
    // the broadcast score side is rebuilt from the COLLECTED rows — a
    // local relation, so the label top-k plan executes exactly once
    val spark = t.edges.sparkSession
    val localRels = spark.createDataFrame(
      java.util.Arrays.asList(labelRows: _*),
      topRels.schema)
    t.edges.where(compile(pathFilter, t) && col(t.relCol).isInCollection(labels))
      .select(col(t.srcCol).as("source"), col(t.relCol).as("relation"),
        col(t.dstCol).as("destination"))
      .distinct()
      .join(broadcast(localRels.select(col(relIdCol).as("relation"),
        col("score").as("rel_score"))), "relation")
      .select(col("source"), col("relation"), col("destination"), col("rel_score"))
      .orderBy(col("rel_score").desc, col("relation"), col("source"),
        col("destination"))
      .limit(topK)
  }
}
