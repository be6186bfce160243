package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, Rerankers}

/** The /ask GRAPH rag strategy — `search/search/graph_strategy.py`:
  * retrieve prompt context by walking the relation graph from the
  * query's entities instead of (or alongside) keyword/semantic search.
  * The flow (`get_graph_results`, graph_strategy.py:315-465):
  *
  *  1. hop 0 detects the query's entities with the /suggest
  *     methodology — each query WORD fuzzy-matches (distance 1) any
  *     word of any node value, undirected (`fuzzy_search_entities`,
  *     :468-501); the PREDICT detection mode is the external model
  *     this engine isolates behind fixtures, like query embeddings;
  *  2. each hop finds the frontier's neighbour relations — paths whose
  *     source is a frontier entity (undirected), EXCLUDING any path
  *     touching an already-explored entity, restricted to
  *     entity-to-entity relations (`find_graph_neighbours`, :931-977);
  *     newly discovered nodes become the next frontier, the old
  *     frontier joins the explored set, and the loop breaks when
  *     nothing new appears;
  *  3. after each hop the ACCUMULATED relations re-rank: the external
  *     reranker scores each unique triplet sentence and the graph
  *     prunes to the top_k above the threshold
  *     (`rank_relations_reranker` → `_scores_to_ranked_rels`,
  *     :503-705) — the model is isolated behind
  *     [[graft.operators.Rerankers.Scorer]] (TokenOverlap stand-in,
  *     the q45 contract);
  *  4. the surviving relations become text blocks: either one block
  *     per unique direction-normalized triplet carrying the manual
  *     "- head rel tail" text (`relation_text_as_paragraphs`,
  *     `build_text_blocks_from_relations`, :707-784) with the
  *     reference's faked `{rid}/a/usermetadata/{n}-{n+1}` paragraph id
  *     when the relation carries no paragraph metadata, or the
  *     relations' provenance PARAGRAPHS with per-field containment
  *     merging (`get_paragraph_info_from_relations`, :785-843), text
  *     hydrated from the at-rest paragraph table
  *     (`only_hydrate_empty`).
  *
  * Spark shape: frontiers are bounded driver lists (entity detection
  * top-50, `perHopPaths` per hop — the reference's GraphSearchRequest
  * top_k=100), so every hop is ONE pruned scan of the undirected edge
  * view with broadcast-able IN predicates — the
  * [[graft.operators.GraphOps.iterativeExpandFrom]] pattern with the
  * reference's exact explored-set exclusion semantics. Ranking and
  * block building operate on the accumulated driver-side relation
  * list (≤ hops × perHopPaths rows by construction).
  *
  * Documented divergences: per-hop path and entity cuts order
  * deterministically by value (the reference takes tantivy's top_k in
  * index order); the faked-paragraph counter walks triplets in sorted
  * order (the reference walks Python dict insertion order); a
  * multi-relation triplet takes the faked id directly (the
  * reference's first-metadata-then-overwrite quirk,
  * :740-748, is not reproduced).
  */
object GraphRag {

  /** `GraphStrategy` (`nucliadb_models/search.py:1413+`); the score
    * threshold default is the ranker's own
    * (`rank_relations_reranker`'s 0.02, graph_strategy.py:509) — a
    * triplet scoring AT or below it drops (`_scores_to_ranked_rels`
    * skips `score <= score_threshold`). */
  final case class Config(
      hops: Int = 1,
      topK: Int = 20,
      relationTextAsParagraphs: Boolean = false,
      scoreThreshold: Double = 0.02,
      perHopPaths: Int = 100,
      entityTopK: Int = 50)

  /** One surviving relation occurrence, direction-normalized
    * (driver-side, bounded). */
  private final case class Rel(
      head: String, label: String, tail: String,
      resource: String, paragraph: Option[String]) {
    def triplet: (String, String, String) = (head, label, tail)
  }

  /** `fuzzy_search_entities` (graph_strategy.py:468-501): the query's
    * entities via the suggest methodology — per query word, a node
    * matches when ANY word of its value is within edit distance 1,
    * either endpoint (undirected). Returns the distinct matching node
    * values, value-ordered, cut to `topK`. */
  def queryEntities(
      t: GraphSearch.EdgeTable, query: String, topK: Int = 50): DataFrame = {
    val words = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    if (words.isEmpty)
      return t.edges.select(col(t.srcCol).as("value")).limit(0)
    def m(c: Column): Column =
      words.map(w => GraphOps.fuzzyWordsMatch(c, w, 1))
        .reduce(_ || _)
    t.edges
      .select(explode(array(col(t.srcCol), col(t.dstCol))).as("value"))
      .where(m(col("value")))
      .distinct()
      .orderBy("value")
      .limit(topK)
  }

  /** Run the strategy; returns the retrieval blocks
    * (paragraph_id, rid, score, text) in score-desc order, cut to
    * `cfg.topK`. `corpus` hydrates mode-B paragraph texts (its bound
    * index's paragraph table); triplet-text blocks (mode A) need none. */
  def retrieve(
      t: GraphSearch.EdgeTable,
      query: String,
      cfg: Config = Config(),
      corpus: Option[Find.Corpus] = None,
      paragraphCol: Option[String] = None,
      scorer: Rerankers.Scorer = Rerankers.TokenOverlap): DataFrame = {
    val spark = t.edges.sparkSession
    import spark.implicits._
    // mode A fakes `{rid}/a/usermetadata/...` ids from the RESOURCE
    // provenance — without it the ids would be malformed; fail with
    // the remedy instead (the requireProvenanceFor pattern)
    require(!cfg.relationTextAsParagraphs || t.resourceCol.isDefined,
      "relation_text_as_paragraphs needs edge resource provenance — " +
        "bind EdgeTable.resourceCol (e.g. the relation index's " +
        "edge_resources table)")

    // ONE undirected view over the provenance-bearing edge rows; every
    // hop prunes it with request-sized IN predicates
    val res = t.resourceCol.map(col).getOrElse(lit(null).cast("string"))
    val par = paragraphCol.map(col).getOrElse(lit(null).cast("string"))
    val relType = t.relTypeCol.map(col).getOrElse(lit(null).cast("string"))
    def side(node: Column, nbr: Column, out: Boolean) =
      t.edges.select(node.as("node"), col(t.relCol).as("label"),
        nbr.as("nbr"), lit(out).as("out"), res.cast("string").as("res"),
        par.cast("string").as("par"), relType.as("rtype"))
    val und = side(col(t.srcCol), col(t.dstCol), out = true)
      .unionByName(side(col(t.dstCol), col(t.srcCol), out = false))

    var frontier = queryEntities(t, query, cfg.entityTopK)
      .collect().map(_.getString(0)).toSeq
    var explored = Set.empty[String]
    var rels = Vector.empty[Rel]
    val queryTerms = query.toLowerCase.split("[^a-z0-9]+")
      .filter(_.nonEmpty).distinct.toSeq

    var hop = 0
    var continue = frontier.nonEmpty
    var scores = Map.empty[(String, String, String), Double]
    while (hop < cfg.hops && continue) {
      // the frontier's neighbour relations, excluding paths that touch
      // explored entities (frontier ∩ explored = ∅ by construction, so
      // only the far endpoint needs the check) and non-entity-to-entity
      // relations when the edge table carries relation types. An edge
      // whose BOTH endpoints are frontier entities matches in BOTH
      // orientations of the undirected view, but it is ONE path in the
      // reference's response — dedup on the direction-normalized
      // occurrence identity before the per-hop cut
      val matched = und
        .where(col("node").isInCollection(frontier) &&
          (if (explored.isEmpty) lit(true)
           else !col("nbr").isInCollection(explored.toSeq)) &&
          (if (t.relTypeCol.isEmpty) lit(true)
           else col("rtype") === "ENTITY"))
        .select(
          when(col("out"), col("node")).otherwise(col("nbr")).as("h"),
          col("label"),
          when(col("out"), col("nbr")).otherwise(col("node")).as("tl"),
          col("res"), col("par"), col("node"), col("nbr"))
        .dropDuplicates("h", "label", "tl", "res", "par")
        .orderBy(col("h"), col("label"), col("tl"), col("res"))
        .limit(cfg.perHopPaths)
        .collect()
      val hopRels = matched.map(r => Rel(
        r.getAs[String]("h"), r.getAs[String]("label"),
        r.getAs[String]("tl"),
        Option(r.getAs[String]("res")).getOrElse(""),
        Option(r.getAs[String]("par"))))
      // only_with_metadata (merge_relations_results): without
      // relation_text_as_paragraphs only paragraph-bearing relations
      // survive the merge
      rels = rels ++ (if (cfg.relationTextAsParagraphs) hopRels
        else hopRels.filter(_.paragraph.isDefined))

      // discovered = every endpoint of the hop's paths not yet walked
      // (the reference's response NODES minus explored/frontier)
      val discovered = matched
        .flatMap(r => Seq(r.getAs[String]("node"), r.getAs[String]("nbr")))
        .distinct
        .filterNot(explored.contains).filterNot(frontier.contains)
      explored = explored ++ frontier
      frontier = discovered.sorted
      continue = discovered.nonEmpty

      // re-rank the ACCUMULATED graph after every hop: score each
      // unique triplet sentence, keep the top_k above the threshold,
      // expand back to the original occurrences
      if (rels.nonEmpty) {
        val allScores =
          scoreTriplets(spark, rels.map(_.triplet).distinct, queryTerms,
            scorer)
        scores = allScores.toSeq
          .sortBy { case ((h, l, tl), s) => (-s, h, l, tl) }
          .take(cfg.topK)
          .filter(_._2 > cfg.scoreThreshold)
          .toMap
        rels = rels.filter(r => scores.contains(r.triplet))
      }
      hop += 1
    }

    if (rels.isEmpty) return emptyBlocks(spark)

    if (cfg.relationTextAsParagraphs) {
      // one block per unique triplet, manual "- head rel tail" text;
      // paragraph-less triplets fake `{rid}/a/usermetadata/{n}-{n+1}`
      var fakeN = 0
      val blocks = rels.groupBy(_.triplet).toSeq
        .sortBy { case ((h, l, tl), _) => (h, l, tl) }
        .map { case ((h, l, tl), occ) =>
          val score = scores((h, l, tl))
          val pid = occ.flatMap(_.paragraph).headOption match {
            case Some(p) if occ.size == 1 => p
            case _ =>
              val p = s"${occ.head.resource}/a/usermetadata/$fakeN-${fakeN + 1}"
              fakeN += 1
              p
          }
          (pid, pid.takeWhile(_ != '/'), score, s"- $h $l $tl")
        }
      spark.createDataFrame(blocks)
        .toDF("paragraph_id", "rid", "score", "text")
        .orderBy(col("score").desc, col("paragraph_id").asc)
        .limit(cfg.topK)
    } else {
      // provenance paragraphs, containment-merged per field: sort
      // (start asc, end desc); a span ending at or before the running
      // max end merges into its container (max score)
      val withPid = rels.flatMap(r =>
        r.paragraph.map(p => (p, scores(r.triplet))))
      val parsed = withPid.flatMap { case (pid, s) =>
        val parts = pid.split("/")
        val span = "^(\\d+)-(\\d+)$".r.findFirstMatchIn(parts.last)
        span.map(g => (pid, parts.dropRight(1).mkString("/"),
          g.group(1).toInt, g.group(2).toInt, s))
      }
      val merged = parsed.groupBy(_._2).toSeq.flatMap { case (_, spans) =>
        val sorted = spans.sortBy { case (_, _, st, en, _) => (st, -en) }
        var kept = Vector.empty[(String, String, Int, Int, Double)]
        var maxEnd = -1
        sorted.foreach { case row @ (_, _, _, en, s) =>
          if (en <= maxEnd) {
            val c = kept.last
            kept = kept.init :+ c.copy(_5 = math.max(c._5, s))
          } else { kept = kept :+ row; maxEnd = en }
        }
        kept
      }
      val blocksDf = spark.createDataFrame(
        merged.map { case (pid, _, _, _, s) =>
          (pid, pid.takeWhile(_ != '/'), s)
        }).toDF("paragraph_id", "rid", "score")
      // only_hydrate_empty: paragraph blocks hydrate from the at-rest
      // table; unknown ids keep null text (skip-silently contract)
      val hydrated = corpus.flatMap(_.index) match {
        case None => blocksDf.withColumn("text", lit(null).cast("string"))
        case Some(ix) =>
          val groups = merged.map(_._2).distinct
          blocksDf.join(
            Hydrate.rankedFieldParagraphs(ix, groups)
              .select(col("__pid").as("paragraph_id"),
                col("__txt").as("text")),
            Seq("paragraph_id"), "left")
      }
      hydrated
        .select(col("paragraph_id"), col("rid"), col("score"), col("text"))
        .orderBy(col("score").desc, col("paragraph_id").asc)
        .limit(cfg.topK)
    }
  }

  /** Score each unique triplet's sentence against the query with the
    * (fixture-isolated) reranker model — driver-bounded input, one
    * tiny job. */
  private def scoreTriplets(
      spark: SparkSession,
      triplets: Seq[(String, String, String)],
      queryTerms: Seq[String],
      scorer: Rerankers.Scorer): Map[(String, String, String), Double] = {
    import spark.implicits._
    if (triplets.isEmpty) return Map.empty
    triplets.toDF("h", "l", "t")
      .withColumn("__score", scorer.score(queryTerms,
        concat_ws(" ", col("h"), col("l"), col("t"))))
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getDouble(3)))
      .toMap
  }

  private def emptyBlocks(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("paragraph_id", StringType),
        StructField("rid", StringType),
        StructField("score", DoubleType),
        StructField("text", StringType))))
  }
}
