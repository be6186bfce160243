package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The paragraph-hydration endpoint — `POST /kb/{kbid}/hydrate`
  * (`search/api/v1/hydrate.py:56-300`,
  * `search/search/hydrator/paragraphs.py`): given a SET of paragraph
  * ids and a hydration config, return each paragraph's text plus its
  * RELATED paragraphs — the positional neighbours (n before / n after
  * within the same field, `ParagraphIndex.n_previous/n_next`) — with
  * the neighbour paragraphs themselves hydrated text-only and added to
  * the response (`hydrate.py:270-300`). Invalid ids and ids naming
  * unknown resources/fields are skipped, never errors
  * (`hydrate.py:200-218`).
  *
  * Spark shape: the request ids are driver-sized by construction, so
  * the field-prefix set broadcasts into ONE semi-join on the at-rest
  * paragraph tables — the scan touches only the requested ids' fields
  * — and the per-field ordering window partitions on the field key
  * (bounded by a field's paragraph count, never the corpus).
  *
  * Divergences from the reference, both deliberate:
  *  - the response is ONE flat DataFrame (a row per hydrated
  *    paragraph, resource fields denormalized) instead of the
  *    resources/fields/paragraphs maps — the idiomatic relational
  *    rendering of the same payload;
  *  - a paragraph that is BOTH requested and pulled in as a neighbour
  *    keeps its full (related-bearing) hydration — the reference's
  *    builder overwrites it with the text-only neighbour version
  *    (`hydrate.py:286-300` add_paragraph last-write-wins), losing
  *    the related refs it just computed;
  *  - only at-rest paragraphs hydrate: the reference can slice
  *    "made-up" spans out of the stored field text
  *    (`paragraphs.py:184-187`); this engine's store is
  *    paragraph-grain, so unknown spans skip like unknown ids.
  */
object Hydrate {

  /** `hydration.py:130-141` NeighbourParagraphHydration. */
  final case class Neighbours(before: Int = 0, after: Int = 0)

  /** The supported slice of `hydration.py:203-246` Hydration: text
    * on/off, positional-neighbour expansion, and the resource title
    * (`ResourceHydration.title`; this corpus synthesizes titles as the
    * a/title field does — the first five tokens). */
  final case class Hydration(
      text: Boolean = true,
      neighbours: Option[Neighbours] = None,
      resourceTitle: Boolean = false)

  /** Hydrate `ids`. Returns one row per hydrated paragraph:
    * (paragraph_id, field, rid, text, related_before, related_after,
    *  requested[, title]) — `related_*` are the neighbour id arrays in
    * positional order on REQUESTED rows (null on neighbour-only rows,
    * like the reference's text-only related hydration), `requested`
    * marks how the row entered the response.
    */
  def paragraphs(
      corpus: Find.Corpus,
      ids: Seq[String],
      h: Hydration = Hydration()): DataFrame = {
    val spark = corpus.docs.sparkSession
    import spark.implicits._
    val ix = corpus.index.getOrElse(throw new IllegalArgumentException(
      "hydrate needs a bound index — run buildIndex/ingest"))

    // lenient id validation (`ParagraphId.from_string` failures skip):
    // {rid}/{ftype}/{fid}/[{split}/]{start}-{end}
    val valid = ids.distinct.filter(id => {
      val parts = id.split("/")
      parts.length >= 4 && parts.last.matches("\\d+-\\d+")
    })

    if (valid.isEmpty)
      return emptyResult(spark, h)

    val reqIds = valid.toDF("__req_pid")
    // group keys of the requested ids, driver-derived (request-sized)
    val groups = valid.map(id => id.substring(0, id.lastIndexOf('/'))).distinct

    val ranked = rankedFieldParagraphs(ix, groups)

    val req = ranked.join(reqIds, col("__pid") === col("__req_pid"))
      .select(col("__pid").as("__src"), col("__grp").as("__src_grp"),
        col("__rank").as("__src_rank"))
    val (nBefore, nAfter) =
      h.neighbours.map(n => (n.before, n.after)).getOrElse((0, 0))

    // neighbour rows per requested id: same field group, rank within
    // the [−before, +after] window — both sides are request-scoped
    val neigh =
      if (nBefore == 0 && nAfter == 0) None
      else Some(ranked.join(req,
          col("__grp") === col("__src_grp") &&
            col("__rank") =!= col("__src_rank") &&
            col("__rank") >= col("__src_rank") - nBefore &&
            col("__rank") <= col("__src_rank") + nAfter)
        .select(col("__src"), col("__pid"), col("__txt"), col("__rank"),
          col("__src_rank")))

    // requested rows with their related refs in positional order
    val related = neigh match {
      case None => req.select(col("__src").as("__pid"),
        lit(null).cast("array<string>").as("related_before"),
        lit(null).cast("array<string>").as("related_after"))
      case Some(n) => req.select(col("__src"))
        .join(n.groupBy("__src")
          .agg(
            sort_array(collect_list(when(col("__rank") < col("__src_rank"),
              struct(col("__rank"), col("__pid"))))).getField("__pid")
              .as("related_before"),
            sort_array(collect_list(when(col("__rank") > col("__src_rank"),
              struct(col("__rank"), col("__pid"))))).getField("__pid")
              .as("related_after")),
          Seq("__src"), "left")
        .select(col("__src").as("__pid"),
          coalesce(col("related_before"), array().cast("array<string>"))
            .as("related_before"),
          coalesce(col("related_after"), array().cast("array<string>"))
            .as("related_after"))
    }

    val requestedRows = ranked
      .join(related, Seq("__pid"))
      .withColumn("requested", lit(true))
    // neighbour-pulled rows hydrate text-only; a row that is ALSO
    // requested keeps its requested hydration (see the divergence note)
    val neighbourRows = neigh.map(_
      .select(col("__pid"), col("__txt")).distinct()
      .join(reqIds, col("__pid") === col("__req_pid"), "left_anti")
      .withColumn("related_before", lit(null).cast("array<string>"))
      .withColumn("related_after", lit(null).cast("array<string>"))
      .withColumn("requested", lit(false)))

    val unioned = neighbourRows match {
      case None => requestedRows.select(col("__pid"), col("__txt"),
        col("related_before"), col("related_after"), col("requested"))
      case Some(nr) => requestedRows.select(col("__pid"), col("__txt"),
        col("related_before"), col("related_after"), col("requested"))
        .unionByName(nr)
    }

    val shaped = unioned.select(
      col("__pid").as("paragraph_id"),
      // field = {rid}/{ftype}/{fid} (FieldId.full(), split excluded)
      concat_ws("/", slice(split(col("__pid"), "/"), 1, 3)).as("field"),
      split(col("__pid"), "/").getItem(0).as("rid"),
      (if (h.text) col("__txt") else lit(null).cast("string")).as("text"),
      col("related_before"), col("related_after"), col("requested"))

    val out =
      if (!h.resourceTitle) shaped
      else {
        val docIdType = corpus.docs.schema(corpus.docId).dataType
        // the corpus's title convention (the a/title field synthesis):
        // first five tokens of the document text
        val titles = corpus.docs.select(
          col(corpus.docId).cast("string").as("rid"),
          concat_ws(" ", slice(
            graft.functions.TextFunctions.tokens(col(corpus.text)), 1, 5))
            .as("title"))
        shaped.join(titles, Seq("rid"), "left")
      }
    out.orderBy(col("requested").desc, col("paragraph_id").asc)
  }

  /** The at-rest paragraph rows of EVERY field (body + non-body),
    * pruned to the requested ORDERING GROUPS and ranked in span order.
    * The ordering group = the id minus its span segment (field id,
    * plus the split for conversation subfields — the reference orders
    * within split_metadata[subfield], `paragraphs.py:90-92`). Shared
    * by the /hydrate neighbour expansion and the /ask neighbouring
    * strategy so the grouping convention cannot drift between them.
    * Returns (__pid, __txt, __grp, __rank); the request-sized group
    * set prunes the scan (broadcast-able IN) before the window runs —
    * partitions bounded by a field's paragraph count, never the
    * corpus. */
  private[api] def rankedFieldParagraphs(
      ix: graft.sources.IndexStore.IndexTables,
      groups: Seq[String]): DataFrame = {
    val grpOf: Column => Column = c =>
      array_join(slice(split(c, "/"), lit(1), size(split(c, "/")) - 1), "/")
    val bodyTab = ix.paragraphs
      .select(col("paragraph_id").as("__pid"), col("p_text").as("__txt"),
        col("start").as("__start"))
    val allPars = ix.fieldParagraphs match {
      case None => bodyTab
      case Some(fp) => bodyTab.unionByName(fp
        .where(!(col("field_type") === "t" && col("field_id") === "body"))
        .select(col("paragraph_id").as("__pid"), col("p_text").as("__txt"),
          col("start").as("__start")))
    }
    allPars.withColumn("__grp", grpOf(col("__pid")))
      .where(col("__grp").isInCollection(groups))
      .withColumn("__rank",
        row_number().over(Window.partitionBy(col("__grp"))
          .orderBy(col("__start").asc, col("__pid").asc)))
      .drop("__start")
  }

  private[api] def emptyResult(
      spark: org.apache.spark.sql.SparkSession, h: Hydration): DataFrame = {
    import org.apache.spark.sql.types._
    val base = StructType(Seq(
      StructField("paragraph_id", StringType), StructField("field", StringType),
      StructField("rid", StringType), StructField("text", StringType),
      StructField("related_before", ArrayType(StringType)),
      StructField("related_after", ArrayType(StringType)),
      StructField("requested", BooleanType)))
    val schema = if (h.resourceTitle)
      StructType(base.fields :+ StructField("title", StringType)) else base
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema)
  }
}
