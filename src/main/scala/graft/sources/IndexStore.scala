package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** At-rest index tables for a corpus directory — the serving-side view
  * of [[Ingest.buildIndex]].
  *
  * The reference never tokenizes at search time: ingest builds tantivy
  * segments and `/find`/`/search` serve postings from disk
  * (`nidx/nidx_text/src/reader.rs:367-451`). The Spark-native analog is
  * parquet tables — postings (term, id, tf), doc lengths, and the
  * paragraph table — materialized once per corpus and scanned with
  * predicate pushdown at query time (`term IN (...)` reaches the
  * parquet reader as a PushedFilter, so a query touches the matching
  * posting rows, not the corpus).
  *
  * The store builds each corpus directory's index lazily on first
  * access and memoizes it for the JVM lifetime — the test/bench analog
  * of "ingest ran before the first query". Production deployments run
  * [[Ingest.buildIndex]] in the ingest pipeline instead and read the
  * tables directly.
  */
object IndexStore {

  /** The index tables every query-surface caller consumes. */
  final case class IndexTables(
      postings: DataFrame,
      docLengths: DataFrame,
      paragraphs: DataFrame)

  private val built = scala.collection.mutable.Map[String, String]()

  /** Index directory for `sfDir`'s documents table, building it on
    * first access (one tokenize pass over the corpus — the ingest-time
    * cost the query path no longer pays).
    */
  def indexDir(spark: SparkSession, sfDir: String): String = synchronized {
    built.getOrElseUpdate(sfDir, {
      val out = Files.createTempDirectory("graft-index-").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      Ingest.buildIndex(docs, "doc_id", "text", out, withVectors = false)
      out
    })
  }

  def tables(spark: SparkSession, sfDir: String): IndexTables = {
    val dir = indexDir(spark, sfDir)
    IndexTables(
      postings = spark.read.parquet(s"$dir/postings"),
      docLengths = spark.read.parquet(s"$dir/doclengths"),
      paragraphs = spark.read.parquet(s"$dir/paragraphs"))
  }

  def postings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${indexDir(spark, sfDir)}/postings")

  def docLengths(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${indexDir(spark, sfDir)}/doclengths")

  def paragraphs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${indexDir(spark, sfDir)}/paragraphs")
}
