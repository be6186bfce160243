package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders and shared oracle-parity SQL fragments.
  *
  * All engine queries read the driver-generated parquet tables under a
  * scale-factor directory (TESTDATA.md). Loading stays lazy: Parquet
  * scans get column pruning + predicate pushdown from Catalyst, so each
  * query only reads what it projects/filters.
  */
object Tables {
  // memoized per (session, path): a `spark.read.parquet` pays file
  // listing + footer schema reads EAGERLY at DataFrame creation —
  // ~0.1 s per table on a local FS, and serving-path requests touch up
  // to ten tables. The testdata dirs are immutable for the JVM
  // lifetime, so the plan (not the data — scans stay lazy) is safely
  // reusable. Writable paths (LSM segment dirs) must NOT go through
  // this cache. The memo itself lives in IndexStore's per-session
  // cache object — ONE explicit-invalidate surface: a
  // session-per-tenant server calls [[invalidate]] (≡
  // `IndexStore.invalidate`) when it stops a session, and everything
  // memoized for that session (table plans here, index tables, vector
  // indexes, language models there) drops together.
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.IndexStore.readParquetMemo(spark, s"$dir/$name.parquet")

  /** Drop every plan cached for `spark` — call when stopping a session
    * so its plan trees and state become collectable. Alias for
    * [[graft.sources.IndexStore.invalidate]] (one shared per-session
    * cache). */
  def invalidate(spark: SparkSession): Unit =
    graft.sources.IndexStore.invalidate(spark)

  /** events table with `ts` normalized to TimestampType.
    *
    * The driver writes `ts` as parquet TIMESTAMP(NANOS), which Spark
    * only reads with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench sessions) — as nanos-since-epoch longs. Convert with
    * integral division (a double round-trip would lose precision above
    * 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  /** documents with the nucliadb-style facet labels column attached:
    * `/s/p/{lang}` (language facet) and `/u/s/{source}` (origin facet) —
    * the taxonomy shape from docs/internal/SEARCH.md.
    */
  def documentsWithLabels(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents").withColumn("labels",
      array(concat(lit("/s/p/"), col("lang")),
        concat(lit("/u/s/"), col("source"))))
}
