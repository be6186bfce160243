package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit}

/** At-rest index tables for a corpus directory — the serving-side view
  * of [[Ingest.buildIndex]] / [[Ingest.buildVectorIndex]].
  *
  * The reference never tokenizes at search time: ingest builds tantivy
  * segments and `/find`/`/search` serve postings from disk
  * (`nidx/nidx_text/src/reader.rs:367-451`). The Spark-native analog is
  * parquet tables — postings (term, id, tf), doc lengths, the paragraph
  * table, the term-frequency dictionary, MinHash signatures, and the
  * IVF-PQ vector index — materialized once per corpus and scanned with
  * predicate pushdown at query time (`term IN (...)` reaches the
  * parquet reader as a PushedFilter; a centroid probe reaches the codes
  * table as partition pruning).
  *
  * The store builds each corpus directory's index lazily on first
  * access and memoizes it for the JVM lifetime — the test/bench analog
  * of "ingest ran before the first query". Production deployments run
  * [[Ingest.buildIndex]] in the ingest pipeline instead and read the
  * tables directly.
  *
  * Column contract: the document index binds `doc_id`/`text` and the
  * vector index `vec_id`/`embedding` — the testdata schema. Corpora
  * with other column names run [[Ingest.buildIndex]] directly.
  * Index temp directories register a JVM shutdown hook for deletion,
  * so repeated runs do not accumulate on disk.
  */
object IndexStore {

  /** The index tables every query-surface caller consumes. The
    * paragraph-level posting pair is optional (None for corpora
    * indexed before it existed); [[tables]] always binds it. */
  final case class IndexTables(
      postings: DataFrame,
      docLengths: DataFrame,
      paragraphs: DataFrame,
      parPostings: Option[DataFrame] = None,
      parDocLengths: Option[DataFrame] = None,
      fields: Option[DataFrame] = None,
      fieldParagraphs: Option[DataFrame] = None,
      fieldParPostings: Option[DataFrame] = None,
      fieldParDocLengths: Option[DataFrame] = None,
      // the PARAGRAPH dictionary's SymSpell deletion neighborhood
      // (variant, term — round 15): when bound, the fuzzy fallback's
      // lev≤1 legs run as variant-IN rowgroup lookups instead of a
      // levenshtein scan of the dictionary
      parDeletes: Option[DataFrame] = None,
      // at-rest corpus-level BM25 statistics (round 18,
      // `bm25_stats`): (N, avgdl) per population — unrestricted
      // requests inline them as literals instead of aggregating the
      // doclengths table per request. THUNKS, not values: a batch
      // bind's thunk returns the 3-row table collected at bind
      // (cheap), while a streamed root's thunk aggregates its
      // winner-filtered population lazily — memoized per watermark,
      // so a segment landing never taxes requests that issue no
      // keyword query. `() => None` for index dirs built before the
      // stats table existed.
      docStats: () => Option[graft.functions.Bm25.CorpusStats] = () => None,
      parStatsXrep: () => Option[graft.functions.Bm25.CorpusStats] = () => None,
      parStatsAll: () => Option[graft.functions.Bm25.CorpusStats] = () => None)

  /** The at-rest ANN index ([[Ingest.buildVectorIndex]]'s output as the
    * serving side reads it): driver-scale centroid + codebook literals,
    * the centroid-partitioned binary code table, the assignment table,
    * and the raw-vector table the exact rerank joins into.
    * `similarity`/`normalized` carry the SET'S index config
    * (`nidx_vector/src/config.rs:102-137`) — for a normalized set `raw`
    * is already the normalized vectors (normalization happened at
    * ingest), and the serving side must normalize the QUERY and score
    * with the configured function (`searcher.rs:246-249`).
    */
  final case class VectorIndex(
      centroids: Seq[(Int, Seq[Float])],
      codebook: Seq[(Int, Seq[Float])],
      m: Int,
      nVectors: Long,
      codes: DataFrame,
      assignments: DataFrame,
      raw: DataFrame,
      similarity: graft.functions.VectorFunctions.Similarity =
        graft.functions.VectorFunctions.Similarity.Cosine,
      normalized: Boolean = false)

  /** Everything memoized for one session: bound table plans (eager
    * footer reads paid once — ~0.1 s/table locally, up to ten tables
    * per serving request) and collected driver-side models (IVF
    * centroids/codebooks, language profiles — two collect jobs each,
    * paid once, not per request). Index dirs are write-once per JVM
    * (built under a fresh temp dir, then only read), so reusing the
    * plan is safe — scans stay lazy. Mutable dirs (LSM segments) never
    * go through these caches. NOTE a weak session key would NOT make
    * stopped sessions collectable — cached DataFrames strongly
    * reference their session (the WeakHashMap value→key pitfall) — so
    * the lifecycle is EXPLICIT: a session-per-tenant server calls
    * [[invalidate]] when it stops a session, the same release
    * discipline as [[graft.Caches]].
    */
  private final class SessionCaches {
    val dfs = scala.collection.mutable.Map[String, DataFrame]()
    val tables = scala.collection.mutable.Map[String, IndexTables]()
    val vix = scala.collection.mutable.Map[String, VectorIndex]()
    val vsix = scala.collection.mutable.Map[(String, String), VectorIndex]()
    val lang = scala.collection.mutable.Map[String, Seq[(String, Map[String, Double])]]()
  }
  private val sessionCaches =
    scala.collection.mutable.Map[SparkSession, SessionCaches]()
  // the GLOBAL lock guards only this map lookup (fast); misses compute
  // under the SESSION's own monitor, so one tenant's first-touch build
  // (up to ten eager footer reads, possibly a whole index build) never
  // blocks another session's cache hits. Lock order is session → global
  // (indexDir below) only, never global → session — no cycle.
  private def cachesOf(spark: SparkSession): SessionCaches =
    synchronized { sessionCaches.getOrElseUpdate(spark, new SessionCaches) }

  /** Drop everything cached for `spark` — call when stopping a session
    * so its plan trees and state become collectable. */
  def invalidate(spark: SparkSession): Unit =
    synchronized { sessionCaches.remove(spark); () }

  /** Drop the memoized plans and handles under a path prefix — a
    * RE-INGEST over an existing directory rewrites its part files, and
    * a cached DataFrame still holding the old file listing would serve
    * stale rows or FileNotFound ([[graft.api.Engine]] calls this from
    * its ingest methods). */
  private[graft] def invalidatePrefix(spark: SparkSession, prefix: String): Unit = {
    val c = cachesOf(spark)
    c.synchronized {
      c.dfs.keys.filter(_.startsWith(prefix)).toList.foreach(c.dfs.remove)
      c.tables.keys.filter(_.startsWith(prefix)).toList.foreach(c.tables.remove)
      c.vix.keys.filter(_.startsWith(prefix)).toList.foreach(c.vix.remove)
      c.vsix.keys.filter(_._1.startsWith(prefix)).toList
        .foreach(c.vsix.remove)
    }
  }

  private def readParquet(spark: SparkSession, path: String): DataFrame =
    readParquetMemo(spark, path)

  /** The shared per-(session, path) plan memo — also backs
    * [[graft.Tables.load]], so the whole engine has ONE per-session
    * cache object and ONE [[invalidate]] lifecycle. */
  private[graft] def readParquetMemo(spark: SparkSession, path: String): DataFrame = {
    val c = cachesOf(spark)
    c.synchronized { c.dfs.getOrElseUpdate(path, spark.read.parquet(path)) }
  }

  /** Write a small at-rest serving table and bind it through the
    * shared plan memo — the ONE persist-and-serve step (round 19,
    * VERDICT r18 #8) behind every ingest-maintained count table:
    * [[graft.api.Engine.cacheCatalogFacetCounts]] (under the index
    * root, re-ingest-invalidated) and the bench fixture memos
    * (temp-dir, per-JVM). The overwrite deletes any prior part files,
    * so a memoized reader of the path must drop before re-binding. */
  private[graft] def persistServingTable(spark: SparkSession, df: DataFrame,
      path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    invalidatePrefix(spark, path)
    readParquetMemo(spark, path)
  }

  private val built = scala.collection.mutable.Map[String, String]()
  private val builtVec = scala.collection.mutable.Map[String, String]()
  private val builtVecSets = scala.collection.mutable.Map[String, String]()
  private val builtGraph = scala.collection.mutable.Map[String, String]()

  /** Register a temp directory for recursive deletion at JVM exit. */
  def deleteOnExit(dir: String): String = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }))
    dir
  }

  /** Index directory for `sfDir`'s documents table, building it on
    * first access (one tokenize pass over the corpus — the ingest-time
    * cost the query path no longer pays).
    */
  def indexDir(spark: SparkSession, sfDir: String): String = synchronized {
    built.getOrElseUpdate(sfDir, {
      val out = deleteOnExit(Files.createTempDirectory("graft-index-").toString)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      // fixture conversation corpus (the testdata has no conversation
      // table): every 5th resource carries a `c/chat` field with one
      // split whose text is the resource's own text — deterministic and
      // DuckDB-expressible, so conversation retrieval gets real oracle
      // coverage (reference-style fixture, like the query vectors)
      val convs = docs.where(col("doc_id") % 5 === 0)
        .select(col("doc_id"), lit("chat").as("field_id"),
          lit("0").as("split"), col("text"))
      Ingest.buildIndex(docs, "doc_id", "text", out, withVectors = false,
        langCol = Some("lang"), conversations = Some(convs))
      out
    })
  }

  /** Vector index directory for `sfDir`'s embeddings table, built on
    * first access ([[Ingest.buildVectorIndex]]: IVF + PQ training and
    * the partitioned code table — the ingest-time cost the semantic
    * query path no longer pays).
    */
  def vectorIndexDir(spark: SparkSession, sfDir: String): String = synchronized {
    builtVec.getOrElseUpdate(sfDir, {
      val out = deleteOnExit(Files.createTempDirectory("graft-vecindex-").toString)
      Ingest.buildVectorIndex(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding", out)
      out
    })
  }

  /** Relation index directory for `sfDir`'s graph fixture (the
    * lineitem-derived supplier→part triplets every graph query uses),
    * built on first access ([[Ingest.relationIndex]]: the distinct +
    * double-sorted layout — the ingest-time cost graph requests no
    * longer pay).
    */
  def graphDir(spark: SparkSession, sfDir: String): String = synchronized {
    builtGraph.getOrElseUpdate(sfDir, {
      val out = deleteOnExit(Files.createTempDirectory("graft-graphindex-").toString)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      // typed fixture columns mirror the reference's node-type/subtype
      // and relation-type dimensions (`nidx_relation/src/schema.rs`):
      // suppliers and parts are ENTITY nodes with their own subtypes,
      // the relation type derives from the line status — independent
      // of the R{returnflag} label, like the reference's (label,
      // relationship) pair
      import org.apache.spark.sql.functions.when
      Ingest.relationIndex(
        li.select(
          concat(lit("S"), col("l_suppkey").cast("string")).as("src"),
          concat(lit("R"), col("l_returnflag")).as("rel"),
          concat(lit("P"), col("l_partkey").cast("string")).as("dst"),
          lit("ENTITY").as("src_type"), lit("supplier").as("src_subtype"),
          lit("ENTITY").as("dst_type"), lit("part").as("dst_subtype"),
          when(col("l_linestatus") === "O", "ABOUT").otherwise("ENTITY")
            .as("rel_type"),
          // resource provenance: the order each line item belongs to —
          // the prefilter id space for filtered graph searches
          col("l_orderkey").as("order_res")),
        "src", "rel", "dst", out,
        typedCols = Seq("src_type", "src_subtype", "dst_type", "dst_subtype",
          "rel_type"),
        resourceCol = Some("order_res"))
      out
    })
  }

  /** At-rest edge triplets sorted by SOURCE value — serve queries whose
    * selective constraint is on the source node. */
  def edges(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${graphDir(spark, sfDir)}/edges")

  /** The same triplets sorted by DESTINATION value — serve queries
    * constrained on the destination node. */
  def edgesByDst(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${graphDir(spark, sfDir)}/edges_by_dst")

  /** Per-resource edge provenance (triplet, resource_id) — the
    * prefiltered-search serving table
    * ([[Ingest.relationIndex]]'s `edge_resources`). */
  def edgeResources(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${graphDir(spark, sfDir)}/edge_resources")

  def tables(spark: SparkSession, sfDir: String): IndexTables = {
    val c = cachesOf(spark)
    c.synchronized {
      c.tables.getOrElseUpdate(sfDir, buildTables(spark, sfDir))
    }
  }

  private def buildTables(spark: SparkSession, sfDir: String): IndexTables =
    tablesAt(spark, indexDir(spark, sfDir))

  /** Bind the index tables of an ARBITRARY [[Ingest.buildIndex]] output
    * directory — the production/facade path ([[graft.api.Engine]]); the
    * sfDir overloads above are the testdata fixture loaders. Plans go
    * through the per-(session, path) memo like every other at-rest
    * read. */
  def tablesAt(spark: SparkSession, dir: String): IndexTables = {
    // the paragraph posting pair may be absent in index dirs built by
    // an older buildIndex — bind None instead of failing at read time
    def opt(sub: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
        Some(readParquet(spark, s"$dir/$sub"))
      else None
    }
    // the tiny at-rest stats table collects ONCE at bind (driver-side,
    // 3 rows — the same cost class as the centroid fetch), memoized
    // with the tables handle
    val stats: Map[String, graft.functions.Bm25.CorpusStats] =
      opt("bm25_stats").map(_.collect().map(r =>
          r.getString(0) -> graft.functions.Bm25.CorpusStats(
            r.getDouble(1).toLong,
            if (r.isNullAt(2)) 0.0 else r.getDouble(2))).toMap)
        .getOrElse(Map.empty)
    IndexTables(
      postings = readParquet(spark, s"$dir/postings"),
      docLengths = readParquet(spark, s"$dir/doclengths"),
      paragraphs = readParquet(spark, s"$dir/paragraphs"),
      parPostings = opt("par_postings"),
      parDocLengths = opt("par_doclengths"),
      fields = opt("fields"),
      fieldParagraphs = opt("field_paragraphs"),
      fieldParPostings = opt("fieldpar_postings"),
      fieldParDocLengths = opt("fieldpar_doclengths"),
      parDeletes = opt("par_deletes"),
      docStats = () => stats.get("doc"),
      parStatsXrep = () => stats.get("par_xrep"),
      parStatsAll = () => stats.get("par_all"))
  }

  /** The served vector index: centroid/codebook literals collected once
    * (driver-scale, like IVF centroids everywhere else), code +
    * assignment tables as pruned-scan DataFrames, raw vectors for the
    * exact rerank.
    */
  def vectorIndex(spark: SparkSession, sfDir: String): VectorIndex = {
    val c = cachesOf(spark)
    c.synchronized {
      c.vix.getOrElseUpdate(sfDir, loadVectorIndex(spark, sfDir))
    }
  }

  /** Parse `m` out of a vector index dir's meta — Hadoop FS read (not
    * java.nio: the index dir is distributed storage in production) with
    * a build-bug message on a missing/drifted meta, shared by both the
    * default-index and per-vectorset loaders. */
  private def vectorMetaM(spark: SparkSession, dir: String): Int = {
    val meta = Ingest.readText(spark, s"$dir/vector_meta.json")
    """"m":\s*(\d+)""".r.findFirstMatchIn(meta)
      .getOrElse(throw new IllegalStateException(
        s"vector_meta.json at $dir has no \"m\" field: $meta"))
      .group(1).toInt
  }

  /** Parse one vectorset's (similarity, normalize) config out of the
    * meta's `configs` block ([[Ingest.buildVectorIndexSets]] writes it).
    * Index dirs from before the config existed (no `configs` block at
    * all) default to the engine's historical behavior (cosine,
    * unnormalized) — but a meta WITH a configs block that fails to
    * yield this set's entry is a DRIFTED/FOREIGN file and throws:
    * silently degrading a dot/normalize-configured set to cosine would
    * be wrong rankings with no error, the worst failure mode for a
    * scoring config. */
  private def vectorMetaConfig(spark: SparkSession, dir: String,
      vs: String): (graft.functions.VectorFunctions.Similarity, Boolean) = {
    val meta = Ingest.readText(spark, s"$dir/vector_meta.json")
    val re = ("\"" + java.util.regex.Pattern.quote(vs) +
      "\":\\s*\\{\\s*\"similarity\"\\s*:\\s*\"(\\w+)\"\\s*,\\s*" +
      "\"normalize\"\\s*:\\s*(true|false)\\s*\\}").r
    re.findFirstMatchIn(meta) match {
      case Some(m) =>
        (graft.functions.VectorFunctions.Similarity.parse(m.group(1)),
          m.group(2).toBoolean)
      case None if !meta.contains("\"configs\"") =>
        (graft.functions.VectorFunctions.Similarity.Cosine, false)
      case None => throw new IllegalStateException(
        s"vector_meta.json at $dir has a configs block but no parseable " +
          s"entry for vectorset '$vs' — drifted or foreign meta: $meta")
    }
  }

  /** Collect a driver-scale (cid, vector) model table, cid-sorted. */
  private def collectModel(df: DataFrame): Seq[(Int, Seq[Float])] =
    df.collect().toSeq.map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)

  private def loadVectorIndex(spark: SparkSession, sfDir: String): VectorIndex = {
    val dir = vectorIndexDir(spark, sfDir)
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("cid"), col("cvec"), col("n_members"))
      .collect().toSeq
    val cb = collectModel(spark.read.parquet(s"$dir/codebook")
      .select(col("cid"), col("cw")))
    val m = vectorMetaM(spark, dir)
    VectorIndex(
      centroids = cents.map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1),
      codebook = cb,
      m = m,
      nVectors = cents.map(_.getLong(2)).sum,
      codes = spark.read.parquet(s"$dir/codes"),
      assignments = spark.read.parquet(s"$dir/assignments"),
      raw = spark.read.parquet(s"$sfDir/embeddings.parquet"))
  }

  /** The multi-vectorset fixture corpus over the embeddings table: the
    * full-dim `default` set plus a `mrl16` matryoshka truncation — two
    * named embedding models over the same ids, the reference's
    * vectorset shape (`nidx_vector/src/config.rs:100-126`). */
  def vectorsetTable(emb: DataFrame): DataFrame = {
    val f = org.apache.spark.sql.functions
    val sliced = emb.select(col("vec_id"),
      f.slice(col("embedding"), 1, 16).as("embedding"))
    emb.select(col("vec_id"), col("embedding"),
        f.lit("default").as("vectorset"))
      .unionByName(sliced.withColumn("vectorset", f.lit("mrl16")))
      // `dot16`: the same truncated vectors under a DOT-similarity
      // config (`config.rs:127-137` — Dot is the reference's paragraph
      // default), so the fixtures cover both scoring functions
      .unionByName(sliced.withColumn("vectorset", f.lit("dot16")))
  }

  /** The fixture configs for [[vectorsetTable]]'s sets: `dot16` scores
    * with dot, the others keep cosine. */
  val vectorsetConfigs: Map[String, Ingest.VectorSetConfig] =
    Map("dot16" -> Ingest.VectorSetConfig(similarity = "dot"))

  /** Per-vectorset index directory for `sfDir` ([[Ingest.buildVectorIndexSets]]
    * over [[vectorsetTable]]), built on first access. */
  def vectorSetIndexDir(spark: SparkSession, sfDir: String): String = synchronized {
    builtVecSets.getOrElseUpdate(sfDir, {
      val out = deleteOnExit(Files.createTempDirectory("graft-vsindex-").toString)
      Ingest.buildVectorIndexSets(
        vectorsetTable(spark.read.parquet(s"$sfDir/embeddings.parquet")),
        "vec_id", "embedding", "vectorset", out,
        configs = vectorsetConfigs)
      out
    })
  }

  /** The served index for ONE named vectorset: centroid/codebook
    * literals for that set, the codes table pre-pruned to its
    * `vectorset=` partition (composing with the probe's centroid
    * pruning — two-level partition elimination), and the set's own raw
    * vectors for the exact rerank. */
  def vectorIndexSet(spark: SparkSession, sfDir: String, vs: String): VectorIndex = {
    val c = cachesOf(spark)
    c.synchronized {
      c.vsix.getOrElseUpdate((sfDir, vs), {
        val dir = vectorSetIndexDir(spark, sfDir)
        vectorIndexSetAt(spark, dir, vs,
          vectorsetTable(spark.read.parquet(s"$sfDir/embeddings.parquet"))
            .where(col("vectorset") === vs)
            .select(col("vec_id"), col("embedding")))
      })
    }
  }

  /** Bind ONE named vectorset's served index from an ARBITRARY
    * [[Ingest.buildVectorIndexSets]] output directory (the
    * production/facade path). `raw0` supplies the set's RAW vectors
    * (vecId named like the codes' id column); a normalize-configured
    * set wraps them — the exact rerank must score what the index stored
    * (`indexer.rs:107`). Uncached: callers with request loops memoize
    * their own handle ([[vectorIndexSet]] above, [[graft.api.Engine]]).
    */
  def vectorIndexSetAt(spark: SparkSession, dir: String, vs: String,
      raw0: DataFrame): VectorIndex = {
    require(raw0.columns.length == 2,
      s"raw vector table must be exactly (id, vector); got ${raw0.columns.mkString(", ")}")
    val cents = spark.read.parquet(s"$dir/centroids")
      .where(col("vectorset") === vs)
      .select(col("cid"), col("cvec"), col("n_members"))
      .collect().toSeq
    require(cents.nonEmpty, s"vectorset $vs not in the index at $dir")
    val cb = collectModel(spark.read.parquet(s"$dir/codebook")
      .where(col("vectorset") === vs)
      .select(col("cid"), col("cw")))
    val m = vectorMetaM(spark, dir)
    val (sim, normalized) = vectorMetaConfig(spark, dir, vs)
    val raw =
      if (!normalized) raw0
      else raw0.withColumn(raw0.columns(1),
        org.apache.spark.sql.functions.transform(
          graft.functions.VectorFunctions.normalize(col(raw0.columns(1))),
          _.cast("float")))
    VectorIndex(
      centroids = cents.map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1),
      codebook = cb,
      m = m,
      nVectors = cents.map(_.getLong(2)).sum,
      codes = spark.read.parquet(s"$dir/codes").where(col("vectorset") === vs),
      assignments = spark.read.parquet(s"$dir/assignments")
        .where(col("vectorset") === vs),
      raw = raw,
      similarity = sim,
      normalized = normalized)
  }

  def postings(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/postings")

  /** (term, freq) dictionary — the suggest/fuzzy serving table. */
  def termFreq(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/termfreq")

  /** Bigram posting table (id, w1, w2, tf), bucketed on (w1, w2) —
    * the n-gram LM serving table
    * ([[graft.operators.CorpusStats.bigramLogProbFromPostings]]). */
  def bigrams(spark: SparkSession, sfDir: String): DataFrame =
    bucketedOrParquet(spark, "bigrams", indexDir(spark, sfDir))

  /** Corpus bigram dictionary (w1, w2, freq), bucketed on (w1, w2) —
    * joins [[bigrams]] exchange-free on the shared bucket layout. */
  def bigramFreq(spark: SparkSession, sfDir: String): DataFrame =
    bucketedOrParquet(spark, "bigramfreq", indexDir(spark, sfDir))

  /** MinHash signature table (id, h0..h{n-1}) — the near-dup serving
    * table ([[graft.operators.Dedup.minHashLshFromSignatures]]). */
  def signatures(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/signatures")

  /** SymSpell deletion-neighborhood table (variant, term) — the
    * distance-1 fuzzy lookup ([[graft.operators.TopK.symSpellMatchTerms]]). */
  def deletes(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/deletes")

  /** Hashed-shingle posting table (id, shingle, sz) — the n-gram
    * Jaccard serving table ([[graft.operators.Dedup.ngramJaccardFromShingles]]).
    * Served through the session catalog when the bucketed layout is
    * registered (the self-join on `shingle` then runs exchange-free);
    * plain parquet fallback reads the same rows without the layout. */
  def shingles(spark: SparkSession, sfDir: String): DataFrame =
    bucketedOrParquet(spark, "shingles", indexDir(spark, sfDir))

  /** LSH band table (id, band, bv), bucketed on (band, bv) — the
    * near-dup candidate join ([[graft.operators.Dedup.minHashLshFromBands]]). */
  def sigBands(spark: SparkSession, sfDir: String): DataFrame =
    bucketedOrParquet(spark, "sigbands", indexDir(spark, sfDir))

  private def bucketedOrParquet(spark: SparkSession, kind: String,
      dir: String): DataFrame = {
    val name = Ingest.bucketedTableName(kind, dir)
    if (spark.catalog.tableExists(name)) spark.table(name)
    else spark.read.parquet(s"$dir/$kind")
  }

  /** Positional posting table (id, pos, term) — the quoted-phrase
    * serving table ([[graft.operators.PhraseSearch.phraseOccurrencesFromPositions]]). */
  def positions(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/positions")

  /** Trained language-ID profile table (plang, tg, logp) — driver-scale
    * model rows ([[graft.functions.TextFunctions.langIdFromProfiles]]). */
  def langProfiles(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/langprofiles")

  /** [[langProfiles]] collected into the broadcast-literal model shape
    * (memoized per session+dir — one collect, not one per request). */
  def langProfileModel(spark: SparkSession, sfDir: String): Seq[(String, Map[String, Double])] = {
    val c = cachesOf(spark)
    c.synchronized {
      c.lang.getOrElseUpdate(sfDir,
        langProfiles(spark, sfDir).collect()
          .groupBy(_.getString(0))
          .map { case (l, rows) =>
            l -> rows.map(r => r.getString(1) -> r.getDouble(2)).toMap }
          .toSeq.sortBy(_._1))
    }
  }

  def docLengths(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/doclengths")

  def paragraphs(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/paragraphs")

  /** Paragraph-derived (term, freq) dictionary — the /suggest serving
    * table ([[graft.api.Suggest.suggestMerged]]). */
  def parTermFreq(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/par_termfreq")

  /** Paragraph-level posting/length tables — the nidx_paragraph BM25
    * serving pair. */
  def parPostings(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/par_postings")

  def parDocLengths(spark: SparkSession, sfDir: String): DataFrame =
    readParquet(spark, s"${indexDir(spark, sfDir)}/par_doclengths")
}
