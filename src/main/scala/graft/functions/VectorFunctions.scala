package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector scalar functions over `array<float>` / `array<double>`
  * columns.
  *
  * The reference stores embeddings as packed little-endian f32 blobs and
  * scores them with dot or cosine similarity
  * (`nidx/nidx_vector/src/vector_types/dense_f32.rs`, selection at
  * `nidx_vector/src/config.rs:163-168`). Spark-side we model a vector as
  * `ArrayType(FloatType)` and compute similarity with higher-order
  * built-ins (`zip_with` + `aggregate`), keeping everything in the SQL
  * engine (no UDF serialization). All math is done in double precision —
  * cast first with [[asDouble]] — so results are reproducible across
  * engines (important for the DuckDB oracle parity checks).
  */
object VectorFunctions {

  /** Cast array<float> → array<double>. Rarely needed now — the
    * [[dot]] expression widens float elements in-loop — but kept for
    * call sites that want explicit double arrays.
    */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Wrap a binary Catalyst expression constructor as a Column op. */
  private def binaryExpr(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dot product via the native codegen expression
    * ([[graft.functions.expr.DotProduct]]): a tight primitive loop
    * inside whole-stage codegen, ~20× the interpreted higher-order
    * formulation on pairwise scans. Accepts float or double arrays;
    * accumulates in double, sequential order (oracle-stable).
    */
  def dot(a: Column, b: Column): Column =
    binaryExpr(graft.functions.expr.DotProduct.apply)(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the single-pass codegen expression
    * ([[graft.functions.expr.CosineSimilarity]]) — one loop instead of
    * three dot products; bit-identical results.
    */
  def cosine(a: Column, b: Column): Column =
    binaryExpr(graft.functions.expr.CosineSimilarity.apply)(a, b)

  /** L2-normalize a vector (reference normalizes on config,
    * `nidx_vector/src/utils.rs` normalize_vector).
    */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => x / n)
  }

  /** Driver-side [[normalize]] for query vectors — the reference
    * normalizes the QUERY too when the vectorset is normalize-configured
    * (`nidx_vector/src/searcher.rs:246-249`). Same double-precision
    * accumulation order as the codegen expressions, result cast back to
    * float like the at-rest vectors (`indexer.rs:102-110` normalizes
    * f32 in, f32 out). Zero vectors pass through unchanged.
    */
  def normalizeLocal(v: Seq[Float]): Seq[Float] = {
    var ss = 0.0; var i = 0
    while (i < v.length) { val x = v(i).toDouble; ss += x * x; i += 1 }
    if (ss == 0.0) v else { val n = math.sqrt(ss); v.map(x => (x / n).toFloat) }
  }

  /** Per-vectorset similarity function — the reference's config
    * dimension (`nidx_vector/src/config.rs:56-60,102-108`
    * `Similarity::{Cosine, Dot}` with `similarity_function()` selecting
    * dot vs cosine scoring; Dot is the paragraph-index default,
    * `config.rs:127-137`). [[score]] / [[scoreLocal]] are the single
    * dispatch points, so the Spark-side column math and the driver-side
    * centroid probing can never disagree on what a configured set
    * scores with.
    */
  sealed trait Similarity { def name: String }
  object Similarity {
    case object Cosine extends Similarity { val name = "cosine" }
    case object Dot extends Similarity { val name = "dot" }
    def parse(s: String): Similarity = s.toLowerCase match {
      case "cosine" => Cosine
      case "dot" => Dot
      case other => throw new IllegalArgumentException(
        s"unknown similarity '$other' (expected cosine|dot)")
    }
  }

  /** The configured similarity as a codegen'd Column expression. */
  def score(sim: Similarity, a: Column, b: Column): Column = sim match {
    case Similarity.Cosine => cosine(a, b)
    case Similarity.Dot => dot(a, b)
  }

  /** Driver-side [[score]] for probing driver-scale model tables —
    * same accumulation order as the codegen expressions. */
  def scoreLocal(sim: Similarity, a: Seq[Float], b: Seq[Float]): Double =
    sim match {
      case Similarity.Cosine => graft.operators.VectorSearch.cosineLocal(a, b)
      case Similarity.Dot =>
        var d = 0.0; var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
        d
    }

  /** Matryoshka dimension truncation
    * (`search/search/query_parser/fetcher.py:375-395`): keep the first
    * `dim` components.
    */
  def truncateDim(a: Column, dim: Int): Column = slice(a, 1, dim)

  /** Hamming distance between signature strings via the codegen
    * expression ([[graft.functions.expr.HammingDistance]]).
    * Byte-wise semantics: intended for fixed-length ASCII signatures
    * (signBits / simHash output); a length difference counts toward
    * the distance, and multi-byte characters compare per byte.
    */
  def hamming(a: Column, b: Column): Column =
    binaryExpr(graft.functions.expr.HammingDistance.apply)(a, b)

  /** 1-bit signature (sign of each component) packed into a bit string —
    * the RaBitQ-style cheap pre-score companion
    * (`nidx_vector/src/vector_types/rabitq.rs`): hamming distance over
    * signatures approximates angular distance; callers rerank the top
    * candidates with the full-precision [[cosine]].
    */
  def signBits(a: Column): Column =
    concat_ws("", transform(a, x => when(x >= 0, lit("1")).otherwise(lit("0"))))
}
