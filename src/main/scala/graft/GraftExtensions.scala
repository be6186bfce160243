package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr.{CosineSimilarity, DotProduct, HammingDistance, JsonStrEq}

/** Session extensions: expose the engine's custom Catalyst expressions
  * to SQL users.
  *
  * Install with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`); then
  * `SELECT dot_product(a, b)` / `cosine_sim(a, b)` / `hamming(a, b)` /
  * `json_str_eq(j, 'path', 'value')` work from plain SQL, with the same
  * codegen paths the DataFrame API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null => v.toString
    case _ => throw new IllegalArgumentException(s"$what must be a string literal")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "hamming takes exactly 2 arguments")
        HammingDistance(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("json_str_eq"),
      new ExpressionInfo(classOf[JsonStrEq].getName, "json_str_eq"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "json_str_eq takes (json, path, value)")
        JsonStrEq(children.head, lit(children(1), "path"), lit(children(2), "value"))
      }))
  }
}
