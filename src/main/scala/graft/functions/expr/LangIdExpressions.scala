package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The ONE lowercase transform shared by language-ID training and
  * serving. `UTF8String.toLowerCase` (Spark's `lower()`) delegates
  * non-ASCII text to the JVM's DEFAULT-locale `String.toLowerCase`, so
  * a profile trained on one JVM and served on another (e.g. `tr_TR`
  * dotless-i mappings) could produce different trigram keys. Pure
  * ASCII takes the locale-free fast path; anything else folds with an
  * explicit `Locale.ROOT` — identical on every JVM.
  */
object CaseFold {
  def lowerRoot(s: UTF8String): UTF8String =
    if (s.numBytes == s.numChars) s.toLowerCase // pure ASCII: locale-free
    else UTF8String.fromString(
      s.toString.toLowerCase(java.util.Locale.ROOT))
}

/** `lower_root(text)` — locale-independent lowercase
  * ([[CaseFold.lowerRoot]]) as a codegen'd expression: the training
  * side of the language-ID pipeline
  * ([[graft.functions.TextFunctions.charTrigrams]]) folds case through
  * THIS, and serving ([[LangIdModel.predict]]) calls the same
  * [[CaseFold]] method, so the two sides cannot drift across JVM
  * default locales.
  */
case class LowerRoot(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lower_root"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    CaseFold.lowerRoot(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.expr.CaseFold.lowerRoot($t);")

  override protected def withNewChildInternal(c: Expression): LowerRoot =
    copy(child = c)
}

/** Whole-model language-ID scoring as ONE codegen'd expression.
  *
  * The declarative formulation — per-language `aggregate` over a
  * `charTrigrams` array with a map-literal lookup — is interpreted per
  * element (Spark's higher-order lambdas don't codegen): measured ~10 s
  * over a 5 000-doc corpus at 5 languages. This expression walks the
  * text once per row inside whole-stage codegen: each trigram looks up
  * a per-language weight vector in one hash probe, unseen trigrams add
  * the floor to every language, and the argmax (rounded at 4,
  * lang-ascending tiebreak) is computed in place. Semantics are
  * IDENTICAL to [[graft.operators.CorpusStats.langIdPredict]]'s
  * join-based form (equality-tested) — this is the broadcast-model
  * serving shape: zero shuffle, model rides along as a reference
  * object like a query-vector literal.
  */
class LangIdModel(profiles: Seq[(String, Map[String, Double])],
    floor: Double) extends Serializable {
  private val sorted = profiles.sortBy(_._1)
  private val n = sorted.length
  require(n > 0, "language-ID model needs at least one language profile")
  private val langsU: Array[UTF8String] =
    sorted.map(p => UTF8String.fromString(p._1)).toArray
  private val weights = new java.util.HashMap[String, Array[Double]]()
  sorted.zipWithIndex.foreach { case ((_, m), li) =>
    m.foreach { case (tg, lp) =>
      val arr = weights.computeIfAbsent(tg, _ => Array.fill(n)(floor))
      arr(li) = lp
    }
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  def predict(text: UTF8String): UTF8String = {
    // CODEPOINT windows, matching Spark's substr/length and the DuckDB
    // oracle (UTF-16 substring would mis-window any non-BMP char).
    // Lowercase via the SHARED locale-independent fold
    // ([[CaseFold.lowerRoot]]) — training (charTrigrams) folds through
    // the same method, so trained trigram keys and served trigrams
    // agree on every JVM regardless of its default locale
    val cps = CaseFold.lowerRoot(text).toString.codePoints().toArray
    val sums = new Array[Double](n)
    var i = 0
    while (i + 3 <= cps.length) {
      val arr = weights.get(new String(cps, i, 3))
      var j = 0
      if (arr ne null) { while (j < n) { sums(j) += arr(j); j += 1 } }
      else { while (j < n) { sums(j) += floor; j += 1 } }
      i += 1
    }
    var best = 0
    var bestScore = round4(sums(0))
    var j = 1
    while (j < n) {
      val s = round4(sums(j))
      if (s > bestScore) { best = j; bestScore = s } // ties keep lang asc
      j += 1
    }
    langsU(best)
  }
}

/** `langid_predict(text)` — argmax language for a text column against
  * a trained trigram model ([[graft.sources.Ingest.trainLangProfiles]]).
  */
case class LangIdPredict(child: Expression,
    profiles: Seq[(String, Map[String, Double])],
    floor: Double) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "langid_predict"

  @transient private lazy val model = new LangIdModel(profiles, floor)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(text: Any): Any =
    model.predict(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val m = ctx.addReferenceObj("model", model,
        classOf[LangIdModel].getName)
      s"${ev.value} = $m.predict($t);"
    })

  override protected def withNewChildInternal(c: Expression): LangIdPredict =
    copy(child = c)
}
