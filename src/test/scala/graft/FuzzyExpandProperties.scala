package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for the fallback dictionary expansion
  * ([[graft.api.Find.fuzzyExpand]]) against a plain-Scala model of the
  * tantivy automaton semantics (`query_parser/fuzzy_parser.rs`):
  * terms ≥ MIN_FUZZY_LEN = 3 match at levenshtein ≤ 1, shorter terms
  * stay exact, the LAST term additionally matches as a fuzzy PREFIX at
  * ≥ MIN_FUZZY_PREFIX_LEN = 4 — the round-15 plan rewrite (length
  * conjuncts, thresholded levenshtein, per-term caps with explode +
  * dedup) must not drift from these semantics on any dictionary.
  */
object FuzzyExpandProperties extends Properties("graft.fuzzyExpand") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** The reference model: which dictionary terms does the expansion
    * admit for this query-term list? (Caps never bind at these sizes.)
    */
  private def model(dict: Seq[String], terms: Seq[String]): Set[String] =
    dict.filter { d =>
      terms.zipWithIndex.exists { case (t, i) =>
        val isLast = i == terms.size - 1
        val plain =
          if (t.length >= 3) lev(d, t) <= 1
          else d == t
        val prefix = isLast && t.length >= 4 &&
          (t.length - 1 to t.length + 1).filter(_ > 0)
            .exists(l => lev(d.take(l), t) <= 1)
        plain || prefix
      }
    }.toSet

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.choose('a', 'e')) // narrow alphabet → rich collisions
  } yield cs.mkString

  private val dictAndTerms: Gen[(List[String], List[String])] = for {
    dn <- Gen.choose(1, 30)
    dict <- Gen.listOfN(dn, word)
    tn <- Gen.choose(1, 3)
    terms <- Gen.listOfN(tn, word)
  } yield (dict.distinct, terms.distinct)

  property("matches the plain-Scala automaton model on random dictionaries") =
    forAll(dictAndTerms) { case (dict, terms) =>
      terms.isEmpty || {
        import spark.implicits._
        val got = graft.api.Find.fuzzyExpand(
          dict.toDF("term"), terms).toSet
        val want = model(dict, terms)
        if (got != want)
          println(s"dict=$dict terms=$terms got=$got want=$want")
        got == want
      }
    }

  property("deletes-routed expansion equals the dictionary-scan expansion") =
    forAll(dictAndTerms) { case (dict, terms) =>
      terms.isEmpty || {
        import spark.implicits._
        import org.apache.spark.sql.functions._
        val dictDf = dict.toDF("term")
        val deletes = dictDf.select(
          explode(graft.functions.TextFunctions
            .deleteVariants(col("term"))).as("variant"),
          col("term"))
        val viaScan = graft.api.Find.fuzzyExpand(dictDf, terms)
        val viaDeletes = graft.api.Find.fuzzyExpandWithDeletes(
          deletes, dictDf, terms)
        if (viaScan != viaDeletes)
          println(s"dict=$dict terms=$terms scan=$viaScan del=$viaDeletes")
        viaScan == viaDeletes
      }
    }
}
