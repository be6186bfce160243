package graft

import graft.operators.FilterExpr
import graft.operators.FilterExpr._

class FilterExprSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark is fast", Seq("/l/topic/tech", "/s/p/en"), Seq.empty[String], """{"price": 42}"""),
    (2L, "slow database", Seq("/l/topic/db", "/s/p/fr"), Seq("g1"), """{"price": 7}"""),
    (3L, "spark streams", Seq("/l/topic/tech/spark", "/s/p/en"), Seq("g2"), """{"price": 100}"""))
    .toDF("rid", "text", "labels", "security_groups", "json_value")

  private def ids(f: FilterExpr): Set[Long] =
    docs.where(FilterExpr.compile(f)).select("rid").as[Long].collect().toSet

  test("facet matches exact and hierarchical descendants") {
    assert(ids(Facet("/l/topic/tech")) == Set(1L, 3L)) // 3 via descendant
    assert(ids(Facet("/s/p/fr")) == Set(2L))
  }

  test("keyword is tokenized membership") {
    assert(ids(Keyword("spark")) == Set(1L, 3L))
    assert(ids(Keyword("spar")) == Set.empty)
  }

  test("and/or/not compose") {
    assert(ids(And(Seq(Keyword("spark"), Facet("/s/p/en")))) == Set(1L, 3L))
    assert(ids(And(Seq(Keyword("spark"), Not(Facet("/l/topic/tech/spark"))))) == Set(1L))
    assert(ids(Or(Seq(Keyword("database"), Keyword("streams")))) == Set(2L, 3L))
  }

  test("security: public rows or overlapping groups pass") {
    assert(ids(Security(Seq("g1"))) == Set(1L, 2L)) // 1 public, 2 matches g1
    assert(ids(Security(Seq("nope"))) == Set(1L))   // only public
  }

  test("json numeric range predicate") {
    assert(ids(JsonNumRange("json_value", "price", Some(10), Some(50))) == Set(1L))
    assert(ids(JsonNumRange("json_value", "price", None, Some(50))) == Set(1L, 2L))
  }
}
