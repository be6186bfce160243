package graft

import graft.api.OldFilters
import graft.api.OldFilters._
import graft.operators.FilterExpr
import graft.operators.FilterExpr._

class OldFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("alias translation: friendly names map to system prefixes") {
    assert(translateLabel("/metadata.language/en") == "/s/p/en")
    assert(translateLabel("/origin.source-id/src1") == "/u/s/src1")
    assert(translateLabel("/classification.labels/topic/science") == "/l/topic/science")
    assert(translateLabel("/icon/application/pdf") == "/n/i/application/pdf")
    assert(translateLabel("/l/topic/science") == "/l/topic/science") // system passes through
    intercept[IllegalArgumentException](translateLabel("no-slash"))
    intercept[IllegalArgumentException](translateLabel(""))
  }

  test("field vs paragraph label split follows labelset kind") {
    val parSets = Set("par")
    // /l/<labelset>/<label> with PARAGRAPHS-kind labelset → paragraph side
    val (f1, p1) = parse(Params(labelFilters = Seq(
      Lit("/classification.labels/par/intro"),
      Lit("/classification.labels/doc/report"))), parSets)
    assert(p1.contains(Facet("/l/par/intro")))
    assert(f1.contains(Facet("/l/doc/report")))
    // non-/l/ labels never go to paragraph side
    val (f2, p2) = parse(Params(labelFilters = Seq(Lit("/metadata.language/en"))), parSets)
    assert(f2.contains(Facet("/s/p/en")) && p2.isEmpty)
    // paragraph labels under an OR combinator are rejected
    intercept[IllegalArgumentException] {
      parse(Params(labelFilters = Seq(
        AnyOf(Seq("/classification.labels/par/a", "/classification.labels/par/b")))), parSets)
    }
  }

  test("combinators: all/any/none/not_all produce the right trees") {
    val (all, _) = parse(Params(labelFilters = Seq(All(Seq("/l/a/b", "/l/c/d")))))
    assert(all.contains(And(Seq(Facet("/l/a/b"), Facet("/l/c/d")))))
    val (any, _) = parse(Params(labelFilters = Seq(AnyOf(Seq("/l/a/b", "/l/c/d")))))
    assert(any.contains(Or(Seq(Facet("/l/a/b"), Facet("/l/c/d")))))
    val (none, _) = parse(Params(labelFilters = Seq(NoneOf(Seq("/l/a/b", "/l/c/d")))))
    assert(none.contains(And(Seq(Not(Facet("/l/a/b")), Not(Facet("/l/c/d"))))))
    val (notAll, _) = parse(Params(labelFilters = Seq(NotAll(Seq("/l/a/b", "/l/c/d")))))
    assert(notAll.contains(Or(Seq(Not(Facet("/l/a/b")), Not(Facet("/l/c/d"))))))
  }

  test("keyword filters: literal and combinators") {
    val (f, _) = parse(Params(keywordFilters = Seq(
      Lit("spark"), NoneOf(Seq("slow", "broken")))))
    assert(f.contains(And(Seq(
      Keyword("spark"), Not(Or(Seq(Keyword("slow"), Keyword("broken"))))))))
  }

  test("date ranges, fields and key filters bind schema columns") {
    val (f, _) = parse(Params(
      rangeCreationStart = Some("2024-01-01 00:00:00"),
      rangeModificationEnd = Some("2024-06-30 00:00:00"),
      fields = Seq("t/title", "a"),
      keyFilters = Seq("rid1", "rid2/t/body")))
    val And(ops) = f.get: @unchecked
    assert(ops.contains(DateRange("created_at", Some("2024-01-01 00:00:00"), None)))
    assert(ops.contains(DateRange("modified_at", None, Some("2024-06-30 00:00:00"))))
    assert(ops.contains(Or(Seq(
      And(Seq(Eq("field_type", "t"), Eq("field_id", "title"))),
      Eq("field_type", "a")))))
    assert(ops.contains(Or(Seq(
      Eq("rid", "rid1"),
      And(Seq(Eq("rid", "rid2"),
        And(Seq(Eq("field_type", "t"), Eq("field_id", "body")))))))))
  }

  test("parsed filter compiles and runs end-to-end") {
    val docs = Seq(
      (1L, "fast spark filter", "en", Seq("/s/p/en", "/u/s/src1")),
      (2L, "slow filter", "en", Seq("/s/p/en", "/u/s/src0")),
      (3L, "fast filter", "fr", Seq("/s/p/fr", "/u/s/src2")))
      .toDF("doc_id", "text", "lang", "labels")
    val (f, _) = parse(Params(
      labelFilters = Seq(Lit("/metadata.language/en"),
        NoneOf(Seq("/origin.source-id/src0"))),
      keywordFilters = Seq(Lit("filter"))))
    val got = docs.where(FilterExpr.compile(f.get))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("empty params yield no expressions") {
    assert(parse(Params()) == (None, None))
  }
}
