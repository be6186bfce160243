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

  private val jdocs = Seq(
    (1L, """{"tag": "news", "ok": true, "d": "2024-01-15", "nested": {"x": 5}}"""),
    (2L, """{"tag": "blog", "ok": false, "d": "2024-06-01", "nested": {"x": 9}}"""),
    (3L, """{"tag": "es\"caped", "d": "2023-12-31", "extra": [1, {"a": 2}]}"""))
    .toDF("rid", "j")

  private def jids(f: FilterExpr): Set[Long] =
    jdocs.where(FilterExpr.compile(f)).select("rid").as[Long].collect().toSet

  test("json text / bool / date leaves — single-parse expressions") {
    assert(jids(JsonText("j", "tag", "news")) == Set(1L))
    assert(jids(JsonText("j", "tag", "es\"caped")) == Set(3L)) // unescaping
    assert(jids(JsonBool("j", "ok", value = true)) == Set(1L))
    assert(jids(JsonBool("j", "ok", value = false)) == Set(2L))
    assert(jids(JsonDateRange("j", "d", Some("2024-01-01"), Some("2024-12-31"))) == Set(1L, 2L))
    assert(jids(JsonDateRange("j", "d", None, Some("2024-01-31"))) == Set(1L, 3L))
    assert(jids(JsonText("j", "nested.x", "5")) == Set(1L)) // dotted path
    assert(jids(JsonText("j", "missing", "x")) == Set.empty) // absent key → false
  }

  test("json tree composes typed leaves") {
    val f = And(Seq(
      JsonDateRange("j", "d", Some("2024-01-01"), None),
      Or(Seq(JsonText("j", "tag", "news"), JsonBool("j", "ok", value = false)))))
    assert(jids(f) == Set(1L, 2L))
  }

  test("json predicate plan parses once: single expression, codegen'd") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonplan").toString
    jdocs.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).where(FilterExpr.compile(
      JsonNumRange("j", "price", Some(1), Some(2))))
    val plan = df.queryExecution.executedPlan.toString
    // the whole range is ONE expression instance — no duplicated
    // extraction like get_json_object >= lo AND get_json_object <= hi
    assert(plan.contains("json_num_between"))
    assert(!plan.contains("get_json_object"))
    // "*(n)" node prefix = inside a WholeStageCodegen stage
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
  }

  test("JsonScan.extract agrees with get_json_object on tricky shapes") {
    import graft.functions.expr.JsonScan
    import org.apache.spark.unsafe.types.UTF8String
    // NOTE: no float-literal fixture — get_json_object (and DuckDB ->>)
    // NORMALIZE numeric scalars ("-2.5e3" → "-2500.0") while JsonScan
    // preserves the literal text. Numeric predicates are unaffected
    // (JsonNumBetween parses either form); text equality on numeric
    // attributes is a type error in the reference's typed JSON index
    // (Text leaves apply to text fields, Number leaves to numbers).
    val fixtures = Seq(
      ("""{"k": 1}""", "k"),
      ("""{"k": "plain"}""", "k"),
      ("""{"k": "es\"ca\\ped"}""", "k"),
      ("""{"k": "uniécode"}""", "k"),
      ("""{"a": {"b": 7}, "k": true}""", "k"),
      ("""{"a": [1, {"k": "inner"}], "k": false}""", "k"),
      ("""{ "spaced" : "v" , "k" : "last" }""", "k"),
      ("""{"k": null}""", "k"),
      ("""{"other": 1}""", "k"),
      ("""{"k": "tab\tnewline\n"}""", "k"),
      ("""{"nested": {"k": 5}}""", "nested.k"))
    val df = fixtures.toDF("j", "p")
    val viaSpark = df.selectExpr("get_json_object(j, concat('$.', p))")
      .collect().map(r => Option(r.getString(0)))
    val viaScan = fixtures.map { case (j, p) =>
      Option(JsonScan.extract(UTF8String.fromString(j), UTF8String.fromString(p)))
        .map(_.toString)
    }
    fixtures.zip(viaSpark.zip(viaScan)).foreach { case ((j, p), (s, g)) =>
      assert(s == g, s"disagree on $j / $p: spark=$s scan=$g")
    }
  }

  test("JsonScan never throws on garbage input") {
    import graft.functions.expr.JsonScan
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(13)
    val alphabet = """{}[]"\:,.0123456789ektrue falsnu"""
    (1 to 2000).foreach { _ =>
      val s = (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      JsonScan.extract(UTF8String.fromString(s), UTF8String.fromString("k"))
      JsonScan.numBetween(UTF8String.fromString(s), UTF8String.fromString("k"),
        0.0, 1.0, true, true)
    }
  }

  test("materialized json_fields pushes predicates into the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonidx").toString
    graft.sources.Ingest.buildJsonIndex(jdocs, "j",
      Seq("tag" -> "string", "d" -> "string"), dir)
    val indexed = spark.read.parquet(dir)
    val q = indexed.where(org.apache.spark.sql.functions.col("j_tag") === "news")
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("EqualTo(j_tag,news)"),
      scan.metadata("PushedFilters"))
    assert(q.select("rid").as[Long].collect().toSet == Set(1L))
  }
}
