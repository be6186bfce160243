package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.api.QueryParser
import graft.operators.{RankFusion, TopK}

/** Property tests for the scoring/fusion math (SURVEY §5 port
  * strategy). Spark-backed properties run few cases; the pure parser
  * property runs the full default set.
  */
object FusionProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  property("queryParser.neverThrows.noStopwordsOrEmpties") =
    forAll(Gen.asciiPrintableStr) { s =>
      val p = QueryParser.parse(s)
      p.terms.forall(t => t.nonEmpty &&
        !graft.functions.TextFunctions.StopWords.contains(t)) &&
        p.excluded.forall(_.nonEmpty)
    }

  private lazy val spark = SparkSpec.session
  private val scoredList: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(1, 12)
    ids <- Gen.pick(n, 1L to 40L)
    scores <- Gen.listOfN(n, Gen.choose(0.0, 10.0))
  } yield ids.toList.zip(scores)

  /** Reference RRF model in plain Scala (the spec the DataFrame version
    * must match): rank by (score desc, id asc), contribute w/(k+rank). */
  private def rrfModel(lists: Seq[(Seq[(Long, Double)], Double)], k: Int): Map[Long, (Double, Long)] = {
    val contribs = lists.flatMap { case (list, w) =>
      // 0-based rank like the reference's enumerate: top item
      // contributes w/(k+0) (rank_fusion.py:161-165)
      list.sortBy { case (id, s) => (-s, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> w / (k + i) }
    }
    contribs.groupBy(_._1).map { case (id, cs) =>
      id -> (cs.map(_._2).sum, cs.size.toLong)
    }
  }

  property("rrf.matchesReferenceModel") =
    forAll(scoredList, scoredList) { (a, b) =>
      import spark.implicits._
      val dfa = a.toDF("id", "score")
      val dfb = b.toDF("id", "score")
      val got = RankFusion.rrf(Seq(("a", dfa, 1.0), ("b", dfb, 0.5)), "id", "score")
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
      val want = rrfModel(Seq((a, 1.0), (b, 0.5)), RankFusion.DefaultK)
      got.keySet == want.keySet && got.forall { case (id, (s, n)) =>
        math.abs(s - want(id)._1) < 1e-12 && n == want(id)._2
      }
    }

  /** The MaxWindow cut is exact for surviving rows: fusing lists cut to
    * the top `w` (score desc, id asc) equals the reference model run on
    * the same cut lists — and when w ≥ |list| (the verify-scale case)
    * the previous property already shows it equals the full-list model,
    * i.e. the cut cannot change a top-k result. */
  property("rrf.windowCut.matchesCutListModel") =
    forAll(scoredList, scoredList, Gen.choose(1, 15)) { (a, b, w) =>
      import spark.implicits._
      val dfa = a.toDF("id", "score")
      val dfb = b.toDF("id", "score")
      val got = RankFusion.rrf(Seq(("a", dfa, 1.0), ("b", dfb, 0.5)),
          "id", "score", window = w)
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
      def cut(l: List[(Long, Double)]) =
        l.sortBy { case (id, s) => (-s, id) }.take(w)
      val want = rrfModel(Seq((cut(a), 1.0), (cut(b), 0.5)), RankFusion.DefaultK)
      got.keySet == want.keySet && got.forall { case (id, (s, n)) =>
        math.abs(s - want(id)._1) < 1e-12 && n == want(id)._2
      }
    }

  /** Heavy ties + possibly-empty lists: the round-14 single-pass rank
    * (global row_number minus a range-frame prior-lists count) must
    * still produce per-list 0-based ranks under duplicated scores, and
    * the single-nonempty-source skip must return the survivor's
    * ORIGINAL scores (n_sources = 1), with both-empty → empty. */
  private val tiedMaybeEmpty: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(0, 8)
    ids <- Gen.pick(n, 1L to 20L)
    scores <- Gen.listOfN(n, Gen.oneOf(1.0, 2.0, 3.0))
  } yield ids.toList.zip(scores)

  property("rrf.tiesAndResultShapedSkip.matchReferenceModel") =
    forAll(tiedMaybeEmpty, tiedMaybeEmpty) { (a, b) =>
      import spark.implicits._
      val got = RankFusion.rrf(
          Seq(("a", a.toDF("id", "score"), 1.0),
            ("b", b.toDF("id", "score"), 0.5)), "id", "score")
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
      val present = Seq((a, 1.0), (b, 0.5)).filter(_._1.nonEmpty)
      val want: Map[Long, (Double, Long)] =
        if (present.size == 1)
          // fuse() skip: survivor keeps original unweighted scores
          present.head._1.map { case (id, s) => id -> (s, 1L) }.toMap
        else rrfModel(present, RankFusion.DefaultK)
      got.keySet == want.keySet && got.forall { case (id, (s, n)) =>
        math.abs(s - want(id)._1) < 1e-12 && n == want(id)._2
      }
    }

  property("rrf.everyWindowIsPartitioned") =
    forAll(scoredList) { a =>
      import spark.implicits._
      val df = a.toDF("id", "score")
      // string check: under AQE the executedPlan wrapper's typed
      // collect{WindowExec} never descends, so the old form was
      // vacuously true (round-14 finding); the printed tree shows the
      // real window nodes and their extracted `_w0` partition key
      val plan = RankFusion.rrf(Seq(("a", df, 1.0), ("b", df, 0.5)), "id", "score")
        .queryExecution.executedPlan.toString
      plan.linesIterator.filter(_.contains("Window ["))
        .forall(_.contains("windowspecdefinition(_w"))
    }

  /** Arbitrary filter trees compile to a Column and execute — the
    * ADT→Column compiler must never produce an unresolvable or
    * throwing expression regardless of nesting shape. */
  property("filterExpr.arbitraryTreesCompileAndRun") = {
    import graft.operators.FilterExpr
    import graft.operators.FilterExpr._
    val leaf: Gen[FilterExpr] = Gen.oneOf(
      Gen.alphaLowerStr.map(s => Facet("/l/" + s.take(5))),
      Gen.alphaLowerStr.map(s => Keyword(s.take(5))),
      Gen.choose(0, 500).map(n => NumRange("n", Some(n.toDouble), None)),
      Gen.choose(0, 500).map(n => Eq("n", n.toLong)),
      Gen.alphaLowerStr.map(s => JsonText("j", "k", s.take(5))),
      Gen.choose(0.0, 100.0).map(x => JsonNumRange("j", "k", None, Some(x))),
      Gen.const(Security(Seq("g1"))))
    def tree(depth: Int): Gen[FilterExpr] =
      if (depth == 0) leaf
      else Gen.oneOf(
        leaf,
        Gen.listOfN(2, tree(depth - 1)).map(And(_)),
        Gen.listOfN(2, tree(depth - 1)).map(Or(_)),
        tree(depth - 1).map(Not(_)))
    forAll(tree(3)) { f =>
      import spark.implicits._
      val df = Seq(
        (1L, "alpha beta", Seq("/l/a"), Seq("g1"), """{"k": 10}""", 100L),
        (2L, "gamma", Seq.empty[String], Seq.empty[String], """{"k": "x"}""", 400L))
        .toDF("rid", "text", "labels", "security_groups", "j", "n")
      df.where(FilterExpr.compile(f)).count() >= 0
    }
  }

  /** Driver-side union-find — the spec dedupClusters must match. */
  private def unionFindModel(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val pairGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 15)
    pairs <- Gen.listOfN(n, for {
      a <- Gen.choose(1L, 20L); b <- Gen.choose(1L, 20L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield pairs.distinct

  property("dedupClusters.matchesUnionFind") =
    forAll(pairGen) { pairs =>
      import spark.implicits._
      val df = pairs.toDF("a", "b")
      val got = graft.operators.Dedup.dedupClusters(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFindModel(pairs)
    }

  property("packSequences.matchesSequentialReplay") =
    forAll(for {
      n <- Gen.choose(1, 30)
      lens <- Gen.listOfN(n, Gen.choose(0, 12))
      budget <- Gen.choose(1, 20)
    } yield (lens, budget)) { case (lens, budget) =>
      import spark.implicits._
      // doc i has exactly lens(i) single-letter tokens
      val docs = lens.zipWithIndex
        .map { case (l, i) => (i.toLong, Seq.fill(l)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.sources.Trainsets
        .packSequences(docs, "doc_id", "text", budget)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // replay: within each bin, in id order, seq/offset follow the
      // running concat-and-chunk assignment; every doc appears once
      got.length == lens.length && got.groupBy(_._2).forall { case (_, rs) =>
        var before = 0L
        rs.sortBy(_._1).forall { case (id, _, nTok, seq, off) =>
          val ok = nTok == lens(id.toInt).toLong &&
            seq == before / budget && off == before % budget
          before += nTok
          ok
        }
      }
    }

  property("searchAfter.pagesPartitionTheTopN") =
    forAll(scoredList) { data =>
      import spark.implicits._
      val df = data.toDF("id", "score")
      val k = math.max(1, data.size / 3)
      val p1 = TopK.topK(df, "score", "id", k).collect()
      val rest = p1.lastOption.map { last =>
        TopK.searchAfter(df, "score", "id",
          TopK.Cursor(last.getDouble(1), last.getLong(0)), data.size).collect()
      }.getOrElse(Array.empty)
      val all = (p1 ++ rest).map(_.getLong(0)).toSeq
      val expected = data.sortBy { case (id, s) => (-s, id) }.map(_._1)
      all == expected // disjoint, complete, in global order
    }
}
