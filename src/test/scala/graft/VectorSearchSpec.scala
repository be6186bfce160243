package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.VectorSearch

class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  test("cosine/dot of known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b")
    import VectorFunctions._
    val got = df.select(
      cosine(asDouble(col("a")), asDouble(col("b"))).as("cos"),
      dot(asDouble(col("a")), asDouble(col("b"))).as("dot"))
      .collect()
    assert(math.abs(got(0).getDouble(0) - 0.0) < 1e-12)
    assert(math.abs(got(1).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(got(1).getDouble(1) - 2.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine with min_score cut") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f))).toDF("id", "v")
    val q = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("qv")
    val got = VectorSearch.bruteForceTopK(corpus, "id", "v", q, "qv", k = 3, minScore = 0.0)
      .collect().map(_.getLong(0))
    assert(got.sameElements(Array(1L, 2L, 3L))) // 4 cut by min_score
  }

  test("knnJoin returns per-query ranked neighbors") {
    val corpus = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("id", "v")
    val qs = Seq((100L, Seq(1.0f, 0.1f)), (200L, Seq(0.1f, 1.0f))).toDF("qid", "qv")
    val got = VectorSearch.knnJoin(qs, "qid", "qv", corpus, "id", "v", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(100L -> 1L, 200L -> 2L))
  }

  test("maxSim sums per-query maxima over group members") {
    val corpus = Seq(
      ("g1", Seq(1.0f, 0.0f)), ("g1", Seq(0.0f, 1.0f)),
      ("g2", Seq(-1.0f, 0.0f))).toDF("grp", "v")
    val qs = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("qid", "qv")
    val got = VectorSearch.maxSim(qs, "qid", "qv", corpus, "grp", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("g1") - 2.0) < 1e-9) // max 1.0 for each query
    assert(got("g2") < 0.1)
  }

  test("ivfAssign picks nearest centroid; signaturePrescore agrees with brute force on top hit") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.05f)), (2L, Seq(0.05f, 1.0f)), (3L, Seq(0.9f, -0.1f))).toDF("id", "v")
    val cents = Seq((10L, Seq(1.0f, 0.0f)), (20L, Seq(0.0f, 1.0f))).toDF("cid", "cv")
    val assign = VectorSearch.ivfAssign(corpus, "id", "v", cents, "cid", "cv")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign == Map(1L -> 10L, 2L -> 20L, 3L -> 10L))

    val q = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("qv")
    val brute = VectorSearch.bruteForceTopK(corpus, "id", "v", q, "qv", 1)
      .collect().head.getLong(0)
    val pre = VectorSearch.signaturePrescore(corpus, "id", "v", q, "qv", k = 1, rerank = 3)
      .collect().head.getLong(0)
    assert(brute == pre)
  }

  test("kmeansStep recovers planted cluster means and converges assignment") {
    val rnd = new scala.util.Random(17)
    // three DIRECTIONALLY separated clusters (assignment is by cosine,
    // which is scale-invariant — separation must be angular)
    val trueMeans = Seq(
      Array(5.0, 0, 0, 0, 1, 0, 0, 0),
      Array(0.0, 5, 0, 0, 0, 1, 0, 0),
      Array(0.0, 0, -5, 0, 0, 0, 1, 0))
    val points = (0 until 120).map { i =>
      val c = i % 3
      (i.toLong, c, trueMeans(c).map(m => (m + 0.2 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val corpus = points.map(p => (p._1, p._3)).toDF("id", "v")
    // bad init: three arbitrary corpus points
    var cents = corpus.where(col("id") < 3)
      .select(col("id").as("cid"), graft.functions.VectorFunctions.asDouble(col("v")).as("cv"))
    (1 to 3).foreach { _ =>
      cents = VectorSearch.kmeansStep(corpus, "id", "v", cents, "cid", "cv")
        .select(col("centroid_id").as("cid"), col("cv"))
    }
    // after convergence: assignment must equal the planted clustering
    val assign = VectorSearch.ivfAssign(corpus, "id", "v", cents, "cid", "cv")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = points.map(p => p._1 -> p._2).toMap
    val groups = assign.groupBy(_._2).values.map(_.keys.toSet)
    val plantedGroups = planted.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(groups.toSet == plantedGroups, "clusters must match planted structure")
  }

  test("rabitqSearch matches brute force top-k under the ε bound") {
    val rnd = new scala.util.Random(11)
    val corpus = (1 to 200).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF("id", "v")
    val q = Seq(Tuple1(Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF("qv")
    val brute = VectorSearch.bruteForceTopK(corpus, "id", "v", q, "qv", 10)
      .collect().map(_.getLong(0)).toSeq
    val rq = VectorSearch.rabitqSearch(corpus, "id", "v", q, "qv", 10)
      .collect().map(_.getLong(0)).toSeq
    // ε=1.9 (≈2σ of the estimator error) — recall should be total on
    // this fixture; the adaptive window is the point, not approximation
    val recall = rq.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall: rabitq=$rq brute=$brute")
  }
}
