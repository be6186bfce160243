package graft

import org.apache.spark.sql.functions._

import graft.sources.Pipeline

/** The curation capstone: stage order, keep semantics, determinism. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // quality band wants ≥30 tokens of mean word length 4.2–5.0; stride k
  // permutes the word sequence so different docs share few shingles
  private def body(k: Int) =
    (1 to 40).map(i => s"wd${(i * k) % 23}x").mkString(" ")

  private lazy val docs = Seq(
    (1L, body(2)),
    (2L, body(2)),                      // exact dup of 1 → dropped
    (3L, body(2) + " tail note close"), // near dup of 1 → clustered, dropped
    (4L, body(3)),
    (5L, "short junk"),                 // fails the quality band
    (6L, body(5)),
    // cluster {7, 8} whose min id FAILS the quality band: the long
    // garbage tokens push doc 7's mean word length out of range, so
    // doc 8 must survive as the cluster's representative (unique
    // content is thinned, never lost)
    (7L, body(7) + (1 to 10).map(_ => " superduperextralongtoken").mkString),
    (8L, body(7) + " tail note"))
    .toDF("doc_id", "text")

  test("curate keeps quality, unduplicated, uncontaminated docs and splits deterministically") {
    val out = Pipeline.curate(docs, "doc_id", "text",
        evalDocs = docs.where(col("doc_id") === 6), contaminationMax = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 survives (keep-id of the {1,2,3} group), 2 and 3 are dups,
    // 5 fails quality, 6 is the eval doc itself (contamination 1.0),
    // 7 fails quality but its near-dup 8 represents the cluster
    assert(out.keySet == Set(1L, 4L, 8L))
    assert(out.values.forall(Set("train", "val", "test")))
    // determinism under repartitioning — membership and split identical
    val again = Pipeline.curate(docs.repartition(7), "doc_id", "text",
        evalDocs = docs.where(col("doc_id") === 6), contaminationMax = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == again)
  }
}
