package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    MediaRow("r1", "image/png", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)),
    MediaRow("r2", "audio/wav", Array.fill[Byte](100)(42))).toDS()

  test("featurize preserves schema and emits fixed-width embeddings deterministically") {
    val out = Multimodal.featurize(media).collect().sortBy(_.rid)
    assert(out.map(_.rid).sameElements(Array("r1", "r2")))
    assert(out.forall(_.embedding.length == Multimodal.FakeDecoder.Dim))
    assert(out(0).n_bytes == 10 && out(1).n_bytes == 100)
    // deterministic: same input → same embedding
    val again = Multimodal.featurize(media).collect().sortBy(_.rid)
    assert(out(0).embedding.sameElements(again(0).embedding))
  }

  test("end-to-end multimodal retrieval: featurize -> normalize -> ANN finds the near-duplicate payload") {
    import org.apache.spark.sql.functions._
    // a corpus where r1 and r1dup share (almost) the same payload and
    // the rest are distinct — extracted features must retrieve the dup
    val corpus = Seq(
      MediaRow("r1", "image/png", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)),
      MediaRow("r1dup", "image/png", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 11)),
      MediaRow("r2", "audio/wav", Array.fill[Byte](100)(42)),
      MediaRow("r3", "video/mp4", Array.tabulate[Byte](64)(i => (i * 7).toByte))).toDS()
    val feats = Multimodal.featurize(corpus).toDF()
      .withColumn("embedding",
        graft.functions.VectorFunctions.normalize(col("embedding")))
    val query = feats.where(col("rid") === "r1").select("embedding")
    val top = graft.operators.VectorSearch.bruteForceTopK(
        feats.where(col("rid") =!= "r1"), "rid", "embedding", query, "embedding", k = 1)
      .collect().head
    assert(top.getString(0) == "r1dup", s"expected the near-dup payload, got $top")
    assert(top.getDouble(1) > 0.99)
  }

  test("sampleFrames emits n evenly-spaced frames with stable indices") {
    val frames = Multimodal.sampleFrames(media, 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    val r2 = frames.filter(_._1 == "r2")
    assert(r2.map(_._2).sorted.sameElements(Array(0, 1, 2, 3)))
    assert(r2.forall(_._3.length == 25)) // 100 bytes / 4 frames
  }

  test("resize bounds payload size, is deterministic, and leaves small payloads alone") {
    val resized = Multimodal.resize(media, 16).collect()
    assert(resized.forall(_.bytes.length <= 16))
    // rows already under budget pass through byte-identical
    val small = media.collect().filter(_.bytes.length <= 16).map(_.rid).toSet
    resized.filter(r => small(r.rid)).foreach { r =>
      val orig = media.collect().find(_.rid == r.rid).get
      assert(r.bytes.sameElements(orig.bytes))
    }
    // deterministic across runs
    val again = Multimodal.resize(media, 16).collect()
    resized.zip(again).foreach { case (a, b) =>
      assert(a.rid == b.rid && a.bytes.sameElements(b.bytes))
    }
  }
}
