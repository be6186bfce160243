package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata.
  *
  * The Spark-side contract is what matters at 100 TB: media bytes
  * travel as a `binary` column next to typed metadata; per-batch
  * feature extraction runs inside `mapPartitions` over a typed Dataset
  * (the JVM analog of `mapInPandas` — one decoder instantiation per
  * partition, vectorized batches, no driver round-trips); derived
  * features land in fixed-width array columns ready for the vector
  * operators. Real image/audio decoding libraries are not available in
  * this environment, so [[FakeDecoder]] is a clearly-marked
  * deterministic stand-in — swap `decode` for a real codec without
  * touching any of the Spark plumbing, which is the tested part.
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  final case class MediaRow(rid: String, mime: String, bytes: Array[Byte])

  /** Extracted features: fixed-width embedding + scalar metadata. */
  final case class MediaFeatures(rid: String, mime: String, n_bytes: Long,
      embedding: Array[Float])

  /** STUB decoder: a real implementation would decode the payload
    * (JPEG/PNG/WAV…) and run a feature extractor. This deterministic
    * fake derives a repeatable pseudo-embedding from the bytes so the
    * distributed plumbing (schema, partitioning, batch shape) is
    * exercised honestly.
    */
  object FakeDecoder {
    val Dim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](Dim)
      var i = 0
      while (i < bytes.length) {
        out(i % Dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Feature extraction over the media table — one decoder per
    * partition, streaming through rows (the mapInPandas shape).
    */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init (a real decoder would load its model here)
      val dim = FakeDecoder.Dim
      require(dim > 0)
      rows.map { r =>
        MediaFeatures(r.rid, r.mime, r.bytes.length.toLong,
          FakeDecoder.decode(r.bytes))
      }
    }
  }

  /** Resize plumbing: per-row payload transformation (a real
    * implementation decodes, resizes, re-encodes; the deterministic
    * stand-in resamples `targetBytes` evenly-spaced bytes so byte
    * budgets and schema flow are exercised honestly). Same
    * mapPartitions shape as [[featurize]] — decoder init per
    * partition, streaming rows.
    */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.bytes.length <= targetBytes) r
        else {
          val step = r.bytes.length.toDouble / targetBytes
          val out = Array.tabulate(targetBytes)(i => r.bytes((i * step).toInt))
          r.copy(bytes = out)
        }
      }
    }
  }

  /** Frame sampling plumbing: emit `n` evenly-spaced byte-window
    * "frames" per media row (a real implementation samples decoded
    * video frames; the partitioning/explode shape is identical).
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val step = math.max(1, r.bytes.length / n)
      (0 until math.min(n, r.bytes.length)).map { i =>
        val start = i * step
        val end = math.min(r.bytes.length, start + step)
        (r.rid, i, r.bytes.slice(start, end))
      }
    }.toDF("rid", "frame_idx", "frame_bytes")
  }
}
