package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star ExtOp): media as opaque
  * `binary` columns + typed metadata, decoded partition-wise.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything
  * around it — binary column handling, the typed metadata schema, the
  * partition-wise batch-decode shape (`mapPartitions`, the Scala
  * analog of a Pandas `mapInPandas` batch UDF: amortize per-batch
  * setup like codec/model init across a whole partition), and the
  * resulting relational surface — is real and tested.
  */
object Multimodal {

  /** Typed metadata a real decoder would emit. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int,
                       height: Int, fmt: String, checksum: String)

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** STUB decode: a real implementation would parse the container
    * format (JPEG/WAV/...) here. The fake derives deterministic
    * "dimensions" from the payload size so the full pipeline is
    * exercisable and oracle-checkable. */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta =
    MediaMeta(
      doc_id = docId,
      n_bytes = payload.length.toLong,
      width = 64 + (payload.length % 512),
      // Long math: length * 31 overflows Int for payloads >= ~69 MB
      height = 64 + ((payload.length.toLong * 31) % 384).toInt,
      fmt = "fake/raw",
      checksum = md5hex(payload))

  /** Attach an opaque binary media column (here: the utf-8 bytes of a
    * text column standing in for a real payload). */
  def withBinaryPayload(df: DataFrame, src: String, out: String): DataFrame =
    df.withColumn(out, encode(col(src), "UTF-8"))

  /** Partition-wise batch decode: one decoder instance per partition,
    * rows streamed through it — the shape that lets a real codec or
    * model amortize initialization and batch its input at 100 TB.
    * Input must have (doc_id: Long, media: binary). */
  def decodePartitions(df: DataFrame)(implicit s: SparkSession): Dataset[MediaMeta] = {
    import s.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Resized "image" metadata. A real implementation decodes, scales,
    * re-encodes; the stub emits the target geometry and the fake
    * RGB-buffer size it implies — the relational surface is real. */
  case class ResizedMeta(doc_id: Long, out_w: Int, out_h: Int, n_bytes_out: Long)

  /** Partition-wise batch resize (STUB scaling kernel). */
  def resizePartitions(df: DataFrame, targetW: Int, targetH: Int)
                      (implicit s: SparkSession): Dataset[ResizedMeta] = {
    import s.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition scaler init would go here
        it.map { case (id, _) =>
          ResizedMeta(id, targetW, targetH, targetW.toLong * targetH * 3)
        }
      }
  }

  /** One sampled "frame" of a media payload: the 1→N generator shape
    * (video frame-sampling). frame_len is the byte length of the
    * chunk; a real decoder would emit decoded frame tensors. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_len: Int, checksum: String)

  /** Frame sampling: split each payload into fixed-size chunks
    * ("frames") and emit every `stride`-th one — a flatMap (Spark's
    * typed Generator), so the fan-out streams without materializing
    * per-document frame lists. */
  def sampleFrames(df: DataFrame, frameBytes: Int = 256, stride: Int = 1)
                  (implicit s: SparkSession): Dataset[Frame] = {
    import s.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          val chunk = bytes.slice(i * frameBytes, math.min((i + 1) * frameBytes, bytes.length))
          Frame(id, i, chunk.length, md5hex(chunk))
        }
      }
  }

  /** Deterministic fake embedding: dim exact-binary-fraction values
    * derived from the payload size, so the full feature-extract
    * pipeline (binary in → fixed-dim vector out, partition-wise model
    * amortization) is exercisable and oracle-checkable. Values are
    * k/1024 — exactly representable in both float32 and float64, so
    * no cross-engine rounding ambiguity. */
  def featureExtractPartitions(df: DataFrame, dim: Int = 8)
                              (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition model init would go here
        it.map { case (id, bytes) =>
          val f = Array.tabulate(dim)(j => ((bytes.length.toLong * (j + 1)) % 1024) / 1024.0)
          (id, f)
        }
      }.toDF("doc_id", "feature")
  }
}
