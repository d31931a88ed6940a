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
      height = 64 + ((payload.length * 31) % 384),
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
}
