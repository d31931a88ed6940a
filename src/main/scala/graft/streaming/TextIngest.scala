package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of corpus TERM STATISTICS — the text analog
  * of [[VectorIngest]]: as documents stream in, every micro-batch
  * reduces to its own (term, tf, df) partial and appends it to a
  * `__batch`-partitioned store. Term frequency and document frequency
  * are both SUMS of per-batch partials (a document's row — and
  * therefore all of its tokens — lands in exactly one micro-batch, so
  * per-batch distinct-doc counts add without overlap), which makes the
  * store a mergeable fine grain: corpus-wide stats at any moment are
  * ONE groupBy(term) over the partials, no rescan of the documents.
  * These are the statistics a retrieval stack serves from — df feeds
  * idf, tf/df feed [[graft.ops.Text.bm25Dynamic]]-style scorers — kept
  * fresh at ingest time instead of recomputed batch-wide.
  *
  * Scale posture: the per-batch reduction is one partial+final hash
  * aggregate over the batch's tokens (term-keyed, no global state, no
  * streaming state store), and the store append is a partitioned
  * parquet write. Exactly-once on retry comes from the same discipline
  * as [[VectorIngest.maintainIndex]]: dynamic partition overwrite means
  * a replayed batch id overwrites ITS OWN partition rather than
  * double-appending.
  */
object TextIngest {

  /** Tokenization pinned to the engine-portable form the batch text
    * ops use (trim + lower + whitespace split) — the stream≡batch
    * equivalence is only meaningful if both sides tokenize
    * identically. */
  private def tokens(text: String): org.apache.spark.sql.Column =
    explode(split(trim(lower(col(text))), "\\s+"))

  /** Per-batch (term, tf, df) partial of one micro-batch. */
  private[streaming] def termPartial(batch: DataFrame, id: String,
                                     text: String): DataFrame =
    batch.select(col(id).as("__doc"), tokens(text).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("__doc")).as("df"))

  /** Maintain the partial-stats store from a document stream. Each
    * micro-batch writes its own `__batch=<id>` partition. */
  def maintainTermStats(stream: DataFrame, id: String, text: String,
                        storeDir: String,
                        trigger: Trigger = Trigger.AvailableNow(),
                        onBatch: Long => Unit = _ => ()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        termPartial(batch.toDF(), id, text)
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch")
          .parquet(storeDir)
        onBatch(batchId)
      }
      .trigger(trigger)
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .start()

  /** Merge the store's partials to corpus-wide term stats: tf and df
    * are both plain sums over batches. One term-keyed aggregate —
    * never a document rescan. */
  def termStatsFromStore(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir)
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), sum(col("df")).as("df"))
}
