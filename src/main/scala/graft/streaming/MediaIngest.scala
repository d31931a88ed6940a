package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Multimodal

/** Streaming MEDIA near-dup maintenance — the perceptual-hash analog
  * of [[DedupIngest]]: as media documents stream in, every micro-batch
  * decodes its payloads and appends their 64-bit perceptual hashes
  * ([[Multimodal.aHash64]]) to a `__batch`-partitioned store; serving
  * near-dup pairs is then the shared multi-index Hamming join
  * ([[Multimodal.hammingNearDupsOnHashes]]) over the store — the media
  * bytes are decoded exactly once, at ingest, and never rescanned.
  * The hash function is pure and seed-free, so per-batch hashes are
  * bit-identical to a one-shot batch build and the batch key's
  * closed-form oracle applies verbatim to the served relation.
  *
  * Scale posture: per-batch work is one scan-local decode+hash pass
  * over the batch's own rows (no cross-batch state, no streaming state
  * store); the store append is the same dynamic-partition-overwrite
  * write the text/vector tiers use (exactly-once on retry: a replayed
  * batch id overwrites its own partition). At 100 TB the 8-byte hash
  * column rides with the table; the media bytes stay cold.
  */
object MediaIngest {

  /** Maintain the image-hash store from a media stream: each
    * micro-batch writes (doc_id, __ah) for its decodable payloads to
    * `$storeDir/hashes`, `__batch`-partitioned. A doc_id re-ingested
    * with corrected media is an UPDATE with compaction-bounded
    * visibility: the fold keeps only its newest batch's hash
    * ([[TextIngest.foldNewestBatches]]); until that fold, serves can
    * transiently match the stale hash too. */
  def maintainImageHashes(stream: DataFrame, id: String, media: String,
                          storeDir: String,
                          trigger: Trigger = Trigger.AvailableNow(),
                          onBatch: Long => Unit = _ => (),
                          compactEvery: Int = 0): StreamingQuery = {
    val hashU = udf((b: Array[Byte]) => Multimodal.aHash64(b))
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.toDF()
          .select(col(id).as("doc_id"), hashU(col(media)).as("__ah"))
          .filter(col("__ah").isNotNull)
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite")
          // "DYNAMIC" pre-uppercased (round 16): Spark parses this option
          // through a DEFAULT-locale toUpperCase before the enum lookup, so
          // lowercase "dynamic" fails under tr_TR ("DYNAMİC", dotted İ);
          // the canonical uppercase form is a fixed point of any locale's
          // uppercasing and works everywhere
          .option("partitionOverwriteMode", "DYNAMIC")
          .partitionBy("__batch")
          .parquet(s"$storeDir/hashes")
        if (compactEvery > 0 &&
            TextIngest.batchPartitionDirs(stream.sparkSession,
              s"$storeDir/hashes").length >= compactEvery)
          compactImageHashes(stream.sparkSession, storeDir, upToBatch = batchId)
        onBatch(batchId)
        ()
      }
      .trigger(trigger)
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .start()
  }

  /** Fold committed hash partitions into `__batch=-1` via
    * [[TextIngest.foldNewestBatches]]: a doc_id re-ingested with
    * corrected media resolves to its newest hash at the fold
    * (compaction-bounded update visibility — between re-ingest and
    * fold, near-dup serves can transiently match the stale hash
    * too). */
  def compactImageHashes(spark: SparkSession, storeDir: String,
                         upToBatch: Long, targetFiles: Int = 1): Unit =
    TextIngest.foldNewestBatches(spark, s"$storeDir/hashes", "doc_id",
      Seq("doc_id", "__ah"), upToBatch, targetFiles)

  /** Near-dup pairs served off the stream-maintained store: the shared
    * banded Hamming join over the stored hashes. Compaction-crash-window
    * guard (duplicates only ever mean a stale partition beside its
    * relocated, full-row-identical copy): the store streams scan-local
    * — no per-serve distinct + materialization of the hash relation —
    * and duplicate rows, which can only produce duplicate result rows,
    * collapse on the match-sized output. */
  def imageNearDupsFromStore(spark: SparkSession, storeDir: String,
                             maxHamming: Int = 3): DataFrame =
    Multimodal.hammingNearDupsOnHashes(
      storedHashes(spark, storeDir), maxHamming, "stream_image_candidates")
      .dropDuplicates("id_a", "id_b")

  /** Probe NEW media items against the stream-maintained corpus store
    * — the incremental-ingest dedup check ("is this already in the
    * corpus?") without re-pairing the corpus: the store's 8-byte
    * hashes are the only corpus bytes read. */
  def imageProbeFromStore(spark: SparkSession, storeDir: String,
                          probes: DataFrame, id: String, media: String,
                          maxHamming: Int = 3): DataFrame =
    Multimodal.imageHammingProbe(storedHashes(spark, storeDir),
      probes, id, media, maxHamming)

  /** Scan-local pruned read of the hash store — NO per-serve distinct
    * or checkpoint: crash-window duplicates are full-row identical, so
    * the probe's candidate distinct (which carries both hashes)
    * collapses them in-flight and the near-dup serve dedupes its
    * output pairs. */
  private def storedHashes(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/hashes")
      .select(col("doc_id").as("__id"), col("__ah"))
}
