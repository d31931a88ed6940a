package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Vectors

/** Streaming maintenance of ANN index columns (SURVEY.md §9): as an
  * embedding corpus streams in, every micro-batch gets its banded SRP
  * signature and IVF cell computed with the SAME frozen parameters
  * (hyperplane seed, coarse-quantizer centroids) the batch index uses,
  * and appended to the index store — so near-dup / ANN state stays
  * queryable mid-stream and the final store is provably identical to a
  * one-shot batch build over the same rows (StreamingSpec pins this).
  *
  * Scale posture: the maintenance path is pure per-row projection
  * against broadcast constants — no shuffle, no state store, no fit
  * step per batch — so ingest throughput scales with source
  * parallelism, and the store append is the same partitioned write the
  * table itself uses at production (the `__cell`/`__sig` columns
  * written WITH the table).
  *
  * Drift: each batch's mean squared assignment distance rides along on
  * the assignment pass (no second scan) and feeds
  * [[Vectors.shouldRefit]] — when a shifted distribution degrades the
  * quantizer past the bound, refit via [[Vectors.fitQuantizer]] on a
  * fresh sample and re-derive with [[Vectors.ivfIndexFrom]]
  * (VectorsSpec shows recall recovering after an injected shift).
  */
object VectorIngest {

  /** The frozen index parameters a maintenance loop needs: SRP
    * geometry (dim/bits/bands/seed) and the fitted coarse quantizer.
    * Freezing these at bootstrap is what makes per-batch columns
    * bit-identical to a batch build. */
  final case class IndexBootstrap(dim: Int, centroids: Array[Array[Double]],
                                  bits: Int = 12, bands: Int = 8,
                                  seed: Long = 42L)

  /** Bootstrap from a batch-built index (the ingest-time fit). */
  def bootstrapFrom(index: Vectors.IvfIndexData, dim: Int,
                    bits: Int = 12, bands: Int = 8,
                    seed: Long = 42L): IndexBootstrap =
    IndexBootstrap(dim, index.centroidArr, bits, bands, seed)

  /** The per-batch index-column projection, identical for static and
    * streaming frames: (cid, __sig, __cell, __cv, __d2). `__sig` is
    * the banded SRP signature array (near-dup bucketing), `__cell` the
    * IVF routing cell, `__cv` the normalized vector the searcher
    * scores against, `__d2` the squared assignment distance the drift
    * monitor averages. */
  def indexColumns(df: DataFrame, id: String, vec: String,
                   b: IndexBootstrap): DataFrame =
    indexColumns(df, id, vec, b, Vectors.cellAssigner(df.sparkSession, b.centroids))

  /** The assigner-supplied form: [[maintainIndex]] builds the assigner
    * (and its centroid broadcast) ONCE at stream start and reuses it
    * every micro-batch — re-deriving it per batch would leak one
    * broadcast per batch on a long-lived ProcessingTime stream. */
  private def indexColumns(df: DataFrame, id: String, vec: String,
                           b: IndexBootstrap, assign: Column => Column): DataFrame = {
    // ONE projection — signature, normalization, and assignment all
    // scan-local; a join-shaped formulation would put a shuffle in
    // every micro-batch for nothing
    df.filter(nullif(Vectors.l2norm(col(vec)), lit(0.0)).isNotNull)
      .select(col(id).as("cid"),
        Vectors.srpSignatureCol(col(vec), b.dim, b.bits, b.bands, b.seed)
          .as("__sig"),
        Vectors.normalized(col(vec)).as("__na"))
      .withColumn("__a", assign(col("__na")))
      .select(col("cid"), col("__sig"), col("__a._1").as("__cell"),
        col("__na").as("__cv"), col("__a._2").as("__d2"))
  }

  /** Run the maintenance loop over a streaming frame: write index
    * columns for every arriving micro-batch to the parquet store and
    * report the batch's mean assignment distortion to `onBatch` (the
    * drift-detection hook; None for an empty batch). Returns the
    * started query; callers await it. AvailableNow by default so a
    * bounded source drains and stops — pass ProcessingTime for a
    * long-lived feed.
    *
    * Exactly-once store contents: each batch lands in its own
    * `__batch=<id>` partition via DYNAMIC partition overwrite, so a
    * micro-batch replayed after a failure REPLACES its own partition
    * instead of appending duplicate cid rows (a blind append would give
    * at-least-once store semantics — duplicate top-k ids out of
    * ivfSearch, duplicate pairs out of srpNearDupsOnSigs). With that,
    * the final store really is row-identical to a one-shot batch build
    * on failure-free AND replayed runs (StreamingSpec pins both). */
  def maintainIndex(stream: DataFrame, id: String, vec: String,
                    b: IndexBootstrap, storeDir: String,
                    onBatch: (Long, Option[Double]) => Unit = (_, _) => (),
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // one assigner (= one centroid broadcast) for the stream's lifetime
    val assign = Vectors.cellAssigner(stream.sparkSession, b.centroids)
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val cols = indexColumns(batch.toDF(), id, vec, b, assign)
          .persist()
        try {
          cols.withColumn("__batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(storeDir)
          val d = cols.agg(avg(col("__d2"))).take(1).headOption
            .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
          onBatch(batchId, d)
        } finally { cols.unpersist(); () }
      }
      .trigger(trigger)
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .start()
  }

  /** Read the stream-maintained store back as a searchable IVF index
    * (same shape [[Vectors.ivfSearch]] takes from a batch build). */
  def indexFromStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                     b: IndexBootstrap): Vectors.IvfIndexData = {
    val cells = spark.read.parquet(storeDir)
      .select(col("cid"), col("__cell"), col("__cv"))
    Vectors.IvfIndexData(cells,
      Vectors.centroidRelation(spark, b.centroids), b.centroids)
  }
}
