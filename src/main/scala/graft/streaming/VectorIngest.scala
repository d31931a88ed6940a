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
    * geometry (dim/bits/bands/seed), the fitted coarse quantizer, and
    * optionally the PQ codebooks (compressed-domain codes maintained
    * with the same freeze discipline — codebooks never change
    * mid-stream, exactly like the hyperplanes; only the IVF routing
    * participates in drift refits). Freezing these at bootstrap is
    * what makes per-batch columns bit-identical to a batch build. */
  final case class IndexBootstrap(dim: Int, centroids: Array[Array[Double]],
                                  bits: Int = 12, bands: Int = 8,
                                  seed: Long = 42L,
                                  pq: Option[Vectors.PqCodebooks] = None,
                                  opq: Option[Vectors.OpqModel] = None)

  /** Bootstrap from a batch-built index (the ingest-time fit). */
  def bootstrapFrom(index: Vectors.IvfIndexData, dim: Int,
                    bits: Int = 12, bands: Int = 8,
                    seed: Long = 42L): IndexBootstrap =
    IndexBootstrap(dim, index.centroidArr, bits, bands, seed)

  /** The per-batch index-column projection, identical for static and
    * streaming frames: (cid, __sig, __cell, __cv, __d2[, __code]).
    * `__sig` is the banded SRP signature array (near-dup bucketing),
    * `__cell` the IVF routing cell, `__cv` the normalized vector the
    * searcher scores against, `__d2` the squared assignment distance
    * the drift monitor averages, `__code` the m-byte PQ code when the
    * bootstrap carries codebooks. */
  def indexColumns(df: DataFrame, id: String, vec: String,
                   b: IndexBootstrap): DataFrame =
    indexColumns(df, id, vec, b,
      Vectors.cellAssigner(df.sparkSession, b.centroids),
      b.pq.map(cb => Vectors.pqEncoder(df.sparkSession, cb)),
      b.opq.map(m => Vectors.opqCodeColumn(df.sparkSession, m)))

  /** The assigner/encoder-supplied form: [[maintainIndex]] builds both
    * (and their broadcasts) ONCE at stream start and reuses them every
    * micro-batch — re-deriving per batch would leak one broadcast per
    * batch on a long-lived ProcessingTime stream. */
  private def indexColumns(df: DataFrame, id: String, vec: String,
                           b: IndexBootstrap, assign: Column => Column,
                           encode: Option[Column => Column],
                           oEncode: Option[Column => Column] = None): DataFrame = {
    // ONE projection — signature, normalization, assignment, and PQ
    // encoding all scan-local; a join-shaped formulation would put a
    // shuffle in every micro-batch for nothing
    val base = df.filter(nullif(Vectors.l2norm(col(vec)), lit(0.0)).isNotNull)
      .select(col(id).as("cid"),
        Vectors.srpSignatureCol(col(vec), b.dim, b.bits, b.bands, b.seed)
          .as("__sig"),
        Vectors.normalized(col(vec)).as("__na"))
      .withColumn("__a", assign(col("__na")))
    val cols = Seq(col("cid"), col("__sig"), col("__a._1").as("__cell"),
      col("__na").as("__cv"), col("__a._2").as("__d2")) ++
      encode.map(enc => enc(col("__na")).as("__code")) ++
      oEncode.map(enc => enc(col("__na")).as("__ocode"))
    base.select(cols: _*)
  }

  /** Auto-refit policy for [[maintainIndex]]: when a batch's mean
    * squared assignment distortion exceeds `factor` times the running
    * baseline ([[Vectors.shouldRefit]]), the loop refits the coarse
    * quantizer from the store + the arriving batch, REASSIGNS every
    * stored row's cell under the new centroids (reconciling rows
    * assigned under the old quantizer), persists the new quantizer to
    * the store's sidecar, and resets the baseline to the post-refit
    * distortion — all mid-stream, without stopping the query. */
  final case class RefitPolicy(baseline: Double, factor: Double = 2.0,
                               nlist: Int = 16, seed: Long = 42L,
                               iters: Int = 10, maxSamples: Int = 100000)

  /** Reserved `__batch` partition id compaction folds old batches into
    * — real micro-batch ids are >= 0, so no replay ever claims it. */
  private[graft] val CompactedBatchId = -1L

  private def quantizerFile(storeDir: String): String =
    s"$storeDir/_quantizer/centroids.txt"

  /** Persist the CURRENT quantizer (baseline distortion + centroids)
    * to the store's sidecar — underscore-prefixed, so parquet readers
    * skip it like `_checkpoint`. Tmp-file + rename swap through
    * [[Sidecars]] (round 15: Hadoop-FS, so a production-URI store
    * path works — `java.io.File` silently wrote the driver's local
    * disk there): a restart or concurrent searcher sees the old
    * quantizer, the new one, or (mid-swap) none — never a torn
    * file. */
  private[graft] def saveQuantizer(spark: org.apache.spark.sql.SparkSession,
                                   storeDir: String, baseline: Double,
                                   centroids: Array[Array[Double]]): Unit =
    Sidecars.write(spark, quantizerFile(storeDir),
      (s"baseline=$baseline" +: centroids.toSeq.map(_.mkString(",")))
        .mkString("", "\n", "\n"))

  /** The persisted (baseline, centroids) of a store whose quantizer
    * has been refit mid-stream; None for a store still on its
    * bootstrap quantizer. */
  private[graft] def loadQuantizer(spark: org.apache.spark.sql.SparkSession,
                                   storeDir: String): Option[(Double, Array[Array[Double]])] =
    Sidecars.read(spark, quantizerFile(storeDir)).map { txt =>
      val lines = txt.split("\n")
      (lines.head.stripPrefix("baseline=").toDouble,
        lines.tail.filter(_.nonEmpty).map(_.split(",").map(_.toDouble)))
    }

  /** Persist the SRP signature geometry beside the store (the
    * [[DedupIngest]] sig-params discipline, itself borrowed from the
    * quantizer sidecar above): band keys are only comparable between
    * relations signed with the SAME (dim, bits, bands, seed), so a
    * probe signed with different geometry would get a silent recall-0
    * join, not an error. First writer wins; a changed re-declaration
    * throws. */
  private def srpParamsFile(storeDir: String): String =
    s"$storeDir/_srp_params/params.txt"

  private def saveSrpParams(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String, b: IndexBootstrap): Unit =
    loadSrpParams(spark, storeDir) match {
      case Some((dim, bits, bands, seed)) =>
        require(dim == b.dim && bits == b.bits && bands == b.bands && seed == b.seed,
          s"store $storeDir was maintained with SRP (dim=$dim, bits=$bits, " +
            s"bands=$bands, seed=$seed); re-declaring (${b.dim}, ${b.bits}, " +
            s"${b.bands}, ${b.seed}) would corrupt the band keyspace")
      case None =>
        Sidecars.write(spark, srpParamsFile(storeDir),
          s"dim=${b.dim}\nbits=${b.bits}\nbands=${b.bands}\nseed=${b.seed}\n")
    }

  private def loadSrpParams(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String): Option[(Int, Int, Int, Long)] =
    Sidecars.read(spark, srpParamsFile(storeDir)).map { txt =>
      val lines = txt.split("\n")
      (lines(0).stripPrefix("dim=").toInt,
        lines(1).stripPrefix("bits=").toInt,
        lines(2).stripPrefix("bands=").toInt,
        lines(3).stripPrefix("seed=").toLong)
    }

  /** The store's `__batch=*` partition directories (data partitions
    * only — `_checkpoint`/`_quantizer` sidecars excluded), through the
    * Hadoop FileSystem API: the store path is a production URI
    * (hdfs://, s3a://, file://), and java.io.File would silently list
    * nothing there, disabling compaction — the defect fixed in
    * [[TextIngest]] round 8, now shared from there. (The quantizer
    * SIDECAR still uses local java.nio for its atomic rename; document
    * a local store path when refit persistence is in play.) */
  private def batchPartitionDirs(spark: org.apache.spark.sql.SparkSession,
                                 storeDir: String): Array[org.apache.hadoop.fs.Path] =
    TextIngest.batchPartitionDirs(spark, storeDir)

  private def storeHasData(spark: org.apache.spark.sql.SparkSession,
                           storeDir: String): Boolean =
    batchPartitionDirs(spark, storeDir).nonEmpty

  /** Refit-in-progress marker (round 15, streaming review): the
    * mid-stream refit rewrites every stored row's `__cell` partition
    * by partition and only then persists the new quantizer — a crash
    * (or a concurrent reader) inside that window sees cells assigned
    * under centroids the `_quantizer` sidecar does not hold, and IVF
    * routing silently degrades. The marker brackets the whole
    * reassign + save: readers refuse loudly while it exists
    * ([[requireNoPendingRefit]]), and the maintenance stream itself
    * HEALS an interrupted refit at its next batch — it reassigns the
    * entire store under the sidecar's (= authoritative) quantizer,
    * which restores cells ≡ sidecar at every crash point: pre-save
    * crashes roll back to the old quantizer (the replayed batch then
    * re-triggers the refit deterministically — seeded fit, same
    * inputs), post-save crashes roll forward to the new one.
    *
    * ENTRY gate, not an in-flight fence: a reader whose plan was
    * issued before the marker appeared can still scan partitions
    * mid-rewrite (mixed cells, or a vanished overwritten file) —
    * the caveat every dynamic-partition-overwrite maintenance op in
    * this layer carries; serving replicas should quiesce reads for
    * the refit window or accept the documented transient. */
  private def refitMarker(storeDir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$storeDir/_refit_pending")

  private def storeFs(spark: org.apache.spark.sql.SparkSession, storeDir: String) =
    Sidecars.fs(spark, new org.apache.hadoop.fs.Path(storeDir))

  private def requireNoPendingRefit(spark: org.apache.spark.sql.SparkSession,
                                    storeDir: String): Unit =
    require(!storeFs(spark, storeDir).exists(refitMarker(storeDir)),
      s"store $storeDir has a quantizer refit in progress or interrupted " +
        "(_refit_pending): cell assignments and the _quantizer sidecar may " +
        "disagree, so IVF routing would be silently wrong. Wait for the " +
        "refit, or restart the maintainIndex stream — its next batch " +
        "reconciles the store and clears the marker")

  /** Reassign every stored row's cell under `assign` — the refit's
    * reconcile step, also the heal path for an interrupted refit.
    * Materializes first: the write replaces the partitions the
    * reassignment reads. Signatures and PQ/OPQ codes are
    * frozen-parameter columns and carry through untouched. */
  private def reassignStore(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String,
                            assign: Column => Column): Unit = {
    val stored = spark.read.parquet(storeDir)
    val keep = Seq(col("cid"), col("__sig"), col("__a._1").as("__cell"),
      col("__cv"), col("__a._2").as("__d2")) ++
      (if (stored.columns.contains("__code")) Seq(col("__code")) else Nil) ++
      (if (stored.columns.contains("__ocode")) Seq(col("__ocode")) else Nil) :+
      col("__batch")
    val reassigned = stored
      .withColumn("__a", assign(col("__cv")))
      .select(keep: _*)
      .localCheckpoint(true)
    reassigned.write.mode("overwrite")
      // "DYNAMIC" pre-uppercased (round 16): Spark parses this option
      // through a DEFAULT-locale toUpperCase before the enum lookup, so
      // lowercase "dynamic" fails under tr_TR ("DYNAMİC", dotted İ);
      // the canonical uppercase form is a fixed point of any locale's
      // uppercasing and works everywhere
      .option("partitionOverwriteMode", "DYNAMIC")
      .partitionBy("__batch")
      .parquet(storeDir)
  }

  private def distortionOf(cols: DataFrame): Option[Double] =
    cols.agg(avg(col("__d2"))).take(1).headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  /** Fold every batch partition strictly below `upToBatch` (including
    * a previous compacted partition) into the single reserved
    * `__batch=-1` partition, then remove the folded directories — the
    * maintenance that keeps a long-lived [[maintainIndex]] store from
    * accumulating one small parquet partition per micro-batch.
    *
    * Only COMMITTED batches are folded (the in-flight batch keeps its
    * own partition), so a replayed batch still overwrites exactly its
    * own partition. The fold dedups on cid, which makes compaction
    * idempotent: if a crash lands between the compacted write and the
    * old-directory delete, the next compaction folds the duplicate
    * copies back to one row. Plain parquet has no multi-partition
    * transaction, so that crash window exists — a table format with
    * atomic commits would close it; at this layer it is documented and
    * self-healing. */
  def compactStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                   upToBatch: Long, targetFiles: Int = 1): Unit = {
    requireNoPendingRefit(spark, storeDir)
    val fold = batchPartitionDirs(spark, storeDir)
      .filter(_.getName.stripPrefix("__batch=").toLong < upToBatch)
    if (fold.length > 1) {
      val read = spark.read.option("basePath", storeDir)
        .parquet(fold.map(_.toString).toIndexedSeq: _*)
      // dedup keeps the NEWEST version of a cid (max __batch) — a cid
      // re-ingested with an updated vector must survive compaction as
      // its latest copy, not whichever row a partition scan sees first
      val dataCols = read.columns.filter(_ != "__batch")
      val folded = read
        .groupBy(col("cid"))
        .agg(max_by(struct((dataCols.filter(_ != "cid").map(col) :+ col("__batch")): _*),
          col("__batch")).as("__r"))
        .select(col("cid") +: dataCols.filter(_ != "cid").map(c => col(s"__r.$c")): _*)
        .withColumn("__batch", lit(CompactedBatchId))
        .coalesce(math.max(1, targetFiles))
        // materialize BEFORE the write: the fold may read the very
        // __batch=-1 partition the write replaces
        .localCheckpoint(true)
      folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "DYNAMIC")
        .partitionBy("__batch")
        .parquet(storeDir)
      // ASCENDING batch order (round-15 review, the foldNewestBatches
      // discipline): a crash that left an old partition standing while
      // newer ones were gone would let max(__batch) crown a stale
      // version; ascending deletes make a surviving batch imply every
      // newer batch also survives
      fold.filter(_.getName != s"__batch=$CompactedBatchId")
        .sortBy(_.getName.stripPrefix("__batch=").toLong)
        .foreach(TextIngest.deleteDir(spark, _))
      spark.catalog.refreshByPath(storeDir)
    }
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
    * on failure-free AND replayed runs (StreamingSpec pins both).
    *
    * `refit` closes the drift loop (see [[RefitPolicy]]): on trigger,
    * the quantizer refits from store + batch, the store's cells are
    * reassigned, the new quantizer persists to the `_quantizer`
    * sidecar (so restarts and [[indexFromStore]] pick it up), and
    * `onRefit` fires. SRP signatures are untouched — the hyperplanes
    * stay frozen; only the IVF routing refits.
    *
    * `compactEvery` > 0 bounds the store's partition count: whenever
    * the store reaches that many batch partitions, committed ones fold
    * into the reserved compacted partition ([[compactStore]]). */
  def maintainIndex(stream: DataFrame, id: String, vec: String,
                    b: IndexBootstrap, storeDir: String,
                    onBatch: (Long, Option[Double]) => Unit = (_, _) => (),
                    trigger: Trigger = Trigger.AvailableNow(),
                    refit: Option[RefitPolicy] = None,
                    onRefit: (Long, Array[Array[Double]]) => Unit = (_, _) => (),
                    compactEvery: Int = 0): StreamingQuery = {
    val spark = stream.sparkSession
    // pin the SRP geometry beside the store before any batch lands, so
    // every later probe signs with the store's parameters, not its own
    saveSrpParams(spark, storeDir, b)
    // resume the quantizer a previous run's refit persisted; otherwise
    // start from the bootstrap. One assigner (= one centroid
    // broadcast) per quantizer generation, reused across batches.
    var (baseline, centroids) = loadQuantizer(spark, storeDir) match {
      case Some((base, cs)) => (Some(base), cs)
      case None => (refit.map(_.baseline), b.centroids)
    }
    var assign = Vectors.cellAssigner(spark, centroids)
    // PQ codebooks are frozen like the hyperplanes: one encoder (= one
    // codebook broadcast) for the stream's whole life
    val encode = b.pq.map(cb => Vectors.pqEncoder(spark, cb))
    // the OPQ rotation + codebooks are frozen the same way
    val oEncode = b.opq.map(m => Vectors.opqCodeColumn(spark, m))
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // heal an interrupted refit FIRST (round 15): reassign the
        // whole store under the sidecar's quantizer — the authority —
        // restoring cells ≡ sidecar at every crash point, then clear
        // the marker so readers serve again. A pre-save crash rolls
        // back (this replayed batch re-triggers the refit, seeded and
        // deterministic); a post-save crash rolls forward.
        if (storeFs(spark, storeDir).exists(refitMarker(storeDir))) {
          val (hb, hc) = loadQuantizer(spark, storeDir) match {
            case Some((base, cs)) => (Some(base), cs)
            case None => (refit.map(_.baseline), b.centroids)
          }
          baseline = hb.orElse(baseline); centroids = hc
          assign = Vectors.cellAssigner(spark, centroids)
          if (storeHasData(spark, storeDir))
            reassignStore(spark, storeDir, assign)
          storeFs(spark, storeDir).delete(refitMarker(storeDir), false)
          ()
        }
        var cols = indexColumns(batch.toDF(), id, vec, b, assign, encode, oEncode).persist()
        try {
          var d = distortionOf(cols)
          for (p <- refit; dd <- d; base <- baseline
               if Vectors.shouldRefit(dd, base, p.factor)) {
            // 1. refit on the full observed distribution: everything
            //    already stored plus the drifting batch (__cv is the
            //    normalized vector, so the fit is normalization-stable)
            val batchVecs = cols.select(col("__cv"))
            val fitInput =
              if (storeHasData(spark, storeDir))
                spark.read.parquet(storeDir).select(col("__cv")).unionByName(batchVecs)
              else batchVecs
            val newCentroids = Vectors.fitQuantizer(fitInput, "__cv", p.nlist,
              sampleFraction = 1.0, seed = p.seed, maxSamples = p.maxSamples,
              iters = p.iters)
            val newAssign = Vectors.cellAssigner(spark, newCentroids)
            // 2. reconcile under the refit marker: readers refuse
            //    while cells and sidecar can disagree, and a crash
            //    anywhere in here heals at the next batch (above)
            storeFs(spark, storeDir).create(refitMarker(storeDir), true).close()
            if (storeHasData(spark, storeDir))
              reassignStore(spark, storeDir, newAssign)
            // 3. recompute the triggering batch under the new quantizer
            //    and reset the baseline to its post-refit distortion
            cols.unpersist()
            cols = indexColumns(batch.toDF(), id, vec, b, newAssign, encode, oEncode).persist()
            d = distortionOf(cols)
            saveQuantizer(spark, storeDir, d.getOrElse(base), newCentroids)
            storeFs(spark, storeDir).delete(refitMarker(storeDir), false)
            centroids = newCentroids
            assign = newAssign
            baseline = d.orElse(baseline)
            onRefit(batchId, newCentroids)
          }
          cols.withColumn("__batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "DYNAMIC")
            .partitionBy("__batch")
            .parquet(storeDir)
          if (compactEvery > 0 && batchPartitionDirs(spark, storeDir).length >= compactEvery)
            compactStore(spark, storeDir, upToBatch = batchId)
          onBatch(batchId, d)
        } finally { cols.unpersist(); () }
      }
      .trigger(trigger)
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .start()
  }

  /** One-way embedding probe served OFF THE STORE — the last cell of
    * the probe × modality matrix: new vectors collide against the
    * store's persisted `__sig` band signatures and rescore against its
    * stored normalized vectors, so the corpus is NEVER re-signed and
    * never rescanned beyond the (cid, __sig, __cv) columns — exactly
    * how the text and media probes serve ([[DedupIngest
    * .minhashProbeFromStore]], [[MediaIngest]]). Probes are signed with
    * the geometry from the store's `_srp_params` sidecar (falling back
    * to the caller's bootstrap for stores written before the sidecar
    * existed) — signing with anything else would be the silent
    * recall-0 join the sidecar exists to prevent. The per-cid
    * newest-version fold (max `__batch`, [[compactStore]]'s own
    * semantics) is doing double duty: it is the compaction-crash-window
    * guard every store reader carries, AND it makes a cid re-ingested
    * with an updated vector probe against its LATEST version while both
    * versions still sit in their batch partitions — an arbitrary-row
    * dropDuplicates could silently match a stale embedding there.
    * Probe ids must be disjoint from stored cids.
    * Output (probe_id, dup_id, cos_sim). */
  def srpProbeFromStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                        probes: DataFrame, id: String, vec: String,
                        b: IndexBootstrap, simThreshold: Double): DataFrame = {
    requireNoPendingRefit(spark, storeDir)
    val (dim, bits, bands, seed) =
      loadSrpParams(spark, storeDir).getOrElse((b.dim, b.bits, b.bands, b.seed))
    // two NARROW newest-version folds, one per consumer: the band join
    // shuffles (cid, __sig) only, the rescore (cid, __cv) only —
    // Catalyst cannot prune struct fields through the fold's aggregate,
    // so a combined fold would drag every corpus vector through the
    // band join's shuffle unused
    val corpusSigs = newestRows(spark, storeDir, Seq("__sig"))
    val corpusVecs = newestRows(spark, storeDir, Seq("__cv"))
    // normalized like the store's __cv — same element type (double)
    // for the rescore's dot, same cosine pairs (scale-invariance)
    val signed = probes
      .filter(nullif(Vectors.l2norm(col(vec)), lit(0.0)).isNotNull)
      .select(col(id).as("cid"),
        Vectors.srpSignatureCol(col(vec), dim, bits, bands, seed).as("__sig"),
        Vectors.normalized(col(vec)).as("__cv"))
    Vectors.srpProbeOnSigs(corpusSigs, corpusVecs, signed, "cid", "__sig", "__cv",
      simThreshold)
  }

  /** One newest row per cid — the read-side version fold EVERY store
    * consumer applies (probe and all three index servers): among a
    * cid's rows, the max-`__batch` one wins, which is exactly
    * [[compactStore]]'s keep-the-newest rule applied at read time. This
    * is simultaneously (a) the compaction-crash-window guard (a stale
    * partition beside its relocated copy folds back to one row —
    * `CompactedBatchId` = -1 sorts below every real batch, so the
    * relocated copy wins) and (b) what makes a cid re-ingested with an
    * updated vector SERVE as its latest version while both versions
    * still sit in their batch partitions: an arbitrary-row dedup could
    * return duplicate top-k rows or rank by a stale embedding. One
    * cid-keyed shuffle over only the requested columns. */
  private def newestRows(spark: org.apache.spark.sql.SparkSession,
                         storeDir: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(storeDir)
      .groupBy(col("cid"))
      .agg(max_by(struct(cols.map(col): _*), col("__batch")).as("__r"))
      .select(col("cid") +: cols.map(c => col(s"__r.$c").as(c)): _*)

  /** Read the stream-maintained store back as a searchable IVF index
    * (same shape [[Vectors.ivfSearch]] takes from a batch build). A
    * store whose quantizer was refit mid-stream routes with the
    * PERSISTED centroids from its `_quantizer` sidecar — the ones its
    * cells were (re)assigned under — not the stale bootstrap. Serves
    * one newest row per cid ([[newestRows]]). */
  def indexFromStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                     b: IndexBootstrap): Vectors.IvfIndexData = {
    requireNoPendingRefit(spark, storeDir)
    val centroids = loadQuantizer(spark, storeDir).map(_._2).getOrElse(b.centroids)
    val cells = newestRows(spark, storeDir, Seq("__cell", "__cv"))
    Vectors.IvfIndexData(cells,
      Vectors.centroidRelation(spark, centroids), centroids)
  }

  /** Read the stream-maintained store back as a PQ index (the shape
    * [[Vectors.pqTopK]] searches) — requires a bootstrap that carried
    * codebooks, so the store has the `__code` column. Serves one
    * newest row per cid ([[newestRows]]). */
  def pqIndexFromStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                       b: IndexBootstrap): Vectors.PqIndexData = {
    requireNoPendingRefit(spark, storeDir)
    val cb = b.pq.getOrElse(throw new IllegalArgumentException(
      "pqIndexFromStore needs an IndexBootstrap with PQ codebooks"))
    Vectors.PqIndexData(newestRows(spark, storeDir, Seq("__code", "__cv")), cb)
  }

  /** Read the stream-maintained store back as an OPQ index (the shape
    * [[Vectors.opqTopK]] searches): the stream-maintained `__ocode`
    * column plus the stored normalized vectors re-expressed in the
    * model's rotated frame — the exact expression the batch
    * [[Vectors.opqIndex]] stores, so serving is path-independent.
    * Rotating at read time keeps the store single-frame (one `__cv`
    * serves the flat, PQ, and OPQ consumers); the rotation is one
    * scan-local pass amortized over a serving session. */
  def opqIndexFromStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                        b: IndexBootstrap): Vectors.PqIndexData = {
    requireNoPendingRefit(spark, storeDir)
    val m = b.opq.getOrElse(throw new IllegalArgumentException(
      "opqIndexFromStore needs an IndexBootstrap with an OPQ model"))
    val rot = Vectors.opqRotateRaw(spark, m)
    Vectors.PqIndexData(
      newestRows(spark, storeDir, Seq("__ocode", "__cv"))
        .select(col("cid"), col("__ocode").as("__code"),
          Vectors.normalized(rot(col("__cv"))).as("__cv")), m.cb)
  }
}
