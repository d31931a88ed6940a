package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** Streaming NEAR-DUP maintenance — the dedup analog of
  * [[TextIngest]]'s inverted index: as documents stream in, every
  * micro-batch computes its docs' engine-portable minhash BAND
  * SIGNATURES (the exact [[Dedup.portableBandSignatures]] pipeline the
  * batch op runs — md5-derived, seed-free, so per-batch results are
  * bit-identical to a one-shot batch build) and appends them to a
  * `__batch`-partitioned signature store, alongside the docs' shingle
  * arrays for the exact rescore. Serving near-dup pairs is then a
  * band-collision self-join over the store plus the shared exact
  * rescore — the corpus text is never rescanned, and the served
  * relation is row-for-row the batch `dedup_minhash` key, so the batch
  * key's cross-engine oracle applies VERBATIM.
  *
  * Scale posture: the per-batch work is one scan + one doc-keyed
  * aggregate over the batch's own shingles (a doc's signature depends
  * only on its own shingle set — no cross-batch state, no streaming
  * state store), and the store append is the same partitioned write
  * the text tiers use. Exactly-once on retry: dynamic partition
  * overwrite, a replayed batch id overwrites its own partition.
  */
object DedupIngest {

  /** Per-batch signature + shingle materialization for one
    * micro-batch: docs with empty shingle sets drop (they cannot
    * near-dup), mirroring the batch featurization. */
  private[streaming] def shingled(batch: DataFrame, id: String,
                                  text: String): DataFrame =
    batch.select(col(id).as("doc_id"), Dedup.shingles(col(text)).as("__sh"))
      .filter(size(col("__sh")) > 0)

  /** Maintain the minhash store from a document stream: each
    * micro-batch writes its signatures to `$storeDir/sigs` and its
    * shingle arrays to `$storeDir/docs`, both `__batch`-partitioned.
    * A document lands wholly in its own batch, so both stores hold
    * globally unique rows — compaction needs no provenance column.
    * `compactEvery` > 0 bounds the partition count as in the text
    * tiers. */
  def maintainMinhash(stream: DataFrame, id: String, text: String,
                      storeDir: String,
                      numHashes: Int = 12, bands: Int = 4,
                      trigger: Trigger = Trigger.AvailableNow(),
                      onBatch: Long => Unit = _ => (),
                      compactEvery: Int = 0): StreamingQuery = {
    saveSigParams(storeDir, numHashes, bands)
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val sh = shingled(batch.toDF(), id, text).persist()
        try {
          Dedup.portableBandSignatures(sh, "doc_id", "__sh", numHashes, bands)
            .withColumn("__batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(s"$storeDir/sigs")
          sh.withColumn("__batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(s"$storeDir/docs")
          if (compactEvery > 0 &&
              TextIngest.batchPartitionDirs(stream.sparkSession,
                s"$storeDir/sigs").length >= compactEvery)
            compactMinhash(stream.sparkSession, storeDir, upToBatch = batchId)
          onBatch(batchId)
        } finally { sh.unpersist(); () }
      }
      .trigger(trigger)
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .start()
  }

  /** Persist the signature parameters beside the store (the quantizer-
    * sidecar discipline of [[VectorIngest]]): band keys are only
    * comparable between relations built with the SAME (numHashes,
    * bands), so a reader probing with different parameters would get a
    * silent recall-0 join, not an error. Validated by every store
    * reader; first writer wins, a changed re-declaration throws. */
  private def sigParamsFile(storeDir: String): java.io.File =
    new java.io.File(s"$storeDir/_sig_params/params.txt")

  private def saveSigParams(storeDir: String, numHashes: Int, bands: Int): Unit =
    loadSigParams(storeDir) match {
      case Some((nh, b)) =>
        require(nh == numHashes && b == bands,
          s"store $storeDir was maintained with (numHashes=$nh, bands=$b); " +
            s"re-declaring ($numHashes, $bands) would corrupt the band keyspace")
      case None =>
        val f = sigParamsFile(storeDir)
        f.getParentFile.mkdirs()
        java.nio.file.Files.write(f.toPath,
          s"numHashes=$numHashes\nbands=$bands\n".getBytes("UTF-8"))
        ()
    }

  private def loadSigParams(storeDir: String): Option[(Int, Int)] = {
    val f = sigParamsFile(storeDir)
    if (!f.exists()) None
    else {
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      Some((lines.get(0).stripPrefix("numHashes=").toInt,
        lines.get(1).stripPrefix("bands=").toInt))
    }
  }

  /** The store's persisted signature parameters, falling back to the
    * given defaults for stores written before the sidecar existed. */
  private def sigParamsOf(storeDir: String, numHashes: Int, bands: Int): (Int, Int) =
    loadSigParams(storeDir).getOrElse((numHashes, bands))

  /** Fold committed sigs/docs batch partitions into `__batch=-1` —
    * the [[TextIngest.compactInvertedIndex]] discipline: keys are
    * globally unique (one batch per doc), so a full-row distinct makes
    * the fold idempotent across the crash window. */
  def compactMinhash(spark: SparkSession, storeDir: String,
                     upToBatch: Long, targetFiles: Int = 1): Unit = {
    def foldOne(sub: String, dataCols: Seq[String]): Unit = {
      val dir = s"$storeDir/$sub"
      val fold = TextIngest.batchPartitionDirs(spark, dir)
        .filter(_.getName.stripPrefix("__batch=").toLong < upToBatch)
      if (fold.length > 1) {
        val folded = spark.read.option("basePath", dir)
          .parquet(fold.map(_.toString).toIndexedSeq: _*)
          .select(dataCols.map(col): _*)
          .distinct()
          .withColumn("__batch", lit(TextIngest.CompactedBatchId))
          .coalesce(math.max(1, targetFiles))
          .localCheckpoint(true)
        folded.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch")
          .parquet(dir)
        fold.filter(_.getName != s"__batch=${TextIngest.CompactedBatchId}")
          .foreach(TextIngest.deleteDir(spark, _))
        spark.catalog.refreshByPath(dir)
      }
    }
    foldOne("sigs", Seq("doc_id", "__band", "__key"))
    foldOne("docs", Seq("doc_id", "__sh"))
  }

  /** Probe NEW documents against the stream-maintained signature
    * store — the incremental-ingest near-dup check: the new docs'
    * band signatures collide one-way with the stored ones (the corpus
    * text is never rescanned, never self-paired) and the exact rescore
    * reads shingles from the store plus the probe batch. Probe doc ids
    * must be disjoint from stored ids. */
  def minhashProbeFromStore(spark: SparkSession, storeDir: String,
                            newDocs: DataFrame, id: String, text: String,
                            numHashes: Int = 12, bands: Int = 4,
                            jaccardThreshold: Double = 0.5): DataFrame = {
    // probe with the parameters the STORE was built with (sidecar),
    // not the caller's defaults — mismatched band keys join to nothing
    val (nh, b) = sigParamsOf(storeDir, numHashes, bands)
    val probeSh = shingled(newDocs, id, text).localCheckpoint(true)
    val pb = Dedup.portableBandSignatures(probeSh, "doc_id", "__sh", nh, b)
      .localCheckpoint(true)
    // the shared lazy band join ([[Dedup.bandProbeCandidatesLazy]])
    // broadcast-prunes the signature store below its exchange — at
    // 100 TB the store is the big side and a probe batch touches a
    // vanishing fraction of the band keyspace. The pre-join distinct
    // is the compaction-crash-window guard, as everywhere.
    val storedBands = spark.read.parquet(s"$storeDir/sigs")
      .select(col("doc_id"), col("__band"), col("__key"))
      .distinct()
    val cand = Dedup.bandProbeCandidatesLazy(pb, storedBands, "doc_id")
      .localCheckpoint(true)
    val storedDocs = spark.read.parquet(s"$storeDir/docs")
      .select(col("doc_id"), col("__sh"))
      .dropDuplicates("doc_id")
    // two-sided rescore: id_a only ever matches probe shingles, id_b
    // only stored ones — neither relation shuffles for the other side
    Dedup.rescoreJaccardTwoSided(cand, probeSh, storedDocs,
      "doc_id", "__sh", jaccardThreshold)
  }

  /** Maintain the EXACT-probe store from a document stream (round 11)
    * — the deterministic-complete sibling of [[maintainMinhash]]: each
    * micro-batch writes its docs' shingle arrays PLUS their canonically
    * ordered 64-bit hash arrays (`__n`, `__ha` — everything
    * [[Dedup.probePairsOnOrdered]] needs) to `$storeDir/docs`. The
    * ordering authority is a DOCUMENT-FREQUENCY relation FROZEN at
    * bootstrap from the first batch and persisted to
    * `$storeDir/dford` — the [[VectorIngest]] frozen-hyperplane
    * discipline: later batches order their shingles against it
    * batch-locally (one keyed join, no cross-batch aggregate, no
    * state store). Freezing is CORRECTNESS-FREE: prefix completeness
    * holds under any shared total order, so df drift only ever costs
    * candidate volume, never recall — refreshing dford (and rewriting
    * `__ha`) at a compaction boundary is a cost optimization, exactly
    * like the quantizer refit. Serving probes needs no threshold
    * pinned at ingest: the store holds FULL ordered arrays and the
    * serve derives its prefix slices scan-locally, so one store
    * answers probes at any threshold. */
  def maintainJaccardStore(stream: DataFrame, id: String, text: String,
                           storeDir: String,
                           trigger: Trigger = Trigger.AvailableNow(),
                           onBatch: Long => Unit = _ => (),
                           compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = stream.sparkSession
        requireNoPendingSwap(spark, storeDir)
        val sh = shingled(batch.toDF(), id, text).persist()
        try {
          val ex = Dedup.hashedShingles(sh, "doc_id", "__sh")
          val dfordDir = s"$storeDir/dford"
          // bootstrap: freeze the ordering authority from the first
          // batch (first writer wins — the _SUCCESS marker is the
          // atomic commit, a replayed batch 0 overwrites identically).
          // __gen tags the order GENERATION (0 at bootstrap, bumped by
          // [[refreshOrderAuthority]]); every docs row carries the
          // generation it was ordered under, so a serve can PROVE the
          // shared-total-order premise instead of assuming it.
          if (!new org.apache.hadoop.fs.Path(dfordDir).getFileSystem(
              spark.sparkContext.hadoopConfiguration).exists(
              new org.apache.hadoop.fs.Path(s"$dfordDir/_SUCCESS")))
            ex.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
              .withColumn("__gen", lit(0L))
              .write.mode("overwrite").parquet(dfordDir)
          val dford = spark.read.parquet(dfordDir)
          val gen = orderGen(dford)
          Dedup.orderedByDf(ex, dford.drop("__gen"), "doc_id")
            .join(sh, "doc_id")
            .select(col("doc_id"), col("__sh"), col("__n"), col("__ha"))
            .withColumn("__ogen", lit(gen))
            .withColumn("__batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(s"$storeDir/docs")
          if (compactEvery > 0 &&
              TextIngest.batchPartitionDirs(spark,
                s"$storeDir/docs").length >= compactEvery)
            compactJaccardStore(spark, storeDir, upToBatch = batchId)
          onBatch(batchId)
        } finally { sh.unpersist(); () }
      }
      .trigger(trigger)
      .option("checkpointLocation", s"$storeDir/_checkpoint")
      .start()

  /** Fold committed docs batch partitions into `__batch=-1` — rows are
    * globally unique (one batch per doc), full-row distinct makes the
    * fold idempotent across the crash window. dford is bootstrap-frozen
    * and untouched. */
  def compactJaccardStore(spark: SparkSession, storeDir: String,
                          upToBatch: Long, targetFiles: Int = 1): Unit = {
    requireNoPendingSwap(spark, storeDir)
    val dir = s"$storeDir/docs"
    val fold = TextIngest.batchPartitionDirs(spark, dir)
      .filter(_.getName.stripPrefix("__batch=").toLong < upToBatch)
    if (fold.length > 1) {
      val loaded = spark.read.option("basePath", dir)
        .parquet(fold.map(_.toString).toIndexedSeq: _*)
      // __ogen guard for stores written before the generation stamp
      // existed (treated as generation 0, matching orderGen's fallback)
      val withGen = if (loaded.columns.contains("__ogen")) loaded
        else loaded.withColumn("__ogen", lit(0L))
      val folded = withGen
        .select(col("doc_id"), col("__sh"), col("__n"), col("__ha"), col("__ogen"))
        .distinct()
        .withColumn("__batch", lit(TextIngest.CompactedBatchId))
        .coalesce(math.max(1, targetFiles))
        .localCheckpoint(true)
      folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch")
        .parquet(dir)
      fold.filter(_.getName != s"__batch=${TextIngest.CompactedBatchId}")
        .foreach(TextIngest.deleteDir(spark, _))
      spark.catalog.refreshByPath(dir)
    }
  }

  /** The order GENERATION a dford relation declares (0 when the
    * column is absent or the relation is empty). */
  private def orderGen(dford: DataFrame): Long =
    if (!dford.columns.contains("__gen")) 0L
    else {
      val r = dford.agg(max(col("__gen"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

  private def storeFs(spark: SparkSession,
                      storeDir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def swapMarker(storeDir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$storeDir/_swap_pending")

  /** Refuse to touch a store whose refresh swap is mid-flight — every
    * writer AND reader of the jaccard store calls this first, so an
    * interrupted [[refreshOrderAuthority]] can only ever surface as
    * this loud error (repaired by rerunning the refresh, which
    * completes the swap), never as a maintenance batch quietly
    * recreating a truncated docs dir that would PASS the generation
    * check while missing the corpus. */
  private def requireNoPendingSwap(spark: SparkSession, storeDir: String): Unit =
    require(!storeFs(spark, storeDir).exists(swapMarker(storeDir)),
      s"store $storeDir has an interrupted order refresh (_swap_pending); " +
        "rerun refreshOrderAuthority to complete it before using the store")

  /** Complete (or clean up) an interrupted refresh swap, idempotently.
    * The marker is only ever created AFTER both `__rewrite` dirs are
    * fully written, so recovery can always roll FORWARD to the new
    * generation; the pre-swap copy survives as `__old` until its dir's
    * swap finishes, so no crash point leaves the store without a full
    * copy of the corpus. */
  private def recoverPendingSwap(spark: SparkSession, storeDir: String): Unit = {
    val fs = storeFs(spark, storeDir)
    val marker = swapMarker(storeDir)
    if (!fs.exists(marker)) return
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    for (sub <- Seq("docs", "dford")) {
      val target = p(s"$storeDir/$sub")
      val tmp = p(s"$storeDir/${sub}__rewrite")
      val old = p(s"$storeDir/${sub}__old")
      if (fs.exists(tmp) && fs.exists(target) && !fs.exists(old)) {
        // this dir's swap never started: run it
        require(fs.rename(target, old), s"rename $target aside failed")
        require(fs.rename(tmp, target), s"rename $tmp in failed")
        fs.delete(old, true)
      } else if (!fs.exists(target) && fs.exists(tmp)) {
        // died between the aside-rename and the in-rename: roll forward
        require(fs.rename(tmp, target), s"rename $tmp in failed")
        fs.delete(old, true)
      } else if (!fs.exists(target) && fs.exists(old)) {
        // rewrite vanished (external cleanup): roll back to the copy
        require(fs.rename(old, target), s"rollback $old failed")
      } else if (fs.exists(target) && fs.exists(old)) {
        // swap completed; the aside copy is leftover
        fs.delete(old, true)
        fs.delete(tmp, true)
      }
    }
    fs.delete(marker, true)
    ()
  }

  /** Refresh the store's frozen df-order authority from the FULL
    * current corpus and rewrite every stored row's `__n`/`__ha` under
    * it — the [[VectorIngest.RefitPolicy]] analog for the exact-probe
    * store. Pure COST maintenance, never correctness: results are
    * order-independent, but a drifted corpus (bootstrap batch
    * unrepresentative — its tokens frozen "rare", later-common tokens
    * at df 0 sorting FIRST into every prefix) inflates candidate
    * volume until the authority reflects reality. STOP-THE-WORLD: the
    * store must have no active maintenance stream and no concurrent
    * probes — a probe signed with the new authority against
    * partially-rewritten rows loses the shared-total-order premise
    * prefix completeness stands on (unlike the other stores' crash
    * windows, which only ever cost duplicates, this one would cost
    * recall). The crash DISCIPLINE that makes this safe to rerun:
    * both relations are fully materialized from pre-mutation state
    * (eager checkpoints), each lands via write-temp + delete + rename
    * (never a partial in-place overwrite — the full-store rewrite also
    * absorbs any stale compaction partitions, which dynamic overwrite
    * would have left in place with OLD-order rows), the docs swap
    * completes before the dford swap, and the generation stamp
    * (`__gen` in dford, `__ogen` on every docs row) bumps together.
    * The swap itself is the marker protocol: both `__rewrite` dirs are
    * FULLY written before `_swap_pending` is created, each dir then
    * swaps via rename-aside + rename-in (a full copy of the corpus
    * exists on disk at every instant — never a delete-then-rename
    * hole), and the marker is removed last. Every store reader and
    * writer refuses while the marker exists
    * ([[requireNoPendingSwap]]), and rerunning this op first
    * completes the interrupted swap ([[recoverPendingSwap]]) — so any
    * crash leaves either a consistent store or a loud,
    * rerun-to-repair refusal. Silent recall loss is not a reachable
    * state. A maintenance stream restarted afterwards picks the
    * refreshed authority up automatically (dford is re-read every
    * batch). */
  def refreshOrderAuthority(spark: SparkSession, storeDir: String): Unit = {
    recoverPendingSwap(spark, storeDir)
    val dir = s"$storeDir/docs"
    val fs = storeFs(spark, storeDir)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val newGen = orderGen(spark.read.parquet(s"$storeDir/dford")) + 1L
    val docs = spark.read.parquet(dir)
      .select(col("doc_id"), col("__sh"), col("__batch"))
      .dropDuplicates("doc_id")
      .localCheckpoint(true)
    val ex = Dedup.hashedShingles(docs, "doc_id", "__sh")
    val newDford = ex.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .withColumn("__gen", lit(newGen))
      .localCheckpoint(true)
    val rewritten = Dedup.orderedByDf(ex, newDford.drop("__gen"), "doc_id")
      .join(docs, "doc_id")
      .select(col("doc_id"), col("__sh"), col("__n"), col("__ha"),
        lit(newGen).as("__ogen"), col("__batch"))
      .localCheckpoint(true)
    // 1. both rewrites land completely before any mutation is visible
    fs.delete(p(s"${dir}__rewrite"), true)
    rewritten.write.partitionBy("__batch").parquet(s"${dir}__rewrite")
    fs.delete(p(s"$storeDir/dford__rewrite"), true)
    newDford.write.parquet(s"$storeDir/dford__rewrite")
    // 2. commit point: marker present => every rewrite is complete,
    //    recovery always rolls forward
    fs.create(swapMarker(storeDir), true).close()
    // 3. swap each dir: aside, in, drop aside
    for (sub <- Seq("docs", "dford")) {
      val target = p(s"$storeDir/$sub")
      require(fs.rename(target, p(s"$storeDir/${sub}__old")),
        s"rename $target aside failed")
      require(fs.rename(p(s"$storeDir/${sub}__rewrite"), target),
        s"rename ${sub}__rewrite in failed")
      fs.delete(p(s"$storeDir/${sub}__old"), true)
    }
    fs.delete(swapMarker(storeDir), true)
    spark.catalog.refreshByPath(dir)
    spark.catalog.refreshByPath(s"$storeDir/dford")
  }

  /** Exact one-way Jaccard probe served OFF THE STORE: the probe batch
    * orders its shingles against the store's frozen dford (the shared
    * total order both sides must sign with — the `_srp_params`
    * discipline, except here a mismatched order costs candidates, not
    * recall), derives prefix postings scan-locally, and runs the full
    * filtered candidate join + hash gate + exact string rescore
    * against the store's persisted arrays. The corpus text is never
    * rescanned and no corpus-wide aggregate runs at serve time — the
    * store read is a scan-local projection of (doc_id, __sh, __n,
    * __ha). Guaranteed recall at the threshold (prefix completeness),
    * unlike [[minhashProbeFromStore]]. Probe ids must be disjoint from
    * stored ids. Output (id_a = probe, id_b = stored match, jaccard). */
  def jaccardProbeFromStore(spark: SparkSession, storeDir: String,
                            newDocs: DataFrame, id: String, text: String,
                            jaccardThreshold: Double = 0.5): DataFrame = {
    requireNoPendingSwap(spark, storeDir)
    val probeSh = shingled(newDocs, id, text).localCheckpoint(true)
    val dford = spark.read.parquet(s"$storeDir/dford")
    // PROVE the shared-total-order premise before joining anything: a
    // store mutated outside the marker protocol (a re-bootstrapped
    // dford beside older rows, external surgery) leaves generations
    // disagreeing, and probing across orders would silently lose
    // recall — the one failure mode this store must never take
    // silently. Cost note: this reads ONE column whose value is
    // constant per file (dictionary/RLE — kilobytes per file), so the
    // check is O(#files) footer-and-page IO, not O(corpus bytes); the
    // rest of the serve stays the scan-local projection promised
    // below. Skipped for pre-generation stores (no __ogen column =
    // written before refreshes existed = generation 0 throughout).
    val gen = orderGen(dford)
    val storedRaw = spark.read.parquet(s"$storeDir/docs")
    if (storedRaw.columns.contains("__ogen")) {
      val genBounds = storedRaw.agg(
        min(col("__ogen")).as("mn"), max(col("__ogen")).as("mx")).head()
      if (!genBounds.isNullAt(0))
        require(genBounds.getLong(0) == gen && genBounds.getLong(1) == gen,
          s"store $storeDir order-generation mismatch: dford declares $gen but " +
            s"docs carry [${genBounds.getLong(0)}, ${genBounds.getLong(1)}] — " +
            "a refreshOrderAuthority was interrupted; rerun it to repair")
    } else require(gen == 0L,
      s"store $storeDir has a generation-$gen dford but pre-generation docs; " +
        "rerun refreshOrderAuthority to rewrite them consistently")
    val pOrd = Dedup.orderedByDf(
      Dedup.hashedShingles(probeSh, "doc_id", "__sh"), dford.drop("__gen"), "doc_id")
      .persist()
    val stored = storedRaw
      .select(col("doc_id"), col("__sh"), col("__n"), col("__ha"))
      .dropDuplicates("doc_id")
      .persist()
    val rescorable = Dedup.probePairsOnOrdered(
      pOrd, stored.select(col("doc_id"), col("__n"), col("__ha")),
      "doc_id", jaccardThreshold)
    val out = Dedup.rescoreJaccardTwoSided(rescorable, probeSh,
      stored.select(col("doc_id"), col("__sh")), "doc_id", "__sh",
      jaccardThreshold)
    pOrd.unpersist(blocking = false)
    stored.unpersist(blocking = false)
    out
  }

  /** Near-dup pairs served off the stream-maintained store: band
    * collisions over the signature store, exact shingle-Jaccard
    * rescore from the doc store — [[Dedup.minhashLshPortableOnShingles]]'
    * candidate algebra with the store standing in for the featurized
    * corpus, so the served relation (and its oracle) is the batch
    * key's verbatim. The pre-join distinct/dropDuplicates are the
    * compaction-crash-window guards ([[TextIngest.bm25FromStore]]):
    * rows are unique by construction, duplicates only ever mean a
    * stale partition beside its relocated copy. */
  def nearDupsFromStore(spark: SparkSession, storeDir: String,
                        jaccardThreshold: Double = 0.5): DataFrame = {
    val banded = spark.read.parquet(s"$storeDir/sigs")
      .select(col("doc_id"), col("__band"), col("__key"))
      .distinct()
      .persist()
    val docs = spark.read.parquet(s"$storeDir/docs")
      .select(col("doc_id"), col("__sh"))
      .dropDuplicates("doc_id")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.__band") === col("b.__band") && col("a.__key") === col("b.__key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
      .localCheckpoint(true)
    banded.unpersist(blocking = false)
    Dedup.rescoreJaccard(cand, docs, "doc_id", "__sh", jaccardThreshold)
  }
}
