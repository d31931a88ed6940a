package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Conditional compute fan-out (optimization round 21, guide §2.5
  * "input skew: one huge unsplittable file … repartition immediately
  * after the read").
  *
  * The bench corpus files are single-row-group parquet, so every scan
  * — regardless of split count — yields ONE real task, and any
  * CPU-dense per-row work Catalyst fuses into the scan stage (shingle
  * explode + md5 min-hashing, tokenization, vector encodes, media
  * decodes) runs single-threaded while the other 31 cores idle
  * (profiled: the dedup_minhash signature build was one 2.2 s task of
  * a 2.9 s key). The same shape recurs at production scale whenever a
  * pipeline stands CPU-dense work on a narrow relation: a gzip file,
  * a driver-collected bootstrap, a store partition.
  *
  * [[fanOut]] hash-repartitions to the session's shuffle parallelism
  * ONLY when the input's planned partitioning is narrower — a
  * well-partitioned input (any real multi-row-group table at scale)
  * passes through untouched, so this can never add a pointless full
  * shuffle of a 100 TB corpus. The partition check plans the subtree
  * but schedules no job; call sites are scan/checkpoint-shaped where
  * that is microseconds. Keys must be deterministic row-identifying
  * columns (hash repartition — never round-robin: no
  * sort-before-repartition cost, and deterministic under task retry,
  * the SPARK-38388 discipline).
  *
  * Correctness posture: a repartition changes WHERE rows are computed,
  * never what they contain; apply only above partitioning-insensitive
  * consumers (per-row projections, key-keyed aggregates/joins). Do NOT
  * feed fanned-out relations into order-sensitive sinks (collect
  * without sort, limit without order) or into quantizer/sample FITS
  * whose driver-side collection order feeds float arithmetic — those
  * must keep their pinned input layout. */
object Par {

  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "fanOut needs deterministic repartition keys")
    // kill switch for A/B bisection (-Dgraft.par.fanout=off): fanOut
    // changes wall-clock shape, never results, so a toggle is safe
    if (sys.props.get("graft.par.fanout").contains("off")) return df
    // streaming guard (r21 ADVICE): the width probe below throws
    // AnalysisException on a streaming DataFrame — pass it through
    // untouched (the sizedDayExplode discipline). Note the probe is
    // "no job scheduled", not "no work": under AQE, planning a subtree
    // that already CONTAINS an exchange can materialize query stages;
    // current call sites are scan/checkpoint-shaped where it is
    // microseconds, and new call sites must keep that property.
    if (df.isStreaming) return df
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    // queryExecution.toRdd, not .rdd: same planned partitioning, but no
    // row-deserializer subtree and no QueryExecutionListener "action"
    // event (DedupSpec pins the dedup tiers' driver-action counts, and
    // a width probe is not an action — it schedules no job)
    if (df.queryExecution.toRdd.getNumPartitions >= n) df
    else df.repartition(n, keys: _*)
  }
}
