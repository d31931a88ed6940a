package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators — ref visualization.py:50, :104, :193,
  * :237-238 plus harness ExtOps (SURVEY.md §2.4).
  *
  * All are hash aggregates: Spark plans partial (map-side) + final
  * stages automatically, so each costs exactly one shuffle of the
  * already-reduced partials — the shape that holds at 100 TB.
  *
  * Float-sum determinism: aggregation order is unspecified across
  * partitions, so summing raw doubles is nondeterministic in the last
  * ulps. [[sumExact]] sums decimal-cast values (exact integer-scaled
  * arithmetic) and casts the result back to double — bit-identical
  * across engines and runs.
  */
object Aggregates {

  /** Exact, order-independent sum of a 2-decimal-valued double column. */
  def sumExact(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Exact mean: decimal-exact sum / count, one IEEE division. */
  def avgExact(c: Column, scale: Int = 2): Column =
    sumExact(c, scale) / count(c)

  /** groupBy-count — ref visualization.py:104. */
  def countByKey(df: DataFrame, keys: Seq[Column], out: String): DataFrame =
    df.groupBy(keys: _*).agg(count(lit(1)).as(out))

  /** groupBy-sum — ref visualization.py:193. */
  def sumByKey(df: DataFrame, keys: Seq[Column], value: Column, out: String): DataFrame =
    df.groupBy(keys: _*).agg(sumExact(value).as(out))

  /** Distinct key pairs (legend domain) — ref visualization.py:50. */
  def distinctPairs(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** Global min/max bounds — ref visualization.py:237-238. */
  def globalMinMax(df: DataFrame, c: String): DataFrame =
    df.agg(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))

  /** Sorted distinct values (picker options) — ref visualization.py:136. */
  def distinctSorted(df: DataFrame, c: String): DataFrame =
    df.select(col(c)).distinct().orderBy(col(c))

  /** Exact count-distinct per group — ExtOp agg_countd_exact. */
  def countDistinctByKey(df: DataFrame, keys: Seq[Column], value: Column, out: String): DataFrame =
    df.groupBy(keys: _*).agg(countDistinct(value).as(out))

  /** HLL approximate count-distinct — ExtOp agg_countd_approx. At
    * 100 TB this is the only sane distinct-cardinality: fixed-size
    * sketch, one shuffle of sketches, mergeable. rsd pinned for
    * reproducibility. */
  def approxCountDistinctByKey(df: DataFrame, keys: Seq[Column], value: Column,
                               out: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(keys: _*).agg(approx_count_distinct(value, rsd).as(out))

  /** Content-addressed table checksum: every row hashes to a 60-bit
    * md5-derived signature, rows bucket by that hash, and each bucket
    * reduces to (XOR of signatures, row count). Two tables are equal
    * (w.h.p.) iff their checksum relations are equal — which makes
    * verifying a 100 TB replica/ingest a CONSTANT-size comparison per
    * bucket instead of a full-table join: XOR is commutative and
    * associative, so the aggregate is one partial+final pass with no
    * sort, no list state, and no layout sensitivity. Pass columns of
    * string/integral/date type: float-to-string rendering differs
    * across engines, so keep doubles out of cross-engine checksums
    * (within one engine they are fine). Nulls render as a sentinel
    * distinct from any real value. */
  def tableChecksum(df: DataFrame, cols: Seq[String], buckets: Int): DataFrame = {
    require(cols.nonEmpty && buckets >= 1)
    // LENGTH-PREFIXED cells (round-15 review): the bare '|' join made
    // ("a|b","c") and ("a","b|c") checksum-equal DETERMINISTICALLY —
    // a replica that shifted a delimiter across a column boundary
    // verified as identical — and a real value equal to the null
    // sentinel collided with NULL. "len:value" decodes unambiguously
    // left-to-right, and the bare "n" null marker is unreachable from
    // any non-null cell (those always start with a digit).
    val rowStr = concat_ws("|", cols.map { c =>
      val v = col(c).cast("string")
      coalesce(concat(length(v).cast("string"), lit(":"), v), lit("n"))
    }: _*)
    // 15 hex digits = 60 bits: positive in a signed long in BOTH
    // engines (16 digits would overflow DuckDB's signed BIGINT cast)
    val h = conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long")
    df.select(h.as("__h"))
      .withColumn("bucket", pmod(col("__h"), lit(buckets.toLong)).cast("int"))
      .groupBy(col("bucket"))
      .agg(expr("bit_xor(__h)").as("xor_sig"), count(lit(1)).as("n_rows"))
  }

  /** Equi-width histogram with FIXED caller-declared bounds — the
    * distribution profile a quality dashboard reads. Fixed literal
    * bounds (not data-derived min/max) keep the bucketing a pure
    * function of each value, so the integer counts are oracle-exact;
    * out-of-range values land in explicit underflow (-1) / overflow
    * (nBuckets) buckets instead of silently clamping. One partial+final
    * hash aggregate. */
  def histogram(df: DataFrame, value: Column, lo: Double, hi: Double,
                nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && hi > lo, "need hi > lo and at least one bucket")
    val width = (hi - lo) / nBuckets
    val bucket = when(value.isNull, lit(null))
      .when(value < lo, lit(-1))
      .when(value >= hi, lit(nBuckets))
      // least() clamp (round-15 review): for values just under hi,
      // (value - lo) can round to the same double as (hi - lo), so
      // the floor alone would land an in-range value in the overflow
      // bucket the >= hi branch explicitly did NOT take
      .otherwise(least(floor((value - lit(lo)) / lit(width)),
        lit((nBuckets - 1).toLong)))
      .cast("int")
    df.select(bucket.as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("edge_lo", lit(lo) + col("bucket") * lit(width))
  }

  /** Approximate grouped quantiles (Greenwald–Khanna via Spark's
    * percentile_approx) — the 100 TB quantile: one pass, bounded
    * memory, mergeable partials, rank error <= n/accuracy. Exact
    * percentiles ([[medianDiscByKey]]) need a per-group sort; at scale
    * the sketch is the only sane default and the exact form the
    * spot-check. Output exploded to one (group, q, value) row per
    * requested quantile. */
  def approxQuantilesByKey(df: DataFrame, keys: Seq[Column], value: Column,
                           qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    df.groupBy(keys: _*)
      .agg(percentile_approx(value,
        array(qs.map(lit): _*), lit(accuracy)).as("__qv"))
      .select(keys ++ Seq(posexplode(col("__qv")).as(Seq("__i", "qvalue"))): _*)
      .withColumn("q", element_at(array(qs.map(lit): _*), col("__i") + 1))
      .drop("__i")
  }

  /** Persistable, RE-AGGREGATABLE distinct-count sketches (Apache
    * DataSketches HLL via Spark's hll_sketch_agg family) — the 100 TB
    * pattern [[approxCountDistinctByKey]] can't express: precompute one
    * sketch per fine grain (per partition, per day, per nation) ONCE,
    * persist the binary column, then answer ANY coarser rollup by
    * merging sketches — no rescan of the raw data, ever. HLL register
    * merge is lossless (register-wise max at equal lgK), so the merged
    * estimate EQUALS the direct sketch over the union — pinned in
    * ScaleSpec. */
  def sketchByKey(df: DataFrame, keys: Seq[Column], value: Column,
                  out: String, lgK: Int = 12): DataFrame =
    df.groupBy(keys: _*).agg(hll_sketch_agg(value, lit(lgK)).as(out))

  /** Merge fine-grain sketches up to coarser keys and estimate. */
  def mergeSketches(df: DataFrame, keys: Seq[Column], sketch: Column,
                    out: String): DataFrame =
    df.groupBy(keys: _*)
      .agg(hll_sketch_estimate(hll_union_agg(sketch)).as(out))

  /** Sentinel labels via grouping(), not coalesce: a genuine NULL key
    * value must stay distinguishable from a subtotal row (coalescing
    * both to the sentinel silently merges them). */
  private def sentinelGroupingSum(grouped: org.apache.spark.sql.RelationalGroupedDataset,
                                  keys: Seq[String], value: Column, out: String,
                                  allLabel: String): DataFrame = {
    val aggs = sumExact(value).as(out) +:
      keys.map(k => grouping(col(k)).as(s"__g_$k"))
    val agged = grouped.agg(aggs.head, aggs.tail: _*)
    keys.foldLeft(agged) { (d, k) =>
      d.withColumn(k, when(col(s"__g_$k") === 1, lit(allLabel)).otherwise(col(k)))
    }.drop(keys.map(k => s"__g_$k"): _*)
  }

  /** ROLLUP with sentinel labels on subtotal rows — ExtOp agg_rollup. */
  def rollupSum(df: DataFrame, keys: Seq[String], value: Column, out: String,
                allLabel: String = "ALL"): DataFrame =
    sentinelGroupingSum(df.rollup(keys.map(col): _*), keys, value, out, allLabel)

  /** CUBE (all grouping-set combinations), same sentinel treatment —
    * ExtOp agg_cube. */
  def cubeSum(df: DataFrame, keys: Seq[String], value: Column, out: String,
              allLabel: String = "ALL"): DataFrame =
    sentinelGroupingSum(df.cube(keys.map(col): _*), keys, value, out, allLabel)

  /** Arbitrary GROUPING SETS with the same sentinel treatment — the
    * general form ROLLUP/CUBE specialize (e.g. the two marginals
    * without the full cross grouping). One pass: Spark expands the
    * sets into a single Expand + hash agg, not one scan per set. */
  def groupingSetsSum(df: DataFrame, sets: Seq[Seq[String]], keys: Seq[String],
                      value: Column, out: String, allLabel: String = "ALL"): DataFrame =
    sentinelGroupingSum(df.groupingSets(sets.map(_.map(col)), keys.map(col): _*),
      keys, value, out, allLabel)

  /** Pivot: one column per (pinned) pivot value, decimal-exact sums.
    * Pinning the value list keeps the plan single-pass — without it
    * Spark first runs a distinct scan to discover the columns. */
  def pivotSum(df: DataFrame, key: Column, pivotCol: String,
               pivotValues: Seq[String], value: Column): DataFrame =
    df.groupBy(key).pivot(pivotCol, pivotValues)
      .agg(sumExact(value))

  /** Discrete (type-1) median per group: the smallest value whose rank
    * reaches p — no interpolation, so the result is an actual data
    * value and bit-deterministic across engines (interpolated
    * percentiles mix float arithmetic orders). */
  def medianDiscByKey(df: DataFrame, keys: Seq[Column], valueCol: String,
                      out: String): DataFrame =
    df.groupBy(keys: _*).agg(
      expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $valueCol)").as(out))
}
