package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval / date-sequence / argmax / window operators.
  *
  * The reference's signature patterns (ref
  * tasks/visualization/src/visualization.py):
  *  - point-in-interval validity filter (:97-98)
  *  - argmax-per-group via unstable sort + drop_duplicates (:103, :130)
  *  - per-row day-range explode + re-aggregate (:186-193)
  * re-expressed with Catalyst-native expressions. The pandas row-wise
  * `apply` of :186 becomes the codegen'd `sequence()` + `explode()`
  * generator; the unstable-sort argmax gets a pinned deterministic
  * tiebreaker (SURVEY.md §2.4 caveat).
  */
object Temporal {

  /** Point-in-time validity filter: start <= d AND d <= end —
    * ref visualization.py:97-98. The predicate is scan-pushable. */
  def pointInInterval(df: DataFrame, d: Column, start: String, end: String): DataFrame =
    df.filter(col(start) <= d && d <= col(end))

  /** Per-row array of all days in [start, end], exploded to one row per
    * day — ref visualization.py:186-189, built-in generator instead of
    * the reference's row-wise Python apply. Explode fan-out =
    * interval length; at 100 TB keep intervals bounded (cap or bucket
    * by month) before exploding. */
  def explodeDays(df: DataFrame, out: String, start: Column, end: Column): DataFrame =
    // inverted intervals (end < start — one dirty row in a 100 TB
    // relation) yield ZERO days instead of killing the whole job:
    // sequence() throws on illegal boundaries, and in the bucketed
    // range joins that crash landed in the eager sizing estimate, so
    // even plan construction died (round-15 review)
    df.filter(start <= end)
      .withColumn(out, explode(sequence(start, end, expr("interval 1 day"))))

  /** Whole-row argmax per group with a DETERMINISTIC tiebreaker —
    * ref visualization.py:103/:130 does
    * `sort_values(desc).drop_duplicates(keep='first')` over an
    * unstable quicksort, so its tie-break is nondeterministic; we pin
    * the order. One shuffle on the group keys; no join. */
  def argmaxPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Top-k rows per group (generalizes argmax k=1) — rank-1 pattern of
    * ref visualization.py:103 widened for the harness (SURVEY.md §2.5). */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
                   rankName: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn(rankName, row_number().over(w)).filter(col(rankName) <= k)
  }

  /** Running (cumulative) aggregate over an ordered partition —
    * ExtOp win_running_sum (SURVEY.md §2.5). */
  def runningSum(df: DataFrame, out: String, value: Column,
                 partition: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, sum(value).over(w))
  }

  /** Trailing `windowDays`-day sum per key — an event-time RANGE frame
    * over integer day numbers, the batch form of a sliding event-time
    * window. RANGE (not ROWS) so same-day peers share one frame and the
    * result is deterministic even when intra-day order is ambiguous.
    * Decimal-exact sum (see Aggregates float-sum determinism note). */
  def trailingSumByDays(df: DataFrame, keys: Seq[Column], day: Column,
                        value: Column, windowDays: Int, out: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(day)
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    df.withColumn(out, sum(value.cast("decimal(28,2)")).over(w).cast("double"))
  }

  /** Day-over-day (lag) delta — ExtOp win_lag_delta. */
  def lagDelta(df: DataFrame, out: String, value: Column,
               partition: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(out, value - lag(value, 1).over(w))
  }

  /** Dense rank within a partition — ExtOp win_rank_dense. */
  def denseRankIn(df: DataFrame, out: String,
                  partition: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn(out, dense_rank().over(Window.partitionBy(partition: _*).orderBy(order: _*)))

  // ---- interval joins (generalized flt_point_in_interval, SURVEY.md §2.3) ----

  /** Range join: probe dates x interval rows, probe side SMALL.
    * Broadcasting the probe side turns Catalyst's default
    * BroadcastNestedLoopJoin into a distributed O(|intervals| x |probes|)
    * scan with no shuffle of the big side — the right plan whenever one
    * side is dimension-sized. For big-x-big, use [[rangeJoinBucketed]]. */
  def rangeJoinBroadcastProbes(probes: DataFrame, intervals: DataFrame,
                               probeDate: String, start: String, end: String): DataFrame =
    intervals.join(
      broadcast(probes),
      col(start) <= col(probeDate) && col(probeDate) <= col(end))

  /** As-of join: for every left (probe) row, the LATEST right row with
    * rightTime <= leftTime within the same key — event attribution,
    * point-in-time dimension lookup, "price as of trade time".
    *
    * Spark-first composition, no custom strategy and no range cross
    * join: tag both sides, union, and run `last(_, ignoreNulls)` over a
    * (key)-partitioned window ordered by (time, side) — right rows sort
    * before left rows at equal timestamps, so exact-time matches are
    * visible (<= semantics). Costs exactly ONE shuffle+sort on the
    * keys; at 100 TB both sides stream through the same partitioning,
    * which is the plan a native as-of operator would pick anyway.
    *
    * Left-join semantics: probes with no prior right row keep nulls.
    * The fill carries ONE struct of the whole matched right row (not
    * per-column fills), so a latest right row whose value is genuinely
    * NULL yields null — never a stale older value. Right-side ties at
    * identical (key, time) resolve DETERMINISTICALLY to the greatest
    * rightVals struct (Spark's field-wise struct ordering) — the tie
    * value rides the existing window sort as a third key, so pinning
    * the contract costs zero extra shuffles. The one carve-out: a
    * rightVals struct containing a type Catalyst cannot order (maps,
    * calendar intervals — `RowOrdering.isOrderable` decides) cannot
    * join the sort, so there ties fall back to partition order — pass
    * an orderable tiebreak column in rightVals if tie identity matters
    * for such a payload. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightVals: Seq[String], outPrefix: String = "asof_"): DataFrame = {
    val rvStruct = struct(rightVals.map(col): _*)
    // NULL-keyed right rows can never match under join semantics
    // (null != null), but the window's partitionBy groups all nulls
    // together — dropping them here keeps a null-keyed probe
    // unmatched (null asof_* columns) instead of silently attributing
    // it from unrelated null-keyed right rows (round-15 review)
    val rBase = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), rvStruct.as("__rv")): _*)
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__side", lit(0))
    val lAug = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rBase.schema("__rv").dataType))
    val leftOnly = lAug.columns.filterNot(rBase.columns.contains)
    val rAug = leftOnly.foldLeft(rBase) { (d, c) =>
      d.withColumn(c, lit(null).cast(lAug.schema(c).dataType))
    }
    val unioned = lAug.unionByName(rAug)
    // Catalyst's own orderability judgment, not a hand-rolled
    // approximation: an under-approximation would silently lose the
    // deterministic-tie contract, an over-approximation (e.g. calling
    // CalendarIntervalType orderable) would crash the window's ORDER BY
    // on a payload that joined fine before the tie key existed
    val tieKeys =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        rBase.schema("__rv").dataType)) Seq(col("__rv").asc) else Nil
    // left rows carry a null __rv here, and nulls sort FIRST under asc
    // — irrelevant anyway, since __side already orders left after right
    // at equal times and the tie key only disambiguates within a side
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc +: col("__side").asc +: tieKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__rv",
      last(col("__rv"), ignoreNulls = true).over(w))
    rightVals.foldLeft(filled.filter(col("__side") === 1)) { (d, c) =>
      d.withColumn(s"$outPrefix$c", col(s"__rv.$c"))
    }.drop("__t", "__side", "__rv")
  }

  /** Range join for big-x-big: explode each interval into its days
    * (reusing [[explodeDays]]) and equi-join on the day — a shuffled
    * hash/sort-merge join Catalyst can plan, instead of a nested-loop.
    * Fan-out = interval length in days, so bound intervals before
    * calling. For a corpus with HOT days use
    * [[rangeJoinBucketedSalted]]: the pinned repartitions here are
    * REPARTITION_BY_NUM shuffles, which AQE's OptimizeSkewedJoin does
    * not split, so one hot day lands on one reducer. */
  /** Partition count for a pair-expansion join, derived from the
    * ESTIMATED MATCHED-PAIR VOLUME — the sum over days of
    * |probes(day)| * |intervals(day)| — rather than input bytes (which
    * AQE would use and be wrong by the expansion factor) or a blind
    * session constant (right at one scale, a serialization bottleneck
    * at 100x). Costs two day-keyed counts, a days-sized join, and one
    * driver scalar — O(scan) against the join's O(pairs). Floors at
    * the session shuffle partitions (small inputs keep today's
    * behavior exactly), caps at 4096 (beyond that, per-partition
    * scheduling overhead dominates at any realistic executor count).
    * The estimate runs in double — sizing needs magnitude, not
    * exactness, and a 100 TB day-product can overflow a long sum. */
  /** Day-explode `intervals` ONCE for both the sizing estimate and the
    * join (round 15, VERDICT r14 #1 — the docOrd pattern from the
    * jaccard family): the exploded relation is a LAZY local checkpoint,
    * materialized by the estimate's first action and then read back by
    * the join instead of re-running the explode. Lazy checkpoint (not
    * `persist()`) deliberately: a Dataset cache entry lives in the
    * CacheManager until an explicit unpersist the caller of a lazy
    * join result has no hook to issue, while a checkpoint RDD is
    * reclaimed by the ContextCleaner as soon as the returned frame is
    * unreferenced — and it adds NO scheduled job of its own, keeping
    * the tier at two driver actions total (estimate + the caller's),
    * pinned by DedupSpec's action-count test. Streaming relations
    * cannot checkpoint or estimate; they keep the raw explode and the
    * session partition pin.
    *
    * Tradeoff, stated plainly: a local checkpoint's blocks live on
    * the executors that computed them with lineage TRUNCATED, so an
    * executor lost between the estimate and the caller's action fails
    * the job instead of recomputing — the same tradeoff every eager
    * localCheckpoint in the dedup family already takes, acceptable on
    * static-allocation clusters (and definitionally on local[*]).
    * Under aggressive dynamic allocation, prefer re-running the job
    * over disabling the fusion: the exploded relation is
    * interval-sized x bounded fan-out, so recomputation is cheap
    * relative to the join it sizes. */
  private def sizedDayExplode(probes: DataFrame, intervals: DataFrame,
                              probeDate: String, start: String, end: String,
                              targetPairsPerPartition: Long): (DataFrame, Int) = {
    val exploded0 = explodeDays(intervals, "__day", col(start), col(end))
    if (probes.isStreaming || exploded0.isStreaming)
      (exploded0, probes.sparkSession.sessionState.conf.numShufflePartitions)
    else {
      val exploded = exploded0.localCheckpoint(false)
      (exploded,
        pairExpansionPartitions(probes, exploded, probeDate, targetPairsPerPartition))
    }
  }

  private def pairExpansionPartitions(probes: DataFrame, exploded: DataFrame,
                                      probeDate: String,
                                      targetPairsPerPartition: Long): Int = {
    val base = probes.sparkSession.sessionState.conf.numShufflePartitions
    // streaming relations never reach here — [[sizedDayExplode]] is
    // the single caller and gates them (its estimate is an EAGER
    // action at plan-construction time, impossible on a stream, and a
    // stream cannot checkpoint either); the require documents the
    // contract instead of duplicating the fallback
    require(!probes.isStreaming && !exploded.isStreaming,
      "pairExpansionPartitions requires batch relations (sizedDayExplode gates streams)")
    // phase counters (round 13, the jaccard_docord_build_ms pattern):
    // this estimate action is the key's hidden first phase — two
    // day-keyed counts + a days-sized join that also pays the interval
    // day-explode once — and a committed-median drift on a range-join
    // key needs to say WHICH phase moved (estimate vs the
    // pair-expansion join the main count times) before anyone reruns.
    // Caller-scoped by the bench, so bigbig/salted don't collide.
    val t0 = System.nanoTime()
    val pd = probes.groupBy(col(probeDate).as("__day")).agg(count(lit(1)).as("__pc"))
    val idd = exploded.groupBy(col("__day")).agg(count(lit(1)).as("__ic"))
    val row = pd.join(idd, "__day")
      .agg(sum(col("__pc").cast("double") * col("__ic")).as("__pairs"))
      .head()
    val est = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    val n = math.max(base, math.min(4096.0, est / targetPairsPerPartition).toInt)
    graft.Metrics.record("range_estimate_ms", (System.nanoTime() - t0) / 1000000L)
    graft.Metrics.record("range_est_pairs", est.toLong)
    graft.Metrics.record("range_partitions", n.toLong)
    n
  }

  def rangeJoinBucketed(probes: DataFrame, intervals: DataFrame,
                        probeDate: String, start: String, end: String,
                        targetPairsPerPartition: Long = 4000000L): DataFrame = {
    // pin the join's partition count: both inputs are byte-small but
    // the matched-pair volume is the product of per-day densities, so
    // AQE — which only sees input bytes — coalesces the exchanges to a
    // couple of partitions and serializes the expensive part (measured
    // 5x on a 108M-pair bench join). Explicit hash repartitions are
    // not AQE-coalescible and carry the day-partitioning through the
    // join. The COUNT is sized from the estimated pair volume
    // ([[pairExpansionPartitions]], round 11) so the pin that saves
    // this join at one scale cannot strangle it at 100x; the explode
    // itself runs once and is shared estimate-to-join
    // ([[sizedDayExplode]], round 15).
    val (exploded, n) = sizedDayExplode(probes, intervals, probeDate,
      start, end, targetPairsPerPartition)
    probes.repartition(n, col(probeDate))
      .join(exploded.repartition(n, col("__day")),
        col("__day") === col(probeDate)).drop("__day")
  }

  /** Skew-robust form of [[rangeJoinBucketed]]: probes get a
    * deterministic salt from `probeFineGrain` (row-identifying columns,
    * [[graft.ops.Skew.salt]]), exploded intervals replicate across all
    * `saltBuckets`, and the join keys on (day, salt) — a hot day's
    * pair expansion spreads over `saltBuckets` reducers instead of
    * serializing on one. The replication multiplies the (bounded
    * fan-out) interval side only, never the probe side. Same pinned
    * partition counts as the unsalted tier, for the same AQE-coalescing
    * reason; salting is the skew answer precisely BECAUSE the pinned
    * shuffles opt out of AQE's skew-split. */
  def rangeJoinBucketedSalted(probes: DataFrame, intervals: DataFrame,
                              probeDate: String, start: String, end: String,
                              saltBuckets: Int,
                              probeFineGrain: Seq[Column],
                              targetPairsPerPartition: Long = 4000000L): DataFrame = {
    // volume-derived like the unsalted tier; estimated on the PRE-salt
    // day explode (salting spreads pairs across reducers, it does not
    // change their total), which the salt replication then reuses from
    // the shared checkpoint instead of re-exploding
    val (dayExploded, n) = sizedDayExplode(probes, intervals, probeDate,
      start, end, targetPairsPerPartition)
    val exploded = dayExploded
      .withColumn("__isalt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .repartition(n, col("__day"), col("__isalt"))
    probes
      .withColumn("__psalt", graft.ops.Skew.salt(probeFineGrain, saltBuckets))
      .repartition(n, col(probeDate), col("__psalt"))
      .join(exploded,
        col("__day") === col(probeDate) && col("__isalt") === col("__psalt"))
      .drop("__day", "__isalt", "__psalt")
  }

  /** Matched-pair COUNT per interval-side group — the aggregate-
    * pushdown form of `countByKey(rangeJoinBucketed(...))` (guide
    * §2.3 "aggregate before you shuffle" / §8 "decide with small
    * rows"): when the consumer only COUNTS the matched pairs, the
    * pair expansion itself is pure waste — the count per group g
    * factors exactly as Σ_day |probes(day)| × |intervalDays(g, day)|,
    * so joining the two DAY-KEYED COUNT AGGREGATES and summing the
    * products computes the identical integer result while the
    * O(pairs) relation never exists in any stage. At bench scale that
    * replaced a 108M-row in-stage expansion (the suite's two most
    * contention-amplified keys, r20 verdict); at 100 TB it is the
    * difference between O(scan + distinct-days) and O(pairs).
    *
    * Equivalence is exact, row for row: equality joins drop NULL days
    * on either side, and so does the inner aggregate join here; a
    * group with interval days but no matching probe day produces no
    * pairs and no output row in both forms; duplicate probe dates and
    * duplicate intervals multiply counts identically. Skew needs no
    * salt in this form — a hot day is one multiplication, not a
    * reducer-sized pair expansion — which is why the salted harness
    * tier routes here too (the materializing tiers, and their salt,
    * remain for consumers that need the pair ROWS; PropertySpec pins
    * this form equal to both). Counting in long: overflows only past
    * ~9.2e18 pairs per group, at which point the count itself is the
    * wrong question. */
  def rangeCountByKey(probes: DataFrame, intervals: DataFrame,
                      probeDate: String, start: String, end: String,
                      keys: Seq[Column], out: String): DataFrame = {
    val pc = probes.groupBy(col(probeDate).as("__day"))
      .agg(count(lit(1)).as("__pc"))
    val ic = explodeDays(intervals, "__day", col(start), col(end))
      .groupBy(keys :+ col("__day"): _*).agg(count(lit(1)).as("__ic"))
    ic.join(pc, "__day")
      .groupBy(keys: _*)
      .agg(sum(col("__pc") * col("__ic")).as(out))
  }

  /** Cohort retention over an event log — the product-analytics
    * staple: users grouped by their FIRST active week (the cohort),
    * each later active week counted as that cohort's retention at
    * `week_offset` weeks. All arithmetic is integer-exact (both weeks
    * are Monday-truncated, so the day difference is a multiple of 7),
    * which is what makes the op oracle-checkable.
    *
    * Shape at scale: the user-week activity relation is the distinct of
    * a scan-local projection; cohorts are one user-keyed aggregation;
    * the join back is user-keyed; the final count is cohort-keyed —
    * every shuffle on a high-cardinality key, nothing driver-side. */
  def retentionCohorts(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val activity = events
      .select(user.as("__u"), date_trunc("week", ts).cast("date").as("__w"))
      .distinct()
    val cohorts = activity.groupBy(col("__u")).agg(min(col("__w")).as("__c"))
    activity.join(cohorts, Seq("__u"))
      .withColumn("week_offset", (datediff(col("__w"), col("__c")) / 7).cast("int"))
      .groupBy(col("__c").as("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
  }
}
