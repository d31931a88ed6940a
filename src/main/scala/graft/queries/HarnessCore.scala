package graft.queries

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Aggregates, Relational, Skew, Temporal}

/** Harness keys for the core relational surface (SURVEY.md §2.2-2.8),
  * each a composition of the graft.ops combinators over the driver's
  * TPC-H-ish testdata, paired with a DuckDB oracle in
  * [[HarnessCore.oracles]].
  *
  * Determinism rules (every key):
  *  - total ORDER BY with full tiebreak, identical in Spark + SQL;
  *  - identical output column names both sides (driver hashes by
  *    name-sorted columns);
  *  - double sums via Aggregates.sumExact (decimal-exact, then cast
  *    back to double) — never order-dependent float accumulation;
  *  - per-row double math restricted to IEEE-deterministic ops
  *    (+ - * / sqrt abs), no libm-divergent transcendentals.
  */
object HarnessCore {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark reads as Long
    * ns (spark.sql.legacy.parquet.nanosAsLong). Convert to TimestampType
    * via exact integer division — a double division would lose precision
    * above 2^53 ns (~epoch 1970+104 days). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Flagship: TPC-H-Q1-shaped pricing summary — scan, pushed filter,
    * partial+final hash agg, sort. Ref analog: the Q1 severity
    * aggregation, visualization.py:100-105. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter(to_date($"l_shipdate") <= lit(Date.valueOf("1998-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        Aggregates.sumExact($"l_quantity").as("sum_qty"),
        Aggregates.sumExact($"l_extendedprice").as("sum_base_price"),
        Aggregates.sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),

    // ---- §2.2 projections / filters / scalar column ops ----
    "proj_essential" -> ((s, dir) => {
      import s.implicits._
      Relational.project(t(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber", "l_quantity"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),
    "flt_eq" -> ((s, dir) => {
      import s.implicits._
      Relational.filterEq(t(s, dir, "orders"), "o_orderpriority", "1-URGENT")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),
    "flt_point_in_interval" -> ((s, dir) => {
      import s.implicits._
      val d = lit(Date.valueOf("1996-06-15"))
      val withIntervals = t(s, dir, "orders")
        .withColumn("start_date", to_date($"o_orderdate"))
        .withColumn("end_date", date_add($"start_date", 30))
      Temporal.pointInInterval(withIntervals, d, "start_date", "end_date")
        .select($"o_orderkey", $"start_date", $"end_date")
        .orderBy($"o_orderkey")
    }),
    "flt_isin" -> ((s, dir) => {
      import s.implicits._
      Relational.filterIsIn(t(s, dir, "customer"), "c_mktsegment", Seq("BUILDING", "AUTOMOBILE"))
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),
    "flt_like" -> ((s, dir) => {
      import s.implicits._
      // prefix LIKE pushes to the scan as StringStartsWith
      t(s, dir, "part")
        .filter($"p_type".like("S%") && $"p_name".contains("a"))
        .select($"p_partkey", $"p_name", $"p_type")
        .orderBy($"p_partkey")
    }),
    "agg_listagg" -> ((s, dir) => {
      import s.implicits._
      // ordered string aggregation — deterministic because the WITHIN
      // GROUP order is total (duplicate values concatenate identically)
      t(s, dir, "part")
        .filter($"p_size" < 3)
        .groupBy($"p_brand")
        .agg(expr("listagg(p_type, '|') WITHIN GROUP (ORDER BY p_type)").as("types"))
        .orderBy($"p_brand")
    }),
    "col_rename" -> ((s, dir) => {
      import s.implicits._
      val counts = Aggregates.countByKey(t(s, dir, "lineitem"), Seq($"l_returnflag"), "cnt")
      Relational.renameAll(counts, Map("l_returnflag" -> "flag", "cnt" -> "nb_rows"))
        .orderBy($"flag")
    }),
    "col_fillna_sentinel" -> ((s, dir) => {
      import s.implicits._
      val withNulls = t(s, dir, "orders")
        .withColumn("prio", when($"o_orderpriority" === "5-LOW", lit(null)).otherwise($"o_orderpriority"))
      Aggregates.countByKey(
        Relational.fillNullSentinel(withNulls, "prio", "UNSPECIFIED"),
        Seq($"prio"), "n")
        .orderBy($"prio")
    }),
    "col_str_replace" -> ((s, dir) => {
      import s.implicits._
      val replaced = Relational.strReplaceLiteral(t(s, dir, "orders"), "o_orderpriority", "-", "_")
      Aggregates.countByKey(replaced, Seq($"o_orderpriority"), "n")
        .withColumnRenamed("o_orderpriority", "prio")
        .orderBy($"prio")
    }),
    "col_to_date" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select(to_date($"l_shipdate").as("ship_date")).distinct()
        .orderBy($"ship_date")
    }),
    "col_date_diff" -> ((s, dir) => {
      import s.implicits._
      val joined = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .withColumn("od", to_date($"o_orderdate"))
        .withColumn("sd", to_date($"l_shipdate"))
      Aggregates.countByKey(
        Relational.inclusiveDurationDays(joined, "duration_days", "od", "sd"),
        Seq($"duration_days"), "n")
        .orderBy($"duration_days")
    }),
    "col_fillna_zero" -> ((s, dir) => {
      import s.implicits._
      val withNulls = t(s, dir, "customer")
        .withColumn("bal", when($"c_acctbal" < 0, lit(null)).otherwise($"c_acctbal"))
      Relational.fillNullZero(withNulls, Seq("bal"))
        .groupBy($"c_nationkey")
        .agg(Aggregates.sumExact($"bal").as("bal_sum"))
        .orderBy($"c_nationkey")
    }),
    "col_scalar_udf" -> ((s, dir) => {
      import s.implicits._
      // Reference's colormap-normalize lambda (visualization.py:51):
      // clamp(x / domain_max) as a genuine Scala UDF to cover the
      // scalar-UDF surface; everywhere else we stay codegen-native.
      val normUdf = udf((x: Int) => math.min(1.0, math.max(0.0, x / 50.0)))
      t(s, dir, "part")
        .select($"p_size").distinct()
        .withColumn("norm", normUdf($"p_size"))
        .orderBy($"p_size")
    }),
    "col_date_sequence" -> ((s, dir) => {
      import s.implicits._
      val withRange = t(s, dir, "orders")
        .withColumn("d0", to_date($"o_orderdate"))
        .withColumn("d1", date_add($"d0", 3))
      Aggregates.countByKey(
        Temporal.explodeDays(withRange, "day", $"d0", $"d1"),
        Seq($"day"), "n")
        .orderBy($"day")
    }),
    "limit_head" -> ((s, dir) => {
      import s.implicits._
      Relational.topK(t(s, dir, "orders"), Seq($"o_totalprice".desc, $"o_orderkey".asc), 10)
        .select($"o_orderkey", $"o_totalprice")
    }),

    // ---- §2.3 joins ----
    "join_inner_eq" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_customers"), Aggregates.sumExact($"c_acctbal").as("bal_sum"))
        .orderBy($"n_name")
    }),
    "join_left_eq_diffkeys" -> ((s, dir) => {
      import s.implicits._
      val perNation = t(s, dir, "customer").groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
      val joined = t(s, dir, "nation")
        .join(perNation, $"n_nationkey" === $"c_nationkey", "left")
      Relational.fillNullZero(joined, Seq("n_cust"))
        .select($"n_nationkey", $"n_name", $"n_cust")
        .orderBy($"n_nationkey")
    }),
    "join_range_interval" -> ((s, dir) => {
      import s.implicits._
      val probes = s.range(1).select(explode(sequence(
        lit(Date.valueOf("1995-01-01")), lit(Date.valueOf("2001-12-01")),
        expr("interval 1 month"))).as("d"))
      val intervals = t(s, dir, "orders")
        .withColumn("start_date", to_date($"o_orderdate"))
        .withColumn("end_date", date_add($"start_date", 30))
      Aggregates.countByKey(
        Temporal.rangeJoinBroadcastProbes(probes, intervals, "d", "start_date", "end_date"),
        Seq($"d"), "n_open")
        .orderBy($"d")
    }),
    "join_range_bigbig" -> ((s, dir) => {
      import s.implicits._
      // The BIG-x-BIG range-join tier: every order opens a 3-day
      // window [o_orderdate, o_orderdate+2] (150k intervals at
      // sf0.1), probed by every lineitem ship date (600k probes) —
      // ~108M matched pairs at sf0.1, far past broadcast on both
      // sides. The consumer is a COUNT per priority, so since
      // optimization round 21 this computes through
      // Temporal.rangeCountByKey — the aggregate-pushdown factoring
      // Σ_day |probes(day)|×|intervalDays(prio, day)| (guide §2.3/§8):
      // identical integer result (PropertySpec pins it against the
      // materializing tier; the unchanged DuckDB oracle re-proves it
      // per run), but the 108M-pair expansion never exists in any
      // stage — previously it ran in-core through a partial-agg'd
      // day-keyed join (1.8 s at sf0.1 and the suite's most
      // contention-amplified key, r20 verdict). Consumers that need
      // the pair ROWS still use rangeJoinBucketed (join_range_interval
      // / ScaleSpec / PlanSpec keep that tier pinned).
      val intervals = t(s, dir, "orders")
        .withColumn("start_date", to_date($"o_orderdate"))
        .withColumn("end_date", date_add($"start_date", 2))
        .select($"o_orderpriority", $"start_date", $"end_date")
      val probes = t(s, dir, "lineitem")
        .select(to_date($"l_shipdate").as("ship_d"))
      Temporal.rangeCountByKey(probes, intervals, "ship_d",
        "start_date", "end_date", Seq($"o_orderpriority"), "n_pairs")
        .orderBy($"o_orderpriority")
    }),
    "join_range_salted" -> ((s, dir) => {
      import s.implicits._
      // The skew-robust range-join tier (2-day windows keep the
      // verified pair volume distinct from the unsalted key's). Since
      // optimization round 21 this COUNT consumer also routes through
      // Temporal.rangeCountByKey: the salt existed to spread a hot
      // day's pair expansion over reducers, and the pushdown removes
      // the expansion itself — a hot day is one |probes|×|intervals|
      // multiplication, skew-immune by construction, with the
      // identical integer result (PropertySpec pins equality against
      // rangeJoinBucketedSalted; the DuckDB oracle re-proves it per
      // run). Pair-ROW consumers with hot days still use the salted
      // materializing tier (ScaleSpec pins its biggest-partition
      // reduction on a planted hot day; PlanSpec pins its shape).
      val intervals = t(s, dir, "orders")
        .withColumn("start_date", to_date($"o_orderdate"))
        .withColumn("end_date", date_add($"start_date", 1))
        .select($"o_orderpriority", $"start_date", $"end_date")
      val probes = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", to_date($"l_shipdate").as("ship_d"))
      Temporal.rangeCountByKey(probes, intervals, "ship_d",
        "start_date", "end_date", Seq($"o_orderpriority"), "n_pairs")
        .orderBy($"o_orderpriority")
    }),
    "join_asof" -> ((s, dir) => {
      import s.implicits._
      // Event attribution: each purchase matched to the user's latest
      // prior (or same-instant) view. One shuffle on user_id.
      val ev = events(s, dir)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts")
      Temporal.asofJoin(purchases, views, Seq("user_id"), "ts", "ts",
        rightVals = Seq("ts"))
        .withColumnRenamed("asof_ts", "last_view_ts")
        .select($"event_id", $"user_id", $"ts", $"last_view_ts")
        .orderBy($"event_id")
    }),
    "join_semi" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter($"l_quantity" >= 48),
          $"o_orderkey" === $"l_orderkey", "leftsemi")
        .select($"o_orderkey")
        .orderBy($"o_orderkey")
    }),
    "join_anti" -> ((s, dir) => {
      import s.implicits._
      // vs URGENT orders only: every customer has *some* order at
      // sf0.01, which would make the plain anti join vacuously empty.
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT"),
          $"c_custkey" === $"o_custkey", "leftanti")
        .select($"c_custkey")
        .orderBy($"c_custkey")
    }),

    // ---- §2.4 aggregations ----
    "agg_count_by_key" -> ((s, dir) => {
      import s.implicits._
      Aggregates.countByKey(t(s, dir, "orders"), Seq($"o_orderpriority"), "n")
        .orderBy($"o_orderpriority")
    }),
    "agg_sum_by_key" -> ((s, dir) => {
      import s.implicits._
      Aggregates.sumByKey(t(s, dir, "lineitem"), Seq($"l_returnflag"), $"l_quantity", "sum_qty")
        .orderBy($"l_returnflag")
    }),
    "agg_avg_by_key" -> ((s, dir) => {
      import s.implicits._
      // decimal-exact sum / count, one IEEE division — deterministic
      // across engines (plain avg() accumulates doubles in partition
      // order, which is not).
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(Aggregates.avgExact($"l_quantity").as("avg_qty"))
        .orderBy($"l_returnflag")
    }),
    "agg_distinct_pairs" -> ((s, dir) => {
      import s.implicits._
      Aggregates.distinctPairs(t(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),
    "agg_global_minmax" -> ((s, dir) => {
      val dated = t(s, dir, "orders").withColumn("od", to_date(col("o_orderdate")))
      Aggregates.globalMinMax(dated, "od")
    }),
    "agg_distinct_sorted" -> ((s, dir) =>
      Aggregates.distinctSorted(t(s, dir, "part"), "p_brand")),
    "agg_argmax_per_group" -> ((s, dir) => {
      import s.implicits._
      Temporal.argmaxPerGroup(t(s, dir, "customer"),
        Seq($"c_nationkey"), Seq($"c_acctbal".desc, $"c_custkey".asc))
        .select($"c_nationkey", $"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_nationkey")
    }),
    "agg_countd_exact" -> ((s, dir) => {
      import s.implicits._
      Aggregates.countDistinctByKey(t(s, dir, "lineitem"),
        Seq($"l_returnflag"), $"l_partkey", "nd_parts")
        .orderBy($"l_returnflag")
    }),
    "agg_countd_approx" -> ((s, dir) => {
      import s.implicits._
      // HLL estimate judged against the in-engine exact count: the
      // estimate itself is engine-specific (no cross-engine oracle
      // exists for it), so the key emits the exact count plus the
      // BOUND CHECK as a boolean the oracle pins to literal true — a
      // drifting sketch turns the row red instead of escaping as a
      // rows-only pass. 3x the declared rsd (0.05) as the bound.
      // Production callers use approxCountDistinctByKey alone; the
      // exact branch here is the verification harness, not the op.
      val li = t(s, dir, "lineitem")
      val approx = Aggregates.approxCountDistinctByKey(li,
        Seq($"l_returnflag"), $"l_partkey", "nd_approx")
      val exact = Aggregates.countDistinctByKey(li,
        Seq($"l_returnflag"), $"l_partkey", "nd_exact")
      approx.join(exact, "l_returnflag")
        .select($"l_returnflag", $"nd_exact",
          (abs($"nd_approx" - $"nd_exact") <= lit(0.15) * $"nd_exact")
            .as("within_bound"))
        .orderBy($"l_returnflag")
    }),
    "meta_table_checksum" -> ((s, dir) => {
      import s.implicits._
      // replica/ingest verification: 16 order-free XOR signatures stand
      // in for the whole customer table — comparing two copies of a
      // 100 TB table becomes 16 rows, not a join
      Aggregates.tableChecksum(t(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"), buckets = 16)
        .orderBy($"bucket")
    }),
    "agg_histogram" -> ((s, dir) => {
      import s.implicits._
      // equi-width price histogram, fixed literal bounds → bucketing is
      // a pure per-value function, counts integer-exact
      Aggregates.histogram(t(s, dir, "lineitem"), $"l_extendedprice",
        lo = 0.0, hi = 60000.0, nBuckets = 12)
        .orderBy($"bucket")
    }),
    "agg_quantile_approx" -> ((s, dir) => {
      import s.implicits._
      // Greenwald–Khanna sketch quantiles — one pass, mergeable,
      // bounded memory (the 100 TB quantile). DuckDB's approx_quantile
      // is a different sketch, so the VALUE can't be oracled — but the
      // GK rank guarantee can: the sketch value's occupied rank
      // interval [cnt_lt+1, cnt_le] must intersect the target rank
      // ±(n/accuracy + 2). The key emits that check as a boolean the
      // oracle pins to literal true, alongside the exact group size.
      val li = t(s, dir, "lineitem")
      val qr = Aggregates.approxQuantilesByKey(li,
        Seq($"l_returnflag"), $"l_extendedprice", Seq(0.25, 0.5, 0.75))
      val ranked = qr
        .join(li.select($"l_returnflag", $"l_extendedprice"), "l_returnflag")
        .groupBy($"l_returnflag", $"q", $"qvalue")
        .agg(count(lit(1)).as("n_rows"),
          sum(when($"l_extendedprice" <= $"qvalue", 1L).otherwise(0L)).as("__le"),
          sum(when($"l_extendedprice" < $"qvalue", 1L).otherwise(0L)).as("__lt"))
      val tgt = ceil($"q" * $"n_rows").cast("long")
      val slack = ($"n_rows" / lit(10000)).cast("long") + lit(2L)
      ranked
        .select($"l_returnflag", $"q", $"n_rows",
          ($"__le" >= tgt - slack && $"__lt" + lit(1L) <= tgt + slack)
            .as("within_bound"))
        .orderBy($"l_returnflag", $"q")
    }),
    "agg_retention_cohort" -> ((s, dir) => {
      import s.implicits._
      // product-analytics cohort retention over the event log: users
      // bucketed by first active (Monday-truncated) week, distinct
      // actives counted per (cohort, week offset). Integer-exact week
      // arithmetic — fully oracle-checkable.
      Temporal.retentionCohorts(events(s, dir), $"user_id", $"ts")
        .orderBy($"cohort_week", $"week_offset")
    }),
    "agg_sketch_merge" -> ((s, dir) => {
      import s.implicits._
      // the re-aggregatable form of count-distinct: one DataSketches
      // HLL per nation (the persisted fine grain), merged up to region
      // WITHOUT rescanning customers. The sketch binary differs from
      // DuckDB's, so the key emits the exact per-region count plus the
      // merged estimate's bound check as a boolean the oracle pins to
      // literal true (lgK=12 → rsd ~1.6%; 0.1 is a 6-sigma bound).
      // ScaleSpec still pins the lossless-merge invariant.
      val nationDim = broadcast(
        t(s, dir, "nation").select($"n_nationkey", $"n_regionkey"))
      val perNation = Aggregates.sketchByKey(t(s, dir, "customer"),
        Seq($"c_nationkey"), $"c_custkey", "sk")
      val withRegion = perNation.join(nationDim, $"c_nationkey" === $"n_nationkey")
      val merged = Aggregates.mergeSketches(withRegion,
        Seq($"n_regionkey"), $"sk", "nd_approx")
      val exact = t(s, dir, "customer")
        .join(nationDim, $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_regionkey")
        .agg(countDistinct($"c_custkey").as("nd_exact"))
      merged.join(exact, "n_regionkey")
        .select($"n_regionkey", $"nd_exact",
          (abs($"nd_approx" - $"nd_exact") <= lit(0.1) * $"nd_exact")
            .as("within_bound"))
        .orderBy($"n_regionkey")
    }),
    "agg_cube" -> ((s, dir) => {
      import s.implicits._
      Aggregates.cubeSum(t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), $"l_quantity", "sum_qty")
        .orderBy($"l_returnflag", $"l_linestatus")
    }),
    "agg_median_disc" -> ((s, dir) => {
      import s.implicits._
      Aggregates.medianDiscByKey(t(s, dir, "lineitem"),
        Seq($"l_returnflag"), "l_quantity", "med_qty")
        .orderBy($"l_returnflag")
    }),
    "agg_pivot" -> ((s, dir) => {
      import s.implicits._
      Aggregates.pivotSum(t(s, dir, "lineitem"),
        $"l_returnflag", "l_linestatus", Seq("F", "O"), $"l_quantity")
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy($"l_returnflag")
    }),
    "agg_rollup" -> ((s, dir) => {
      import s.implicits._
      Aggregates.rollupSum(t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), $"l_quantity", "sum_qty")
        .orderBy($"l_returnflag", $"l_linestatus")
    }),
    "agg_mode_by_key" -> ((s, dir) => {
      import s.implicits._
      // deterministic mode: count per (key, value), then argmax with a
      // pinned (count desc, value asc) tiebreak — Spark's built-in
      // mode() is tie-arbitrary, so the engine composes the exact form
      val counts = t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_quantity").agg(count(lit(1)).as("c"))
      Temporal.argmaxPerGroup(counts, Seq($"l_returnflag"),
        Seq($"c".desc, $"l_quantity".asc))
        .select($"l_returnflag", $"l_quantity".as("mode_qty"))
        .orderBy($"l_returnflag")
    }),
    "agg_salted_sum" -> ((s, dir) => {
      import s.implicits._
      // Explicit two-stage salted aggregation (the known-extreme-skew
      // form): stage 1 on (key, salt) spreads a hot flag over 8
      // reducers, stage 2 merges partials. Partials stay DECIMAL so the
      // merge is exact — the oracle is the plain one-stage groupBy.
      Skew.saltedAggregate(t(s, dir, "lineitem"),
        keys = Seq($"l_returnflag"), fineGrain = Seq($"l_orderkey"),
        saltBuckets = 8,
        partials = Seq(sum($"l_quantity".cast("decimal(28,2)")).as("__s"),
          count(lit(1)).as("__n")),
        merges = Seq(sum($"__s").cast("double").as("sum_qty"),
          sum($"__n").as("n_rows")))
        .orderBy($"l_returnflag")
    }),
    "join_salted" -> ((s, dir) => {
      import s.implicits._
      // Salted fact x replicated-dim join: must equal the plain join
      // (the oracle) while splitting each hot nation key 8 ways.
      Skew.saltedJoin(t(s, dir, "customer"), t(s, dir, "nation"),
        $"c_nationkey", $"n_nationkey", Seq($"c_custkey"), saltBuckets = 8)
        .select($"c_custkey", $"n_name")
        .orderBy($"c_custkey")
    }),
    "join_bloom_prefilter" -> ((s, dir) => {
      import s.implicits._
      // Runtime bloom prefilter ahead of a shuffle join: the selective
      // part subset builds a broadcast Bloom filter that drops
      // non-matching lineitem rows AT THE SCAN, before the SMJ shuffle
      // (merge hint models the dim-too-big-to-broadcast regime). No
      // false negatives → must equal the plain join (the oracle).
      val dim = t(s, dir, "part").filter($"p_size" <= 2)
        .select($"p_partkey", $"p_size")
      graft.ops.RuntimeFilters.bloomPrefilterJoin(
        t(s, dir, "lineitem").select($"l_orderkey", $"l_linenumber", $"l_partkey"),
        dim.hint("merge"), "l_partkey", "p_partkey", expectedDimKeys = 10000)
        .select($"l_orderkey", $"l_linenumber", $"p_partkey", $"p_size")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),
    "agg_grouping_sets" -> ((s, dir) => {
      import s.implicits._
      // the two one-key marginals in one pass — the grouping-set shape
      // rollup/cube can't express
      Aggregates.groupingSetsSum(t(s, dir, "lineitem"),
        Seq(Seq("l_returnflag"), Seq("l_linestatus")),
        Seq("l_returnflag", "l_linestatus"), $"l_quantity", "sum_qty")
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // ---- §2.5 windows ----
    "win_first_last" -> ((s, dir) => {
      import s.implicits._
      // explicit frame specs: running first (default frame) and a
      // full-partition last via unbounded following
      val byPrio = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      val full = byPrio.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      t(s, dir, "orders")
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
        .withColumn("best_key", first($"o_orderkey").over(full))
        .withColumn("worst_key", last($"o_orderkey").over(full))
        .orderBy($"o_orderkey")
    }),
    "fn_null" -> ((s, dir) => {
      import s.implicits._
      // null-handling family over a derived nullable column
      val withNulls = t(s, dir, "customer")
        .withColumn("seg", when($"c_mktsegment" === "MACHINERY", lit(null)).otherwise($"c_mktsegment"))
      withNulls.select(
        $"c_custkey",
        coalesce($"seg", lit("NONE")).as("seg_or_none"),
        $"seg".isNull.as("is_missing"),
        nullif($"c_mktsegment", lit("MACHINERY")).as("nullified"),
        nvl2($"seg", lit(1), lit(0)).as("has_seg"))
        .orderBy($"c_custkey")
    }),
    "win_ntile" -> ((s, dir) => {
      import s.implicits._
      // quartile assignment over a total order — deterministic because
      // the order has a full tiebreak
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .withColumn("quartile", ntile(4).over(w))
        .orderBy($"o_orderkey")
    }),
    "win_rownum_topk" -> ((s, dir) => {
      import s.implicits._
      Temporal.topKPerGroup(t(s, dir, "orders"),
        Seq($"o_orderpriority"), Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
        .select($"o_orderpriority", $"rnk", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"rnk")
    }),
    "win_topk_udaf" -> ((s, dir) => {
      import s.implicits._
      // same answer as win_rownum_topk, via the typed bounded-buffer
      // aggregator: partial aggregation truncates to k per group
      // map-side, so the shuffle carries O(groups x k), not O(rows).
      val topk = graft.functions.TopKByValue.topK(3)
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(topk($"o_totalprice", $"o_orderkey").as("tk"))
        .select($"o_orderpriority", posexplode($"tk").as(Seq("pos", "pair")))
        .select($"o_orderpriority", ($"pos" + 1).cast("int").as("rnk"),
          $"pair._2".as("o_orderkey"), $"pair._1".as("o_totalprice"))
        .orderBy($"o_orderpriority", $"rnk")
    }),
    "win_running_sum" -> ((s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "orders")
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(count(lit(1)).as("n"))
      Temporal.runningSum(daily, "cum_n", $"n", Nil, Seq($"day".asc))
        .orderBy($"day")
    }),
    "win_lag_delta" -> ((s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "orders")
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(count(lit(1)).as("n"))
      Temporal.lagDelta(daily, "delta", $"n", Nil, Seq($"day".asc))
        .orderBy($"day")
    }),
    "win_rank_dense" -> ((s, dir) => {
      import s.implicits._
      Temporal.denseRankIn(t(s, dir, "part"), "rnk",
        Seq($"p_brand"), Seq($"p_retailprice".desc))
        .filter($"rnk" <= 3)
        .select($"p_brand", $"rnk", $"p_partkey", $"p_retailprice")
        .orderBy($"p_brand", $"rnk", $"p_partkey")
    }),

    "win_pct_rank" -> ((s, dir) => {
      import s.implicits._
      // rational-rank windows: percent_rank and cume_dist are exact
      // integer-ratio divisions, deterministic across engines when the
      // order is fully tie-broken
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
      t(s, dir, "orders").filter($"o_custkey" < 100)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .orderBy($"o_orderpriority", $"o_orderkey")
    }),
    "win_range_frame" -> ((s, dir) => {
      import s.implicits._
      // 7-day trailing quantity per supplier: event-time RANGE frame
      // over integer day numbers (not ROWS — same-day peers share the
      // frame, so intra-day order ambiguity cannot change the result)
      val li = t(s, dir, "lineitem")
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity",
          datediff(to_date($"l_shipdate"), lit("1992-01-01").cast("date")).as("d"))
      Temporal.trailingSumByDays(li, Seq($"l_suppkey"), $"d", $"l_quantity", 7, "qty_7d")
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"d", $"qty_7d")
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
    }),

    // ---- §2.6 sorts / limits ----
    "sort_desc" -> ((s, dir) => {
      import s.implicits._
      Relational.sortDesc(
        t(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
        "o_totalprice", Seq($"o_orderkey".asc))
    }),
    "sort_multi_mixed" -> ((s, dir) => {
      import s.implicits._
      Relational.sortMulti(
        t(s, dir, "lineitem").select($"l_returnflag", $"l_quantity", $"l_orderkey", $"l_linenumber"),
        Seq($"l_returnflag".asc, $"l_quantity".desc, $"l_orderkey".asc, $"l_linenumber".asc))
    }),
    "sort_collect_map" -> ((s, dir) => {
      import s.implicits._
      // Driver-side collect of a provably tiny sorted dimension (the
      // reference's legend map, visualization.py:50-52), then
      // re-parallelized so the harness can hash it.
      val m = t(s, dir, "region").select($"r_regionkey", $"r_name")
        .orderBy($"r_regionkey").collect()
        .map(r => (r.getInt(0), r.getString(1)))
      s.createDataFrame(m.toSeq).toDF("r_regionkey", "r_name")
        .orderBy($"r_regionkey")
    }),

    // ---- §2.7 set operations ----
    "set_union" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val a = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey", $"c_mktsegment".as("seg"))
      val b = c.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey", $"c_mktsegment".as("seg"))
      Relational.unionAll(a, b).orderBy($"seg", $"c_custkey")
    }),
    "set_intersect_all" -> ((s, dir) => {
      import s.implicits._
      val l = t(s, dir, "lineitem")
      Relational.intersectAll(
        l.filter($"l_returnflag" === "R").select($"l_suppkey"),
        l.filter($"l_returnflag" === "A").select($"l_suppkey"))
        .orderBy($"l_suppkey")
    }),
    "set_except_all" -> ((s, dir) => {
      import s.implicits._
      val l = t(s, dir, "lineitem")
      Relational.exceptAll(
        l.filter($"l_returnflag" === "R").select($"l_suppkey"),
        l.filter($"l_returnflag" === "A").select($"l_suppkey"))
        .orderBy($"l_suppkey")
    }),
    "set_union_distinct" -> ((s, dir) => {
      import s.implicits._
      val l = t(s, dir, "lineitem")
      Relational.unionDistinct(
        l.filter($"l_returnflag" === "R").select($"l_suppkey"),
        l.filter($"l_returnflag" === "A").select($"l_suppkey"))
        .orderBy($"l_suppkey")
    }),
    "set_intersect" -> ((s, dir) => {
      import s.implicits._
      val l = t(s, dir, "lineitem")
      Relational.intersectDistinct(
        l.filter($"l_returnflag" === "R").select($"l_suppkey"),
        l.filter($"l_returnflag" === "A").select($"l_suppkey"))
        .orderBy($"l_suppkey")
    }),
    "set_except" -> ((s, dir) => {
      import s.implicits._
      // orderkeys, not suppkeys: every supplier ships all flags at
      // sf0.01, which would make the suppkey except vacuously empty.
      val l = t(s, dir, "lineitem")
      Relational.exceptDistinct(
        l.filter($"l_returnflag" === "R").select($"l_orderkey"),
        l.filter($"l_returnflag" === "A").select($"l_orderkey"))
        .orderBy($"l_orderkey")
    }),

    // ---- §2.8 scalar function families ----
    "fn_str" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(
        $"doc_id",
        length($"text").as("n_chars_m"),
        upper(substring($"text", 1, 3)).as("up3"),
        regexp_extract($"text", "^(\\w+)", 1).as("first_word"),
        size(split($"text", "\\s+")).as("n_words"))
        .orderBy($"doc_id")
    }),
    "fn_date" -> ((s, dir) => {
      import s.implicits._
      val d = to_date($"l_shipdate")
      t(s, dir, "lineitem")
        .groupBy(year(d).as("y"), month(d).as("m"), dayofweek(d).as("dow"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"y", $"m", $"dow")
    }),
    "fn_date_format" -> ((s, dir) => {
      import s.implicits._
      // The reference's presentation-layer date formatting
      // (visualization.py:107,:133 — strftime("%d/%m/%Y") on every plot
      // title): date_format over the distinct shipdates.
      t(s, dir, "lineitem")
        .select(to_date($"l_shipdate").as("d")).distinct()
        .select($"d", date_format($"d", "dd/MM/yyyy").as("d_fmt"))
        .orderBy($"d")
    }),
    "fn_bitwise" -> ((s, dir) => {
      import s.implicits._
      // bit ops are exact integer arithmetic — deterministic across
      // engines with explicit result widths
      t(s, dir, "lineitem").select(
        $"l_orderkey", $"l_linenumber",
        $"l_orderkey".bitwiseAND(lit(255L)).as("b_and"),
        $"l_orderkey".bitwiseOR(lit(16L)).as("b_or"),
        $"l_orderkey".bitwiseXOR($"l_linenumber".cast("long")).as("b_xor"),
        shiftleft($"l_linenumber", 3).as("b_shl"),
        shiftright($"l_orderkey", 2).as("b_shr"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),
    "agg_bool_by_key" -> ((s, dir) => {
      import s.implicits._
      // universal/existential aggregates (bool_and / bool_or)
      t(s, dir, "lineitem").groupBy($"l_returnflag").agg(
        expr("bool_and(l_quantity > 0)").as("all_pos"),
        expr("bool_or(l_discount > 0.09)").as("any_deep_discount"),
        expr("bool_and(l_shipdate IS NOT NULL)").as("all_shipped"))
        .orderBy($"l_returnflag")
    }),
    "fn_math" -> ((s, dir) => {
      import s.implicits._
      // Restricted to IEEE-deterministic scalar math (abs/sqrt/floor/
      // ceil are correctly rounded; log/pow are libm-divergent).
      t(s, dir, "lineitem").select(
        $"l_orderkey", $"l_linenumber",
        abs($"l_discount" - lit(0.05)).as("d_abs"),
        sqrt($"l_quantity").as("q_sqrt"),
        floor($"l_extendedprice").as("p_floor"),
        ceil($"l_extendedprice").as("p_ceil"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),
    "fn_array" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings").select(
        $"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).as("e0"),
        array_max($"embedding").as("emax"),
        array_min($"embedding").as("emin"))
        .orderBy($"vec_id")
    }),
    "fn_map_json" -> ((s, dir) => {
      import s.implicits._
      events(s, dir).select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        get_json_object($"props", "$.k").cast("int").as("k_int"))
        .orderBy($"event_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "proj_essential" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY 1, 2",
    "flt_eq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderpriority = '1-URGENT' ORDER BY 1""".stripMargin,
    "flt_point_in_interval" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_date,
        | CAST(o_orderdate AS DATE) + 30 AS end_date
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) <= DATE '1996-06-15'
        |  AND DATE '1996-06-15' <= CAST(o_orderdate AS DATE) + 30
        |ORDER BY 1""".stripMargin,
    "flt_isin" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') ORDER BY 1""".stripMargin,
    "flt_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type LIKE 'S%' AND p_name LIKE '%a%'
        |ORDER BY 1""".stripMargin,
    "agg_listagg" ->
      """SELECT p_brand, string_agg(p_type, '|' ORDER BY p_type) AS types
        |FROM part WHERE p_size < 3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "col_rename" ->
      "SELECT l_returnflag AS flag, count(*) AS nb_rows FROM lineitem GROUP BY 1 ORDER BY 1",
    "col_fillna_sentinel" ->
      """SELECT coalesce(nullif(o_orderpriority, '5-LOW'), 'UNSPECIFIED') AS prio,
        | count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "col_str_replace" ->
      "SELECT replace(o_orderpriority, '-', '_') AS prio, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    "col_to_date" ->
      "SELECT DISTINCT CAST(l_shipdate AS DATE) AS ship_date FROM lineitem ORDER BY 1",
    "col_date_diff" ->
      """SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) + 1 AS INT) AS duration_days,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "col_fillna_zero" ->
      """SELECT c_nationkey,
        | CAST(SUM(CAST(CASE WHEN c_acctbal < 0 THEN 0 ELSE c_acctbal END AS DECIMAL(28,2))) AS DOUBLE) AS bal_sum
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "col_scalar_udf" ->
      """SELECT DISTINCT p_size,
        | CAST(LEAST(1.0, GREATEST(0.0, p_size / 50.0)) AS DOUBLE) AS norm
        |FROM part ORDER BY p_size""".stripMargin,
    "col_date_sequence" ->
      """SELECT CAST(u AS DATE) AS day, count(*) AS n FROM (
        | SELECT unnest(generate_series(CAST(o_orderdate AS DATE),
        |   CAST(o_orderdate AS DATE) + 3, INTERVAL 1 DAY)) AS u
        | FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "limit_head" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "join_inner_eq" ->
      """SELECT n_name, count(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS bal_sum
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_left_eq_diffkeys" ->
      """SELECT n_nationkey, n_name, coalesce(n_cust, 0) AS n_cust
        |FROM nation LEFT JOIN (
        | SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1
        |) AS pc ON n_nationkey = c_nationkey
        |ORDER BY n_nationkey""".stripMargin,
    "join_range_interval" ->
      """WITH probes AS (
        | SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2001-12-01',
        |   INTERVAL 1 MONTH)) AS DATE) AS d)
        |SELECT d, count(*) AS n_open
        |FROM probes, orders
        |WHERE CAST(o_orderdate AS DATE) <= d AND d <= CAST(o_orderdate AS DATE) + 30
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the big-x-big tier's oracle is the brute-force range predicate —
    // the bucketed day-explode must be exactly equivalent
    "join_range_bigbig" ->
      """SELECT o_orderpriority, count(*) AS n_pairs
        |FROM orders, lineitem
        |WHERE CAST(o_orderdate AS DATE) <= CAST(l_shipdate AS DATE)
        |  AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the salted tier must be EXACTLY the brute-force range predicate
    // too — salt is plumbing, never semantics
    "join_range_salted" ->
      """SELECT o_orderpriority, count(*) AS n_pairs
        |FROM orders, lineitem
        |WHERE CAST(o_orderdate AS DATE) <= CAST(l_shipdate AS DATE)
        |  AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
        | CAST(v.ts AS TIMESTAMP) AS last_view_ts
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "join_semi" ->
      """SELECT o_orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |ORDER BY 1""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY 1""".stripMargin,
    "agg_count_by_key" ->
      "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    "agg_sum_by_key" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_avg_by_key" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_distinct_pairs" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2",
    "agg_global_minmax" ->
      """SELECT min(CAST(o_orderdate AS DATE)) AS min_od,
        | max(CAST(o_orderdate AS DATE)) AS max_od
        |FROM orders""".stripMargin,
    "agg_distinct_sorted" ->
      "SELECT DISTINCT p_brand FROM part ORDER BY 1",
    "agg_argmax_per_group" ->
      """SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM (
        | SELECT *, row_number() OVER (
        |   PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        | FROM customer)
        |WHERE rn = 1 ORDER BY c_nationkey""".stripMargin,
    "agg_countd_exact" ->
      "SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts FROM lineitem GROUP BY 1 ORDER BY 1",
    // error-bound oracles for the sketch keys: the exact side is plain
    // SQL and within_bound is pinned to literal true — the engine
    // computes the real |estimate - exact| <= bound check, so a
    // drifting sketch turns the row red
    "agg_countd_approx" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_exact,
        | TRUE AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_quantile_approx" ->
      """SELECT l_returnflag, CAST(q AS DOUBLE) AS q, count(*) AS n_rows,
        | TRUE AS within_bound
        |FROM lineitem CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75]) AS q) qs
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_sketch_merge" ->
      """SELECT n_regionkey, count(DISTINCT c_custkey) AS nd_exact,
        | TRUE AS within_bound
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_cube" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS l_returnflag,
        | CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "agg_median_disc" ->
      """SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS med_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_pivot" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(28,2)) END) AS DOUBLE) AS qty_f,
        | CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(28,2)) END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "win_first_last" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | first_value(o_orderkey) OVER w AS best_key,
        | last_value(o_orderkey) OVER w AS worst_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "fn_null" ->
      """SELECT c_custkey,
        | coalesce(nullif(c_mktsegment, 'MACHINERY'), 'NONE') AS seg_or_none,
        | nullif(c_mktsegment, 'MACHINERY') IS NULL AS is_missing,
        | nullif(c_mktsegment, 'MACHINERY') AS nullified,
        | CAST(CASE WHEN nullif(c_mktsegment, 'MACHINERY') IS NOT NULL THEN 1 ELSE 0 END AS INT) AS has_seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "win_ntile" ->
      """SELECT o_orderkey, o_totalprice,
        | CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "agg_rollup" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS l_returnflag,
        | CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "win_pct_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | percent_rank() OVER (PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice, o_orderkey) AS pct_rank,
        | cume_dist() OVER (PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice, o_orderkey) AS cume
        |FROM orders WHERE o_custkey < 100 ORDER BY 1, 2""".stripMargin,
    "agg_mode_by_key" ->
      """SELECT l_returnflag, qty AS mode_qty FROM (
        | SELECT l_returnflag, qty,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY c DESC, qty) AS rn
        | FROM (SELECT l_returnflag, l_quantity AS qty, count(*) AS c
        |       FROM lineitem GROUP BY 1, 2) AS counts) AS ranked
        |WHERE rn = 1 ORDER BY 1""".stripMargin,
    "agg_salted_sum" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_salted" ->
      """SELECT c_custkey, n_name FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY 1""".stripMargin,
    // identical md5-derived 60-bit row signatures and XOR fold — XOR
    // is order-free, so no float or ordering hazards anywhere. Each
    // cells are length-prefixed ("len:value", null -> 'n') so a
    // delimiter character inside a value can never shift across a
    // column boundary unnoticed, and DuckDB's concat_ws (which SKIPS
    // null arguments where Spark renders the coalesce fallback)
    // behaves identically because no argument is ever null.
    "meta_table_checksum" ->
      """WITH h AS (
        | SELECT CAST(('0x' || substr(md5(
        |    concat_ws('|',
        |      coalesce(CAST(length(CAST(c_custkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR), 'n'),
        |      coalesce(CAST(length(c_name) AS VARCHAR) || ':' || c_name, 'n'),
        |      coalesce(CAST(length(CAST(c_nationkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(c_nationkey AS VARCHAR), 'n'),
        |      coalesce(CAST(length(c_mktsegment) AS VARCHAR) || ':' || c_mktsegment, 'n'))), 1, 15)) AS BIGINT) AS h
        | FROM customer)
        |SELECT CAST(h % 16 AS INT) AS bucket, bit_xor(h) AS xor_sig,
        | count(*) AS n_rows
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    // same literal bounds/width, same floor-of-division both engines
    "agg_histogram" ->
      """SELECT CAST(CASE WHEN l_extendedprice < 0.0 THEN -1
        |            WHEN l_extendedprice >= 60000.0 THEN 12
        |            ELSE least(floor((l_extendedprice - 0.0) / 5000.0), 11) END AS INT) AS bucket,
        | count(*) AS n,
        | 0.0 + CAST(CASE WHEN l_extendedprice < 0.0 THEN -1
        |            WHEN l_extendedprice >= 60000.0 THEN 12
        |            ELSE least(floor((l_extendedprice - 0.0) / 5000.0), 11) END AS INT) * 5000.0 AS edge_lo
        |FROM lineitem WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1, 3 ORDER BY 1""".stripMargin,
    // Monday-truncated weeks both sides; day difference is an exact
    // multiple of 7, so the offset division is integer-exact
    "agg_retention_cohort" ->
      """WITH act AS (
        | SELECT DISTINCT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS w
        | FROM events),
        |coh AS (SELECT u, min(w) AS c FROM act GROUP BY 1)
        |SELECT c AS cohort_week,
        | CAST(datediff('day', c, a.w) / 7 AS INT) AS week_offset,
        | count(DISTINCT a.u) AS n_users
        |FROM act a JOIN coh ON a.u = coh.u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the bloom prefilter has no false negatives, so the key must equal
    // the PLAIN inner join at any fpp
    "join_bloom_prefilter" ->
      """SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_size
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size <= 2
        |ORDER BY 1, 2""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS l_returnflag,
        | CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY 1, 2""".stripMargin,
    "win_rownum_topk" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(row_number() OVER (
        |   PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        | FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,
    "win_topk_udaf" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(row_number() OVER (
        |   PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        | FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,
    "win_running_sum" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders GROUP BY 1)
        |SELECT day, n, CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
        |FROM daily ORDER BY day""".stripMargin,
    "win_lag_delta" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders GROUP BY 1)
        |SELECT day, n, n - lag(n, 1) OVER (ORDER BY day) AS delta
        |FROM daily ORDER BY day""".stripMargin,
    "win_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS INT) AS d,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) OVER (
        |   PARTITION BY l_suppkey
        |   ORDER BY datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
        |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_7d
        |FROM lineitem ORDER BY 1, 2, 3""".stripMargin,
    "win_rank_dense" ->
      """SELECT p_brand, rnk, p_partkey, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_retailprice, CAST(dense_rank() OVER (
        |   PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INT) AS rnk
        | FROM part)
        |WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey""".stripMargin,
    "sort_desc" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey",
    "sort_multi_mixed" ->
      """SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey, l_linenumber""".stripMargin,
    "sort_collect_map" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY 1",
    "set_union" ->
      """SELECT c_custkey, c_mktsegment AS seg FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey, c_mktsegment AS seg FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |ORDER BY seg, c_custkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        |INTERSECT ALL
        |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY 1""".stripMargin,
    "set_except_all" ->
      """SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT ALL
        |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY 1""".stripMargin,
    "set_union_distinct" ->
      """SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        |UNION
        |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY 1""".stripMargin,
    "set_intersect" ->
      """SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        |INTERSECT
        |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY 1""".stripMargin,
    "set_except" ->
      """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT
        |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY 1""".stripMargin,
    "fn_str" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars_m, upper(substr(text, 1, 3)) AS up3,
        | regexp_extract(text, '^(\w+)', 1) AS first_word,
        | CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_date" ->
      """SELECT CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS y, CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS m,
        | CAST(dayofweek(CAST(l_shipdate AS DATE)) + 1 AS INT) AS dow, count(*) AS n
        |FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "fn_date_format" ->
      """SELECT d, strftime(d, '%d/%m/%Y') AS d_fmt
        |FROM (SELECT DISTINCT CAST(l_shipdate AS DATE) AS d FROM lineitem)
        |ORDER BY 1""".stripMargin,
    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        | l_orderkey & 255 AS b_and,
        | l_orderkey | 16 AS b_or,
        | xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS b_xor,
        | CAST(l_linenumber << 3 AS INT) AS b_shl,
        | l_orderkey >> 2 AS b_shr
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "agg_bool_by_key" ->
      """SELECT l_returnflag,
        | bool_and(l_quantity > 0) AS all_pos,
        | bool_or(l_discount > 0.09) AS any_deep_discount,
        | bool_and(l_shipdate IS NOT NULL) AS all_shipped
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_discount - 0.05) AS d_abs,
        | sqrt(l_quantity) AS q_sqrt,
        | CAST(floor(l_extendedprice) AS BIGINT) AS p_floor,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS p_ceil
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "fn_array" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim, embedding[1] AS e0,
        | list_max(embedding) AS emax, list_min(embedding) AS emin
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "fn_map_json" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
