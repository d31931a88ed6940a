package graft

/** Process-wide scale-variable registry: operators whose cost is
  * dominated by a DATA-DEPENDENT intermediate (candidate-pair volume
  * in the similarity self-joins, band-collision counts) record it
  * here, and `Bench` folds the last-recorded values into
  * bench_full.json. The r8 lesson: a candidate blowup that is
  * invisible in the output (the rescore filters it away) is very
  * visible in wall clock — logging the volume makes the regression
  * diagnosable from the bench artifact alone.
  *
  * CALLER NAMESPACING (round 13): counters used to be last-writer-wins
  * across keys sharing a code path (`jaccard_probe_prefix_candidates_ms`
  * was written by both `dedup_jaccard_probe` and `stream_jaccard_probe`,
  * and the later suite position won), which made per-key adjudication
  * of a flagged key need a manual isolated rerun. The bench now opens a
  * scope per key ([[withScope]]), and every counter recorded inside it
  * lands as `<key>.<counter>` — both callers' phase numbers coexist in
  * bench_full.json. Records outside any scope (the untimed pre-builds,
  * Verify, specs) keep their raw names. */
object Metrics {
  private val counters = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Caller scope for namespacing — a DynamicVariable so the per-key
    * attribution survives any same-thread nesting and parallel test
    * suites cannot cross-pollute each other's scopes. */
  private val scope = new scala.util.DynamicVariable[Option[String]](None)

  /** Run `f` with every [[record]] inside it namespaced as
    * `caller.<name>`. */
  def withScope[T](caller: String)(f: => T): T =
    scope.withValue(Some(caller))(f)

  /** Record (overwrite) a named scale counter, qualified by the active
    * caller scope if one is open. */
  def record(name: String, value: Long): Unit =
    counters.put(scope.value.map(_ + "." + name).getOrElse(name), value)

  /** Snapshot of all recorded counters, sorted by name. */
  def snapshot: Seq[(String, Long)] = counters.toSeq.sortBy(_._1)

  /** Testing hook. */
  private[graft] def clear(): Unit = counters.clear()
}
