package graft

/** Process-wide scale-variable registry: operators whose cost is
  * dominated by a DATA-DEPENDENT intermediate (candidate-pair volume
  * in the similarity self-joins, band-collision counts) record it
  * here, and `Bench` folds the last-recorded values into
  * bench_full.json. The r8 lesson: a candidate blowup that is
  * invisible in the output (the rescore filters it away) is very
  * visible in wall clock — logging the volume makes the regression
  * diagnosable from the bench artifact alone. */
object Metrics {
  private val counters = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Record (overwrite) a named scale counter. */
  def record(name: String, value: Long): Unit = counters.put(name, value)

  /** Snapshot of all recorded counters, sorted by name. */
  def snapshot: Seq[(String, Long)] = counters.toSeq.sortBy(_._1)

  /** Testing hook. */
  private[graft] def clear(): Unit = counters.clear()
}
