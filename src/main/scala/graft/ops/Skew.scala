package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §4.2, 100 TB posture).
  *
  * AQE's skew-join splitting (on by default) handles most cases at
  * runtime; these operators are the explicit forms for when the skew is
  * known and extreme (a handful of keys holding a large fraction of a
  * 100 TB table), where pre-salting beats post-hoc splitting:
  *
  *  - [[saltedAggregate]]: two-stage aggregation — stage 1 aggregates
  *    on (key, salt) spreading a hot key over `saltBuckets` reducers,
  *    stage 2 merges the partials per key. Correct for any algebraic
  *    aggregate given its merge expression.
  *  - [[saltedJoin]]: fact side gets a random-but-deterministic salt,
  *    dim side is replicated `saltBuckets` times so every
  *    (key, salt) pair finds its match — turns one hot reducer into
  *    `saltBuckets` uniform ones.
  *
  * Salt is `pmod(hash(idCols), saltBuckets)` — deterministic (no
  * rand(), replay-safe) while spreading rows of one hot key whenever
  * idCols is finer-grained than the group key.
  */
object Skew {

  def salt(fineGrainCols: Seq[Column], saltBuckets: Int): Column = {
    // loud guard (round-15 review): saltBuckets = 0 made pmod return
    // NULL salts and every salted join silently EMPTY
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    pmod(hash(fineGrainCols: _*), lit(saltBuckets))
  }

  /** Two-stage salted sum/count-style aggregation.
    *
    * @param partials stage-1 aggregates over (keys ++ salt), e.g.
    *                 `Seq(sum($"v").as("s"), count(lit(1)).as("n"))`
    * @param merges   stage-2 merge of the partials per key, e.g.
    *                 `Seq(sum($"s").as("s"), sum($"n").as("n"))`
    */
  def saltedAggregate(df: DataFrame, keys: Seq[Column], fineGrain: Seq[Column],
                      saltBuckets: Int, partials: Seq[Column],
                      merges: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(fineGrain, saltBuckets))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)

  /** Salted equi-join: `fact` (big, skewed on joinKey) x `dim`
    * (small enough to replicate saltBuckets times, typically already
    * broadcast-sized but too hot-keyed to broadcast evenly). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: Column,
                 factFineGrain: Seq[Column], saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(factFineGrain, saltBuckets))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedDim,
        factKey === dimKey && saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
