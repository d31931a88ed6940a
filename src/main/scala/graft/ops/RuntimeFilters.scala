package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runtime join pre-filtering (100 TB posture, SURVEY §4.2).
  *
  * When a selective dimension cannot drive a broadcast-hash join (too
  * many rows to hold a hash relation per executor) the join shuffles
  * BOTH sides, and every fact row pays the shuffle even though most
  * find no match. A Bloom filter over the dim join keys is orders of
  * magnitude smaller than the dim itself (~1.2 MB per million keys at
  * 1% fpp), broadcasts cheaply, and filters the fact side AT THE SCAN —
  * the shuffle then moves only matching rows plus an fpp-sized trickle
  * of false positives. Spark's own `InjectRuntimeFilter` applies the
  * same idea automatically but only under narrow conditions (creation-
  * side size thresholds, shuffle-below-join checks, one filter per
  * query); the explicit operator makes the 100 TB posture deterministic
  * rather than threshold-dependent.
  *
  * Bloom filters have NO false negatives, so inner and left-semi joins
  * are bit-identical to the unfiltered join at any fpp; outer joins
  * would lose unmatched fact rows and are rejected up front.
  */
object RuntimeFilters {

  /** `fact ⋈ dim` on `factKey == dimKey` with a broadcast Bloom-filter
    * prefilter on the fact side.
    *
    * `expectedDimKeys` sizes the filter — at production scale it comes
    * from table statistics (an overestimate only widens the filter and
    * lowers fpp; it can never drop rows). Integral and string keys are
    * supported, matching `DataFrameStatFunctions.bloomFilter`. The two
    * key columns must be distinctly named (the join condition references
    * both sides by name). */
  def bloomPrefilterJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                         dimKey: String, expectedDimKeys: Long,
                         fpp: Double = 0.01,
                         joinType: String = "inner"): DataFrame = {
    require(Set("inner", "leftsemi", "left_semi", "semi")(joinType),
      s"a bloom prefilter preserves only inner/semi join semantics, not '$joinType'")
    require(expectedDimKeys > 0, "expectedDimKeys must be positive")
    // one pass over the dim side builds the filter (a tree-aggregated
    // sketch, driver holds only the final bitmap)
    val bf = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val keyType = fact.schema(factKey).dataType
    val keep = keyType match {
      case ByteType | ShortType | IntegerType | LongType =>
        // sketch.BloomFilter hashes integral types through their long
        // form, so the cast is exactly the put-side representation
        val f = udf { (k: java.lang.Long) => k != null && bc.value.mightContainLong(k) }
        f(col(factKey).cast("long"))
      case StringType =>
        val f = udf { (k: String) => k != null && bc.value.mightContainString(k) }
        f(col(factKey))
      case t => throw new IllegalArgumentException(
        s"unsupported bloom prefilter key type $t (integral or string)")
    }
    // null join keys never match an equi-join; the prefilter dropping
    // them early is semantics-preserving for inner/semi
    fact.filter(keep).join(dim, col(factKey) === col(dimKey), joinType)
  }
}
