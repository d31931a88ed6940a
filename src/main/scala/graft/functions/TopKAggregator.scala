package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed top-k-per-group aggregate (SURVEY.md §2.10 UDAF surface).
  *
  * The window formulation of top-k (`row_number` over partitionBy)
  * shuffles EVERY row to its group's reducer and sorts there. This
  * aggregator keeps a bounded k-row buffer per group and merges
  * buffers, so Spark's partial aggregation truncates each map-side
  * partition to k rows per group BEFORE the shuffle — at 100 TB the
  * shuffle carries O(groups x k), not O(rows). Same answer, pinned
  * deterministic tiebreak (value desc, id asc).
  *
  * IN = (value, id); OUT = top-k (value, id) pairs, sorted.
  */
case class TopKByValue(k: Int)
  extends Aggregator[(Double, Long), ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    // java.lang.Double.compare, not primitive comparisons (round-15
    // review): NaN is 'equal' to everything under <, so the primitive
    // form was an intransitive comparator — TimSort can throw on
    // buffers past 32 elements and NaN placement was arbitrary. The
    // caller drops NaN scores; this keeps the aggregator itself a
    // total order for any direct user (Double.compare ranks NaN
    // greatest, so under this desc order NaN ranks first —
    // deterministically, which is the point).
    val c = java.lang.Double.compare(b._1, a._1) // desc by value
    c < 0 || (c == 0 && a._2 < b._2)
  }

  private def truncate(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    val sorted = buf.sortWith(lt)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def zero: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[(Double, Long)], in: (Double, Long)): ArrayBuffer[(Double, Long)] = {
    buf += in
    // amortize: only sort-truncate when the buffer overgrows
    if (buf.length > 4 * k) truncate(buf) else buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    truncate(a ++= b)

  override def finish(buf: ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
    truncate(buf).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKByValue {
  /** Column form: `topK(3)($"o_totalprice", $"o_orderkey")` — returns
    * array<struct<value, id>> sorted desc with id-asc tiebreak. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(TopKByValue(k))
    (value, id) => fn(value, id)
  }
}
