package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.B "UDAF surface"): exact per-group top-k
  * values with a BOUNDED buffer — the aggregate alternative to the
  * `row_number() <= k` window, which must shuffle and sort every row of
  * every group. As an Aggregator it gets partial aggregation for free:
  * each map task reduces its rows to a k-element buffer, the exchange
  * moves only k values per (group, partition), and merge is a k-way
  * array merge — the same contract as Spark's own `collect_top_k` but
  * with a user-definable k and deterministic descending order.
  *
  * The buffer is a sorted (descending) Array[Double] of at most k
  * elements; reduce inserts only when the candidate beats the current
  * floor, so per-row cost is O(log k) search + memmove on the small hot
  * array.
  */
final class TopKAgg(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], v: Double): Array[Double] =
    if (buf.length < k) insert(buf, v)
    else if (v > buf(k - 1)) insert(buf.take(k - 1), v)
    else buf

  private def insert(buf: Array[Double], v: Double): Array[Double] = {
    // binary search for the insertion point in the descending array
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) >= v) lo = mid + 1 else hi = mid
    }
    val out = new Array[Double](buf.length + 1)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, buf.length - lo)
    out
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && a(i) >= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
