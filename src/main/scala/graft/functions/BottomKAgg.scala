package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k for Long keys — the posting-list-head aggregate behind
  * x53 (VERDICT r3 #1). `slice(array_sort(collect_list(id)), 1, k)` holds
  * the FULL per-group list in one aggregation buffer; for an inverted index
  * that means a stopword token collects ~N doc_ids. This Aggregator keeps a
  * sorted ASCENDING Array[Long] of at most k elements, so partial
  * aggregation forwards ≤ k ids per (token, map task) and merge is a k-way
  * ascending array merge. Mirrors [[TopKAgg]] (descending Doubles) with the
  * order flipped and the element type matched to the int64 doc_id column —
  * numeric order is exactly DuckDB's `list_sort(list(doc_id))`, so the
  * oracle is unchanged.
  */
final class BottomKAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"bottom-k needs k > 0, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (buf.length < k) insert(buf, v)
    else if (v < buf(k - 1)) insert(buf.take(k - 1), v)
    else buf

  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    // binary search for the insertion point in the ascending array
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) <= v) lo = mid + 1 else hi = mid
    }
    val out = new Array[Long](buf.length + 1)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, buf.length - lo)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
