package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k over (key, id) PAIRS in lexicographic order — the
  * selection aggregate behind x101's exact-quota sampling. [[BottomKAgg]]
  * keeps the k smallest Longs but forgets which row carried them; quota
  * sampling must RETURN the selected rows, so this variant carries the
  * row id alongside the sort key and orders by (key asc, id asc) — the
  * same composite DuckDB's `ORDER BY h, doc_id` window uses, so ties on
  * the key (hash collisions) resolve identically cross-engine.
  *
  * State stays ≤ k pairs per (group, map task): partial aggregation
  * forwards a bounded sorted array and merge is a k-way ascending merge —
  * a per-group `row_number() ≤ k` window would instead sort the full
  * group (the whole source's rows at corpus scale).
  */
final class BottomKPairAgg(k: Int)
    extends Aggregator[(String, Long), Array[(String, Long)], Array[(String, Long)]] {
  require(k > 0, s"bottom-k needs k > 0, got $k")

  private def lt(a: (String, Long), b: (String, Long)): Boolean = {
    val c = a._1.compareTo(b._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Array[(String, Long)] = Array.empty

  override def reduce(buf: Array[(String, Long)], v: (String, Long)): Array[(String, Long)] =
    if (buf.length < k) insert(buf, v)
    else if (lt(v, buf(k - 1))) insert(buf.take(k - 1), v)
    else buf

  private def insert(buf: Array[(String, Long)], v: (String, Long)): Array[(String, Long)] = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (!lt(v, buf(mid))) lo = mid + 1 else hi = mid
    }
    val out = new Array[(String, Long)](buf.length + 1)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, buf.length - lo)
    out
  }

  override def merge(a: Array[(String, Long)], b: Array[(String, Long)]): Array[(String, Long)] = {
    val out = new Array[(String, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && !lt(b(j), a(i)))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(String, Long)]): Array[(String, Long)] = buf

  override def bufferEncoder: Encoder[Array[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(String, Long)]]()
  override def outputEncoder: Encoder[Array[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(String, Long)]]()
}
