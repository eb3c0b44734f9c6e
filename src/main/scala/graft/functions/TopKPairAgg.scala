package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k over (key, id) PAIRS in (key DESC, id ASC) order — the
  * selection aggregate behind x30's stratified top-k. [[BottomKPairAgg]]
  * keeps the lexicographically SMALLEST string-keyed pairs (x101's
  * md5-coin order); stratified curation instead wants the LARGEST scores
  * with the deterministic doc_id tiebreak — the exact composite the
  * oracle's `ORDER BY n_unique DESC, doc_id` window uses, so rank ties
  * resolve identically cross-engine.
  *
  * State stays ≤ k pairs per (group, map task): partial aggregation
  * forwards a bounded sorted array and merge is a k-way ordered merge.
  * The `row_number() ≤ k` window this replaces sorts EVERY row of every
  * stratum — parallelism capped at the stratum-key cardinality, and on a
  * real corpus one (source, lang) stratum is a double-digit percentage of
  * all documents flowing through one task (the r8 verdict's x30 finding).
  * Here map tasks forward ≤ k pairs per stratum and the exchange carries
  * only bounded winner arrays.
  */
final class TopKPairAgg(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  /** `a` ranks strictly before `b`: higher key first, then smaller id. */
  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(buf: Array[(Long, Long)], v: (Long, Long)): Array[(Long, Long)] =
    if (buf.length < k) insert(buf, v)
    else if (lt(v, buf(k - 1))) insert(buf.take(k - 1), v)
    else buf

  private def insert(buf: Array[(Long, Long)], v: (Long, Long)): Array[(Long, Long)] = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (!lt(v, buf(mid))) lo = mid + 1 else hi = mid
    }
    val out = new Array[(Long, Long)](buf.length + 1)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, buf.length - lo)
    out
  }

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && !lt(b(j), a(i)))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(Long, Long)]): Array[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
}
