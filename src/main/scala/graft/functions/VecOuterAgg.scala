package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass second-moment aggregate over `dim`-float vectors — the
  * constant-state plan behind x147's covariance/correlation audit. State
  * is a single Long array laid out `[n, S_1..S_dim, P_1..P_pairs]` where
  * `S_i = Σ m_i`, `P_k = Σ m_i·m_j` over the upper triangle (i ≤ j,
  * 1-based, k = (i−1)·(dim+1) − (i−1)·i/2 + (j − i + 1)), and `m` is the
  * component integerized at MILLI scale (floor(x·1000 + 0.5)) — exactly
  * the arithmetic the DuckDB twin runs, so the sums are order-free exact
  * integers on both engines.
  *
  * Scale contract: state is dim + dim·(dim+1)/2 + 1 longs (2,145 at
  * dim=64) per map task, merged by elementwise add — the classic
  * mergeable-moments sketch, so 1000 executors (or daily shards) combine
  * exactly. Milli (not ppm) integerization keeps every cell inside
  * int64: |m| ≤ ~2·10³ for unit-scale embeddings ⇒ |m_i·m_j| ≤ 4·10⁶,
  * safe past 10¹² rows per merge tree; beyond that, shard the aggregate
  * and combine the (already mergeable) states with widened arithmetic.
  */
final class VecOuterAgg(dim: Int)
    extends Aggregator[Array[Float], Array[Long], Array[Long]] {
  require(dim > 0, s"vec outer agg needs dim > 0, got $dim")

  private val pairs = dim * (dim + 1) / 2
  private val size  = 1 + dim + pairs

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(buf: Array[Long], v: Array[Float]): Array[Long] = {
    require(v.length == dim, s"expected $dim components, got ${v.length}")
    val m = new Array[Long](dim)
    var i = 0
    while (i < dim) { m(i) = math.floor(v(i).toDouble * 1000 + 0.5).toLong; i += 1 }
    buf(0) += 1
    i = 0
    var k = 1 + dim
    while (i < dim) {
      buf(1 + i) += m(i)
      var j = i
      while (j < dim) { buf(k) += m(i) * m(j); k += 1; j += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
