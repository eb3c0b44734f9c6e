package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Per-subspace nearest-codebook-entry assignment over an `array<long>`
  * vector against a CONSTANT codebook (model parameters, the x94/x97
  * collected-literal policy): for subspace s (0-based), entry c, distance is
  * the exact int64 squared L2 `Σ_{j<subDim} (v[s·subDim+j] − cb(s)(c)(j))²`,
  * and the result element s is the 1-BASED position of the FIRST minimum
  * over ascending entry order — exactly `array_position(d, array_min(d))`
  * of the HOF formulation it replaces (entries are stored ascending by id,
  * so first-min == lowest-id tie-break, the oracle's row_number contract).
  *
  * Why (round 14, guide §4): the HOF composition builds the k-entry
  * distance array with one interpreted `aggregate` fold PER ENTRY PER
  * SUBSPACE per row — x97's encode pass ran ~9,300 boxed lambda evaluations
  * per row (51 s of its 54 s wall at the 100× gate, StageDiag-attributed).
  * Here the whole assignment is one flat primitive loop per row.
  * CodegenFallback (one virtual call per row) is deliberate: the per-row
  * loop dominates by orders of magnitude, and the constant codebook lives
  * in one boxed-once Java array instead of a literal expression tree.
  *
  * A vector shorter than the codebook expects reads as missing dimensions
  * treated via `ArrayData.numElements` bounds — callers always pass
  * fixed-width vectors (the ppm frame), so the guard is defensive only.
  * Null vector → null result; null elements treated as 0 (dense by
  * construction — the DotF32/DotI64 contract).
  */
case class SubspaceArgmin(
    child: Expression,
    codebook: Array[Array[Array[Long]]],
    subDim: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"subspace_argmin expects array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "subspace_argmin"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
    val out = new Array[Int](codebook.length)
    var s = 0
    while (s < codebook.length) {
      val entries = codebook(s)
      val base = s * subDim
      var best = 0L
      var bestC = 0
      var c = 0
      while (c < entries.length) {
        val e = entries(c)
        var d = 0L
        var j = 0
        while (j < subDim) {
          val idx = base + j
          val x = if (idx < nv && !v.isNullAt(idx)) v.getLong(idx) else 0L
          val diff = x - e(j)
          d += diff * diff
          j += 1
        }
        if (c == 0 || d < best) { best = d; bestC = c }
        c += 1
      }
      out(s) = bestC + 1 // 1-based, matching array_position
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SubspaceArgmin =
    copy(child = newChild)

  // Java arrays compare by REFERENCE under the case-class equals, so two
  // structurally identical instances built from separate plans would never
  // be semanticEquals — blocking expression canonicalization, codegen/CSE
  // dedup and CacheManager plan matching (recompute risk only; results
  // unaffected). Structural equality restores them while the hot loop
  // keeps its primitive Array access (ADVICE r14).
  override def equals(other: Any): Boolean = other match {
    case that: SubspaceArgmin =>
      child == that.child && subDim == that.subDim &&
        java.util.Arrays.deepEquals(
          codebook.asInstanceOf[Array[AnyRef]], that.codebook.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(subDim),
      Integer.valueOf(java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])))
}
