package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-4 winnowing fingerprint of a text column: md5 over every rolling
  * 8-CHARACTER shingle, the 4 lexicographically-smallest distinct digests
  * joined with '|' — the x11 document fingerprint as one pass.
  *
  * Exact contract (bit-identical to the HOF/DuckDB formulation):
  * shingle i (1-based, i = 1..max(len−7, 1)) is `substr(text, i, 8)` with
  * Spark substr semantics — CHARACTER (codepoint) indexed, truncated at the
  * end, the whole string when shorter than 8; digests are deduplicated and
  * ordered as hex strings, which equals unsigned bytewise order of the raw
  * 16-byte digests, so the selection never allocates hex until the final 4.
  *
  * Why a custom Expression: the HOF pipeline materializes a 32-hex-char
  * string per shingle (~one per character of input) plus the full array,
  * then array_distinct (O(n²) comparisons) and a sort — all interpreted.
  * This is one loop with a 4-element bounded selection, whole-stage
  * codegen'd via a static call.
  */
case class DocFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint expects string, got ${child.dataType}")

  override def dataType: DataType = DataTypes.StringType
  override def prettyName: String = "doc_fingerprint"

  override def nullSafeEval(input: Any): Any =
    DocFingerprintImpl.bottom4(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DocFingerprintImpl.bottom4($c)")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}

object DocFingerprintImpl {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val unsignedLex = new java.util.Comparator[Array[Byte]] {
    override def compare(a: Array[Byte], b: Array[Byte]): Int =
      java.util.Arrays.compareUnsigned(a, b)
  }

  def bottom4(s: UTF8String): UTF8String = {
    val n   = s.numChars()
    val end = math.max(n - 7, 1) // window count; short/empty text = 1 window
    val d   = md5.get()
    // bounded selection: TreeSet in unsigned digest order doubles as the
    // dedup (hex order == unsigned byte order of the raw digest)
    val keep = new java.util.TreeSet[Array[Byte]](unsignedLex)
    var i = 0
    while (i < end) {
      val dig = d.digest(s.substring(i, i + 8).getBytes)
      if (keep.add(dig) && keep.size() > 4) keep.pollLast()
      i += 1
    }
    val sb = new java.lang.StringBuilder(keep.size() * 33)
    val it = keep.iterator()
    while (it.hasNext) {
      val dig = it.next()
      if (sb.length() > 0) sb.append('|')
      var k = 0
      while (k < 16) {
        sb.append(Character.forDigit((dig(k) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(dig(k) & 0xf, 16))
        k += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

object DocFingerprintFunctions {
  import org.apache.spark.sql.functions._

  /** Codegen'd bottom-4 fingerprint; HOF fallback keeps identical
    * semantics if the Column↔Expression bridge is unavailable.
    */
  def docFingerprint(text: Column): Column =
    GraftFunctions.liftUnary(text, DocFingerprint.apply).getOrElse {
      // NULL-in -> NULL-out, matching the expression's nullSafeEval
      // (concat_ws would otherwise render a null digest list as "")
      when(text.isNull, lit(null).cast("string")).otherwise(
        concat_ws("|", slice(
          array_sort(array_distinct(
            transform(sequence(lit(1), greatest(length(text) - 7, lit(1))),
              i => md5(text.substr(i, lit(8)))))),
          1, 4)))
    }
}
