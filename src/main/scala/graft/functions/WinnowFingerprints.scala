package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** x152's whole row-local winnowing stage as ONE pass —
  * `winnow_fingerprints(text)`: hash every k=4-word gram (16-hex-char md5
  * prefix, the corpus digest discipline), slide a w=5 window over the
  * hash sequence, select each window's MINIMUM (rightmost on ties — the
  * Schleimer/Wilkerson/Aiken MOSS rule), and return the document's
  * DISTINCT selected fingerprints.
  *
  * Exact contract (value-identical to the HOF formulation and the DuckDB
  * twin): words are `split(text, " ")` (limit −1, empties kept); gram i =
  * `concat_ws(" ", w[i..i+3])`, hash = `substring(md5(gram), 1, 16)`;
  * window j (1 ≤ j ≤ len(hs)−4) selects position
  * `j + 5 − array_position(reverse(slice(hs, j, 5)), array_min(slice(hs,
  * j, 5)))` — the rightmost minimum; output = distinct selected hashes
  * (first-occurrence order; the consumer is explode → groupBy, so order
  * is immaterial). Documents with < k+w−1 = 8 words yield an empty array
  * (the query's size filter, subsumed); null text → null.
  *
  * Why a custom Expression (guide §4): the HOF pipeline allocates, PER
  * WINDOW, two 5-element array slices, a reversed copy, and runs
  * array_min + array_position with interpreted per-element comparisons
  * on 16-char strings — all CodegenFallback. Here the hash sequence is
  * computed once as 64-bit gram-digest prefixes (md5 fed directly from
  * slices of the text's UTF-8 buffer — no gram string, no 32-hex
  * intermediate), the w-bounded rightmost-argmin runs on primitive longs
  * with `Long.compareUnsigned` (unsigned order of the first 8 digest
  * bytes == lexicographic order of the 16-hex-char strings), and only
  * the final distinct winners materialize hex strings.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprintsImpl.winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprintsImpl.winnow($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprintsImpl {

  private val K = 4 // words per gram
  private val W = 5 // grams per winnow window

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Space = Array[Byte](' ')
  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex16(v: Long): UTF8String = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      out(i) = HexDigits(((v >>> (60 - 4 * i)) & 0xf).toInt).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def winnow(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val starts = new Array[Int](len + 2)
    val ends = new Array[Int](len + 2)
    var words = 0
    var ws = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') {
        starts(words) = ws; ends(words) = i; words += 1; ws = i + 1
      }
      i += 1
    }
    starts(words) = ws; ends(words) = len; words += 1
    // below the guarantee threshold (k+w-1 words) no full window exists —
    // the query's size filter, subsumed
    if (words < K + W - 1) return new GenericArrayData(Array.empty[Any])
    val grams = words - K + 1
    val d = md5.get()
    val h = new Array[Long](grams)
    var g = 0
    while (g < grams) {
      var j = 0
      while (j < K) {
        if (j > 0) d.update(Space)
        d.update(bytes, starts(g + j), ends(g + j) - starts(g + j))
        j += 1
      }
      val dig = d.digest()
      h(g) =
        ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
        ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
        ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
        ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
      g += 1
    }
    // rightmost window-min per window start; winners deduped in
    // first-occurrence order
    val sel = new java.util.LinkedHashSet[java.lang.Long]()
    var j0 = 0
    while (j0 <= grams - W) {
      var best = j0
      var p = j0 + 1
      while (p < j0 + W) {
        if (java.lang.Long.compareUnsigned(h(p), h(best)) <= 0) best = p
        p += 1
      }
      sel.add(h(best))
      j0 += 1
    }
    val out = new Array[Any](sel.size())
    val it = sel.iterator()
    var k = 0
    while (it.hasNext) { out(k) = hex16(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

object WinnowFingerprintsFunctions {
  import org.apache.spark.sql.functions._

  /** Codegen'd one-pass winnowing fingerprints; the HOF fallback keeps the
    * identical slice/array_min/rightmost-tie contract (used only when the
    * classic-session bridge is gone).
    */
  def winnowFingerprints(text: Column): Column =
    GraftFunctions.liftUnary(text, WinnowFingerprints.apply).getOrElse {
      val w = split(text, " ")
      val hs = transform(sequence(lit(1), size(w) - 3),
        i => substring(md5(array_join(slice(w, i, lit(4)), " ")), 1, 16))
      when(text.isNull, lit(null).cast("array<string>"))
        .when(size(w) >= 8,
          array_distinct(transform(
            array_distinct(transform(sequence(lit(1), size(hs) - 4),
              j => j + lit(5) - array_position(reverse(slice(hs, j, lit(5))),
                array_min(slice(hs, j, lit(5)))))),
            p => element_at(hs, p.cast("int")))))
        .otherwise(array().cast("array<string>"))
    }
}
