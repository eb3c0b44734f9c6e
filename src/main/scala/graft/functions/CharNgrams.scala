package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All overlapping character n-grams of a string column in ONE pass —
  * `char_ngrams(text, 3)` — the generator feeding x66's trigram language
  * model (the CCNet/KenLM quality-filter shape).
  *
  * Why a custom Expression: the HOF formulation
  * `transform(sequence(1, length-2), i -> substr(text, i, 3))` calls
  * `substr` once per position, and UTF8String char indexing is a linear
  * byte walk from the START of the string each call — O(len²) per document.
  * A web corpus has heavy-tailed document lengths, so the quadratic rows
  * are exactly the documents that dominate a 100 TB pass. Here one byte
  * walk records every char boundary, then each n-gram is the byte range
  * `[offset(i), offset(i+n))` — a zero-copy slice of the original buffer —
  * giving O(len · n) total with no re-scanning.
  *
  * Exact contract (bit-identical to the substr formulation and the DuckDB
  * `substr(text, i, 3)` twin): n-grams are CHARACTER-based (a multi-byte
  * code point counts once), overlapping, in order; strings shorter than n
  * chars yield an empty array. Surrogate pairs follow UTF-8 code-point
  * boundaries, matching both engines' substr.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"char_ngrams expects string, got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"char_ngrams needs n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgramsImpl.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgramsImpl.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgramsImpl {

  /** One byte walk marks every UTF-8 char start; gram i is then the slice
    * [off(i), off(i+n)) of the original buffer — no copying, no re-walk.
    */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len   = bytes.length
    // char-start offsets (a UTF-8 continuation byte is 10xxxxxx). Sized by
    // BYTE count, not numChars(): on malformed UTF-8 (parquet doesn't
    // validate) numChars skips bytes the start-counting loop below counts,
    // so a numChars+1 array can overflow. len+1 is always sufficient.
    val offs = new Array[Int](len + 1)
    var c = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(c) = len
    if (c < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](c - n + 1)
    var g = 0
    while (g < c - n + 1) {
      out(g) = UTF8String.fromBytes(bytes, offs(g), offs(g + n) - offs(g))
      g += 1
    }
    new GenericArrayData(out)
  }
}

object CharNgramsFunctions {

  /** Codegen'd one-pass n-gram array; the HOF fallback keeps the identical
    * substr contract (used only when the classic-session bridge is gone).
    */
  def charNgrams(text: Column, n: Int): Column =
    GraftFunctions.liftUnary(text, e => CharNgrams(e, n)).getOrElse {
      import org.apache.spark.sql.functions._
      // NULL-in/NULL-out matches the Expression path (nullSafeEval);
      // the short-string guard is part of the contract: without it
      // sequence(1, len-(n-1)) DESCENDS for len < n (Spark defaults the
      // step to -1 when start > stop) and emits garbage grams
      when(text.isNull, lit(null).cast("array<string>"))
        .when(length(text) >= n,
          transform(sequence(lit(1), length(text) - (n - 1)),
            i => text.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    }
}
