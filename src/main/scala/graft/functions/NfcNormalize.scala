package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization of a string column — the first step
  * of any text-canonicalization pass (visually identical strings with
  * different codepoint sequences — e.g. `e` + U+0301 vs precomposed `é` —
  * must hash identically before exact/near dedup, or duplicates survive
  * every digest-keyed stage). Mirrors the payload-identity concern of ref
  * kafkaesque-io/pulsar-beam (src/model/topic.go:119-123 keys configs by a
  * digest of the raw string), generalized to corpus text identity.
  *
  * Spark has no built-in normalization function; DuckDB's `nfc_normalize`
  * is the oracle twin. Both delegate to the Unicode canonical-composition
  * tables, so results are byte-identical for any well-formed input.
  *
  * Why a custom Catalyst Expression (SURVEY.md §4.2 preference order): the
  * only alternative is a Scala UDF (banned from hot paths — breaks codegen
  * and null tracking). `java.text.Normalizer.normalize` is a static pure
  * call, so this participates in whole-stage codegen directly. The ASCII
  * fast path skips allocation entirely: NFC is the identity on ASCII, and
  * UTF8String exposes the byte array without copying.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalizeImpl {

  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC never changes pure-ASCII text, and web corpora
    // are overwhelmingly ASCII — scan in place via getByte (getBytes would
    // COPY the buffer for UnsafeRow-backed strings, defeating the point).
    val n     = s.numBytes()
    var i     = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      val out = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      // normalize allocates even when already-NFC; reuse the input when equal
      if (out == str) s else UTF8String.fromString(out)
    }
  }
}

object NfcNormalizeFunctions {

  /** Codegen'd NFC normalization. No higher-order-function fallback exists
    * (Spark ships no normalization primitive to compose from), so without
    * the classic-session Column↔Expression bridge this fails fast rather
    * than silently skipping normalization.
    */
  def nfcNormalize(text: Column): Column =
    GraftFunctions.liftUnary(text, NfcNormalize.apply).getOrElse(
      throw new UnsupportedOperationException(
        "nfc_normalize needs the classic-session Expression bridge; " +
          "no Column-only fallback can express Unicode normalization"))
}
