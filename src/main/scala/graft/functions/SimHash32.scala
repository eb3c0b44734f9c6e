package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash of a space-delimited text column, packed into a long —
  * the per-document signature behind the x03 dedup query (the near-dup
  * family of ref kafkaesque-io/pulsar-beam's payload identity, generalized
  * to fuzzy content identity for corpus dedup).
  *
  * Exact contract (bit-identical to the HOF composition and the DuckDB
  * oracle): tokens are the regex-split of the text on a single space with
  * trailing empties KEPT (Spark `split(text, ' ')` semantics); token hash =
  * md5 of its UTF-8 bytes; bit i (1-based, i = 1..32) of the signature is
  * set iff the sum over tokens of ±1 — +1 when the ascii code of hex char i
  * of the token's md5 is odd — is positive; the packed value is
  * Σ 2^(i−1) over set bits.
  *
  * Why a custom Catalyst Expression (SURVEY.md §4.2 preference order): the
  * HOF pipeline allocates a 32-hex-char string per token plus a 32-lane
  * array per fold step, all interpreted. This expression is one tight byte
  * loop per row — tokens are scanned in place (0x20 never occurs inside a
  * multi-byte UTF-8 sequence, so byte-splitting is safe), the digest is
  * folded directly from its 16 raw bytes, and the whole thing participates
  * in whole-stage codegen via a static call.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects string, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHashImpl {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Parity of the ascii code of the hex char for nibble d: digits are
    * '0'+d (ascii 48+d, parity d&1); letters are 'a'+(d-10) (ascii 87+d,
    * parity (d+1)&1).
    */
  @inline private def hexAsciiParity(d: Int): Int =
    if (d < 10) d & 1 else (d + 1) & 1

  def simhash32(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n     = bytes.length
    val acc   = new Array[Int](32)
    val d     = md5.get()
    var start = 0
    var i     = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        d.reset()
        d.update(bytes, start, i - start)
        val dig = d.digest()
        var k = 0
        while (k < 16) {
          val b = dig(k) & 0xff
          acc(2 * k)     += 2 * hexAsciiParity(b >>> 4) - 1
          acc(2 * k + 1) += 2 * hexAsciiParity(b & 0xf) - 1
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j   = 0
    while (j < 32) {
      if (acc(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}

object SimHashFunctions {
  import org.apache.spark.sql.functions._

  /** Codegen'd 32-bit simhash; HOF fallback keeps identical semantics if
    * the classic-session Column↔Expression bridge is unavailable.
    */
  def simhash32(text: Column): Column =
    GraftFunctions.liftUnary(text, SimHash32.apply).getOrElse {
      val bits = sequence(lit(1), lit(32))
      val contribs = aggregate(
        transform(split(text, " "), w => md5(w)),
        array_repeat(lit(0), 32),
        (acc, h) => zip_with(acc, bits, (a, i) =>
          a + when(ascii(h.substr(i, lit(1))) % 2 === 1, 1).otherwise(-1)))
      aggregate(
        zip_with(contribs, bits, (a, i) =>
          when(a > 0, pow(lit(2), i - 1).cast("long")).otherwise(0L)),
        lit(0L), (acc, v) => acc + v)
    }
}
