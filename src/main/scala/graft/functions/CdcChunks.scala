package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk digests of a text column in ONE pass —
  * `cdc_chunk_digests(text)` → array of (cd 16-hex digest, clen chars) —
  * the generator feeding x124 (FastCDC-style dedup chunking).
  *
  * Why a custom Expression: the SQL formulation evaluates the boundary
  * predicate through two interpreted higher-order functions (HOFs are not
  * whole-stage-codegen'd, so every position pays lambda-dispatch + boxing)
  * and then slices each chunk with `substring`, whose UTF8String char
  * indexing byte-walks from the string START each call — O(len²/64) per
  * document. A web corpus has heavy-tailed document lengths, so the
  * quadratic rows are exactly the ones that dominate a 100 TB pass. Here
  * one byte walk records char boundaries and code points, a rolling
  * gear-style window marks cuts, and each chunk digest is MD5 over a byte
  * RANGE of the original buffer — O(len) total, no re-scanning, no
  * per-element lambda machinery.
  *
  * Exact contract (bit-identical to the SQL twin kept in the DuckDB
  * oracle): positions are 1-indexed CHARACTERS; i is a cut iff
  * `i = numChars` or `i >= 8` and the windowed gear condition of
  * `PipelineOps.cdcBoundaryCond` holds — with g(c) = (cp(c)·2654435761)
  * mod 2^20 over the trailing 8 code points,
  * `((Σ_k g(i−k)·2^k) · 2654435761) div 4096 ≡ 0 (mod 64)`. Chunk j spans
  * chars (cut_{j−1}, cut_j]; cd = first 16 hex chars of md5(chunk bytes)
  * (identical to Spark's `substring(md5(chunk), 1, 16)` since the bytes
  * are the same UTF-8 slice); clen = chunk chars. Empty string → empty
  * array; code points decode like java.lang.String (malformed UTF-8 →
  * U+FFFD), matching `ascii(substring(text, i, 1))` on both engines.
  */
case class CdcChunkDigests(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cdc_chunk_digests expects string, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cd", StringType, nullable = false),
                   StructField("clen", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunk_digests"

  override def nullSafeEval(input: Any): Any =
    CdcChunksImpl.chunkDigests(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunksImpl.chunkDigests($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkDigests =
    copy(child = newChild)
}

object CdcChunksImpl {

  private val KNUTH = 2654435761L
  private val HEX = "0123456789abcdef".toCharArray

  // MessageDigest is not thread-safe; one per executor thread
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One byte walk yields char-start offsets AND code points; the gear
    * window then marks cuts in O(1) amortized per char (8-term sum kept
    * incrementally: h_i = 2·h_{i−1} + g(i) − g(i−8)·2^8); each chunk is
    * digested over its byte range of the original buffer.
    */
  def chunkDigests(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val len   = bytes.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    // char-start byte offsets + decoded code points. Sized by byte count
    // (CharNgramsImpl's malformed-UTF-8 lesson: numChars can undercount
    // what start-byte detection sees).
    val offs = new Array[Int](len + 1)
    val cps  = new Array[Int](len)
    var c = 0
    var i = 0
    while (i < len) {
      val b0 = bytes(i) & 0xff
      if ((b0 & 0xc0) != 0x80) {
        offs(c) = i
        // decode the code point starting here, like String/codePointAt:
        // truncated or malformed sequences become U+FFFD
        var cp = 0xfffd
        if (b0 < 0x80) cp = b0
        else if ((b0 & 0xe0) == 0xc0 && i + 1 < len && (bytes(i + 1) & 0xc0) == 0x80)
          cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
        else if ((b0 & 0xf0) == 0xe0 && i + 2 < len && (bytes(i + 1) & 0xc0) == 0x80 && (bytes(i + 2) & 0xc0) == 0x80)
          cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        else if ((b0 & 0xf8) == 0xf0 && i + 3 < len && (bytes(i + 1) & 0xc0) == 0x80 && (bytes(i + 2) & 0xc0) == 0x80 && (bytes(i + 3) & 0xc0) == 0x80)
          cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) | ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        cps(c) = cp
        c += 1
      }
      i += 1
    }
    offs(c) = len
    // rolling gear window: g values for the trailing 8 chars, summed with
    // weights 2^k (k = distance back); cut positions are 1-indexed chars
    val g = new Array[Long](c)
    var j = 0
    while (j < c) { g(j) = (cps(j) * KNUTH) % 1048576L; j += 1 }
    var h = 0L
    val cutsBuf = new Array[Int](c)
    var nCuts = 0
    var p = 0
    while (p < c) {
      h = 2L * h + g(p)
      if (p >= 8) h -= g(p - 8) << 8
      val pos = p + 1 // 1-indexed char position
      val isCut = pos == c || (pos >= 8 && (((h * KNUTH) / 4096L) % 64L) == 0L)
      if (isCut) { cutsBuf(nCuts) = pos; nCuts += 1 }
      p += 1
    }
    val out = new Array[Any](nCuts)
    val dig = md5.get()
    var prev = 0
    var k = 0
    while (k < nCuts) {
      val cut = cutsBuf(k)
      val from = offs(prev)
      val until = offs(cut)
      dig.reset()
      dig.update(bytes, from, until - from)
      val d = dig.digest()
      val hex = new Array[Char](16)
      var b = 0
      while (b < 8) {
        hex(2 * b) = HEX((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = HEX(d(b) & 0xf)
        b += 1
      }
      out(k) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(new String(hex)), cut - prev))
      prev = cut
      k += 1
    }
    new GenericArrayData(out)
  }
}

object CdcChunksFunctions {

  /** Codegen'd one-pass CDC chunk digests; the HOF fallback keeps the
    * identical cut/slice/digest contract (used only when the
    * classic-session bridge is gone).
    */
  def cdcChunkDigests(text: Column): Column =
    GraftFunctions.liftUnary(text, CdcChunkDigests.apply).getOrElse {
      import org.apache.spark.sql.functions._
      // Interpreted-HOF spelling of the same contract. The shared
      // sub-expressions (cc, cuts) inline into each lambda use site, so
      // this path re-walks the string per position — O(len²) per doc.
      // Acceptable: it runs only when the classic-session bridge is gone.
      val cc = transform(split(text, ""), ch => ascii(ch))
      def g(i: Column, k: Int): Column =
        element_at(cc, (i - lit(k)).cast("int")).cast("bigint") *
          lit(2654435761L) % lit(1048576L) * lit(1L << k)
      def isCut(i: Column): Column = {
        val h2 = (0 to 7).map(k => g(i, k)).reduce(_ + _) * lit(2654435761L)
        // exact integer div by 4096: strip the remainder first so the
        // double division is of an exact multiple (≤2^59 / 2^12 < 2^53)
        (((h2 - pmod(h2, lit(4096L))) / lit(4096L)).cast("bigint") % lit(64L)) === lit(0L)
      }
      val cuts = filter(sequence(lit(1), length(text)),
        i => (i === length(text)) || (i >= lit(8) && isCut(i)))
      def prevCut(j: Column): Column =
        when(j === lit(0), lit(0)).otherwise(element_at(cuts, j.cast("int")))
      val chunks = transform(cuts, (cEnd, j) => struct(
        substring(md5(text.substr(prevCut(j) + lit(1), cEnd - prevCut(j))), 1, 16).as("cd"),
        (cEnd - prevCut(j)).as("clen")))
      // NULL-in/NULL-out matches the Expression path; the empty-string
      // guard keeps sequence(1, 0) (which DESCENDS) out of the cut filter
      when(text.isNull, lit(null).cast("array<struct<cd:string,clen:int>>"))
        .when(length(text) === 0, array().cast("array<struct<cd:string,clen:int>>"))
        .otherwise(chunks)
    }
}
