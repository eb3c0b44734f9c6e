package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-hex-char md5 digests of every overlapping word n-gram of a text
  * column in ONE pass — `word_ngram_digests(text, n, dedup)` — the shingle
  * generator under the whole dedup family (n=3: x02/x04/x107/x108/x127…,
  * n=5: x88/x166 span positions, n=8: x90 novelty grams).
  *
  * Exact contract (value-identical to the HOF formulation and the DuckDB
  * twin): words are `split(text, " ")` with limit −1 — single-space
  * separator, empty words KEPT (consecutive/leading/trailing spaces);
  * n-gram i (0-based) is `concat_ws(" ", w[i], …, w[i+n−1])`, its digest
  * `substring(md5(gram), 1, 16)` (lowercase hex). Fewer than n words →
  * empty array; null text → null. With `dedup = true` only the FIRST
  * occurrence of each digest is kept (per-document set semantics — legal
  * exactly where the caller applies a distinct or set-semantics aggregate
  * downstream; the global result is unchanged while the explode and the
  * exchange carry fewer rows). With `dedup = false` element i is the
  * digest at word position i (posexplode positions stay meaningful).
  *
  * Why a custom Expression (guide §4): the HOF pipeline
  * `transform(sequence(…), i -> substring(md5(concat_ws(" ",
  * element_at(w,i), …)), 1, 16))` runs INTERPRETED (higher-order functions
  * are CodegenFallback) — per position it boxes a lambda variable, makes n
  * `element_at` calls, allocates the joined gram string, then a second
  * full copy for md5's input and a 32-char hex string it immediately
  * truncates. Here one byte scan finds the word boundaries and each
  * digest is fed to MD5 directly from slices of the original UTF-8 buffer
  * — no gram string, no 32-char intermediate, no per-element lambda
  * machinery — and the call participates in whole-stage codegen.
  *
  * Splitting on the raw 0x20 byte is exact: UTF-8 guarantees the space
  * byte never occurs inside a multi-byte sequence, so byte-level word
  * boundaries equal the regex split's character-level ones.
  */
case class WordNgramDigests(child: Expression, n: Int, dedup: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_ngram_digests expects string, got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"word_ngram_digests needs n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngram_digests"

  override def nullSafeEval(input: Any): Any =
    WordNgramDigestsImpl.digests(input.asInstanceOf[UTF8String], n, dedup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNgramDigestsImpl.digests($c, $n, $dedup)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramDigests =
    copy(child = newChild)
}

object WordNgramDigestsImpl {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Space = Array[Byte](' ')
  private val HexDigits = "0123456789abcdef".toCharArray

  /** First 8 digest bytes as 16 lowercase hex chars — equal to
    * `substring(md5(gram), 1, 16)`. The 8-byte prefix is bijective with the
    * hex string, so the dedup set stores the long instead of the string.
    */
  private def hex16(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def digests(s: UTF8String, n: Int, dedup: Boolean): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // word boundaries: split on the 0x20 byte, empties kept (limit -1).
    // L words have L-1 separators; starts/ends sized L <= len+1.
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
    if (words < n) return new GenericArrayData(Array.empty[Any])
    val grams = words - n + 1
    val d = md5.get()
    val out = new Array[Any](grams)
    val seen = if (dedup) new java.util.HashSet[java.lang.Long](grams * 2) else null
    var k = 0
    var g = 0
    while (g < grams) {
      var j = 0
      while (j < n) {
        if (j > 0) d.update(Space)
        d.update(bytes, starts(g + j), ends(g + j) - starts(g + j))
        j += 1
      }
      val dig = d.digest() // returns 16 bytes and resets the digest
      if (!dedup || seen.add(
          ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
          ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
          ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
          ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL))) {
        out(k) = hex16(dig)
        k += 1
      }
      g += 1
    }
    if (k == grams) new GenericArrayData(out)
    else {
      val trimmed = new Array[Any](k)
      System.arraycopy(out, 0, trimmed, 0, k)
      new GenericArrayData(trimmed)
    }
  }
}

object WordNgramDigestsFunctions {
  import org.apache.spark.sql.functions._

  /** Codegen'd one-pass word-n-gram digests; the HOF fallback keeps the
    * identical split/concat_ws/md5/substring contract (used only when the
    * classic-session bridge is gone). `dedup` applies array_distinct in
    * the fallback — first-occurrence order, same as the native path.
    */
  def wordNgramDigests(text: Column, n: Int, dedup: Boolean): Column =
    GraftFunctions.liftUnary(text, e => WordNgramDigests(e, n, dedup)).getOrElse {
      val w = split(text, " ")
      val grams = when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => substring(md5(concat_ws(" ",
            (0 until n).map(o => element_at(w, i + o)): _*)), 1, 16)))
        .otherwise(array().cast("array<string>"))
      if (dedup) array_distinct(grams) else grams
    }
}
