package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-bigram statistics of a space-delimited text column in one pass:
  * `struct(n_bigrams, n_unique)` — the inputs to the x26 repetition score
  * (repeated-bigram fraction, the Gopher-style quality gate).
  *
  * Exact contract (bit-identical to the HOF formulation): tokens are the
  * split on a single space with empties KEPT; bigram i is
  * `token(i) ++ " " ++ token(i+1)`; `n_bigrams` = tokens−1, `n_unique` =
  * distinct bigrams by exact string equality. Both are 0 for texts with
  * fewer than 2 tokens (callers filter those, matching the oracle's
  * `len(w) >= 2`).
  *
  * Why a custom Expression: the HOF pipeline allocates every bigram string
  * and then runs interpreted `array_distinct` — O(n²) string comparisons
  * per document. Here a bigram of ADJACENT tokens is exactly the byte range
  * `[start(i), end(i+1))` of the original UTF-8 buffer (tokens are
  * separated by the single space that is part of the bigram), so dedup runs
  * over zero-copy slices in a hash set — O(n) with no per-bigram copying.
  */
case class BigramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigram_stats expects string, got ${child.dataType}")

  override def dataType: DataType = BigramStats.outputType
  override def prettyName: String = "bigram_stats"

  override def nullSafeEval(input: Any): Any =
    BigramStatsImpl.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramStatsImpl.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramStats =
    copy(child = newChild)
}

object BigramStats {
  val outputType: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_unique", LongType, nullable = false)))
}

object BigramStatsImpl {

  def stats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n     = bytes.length
    // token boundaries: split on single 0x20 (empties kept — matches the
    // regex split with limit -1; 0x20 never occurs inside a multi-byte
    // UTF-8 sequence)
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < n) {
      if (bytes(i) == ' ') starts += i + 1
      i += 1
    }
    val tokens = starts.length
    if (tokens < 2) return new GenericInternalRow(Array[Any](0L, 0L))
    val seen = new java.util.HashSet[UTF8String](tokens * 2)
    var b = 0
    while (b < tokens - 1) {
      val from = starts(b)
      // bigram = token b, its separating space, token b+1 — one contiguous
      // slice of the original buffer ending right before the NEXT space
      val until = if (b + 2 < tokens) starts(b + 2) - 1 else n
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      b += 1
    }
    new GenericInternalRow(Array[Any]((tokens - 1).toLong, seen.size().toLong))
  }
}

object BigramStatsFunctions {
  import org.apache.spark.sql.functions._

  /** Codegen'd bigram stats; HOF fallback keeps identical semantics
    * (guarded for <2 tokens — sequence(1, 0) would generate a DESCENDING
    * range, not an empty one).
    */
  def bigramStats(text: Column): Column =
    GraftFunctions.liftUnary(text, BigramStats.apply).getOrElse {
      val w  = split(text, " ")
      val bg = transform(sequence(lit(1), size(w) - 1), i =>
        concat(element_at(w, i), lit(" "), element_at(w, i + 1)))
      when(text.isNull, lit(null).cast(BigramStats.outputType))
        .when(size(w) >= 2,
          struct(
            size(bg).cast("long").as("n_bigrams"),
            size(array_distinct(bg)).cast("long").as("n_unique")))
        .otherwise(struct(lit(0L).as("n_bigrams"), lit(0L).as("n_unique")))
    }
}
