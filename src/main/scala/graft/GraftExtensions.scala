package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BigramStats, CharNgrams, DocFingerprint, DotF32, NfcNormalize, SimHash32}

/** Session extension wiring (SURVEY.md §4.2): registers the engine's custom
  * expressions so SQL users get them too:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT dot_f32(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotF32Descriptor)
    e.injectFunction(GraftExtensions.simhash32Descriptor)
    e.injectFunction(GraftExtensions.docFingerprintDescriptor)
    e.injectFunction(GraftExtensions.bigramStatsDescriptor)
    e.injectFunction(GraftExtensions.nfcNormalizeDescriptor)
    e.injectFunction(GraftExtensions.charNgramsDescriptor)
  }
}

object GraftExtensions {

  /** Arity guard for SQL function builders: a wrong-arity call must surface
    * as a proper analysis-time error, not a NoSuchElementException from
    * `children.head` (extra arguments silently ignored otherwise).
    */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != n)
        throw new IllegalArgumentException(
          s"$name expects exactly $n argument(s), got ${children.length}")
      build(children)
    }

  private[graft] val dotF32Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_f32"),
    new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
    arity("dot_f32", 2)(children => DotF32(children(0), children(1))))

  private[graft] val simhash32Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash32"),
    new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
    arity("simhash32", 1)(children => SimHash32(children.head)))

  private[graft] val docFingerprintDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("doc_fingerprint"),
    new ExpressionInfo(classOf[DocFingerprint].getName, "doc_fingerprint"),
    arity("doc_fingerprint", 1)(children => DocFingerprint(children.head)))

  private[graft] val bigramStatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bigram_stats"),
    new ExpressionInfo(classOf[BigramStats].getName, "bigram_stats"),
    arity("bigram_stats", 1)(children => BigramStats(children.head)))

  private[graft] val nfcNormalizeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    arity("nfc_normalize", 1)(children => NfcNormalize(children.head)))

  private[graft] val charNgramsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_ngrams"),
    new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
    arity("char_ngrams", 2)(children => children(1) match {
      // n must be a compile-time constant: it parameterizes the generated
      // code, so a non-foldable second argument is an analysis error. The
      // eval() != null guard keeps a foldable NULL literal (CAST(NULL AS
      // INT)) on the error path instead of NPE-ing in toString
      case e if e.foldable && e.eval() != null &&
          (e.dataType == org.apache.spark.sql.types.IntegerType ||
          e.dataType == org.apache.spark.sql.types.LongType ||
          e.dataType == org.apache.spark.sql.types.ShortType) =>
        CharNgrams(children.head, e.eval().toString.toInt)
      case _ => throw new IllegalArgumentException(
        "char_ngrams(text, n): n must be an integer literal")
    }))

  /** Late registration into an already-built session (e.g. one handed to us
    * by a host process that didn't set `spark.sql.extensions`). SessionState
    * is `private[sql]` in Scala but public in bytecode — same reflective
    * bridge as [[graft.functions.GraftFunctions]].
    */
  def register(spark: SparkSession): Boolean =
    try {
      val state = spark.getClass.getMethod("sessionState").invoke(spark)
      val reg   = state.getClass.getMethod("functionRegistry").invoke(state)
      val m = reg.getClass.getMethods.find(m =>
        m.getName == "createOrReplaceTempFunction" && m.getParameterCount == 3).get
      Seq(("dot_f32", dotF32Descriptor._3), ("simhash32", simhash32Descriptor._3),
          ("doc_fingerprint", docFingerprintDescriptor._3),
          ("bigram_stats", bigramStatsDescriptor._3),
          ("nfc_normalize", nfcNormalizeDescriptor._3),
          ("char_ngrams", charNgramsDescriptor._3))
        .foreach { case (name, builder) => m.invoke(reg, name, builder, "scala_udf") }
      true
    } catch { case _: Throwable => false }
}
