package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 native expressions (guide §4: eliminate interpreted HOFs in hot
  * paths): DotI64 and SubspaceArgmin must be BIT-IDENTICAL to the
  * higher-order-function compositions they replaced — including the
  * first-minimum tie-break the oracle's row_number contract depends on.
  */
class NativeExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-native-expr-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("dotI64 equals the zip_with/aggregate fold on random long vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextInt(256).toLong - 128),
        Seq.fill(64)(rnd.nextInt(256).toLong - 128))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val bad = df.select(col("id"),
        graft.functions.GraftFunctions.dotI64(col("a"), col("b")).as("n"),
        hof.as("h"))
      .where(col("n") =!= col("h"))
      .count()
    assert(bad === 0L)
  }

  test("dotI64 is null for a null side, like the fold") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), Option.empty[Seq[Long]])).toDF("a", "b")
    val out = df.select(
      graft.functions.GraftFunctions.dotI64(col("a"), col("b")).as("n")).collect()
    assert(out(0).isNullAt(0))
  }

  test("subspaceArgmin equals the per-subspace HOF argmin incl. first-min ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 4 subspaces of width 4, 8 entries each; entry 3 DUPLICATES entry 1 in
    // every subspace so exact-tie rows exercise the first-min tie-break
    val cb: Array[Array[Array[Long]]] = Array.tabulate(4) { s =>
      val base = Array.tabulate(8, 4)((c, j) => (rnd.nextInt(21) - 10).toLong * (s + 1))
      base(3) = base(1).clone()
      base
    }
    val nSub = cb.length
    val subDim = 4
    // vectors: random, plus rows equal to duplicated entries (forcing ties)
    val vecs: Seq[Seq[Long]] =
      Seq.fill(100)(Seq.fill(nSub * subDim)((rnd.nextInt(21) - 10).toLong)) ++
        Seq(Array.tabulate(nSub * subDim)(i => cb(i / subDim)(1)(i % subDim)).toSeq)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val cbSeq: Seq[Seq[Seq[Long]]] = cb.map(_.map(_.toSeq).toSeq).toSeq
    def hofArgmin(sx: Int) = {
      val d = transform(sequence(lit(0), lit(cb(sx).length - 1)), c =>
        aggregate(sequence(lit(0), lit(subDim - 1)), lit(0L), (acc, j) => {
          val diff = element_at(col("v"), lit(sx * subDim) + j + lit(1)) -
            element_at(element_at(typedLit(cbSeq(sx)), c + 1), j + 1)
          acc + diff * diff
        }))
      array_position(d, array_min(d)).cast("int")
    }
    val hof = array((0 until nSub).map(hofArgmin): _*)
    val bad = df.select(col("id"),
        graft.functions.GraftFunctions.subspaceArgmin(col("v"), cb, subDim)(hof).as("n"),
        hof.as("h"))
      .where(expr("n != h"))
      .count()
    assert(bad === 0L)
    // and the planted-tie row resolves to position 2 (entry index 1, 1-based
    // first minimum), never the duplicate at position 4
    val tie = df.where(col("id") === 100)
      .select(graft.functions.GraftFunctions.subspaceArgmin(col("v"), cb, subDim)(hof))
      .collect()(0).getSeq[Int](0)
    assert(tie.forall(_ === 2))
  }

  /** Hostile word-shape corpus for the round-15 text expressions: empty,
    * single word, consecutive/leading/trailing spaces (split keeps empty
    * words), multi-byte UTF-8, repeated grams (dedup + winnow ties),
    * exactly-boundary word counts, and nulls.
    */
  private def textFixture: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "δλθ", "b", "cc", "", "день")
    val random = Seq.tabulate(120) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    random ++ Seq(
      (200L, ""), (201L, "one"), (202L, "a b"), (203L, "a b c"),
      (204L, "a  b   c  d"), (205L, " lead and trail "),
      (206L, "x y z x y z x y z x y z"), // heavy gram repetition
      (207L, ("w " * 8).trim), // exactly 8 words
      (208L, ("w " * 7).trim), // exactly 7 words (below winnow threshold)
      (209L, null.asInstanceOf[String]))
  }

  test("wordNgramDigests equals the split/concat_ws/md5 HOF chain (n=3,5,8)") {
    import spark.implicits._
    val df = textFixture.toDF("id", "text")
    for (n <- Seq(3, 5, 8)) {
      val w = split(col("text"), " ")
      val hof = when(col("text").isNull, lit(null).cast("array<string>"))
        .otherwise(when(size(w) >= n,
          transform(sequence(lit(1), size(w) - (n - 1)),
            i => substring(md5(concat_ws(" ",
              (0 until n).map(o => element_at(w, i + o)): _*)), 1, 16)))
          .otherwise(array().cast("array<string>")))
      val native = graft.functions.WordNgramDigestsFunctions
        .wordNgramDigests(col("text"), n, dedup = false)
      val bad = df.select(col("id"), native.as("nv"), hof.as("hf"))
        .where(not(col("nv") <=> col("hf"))).count()
      assert(bad === 0L, s"positional n=$n")
      // dedup mode: set-equal to array_distinct of the positional form,
      // first-occurrence order
      val badD = df.select(col("id"),
          graft.functions.WordNgramDigestsFunctions
            .wordNgramDigests(col("text"), n, dedup = true).as("nv"),
          array_distinct(hof).as("hf"))
        .where(not(col("nv") <=> col("hf"))).count()
      assert(badD === 0L, s"dedup n=$n")
    }
  }

  test("winnowFingerprints equals the slice/array_min/rightmost-tie HOF chain") {
    import spark.implicits._
    val df = textFixture.toDF("id", "text")
    val w = split(col("text"), " ")
    val hs = transform(sequence(lit(1), size(w) - 3),
      i => substring(md5(array_join(slice(w, i, lit(4)), " ")), 1, 16))
    val ref = when(col("text").isNull, lit(null).cast("array<string>"))
      .otherwise(when(size(w) >= 8,
        array_distinct(transform(
          array_distinct(transform(sequence(lit(1), size(hs) - 4),
            j => j + lit(5) - array_position(reverse(slice(hs, j, lit(5))),
              array_min(slice(hs, j, lit(5)))))),
          p => element_at(hs, p.cast("int")))))
        .otherwise(array().cast("array<string>")))
    // compare as SETS (both sides dedup; first-occurrence orders coincide
    // here but the contract is the set — the consumer is explode → groupBy)
    val bad = df.select(col("id"),
        sort_array(graft.functions.WinnowFingerprintsFunctions
          .winnowFingerprints(col("text"))).as("nv"),
        sort_array(ref).as("hf"))
      .where(not(col("nv") <=> col("hf"))).count()
    assert(bad === 0L)
    // planted tie: identical grams everywhere (doc 206) must pick the
    // RIGHTMOST window minimum — one distinct fingerprint survives
    val tie = df.where(col("id") === 206)
      .select(graft.functions.WinnowFingerprintsFunctions.winnowFingerprints(col("text")))
      .collect()(0).getSeq[String](0)
    assert(tie.length >= 1)
  }
}
