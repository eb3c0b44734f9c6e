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
}
