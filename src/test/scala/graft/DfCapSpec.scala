package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** x143's stop-token df-cap must be FALSIFIABLE (r14 verdict item 5): at
  * the driver's correctness SFs no token can reach df > DfCap (sf0.001 /
  * sf0.01 ship 500 docs; measured max df 415 / 402), so the oracle there
  * verifies the cap branch inert, not firing. This spec builds a corpus
  * where the cap FIRES — ScaleData's --skew mode plants a shared phrase in
  * half the docs, and k = 5 copies of sf0.001 puts those tokens' df ≈ 1250
  * past DfCap = 1000 — then asserts (1) the stop set is non-empty, (2) the
  * capped query differs from the uncapped variant (the branch changes
  * results, i.e. it is live, not dead code), and (3) the capped lexical
  * candidates agree with an independent collect-side re-derivation of the
  * capped overlap contract. (The cross-ENGINE proof at a cap-firing scale
  * is the sf0.1 oracle run recorded in OPTIMIZATION_r15.md — sf0.1 has 30
  * tokens over the cap.)
  */
class DfCapSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dfcap-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val fixDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dfcap").toString
    ScaleData.run(spark, "/root/testdata/sf0.001", dir, 5, skew = true)
    dir
  }

  private def tok0 = ops.Tables(spark, fixDir, "documents")
    .select(col("doc_id"), explode(split(col("text"), " ")).as("w")).distinct()

  test("the skewed fixture pushes tokens past DfCap — the stop set is non-empty") {
    val over = tok0.groupBy("w").agg(count(lit(1)).as("df"))
      .where(col("df") > ops.DedupOps.DfCap).count()
    assert(over >= 1, s"fixture must have tokens with df > ${ops.DedupOps.DfCap}")
  }

  test("the cap changes x143's result on a cap-firing corpus (live branch)") {
    val capped = SparkEntry.queries("x143_rrf_fusion")(spark, fixDir).collect()
    // uncapped variant: x143's lexical leg WITHOUT the stop-token anti-join
    // (the pre-r14 shape), same dense leg via the declared query's code
    val n = ops.Tables(spark, fixDir, "embeddings")
      .where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        sqrt(graft.functions.GraftFunctions.dotF32(col("embedding"), col("embedding"))).as("nrm"))
      .where(col("nrm") > 0)
    val q = n.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val cosV = round(graft.functions.GraftFunctions.dotF32(col("qv"), col("embedding")) /
      (col("qn") * col("nrm")), 6)
    val wc = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    val cosr = n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cosV.as("cos"))
      .withColumn("rc", row_number().over(wc))
      .where(col("rc") <= 20).select("q_id", "n_id", "rc")
    val tok = tok0
    val qt = tok.where(col("doc_id") % 50 === 0 && col("doc_id") < 20000)
      .select(col("doc_id").as("q_id"), col("w"))
    val wl = Window.partitionBy("q_id").orderBy(col("o").desc, col("n_id"))
    val lexr = tok.join(broadcast(qt), tok("w") === qt("w") && col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id").as("n_id"))
      .agg(count(lit(1)).as("o"))
      .withColumn("rl", row_number().over(wl))
      .where(col("rl") <= 20).select("q_id", "n_id", "rl")
    val score = coalesce(lit(1.0) / (lit(60) + col("rc")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(60) + col("rl")), lit(0.0))
    val wf = Window.partitionBy("q_id").orderBy(col("score").desc, col("n_id"))
    val uncapped = cosr.join(lexr, Seq("q_id", "n_id"), "full_outer")
      .select(col("q_id"), col("n_id"), score.as("score"),
        coalesce(col("rc"), lit(-1)).as("rc"), coalesce(col("rl"), lit(-1)).as("rl"))
      .withColumn("rk", row_number().over(wf))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("rk"), col("n_id"), round(col("score"), 6).as("rrf"),
        col("rc").cast("long").as("rank_cos"), col("rl").cast("long").as("rank_lex"))
      .orderBy("q_id", "rk")
      .collect()
    assert(capped.toSeq != uncapped.toSeq,
      "cap-firing corpus must produce a different fused ranking than the uncapped variant")
  }

  test("capped lexical overlap equals a collect-side re-derivation") {
    // independent re-derivation: token sets in plain Scala, df filter,
    // pairwise overlap counts for the query batch
    val rows = tok0.collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = rows.groupBy(_._1).map { case (d, ws) => d -> ws.map(_._2).toSet }
    val df = rows.groupBy(_._2).map { case (w, ds) => w -> ds.length }
    val keep = (w: String) => df(w) <= ops.DedupOps.DfCap
    val qs = byDoc.keys.filter(d => d % 50 == 0 && d < 20000).toSeq
    val expected = (for {
      qid <- qs
      (nid, s) <- byDoc if nid != qid
      o = byDoc(qid).count(w => keep(w) && s.contains(w))
      if o > 0
    } yield (qid, nid, o.toLong)).toSet
    // engine-side capped overlap (the ov aggregate x143 ranks)
    val stop = tok0.groupBy("w").agg(count(lit(1)).as("df"))
      .where(col("df") > ops.DedupOps.DfCap).select("w")
    val tok = tok0.join(broadcast(stop), Seq("w"), "left_anti")
    val qt = tok.where(col("doc_id") % 50 === 0 && col("doc_id") < 20000)
      .select(col("doc_id").as("q_id"), col("w"))
    val ov = tok.join(broadcast(qt), tok("w") === qt("w") && col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id").as("n_id"))
      .agg(count(lit(1)).as("o"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ov == expected)
  }
}
