package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 re-plans of the time-bucket sessionization family must equal
  * the direct per-user-window formulations (the oracle's shape) on an
  * adversarial fixture: hot users, null user, gap exactly == threshold,
  * same-bucket chains, cross-bucket chains, skipped buckets, duplicate
  * timestamps (event_id tie-break), and a x69 null-embedding rank check.
  */
class RekeySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rekey-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Events fixture written as a Tables-readable corpus dir. */
  private lazy val fixDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(15)
    val types = Vector("click", "view", "buy", null)
    val base = 1700000000000000L // µs
    val W = 1800000000L
    var id = 0L
    def ev(user: java.lang.Long, tsu: Long, ty: String): (Long, Long, java.lang.Long, String, Double, String) = {
      id += 1; (id, tsu, user, ty, 1.0, null)
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, java.lang.Long, String, Double, String)]
    // hot user 1: a dense multi-bucket chain (always < gap apart)
    var t = base
    for (_ <- 1 to 400) { t += 600000000L; rows += ev(1L, t, types(rnd.nextInt(3))) }
    // user 2: gap EXACTLY the threshold (new session on both engines)
    rows += ev(2L, base, "click")
    rows += ev(2L, base + W, "view")
    rows += ev(2L, base + W + 1, "buy") // 1 µs into the session
    // user 3: skipped buckets (prev non-empty bucket is b-2, b-5)
    rows += ev(3L, base, "click")
    rows += ev(3L, base + 2 * W + 5, "view")
    rows += ev(3L, base + 7 * W + 9, "buy")
    // user 4: duplicate timestamps — event_id breaks the tie
    rows += ev(4L, base + 42, "click")
    rows += ev(4L, base + 42, "view")
    rows += ev(4L, base + 42, "buy")
    // null user: its own partition on both plans
    rows += ev(null, base, "click")
    rows += ev(null, base + W - 1, "view")
    rows += ev(null, base + 3 * W, "buy")
    // cross-bucket adjacent continuation (gap < W straddling a boundary)
    rows += ev(5L, base + W - 2, "click")
    rows += ev(5L, base + W + 2, "view")
    // random scatter over 30 users
    for (_ <- 1 to 600)
      rows += ev((rnd.nextInt(30) + 10).toLong, base + rnd.nextLong(20 * W), types(rnd.nextInt(4)))
    val dir = java.nio.file.Files.createTempDirectory("graft-rekey").toString
    rows.toSeq.toDF("event_id", "tsu", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("tsu")).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("x48 bucket re-plan equals the per-user window formulation") {
    val out = SparkEntry.queries("x48_transitions")(spark, fixDir).collect()
    // reference: the oracle's lag/cumsum sessionization, per-user window
    val ev = ops.Tables(spark, fixDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    val wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ref = ev
      .withColumn("prev_tsu", lag(col("tsu"), 1).over(wu))
      .withColumn("prev_ty", lag(col("event_type"), 1).over(wu))
      .where(col("prev_tsu").isNotNull && col("tsu") - col("prev_tsu") < 1800000000L)
      .select(col("prev_ty").as("src"), col("event_type").as("dst"))
      .where(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .orderBy("src", "dst")
      .collect()
    assert(out.toSeq == ref.toSeq)
  }

  test("x16 bucket re-plan equals the per-user window formulation") {
    val out = SparkEntry.queries("x16_session_window")(spark, fixDir).collect()
    val ev = ops.Tables(spark, fixDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
    val wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = ev
      .withColumn("prev_tsu", lag(col("tsu"), 1).over(wu))
      .withColumn("inc",
        when(col("prev_tsu").isNull || col("tsu") - col("prev_tsu") >= 1800000000L, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("inc")).over(wRun))
      .groupBy("user_id", "sess_id")
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"), count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_timestamp(col("mn")).as("sess_start"),
        (unix_timestamp(col("mx")) + 1800L).as("sess_end"), col("n"))
      .orderBy("user_id", "sess_start")
      .collect()
    assert(out.toSeq == ref.toSeq)
  }

  test("x109 top-K aggregate legs equal the row_number window formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // planted duplicate vectors force exact cosine TIES — the id tie-break
    // must match the window's
    val base = Seq.tabulate(200)(_ => Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    val rows = Seq.tabulate(400) { i => (i.toLong, base(i % 200), "l") }
    val dir = java.nio.file.Files.createTempDirectory("graft-rekey-x109").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("x109_bitext_margin")(spark, dir).collect()
    // reference: the r14 window formulation
    val K = 4
    val n = ops.Tables(spark, dir, "embeddings")
      .where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        sqrt(graft.functions.GraftFunctions.dotF32(col("embedding"), col("embedding"))).as("nrm"))
      .where(col("nrm") > 0)
    val a = n.where(col("vec_id") % 2 === 0)
    val b = n.where(col("vec_id") % 2 === 1)
    val q = a.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    def cMicro(x: org.apache.spark.sql.Column, xn: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column, yn: org.apache.spark.sql.Column) =
      round(graft.functions.GraftFunctions.dotF32(x, y) / (xn * yn) * 1000000, 0).cast("long")
    val fc = b.join(broadcast(q), lit(true))
      .select(col("q_id"), col("vec_id").as("b_id"),
        cMicro(col("qv"), col("qn"), col("embedding"), col("nrm")).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("c").desc, col("b_id"))))
    val top = fc.where(col("rk") <= K).select("q_id", "b_id", "c")
    val ma = top.groupBy("q_id").agg(sum(col("c")).as("s_a"))
    val cand = top.select("b_id").distinct()
    val y = b.join(broadcast(cand), col("vec_id") === cand("b_id"))
      .select(col("vec_id").as("y_id"), col("embedding").as("yv"), col("nrm").as("yn"))
    val rc = a.join(broadcast(y), lit(true))
      .select(col("y_id"), col("vec_id").as("a_id"),
        cMicro(col("yv"), col("yn"), col("embedding"), col("nrm")).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("y_id").orderBy(col("c").desc, col("a_id"))))
    val mb = rc.where(col("rk") <= K).groupBy(col("y_id").as("b_id2"))
      .agg(sum(col("c")).as("s_b"))
    val sc = top.join(ma, "q_id").join(mb, col("b_id") === col("b_id2"))
      .where(col("s_a") + col("s_b") > 0)
      .select(col("q_id"), col("b_id"), col("c"),
        expr("8 * c * 1000000 div (s_a + s_b)").as("margin_ppm"))
    val ref = sc.withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("margin_ppm").desc, col("b_id"))))
      .where(col("rk") === 1 && col("margin_ppm") >= 1050000)
      .select(col("q_id"), col("b_id").as("m_id"), col("c").as("cos_micro"), col("margin_ppm"))
      .orderBy("q_id")
      .collect()
    assert(out.toSeq == ref.toSeq)
  }

  test("x69 top-k aggregate equals the row_number window, incl. null codes") {
    // fixture with a null embedding: the aggregate's rank-last sentinel
    // must reproduce the window's DESC NULLS LAST
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(300) { i =>
      (i.toLong,
        if (i == 7) null
        else Seq.fill(64)(rnd.nextFloat() * 2 - 1),
        s"l${i % 4}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-rekey-emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("x69_quantized_topk")(spark, dir).collect()
    // reference: the r14 window formulation over the same quantized codes
    val mn = array_min(col("embedding")).cast("double")
    val mx = array_max(col("embedding")).cast("double")
    val codes = ops.Tables(spark, dir, "embeddings").select(
      col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => when(mx === mn, lit(0L))
          .otherwise(floor((x - mn) * 255.0 / (mx - mn) + 0.5).cast("long") - 128))
        .as("codes"))
    val qdot = aggregate(zip_with(col("q.codes"), col("c.codes"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val wTop = Window.partitionBy("q_id").orderBy(col("qdot").desc, col("n_id"))
    val ref = codes.as("c")
      .join(broadcast(codes.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)).as("q"),
        col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("n_id"), qdot.as("qdot"))
      .withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("rk"), col("n_id"), col("qdot"))
      .orderBy("q_id", "rk")
      .collect()
    assert(out.toSeq == ref.toSeq)
  }
}
