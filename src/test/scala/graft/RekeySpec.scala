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
