package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.ops.Tables

/** Environment doctor: one command that diagnoses the corpus/session drift
  * classes that have actually bitten this repo — run it FIRST when queries
  * start throwing after a testdata regeneration.
  * `sbt "runMain graft.Doctor /root/testdata/sf0.001"`.
  *
  * Checks, each printed as `[ok]`/`[FAIL]` with exit 1 on any failure:
  *  1. every expected table file exists and its schema prints (drift is
  *     visible by eye in the output);
  *  2. the event-time flavor of `events.ts` as WRITTEN (TIMESTAMP /
  *     TIMESTAMP_NTZ / int64-nanos) and that [[Tables]] normalizes it to a
  *     true TIMESTAMP — the round-5 drift class
  *     (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`);
  *  3. a watermark survives analysis on the normalized stream column;
  *  4. `unix_micros` evaluates on it (the x48/x63 breakage class);
  *  5. the session timezone is UTC (the NTZ-cast losslessness and every
  *     date-function oracle depend on it) and shuffle partitions are set.
  */
object Doctor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-doctor")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = false
    def check(name: String)(body: => String): Unit = {
      val line = try s"[ok]   $name: $body"
      catch { case e: Exception =>
        failed = true
        s"[FAIL] $name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}"
      }
      // println is the product here: Doctor IS a console diagnostic
      println(line)
    }

    for (t <- Tables.names) check(s"table $t") {
      val df = Tables(spark, sfDir, t)
      // layout matters for the stream staging path: a part-file DIRECTORY
      // must be staged file-by-file (r6 s4 — dir-entry copies feed the
      // stream zero rows silently)
      val p = java.nio.file.Paths.get(s"$sfDir/$t.parquet")
      val layout =
        if (java.nio.file.Files.isDirectory(p)) {
          var n = 0
          val it = java.nio.file.Files.list(p).iterator()
          while (it.hasNext) { if (it.next().toString.endsWith(".parquet")) n += 1 }
          s"directory ($n part files)"
        } else "single file"
      s"[$layout] ${df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}"
    }

    check("events.ts written flavor") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
      raw match {
        case TimestampType    => "timestamp (UTC-adjusted)"
        case TimestampNTZType => "timestamp_ntz (micros, no UTC adjustment) — normalized by Tables"
        case LongType         => "int64 (nanos under nanosAsLong) — normalized by Tables"
        case other            => throw new IllegalStateException(s"unexpected type $other")
      }
    }

    check("events.ts normalizes to TIMESTAMP") {
      val dt = Tables(spark, sfDir, "events").schema("ts").dataType
      if (dt != TimestampType) throw new IllegalStateException(s"got $dt")
      "TimestampType"
    }

    check("watermark survives analysis") {
      val ev = Tables(spark, sfDir, "events")
      // withWatermark analyzes eagerly enough to throw on NTZ; force full
      // analysis through a count-limited action
      val n = ev.withWatermark("ts", "10 minutes").limit(1).count()
      s"analyzed (probe rows=$n)"
    }

    check("unix_micros evaluates") {
      val v = Tables(spark, sfDir, "events")
        .select(expr("unix_micros(ts)").as("um")).limit(1).collect()
      s"sample=${v.headOption.map(_.getLong(0)).getOrElse(-1L)}"
    }

    check("session timezone") {
      val tz = spark.conf.get("spark.sql.session.timeZone")
      if (tz != "UTC") throw new IllegalStateException(s"session TZ is $tz, oracles assume UTC")
      tz
    }

    check("shuffle partitions") {
      spark.conf.get("spark.sql.shuffle.partitions")
    }

    spark.stop()
    if (failed) sys.exit(1)
  }
}
