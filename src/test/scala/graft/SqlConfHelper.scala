package graft

import org.apache.spark.sql.SparkSession

/** Scoped SQL-conf override for specs that tune optimizer thresholds: sets
  * the pairs, runs the body, and restores (or unsets) every key even on
  * failure — so no test leaks conf into later tests sharing the session.
  */
trait SqlConfHelper {

  def withSQLConf(spark: SparkSession)(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
