package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (the 100 TB posture item that AQE's
  * skew-join split doesn't cover: a *build side* that must meet every
  * replica of a hot key).
  *
  * `saltedJoin(left, right, key, salt)` equi-joins on `key` with the left
  * (large, possibly skewed) side salted into `salt` sub-keys and the right
  * (smaller) side replicated `salt` times — a hot key's rows spread over
  * `salt` reducers instead of one straggler task. Result is identical to
  * `left.join(right, key)`; only the physical distribution changes.
  *
  * When the right side is broadcast-small, prefer `broadcast()` (no shuffle
  * at all); salting is for the mid-size dimension that exceeds the broadcast
  * threshold while the fact side carries hot keys.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltCol = "__graft_salt"
    // deterministic salt from a sibling hash, not rand(): replayable plans
    val salted = left.withColumn(saltCol, pmod(hash(col(key), monotonically_increasing_id()), lit(salt)))
    val replicated = right
      .withColumn(saltCol, explode(sequence(lit(0), lit(salt - 1))))
      .withColumn(saltCol, col(saltCol).cast("int"))
    salted
      .join(replicated, Seq(key, saltCol))
      .drop(saltCol)
  }
}
