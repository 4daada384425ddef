package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB path.
  *
  * AQE's skew-join split handles most cases
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE);
  * salting is the explicit fallback when one join key dominates so
  * heavily that even split partitions overwhelm a task — e.g. a single
  * hot service/user in a log join.
  *
  * [[saltedJoin]] replicates the (small, broadcast-unfriendly-but-
  * manageable) right side `saltFactor` times and scatters the left
  * side's hot keys across the replicas, so the shuffle key becomes
  * (key, salt) — skew spread over `saltFactor` tasks, exact join
  * semantics preserved for inner/equi joins.
  */
object Skew {

  /** Inner equi-join of `left` and `right` on `key`, with the left
    * side salted across `saltFactor` buckets. Deterministic salt
    * (hash-based, not rand()) so retries/replays stay consistent.
    *
    * `disableBroadcast` pins the join to a shuffle strategy so the
    * salted keys actually hit an Exchange — at 100 TB the right side
    * is too big to broadcast and Catalyst picks a shuffle join anyway,
    * but at test scale a tiny right side would be broadcast and the
    * very skew-spreading being exercised would be optimized out. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, disableBroadcast: Boolean = false): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // scatter left rows deterministically (hash of whole row, cheap)
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    // replicate right across every salt value
    val saltedRight0 = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val saltedRight =
      if (disableBroadcast) saltedRight0.hint("shuffle_hash") else saltedRight0
    saltedLeft.join(saltedRight, Seq(key, "_salt"), "inner")
      .drop("_salt")
  }
}
