package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when one join key carries a large share
  * of the big side's rows, a plain shuffle join lands that key's entire
  * volume on ONE reducer. Salting splits each key into `saltFactor` shuffle
  * partitions: the big side gets a deterministic per-row salt, the small
  * side is replicated once per salt value, and the join runs on
  * (key, salt) — the hot key's rows spread across `saltFactor` tasks.
  *
  * This is the explicit fallback for engines/paths where AQE's runtime skew
  * split doesn't apply (e.g. non-sort-merge joins, or when statistics hide
  * the skew). The salt is derived by hashing the big side's whole row
  * (deterministic — no rand(), per the repo's reproducibility invariant);
  * row-content collisions only reduce spread, never correctness. */
object SkewJoin {

  /** Equi-join big⨝small on bigKey = smallKey, salted `saltFactor` ways.
    * Column sets must be disjoint (standard join hygiene). `joinType`
    * supports "inner" and "left_outer" (both preserve per-big-row semantics
    * under salting: the small side is replicated across every salt value, so
    * a big row finds its match — or its null row — exactly once). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                 saltFactor: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    require(joinType == "inner" || joinType == "left_outer",
      s"saltedJoin supports inner/left_outer, not $joinType")
    val bigCols: Array[Column] = big.columns.map(big(_))
    val salted = big.withColumn("__salt", pmod(xxhash64(bigCols: _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }
}
