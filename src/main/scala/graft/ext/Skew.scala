package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit salting
  * remains the tool when one side must be replicated deterministically —
  * e.g. a dimension join where 1% of keys carry 50% of the fact rows.
  * `saltedJoin` replicates the (small) right side `salt` times and scatters
  * the left side across the replicas with a deterministic hash, so a hot
  * key's rows land on `salt` reducers instead of one.
  */
object Skew {

  /** Equi-join `left.key == right.key` with the right side replicated
    * `salt`× and the left side scattered by row hash. Results are identical
    * to the plain join; only the shuffle distribution changes. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // right/full outer would emit unmatched right rows once per replica
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")(joinType),
      s"saltedJoin preserves semantics only for inner/left joins, got $joinType")
    val leftSalted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salt)))
    val rightReplicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    leftSalted.join(rightReplicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key frequency profile — quick skew diagnosis before choosing a
    * strategy (broadcast / salt / AQE default). Ties at the topN boundary
    * break by key so the result set is deterministic; the sort+limit fuses
    * to TakeOrderedAndProject over the keyed aggregate. */
  def keyProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topN)
}
