package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing for training-data assembly: assign documents to
  * fixed token-budget packs.
  *
  * The assignment is the boundary-at-multiples approximation of greedy
  * first-fit: a document's pack is `floor(tokens-before-it / budget)`
  * within its shard, so packs fill to the budget and a document straddling
  * a boundary starts the next pack's overflow rather than being split.
  * Exact bin-packing is inherently sequential; this formulation is one
  * partitioned window (shuffle on the shard key), deterministic, and
  * reproducible by any SQL engine — the properties that matter at corpus
  * scale. Shards (e.g. language, source, or a hash bucket) bound each
  * window's partition; packs never cross shards.
  */
object Packing {

  /** Add `pack_id` (per-shard, 0-based) and `pack_offset` columns.
    * `pack_offset` is the document's start position within the idealized
    * budget-multiple window — it INCLUDES a boundary-straddling
    * predecessor's spill (the first document of a pack after a straddle
    * starts at the spill size, not 0). `orderCols` fixes the within-shard
    * document order — pass something deterministic. */
  def packByTokenBudget(df: DataFrame, shardCols: Seq[String],
                        orderCols: Seq[Column], tokenCol: Column,
                        budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shardCols.nonEmpty,
      "packByTokenBudget needs shard columns — an unsharded pack assignment would " +
        "serialize the corpus through one window partition; shard by language/source " +
        "or a hash bucket first")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore = sum(tokenCol).over(w) - tokenCol
    df.withColumn("pack_id", floor(cumBefore / budget).cast("long"))
      .withColumn("pack_offset", (cumBefore % budget).cast("long"))
  }
}
