package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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

  /** Exact greedy next-fit packing: documents are visited in `orderCols`
    * order within each shard; one that would overflow the open pack's
    * remaining budget closes it and starts the next. Unlike
    * [[packByTokenBudget]]'s boundary-at-multiples approximation, no
    * document straddles a pack boundary, so `pack_offset + tokens <= budget`
    * holds for every row except a single oversized document (tokens >
    * budget), which gets a pack of its own.
    *
    * The recurrence is inherently sequential per shard, so the scan runs as
    * one `mapPartitions` pass after hash-partitioning on the shard key —
    * shards are the unit of parallelism (language × source × hash buckets
    * are plentiful at corpus scale), and no window, global or otherwise, is
    * involved. One shuffle total.
    */
  def packGreedy(df: DataFrame, shardCols: Seq[String], orderCols: Seq[Column],
                 tokenCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shardCols.nonEmpty,
      "packGreedy needs shard columns — an unsharded greedy pack assignment would " +
        "serialize the corpus through one task; shard by language/source or a hash " +
        "bucket first")
    val tokTmp = "_graft_pack_tok"
    val parted = df.withColumn(tokTmp, tokenCol.cast("long"))
      .repartition(shardCols.map(col): _*)
      .sortWithinPartitions(shardCols.map(col) ++ orderCols: _*)
    val schema = parted.schema
    val shardIdx = shardCols.map(schema.fieldIndex)
    val tokIdx = schema.fieldIndex(tokTmp)
    val outSchema = StructType(schema.fields :+
      StructField("pack_id", LongType, nullable = false) :+
      StructField("pack_offset", LongType, nullable = false))
    parted.mapPartitions { it =>
      var curShard: Seq[Any] = null
      var packId = 0L
      var fill = 0L
      it.map { r =>
        val shard = shardIdx.map(r.get)
        if (curShard == null || shard != curShard) {
          curShard = shard; packId = 0L; fill = 0L
        }
        val tok = if (r.isNullAt(tokIdx)) 0L else r.getLong(tokIdx)
        if (fill > 0 && fill + tok > budget) { packId += 1; fill = 0L }
        val offset = fill
        fill += tok
        Row.fromSeq(r.toSeq :+ packId :+ offset)
      }
    }(Encoders.row(outSchema)).drop(tokTmp)
  }

  /** Emit the packed training rows themselves: one row per (shard, pack)
    * with the member texts concatenated in `orderCols` order (joined with
    * `sep`), the member count and the token total — the artifact a
    * training loader actually reads, downstream of [[packGreedy]]/
    * [[packByTokenBudget]]'s assignment columns.
    *
    * One hash aggregation keyed on (shard, pack_id); each group is
    * pack-sized (≤ budget tokens) by construction, so the collected array
    * is bounded however big the corpus is. */
  def materializePacks(packed: DataFrame, shardCols: Seq[String],
                       orderCols: Seq[Column], textCol: Column,
                       tokenCol: Column, sep: String = "\n\n"): DataFrame = {
    require(shardCols.nonEmpty, "materializePacks needs the shard columns")
    packed.groupBy(shardCols.map(col) :+ col("pack_id"): _*)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(orderCols :+ textCol.as("__t"): _*))),
          s => s.getField("__t")), sep).as("pack_text"),
        count(lit(1)).as("n_docs"),
        sum(tokenCol.cast("long")).as("n_tokens"))
  }
}
