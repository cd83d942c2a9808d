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
    * shards are the unit of parallelism, and no window, global or otherwise,
    * is involved. One shuffle total.
    *
    * Shard cardinality IS the parallelism bound: a corpus sharded only by a
    * 5-value language column serializes its majority language through one
    * task however many executors exist. When the natural shard key is
    * low-cardinality, pass `subShards > 1`: each shard splits into that many
    * deterministic hash buckets of its `orderCols` key, next-fit runs
    * independently per bucket, and bucket-local pack ids are interleaved
    * into one disjoint per-shard id space (`pack_id = local * subShards +
    * bucket`). Every packing invariant is preserved exactly — documents
    * whole, `pack_offset + tokens <= budget` per pack, oversized documents
    * alone — and the assignment stays deterministic; what changes is only
    * WHICH budget-full pack a document lands in (each bucket packs its own
    * subsequence, so a shard yields at most `subShards - 1` extra partial
    * tail packs — noise at corpus scale, and the price of restoring
    * data-width parallelism to the sequential recurrence).
    */
  def packGreedy(df: DataFrame, shardCols: Seq[String], orderCols: Seq[Column],
                 tokenCol: Column, budget: Long, subShards: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(subShards > 0, s"subShards must be positive, got $subShards")
    require(shardCols.nonEmpty,
      "packGreedy needs shard columns — an unsharded greedy pack assignment would " +
        "serialize the corpus through one task; shard by language/source or a hash " +
        "bucket first")
    val tokTmp = "_graft_pack_tok"
    val bucketTmp = "_graft_pack_bucket"
    val withCols = df.withColumn(tokTmp, tokenCol.cast("long"))
      .withColumn(bucketTmp,
        if (subShards == 1) lit(0)
        else pmod(xxhash64(orderCols: _*), lit(subShards)).cast("int"))
    val groupCols = shardCols.map(col) :+ col(bucketTmp)
    val parted = withCols
      .repartition(groupCols: _*)
      .sortWithinPartitions(groupCols ++ orderCols: _*)
    val schema = parted.schema
    val shardIdx = shardCols.map(schema.fieldIndex) :+ schema.fieldIndex(bucketTmp)
    val tokIdx = schema.fieldIndex(tokTmp)
    val bucketIdx = schema.fieldIndex(bucketTmp)
    val nSub = subShards.toLong
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
        // interleave bucket-local ids into one disjoint per-shard space
        val globalPack = packId * nSub + r.getInt(bucketIdx)
        Row.fromSeq(r.toSeq :+ globalPack :+ offset)
      }
    }(Encoders.row(outSchema)).drop(tokTmp, bucketTmp)
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

  /** GPT-style concat-and-chunk example INDEX: within each shard the
    * documents form one virtual token stream — each contributes `tokenCol`
    * content tokens plus `sepTokens` reserved end-of-document positions —
    * and the stream splits into fixed `seqLen`-token examples that CROSS
    * document boundaries (where [[packGreedy]] keeps documents whole, this
    * is the pretraining recipe that wastes zero context positions).
    *
    * The output is one row per (document, example) overlap — a SLICE INDEX
    * `(example_id, slice_start, slice_len, example_pos)`: token grain is
    * never exploded, so a corpus of any size costs one shard-partitioned
    * window plus a generator bounded by ceil(tokens/seqLen) per document.
    * `slice_start` is the slice's offset within the document's own tokens,
    * `example_pos` its offset within the example. Token-less documents
    * occupy only separator positions and emit no slice. */
  def concatChunkIndex(df: DataFrame, shardCols: Seq[String], orderCols: Seq[Column],
                       tokenCol: Column, seqLen: Long,
                       sepTokens: Long = 1L): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(sepTokens >= 0, s"sepTokens must be non-negative, got $sepTokens")
    require(shardCols.nonEmpty,
      "concatChunkIndex needs shard columns — an unsharded stream would serialize " +
        "the corpus through one window partition; shard by language/source or a " +
        "hash bucket first")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stream = tokenCol.cast("long") + sepTokens
    df.withColumn("__n", tokenCol.cast("long"))
      .withColumn("__off", sum(stream).over(w) - stream)
      .filter(col("__n") > 0)
      .withColumn("example_id", explode(sequence(
        floor(col("__off") / seqLen).cast("long"),
        floor((col("__off") + col("__n") - 1) / seqLen).cast("long"))))
      .withColumn("slice_start",
        greatest(lit(0L), col("example_id") * seqLen - col("__off")))
      .withColumn("slice_len",
        least(col("__off") + col("__n"), (col("example_id") + 1) * seqLen) -
          greatest(col("__off"), col("example_id") * seqLen))
      .withColumn("example_pos",
        greatest(lit(0L), col("__off") - col("example_id") * seqLen))
      .drop("__n", "__off")
  }

  /** Materialize [[concatChunkIndex]] examples as text: each slice cuts its
    * tokens out of its document and the slices concatenate in
    * `example_pos` order — one hash aggregation keyed on (shard,
    * example_id), each group ≤ `seqLen` tokens by construction. Separator
    * positions stay reserved-but-empty here; the training tokenizer owns
    * the actual EOS symbol. */
  def materializeChunks(indexed: DataFrame, shardCols: Seq[String],
                        textCol: Column): DataFrame = {
    require(shardCols.nonEmpty, "materializeChunks needs the shard columns")
    val sliceTxt = array_join(slice(TextFunctions.tokens(textCol),
      (col("slice_start") + 1).cast("int"), col("slice_len").cast("int")), " ")
    indexed
      .withColumn("__slice", sliceTxt)
      .groupBy(shardCols.map(col) :+ col("example_id"): _*)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("example_pos"), col("__slice").as("__t")))),
          s => s.getField("__t")), " ").as("example_text"),
        sum(col("slice_len")).as("n_tokens"))
  }

  /** Length-bucketed batch assembly: group examples of similar length into
    * fixed-size batches so per-batch padding (every sequence padded to the
    * batch max) is minimized — the standard dynamic-batching recipe for
    * SFT/fine-tuning loaders, where examples stay whole (contrast
    * [[concatChunkIndex]], the pretraining recipe that concatenates).
    *
    * `bucketEdges` (ascending) split the length axis: bucket k holds
    * lengths in [edge_k, edge_{k+1}), bucket 0 everything below the first
    * edge. Within each (shard, bucket) the rows take a deterministic
    * `orderCols` order and fill batches of `batchSize` in sequence.
    *
    * Plan shape: the bucket is a scan-side when-chain; the only exchange is
    * the (shard, bucket) window partitioning. Shards bound each window
    * partition exactly as in [[packByTokenBudget]] — at corpus scale pass a
    * hash bucket alongside language/source so no single (shard, bucket)
    * group exceeds a partition.
    *
    * @return input columns plus `length_bucket` (int), `batch_id`
    *         (per-(shard, bucket), 0-based), `batch_pos` (0..batchSize-1). */
  def lengthBucketBatches(df: DataFrame, shardCols: Seq[String], lenCol: Column,
                          bucketEdges: Seq[Long], batchSize: Int,
                          orderCols: Seq[Column]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(bucketEdges.nonEmpty, "lengthBucketBatches needs at least one bucket edge")
    require(bucketEdges == bucketEdges.sorted && bucketEdges.distinct == bucketEdges,
      s"bucketEdges must be strictly ascending, got $bucketEdges")
    require(shardCols.nonEmpty,
      "lengthBucketBatches needs shard columns — an unsharded batch numbering would " +
        "serialize the corpus through one window partition; shard by language/source " +
        "or a hash bucket first")
    val bucket = bucketEdges.map(e => when(lenCol >= lit(e), 1).otherwise(0))
      .reduce(_ + _)
    val w = Window.partitionBy(shardCols.map(col) :+ col("length_bucket"): _*)
      .orderBy(orderCols: _*)
    df.withColumn("length_bucket", bucket.cast("int"))
      .withColumn("__rn", row_number().over(w).cast("long") - 1)
      .withColumn("batch_id", floor(col("__rn") / batchSize).cast("long"))
      .withColumn("batch_pos", (col("__rn") % batchSize).cast("int"))
      .drop("__rn")
  }

  /** Per-batch padding report over [[lengthBucketBatches]] output: rows,
    * longest member, token total, and `pad_tokens` — positions wasted when
    * every member pads to the batch max. One hash aggregation keyed on
    * (shard, bucket, batch). */
  def batchPaddingStats(batched: DataFrame, shardCols: Seq[String],
                        lenCol: Column): DataFrame =
    batched
      .groupBy(shardCols.map(col) ++ Seq(col("length_bucket"), col("batch_id")): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        max(lenCol.cast("long")).as("max_len"),
        sum(lenCol.cast("long")).as("sum_len"))
      .withColumn("pad_tokens", col("max_len") * col("n_rows") - col("sum_len"))
}
