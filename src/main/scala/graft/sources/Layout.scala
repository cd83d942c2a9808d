package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout helpers for the 100 TB posture: pre-shuffled (bucketed)
  * tables make every downstream equi-join and aggregation on the bucket
  * keys exchange-free — the shuffle is paid once at write time instead of
  * per query. This is the standard Spark answer to the "co-located join"
  * requirement (SURVEY §4.2); pair fact and dimension tables on the same
  * key and bucket count.
  *
  * Z-ORDER clustering is the complementary read-side lever: bucketing
  * co-locates JOINS, z-ordering co-locates RANGE PREDICATES on several
  * columns at once. Sorting a table by one column gives parquet row-group
  * min/max stats that prune scans on that column only; interleaving the
  * bits of k bounded columns into one Morton code and sorting by it gives
  * every file a small bounding BOX over all k columns, so a predicate on
  * ANY of them skips most files. At 100 TB the difference between "scan
  * 2%" and "scan 100%" on the second predicate column is the whole game.
  */
object Layout {

  /** Write `df` as a bucketed + sorted managed parquet table. Joins and
    * groupBys on `keys` between tables sharing `buckets` then plan with no
    * Exchange (verified in LayoutSpec). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Hash-repartition by key columns — one explicit shuffle that several
    * subsequent same-key operations reuse (Catalyst recognizes the
    * partitioning and plans no further exchanges). */
  def colocate(df: DataFrame, partitions: Int, keys: Seq[String]): DataFrame =
    df.repartition(partitions, keys.map(org.apache.spark.sql.functions.col): _*)

  /** Morton (Z-order) code: interleave the low `bits` bits of each column —
    * bit i of column j lands at output position `i*k + j` — so lexicographic
    * order on the code is the Z-order space-filling curve over the k-dim
    * grid. Inputs must already be bounded in [0, 2^bits); see
    * [[boundedBucket]] for arbitrary ranges.
    *
    * Built from shift/mask/add primitives only (disjoint target bits make
    * `+` exactly bitwise-OR), so it stays inside whole-stage codegen and
    * any SQL engine can replay it — the q_zorder oracle does. */
  def mortonCode(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"mortonCode needs >= 2 columns, got ${cols.size}")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * columns must fit a signed long: got $bits * ${cols.size}")
    val k = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** Linear bucketing of `c` from [minV, maxV] onto the [0, 2^bits) grid a
    * [[mortonCode]] dimension needs; out-of-range values clamp to the edge
    * cells. min/max come from the caller (a metadata lookup or a cheap
    * agg), never computed here — at 100 TB you know your value bounds. */
  def boundedBucket(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(maxV > minV, s"need maxV > minV, got [$minV, $maxV]")
    require(bits > 0 && bits < 63, s"bits must be in (0, 63), got $bits")
    val cells = 1L << bits
    val scaled = floor((c.cast("double") - minV) / (maxV - minV + 1L) * cells).cast("long")
    least(greatest(scaled, lit(0L)), lit(cells - 1L))
  }

  /** Z-order-clustered parquet write: range-partition on the Morton code of
    * `zCols` (each already bucketed to [0, 2^bits)) and sort within each
    * partition by it, so every output file covers a small bounding box over
    * ALL the z dimensions and carries row-group min/max stats to match.
    * Range predicates on any z column then prune most files/row groups at
    * scan time (file-grain bounding boxes audited in LayoutSpec).
    *
    * One range exchange (sampled boundaries, AQE-friendly) + a local sort —
    * the write-once cost that buys every subsequent scan its skipping. The
    * morton column itself is not persisted; the layout, not the value, is
    * the point. */
  def zorderWrite(df: DataFrame, zCols: Seq[Column], bits: Int, path: String,
                  partitions: Int): Unit = {
    require(partitions > 0, s"partitions must be positive, got $partitions")
    df.withColumn("__z", mortonCode(zCols, bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet directory's small files into ~`targetFileMB` files —
    * the maintenance pass every incremental ingest eventually owes: a
    * micro-batched or per-batch-directory store accumulates files far below
    * the scan-efficient 128-256 MB band, and scan parallelism degrades into
    * per-file task overhead. Sizes the output from the ACTUAL on-disk bytes
    * (Hadoop FS listing, so compression is accounted for) and `coalesce`s —
    * no shuffle; partition merging only. Row order within merged files is
    * input-file order: a sorted layout (e.g. [[zorderWrite]]) should be
    * re-written through its own path instead, compaction would interleave
    * its carefully-bounded files.
    *
    * Reads from `path`, writes to `outPath` (must differ — never compact a
    * directory onto itself while something may read it; swap directories at
    * the orchestration layer).
    *
    * Hive-partitioned inputs (`key=value` subdirectories) are detected and
    * the layout PRESERVED: the output is written `partitionBy` the detected
    * keys (compacting `lang=en/` into unpartitioned files would drop the
    * partition pruning every reader relies on). Each partition value gets a
    * file budget proportional to its row share — realized as a salt column
    * in the repartition keys — so a large value neither funnels through one
    * writer task nor lands as one far-over-target file; this costs one
    * extra counting scan of the input (a maintenance pass already reading
    * everything). Partition-column TYPE INFERENCE is disabled for the
    * re-read so directory names round-trip byte-for-byte (`shard=007` stays
    * `shard=007`, not `shard=7` — readers re-infer types from the identical
    * names). The file-count target is per-layout approximate, not exact.
    *
    * @return the number of output files planned. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              outPath: String, targetFileMB: Int = 256): Int = {
    require(targetFileMB > 0, s"targetFileMB must be positive, got $targetFileMB")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // compare QUALIFIED paths: a trailing slash, relative spelling, or
    // scheme alias of the same directory must not slip past the guard —
    // overwriting the input truncates what the lazy read is scanning
    val qIn = fs.makeQualified(p)
    val qOut = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    val (inS, outS) = (qIn.toString + "/", qOut.toString + "/")
    require(!inS.startsWith(outS) && !outS.startsWith(inS),
      s"compact input and output must be disjoint directories ($qIn vs $qOut): " +
        "overwrite-to-self or a nested target truncates what the scan is reading")
    // a Hive-partitioned store announces itself as key=value first-level
    // dirs; nested partition levels repeat the pattern below them. Service
    // dirs (_temporary from a killed job, _spark_metadata from a streaming
    // writer, dot-prefixed) are NOT partition structure, and recursion must
    // follow a key=value dir specifically — descending into a service dir
    // would silently miss (and flatten) the deeper partition levels.
    def partKeys(dir: org.apache.hadoop.fs.Path): Seq[String] = {
      val sub = fs.listStatus(dir).filter(_.isDirectory)
        .map(_.getPath.getName)
        .filterNot(n => n.startsWith(".") || n.startsWith("_"))
      val eq = sub.filter(_.contains('='))
      val keys = eq.map(_.takeWhile(_ != '=')).distinct
      if (keys.length == 1 && keys.head.nonEmpty)
        keys.head +: partKeys(new org.apache.hadoop.fs.Path(dir, eq.head))
      else Seq.empty
    }
    val keys = partKeys(p)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val parts = math.max(1L, (bytes + targetFileMB * 1048576L - 1) / (targetFileMB * 1048576L)).toInt
    if (keys.isEmpty) {
      spark.read.parquet(path).coalesce(parts)
        .write.mode("overwrite").parquet(outPath)
      return parts
    }
    // inference off for the re-read: partition VALUES stay the exact
    // directory strings, so the rewritten layout round-trips names. The
    // toggle is scoped to a DEDICATED session (conf is otherwise
    // session-global — a concurrent query resolving a partitioned path
    // during the window would silently get string-typed partition columns);
    // sessions share the SparkContext, so the plan runs on the same
    // executors either way.
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val in = sess.read.parquet(path)
    // per-value file budget ∝ row share (one counting aggregation, keyed on
    // the partition values — bounded cardinality by construction), realized
    // as a salt in the repartition keys: a value with k files' worth of
    // rows spreads over k writer groups instead of one straggler task
    val keyCols = keys.map(col)
    val valueRows = in.groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
    val totalRows = math.max(1L,
      valueRows.agg(coalesce(sum(col("__cnt")), lit(0L))).first().getLong(0))
    val rowsPerFile = math.max(1L, (totalRows + parts - 1) / parts)
    val budget = valueRows.withColumn("__nf",
      greatest(lit(1L), round(col("__cnt").cast("double") / rowsPerFile).cast("long")))
      .drop("__cnt")
    // null-SAFE equality (<=>) per key: a null-value partition reads back
    // as `key=__HIVE_DEFAULT_PARTITION__` → null, and a plain equi-join
    // would silently drop every row of it — data loss in a maintenance op.
    // Aliased on both sides: budget derives from `in`, so unqualified key
    // refs would trip the ambiguous-self-join check.
    val joined = in.as("__cin")
      .join(broadcast(budget.as("__cbud")),
        keys.map(k => col(s"__cin.$k") <=> col(s"__cbud.$k")).reduce(_ && _))
      .select(col("__cin.*"), col("__cbud.__nf"))
    // salt derived from ROW CONTENT, not monotonically_increasing_id():
    // a retried shuffle-map task must reassign every row to the same
    // reduce partition it already landed in (SPARK-23207's hazard —
    // nondeterministic repartition keys duplicate or lose rows on stage
    // retry). Identical duplicate rows share a salt and co-locate; that
    // skews only degenerate all-duplicate data, and stays reproducible.
    joined
      .withColumn("__salt", pmod(xxhash64(in.columns.map(col): _*), col("__nf")))
      .repartition(parts, keyCols :+ col("__salt"): _*)
      .drop("__salt", "__nf")
      .write.mode("overwrite").partitionBy(keys: _*).parquet(outPath)
    parts
  }
}
