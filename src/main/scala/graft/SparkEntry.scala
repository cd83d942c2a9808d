package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` runs a Mongo-style pipeline through the Graft
  * engine (`Aggo.aggregate`) over the driver's TPC-H-ish parquet tables; the
  * paired `oracleSql` is the ANSI-SQL equivalent the driver executes in
  * DuckDB for the hash-match correctness gate. Column names and types are
  * aligned on both sides (casts in the SQL where DuckDB's result types
  * differ from Spark's). Double-valued aggregates are rounded identically on
  * both sides to absorb summation-order FP noise.
  */
object SparkEntry {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` normalized to epoch-microsecond LONG — the surface the
    * DuckDB oracle's `epoch_us(ts)` computes — regardless of how the test
    * generation encoded the column: TIMESTAMP(NANOS) parquet reads as
    * LongType nanos under `nanosAsLong` (integer div, no FP), TIMESTAMP
    * (MICROS) reads as TIMESTAMP_NTZ whose wall clock equals the UTC
    * instant under the UTC session timezone every entry point pins.
    * Type-directed at plan time, like the Mongo type dispatch. */
  private[graft] def eventsTsUs(ev: DataFrame): Column =
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast("timestamp"))
      case _ => unix_micros(col("ts"))
    }

  /** The events table with `ts_us` (epoch µs LONG) already derived. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
    ev.withColumn("ts_us", eventsTsUs(ev))
  }

  /** Expected logical type(s) of every dtype-sensitive testdata column.
    * The driver REGENERATES the parquet between rounds and encodings have
    * flipped before (events.ts TIMESTAMP(NANOS)→TIMESTAMP(MICROS) in r7);
    * a silently-changed encoding reads as garbage, not as an error. A set
    * lists exactly the encodings the type-directed plan code
    * ([[eventsTsUs]] and the date kernels) genuinely handles: timestamp
    * columns may arrive as NTZ micros, LTZ, or LongType nanos (under
    * `nanosAsLong`), nothing else. */
  private[graft] val expectedTypes: Map[String, Map[String, Set[String]]] = {
    val ts = Set("timestamp_ntz", "timestamp", "bigint")
    Map(
      "region" -> Map("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
      "nation" -> Map("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
        "n_regionkey" -> Set("int")),
      "customer" -> Map("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
        "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
        "c_mktsegment" -> Set("string")),
      "supplier" -> Map("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
        "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
      "part" -> Map("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
        "p_brand" -> Set("string"), "p_type" -> Set("string"),
        "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
      "orders" -> Map("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
        "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
        "o_orderdate" -> ts, "o_orderpriority" -> Set("string")),
      "lineitem" -> Map("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
        "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
        "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
        "l_discount" -> Set("double"), "l_tax" -> Set("double"),
        "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
        "l_shipdate" -> ts),
      "events" -> Map("event_id" -> Set("bigint"), "ts" -> ts,
        "user_id" -> Set("bigint"), "event_type" -> Set("string"),
        "value" -> Set("double"), "props" -> Set("string")),
      "documents" -> Map("doc_id" -> Set("bigint"), "text" -> Set("string"),
        "lang" -> Set("string"), "source" -> Set("string"),
        "n_chars" -> Set("bigint")),
      "embeddings" -> Map("vec_id" -> Set("bigint"),
        "embedding" -> Set("array<float>"), "label" -> Set("int")))
  }

  /** Assert the (driver-regenerated) testdata still carries the logical
    * types the dtype-sensitive plans assume, BEFORE any gate runs — a
    * flipped encoding then fails as one named table.column diff instead of
    * 157 cryptic oracle mismatches. Missing tables are skipped (local
    * scratch dirs may be partial); extra columns are fine (only the listed
    * columns are contract). A LongType `events.ts` is additionally
    * magnitude-gated: epoch-NANOS for any modern date are ~1e18, so a
    * bigint ts whose max |value| is under 1e16 is some OTHER unit (micros
    * or millis written as a plain BIGINT — a third plausible generator
    * encoding) and [[eventsTsUs]]'s `div 1000` would silently shift every
    * timestamp 1000× — fail loudly instead. */
  private[graft] def preflight(spark: SparkSession, dir: String): Unit = {
    val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
    expectedTypes.toSeq.sortBy(_._1).foreach { case (table, cols) =>
      val f = new java.io.File(s"$dir/$table.parquet")
      if (f.exists()) {
        val schema = spark.read.parquet(f.getPath).schema
        cols.toSeq.sortBy(_._1).foreach { case (name, allowed) =>
          schema.find(_.name == name) match {
            case None =>
              diffs += s"$table.$name: MISSING (expected ${allowed.mkString("/")})"
            case Some(fld) =>
              val got = fld.dataType.simpleString
              if (!allowed.contains(got))
                diffs += s"$table.$name: got $got, expected ${allowed.mkString("/")}"
          }
        }
      }
    }
    val evFile = new java.io.File(s"$dir/events.parquet")
    if (evFile.exists() && !diffs.exists(_.startsWith("events.ts"))) {
      val ev = spark.read.parquet(evFile.getPath)
      if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
        val mx = ev.agg(max(abs(col("ts")))).head.getLong(0)
        if (mx < 10000000000000000L) // 1e16: nanos for any date past 1970-04
          diffs += s"events.ts: LongType with max |value| $mx is not epoch-nanos " +
            "(plain-BIGINT micros/millis?) — eventsTsUs would shift every timestamp"
      }
    }
    if (diffs.nonEmpty)
      throw new IllegalStateException(
        s"testdata schema preflight FAILED for $dir:\n  ${diffs.mkString("\n  ")}")
  }

  /** Deterministic messy URL for the canonicalization gates: even ids get an
    * uppercase scheme/host + userinfo, ports rotate default/non-default on
    * doc_id%4, tracking params and param order rotate on doc_id%3, every 5th
    * URL carries a fragment, and the path collides mod 50. */
  private def synthUrl: Column = concat(
    when(col("doc_id") % 2 === 0, lit("HTTP://user:pw@WWW.Site")).otherwise(lit("https://www.site")),
    lit(".example.org"),
    when(col("doc_id") % 4 === 0, lit(":80"))
      .when(col("doc_id") % 4 === 1, lit(":443"))
      .when(col("doc_id") % 4 === 2, lit(":8080"))
      .otherwise(lit("")),
    lit("/P/"), (col("doc_id") % 50).cast("string"),
    when(col("doc_id") % 3 === 0, lit("?utm_source=news&b=2&a=1"))
      .when(col("doc_id") % 3 === 1, lit("?a=1&b=2&fbclid=xyz"))
      .otherwise(lit("")),
    when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))

  /** Run the documents corpus through the STREAMING curated-ingest sink in
    * four ascending-doc_id micro-batches and hand back `(store, receipts)`
    * as batch frames — the execution behind q_stream_curate /
    * q_stream_funnel. The corpus is collected to feed the in-memory
    * source: bounded by the documents table (500 rows at the oracle SF),
    * the same documented posture as the other bounded oracle tiers; the
    * sink itself never collects. Chunks are ascending so the store's
    * surviving ids are deterministic (min id per content) regardless of
    * micro-batch timing. */
  private def streamCurateGate(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = tbl(spark, dir, "documents").select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val base = java.nio.file.Files.createTempDirectory("graft-stream-gate").toString
    val store = s"$base/store/docs"
    val funnel = s"$base/funnel"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.GraftStreaming.curatedIngestSink(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", store,
      s"$base/ckpt", minQuality = 0.6, funnelPath = Some(funnel))
    try {
      docs.grouped(math.max(1, (docs.length + 3) / 4)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    (graft.ext.Dedup.readStore(spark, store), spark.read.parquet(funnel))
  }

  /** Run a CONSTRUCTED near-dup corpus through the streaming incremental
    * dedup sink with the near (MinHash/LSH) tier ON, in four ascending
    * micro-batches — the execution behind q_stream_neardup. Determinism by
    * construction: every planted near-dup group consists of raw-DISTINCT
    * texts with IDENTICAL token sequences (separator/punctuation variants),
    * so their shingle sets are equal — Jaccard is exactly 1.0 (always above
    * threshold) and their MinHash signatures are bit-identical (every band
    * collides, so LSH candidate generation cannot probabilistically miss) —
    * while distinct contents use disjoint token vocabularies (Jaccard 0,
    * so a stray band collision dies in the exact verify). With ascending
    * batches the survivor of each group is its minimum doc_id whether the
    * group lands in one batch (in-batch pair drop keeps the min) or across
    * batches (cross-store drop kills later arrivals) — which DuckDB replays
    * as min(doc_id) per \W+-normalized text. One exact-duplicate variant
    * per group also exercises the exact tier in front. Texts derive only
    * from doc_id, so the oracle reconstructs the identical corpus. */
  /** The deterministic near-dup corpus both store gates construct from
    * doc_id alone (so DuckDB can rebuild it): groups of 5 ids where v0/v1
    * are exact duplicates, v2/v3 raw-distinct but token-identical
    * separator variants (shingle sets equal → Jaccard exactly 1.0, MinHash
    * signatures bit-identical → LSH cannot probabilistically miss), and v4
    * a disjoint vocabulary (Jaccard 0 — a stray band collision dies in the
    * exact verify). */
  private def neardupGateText(id: Long): String = {
    val g = id / 5
    val base = (0 until 12).map(k => s"t${g * 31 + k}")
    val alt = (0 until 8).map(k => s"t${g * 31 + 12 + k}")
    (id % 5) match {
      case 0 | 1 => base.mkString(" ")     // v1 = exact duplicate of v0
      case 2     => base.mkString(", ")    // raw-distinct, token-identical
      case 3     => base.mkString(" -- ")  // raw-distinct, token-identical
      case _     => alt.mkString(" ")      // distinct vocabulary: survives
    }
  }

  private def streamNeardupGate(spark: SparkSession, dir: String): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ids = tbl(spark, dir, "documents").select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    val docs = ids.map(id => (id, neardupGateText(id)))
    val base = java.nio.file.Files.createTempDirectory("graft-neardup-gate").toString
    val store = s"$base/store/docs"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.GraftStreaming.incrementalDedupSink(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", store,
      s"$base/ckpt", nearThreshold = Some(0.9))
    try {
      docs.grouped(math.max(1, (docs.length + 3) / 4)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // same scratch hygiene as q_merge_upsert: materialize off the store,
    // delete the gate's temp tree eagerly
    val out = graft.ext.Dedup.spill(
      graft.ext.Dedup.readStore(spark, store).select(col("doc_id")),
      "graft-neardup-out")
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    out
  }

  private def run(table: String, pipeline: String, extra: Seq[String] = Nil)(
      spark: SparkSession, dir: String): DataFrame = {
    val colls = (extra :+ table).map(n => n -> tbl(spark, dir, n)).toMap
    Aggo.aggregate(tbl(spark, dir, table), pipeline, colls)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The README flagship shape (reference README.md:13-19): match → group
    * with $sum of $multiply → sort → limit. */
  def entry(spark: SparkSession): DataFrame =
    run("lineitem",
      """[
        {"$match": {"l_quantity": {"$gte": 10}}},
        {"$group": {"_id": "$l_returnflag",
                    "revenue": {"$sum": {"$multiply": ["$l_extendedprice", {"$subtract": [1, "$l_discount"]}]}},
                    "n": {"$sum": 1}}},
        {"$sort": {"revenue": -1}},
        {"$limit": 5}
      ]""")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- $match operators (SURVEY §2.3) ----
    "q_match_basic" -> run("lineitem",
      """[
        {"$match": {"l_returnflag": "R", "l_quantity": {"$gte": 30}, "l_discount": {"$lt": 0.05}}},
        {"$project": {"l_orderkey": 1, "l_linenumber": 1, "l_quantity": 1, "l_discount": 1}}
      ]"""),
    "q_match_in" -> run("lineitem",
      """[
        {"$match": {"l_returnflag": {"$in": ["A", "N"]}, "l_linestatus": {"$ne": "F"}, "l_quantity": {"$gt": 45}}},
        {"$project": {"l_orderkey": 1, "l_returnflag": 1, "l_linestatus": 1, "l_quantity": 1}}
      ]"""),
    "q_match_regex" -> run("part",
      """[
        {"$match": {"p_name": {"$regex": "ol", "$options": "i"}}},
        {"$project": {"p_partkey": 1, "p_name": 1}}
      ]"""),
    "q_match_or" -> run("orders",
      """[
        {"$match": {"$or": [{"o_orderstatus": "F", "o_totalprice": {"$gt": 300000}},
                            {"o_orderpriority": "1-URGENT"}]}},
        {"$project": {"o_orderkey": 1, "o_orderstatus": 1, "o_totalprice": 1, "o_orderpriority": 1}}
      ]"""),
    "q_match_expr" -> run("lineitem",
      """[
        {"$match": {"$expr": {"$gt": ["$l_discount", "$l_tax"]}}},
        {"$project": {"l_orderkey": 1, "l_linenumber": 1, "l_discount": 1, "l_tax": 1}}
      ]"""),
    "q_match_nor" -> run("orders",
      """[
        {"$match": {"$nor": [{"o_orderstatus": "F"}, {"o_totalprice": {"$lt": 100000}}]}},
        {"$project": {"o_orderkey": 1, "o_orderstatus": 1, "o_totalprice": 1}}
      ]"""),

    // ---- $project / expression operators (SURVEY §2.5) ----
    "q_project_arith" -> run("lineitem",
      """[
        {"$project": {"l_orderkey": 1, "l_linenumber": 1,
          "revenue": {"$round": [{"$multiply": ["$l_extendedprice", {"$subtract": [1, "$l_discount"]}]}, 2]},
          "charge": {"$round": [{"$multiply": ["$l_extendedprice", {"$subtract": [1, "$l_discount"]}, {"$add": [1, "$l_tax"]}]}, 2]},
          "unit": {"$round": [{"$divide": ["$l_extendedprice", "$l_quantity"]}, 2]},
          "qmod": {"$mod": [{"$floor": "$l_quantity"}, 7]},
          "qabs": {"$abs": {"$subtract": ["$l_quantity", 25]}},
          "qsqrt": {"$round": [{"$sqrt": "$l_quantity"}, 4]},
          "qpow": {"$pow": ["$l_discount", 2]}}}
      ]"""),
    "q_project_string" -> run("customer",
      """[
        {"$project": {"c_custkey": 1,
          "name_upper": {"$toUpper": "$c_name"},
          "name_len": {"$strLen": "$c_name"},
          "name_sub": {"$substr": ["$c_name", 0, 8]},
          "tagged": {"$concat": ["cust:", "$c_name", ":", {"$toString": "$c_custkey"}]},
          "seg_lower": {"$toLower": "$c_mktsegment"},
          "trimmed": {"$trim": {"input": {"$concat": ["  ", "$c_mktsegment", "  "]}}}}}
      ]"""),
    "q_project_date" -> run("orders",
      """[
        {"$project": {"o_orderkey": 1,
          "y": {"$year": "$o_orderdate"}, "m": {"$month": "$o_orderdate"},
          "d": {"$dayOfMonth": "$o_orderdate"}, "dow": {"$dayOfWeek": "$o_orderdate"},
          "doy": {"$dayOfYear": "$o_orderdate"}, "wk": {"$week": "$o_orderdate"},
          "ds": {"$dateToString": {"format": "%Y-%m-%d", "date": "$o_orderdate"}}}}
      ]"""),
    "q_project_cond" -> run("lineitem",
      """[
        {"$project": {"l_orderkey": 1, "l_linenumber": 1,
          "disc_class": {"$cond": [{"$gte": ["$l_discount", 0.05]}, "high", "low"]},
          "flag_desc": {"$switch": {"branches": [
              {"case": {"$eq": ["$l_returnflag", "A"]}, "then": "accepted"},
              {"case": {"$eq": ["$l_returnflag", "R"]}, "then": "returned"}],
            "default": "none"}},
          "qty_or_zero": {"$ifNull": ["$l_quantity", 0]},
          "cmp_disc_tax": {"$cmp": ["$l_discount", "$l_tax"]}}}
      ]"""),
    "q_addfields" -> run("supplier",
      """[
        {"$addFields": {"acct_rounded": {"$round": ["$s_acctbal", 0]},
                        "is_positive": {"$gt": ["$s_acctbal", 0]},
                        "acct_bucket": {"$floor": {"$divide": ["$s_acctbal", 1000]}}}},
        {"$project": {"s_suppkey": 1, "acct_rounded": 1, "is_positive": 1, "acct_bucket": 1}}
      ]"""),

    // ---- $group accumulators (SURVEY §2.4) ----
    "q_group_basic" -> run("lineitem",
      """[
        {"$match": {"l_shipdate": {"$lte": "1998-09-01"}}},
        {"$group": {"_id": {"rf": "$l_returnflag", "ls": "$l_linestatus"},
          "sum_qty": {"$sum": "$l_quantity"},
          "sum_base": {"$sum": "$l_extendedprice"},
          "avg_qty": {"$avg": "$l_quantity"},
          "avg_price": {"$avg": "$l_extendedprice"},
          "min_q": {"$min": "$l_quantity"},
          "max_q": {"$max": "$l_quantity"},
          "n": {"$sum": 1}}},
        {"$project": {"rf": "$_id.rf", "ls": "$_id.ls",
          "sum_qty": {"$round": ["$sum_qty", 2]}, "sum_base": {"$round": ["$sum_base", 2]},
          "avg_qty": {"$round": ["$avg_qty", 4]}, "avg_price": {"$round": ["$avg_price", 4]},
          "min_q": 1, "max_q": 1, "n": 1, "_id": 0}}
      ]"""),
    "q_group_date" -> run("orders",
      """[
        {"$group": {"_id": {"y": {"$year": "$o_orderdate"}, "m": {"$month": "$o_orderdate"}},
          "n": {"$sum": 1}, "total": {"$sum": "$o_totalprice"}}},
        {"$project": {"y": "$_id.y", "m": "$_id.m", "n": 1,
          "total": {"$round": ["$total", 2]}, "_id": 0}}
      ]"""),
    "q_group_stats" -> run("lineitem",
      """[
        {"$group": {"_id": "$l_returnflag",
          "sd_pop": {"$stdDevPop": "$l_extendedprice"},
          "sd_samp": {"$stdDevSamp": "$l_extendedprice"},
          "v_pop": {"$variancePop": "$l_extendedprice"},
          "v_samp": {"$varianceSamp": "$l_extendedprice"}}},
        {"$project": {"rf": "$_id",
          "sd_pop": {"$round": ["$sd_pop", 2]}, "sd_samp": {"$round": ["$sd_samp", 2]},
          "v_pop": {"$round": ["$v_pop", 0]}, "v_samp": {"$round": ["$v_samp", 0]}, "_id": 0}}
      ]"""),
    // Array/struct outputs are serialized to delimited strings so the
    // driver's pandas comparator (which sorts output columns) can hash them;
    // the paired oracle SQL mirrors with array_to_string/to_json.
    "q_group_addtoset" -> ((s: SparkSession, d: String) =>
      run("orders",
        """[
          {"$group": {"_id": "$o_orderpriority",
            "statuses": {"$addToSet": "$o_orderstatus"},
            "n": {"$sum": 1}}},
          {"$project": {"prio": "$_id", "statuses": 1, "n": 1, "_id": 0}}
        ]""")(s, d)
        .withColumn("statuses", array_join(col("statuses"), "|"))),
    "q_group_push" -> ((s: SparkSession, d: String) =>
      run("orders",
        """[
          {"$match": {"o_totalprice": {"$gt": 450000}}},
          {"$sort": {"o_orderkey": 1}},
          {"$group": {"_id": "$o_orderstatus", "keys": {"$push": "$o_orderkey"}, "n": {"$sum": 1}}},
          {"$project": {"status": "$_id", "keys": 1, "n": 1, "_id": 0}}
        ]""")(s, d)
        .withColumn("keys", expr("array_join(transform(keys, x -> cast(x as string)), '|')"))),
    "q_group_firstlast" -> run("orders",
      """[
        {"$sort": {"o_orderdate": 1, "o_orderkey": 1}},
        {"$group": {"_id": "$o_orderstatus",
          "first_key": {"$first": "$o_orderkey"}, "last_key": {"$last": "$o_orderkey"},
          "first_date": {"$first": {"$dateToString": {"format": "%Y-%m-%d", "date": "$o_orderdate"}}}}},
        {"$project": {"status": "$_id", "first_key": 1, "last_key": 1, "first_date": 1, "_id": 0}}
      ]"""),
    "q_count" -> run("orders",
      """[
        {"$match": {"o_orderstatus": "F"}},
        {"$count": "n"}
      ]"""),
    "q_sortbycount" -> run("orders",
      """[
        {"$sortByCount": "$o_orderpriority"},
        {"$project": {"prio": "$_id", "count": 1, "_id": 0}}
      ]"""),

    // ---- $sort / $limit / $skip (SURVEY §2.2) ----
    "q_sort_limit" -> run("lineitem",
      """[
        {"$sort": {"l_extendedprice": -1, "l_orderkey": 1, "l_linenumber": 1}},
        {"$limit": 10},
        {"$project": {"l_orderkey": 1, "l_linenumber": 1, "l_extendedprice": 1}}
      ]"""),
    "q_skip_limit" -> run("orders",
      """[
        {"$sort": {"o_orderkey": 1}},
        {"$skip": 100},
        {"$limit": 20},
        {"$project": {"o_orderkey": 1, "o_totalprice": 1}}
      ]"""),

    // ---- $unwind (SURVEY §2.2) ----
    "q_unwind" -> run("part",
      """[
        {"$project": {"p_partkey": 1, "words": {"$split": ["$p_type", " "]}}},
        {"$unwind": "$words"},
        {"$group": {"_id": "$words", "n": {"$sum": 1}}},
        {"$project": {"word": "$_id", "n": 1, "_id": 0}}
      ]"""),
    // deep nested path: build s.a.words, unwind at depth 3
    "q_unwind_nested" -> run("part",
      """[
        {"$project": {"p_partkey": 1, "s.a.words": {"$split": ["$p_type", " "]}}},
        {"$unwind": "$s.a.words"},
        {"$project": {"p_partkey": 1, "w": "$s.a.words"}}
      ]"""),
    "q_unwind_chain" -> ((s: SparkSession, d: String) =>
      run("part",
        """[
          {"$match": {"p_partkey": {"$lte": 200}}},
          {"$project": {"p_partkey": 1, "a": {"$split": ["$p_name", " "]}, "b": {"$split": ["$p_type", " "]}}},
          {"$unwind": "$a"},
          {"$unwind": "$b"},
          {"$group": {"_id": "$p_partkey", "pairs": {"$push": {"$concat": ["$a", "-", "$b"]}}}},
          {"$project": {"p_partkey": "$_id", "pairs": 1, "_id": 0}}
        ]""")(s, d)
        .withColumn("pairs", expr("array_join(pairs, '|')"))),
    "q_unwind_idx" -> run("part",
      """[
        {"$project": {"p_partkey": 1, "words": {"$split": ["$p_type", " "]}}},
        {"$unwind": {"path": "$words", "includeArrayIndex": "idx"}},
        {"$project": {"p_partkey": 1, "idx": 1, "words": 1}}
      ]"""),

    // ---- $lookup (SURVEY §2.2) ----
    "q_lookup_unwind" -> run("orders",
      """[
        {"$lookup": {"from": "customer", "localField": "o_custkey", "foreignField": "c_custkey", "as": "cust"}},
        {"$unwind": {"path": "$cust", "preserveNullAndEmptyArrays": true}},
        {"$project": {"o_orderkey": 1, "o_custkey": 1, "cname": "$cust.c_name", "cbal": "$cust.c_acctbal"}}
      ]""", extra = Seq("customer")),
    "q_lookup_agg" -> run("customer",
      """[
        {"$lookup": {"from": "orders", "localField": "c_custkey", "foreignField": "o_custkey", "as": "ords"}},
        {"$project": {"c_custkey": 1,
          "n_orders": {"$size": "$ords"},
          "total": {"$round": [{"$sum": {"$map": {"input": "$ords", "as": "o", "in": "$$o.o_totalprice"}}}, 2]}}}
      ]""", extra = Seq("orders")),
    "q_lookup_pipeline" -> run("customer",
      """[
        {"$lookup": {"from": "orders", "let": {"ck": "$c_custkey"},
          "pipeline": [
            {"$match": {"$expr": {"$and": [{"$eq": ["$$ck", "$o_custkey"]},
                                            {"$gt": ["$o_totalprice", 200000]}]}}},
            {"$sort": {"o_totalprice": -1}},
            {"$limit": 3}],
          "as": "top"}},
        {"$unwind": "$top"},
        {"$project": {"c_custkey": 1, "okey": "$top.o_orderkey", "oprice": "$top.o_totalprice"}}
      ]""", extra = Seq("orders")),

    // ---- array / set expression operators (SURVEY §2.5) ----
    "q_array_ops" -> ((s: SparkSession, d: String) =>
      run("part",
        """[
          {"$project": {"p_partkey": 1,
            "nwords": {"$size": {"$split": ["$p_type", " "]}},
            "long_words": {"$filter": {"input": {"$split": ["$p_type", " "]}, "as": "w",
                                       "cond": {"$gte": [{"$strLen": "$$w"}, 6]}}},
            "upper_words": {"$map": {"input": {"$split": ["$p_type", " "]}, "as": "w",
                                     "in": {"$toUpper": "$$w"}}},
            "first2": {"$slice": [{"$split": ["$p_type", " "]}, 2]},
            "last_word": {"$arrayElemAt": [{"$split": ["$p_type", " "]}, -1]},
            "rev": {"$reverseArray": {"$split": ["$p_type", " "]}},
            "has_brass": {"$in": ["BRASS", {"$split": ["$p_type", " "]}]},
            "idx_steel": {"$indexOfArray": [{"$split": ["$p_type", " "]}, "STEEL"]}}}
        ]""")(s, d)
        .withColumn("long_words", array_join(col("long_words"), "|"))
        .withColumn("upper_words", array_join(col("upper_words"), "|"))
        .withColumn("first2", array_join(col("first2"), "|"))
        .withColumn("rev", array_join(col("rev"), "|"))),
    "q_set_ops" -> ((s: SparkSession, d: String) =>
      run("part",
        """[
          {"$project": {"p_partkey": 1,
            "inter": {"$setIntersection": [{"$split": ["$p_type", " "]}, {"$split": ["$p_name", " "]}]},
            "uni": {"$setUnion": [{"$split": ["$p_type", " "]}, {"$split": ["$p_name", " "]}]},
            "diff": {"$setDifference": [{"$split": ["$p_type", " "]}, {"$split": ["$p_name", " "]}]},
            "subset": {"$setIsSubset": [{"$split": ["$p_type", " "]}, {"$split": ["$p_name", " "]}]}}}
        ]""")(s, d)
        .withColumn("inter", array_join(col("inter"), "|"))
        .withColumn("uni", array_join(col("uni"), "|"))
        .withColumn("diff", array_join(col("diff"), "|"))),
    "q_reduce" -> run("part",
      """[
        {"$project": {"p_partkey": 1,
          "joined": {"$reduce": {"input": {"$split": ["$p_type", " "]},
                                 "initialValue": "",
                                 "in": {"$concat": ["$$value", "|", "$$this"]}}}}}
      ]"""),

    // ---- $text search (SURVEY §2.3) ----
    "q_text_search" -> run("documents",
      """[
        {"$match": {"$text": {"$search": "spark query window"}}},
        {"$group": {"_id": "$lang", "n": {"$sum": 1}}},
        {"$project": {"lang": "$_id", "n": 1, "_id": 0}}
      ]"""),

    // ---- more $match / expression parity (SURVEY §2.3, §2.5) ----
    "q_match_array" -> ((s: SparkSession, d: String) =>
      run("part",
        """[
          {"$project": {"p_partkey": 1, "w": {"$split": ["$p_name", " "]}}},
          {"$match": {"w": {"$size": 2, "$all": ["small"], "$elemMatch": {"$regex": "^(r|b)"}}}}
        ]""")(s, d)
        .withColumn("w", array_join(col("w"), "|"))),
    "q_match_exists" -> run("supplier",
      """[
        {"$match": {"s_name": {"$exists": true}, "bogus_field": {"$exists": false},
                    "s_acctbal": {"$not": {"$lt": 0}}, "s_suppkey": {"$mod": [4, 1]}}},
        {"$project": {"s_suppkey": 1, "s_name": 1, "s_acctbal": 1}}
      ]"""),
    "q_type_ops" -> ((s: SparkSession, d: String) =>
      run("customer",
        """[
          {"$project": {"c_custkey": 1,
            "t_num": {"$type": "$c_acctbal"}, "t_str": {"$type": "$c_name"},
            "is_num": {"$isNumber": "$c_acctbal"},
            "as_int": {"$toInt": {"$floor": "$c_acctbal"}},
            "lit_obj": {"$literal": {"a": 1, "b": "x"}},
            "rng": {"$range": [0, 3]}}}
        ]""")(s, d)
        .withColumn("lit_obj", to_json(col("lit_obj")))
        .withColumn("rng", expr("array_join(transform(rng, x -> cast(x as string)), '|')"))),
    "q_mergeobjects" -> run("customer",
      """[
        {"$project": {"m": {"$mergeObjects": [
            {"a": "$c_custkey", "b": "$c_name"},
            {"b": "$c_mktsegment", "c": 1}]}}},
        {"$project": {"a": "$m.a", "b": "$m.b", "c": "$m.c"}}
      ]"""),
    "q_replaceroot" -> run("customer",
      """[
        {"$replaceRoot": {"newRoot": {"k": "$c_custkey", "n": {"$toUpper": "$c_name"}}}}
      ]"""),
    "q_group_nullid" -> run("orders",
      """[
        {"$group": {"_id": null, "n": {"$sum": 1}, "t": {"$sum": "$o_totalprice"}}},
        {"$project": {"n": 1, "t": {"$round": ["$t", 2]}, "_id": 0}}
      ]"""),
    "q_lookup_nomatch" -> run("orders",
      """[
        {"$lookup": {"from": "customer", "localField": "o_orderkey", "foreignField": "c_custkey", "as": "m"}},
        {"$unwind": {"path": "$m", "preserveNullAndEmptyArrays": true}},
        {"$project": {"o_orderkey": 1, "ck": "$m.c_custkey"}}
      ]""", extra = Seq("customer")),

    // ---- window functions ($setWindowFields extension, SURVEY §2.6) ----
    "q_window" -> run("orders",
      """[
        {"$setWindowFields": {"partitionBy": "$o_custkey",
          "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
          "output": {
            "rnk": {"$documentNumber": {}},
            "running": {"$sum": "$o_totalprice", "window": {"documents": ["unbounded", "current"]}},
            "prev_price": {"$shift": {"output": "$o_totalprice", "by": -1, "default": -1}}}}},
        {"$project": {"o_orderkey": 1, "o_custkey": 1, "rnk": 1,
                      "running": {"$round": ["$running", 2]}, "prev_price": 1}}
      ]"""),
    "q_events_window" -> ((spark: SparkSession, dir: String) => {
      // the DuckDB oracle truncates ts to µs on read, so the comparison
      // surface is epoch-µs integers (see eventsTsUs for the encoding dance)
      val ev = events(spark, dir)
      Aggo.aggregate(ev,
        """[
          {"$setWindowFields": {"partitionBy": "$user_id",
            "sortBy": {"ts_us": 1, "event_id": 1},
            "output": {
              "rn": {"$documentNumber": {}},
              "prev_value": {"$shift": {"output": "$value", "by": -1}}}}},
          {"$project": {"user_id": 1, "event_id": 1, "ts_us": 1, "rn": 1, "prev_value": 1}}
        ]""")
    }),

    // ---- collection set ops / buckets (extensions) ----
    "q_union" -> run("customer",
      """[
        {"$project": {"name": "$c_name", "k": "$c_custkey"}},
        {"$unionWith": {"coll": "supplier", "pipeline": [
          {"$project": {"name": "$s_name", "k": "$s_suppkey"}}]}}
      ]""", extra = Seq("supplier")),
    "q_bucket" -> run("customer",
      """[
        {"$bucket": {"groupBy": "$c_acctbal",
          "boundaries": [-1000, 0, 2000, 4000, 6000, 8000],
          "default": 99999,
          "output": {"n": {"$sum": 1}, "avg_bal": {"$avg": "$c_acctbal"}}}},
        {"$project": {"bucket": "$_id", "n": 1, "avg_bal": {"$round": ["$avg_bal", 4]}, "_id": 0}}
      ]"""),
    "q_bucketauto_str" -> ((s: SparkSession, d: String) =>
      run("part",
        """[
          {"$bucketAuto": {"groupBy": "$p_brand", "buckets": 5,
            "output": {"n": {"$sum": 1}, "tot": {"$sum": "$p_retailprice"}}}}
        ]""")(s, d)
        .select(col("_id").getField("min").as("lo"), col("_id").getField("max").as("hi"),
          col("n"), expr("round(tot, 2)").as("tot"))),
    "q_sample" -> run("orders",
      """[
        {"$project": {"o_orderkey": 1, "o_custkey": 1, "_id": 0}},
        {"$sample": {"size": 25}}
      ]"""),
    "q_facet" -> ((s: SparkSession, d: String) =>
      run("orders",
        """[
          {"$facet": {
            "by_status": [{"$group": {"_id": "$o_orderstatus", "n": {"$sum": 1}}},
                           {"$sort": {"_id": 1}}],
            "top_orders": [{"$sort": {"o_totalprice": -1, "o_orderkey": 1}}, {"$limit": 3},
                            {"$project": {"o_orderkey": 1, "o_totalprice": 1}}]}}
        ]""")(s, d)
        .select(
          expr("array_join(transform(by_status, x -> concat(x._id, ':', cast(x.n as string))), '|')")
            .as("by_status"),
          expr("array_join(transform(top_orders, x -> concat(cast(x.o_orderkey as string), ':', " +
            "cast(cast(floor(x.o_totalprice * 100 + 0.5) as bigint) as string))), '|')")
            .as("top_orders"))),

    // ---- date arithmetic ($dateAdd/$dateSubtract/$dateDiff/$dateTrunc) ----
    "q_date_ops" -> run("orders",
      """[
        {"$project": {"o_orderkey": 1,
          "plus_m": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S", "date":
            {"$dateAdd": {"startDate": "$o_orderdate", "unit": "month", "amount": 2}}}},
          "minus_d": {"$dateToString": {"format": "%Y-%m-%d", "date":
            {"$dateSubtract": {"startDate": "$o_orderdate", "unit": "day", "amount": 45}}}},
          "dd": {"$dateDiff": {"startDate": {"$dateFromString": {"dateString": "1995-06-15"}},
                               "endDate": "$o_orderdate", "unit": "day"}},
          "md": {"$dateDiff": {"startDate": {"$dateFromString": {"dateString": "1995-06-15"}},
                               "endDate": "$o_orderdate", "unit": "month"}},
          "tm": {"$dateToString": {"format": "%Y-%m-%d", "date":
            {"$dateTrunc": {"date": "$o_orderdate", "unit": "month"}}}},
          "tw": {"$dateToString": {"format": "%Y-%m-%d", "date":
            {"$dateTrunc": {"date": "$o_orderdate", "unit": "week"}}}}}}
      ]"""),

    "q_iso_dates" -> run("orders",
      """[
        {"$project": {"o_orderkey": 1,
          "iw": {"$isoWeek": "$o_orderdate"},
          "idow": {"$isoDayOfWeek": "$o_orderdate"},
          "iwy": {"$isoWeekYear": "$o_orderdate"},
          "hyp": {"$let": {"vars": {"k2": {"$multiply": ["$o_orderkey", 2]}},
                           "in": {"$add": ["$$k2", 1]}}}}}
      ]"""),

    // ---- regex find / percentile / top-bottom accumulators ----
    "q_regex_find" -> ((s: SparkSession, d: String) =>
      run("customer",
        """[
          {"$project": {"c_custkey": 1,
            "m": {"$getField": {"input": {"$regexFind": {"input": "$c_name", "regex": "[0-9]+"}}, "field": "match"}},
            "i": {"$getField": {"input": {"$regexFind": {"input": "$c_name", "regex": "[0-9]+"}}, "field": "idx"}},
            "cap": {"$getField": {"input": {"$regexFind": {"input": "$c_name", "regex": "Customer#([0-9]+)"}}, "field": "captures"}},
            "all_m": {"$regexFindAll": {"input": "$c_name", "regex": "[0-9]+"}}}}
        ]""")(s, d)
        .withColumn("cap", array_join(col("cap"), "|"))
        .withColumn("all_m", expr("array_join(transform(all_m, x -> x.match), '|')"))),
    "q_percentile" -> ((s: SparkSession, d: String) =>
      run("lineitem",
        """[
          {"$group": {"_id": "$l_returnflag",
            "med": {"$median": {"input": "$l_quantity"}},
            "pct": {"$percentile": {"input": "$l_quantity", "p": [0.25, 0.5, 0.9]}}}},
          {"$project": {"rf": "$_id", "med": 1, "pct": 1, "_id": 0}}
        ]""")(s, d)
        .withColumn("med", expr("floor(med * 1000000 + 0.5) / 1000000"))
        .withColumn("pct", expr(
          "array_join(transform(pct, x -> cast(floor(x * 1000000 + 0.5) / 1000000 as string)), '|')"))),
    "q_top_bottom" -> ((s: SparkSession, d: String) =>
      run("orders",
        """[
          {"$group": {"_id": "$o_orderstatus",
            "top_key": {"$top": {"output": "$o_orderkey", "sortBy": {"o_totalprice": -1}}},
            "bot_key": {"$bottom": {"output": "$o_orderkey", "sortBy": {"o_totalprice": -1}}},
            "top3": {"$topN": {"output": "$o_orderkey", "sortBy": {"o_totalprice": -1}, "n": 3}}}},
          {"$project": {"status": "$_id", "top_key": 1, "bot_key": 1, "top3": 1, "_id": 0}}
        ]""")(s, d)
        .withColumn("top3", expr("array_join(transform(top3, x -> cast(x as string)), '|')"))),

    // ---- $linearFill window interpolation over events ----
    "q_linear_fill" -> ((spark: SparkSession, dir: String) => {
      val ev = events(spark, dir)
        .withColumn("v", when(col("value") < 5, lit(null)).otherwise(col("value")))
      Aggo.aggregate(ev,
        """[
          {"$setWindowFields": {"partitionBy": "$user_id", "sortBy": {"ts_us": 1, "event_id": 1},
            "output": {"vf": {"$linearFill": "$v"}}}},
          {"$project": {"user_id": 1, "event_id": 1, "vf": 1}}
        ]""").withColumn("vf", expr("floor(vf * 1000000 + 0.5) / 1000000"))
    }),

    // ---- heterogeneous/MIXED-type fields (SURVEY §7.4.1) ----
    // Build JSONL where `v` is a number on even doc_ids and a string on odd
    // ones, run it through real schema inference (widen-to-string policy),
    // and exercise $type/$sort/$match over the widened column.
    "q_mixed_types" -> ((spark: SparkSession, dir: String) => {
      val raw = tbl(spark, dir, "documents").select(
        concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
          lit(",\"v\":"),
          when(col("doc_id") % 2 === 0, col("doc_id").cast("string"))
            .otherwise(concat(lit("\""), col("lang"), lit("\""))),
          lit("}")).as("j"))
      import spark.implicits._
      val mixed = spark.read.json(raw.as[String]) // distributed inference, no collect
      Aggo.aggregate(mixed,
        """[
          {"$addFields": {"t": {"$type": "$v"}}},
          {"$sort": {"v": 1, "doc_id": 1}},
          {"$limit": 50},
          {"$project": {"doc_id": 1, "v": 1, "t": 1}}
        ]""")
    }),

    // ---- extensions: JSON props (dynamic-document handling) ----
    "q_events_json" -> ((spark: SparkSession, dir: String) => {
      tbl(spark, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("total_k"), count(lit(1)).as("n"),
          floorRound(avg(col("value")), 4).as("avg_value"))
    }),

    // ---- extensions: text analysis (over documents) ----
    "q_text_stats" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      tbl(spark, dir, "documents").select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        charCount(col("text")).as("n_chars2"),
        distinctTokenCount(col("text")).as("n_distinct"),
        avgTokenLen(col("text")).as("avg_tok_len"),
        punctRatio(col("text")).as("punct_ratio"))
    }),
    "q_text_quality" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      tbl(spark, dir, "documents").select(col("doc_id"),
        qualityScore(col("text")).as("quality"))
    }),
    "q_text_bpe" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      tbl(spark, dir, "documents").select(col("doc_id"),
        bpeTokenCountApprox(col("text")).as("n_bpe"))
    }),
    "q_text_langid" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      tbl(spark, dir, "documents").select(col("doc_id"), col("lang"),
        langId(col("text")).as("guess"))
    }),
    "q_fingerprint" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      tbl(spark, dir, "documents").select(col("doc_id"),
        fingerprint(col("text")).as("fp"))
    }),
    // PII appended per-row from doc_id so the scrub has real targets; the
    // oracle builds the identical input and applies the same regex chain
    "q_text_scrub" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      val d = tbl(spark, dir, "documents")
      val augmented = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +4917112"), col("doc_id").cast("string"),
        lit(" ip 10.1.2."), (col("doc_id") % 250).cast("string"),
        lit(" card 4111111111111111"))
      d.select(col("doc_id"), scrubPii(augmented).as("scrubbed"))
    }),
    "q_text_repetition" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      val d = tbl(spark, dir, "documents")
      d.select(col("doc_id"),
        floorRound(lineRepetitionRatio(regexp_replace(col("text"), "\\. ", "\n")), 6).as("rep"))
    }),
    "q_text_tfidf" -> ((spark: SparkSession, dir: String) =>
      graft.ext.TextFunctions.tfIdfTopTerms(
        tbl(spark, dir, "documents"), "doc_id", "text", 5)),
    // corpus vocabulary: top-50 tokens by total count with doc frequencies
    "q_vocab" -> ((spark: SparkSession, dir: String) =>
      graft.ext.TextFunctions.vocab(
        tbl(spark, dir, "documents"), "doc_id", "text", 50)),
    "q_text_bm25" -> ((spark: SparkSession, dir: String) =>
      graft.ext.TextFunctions.bm25Search(
        tbl(spark, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "merge"), 20)),
    "q_text_chunk" -> ((spark: SparkSession, dir: String) =>
      tbl(spark, dir, "documents").select(col("doc_id"),
        posexplode(graft.ext.TextFunctions.chunkByTokens(col("text"), 12, 8))
          .as(Seq("chunk_idx", "chunk")))),
    // interval-containment join, bin-blocked: every event attributed to the
    // 30-minute windows opened by same-user purchase events (bin = 10 min;
    // correctness is bin-independent, the oracle is the naive range join)
    "q_interval_join" -> ((spark: SparkSession, dir: String) => {
      val ev = events(spark, dir).select(col("event_id"), col("user_id"),
        col("ts_us"), col("event_type"))
      val iv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("lo"),
          (col("ts_us") + 1800000000L).as("hi"), col("event_id").as("purchase_id"))
      graft.ext.Joins.intervalJoin(
        ev.select("event_id", "user_id", "ts_us"), "ts_us",
        iv, "lo", "hi", binWidth = 600000000L, on = Seq("user_id"))
        .select("event_id", "user_id", "ts_us", "purchase_id")
    }),
    // hybrid retrieval: lexical bm25 leg over documents + vector leg over
    // the aligned embeddings (query id -1 sidesteps self-match exclusion),
    // fused by reciprocal rank
    "q_hybrid_rrf" -> ((spark: SparkSession, dir: String) => {
      val bm = graft.ext.TextFunctions.bm25Search(
        tbl(spark, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "merge"), 20).select(col("doc_id"), col("rank"))
      val qv = (0 until 64).map(i => ((i % 7) - 3) / 4.0)
      val qdf = spark.range(1).select(lit(-1L).as("vec_id"),
        array(qv.map(lit): _*).as("embedding"))
      val vec = graft.ext.Similarity.bruteForceTopK(
        qdf, tbl(spark, dir, "embeddings"), "vec_id", "embedding", 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.ext.Retrieval.rrfFuse(Seq(bm, vec), "doc_id", "rank", topK = 15)
    }),
    // Gopher rule-set over structurally-augmented text: sentence breaks
    // become lines, and doc_id-keyed suffixes plant bullets, ellipses,
    // hashes, repeated lines and repeated paragraphs so every rule fires
    // both ways somewhere in the corpus.
    "q_text_gopher" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      val d = tbl(spark, dir, "documents")
      val base = regexp_replace(col("text"), "\\. ", "\n")
      val aug = concat(base,
        when(col("doc_id") % 5 === 0,
          lit("\n• item one\n• item two\n• item three")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit("\nto be continued...\n###")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          lit("\nrepeat line\nrepeat line\nrepeat line")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit("\n\n"), substring(base, 1, 80),
            lit("\n\n"), substring(base, 1, 80))).otherwise(lit("")))
      val ruleNames = Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
        "r_dup_lines", "r_dup_paras", "r_dup_line_chars", "r_dup_para_chars")
      // materialize the flags struct as a named column: CollapseProject keeps
      // an expensive alias referenced 13 times, so the rules evaluate from
      // one struct instead of re-running gopherFlags per extracted field
      val f = col("_gf")
      d.withColumn("_gf", gopherFlags(aug))
        .select(col("doc_id") +: f.getField("words").as("words") +:
          ruleNames.map(n => f.getField(n).as(n)) :+
          ruleNames.map(n => f.getField(n)).reduce(_ && _).as("pass"): _*)
    }),
    // ---- streaming differential gate: the curated-ingest SINK, driver-
    // checkable. The bounded documents corpus runs through
    // curatedIngestSink in four ascending-doc_id micro-batches; the gate
    // reads the resulting store back as a batch frame. Semantics the oracle
    // replays: the quality tier keeps quality > 0.6, and the incremental
    // exact-dedup store keeps the FIRST-ingested copy of each distinct
    // text — with ascending-id batches and min-id-per-content within a
    // batch (ingestStep's exactDedup), that is exactly min(doc_id) per
    // md5(text). The in-memory source feeds from a collected corpus — the
    // documented bounded oracle tier (500 rows at sf0.01), same posture as
    // the other differential gates.
    "q_stream_curate" -> ((spark: SparkSession, dir: String) =>
      streamCurateGate(spark, dir)._1
        .select(col("doc_id"), md5(col("text")).as("content_hash"))),
    // the per-batch funnel receipts, summed per tier across batches — each
    // tier's total is independent of where the batch boundaries fell
    // (input = corpus, quality = passing rows, dedup_store = distinct
    // passing texts), so DuckDB can recompute it from the batch side
    "q_stream_funnel" -> ((spark: SparkSession, dir: String) =>
      streamCurateGate(spark, dir)._2
        .groupBy(col("tier"))
        .agg(sum(col("rows")).as("rows"), sum(col("dropped")).as("dropped"))),
    // the near-dup (LSH) store tier of incrementalDedupSink, driver-
    // checkable: planted token-identical separator variants are near-dups
    // with Jaccard exactly 1 (deterministic banding), survivors are min-id
    // per normalized content — see streamNeardupGate
    "q_stream_neardup" -> ((spark: SparkSession, dir: String) =>
      streamNeardupGate(spark, dir)),
    // ---- $graphLookup / $merge differential gates (SURVEY §2.2
    // extensions; previously spec-only). q_graph_lookup walks a parent-
    // pointer binary-heap tree derived from part (parent(k) =
    // floor((k-1)/2); p_partkey is 1-based, so chains climb to keys 1
    // and 2 in ~log2 N hops — 11 BFS join levels at the oracle SF, one
    // keyed equi-join per level; both keys' computed parent is 0, which
    // matches no row, so BOTH the BFS and the oracle's UNION ALL
    // recursion terminate without cycle-handling) and emits one row per
    // (node, ancestor, depth);
    // DuckDB replays it with a recursive CTE. maxDepth is pinned at 48
    // (vs the stage default 20) because the CTE recurses unbounded — the
    // sides must agree at ANY testdata scale, and 48 covers part tables
    // beyond 10^14 rows. ----
    "q_graph_lookup" -> ((spark: SparkSession, dir: String) => {
      val tree = tbl(spark, dir, "part")
        .select(col("p_partkey"), floor((col("p_partkey") - 1) / 2).cast("long").as("parent"))
      Aggo.aggregate(tree,
        """[
          {"$graphLookup": {"from": "tree", "startWith": "$parent",
            "connectFromField": "parent", "connectToField": "p_partkey",
            "as": "anc", "depthField": "d", "maxDepth": 48}},
          {"$unwind": "$anc"},
          {"$project": {"p_partkey": 1, "anc_key": "$anc.p_partkey", "d": "$anc.d"}}
        ]""", Map("tree" -> tree))
    }),
    // $merge end-to-end against a real on-disk parquet target: seed with
    // even-keyed customers (c_nationkey is target-only), merge in a
    // 3-divisible update stream (whenMatched=merge: incoming non-null
    // field wins, existing target-only column survives;
    // whenNotMatched=insert lands with a null c_nationkey), return the
    // post-merge target read — exactly what the $merge stage hands the
    // next stage. DuckDB replays the mode matrix as a FULL OUTER JOIN.
    "q_merge_upsert" -> ((spark: SparkSession, dir: String) => {
      val cust = tbl(spark, dir, "customer")
      val base = java.nio.file.Files.createTempDirectory("graft-merge-gate").toString
      val target = s"$base/customers"
      cust.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
        .write.mode("overwrite").parquet(target)
      val updates = cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), concat(lit("upd:"), col("c_name")).as("c_name"),
          (col("c_acctbal") + 1000.0).as("c_acctbal"))
      val merged = Aggo.aggregate(updates,
        s"""[{"$$merge": {"into": "$target", "on": "c_custkey",
             "whenMatched": "merge", "whenNotMatched": "insert"}}]""")
      // The $merge stage cleans ITS scratch; the gate's seeded target dir
      // was the leak. Materialize the read-back off the target (one spill,
      // swept at JVM exit like every other scratch frame), then delete the
      // seed eagerly so a Verify run leaves no graft-merge-gate* dirs.
      val out = graft.ext.Dedup.spill(merged, "graft-merge-out")
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      out
    }),
    "q_pack_budget" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      graft.ext.Packing.packByTokenBudget(
        tbl(spark, dir, "documents").select(col("doc_id"), col("lang"),
          tokenCount(col("text")).as("n_tok")),
        Seq("lang"), Seq(col("doc_id")), col("n_tok"), 512L)
    }),
    "q_pack_greedy" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      graft.ext.Packing.packGreedy(
        tbl(spark, dir, "documents").select(col("doc_id"), col("lang"),
          tokenCount(col("text")).as("n_tok")),
        Seq("lang"), Seq(col("doc_id")), col("n_tok"), 512L)
    }),
    // the packs as a training loader reads them: greedy assignment, then
    // one row per (lang, pack) with texts joined in doc order
    "q_pack_materialize" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      val packed = graft.ext.Packing.packGreedy(
        tbl(spark, dir, "documents").select(col("doc_id"), col("lang"), col("text"),
          tokenCount(col("text")).as("n_tok")),
        Seq("lang"), Seq(col("doc_id")), col("n_tok"), 512L)
      graft.ext.Packing.materializePacks(packed, Seq("lang"),
        Seq(col("doc_id")), col("text"), col("n_tok"))
    }),
    // length-bucketed batching (the SFT/fine-tuning loader shape): bucket
    // by n_chars, deterministic doc_id order, batches of 8, plus the
    // per-batch padding report
    "q_length_batch" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Packing.lengthBucketBatches(
        tbl(spark, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        Seq("lang"), col("n_chars"), Seq(100L, 300L, 1000L, 3000L),
        batchSize = 8, Seq(col("doc_id")))),
    "q_length_batch_stats" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Packing.batchPaddingStats(
        graft.ext.Packing.lengthBucketBatches(
          tbl(spark, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
          Seq("lang"), col("n_chars"), Seq(100L, 300L, 1000L, 3000L),
          batchSize = 8, Seq(col("doc_id"))),
        Seq("lang"), col("n_chars"))),
    // whole-recipe composition: dedup → quality gate → scrub → pack. The
    // union plants 50 exact duplicates so the dedup tier has real work.
    "q_corpus_curate" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
      val input = d.unionAll(
        d.filter(col("doc_id") < 50).withColumn("doc_id", col("doc_id") + 10000))
      graft.ext.Corpus.curate(input, "doc_id", "text", Seq("lang"),
          graft.ext.Corpus.CurateConfig(minQuality = 0.6, budget = 512L))
        .select(col("doc_id"), col("lang"), col("quality"),
          col("n_tok"), col("pack_id"), col("pack_offset"))
    }),
    // the round-4 tiers composed: crawl URL dedup (canonical-form keep-first,
    // which collapses doc_ids ≡ mod 300) → exact dedup → bigram perplexity
    // gate (LM trained on the FULL corpus, survivors scored) → quality gate →
    // PII scrub → greedy packing. Oracle replays the whole composition.
    "q_corpus_curate_v2" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
        .withColumn("url", synthUrl)
      val counts = graft.ext.LanguageModel.ngramCounts(d, "text", 2)
      graft.ext.Corpus.curate(d, "doc_id", "text", Seq("lang"),
          graft.ext.Corpus.CurateConfig(minQuality = 0.6, budget = 512L,
            urlCol = Some("url")),
          lm = Some((counts, 2, 30.0)))
        .select(col("doc_id"), col("lang"), col("ppl"), col("quality"),
          col("n_tok"), col("pack_id"), col("pack_offset"))
    }),
    // weighted mix: keep all German, 30% English, 15% French, 5% of the rest
    "q_corpus_mix" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Sampling.mix(
        tbl(spark, dir, "documents").select("doc_id", "lang", "source"),
        "lang", Map("en" -> 0.3, "de" -> 1.0, "fr" -> 0.15), default = 0.05)),
    // per-stratum curation dashboard: volumes, exact-dup rate, quality and
    // length means
    "q_corpus_stats" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Corpus.stats(tbl(spark, dir, "documents"), "text",
        Seq("lang", "source"))),
    // reproducibility manifest: per-(lang, source) counts + the order-
    // insensitive mod-2^61 content fingerprint
    "q_corpus_manifest" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Corpus.manifest(tbl(spark, dir, "documents"),
        "doc_id", "text", Seq("lang", "source"))),
    // snapshot drift monitor: PSI per (feature, bucket) between the even-
    // and odd-doc_id halves over lang/source/length features. Lengths are
    // nulled on doc_id % 4 == 0 — nulls land ONLY in the even half, so the
    // "__null__" length bucket carries real PSI signal and the oracle gates
    // that null lengths are not conflated into length bucket 0.
    "q_corpus_drift" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents").withColumn("len_nullable",
        when(col("doc_id") % 4 === 0, lit(null).cast("long"))
          .otherwise(col("n_chars")))
      graft.ext.Corpus.drift(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
        Seq("lang", "source"), col("len_nullable"))
    }),
    // temperature-rescaled mixing at T=2 (flatten toward uniform): the
    // corpus's natural strata are uniform, so the query plants a 60/30/10
    // skew; T=2 must keep all of `small` and downsample `big` hardest
    "q_temperature_mix" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Sampling.temperatureMix(
        tbl(spark, dir, "documents").withColumn("bucket",
          when(col("doc_id") % 10 < 6, "big")
            .when(col("doc_id") % 10 < 9, "mid")
            .otherwise("small")),
        "bucket", temperature = 2.0)),
    // deterministic 80/10/10 train/val/test assignment on the row hash
    "q_split" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Sampling.assignSplit(tbl(spark, dir, "documents"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))),
    // epoch-weighted mixing over the same planted skew: big thins to 0.5
    // epochs, small UPsamples to 2.5 (2 copies + a deterministic half)
    "q_epoch_mix" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Sampling.epochMix(
        tbl(spark, dir, "documents").withColumn("bucket",
          when(col("doc_id") % 10 < 6, "big")
            .when(col("doc_id") % 10 < 9, "mid")
            .otherwise("small")),
        "bucket", Map("big" -> 0.5, "mid" -> 1.0, "small" -> 2.5))),
    // score-weighted (soft) sampling: keep probability = the row's own
    // derived score, realized against the deterministic md5 hash fraction
    "q_score_keep" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Sampling.scoreWeightedKeep(
        tbl(spark, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        (col("n_chars") % 100) / lit(100.0))),
    // token-budget mixing: per-lang quotas in n_chars units over the
    // hash-ordered stream — en partial cut, fr near-total, de small,
    // es explicit 0, zh absent (both drop)
    "q_token_budget_mix" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Sampling.tokenBudgetMix(
        tbl(spark, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", col("n_chars"),
        Map("en" -> 20000L, "de" -> 5000L, "es" -> 0L, "fr" -> 21000L))),
    // deterministic training order: seeded-hash shard + in-shard position,
    // reproducible on any partitioning/engine
    "q_training_order" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Sampling.trainingOrder(
        tbl(spark, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        "doc_id", shards = 8, seed = "r4")),
    "q_sample_stratified" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Sampling.stratified(
        tbl(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus"),
        Seq("o_orderstatus"), 7)),
    "q_sample_fraction" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Sampling.deterministicFraction(
        tbl(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus"), 0.1)),

    // ---- extensions: dedup ----
    "q_dedup_exact" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Dedup.exactGroups(tbl(spark, dir, "documents"), "doc_id", "text")),
    "q_dedup_ngram" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Dedup.ngramJaccardPairs(tbl(spark, dir, "documents"),
        "doc_id", "text", Seq("lang", "source"), 3, 0.05)),
    "q_dedup_minhash" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Dedup.minhashLshPairs(tbl(spark, dir, "documents"),
        "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)),
    // md5Compat so the DuckDB oracle can recompute the identical signatures;
    // maxHamming=6 bucketing uses 8 segments → recall is exact (pigeonhole).
    "q_dedup_simhash" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Dedup.simhashPairs(tbl(spark, dir, "documents"), "doc_id", "text",
        maxHamming = 6, md5Compat = true)),
    // Exact-tier clustering (blocked brute-force pairs) so the oracle can
    // replay the pair graph + connected components deterministically; the
    // LSH end-to-end (dedupNear) stays spec-covered.
    "q_dedup_cluster" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Dedup.dedupNearExact(tbl(spark, dir, "documents"), "doc_id", "text",
        Seq("lang", "source"), shingleSize = 3, threshold = 0.8)
        .select(col("doc_id"), col("lang"), col("source"))),
    // cluster-size histogram over the exact-tier pair graph; two extra
    // exact copies of every doc_id < 20 plant size-3 clusters beside the
    // corpus's natural size-2 ones so the histogram has real shape
    "q_dedup_cluster_stats" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val c1 = d.filter(col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + 10000)
      val c2 = d.filter(col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + 20000)
      graft.ext.Dedup.clusterStats(
        graft.ext.Dedup.ngramJaccardPairs(d.unionAll(c1).unionAll(c2),
          "doc_id", "text", Seq("lang", "source"), shingleSize = 3,
          threshold = 0.8))
    }),
    // same cluster graph, quality-priority survivor: keep the LONGEST
    // member of each duplicate group instead of min id. The union plants a
    // longer high-id copy of each doc so the priority choice is the
    // opposite of the min-id convention — a min-id engine fails this gate.
    "q_dedup_survivor" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .filter(col("doc_id") < 40)
      val longer = d.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" extra tail tokens for the survivor gate")).as("text"),
        col("lang"), col("source"), (col("n_chars") + 100).as("n_chars"))
      graft.ext.Dedup.dedupNearExactBy(d.unionAll(longer), "doc_id", "text",
        Seq("lang", "source"), priority = col("n_chars"),
        shingleSize = 3, threshold = 0.8)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),
    "q_dedup_embedding" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Dedup.embeddingNearDupPairs(tbl(spark, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.45, planes = 0)),
    // The bucketed scale tier under the same brute-force oracle: with 2
    // hyperplanes per table and 32 independent tables the miss probability
    // for a pair at the cos=0.45 threshold is (1-0.6485^2)^32 ≈ 3e-8 — and
    // the hyperplanes are seeded, so the gate result is deterministic.
    "q_dedup_embedding_lsh" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Dedup.embeddingNearDupPairs(tbl(spark, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.45, planes = 2, tables = 32)),
    // SemDeDup at k=1 (the exact global tier): all-pairs cosine components,
    // smallest id survives. The clustered tier (k>1) is spec-covered.
    "q_dedup_semantic" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Dedup.semDedup(tbl(spark, dir, "embeddings"),
        "vec_id", "embedding", k = 1, threshold = 0.45)
        .select(col("vec_id"))),
    // ---- incremental ingestion dedup (new shard vs already-ingested store) ----
    // store = even doc_ids; new shard = odd doc_ids, with every doc_id ≡ 1
    // (mod 14) carrying its even neighbor's text so the exact tier has real
    // cross-shard duplicates to drop.
    // ingest-store compaction: three shards accumulate three batch dirs
    // (sig/hash sidecars included — the arming threshold is passed as 0 so
    // they exist at gate size; a parameter, not a global-var swap, so
    // concurrent gates in the same JVM never observe a lowered gate); the
    // compacted store read back must hold exactly the survivors
    // shard-by-shard ingest produced. Survivorship is SQL-replayable:
    // first-arrival-wins across shards, smallest id within one — i.e. min
    // over (shard, doc_id) per content hash.
    "q_dedup_store_compact" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents").select(col("doc_id"), col("text"))
      val root = java.nio.file.Files.createTempDirectory("graft-ingest-compact-gate").toString
      try {
        (0 to 2).foreach { s =>
          graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === s),
            "doc_id", "text", s"$root/old", batchTag = Some(s.toString),
            exactArmMinStoreBytes = 0L)
        }
        graft.ext.Dedup.compactIngestStore(spark, s"$root/old", s"$root/new", "text",
          hashSidecarMinStoreBytes = 0L)
        graft.ext.Dedup.spill(
          graft.ext.Dedup.readStore(spark, s"$root/new").select(col("doc_id")),
          "graft-ingest-compact-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // NEAR-tier store lifecycle under one oracle: two shards ingested with
    // the MinHash near tier (shard 1's cross-store detection is served by
    // shard 0's band sidecar), the store compacted — docs, sigs, hashes and
    // the band index together, the band index REGENERATED from the
    // compacted signatures — then a third shard ingested against the
    // compacted store, its cross-store detection served entirely by the
    // regenerated batch-compacted band index. Texts derive from doc_id
    // alone with token-identical near-dup groups (see [[neardupGateText]]),
    // so DuckDB replays the whole lifecycle: survivor per normalized text =
    // min (shard, doc_id) — first-arriving shard wins, smallest id within
    // it (in-batch pair drops keep the min; later arrivals die cross-store).
    "q_dedup_store_bands" -> ((spark: SparkSession, dir: String) => {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ids = tbl(spark, dir, "documents").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      val docs = ids.map(id => (id, neardupGateText(id))).toSeq.toDF("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("graft-ingest-bands-gate").toString
      try {
        (0 to 1).foreach { s =>
          graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === s),
            "doc_id", "text", s"$root/old", nearThreshold = Some(0.9),
            batchTag = Some(s.toString), exactArmMinStoreBytes = 0L)
        }
        graft.ext.Dedup.compactIngestStore(spark, s"$root/old", s"$root/new", "text",
          hashSidecarMinStoreBytes = 0L)
        graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === 2),
          "doc_id", "text", s"$root/new", nearThreshold = Some(0.9),
          batchTag = Some("2"), exactArmMinStoreBytes = 0L)
        graft.ext.Dedup.spill(
          graft.ext.Dedup.readStore(spark, s"$root/new").select(col("doc_id")),
          "graft-ingest-bands-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // the same lifecycle with the compaction RE-BUCKETING the band index
    // mid-stream (bandBucketTargetRows = 1 forces the size-scaled rule past
    // the gate corpus's row count): shard 2's cross-store detection is
    // served by a regenerated index under a GROWN bucket function whose pin
    // the later ingest must adopt — survivorship must be bit-identical to
    // q_dedup_store_bands (the bucket function is pure layout, never
    // answers), so the oracle is the same SQL
    "q_dedup_store_rebucket" -> ((spark: SparkSession, dir: String) => {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ids = tbl(spark, dir, "documents").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      val docs = ids.map(id => (id, neardupGateText(id))).toSeq.toDF("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("graft-rebucket-gate").toString
      try {
        (0 to 1).foreach { s =>
          graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === s),
            "doc_id", "text", s"$root/old", nearThreshold = Some(0.9),
            batchTag = Some(s.toString), exactArmMinStoreBytes = 0L)
        }
        graft.ext.Dedup.compactIngestStore(spark, s"$root/old", s"$root/new", "text",
          hashSidecarMinStoreBytes = 0L, bandBucketTargetRows = 1L)
        graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === 2),
          "doc_id", "text", s"$root/new", nearThreshold = Some(0.9),
          batchTag = Some("2"), exactArmMinStoreBytes = 0L)
        graft.ext.Dedup.spill(
          graft.ext.Dedup.readStore(spark, s"$root/new").select(col("doc_id")),
          "graft-rebucket-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // store MERGE: shards 0-1 curated into store A, shard 2 curated
    // INDEPENDENTLY into store B (its own in-batch near dedup), then B
    // merged into A — replaying B's surviving batches against A exactly as
    // live ingest would. Merge semantics make this bit-identical to
    // ingesting shard 2 into A directly (B's internal dedup keeps each
    // normalized text's min id; the replay then drops those with an
    // earlier A-side survivor), so the oracle is q_dedup_store_bands' SQL.
    "q_dedup_store_merge" -> ((spark: SparkSession, dir: String) => {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ids = tbl(spark, dir, "documents").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      val docs = ids.map(id => (id, neardupGateText(id))).toSeq.toDF("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("graft-merge-gate").toString
      try {
        (0 to 1).foreach { s =>
          graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === s),
            "doc_id", "text", s"$root/a", nearThreshold = Some(0.9),
            batchTag = Some(s.toString), exactArmMinStoreBytes = 0L)
        }
        graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === 2),
          "doc_id", "text", s"$root/b", nearThreshold = Some(0.9),
          batchTag = Some("0"), exactArmMinStoreBytes = 0L)
        graft.ext.Dedup.mergeIngestStores(spark, s"$root/a", s"$root/b",
          "doc_id", "text", nearThreshold = Some(0.9),
          exactArmMinStoreBytes = 0L)
        graft.ext.Dedup.spill(
          graft.ext.Dedup.readStore(spark, s"$root/a").select(col("doc_id")),
          "graft-merge-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // point near-dup lookup against the same 3-shard near-tier store as
    // q_dedup_store_bands (uncompacted — the multi-dir sidecar path): the
    // probe is group 1's base text, token-identical to the whole cluster
    // {5,6,7,8}, whose sole survivor is the min (shard, doc_id) = 6; the
    // lookup must return exactly that survivor at Jaccard exactly 1.0
    // (token-identical ⇒ equal shingle sets), and no other group leaks in
    // (disjoint vocabularies). Bucket-pruned sidecar read: a 16-key probe
    // covers ≤16 of the 64 pinned buckets.
    "q_dedup_lookup" -> ((spark: SparkSession, dir: String) => {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ids = tbl(spark, dir, "documents").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      val docs = ids.map(id => (id, neardupGateText(id))).toSeq.toDF("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("graft-lookup-gate").toString
      try {
        (0 to 2).foreach { s =>
          graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === s),
            "doc_id", "text", s"$root/store", nearThreshold = Some(0.9),
            batchTag = Some(s.toString))
        }
        graft.ext.Dedup.spill(
          graft.ext.Dedup.lookupNearDups(spark, s"$root/store",
            neardupGateText(5), threshold = 0.9),
          "graft-lookup-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // batched near-dup lookup over the same 3-shard near-tier store: a
    // FRAME of probes (groups 1 and 3's base texts + a vocabulary-disjoint
    // control) banded once and resolved through ONE bipartite band join —
    // constant job count in the probe count (spec-pinned). Each matching
    // probe returns its cluster's sole survivor — the min (shard, doc_id)
    // of the token-identical group — at Jaccard exactly 1.0; the disjoint
    // probe returns nothing.
    "q_dedup_lookup_batch" -> ((spark: SparkSession, dir: String) => {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ids = tbl(spark, dir, "documents").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      val docs = ids.map(id => (id, neardupGateText(id))).toSeq.toDF("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("graft-lookupb-gate").toString
      try {
        (0 to 2).foreach { s =>
          graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === s),
            "doc_id", "text", s"$root/store", nearThreshold = Some(0.9),
            batchTag = Some(s.toString))
        }
        val probes = Seq(
          (0L, neardupGateText(5)),
          (1L, neardupGateText(15)),
          (2L, "wholly absent vocabulary zone sharing nothing with any stored document"))
          .toDF("probe_id", "text")
        graft.ext.Dedup.spill(
          graft.ext.Dedup.lookupNearDupsBatch(spark, s"$root/store",
            probes, "probe_id", "text", threshold = 0.9),
          "graft-lookupb-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // near-tier BACKFILL lifecycle: shards 0 and 1 ingested EXACT-ONLY (no
    // signatures exist anywhere), the store's sidecars derived in one
    // backfillSigStore call, then shard 2 ingested WITH the near tier —
    // its in-batch and cross-store near-dups must die against the
    // BACKFILLED signatures (without the backfill the guard refuses).
    // Replay: shards 0-1 dedup on EXACT raw text only (first-arriving
    // shard wins, smallest id within it); shard 2 keeps its smallest id
    // per normalized-token text, minus anything whose normalized text
    // already has a phase-1 survivor.
    "q_dedup_backfill" -> ((spark: SparkSession, dir: String) => {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ids = tbl(spark, dir, "documents").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      val docs = ids.map(id => (id, neardupGateText(id))).toSeq.toDF("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("graft-backfill-gate").toString
      try {
        (0 to 1).foreach { s =>
          graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === s),
            "doc_id", "text", s"$root/store", batchTag = Some(s.toString),
            exactArmMinStoreBytes = 0L)
        }
        graft.ext.Dedup.backfillSigStore(spark, s"$root/store", "doc_id", "text")
        graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === 2),
          "doc_id", "text", s"$root/store", nearThreshold = Some(0.9),
          batchTag = Some("2"), exactArmMinStoreBytes = 0L)
        graft.ext.Dedup.spill(
          graft.ext.Dedup.readStore(spark, s"$root/store").select(col("doc_id")),
          "graft-backfill-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // tombstoned RETRACTION lifecycle (GDPR delete-then-reingest): shards
    // 0-1 curated near-tier, then every survivor with doc_id % 5 < 2
    // REMOVED (tombstoned — logical delete, physical at compaction), then
    // shard 2 ingested near-tier: its docs die only against LIVE
    // survivors — a shard-2 near-dup of a REMOVED doc now lands where it
    // would have died, and near-dups of live docs still die. Replay:
    // phase-1 survivors minus the removal rule, plus shard 2's
    // per-normalized-text minima that have no LIVE phase-1 survivor.
    "q_dedup_tombstone" -> ((spark: SparkSession, dir: String) => {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ids = tbl(spark, dir, "documents").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      val docs = ids.map(id => (id, neardupGateText(id))).toSeq.toDF("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("graft-tombstone-gate").toString
      try {
        (0 to 1).foreach { s =>
          graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === s),
            "doc_id", "text", s"$root/store", nearThreshold = Some(0.9),
            batchTag = Some(s.toString), exactArmMinStoreBytes = 0L)
        }
        graft.ext.Dedup.removeFromIngestStore(spark, s"$root/store", "doc_id",
          pmod(col("doc_id"), lit(5)) < 2)
        graft.ext.Dedup.ingestStep(docs.filter(pmod(col("doc_id"), lit(3)) === 2),
          "doc_id", "text", s"$root/store", nearThreshold = Some(0.9),
          batchTag = Some("2"), exactArmMinStoreBytes = 0L)
        graft.ext.Dedup.spill(
          graft.ext.Dedup.readStore(spark, s"$root/store").select(col("doc_id")),
          "graft-tombstone-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    "q_dedup_incr_exact" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents")
      val even = docs.filter(col("doc_id") % 2 === 0)
      val newDocs = docs.filter(col("doc_id") % 2 === 1)
        .join(even.select(col("doc_id").as("nid"), col("text").as("ntext")),
          col("doc_id") - 1 === col("nid"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 1 && col("ntext").isNotNull, col("ntext"))
            .otherwise(col("text")).as("text"))
      graft.ext.Dedup.incrementalExact(newDocs, "doc_id", "text",
        graft.ext.Dedup.exactGroups(even, "doc_id", "text"))
        .select(col("doc_id"))
    }),
    // same planted batch/store split as q_dedup_incr_exact; the bloom
    // pre-filter must leave the result set bit-identical (misses skip the
    // join, false positives take it), so the oracle is the same SQL
    "q_dedup_incr_bloom" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents")
      val even = docs.filter(col("doc_id") % 2 === 0)
      val newDocs = docs.filter(col("doc_id") % 2 === 1)
        .join(even.select(col("doc_id").as("nid"), col("text").as("ntext")),
          col("doc_id") - 1 === col("nid"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 1 && col("ntext").isNotNull, col("ntext"))
            .otherwise(col("text")).as("text"))
      graft.ext.Dedup.incrementalExactBloom(newDocs, "doc_id", "text",
        graft.ext.Dedup.exactGroups(even, "doc_id", "text"),
        expectedDocs = 100000L, fpp = 0.001)
        .select(col("doc_id"))
    }),
    "q_dedup_incr_minhash" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents")
      graft.ext.Dedup.minhashLshPairsAgainst(
        docs.filter(col("doc_id") % 2 === 1), docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
    }),

    // ---- $documents literal source (Mongo 5.1) ----
    "q_documents" -> ((spark: SparkSession, dir: String) =>
      Aggo.aggregate(tbl(spark, dir, "region"),
        """[
          {"$documents": [
            {"k": 1, "grp": "a", "v": 10.5},
            {"k": 2, "grp": "b", "v": 4.0},
            {"k": 3, "grp": "a", "v": 2.25},
            {"k": 4, "grp": "b", "v": 8.0}]},
          {"$group": {"_id": "$grp", "total": {"$sum": "$v"}, "n": {"$sum": 1}}},
          {"$sort": {"_id": 1}}
        ]""")),

    // ---- extensions: $rankFusion stage (Mongo 8.0 hybrid-search surface) ----
    // two ranked legs over orders (price-first weighted 2x, oldest-first),
    // fused by weighted RRF; sort keys carry o_orderkey tiebreaks so every
    // leg's rank order is total
    "q_rank_fusion" -> ((spark: SparkSession, dir: String) =>
      Aggo.aggregate(tbl(spark, dir, "orders"),
        """[
          {"$rankFusion": {
            "input": {"pipelines": {
              "price": [{"$sort": {"o_totalprice": -1, "o_orderkey": 1}}, {"$limit": 20}],
              "date":  [{"$sort": {"o_orderdate": 1, "o_orderkey": 1}}, {"$limit": 20}]}},
            "combination": {"weights": {"price": 2}},
            "scoreDetails": true}},
          {"$limit": 25},
          {"$project": {"o_orderkey": 1, "score": 1}}
        ]""")),

    // ---- extensions: $scoreFusion stage (Mongo 8.1 hybrid-search surface) ----
    // two scored legs (price magnitude 2x-weighted, low-orderkey freshness
    // proxy), min-max normalized per leg, averaged across containing legs
    "q_score_fusion" -> ((spark: SparkSession, dir: String) =>
      Aggo.aggregate(tbl(spark, dir, "orders"),
        """[
          {"$scoreFusion": {
            "input": {"pipelines": {
              "value": [{"$addFields": {"score": "$o_totalprice"}},
                        {"$sort": {"score": -1, "o_orderkey": 1}}, {"$limit": 20}],
              "fresh": [{"$addFields": {"score": {"$multiply": [-1.0, "$o_orderkey"]}}},
                        {"$sort": {"score": -1, "o_orderkey": 1}}, {"$limit": 20}]},
              "normalization": "minMaxScaler"},
            "combination": {"weights": {"value": 2}},
            "scoreDetails": true}},
          {"$limit": 25},
          {"$project": {"o_orderkey": 1, "score": 1}}
        ]""")),

    // ---- extensions: skew tools ----
    // salted join is semantics-preserving (only the shuffle distribution
    // changes), so the plain-join SQL is its oracle
    "q_skew_join" -> ((spark: SparkSession, dir: String) => {
      val fact = tbl(spark, dir, "lineitem").select(col("l_suppkey").as("suppkey"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val dim = tbl(spark, dir, "supplier").select(col("s_suppkey").as("suppkey"), col("s_name"))
      graft.ext.Skew.saltedJoin(fact, dim, "suppkey", salt = 8)
    }),
    "q_skew_profile" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Skew.keyProfile(tbl(spark, dir, "lineitem"), "l_suppkey", topN = 10)),

    // ---- extensions: similarity search ----
    // query vector components are exactly float-representable (k/4) so the
    // engine's float cast and the oracle's double literals agree bit-for-bit
    "q_vector_search" -> ((spark: SparkSession, dir: String) => {
      val qv = (0 until 64).map(i => ((i % 7) - 3) / 4.0).mkString("[", ", ", "]")
      Aggo.aggregate(tbl(spark, dir, "embeddings"),
        s"""[
          {"$$vectorSearch": {"path": "embedding", "queryVector": $qv,
            "limit": 25, "scoreField": "score"}},
          {"$$project": {"vec_id": 1, "score": 1, "_id": 0}}
        ]""")
    }),
    "q_ann_brute" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      graft.ext.Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 5)
    }),
    // Gate params trade precision for exhaustive recall at this scale (few
    // planes, many tables) so the LSH result provably equals the exact
    // top-k and can share the brute-force oracle; production defaults keep
    // tighter buckets.
    "q_ann_lsh" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      graft.ext.Similarity.lshTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, planes = 3, tables = 24)
    }),

    // ---- extensions: IVF ANN (exhaustive nprobe = oracle tier) ----
    "q_ann_ivf" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      graft.ext.Similarity.ivfTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 8)
    }),
    // incremental IVF store: the corpus arrives as three shards (id mod 3;
    // shard 0 bootstraps and freezes the coarse quantizer), each assigned
    // and appended by ivfIngestStep, then the UNION store is probed
    // exhaustively (nprobe = nlist) — equal to brute force however the
    // corpus was sharded, so the oracle is the same ranking SQL as
    // q_ann_ivf. Scratch hygiene as in q_merge_upsert: materialize the
    // probe result off the store, delete the store eagerly.
    "q_ann_ivf_incr" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      val store = java.nio.file.Files.createTempDirectory("graft-ivf-incr-gate").toString
      // delete in finally: a failed ingest/probe must not leak the store
      // dir into the temp root on every failed gate run (the spill output
      // is already materialized off the store by the time it matters)
      try {
        (0 to 2).foreach { s =>
          graft.ext.Similarity.ivfIngestStep(
            e.filter(pmod(col("vec_id"), lit(3)) === s), "vec_id", "embedding",
            store, nlist = 8, batchTag = Some(s.toString))
        }
        val idx = graft.ext.Similarity.loadIvfStore(spark, store)
        val probed = graft.ext.Similarity.ivfTopK(
          e.filter(col("vec_id") < 10), idx, "vec_id", "embedding", k = 5, nprobe = 8)
        graft.ext.Dedup.spill(probed, "graft-ivf-incr-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(store)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // same three-shard arrival, IVF-PQ store (frozen centroids AND
    // codebooks; shards append compressed codes): exhaustive settings
    // (nprobe = nlist, rerank >= corpus) make the probe exact, so the
    // oracle is brute force — the sharding AND the quantization must both
    // be invisible at these settings
    "q_ann_ivfpq_incr" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      val store = java.nio.file.Files.createTempDirectory("graft-ivfpq-incr-gate").toString
      try {
        (0 to 2).foreach { s =>
          graft.ext.Similarity.ivfPqIngestStep(
            e.filter(pmod(col("vec_id"), lit(3)) === s), "vec_id", "embedding",
            store, nlist = 8, m = 8, ksub = 16, dim = 64, batchTag = Some(s.toString))
        }
        val idx = graft.ext.Similarity.loadIvfPqStore(spark, store)
        val probed = graft.ext.Similarity.ivfPqTopK(
          e.filter(col("vec_id") < 10), idx, "vec_id", "embedding",
          k = 5, nprobe = 8, rerank = 1 << 20)
        graft.ext.Dedup.spill(probed, "graft-ivfpq-incr-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(store)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // offline retrain of an incremental store: three shards bootstrap-
    // freeze an nlist=4 quantizer, ivfRetrain re-trains at nlist=8 on the
    // full store and re-assigns in one pass; the NEW store probed
    // exhaustively must still equal brute force (re-assignment must lose/
    // duplicate nothing and the new pin must carry the new params)
    "q_ann_ivf_retrain" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      val root = java.nio.file.Files.createTempDirectory("graft-ivf-retrain-gate").toString
      try {
        (0 to 2).foreach { s =>
          graft.ext.Similarity.ivfIngestStep(
            e.filter(pmod(col("vec_id"), lit(3)) === s), "vec_id", "embedding",
            s"$root/old", nlist = 4, batchTag = Some(s.toString))
        }
        graft.ext.Similarity.ivfRetrain(spark, s"$root/old", s"$root/new", nlist = 8)
        val idx = graft.ext.Similarity.loadIvfStore(spark, s"$root/new")
        val probed = graft.ext.Similarity.ivfTopK(
          e.filter(col("vec_id") < 10), idx, "vec_id", "embedding", k = 5, nprobe = 8)
        graft.ext.Dedup.spill(probed, "graft-ivf-retrain-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // PQ-store retrain: both frozen models (coarse quantizer + codebooks)
    // re-trained on the full store and every vector re-encoded; exhaustive
    // settings keep the answer exactly brute force
    "q_ann_ivfpq_retrain" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      val root = java.nio.file.Files.createTempDirectory("graft-ivfpq-retrain-gate").toString
      try {
        (0 to 2).foreach { s =>
          graft.ext.Similarity.ivfPqIngestStep(
            e.filter(pmod(col("vec_id"), lit(3)) === s), "vec_id", "embedding",
            s"$root/old", nlist = 4, m = 8, ksub = 16, dim = 64, batchTag = Some(s.toString))
        }
        graft.ext.Similarity.ivfPqRetrain(spark, s"$root/old", s"$root/new",
          nlist = 8, m = 8, ksub = 16, dim = 64)
        val idx = graft.ext.Similarity.loadIvfPqStore(spark, s"$root/new")
        val probed = graft.ext.Similarity.ivfPqTopK(
          e.filter(col("vec_id") < 10), idx, "vec_id", "embedding",
          k = 5, nprobe = 8, rerank = 1 << 20)
        graft.ext.Dedup.spill(probed, "graft-ivfpq-retrain-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // batch-dir compaction: six tiny shards accumulate six batch dirs,
    // compactIvfStore bin-packs them into one bounded dir; the compacted
    // store probed exhaustively must still equal brute force (same rows,
    // same frozen model, only the file layout may change)
    "q_ann_ivf_compact" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      val root = java.nio.file.Files.createTempDirectory("graft-ivf-compact-gate").toString
      try {
        (0 to 5).foreach { s =>
          graft.ext.Similarity.ivfIngestStep(
            e.filter(pmod(col("vec_id"), lit(6)) === s), "vec_id", "embedding",
            s"$root/old", nlist = 8, batchTag = Some(s.toString))
        }
        graft.ext.Similarity.compactIvfStore(spark, s"$root/old", s"$root/new")
        val idx = graft.ext.Similarity.loadIvfStore(spark, s"$root/new")
        val probed = graft.ext.Similarity.ivfTopK(
          e.filter(col("vec_id") < 10), idx, "vec_id", "embedding", k = 5, nprobe = 8)
        graft.ext.Dedup.spill(probed, "graft-ivf-compact-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // ANN-store GDPR retraction lifecycle: three shards ingest, vectors
    // with vec_id%5<2 are tombstoned, the %35==0 subset is RE-INGESTED
    // under a fresh tag (a re-ingest under a new tag lands live — the
    // dedup store's tag-reuse contract); the store is probed exhaustively
    // BOTH before compaction (logical exclusion at the reader) and after
    // compactIvfStore (physical application — the ledger is consumed).
    // Both phases must equal brute force over exactly the surviving
    // vectors: vec_id%5>=2 OR vec_id%35=0.
    "q_ann_ivf_remove" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      val root = java.nio.file.Files.createTempDirectory("graft-ivf-remove-gate").toString
      try {
        (0 to 2).foreach { s =>
          graft.ext.Similarity.ivfIngestStep(
            e.filter(pmod(col("vec_id"), lit(3)) === s), "vec_id", "embedding",
            s"$root/old", nlist = 4, batchTag = Some(s.toString))
        }
        graft.ext.Similarity.removeFromIvfStore(spark, s"$root/old",
          pmod(col("neighbor_id"), lit(5)) < 2)
        graft.ext.Similarity.ivfIngestStep(
          e.filter(pmod(col("vec_id"), lit(35)) === 0), "vec_id", "embedding",
          s"$root/old", nlist = 4, batchTag = Some("reingest"))
        val q = e.filter(col("vec_id") < 10)
        val logical = graft.ext.Similarity.ivfTopK(
          q, graft.ext.Similarity.loadIvfStore(spark, s"$root/old"),
          "vec_id", "embedding", k = 5, nprobe = 4)
          .withColumn("phase", lit("logical"))
        graft.ext.Similarity.compactIvfStore(spark, s"$root/old", s"$root/new")
        val compacted = graft.ext.Similarity.ivfTopK(
          q, graft.ext.Similarity.loadIvfStore(spark, s"$root/new"),
          "vec_id", "embedding", k = 5, nprobe = 4)
          .withColumn("phase", lit("compacted"))
        graft.ext.Dedup.spill(logical.unionByName(compacted), "graft-ivf-remove-out")
      } finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    // IVF-SQ8: exhaustive setting (nprobe = nlist, rerank ≥ corpus) equals
    // brute force regardless of the int8 approximation — same argument as
    // q_ann_ivf / q_ann_pq
    "q_ann_ivf_sq8" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      graft.ext.Similarity.ivfSq8TopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 8, rerank = 1 << 20)
    }),

    // ---- extensions: flat-PQ ANN (exhaustive rerank = oracle tier: exact
    // re-rank over all candidates equals brute force regardless of codebooks) ----
    "q_ann_pq" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      graft.ext.Similarity.pqTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, m = 8, ksub = 16, dim = 64, rerank = 1 << 20)
    }),
    "q_ann_ivfpq" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      graft.ext.Similarity.ivfPqTopK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 8, m = 8, ksub = 16, dim = 64, rerank = 1 << 20)
    }),
    // recall@10 of an exhaustive IVF probe against brute force — the metric
    // a 100-TB ANN deployment tunes nprobe against. At nprobe = nlist the
    // probe is provably exact, so the oracle can assert recall = 1.0 per
    // query without re-ranking anything; pruned-nprobe recall is recorded
    // in the bench full record (`ann_recall_at_10`), not gated here.
    "q_ann_recall" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val exact = graft.ext.Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 10)
      val approx = graft.ext.Similarity.ivfTopK(q, e, "vec_id", "embedding",
        k = 10, nlist = 8, nprobe = 8)
      graft.ext.Similarity.recallAtK(approx, exact)
    }),

    // ---- extensions: gap-based sessionization over events ----
    "q_sessionize" -> ((spark: SparkSession, dir: String) => {
      val ev = events(spark, dir)
      graft.ext.Sessions.sessionStats(ev, "user_id", "ts_us", 600L * 1000000L)
    }),

    // ---- extensions: URL/domain extraction + blocklist filter ----
    // URLs are synthesized from the corpus deterministically (userinfo +
    // port + path exercise every stripping rule); every 3rd document lands
    // on the blocked registered domain and must drop out.
    "q_url_filter" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      val d = tbl(spark, dir, "documents").select(col("doc_id"),
        concat(lit("https://user:pw@www."), col("source"),
          when(col("doc_id") % 3 === 0, lit(".example.com")).otherwise(lit(".example.org")),
          lit(":8080/p/"), col("doc_id").cast("string")).as("url"))
      val withDomain = d.select(col("doc_id"), col("url"),
        extractHost(col("url")).as("host"),
        registeredDomain(extractHost(col("url"))).as("domain"))
      filterBlockedDomains(withDomain, "url", Seq("example.com"))
    }),

    // ---- extensions: URL canonicalization + crawl URL dedup ----
    // Synthesized URLs exercise every canonicalization rule: uppercase
    // scheme/host, userinfo, default vs non-default ports, tracking params,
    // out-of-order params, fragments. The path repeats mod 50 so the dedup
    // tier has real collisions; the oracle derives the canonical form
    // INDEPENDENTLY (closed-form from doc_id, not by re-running the string
    // rules), which gates the parser end to end.
    "q_url_canonical" -> ((spark: SparkSession, dir: String) =>
      tbl(spark, dir, "documents").select(col("doc_id"), synthUrl.as("url"),
        graft.ext.TextFunctions.canonicalizeUrl(synthUrl).as("canon"))),
    "q_url_dedup" -> ((spark: SparkSession, dir: String) =>
      graft.ext.TextFunctions.urlDedup(
        tbl(spark, dir, "documents").select(col("doc_id"), synthUrl.as("url")),
        "doc_id", "url")),
    // recrawl dedup: freshest fetch per canonical URL wins (ts is a
    // deterministic shuffle of ids so max-ts ≠ min-id)
    "q_url_dedup_latest" -> ((spark: SparkSession, dir: String) =>
      graft.ext.TextFunctions.urlDedupLatest(
        tbl(spark, dir, "documents").select(col("doc_id"), synthUrl.as("url"),
          ((col("doc_id") * 37) % 1000).as("fetch_ts")),
        "doc_id", "url", "fetch_ts")),

    // ---- extensions: n-gram LM perplexity scoring (CCNet quality filter) ----
    // Trigram stupid-backoff, self-scored (counts from the corpus itself) —
    // the oracle replays the whole thing in SQL: counts, per-position
    // backoff chain, per-document mean log10 score.
    "q_lm_score" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents")
      val counts = graft.ext.LanguageModel.ngramCounts(docs, "text", 3)
      graft.ext.LanguageModel.stupidBackoffScore(docs, "doc_id", "text", counts, 3)
    }),
    "q_lm_filter" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents")
      val counts = graft.ext.LanguageModel.ngramCounts(docs, "text", 3)
      graft.ext.LanguageModel.perplexityFilter(docs, "doc_id", "text", counts, 3,
        maxPpl = 17.5)
    }),

    // ---- extensions: embedding quantization (int8 / binary / matryoshka) ----
    // Exploded to (vec_id, scale, pos, code) scalar rows: the oracle harness
    // sorts result frames with pandas, which cannot sort top-level array
    // columns, so gate queries must never project a raw array.
    "q_emb_int8" -> ((spark: SparkSession, dir: String) => {
      val q = graft.ext.Similarity.quantizeInt8(col("embedding"))
      tbl(spark, dir, "embeddings")
        .select(col("vec_id"), q.getField("scale").as("scale"),
          posexplode(q.getField("codes")))
        .select(col("vec_id"), col("scale"), col("pos"),
          col("col").cast("int").as("code"))
    }),
    "q_emb_int8dot" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id"), graft.ext.Similarity.quantizeInt8(col("embedding")).as("q"))
      val a = e.select(col("vec_id").as("id_a"), col("q").as("qa"))
      val b = e.select(col("vec_id").as("id_b"), col("q").as("qb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.ext.Similarity.int8Dot(col("qa"), col("qb")).as("dot8"))
    }),
    "q_emb_hamming" -> ((spark: SparkSession, dir: String) => {
      val e = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), graft.ext.Similarity.binaryQuantize(col("embedding"), 64).as("b"))
      val a = e.select(col("vec_id").as("id_a"), col("b").as("ba"))
      val b = e.select(col("vec_id").as("id_b"), col("b").as("bb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("ham", graft.ext.Similarity.hammingDistance(col("ba"), col("bb")))
        .filter(col("ham") <= 22)
        .select(col("id_a"), col("id_b"), col("ham"))
    }),
    // Chunk→document mean pooling: vectors grouped 10-per-doc with a
    // deterministic per-chunk weight, pooled element-wise, then the first
    // 8 dims re-exploded to the scalar-row gate shape (rounded to absorb
    // summation-order FP). DuckDB replays with generate_subscripts+unnest.
    "q_emb_meanpool" -> ((spark: SparkSession, dir: String) => {
      val emb = tbl(spark, dir, "embeddings")
        .withColumn("doc_id", (col("vec_id") / 10).cast("long"))
        .withColumn("w", (col("vec_id") % 5 + 1).cast("double"))
      graft.ext.Similarity.meanPool(emb, Seq("doc_id"), "embedding", Some("w"))
        .select(col("doc_id"), col("weight_total"),
          posexplode(col("pooled")).as(Seq("pos", "m")))
        .filter(col("pos") < 8)
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          round(col("m"), 4).as("m"), col("weight_total"))
    }),
    // Same scalar-row shape as q_emb_int8 (no top-level arrays in gates).
    "q_emb_matryoshka" -> ((spark: SparkSession, dir: String) =>
      tbl(spark, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(graft.ext.Similarity.matryoshka(col("embedding"), 16)))
        .select(col("vec_id"), col("pos"), col("col").as("val"))),

    // ---- extensions: Z-order (Morton) clustering codes ----
    // Gates the value computation behind Layout.zorderWrite: boundedBucket
    // linearizes each column onto the 2^bits grid, mortonCode interleaves
    // the bits. The file-layout effect (small per-file bounding boxes on
    // BOTH dims) is audited in LayoutSpec; this row pins the arithmetic
    // against an independent engine.
    "q_zorder" -> ((spark: SparkSession, dir: String) => {
      import graft.sources.Layout
      tbl(spark, dir, "orders").select(col("o_orderkey"),
        Layout.mortonCode(Seq(
          Layout.boundedBucket(col("o_custkey"), 0L, 2047L, 10),
          Layout.boundedBucket(col("o_totalprice"), 0L, 524287L, 10)), 10).as("z"))
    }),

    // ---- extensions: HTML strip + Unicode NFC normalization ----
    // The corpus is plain ASCII, so the query manufactures the mess: an HTML
    // wrapper with a script element, escaped entities, and a decomposed
    // accent (e + U+0301) that NFC must compose before hashing.
    "q_normalize" -> ((spark: SparkSession, dir: String) => {
      import graft.ext.TextFunctions._
      val input = tbl(spark, dir, "documents").select(col("doc_id"),
        concat(lit("<div class=\"post\"><p>"), col("text"),
          lit("</p><script type=\"text/js\">var x = 1 &amp;&amp; 2;</script>caf"),
          lit("é"), lit(" &lt;ok&gt;&nbsp;fin</div>")).as("html"))
      val cleaned = normalizeNfc(stripHtml(col("html")))
      input.select(col("doc_id"), cleaned.as("clean_text"),
        length(cleaned).as("n_chars"), md5(cleaned).as("content_hash"))
    }),

    // ---- extensions: line-level dedup (boilerplate removal) ----
    // The word-soup corpus has no repeated lines of its own, so the query
    // plants the boilerplate: a newsletter banner on every 5th document and
    // a social footer on every 7th. Both cross the occurrence threshold and
    // must vanish from every document; body lines survive untouched.
    "q_line_dedup" -> ((spark: SparkSession, dir: String) => {
      val input = tbl(spark, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 5 === 0,
            concat(lit("subscribe to our newsletter\n"), col("text"))).otherwise(col("text")),
          when(col("doc_id") % 7 === 0,
            lit("\nfollow us on social media")).otherwise(lit(""))).as("text"))
      graft.ext.Dedup.lineDedup(input, "doc_id", "text", maxCount = 3)
    }),
    // paragraph grain: planted multi-line ad/legal blocks recur verbatim as
    // BLOCKS (their individual lines also recur, but the unit here is the
    // blank-line-separated paragraph)
    "q_para_dedup" -> ((spark: SparkSession, dir: String) => {
      val input = tbl(spark, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 4 === 0,
            lit("sponsored content\nvisit our store\n\n")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 6 === 0,
            lit("\n\nall rights reserved\nlegal notice")).otherwise(lit("")))
          .as("text"))
      graft.ext.Dedup.paragraphDedup(input, "doc_id", "text", maxCount = 3)
    }),

    // ---- extensions: benchmark decontamination ----
    // The eval "benchmark" slice is every 37th document; the rest is the
    // training corpus. n=4 keeps both classes populated at gate scale.
    "q_decontam" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents")
      graft.ext.Decontamination.flagContaminated(
        d.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 37 === 0), "text", n = 4)
    }),
    // C4 rules (Raffel et al. 2020): planted short/javascript lines must
    // die at the line stage; surviving brace and lorem-ipsum lines kill
    // their pages at the page stage
    "q_c4_filter" -> ((spark: SparkSession, dir: String) => {
      val input = tbl(spark, dir, "documents").select(col("doc_id"), concat(
        col("text"), lit(".\n"),
        lit("short line.\n"),
        when(col("doc_id") % 3 === 0,
          lit("this line uses javascript heavily today.\n")).otherwise(lit("")),
        lit("a second real sentence appears right here!\n"),
        when(col("doc_id") % 7 === 0,
          lit("code with braces looks like this {ok}.\n")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          lit("we insert lorem ipsum filler text here.\n")).otherwise(lit("")),
        lit("a third real sentence appears right here?")).as("text"))
      graft.ext.TextFunctions.c4Filter(input, "text")
    }),
    // bloom tier: the filter's bit pattern is a Spark implementation
    // detail, so the cross-engine contract is the tier's PROPERTY, not its
    // bits — one row asserting (a) no exact-tier contamination escapes the
    // bloom probe (Bloom filters have zero false negatives by construction)
    // and (b) the bloom flag count dominates the exact count (false
    // positives only widen the flagged set). DuckDB recomputes just the
    // exact tier and expects both booleans TRUE; a bloom regression flips
    // a boolean and the row hash goes red.
    "q_decontam_bloom" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents")
      val train = d.filter(col("doc_id") % 37 =!= 0)
      val evalSet = d.filter(col("doc_id") % 37 === 0)
      val exact = graft.ext.Decontamination.flagContaminated(
        train, "doc_id", "text", evalSet, "text", n = 4)
      val bloom = graft.ext.Decontamination.flagContaminatedBloom(
        train, "doc_id", "text", evalSet, "text", n = 4,
        expectedGrams = 100000L, fpp = 0.001)
      exact.select(col("doc_id"), col("contaminated").as("__ex"))
        .join(bloom.select(col("doc_id"), col("contaminated").as("__bl")), Seq("doc_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("__ex"), 1L).otherwise(0L)).as("n_flagged_exact"),
          (sum(when(col("__ex") && !col("__bl"), 1L).otherwise(0L)) === 0L)
            .as("bloom_no_false_negatives"),
          (sum(when(col("__bl"), 1L).otherwise(0L))
            >= sum(when(col("__ex"), 1L).otherwise(0L)))
            .as("bloom_flags_superset"))
    }),

    // cross-document duplicated-trigram fraction (FineWeb dup-ngram signal)
    "q_dup_ngram" -> ((spark: SparkSession, dir: String) =>
      graft.ext.TextFunctions.dupNgramFraction(
        tbl(spark, dir, "documents"), "doc_id", "text", n = 3)),
    // ...and its transform companion: cut every token covered by a
    // cross-document trigram (word soup has abundant natural ones)
    "q_dedup_spans" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Dedup.removeDupSpans(
        tbl(spark, dir, "documents"), "doc_id", "text", n = 3)),
    // GPT-style concat-and-chunk: per-lang token stream (1 reserved EOS
    // slot per doc) split into 128-token examples crossing doc boundaries;
    // the slice index is metadata-only (no token explosion)
    "q_chunk_index" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Packing.concatChunkIndex(
        tbl(spark, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
        Seq("lang"), Seq(col("doc_id")),
        graft.ext.TextFunctions.tokenCount(col("text")), seqLen = 128L)
        .select(col("doc_id"), col("lang"), col("example_id"),
          col("slice_start"), col("slice_len"), col("example_pos"))),
    "q_chunk_materialize" -> ((spark: SparkSession, dir: String) =>
      graft.ext.Packing.materializeChunks(
        graft.ext.Packing.concatChunkIndex(
          tbl(spark, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
          Seq("lang"), Seq(col("doc_id")),
          graft.ext.TextFunctions.tokenCount(col("text")), seqLen = 128L),
        Seq("lang"), col("text"))),
    // hashed linear classifier gate: seeded pseudo-random weights derived
    // from the same integer formula on both sides; ~half the corpus passes
    "q_classifier" -> ((spark: SparkSession, dir: String) => {
      val weights = (0 until 64).map(j => ((j * 2654435761L) % 1000) / 500.0 - 1.0)
      graft.ext.TextFunctions.classifierFilter(
        tbl(spark, dir, "documents"), "text", weights, bias = 0.0, threshold = 0.5)
    }),
    // semantic decontamination: eval = every 37th embedding; the bucketed
    // LSH tier carries the gate (same 2-plane × 32-table miss-prob ≈ 3e-8
    // argument as q_dedup_embedding_lsh), oracle = brute-force bipartite
    "q_decontam_semantic" -> ((spark: SparkSession, dir: String) => {
      val emb = tbl(spark, dir, "embeddings")
      graft.ext.Decontamination.flagSemantic(
        emb.filter(col("vec_id") % 37 =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") % 37 === 0), "embedding",
        threshold = 0.3, planes = 2, tables = 32)
    }),
    // the left-anti filter forms users compose in pipelines, gated in
    // their own right (not just through q_corpus_curate_v2)
    "q_decontam_remove" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents")
      graft.ext.Decontamination.removeContaminated(
        d.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 37 === 0), "text", n = 4)
    }),
    // embedding column dropped from the projection (top-level arrays break
    // the oracle harness's sort); survivors identified by (vec_id, label)
    "q_decontam_semantic_remove" -> ((spark: SparkSession, dir: String) => {
      val emb = tbl(spark, dir, "embeddings")
      graft.ext.Decontamination.removeSemantic(
        emb.filter(col("vec_id") % 37 =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") % 37 === 0), "embedding",
        threshold = 0.3, planes = 2, tables = 32)
        .select(col("vec_id"), col("label"))
    }),
    // fuzzy (near-dup) decontamination: eval = every 37th document; LSH
    // band candidates + exact-Jaccard verify. Same band parameters as the
    // green q_dedup_minhash self-join on this table — the bipartite
    // corpus×eval pairs at threshold are a subset of the pairs that gate
    // already proves the bands recover, so the LSH tier carries the gate.
    "q_decontam_fuzzy" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents")
      // plant near-dup copies of eval docs into the corpus side (tail
      // appended, high ids) so the gate has real paraphrase-grade pairs,
      // not just whatever the corpus happens to contain
      val planted = d.filter(col("doc_id") % 37 === 0 && col("doc_id") < 400)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" tail words appended")).as("text"))
      val corpus = d.filter(col("doc_id") % 37 =!= 0)
        .select(col("doc_id"), col("text")).unionAll(planted)
      graft.ext.Decontamination.flagFuzzy(
        corpus, "doc_id", "text",
        d.filter(col("doc_id") % 37 === 0), "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
    }),
    "q_decontam_fuzzy_remove" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents")
      graft.ext.Decontamination.removeFuzzy(
        d.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 37 === 0), "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
    }),
    // span-grain decontamination: tokens covered by an eval 4-gram are cut,
    // the rest of the document survives
    "q_decontam_spans" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents")
      graft.ext.Decontamination.removeContaminatedSpans(
        d.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 37 === 0), "text", n = 4)
    }),
    // per-benchmark contamination report: two eval slices checked in one
    // plan, zero-hit sets still reported
    "q_decontam_report" -> ((spark: SparkSession, dir: String) => {
      val d = tbl(spark, dir, "documents")
      graft.ext.Decontamination.report(
        d.filter(col("doc_id") % 37 =!= 0 && col("doc_id") % 41 =!= 0),
        "doc_id", "text",
        Map("eval_a" -> d.filter(col("doc_id") % 37 === 0),
            "eval_b" -> d.filter(col("doc_id") % 41 === 0)), "text", n = 4)
    }),

    // ---- extensions: as-of join (temporal alignment) ----
    "q_asof_join" -> ((spark: SparkSession, dir: String) => {
      val ev = events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("purchase_ts"),
          col("value").as("purchase_value"))
      graft.ext.Joins.asOf(ev.select("event_id", "user_id", "ts_us"), purchases,
        Seq("user_id"), "ts_us", "purchase_ts")
    }),

    // ---- remaining expression-operator parity (SURVEY §2.5) ----
    "q_expr_math" -> run("lineitem",
      """[
        {"$project": {"l_orderkey": 1, "l_linenumber": 1,
          "e": {"$round": [{"$exp": "$l_discount"}, 6]},
          "ln_p": {"$round": [{"$ln": "$l_extendedprice"}, 6]},
          "lg": {"$round": [{"$log10": "$l_extendedprice"}, 6]},
          "tr1": {"$trunc": ["$l_extendedprice", 1]}}}
      ]"""),
    "q_expr_string2" -> run("customer",
      """[
        {"$project": {"c_custkey": 1,
          "lt": {"$ltrim": {"input": {"$concat": ["zz", "$c_mktsegment"]}, "chars": "z"}},
          "rt": {"$rtrim": {"input": {"$concat": ["$c_mktsegment", "yy"]}, "chars": "y"}},
          "rep": {"$replaceAll": {"input": "$c_name", "find": "a", "replacement": "_"}},
          "rx": {"$regexMatch": {"input": "$c_name", "regex": "e"}},
          "pos": {"$indexOfCP": ["$c_name", "er"]},
          "d": {"$toDouble": "$c_custkey"},
          "l": {"$toLong": {"$floor": "$c_acctbal"}},
          "b": {"$toBool": {"$gt": ["$c_acctbal", 0]}}}}
      ]"""),
    "q_array_agg" -> run("part",
      """[
        {"$project": {"p_partkey": 1,
          "rng_sum": {"$sum": {"$range": [0, {"$toInt": "$p_size"}]}},
          "rng_avg": {"$avg": {"$range": [0, {"$toInt": "$p_size"}]}},
          "rng_min": {"$min": {"$range": [0, {"$toInt": "$p_size"}]}},
          "rng_max": {"$max": {"$range": [0, {"$toInt": "$p_size"}]}}}}
      ]"""),
    "q_array_misc" -> ((s: SparkSession, d: String) =>
      run("part",
        """[
          {"$project": {"p_partkey": 1,
            "combined": {"$concatArrays": [{"$split": ["$p_name", " "]}, {"$split": ["$p_type", " "]}]},
            "idx_from1": {"$indexOfArray": [{"$concatArrays": [{"$split": ["$p_name", " "]}, {"$split": ["$p_type", " "]}]}, "gear", 1]},
            "idx_bounded": {"$indexOfArray": [{"$concatArrays": [{"$split": ["$p_name", " "]}, {"$split": ["$p_type", " "]}]}, "gear", 0, 3]},
            "eq_self": {"$setEquals": [{"$split": ["$p_name", " "]}, {"$reverseArray": {"$split": ["$p_name", " "]}}]},
            "any_long": {"$anyElementTrue": [{"$map": {"input": {"$split": ["$p_name", " "]}, "as": "w",
                          "in": {"$gte": [{"$strLen": "$$w"}, 6]}}}]},
            "all_short": {"$allElementsTrue": [{"$map": {"input": {"$split": ["$p_name", " "]}, "as": "w",
                          "in": {"$lt": [{"$strLen": "$$w"}, 10]}}}]}}}
        ]""")(s, d)
        .withColumn("combined", array_join(col("combined"), "|"))),
    "q_window_rank" -> run("events",
      """[
        {"$setWindowFields": {"partitionBy": "$event_type",
          "sortBy": {"value": -1, "event_id": 1},
          "output": {"rnk": {"$rank": {}}, "drnk": {"$denseRank": {}}}}},
        {"$match": {"rnk": {"$lte": 5}}},
        {"$project": {"event_type": 1, "event_id": 1, "rnk": 1, "drnk": 1}}
      ]"""),

    "q_expr_bool" -> run("lineitem",
      """[
        {"$addFields": {
          "big": {"$and": [{"$gt": ["$l_quantity", 25]}, {"$lt": ["$l_discount", 0.05]}]},
          "either": {"$or": [{"$gte": ["$l_tax", 0.07]}, {"$lt": ["$l_quantity", 3]}]},
          "nope": {"$not": [{"$eq": ["$l_returnflag", "R"]}]},
          "flag2": {"$getField": {"input": {"f": "$l_returnflag"}, "field": "f"}}}},
        {"$unset": ["l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
                     "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"]}
      ]"""),

    // ---- extensions: gap filling ($fill / $densify) ----
    "q_fill_locf" -> ((spark: SparkSession, dir: String) => {
      // null out small values, then carry the last observation forward
      val ev = events(spark, dir)
        .withColumn("v", when(col("value") < 5, lit(null)).otherwise(col("value")))
      Aggo.aggregate(ev,
        """[
          {"$fill": {"partitionBy": "$user_id", "sortBy": {"ts_us": 1, "event_id": 1},
                     "output": {"v": {"method": "locf"}}}},
          {"$project": {"user_id": 1, "event_id": 1, "v": 1}}
        ]""")
    }),
    "q_densify" -> run("part",
      """[
        {"$project": {"k": "$p_type", "t": "$p_size"}},
        {"$group": {"_id": {"k": "$k", "t": "$t"}, "n": {"$sum": 1}}},
        {"$project": {"k": "$_id.k", "t": "$_id.t", "n": 1, "_id": 0}},
        {"$densify": {"field": "t", "partitionByFields": ["k"],
                      "range": {"step": 1, "bounds": "partition"}}}
      ]"""),

    // time-axis densify: hourly grid per user over the events table
    "q_densify_time" -> ((spark: SparkSession, dir: String) => {
      val ev = events(spark, dir)
        .withColumn("h", date_trunc("hour", timestamp_micros(col("ts_us"))))
      val grouped = ev.groupBy(col("user_id"), col("h")).agg(count(lit(1)).as("n"))
      Aggo.aggregate(grouped,
        """[
          {"$densify": {"field": "h", "partitionByFields": ["user_id"],
                        "range": {"step": 1, "unit": "hour", "bounds": "partition"}}},
          {"$project": {"user_id": 1, "n": 1,
            "hs": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S", "date": "$h"}}}}
        ]""")
    }),

    // ---- extensions: multimodal plumbing (stubbed codec, real plan shape) ----
    "q_multimodal" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents")
      val media = graft.ext.Multimodal.syntheticMedia(spark, docs, "doc_id").toDF
      graft.ext.Multimodal.decodeAndFeaturize(spark, media)
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.channels").as("channels"), col("meta.sizeBytes").as("size_bytes"))
    }),
    // REAL codec path: render procedural PNGs (dimensions derived from the
    // id), decode them with the JDK ImageIO decoder, and let the oracle
    // predict the round-tripped dimensions closed-form.
    "q_multimodal_decode" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents")
      val media = graft.ext.Multimodal.syntheticImageMedia(spark, docs, "doc_id").toDF
      graft.ext.Multimodal.decodeAndFeaturize(spark, media,
        graft.ext.Multimodal.ImageIoDecoder)
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.channels").as("channels"))
    }),
    // same trick for audio: synthesize real RIFF/WAVE payloads (rate/
    // channels/frames derived from the id), decode with the JDK sound API,
    // oracle predicts the round-tripped header closed-form
    "q_multimodal_audio" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents")
      val media = graft.ext.Multimodal.syntheticWavMedia(spark, docs, "doc_id").toDF
      graft.ext.Multimodal.decodeAndFeaturizeAudio(spark, media)
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.sampleRate").as("sample_rate"),
          col("meta.channels").as("channels"), col("meta.frames").as("frames"))
    }),
    // real container-metadata probe: the writer emits genuine ISO-BMFF /
    // EBML bytes and the box/EBML walk reads them back; the oracle computes
    // the same metadata arithmetically from the id, so a parser that
    // shortcut the container structure could not pass by accident
    "q_multimodal_video" -> ((spark: SparkSession, dir: String) => {
      val docs = tbl(spark, dir, "documents")
      val media = graft.ext.Multimodal.syntheticVideoMedia(spark, docs, "doc_id").toDF
      graft.ext.Multimodal.decodeVideoMeta(spark, media)
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.codec").as("codec"), col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"))
    })
  )

  /** Half-up rounding identical to ExprTranslator's `$round` — see there. */
  private def floorRound(c: org.apache.spark.sql.Column, p: Int): org.apache.spark.sql.Column = {
    val f = math.pow(10, p)
    floor(c * f + lit(0.5)) / lit(f)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_match_basic" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 30 AND l_discount < 0.05",
    "q_match_in" ->
      "SELECT l_orderkey, l_returnflag, l_linestatus, l_quantity FROM lineitem WHERE l_returnflag IN ('A','N') AND l_linestatus <> 'F' AND l_quantity > 45",
    "q_match_regex" ->
      "SELECT p_partkey, p_name FROM part WHERE regexp_matches(p_name, '(?i)ol')",
    "q_match_or" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders WHERE (o_orderstatus = 'F' AND o_totalprice > 300000) OR o_orderpriority = '1-URGENT'",
    "q_match_expr" ->
      "SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem WHERE l_discount > l_tax",
    "q_match_nor" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE NOT (o_orderstatus = 'F' OR o_totalprice < 100000)",
    "q_project_arith" ->
      """SELECT l_orderkey, l_linenumber,
        floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue,
        floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge,
        floor(l_extendedprice / l_quantity * 100 + 0.5) / 100 AS unit,
        CAST(floor(l_quantity) AS BIGINT) % 7 AS qmod,
        abs(l_quantity - 25) AS qabs,
        floor(sqrt(l_quantity) * 10000 + 0.5) / 10000 AS qsqrt,
        pow(l_discount, 2) AS qpow
      FROM lineitem""",
    "q_project_string" ->
      """SELECT c_custkey,
        upper(c_name) AS name_upper,
        CAST(length(c_name) AS INTEGER) AS name_len,
        substr(c_name, 1, 8) AS name_sub,
        concat('cust:', c_name, ':', CAST(c_custkey AS VARCHAR)) AS tagged,
        lower(c_mktsegment) AS seg_lower,
        trim(concat('  ', c_mktsegment, '  ')) AS trimmed
      FROM customer""",
    "q_project_date" ->
      """SELECT o_orderkey,
        CAST(year(o_orderdate) AS INTEGER) AS y,
        CAST(month(o_orderdate) AS INTEGER) AS m,
        CAST(dayofmonth(o_orderdate) AS INTEGER) AS d,
        CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        CAST(floor((dayofyear(o_orderdate) - (((8 - (dayofweek(date_trunc('year', o_orderdate)) + 1)) % 7) + 1) + 7) / 7) AS INTEGER) AS wk,
        strftime(o_orderdate, '%Y-%m-%d') AS ds
      FROM orders""",
    "q_project_cond" ->
      """SELECT l_orderkey, l_linenumber,
        CASE WHEN l_discount >= 0.05 THEN 'high' ELSE 'low' END AS disc_class,
        CASE l_returnflag WHEN 'A' THEN 'accepted' WHEN 'R' THEN 'returned' ELSE 'none' END AS flag_desc,
        coalesce(l_quantity, 0) AS qty_or_zero,
        CAST(CASE WHEN l_discount < l_tax THEN -1 WHEN l_discount > l_tax THEN 1 ELSE 0 END AS INTEGER) AS cmp_disc_tax
      FROM lineitem""",
    "q_addfields" ->
      """SELECT s_suppkey, CAST(floor(s_acctbal + 0.5) AS BIGINT) AS acct_rounded, s_acctbal > 0 AS is_positive,
        CAST(floor(s_acctbal / 1000) AS BIGINT) AS acct_bucket
      FROM supplier""",
    "q_group_basic" ->
      """SELECT l_returnflag AS rf, l_linestatus AS ls,
        floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty, floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base,
        floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty, floor(avg(l_extendedprice) * 10000 + 0.5) / 10000 AS avg_price,
        min(l_quantity) AS min_q, max(l_quantity) AS max_q, count(*) AS n
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00' GROUP BY 1, 2""",
    "q_group_date" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m,
        count(*) AS n, floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total
      FROM orders GROUP BY 1, 2""",
    "q_group_stats" ->
      """SELECT l_returnflag AS rf,
        floor(stddev_pop(l_extendedprice) * 100 + 0.5) / 100 AS sd_pop,
        floor(stddev_samp(l_extendedprice) * 100 + 0.5) / 100 AS sd_samp,
        CAST(floor(var_pop(l_extendedprice) + 0.5) AS BIGINT) AS v_pop,
        CAST(floor(var_samp(l_extendedprice) + 0.5) AS BIGINT) AS v_samp
      FROM lineitem GROUP BY 1""",
    "q_group_addtoset" ->
      """SELECT o_orderpriority AS prio,
        array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|') AS statuses, count(*) AS n
      FROM orders GROUP BY 1""",
    "q_group_push" ->
      """SELECT o_orderstatus AS status,
        array_to_string(list_transform(list_sort(list(o_orderkey)), x -> CAST(x AS VARCHAR)), '|') AS keys,
        count(*) AS n
      FROM orders WHERE o_totalprice > 450000 GROUP BY 1""",
    "q_group_firstlast" ->
      """SELECT o_orderstatus AS status,
        min(CASE WHEN rn_a = 1 THEN o_orderkey END) AS first_key,
        min(CASE WHEN rn_d = 1 THEN o_orderkey END) AS last_key,
        strftime(min(o_orderdate), '%Y-%m-%d') AS first_date
      FROM (SELECT o_orderstatus, o_orderkey, o_orderdate,
              row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn_a,
              row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
            FROM orders)
      GROUP BY 1""",
    "q_count" ->
      "SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'F'",
    "q_sortbycount" ->
      "SELECT o_orderpriority AS prio, count(*) AS count FROM orders GROUP BY 1",
    "q_sort_limit" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10",
    "q_skip_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 100",
    "q_unwind" ->
      "SELECT w AS word, count(*) AS n FROM (SELECT unnest(string_split(p_type, ' ')) AS w FROM part) GROUP BY 1",
    "q_unwind_nested" ->
      "SELECT p_partkey, unnest(string_split(p_type, ' ')) AS w FROM part",
    "q_unwind_chain" ->
      """SELECT p_partkey, array_to_string(list(x || '-' || y ORDER BY i, j), '|') AS pairs
      FROM (
        SELECT p_partkey, i, x, unnest(generate_series(1, len(b))) AS j, unnest(b) AS y
        FROM (
          SELECT p_partkey, unnest(generate_series(1, len(a))) AS i, unnest(a) AS x, b
          FROM (SELECT p_partkey, string_split(p_name, ' ') AS a, string_split(p_type, ' ') AS b
                FROM part WHERE p_partkey <= 200)))
      GROUP BY p_partkey""",
    "q_unwind_idx" ->
      """SELECT p_partkey, CAST(unnest(generate_series(1, len(w))) - 1 AS BIGINT) AS idx, unnest(w) AS words
      FROM (SELECT p_partkey, string_split(p_type, ' ') AS w FROM part)""",
    "q_lookup_unwind" ->
      "SELECT o_orderkey, o_custkey, c_name AS cname, c_acctbal AS cbal FROM orders LEFT JOIN customer ON o_custkey = c_custkey",
    "q_lookup_agg" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS INTEGER) AS n_orders,
        floor(coalesce(sum(o_totalprice), 0) * 100 + 0.5) / 100 AS total
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey""",
    "q_lookup_pipeline" ->
      """SELECT c_custkey, o_orderkey AS okey, o_totalprice AS oprice
      FROM (SELECT c_custkey, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM customer JOIN orders ON c_custkey = o_custkey WHERE o_totalprice > 200000)
      WHERE rn <= 3""",
    "q_array_ops" ->
      """SELECT p_partkey,
        CAST(len(string_split(p_type, ' ')) AS INTEGER) AS nwords,
        coalesce(array_to_string(list_filter(string_split(p_type, ' '), x -> length(x) >= 6), '|'), '') AS long_words,
        array_to_string(list_transform(string_split(p_type, ' '), x -> upper(x)), '|') AS upper_words,
        array_to_string(list_slice(string_split(p_type, ' '), 1, 2), '|') AS first2,
        string_split(p_type, ' ')[-1] AS last_word,
        array_to_string(list_reverse(string_split(p_type, ' ')), '|') AS rev,
        list_contains(string_split(p_type, ' '), 'BRASS') AS has_brass,
        CAST(coalesce(list_position(string_split(p_type, ' '), 'STEEL'), 0) - 1 AS INTEGER) AS idx_steel
      FROM part""",
    "q_set_ops" ->
      """SELECT p_partkey,
        coalesce(array_to_string(list_sort(list_distinct(list_intersect(string_split(p_type, ' '), string_split(p_name, ' ')))), '|'), '') AS inter,
        coalesce(array_to_string(list_sort(list_distinct(list_concat(string_split(p_type, ' '), string_split(p_name, ' ')))), '|'), '') AS uni,
        coalesce(array_to_string(list_sort(list_distinct(list_filter(string_split(p_type, ' '), x -> NOT list_contains(string_split(p_name, ' '), x)))), '|'), '') AS diff,
        len(list_filter(list_distinct(string_split(p_type, ' ')), x -> NOT list_contains(string_split(p_name, ' '), x))) = 0 AS subset
      FROM part""",
    "q_reduce" ->
      "SELECT p_partkey, concat('|', array_to_string(string_split(p_type, ' '), '|')) AS joined FROM part",
    "q_text_search" ->
      """SELECT lang, count(*) AS n FROM documents
      WHERE list_has_all(regexp_split_to_array(lower(text), '\W+'), ['spark', 'query', 'window'])
      GROUP BY 1""",
    "q_events_json" ->
      """SELECT event_type,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
        count(*) AS n, floor(avg(value) * 10000 + 0.5) / 10000 AS avg_value
      FROM events GROUP BY 1""",
    "q_match_array" ->
      """SELECT p_partkey, array_to_string(string_split(p_name, ' '), '|') AS w FROM part
      WHERE len(string_split(p_name, ' ')) = 2
        AND list_has_all(string_split(p_name, ' '), ['small'])
        AND len(list_filter(string_split(p_name, ' '), x -> regexp_matches(x, '^(r|b)'))) > 0""",
    "q_match_exists" ->
      "SELECT s_suppkey, s_name, s_acctbal FROM supplier WHERE NOT (s_acctbal < 0) AND s_suppkey % 4 = 1",
    "q_type_ops" ->
      """SELECT c_custkey, 'number' AS t_num, 'string' AS t_str, true AS is_num,
        CAST(floor(c_acctbal) AS INTEGER) AS as_int,
        '{"a":1,"b":"x"}' AS lit_obj, '0|1|2' AS rng
      FROM customer""",
    "q_mergeobjects" ->
      "SELECT c_custkey AS a, c_mktsegment AS b, 1 AS c FROM customer",
    "q_replaceroot" ->
      "SELECT c_custkey AS k, upper(c_name) AS n FROM customer",
    "q_group_nullid" ->
      "SELECT count(*) AS n, floor(sum(o_totalprice) * 100 + 0.5) / 100 AS t FROM orders",
    "q_lookup_nomatch" ->
      "SELECT o_orderkey, c_custkey AS ck FROM orders LEFT JOIN customer ON o_orderkey = c_custkey",
    "q_window" ->
      """SELECT o_orderkey, o_custkey, CAST(rn AS INTEGER) AS rnk,
        floor(run * 100 + 0.5) / 100 AS running, coalesce(pv, -1) AS prev_price
      FROM (SELECT o_orderkey, o_custkey,
              row_number() OVER w AS rn,
              sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
              lag(o_totalprice) OVER w AS pv
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))""",
    "q_events_window" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, CAST(rn AS INTEGER) AS rn, pv AS prev_value
      FROM (SELECT user_id, event_id, ts, value,
              row_number() OVER w AS rn, lag(value) OVER w AS pv
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""",
    "q_union" ->
      "SELECT c_name AS name, c_custkey AS k FROM customer UNION ALL SELECT s_name, s_suppkey FROM supplier",
    "q_sample" ->
      """SELECT o_orderkey, o_custkey FROM orders
      ORDER BY md5(concat_ws(chr(1),
        coalesce(CAST(o_orderkey AS VARCHAR), chr(2)),
        coalesce(CAST(o_custkey AS VARCHAR), chr(2))))
      LIMIT 25""",
    "q_bucket" ->
      """SELECT CASE
          WHEN c_acctbal >= -1000 AND c_acctbal < 0 THEN -1000
          WHEN c_acctbal >= 0 AND c_acctbal < 2000 THEN 0
          WHEN c_acctbal >= 2000 AND c_acctbal < 4000 THEN 2000
          WHEN c_acctbal >= 4000 AND c_acctbal < 6000 THEN 4000
          WHEN c_acctbal >= 6000 AND c_acctbal < 8000 THEN 6000
          ELSE 99999 END AS bucket,
        count(*) AS n, floor(avg(c_acctbal) * 10000 + 0.5) / 10000 AS avg_bal
      FROM customer GROUP BY 1""",
    "q_bucketauto_str" ->
      """WITH counts AS (SELECT p_brand AS k, count(*) AS n FROM part GROUP BY 1),
           cum AS (SELECT k, n, sum(n) OVER (ORDER BY k) - n AS cumprev FROM counts),
           total AS (SELECT sum(n) AS nn FROM counts),
           tiles AS (SELECT k, CAST((cumprev * 5) // nn AS INT) AS tile FROM cum, total)
      SELECT min(p.p_brand) AS lo, max(p.p_brand) AS hi, count(*) AS n,
             floor(sum(p.p_retailprice) * 100 + 0.5) / 100 AS tot
      FROM part p JOIN tiles ON p.p_brand = tiles.k
      GROUP BY tiles.tile""",
    "q_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    // Incremental three-shard IVF-PQ store at exhaustive settings = brute
    // force: sharding AND quantization both invisible (identical ranking
    // SQL to q_ann_ivfpq; a lost batch, duplicated retry, or drifted
    // codebook breaks the hash).
    "q_ann_ivfpq_incr" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    // Retrained store probed exhaustively = brute force: the offline
    // re-train + one-pass re-assign must lose/duplicate nothing and the
    // new quantizer must stay answer-invisible at nprobe = nlist —
    // identical ranking SQL to q_ann_ivf.
    "q_ann_ivf_retrain" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    // PQ-store retrain probed exhaustively = brute force: both retrained
    // quantizers must stay answer-invisible at nprobe = nlist / full
    // rerank — identical ranking SQL to q_ann_ivfpq.
    "q_ann_ivfpq_retrain" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    // Compacted store probed exhaustively = brute force: bin-packing the
    // batch dirs must change only the file layout, never a row — identical
    // ranking SQL to q_ann_ivf.
    "q_ann_ivf_compact" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    // Store-with-removals probed exhaustively = brute force over exactly
    // the SURVIVING vectors (vec_id%5>=2 kept, %5<2 tombstoned, %35==0
    // re-ingested live), in both lifecycle phases: 'logical' (tombstones
    // excluded at the reader) and 'compacted' (ledger physically applied).
    // A tombstoned vector leaking into a top-k answer, a survivor lost, or
    // a re-ingest failing to land breaks the hash in the matching phase.
    "q_ann_ivf_remove" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c
        WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
          AND (c.vec_id % 5 >= 2 OR c.vec_id % 35 = 0))
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos, phase
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      CROSS JOIN (VALUES ('logical'), ('compacted')) AS p(phase)
      WHERE rank <= 5""",
    // Incremental three-shard store probed exhaustively = brute force
    // however the corpus was sharded — identical ranking SQL to q_ann_ivf
    // (the sharding must be invisible in the answer; a store batch lost,
    // duplicated, or assigned under a drifted quantizer breaks the hash).
    "q_ann_ivf_incr" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    // Exhaustive nprobe (= nlist) IVF is provably exact, so per-query
    // recall@10 against brute force is identically 1.0 — the oracle states
    // that closed form instead of re-ranking; a probe or recall-metric
    // regression breaks the hash.
    "q_ann_recall" ->
      """SELECT vec_id AS query_id, CAST(1.0 AS DOUBLE) AS recall
      FROM embeddings WHERE vec_id < 10""",
    "q_ann_ivf_sq8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
      tagged AS (
        SELECT user_id, ts_us,
          CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 600000000
               THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      sess AS (
        SELECT user_id, ts_us,
          CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
        FROM tagged)
      SELECT user_id, session_idx, count(*) AS n_events, min(ts_us) AS session_start,
        max(ts_us) AS session_end, max(ts_us) - min(ts_us) AS duration
      FROM sess GROUP BY 1, 2""",
    "q_url_filter" ->
      """WITH u AS (
        SELECT doc_id,
          'https://user:pw@www.' || source ||
          (CASE WHEN doc_id % 3 = 0 THEN '.example.com' ELSE '.example.org' END) ||
          ':8080/p/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
      h AS (
        SELECT doc_id, url,
          nullif(regexp_extract(lower(url),
            '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1), '') AS host
        FROM u)
      SELECT doc_id, url, host,
        regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
      FROM h
      WHERE regexp_extract(host, '([^.]+\.[^.]+)$', 1) <> 'example.com'""",
    // canonical form derived CLOSED-FORM from doc_id (not by re-running the
    // string rules) — an independent derivation that gates the parser
    "q_url_canonical" ->
      """SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://user:pw@WWW.Site' ELSE 'https://www.site' END)
          || '.example.org'
          || (CASE WHEN doc_id % 4 = 0 THEN ':80' WHEN doc_id % 4 = 1 THEN ':443'
                   WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
          || '/P/' || CAST(doc_id % 50 AS VARCHAR)
          || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=news&b=2&a=1'
                   WHEN doc_id % 3 = 1 THEN '?a=1&b=2&fbclid=xyz' ELSE '' END)
          || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url,
        (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
          || '://www.site.example.org'
          || (CASE WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
          || '/P/' || CAST(doc_id % 50 AS VARCHAR)
          || (CASE WHEN doc_id % 3 < 2 THEN '?a=1&b=2' ELSE '' END) AS canon
      FROM documents""",
    "q_url_dedup" ->
      """WITH u AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://user:pw@WWW.Site' ELSE 'https://www.site' END)
            || '.example.org'
            || (CASE WHEN doc_id % 4 = 0 THEN ':80' WHEN doc_id % 4 = 1 THEN ':443'
                     WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
            || '/P/' || CAST(doc_id % 50 AS VARCHAR)
            || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=news&b=2&a=1'
                     WHEN doc_id % 3 = 1 THEN '?a=1&b=2&fbclid=xyz' ELSE '' END)
            || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url,
          (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
            || '://www.site.example.org'
            || (CASE WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
            || '/P/' || CAST(doc_id % 50 AS VARCHAR)
            || (CASE WHEN doc_id % 3 < 2 THEN '?a=1&b=2' ELSE '' END) AS canon
        FROM documents),
      w AS (SELECT canon, min(doc_id) AS doc_id FROM u GROUP BY 1)
      SELECT u.doc_id, u.url FROM u JOIN w ON u.doc_id = w.doc_id""",
    "q_url_dedup_latest" ->
      """WITH u AS (
        SELECT doc_id, (doc_id * 37) % 1000 AS fetch_ts,
          (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://user:pw@WWW.Site' ELSE 'https://www.site' END)
            || '.example.org'
            || (CASE WHEN doc_id % 4 = 0 THEN ':80' WHEN doc_id % 4 = 1 THEN ':443'
                     WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
            || '/P/' || CAST(doc_id % 50 AS VARCHAR)
            || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=news&b=2&a=1'
                     WHEN doc_id % 3 = 1 THEN '?a=1&b=2&fbclid=xyz' ELSE '' END)
            || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url,
          (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
            || '://www.site.example.org'
            || (CASE WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
            || '/P/' || CAST(doc_id % 50 AS VARCHAR)
            || (CASE WHEN doc_id % 3 < 2 THEN '?a=1&b=2' ELSE '' END) AS canon
        FROM documents),
      w AS (SELECT canon, doc_id FROM (
        SELECT canon, doc_id,
          row_number() OVER (PARTITION BY canon ORDER BY fetch_ts DESC, doc_id ASC) AS rn
        FROM u) WHERE rn = 1)
      SELECT u.doc_id, u.url, u.fetch_ts FROM u JOIN w ON u.doc_id = w.doc_id""",
    // trigram stupid backoff (alpha=0.4), self-scored: the whole LM —
    // counts, per-position backoff chain, per-document mean log10 score —
    // replayed in SQL
    "q_lm_score" ->
      """WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS t
        FROM documents),
      c1 AS (SELECT gram, count(*) AS cnt FROM (SELECT unnest(t) AS gram FROM toks) GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM c1),
      c2 AS (SELECT gram, count(*) AS cnt FROM (
        SELECT unnest(CASE WHEN len(t) >= 2 THEN list_transform(generate_series(0, len(t)-2),
          i -> array_to_string(t[i+1:i+2], ' ')) ELSE [] END) AS gram FROM toks) GROUP BY 1),
      c3 AS (SELECT gram, count(*) AS cnt FROM (
        SELECT unnest(CASE WHEN len(t) >= 3 THEN list_transform(generate_series(0, len(t)-3),
          i -> array_to_string(t[i+1:i+3], ' ')) ELSE [] END) AS gram FROM toks) GROUP BY 1),
      pos AS (SELECT doc_id, len(t) AS nt,
          t[i+1] AS g1,
          CASE WHEN i >= 1 THEN array_to_string(t[i:i+1], ' ') END AS g2,
          CASE WHEN i >= 1 THEN t[i] END AS c2g,
          CASE WHEN i >= 2 THEN array_to_string(t[i-1:i+1], ' ') END AS g3,
          CASE WHEN i >= 2 THEN array_to_string(t[i-1:i], ' ') END AS c3g
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-1)) AS i FROM toks)),
      joined AS (SELECT p.doc_id, p.nt, p.g2, p.g3,
          k1.cnt AS cg1, k2.cnt AS cg2, kc2.cnt AS cc2, k3.cnt AS cg3, kc3.cnt AS cc3, tt.n AS n
        FROM pos p
        LEFT JOIN c1 k1 ON p.g1 = k1.gram
        LEFT JOIN c2 k2 ON p.g2 = k2.gram
        LEFT JOIN c1 kc2 ON p.c2g = kc2.gram
        LEFT JOIN c3 k3 ON p.g3 = k3.gram
        LEFT JOIN c2 kc3 ON p.c3g = kc3.gram
        CROSS JOIN tot tt),
      s1 AS (SELECT doc_id, nt, g2, g3, cg2, cc2, cg3, cc3,
          CASE WHEN cg1 IS NOT NULL THEN cg1 / n ELSE 0.4 / n END AS s FROM joined),
      s2 AS (SELECT doc_id, nt, g3, cg3, cc3,
          CASE WHEN g2 IS NULL THEN s WHEN cg2 IS NOT NULL THEN CAST(cg2 AS DOUBLE) / cc2
               ELSE 0.4 * s END AS s FROM s1),
      s3 AS (SELECT doc_id, nt,
          CASE WHEN g3 IS NULL THEN s WHEN cg3 IS NOT NULL THEN CAST(cg3 AS DOUBLE) / cc3
               ELSE 0.4 * s END AS s FROM s2),
      agg AS (SELECT doc_id, max(nt) AS ntok,
          floor(avg(log10(s)) * 1e6 + 0.5) / 1e6 AS avg_logp FROM s3 GROUP BY 1)
      SELECT d.doc_id, coalesce(a.ntok, 0) AS n_tokens, a.avg_logp,
        floor(power(10, -a.avg_logp) * 1e6 + 0.5) / 1e6 AS ppl
      FROM documents d LEFT JOIN agg a USING (doc_id)""",
    "q_lm_filter" ->
      """WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS t
        FROM documents),
      c1 AS (SELECT gram, count(*) AS cnt FROM (SELECT unnest(t) AS gram FROM toks) GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM c1),
      c2 AS (SELECT gram, count(*) AS cnt FROM (
        SELECT unnest(CASE WHEN len(t) >= 2 THEN list_transform(generate_series(0, len(t)-2),
          i -> array_to_string(t[i+1:i+2], ' ')) ELSE [] END) AS gram FROM toks) GROUP BY 1),
      c3 AS (SELECT gram, count(*) AS cnt FROM (
        SELECT unnest(CASE WHEN len(t) >= 3 THEN list_transform(generate_series(0, len(t)-3),
          i -> array_to_string(t[i+1:i+3], ' ')) ELSE [] END) AS gram FROM toks) GROUP BY 1),
      pos AS (SELECT doc_id, len(t) AS nt,
          t[i+1] AS g1,
          CASE WHEN i >= 1 THEN array_to_string(t[i:i+1], ' ') END AS g2,
          CASE WHEN i >= 1 THEN t[i] END AS c2g,
          CASE WHEN i >= 2 THEN array_to_string(t[i-1:i+1], ' ') END AS g3,
          CASE WHEN i >= 2 THEN array_to_string(t[i-1:i], ' ') END AS c3g
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-1)) AS i FROM toks)),
      joined AS (SELECT p.doc_id, p.nt, p.g2, p.g3,
          k1.cnt AS cg1, k2.cnt AS cg2, kc2.cnt AS cc2, k3.cnt AS cg3, kc3.cnt AS cc3, tt.n AS n
        FROM pos p
        LEFT JOIN c1 k1 ON p.g1 = k1.gram
        LEFT JOIN c2 k2 ON p.g2 = k2.gram
        LEFT JOIN c1 kc2 ON p.c2g = kc2.gram
        LEFT JOIN c3 k3 ON p.g3 = k3.gram
        LEFT JOIN c2 kc3 ON p.c3g = kc3.gram
        CROSS JOIN tot tt),
      s1 AS (SELECT doc_id, nt, g2, g3, cg2, cc2, cg3, cc3,
          CASE WHEN cg1 IS NOT NULL THEN cg1 / n ELSE 0.4 / n END AS s FROM joined),
      s2 AS (SELECT doc_id, nt, g3, cg3, cc3,
          CASE WHEN g2 IS NULL THEN s WHEN cg2 IS NOT NULL THEN CAST(cg2 AS DOUBLE) / cc2
               ELSE 0.4 * s END AS s FROM s1),
      s3 AS (SELECT doc_id, nt,
          CASE WHEN g3 IS NULL THEN s WHEN cg3 IS NOT NULL THEN CAST(cg3 AS DOUBLE) / cc3
               ELSE 0.4 * s END AS s FROM s2),
      agg AS (SELECT doc_id,
          floor(avg(log10(s)) * 1e6 + 0.5) / 1e6 AS avg_logp FROM s3 GROUP BY 1),
      ppl AS (SELECT doc_id, floor(power(10, -avg_logp) * 1e6 + 0.5) / 1e6 AS ppl FROM agg)
      SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars, p.ppl
      FROM documents d JOIN ppl p USING (doc_id)
      WHERE p.ppl <= 17.5""",
    // int8 quantization: scale = max|x|/127 (1e-30 floor), codes =
    // round(x/scale) — max and divide are order-independent IEEE ops, so
    // the doubles compare exactly
    "q_emb_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id, v,
        greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127.0 AS scale FROM e),
      x AS (SELECT vec_id, scale, v,
        unnest(generate_series(1, len(v))) AS i FROM q)
      SELECT vec_id, scale, CAST(i - 1 AS INT) AS pos,
        CAST(round(v[CAST(i AS INT)] / scale) AS INT) AS code
      FROM x""",
    "q_emb_int8dot" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 60),
      q AS (SELECT vec_id,
        greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127.0 AS scale,
        list_transform(v, x -> CAST(round(x / (greatest(list_max(list_transform(v, y -> abs(y))), 1e-30) / 127.0)) AS BIGINT)) AS c
        FROM e)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        a.scale * b.scale * CAST(list_sum(list_transform(generate_series(1, len(a.c)),
          i -> a.c[i] * b.c[i])) AS DOUBLE) AS dot8
      FROM q a JOIN q b ON a.vec_id < b.vec_id""",
    // sign-bit binary quantization packed little-endian into one 64-bit
    // word; hamming = popcount(xor)
    "q_emb_hamming" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      b AS (SELECT vec_id, list_aggregate(list_transform(generate_series(0, 63),
          i -> CASE WHEN v[i+1] > 0 THEN (CASE WHEN i = 63 THEN CAST(-9223372036854775807 AS BIGINT) - 1
                 ELSE (CAST(1 AS BIGINT) << i) END) ELSE CAST(0 AS BIGINT) END),
          'bit_or') AS w FROM e)
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
        CAST(bit_count(xor(a.w, b2.w)) AS BIGINT) AS ham
      FROM b a JOIN b b2 ON a.vec_id < b2.vec_id
      WHERE bit_count(xor(a.w, b2.w)) <= 22""",
    "q_emb_matryoshka" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT vec_id, v[1:16] AS pv FROM e),
      n AS (SELECT vec_id, pv, sqrt(list_sum(list_transform(pv, x -> x * x))) AS nrm FROM p),
      m AS (SELECT vec_id,
        CASE WHEN nrm > 0 THEN list_transform(pv, x -> CAST(x / nrm AS FLOAT)) END AS mvec
        FROM n),
      x AS (SELECT vec_id, mvec, unnest(generate_series(1, len(mvec))) AS i FROM m)
      SELECT vec_id, CAST(i - 1 AS INT) AS pos, mvec[CAST(i AS INT)] AS val
      FROM x""",
    // weighted chunk->doc mean pooling per dimension; round(,4) on both
    // sides absorbs summation-order FP
    "q_emb_meanpool" ->
      """WITH ex AS (
        SELECT CAST(vec_id // 10 AS BIGINT) AS doc_id,
               CAST(vec_id % 5 + 1 AS DOUBLE) AS w,
               CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
               unnest(embedding) AS x
        FROM embeddings)
      SELECT doc_id, pos, round(sum(x * w) / sum(w), 4) AS m,
             sum(w) AS weight_total
      FROM ex WHERE pos < 8 GROUP BY doc_id, pos""",
    // morton interleave: bit i of column j lands at output position i*k+j
    // (k=2; custkey at j=0, totalprice at j=1); bucket = clamped
    // floor((v - min) / (max - min + 1) * 2^bits), identical IEEE double
    // ops in both engines
    "q_zorder" ->
      """WITH b AS (SELECT o_orderkey,
        least(greatest(CAST(floor(CAST(o_custkey AS DOUBLE) / 2048 * 1024) AS BIGINT), 0), 1023) AS bx,
        least(greatest(CAST(floor(CAST(o_totalprice AS DOUBLE) / 524288 * 1024) AS BIGINT), 0), 1023) AS by
        FROM orders)
      SELECT o_orderkey,
        (SELECT CAST(sum((((bx >> i) & 1) << (i*2)) + (((by >> i) & 1) << (i*2+1))) AS BIGINT)
         FROM range(10) t(i)) AS z
      FROM b""",
    // entity decode order matches the engine exactly (&amp; last); chr(769)
    // is the combining acute that nfc_normalize must fold into the e
    "q_normalize" ->
      """WITH input AS (
        SELECT doc_id, '<div class="post"><p>' || text
          || '</p><script type="text/js">var x = 1 &amp;&amp; 2;</script>caf'
          || 'e' || chr(769) || ' &lt;ok&gt;&nbsp;fin</div>' AS html
        FROM documents),
      cleaned AS (
        SELECT doc_id, nfc_normalize(array_to_string(list_filter(list_transform(
          string_split(regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
                '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                '(?i)<br[^>]*>|</p>', chr(10), 'g'),
                '(?s)<[^>]*>', ' ', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
              '&nbsp;', ' '), '&amp;', '&'),
            '[^\S\n]+', ' ', 'g'), chr(10)),
          l -> trim(l)), l -> l <> ''), chr(10))) AS clean_text
        FROM input)
      SELECT doc_id, clean_text, length(clean_text) AS n_chars,
        md5(clean_text) AS content_hash
      FROM cleaned""",
    "q_line_dedup" ->
      """WITH input AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 5 = 0 THEN 'subscribe to our newsletter' || chr(10) || text ELSE text END)
          || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'follow us on social media' ELSE '' END) AS text
        FROM documents),
      lines AS (
        SELECT doc_id, pos, line FROM (
          SELECT doc_id, unnest(l) AS line, unnest(generate_series(1, len(l))) AS pos
          FROM (SELECT doc_id,
                  list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS l
                FROM input))),
      counts AS (SELECT line, count(*) AS cnt FROM lines GROUP BY 1),
      kept AS (SELECT l.doc_id, l.pos, l.line, c.cnt <= 3 AS keep
               FROM lines l JOIN counts c USING (line))
      SELECT i.doc_id,
        coalesce(k.clean_text, '') AS clean_text,
        coalesce(k.n_lines, 0) AS n_lines,
        coalesce(k.n_removed, 0) AS n_removed
      FROM (SELECT DISTINCT doc_id FROM input) i
      LEFT JOIN (
        SELECT doc_id,
          coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS clean_text,
          count(*) AS n_lines,
          CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        FROM kept GROUP BY 1) k USING (doc_id)""",
    "q_c4_filter" ->
      """WITH input AS (
        SELECT doc_id,
          text || '.' || chr(10)
          || 'short line.' || chr(10)
          || (CASE WHEN doc_id % 3 = 0 THEN 'this line uses javascript heavily today.' || chr(10) ELSE '' END)
          || 'a second real sentence appears right here!' || chr(10)
          || (CASE WHEN doc_id % 7 = 0 THEN 'code with braces looks like this {ok}.' || chr(10) ELSE '' END)
          || (CASE WHEN doc_id % 11 = 0 THEN 'we insert lorem ipsum filler text here.' || chr(10) ELSE '' END)
          || 'a third real sentence appears right here?' AS text
        FROM documents),
      cleaned AS (
        SELECT doc_id,
          array_to_string(list_filter(
            list_transform(string_split(text, chr(10)), x -> trim(x)),
            x -> regexp_matches(x, '[.!?"]$')
              AND len(list_filter(regexp_split_to_array(x, '\s+'), w -> w <> '')) >= 5
              AND NOT contains(lower(x), 'javascript')), chr(10)) AS text
        FROM input)
      SELECT doc_id, text,
        CAST(len(list_filter(string_split(text, chr(10)), l -> l <> '')) AS BIGINT) AS n_lines_kept
      FROM cleaned
      WHERE len(list_filter(regexp_split_to_array(text, '[.!?]'), s -> trim(s) <> '')) >= 3
        AND NOT contains(text, '{')
        AND NOT contains(lower(text), 'lorem ipsum')""",
    "q_para_dedup" ->
      """WITH input AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 4 = 0 THEN 'sponsored content' || chr(10) || 'visit our store' || chr(10) || chr(10) ELSE '' END)
          || text
          || (CASE WHEN doc_id % 6 = 0 THEN chr(10) || chr(10) || 'all rights reserved' || chr(10) || 'legal notice' ELSE '' END) AS text
        FROM documents),
      paras AS (
        SELECT doc_id, pos, para FROM (
          SELECT doc_id, unnest(l) AS para, unnest(generate_series(1, len(l))) AS pos
          FROM (SELECT doc_id,
                  list_filter(list_transform(regexp_split_to_array(text, '\n{2,}'), x -> trim(x)), x -> x <> '') AS l
                FROM input))),
      counts AS (SELECT para, count(*) AS cnt FROM paras GROUP BY 1),
      kept AS (SELECT p.doc_id, p.pos, p.para, c.cnt <= 3 AS keep
               FROM paras p JOIN counts c USING (para))
      SELECT i.doc_id,
        coalesce(k.clean_text, '') AS clean_text,
        coalesce(k.n_lines, 0) AS n_lines,
        coalesce(k.n_removed, 0) AS n_removed
      FROM (SELECT DISTINCT doc_id FROM input) i
      LEFT JOIN (
        SELECT doc_id,
          coalesce(string_agg(CASE WHEN keep THEN para END, chr(10) || chr(10) ORDER BY pos), '') AS clean_text,
          count(*) AS n_lines,
          CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        FROM kept GROUP BY 1) k USING (doc_id)""",
    "q_decontam" ->
      """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 4),
                      i -> array_to_string(toks[i+1:i+4], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents)),
      ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 37 = 0),
      dg AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 37 <> 0)
      SELECT doc_id, count(*) AS n_ngrams, count(ev.g) AS n_hits,
        count(ev.g) >= 1 AS contaminated
      FROM dg LEFT JOIN ev ON dg.g = ev.g GROUP BY 1""",
    // The bloom tier's bit pattern is Spark-internal, so the oracle checks
    // the tier's PROPERTY: DuckDB recomputes only the exact tier for
    // n_docs/n_flagged_exact and expects the Spark-computed no-false-
    // negative / superset booleans to be TRUE.
    "q_decontam_bloom" ->
      """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 4),
                      i -> array_to_string(toks[i+1:i+4], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents)),
      ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 37 = 0),
      dg AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 37 <> 0),
      ex AS (SELECT doc_id, count(ev.g) >= 1 AS contaminated
             FROM dg LEFT JOIN ev ON dg.g = ev.g GROUP BY 1)
      SELECT count(*) AS n_docs,
        CAST(sum(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_exact,
        TRUE AS bloom_no_false_negatives,
        TRUE AS bloom_flags_superset
      FROM ex""",
    // DuckDB's native ASOF LEFT JOIN is the independent oracle for the
    // union+window rewrite (inclusive >= match, left-outer).
    "q_asof_join" ->
      """WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
      p AS (SELECT user_id, ts_us AS purchase_ts, value AS purchase_value
            FROM ev WHERE event_type = 'purchase')
      SELECT l.event_id, l.user_id, l.ts_us, r.purchase_ts, r.purchase_value
      FROM ev l ASOF LEFT JOIN p r
        ON l.user_id = r.user_id AND l.ts_us >= r.purchase_ts""",
    "q_date_ops" ->
      """SELECT o_orderkey,
        strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d %H:%M:%S') AS plus_m,
        strftime(o_orderdate - INTERVAL 45 DAY, '%Y-%m-%d') AS minus_d,
        date_diff('day', TIMESTAMP '1995-06-15', o_orderdate) AS dd,
        date_diff('month', TIMESTAMP '1995-06-15', o_orderdate) AS md,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS tm,
        strftime(CAST(o_orderdate AS DATE) - CAST(dayofweek(o_orderdate) AS INTEGER), '%Y-%m-%d') AS tw
      FROM orders""",
    "q_iso_dates" ->
      """SELECT o_orderkey,
        CAST(weekofyear(o_orderdate) AS INTEGER) AS iw,
        CAST(isodow(o_orderdate) AS INTEGER) AS idow,
        CAST(isoyear(o_orderdate) AS INTEGER) AS iwy,
        o_orderkey * 2 + 1 AS hyp
      FROM orders""",
    "q_regex_find" ->
      """SELECT c_custkey,
        regexp_extract(c_name, '[0-9]+') AS m,
        CAST(strpos(c_name, regexp_extract(c_name, '[0-9]+')) - 1 AS INTEGER) AS i,
        regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS cap,
        array_to_string(regexp_extract_all(c_name, '[0-9]+'), '|') AS all_m
      FROM customer""",
    "q_percentile" ->
      """SELECT l_returnflag AS rf,
        floor(quantile_cont(l_quantity, 0.5) * 1000000 + 0.5) / 1000000 AS med,
        array_to_string(list_transform(quantile_cont(l_quantity, [0.25, 0.5, 0.9]),
          x -> CAST(floor(x * 1000000 + 0.5) / 1000000 AS VARCHAR)), '|') AS pct
      FROM lineitem GROUP BY 1""",
    "q_top_bottom" ->
      """WITH ranked AS (
        SELECT o_orderstatus, o_orderkey,
          row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn,
          count(*) OVER (PARTITION BY o_orderstatus) AS cnt
        FROM orders)
      SELECT o_orderstatus AS status,
        min(CASE WHEN rn = 1 THEN o_orderkey END) AS top_key,
        min(CASE WHEN rn = cnt THEN o_orderkey END) AS bot_key,
        array_to_string(list_transform(list(o_orderkey ORDER BY rn) FILTER (WHERE rn <= 3),
          x -> CAST(x AS VARCHAR)), '|') AS top3
      FROM ranked GROUP BY 1""",
    "q_linear_fill" ->
      """SELECT user_id, event_id,
        CASE WHEN v IS NOT NULL THEN floor(CAST(v AS DOUBLE) * 1000000 + 0.5) / 1000000
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               floor((CASE WHEN nv.x = pv.x THEN pv.v
                      ELSE pv.v + (nv.v - pv.v) * (x - pv.x) / (nv.x - pv.x) END) * 1000000 + 0.5) / 1000000
        END AS vf
      FROM (
        SELECT user_id, event_id, v, CAST(epoch_us(ts) AS DOUBLE) AS x,
          last_value(CASE WHEN v IS NOT NULL THEN {'x': CAST(epoch_us(ts) AS DOUBLE), 'v': CAST(v AS DOUBLE)} END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          first_value(CASE WHEN v IS NOT NULL THEN {'x': CAST(epoch_us(ts) AS DOUBLE), 'v': CAST(v AS DOUBLE)} END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        FROM (SELECT user_id, event_id, ts, CASE WHEN value < 5 THEN NULL ELSE value END AS v FROM events))""",
    "q_mixed_types" ->
      """SELECT doc_id, v, 'string' AS t
      FROM (SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id AS VARCHAR) ELSE lang END AS v
            FROM documents)
      ORDER BY v, doc_id LIMIT 50""",
    "q_facet" ->
      """SELECT
        (SELECT string_agg(o_orderstatus || ':' || CAST(n AS VARCHAR), '|' ORDER BY o_orderstatus)
         FROM (SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1)) AS by_status,
        (SELECT string_agg(CAST(o_orderkey AS VARCHAR) || ':' ||
                  CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), '|'
                ORDER BY o_totalprice DESC, o_orderkey)
         FROM (SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 3)) AS top_orders""",
    "q_text_stats" ->
      """SELECT doc_id,
        CAST(len(toks) AS INTEGER) AS n_tokens,
        CAST(length(text) AS INTEGER) AS n_chars2,
        CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        CASE WHEN len(toks) > 0 THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) END AS avg_tok_len,
        CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS punct_ratio
      FROM (SELECT doc_id, text,
              list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
            FROM documents)""",
    "q_text_quality" ->
      """SELECT doc_id,
        least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.4
          + (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END) * 0.4
          + (1.0 - least(1.0, (CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 4.0)) * 0.2
          AS quality
      FROM (SELECT doc_id, text,
              list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
            FROM documents)""",
    "q_text_bpe" ->
      """SELECT doc_id,
        CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+', 0)) AS INTEGER) AS n_bpe
      FROM documents""",
    "q_text_langid" ->
      """SELECT doc_id, lang,
        CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
             WHEN h_en = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'en'
             WHEN h_de = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'de'
             WHEN h_fr = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'fr'
             WHEN h_es = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'es'
             ELSE 'zh' END AS guess
      FROM (SELECT doc_id, lang,
              len(list_intersect(dt, ['the','and','of','to','in','is','that','with','for','was'])) AS h_en,
              len(list_intersect(dt, ['der','die','und','das','ist','nicht','mit','ein','von','zu'])) AS h_de,
              len(list_intersect(dt, ['le','la','les','et','de','est','pas','pour','dans','que'])) AS h_fr,
              len(list_intersect(dt, ['el','la','los','las','es','de','no','por','para','que'])) AS h_es,
              len(list_intersect(dt, ['de5','shi4','le5','zai4','you3','wo3','ta1','zhe4','bu4','ren2'])) AS h_zh
            FROM (SELECT doc_id, lang,
                    list_distinct(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0)) AS dt
                  FROM documents))""",
    "q_fingerprint" ->
      """SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0))), ' ')) AS fp
      FROM documents""",
    "q_text_scrub" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          text || ' contact user' || doc_id || '@example.com or +4917112' || doc_id
               || ' ip 10.1.2.' || (doc_id % 250) || ' card 4111111111111111',
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
          '\+[0-9]{7,15}\b', '<PHONE>', 'g'),
          '\b[0-9]{13,19}\b', '<NUMBER>', 'g') AS scrubbed
      FROM documents""",
    "q_text_repetition" ->
      """WITH l AS (SELECT doc_id,
          list_filter(list_transform(
            string_split(regexp_replace(text, '\. ', chr(10), 'g'), chr(10)),
            x -> trim(x)), x -> x <> '') AS lines
        FROM documents)
      SELECT doc_id, CASE WHEN len(lines) > 0
        THEN floor(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines) * 1000000 + 0.5) / 1000000
        ELSE 0.0 END AS rep FROM l""",
    "q_text_bm25" ->
      """WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      corpus AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM toks),
      tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks)
        WHERE term IN ('spark', 'window', 'merge')
        GROUP BY 1, 2, 3),
      dfq AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id,
          floor(sum(ln(1.0 + (c.n_docs - dfq.df_t + 0.5) / (dfq.df_t + 0.5))
            * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / c.avgdl))) * 1e6 + 0.5) / 1e6 AS score
        FROM tf JOIN dfq USING (term), corpus c
        GROUP BY tf.doc_id)
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank, score
      FROM scored ORDER BY score DESC, doc_id LIMIT 20""",
    "q_text_chunk" ->
      """WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      c AS (SELECT doc_id, toks,
              CAST(1 + ceil(greatest(len(toks) - 12, 0) / 8.0) AS INTEGER) AS nc
            FROM toks)
      SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        array_to_string(toks[i*8+1 : i*8+12], ' ') AS chunk
      FROM (SELECT doc_id, toks, unnest(generate_series(0, nc - 1)) AS i FROM c)""",
    "q_interval_join" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
      iv AS (SELECT user_id, ts_us AS lo, ts_us + 1800000000 AS hi, event_id AS purchase_id
             FROM ev WHERE event_type = 'purchase')
      SELECT e.event_id, e.user_id, e.ts_us, i.purchase_id
      FROM ev e JOIN iv i
        ON e.user_id = i.user_id AND e.ts_us >= i.lo AND e.ts_us < i.hi""",
    "q_hybrid_rrf" ->
      """WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      corpus AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM toks),
      tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks)
        WHERE term IN ('spark', 'window', 'merge')
        GROUP BY 1, 2, 3),
      dfq AS (SELECT term, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY 1),
      bscored AS (
        SELECT tf.doc_id,
          floor(sum(ln(1.0 + (c.n_docs - dfq.df_t + 0.5) / (dfq.df_t + 0.5))
            * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / c.avgdl))) * 1e6 + 0.5) / 1e6 AS score
        FROM tf JOIN dfq USING (term), corpus c
        GROUP BY tf.doc_id),
      bm AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
             FROM bscored ORDER BY score DESC, doc_id LIMIT 20),
      q AS (SELECT list_transform(generate_series(0, 63), i -> ((i % 7) - 3) / 4.0) AS qv),
      vscored AS (
        SELECT e.vec_id AS doc_id,
          list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * q.qv[i])))) AS score
        FROM embeddings e, q),
      vec AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
              FROM vscored ORDER BY score DESC, doc_id LIMIT 20),
      fused AS (
        SELECT doc_id, floor(sum(1.0 / (60 + rank)) * 1e6 + 0.5) / 1e6 AS rrf_score
        FROM (SELECT * FROM bm UNION ALL SELECT * FROM vec)
        GROUP BY doc_id)
      SELECT doc_id, CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rank, rrf_score
      FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 15""",
    "q_text_gopher" ->
      """WITH a AS (
        SELECT doc_id,
          regexp_replace(text, '\. ', chr(10), 'g')
          || (CASE WHEN doc_id % 5 = 0 THEN chr(10)||'• item one'||chr(10)||'• item two'||chr(10)||'• item three' ELSE '' END)
          || (CASE WHEN doc_id % 7 = 0 THEN chr(10)||'to be continued...'||chr(10)||'###' ELSE '' END)
          || (CASE WHEN doc_id % 11 = 0 THEN chr(10)||'repeat line'||chr(10)||'repeat line'||chr(10)||'repeat line' ELSE '' END)
          || (CASE WHEN doc_id % 13 = 0 THEN chr(10)||chr(10)||substr(regexp_replace(text, '\. ', chr(10), 'g'),1,80)||chr(10)||chr(10)||substr(regexp_replace(text, '\. ', chr(10), 'g'),1,80) ELSE '' END)
          AS t
        FROM documents),
      parts AS (
        SELECT doc_id, t,
          list_filter(regexp_split_to_array(t, '\s+'), w -> length(w) > 0) AS words,
          list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)), x -> x <> '') AS lines,
          list_filter(list_transform(regexp_split_to_array(t, '\n\s*\n'), x -> trim(x)), x -> x <> '') AS paras,
          list_filter(regexp_split_to_array(lower(t), '\W+'), x -> length(x) > 0) AS toks
        FROM a),
      m AS (
        SELECT doc_id,
          len(words) AS nw, len(lines) AS nl, len(paras) AS np,
          CASE WHEN len(words) > 0 THEN CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE) / len(words) ELSE 0.0 END AS mwl,
          CASE WHEN len(words) > 0 THEN CAST((len(string_split(t, '...')) - 1) + (length(t) - length(replace(t, '#', ''))) AS DOUBLE) / len(words) ELSE 0.0 END AS symr,
          CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines, x -> left(x,1) = chr(8226) OR left(x,2) = '- ' OR left(x,2) = '* ')) AS DOUBLE) / len(lines) ELSE 0.0 END AS bulletf,
          CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines, x -> right(x,3) = '...' OR right(x,1) = chr(8230))) AS DOUBLE) / len(lines) ELSE 0.0 END AS ellipf,
          CASE WHEN len(words) > 0 THEN CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / len(words) ELSE 0.0 END AS alphaf,
          len(list_intersect(list_distinct(toks), ['the','be','to','of','and','that','have','with'])) AS stophits,
          CASE WHEN len(lines) > 0 THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines) ELSE 0.0 END AS dlf,
          CASE WHEN len(paras) > 0 THEN CAST(len(paras) - len(list_distinct(paras)) AS DOUBLE) / len(paras) ELSE 0.0 END AS dpf,
          CASE WHEN coalesce(list_sum(list_transform(lines, x -> length(x))), 0) > 0 THEN CAST(list_sum(list_transform(lines, x -> length(x))) - list_sum(list_transform(list_distinct(lines), x -> length(x))) AS DOUBLE) / list_sum(list_transform(lines, x -> length(x))) ELSE 0.0 END AS dlcf,
          CASE WHEN coalesce(list_sum(list_transform(paras, x -> length(x))), 0) > 0 THEN CAST(list_sum(list_transform(paras, x -> length(x))) - list_sum(list_transform(list_distinct(paras), x -> length(x))) AS DOUBLE) / list_sum(list_transform(paras, x -> length(x))) ELSE 0.0 END AS dpcf
        FROM parts)
      SELECT doc_id, CAST(nw AS INTEGER) AS words,
        (nw >= 50 AND nw <= 100000) AS r_word_count,
        (mwl >= 3.0 AND mwl <= 10.0) AS r_mean_word_len,
        (symr < 0.1) AS r_symbol_ratio,
        (bulletf < 0.9) AS r_bullet_lines,
        (ellipf < 0.3) AS r_ellipsis_lines,
        (alphaf > 0.8) AS r_alpha_words,
        (stophits >= 2) AS r_stopwords,
        (dlf < 0.3) AS r_dup_lines,
        (dpf < 0.3) AS r_dup_paras,
        (dlcf < 0.2) AS r_dup_line_chars,
        (dpcf < 0.2) AS r_dup_para_chars,
        ((nw >= 50 AND nw <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0) AND (symr < 0.1)
          AND (bulletf < 0.9) AND (ellipf < 0.3) AND (alphaf > 0.8) AND (stophits >= 2)
          AND (dlf < 0.3) AND (dpf < 0.3) AND (dlcf < 0.2) AND (dpcf < 0.2)) AS pass
      FROM m""",
    "q_text_tfidf" ->
      """WITH toks AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      terms AS (SELECT doc_id, len(toks) AS n_terms, unnest(toks) AS term FROM toks),
      tc AS (SELECT doc_id, n_terms, term, count(*) AS cnt FROM terms GROUP BY 1, 2, 3),
      dfq AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tc GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
      scored AS (
        SELECT tc.doc_id, tc.term,
          CAST(tc.cnt AS DOUBLE) / tc.n_terms * ln(CAST(n.n_docs AS DOUBLE) / dfq.doc_freq) AS score
        FROM tc JOIN dfq USING (term), n)
      SELECT doc_id, term, rank, floor(score * 1000000 + 0.5) / 1000000 AS score
      FROM (SELECT doc_id, term, score,
              row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
            FROM scored)
      WHERE rank <= 5""",
    "q_vocab" ->
      """WITH t AS (
        SELECT doc_id,
          unnest(list_filter(regexp_split_to_array(lower(text), '\W+'), x -> length(x) > 0)) AS token
        FROM documents),
      a AS (SELECT token, CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM t GROUP BY token)
      SELECT token, n_tokens, n_docs,
        CAST(row_number() OVER (ORDER BY n_tokens DESC, token ASC) AS INTEGER) AS rank
      FROM a ORDER BY n_tokens DESC, token ASC LIMIT 50""",
    "q_pack_budget" ->
      """WITH toks AS (SELECT doc_id, lang,
          len(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0)) AS n_tok
        FROM documents)
      SELECT doc_id, lang, CAST(n_tok AS INTEGER) AS n_tok,
        CAST(floor(CAST(cum - n_tok AS DOUBLE) / 512) AS BIGINT) AS pack_id,
        CAST((cum - n_tok) % 512 AS BIGINT) AS pack_offset
      FROM (SELECT doc_id, lang, n_tok,
              sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM toks)""",
    "q_pack_materialize" ->
      """WITH RECURSIVE toks AS (
        SELECT doc_id, lang, text,
          len(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0)) AS n_tok,
          row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents),
      state AS (
        SELECT lang, rn, doc_id, text, CAST(n_tok AS BIGINT) AS n_tok,
               CAST(0 AS BIGINT) AS pack_id, CAST(n_tok AS BIGINT) AS fill
        FROM toks WHERE rn = 1
        UNION ALL
        SELECT t.lang, t.rn, t.doc_id, t.text, CAST(t.n_tok AS BIGINT),
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN s.pack_id + 1 ELSE s.pack_id END,
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN CAST(t.n_tok AS BIGINT) ELSE s.fill + t.n_tok END
        FROM toks t JOIN state s ON t.lang = s.lang AND t.rn = s.rn + 1)
      SELECT lang, pack_id,
        string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS pack_text,
        count(*) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM state GROUP BY 1, 2""",
    "q_length_batch" ->
      """WITH b AS (
        SELECT doc_id, lang, n_chars,
          CAST(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END
             + CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
             + CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END
             + CASE WHEN n_chars >= 3000 THEN 1 ELSE 0 END AS INTEGER) AS length_bucket
        FROM documents),
      r AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY lang, length_bucket ORDER BY doc_id) - 1 AS BIGINT) AS rn
        FROM b)
      SELECT doc_id, lang, n_chars, length_bucket,
        CAST(rn // 8 AS BIGINT) AS batch_id,
        CAST(rn % 8 AS INTEGER) AS batch_pos
      FROM r""",
    "q_length_batch_stats" ->
      """WITH b AS (
        SELECT doc_id, lang, n_chars,
          CAST(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END
             + CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
             + CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END
             + CASE WHEN n_chars >= 3000 THEN 1 ELSE 0 END AS INTEGER) AS length_bucket
        FROM documents),
      r AS (
        SELECT *, CAST(row_number() OVER (PARTITION BY lang, length_bucket ORDER BY doc_id) - 1 AS BIGINT) AS rn
        FROM b)
      SELECT lang, length_bucket, CAST(rn // 8 AS BIGINT) AS batch_id,
        count(*) AS n_rows,
        CAST(max(n_chars) AS BIGINT) AS max_len,
        CAST(sum(n_chars) AS BIGINT) AS sum_len,
        CAST(max(n_chars) * count(*) - sum(n_chars) AS BIGINT) AS pad_tokens
      FROM r GROUP BY 1, 2, 3""",
    // greedy next-fit is a per-shard recurrence — the oracle replays it with a
    // recursive CTE advancing one row per shard per iteration
    "q_pack_greedy" ->
      """WITH RECURSIVE toks AS (
        SELECT doc_id, lang,
          len(list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0)) AS n_tok,
          row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents),
      state AS (
        SELECT lang, rn, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
               CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_offset,
               CAST(n_tok AS BIGINT) AS fill
        FROM toks WHERE rn = 1
        UNION ALL
        SELECT t.lang, t.rn, t.doc_id, CAST(t.n_tok AS BIGINT),
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN s.pack_id + 1 ELSE s.pack_id END,
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN CAST(0 AS BIGINT) ELSE s.fill END,
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN CAST(t.n_tok AS BIGINT) ELSE s.fill + t.n_tok END
        FROM toks t JOIN state s ON t.lang = s.lang AND t.rn = s.rn + 1)
      SELECT doc_id, lang, CAST(n_tok AS INTEGER) AS n_tok, pack_id, pack_offset FROM state""",
    // streaming curated-ingest store: first-ingested copy per distinct
    // quality-passing text = min(doc_id) per md5(text) under ascending-id
    // micro-batches (see streamCurateGate)
    "q_stream_curate" ->
      """WITH toks AS (
        SELECT doc_id, text,
          list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      scored AS (
        SELECT doc_id, text,
          least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.4
            + (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END) * 0.4
            + (1.0 - least(1.0, (CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 4.0)) * 0.2 AS quality
        FROM toks),
      kept AS (SELECT doc_id, text FROM scored WHERE quality > 0.6)
      SELECT min(doc_id) AS doc_id, md5(text) AS content_hash
      FROM kept GROUP BY md5(text)""",
    // per-tier receipt totals: batch-boundary-independent sums
    "q_stream_funnel" ->
      """WITH toks AS (
        SELECT doc_id, text,
          list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      scored AS (
        SELECT doc_id, text,
          least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.4
            + (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END) * 0.4
            + (1.0 - least(1.0, (CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 4.0)) * 0.2 AS quality
        FROM toks),
      kept AS (SELECT doc_id, text FROM scored WHERE quality > 0.6),
      n_in AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      n_q AS (SELECT CAST(count(*) AS BIGINT) AS n FROM kept),
      n_d AS (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) AS n FROM kept)
      SELECT 'input' AS tier, n_in.n AS "rows", CAST(0 AS BIGINT) AS dropped FROM n_in
      UNION ALL
      SELECT 'quality', n_q.n, n_in.n - n_q.n FROM n_q, n_in
      UNION ALL
      SELECT 'dedup_store', n_d.n, n_q.n - n_d.n FROM n_d, n_q""",
    // streaming near-dup (LSH) store tier: the gate's constructed corpus
    // derives texts from doc_id alone, so DuckDB rebuilds the identical
    // corpus and replays survivor selection as min(doc_id) per
    // \W+-normalized token content (near-dup groups are token-identical by
    // construction — see streamNeardupGate's determinism argument)
    "q_stream_neardup" ->
      """WITH c AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS v FROM documents),
      t AS (SELECT doc_id,
        CASE WHEN v IN (0, 1) THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' ')
             WHEN v = 2 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ', ')
             WHEN v = 3 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' -- ')
             ELSE array_to_string([('t' || (g*31+12+k)) for k in range(8)], ' ')
        END AS text FROM c)
      SELECT min(doc_id) AS doc_id FROM t
      GROUP BY regexp_replace(lower(text), '\W+', ' ', 'g')""",
    // near-tier store lifecycle (ingest → compact → ingest against the
    // regenerated band index): same constructed corpus, but shards split
    // by doc_id % 3 — survivor per normalized text is the min (shard,
    // doc_id): the first-arriving shard's smallest member owns the store
    // entry, every later arrival dies in-batch or cross-store
    "q_dedup_store_bands" ->
      """WITH c AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS v, doc_id % 3 AS shard FROM documents),
      t AS (SELECT doc_id, shard,
        CASE WHEN v IN (0, 1) THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' ')
             WHEN v = 2 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ', ')
             WHEN v = 3 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' -- ')
             ELSE array_to_string([('t' || (g*31+12+k)) for k in range(8)], ' ')
        END AS text FROM c),
      r AS (SELECT doc_id, row_number() OVER (
              PARTITION BY regexp_replace(lower(text), '\W+', ' ', 'g')
              ORDER BY shard, doc_id) AS rn FROM t)
      SELECT doc_id FROM r WHERE rn = 1""",
    // store merge: B's internal dedup keeps each normalized text's min
    // shard-2 id, the replay drops those with an earlier A-side survivor —
    // bit-identical to ingesting shard 2 into A directly, so the oracle is
    // exactly q_dedup_store_bands'
    "q_dedup_store_merge" ->
      """WITH c AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS v, doc_id % 3 AS shard FROM documents),
      t AS (SELECT doc_id, shard,
        CASE WHEN v IN (0, 1) THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' ')
             WHEN v = 2 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ', ')
             WHEN v = 3 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' -- ')
             ELSE array_to_string([('t' || (g*31+12+k)) for k in range(8)], ' ')
        END AS text FROM c),
      r AS (SELECT doc_id, row_number() OVER (
              PARTITION BY regexp_replace(lower(text), '\W+', ' ', 'g')
              ORDER BY shard, doc_id) AS rn FROM t)
      SELECT doc_id FROM r WHERE rn = 1""",
    // re-bucketed lifecycle: the bucket function is pure LAYOUT — growing
    // it at compaction must leave survivorship bit-identical, so the
    // oracle is exactly q_dedup_store_bands'
    "q_dedup_store_rebucket" ->
      """WITH c AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS v, doc_id % 3 AS shard FROM documents),
      t AS (SELECT doc_id, shard,
        CASE WHEN v IN (0, 1) THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' ')
             WHEN v = 2 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ', ')
             WHEN v = 3 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' -- ')
             ELSE array_to_string([('t' || (g*31+12+k)) for k in range(8)], ' ')
        END AS text FROM c),
      r AS (SELECT doc_id, row_number() OVER (
              PARTITION BY regexp_replace(lower(text), '\W+', ' ', 'g')
              ORDER BY shard, doc_id) AS rn FROM t)
      SELECT doc_id FROM r WHERE rn = 1""",
    // point lookup: the probe is group 1's base text, so the answer is that
    // group's near-cluster survivor (v<4 members are token-identical; the
    // survivor is the min (shard, doc_id) of the cluster) at Jaccard 1.0
    "q_dedup_lookup" ->
      """WITH c AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS v, doc_id % 3 AS shard FROM documents),
      r AS (SELECT doc_id, g, v, row_number() OVER (
              PARTITION BY g, (v < 4) ORDER BY shard, doc_id) AS rn FROM c)
      SELECT doc_id, CAST(1.0 AS DOUBLE) AS jaccard FROM r WHERE rn = 1 AND g = 1 AND v < 4""",
    // batched lookup: probe 0 = group 1's base text, probe 1 = group 3's;
    // each resolves to that group's near-cluster survivor (min (shard,
    // doc_id) of the token-identical members) at Jaccard 1.0; the disjoint
    // probe 2 matches nothing
    "q_dedup_lookup_batch" ->
      """WITH c AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS v, doc_id % 3 AS shard FROM documents),
      r AS (SELECT doc_id, g, v, row_number() OVER (
              PARTITION BY g, (v < 4) ORDER BY shard, doc_id) AS rn FROM c),
      p AS (SELECT CAST(0 AS BIGINT) AS probe_id, CAST(1 AS BIGINT) AS g
            UNION ALL SELECT CAST(1 AS BIGINT), CAST(3 AS BIGINT))
      SELECT p.probe_id, r.doc_id, CAST(1.0 AS DOUBLE) AS jaccard
      FROM p JOIN r ON r.g = p.g AND r.rn = 1 AND r.v < 4""",
    // backfill lifecycle: shards 0-1 exact-only (raw-text dedup, first
    // shard wins then smallest id), signatures backfilled, shard 2 near-
    // tier — keeps its per-normalized-text minimum unless the normalized
    // text already survived phases 0-1
    "q_dedup_backfill" ->
      """WITH c AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS v, doc_id % 3 AS shard FROM documents),
      t AS (SELECT doc_id, shard,
        CASE WHEN v IN (0, 1) THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' ')
             WHEN v = 2 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ', ')
             WHEN v = 3 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' -- ')
             ELSE array_to_string([('t' || (g*31+12+k)) for k in range(8)], ' ')
        END AS text FROM c),
      e AS (SELECT doc_id, text, row_number() OVER (PARTITION BY text ORDER BY shard, doc_id) AS rn
            FROM t WHERE shard < 2),
      store AS (SELECT doc_id, regexp_replace(lower(text), '\W+', ' ', 'g') AS ntext FROM e WHERE rn = 1),
      b AS (SELECT doc_id, regexp_replace(lower(text), '\W+', ' ', 'g') AS ntext,
              row_number() OVER (PARTITION BY regexp_replace(lower(text), '\W+', ' ', 'g')
                                 ORDER BY doc_id) AS rn
            FROM t WHERE shard = 2)
      SELECT doc_id FROM store
      UNION ALL
      SELECT doc_id FROM b WHERE rn = 1 AND NOT EXISTS (
        SELECT 1 FROM store s WHERE s.ntext = b.ntext)""",
    // tombstoned retraction: phase-1 survivors (shards 0-1, near-tier)
    // minus the removal rule (doc_id % 5 < 2), plus shard 2's
    // per-normalized-text minima whose normalized text has no LIVE
    // phase-1 survivor — a near-dup of a removed doc lands, near-dups of
    // live docs die
    "q_dedup_tombstone" ->
      """WITH c AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS v, doc_id % 3 AS shard FROM documents),
      t AS (SELECT doc_id, shard,
        CASE WHEN v IN (0, 1) THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' ')
             WHEN v = 2 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ', ')
             WHEN v = 3 THEN array_to_string([('t' || (g*31+k)) for k in range(12)], ' -- ')
             ELSE array_to_string([('t' || (g*31+12+k)) for k in range(8)], ' ')
        END AS text FROM c),
      r AS (SELECT doc_id, text, row_number() OVER (
              PARTITION BY regexp_replace(lower(text), '\W+', ' ', 'g')
              ORDER BY shard, doc_id) AS rn FROM t WHERE shard < 2),
      live AS (SELECT doc_id, regexp_replace(lower(text), '\W+', ' ', 'g') AS ntext
               FROM r WHERE rn = 1 AND doc_id % 5 >= 2),
      b AS (SELECT doc_id, regexp_replace(lower(text), '\W+', ' ', 'g') AS ntext,
              row_number() OVER (PARTITION BY regexp_replace(lower(text), '\W+', ' ', 'g')
                                 ORDER BY doc_id) AS rn
            FROM t WHERE shard = 2)
      SELECT doc_id FROM live
      UNION ALL
      SELECT doc_id FROM b WHERE rn = 1 AND NOT EXISTS (
        SELECT 1 FROM live s WHERE s.ntext = b.ntext)""",
    // $graphLookup's iterative BFS joins, replayed as a recursive CTE over
    // the same derived parent-pointer tree (1-based p_partkey: chains end
    // at keys 1 and 2, whose computed parent 0 matches no row on either
    // side)
    "q_graph_lookup" ->
      """WITH RECURSIVE tree AS (
        SELECT p_partkey, CAST(floor((p_partkey - 1) / 2) AS BIGINT) AS parent FROM part
      ), anc AS (
        SELECT t.p_partkey, t2.p_partkey AS anc_key, t2.parent AS nxt, CAST(0 AS BIGINT) AS d
          FROM tree t JOIN tree t2 ON t2.p_partkey = t.parent
        UNION ALL
        SELECT a.p_partkey, t3.p_partkey, t3.parent, a.d + 1
          FROM anc a JOIN tree t3 ON t3.p_partkey = a.nxt
      )
      SELECT p_partkey, anc_key, d FROM anc""",
    // $merge mode matrix (whenMatched=merge + whenNotMatched=insert) as a
    // FULL OUTER JOIN: incoming's non-null field wins on matched keys, the
    // target-only c_nationkey survives (null on inserted rows)
    "q_merge_upsert" ->
      """WITH target AS (
        SELECT c_custkey, c_name, c_acctbal, c_nationkey FROM customer WHERE c_custkey % 2 = 0
      ), src AS (
        SELECT c_custkey, concat('upd:', c_name) AS c_name, c_acctbal + 1000.0 AS c_acctbal
        FROM customer WHERE c_custkey % 3 = 0
      )
      SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
             COALESCE(s.c_name, t.c_name) AS c_name,
             COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal,
             t.c_nationkey
      FROM target t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey""",
    "q_corpus_curate" ->
      """WITH RECURSIVE input AS (
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text, lang FROM documents WHERE doc_id < 50),
      survivors AS (
        SELECT doc_id, text, lang FROM (
          SELECT doc_id, text, lang,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM input) WHERE rn = 1),
      scored AS (
        SELECT doc_id, lang,
          least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.4
            + (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END) * 0.4
            + (1.0 - least(1.0, (CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 4.0)) * 0.2 AS quality,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
            '\+[0-9]{7,15}\b', '<PHONE>', 'g'),
            '\b[0-9]{13,19}\b', '<NUMBER>', 'g') AS clean
        FROM (SELECT doc_id, lang, text,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM survivors)),
      kept AS (
        SELECT doc_id, lang, quality,
          len(list_filter(regexp_split_to_array(lower(clean), '\W+'), t -> length(t) > 0)) AS n_tok
        FROM scored WHERE quality > 0.6),
      toks2 AS (
        SELECT doc_id, lang, quality, n_tok,
          row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn FROM kept),
      state AS (
        SELECT lang, rn, doc_id, quality, CAST(n_tok AS BIGINT) AS n_tok,
               CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_offset,
               CAST(n_tok AS BIGINT) AS fill
        FROM toks2 WHERE rn = 1
        UNION ALL
        SELECT t.lang, t.rn, t.doc_id, t.quality, CAST(t.n_tok AS BIGINT),
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN s.pack_id + 1 ELSE s.pack_id END,
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN CAST(0 AS BIGINT) ELSE s.fill END,
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN CAST(t.n_tok AS BIGINT) ELSE s.fill + t.n_tok END
        FROM toks2 t JOIN state s ON t.lang = s.lang AND t.rn = s.rn + 1)
      SELECT doc_id, lang, quality, CAST(n_tok AS INTEGER) AS n_tok, pack_id, pack_offset FROM state""",
    "q_corpus_curate_v2" ->
      """WITH RECURSIVE u AS (
        SELECT doc_id, text, lang,
          (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
            || '://www.site.example.org'
            || (CASE WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
            || '/P/' || CAST(doc_id % 50 AS VARCHAR)
            || (CASE WHEN doc_id % 3 < 2 THEN '?a=1&b=2' ELSE '' END) AS canon
        FROM documents),
      w AS (SELECT canon, min(doc_id) AS keep FROM u GROUP BY 1),
      urld AS (SELECT u.doc_id, u.text, u.lang FROM u JOIN w ON u.doc_id = w.keep),
      survivors AS (
        SELECT doc_id, text, lang FROM (
          SELECT doc_id, text, lang,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM urld) WHERE rn = 1),
      toksall AS (
        SELECT list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS t
        FROM documents),
      c1 AS (SELECT gram, count(*) AS cnt FROM (SELECT unnest(t) AS gram FROM toksall) GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM c1),
      c2 AS (SELECT gram, count(*) AS cnt FROM (
        SELECT unnest(CASE WHEN len(t) >= 2 THEN list_transform(generate_series(0, len(t)-2),
          i -> array_to_string(t[i+1:i+2], ' ')) ELSE [] END) AS gram FROM toksall) GROUP BY 1),
      tokss AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS t
        FROM survivors),
      pos AS (SELECT doc_id, t[i+1] AS g1,
          CASE WHEN i >= 1 THEN array_to_string(t[i:i+1], ' ') END AS g2,
          CASE WHEN i >= 1 THEN t[i] END AS c2g
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-1)) AS i FROM tokss)),
      joined AS (SELECT p.doc_id, p.g2, k1.cnt AS cg1, k2.cnt AS cg2, kc2.cnt AS cc2, tt.n AS n
        FROM pos p
        LEFT JOIN c1 k1 ON p.g1 = k1.gram
        LEFT JOIN c2 k2 ON p.g2 = k2.gram
        LEFT JOIN c1 kc2 ON p.c2g = kc2.gram
        CROSS JOIN tot tt),
      sa AS (SELECT doc_id, g2, cg2, cc2,
          CASE WHEN cg1 IS NOT NULL THEN cg1 / n ELSE 0.4 / n END AS s FROM joined),
      sb AS (SELECT doc_id,
          CASE WHEN g2 IS NULL THEN s WHEN cg2 IS NOT NULL THEN CAST(cg2 AS DOUBLE) / cc2
               ELSE 0.4 * s END AS s FROM sa),
      lmagg AS (SELECT doc_id, floor(avg(log10(s)) * 1e6 + 0.5) / 1e6 AS avg_logp FROM sb GROUP BY 1),
      lmkept AS (SELECT sv.doc_id, sv.text, sv.lang,
          floor(power(10, -a.avg_logp) * 1e6 + 0.5) / 1e6 AS ppl
        FROM survivors sv JOIN lmagg a USING (doc_id)
        WHERE floor(power(10, -a.avg_logp) * 1e6 + 0.5) / 1e6 <= 30.0),
      scored AS (
        SELECT doc_id, lang, ppl,
          least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.4
            + (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END) * 0.4
            + (1.0 - least(1.0, (CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 4.0)) * 0.2 AS quality,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
            '\+[0-9]{7,15}\b', '<PHONE>', 'g'),
            '\b[0-9]{13,19}\b', '<NUMBER>', 'g') AS clean
        FROM (SELECT doc_id, lang, ppl, text,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM lmkept)),
      kept AS (
        SELECT doc_id, lang, ppl, quality,
          len(list_filter(regexp_split_to_array(lower(clean), '\W+'), t -> length(t) > 0)) AS n_tok
        FROM scored WHERE quality > 0.6),
      toks2 AS (
        SELECT doc_id, lang, ppl, quality, n_tok,
          row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn FROM kept),
      state AS (
        SELECT lang, rn, doc_id, ppl, quality, CAST(n_tok AS BIGINT) AS n_tok,
               CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_offset,
               CAST(n_tok AS BIGINT) AS fill
        FROM toks2 WHERE rn = 1
        UNION ALL
        SELECT t.lang, t.rn, t.doc_id, t.ppl, t.quality, CAST(t.n_tok AS BIGINT),
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN s.pack_id + 1 ELSE s.pack_id END,
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN CAST(0 AS BIGINT) ELSE s.fill END,
          CASE WHEN s.fill > 0 AND s.fill + t.n_tok > 512 THEN CAST(t.n_tok AS BIGINT) ELSE s.fill + t.n_tok END
        FROM toks2 t JOIN state s ON t.lang = s.lang AND t.rn = s.rn + 1)
      SELECT doc_id, lang, ppl, quality, CAST(n_tok AS INTEGER) AS n_tok, pack_id, pack_offset FROM state""",
    // thresholds are round(f * 2^32) in lowercase hex, the mix() recipe
    "q_corpus_mix" ->
      """WITH k AS (
        SELECT doc_id, lang, source,
          substring(md5(concat_ws(chr(1),
            coalesce(CAST(doc_id AS VARCHAR), chr(2)),
            coalesce(CAST(lang AS VARCHAR), chr(2)),
            coalesce(CAST(source AS VARCHAR), chr(2)))), 1, 8) AS h
        FROM documents)
      SELECT doc_id, lang, source FROM k
      WHERE CASE lang
        WHEN 'de' THEN TRUE
        WHEN 'en' THEN h < '4ccccccd'
        WHEN 'fr' THEN h < '26666666'
        ELSE h < '0ccccccd' END""",
    "q_corpus_stats" ->
      """WITH t AS (SELECT lang, source, text,
          list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      per AS (SELECT lang, source, text, len(toks) AS nt,
          least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.4
            + (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END) * 0.4
            + (1.0 - least(1.0, (CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 4.0)) * 0.2 AS q
        FROM t),
      base AS (SELECT lang, source, count(*) AS n_docs,
          CAST(sum(nt) AS BIGINT) AS n_tokens,
          CAST(sum(length(text)) AS BIGINT) AS n_chars,
          avg(q) AS mq, avg(CAST(nt AS DOUBLE)) AS mt
        FROM per GROUP BY 1, 2),
      d AS (SELECT lang, source, count(*) AS n_distinct_texts FROM
          (SELECT DISTINCT lang, source, md5(text) AS h FROM documents) GROUP BY 1, 2)
      SELECT b.lang, b.source, n_docs, n_tokens, n_chars, n_distinct_texts,
        floor((1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs) * 1e6 + 0.5) / 1e6 AS dup_ratio,
        floor(mq * 1e6 + 0.5) / 1e6 AS mean_quality,
        floor(mt * 1e6 + 0.5) / 1e6 AS mean_tokens
      FROM base b JOIN d USING (lang, source)""",
    "q_corpus_manifest" ->
      """SELECT lang, source, count(*) AS n_docs,
        CAST(sum(length(text)) AS BIGINT) AS n_chars,
        count(DISTINCT md5(text)) AS n_distinct_texts,
        CAST(sum(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
             % 2305843009213693951 AS BIGINT) AS content_fingerprint,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM documents GROUP BY 1, 2""",
    "q_corpus_drift" ->
      """WITH feats AS (
        SELECT doc_id % 2 AS half, 'lang' AS feature,
          coalesce(CAST(lang AS VARCHAR), '__null__') AS bucket FROM documents
        UNION ALL SELECT doc_id % 2, 'source',
          coalesce(CAST(source AS VARCHAR), '__null__') FROM documents
        UNION ALL SELECT doc_id % 2, 'length',
          CASE WHEN doc_id % 4 = 0 THEN '__null__'
               ELSE CAST(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END
                  + CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
                  + CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END
                  + CASE WHEN n_chars >= 3000 THEN 1 ELSE 0 END AS VARCHAR) END FROM documents),
      ha AS (SELECT feature, bucket, count(*) AS n_a FROM feats WHERE half = 0 GROUP BY 1, 2),
      hb AS (SELECT feature, bucket, count(*) AS n_b FROM feats WHERE half = 1 GROUP BY 1, 2),
      j AS (
        SELECT coalesce(ha.feature, hb.feature) AS feature,
               coalesce(ha.bucket, hb.bucket) AS bucket,
               coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        FROM ha FULL OUTER JOIN hb ON ha.feature = hb.feature AND ha.bucket = hb.bucket),
      t AS (
        SELECT *,
          greatest(CAST(n_a AS DOUBLE) / CAST(sum(n_a) OVER (PARTITION BY feature) AS DOUBLE), 1e-6) AS pa,
          greatest(CAST(n_b AS DOUBLE) / CAST(sum(n_b) OVER (PARTITION BY feature) AS DOUBLE), 1e-6) AS pb
        FROM j)
      SELECT feature, bucket, n_a, n_b,
        floor(pa * 1e6 + 0.5) / 1e6 AS p_a,
        floor(pb * 1e6 + 0.5) / 1e6 AS p_b,
        floor((pa - pb) * ln(pa / pb) * 1e6 + 0.5) / 1e6 AS psi
      FROM t""",
    "q_temperature_mix" ->
      """WITH d AS (SELECT doc_id, text, lang, source, n_chars,
          CASE WHEN doc_id % 10 < 6 THEN 'big'
               WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'small' END AS bucket
        FROM documents),
      c AS (SELECT bucket, count(*) AS n FROM d GROUP BY 1),
      f AS (SELECT bucket, least(1.0, power(n, -0.5) / (SELECT max(power(n, -0.5)) FROM c)) AS f FROM c),
      t AS (SELECT bucket, f,
          printf('%08x', CAST(greatest(1, floor(f * 4294967296.0 + 0.5)) AS BIGINT)) AS th
        FROM f),
      k AS (SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars, d.bucket, t.th, t.f
        FROM d JOIN t USING (bucket))
      SELECT doc_id, text, lang, source, n_chars, bucket FROM k
      WHERE f >= 1.0 OR substring(md5(concat_ws(chr(1),
        coalesce(CAST(doc_id AS VARCHAR), chr(2)),
        coalesce(CAST(text AS VARCHAR), chr(2)),
        coalesce(CAST(lang AS VARCHAR), chr(2)),
        coalesce(CAST(source AS VARCHAR), chr(2)),
        coalesce(CAST(n_chars AS VARCHAR), chr(2)),
        coalesce(CAST(bucket AS VARCHAR), chr(2)))), 1, 8) < th""",
    "q_split" ->
      """SELECT doc_id, text, lang, source, n_chars,
        CASE WHEN h < 'cccccccd' THEN 'train'
             WHEN h < 'e6666666' THEN 'val' ELSE 'test' END AS split
      FROM (SELECT *, substring(md5(concat_ws(chr(1),
          coalesce(CAST(doc_id AS VARCHAR), chr(2)),
          coalesce(CAST(text AS VARCHAR), chr(2)),
          coalesce(CAST(lang AS VARCHAR), chr(2)),
          coalesce(CAST(source AS VARCHAR), chr(2)),
          coalesce(CAST(n_chars AS VARCHAR), chr(2)))), 1, 8) AS h
        FROM documents)""",
    "q_epoch_mix" ->
      """WITH d AS (SELECT doc_id, text, lang, source, n_chars,
          CASE WHEN doc_id % 10 < 6 THEN 'big'
               WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'small' END AS bucket
        FROM documents),
      k AS (SELECT *, substring(md5(concat_ws(chr(1),
          coalesce(CAST(doc_id AS VARCHAR), chr(2)),
          coalesce(CAST(text AS VARCHAR), chr(2)),
          coalesce(CAST(lang AS VARCHAR), chr(2)),
          coalesce(CAST(source AS VARCHAR), chr(2)),
          coalesce(CAST(n_chars AS VARCHAR), chr(2)),
          coalesce(CAST(bucket AS VARCHAR), chr(2)))), 1, 8) AS h
        FROM d),
      n AS (SELECT *, CASE bucket
          WHEN 'big' THEN (CASE WHEN h < '80000000' THEN 1 ELSE 0 END)
          WHEN 'mid' THEN 1
          ELSE 2 + (CASE WHEN h < '80000000' THEN 1 ELSE 0 END) END AS nn
        FROM k)
      SELECT doc_id, text, lang, source, n_chars, bucket,
        unnest(generate_series(0, CAST(nn AS BIGINT) - 1)) AS epoch
      FROM n WHERE nn >= 1""",
    "q_score_keep" ->
      """SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
          CAST(CAST(concat('0x', substring(md5(concat_ws(chr(1),
            coalesce(CAST(doc_id AS VARCHAR), chr(2)),
            coalesce(CAST(lang AS VARCHAR), chr(2)),
            coalesce(CAST(n_chars AS VARCHAR), chr(2)))), 1, 8)) AS BIGINT) AS DOUBLE)
            / 4294967296.0 AS frac
        FROM documents)
      WHERE frac < least(greatest((n_chars % 100) / 100.0, 0.0), 1.0)""",
    // keep while the exclusive prefix of already-kept chars is under the
    // stratum budget; absent/zero-budget strata drop
    "q_token_budget_mix" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
          md5(concat_ws(chr(1),
            coalesce(CAST(doc_id AS VARCHAR), chr(2)),
            coalesce(CAST(lang AS VARCHAR), chr(2)),
            coalesce(CAST(n_chars AS VARCHAR), chr(2)))) AS h
        FROM documents),
      p AS (SELECT doc_id, lang, n_chars,
          CAST(coalesce(sum(n_chars) OVER (PARTITION BY lang ORDER BY h
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
        FROM d)
      SELECT doc_id, lang, n_chars FROM p
      WHERE prefix < CASE lang WHEN 'de' THEN 5000 WHEN 'en' THEN 20000
        WHEN 'es' THEN 0 WHEN 'fr' THEN 21000 ELSE 0 END""",
    "q_training_order" ->
      """WITH h AS (SELECT doc_id, lang, source,
          md5(concat_ws(chr(1), 'r4', coalesce(CAST(doc_id AS VARCHAR), chr(2)))) AS hh
        FROM documents),
      s AS (SELECT doc_id, lang, source, hh,
          CAST(concat('0x', substring(hh, 1, 8)) AS BIGINT) % 8 AS shard FROM h)
      SELECT doc_id, lang, source,
        CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS BIGINT) - 1 AS pos,
        shard
      FROM s""",
    "q_sample_stratified" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          row_number() OVER (PARTITION BY o_orderstatus ORDER BY
            md5(concat_ws(chr(1),
              coalesce(CAST(o_orderkey AS VARCHAR), chr(2)),
              coalesce(CAST(o_custkey AS VARCHAR), chr(2)),
              coalesce(CAST(o_orderstatus AS VARCHAR), chr(2))))) AS rn
        FROM orders) WHERE rn <= 7""",
    "q_sample_fraction" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      WHERE substring(md5(concat_ws(chr(1),
        coalesce(CAST(o_orderkey AS VARCHAR), chr(2)),
        coalesce(CAST(o_custkey AS VARCHAR), chr(2)),
        coalesce(CAST(o_orderstatus AS VARCHAR), chr(2)))), 1, 8) < '1999999a'""",
    "q_dedup_exact" ->
      "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies FROM documents GROUP BY 1",
    "q_dedup_ngram" ->
      """WITH sh AS (
        SELECT doc_id, lang, source,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id, lang, source,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.05""",
    "q_dedup_embedding_lsh" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])))
             * sqrt(list_sum(list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])))) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])))
             * sqrt(list_sum(list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])))) >= 0.45""",
    "q_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])))
             * sqrt(list_sum(list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])))) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])))
             * sqrt(list_sum(list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])))) >= 0.45""",
    "q_dup_ngram" ->
      """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents)),
      g AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      dc AS (SELECT g, count(DISTINCT doc_id) AS docs FROM g GROUP BY 1),
      per AS (SELECT g.doc_id, count(*) AS n_ngrams,
          CAST(sum(CASE WHEN dc.docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM g JOIN dc USING (g) GROUP BY 1)
      SELECT d.doc_id, coalesce(p.n_ngrams, 0) AS n_ngrams, coalesce(p.n_dup, 0) AS n_dup,
        coalesce(floor(CAST(p.n_dup AS DOUBLE) / p.n_ngrams * 1e6 + 0.5) / 1e6, 0.0) AS dup_fraction
      FROM documents d LEFT JOIN per p USING (doc_id)""",
    "q_decontam_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ev AS (SELECT v FROM e WHERE vec_id % 37 = 0),
      c AS (SELECT vec_id, v FROM e WHERE vec_id % 37 <> 0),
      hits AS (
        SELECT c.vec_id,
          list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * ev.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(ev.v)), i -> ev.v[i] * ev.v[i])))) AS cos
        FROM c, ev)
      SELECT vec_id, max(cos) AS max_cos FROM hits
      WHERE cos >= 0.3 GROUP BY 1""",
    "q_decontam_remove" ->
      """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 4),
                      i -> array_to_string(toks[i+1:i+4], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents)),
      ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 37 = 0),
      dg AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 37 <> 0),
      bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN ev ON dg.g = ev.g)
      SELECT d.* FROM documents d
      WHERE d.doc_id % 37 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM bad)""",
    "q_decontam_semantic_remove" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ev AS (SELECT v FROM e WHERE vec_id % 37 = 0),
      c AS (SELECT vec_id, v FROM e WHERE vec_id % 37 <> 0),
      bad AS (
        SELECT DISTINCT c.vec_id
        FROM c, ev
        WHERE list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * ev.v[i]))
          / (sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))
             * sqrt(list_sum(list_transform(generate_series(1, len(ev.v)), i -> ev.v[i] * ev.v[i])))) >= 0.3)
      SELECT vec_id, label FROM embeddings
      WHERE vec_id % 37 <> 0 AND vec_id NOT IN (SELECT vec_id FROM bad)""",
    "q_decontam_fuzzy" ->
      """WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 37 <> 0
        UNION ALL
        SELECT doc_id + 20000, text || ' tail words appended'
        FROM documents WHERE doc_id % 37 = 0 AND doc_id < 400),
      shc AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM corpus)),
      she AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents WHERE doc_id % 37 = 0)),
      j AS (
        SELECT c.doc_id,
          CAST(len(list_intersect(c.sh, e.sh)) AS DOUBLE)
            / (len(c.sh) + len(e.sh) - len(list_intersect(c.sh, e.sh))) AS jac
        FROM shc c JOIN she e ON true)
      SELECT doc_id, max(jac) AS max_jaccard FROM j WHERE jac >= 0.5 GROUP BY 1""",
    "q_decontam_fuzzy_remove" ->
      """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents)),
      bad AS (
        SELECT DISTINCT c.doc_id
        FROM sh c JOIN sh e ON c.doc_id % 37 <> 0 AND e.doc_id % 37 = 0
        WHERE CAST(len(list_intersect(c.sh, e.sh)) AS DOUBLE)
            / (len(c.sh) + len(e.sh) - len(list_intersect(c.sh, e.sh))) >= 0.5)
      SELECT d.* FROM documents d
      WHERE d.doc_id % 37 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM bad)""",
    // same replay as q_dedup_spans, with the hot-gram set swapped for the
    // eval side's positional 4-grams
    "q_decontam_spans" ->
      """WITH tok AS (SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      eg AS (SELECT DISTINCT
          array_to_string(toks[CAST(i+1 AS INT):CAST(i+4 AS INT)], ' ') AS gram
        FROM (SELECT toks, unnest(generate_series(0, len(toks) - 4)) AS i
              FROM tok WHERE doc_id % 37 = 0 AND len(toks) >= 4)),
      c AS (SELECT doc_id, toks FROM tok WHERE doc_id % 37 <> 0),
      g AS (
        SELECT doc_id, i AS s,
          array_to_string(toks[CAST(i+1 AS INT):CAST(i+4 AS INT)], ' ') AS gram
        FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 4)) AS i
              FROM c WHERE len(toks) >= 4)),
      ds AS (SELECT doc_id, list_sort(list(DISTINCT s)) AS starts
             FROM g JOIN eg USING (gram) GROUP BY doc_id),
      k AS (SELECT t.doc_id, t.toks, coalesce(d.starts, []) AS starts
            FROM c t LEFT JOIN ds d USING (doc_id))
      SELECT doc_id,
        coalesce(array_to_string(list_filter(toks, (t, i) ->
          len(list_filter(starts, s -> s >= i - 4 AND s <= i - 1)) = 0), ' '), '') AS cleaned_text,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(toks) - len(list_filter(toks, (t, i) ->
          len(list_filter(starts, s -> s >= i - 4 AND s <= i - 1)) = 0)) AS BIGINT) AS n_removed
      FROM k""",
    "q_decontam_report" ->
      """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 4),
                      i -> array_to_string(toks[i+1:i+4], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents)),
      corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id % 37 <> 0 AND doc_id % 41 <> 0),
      ea AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 37 = 0),
      eb AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 41 = 0),
      dg AS (SELECT doc_id, unnest(sh) AS g FROM corpus),
      ca AS (SELECT count(*) AS nc FROM
        (SELECT dg.doc_id FROM dg JOIN ea ON dg.g = ea.g GROUP BY 1)),
      cb AS (SELECT count(*) AS nc FROM
        (SELECT dg.doc_id FROM dg JOIN eb ON dg.g = eb.g GROUP BY 1)),
      tot AS (SELECT count(*) AS n_docs FROM corpus)
      SELECT 'eval_a' AS eval_name, CAST(ca.nc AS BIGINT) AS n_contaminated,
        tot.n_docs, CAST(ca.nc AS DOUBLE) / tot.n_docs AS contamination_rate
      FROM ca, tot
      UNION ALL
      SELECT 'eval_b', CAST(cb.nc AS BIGINT),
        tot.n_docs, CAST(cb.nc AS DOUBLE) / tot.n_docs
      FROM cb, tot""",
    "q_dedup_semantic" ->
      """WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      half AS (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])))
             * sqrt(list_sum(list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])))) >= 0.45),
      prs AS (SELECT src, dst FROM half UNION ALL SELECT dst, src FROM half),
      reach(id, lbl) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT p.dst, r.lbl FROM reach r JOIN prs p ON p.src = r.id WHERE r.lbl < p.dst)
      SELECT e2.vec_id
      FROM embeddings e2
      JOIN (SELECT id, min(lbl) AS comp FROM reach GROUP BY id) c ON c.id = e2.vec_id
      WHERE c.comp = e2.vec_id""",
    "q_dedup_minhash" ->
      """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5""",
    "q_vector_search" ->
      """WITH q AS (SELECT list_transform(generate_series(0, 63), i -> ((i % 7) - 3) / 4.0) AS qv),
      scored AS (
        SELECT e.vec_id,
          list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * q.qv[i])))) AS score
        FROM embeddings e, q)
      SELECT vec_id, score FROM scored ORDER BY score DESC LIMIT 25""",
    // exact-tier ingest survivorship is min over (shard, doc_id) per content
    // hash (in-batch min-id + first-arrival-wins anti-join); compaction may
    // change only the file layout, never the rows
    "q_dedup_store_compact" ->
      """SELECT doc_id FROM (
        SELECT doc_id,
          row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id % 3, doc_id) AS rn
        FROM documents) t
      WHERE rn = 1""",
    "q_dedup_incr_exact" ->
      """WITH evens AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      news AS (
        SELECT o.doc_id,
          CASE WHEN o.doc_id % 7 = 1 AND e.text IS NOT NULL THEN e.text ELSE o.text END AS text
        FROM documents o LEFT JOIN evens e ON e.doc_id = o.doc_id - 1
        WHERE o.doc_id % 2 = 1),
      batch AS (
        SELECT doc_id, text FROM (
          SELECT doc_id, text,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM news)
        WHERE rn = 1)
      SELECT b.doc_id FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM evens e WHERE md5(e.text) = md5(b.text))""",
    // bloom pre-filter changes the plan, never the answer — same oracle
    "q_dedup_incr_bloom" ->
      """WITH evens AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      news AS (
        SELECT o.doc_id,
          CASE WHEN o.doc_id % 7 = 1 AND e.text IS NOT NULL THEN e.text ELSE o.text END AS text
        FROM documents o LEFT JOIN evens e ON e.doc_id = o.doc_id - 1
        WHERE o.doc_id % 2 = 1),
      batch AS (
        SELECT doc_id, text FROM (
          SELECT doc_id, text,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM news)
        WHERE rn = 1)
      SELECT b.doc_id FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM evens e WHERE md5(e.text) = md5(b.text))""",
    "q_dedup_spans" ->
      """WITH tok AS (SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      g AS (
        SELECT doc_id, i AS s,
          array_to_string(toks[CAST(i+1 AS INT):CAST(i+3 AS INT)], ' ') AS gram
        FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 3)) AS i
              FROM tok WHERE len(toks) >= 3)),
      hot AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
      ds AS (SELECT doc_id, list_sort(list(DISTINCT s)) AS starts
             FROM g JOIN hot USING (gram) GROUP BY doc_id),
      k AS (SELECT t.doc_id, t.toks, coalesce(d.starts, []) AS starts
            FROM tok t LEFT JOIN ds d USING (doc_id))
      SELECT doc_id,
        coalesce(array_to_string(list_filter(toks, (t, i) ->
          len(list_filter(starts, s -> s >= i - 3 AND s <= i - 1)) = 0), ' '), '') AS cleaned_text,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(toks) - len(list_filter(toks, (t, i) ->
          len(list_filter(starts, s -> s >= i - 3 AND s <= i - 1)) = 0)) AS BIGINT) AS n_removed
      FROM k""",
    "q_chunk_index" ->
      """WITH tok AS (SELECT doc_id, lang,
        list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      o AS (SELECT doc_id, lang, len(toks) AS n,
        sum(len(toks) + 1) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (len(toks) + 1) AS off
        FROM tok),
      x AS (SELECT doc_id, lang, n, off,
        unnest(generate_series(CAST(floor(off / 128.0) AS BIGINT),
                               CAST(floor((off + n - 1) / 128.0) AS BIGINT))) AS ex
        FROM o WHERE n > 0)
      SELECT doc_id, lang, ex AS example_id,
        CAST(greatest(0, ex * 128 - off) AS BIGINT) AS slice_start,
        CAST(least(off + n, (ex + 1) * 128) - greatest(off, ex * 128) AS BIGINT) AS slice_len,
        CAST(greatest(0, off - ex * 128) AS BIGINT) AS example_pos
      FROM x""",
    "q_chunk_materialize" ->
      """WITH tok AS (SELECT doc_id, lang,
        list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
        FROM documents),
      o AS (SELECT doc_id, lang, toks, len(toks) AS n,
        sum(len(toks) + 1) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (len(toks) + 1) AS off
        FROM tok),
      x AS (SELECT doc_id, lang, toks, n, off,
        unnest(generate_series(CAST(floor(off / 128.0) AS BIGINT),
                               CAST(floor((off + n - 1) / 128.0) AS BIGINT))) AS ex
        FROM o WHERE n > 0),
      sl AS (SELECT lang, ex AS example_id,
        greatest(0, off - ex * 128) AS example_pos,
        CAST(least(off + n, (ex + 1) * 128) - greatest(off, ex * 128) AS BIGINT) AS slice_len,
        array_to_string(toks[CAST(greatest(0, ex * 128 - off) + 1 AS INT):
                             CAST(greatest(0, ex * 128 - off) +
                                  least(off + n, (ex + 1) * 128) - greatest(off, ex * 128) AS INT)], ' ') AS sl
        FROM x)
      SELECT lang, example_id, string_agg(sl, ' ' ORDER BY example_pos) AS example_text,
        CAST(sum(slice_len) AS BIGINT) AS n_tokens
      FROM sl GROUP BY 1, 2""",
    "q_classifier" ->
      """WITH w AS (SELECT list_transform(generate_series(0, 63),
          j -> ((j * 2654435761) % 1000) / 500.0 - 1.0) AS wts),
      s AS (
        SELECT doc_id, text, lang, source, n_chars,
          list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks, wts
        FROM documents, w),
      sc AS (
        SELECT doc_id, text, lang, source, n_chars,
          CASE WHEN len(toks) > 0 THEN
            1.0 / (1.0 + exp(-(0.0 + list_sum(list_transform(toks, t ->
              wts[CAST(CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 64 AS INT) + 1])) / len(toks))))
          ELSE 0.5 END AS raw
        FROM s)
      SELECT doc_id, text, lang, source, n_chars,
        floor(raw * 1e6 + 0.5) / 1e6 AS classifier_score
      FROM sc WHERE floor(raw * 1e6 + 0.5) / 1e6 >= 0.5""",
    "q_dedup_incr_minhash" ->
      """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents))
      SELECT a.doc_id AS new_id, b.doc_id AS seen_id,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5""",
    "q_dedup_simhash" ->
      """WITH tok AS (
        SELECT doc_id, unnest(tk) AS t
        FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(lower(text), '\W+'), x -> length(x) > 0) AS tk
              FROM documents)),
      bits AS (
        SELECT doc_id, b,
          sum(CASE WHEN (nib >> CAST(b % 4 AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        FROM (SELECT doc_id, b,
                strpos('0123456789abcdef',
                  substr(md5(t), CAST((63 - b) // 4 AS INTEGER) + 1, 1)) - 1 AS nib
              FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b))
        GROUP BY doc_id, b),
      sigs AS (
        SELECT doc_id, string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS sig
        FROM bits GROUP BY doc_id)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_filter(generate_series(1, 64), i -> substr(a.sig, i, 1) <> substr(b.sig, i, 1))) AS INTEGER) AS hamming
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      WHERE len(list_filter(generate_series(1, 64), i -> substr(a.sig, i, 1) <> substr(b.sig, i, 1))) <= 6""",
    "q_dedup_cluster" ->
      """WITH RECURSIVE sh AS (
        SELECT doc_id, lang, source,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id, lang, source,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM documents)),
      prs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
      reach(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT p.dst, r.lbl FROM reach r JOIN prs p ON p.src = r.id WHERE r.lbl < p.dst)
      SELECT d.doc_id, d.lang, d.source
      FROM documents d
      JOIN (SELECT id, min(lbl) AS comp FROM reach GROUP BY id) c ON c.id = d.doc_id
      WHERE c.comp = d.doc_id""",
    // components over the pair graph, restricted to ids that appear in a
    // pair (clusterStats covers clustered docs only), then a size histogram
    "q_dedup_cluster_stats" ->
      """WITH RECURSIVE base AS (
        SELECT doc_id, text, lang, source FROM documents
        UNION ALL
        SELECT doc_id + 10000, text, lang, source FROM documents WHERE doc_id < 20
        UNION ALL
        SELECT doc_id + 20000, text, lang, source FROM documents WHERE doc_id < 20),
      sh AS (
        SELECT doc_id, lang, source,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id, lang, source,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM base)),
      prs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
      reach(id, lbl) AS (
        SELECT doc_id, doc_id FROM base
        UNION
        SELECT p.dst, r.lbl FROM reach r JOIN prs p ON p.src = r.id WHERE r.lbl < p.dst),
      m AS (SELECT DISTINCT id FROM (SELECT src AS id FROM prs UNION ALL SELECT dst AS id FROM prs)),
      comp AS (SELECT r.id, min(r.lbl) AS comp FROM reach r JOIN m USING (id) GROUP BY r.id),
      sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS size FROM comp GROUP BY comp)
      SELECT size, CAST(count(*) AS BIGINT) AS n_clusters,
        CAST(size * count(*) AS BIGINT) AS n_docs
      FROM sz GROUP BY size""",
    // same component computation; survivor = argmax(n_chars, min doc_id)
    // per component — the planted longer copies must win over their min-id
    // originals (singleton components keep their only member)
    "q_dedup_survivor" ->
      """WITH RECURSIVE base AS (
        SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id < 40
        UNION ALL
        SELECT doc_id + 10000, text || ' extra tail tokens for the survivor gate',
          lang, source, n_chars + 100 FROM documents WHERE doc_id < 40),
      sh AS (
        SELECT doc_id, lang, source, n_chars,
          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
               ELSE list_distinct(list_transform(generate_series(0, len(toks) - 3),
                      i -> array_to_string(toks[i+1:i+3], ' '))) END AS sh
        FROM (SELECT doc_id, lang, source, n_chars,
                list_filter(regexp_split_to_array(lower(text), '\W+'), t -> length(t) > 0) AS toks
              FROM base)),
      prs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
      reach(id, lbl) AS (
        SELECT doc_id, doc_id FROM base
        UNION
        SELECT p.dst, r.lbl FROM reach r JOIN prs p ON p.src = r.id WHERE r.lbl < p.dst),
      ranked AS (
        SELECT d.doc_id, d.lang, d.source, d.n_chars,
          row_number() OVER (PARTITION BY c.comp ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
        FROM base d
        JOIN (SELECT id, min(lbl) AS comp FROM reach GROUP BY id) c ON c.id = d.doc_id)
      SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn = 1""",
    "q_ann_lsh" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    "q_ann_brute" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    // exhaustive rerank makes flat-PQ exact, so it shares the brute-force oracle
    "q_ann_ivfpq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    "q_ann_pq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * q.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))) AS cos
        FROM e q CROSS JOIN e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""",
    "q_expr_math" ->
      """SELECT l_orderkey, l_linenumber,
        floor(exp(l_discount) * 1000000 + 0.5) / 1000000 AS e,
        floor(ln(l_extendedprice) * 1000000 + 0.5) / 1000000 AS ln_p,
        floor(log10(l_extendedprice) * 1000000 + 0.5) / 1000000 AS lg,
        CAST(trunc(l_extendedprice * 10.0) AS BIGINT) / 10.0 AS tr1
      FROM lineitem""",
    "q_expr_string2" ->
      """SELECT c_custkey,
        ltrim(concat('zz', c_mktsegment), 'z') AS lt,
        rtrim(concat(c_mktsegment, 'yy'), 'y') AS rt,
        replace(c_name, 'a', '_') AS rep,
        regexp_matches(c_name, 'e') AS rx,
        CAST(strpos(c_name, 'er') - 1 AS INTEGER) AS pos,
        CAST(c_custkey AS DOUBLE) AS d,
        CAST(floor(c_acctbal) AS BIGINT) AS l,
        c_acctbal > 0 AS b
      FROM customer""",
    "q_array_agg" ->
      """SELECT p_partkey,
        CAST(p_size * (p_size - 1) / 2 AS DOUBLE) AS rng_sum,
        CAST(p_size - 1 AS DOUBLE) / 2 AS rng_avg,
        CASE WHEN p_size > 0 THEN 0 END AS rng_min,
        CASE WHEN p_size > 0 THEN p_size - 1 END AS rng_max
      FROM part""",
    "q_array_misc" ->
      """SELECT p_partkey,
        array_to_string(list_concat(string_split(p_name, ' '), string_split(p_type, ' ')), '|') AS combined,
        CAST(CASE WHEN coalesce(list_position(list_concat(string_split(p_name, ' '), string_split(p_type, ' '))[2:], 'gear'), 0) = 0
             THEN -1
             ELSE coalesce(list_position(list_concat(string_split(p_name, ' '), string_split(p_type, ' '))[2:], 'gear'), 0) END AS INTEGER) AS idx_from1,
        CAST(CASE WHEN coalesce(list_position(list_concat(string_split(p_name, ' '), string_split(p_type, ' '))[1:3], 'gear'), 0) = 0
             THEN -1
             ELSE coalesce(list_position(list_concat(string_split(p_name, ' '), string_split(p_type, ' '))[1:3], 'gear'), 0) - 1 END AS INTEGER) AS idx_bounded,
        list_sort(list_distinct(string_split(p_name, ' '))) = list_sort(list_distinct(list_reverse(string_split(p_name, ' ')))) AS eq_self,
        len(list_filter(string_split(p_name, ' '), w -> length(w) >= 6)) > 0 AS any_long,
        len(list_filter(string_split(p_name, ' '), w -> NOT (length(w) < 10))) = 0 AS all_short
      FROM part""",
    "q_window_rank" ->
      """SELECT event_type, event_id, CAST(rnk AS INTEGER) AS rnk, CAST(drnk AS INTEGER) AS drnk
      FROM (SELECT event_type, event_id,
              rank() OVER w AS rnk, dense_rank() OVER w AS drnk
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id))
      WHERE rnk <= 5""",
    "q_expr_bool" ->
      """SELECT l_orderkey,
        (l_quantity > 25 AND l_discount < 0.05) AS big,
        (l_tax >= 0.07 OR l_quantity < 3) AS either,
        NOT (l_returnflag = 'R') AS nope,
        l_returnflag AS flag2
      FROM lineitem""",
    "q_fill_locf" ->
      """SELECT user_id, event_id,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
      FROM (SELECT user_id, event_id, ts,
              CASE WHEN value < 5 THEN NULL ELSE value END AS v
            FROM events)""",
    "q_densify" ->
      """WITH g AS (SELECT p_type AS k, p_size AS t, count(*) AS n FROM part GROUP BY 1, 2),
      b AS (SELECT k, min(t) AS lo, max(t) AS hi FROM g GROUP BY 1),
      axis AS (SELECT k, unnest(generate_series(lo, hi)) AS t FROM b)
      SELECT axis.k, CAST(axis.t AS BIGINT) AS t, g.n
      FROM axis LEFT JOIN g ON axis.k = g.k AND axis.t = g.t""",
    "q_densify_time" ->
      """WITH g AS (SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n FROM events GROUP BY 1, 2),
      b AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM g GROUP BY 1),
      axis AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b)
      SELECT axis.user_id, strftime(axis.h, '%Y-%m-%d %H:%M:%S') AS hs, g.n
      FROM axis LEFT JOIN g ON axis.user_id = g.user_id AND axis.h = g.h""",
    "q_multimodal" ->
      """SELECT doc_id,
        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
        CAST((doc_id % 64) * 16 + 16 AS INTEGER) AS width,
        CAST((doc_id % 48) * 16 + 16 AS INTEGER) AS height,
        3 AS channels,
        CAST(16 + (doc_id % 1024) + 32 AS BIGINT) AS size_bytes
      FROM documents""",
    "q_documents" ->
      """SELECT grp AS _id, sum(v) AS total, CAST(count(*) AS BIGINT) AS n
      FROM (VALUES (1, 'a', 10.5), (2, 'b', 4.0), (3, 'a', 2.25), (4, 'b', 8.0)) AS t(k, grp, v)
      GROUP BY 1 ORDER BY 1""",
    "q_rank_fusion" ->
      """WITH p AS (
        SELECT o_orderkey, row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS r
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20),
      d AS (
        SELECT o_orderkey, row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS r
        FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 20),
      fused AS (
        SELECT o_orderkey, floor(sum(w / (60 + r)) * 1e6 + 0.5) / 1e6 AS score
        FROM (SELECT o_orderkey, 2.0 AS w, r FROM p
              UNION ALL SELECT o_orderkey, 1.0 AS w, r FROM d)
        GROUP BY 1)
      SELECT o_orderkey, score FROM fused ORDER BY score DESC, o_orderkey LIMIT 25""",
    "q_score_fusion" ->
      """WITH v AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS s
        FROM orders ORDER BY s DESC, o_orderkey LIMIT 20),
      f AS (
        SELECT o_orderkey, CAST(-o_orderkey AS DOUBLE) AS s
        FROM orders ORDER BY s DESC, o_orderkey LIMIT 20),
      vn AS (
        SELECT o_orderkey, CASE WHEN max(s) OVER () > min(s) OVER ()
          THEN (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ()) ELSE 1.0 END AS n
        FROM v),
      fn AS (
        SELECT o_orderkey, CASE WHEN max(s) OVER () > min(s) OVER ()
          THEN (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ()) ELSE 1.0 END AS n
        FROM f),
      fused AS (
        SELECT o_orderkey, floor(sum(c) / count(*) * 1e6 + 0.5) / 1e6 AS score
        FROM (SELECT o_orderkey, 2.0 * n AS c FROM vn
              UNION ALL SELECT o_orderkey, 1.0 * n AS c FROM fn)
        GROUP BY 1)
      SELECT o_orderkey, score FROM fused ORDER BY score DESC, o_orderkey LIMIT 25""",
    "q_skew_join" ->
      """SELECT l_suppkey AS suppkey, l_orderkey, l_linenumber, l_quantity, s_name
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey""",
    "q_skew_profile" ->
      """SELECT l_suppkey, count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY n DESC, l_suppkey LIMIT 10""",
    "q_multimodal_decode" ->
      """SELECT doc_id,
        'png' AS format,
        CAST((doc_id % 64) * 16 + 16 AS INTEGER) AS width,
        CAST((doc_id % 48) * 16 + 16 AS INTEGER) AS height,
        3 AS channels
      FROM documents""",
    "q_multimodal_audio" ->
      """SELECT doc_id,
        'wave' AS format,
        CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
        CAST(1 + (doc_id % 2) AS INTEGER) AS channels,
        CAST(256 + (doc_id % 512) AS BIGINT) AS frames
      FROM documents""",
    "q_multimodal_video" ->
      """SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'matroska' END AS format,
        CASE WHEN doc_id % 2 = 0
             THEN (CASE WHEN doc_id % 4 = 0 THEN 'avc1' ELSE 'hev1' END)
             ELSE (CASE WHEN doc_id % 4 = 1 THEN 'V_VP9' ELSE 'V_AV1' END) END AS codec,
        CAST((doc_id % 64) * 16 + 16 AS INTEGER) AS width,
        CAST((doc_id % 48) * 16 + 16 AS INTEGER) AS height,
        CAST(1000 + (doc_id % 60) * 500 AS BIGINT) AS duration_ms
      FROM documents"""
  )
}
