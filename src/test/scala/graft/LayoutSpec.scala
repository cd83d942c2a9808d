package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Storage-layout scale audits: bucketed tables must join and aggregate
  * without shuffles (the pay-once layout for co-located joins). */
class LayoutSpec extends AnyFunSuite {

  test("bucketed tables join and aggregate exchange-free") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val dim = (0L until 50L).map(k => (k, s"label$k")).toDF("k", "label")
    graft.sources.Layout.writeBucketed(fact, "graft_fact_b", 8, Seq("k"))
    graft.sources.Layout.writeBucketed(dim, "graft_dim_b", 8, Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_fact_b").join(spark.table("graft_dim_b"), "k")
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("ShuffleExchange") && !joinPlan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$joinPlan")
      assert(joined.count() == 1000)
      val agged = spark.table("graft_fact_b").groupBy("k").agg(sum("v"))
      val aggPlan = agged.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation must not shuffle:\n$aggPlan")
      assert(agged.count() == 50)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_fact_b")
      spark.sql("DROP TABLE IF EXISTS graft_dim_b")
    }
  }

  test("morton code interleaves bits; z-order files carry small bounding boxes on BOTH dims") {
    import spark.implicits._
    // hand-checked interleave: x=0b101, y=0b011 → z = y2x2 y1x1 y0x0 = 0b011011...
    // bit i of col j at position i*2+j: x bits at even, y bits at odd positions
    val one = Seq((5L, 3L)).toDF("x", "y")
    val z = one.select(graft.sources.Layout.mortonCode(Seq(col("x"), col("y")), 3).as("z"))
      .collect().head.getLong(0)
    // x=101 → bits 0,4 ; wait: x bit0=1→pos0, bit1=0→pos2, bit2=1→pos4 = 10001
    // y=011 → bit0=1→pos1, bit1=1→pos3, bit2=0→pos5 = 01010 → z = 11011 = 27
    assert(z == 27L, s"got $z")
    // boundedBucket clamps and scales
    val bb = Seq(-5L, 0L, 511L, 1023L, 5000L).toDF("v")
      .select(graft.sources.Layout.boundedBucket(col("v"), 0L, 1023L, 4).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(bb == Seq(0L, 0L, 7L, 15L, 15L), s"got $bb")

    // data-skipping audit: a grid of (a, b) points written z-ordered must
    // give every file a bounding box far smaller than the global range on
    // BOTH dimensions — a single-column sort can only do that for one
    val n = 1 << 14
    val grid = spark.range(n).select(
      pmod(hash(col("id")), lit(128)).cast("long").as("a"),
      pmod(hash(col("id"), lit(1)), lit(128)).cast("long").as("b"))
    val dir: String = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    graft.sources.Layout.zorderWrite(grid, Seq(col("a"), col("b")), 7,
      s"$dir/z", partitions = 16)
    val sorted = grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
    sorted.write.mode("overwrite").parquet(s"$dir/s")
    def avgSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length
    }
    val (za, zb) = (avgSpan(s"$dir/z", "a"), avgSpan(s"$dir/z", "b"))
    val (sa, sb) = (avgSpan(s"$dir/s", "a"), avgSpan(s"$dir/s", "b"))
    // z-order: both dims well under half the 0..127 range per file
    assert(za < 64 && zb < 64, s"z-order spans a=$za b=$zb")
    // single-column sort: a is tight but b spans ~everything
    assert(sa < 16, s"sorted-by-a span a=$sa")
    assert(sb > 100, s"sorted-by-a span b=$sb (should be ~global)")
    // and z-order beats the single-sort layout on the second dimension 2x+
    assert(zb * 2 < sb, s"zb=$zb sb=$sb")
  }

  test("morton code: 3 columns and negative-range buckets") {
    import spark.implicits._
    // k=3, bits=2: bit i of col j at position i*3+j
    // x=0b11 → pos 0,3 = 0b1001; y=0b01 → pos 1 = 0b10; z=0b10 → pos 5 = 0b100000
    val v = Seq((3L, 1L, 2L)).toDF("x", "y", "z")
      .select(graft.sources.Layout.mortonCode(
        Seq(col("x"), col("y"), col("z")), 2).as("m"))
      .collect().head.getLong(0)
    assert(v == (0x9L | 0x2L | 0x20L), s"got $v")
    // negative value range maps linearly onto the grid
    val bb = Seq(-1000L, -1L, 0L, 999L).toDF("v")
      .select(graft.sources.Layout.boundedBucket(col("v"), -1000L, 999L, 2).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(bb == Seq(0L, 1L, 2L, 3L), s"got $bb")
    // bits*columns over 63 refused
    intercept[IllegalArgumentException] {
      graft.sources.Layout.mortonCode(Seq(col("x"), col("y")), 32)
    }
  }

  test("compact merges small files without losing or reordering rows within groups") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // 64 tiny files
    (1 to 2048).map(i => (i.toLong, s"row $i")).toDF("id", "v")
      .repartition(64).write.mode("overwrite").parquet(s"$dir/in")
    def files(p: String): Int = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(s"$dir/in") == 64)
    val planned = graft.sources.Layout.compact(spark, s"$dir/in", s"$dir/out",
      targetFileMB = 256)
    // tiny input → one output file, all rows intact
    assert(planned == 1)
    assert(files(s"$dir/out") == 1)
    val back = spark.read.parquet(s"$dir/out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back.size == 2048 && back(7L) == "row 7")
    // refuses to clobber its own input — exact, aliased, or nested
    intercept[IllegalArgumentException] {
      graft.sources.Layout.compact(spark, s"$dir/in", s"$dir/in")
    }
    intercept[IllegalArgumentException] {
      graft.sources.Layout.compact(spark, s"$dir/in", s"$dir/in/")
    }
    intercept[IllegalArgumentException] {
      graft.sources.Layout.compact(spark, s"$dir/in", s"$dir/in/nested")
    }
    intercept[IllegalArgumentException] {
      graft.sources.Layout.compact(spark, s"$dir/in/sub", s"$dir/in")
    }
  }

  test("compact preserves a Hive-partitioned layout instead of flattening it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-part").toString
    (1 to 1000).map(i => (i.toLong, s"row $i", if (i % 3 == 0) "en" else "de"))
      .toDF("id", "v", "lang")
      .repartition(16).write.mode("overwrite").partitionBy("lang").parquet(s"$dir/in")
    // a service dir next to the partition dirs (a killed job's _temporary)
    // must not derail partition detection
    new java.io.File(s"$dir/in/_temporary/0").mkdirs()
    val planned = graft.sources.Layout.compact(spark, s"$dir/in", s"$dir/out")
    assert(planned == 1)
    // the key=value layout survives — readers keep their partition pruning
    val subdirs = new java.io.File(s"$dir/out").listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.contains("=")).sorted.toSeq
    assert(subdirs == Seq("lang=de", "lang=en"), s"got $subdirs")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 1000)
    assert(back.filter(col("lang") === "en").count() == 333)
    assert(back.columns.toSet == Set("id", "v", "lang"))
  }

  test("partitioned compact spreads a large partition value over its file budget") {
    import spark.implicits._
    // high-entropy payload so the on-disk bytes force parts > 1 at 1 MB
    // target; 90% of rows land in lang=en
    val big = spark.range(60000).select(col("id"),
      concat((0 until 8).map(i => md5(concat(col("id"), lit(i)))): _*).as("v"),
      when(col("id") % 10 === 0, "de").otherwise("en").as("lang"))
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-salt").toString
    big.repartition(32).write.mode("overwrite").partitionBy("lang").parquet(s"$dir/in")
    val planned = graft.sources.Layout.compact(spark, s"$dir/in", s"$dir/out",
      targetFileMB = 1)
    assert(planned > 1, s"test needs a multi-file budget, got $planned")
    def files(p: String): Int = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    // the dominant value must NOT collapse into one far-over-target file
    val enFiles = files(s"$dir/out/lang=en")
    assert(enFiles > 1 && enFiles <= planned, s"lang=en files: $enFiles of $planned planned")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 60000)
    assert(back.filter(col("lang") === "de").count() == 6000)
  }

  test("partitioned compact keeps null-value partitions and is retry-deterministic") {
    import spark.implicits._
    // a null partition value writes as key=__HIVE_DEFAULT_PARTITION__ and
    // reads BACK as null: the per-value budget join must be null-safe or
    // the whole null partition silently vanishes from the compacted output
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-null").toString
    (1 to 900).map(i => (i.toLong, s"row $i", if (i % 3 == 0) null else s"s${i % 2}"))
      .toDF("id", "v", "shard")
      .repartition(8).write.mode("overwrite").partitionBy("shard").parquet(s"$dir/in")
    assert(new java.io.File(s"$dir/in/shard=__HIVE_DEFAULT_PARTITION__").isDirectory)
    graft.sources.Layout.compact(spark, s"$dir/in", s"$dir/out")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 900, "compact dropped rows")
    assert(back.filter(col("shard").isNull).count() == 300,
      "null-partition rows lost in compaction")
    // retry determinism: the salt is a pure function of row content, so a
    // second run over the same input plans the identical file split
    graft.sources.Layout.compact(spark, s"$dir/in", s"$dir/out2")
    def layout(p: String): Map[String, Int] =
      new java.io.File(p).listFiles().filter(_.isDirectory)
        .filter(_.getName.contains("="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    assert(layout(s"$dir/out") == layout(s"$dir/out2"),
      s"file split not reproducible: ${layout(s"$dir/out")} vs ${layout(s"$dir/out2")}")
  }

  test("colocate repartitioning is reused across same-key operations") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 20, i)).toDF("k", "v")
    val co = graft.sources.Layout.colocate(df, 8, Seq("k"))
    val agged = co.groupBy("k").agg(sum("v"))
    val plan = agged.queryExecution.executedPlan.toString
    // exactly the one explicit repartition exchange — none added by groupBy
    assert(plan.split("Exchange").length - 1 == 1, s"expected a single exchange:\n$plan")
  }
}
