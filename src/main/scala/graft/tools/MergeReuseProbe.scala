package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured before/after for [[graft.ext.Dedup.mergeIngestStores]]'s
  * sidecar-reuse fast path (r13 verdict #4): a TB-scale consolidation was
  * paying a full re-shingle of src text it already had on disk as trusted
  * sig sidecars. Builds a ≥1 GB-text near-tier src store plus two
  * identical small dst stores, then merges src into each — once with the
  * pin-matched reuse path (default), once with src's sig pin renamed away
  * (the pin-less fallback, which re-shingles exactly as r13 did) —
  * reporting wall seconds and asserting survivor-identity. Arms run
  * reuse-first then fallback-first is impossible here (the merge mutates
  * dst), so each arm gets its own pre-built dst and the fixture is
  * page-cache-warmed by the build itself; interpret small deltas against
  * the HostCal bracket.
  *
  * TOMBSTONE mode (SPARK_GRAFT_MRP_TOMB=1, r14 verdict #8): prices the
  * merge of a REMOVAL-HEAVY src — `_REMOVALS` (default 32) small
  * `removeFromIngestStore` calls leave that many ledger dirs, and the
  * replay pays the exclusion anti-join per replayed dir (the ledger union
  * is spilled once since r15, so the per-dir cost is the join, not
  * re-scanning the raw ledger). Arms: direct merge of the tombstone-heavy
  * src vs `compactIngestStore` first (consumes the ledger entirely) then
  * merge — the documented pre-merge-compaction recommendation, measured.
  * Survivors must match.
  *
  * Env: SPARK_GRAFT_MRP_DOCS (default 600000 ~2 KB docs ≈ 1.2 GB text),
  * _BATCHES (default 4), _CPUS (default 32), _TOMB (default 0),
  * _REMOVALS (default 32).
  */
object MergeReuseProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_MRP_DOCS", "600000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_MRP_BATCHES", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-mrp").toString

    // ~2 KB hash-derived docs, all distinct (the probe measures the
    // re-shingle cost, not dedup work)
    val id = col("id")
    val nPars = (pmod(xxhash64(lit("len"), id), lit(10L)) + 14).cast("int")
    val text = concat_ws(" ", transform(sequence(lit(0), nPars - 1), j =>
      concat(lit("segment "), hex(xxhash64(id, j)),
        lit(" carries block "), hex(xxhash64(id, j, lit(1L))),
        lit(" of the document body"))))
    spark.range(nDocs).repartition(cpus.toInt)
      .select(id.as("doc_id"), text.as("text"),
        pmod(id, lit(nBatches.toLong)).as("__b"))
      .write.partitionBy("__b").parquet(s"$work/srcdocs")
    def bytesOf(root: String): Long = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
    }
    println(f"[mrp] fixture: $nDocs docs, ${bytesOf(s"$work/srcdocs") / 1e9}%.2f GB text")

    // src: near-tier store, nBatches dirs
    (0 until nBatches).foreach { b =>
      graft.ext.Dedup.ingestStep(spark.read.parquet(s"$work/srcdocs/__b=$b"),
        "doc_id", "text", s"$work/src", nearThreshold = Some(0.7),
        batchTag = Some(f"b$b%02d"), exactArmMinStoreBytes = 0L)
    }
    println(f"[mrp] src store ${bytesOf(s"$work/src") / 1e9}%.2f GB docs + " +
      f"${bytesOf(s"$work/src_sigs") / 1e9}%.2f GB sigs")
    // two identical tiny dst stores
    Seq("dstA", "dstB").foreach { d =>
      graft.ext.Dedup.ingestStep(
        spark.range(100).select((col("id") + 10000000L).as("doc_id"),
          concat(lit("dst seed doc "), hex(xxhash64(lit("dst"), col("id")))).as("text")),
        "doc_id", "text", s"$work/$d", nearThreshold = Some(0.7),
        batchTag = Some("seed"), exactArmMinStoreBytes = 0L)
    }
    HostCal.warmup()
    def timed(tag: String, f: => Unit): Double = {
      val cal = HostCal.unit()._1
      val t0 = System.nanoTime(); f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[mrp] $tag%-18s $w%7.1f s  (cal $cal%.3f)")
      w
    }
    if (sys.env.get("SPARK_GRAFT_MRP_TOMB").contains("1")) {
      // ---- tombstone-heavy src: direct merge vs pre-compact-then-merge ----
      val nRemovals = sys.env.getOrElse("SPARK_GRAFT_MRP_REMOVALS", "32").toInt
      (0 until nRemovals).foreach { i =>
        graft.ext.Dedup.removeFromIngestStore(spark, s"$work/src", "doc_id",
          pmod(col("doc_id"), lit(997)) === i)
      }
      val tombBytes = bytesOf(s"$work/src_tombstones")
      val nTombDirs = new java.io.File(s"$work/src_tombstones").list()
        .count(_.startsWith("batch-"))
      println(f"[mrp-tomb] src ledger: $nTombDirs dirs, ${tombBytes / 1e6}%.1f MB " +
        f"(~${nRemovals * (nDocs / 997)} tombstoned rows)")
      val wDirect = timed("merge (tomb-heavy)", graft.ext.Dedup.mergeIngestStores(
        spark, s"$work/dstA", s"$work/src", "doc_id", "text",
        nearThreshold = Some(0.7), exactArmMinStoreBytes = 0L))
      val wCompact = timed("pre-compact src", graft.ext.Dedup.compactIngestStore(
        spark, s"$work/src", s"$work/srccomp", "text"))
      val wMerge2 = timed("merge (compacted)", graft.ext.Dedup.mergeIngestStores(
        spark, s"$work/dstB", s"$work/srccomp", "doc_id", "text",
        nearThreshold = Some(0.7), exactArmMinStoreBytes = 0L))
      val nA = graft.ext.Dedup.readStore(spark, s"$work/dstA").count()
      val nB = graft.ext.Dedup.readStore(spark, s"$work/dstB").count()
      println(f"[mrp-tomb] survivors direct=$nA precompact=$nB " +
        (if (nA == nB) "MATCH" else "*** DIVERGED ***") +
        f"  direct $wDirect%.1f s vs compact+merge ${wCompact + wMerge2}%.1f s " +
        f"(merge alone $wMerge2%.1f s)")
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(work))
      try {
        val it = walk.sorted(java.util.Comparator.reverseOrder()).iterator()
        while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
      } finally walk.close()
      spark.stop()
      return
    }
    val wReuse = timed("merge (reuse)", graft.ext.Dedup.mergeIngestStores(
      spark, s"$work/dstA", s"$work/src", "doc_id", "text",
      nearThreshold = Some(0.7), exactArmMinStoreBytes = 0L))
    // pin-less src = the r13 re-shingle path
    val hconf = spark.sparkContext.hadoopConfiguration
    val pin = new org.apache.hadoop.fs.Path(s"$work/src_sigs", "_params.json")
    val fs = pin.getFileSystem(hconf)
    require(fs.rename(pin, new org.apache.hadoop.fs.Path(s"$work/src_sigs", "_params.hidden")))
    val wShingle = timed("merge (reshingle)", graft.ext.Dedup.mergeIngestStores(
      spark, s"$work/dstB", s"$work/src", "doc_id", "text",
      nearThreshold = Some(0.7), exactArmMinStoreBytes = 0L))
    val nA = graft.ext.Dedup.readStore(spark, s"$work/dstA").count()
    val nB = graft.ext.Dedup.readStore(spark, s"$work/dstB").count()
    println(f"[mrp] survivors reuse=$nA reshingle=$nB " +
      (if (nA == nB) "MATCH" else "*** DIVERGED ***") +
      f"  speedup ${wShingle / wReuse}%.2fx")
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(work))
    try {
      val it = walk.sorted(java.util.Comparator.reverseOrder()).iterator()
      while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
    } finally walk.close()
    spark.stop()
  }
}
