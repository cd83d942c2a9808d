package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Store-growth measurement of the verify fetch's UNIFORM-SPREAD arm — the
  * r13 verdict's one remaining store-linear per-batch term. The shape that
  * defeats range pruning: each batch's near-dups reference documents spread
  * uniformly over the WHOLE accumulated store (a crawl re-encountering
  * popular pages from every epoch), so the collected candidate ids blanket
  * their span and coalesced BETWEENs exclude nothing. The r13 gate then
  * fell back to the full matched-dir `(doc_id, sh)` fetch — growing with
  * the store. The r14 InSet arm pushes the id set as a native parquet In
  * that the sig dirs' per-row-group doc_id BLOOMS evaluate: a row group is
  * excluded iff it holds no candidate, true for most row groups once the
  * store's row-group count outgrows the batch-bounded candidate count.
  *
  * Fixture: ~1 KB hash-derived docs in SEQUENTIAL id blocks per batch
  * (the store's id span grows contiguously, so dup targets drawn uniformly
  * from [0, batchStart) blanket it); `dupsPerBatch` docs per batch copy an
  * earlier doc's content with a short appended tail (a near dup the exact
  * tier can't drop — real verify pairs, candidate count batch-bounded at
  * ~dupsPerBatch). Two stores, INTERLEAVED per batch so host drift hits
  * both arms alike: arm `inset` = the r14 default, arm `r13` =
  * `verifyInSetEnabled = false` (ranges-or-nothing, the exact r13 code
  * path). Reports per-batch cross_band_verify wall + store bytes + the
  * cand_* metrics; survivor counts must match at the end (the arms differ
  * only in pushed predicates, never answers).
  *
  * Env: SPARK_GRAFT_UVP_DOCS (default 2000000), _BATCHES (default 20),
  * _DUPS (default 200 per batch), _CPUS (default 32).
  */
object UniformVerifyProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_UVP_DOCS", "2000000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_UVP_BATCHES", "20").toInt
    val dupsPerBatch = sys.env.getOrElse("SPARK_GRAFT_UVP_DUPS", "200").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-uvp").toString
    val batchRows = nDocs / nBatches

    // ~1 KB docs: ~9 distinct hash-text paragraphs (compresses like prose).
    // The first `dupsPerBatch` ids of every batch b >= 1 copy the content
    // of a target drawn uniformly from ALL prior batches' ids — uniform
    // candidate spread over the whole store span — with a short tail so
    // the pair reaches the near tier's verify.
    val id = col("id")
    val batchOf = (id / batchRows).cast("long")
    val isDup = batchOf >= 1 && pmod(id, lit(batchRows)) < dupsPerBatch
    val contentId = when(isDup,
      pmod(xxhash64(lit("target"), id), batchOf * batchRows)).otherwise(id)
    // ~2.5 KB docs: the verify's per-doc constant is the shingle set, and
    // the store-linear r13 fetch only shows at realistic document sizes
    val nPars = (pmod(xxhash64(lit("len"), contentId), lit(9L)) + 14).cast("int")
    val baseText = concat_ws(" ", transform(sequence(lit(0), nPars - 1), j =>
      concat(lit("segment "), hex(xxhash64(contentId, j)),
        lit(" carries block "), hex(xxhash64(contentId, j, lit(1L))),
        lit(" of the document body"))))
    val text = when(isDup,
      concat(baseText, lit(" trailing revision note appended by a later editor")))
      .otherwise(baseText)
    spark.range(nDocs).repartition(cpus.toInt)
      .select(id.as("doc_id"), text.as("text"), batchOf.as("__b"))
      .write.partitionBy("__b").parquet(s"$work/src")
    def storeBytes(root: String): Long = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
    }
    println(f"[uvp] fixture: $nDocs docs / $nBatches batches, " +
      f"$dupsPerBatch uniform-target near-dups per batch, " +
      f"${storeBytes(s"$work/src") / 1e9}%.2f GB text on disk")

    HostCal.warmup()
    val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
    graft.ext.Dedup.phaseHook = Some((name, sec) =>
      phases(name) = phases.getOrElse(name, 0.0) + sec)
    val arms = Seq("inset" -> true, "r13" -> false)
    val verifyTotals = scala.collection.mutable.Map("inset" -> 0.0, "r13" -> 0.0)
    try {
      (0 until nBatches).foreach { b =>
        val batch = spark.read.parquet(s"$work/src/__b=$b")
        // alternate which arm runs first per batch (warm-cache fairness,
        // same discipline as LongDocProbe)
        val line = (if (b % 2 == 0) arms else arms.reverse).map { case (arm, en) =>
          graft.ext.Dedup.verifyInSetEnabled = en
          phases.clear()
          val cal0 = HostCal.unit()._1
          val t0 = System.nanoTime()
          graft.ext.Dedup.ingestStep(batch, "doc_id", "text", s"$work/$arm",
            nearThreshold = Some(0.7), batchTag = Some(f"b$b%03d"),
            exactArmMinStoreBytes = 0L)
          val wall = (System.nanoTime() - t0) / 1e9
          val verify = phases.getOrElse("cross_band_verify", 0.0)
          verifyTotals(arm) += verify
          val cand = phases.getOrElse("cand_pairs_k", 0.0)
          val inset = phases.getOrElse("cand_inset_k", -1.0)
          val rangesN = phases.getOrElse("cand_ranges_n", -1.0)
          f"$arm: total $wall%5.1f verify $verify%5.2f cand ${cand}%.1fk " +
            f"pred ${if (inset >= 0) f"inset ${inset}%.1fk" else if (rangesN >= 0) f"ranges ${rangesN}%.0f" else "none"} " +
            f"cal $cal0%.3f"
        }.mkString("  |  ")
        graft.ext.Dedup.verifyInSetEnabled = true
        println(f"batch $b%2d  sig store ${storeBytes(s"$work/inset_sigs") / 1e9}%5.2f GB  $line")
      }
      println("---- cross_band_verify totals ----")
      verifyTotals.toSeq.sortBy(_._1).foreach { case (k, v) => println(f"$k%-6s $v%8.1f s") }
      val nA = graft.ext.Dedup.readStore(spark, s"$work/inset").count()
      val nB = graft.ext.Dedup.readStore(spark, s"$work/r13").count()
      println(s"[uvp] survivors inset=$nA r13=$nB  ${if (nA == nB) "MATCH" else "*** DIVERGED ***"}")
      // CODA: compact the inset store (multi-row-group files, clustered +
      // bloom-filtered — the at-scale layout) and replay the LAST batch
      // against it under both arms: the compacted geometry is where the
      // bloom exclusion arithmetic pays hardest per byte
      graft.ext.Dedup.compactIngestStore(spark, s"$work/inset", s"$work/comp", "text")
      // distinct source batches + id offsets per arm: the second arm must
      // not exact-drop against the first arm's just-written replay
      Seq(("inset", true, nBatches - 1, 100000000L),
          ("r13", false, nBatches - 2, 200000000L)).foreach { case (arm, en, b, off) =>
        val replay = spark.read.parquet(s"$work/src/__b=$b")
          .withColumn("doc_id", col("doc_id") + off)
        graft.ext.Dedup.verifyInSetEnabled = en
        phases.clear()
        val t0 = System.nanoTime()
        graft.ext.Dedup.ingestStep(replay, "doc_id", "text", s"$work/comp",
          nearThreshold = Some(0.7), batchTag = Some(s"replay-$arm"),
          exactArmMinStoreBytes = 0L)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[uvp] compacted-store replay $arm%-6s total $wall%5.1f " +
          f"verify ${phases.getOrElse("cross_band_verify", 0.0)}%5.2f " +
          f"pred ${if (phases.contains("cand_inset_k")) f"inset ${phases("cand_inset_k")}%.1fk"
                  else if (phases.contains("cand_ranges_n")) f"ranges ${phases("cand_ranges_n")}%.0f"
                  else "none"}")
      }
      graft.ext.Dedup.verifyInSetEnabled = true
    } finally {
      graft.ext.Dedup.phaseHook = None
      graft.ext.Dedup.verifyInSetEnabled = true
    }
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(work))
    try {
      val it = walk.sorted(java.util.Comparator.reverseOrder()).iterator()
      while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
    } finally walk.close()
    spark.stop()
  }
}
