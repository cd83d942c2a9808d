package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Price the verify fetch's PAST-`maxInIds` regime (r14 verdict "What's
  * wrong" #3): past 262144 collected candidate ids no plan predicate is
  * pushed and the fetch keeps the full matched-dir scan. Defensible by
  * arithmetic — a batch with >262k candidates is the collision-heavy shape
  * where the O(candidates) verify join + Jaccard dominates whatever the
  * fetch does — but never measured. This probe manufactures that regime
  * (SMALL batches whose near-dup fraction is most of the batch, targets
  * uniform over the accumulated store) and interleaves THREE arms per
  * batch, each with its own store:
  *
  *  - `full`  — the shipping default: past the cap, full matched-dir fetch;
  *  - `semi`  — [[graft.ext.Dedup.verifySemiJoinPastCap]]: reader-side
  *    exclusion via a left-semi join of the resolved dirs against the
  *    pinned candidate-id frame (no plan literal, no driver collect cost);
  *  - `inset` — [[graft.ext.Dedup.verifyMaxInIdsOverride]] raised to 4M:
  *    the InSet/bloom arm FORCED past its plan-size cap, pricing exactly
  *    what the 262144 bound protects against (a multi-MB id literal
  *    serialized into every scan task).
  *
  * Decision rule (README table either way): if neither alternative beats
  * `full` outside host noise, the cap is correctly placed — document and
  * close; if one wins, wire it as the third adaptive arm. Survivor counts
  * must match across all three stores (the arms differ only in fetch
  * plans, never answers).
  *
  * Env: SPARK_GRAFT_PCP_DOCS (default 1600000), _BATCHES (default 4),
  * _DUPFRAC (default 75 = % of each batch that near-dups an earlier doc),
  * _CPUS (default 32).
  */
object PastCapProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_PCP_DOCS", "1600000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_PCP_BATCHES", "4").toInt
    val dupPct = sys.env.getOrElse("SPARK_GRAFT_PCP_DUPFRAC", "75").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-pastcap").toString
    val batchRows = nDocs / nBatches

    // same fixture recipe as UniformVerifyProbe (~2.5 KB hash-derived
    // docs, near-dup targets uniform over all prior batches) with the dup
    // fraction cranked to put the per-batch candidate count past 262144:
    // at 400k-row batches and 75% dups, batches >= 1 carry ~300k
    // uniform-spread candidate ids each.
    val id = col("id")
    val batchOf = (id / batchRows).cast("long")
    val isDup = batchOf >= 1 && pmod(id, lit(batchRows)) < batchRows * dupPct / 100
    val contentId = when(isDup,
      pmod(xxhash64(lit("target"), id), batchOf * batchRows)).otherwise(id)
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
    println(f"[pastcap] fixture: $nDocs docs / $nBatches batches, $dupPct%% near-dups, " +
      f"${storeBytes(s"$work/src") / 1e9}%.2f GB text on disk")

    HostCal.warmup()
    val phases = scala.collection.mutable.LinkedHashMap[String, Double]()
    graft.ext.Dedup.phaseHook = Some((name, sec) =>
      phases(name) = phases.getOrElse(name, 0.0) + sec)
    // (arm, semiJoin, maxInIdsOverride)
    val arms = Seq(("full", false, None), ("semi", true, None),
      ("inset", false, Some(4 << 20)))
    val verifyTotals = scala.collection.mutable.Map(arms.map(_._1 -> 0.0): _*)
    def resetToggles(): Unit = {
      graft.ext.Dedup.verifySemiJoinPastCap = false
      graft.ext.Dedup.verifyMaxInIdsOverride = None
    }
    try {
      (0 until nBatches).foreach { b =>
        val batch = spark.read.parquet(s"$work/src/__b=$b")
        // rotate arm order per batch (warm-cache fairness across THREE
        // arms — each arm leads every third batch)
        val order = arms.drop(b % arms.size) ++ arms.take(b % arms.size)
        val line = order.map { case (arm, semi, cap) =>
          graft.ext.Dedup.verifySemiJoinPastCap = semi
          graft.ext.Dedup.verifyMaxInIdsOverride = cap
          phases.clear()
          val cal0 = HostCal.unit()._1
          val t0 = System.nanoTime()
          graft.ext.Dedup.ingestStep(batch, "doc_id", "text", s"$work/$arm",
            nearThreshold = Some(0.7), batchTag = Some(f"b$b%03d"),
            exactArmMinStoreBytes = 0L)
          val wall = (System.nanoTime() - t0) / 1e9
          resetToggles()
          val verify = phases.getOrElse("cross_band_verify", 0.0)
          verifyTotals(arm) += verify
          val pred =
            if (phases.contains("cand_inset_k")) f"inset ${phases("cand_inset_k")}%.0fk"
            else if (phases.contains("cand_semijoin")) "semijoin"
            else if (phases.contains("cand_ranges_n")) f"ranges ${phases("cand_ranges_n")}%.0f"
            else "full-fetch"
          f"$arm: total $wall%5.1f verify $verify%5.2f " +
            f"cand ${phases.getOrElse("cand_pairs_k", 0.0)}%.0fk [$pred] cal $cal0%.3f"
        }.mkString("  |  ")
        println(f"batch $b%2d  sig store ${storeBytes(s"$work/full_sigs") / 1e9}%5.2f GB  $line")
      }
      println("---- cross_band_verify totals ----")
      verifyTotals.toSeq.sortBy(_._1).foreach { case (k, v) => println(f"$k%-6s $v%8.1f s") }
      val counts = arms.map { case (arm, _, _) =>
        arm -> graft.ext.Dedup.readStore(spark, s"$work/$arm").count() }
      println(s"[pastcap] survivors ${counts.map { case (a, n) => s"$a=$n" }.mkString(" ")}  " +
        (if (counts.map(_._2).distinct.size == 1) "MATCH" else "*** DIVERGED ***"))
    } finally {
      graft.ext.Dedup.phaseHook = None
      resetToggles()
    }
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(work))
    try {
      val it = walk.sorted(java.util.Comparator.reverseOrder()).iterator()
      while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
    } finally walk.close()
    spark.stop()
  }
}
