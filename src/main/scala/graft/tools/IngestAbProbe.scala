package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B for the two driver-bench extras that drifted r10→r11 on
  * TOUCHED code (incrDedup 1.92→2.64 s, dupSpans 2.58→3.48 s at sf0.1):
  * every other extra drifted the same ~15-19% on untouched paths (session
  * noise), but these two sit on the r11 diff, so noise vs real must be
  * separated before the next round's comparison compounds it.
  *
  *  - incrDedup A/B: arm A is the shipping plan (bounded-left banding
  *    explode persisted once, `pinBandedLeftEnabled = true`), arm B the
  *    r10 form (recompute the explode per consumer). If B is reliably
  *    faster at sf0.1, the persist's cache-write cost is real at this
  *    volume and should be gated like every other prefilter.
  *  - dupSpans A/A: the SAME plan both arms — dupSpans shares no code with
  *    the r11 diff (no stores, no banding), so its drift can only be
  *    session noise; the A/A spread measures the noise floor the incrDedup
  *    verdict must clear.
  *
  * Arms alternate within each round (drift hits both alike), `ROUNDS`
  * (default 5) rounds after one discarded warm-up; per-arm walls and
  * process-CPU are printed with min/median.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_AB_ROUNDS, SPARK_GRAFT_CPUS.
  */
object IngestAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    val cpuNs: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => () => b.getProcessCpuTime
        case _ => () => 0L
      }
    def timed(f: => Long): (Double, Double) = {
      System.gc()
      val t0 = System.nanoTime(); val c0 = cpuNs()
      f
      ((System.nanoTime() - t0) / 1e9, (cpuNs() - c0) / 1e9)
    }
    def incrDedup(): Long = graft.ext.Dedup.incrementalDedup(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
      docs.filter(col("doc_id") % 2 === 0), "doc_id", threshold = 0.5).count()
    def dupSpans(): Long = graft.ext.Dedup.removeDupSpans(
      docs, "doc_id", "text", n = 3).agg(sum(col("n_removed"))).first().getLong(0)

    val buf = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[(Double, Double)]]()
    def record(k: String, v: (Double, Double)): Unit =
      buf.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer()) += v
    // discarded warm-up: JIT + page cache for both workloads
    timed(incrDedup()); timed(dupSpans())
    (0 until rounds).foreach { r =>
      // arm order ALTERNATES per round: the first A/B run showed a strong
      // within-round ordering bias (the dupSpans A/A control differed 2.62
      // vs 2.02 s median on IDENTICAL code — whichever arm runs second in
      // a round benefits), so a fixed order would systematically charge
      // the first arm
      val incrArms = Seq(
        ("incrDedup_pinned", true), ("incrDedup_unpinned", false))
      val ordered = if (r % 2 == 0) incrArms else incrArms.reverse
      ordered.foreach { case (k, pin) =>
        graft.ext.Dedup.pinBandedLeftEnabled = pin
        record(k, timed(incrDedup()))
      }
      graft.ext.Dedup.pinBandedLeftEnabled = true
      val spanArms = Seq("dupSpans_A", "dupSpans_B")
      (if (r % 2 == 0) spanArms else spanArms.reverse)
        .foreach(k => record(k, timed(dupSpans())))
      System.err.println(s"[ab] round $r done")
    }
    graft.ext.Dedup.pinBandedLeftEnabled = true
    def stats(xs: Seq[Double]): String = {
      val s = xs.sorted
      f"min ${s.head}%.2f med ${s(s.size / 2)}%.2f max ${s.last}%.2f"
    }
    buf.foreach { case (k, vs) =>
      println(f"$k%-20s wall[${stats(vs.map(_._1).toSeq)}]  cpu[${stats(vs.map(_._2).toSeq)}]  " +
        vs.map { case (w, c) => f"$w%.2f/$c%.1f" }.mkString(" "))
    }
    spark.stop()
  }
}
