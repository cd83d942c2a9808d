package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolation probe for the r15 kernel-tier A/B: times each operator whose
  * inner loops moved from ScalaUDF to native codegen expressions
  * (hashed shingles / minhash sig / band keys / exact Jaccard / int8 dot)
  * OUTSIDE the 43-extra bench sweep, where GC carry-over from neighboring
  * workloads dominates single-run numbers (the documented r8 dedupSurvivor
  * "GC storm" artifact — 15.5 s in the sweep vs ~4 s in isolation at the
  * same code). One JVM per run, one workload at a time, System.gc()
  * between, cold + min-of-2-warm like the bench extras.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=8g \
  *   sbt "runMain graft.tools.OpProbe [op ...]"
  * (default: all ops). Quiesced-host protocol; run BEFORE/AFTER builds
  * back-to-back for the A/B.
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => () => b.getProcessCpuTime
        case _ => () => 0L
      }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    emb.count()
    graft.tools.HostCal.warmup()

    // SPARK_GRAFT_PROBE_PHASES=1: print Dedup.phaseHook attributions (phase
    // wall seconds as reported by the operators' own hooks) per iteration
    if (sys.env.get("SPARK_GRAFT_PROBE_PHASES").contains("1"))
      graft.ext.Dedup.phaseHook = Some((ph, v) =>
        println(f"[opprobe]   phase $ph%-16s $v%8.3f"))

    def timed(name: String)(f: => Long): Unit = {
      System.gc()
      val calPre = graft.tools.HostCal.unit()._1
      def once(): (Double, Double) = {
        val t0 = System.nanoTime(); val c0 = cpuNs(); f
        ((System.nanoTime() - t0) / 1e9, (cpuNs() - c0) / 1e9)
      }
      val cold = once(); val w1 = once(); val w2 = once()
      val warm = if (w1._1 <= w2._1) w1 else w2
      val calPost = graft.tools.HostCal.unit()._1
      println(f"[opprobe] $name%-16s cold ${cold._1}%7.3f s (cpu ${cold._2}%7.2f)  " +
        f"warm ${warm._1}%7.3f s (cpu ${warm._2}%7.2f)  cal [$calPre%.3f,$calPost%.3f]")
    }

    val all = Map[String, () => Unit](
      "minhashDedup" -> (() => timed("minhashDedup")(
        graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text").count())),
      "dedupSurvivor" -> (() => timed("dedupSurvivor")(
        graft.ext.Dedup.dedupNearBy(docs, "doc_id", "text",
          priority = col("n_chars"), threshold = 0.5).count())),
      "fuzzyDecontam" -> (() => timed("fuzzyDecontam")(
        graft.ext.Decontamination.flagFuzzy(
          docs.filter(col("doc_id") % 37 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 37 === 0), "text").count())),
      "incrDedup" -> (() => timed("incrDedup")(
        graft.ext.Dedup.incrementalDedup(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          docs.filter(col("doc_id") % 2 === 0), "doc_id", threshold = 0.5).count())),
      "dupSpans" -> (() => timed("dupSpans")(
        graft.ext.Dedup.removeDupSpans(docs, "doc_id", "text", n = 3)
          .agg(sum(col("n_removed"))).first().getLong(0))),
      "ivfSq8" -> (() => {
        val idx = graft.ext.Similarity.ivfSq8Build(emb, "vec_id", "embedding", nlist = 16)
        idx.indexed.count()
        timed("ivfSq8TopK")(graft.ext.Similarity.ivfSq8TopK(
          emb.filter(col("vec_id") < 100), idx, "vec_id", "embedding",
          k = 10, nprobe = 4, rerank = 50).count())
      }))
    val names = if (args.nonEmpty) args.toSeq else
      Seq("minhashDedup", "dedupSurvivor", "fuzzyDecontam", "incrDedup", "dupSpans", "ivfSq8")
    names.foreach(n => all(n)())
    spark.stop()
  }
}
