package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Point-probe latency vs band-sidecar bucket count at several store sizes
  * — the measurement behind scaling `bandSidecarBuckets` with the store
  * (VERDICT r12 #8). The 64-bucket default caps a point probe's pruning at
  * ~probe_bands/64 of the band index however large the store grows; a
  * compacted 100× store sorted into 64 ranges reads ~1.6% of the index per
  * probe where 1024 buckets would read ~0.1%. But more buckets also mean
  * more, smaller sorted runs per file (row-group stats get noisier) and a
  * longer IN-list, so the right count is measured, not derived: for each
  * (storeDocs × buckets) cell this probe ingests a near-tier store from
  * the sf1 corpus, recompacts its band index at the target bucket count
  * (`compactIngestStore(bandBuckets=…)` — the pin rewrite path), and
  * reports the median of 24 `lookupNearDups` calls (12 near-hit probes
  * drawn from the corpus, 12 disjoint misses) plus the index's on-disk
  * shape.
  *
  * Env: SPARK_GRAFT_BUCKET_SIZES (default "50000,200000,800000"),
  * SPARK_GRAFT_BUCKET_COUNTS (default "16,64,256,1024"),
  * SPARK_GRAFT_SF1_DIR (default /tmp/graft-sf1), _CPUS (default 32).
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_BUCKET_SIZES", "50000,200000,800000")
      .split(",").map(_.trim.toLong).toSeq
    val bucketCounts = sys.env.getOrElse("SPARK_GRAFT_BUCKET_COUNTS", "16,64,256,1024")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-bucket-probe").toString
    val hconf = spark.sparkContext.hadoopConfiguration
    def bytesOf(p: String): Long = {
      val pp = new org.apache.hadoop.fs.Path(p)
      val fs = pp.getFileSystem(hconf)
      if (!fs.exists(pp)) 0L else fs.getContentSummary(pp).getLength
    }
    def filesOf(p: String): Int = {
      val f = new java.io.File(p)
      if (!f.isDirectory) 0
      else f.listFiles().count(x => x.getName.startsWith("part-") && x.getName.endsWith(".parquet"))
    }
    HostCal.warmup()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (n <- sizes) {
      val base = s"$work/store-$n"
      graft.ext.Dedup.ingestStep(docs.filter(col("doc_id") < n), "doc_id", "text",
        base, nearThreshold = Some(0.5), batchTag = Some("all"))
      // probe set: 12 near-hits (corpus texts with a short appended tail)
      // + 12 disjoint misses — the hit/miss mix a decontamination or
      // "is this document already ingested?" service sees
      val hitTexts = docs.filter(col("doc_id") < n)
        .filter(pmod(col("doc_id"), lit(n / 12)) === 3)
        .select(col("text")).collect().take(12)
        .map(_.getString(0) + " appended probe tail")
      val missTexts = (0 until 12).map(i =>
        s"disjoint probe vocabulary zone $i sharing nothing with any stored corpus document at all")
      val probes = (hitTexts ++ missTexts).toSeq
      for (b <- bucketCounts) {
        val out = s"$work/store-$n-b$b"
        graft.ext.Dedup.compactIngestStore(spark, base, out, "text",
          bandBuckets = Some(b))
        // warm once (plan/codegen), then median of all probes
        graft.ext.Dedup.lookupNearDups(spark, out, probes.head, 0.5).count()
        val walls = probes.map { t =>
          val t0 = System.nanoTime()
          graft.ext.Dedup.lookupNearDups(spark, out, t, 0.5).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = walls(walls.length / 2)
        val cal = HostCal.unit()._1
        println(f"[bucket-probe] docs=$n%8d buckets=$b%5d  median_probe ${med}%6.3f s  " +
          f"(min ${walls.head}%.3f max ${walls.last}%.3f)  index ${bytesOf(out + "_bands") / 1e6}%7.1f MB " +
          f"in ${filesOf(s"${out}_bands/batch-compacted")}%3d files  cal=$cal%.3f")
      }
    }
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(work))
    try {
      val it = walk.sorted(java.util.Comparator.reverseOrder()).iterator()
      while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
    } finally walk.close()
    spark.stop()
  }
}
