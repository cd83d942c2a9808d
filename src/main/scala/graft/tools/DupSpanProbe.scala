package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split timing probe for the span-cut dedup at the genuine-sf1
  * corpus — attribution tool for `sf1DupSpans` movement, in the spirit of
  * [[MinhashProbe]]: times the end-to-end operator under the HostCal
  * interference bracket so a wall/CPU swing lands on either the code or
  * the host, never on guesswork.
  *
  * Usage: `SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.DupSpanProbe"`
  * (override corpus dir with SPARK_GRAFT_SF1_DIR, subsample with
  * SPARK_GRAFT_PROBE_FRACTION). Quiesced-host protocol as for BenchSf1.
  */
object DupSpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => () => b.getProcessCpuTime
        case _ => () => 0L
      }
    HostCal.warmup()
    def timed[T](name: String)(f: => T): T = {
      System.gc()
      val calPre = HostCal.unit()._1
      val t0 = System.nanoTime(); val c0 = cpuNs()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (cpuNs() - c0) / 1e9
      val calPost = HostCal.unit()._1
      println(f"[probe] $name%-14s $wall%8.1f s  cpu $cpu%8.1f s  " +
        f"cal ${calPre}%.3f/${calPost}%.3f")
      r
    }
    val frac = sys.env.get("SPARK_GRAFT_PROBE_FRACTION").map(_.toDouble)
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = frac.fold(all)(f => all.filter(pmod(xxhash64(col("doc_id")), lit(1000)) <
      lit((f * 1000).toLong))).persist()
    println(s"[probe] docs=${docs.count()}  frac=${frac.getOrElse(1.0)}  " +
      s"heap_gb=${Runtime.getRuntime.maxMemory / (1L << 30)}")
    val removed = timed("dupSpans") {
      graft.ext.Dedup.removeDupSpans(docs, "doc_id", "text", n = 3)
        .agg(sum(col("n_removed"))).first().getLong(0)
    }
    println(s"[probe] n_removed=$removed")
    spark.stop()
  }
}
