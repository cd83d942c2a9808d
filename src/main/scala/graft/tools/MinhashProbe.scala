package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split timing probe for the MinHash near-dup pipeline at the
  * genuine-sf1 corpus — the attribution tool for wall/CPU movement in
  * `sf1Minhash`/`sf1ClusterStats`: times the signature build+spill
  * (shingle hashing, per-doc presort, MinHash fold, parquet write)
  * SEPARATELY from the banding + verify join (band-key equi-join, pair
  * distinct, exact-Jaccard merge), so a regression lands on a named
  * phase instead of one opaque 100+-second number.
  *
  * Usage: `SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.MinhashProbe"`
  * (override the corpus dir with SPARK_GRAFT_SF1_DIR). Quiesced-host
  * protocol as for BenchSf1.
  */
object MinhashProbe {
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
    def timed[T](name: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime(); val c0 = cpuNs()
      val r = f
      println(f"[probe] $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.1f s  " +
        f"cpu ${(cpuNs() - c0) / 1e9}%8.1f s")
      r
    }
    // optional deterministic subsample for fast A/B iterations
    val frac = sys.env.get("SPARK_GRAFT_PROBE_FRACTION").map(_.toDouble)
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = frac.fold(all)(f => all.filter(pmod(xxhash64(col("doc_id")), lit(1000)) <
      lit((f * 1000).toLong))).persist()
    println(s"[probe] docs=${docs.count()}  frac=${frac.getOrElse(1.0)}  " +
      s"heap_gb=${Runtime.getRuntime.maxMemory / (1L << 30)}")

    // phase A: shingle-hash + presort + signature + parquet spill
    val sigs = timed("signature") {
      val s = graft.ext.Dedup.spill(
        graft.ext.Dedup.signatureTable(docs, "doc_id", "text", 3, 64, 42L),
        "graft-probe-sig")
      s.count()
      s
    }
    // phase B1: banding join + pair distinct — THE PRODUCTION CODE: with
    // materializeCandidates=true the candidate spill executes eagerly at
    // call time, so timing the call isolates candidate generation and
    // timing the count isolates the verify, with zero probe-side
    // reimplementation that could drift from the real plan
    var verified: org.apache.spark.sql.DataFrame = null
    timed("band+distinct") {
      verified = graft.ext.Dedup.minhashPairsFromSignatures(sigs, sigs,
        bands = 16, rowsPerBand = 4, threshold = 0.5, selfPairs = true,
        "id_a", "id_b", materializeCandidates = true)
    }
    // phase B2: exact-Jaccard verify (shingle-set join + merge kernel)
    val nPairs = timed("verify") { verified.count() }
    println(s"[probe] pairs=$nPairs")
    println("[probe] verify plan:")
    println(verified.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan"))
      .take(24).mkString("\n"))
    // optional: the EXACT production call, one fused AQE query — strategy
    // flips that only happen in the fused plan show up here
    if (sys.env.contains("SPARK_GRAFT_PROBE_PROD")) {
      // construct INSIDE the timed block: minhashLshPairs executes its
      // signature and candidate spills eagerly at call time
      var prod: org.apache.spark.sql.DataFrame = null
      val n = timed("production") {
        prod = graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text")
        prod.count()
      }
      println(s"[probe] production pairs=$n")
      println("[probe] production plan (AQE final):")
      println(prod.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan") || l.contains("Aggregate") || l.contains("Sort"))
        .take(40).mkString("\n"))
    }
    spark.stop()
  }
}
