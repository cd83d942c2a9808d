package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Absolute-scale datapoint: the three headline queries at a TRUE sf1
  * (6M-row lineitem) plus the five soak workloads over the genuinely
  * distinct 6M-document / 200k-vector corpus [[GenSf1]] writes — the
  * jittered-replica soak in Bench proves distribution shape, this proves
  * absolute volume. Same measurement discipline as Bench: headline =
  * 3 warm-ups then median of 5 on a pinned physical plan; extras =
  * cold + warm pair; the record self-flags `noisy` on a median/min spread
  * or a warm-slower-than-cold inversion. One JSON line to stdout (last,
  * after spark.stop()) and the full record to SPARK_GRAFT_BENCH_SF1
  * (default bench_sf1.json).
  *
  * Scale-dependent knob: semDedup runs k=256 (vs the gate's k=16) so the
  * in-cluster pair count stays ~cluster² × k ≈ 150M at 200k vectors —
  * the same "cluster count grows with the corpus" rule a real SemDeDup
  * deployment follows (Abbas et al. 2023 use 11k clusters for LAION).
  */
object BenchSf1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_SF1", "bench_sf1.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.preflight(spark, sfDir)

    val cpuNs: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => () => b.getProcessCpuTime
        case _ => () => 0L
      }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(16).cache()
    val nRows = li.count()

    final case class Stat(iters: Seq[(Double, Double)]) {
      val sorted: Seq[(Double, Double)] = iters.sortBy(_._1)
      def min: Double = sorted.head._1
      def med: Double = sorted(sorted.size / 2)._1
      def medCpu: Double = sorted(sorted.size / 2)._2
      def max: Double = sorted.last._1
      def noisy: Boolean = med / math.max(min, 1e-9) > 1.5
    }
    def timed(pipeline: String): Stat = {
      val rdd = graft.Aggo.aggregate(li, pipeline).queryExecution.toRdd
      def once(): (Double, Double) = {
        val t0 = System.nanoTime(); val c0 = cpuNs()
        rdd.count()
        ((System.nanoTime() - t0) / 1e9, (cpuNs() - c0) / 1e9)
      }
      (1 to 3).foreach(_ => once())
      Stat(Seq.fill(5)(once()))
    }
    // the same three shapes Bench times (BASELINE.md's reference queries)
    val stats = Seq(
      "simpleFilter" -> timed(
        """[{"$match": {"l_returnflag": "R", "l_linestatus": "F", "l_quantity": {"$gte": 10}}}]"""),
      "groupAndAggregate" -> timed(
        """[
          {"$group": {"_id": "$l_returnflag",
            "revenue": {"$sum": {"$multiply": ["$l_extendedprice", {"$subtract": [1, "$l_discount"]}]}},
            "avg_price": {"$avg": "$l_extendedprice"},
            "n": {"$sum": 1}}},
          {"$sort": {"revenue": -1}}
        ]"""),
      "complexPipeline" -> timed(
        """[
          {"$match": {"l_quantity": {"$gte": 5}}},
          {"$project": {"l_returnflag": 1, "l_linestatus": 1,
            "revenue": {"$multiply": ["$l_extendedprice", {"$subtract": [1, "$l_discount"]}]},
            "m": {"$month": "$l_shipdate"}}},
          {"$group": {"_id": {"rf": "$l_returnflag", "m": "$m"},
            "rev": {"$sum": "$revenue"}, "n": {"$sum": 1}}},
          {"$sort": {"rev": -1}},
          {"$limit": 10}
        ]"""))
    stats.foreach { case (k, s) =>
      System.err.println(s"[bench-sf1] $k iters=${s.iters.map(t => "%.4f".format(t._1)).mkString(",")}")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").persist()
    val nDocs = docs.count()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").persist()
    val nVec = emb.count()
    def once(f: => Long): (Double, Double) = {
      val t0 = System.nanoTime(); val c0 = cpuNs(); f
      ((System.nanoTime() - t0) / 1e9, (cpuNs() - c0) / 1e9)
    }
    def coldWarm(name: String)(f: => Long): (String, ((Double, Double), (Double, Double))) = {
      val cw = (once(f), once(f))
      System.err.println(s"[bench-sf1] $name cold=${"%.1f".format(cw._1._1)}s " +
        s"warm=${"%.1f".format(cw._2._1)}s")
      name -> cw
    }
    var histogram = ""
    val extrasCW = Seq(
      coldWarm("sf1CorpusCurate")(graft.ext.Corpus.curate(
        docs.select(col("doc_id"), col("text"), col("lang")), "doc_id", "text",
        Seq("lang"), graft.ext.Corpus.CurateConfig(minQuality = 0.6, budget = 2048L)).count()),
      coldWarm("sf1SemDedup")(graft.ext.Dedup.semDedup(
        emb, "vec_id", "embedding", k = 256, threshold = 0.7).count()),
      coldWarm("sf1Minhash")(graft.ext.Dedup.minhashLshPairs(
        docs, "doc_id", "text").count()),
      coldWarm("sf1ClusterStats") {
        val hist = graft.ext.Dedup.clusterStats(graft.ext.Dedup.minhashLshPairs(
          docs, "doc_id", "text", threshold = 0.5)).collect()
        histogram = hist.sortBy(_.getAs[Long]("size"))
          .map(r => s"${r.getAs[Long]("size")}:${r.getAs[Long]("n_clusters")}")
          .mkString(" ")
        System.err.println(s"[bench-sf1] cluster-size histogram: $histogram")
        hist.map(_.getAs[Long]("n_clusters")).sum
      },
      coldWarm("sf1DupSpans")(graft.ext.Dedup.removeDupSpans(
        docs, "doc_id", "text", n = 3).agg(sum(col("n_removed"))).first().getLong(0)))

    def fmt(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }.mkString("{", ",", "}")
    val results = stats.map { case (k, s) => k -> s.med }
    val spread = stats.map { case (k, s) =>
      s""""$k":{"min":${"%.4f".format(s.min)},"med":${"%.4f".format(s.med)},"max":${"%.4f".format(s.max)}}"""
    }.mkString("{", ",", "}")
    val warmColdInverted = extrasCW.exists { case (_, ((cold, _), (warm, _))) => warm > 2 * cold + 0.5 }
    val noisy = stats.exists(_._2.noisy) || warmColdInverted
    val record =
      s"""{"metric":"total","value":${"%.4f".format(results.map(_._2).sum)},"unit":"sec",""" +
      s""""queries":${fmt(results)},"queries_cpu":${fmt(stats.map { case (k, s) => k -> s.medCpu })},""" +
      s""""spread":$spread,""" +
      s""""extras":${fmt(extrasCW.map { case (k, cw) => k -> cw._1._1 })},""" +
      s""""extras_warm":${fmt(extrasCW.map { case (k, cw) => k -> cw._2._1 })},""" +
      s""""extras_cpu":${fmt(extrasCW.map { case (k, cw) => k -> cw._1._2 })},""" +
      s""""noisy":$noisy,"cluster_histogram":"$histogram",""" +
      s""""docs_per_sec":${results.map { case (k, v) => s""""$k":${(nRows / v).toLong}""" }.mkString("{", ",", "}")},""" +
      s""""rows":$nRows,"n_docs":$nDocs,"n_vectors":$nVec,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (record + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(record)
    System.out.flush()
  }
}
