package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc single-workload timer for iterating on extension performance
  * without paying for the full [[graft.Bench]] sweep. Usage:
  *
  *   sbt "runMain graft.tools.MicroBench <sfDir> <name>[,<name>...]"
  *
  * Prints cold + two warm timings per named workload. Names mirror the
  * Bench extras they correspond to.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("gopherRules")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    lazy val docs = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet").cache(); d.count(); d
    }
    lazy val emb = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet").cache(); e.count(); e
    }

    val workloads: Map[String, () => Long] = Map(
      "gopherRules" -> (() => docs.select(
        graft.ext.TextFunctions.gopherPass(col("text")).as("p"))
        .filter(col("p")).agg(count(lit(1))).first().getLong(0)),
      "gopherFlags" -> (() => docs.select(
        graft.ext.TextFunctions.gopherFlags(col("text")).as("f"))
        .agg(count(lit(1))).first().getLong(0)),
      "textQuality" -> (() => docs.select(
        graft.ext.TextFunctions.qualityScore(col("text")))
        .agg(count(lit(1))).first().getLong(0)),
      "ivfTopK" -> (() => graft.ext.Similarity.ivfTopK(
        emb.filter(col("vec_id") < 100), emb, "vec_id", "embedding", k = 10,
        nlist = 16, nprobe = 4).count()),
      "ivfProbe" -> {
        lazy val idx = graft.ext.Similarity.ivfBuild(emb, "vec_id", "embedding", nlist = 16)
        () => graft.ext.Similarity.ivfTopK(
          emb.filter(col("vec_id") < 100), idx, "vec_id", "embedding",
          k = 10, nprobe = 4).count()
      },
      "pqTopK" -> (() => graft.ext.Similarity.pqTopK(
        emb.filter(col("vec_id") < 100), emb, "vec_id", "embedding", k = 10,
        m = 8, ksub = 16, dim = 64, rerank = 50).count()),
      "pqProbe" -> {
        lazy val idx = graft.ext.Similarity.pqBuild(emb, "vec_id", "embedding",
          m = 8, ksub = 16, dim = 64)
        () => graft.ext.Similarity.pqTopK(
          emb.filter(col("vec_id") < 100), idx, "vec_id", "embedding",
          k = 10, rerank = 50).count()
      },
      "incrDedup" -> (() => graft.ext.Dedup.incrementalDedup(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        docs.filter(col("doc_id") % 2 === 0), "doc_id", threshold = 0.5).count()),
      "dedupSurvivor" -> (() => graft.ext.Dedup.dedupNearBy(
        docs, "doc_id", "text", priority = col("n_chars"),
        threshold = 0.5).count()),
      "dupSpans" -> (() => graft.ext.Dedup.removeDupSpans(
        docs, "doc_id", "text", n = 8)
        .agg(sum(col("n_removed"))).first().getLong(0)),
      "minhashDedup" -> (() => graft.ext.Dedup.minhashLshPairs(
        docs, "doc_id", "text").count()),
      "clusterStats" -> (() => graft.ext.Dedup.clusterStats(
        graft.ext.Dedup.minhashLshPairs(
          docs, "doc_id", "text", threshold = 0.5)).count()),
      "semDedup" -> (() => graft.ext.Dedup.semDedup(
        emb, "vec_id", "embedding", k = 16, threshold = 0.7).count()))

    def once(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val f = workloads.getOrElse(n,
        sys.error(s"unknown workload '$n'; known: ${workloads.keys.toSeq.sorted.mkString(", ")}"))
      println(f"[micro] $n cold=${once(f)}%.3f warm=${once(f)}%.3f warm=${once(f)}%.3f")
    }
    spark.stop()
  }
}
