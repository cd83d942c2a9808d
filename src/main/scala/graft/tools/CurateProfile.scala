package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the curation recipe's stages. */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang")).cache()
    docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }
    import graft.ext._
    t("exactDedup")(Dedup.exactDedup(docs, "doc_id", "text").count())
    t("quality+scrub") {
      docs.withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("quality") > 0.6)
        .withColumn("text", TextFunctions.scrubPii(col("text")))
        .withColumn("n_tok", TextFunctions.tokenCount(col("text"))).count()
    }
    t("packGreedy") {
      Packing.packGreedy(docs.withColumn("n_tok", TextFunctions.tokenCount(col("text"))),
        Seq("lang"), Seq(col("doc_id")), col("n_tok"), 2048L).count()
    }
    t("packGreedy-sub32") {
      Packing.packGreedy(docs.withColumn("n_tok", TextFunctions.tokenCount(col("text"))),
        Seq("lang"), Seq(col("doc_id")), col("n_tok"), 2048L, subShards = 32).count()
    }
    t("curate-cold")(Corpus.curate(docs, "doc_id", "text", Seq("lang"),
      Corpus.CurateConfig(minQuality = 0.6, budget = 2048L)).count())
    t("curate-warm")(Corpus.curate(docs, "doc_id", "text", Seq("lang"),
      Corpus.CurateConfig(minQuality = 0.6, budget = 2048L)).count())
    t("curate-sub32")(Corpus.curate(docs, "doc_id", "text", Seq("lang"),
      Corpus.CurateConfig(minQuality = 0.6, budget = 2048L,
        packSubShards = 32)).count())
    spark.stop()
  }
}
