package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the PQ search phases. */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    println(s"rows=${emb.count()}")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($r)")
    }
    import graft.ext._
    var books: Array[Array[Array[Double]]] = null
    t("pqTrain") { books = Similarity.pqTrain(emb, "embedding", "vec_id", 8, 16, 64); "ok" }
    t("encode")(emb.withColumn("c", Kernels.pqEncodeKernel(books)(col("embedding"))).count())
    t("search")(Similarity.pqTopK(emb.filter(col("vec_id") < 100), emb,
      "vec_id", "embedding", k = 10, m = 8, ksub = 16, dim = 64, rerank = 50).count())

    // bisect the search: codes scan, cross+score, +window, +rerank join
    val books2 = books
    val codes = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
      .withColumn("codes", Kernels.pqEncodeKernel(books2)(col("c_vec")))
    val qdf = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val tables = qdf.collect().map { r =>
      String.valueOf(r.get(0)) ->
        Kernels.adcTableFlat(books2, r.getAs[scala.collection.Seq[Float]]("q_vec"))
    }.toMap
    val approx = broadcast(qdf).crossJoin(codes.select(col("neighbor_id"), col("codes")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("a_score", Kernels.pqAdcScoreClosureKernel(tables, 16)(
        col("query_id").cast("string"), col("codes")))
    t("cross+score")(approx.count())
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("a_score").desc, col("neighbor_id").asc)
    val cand = approx.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= 50).select(col("query_id"), col("q_vec"), col("neighbor_id"))
    t("+window")(cand.count())
    t("+join")(cand.join(codes.select(col("neighbor_id"), col("c_vec")), "neighbor_id").count())

    // is the UDF inside the window sort the problem?
    val approxPlain = approx.withColumn("a2", col("a_score") + 0.0)
    val waPlain = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("a2").desc, col("neighbor_id").asc)
    t("win-noudf") {
      approxPlain.withColumn("arank", row_number().over(waPlain))
        .filter(col("arank") <= 50).count()
    }
    // window over a non-UDF numeric column entirely
    val wh = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(xxhash64(col("neighbor_id")).desc)
    t("win-hash") {
      approx.withColumn("arank", row_number().over(wh)).filter(col("arank") <= 50).count()
    }
    t("force-score")(approx.agg(sum(col("a_score"))).first().getDouble(0))
    // same shape but score via a Column expression (no UDF): codes summed
    t("force-codes")(approx.agg(sum(aggregate(col("codes"), lit(0L), (a, x) => a + x))).first().getLong(0))
    spark.stop()
  }
}
