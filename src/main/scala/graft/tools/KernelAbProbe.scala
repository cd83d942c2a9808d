package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session isolation A/B for the r15 second kernel batch — the
  * measurement the r15 round shipped without (VERDICT r15 what's-wrong
  * #2): `ClassifierSumExpr` vs the r14 interpreted
  * `aggregate(transform(md5/conv/element_at))` tree, and `WordGramsExpr`
  * vs the r14 interpreted `transform(sequence)/slice/array_join` tree.
  * Both r14 trees are re-derived exactly as `KernelsEquivSpec` pins them
  * (bit-identical outputs), so the A/B differs ONLY in the expression
  * implementation. One JVM, one workload at a time, System.gc() between,
  * cold + min-of-2-warm, HostCal brackets — the OpProbe protocol.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.KernelAbProbe"
  */
object KernelAbProbe {
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
    graft.exprs.catalyst.GraftFunctions.register(spark)
    val cpuNs: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => () => b.getProcessCpuTime
        case _ => () => 0L
      }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()
    HostCal.warmup()

    def timed(name: String)(f: => Long): Unit = {
      System.gc()
      val calPre = HostCal.unit()._1
      def once(): (Double, Double) = {
        val t0 = System.nanoTime(); val c0 = cpuNs(); f
        ((System.nanoTime() - t0) / 1e9, (cpuNs() - c0) / 1e9)
      }
      val cold = once(); val w1 = once(); val w2 = once()
      val warm = if (w1._1 <= w2._1) w1 else w2
      val calPost = HostCal.unit()._1
      println(f"[kernelab] $name%-22s cold ${cold._1}%7.3f s (cpu ${cold._2}%7.2f)  " +
        f"warm ${warm._1}%7.3f s (cpu ${warm._2}%7.2f)  cal [$calPre%.3f,$calPost%.3f]")
    }

    val weights = (0 until 64).map(j => ((j * 2654435761L) % 1000) / 500.0 - 1.0)

    // ---- classifier: the bench-extras classifierScore workload ----
    timed("classifierNow")(graft.ext.TextFunctions.classifierFilter(
      docs, "text", weights, bias = 0.0, threshold = 0.5).count())
    // the r14 interpreted form (KernelsEquivSpec's reference tree), wrapped
    // in the same quantize + filter + count
    timed("classifierR14") {
      val b = weights.length
      val wArr = array(weights.map(lit): _*)
      val toks = graft.ext.TextFunctions.tokens(col("text"))
      val contrib = transform(toks, t =>
        element_at(wArr,
          (conv(substring(md5(t), 1, 15), 16, 10).cast("long") % b).cast("int") + 1))
      val mean = aggregate(contrib, lit(0.0), (acc, x) => acc + x) / size(toks)
      val score = when(size(toks) > 0,
        lit(1.0) / (lit(1.0) + exp(-(lit(0.0) + mean)))).otherwise(lit(0.5))
      val q = floor(score * 1e6 + 0.5) / 1e6
      docs.withColumn("classifier_score", q)
        .filter(col("classifier_score") >= 0.5).count()
    }

    // ---- LM train: the bench-extras lmTrain workload (3-gram counts) ----
    timed("lmTrainNow")(
      graft.ext.LanguageModel.ngramCounts(docs, "text", 3).count())
    timed("lmTrainR14") {
      val toks = docs.select(graft.ext.TextFunctions.tokens(col("text")).as("__t"))
      (1 to 3).map { k =>
        val grams = when(size(col("__t")) >= k,
          transform(sequence(lit(0), size(col("__t")) - k),
            i => array_join(slice(col("__t"), i + 1, lit(k)), " ")))
          .otherwise(array().cast("array<string>"))
        toks.select(explode(grams).as("gram"))
          .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
          .withColumn("order", lit(k))
      }.reduce(_ unionByName _).count()
    }

    spark.stop()
  }
}
