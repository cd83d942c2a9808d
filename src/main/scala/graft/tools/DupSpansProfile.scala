package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler for [[Dedup.removeDupSpans]] — times each
  * sub-stage in isolation so a regression can be attributed to the gram
  * explode, the hot-gram aggregation, the start-collection, or the span
  * cut instead of guessed at. Usage:
  *
  *   sbt "runMain graft.ext.DupSpansProfile <sfDir> [fraction] [n]"
  */
object DupSpansProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-sf1"
    val frac = if (args.length > 1) args(1).toDouble else 0.1
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => () => b.getProcessCpuTime
        case _ => () => 0L
      }
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val c0 = cpuNs()
      val r = f
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  cpu ${(cpuNs() - c0) / 1e9}%8.0f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(pmod(xxhash64(col("doc_id")), lit(1000)) < lit((frac * 1000).toInt))
    println(s"[profile] docs=${docs.count()} n=$n")

    if (sys.env.get("SPARK_GRAFT_PROFILE_FULL_ONLY").contains("1")) {
      timed("full removeDupSpans")(
        Dedup.removeDupSpans(docs, "doc_id", "text", n)
          .agg(sum(col("n_removed"))).first().getLong(0))
      spark.stop()
      return
    }

    val base = timed("base (tokens, spilled)")(Dedup.spill(
      docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("__toks")),
      "graft-profile-toks"))
    val grams = Dedup.positionalGrams(base, "doc_id", n)
    timed("grams explode count")(grams.count())
    val hot = timed("hot (min!=max) to spill") {
      Dedup.spill(grams.groupBy(col("__g"))
        .agg(min(col("doc_id")).as("__lo"), max(col("doc_id")).as("__hi"))
        .filter(col("__lo") =!= col("__hi")).select(col("__g")), "graft-profile-hot")
    }
    println(s"[profile] hot grams=${hot.count()}")
    val dupStarts = timed("dupStarts to spill") {
      Dedup.spill(grams.join(hot, Seq("__g"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("__s"))).as("__starts")), "graft-profile-starts")
    }
    println(s"[profile] docs with starts=${dupStarts.count()}")
    timed("cutCoveredSpans")(
      Dedup.cutCoveredSpans(base, "doc_id", dupStarts, n)
        .agg(sum(col("n_removed"))).first().getLong(0))
    timed("full removeDupSpans")(
      Dedup.removeDupSpans(docs, "doc_id", "text", n)
        .agg(sum(col("n_removed"))).first().getLong(0))

    // ---- the pre-r8 implementation, inlined for a same-sample A/B:
    // string-joined grams, countDistinct hot set, per-token exists cut ----
    def oldRemoveDupSpans(df: DataFrame): Long = {
      val base = Dedup.spill(
        df.select(col("doc_id"), TextFunctions.tokens(col("text")).as("__toks")),
        "graft-profile-old-toks")
      val grams = base.filter(size(col("__toks")) >= n)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), size(col("__toks")) - n),
          i => array_join(slice(col("__toks"), i + 1, lit(n)), " ")))
          .as(Seq("__s", "__g")))
      val hot = grams.groupBy(col("__g"))
        .agg(countDistinct(col("doc_id")).as("__d"))
        .filter(col("__d") >= 2).select(col("__g"))
      val dupStarts = grams.join(hot, Seq("__g"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("__s"))).as("__starts"))
      val toks = col("__toks")
      val joined = base.join(dupStarts, Seq("doc_id"), "left")
        .withColumn("__starts", coalesce(col("__starts"), array().cast("array<int>")))
      val kept = filter(transform(toks, (t, p) =>
        struct(t.as("t"), exists(col("__starts"), s =>
          p - lit(n - 1) <= s && s <= p).as("dead"))), x => !x.getField("dead"))
      joined.select(
        (size(toks) - size(kept)).cast("long").as("n_removed"))
        .agg(sum(col("n_removed"))).first().getLong(0)
    }
    timed("OLD full removeDupSpans")(oldRemoveDupSpans(docs))
    spark.stop()
  }
}
