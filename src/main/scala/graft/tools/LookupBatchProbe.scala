package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Price [[graft.ext.Dedup.lookupNearDupsBatch]] at realistic probe
  * volumes (r13 verdict #6): the job-count spec pins 2-vs-8 probes, but a
  * decontamination-style run is 10k probes, where (a) the bounded-probe
  * bucket-IN prune correctly refuses to arm (a 10k-probe key set covers
  * every bucket by birthday arithmetic), and (b) the verify phase's
  * driver-side (doc_id, __dir) collect grows with the probes' match
  * count. This probe builds near-tier stores at three sizes and times the
  * batch lookup at 100 / 1k / 10k probes (half near-dups of stored docs,
  * half novel), reporting wall seconds, result rows, and the collect's
  * row count — the numbers that set the collect gates.
  *
  * Env: SPARK_GRAFT_LBP_STORE_DOCS (default "250000,1000000,2000000"),
  * _PROBES (default "100,1000,10000"), _CPUS (default 32).
  */
object LookupBatchProbe {
  def main(args: Array[String]): Unit = {
    val storeSizes = sys.env.getOrElse("SPARK_GRAFT_LBP_STORE_DOCS",
      "250000,1000000,2000000").split(",").map(_.trim.toLong).toSeq
    val probeSizes = sys.env.getOrElse("SPARK_GRAFT_LBP_PROBES",
      "100,1000,10000").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-lbp").toString
    def docText(idc: org.apache.spark.sql.Column) = concat_ws(" ",
      transform(sequence(lit(0), lit(7)), j =>
        concat(lit("segment "), hex(xxhash64(idc, j)),
          lit(" carries block "), hex(xxhash64(idc, j, lit(1L))))))
    HostCal.warmup()
    storeSizes.foreach { n =>
      val store = s"$work/store-$n"
      val batches = math.max(1, (n / 500000L).toInt)
      (0 until batches).foreach { b =>
        graft.ext.Dedup.ingestStep(
          spark.range(n).filter(pmod(col("id"), lit(batches.toLong)) === b)
            .repartition(cpus.toInt)
            .select(col("id").as("doc_id"), docText(col("id")).as("text")),
          "doc_id", "text", store, nearThreshold = Some(0.7),
          batchTag = Some(f"b$b%02d"), exactArmMinStoreBytes = 0L)
      }
      def bytesOf(root: String): Long = {
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
      }
      println(f"[lbp] store $n%8d docs  ${bytesOf(store) / 1e6}%7.1f MB docs  " +
        f"${bytesOf(store + "_sigs") / 1e6}%7.1f MB sigs  " +
        f"${bytesOf(store + "_bands") / 1e6}%7.1f MB bands")
      probeSizes.foreach { p =>
        // half the probes near-dup a uniformly-spread stored doc, half are
        // novel — the decontamination shape (most eval docs are clean)
        val pid = col("id")
        val target = pmod(xxhash64(lit("t"), pid), lit(n))
        val probeText = when(pmod(pid, lit(2)) === 0,
          concat(docText(target), lit(" tail")))
          .otherwise(concat_ws(" ", transform(sequence(lit(0), lit(7)), j =>
            concat(lit("novel "), hex(xxhash64(lit("x"), pid, j))))))
        val probes = spark.range(p).select(pid.as("probe_id"), probeText.as("text"))
        probes.write.mode("overwrite").parquet(s"$work/probes")
        val pf = spark.read.parquet(s"$work/probes")
        val cal = HostCal.unit()._1
        val t0 = System.nanoTime()
        val rows = graft.ext.Dedup.lookupNearDupsBatch(
          spark, store, pf, "probe_id", "text", 0.7).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[lbp] store $n%8d  probes $p%6d  wall $wall%7.2f s  " +
          f"matches $rows%7d  cal $cal%.3f")
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
