package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Streaming-ingest throughput at absolute scale: the sf1 corpus (6M
  * genuinely distinct documents) driven through the REAL Structured
  * Streaming sinks — `incrementalDedupSink` (exact content tier) and
  * `curatedIngestSink` (quality gate + exact + MinHash near-dup tiers) —
  * as a file-source stream of ~24 micro-batches, the shard-arrival shape
  * of a production ingest. The batch gates have oracle rows
  * (q_stream_curate/funnel/neardup) and plan audits (GatePlanSpec over the
  * real micro-batch plans); this records the missing third axis: absolute
  * docs/sec through the sink, per-tier, at a 6M-document stream with a
  * store that GROWS to 6M docs under it — per-batch cost against an
  * accumulated store is exactly the property a single-batch gate cannot
  * show. One JSON line to stdout (after spark.stop()) and the record to
  * SPARK_GRAFT_BENCH_STREAM (default bench_stream.json). Cold-once per
  * tier with [[HostCal]] brackets (a streaming run IS a sequence of warm
  * batches; re-running the whole stream would only measure page cache).
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAM", "bench_stream.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val work = java.nio.file.Files.createTempDirectory("graft-bench-stream").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cpuNs: () => Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => () => b.getProcessCpuTime
        case _ => () => 0L
      }

    // stage the corpus as 24 source files — one micro-batch per file via
    // maxFilesPerTrigger, the shard-arrival granularity of a real ingest
    val nBatches = 24
    val srcDir = s"$work/src"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.repartition(nBatches).write.parquet(srcDir)
    // the file source feeds files in MODIFICATION-TIME order, and the 24
    // parallel part writes race their mtimes — but incremental dedup
    // survivorship is arrival-order-dependent (whichever near-dup lands
    // first owns the store entry), so an uncontrolled order made survivor
    // counts drift run-to-run (observed ±57 of 5.06M). Stamp strictly
    // increasing mtimes in part-name order: deterministic batches,
    // reproducible record.
    val ls = java.nio.file.Files.list(java.nio.file.Paths.get(srcDir))
    try ls.iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
      .sortBy(_.getFileName.toString).zipWithIndex.foreach { case (p, i) =>
        p.toFile.setLastModified(1000000000000L + i * 60000L)
      }
    finally ls.close()
    val nDocs = spark.read.parquet(srcDir).count()
    val schema = spark.read.parquet(srcDir).schema

    HostCal.warmup()
    val cals = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val results = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Long)]()
    // comma-separated tier subset for cheap A/B iteration (default: all)
    val only = sys.env.get("SPARK_GRAFT_STREAM_TIERS").map(_.split(",").toSet)
    def runTier(name: String)(start: (String, String) => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      if (only.exists(!_.contains(name))) return
      val store = s"$work/$name-store"
      val ckpt = s"$work/$name-ckpt"
      System.gc()
      val calPre = HostCal.unit()._1
      val t0 = System.nanoTime(); val c0 = cpuNs()
      val q = start(store, ckpt)
      q.processAllAvailable()
      q.stop()
      val wall = (System.nanoTime() - t0) / 1e9; val cpu = (cpuNs() - c0) / 1e9
      val calPost = HostCal.unit()._1
      val survivors = graft.ext.Dedup.readStore(spark, store).count()
      cals(name) = (calPre, calPost)
      results(name) = (wall, cpu, survivors)
      System.err.println(s"[bench-stream] $name ${"%.1f".format(wall)}s " +
        s"(cpu ${"%.0f".format(cpu)}s, ${(nDocs / wall).toLong} docs/s, " +
        s"$survivors survivors) cal=${"%.3f".format(calPre)}/${"%.3f".format(calPost)}")
    }
    def source() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)

    // tier 1: exact-content incremental dedup — the cheapest store shape
    runTier("streamExactDedup") { (store, ckpt) =>
      graft.streaming.GraftStreaming.incrementalDedupSink(
        source(), "doc_id", "text", store, ckpt, queryName = "bench-exact")
    }
    // tier 2: full curated ingest — quality gate + exact + near-dup store
    // (64-hash/16-band MinHash against the accumulated signature store)
    runTier("streamCuratedNear") { (store, ckpt) =>
      graft.streaming.GraftStreaming.curatedIngestSink(
        source(), "doc_id", "text", store, ckpt, queryName = "bench-curated",
        minQuality = 0.6, nearThreshold = Some(0.7))
    }

    // tier 3: streaming ANN-index maintenance — the sf1 vector corpus
    // through vectorIndexSink as the same 24-file arrival shape (batch 0
    // bootstraps + freezes the quantizer, every later batch assigns
    // map-only and appends). Rate is VECTORS/sec; "survivors" is the
    // store's row count (must equal the corpus — ingest never drops).
    val vecSrcDir = s"$work/vec-src"
    val skipVector = only.exists(!_.contains("streamVectorIndex"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    if (!skipVector)
      emb.repartition(nBatches).write.options(graft.ext.Dedup.noDictOptions).parquet(vecSrcDir)
    if (!skipVector) {
      val vls = java.nio.file.Files.list(java.nio.file.Paths.get(vecSrcDir))
      try vls.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
        .sortBy(_.getFileName.toString).zipWithIndex.foreach { case (p, i) =>
          p.toFile.setLastModified(1000000000000L + i * 60000L)
        }
      finally vls.close()
    }
    // n_vectors in the record must stay populated even on a subset run
    val nVecs = if (skipVector) emb.count() else spark.read.parquet(vecSrcDir).count()
    val vecSchema = if (skipVector) null else spark.read.parquet(vecSrcDir).schema
    if (!skipVector) locally {
      val store = s"$work/streamVectorIndex-store"
      val ckpt = s"$work/streamVectorIndex-ckpt"
      System.gc()
      val calPre = HostCal.unit()._1
      val t0 = System.nanoTime(); val c0 = cpuNs()
      val q = graft.streaming.GraftStreaming.vectorIndexSink(
        spark.readStream.schema(vecSchema)
          .option("maxFilesPerTrigger", 1).parquet(vecSrcDir),
        "vec_id", "embedding", store, ckpt, nlist = 256,
        queryName = "bench-vector-index")
      q.processAllAvailable()
      q.stop()
      val wall = (System.nanoTime() - t0) / 1e9; val cpu = (cpuNs() - c0) / 1e9
      val calPost = HostCal.unit()._1
      val indexed = graft.ext.Similarity.loadIvfStore(spark, store).indexed.count()
      cals("streamVectorIndex") = (calPre, calPost)
      results("streamVectorIndex") = (wall, cpu, indexed)
      System.err.println(s"[bench-stream] streamVectorIndex ${"%.1f".format(wall)}s " +
        s"(cpu ${"%.0f".format(cpu)}s, ${(nVecs / wall).toLong} vecs/s, " +
        s"$indexed indexed) cal=${"%.3f".format(calPre)}/${"%.3f".format(calPost)}")
    }

    // Merge mode (DEFAULT ON; SPARK_GRAFT_BENCH_STREAM_MERGE=0 opts out):
    // per-tier MIN-WALL across sessions, the protocol the sf1/scaling
    // records use — a streaming tier is deterministic (mtime-ordered
    // batches, fixed corpus), so interference only ever adds time and the
    // fastest session is the closest observation. Guard rails: only a
    // heap-matched prior record merges, and a tier whose SURVIVOR count
    // changed never carries a stale wall (a semantics change must always
    // re-measure). Tiers absent from this session (SPARK_GRAFT_STREAM_TIERS
    // subset runs) carry over verbatim. Merge was opt-IN until r16, and the
    // r15 end-of-round session ran without the flag — one slow non-merged
    // session silently REPLACED the 3-session protocol record (the exact
    // side-path discipline Bench.writeHeadline already had); defaulting to
    // merge makes the write path safe by construction, and the explicit =0
    // opt-out remains for deliberately re-seeding a record.
    val heapGb = Runtime.getRuntime.maxMemory / (1L << 30)
    val merge = !sys.env.get("SPARK_GRAFT_BENCH_STREAM_MERGE").contains("0")
    var sessions = 1
    val priorTiers: Map[String, (Double, Double, Long)] =
      if (!merge) Map.empty
      else {
        val p = java.nio.file.Paths.get(outPath)
        if (!java.nio.file.Files.exists(p)) Map.empty
        else {
          val prior = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          val priorHeap = """"heap_gb"\s*:\s*(\d+)""".r.findFirstMatchIn(prior)
            .map(_.group(1).toInt).getOrElse(-1)
          val priorDocs = """"n_docs"\s*:\s*(\d+)""".r.findFirstMatchIn(prior)
            .map(_.group(1).toLong).getOrElse(-1L)
          val priorVecs = """"n_vectors"\s*:\s*(\d+)""".r.findFirstMatchIn(prior)
            .map(_.group(1).toLong).getOrElse(-1L)
          if (priorHeap != heapGb.toInt || priorDocs != nDocs || priorVecs != nVecs) {
            // a prior record from a different heap OR corpus must never
            // min-wall against this session: carried walls would describe
            // a different workload while the record's n_docs/rates are
            // overwritten with this session's
            System.err.println(s"[bench-stream] merge skipped: prior heap_gb=$priorHeap/" +
              s"n_docs=$priorDocs/n_vectors=$priorVecs vs $heapGb/$nDocs/$nVecs")
            Map.empty
          } else {
            sessions += """"sessions"\s*:\s*(\d+)""".r.findFirstMatchIn(prior)
              .map(_.group(1).toInt).getOrElse(1)
            // carry the prior cal bracket for tiers this (possibly
            // tier-subset) session doesn't run, so the record never loses
            // a carried tier's measurement context
            """"(stream\w+)":\[([0-9.]+),([0-9.]+)\]""".r.findAllMatchIn(prior)
              .foreach(m => if (!cals.contains(m.group(1)))
                cals(m.group(1)) = (m.group(2).toDouble, m.group(3).toDouble))
            val tierRe =
              """"(stream\w+)":\{"wall":([0-9.]+),"cpu":([0-9.]+),"\w+_per_sec":\d+,"survivors":(\d+)\}""".r
            tierRe.findAllMatchIn(prior).map(m =>
              m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble, m.group(4).toLong)).toMap
          }
        }
      }
    val mergedTiers: Seq[(String, (Double, Double, Long))] = {
      val names = (priorTiers.keys ++ results.keys).toSeq.distinct
      names.flatMap { k =>
        (results.get(k), priorTiers.get(k)) match {
          case (Some(n @ (nw, _, ns)), Some(p @ (pw, _, ps))) =>
            if (ps != ns) {
              System.err.println(s"[bench-stream] $k survivors changed $ps -> $ns; keeping this session")
              Some(k -> n)
            } else Some(k -> (if (pw < nw) p else n))
          case (Some(n), None) => Some(k -> n)
          case (None, Some(p)) => Some(k -> p)
          case _ => None
        }
      }
    }
    val record =
      s"""{"metric":"stream_ingest","unit":"sec","n_docs":$nDocs,"n_batches":$nBatches,""" +
      s""""n_vectors":$nVecs,""" +
      s""""tiers":${mergedTiers.map { case (k, (w, c, s)) =>
        // rate denominator: the vector tier streams the embedding corpus,
        // the doc tiers stream the document corpus
        val (rateKey, rateN) =
          if (k == "streamVectorIndex") ("vectors_per_sec", nVecs) else ("docs_per_sec", nDocs)
        s""""$k":{"wall":${"%.2f".format(w)},"cpu":${"%.1f".format(c)},""" +
        s""""$rateKey":${(rateN / w).toLong},"survivors":$s}"""
      }.mkString("{", ",", "}")},""" +
      s""""cal":${cals.map { case (k, (a, b)) =>
        s""""$k":[${"%.3f".format(a)},${"%.3f".format(b)}]""" }.mkString("{", ",", "}")},""" +
      (if (merge && sessions > 1)
        s""""sessions":$sessions,"note":"per-tier min-wall across sessions; """ +
        s"""cal brackets are the most recent session's",""" else "") +
      s""""heap_gb":$heapGb}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (record + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the staged source, stores and checkpoints are scratch — delete them
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(work))
    try {
      val it = walk.sorted(java.util.Comparator.reverseOrder()).iterator()
      while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
    } finally walk.close()
    spark.stop()
    println(record)
    System.out.flush()
  }
}
