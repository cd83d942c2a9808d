package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Absolute-scale datapoint: the three headline queries at a TRUE sf1
  * (6M-row lineitem) plus twelve soak workloads over the genuinely
  * distinct 6M-document / 200k-vector corpus [[GenSf1]] writes — corpus
  * curation, SemDeDup, MinHash pairs, connected-components cluster stats,
  * span cutting, survivor selection, URL dedup, chunk→doc mean pooling,
  * and the IVF/PQ ANN build+probe tiers — the jittered-replica soak in
  * Bench proves distribution shape, this proves absolute volume. Measurement: headline = 5 warm-ups then median of 7 on
  * a pinned physical plan (self-flags `noisy` on a median/min spread);
  * each extra runs from a GC'd slate — at 5-10-minute workload sizes
  * a "warm" re-run mostly measures the first run's leftover heap and
  * page-cache state, so cold-per-attempt is the honest protocol here —
  * and an attempt whose HostCal bracket lands >20% above the session's
  * quietest observation is retried (≤3 attempts, quietest bracket kept,
  * attempt counts recorded): co-tenant interference on this host swings
  * identical runs 1.5-5×, and a bracketed retry converges the record on
  * the workload's own cost instead of the neighbor's. One JSON
  * line to stdout (last, after spark.stop()) and the full record to
  * SPARK_GRAFT_BENCH_SF1 (default bench_sf1.json).
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
      // the ANN probes aggregate per-query bounded heaps (graft_top_k, a
      // TypedImperativeAggregate); ObjectHashAggregate's default in-memory
      // key budget (128) falls back to in-partition sort-agg with a
      // 1000-query probe batch — raise it so the hash path holds (1000
      // heaps of k entries is a few MB per task)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
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
      // deeper warm-up than the sf0.1 bench: at 6M cached rows the first
      // post-codegen iterations still shift (JIT recompilation, cache-line
      // residency), and a GC beforehand keeps collector debt from a prior
      // query out of this one's iterations
      System.gc()
      (1 to 5).foreach(_ => once())
      Stat(Seq.fill(7)(once()))
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
    // Each extra runs ONCE, from as clean a slate as a shared JVM allows
    // (a System.gc() first lets the ContextCleaner release the previous
    // workload's shuffle files). The sf0.1 bench's cold/warm pairs are the
    // wrong protocol at this scale: a "warm" re-run of a 5-10 minute
    // workload mostly measures the first run's leftover heap and page-cache
    // state — the first sf1 record's clusterStats ran 199 s cold and 419 s
    // "warm", a physically-meaningless inversion — so the absolute-scale
    // record is one honest cold number per workload.
    // Host-interference bracket: the shared host's co-tenants have inflated
    // identical runs 2-3× (wall AND cpu-seconds together — SMT/bandwidth
    // contention, invisible to load-average inside this VM). A fixed
    // single-threaded reference kernel (HostCal) timed immediately before
    // and after each extra records the host's delivered per-core throughput
    // DURING the sweep; per-item inflation = cal/min(all cals). Two records
    // are comparable item-by-item only at similar cal.
    HostCal.warmup()
    val cals = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val excesses = scala.collection.mutable.LinkedHashMap[String, Double]()
    val attempts = scala.collection.mutable.LinkedHashMap[String, Int]()
    // the quietest cal observed this session — the host's delivered
    // per-core throughput when no co-tenant interferes; later attempts
    // refine it downward
    var calFloor = HostCal.unit()._1
    // Retry-on-interference: a cal bracket sampling >20% above the
    // session's quietest observation means the item ran under co-tenant
    // load (the brackets on this host have shown 1.5-5x swings between
    // adjacent items). One retry round is a measurement protocol, not
    // cherry-picking: the quietest attempt is the closest observation of
    // the workload's own cost, every attempt's bracket is recorded, and a
    // still-noisy final attempt stays flagged by its cal values.
    //
    // The single-thread cal probe is BLIND to one interference mode: a
    // co-tenant saturating the sibling hyperthreads degrades a 32-thread
    // workload ~2x while a 1-thread probe still gets a full core (observed:
    // minhash at 146 s under load-average 18 with cal reading a quiet
    // 0.110, vs 71 s on an idle host). So the bracket also reads the
    // system load average (this JVM's own runnable threads subtracted via
    // its process CPU rate) and flags the attempt when EXCESS load — other
    // processes' runnable threads — tops 4 cores' worth.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // CPU tripwire vs the COMMITTED record: r10's sf1UrlDedup ran 283→551
    // CPU-s under QUIET cal brackets — contention that neither probe saw
    // (the cal thread and load average both read clean). CPU-seconds of a
    // deterministic workload don't double by themselves, so an attempt
    // whose process-CPU exceeds the committed record's by >1.5× is treated
    // exactly like a noisy bracket: retried (≤3), min-wall kept, and the
    // final attempt stays visibly flagged by its recorded cpu either way.
    val committedCpu: Map[String, Double] = {
      val committed = java.nio.file.Paths.get("bench_sf1.json")
      if (!java.nio.file.Files.exists(committed)) Map.empty
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(committed), "UTF-8")
        """"extras_cpu":\{([^}]*)\}""".r.findFirstMatchIn(txt).map { m =>
          """"([A-Za-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(m.group(1))
            .map(p => p.group(1) -> p.group(2).toDouble).toMap
        }.getOrElse(Map.empty)
      }
    }
    // Keep-rule: MIN WALL across attempts. The workload is deterministic,
    // so interference only ever ADDS time — the fastest attempt is by
    // construction the closest observation of the workload's own cost
    // (classic min-of-N). An earlier composite that preferred the
    // quietest-LOOKING bracket kept a 204 s survivor run (cal 0.121,
    // excess 0.0 — the contention was invisible to both probes) over a
    // 93 s one; probes gate RETRIES and are recorded, they don't select.
    // comma-separated extras subset (default all) — with MERGE=1 this
    // retries just the named tiers against the committed record, the
    // unmeasured ones carrying over verbatim. Probe tiers (sf1IvfTopK etc.)
    // need their builds in the set.
    val onlyItems = sys.env.get("SPARK_GRAFT_SF1_ITEMS").map(_.split(",").toSet)
    def timedOnce(name: String)(f: => Long): Option[(String, (Double, Double))] = {
      if (onlyItems.exists(!_.contains(name))) return None
      var best: (Double, Double, Double, Double, Double) = null // wall, cpu, calPre, calPost, excess
      var attempt = 0
      var quiet = false
      while (attempt < 3 && !quiet) {
        attempt += 1
        System.gc()
        val calPre = HostCal.unit()._1
        val t0 = System.nanoTime(); val c0 = cpuNs(); f
        val wall = (System.nanoTime() - t0) / 1e9; val cpu = (cpuNs() - c0) / 1e9
        val calPost = HostCal.unit()._1
        // own-load ≈ this process's average running threads over the item;
        // excess = 1-min load average beyond that = someone else's work.
        // Only meaningful for items longer than the load-average horizon —
        // a short item's sample still reflects the PREVIOUS item's threads.
        val ownLoad = cpu / math.max(wall, 0.001)
        val excess = math.max(0.0, osBean.getSystemLoadAverage - ownLoad)
        calFloor = math.min(calFloor, math.min(calPre, calPost))
        val bracket = math.max(calPre, calPost)
        if (best == null || wall < best._1)
          best = (wall, cpu, calPre, calPost, excess)
        val cpuJump = committedCpu.get(name).exists(c => cpu > c * 1.5)
        // Short tiers always get >=2 attempts: the r11 urlDedup probe
        // showed a fresh codegen'd CPU-dense tier pays 1.4-2x its warm
        // CPU in JIT warm-up on attempt 1-2 (266 vs 364-497 CPU-s for an
        // identical reused plan, idle host, quiet cal) — at a <60 s wall
        // that fixed cost is a measurable fraction the probes can't flag,
        // and min-of-2 amortizes it the same way the headline queries'
        // warm-up iterations do. Long tiers keep single-attempt cold runs:
        // there the warm-up is noise and a second 3-minute run is not.
        val needSecond = wall < 60.0 && attempt < 2
        quiet = bracket <= calFloor * 1.2 && (wall < 30.0 || excess <= 4.0) &&
          !cpuJump && !needSecond
        System.err.println(s"[bench-sf1] $name#$attempt ${"%.1f".format(wall)}s " +
          s"(cpu ${"%.0f".format(cpu)}s) cal=${"%.3f".format(calPre)}/${"%.3f".format(calPost)}" +
          s" excess=${"%.1f".format(excess)}" +
          (if (cpuJump) s" [cpu >1.5x committed ${"%.0f".format(committedCpu(name))}s]" else "") +
          (if (!quiet && attempt < 3) " [noisy bracket, retrying]" else ""))
      }
      cals(name) = (best._3, best._4)
      excesses(name) = best._5
      attempts(name) = attempt
      Some(name -> ((best._1, best._2)))
    }
    var histogram = ""
    var sf1Ivf: graft.ext.Similarity.IvfIndex = null
    var sf1Pq: graft.ext.Similarity.PqIndex = null
    var sf1IvfPq: graft.ext.Similarity.IvfPqIndex = null
    val extras: Seq[(String, (Double, Double))] = Seq(
      // packSubShards = cores: the 5-value lang shard key would otherwise
      // serialize the 55% majority language through ONE next-fit task
      timedOnce("sf1CorpusCurate")(graft.ext.Corpus.curate(
        docs.select(col("doc_id"), col("text"), col("lang")), "doc_id", "text",
        Seq("lang"), graft.ext.Corpus.CurateConfig(minQuality = 0.6, budget = 2048L,
          packSubShards = cpus.toInt)).count()),
      timedOnce("sf1SemDedup")(graft.ext.Dedup.semDedup(
        emb, "vec_id", "embedding", k = 256, threshold = 0.7).count()),
      timedOnce("sf1Minhash")(graft.ext.Dedup.minhashLshPairs(
        docs, "doc_id", "text").count()),
      timedOnce("sf1ClusterStats") {
        val hist = graft.ext.Dedup.clusterStats(graft.ext.Dedup.minhashLshPairs(
          docs, "doc_id", "text", threshold = 0.5)).collect()
        histogram = hist.sortBy(_.getAs[Long]("size"))
          .map(r => s"${r.getAs[Long]("size")}:${r.getAs[Long]("n_clusters")}")
          .mkString(" ")
        System.err.println(s"[bench-sf1] cluster-size histogram: $histogram")
        hist.map(_.getAs[Long]("n_clusters")).sum
      },
      timedOnce("sf1DupSpans")(graft.ext.Dedup.removeDupSpans(
        docs, "doc_id", "text", n = 3).agg(sum(col("n_removed"))).first().getLong(0)),
      // quality-priority survivor selection over the full 6M corpus — the
      // same pair-set-bounded window + anti-join shape the sf0.1 bench
      // times, at absolute volume
      timedOnce("sf1DedupSurvivor")(graft.ext.Dedup.dedupNearBy(
        docs, "doc_id", "text", priority = col("n_chars"),
        threshold = 0.5).count()),
      timedOnce("sf1UrlDedup")(graft.ext.TextFunctions.urlDedup(
        docs.select(col("doc_id"),
          concat(lit("https://Host"), (col("doc_id") % 100000).cast("string"),
            lit(".example.org/p/"), (col("doc_id") % 500000).cast("string"),
            lit("?utm_source=x&a=1")).as("url")),
        "doc_id", "url").count()),
      // chunk→document pooling over the vector corpus (10 chunks per doc)
      timedOnce("sf1MeanPool")(graft.ext.Similarity.meanPool(
        emb.withColumn("doc_id", (col("vec_id") / 10).cast("long")),
        Seq("doc_id"), "embedding").count()),
      // ANN build/probe at 200k vectors: nlist 256 (~N/800 per cell, the
      // coarse-quantizer sizing a real IVF deployment scales with the
      // corpus), 1000-query probe batch, nprobe 16 = the recall-curve knee
      // of the committed sf0.1 record
      timedOnce("sf1IvfBuild") {
        sf1Ivf = graft.ext.Similarity.ivfBuild(emb, "vec_id", "embedding", nlist = 256)
        sf1Ivf.indexed.count()
      },
      timedOnce("sf1IvfTopK")(graft.ext.Similarity.ivfTopK(
        emb.filter(col("vec_id") < 1000), sf1Ivf, "vec_id", "embedding",
        k = 10, nprobe = 16).count()),
      timedOnce("sf1PqBuild") {
        sf1Pq = graft.ext.Similarity.pqBuild(emb, "vec_id", "embedding",
          m = 8, ksub = 16, dim = 64)
        sf1Pq.codes.count()
      },
      timedOnce("sf1PqTopK")(graft.ext.Similarity.pqTopK(
        emb.filter(col("vec_id") < 1000), sf1Pq, "vec_id", "embedding",
        k = 10, rerank = 50).count()),
      // the combined tier a 100-TB ANN deployment actually runs: coarse
      // IVF pruning over PQ codes, batched clustered ADC sweep
      timedOnce("sf1IvfPqBuild") {
        sf1IvfPq = graft.ext.Similarity.ivfPqBuild(emb, "vec_id", "embedding",
          nlist = 256, m = 8, ksub = 16, dim = 64)
        sf1IvfPq.indexed.count()
      },
      timedOnce("sf1IvfPqTopK")(graft.ext.Similarity.ivfPqTopK(
        emb.filter(col("vec_id") < 1000), sf1IvfPq, "vec_id", "embedding",
        k = 10, nprobe = 16, rerank = 50).count())).flatten

    def fmt(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }.mkString("{", ",", "}")
    val results = stats.map { case (k, s) => k -> s.med }
    val spread = stats.map { case (k, s) =>
      s""""$k":{"min":${"%.4f".format(s.min)},"med":${"%.4f".format(s.med)},"max":${"%.4f".format(s.max)}}"""
    }.mkString("{", ",", "}")
    val noisy = stats.exists(_._2.noisy)
    // ---- optional cross-session min-wall merge (SPARK_GRAFT_BENCH_SF1_MERGE=1) ----
    // Same protocol bench_scaling.json adopted in r10 and for the same
    // reason: the single-thread cal probe and the load-average excess
    // probe are both blind to sibling-hyperthread contention, so a long
    // single-attempt tier can run 10-20% degraded with QUIET brackets and
    // no retry fires (r11 observed dedupSurvivor 131→153 s across two
    // back-to-back sessions at identical outputs). The workloads are
    // deterministic, so interference only ever ADDS time — per-item
    // min-wall across sessions is min-of-N measurement, not cherry-picking:
    // the kept attempt's cpu/cal/excess ride along, attempts are summed,
    // and `sessions` records how many runs the min is over.
    var sessions = 1
    val extrasMerged: Seq[(String, (Double, Double))] = {
      val prior = java.nio.file.Paths.get(outPath)
      if (!sys.env.get("SPARK_GRAFT_BENCH_SF1_MERGE").contains("1") ||
          !java.nio.file.Files.exists(prior)) extras
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(prior), "UTF-8")
        def objOf(field: String): Map[String, String] =
          (s""""$field":\\{([^}]*)\\}""").r.findFirstMatchIn(txt).map { m =>
            """"([A-Za-z0-9_]+)":(\[[^\]]*\]|[^,}]+)""".r.findAllMatchIn(m.group(1))
              .map(p => p.group(1) -> p.group(2)).toMap
          }.getOrElse(Map.empty)
        val priorHeap = """"heap_gb":(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
        if (!priorHeap.contains((Runtime.getRuntime.maxMemory / (1L << 30)).toInt)) {
          System.err.println(s"[bench-sf1] merge skipped: prior record heap_gb=$priorHeap" +
            " differs from this run — records merge only at like-for-like memory")
          extras
        } else {
          // tolerant numeric parses: one malformed prior value must not
          // abort the merge (the carried-item loop below warns per key)
          def numMap[T](field: String, parse: String => T): Map[String, T] =
            objOf(field).flatMap { case (k, v) =>
              scala.util.Try(parse(v.trim)).toOption.map(k -> _)
            }
          val pw = numMap("extras", _.toDouble)
          val pc = numMap("extras_cpu", _.toDouble)
          val pcal = objOf("cal")
          val pat = numMap("attempts", _.toInt)
          val pex = numMap("excess_load", _.toDouble)
          sessions = """"sessions":(\d+)""".r.findFirstMatchIn(txt)
            .map(_.group(1).toInt).getOrElse(1) + 1
          def priorCal(k: String): Unit = pcal.get(k).foreach { arr =>
            val nums = arr.stripPrefix("[").stripSuffix("]").split(",").map(_.toDouble)
            if (nums.length == 2) cals(k) = (nums(0), nums(1))
          }
          val merged = extras.map { case (k, (w, c)) =>
            attempts(k) = attempts.getOrElse(k, 1) + pat.getOrElse(k, 1)
            pw.get(k) match {
              case Some(p) if p < w =>
                System.err.println(f"[bench-sf1] merge: keeping prior $k $p%.1f s (this run $w%.1f)")
                priorCal(k)
                pex.get(k).foreach(e => excesses(k) = e)
                k -> ((p, pc.getOrElse(k, c)))
              case _ => k -> ((w, c))
            }
          }
          // items not measured this run (SPARK_GRAFT_SF1_ITEMS subset) carry
          // over from the committed record verbatim, in its order
          val measured = merged.map(_._1).toSet
          // carried keys come from a DIFFERENT regex over the prior record
          // than the one that built pw, so look up defensively: a prior
          // value pw's parse couldn't recover (format drift, scientific
          // notation) is skipped with a warning instead of throwing
          // NoSuchElementException after all measurement work is done
          val carried = """"([A-Za-z0-9_]+)":([0-9.]+)""".r
            .findAllMatchIn(""""extras":\{([^}]*)\}""".r.findFirstMatchIn(txt)
              .map(_.group(1)).getOrElse(""))
            .map(_.group(1)).filterNot(measured).toSeq.flatMap { k =>
              pw.get(k) match {
                case None =>
                  System.err.println(s"[bench-sf1] merge: dropping carried item $k — " +
                    "prior record value was not parseable as a number")
                  None
                case Some(w) =>
                  priorCal(k)
                  pex.get(k).foreach(e => excesses(k) = e)
                  attempts(k) = pat.getOrElse(k, 1)
                  Some(k -> ((w, pc.getOrElse(k, 0.0))))
              }
            }
          if (histogram.isEmpty)
            histogram = """"cluster_histogram":"([^"]*)"""".r.findFirstMatchIn(txt)
              .map(_.group(1)).getOrElse("")
          merged ++ carried
        }
      }
    }
    val record =
      s"""{"metric":"total","value":${"%.4f".format(results.map(_._2).sum)},"unit":"sec",""" +
      s""""queries":${fmt(results)},"queries_cpu":${fmt(stats.map { case (k, s) => k -> s.medCpu })},""" +
      s""""spread":$spread,""" +
      s""""extras":${fmt(extrasMerged.map { case (k, r) => k -> r._1 })},""" +
      s""""extras_cpu":${fmt(extrasMerged.map { case (k, r) => k -> r._2 })},""" +
      s""""noisy":$noisy,"sessions":$sessions,""" +
      (if (sessions > 1) s""""note":"extras are per-item MIN-WALL across $sessions sessions (deterministic workloads; kept attempt's cpu/cal/excess recorded, attempts summed)",""" else "") +
      s""""cluster_histogram":"$histogram",""" +
      s""""cal":${cals.map { case (k, (a, b)) =>
        s""""$k":[${"%.3f".format(a)},${"%.3f".format(b)}]""" }.mkString("{", ",", "}")},""" +
      s""""cal_min":${"%.3f".format(cals.values.flatMap(c => Seq(c._1, c._2)).min)},""" +
      s""""cal_max":${"%.3f".format(cals.values.flatMap(c => Seq(c._1, c._2)).max)},""" +
      s""""attempts":${attempts.map { case (k, n) => s""""$k":$n""" }.mkString("{", ",", "}")},""" +
      s""""excess_load":${excesses.map { case (k, e) =>
        s""""$k":${"%.1f".format(e)}""" }.mkString("{", ",", "}")},""" +
      s""""docs_per_sec":${results.map { case (k, v) => s""""$k":${(nRows / v).toLong}""" }.mkString("{", ",", "}")},""" +
      s""""rows":$nRows,"n_docs":$nDocs,"n_vectors":$nVec,"sf":"$sfDir",""" +
      // heap is part of the measurement at this scale: a 6M-doc in-memory
      // sweep on the 8g default spends its CPU in GC (an early r8 run
      // doubled every join-heavy entry, then OOMed) — record it so two
      // records are only ever compared at like-for-like memory
      s""""heap_gb":${Runtime.getRuntime.maxMemory / (1L << 30)}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (record + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(record)
    System.out.flush()
  }
}
