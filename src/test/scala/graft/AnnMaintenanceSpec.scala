package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._
import graft.ext.{Kernels, Similarity}

/** ANN store maintenance contracts added/fixed in r11: NaN-robust
  * assignment, retrain-wipes-stale-output, sample-bounded training, and
  * the pruned-probe recall gate that ties [[Similarity.ivfStoreReport]]'s
  * imbalance metric to actual narrow-nprobe recall (the oracle rows prove
  * the EXHAUSTIVE setting; quantizer drift only shows at nprobe ≪ nlist). */
class AnnMaintenanceSpec extends AnyFunSuite {

  private def rmrf(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("nearestCentroidsLoop survives NaN inputs with the sortBy total order") {
    val cents = Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(2.0, 2.0))
    // a NaN element poisons every distance: the argmin scan must fall back
    // to index order (what the replaced stable sortBy did for all-NaN),
    // not crash the build/ingest job on taken(-1)
    val allNaN = Kernels.nearestCentroidsLoop(cents, 3, Seq(Float.NaN, 1.0f))
    assert(allNaN == Seq(0, 1, 2))
    assert(Kernels.nearestCentroidsLoop(cents, 1, Seq(Float.NaN, 1.0f)) == Seq(0))
    // sanity: clean inputs unaffected
    assert(Kernels.nearestCentroidsLoop(cents, 2, Seq(0.9f, 1.1f)) == Seq(1, 0))
  }

  test("ivfRetrain wipes a stale outPath before writing (no silent union)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val store = java.nio.file.Files.createTempDirectory("graft-retrain-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-retrain-out").toString
    try {
      (0 to 1).foreach { s =>
        Similarity.ivfIngestStep(emb.filter(pmod(col("vec_id"), lit(2)) === s),
          "vec_id", "embedding", store, nlist = 4, batchTag = Some(s.toString))
      }
      // pollute outPath the way a crashed/abandoned earlier store would:
      // a pinned store with a batch dir of DUPLICATE ids under a stale
      // quantizer — loadIvfStore unions every batch dir, so without the
      // wipe these rows would silently double the retrained store
      emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
        .withColumn("cluster", lit(0))
        .write.parquet(s"$out/index/batch-stale")
      val pin = new org.apache.hadoop.fs.Path(out, "_params.json")
      val fs = pin.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val os = fs.create(pin, true)
      try os.write("""{"stale":true}""".getBytes("UTF-8")) finally os.close()

      Similarity.ivfRetrain(spark, store, out, nlist = 4)
      val idx = Similarity.loadIvfStore(spark, out)
      assert(idx.indexed.count() == emb.count(),
        "stale batch dirs survived the retrain wipe")
      val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$out/index"))
        .map(_.getPath.getName).toSet
      assert(batchDirs == Set("batch-retrain"), s"unexpected dirs: $batchDirs")
      // and the retrained store still answers exactly at exhaustive probes
      val q = emb.filter(col("vec_id") < 5)
      def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"))).toSet
      assert(keyed(Similarity.ivfTopK(q, idx, "vec_id", "embedding", k = 3, nprobe = 4))
        == keyed(Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3)))
    } finally { rmrf(store); rmrf(out) }
  }

  test("sample-bounded training: sample ⊇ corpus is bit-identical, bounded sample still fits") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val unsampled = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8)
    // the deterministic hash-prefix sample of a 500-row corpus at
    // sampleRows=4096 IS the corpus: centroids must match exactly
    val oversized = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8,
      sampleRows = 4096)
    assert(oversized.length == unsampled.length &&
      oversized.zip(unsampled).forall { case (a, b) => a.sameElements(b) },
      "oversized sample diverged from full-corpus training")
    // a genuinely bounded sample still yields k finite centroids of the
    // right dimension (quality is covered by the recall gate below)
    val bounded = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8,
      sampleRows = 128)
    assert(bounded.length == 8 && bounded.forall(c =>
      c.length == 64 && c.forall(x => !x.isNaN && !x.isInfinite)))
    // PQ books: same oversized-sample identity
    val books0 = Similarity.pqTrain(emb, "embedding", "vec_id", m = 8, ksub = 16,
      dim = 64, iterations = 1)
    val books1 = Similarity.pqTrain(emb, "embedding", "vec_id", m = 8, ksub = 16,
      dim = 64, iterations = 1, sampleRows = 4096)
    assert(books0.zip(books1).forall { case (sa, sb) =>
      sa.zip(sb).forall { case (a, b) => a.sameElements(b) } })
  }

  test("pruned-probe recall gate: narrow-nprobe recall over an incremental store, tied to report imbalance") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val store = java.nio.file.Files.createTempDirectory("graft-recall-gate").toString
    try {
      (0 to 2).foreach { s =>
        Similarity.ivfIngestStep(emb.filter(pmod(col("vec_id"), lit(3)) === s),
          "vec_id", "embedding", store, nlist = 16, batchTag = Some(s.toString))
      }
      val idx = Similarity.loadIvfStore(spark, store)
      val q = emb.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      // nprobe = nlist/4: the setting where a drifted/degenerate frozen
      // quantizer actually shows (exhaustive probes — the oracle rows —
      // are quantizer-independent by construction)
      val approx = Similarity.ivfTopK(q, idx, "vec_id", "embedding", k = 10, nprobe = 4)
      val recall = Similarity.recallAtK(approx, exact)
        .agg(avg(col("recall"))).first().getDouble(0)
      // imbalance from the same store's report: max cell / uniform. A
      // healthy quantizer on this corpus sits in low single digits; a
      // degenerate one (all mass in few cells) drives imbalance up and
      // narrow-nprobe recall DOWN — the report metric is the cheap canary
      // for exactly this gate.
      val report = Similarity.ivfStoreReport(spark, store)
      val imbalance = report.select(col("imbalance")).first().getDouble(0)
      assert(imbalance < 8.0,
        s"store report flags a degenerate quantizer: imbalance=$imbalance")
      // deterministic fixture: measured recall@10 = 0.555 at imbalance
      // 1.98 (500 random vectors / 16 cells / probe 4 is genuinely coarse
      // — random embeddings have no cluster structure to exploit). The
      // gate's job is to catch COLLAPSE (a degenerate quantizer sends
      // recall toward k·nprobe/nlist ≈ 0.25 here), not to certify a high
      // absolute recall on structureless data.
      assert(recall >= 0.45,
        s"narrow-probe recall collapsed: recall@10=$recall (imbalance=$imbalance)")
    } finally rmrf(store)
  }

  test("IVF-PQ store recall gate: narrow nprobe AND narrow rerank over an incremental store") {
    // The PQ path's drift mode is codebook staleness under ingest: the
    // codebooks freeze at batch 0, and ADC quantization error on later
    // batches only shows when `rerank` is NARROW — a generous rerank
    // re-scores with exact cosine and hides any codebook damage (the
    // oracle row q_ann_ivfpq_incr runs exhaustive settings and is
    // quantizer-independent by construction). Gate: multi-batch store,
    // nprobe = nlist/4 and rerank barely above k, recall must stay far
    // from the collapse floor, tied to the same report imbalance canary
    // as the IVF gate above.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val store = java.nio.file.Files.createTempDirectory("graft-pq-recall-gate").toString
    try {
      var model: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] = None
      (0 to 2).foreach { s =>
        model = Some(Similarity.ivfPqIngestStep(
          emb.filter(pmod(col("vec_id"), lit(3)) === s),
          "vec_id", "embedding", store, nlist = 16, m = 8, ksub = 16, dim = 64,
          batchTag = Some(s.toString), cachedModel = model))
      }
      val idx = Similarity.loadIvfPqStore(spark, store)
      val q = emb.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      val approx = Similarity.ivfPqTopK(q, idx, "vec_id", "embedding",
        k = 10, nprobe = 4, rerank = 15)
      val recall = Similarity.recallAtK(approx, exact)
        .agg(avg(col("recall"))).first().getDouble(0)
      val report = Similarity.ivfStoreReport(spark, store)
      val imbalance = report.select(col("imbalance")).first().getDouble(0)
      info(f"ivfpq narrow gate: recall@10=$recall%.3f imbalance=$imbalance%.2f")
      assert(imbalance < 8.0,
        s"store report flags a degenerate quantizer: imbalance=$imbalance")
      // deterministic fixture: measured recall@10 = 0.315 healthy (random
      // structureless embeddings at genuinely coarse settings). A broken
      // codebook makes ADC scores ~random, so the top-15 of the ~125
      // probed candidates overlap the true top-10 at ≈ 15/125 of the
      // 0.555 probe ceiling ≈ 0.07 — the gate sits between the two, a
      // collapse detector, not a recall certificate.
      assert(recall >= 0.20,
        s"narrow probe+rerank recall collapsed: recall@10=$recall (imbalance=$imbalance)")
    } finally rmrf(store)
  }

  test("autoCompactIvfStore: threshold gate, swap, and crashed-swap resume without duplicates") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft-ivf-ac").toString
    val store = s"$root/ivf"
    try {
      var model: Option[Array[Array[Double]]] = None
      (0 to 2).foreach { s =>
        model = Some(Similarity.ivfIngestStep(
          emb.filter(pmod(col("vec_id"), lit(3)) === s),
          "vec_id", "embedding", store, nlist = 4,
          batchTag = Some(s.toString), cachedModel = model))
      }
      val n = emb.count()
      val queries = emb.filter(col("vec_id") < 5)
      def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"))).toSet
      val before = keyed(Similarity.ivfTopK(queries,
        Similarity.loadIvfStore(spark, store), "vec_id", "embedding", k = 3, nprobe = 4))
      // below the gate: nothing runs
      assert(!Similarity.autoCompactIvfStore(spark, store, maxDirs = 4))
      assert(graft.ext.Dedup.listBatchDirs(spark, s"$store/index").size == 3)
      // at the gate: one compacted dir, probes identical
      assert(Similarity.autoCompactIvfStore(spark, store, maxDirs = 3))
      val dirs = graft.ext.Dedup.listBatchDirs(spark, s"$store/index")
      assert(dirs.map(_.split('/').last) == Seq("batch-compacted-1"), s"dirs: $dirs")
      assert(Similarity.loadIvfStore(spark, store).indexed.count() == n)
      assert(keyed(Similarity.ivfTopK(queries,
        Similarity.loadIvfStore(spark, store), "vec_id", "embedding",
        k = 3, nprobe = 4)) == before)
      // CRASHED SWAP: ingest another batch, then hand-build the post-rename
      // crash state — compacted dir present, manifest present, consumed
      // dirs NOT yet deleted. The next call must FINISH the swap (delete
      // exactly the recorded tags), not re-compact the duplicated union.
      model = Some(Similarity.ivfIngestStep(
        emb.filter(pmod(col("vec_id"), lit(3)) === 0), "vec_id", "embedding",
        store, nlist = 4, batchTag = Some("late"), cachedModel = model))
      val preCrash = graft.ext.Dedup.listBatchDirs(spark, s"$store/index")
      assert(preCrash.size == 2) // batch-compacted-1 + batch-late
      Similarity.compactIvfStore(spark, store, s"${store}__crashstage")
      val hconf = spark.sparkContext.hadoopConfiguration
      val mP = new org.apache.hadoop.fs.Path(s"$store/index", "_compacting.json")
      val fs = mP.getFileSystem(hconf)
      val consumed = preCrash.map(_.split('/').last).map(t => s""""$t"""").mkString("[", ",", "]")
      val o = fs.create(mP, true)
      try o.write(s"""{"ordinal":2,"consumed":$consumed}""".getBytes("UTF-8")) finally o.close()
      assert(fs.rename(
        new org.apache.hadoop.fs.Path(s"${store}__crashstage/index/batch-compacted"),
        new org.apache.hadoop.fs.Path(s"$store/index/batch-compacted-2")))
      // duplicated union at rest (the crash window): the whole pre-crash
      // store (667 rows incl. the legit "late" re-embed) plus its
      // compacted copy
      val nStore = emb.count() + emb.filter(pmod(col("vec_id"), lit(3)) === 0).count()
      assert(Similarity.loadIvfStore(spark, store).indexed.count() == 2 * nStore)
      // recovery: below the dir gate, but the crashed swap is finished
      assert(Similarity.autoCompactIvfStore(spark, store, maxDirs = 99))
      val afterDirs = graft.ext.Dedup.listBatchDirs(spark, s"$store/index")
      assert(afterDirs.map(_.split('/').last) == Seq("batch-compacted-2"), s"dirs: $afterDirs")
      assert(!fs.exists(mP), "manifest not cleared after resume")
      assert(Similarity.loadIvfStore(spark, store).indexed.count() == nStore,
        "crashed-swap resume left duplicate neighbors in the store")
    } finally rmrf(root)
  }

  test("removeFromIvfStore: immediate logical exclusion, re-ingest contract, compaction consumes the ledger") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft-ivf-rm").toString
    val store = s"$root/ivf"
    try {
      (0 to 2).foreach { s =>
        Similarity.ivfIngestStep(emb.filter(pmod(col("vec_id"), lit(3)) === s),
          "vec_id", "embedding", store, nlist = 4, batchTag = Some(s.toString))
      }
      val total = emb.count()
      val nRemoved = emb.filter(pmod(col("vec_id"), lit(5)) < 2).count()
      assert(Similarity.removeFromIvfStore(spark, store,
        pmod(col("neighbor_id"), lit(5)) < 2) == nRemoved)
      // exclusion is immediate across every reader: loads, probes, report
      val idx = Similarity.loadIvfStore(spark, store)
      assert(idx.indexed.count() == total - nRemoved)
      assert(idx.indexed.filter(pmod(col("neighbor_id"), lit(5)) < 2).isEmpty,
        "a tombstoned vector is visible to probes")
      assert(Similarity.ivfStoreReport(spark, store)
        .agg(sum(col("n_vectors"))).first().getLong(0) == total - nRemoved,
        "report counts tombstoned vectors")
      val q = emb.filter(col("vec_id") < 5)
      def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"))).toSet
      val survivors = emb.filter(pmod(col("vec_id"), lit(5)) >= 2)
      assert(keyed(Similarity.ivfTopK(q, idx, "vec_id", "embedding", k = 3, nprobe = 4))
        == keyed(Similarity.bruteForceTopK(q, survivors, "vec_id", "embedding", 3)),
        "exhaustive probe over the store-with-removals != brute force over survivors")
      // re-removing already-tombstoned rows is a no-op (digest-tag retries
      // would overwrite their own dir; a NEW no-hit call writes nothing)
      assert(Similarity.removeFromIvfStore(spark, store,
        pmod(col("neighbor_id"), lit(5)) < 2) == 0L)
      // retry re-ingest of shard 0 under its ORIGINAL tag: same tag = same
      // batch, so its removed vectors STAY removed
      Similarity.ivfIngestStep(emb.filter(pmod(col("vec_id"), lit(3)) === 0),
        "vec_id", "embedding", store, nlist = 4, batchTag = Some("0"))
      assert(Similarity.loadIvfStore(spark, store).indexed.count() == total - nRemoved,
        "a same-tag retry resurrected tombstoned vectors")
      // re-ingest of removed content under a NEW tag lands LIVE
      val reIn = emb.filter(pmod(col("vec_id"), lit(35)) === 0)
      val nReIn = reIn.count()
      Similarity.ivfIngestStep(reIn, "vec_id", "embedding", store,
        nlist = 4, batchTag = Some("reingest"))
      assert(Similarity.loadIvfStore(spark, store).indexed.count()
        == total - nRemoved + nReIn, "new-tag re-ingest did not land live")
      // a foreign ledger pin refuses instead of part-excluding
      val pinP = new org.apache.hadoop.fs.Path(s"$store/index_tombstones", "_params.json")
      val fs = pinP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val o = fs.create(pinP, true)
      try o.write("""{"idCol":"doc_id"}""".getBytes("UTF-8")) finally o.close()
      intercept[graft.model.ValidationError] {
        Similarity.removeFromIvfStore(spark, store, lit(false))
      }
      val o2 = fs.create(pinP, true)
      try o2.write("""{"idCol":"neighbor_id"}""".getBytes("UTF-8")) finally o2.close()
      // COMPACTION CONSUMES: the compacted store holds live rows only and
      // carries no ledger; probes are identical before/after
      val beforeCompact = keyed(Similarity.ivfTopK(q,
        Similarity.loadIvfStore(spark, store), "vec_id", "embedding", k = 3, nprobe = 4))
      Similarity.compactIvfStore(spark, store, s"$root/compacted")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/compacted/index_tombstones")),
        "compaction copied the tombstone ledger into the new store")
      val cIdx = Similarity.loadIvfStore(spark, s"$root/compacted")
      assert(cIdx.indexed.count() == total - nRemoved + nReIn)
      assert(keyed(Similarity.ivfTopK(q, cIdx, "vec_id", "embedding", k = 3, nprobe = 4))
        == beforeCompact, "compaction changed a probe answer")
    } finally rmrf(root)
  }

  test("removeFromIvfStore on a PQ store; autoCompactIvfStore consumes the tombstone dirs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq-rm").toString
    try {
      // PQ store: the ledger keys on the shared (tag, neighbor_id) shape
      val pq = s"$root/pq"
      var model: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] = None
      (0 to 1).foreach { s =>
        model = Some(Similarity.ivfPqIngestStep(
          emb.filter(pmod(col("vec_id"), lit(2)) === s), "vec_id", "embedding",
          pq, nlist = 4, m = 8, ksub = 16, dim = 64,
          batchTag = Some(s.toString), cachedModel = model))
      }
      val nRm = emb.filter(pmod(col("vec_id"), lit(7)) === 0).count()
      assert(Similarity.removeFromIvfStore(spark, pq,
        pmod(col("neighbor_id"), lit(7)) === 0) == nRm)
      val q = emb.filter(col("vec_id") < 5)
      def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"))).toSet
      val pqSurvivors = emb.filter(pmod(col("vec_id"), lit(7)) =!= 0)
      assert(keyed(Similarity.ivfPqTopK(q, Similarity.loadIvfPqStore(spark, pq),
        "vec_id", "embedding", k = 3, nprobe = 4, rerank = 1 << 20))
        == keyed(Similarity.bruteForceTopK(q, pqSurvivors, "vec_id", "embedding", 3)),
        "PQ store exhaustive probe != brute force over survivors")
      // AUTO-compact applies the deletes and deletes the consumed
      // tombstone dirs with the consumed index dirs
      val ivf = s"$root/ivf"
      (0 to 2).foreach { s =>
        Similarity.ivfIngestStep(emb.filter(pmod(col("vec_id"), lit(3)) === s),
          "vec_id", "embedding", ivf, nlist = 4, batchTag = Some(s.toString))
      }
      val nRm2 = emb.filter(pmod(col("vec_id"), lit(5)) < 2).count()
      assert(Similarity.removeFromIvfStore(spark, ivf,
        pmod(col("neighbor_id"), lit(5)) < 2) == nRm2)
      val before = keyed(Similarity.ivfTopK(q, Similarity.loadIvfStore(spark, ivf),
        "vec_id", "embedding", k = 3, nprobe = 4))
      // maxDirs=4 over 3 index dirs: ONLY the tombstone dir pushes the
      // count to the threshold — a removal-heavy store compacts (and
      // applies its deletes) without waiting for index-dir growth
      assert(Similarity.autoCompactIvfStore(spark, ivf, maxDirs = 4))
      assert(graft.ext.Dedup.listBatchDirs(spark, s"$ivf/index_tombstones").isEmpty,
        "auto-compact left consumed tombstone dirs behind")
      assert(Similarity.loadIvfStore(spark, ivf).indexed.count()
        == emb.count() - nRm2)
      assert(keyed(Similarity.ivfTopK(q, Similarity.loadIvfStore(spark, ivf),
        "vec_id", "embedding", k = 3, nprobe = 4)) == before,
        "auto-compact over a store with removals changed a probe answer")
    } finally rmrf(root)
  }
}
