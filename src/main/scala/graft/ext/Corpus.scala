package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition the individual
  * `ext` primitives exist for, packaged as one declarative recipe —
  *
  *   (crawl URL dedup) → (HTML strip + NFC normalize) →
  *   (line-level boilerplate dedup) → exact dedup → (MinHash near-dedup) →
  *   (benchmark decontamination) → (LM perplexity filter) →
  *   quality filter → PII scrub → token accounting →
  *   shard-local greedy context-window packing.
  *
  * Parenthesized tiers are opt-in. Everything is a single lazy plan until
  * [[Packing.packGreedy]]'s shard repartition: the mandatory path costs one
  * md5 hash-shuffle for dedup, a codegen'd scan for normalize/score/scrub,
  * and one shard shuffle for packing; each opt-in tier adds only its own
  * keyed exchange (line text, LSH band key, n-gram broadcast). No
  * driver-side state anywhere. Each constituent is oracle-checked on its
  * own (q_normalize, q_line_dedup, q_dedup_exact, q_decontam,
  * q_text_quality, q_pack_greedy); q_corpus_curate checks the composition.
  */
object Corpus {

  /** @param minQuality drop documents scoring at or below this
    *                    [[TextFunctions.qualityScore]] threshold
    * @param maxLineRepetition drop documents whose
    *                    [[TextFunctions.lineRepetitionRatio]] exceeds this
    * @param budget token budget per training pack
    * @param nearDupThreshold when set, additionally drop MinHash+LSH
    *                    near-duplicates above this Jaccard threshold
    *                    ([[Dedup.dedupNear]]: banded candidate join + exact
    *                    verify + component survivors) after the exact tier
    * @param normalize when true, strip HTML and NFC-normalize the text
    *                    FIRST — canonical bytes are what make the
    *                    hash-based dedup tiers below actually match
    * @param repairEncoding when true, run [[TextFunctions.repairMojibake]]
    *                    before the normalize step (repair feeds NFC the
    *                    true code points; clean text is untouched)
    * @param lineDedupMaxCount when set, drop lines occurring more than
    *                    this many times corpus-wide ([[Dedup.lineDedup]])
    *                    before whole-document dedup, so shared boilerplate
    *                    can't mask otherwise-identical documents
    * @param decontamN word n-gram size for the decontamination tier
    *                    (only used when `eval` is passed to [[curate]])
    * @param gopherRules when true, additionally require every
    *                    [[TextFunctions.gopherPass]] rule (the published
    *                    Gopher §A1.1 heuristics) in the quality gate
    * @param compressionBand when set, additionally require the deflate
    *                    [[TextFunctions.compressionRatio]] inside
    *                    `(lo, hi)` — the Dolma-style entropy gate that
    *                    catches template spam (too compressible) and
    *                    pasted binary junk (incompressible) the
    *                    word-statistics score can miss
    * @param urlCol when set, crawl-dedup FIRST on
    *                    [[TextFunctions.canonicalizeUrl]] of this column
    *                    (keep-first by id) — the cheapest tier, it runs on
    *                    metadata before any content is touched
    * @param packSubShards parallelism for the final [[Packing.packGreedy]]
    *                    step when `shardCols` is low-cardinality (a 5-value
    *                    language column serializes its majority language
    *                    through one task) — each shard packs as this many
    *                    independent hash buckets with disjoint pack ids.
    *                    Size it ~cluster cores at corpus scale; 1 keeps the
    *                    exact single-sequence-per-shard assignment */
  final case class CurateConfig(minQuality: Double = 0.6,
                                maxLineRepetition: Double = 1.0,
                                budget: Long = 2048L,
                                nearDupThreshold: Option[Double] = None,
                                normalize: Boolean = false,
                                repairEncoding: Boolean = false,
                                lineDedupMaxCount: Option[Long] = None,
                                decontamN: Int = 13,
                                gopherRules: Boolean = false,
                                compressionBand: Option[(Double, Double)] = None,
                                urlCol: Option[String] = None,
                                packSubShards: Int = 1)

  /** Curate `docs` into packed training shards. Output keeps the input
    * columns (with `textCol` normalized/line-deduped/scrubbed in place)
    * plus `quality`, `line_repetition`, `n_tok`, `pack_id`, `pack_offset`.
    * Quality gates are evaluated on the cleaned-but-unscrubbed text
    * (scrubbing must not rescue a junk document); token accounting runs on
    * the scrubbed text that would actually be trained on.
    *
    * @param eval held-out benchmark frame and its text column; when given,
    *             documents sharing any `decontamN`-gram with it are dropped
    *             ([[Decontamination.removeContaminated]])
    * @param lm reference language model as `(counts, order, maxPpl)` —
    *           a [[LanguageModel.ngramCounts]] frame (CCNet trains it on a
    *           high-quality corpus, so it broadcast-joins), the n-gram
    *           order, and the perplexity ceiling. When given, documents
    *           scoring above `maxPpl` under stupid backoff are dropped in
    *           the quality gate and the output gains a `ppl` column. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             shardCols: Seq[String], cfg: CurateConfig = CurateConfig(),
             eval: Option[(DataFrame, String)] = None,
             lm: Option[(DataFrame, Int, Double)] = None): DataFrame = {
    val scored = curateStages(docs, idCol, textCol, cfg, eval, lm).last._2
    Packing.packGreedy(scored, shardCols, Seq(col(idCol)), col("n_tok"), cfg.budget,
      subShards = cfg.packSubShards)
  }

  /** The row-DROPPING tiers of [[curate]], named and in order; the last
    * frame is the scored+scrubbed input [[Packing.packGreedy]] consumes.
    * Text-rewriting steps (encoding repair, normalize, line dedup) fold
    * into the frame that follows them — they change bytes, not row counts. */
  private def curateStages(docs: DataFrame, idCol: String, textCol: String,
                           cfg: CurateConfig, eval: Option[(DataFrame, String)],
                           lm: Option[(DataFrame, Int, Double)]): Vector[(String, DataFrame)] = {
    var out = Vector.empty[(String, DataFrame)]
    val urlDeduped = cfg.urlCol match {
      case Some(u) => TextFunctions.urlDedup(docs, idCol, u)
      case None    => docs
    }
    if (cfg.urlCol.isDefined) out :+= ("url_dedup" -> urlDeduped)
    val repaired =
      if (cfg.repairEncoding)
        urlDeduped.withColumn(textCol, TextFunctions.repairMojibake(col(textCol)))
      else urlDeduped
    val normalized =
      if (cfg.normalize)
        repaired.withColumn(textCol,
          TextFunctions.normalizeNfc(TextFunctions.stripHtml(col(textCol))))
      else repaired
    val lineDeduped = cfg.lineDedupMaxCount match {
      case Some(k) =>
        val clean = Dedup.lineDedup(normalized, idCol, textCol, k)
          .select(col(idCol), col("clean_text").as(textCol))
        normalized.drop(textCol).join(clean, Seq(idCol))
      case None => normalized
    }
    val exact = Dedup.exactDedup(lineDeduped, idCol, textCol)
    out :+= ("exact_dedup" -> exact)
    val deduped = cfg.nearDupThreshold match {
      case Some(t) => Dedup.dedupNear(exact, idCol, textCol, threshold = t)
      case None    => exact
    }
    if (cfg.nearDupThreshold.isDefined) out :+= ("near_dedup" -> deduped)
    val decontaminated = eval match {
      case Some((ev, evCol)) =>
        Decontamination.removeContaminated(deduped, idCol, textCol, ev, evCol, cfg.decontamN)
      case None => deduped
    }
    if (eval.isDefined) out :+= ("decontam" -> decontaminated)
    val lmFiltered = lm match {
      case Some((counts, order, maxPpl)) =>
        LanguageModel.perplexityFilter(decontaminated, idCol, textCol,
          counts, order, maxPpl)
      case None => decontaminated
    }
    if (lm.isDefined) out :+= ("lm_filter" -> lmFiltered)
    val scored = lmFiltered
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScoreFrom(col("__toks"), col(textCol)))
      .withColumn("line_repetition", TextFunctions.lineRepetitionRatio(col(textCol)))
      .filter(col("quality") > cfg.minQuality &&
        col("line_repetition") <= cfg.maxLineRepetition &&
        (if (cfg.gopherRules) TextFunctions.gopherPass(col(textCol)) else lit(true)) &&
        (cfg.compressionBand match {
          case Some((lo, hi)) =>
            TextFunctions.compressionRatio(col(textCol)).between(lo, hi)
          case None => lit(true)
        }))
      .drop("__toks")
      .withColumn(textCol, TextFunctions.scrubPii(col(textCol)))
      .withColumn("n_tok", TextFunctions.tokenCount(col(textCol)))
    out :+ ("quality_gate" -> scored)
  }

  /** Funnel report for a [[curate]] run: one row per row-dropping tier
    * with rows surviving and rows dropped — the numbers a pipeline owner
    * reads before anything else ("where did my corpus go?"). A diagnostic,
    * not part of the curate plan: each tier's count re-executes the chain
    * prefix, so the cost is tiers × the chain (every tier is a bounded
    * count action, nothing collects). At the full 100 TB scale run it on a
    * [[Sampling.deterministicFraction]] sample — the funnel SHAPE, which
    * is what you are reading, survives sampling.
    *
    * @return (tier, rows, dropped, drop_ratio) rows, `input` first,
    *         tier order preserved in `tier_idx`. */
  def curateFunnel(docs: DataFrame, idCol: String, textCol: String,
                   cfg: CurateConfig = CurateConfig(),
                   eval: Option[(DataFrame, String)] = None,
                   lm: Option[(DataFrame, Int, Double)] = None): DataFrame =
    funnelRows(("input" -> docs) +: curateStages(docs, idCol, textCol, cfg, eval, lm))

  /** Count a named stage chain into funnel rows — the shared shape behind
    * [[curateFunnel]] and the streaming curated-ingest receipt
    * ([[graft.streaming.GraftStreaming.curatedIngestSink]]'s `funnelPath`),
    * so batch and streaming funnels are the same computation on different
    * stage lists. Each stage is one bounded count action. */
  private[graft] def funnelRows(stages: Seq[(String, DataFrame)]): DataFrame = {
    require(stages.nonEmpty, "funnelRows needs at least one stage")
    val spark = stages.head._2.sparkSession
    import spark.implicits._
    val counts = stages.map { case (name, df) => name -> df.count() }
    val rows = counts.zipWithIndex.map { case ((name, n), i) =>
      val prev = if (i == 0) n else counts(i - 1)._2
      val dropped = prev - n
      (i, name, n, dropped,
        if (prev == 0) 0.0 else math.floor(dropped.toDouble / prev * 1e6 + 0.5) / 1e6)
    }
    rows.toDF("tier_idx", "tier", "rows", "dropped", "drop_ratio")
  }

  /** Per-stratum corpus report — the dashboard numbers a curation run is
    * judged by: document/token/char volumes, exact-duplicate rate, quality
    * and length distribution. One hash aggregation keyed on the strata
    * (plus one md5-keyed distinct for the dup rate) — scales like any
    * other groupBy; no windows, no driver state.
    *
    * @return one row per stratum: `n_docs`, `n_tokens`, `n_chars`,
    *         `n_distinct_texts` (md5-exact), `dup_ratio`
    *         (`1 - distinct/docs`, 1e-6-quantized), `mean_quality`
    *         (1e-6-quantized [[TextFunctions.qualityScore]]),
    *         `mean_tokens` (1e-6-quantized).
    *
    * @param exactDistinct `true` (the oracle-gated default) counts distinct
    *         texts exactly — one extra md5-keyed distinct shuffle. At
    *         dashboard scale set `false`: `approx_count_distinct` (HLL++,
    *         ~2% rsd) folds the distinct count into the SAME single
    *         aggregation as everything else — one pass, one shuffle, no
    *         distinct key space materialized. */
  def stats(docs: DataFrame, textCol: String, strataCols: Seq[String],
            exactDistinct: Boolean = true): DataFrame = {
    require(strataCols.nonEmpty, "stats needs at least one strata column")
    val sc = strataCols.map(col)
    val toks = TextFunctions.tokens(col(textCol))
    val perDoc = docs.select(sc :+ col(textCol) :+ size(toks).cast("long").as("__nt")
      :+ TextFunctions.qualityScore(col(textCol)).as("__q"): _*)
    val base = perDoc.groupBy(sc: _*).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__nt")).as("n_tokens"),
      sum(length(col(textCol)).cast("long")).as("n_chars"),
      avg(col("__q")).as("__mq"),
      avg(col("__nt")).as("__mt"))
    val distincts =
      if (exactDistinct)
        docs.select(sc :+ md5(col(textCol)).as("__h"): _*)
          .distinct()
          .groupBy(sc: _*).agg(count(lit(1)).as("n_distinct_texts"))
      else
        docs.groupBy(sc: _*)
          .agg(approx_count_distinct(md5(col(textCol))).as("n_distinct_texts"))
    base.join(distincts, strataCols)
      .select(sc ++ Seq(col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_distinct_texts"),
        (floor((lit(1.0) - col("n_distinct_texts").cast("double") / col("n_docs")) * 1e6 + 0.5) / 1e6).as("dup_ratio"),
        (floor(col("__mq") * 1e6 + 0.5) / 1e6).as("mean_quality"),
        (floor(col("__mt") * 1e6 + 0.5) / 1e6).as("mean_tokens")): _*)
  }

  /** Reproducibility manifest: one row per shard with the counts and an
    * ORDER-INSENSITIVE content fingerprint that any engine can recompute —
    * the artifact a training run records so "same corpus?" is a manifest
    * diff, not a 100 TB scan-and-compare. The fingerprint is the sum of
    * each document's md5-derived 60-bit integer, reduced mod 2^61−1
    * (summed through decimal so no intermediate overflows); row order,
    * partitioning, and file layout don't affect it, duplicate documents
    * do. One hash aggregation keyed on the shard columns — nothing else.
    */
  def manifest(docs: DataFrame, idCol: String, textCol: String,
               shardCols: Seq[String]): DataFrame = {
    require(shardCols.nonEmpty, "manifest needs at least one shard column")
    val h = conv(substring(md5(col(textCol)), 1, 15), 16, 10).cast("decimal(20,0)")
    docs.groupBy(shardCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col(textCol)).cast("long")).as("n_chars"),
      countDistinct(md5(col(textCol))).as("n_distinct_texts"),
      (sum(h) % lit(2305843009213693951L)).cast("long").as("content_fingerprint"),
      min(col(idCol)).as("min_id"),
      max(col(idCol)).as("max_id"))
  }

  /** Distribution drift between two corpus snapshots — the monitoring
    * signal a production ingestion pipeline watches so a crawl change or
    * filter regression shows up as a number before it shows up in a model.
    * For every categorical feature (each strata column, plus a bucketed
    * length feature over `lenCol` with `lengthEdges` boundaries) the two
    * snapshots' bucket proportions are compared with the Population
    * Stability Index: psi = (p_a − p_b) · ln(p_a / p_b) per bucket, with
    * both proportions floored at `eps` so empty buckets stay finite
    * (industry rule of thumb: Σpsi < 0.1 stable, > 0.25 investigate).
    *
    * Plan shape: each snapshot costs one scan (features explode from a
    * scan-side array literal) into a hash aggregation whose key space is
    * the bucket cardinality — vanishingly small next to the corpus — then
    * the tiny histograms full-outer join and a feature-partitioned window
    * computes totals. Nothing corpus-sized crosses an exchange except the
    * one per-snapshot histogram aggregation.
    *
    * @return one row per (feature, bucket): counts `n_a`/`n_b`,
    *         proportions `p_a`/`p_b`, and the bucket's `psi` contribution
    *         (proportions and psi quantized to 1e-6 for FP stability). */
  def drift(a: DataFrame, b: DataFrame, strataCols: Seq[String], lenCol: Column,
            lengthEdges: Seq[Long] = Seq(100L, 300L, 1000L, 3000L),
            eps: Double = 1e-6): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(lengthEdges == lengthEdges.sorted && lengthEdges.distinct == lengthEdges,
      s"lengthEdges must be strictly ascending, got $lengthEdges")
    val lenBucket = lengthEdges.map(e => when(lenCol >= lit(e), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))
    def hist(df: DataFrame, cntName: String): DataFrame = {
      // null lengths get their own "__null__" bucket like null strata do —
      // folding them into bucket 0 would skew the length-feature PSI
      // whenever the two snapshots differ in null rates
      val feats = strataCols.map(c => struct(lit(c).as("feature"),
        coalesce(col(c).cast("string"), lit("__null__")).as("bucket"))) :+
        struct(lit("length").as("feature"),
          when(lenCol.isNull, lit("__null__"))
            .otherwise(lenBucket.cast("string")).as("bucket"))
      df.select(explode(array(feats: _*)).as("__f"))
        .groupBy(col("__f.feature").as("feature"), col("__f.bucket").as("bucket"))
        .agg(count(lit(1)).as(cntName))
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("feature")
    val q6 = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    val pA = greatest(col("n_a").cast("double") / sum("n_a").over(w), lit(eps))
    val pB = greatest(col("n_b").cast("double") / sum("n_b").over(w), lit(eps))
    hist(a, "n_a").join(hist(b, "n_b"), Seq("feature", "bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .withColumn("p_a", pA).withColumn("p_b", pB)
      .select(col("feature"), col("bucket"), col("n_a"), col("n_b"),
        q6(col("p_a")).as("p_a"), q6(col("p_b")).as("p_b"),
        q6((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b"))).as("psi"))
  }

  /** Materialize the training artifact: [[graft.ext.Sampling.trainingOrder]]
    * stamps every row with a deterministic `(shard, pos)`, the data lands
    * as `<path>/data/shard=<s>/` parquet (rows written in `pos` order
    * inside each shard so a sequential reader streams the training order
    * off disk), and the per-shard [[manifest]] lands beside it at
    * `<path>/manifest/` — the reproducibility receipt for the exact bytes
    * shipped. One hash exchange on the shard id, one per-shard window, one
    * write; re-running with the same (input, shards, seed) produces
    * byte-identical shard contents on any cluster.
    *
    * @param format `"parquet"` (default) or `"json"` — JSONL shards for
    *         training loaders that stream text; `compression` applies to
    *         either (e.g. `"gzip"`, `"snappy"`, `"none"`).
    * @return the manifest frame (read back from disk, so what you inspect
    *         is what was written). */
  def export(docs: DataFrame, idCol: String, textCol: String, path: String,
             shards: Int, seed: String = "", format: String = "parquet",
             compression: Option[String] = None): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(format == "parquet" || format == "json",
      s"format must be parquet or json, got $format")
    val ordered = Sampling.trainingOrder(docs, idCol, shards, seed)
    val writer = ordered
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard")
    compression.fold(writer)(c => writer.option("compression", c))
      .format(format).save(s"$path/data")
    val spark = docs.sparkSession
    // read back with the KNOWN schema: partition-dir inference would turn
    // `shard` into int, an all-null textCol would vanish entirely from an
    // inferred JSON schema, and inference itself costs a full extra scan
    // of (non-splittable when gzipped) shards
    val written = spark.read.schema(ordered.schema).format(format)
      .load(s"$path/data")
    manifest(written, idCol, textCol, Seq("shard"))
      .write.mode("overwrite").parquet(s"$path/manifest")
    spark.read.parquet(s"$path/manifest")
  }
}
