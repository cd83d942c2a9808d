package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition the individual
  * `ext` primitives exist for, packaged as one declarative recipe —
  *
  *   exact dedup → quality filter → PII scrub → token accounting →
  *   shard-local greedy context-window packing.
  *
  * Everything is a single lazy plan until [[Packing.packGreedy]]'s shard
  * repartition: one md5 hash-shuffle for dedup, a codegen'd scan for the
  * scoring/scrubbing stages, one shard shuffle for packing — three exchanges
  * total regardless of corpus size, no driver-side state anywhere. Each
  * constituent is oracle-checked on its own (q_dedup_exact, q_text_quality,
  * q_text_scrub, q_pack_greedy); q_corpus_curate checks the composition.
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
    *                    verify + component survivors) after the exact tier */
  final case class CurateConfig(minQuality: Double = 0.6,
                                maxLineRepetition: Double = 1.0,
                                budget: Long = 2048L,
                                nearDupThreshold: Option[Double] = None)

  /** Curate `docs` into packed training shards. Output keeps the input
    * columns (with `textCol` scrubbed in place) plus `quality`,
    * `line_repetition`, `n_tok`, `pack_id`, `pack_offset`. Quality gates
    * are evaluated on the RAW text (scrubbing must not rescue a junk
    * document); token accounting runs on the scrubbed text that would
    * actually be trained on. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             shardCols: Seq[String], cfg: CurateConfig = CurateConfig()): DataFrame = {
    val exact = Dedup.exactDedup(docs, idCol, textCol)
    val deduped = cfg.nearDupThreshold match {
      case Some(t) => Dedup.dedupNear(exact, idCol, textCol, threshold = t)
      case None    => exact
    }
    val scored = deduped
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScoreFrom(col("__toks"), col(textCol)))
      .withColumn("line_repetition", TextFunctions.lineRepetitionRatio(col(textCol)))
      .filter(col("quality") > cfg.minQuality &&
        col("line_repetition") <= cfg.maxLineRepetition)
      .drop("__toks")
      .withColumn(textCol, TextFunctions.scrubPii(col(textCol)))
      .withColumn("n_tok", TextFunctions.tokenCount(col(textCol)))
    Packing.packGreedy(scored, shardCols, Seq(col(idCol)), col("n_tok"), cfg.budget)
  }
}
