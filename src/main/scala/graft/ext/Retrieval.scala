package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval utilities: combining lexical ([[TextFunctions.bm25Search]])
  * and vector ([[Similarity]] top-k tiers, the `$vectorSearch` stage) result
  * lists — the retrieval-based corpus-mining workflow (find training docs
  * "like" an eval query) needs both legs and a principled combiner.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al. 2009 — the standard hybrid
    * combiner, Mongo's `$rankFusion`): score(d) = Σ_legs 1/(k + rank_d),
    * summed over every leg that returned the document. Rank-based, so the
    * legs' score scales never need calibrating.
    *
    * Inputs are (idCol, rankCol) frames, e.g. `bm25Search` output or a
    * `*TopK` result keyed by neighbor id. One union + one keyed aggregation;
    * the final top-k fuses to TakeOrderedAndProject. Ties broken by id, and
    * the fused score is exact (a sum of ≤ |legs| reciprocals), so the result
    * set is deterministic and cross-engine reproducible.
    *
    * @return (id, rank, rrf_score), top `topK` by fused score. */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, rankCol: String,
              topK: Int, k: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    require(topK > 0 && k > 0, s"need positive topK/k, got $topK/$k")
    val union = legs.map(_.select(col(idCol), col(rankCol).cast("long").as("__r")))
      .reduce(_ unionByName _)
    // rank on the TRUNCATED sum (same 1e-6 floor as bm25Search): with 3+
    // legs the FP addition order is engine-dependent, and an ulp difference
    // on near-tied fused scores would flip ranks cross-engine
    val fused = union.groupBy(idCol)
      .agg((floor(sum(lit(1.0) / (col("__r") + k)) * 1e6 + 0.5) / 1e6).as("rrf_score"))
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    // the rank window runs over the ≤ topK surviving rows (child contains
    // the fused Aggregate, so this is the bounded two-pass-style tail)
    fused.orderBy(col("rrf_score").desc, col(idCol)).limit(topK)
      .withColumn("rank", row_number().over(w))
      .select(col(idCol), col("rank"), col("rrf_score"))
  }
}
