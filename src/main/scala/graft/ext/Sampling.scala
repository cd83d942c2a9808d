package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing.
  *
  * Both samplers key on an md5 row hash (null positions sentinel-coalesced,
  * same recipe as `$sample`), so results are reproducible across runs,
  * partitionings, and external engines — a DuckDB oracle replays them
  * exactly. Nothing here uses `rand()`.
  */
object Sampling {

  private def rowKey(df: DataFrame): Column =
    graft.stages.StageTranslator.md5RowKey(df.columns.toSeq.map(col))

  /** Up to `n` rows per stratum, chosen by md5 row-hash order: one hash
    * shuffle on the strata columns + a partitioned window. For very
    * low-cardinality strata over huge frames, pre-thin with
    * [[deterministicFraction]] first — the window sorts each stratum's
    * full partition before truncating. */
  def stratified(df: DataFrame, strataCols: Seq[String], n: Int): DataFrame = {
    require(strataCols.nonEmpty,
      "stratified needs strata columns — an unstratified call would sort the whole " +
        "frame through one window partition; use deterministicFraction for global thinning")
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(rowKey(df))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_rn")
  }

  /** Weighted corpus mixing: keep a different deterministic fraction per
    * stratum — how a training mix is rebalanced toward target source/
    * language ratios ("2 epochs of wiki, 0.3 of common-crawl"). The same
    * md5-threshold filter as [[deterministicFraction]], with the threshold
    * chosen per row by the stratum column: still a pure scan-side filter —
    * no shuffle, no per-group state, stable under repartitioning — so it
    * costs the same at 100 TB as at 100 rows. Strata absent from
    * `fractions` keep `default` (0.0 = drop unlisted sources, the usual
    * allowlist posture). */
  def mix(df: DataFrame, strataCol: String, fractions: Map[String, Double],
          default: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1),
      "every mix fraction must be in [0,1]")
    val key = substring(rowKey(df), 1, 8)
    def keepFor(f: Double): Column =
      if (f >= 1.0) lit(true)
      else if (f <= 0.0) lit(false)
      else key < lit(f"${math.max(1L, math.round(f * 4294967296.0))}%08x")
    val keep = fractions.toSeq.sortBy(_._1).foldRight(keepFor(default)) {
      case ((value, f), els) => when(col(strataCol) === lit(value), keepFor(f)).otherwise(els)
    }
    df.filter(keep)
  }

  /** Keep ~`fraction` of rows deterministically: a pure filter comparing
    * the first 8 hex digits of the row hash against a threshold — no
    * shuffle, no state, scales to any size, and the kept set is stable
    * under repartitioning and re-runs. The comparison is a fixed-width
    * lowercase-hex STRING compare, portable to any SQL engine. Granularity
    * is 1/2^32 (rounded, min 1 for any positive fraction), so billion-row
    * corpora can be thinned to ~per-thousandth-of-a-percent rates. */
  def deterministicFraction(df: DataFrame, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    if (fraction >= 1.0) df
    else if (fraction <= 0.0) df.filter(lit(false))
    else {
      val threshold = math.max(1L, math.round(fraction * 4294967296.0))
      df.filter(substring(rowKey(df), 1, 8) < lit(f"$threshold%08x"))
    }
  }
}
