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
