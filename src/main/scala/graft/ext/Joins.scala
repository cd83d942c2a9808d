package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Temporal joins for event/feature alignment — the standard way a
  * training-data pipeline attaches "state as of time t" (last price, last
  * label, last config) to a fact stream.
  *
  * The as-of join is implemented WITHOUT a join: both sides are tagged and
  * unioned, then a single window partitioned by the equality keys carries
  * the most recent right-side payload forward onto each left row. One
  * shuffle on the key columns, no range-join explosion, no per-row probe —
  * the plan shape survives any scale because the window never crosses a
  * key boundary. (A naive `l.ts >= r.ts` range join is a per-key cross
  * product that Catalyst executes as BNLJ; this rewrite is the textbook
  * fix.)
  */
object Joins {

  /** Backward (default) or forward as-of join.
    *
    * For every left row, finds the single right row with the same values in
    * `on` whose `rightTsCol` is the closest at-or-before (`backward`) /
    * at-or-after (`forward`) the left row's `leftTsCol`, and appends the
    * right side's non-key columns (including its timestamp). Left rows with
    * no match keep nulls — left-outer semantics, row count is exactly
    * `left.count`.
    *
    * Matching is inclusive (a right row at the same instant matches), the
    * same convention as DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which the
    * correctness oracle replays. Right rows with a null timestamp are
    * dropped; left rows with a null timestamp get no match. Ties among
    * right rows at the same (key, ts) are broken deterministically by the
    * payload struct's ordering.
    *
    * Caller contract: timestamp columns are the same (orderable) type on
    * both sides, and right-side payload names don't collide with left
    * column names.
    */
  def asOf(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTsCol: String, rightTsCol: String,
           direction: String = "backward"): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payloadCols = right.columns.toSeq.filterNot(on.contains)
    require(payloadCols.nonEmpty, "right side has no payload columns")

    def structTypeOf(df: DataFrame, cols: Seq[String]): DataType =
      df.select(struct(cols.map(col): _*).as("s")).schema("s").dataType

    val leftStruct = structTypeOf(left, left.columns.toSeq)
    val payloadStruct = structTypeOf(right, payloadCols)

    val leftSide = left.select(
      on.map(col) ++ Seq(
        col(leftTsCol).as("__ts"),
        lit(1).as("__side"),
        struct(left.columns.toSeq.map(col): _*).as("__l"),
        lit(null).cast(payloadStruct).as("__p")): _*)
    val rightSide = right.filter(col(rightTsCol).isNotNull).select(
      on.map(col) ++ Seq(
        col(rightTsCol).as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(leftStruct).as("__l"),
        struct(payloadCols.map(col): _*).as("__p")): _*)

    // Ordering puts the right row at an equal timestamp BEFORE the left row
    // (side 0 < 1) so the match is inclusive in both directions; a left
    // row's own null __p never shadows a match because last() ignores nulls.
    val ord: Seq[Column] = direction match {
      case "backward" => Seq(col("__ts").asc, col("__side").asc, col("__p").asc)
      case "forward"  => Seq(col("__ts").desc, col("__side").asc, col("__p").desc)
    }
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = leftSide.unionAll(rightSide)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // A left row with a null timestamp sorts before every real right row
    // under backward's nulls-first ascending order, but under forward's
    // descending order it would sort AFTER them and see a spurious match —
    // mask it out explicitly.
    val masked =
      if (direction == "forward")
        matched.withColumn("__m", when(col("__ts").isNull, lit(null).cast(payloadStruct))
          .otherwise(col("__m")))
      else matched

    masked.select(
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Interval-containment join: every `points` row paired with every
    * `intervals` row (same `on` keys, when given) whose
    * `[loCol, hiCol)` half-open range contains the point.
    *
    * The naive formulation (`p >= lo AND p < hi` as the join condition) has
    * no equality key, so Catalyst executes it as a broadcast/cartesian
    * nested-loop — a non-starter at scale. This rewrite bin-blocks it:
    * intervals explode to the grid cells of width `binWidth` they overlap,
    * points compute their one cell, the join is a plain equi-join on
    * (keys, cell) followed by the exact range predicate. Shuffle volume is
    * |points| + |intervals| · (avg interval length / binWidth + 1), so pick
    * `binWidth` near the typical interval length. Long outlier intervals
    * only widen their own replication factor; correctness never depends on
    * the choice.
    *
    * Caller contract: `loCol`/`hiCol`/`pointCol` are the same integral type
    * (epoch micros, day numbers, …); intervals with null/inverted bounds
    * and points with null values drop out (inner-join semantics).
    */
  def intervalJoin(points: DataFrame, pointCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   binWidth: Long, on: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.filter(col(pointCol).isNotNull)
      .withColumn("__cell", floor(col(pointCol) / binWidth))
    // a half-open [lo, hi) touches cells floor(lo/w) .. floor((hi-1)/w);
    // an empty interval (hi <= lo) contains nothing and is dropped
    val iv = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(hiCol) > col(loCol))
      .withColumn("__cell",
        explode(sequence(floor(col(loCol) / binWidth),
          floor((col(hiCol) - 1) / binWidth))))
    p.join(iv, on :+ "__cell")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__cell")
  }
}
