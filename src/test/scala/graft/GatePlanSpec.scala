package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, RepartitionOperation, Sort, SubqueryAlias, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

import TestSpark._

/** Scale-safety audit over the ENTIRE correctness gate: every query in
  * `SparkEntry.queries` is planned against the sf0.001 tables and its
  * optimized logical plan is swept for the one shape that silently serializes
  * a cluster — an unpartitioned Window evaluated over raw data.
  *
  * An unpartitioned Window is permitted only when its input is provably
  * bounded: walking the unary chain directly beneath it (projections,
  * filters, sorts — nothing that can re-widen the row count) reaches
  *  - an Aggregate — the two-pass recipe's tiny per-partition stats frame
  *    (bounded by the shuffle partition count, not the data), or
  *  - a GlobalLimit — a data-independent row bound (Catalyst pushes a
  *    `filter(row_number <= k)` below its own window as Sort+Limit, so a
  *    top-k rank window legitimately sits above `GlobalLimit k`).
  *
  * The walk deliberately stops at joins/unions/scans: a limit or aggregate
  * somewhere in a *branch* below a join does NOT bound the window's input.
  * Anything unbounded funnels the whole dataset through one task at 100×
  * scale and must be rewritten, not shipped.
  */
class GatePlanSpec extends AnyFunSuite {

  // Only operators that provably cannot re-widen the row count may sit
  // between the window and its bound. A bare `UnaryNode` match would also
  // accept Generate (explode) and Expand — row-WIDENING unary operators —
  // silently weakening the audit, so the narrow set is whitelisted
  // explicitly and anything unrecognized fails closed.
  private def boundedInput(p: LogicalPlan): Boolean = p match {
    case _: Aggregate                => true
    case _: GlobalLimit              => true
    case n @ (_: Project | _: Filter | _: Sort | _: SubqueryAlias |
              _: LocalLimit | _: RepartitionOperation | _: LWindow) =>
      boundedInput(n.children.head)
    case _ => false
  }

  test("no gate query plans an unpartitioned window over raw data") {
    val dir = "/root/testdata/sf0.001"
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, build) =>
      val df = build(spark, dir)
      df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty && !boundedInput(w.child) => name
      }
    }.distinct
    assert(violations.isEmpty,
      s"unpartitioned data-sized window in gate queries: ${violations.mkString(", ")}")
  }
}
