package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the physical plans of representative queries so the shapes can be
  * audited: predicate pushdown into the parquet scan, column pruning
  * (ReadSchema), broadcast vs sort-merge joins, partial aggregation, and
  * top-k fusion. Run: sbt "runMain graft.tools.PlanAudit"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    def audit(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n=== $name ===")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(plan.linesIterator.filter(l =>
        l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Join") || l.contains("Exchange") || l.contains("HashAggregate") ||
          l.contains("TakeOrdered") || l.contains("WholeStageCodegen") || l.startsWith("(")
      ).take(40).mkString("\n"))
    }

    audit("match+project: pushdown & pruning") {
      graft.SparkEntry.queries("q_match_basic")(spark, dir)
    }
    audit("group: partial agg before exchange") {
      graft.SparkEntry.queries("q_group_basic")(spark, dir)
    }
    audit("sort+limit: TakeOrderedAndProject") {
      graft.SparkEntry.queries("q_sort_limit")(spark, dir)
    }
    audit("lookup: join strategy (broadcast expected for small side)") {
      graft.SparkEntry.queries("q_lookup_unwind")(spark, dir)
    }
    audit("lookup pipeline: decorrelated join") {
      graft.SparkEntry.queries("q_lookup_pipeline")(spark, dir)
    }
    audit("minhash LSH: band-key equi-join, no cross join") {
      graft.SparkEntry.queries("q_dedup_minhash")(spark, dir)
    }
    audit("ANN LSH: bucket equi-join + windowed re-rank") {
      graft.SparkEntry.queries("q_ann_lsh")(spark, dir)
    }
    audit("string $bucketAuto: exact boundaries, CASE + HashAggregate (no window)") {
      graft.SparkEntry.queries("q_bucketauto_str")(spark, dir)
    }
    audit("desc-string $push: two-pass global-rank restamp (no unpartitioned data window)") {
      graft.Aggo.aggregate(
        spark.read.parquet(s"$dir/orders.parquet"),
        """[{"$sort": {"o_orderstatus": -1, "o_orderkey": 1}},
            {"$group": {"_id": "$o_orderpriority", "keys": {"$push": "$o_orderkey"}}}]""")
    }
    spark.stop()
  }
}
