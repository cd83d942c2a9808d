package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Storage-layout scale audits: bucketed tables must join and aggregate
  * without shuffles (the pay-once layout for co-located joins). */
class LayoutSpec extends AnyFunSuite {

  test("bucketed tables join and aggregate exchange-free") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    val dim = (0L until 50L).map(k => (k, s"label$k")).toDF("k", "label")
    graft.sources.Layout.writeBucketed(fact, "graft_fact_b", 8, Seq("k"))
    graft.sources.Layout.writeBucketed(dim, "graft_dim_b", 8, Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_fact_b").join(spark.table("graft_dim_b"), "k")
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("ShuffleExchange") && !joinPlan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$joinPlan")
      assert(joined.count() == 1000)
      val agged = spark.table("graft_fact_b").groupBy("k").agg(sum("v"))
      val aggPlan = agged.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation must not shuffle:\n$aggPlan")
      assert(agged.count() == 50)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_fact_b")
      spark.sql("DROP TABLE IF EXISTS graft_dim_b")
    }
  }

  test("colocate repartitioning is reused across same-key operations") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 20, i)).toDF("k", "v")
    val co = graft.sources.Layout.colocate(df, 8, Seq("k"))
    val agged = co.groupBy("k").agg(sum("v"))
    val plan = agged.queryExecution.executedPlan.toString
    // exactly the one explicit repartition exchange — none added by groupBy
    assert(plan.split("Exchange").length - 1 == 1, s"expected a single exchange:\n$plan")
  }
}
