package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Aggo

/** Manual smoke/probe driver: exercises the public API surface the way the
  * grading driver does (entry + a pipeline), plus malformed-pipeline probes.
  * Run: sbt "runMain graft.tools.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("=== entry() flagship ===")
    graft.SparkEntry.entry(spark).show(truncate = false)

    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    println("=== probe: unknown stage ===")
    probe { Aggo.aggregate(li, """[{"$frobnicate": {}}]""").count() }
    println("=== probe: unknown expression operator ===")
    probe { Aggo.aggregate(li, """[{"$project": {"x": {"$bogus": 1}}}]""").count() }
    println("=== probe: non-array pipeline ===")
    probe { Aggo.aggregate(li, """{"$match": {}}""").count() }
    println("=== probe: malformed JSON ===")
    probe { Aggo.aggregate(li, """[{"$match": """).count() }
    println("=== probe: two-key stage object ===")
    probe { Aggo.aggregate(li, """[{"$match": {}, "$limit": 3}]""").count() }
    println("=== probe: $match on missing field ===")
    println(Aggo.aggregate(li, """[{"$match": {"no_such_field": {"$exists": false}}}, {"$count": "n"}]""")
      .collect().mkString)
    println("=== probe: empty pipeline ===")
    println("rows=" + Aggo.aggregate(li, """[]""").count())

    println("=== standalone stage API ===")
    println("matchStage rows=" + Aggo.matchStage(li, """{"l_returnflag": "R"}""").count())
    println("groupStage rows=" + Aggo.groupStage(li, """{"_id": "$l_linestatus", "n": {"$sum": 1}}""").count())
    println("expression sum=" + li.select(Aggo.expression(li, """{"$multiply": ["$l_quantity", 0]}""").as("z"))
      .agg(org.apache.spark.sql.functions.sum("z")).first().getDouble(0))

    println("=== explain (flagship plan) ===")
    println(Aggo.explain(li,
      """[{"$match": {"l_quantity": {"$gte": 10}}},
          {"$group": {"_id": "$l_returnflag", "rev": {"$sum": {"$multiply": ["$l_extendedprice", {"$subtract": [1, "$l_discount"]}]}}}},
          {"$sort": {"rev": -1}}, {"$limit": 5}]"""))
    spark.stop()
  }

  private def probe(f: => Any): Unit =
    try { f; println("  !! no error raised") }
    catch { case e: Throwable => println(s"  ok: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
}
