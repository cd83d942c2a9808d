package graft.tools
import org.apache.spark.sql.SparkSession
object AuditR5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_zorder", "q_token_budget_mix", "q_decontam_spans", "q_decontam_report",
                  "q_dedup_survivor", "q_dedup_cluster_stats", "q_vocab", "q_score_keep",
                  "q_url_dedup_latest")) {
      val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
      val rex = "Exchange rangepartitioning".r.findAllIn(plan).length
      val bc = "BroadcastExchange".r.findAllIn(plan).length
      val sp = "Exchange SinglePartition".r.findAllIn(plan).length
      val top = if (plan.contains("TakeOrderedAndProject")) " topK" else ""
      println(f"$q%-24s hash=$ex range=$rex single=$sp bcast=$bc$top")
    }
    spark.stop()
  }
}
