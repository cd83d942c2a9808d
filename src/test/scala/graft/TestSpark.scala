package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Build a DataFrame from JSONL strings — the reference's native input
    * shape; exercises dynamic schema inference like `fromJSONL`. */
  def fromJsonl(lines: String*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.read.json(spark.createDataset(lines.toList.asJava.asScala.toSeq)(
      org.apache.spark.sql.Encoders.STRING))
  }

  def agg(df: DataFrame, pipeline: String, colls: Map[String, DataFrame] = Map.empty): Seq[Map[String, Any]] =
    Aggo.aggregate(df, pipeline, colls).collect().toSeq.map { row =>
      row.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> row.get(i) }.toMap
    }
}
