package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout helpers for the 100 TB posture: pre-shuffled (bucketed)
  * tables make every downstream equi-join and aggregation on the bucket
  * keys exchange-free — the shuffle is paid once at write time instead of
  * per query. This is the standard Spark answer to the "co-located join"
  * requirement (SURVEY §4.2); pair fact and dimension tables on the same
  * key and bucket count.
  */
object Layout {

  /** Write `df` as a bucketed + sorted managed parquet table. Joins and
    * groupBys on `keys` between tables sharing `buckets` then plan with no
    * Exchange (verified in LayoutSpec). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Hash-repartition by key columns — one explicit shuffle that several
    * subsequent same-key operations reuse (Catalyst recognizes the
    * partitioning and plans no further exchanges). */
  def colocate(df: DataFrame, partitions: Int, keys: Seq[String]): DataFrame =
    df.repartition(partitions, keys.map(org.apache.spark.sql.functions.col): _*)
}
