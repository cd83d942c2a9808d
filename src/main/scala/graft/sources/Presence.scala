package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.json4s._

/** Per-document field presence for `fromJSONL(preserveMissing = true)`.
  *
  * The reference distinguishes a key that is absent from one that is
  * explicitly null (`hasOwnProperty` checks, aggregation.ts:267-271); a
  * static Spark schema cannot — both ingest as null. When asked to, ingest
  * carries a hidden `__present` array of the document's dotted field paths,
  * and `$exists` / order-sensitive accumulators consult it (SURVEY §7.4.2).
  */
object Presence {

  /** All dotted object-key paths present in a JSON document, at any nesting
    * depth. Array contents are not descended — presence is a property of the
    * document shape, mirroring the reference's per-object hasOwnProperty. */
  def presentPaths(json: String): Seq[String] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(prefix: String, v: JValue): Unit = v match {
      case JObject(fs) => fs.foreach { case (k, v2) =>
        val p = if (prefix.isEmpty) k else prefix + "." + k
        acc += p
        walk(p, v2)
      }
      case _ => ()
    }
    scala.util.Try(org.json4s.jackson.JsonMethods.parse(json)).toOption
      .foreach(walk("", _))
    acc.toSeq
  }

  /** UDF form — one Jackson parse per ingested line, only on the opt-in
    * `preserveMissing` path (the default ingest stays a pure parquet/json
    * scan with no UDF). */
  val presentPathsUdf: Column => Column = {
    val u = udf(presentPaths _)
    c => u(c)
  }
}
