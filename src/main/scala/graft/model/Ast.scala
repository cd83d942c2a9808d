package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Pipeline parsing: a Mongo-style aggregation pipeline is a JSON array of
  * single-key stage objects, e.g. `[{"$match": {...}}, {"$group": {...}}]`.
  *
  * We deliberately keep the AST as json4s `JValue` (json4s ships with Spark
  * itself) and dispatch on the single stage/operator key: the operator set is
  * closed (mirroring the reference registry, /root/reference/src/aggo/
  * operators.ts:729-824 — unknown operator is an error, expressions.ts:147).
  */
object PipelineParser {

  /** Parse a pipeline JSON string into a sequence of (stageName, body). */
  def parse(pipelineJson: String): Seq[(String, JValue)] =
    JsonMethods.parse(pipelineJson) match {
      case JArray(stages) => stages.map(stageOf)
      case other          => throw GraftException(s"pipeline must be a JSON array, got ${other.getClass.getSimpleName}")
    }

  def stageOf(j: JValue): (String, JValue) = j match {
    case JObject(List((name, body))) if name.startsWith("$") => (name, body)
    case JObject(fields) =>
      throw GraftException(s"each pipeline stage must have exactly one $$-key, got ${fields.map(_._1).mkString(",")}")
    case other => throw GraftException(s"pipeline stage must be an object, got $other")
  }
}

/** Error hierarchy mirroring the reference's AggoError family
  * (/root/reference/src/aggo/errors.ts: AggoError / AggregationError /
  * ExpressionError / OperatorError / ValidationError). */
class GraftException(message: String) extends RuntimeException(message)
object GraftException { def apply(message: String): GraftException = new GraftException(message) }
class AggregationError(message: String) extends GraftException(message)
class ExpressionError(message: String) extends GraftException(message)
class OperatorError(message: String) extends GraftException(message)
class ValidationError(message: String) extends GraftException(message)
