package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._

import graft.model.GraftException

/** Mongo `$match` query-document → Catalyst boolean `Column`.
  *
  * Mirrors the reference's `matchDocument` interpreter
  * (/root/reference/src/aggo/aggregation.ts:133-325) but emits a declarative
  * predicate tree so Catalyst can push it into the Parquet scan
  * (`PushedFilters`) — the reference's JIT-compiled predicates and Bloom
  * prefilters (crossfilter-compiler.ts:160-378, bloom-filter.ts) are replaced
  * by whole-stage codegen and Parquet statistics for free.
  */
object MatchTranslator {

  def translate(query: JValue)(implicit ctx: ExprCtx): Column = query match {
    case JObject(fields) =>
      val preds = fields.map {
        case ("$and", JArray(qs))  => qs.map(translate).reduceLeft(_ && _)
        case ("$or", JArray(qs))   => qs.map(translate).reduceLeft(_ || _)
        case ("$nor", JArray(qs))  => !qs.map(q => coalesce(translate(q), lit(false))).reduceLeft(_ || _)
        case ("$expr", e)          => ExprTranslator.truthy(ExprTranslator.translate(e))
        case ("$text", spec)       => textSearch(spec)
        // seeded → deterministic per run (Mongo's is random per execution)
        case ("$sampleRate", r)    =>
          val rate = r match {
            case JDouble(d) => d
            case JInt(i)    => i.toDouble
            case other      => throw GraftException(s"$$sampleRate requires a number, got $other")
          }
          rand(42L) < lit(rate)
        case ("$comment", _)       => lit(true)
        case (op, _) if op.startsWith("$") =>
          throw GraftException(s"unknown top-level $$match operator $op")
        case (path, spec)          => fieldCondition(path, spec)
      }
      if (preds.isEmpty) lit(true) else preds.reduceLeft(_ && _)
    case other => throw GraftException(s"$$match requires an object, got $other")
  }

  private def fieldRef(path: String)(implicit ctx: ExprCtx): Column =
    if (ctx.df.isDefined && !ctx.hasField(path)) lit(null) else col(path)

  /** Condition on a (possibly dotted) field path. */
  def fieldCondition(path: String, spec: JValue)(implicit ctx: ExprCtx): Column =
    fieldConditionOn(fieldRef(path), spec, path)

  /** Operator-object (or bare value) condition applied to an arbitrary
    * column — shared by field conditions, `$not`, and `$elemMatch` so
    * `$regex`+`$options` pairing works on every path. */
  private def fieldConditionOn(c: Column, spec: JValue, path: String)(implicit ctx: ExprCtx): Column =
    spec match {
      case JObject(ops) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
        val optsStr = ops.collectFirst { case ("$options", JString(o)) => o }.getOrElse("")
        ops.filterNot(_._1 == "$options").map {
          case ("$regex", JString(p)) => c.rlike(withFlags(p, optsStr))
          case (op, v)                => opCondition(c, op, v, path)
        }.reduceLeftOption(_ && _).getOrElse(lit(true))
      case v => equalityCondition(c, v)
    }

  /** Bare-value / $eq equality. On array-typed fields a scalar matches when
    * any element equals it (Mongo element-match semantics). */
  private def equalityCondition(c: Column, v: JValue)(implicit ctx: ExprCtx): Column = {
    val litV = ExprTranslator.litOf(v)
    (ctx.typeOf(c), v) match {
      case (Some(_: ArrayType), JArray(_)) => c <=> litV
      case (Some(_: ArrayType), JNull)     => c.isNull
      case (Some(_: ArrayType), _)         => coalesce(array_contains(c, litV), lit(false))
      case _                               => c <=> litV
    }
  }

  private def opCondition(c: Column, op: String, v: JValue, path: String)(implicit ctx: ExprCtx): Column = op match {
    case "$eq"  => equalityCondition(c, v)
    case "$ne"  => !equalityCondition(c, v)
    case "$gt"  => c > ExprTranslator.litOf(v)
    case "$gte" => c >= ExprTranslator.litOf(v)
    case "$lt"  => c < ExprTranslator.litOf(v)
    case "$lte" => c <= ExprTranslator.litOf(v)
    case "$in" => v match {
      case JArray(items) =>
        items.map(i => equalityCondition(c, i)).reduceLeftOption(_ || _).getOrElse(lit(false))
      case _ => throw GraftException("$in requires an array")
    }
    case "$nin" => v match {
      case JArray(items) =>
        !items.map(i => coalesce(equalityCondition(c, i), lit(false))).reduceLeftOption(_ || _).getOrElse(lit(false))
      case _ => throw GraftException("$nin requires an array")
    }
    case "$exists" =>
      val wanted = v match {
        case JBool(b) => b
        case JInt(i)  => i != 0
        case _        => true
      }
      // A field absent from the schema is statically missing. With a
      // presence set (fromJSONL(preserveMissing = true)) `$exists` is true
      // exactly when the document carries the key — even with a null value
      // (reference hasOwnProperty, aggregation.ts:267-271). Without one,
      // missing→null normalization applies (SURVEY §7.4.2): exists ≈ not null.
      if (ctx.df.isDefined && !ctx.hasField(path)) lit(!wanted)
      else ctx.df.flatMap(graft.stages.StageTranslator.presenceOf(_, path)) match {
        case Some(present) => if (wanted) present else !present
        case None          => if (wanted) c.isNotNull else c.isNull
      }
    case "$regex" =>
      val pattern = v match {
        case JString(p) => p
        case _          => throw GraftException("$regex requires a string pattern")
      }
      val opts = "" // $options handled by caller merge below
      c.rlike(withFlags(pattern, opts))
    case "$options" => lit(true) // combined with $regex in fieldCondition pass
    case "$all" => v match {
      case JArray(items) =>
        items.map(i => array_contains(c, ExprTranslator.litOf(i))).reduceLeftOption(_ && _).getOrElse(lit(true))
      case _ => throw GraftException("$all requires an array")
    }
    case "$elemMatch" =>
      exists(c, x => elemCondition(x, v)(ctx.copy(df = None)))
    case "$size" => v match {
      case JInt(n) => size(c) === n.toInt
      case _       => throw GraftException("$size requires an integer")
    }
    case "$not" =>
      !coalesce(fieldConditionOn(c, v, path), lit(false))
    case "$mod" => v match {
      case JArray(List(d, r)) => c % ExprTranslator.litOf(d) === ExprTranslator.litOf(r)
      case _ => throw GraftException("$mod requires [divisor, remainder]")
    }
    case other => throw GraftException(s"unknown $$match operator $other")
  }

  /** `$elemMatch` sub-query applied to an array element (lambda variable). */
  private def elemCondition(x: Column, spec: JValue)(implicit ctx: ExprCtx): Column = spec match {
    case JObject(ops) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
      // operator form: {$gt: 5, $lt: 10} on the element itself
      fieldConditionOn(x, spec, "<elem>")
    case JObject(fields) if fields.nonEmpty =>
      // document form: conditions on the element's struct fields
      fields.map { case (f, s) => fieldConditionOn(x.getField(f), s, f) }.reduceLeft(_ && _)
    case JObject(Nil) => lit(true)
    case v => x <=> ExprTranslator.litOf(v)
  }

  /** `$text: {$search: "..."}` — token AND-match over the collection's text
    * field (reference: aggregation.ts:104-125 + text-search.ts; its Bloom
    * prefilter is unnecessary on Parquet). Tokenization: lowercase split on
    * non-word characters — identical on the DuckDB-oracle side via
    * regexp_split_to_array(lower(x), '\W+'). */
  def textSearch(spec: JValue)(implicit ctx: ExprCtx): Column = {
    val search = spec match {
      case JObject(fs) => fs.collectFirst { case ("$search", JString(s)) => s }
        .getOrElse(throw GraftException("$text requires {$search: string}"))
      case JString(s) => s
      case _ => throw GraftException("$text requires {$search: string}")
    }
    val textCol = Seq("text", "content", "body").find(f => ctx.hasField(f))
      .getOrElse(throw GraftException("$text requires a 'text'/'content'/'body' column"))
    val tokens = search.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val docTokens = split(lower(col(textCol)), "\\W+")
    tokens.map(t => array_contains(docTokens, t)).reduceLeft(_ && _)
  }

  /** Merge Mongo regex option flags into the pattern string. */
  def withFlags(pattern: String, options: String): String = {
    val flags = options.flatMap {
      case 'i' => "i"; case 'm' => "m"; case 's' => "s"; case 'x' => "x"
      case _   => ""
    }
    if (flags.isEmpty) pattern else s"(?$flags)$pattern"
  }
}
