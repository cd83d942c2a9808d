package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Heterogeneous (MIXED-type) field policy — SURVEY §7.4.1; reference
  * FieldType.MIXED (columnar-vectors.ts:32), schema inference
  * (columnar-ivm-engine.ts:449-487). A field holding conflicting JSON types
  * widens to string at ingest; these specs pin every coercion so the
  * behavior is contractual, not accidental.
  */
class MixedTypesSpec extends AnyFunSuite {

  private lazy val mixed = Aggo.fromJSONL(spark, Seq(
    """{"id": 1, "v": 5}""",
    """{"id": 2, "v": "five"}""",
    """{"id": 3, "v": true}""",
    """{"id": 4, "v": null}""",
    """{"id": 5}""",
    """{"id": 6, "v": 0}"""))

  test("mixed-type field widens to string; values keep their raw JSON token") {
    assert(mixed.schema("v").dataType == org.apache.spark.sql.types.StringType)
    val byId = agg(mixed, """[{"$project": {"id": 1, "v": 1}}]""")
      .map(m => m("id") -> m("v")).toMap
    assert(byId(1L) == "5" && byId(2L) == "five" && byId(3L) == "true" && byId(6L) == "0")
    assert(byId(4L) == null && byId(5L) == null) // explicit null and missing both → null
  }

  test("$type answers from the widened schema") {
    val rows = agg(mixed, """[{"$project": {"id": 1, "t": {"$type": "$v"}}}]""")
      .map(m => m("id") -> m("t")).toMap
    assert(rows(1L) == "string" && rows(2L) == "string")
    assert(rows(4L) == "null" && rows(5L) == "null")
  }

  test("mixed $sort compares as strings (reference aggregation.ts:391-399)") {
    val sorted = agg(mixed, """[{"$sort": {"v": 1, "id": 1}}, {"$project": {"id": 1}}]""")
      .map(_("id"))
    // nulls (incl. missing) first, then "0" < "5" < "five" < "true"
    assert(sorted == Seq(4L, 5L, 6L, 1L, 2L, 3L))
  }

  test("truthiness after widening: non-null strings are truthy, null/missing falsy") {
    val r = agg(mixed, """[{"$project": {"id": 1, "b": {"$cond": ["$v", 1, 0]}}}]""")
      .map(m => m("id") -> m("b")).toMap
    // "0" is a non-empty string post-widening → truthy (documented
    // divergence from a numeric 0, which Mongo treats as falsy)
    assert(r(1L) == 1L && r(2L) == 1L && r(3L) == 1L && r(6L) == 1L)
    assert(r(4L) == 0L && r(5L) == 0L)
  }

  test("missing-vs-null ingest normalization: $exists, $push, $ifNull pinned") {
    val docs = Aggo.fromJSONL(spark, Seq(
      """{"id": 1, "x": 1}""",
      """{"id": 2, "x": null}""",
      """{"id": 3}"""))
    // Ingest normalizes absent keys and explicit nulls to the same SQL null,
    // so $exists means value-presence: false for an explicit null too —
    // documented divergence from Mongo's hasOwnProperty (aggregation.ts:267).
    assert(agg(docs, """[{"$match": {"x": {"$exists": true}}}, {"$project": {"id": 1}}]""")
      .map(_("id")) == Seq(1L))
    assert(agg(docs, """[{"$match": {"x": {"$exists": false}}}, {"$project": {"id": 1}}]""")
      .map(_("id")).toSet == Set(2L, 3L))
    // $push keeps the normalized nulls (the reference maps missing→null too,
    // accumulators.ts:142-163)
    val pushed = agg(docs,
      """[{"$sort": {"id": 1}}, {"$group": {"_id": null, "xs": {"$push": "$x"}}}]""").head
    assert(pushed("xs").asInstanceOf[scala.collection.Seq[_]].toSeq == Seq(1L, null, null))
    // $ifNull fallback applies to both shapes
    val f = agg(docs, """[{"$project": {"id": 1, "x2": {"$ifNull": ["$x", -1]}}}]""")
      .map(m => m("id") -> m("x2")).toMap
    assert(f(1L) == 1L && f(2L) == -1L && f(3L) == -1L)
  }

  test("match/group over a widened field work on the string forms") {
    val hit = agg(mixed, """[{"$match": {"v": "5"}}, {"$project": {"id": 1}}]""").map(_("id"))
    assert(hit == Seq(1L)) // numeric 5 ingested as "5"
    val groups = agg(mixed,
      """[{"$group": {"_id": "$v", "n": {"$sum": 1}}}, {"$sort": {"_id": 1}}]""")
      .map(m => m("_id") -> m("n"))
    assert(groups == Seq((null, 2L), ("0", 1L), ("5", 1L), ("five", 1L), ("true", 1L)))
  }

  // --- preserveMissing: true missing-vs-null semantics (reference
  // --- hasOwnProperty, aggregation.ts:267-271; $push accumulators.ts:142-163)

  private lazy val present = Aggo.fromJSONL(spark, Seq(
    """{"id": 1, "a": null, "n": {"b": null}}""",
    """{"id": 2, "n": {}}""",
    """{"id": 3, "a": 5, "n": {"b": 7}}""",
    """{"id": 4}"""), preserveMissing = true)

  test("preserveMissing: $exists distinguishes explicit null from absent key") {
    def ids(q: String): Seq[Long] =
      agg(present, s"""[{"$$match": $q}, {"$$project": {"id": 1}}, {"$$sort": {"id": 1}}]""")
        .map(_("id").asInstanceOf[Long])
    assert(ids("""{"a": {"$exists": true}}""") == Seq(1, 3))  // {a: null} EXISTS
    assert(ids("""{"a": {"$exists": false}}""") == Seq(2, 4))
    assert(ids("""{"n.b": {"$exists": true}}""") == Seq(1, 3)) // nested
    assert(ids("""{"n.b": {"$exists": false}}""") == Seq(2, 4))
    assert(ids("""{"nope": {"$exists": false}}""") == Seq(1, 2, 3, 4)) // not in schema
  }

  test("preserveMissing: $push skips missing documents but keeps explicit nulls") {
    val pushed = agg(present,
      """[{"$sort": {"id": 1}}, {"$group": {"_id": null, "xs": {"$push": "$a"}}}]""").head
    // id 1 (null) and id 3 (5) push; ids 2 and 4 (missing) are skipped
    assert(pushed("xs").asInstanceOf[scala.collection.Seq[_]].toSeq == Seq(null, 5L))
  }

  test("preserveMissing: $ifNull still treats null and missing alike") {
    val f = agg(present, """[{"$project": {"id": 1, "a2": {"$ifNull": ["$a", -1]}}}]""")
      .map(m => m("id") -> m("a2")).toMap
    assert(f(1L) == -1L && f(2L) == -1L && f(3L) == 5L && f(4L) == -1L)
  }

  test("preserveMissing: $unionWith union-side rows keep their own presence") {
    val other = Aggo.fromJSONL(spark, Seq("""{"id": 10, "a": 1}""", """{"id": 11}"""))
    val ids = Aggo.aggregate(present,
      """[{"$unionWith": "other"}, {"$match": {"a": {"$exists": true}}},
          {"$project": {"id": 1}}, {"$sort": {"id": 1}}]""",
      Map("other" -> other))
      .collect().map(_.getAs[Long]("id")).toSeq
    // union side has no ingest presence → reconstructed from non-null values
    assert(ids == Seq(1L, 3L, 10L))
  }

  test("preserveMissing: fields created by $lookup/$setWindowFields/$unwind-idx exist") {
    val fk = Aggo.fromJSONL(spark, Seq("""{"k": 5, "v": "x"}"""))
    val lkp = Aggo.aggregate(present,
      """[{"$lookup": {"from": "f", "localField": "a", "foreignField": "k", "as": "m"}},
          {"$match": {"m": {"$exists": true}}}, {"$count": "n"}]""", Map("f" -> fk))
      .collect().head.getAs[Long]("n")
    assert(lkp == 4L) // `as` is set (possibly []) on every row
    val win = Aggo.aggregate(present,
      """[{"$setWindowFields": {"sortBy": {"id": 1}, "output": {"rn": {"$documentNumber": {}}}}},
          {"$match": {"rn": {"$exists": true}}}, {"$count": "n"}]""")
      .collect().head.getAs[Long]("n")
    assert(win == 4L)
  }

  test("preserveMissing: unwound struct elements expose per-row subfield presence") {
    val fk = Aggo.fromJSONL(spark, Seq(
      """{"k": 5, "v": "x"}""", """{"k": 5, "w": 9}"""))
    // after $lookup + $unwind the match struct's fields exist iff non-null
    // in that element (normalized equivalent — per-element presence is not
    // tracked through arrays)
    val rows = Aggo.aggregate(present,
      """[{"$match": {"id": 3}},
          {"$lookup": {"from": "f", "localField": "a", "foreignField": "k", "as": "m"}},
          {"$unwind": "$m"},
          {"$match": {"m.v": {"$exists": true}}},
          {"$project": {"id": 1, "v": "$m.v"}}]""", Map("f" -> fk))
      .collect()
    assert(rows.length == 1 && rows.head.getAs[String]("v") == "x")
  }

  test("preserveMissing: a null array element stays present through $unwind") {
    val docs = Aggo.fromJSONL(spark, Seq("""{"id": 1, "a": [null, "x"]}"""),
      preserveMissing = true)
    val n = Aggo.aggregate(docs,
      """[{"$unwind": {"path": "$a", "preserveNullAndEmptyArrays": true}},
          {"$match": {"a": {"$exists": true}}}, {"$count": "n"}]""")
      .collect().head.getAs[Long]("n")
    assert(n == 2L) // {a: null} EXISTS — hasOwnProperty contract holds per element
    // includeArrayIndex fields exist too (central created-column fixup)
    val idx = Aggo.aggregate(docs,
      """[{"$unwind": {"path": "$a", "includeArrayIndex": "i"}},
          {"$match": {"i": {"$exists": true}}}, {"$count": "n"}]""")
      .collect().head.getAs[Long]("n")
    assert(idx == 2L)
  }

  test("preserveMissing: fields created by $addFields/$project exist afterwards") {
    val added = agg(present,
      """[{"$addFields": {"c": 1}}, {"$match": {"c": {"$exists": true}}}, {"$count": "n"}]""").head
    assert(added("n") == 4L)
    val computed = agg(present,
      """[{"$project": {"id": 1, "c": {"$add": [1, 2]}}},
          {"$match": {"c": {"$exists": true}}}, {"$count": "n"}]""").head
    assert(computed("n") == 4L)
    // and a field dropped by an inclusion $project stops existing
    val dropped = agg(present,
      """[{"$project": {"id": 1}}, {"$match": {"a": {"$exists": false}}}, {"$count": "n"}]""").head
    assert(dropped("n") == 4L)
    // __present never leaks into results
    assert(agg(present, """[{"$match": {"id": 1}}]""").head.keySet == Set("id", "a", "n"))
  }
}
