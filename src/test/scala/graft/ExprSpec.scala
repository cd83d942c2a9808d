package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Expression-operator semantics (SURVEY §2.5) on Mongo-shaped documents —
  * nested structs, arrays, missing fields — which the TPC-H oracle tables
  * cannot exercise (FIXTURES.md). */
class ExprSpec extends AnyFunSuite {

  private def one(pipeline: String, docs: String*): Map[String, Any] =
    agg(fromJsonl(docs: _*), pipeline).head

  test("arithmetic operators") {
    val r = one(
      """[{"$project": {"add": {"$add": [1, 2, 3]}, "sub": {"$subtract": [10, "$x"]},
          "mul": {"$multiply": ["$x", 2.5]}, "div": {"$divide": ["$x", 4]},
          "mod": {"$mod": ["$x", 3]}, "abs": {"$abs": -7},
          "pow": {"$pow": [2, 10]}, "sqrt": {"$sqrt": 16},
          "ceil": {"$ceil": 1.2}, "floor": {"$floor": 1.8},
          "round2": {"$round": [1.005, 2]}, "trunc": {"$trunc": [1.999, 0]}}}]""",
      """{"x": 8}""")
    assert(r("add") == 6 && r("sub") == 2L && r("mul") == 20.0 && r("div") == 2.0)
    assert(r("mod") == 2L && r("abs") == 7 && r("pow") == 1024.0 && r("sqrt") == 4.0)
    assert(r("ceil") == 2L && r("floor") == 1L)
    assert(r("round2") == 1.0 && r("trunc") == 1L) // 1.005 is 1.00499… in IEEE; pure-arithmetic half-up
  }

  test("string operators") {
    val r = one(
      """[{"$project": {
          "up": {"$toUpper": "$s"}, "low": {"$toLower": "$s"},
          "len": {"$strLen": "$s"}, "sub": {"$substr": ["$s", 1, 3]},
          "cat": {"$concat": ["$s", "-", {"$toString": "$n"}]},
          "split": {"$split": ["$s", "b"]},
          "trim": {"$trim": {"input": "  x  "}},
          "ltrim": {"$ltrim": {"input": "zzxzz", "chars": "z"}},
          "replaced": {"$replaceAll": {"input": "$s", "find": "b", "replacement": "_"}},
          "rx": {"$regexMatch": {"input": "$s", "regex": "^a.C", "options": "i"}}}}]""",
      """{"s": "abCb", "n": 5}""")
    assert(r("up") == "ABCB" && r("low") == "abcb" && r("len") == 4)
    assert(r("sub") == "bCb" && r("cat") == "abCb-5")
    assert(r("split").asInstanceOf[scala.collection.Seq[_]] == Seq("a", "C", "")) // trailing empty kept, like JS split
    assert(r("trim") == "x" && r("ltrim") == "xzz" && r("replaced") == "a_C_")
    assert(r("rx") == true)
  }

  test("array operators incl. negative indexing and HOFs") {
    val r = one(
      """[{"$project": {
          "size": {"$size": "$a"},
          "first": {"$arrayElemAt": ["$a", 0]}, "last": {"$arrayElemAt": ["$a", -1]},
          "sliceN": {"$slice": ["$a", 2]}, "sliceNeg": {"$slice": ["$a", -2]},
          "slice3": {"$slice": ["$a", 1, 2]},
          "rev": {"$reverseArray": "$a"},
          "catA": {"$concatArrays": ["$a", [99]]},
          "has": {"$in": [30, "$a"]},
          "idx": {"$indexOfArray": ["$a", 30]},
          "idxMissing": {"$indexOfArray": ["$a", 999]},
          "filtered": {"$filter": {"input": "$a", "as": "v", "cond": {"$gt": ["$$v", 15]}}},
          "mapped": {"$map": {"input": "$a", "as": "v", "in": {"$multiply": ["$$v", 2]}}},
          "reduced": {"$reduce": {"input": "$a", "initialValue": 0, "in": {"$add": ["$$value", "$$this"]}}},
          "rng": {"$range": [0, 6, 2]}}}]""",
      """{"a": [10, 20, 30, 40]}""")
    assert(r("size") == 4 && r("first") == 10L && r("last") == 40L)
    assert(r("sliceN").asInstanceOf[scala.collection.Seq[_]] == Seq(10L, 20L))
    assert(r("sliceNeg").asInstanceOf[scala.collection.Seq[_]] == Seq(30L, 40L))
    assert(r("slice3").asInstanceOf[scala.collection.Seq[_]] == Seq(20L, 30L))
    assert(r("rev").asInstanceOf[scala.collection.Seq[_]] == Seq(40L, 30L, 20L, 10L))
    assert(r("catA").asInstanceOf[scala.collection.Seq[_]] == Seq(10L, 20L, 30L, 40L, 99L))
    assert(r("has") == true && r("idx") == 2 && r("idxMissing") == -1)
    assert(r("filtered").asInstanceOf[scala.collection.Seq[_]] == Seq(20L, 30L, 40L))
    assert(r("mapped").asInstanceOf[scala.collection.Seq[_]] == Seq(20L, 40L, 60L, 80L))
    assert(r("reduced") == 100L)
    assert(r("rng").asInstanceOf[scala.collection.Seq[_]] == Seq(0, 2, 4))
  }

  test("set operators sort their results (reference $asSet)") {
    val r = one(
      """[{"$project": {
          "inter": {"$setIntersection": ["$a", "$b"]},
          "union": {"$setUnion": ["$a", "$b"]},
          "diff": {"$setDifference": ["$a", "$b"]},
          "subset": {"$setIsSubset": [[2, 1], "$a"]},
          "eq": {"$setEquals": [[3, 2, 1, 1], [1, 2, 3]]},
          "anyTrue": {"$anyElementTrue": [[0, 0, 2]]},
          "allTrue": {"$allElementsTrue": [[1, 2, 3]]}}}]""",
      """{"a": [3, 1, 2, 2], "b": [2, 4]}""")
    assert(r("inter").asInstanceOf[scala.collection.Seq[_]] == Seq(2L))
    assert(r("union").asInstanceOf[scala.collection.Seq[_]] == Seq(1L, 2L, 3L, 4L))
    assert(r("diff").asInstanceOf[scala.collection.Seq[_]] == Seq(1L, 3L))
    assert(r("subset") == true && r("eq") == true)
    assert(r("anyTrue") == true && r("allTrue") == true)
  }

  test("comparison null-lowest and $cmp") {
    val r = one(
      """[{"$project": {
          "gtNull": {"$gt": ["$x", "$missing"]},
          "ltNull": {"$lt": ["$missing", "$x"]},
          "cmpNull": {"$cmp": ["$missing", "$x"]},
          "eqDeep": {"$eq": [{"a": 1, "b": [1, 2]}, {"a": 1, "b": [1, 2]}]}}}]""",
      """{"x": 5}""")
    assert(r("gtNull") == true && r("ltNull") == true && r("cmpNull") == -1)
    assert(r("eqDeep") == true)
  }

  test("conditionals are lazy and truthiness is Mongo-style") {
    val r = one(
      """[{"$project": {
          "c1": {"$cond": [{"$gt": ["$x", 3]}, "big", "small"]},
          "c2": {"$cond": {"if": false, "then": 1, "else": 2}},
          "ifn": {"$ifNull": ["$missing", "dflt"]},
          "sw": {"$switch": {"branches": [
                  {"case": {"$eq": ["$x", 1]}, "then": "one"},
                  {"case": {"$gte": ["$x", 4]}, "then": "many"}],
                "default": "few"}},
          "andT": {"$and": ["$x", "", true]},
          "orF": {"$or": [0, false, "$missing"]},
          "notX": {"$not": ["$x"]}}}]""",
      """{"x": 5}""")
    assert(r("c1") == "big" && r("c2") == 2 && r("ifn") == "dflt" && r("sw") == "many")
    assert(r("andT") == true) // "" and nonzero numbers are truthy
    assert(r("orF") == false)
    assert(r("notX") == false)
  }

  test("date operators in UTC incl. Mongo $week") {
    val r = one(
      """[{"$addFields": {"d": {"$toDate": "$iso"}}},
         {"$project": {
           "y": {"$year": "$d"}, "m": {"$month": "$d"}, "dom": {"$dayOfMonth": "$d"},
           "dow": {"$dayOfWeek": "$d"}, "doy": {"$dayOfYear": "$d"},
           "h": {"$hour": "$d"}, "mi": {"$minute": "$d"}, "s": {"$second": "$d"},
           "ms": {"$millisecond": "$d"}, "wk": {"$week": "$d"},
           "str": {"$dateToString": {"format": "%Y-%m-%d %H:%M", "date": "$d"}}}}]""",
      """{"iso": "2024-03-10T15:04:05.250Z"}""")
    // 2024-03-10 is a Sunday → dow 1; Jan 1 2024 is Monday → first Sunday Jan 7
    // → week((doy=70 - 7 + 7)/7) = 10
    assert(r("y") == 2024 && r("m") == 3 && r("dom") == 10 && r("dow") == 1)
    assert(r("doy") == 70 && r("h") == 15 && r("mi") == 4 && r("s") == 5 && r("ms") == 250)
    assert(r("wk") == 10)
    assert(r("str") == "2024-03-10 15:04")
  }

  test("$mergeObjects later-wins on struct fields") {
    val r = one(
      """[{"$project": {"m": {"$mergeObjects": [{"a": 1, "b": "$s"}, {"b": "win", "c": 3}]}}}]""",
      """{"s": "lose"}""")
    val m = r("m").asInstanceOf[org.apache.spark.sql.Row]
    assert(m.getAs[Any]("a") == 1 && m.getAs[Any]("b") == "win" && m.getAs[Any]("c") == 3)
  }

  test("$type / $isNumber / $literal / $$ROOT") {
    val r = one(
      """[{"$project": {
          "tNum": {"$type": "$n"}, "tStr": {"$type": "$s"}, "tArr": {"$type": "$a"},
          "tNull": {"$type": "$missing"},
          "isN": {"$isNumber": "$n"}, "isA": {"$isArray": "$a"},
          "lit": {"$literal": {"$add": "not evaluated"}},
          "root": "$$ROOT"}}]""",
      """{"n": 1.5, "s": "x", "a": [1]}""")
    assert(r("tNum") == "number" && r("tStr") == "string" && r("tArr") == "array")
    assert(r("tNull") == "null")
    assert(r("isN") == true && r("isA") == true)
    assert(r("lit").asInstanceOf[org.apache.spark.sql.Row].getAs[String]("$add") == "not evaluated")
    assert(r("root").asInstanceOf[org.apache.spark.sql.Row].schema.fieldNames.sameElements(Array("a", "n", "s")))
  }

  test("nested paths through structs and arrays of structs") {
    val rows = agg(fromJsonl(
      """{"id": 1, "loc": {"city": "SF", "geo": {"lat": 37.7}}, "items": [{"p": 5, "q": 2}, {"p": 3, "q": 10}]}"""),
      """[{"$project": {"city": "$loc.city", "lat": "$loc.geo.lat",
           "total": {"$sum": {"$map": {"input": "$items", "as": "i",
                     "in": {"$multiply": ["$$i.p", "$$i.q"]}}}}}}]""")
    val r = rows.head
    assert(r("city") == "SF" && r("lat") == 37.7 && r("total") == 40.0)
  }

  test("review regressions: $range edges, default $dateToString, missing nested path") {
    val r = one(
      """[{"$project": {
          "empty1": {"$range": [0, 0]}, "empty2": {"$range": [5, 0]},
          "empty3": {"$range": [5, 0, 1]}, "down": {"$range": [5, 0, -2]},
          "iso": {"$dateToString": {"date": {"$toDate": "$d"}}},
          "missingNested": "$a.zzz",
          "missingDeep": "$nothing.at.all"}}]""",
      """{"d": "2024-03-10T15:04:05.250Z", "a": {"x": 1}}""")
    assert(r("empty1").asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(r("empty2").asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(r("empty3").asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(r("down").asInstanceOf[scala.collection.Seq[_]] == Seq(5, 3, 1))
    assert(r("iso") == "2024-03-10T15:04:05.250Z")
    assert(r("missingNested") == null && r("missingDeep") == null)
  }

  test("unknown operator throws (closed registry, expressions.ts:147)") {
    assertThrows[graft.model.GraftException] {
      agg(fromJsonl("""{"x": 1}"""), """[{"$project": {"y": {"$nope": 1}}}]""")
    }
  }
}
