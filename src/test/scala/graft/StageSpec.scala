package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Pipeline-stage semantics (SURVEY §2.2) — including the Mongo-specific
  * shapes (missing fields, arrays, preserved nulls) the TPC-H oracle can't
  * exercise. */
class StageSpec extends AnyFunSuite {

  private val orders = fromJsonl(
    """{"id": 1, "cust": "a", "status": "new",  "total": 10.0, "tags": ["x", "y"]}""",
    """{"id": 2, "cust": "b", "status": "new",  "total": 20.0, "tags": []}""",
    """{"id": 3, "cust": "a", "status": "done", "total": 30.0, "tags": ["y"]}""",
    """{"id": 4, "cust": "c", "status": "done", "total": 40.0}""",
    """{"id": 5, "cust": "a", "status": "new",  "total": 50.0, "tags": ["z"]}""")

  test("$match operators: $in/$nin/$exists/$elemMatch/$size/$all/$not/$regex") {
    def ids(q: String): Seq[Long] =
      agg(orders, s"""[{"$$match": $q}, {"$$project": {"id": 1}}, {"$$sort": {"id": 1}}]""")
        .map(_("id").asInstanceOf[Long])
    assert(ids("""{"status": "new"}""") == Seq(1, 2, 5))
    assert(ids("""{"total": {"$gte": 20, "$lt": 50}}""") == Seq(2, 3, 4))
    assert(ids("""{"cust": {"$in": ["b", "c"]}}""") == Seq(2, 4))
    assert(ids("""{"cust": {"$nin": ["a"]}}""") == Seq(2, 4))
    assert(ids("""{"tags": {"$exists": true}}""") == Seq(1, 2, 3, 5))
    assert(ids("""{"tags": {"$exists": false}}""") == Seq(4))
    assert(ids("""{"tags": "y"}""") == Seq(1, 3)) // scalar matches array element
    assert(ids("""{"tags": {"$size": 2}}""") == Seq(1))
    assert(ids("""{"tags": {"$all": ["x", "y"]}}""") == Seq(1))
    assert(ids("""{"tags": {"$elemMatch": {"$regex": "^z"}}}""") == Seq(5))
    assert(ids("""{"total": {"$not": {"$gt": 25}}}""") == Seq(1, 2))
    assert(ids("""{"id": {"$mod": [2, 1]}}""") == Seq(1, 3, 5))
    assert(ids("""{"$or": [{"cust": "b"}, {"total": {"$gt": 45}}]}""") == Seq(2, 5))
    assert(ids("""{"$nor": [{"status": "new"}, {"cust": "c"}]}""") == Seq(3))
    assert(ids("""{"$expr": {"$gt": ["$total", {"$multiply": ["$id", 9]}]}}""") == Seq(1, 2, 3, 4, 5))
    // $options must survive inside $not (review regression)
    assert(ids("""{"status": {"$not": {"$regex": "^NEW", "$options": "i"}}}""") == Seq(3, 4))
  }

  test("$project _id handling: {_id:1} is inclusion mode; _id default-included") {
    val docs = fromJsonl("""{"_id": 7, "x": 1, "y": 2}""")
    assert(agg(docs, """[{"$project": {"_id": 1}}]""").head.keySet == Set("_id"))
    val inc = agg(docs, """[{"$project": {"x": 1}}]""").head
    assert(inc.keySet == Set("_id", "x")) // _id default-included
    val exc = agg(docs, """[{"$project": {"x": 1, "_id": 0}}]""").head
    assert(exc.keySet == Set("x"))
  }

  test("$project inclusion of a missing field is silently omitted (Mongo parity)") {
    val r = agg(orders, """[{"$match": {"id": 1}}, {"$project": {"id": 1, "nope": 1, "a.b.c": 1}}]""").head
    assert(r.keySet == Set("id"))
  }

  test("$skip/$limit without $sort follow encounter order deterministically") {
    import org.apache.spark.sql.functions.col
    // 8 contiguous range partitions: encounter order == value order
    val df = spark.range(0, 100, 1, 8).toDF("v")
    val out = Aggo.aggregate(df, """[{"$skip": 10}, {"$limit": 5}]""")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(10L, 11L, 12L, 13L, 14L))
    // and stable across runs even when partitioning is scrambled
    val scrambled = df.repartition(5)
    val a = Aggo.aggregate(scrambled, """[{"$skip": 7}, {"$limit": 11}]""").collect().map(_.getLong(0)).toSeq
    val b = Aggo.aggregate(scrambled, """[{"$skip": 7}, {"$limit": 11}]""").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.length == 11)
  }

  test("$unwind resolves nested paths at any depth") {
    val docs = fromJsonl(
      """{"id": 1, "a": {"b": {"c": [10, 20]}}}""",
      """{"id": 2, "a": {"b": {"c": [30]}}}""")
    val rows = agg(docs,
      """[{"$unwind": "$a.b.c"}, {"$sort": {"id": 1, "a.b.c": 1}},
          {"$project": {"id": 1, "v": "$a.b.c"}}]""")
    assert(rows.map(r => (r("id"), r("v"))) == Seq((1L, 10L), (1L, 20L), (2L, 30L)))
    val withIdx = agg(docs,
      """[{"$unwind": {"path": "$a.b.c", "includeArrayIndex": "i"}},
          {"$sort": {"id": 1, "i": 1}}, {"$project": {"id": 1, "i": 1, "v": "$a.b.c"}}]""")
    assert(withIdx.map(r => (r("id"), r("i"), r("v"))) ==
      Seq((1L, 0L, 10L), (1L, 1L, 20L), (2L, 0L, 30L)))
  }

  test("explain() reports per-stage lowering and scan pushdown") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-explain").toString
    spark.range(0, 100).toDF("v").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val text = Aggo.explain(df, """[{"$match": {"v": {"$gte": 50}}}, {"$project": {"v": 1}}]""")
    assert(text.contains("stage  0: $match"))
    assert(text.contains("Filter (pushed into the scan where possible)"))
    assert(text.contains("PushedFilters") && text.contains("GreaterThanOrEqual(v,50"))
    assert(text.contains("ReadSchema"))
    // per-stage reason codes (reference stage analyses, api-enhancements.ts:135-288)
    assert(text.contains("· declarative Filter — eligible predicates are pushed into the scan"))
    // scan+filter+project: zero exchanges
    assert(text.contains("shuffle exchanges: 0, broadcast exchanges: 0"))
    // a group adds exactly one shuffle exchange
    val g = Aggo.explain(df, """[{"$group": {"_id": "$v", "n": {"$sum": 1}}}]""")
    assert(g.contains("shuffle exchanges: 1, broadcast exchanges: 0"))
  }

  test("explain() emits per-stage reason codes for plan-shaping decisions") {
    def explained(pipe: String, colls: Map[String, org.apache.spark.sql.DataFrame] = Map.empty): String =
      Aggo.explain(orders, pipe, colls)
    // struct-encoded encounter order on an ascending sort
    val grp = explained("""[{"$sort": {"id": 1}}, {"$group": {"_id": "$cust", "xs": {"$push": "$id"}}}]""")
    assert(grp.contains("· encounter order: sort keys struct-encoded"))
    // desc-string order basis → two-pass restamp code
    val desc = explained("""[{"$sort": {"status": -1}}, {"$group": {"_id": "$cust", "xs": {"$push": "$id"}}}]""")
    assert(desc.contains("· encounter order: two-pass global-rank restamp"))
    // lookup: broadcast-eligible equality join
    val lkp = explained(
      """[{"$lookup": {"from": "o2", "localField": "id", "foreignField": "id", "as": "m"}}]""",
      Map("o2" -> orders))
    assert(lkp.contains("· equality join on a pre-aggregated foreign side"))
    // unpartitioned window → two-pass rewrite code
    val win = explained(
      """[{"$setWindowFields": {"sortBy": {"id": 1}, "output": {"rn": {"$documentNumber": {}}}}}]""")
    assert(win.contains("· two-pass rewrite applied"))
    // partitioned window
    val pwin = explained(
      """[{"$setWindowFields": {"partitionBy": "$cust", "sortBy": {"id": 1},
           "output": {"rn": {"$documentNumber": {}}}}}]""")
    assert(pwin.contains("· partitioned Window — one hash shuffle"))
    // $sample determinism code
    val smp = explained("""[{"$sample": {"size": 2}}]""")
    assert(smp.contains("· deterministic md5 row-hash order"))
  }

  test("unpartitioned $fill locf two-pass carries across range partitions") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 500).toDF("t")
      .withColumn("v", when(col("t") % 100 === 0, col("t").cast("double")))
      .repartition(6)
    val out = Aggo.aggregate(df,
      """[{"$fill": {"sortBy": {"t": 1}, "output": {"v": {"method": "locf"}}}}]""")
    assert(out.queryExecution.executedPlan.toString.toLowerCase.contains("rangepartitioning"))
    val rows = out.collect().map(r => r.getAs[Long]("t") -> r.getAs[Double]("v")).toMap
    (0L until 500L).foreach { t => assert(rows(t) == (t / 100 * 100).toDouble) }
  }

  test("unpartitioned $setWindowFields two-pass matches global-window semantics") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000).toDF("v")
      .withColumn("g", col("v") % 7)
      .withColumn("x", when(col("v") % 5 === 0, lit(null)).otherwise(col("v").cast("double")))
      .repartition(8)
    val out = Aggo.aggregate(df,
      """[{"$setWindowFields": {"sortBy": {"v": 1},
           "output": {
             "rn":   {"$documentNumber": {}},
             "rnk":  {"$rank": {}},
             "rsum": {"$sum": "$x",   "window": {"documents": ["unbounded", "current"]}},
             "rmin": {"$min": "$x",   "window": {"documents": ["unbounded", "current"]}},
             "rmax": {"$max": "$x",   "window": {"documents": ["unbounded", "current"]}},
             "rcnt": {"$count": {},   "window": {"documents": ["unbounded", "current"]}},
             "ravg": {"$avg": "$x",   "window": {"documents": ["unbounded", "current"]}}}}}]""")
    // scale audit: the plan must range-partition, not funnel one task
    assert(out.queryExecution.executedPlan.toString.toLowerCase.contains("rangepartitioning"))
    val rows = out.collect().map(r => (r.getAs[Long]("v"), r)).sortBy(_._1)
    rows.foreach { case (v, r) =>
      assert(r.getAs[Int]("rn") == v + 1 && r.getAs[Int]("rnk") == v + 1)
      assert(r.getAs[Long]("rcnt") == v + 1)
      val xs = (0L to v).filter(_ % 5 != 0).map(_.toDouble)
      if (xs.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("rsum")) && r.isNullAt(r.fieldIndex("ravg")))
      } else {
        assert(r.getAs[Double]("rsum") == xs.sum)
        assert(r.getAs[Double]("rmin") == xs.min && r.getAs[Double]("rmax") == xs.max)
        assert(math.abs(r.getAs[Double]("ravg") - xs.sum / xs.size) < 1e-9)
      }
    }
    // descending sort keys: range partitions follow the sort direction
    val desc = Aggo.aggregate(df,
      """[{"$setWindowFields": {"sortBy": {"v": -1},
           "output": {"rn": {"$documentNumber": {}},
                      "rmax": {"$max": "$x", "window": {"documents": ["unbounded", "current"]}}}}}]""")
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Int]("rn"))).toMap
    (0L until 1000L).foreach { v => assert(desc(v) == (1000 - v).toInt) }

    // ties spanning range boundaries: rank/denseRank still exact
    val ties = Aggo.aggregate(df,
      """[{"$setWindowFields": {"sortBy": {"g": 1},
           "output": {"rnk": {"$rank": {}}, "drnk": {"$denseRank": {}}}}}]""")
      .select("g", "rnk", "drnk").distinct().collect()
      .map(r => (r.getAs[Long]("g"), r.getAs[Int]("rnk"), r.getAs[Int]("drnk"))).toSet
    val expected = {
      val counts = (0L until 1000L).groupBy(_ % 7).view.mapValues(_.size).toMap
      (0L to 6L).map { g =>
        val before = (0L until g).map(counts).sum
        (g, before.toInt + 1, g.toInt + 1)
      }.toSet
    }
    assert(ties == expected)
  }

  test("$avg parity flag: sql default (null-skipping) vs reference group-size division") {
    val docs = fromJsonl("""{"k": 1, "v": 10.0}""", """{"k": 1, "v": null}""", """{"k": 1}""")
    val pipe = """[{"$group": {"_id": "$k", "a": {"$avg": "$v"}}}]"""
    assert(agg(docs, pipe).head("a") == 10.0) // SQL: 10 / 1 numeric value
    spark.conf.set("graft.parity.avg", "reference")
    try {
      assert(agg(docs, pipe).head("a") == 10.0 / 3) // reference: 10 / 3 docs
      // all-null group → 0 in reference mode, not null
      assert(agg(fromJsonl("""{"k": 1, "v": null}"""), pipe).head("a") == 0.0)
    } finally spark.conf.unset("graft.parity.avg")
  }

  test("array element order survives $unwind into $limit and $push") {
    val docs = fromJsonl(
      """{"id": 1, "arr": [10, 20, 30, 40]}""",
      """{"id": 2, "arr": [50, 60]}""")
    val limited = Aggo.aggregate(docs.repartition(3),
      """[{"$unwind": "$arr"}, {"$limit": 2}]""")
      .collect().map(_.getAs[Long]("arr")).toSeq
    // whichever document comes first, its elements must appear in array order
    assert(limited == Seq(10L, 20L) || limited == Seq(50L, 60L))
    val pushed = agg(docs,
      """[{"$unwind": "$arr"},
          {"$group": {"_id": "$id", "vals": {"$push": "$arr"}}}, {"$sort": {"_id": 1}}]""")
      .map(_("vals").asInstanceOf[scala.collection.Seq[_]].toSeq)
    assert(pushed == Seq(Seq(10L, 20L, 30L, 40L), Seq(50L, 60L)))
  }

  test("chained $unwind keeps the reference's lexicographic (outer, inner) order") {
    // reference aggregation.ts:414-535 — a second $unwind's elements expand
    // in place, so (outer position, inner position) is the document order.
    val docs = fromJsonl(
      """{"id": 1, "a": ["p", "q"], "b": ["x", "y", "z"]}""",
      """{"id": 2, "a": ["r"], "b": ["w"]}""")
    def pairs(d: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = agg(d,
      """[{"$unwind": "$a"}, {"$unwind": "$b"},
          {"$group": {"_id": "$id", "vals": {"$push": {"$concat": ["$a", "-", "$b"]}}}},
          {"$sort": {"_id": 1}}]""")
      .map(_("vals").asInstanceOf[scala.collection.Seq[String]].toSeq)
    val expected = Seq(
      Seq("p-x", "p-y", "p-z", "q-x", "q-y", "q-z"),
      Seq("r-w"))
    assert(pairs(docs) == expected)
    assert(pairs(docs.repartition(3)) == expected) // partition-independent
    // $limit after two unwinds follows the same combined order
    val limited = agg(docs,
      """[{"$match": {"id": 1}}, {"$unwind": "$a"}, {"$unwind": "$b"},
          {"$limit": 4}, {"$project": {"v": {"$concat": ["$a", "-", "$b"]}}}]""")
      .map(_("v"))
    assert(limited == Seq("p-x", "p-y", "p-z", "q-x"))
    // three-deep chain: order composes at any depth
    val deep = fromJsonl("""{"id": 1, "a": [1, 2], "b": [1, 2], "c": [1, 2]}""")
    val triples = agg(deep,
      """[{"$unwind": "$a"}, {"$unwind": "$b"}, {"$unwind": "$c"},
          {"$group": {"_id": "$id",
            "vals": {"$push": {"$add": [{"$multiply": ["$a", 100]}, {"$multiply": ["$b", 10]}, "$c"]}}}}]""")
      .head("vals").asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(triples == Seq(111L, 112L, 121L, 122L, 211L, 212L, 221L, 222L))
    // a non-array $unwind between two real ones passes through without
    // disturbing the accumulated order key
    val mixed = fromJsonl("""{"id": 1, "a": ["p", "q"], "s": "k", "b": ["x", "y"]}""")
    val mixedVals = agg(mixed,
      """[{"$unwind": "$a"}, {"$unwind": "$s"}, {"$unwind": "$b"},
          {"$group": {"_id": "$id", "vals": {"$push": {"$concat": ["$a", "$s", "$b"]}}}}]""")
      .head("vals").asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(mixedVals == Seq("pkx", "pky", "qkx", "qky"))
  }

  test("$addFields sets multiple nested paths under the same top-level field") {
    val r = agg(fromJsonl("""{"id": 1, "n": {"z": 0}}"""),
      """[{"$addFields": {"n.a": 1, "n.b": 2}}]""").head
    val n = r("n").asInstanceOf[org.apache.spark.sql.Row]
    assert(n.getAs[Int]("a") == 1 && n.getAs[Int]("b") == 2 && n.getAs[Long]("z") == 0L)
  }

  test("$sample key distinguishes null positions (no partition-order ties)") {
    val docs = fromJsonl(
      """{"a": null, "b": "x"}""", """{"a": "x", "b": null}""",
      """{"a": "y", "b": "y"}""")
    def one(parts: Int): Set[String] =
      Aggo.aggregate(docs.repartition(parts), """[{"$sample": {"size": 1}}]""")
        .collect().map(r => s"${r.getAs[String]("a")}|${r.getAs[String]("b")}").toSet
    assert(one(1) == one(3) && one(3) == one(7)) // same winner at any layout
  }

  test("$$REMOVE: static field removal, per-row $cond removal, nested use throws") {
    // bare $$REMOVE removes the field statically (reference expressions.ts:453-456)
    val st = agg(orders, """[{"$match": {"id": 1}}, {"$addFields": {"status": "$$REMOVE"}}]""").head
    assert(!st.keySet.contains("status") && st.keySet.contains("total"))
    val pj = agg(orders, """[{"$match": {"id": 1}}, {"$project": {"id": 1, "status": "$$REMOVE"}}]""").head
    assert(pj.keySet == Set("id"))
    // $cond branch: removed rows read as null under missing→null normalization
    val rows = agg(orders,
      """[{"$project": {"id": 1, "big": {"$cond": [{"$gt": ["$total", 25]}, "$total", "$$REMOVE"]}}},
          {"$sort": {"id": 1}}]""")
    assert(rows.map(_("big")) == Seq(null, null, 30.0, 40.0, 50.0))
    // nested anywhere else: loud failure, not a silent null
    assertThrows[graft.model.GraftException] {
      agg(orders, """[{"$project": {"x": {"$add": ["$total", "$$REMOVE"]}}}]""")
    }
    // with presence tracking, per-row removal is a REAL removal: $exists
    // turns false and $push skips the removed documents
    val docs = Aggo.fromJSONL(spark, Seq(
      """{"id": 1, "v": 10}""", """{"id": 2, "v": 30}""", """{"id": 3, "v": 5}"""),
      preserveMissing = true)
    val kept = Aggo.aggregate(docs,
      """[{"$addFields": {"v": {"$cond": [{"$lt": ["$v", 20]}, "$$REMOVE", "$v"]}}},
          {"$match": {"v": {"$exists": true}}}]""")
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(kept == Seq(2L))
    val pushed = Aggo.aggregate(docs,
      """[{"$sort": {"id": 1}},
          {"$addFields": {"v": {"$cond": [{"$lt": ["$v", 20]}, "$$REMOVE", "$v"]}}},
          {"$group": {"_id": null, "vs": {"$push": "$v"}}}]""")
      .collect().head.getAs[scala.collection.Seq[Long]]("vs").toSeq
    assert(pushed == Seq(30L))
  }

  test("$bucket order-sensitive accumulators respect encounter order") {
    val r = agg(orders,
      """[{"$bucket": {"groupBy": "$total", "boundaries": [0, 100],
            "output": {"firstId": {"$first": "$id"}, "ids": {"$push": "$id"}}}}]""").head
    assert(r("firstId") == 1L)
    assert(r("ids").asInstanceOf[scala.collection.Seq[_]].toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("$project include/exclude/computed/nested rebuild") {
    val inc = agg(orders, """[{"$match": {"id": 1}}, {"$project": {"id": 1, "twice": {"$multiply": ["$total", 2]}}}]""").head
    assert(inc.keySet == Set("id", "twice") && inc("twice") == 20.0)
    val exc = agg(orders, """[{"$match": {"id": 1}}, {"$project": {"tags": 0, "status": 0}}]""").head
    assert(exc.keySet == Set("id", "cust", "total"))
    val nested = agg(fromJsonl("""{"a": {"b": 1, "c": 2}, "keep": 9}"""),
      """[{"$project": {"a.b": 1, "keep": 1}}]""").head
    assert(nested("a").asInstanceOf[org.apache.spark.sql.Row].schema.fieldNames.toSeq == Seq("b"))
    // deep nesting preserved recursively, computed leaves allowed
    val deep = agg(fromJsonl("""{"a": {"b": {"c": 7, "d": 8}, "e": 9}}"""),
      """[{"$project": {"a.b.c": 1, "a.e": 1, "a.b.twice": {"$multiply": ["$a.b.c", 2]}}}]""").head
    val aRow = deep("a").asInstanceOf[org.apache.spark.sql.Row]
    val bRow = aRow.getAs[org.apache.spark.sql.Row]("b")
    assert(bRow.getAs[Any]("c") == 7L && bRow.getAs[Any]("twice") == 14L && aRow.getAs[Any]("e") == 9L)
  }

  test("$addFields keeps fields and supports nested set; $unset drops") {
    val r = agg(fromJsonl("""{"a": {"b": 1}, "x": 2}"""),
      """[{"$addFields": {"a.c": 7, "y": {"$add": ["$x", 1]}}}, {"$unset": "x"}]""").head
    assert(r.keySet == Set("a", "y"))
    val a = r("a").asInstanceOf[org.apache.spark.sql.Row]
    assert(a.getAs[Any]("b") == 1L && a.getAs[Any]("c") == 7 && r("y") == 3L)
  }

  test("$group: compound id, accumulators, encounter order for $first/$push") {
    val rows = agg(orders,
      """[{"$sort": {"total": -1}},
          {"$group": {"_id": "$cust", "n": {"$sum": 1}, "tot": {"$sum": "$total"},
                      "avg": {"$avg": "$total"}, "mx": {"$max": "$total"},
                      "firstId": {"$first": "$id"}, "lastId": {"$last": "$id"},
                      "ids": {"$push": "$id"}, "statuses": {"$addToSet": "$status"}}},
          {"$sort": {"_id": 1}}]""")
    val a = rows.head
    assert(a("_id") == "a" && a("n") == 3L && a("tot") == 90.0 && a("avg") == 30.0)
    assert(a("mx") == 50.0)
    // sorted total desc → a's docs are 5 (50), 3 (30), 1 (10)
    assert(a("firstId") == 5L && a("lastId") == 1L)
    assert(a("ids").asInstanceOf[scala.collection.Seq[_]] == Seq(5L, 3L, 1L))
    assert(a("statuses").asInstanceOf[scala.collection.Seq[_]] == Seq("done", "new"))
  }

  test("$group _id null makes one group; $count rewrites") {
    val g = agg(orders, """[{"$group": {"_id": null, "n": {"$sum": 1}}}]""").head
    assert(g("n") == 5L)
    val c = agg(orders, """[{"$match": {"status": "new"}}, {"$count": "total"}]""").head
    assert(c("total") == 3L)
  }

  test("$unwind forms: default drops null/empty, preserve keeps, index") {
    val basic = agg(orders, """[{"$unwind": "$tags"}, {"$project": {"id": 1, "tags": 1}}, {"$sort": {"id": 1, "tags": 1}}]""")
    assert(basic.map(r => (r("id"), r("tags"))) ==
      Seq((1L, "x"), (1L, "y"), (3L, "y"), (5L, "z")))
    val preserved = agg(orders,
      """[{"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": true}}, {"$count": "n"}]""").head
    assert(preserved("n") == 6L) // 4 exploded + id2 (empty) + id4 (missing)
    val idx = agg(orders,
      """[{"$match": {"id": 1}}, {"$unwind": {"path": "$tags", "includeArrayIndex": "i"}},
          {"$project": {"tags": 1, "i": 1}}, {"$sort": {"i": 1}}]""")
    assert(idx.map(r => (r("tags"), r("i"))) == Seq(("x", 0L), ("y", 1L)))
  }

  test("$sort directions with nulls-lowest; $limit/$skip") {
    val sorted = agg(orders,
      """[{"$sort": {"status": 1, "total": -1}}, {"$project": {"id": 1}}]""")
      .map(_("id"))
    assert(sorted == Seq(4L, 3L, 5L, 2L, 1L))
    val page = agg(orders,
      """[{"$sort": {"id": 1}}, {"$skip": 2}, {"$limit": 2}, {"$project": {"id": 1}}]""")
      .map(_("id"))
    assert(page == Seq(3L, 4L))
  }

  test("$lookup equality + pipeline forms") {
    val custs = fromJsonl(
      """{"name": "a", "tier": "gold"}""",
      """{"name": "b", "tier": "bronze"}""")
    val eq = agg(orders,
      """[{"$lookup": {"from": "custs", "localField": "cust", "foreignField": "name", "as": "c"}},
          {"$project": {"id": 1, "nc": {"$size": "$c"},
                        "tier": {"$arrayElemAt": ["$c.tier", 0]}}},
          {"$sort": {"id": 1}}]""",
      Map("custs" -> custs))
    assert(eq.map(r => (r("id"), r("nc"), r("tier"))) ==
      Seq((1L, 1, "gold"), (2L, 1, "bronze"), (3L, 1, "gold"), (4L, 0, null), (5L, 1, "gold")))

    val pipe = agg(custs,
      """[{"$lookup": {"from": "orders", "let": {"n": "$name"},
            "pipeline": [
              {"$match": {"$expr": {"$and": [{"$eq": ["$$n", "$cust"]}, {"$gte": ["$total", 20]}]}}},
              {"$sort": {"total": -1}}, {"$limit": 1}],
            "as": "top"}},
          {"$unwind": "$top"},
          {"$project": {"name": 1, "topId": "$top.id"}}, {"$sort": {"name": 1}}]""",
      Map("orders" -> orders))
    assert(pipe.map(r => (r("name"), r("topId"))) == Seq(("a", 5L), ("b", 2L)))

    // residual non-equi var predicate → per-element array filter after join
    val limits = fromJsonl(
      """{"name": "a", "cap": 35.0}""",
      """{"name": "b", "cap": 25.0}""")
    val residual = agg(limits,
      """[{"$lookup": {"from": "orders", "let": {"n": "$name", "c": "$cap"},
            "pipeline": [{"$match": {"$expr": {"$and": [
              {"$eq": ["$$n", "$cust"]}, {"$lt": ["$total", "$$c"]}]}}}],
            "as": "cheap"}},
          {"$project": {"name": 1, "n_cheap": {"$size": "$cheap"}}}, {"$sort": {"name": 1}}]""",
      Map("orders" -> orders))
    assert(residual.map(r => (r("name"), r("n_cheap"))) == Seq(("a", 2), ("b", 1)))

    // concise correlated form (Mongo 5.0): equality + sub-pipeline combined
    val concise = agg(custs,
      """[{"$lookup": {"from": "orders", "localField": "name", "foreignField": "cust",
            "pipeline": [{"$match": {"$expr": {"$gte": ["$total", 30]}}},
                          {"$sort": {"total": 1}}],
            "as": "big"}},
          {"$project": {"name": 1, "ids": {"$map": {"input": "$big", "as": "b", "in": "$$b.id"}}}},
          {"$sort": {"name": 1}}]""",
      Map("orders" -> orders))
    assert(concise.map(r => (r("name"), r("ids").asInstanceOf[scala.collection.Seq[_]].toSeq)) ==
      Seq(("a", Seq(3L, 5L)), ("b", Seq())))

    // uncorrelated pipeline form: same top-2 list attached to every row
    val uncorr = agg(custs,
      """[{"$lookup": {"from": "orders",
            "pipeline": [{"$sort": {"total": -1, "id": 1}}, {"$limit": 2},
                          {"$project": {"id": 1}}],
            "as": "top2"}},
          {"$project": {"name": 1, "ids": {"$map": {"input": "$top2", "as": "t", "in": "$$t.id"}}}},
          {"$sort": {"name": 1}}]""",
      Map("orders" -> orders))
    assert(uncorr.map(r => (r("name"), r("ids").asInstanceOf[scala.collection.Seq[_]].toSeq)) ==
      Seq(("a", Seq(5L, 4L)), ("b", Seq(5L, 4L))))
  }

  test("$replaceRoot, $sortByCount, $sample determinism") {
    val rr = agg(fromJsonl("""{"meta": {"x": 1, "y": "z"}, "drop": 0}"""),
      """[{"$replaceRoot": {"newRoot": "$meta"}}]""").head
    assert(rr.keySet == Set("x", "y"))
    val sbc = agg(orders, """[{"$sortByCount": "$status"}]""")
    assert(sbc.head("_id") == "new" && sbc.head("count") == 3L)
    val s1 = agg(orders, """[{"$sample": {"size": 2}}, {"$project": {"id": 1}}]""").map(_("id")).toSet
    val s2 = agg(orders, """[{"$sample": {"size": 2}}, {"$project": {"id": 1}}]""").map(_("id")).toSet
    assert(s1 == s2 && s1.size == 2) // seeded/hash-based → stable
  }

  test("$bucketAuto on numeric keys plans no global window (scale audit)") {
    val df = spark.range(0, 1000).toDF("v")
    val out = Aggo.aggregate(df, """[{"$bucketAuto": {"groupBy": "$v", "buckets": 4}}]""")
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "numeric $bucketAuto must use quantile boundaries, not a single-partition ntile window")
    val counts = out.collect().map(_.getAs[Long]("count"))
    assert(counts.sum == 1000L && counts.length == 4 && counts.forall(c => c > 200 && c < 300))
  }

  test("$bucketAuto on string keys: exact equal-count boundaries, no window in the result plan") {
    // 9 distinct keys × 10 rows; 3 buckets → exact 30/30/30 split with equal
    // keys kept together, and the result plan is boundary-CASE + groupBy
    // (the boundary job ran eagerly, scale-safe two-pass — no ntile window).
    val df = spark.range(0, 90).selectExpr("concat('k', lpad(cast(id % 9 as string), 2, '0')) as s")
      .repartition(4)
    val out = Aggo.aggregate(df, """[{"$bucketAuto": {"groupBy": "$s", "buckets": 3}}]""")
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "string $bucketAuto must use exact count boundaries, not a single-partition ntile window")
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("count")).toSeq == Seq(30L, 30L, 30L))
    val ids = rows.map(_.getStruct(0))
    assert(ids(0).getString(0) == "k00" && ids(0).getString(1) == "k02")
    assert(ids(1).getString(0) == "k03" && ids(1).getString(1) == "k05")
    assert(ids(2).getString(0) == "k06" && ids(2).getString(1) == "k08")
  }

  test("desc-string $sort feeding $push restamps scale-safely (no global data window)") {
    val docs = fromJsonl(
      """{"id": 1, "k": "beta",  "g": 1}""",
      """{"id": 2, "k": "alpha", "g": 1}""",
      """{"id": 3, "k": "gamma", "g": 1}""",
      """{"id": 4, "k": "alpha", "g": 1}""",
      """{"id": 5, "k": "delta", "g": 1}""")
    val res = Aggo.aggregate(docs.repartition(3),
      """[{"$sort": {"k": -1, "id": 1}},
          {"$group": {"_id": "$g", "ks": {"$push": "$k"}, "ids": {"$push": "$id"}}}]""")
    val row = res.collect().head
    assert(row.getAs[scala.collection.Seq[String]]("ks").toSeq ==
      Seq("gamma", "delta", "beta", "alpha", "alpha"))
    assert(row.getAs[scala.collection.Seq[Long]]("ids").toSeq == Seq(3L, 5L, 1L, 2L, 4L))
    // every unpartitioned logical Window must sit over an aggregated (tiny
    // per-partition stats) frame — never over the data itself
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val overData = res.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(overData.isEmpty, s"unpartitioned window over raw data: $overData")
  }

  test("$bucketAuto equal-count buckets; N-variant accumulators; $sortArray") {
    val ba = agg(orders,
      """[{"$bucketAuto": {"groupBy": "$total", "buckets": 2,
                           "output": {"n": {"$sum": 1}, "tot": {"$sum": "$total"}}}}]""")
    assert(ba.map(_("n")) == Seq(3L, 2L))
    val ids = ba.map(_("_id").asInstanceOf[org.apache.spark.sql.Row])
    assert(ids.head.getAs[Double]("min") == 10.0 && ids.head.getAs[Double]("max") == 30.0)
    assert(ids(1).getAs[Double]("min") == 40.0 && ids(1).getAs[Double]("max") == 50.0)

    val nacc = agg(orders,
      """[{"$sort": {"id": 1}},
          {"$group": {"_id": null,
            "min2": {"$minN": {"input": "$total", "n": 2}},
            "max2": {"$maxN": {"input": "$total", "n": 2}},
            "first2": {"$firstN": {"input": "$id", "n": 2}},
            "last2": {"$lastN": {"input": "$id", "n": 2}}}}]""").head
    assert(nacc("min2").asInstanceOf[scala.collection.Seq[_]] == Seq(10.0, 20.0))
    assert(nacc("max2").asInstanceOf[scala.collection.Seq[_]] == Seq(50.0, 40.0))
    assert(nacc("first2").asInstanceOf[scala.collection.Seq[_]] == Seq(1L, 2L))
    assert(nacc("last2").asInstanceOf[scala.collection.Seq[_]] == Seq(4L, 5L))

    val approx = agg(orders,
      """[{"$group": {"_id": null, "nc": {"$approxDistinct": "$cust"}}}]""").head
    assert(approx("nc") == 3L)

    // bounded-heap accumulators on NON-double keys: strings sort
    // lexicographically, nulls are skipped, and a group spanning many
    // partitions exercises partial-buffer merge
    val wide = fromJsonl((1 to 200).map(i =>
      s"""{"id": $i, "s": ${if (i % 7 == 0) "null" else s""""w${f"$i%03d"}""""}}"""): _*)
      .repartition(16)
    val sacc = agg(wide,
      """[{"$group": {"_id": null,
            "min3": {"$minN": {"input": "$s", "n": 3}},
            "max3": {"$maxN": {"input": "$s", "n": 3}}}}]""").head
    assert(sacc("min3").asInstanceOf[scala.collection.Seq[_]] == Seq("w001", "w002", "w003"))
    assert(sacc("max3").asInstanceOf[scala.collection.Seq[_]] == Seq("w200", "w199", "w198"))
    // string $topN under the accumulator's own sortBy (ascending)
    val stop = agg(orders,
      """[{"$group": {"_id": null,
            "t2": {"$topN": {"output": "$id", "sortBy": {"status": 1, "id": 1}, "n": 2}},
            "b2": {"$bottomN": {"output": "$id", "sortBy": {"status": 1, "id": 1}, "n": 2}}}}]""").head
    val statuses = agg(orders, """[{"$sort": {"status": 1, "id": 1}}, {"$project": {"id": 1}}]""")
      .map(_("id"))
    assert(stop("t2").asInstanceOf[scala.collection.Seq[_]] == statuses.take(2))
    assert(stop("b2").asInstanceOf[scala.collection.Seq[_]] == statuses.takeRight(2))

    val ranged = agg(orders,
      """[{"$setWindowFields": {"sortBy": {"total": 1},
           "output": {"near": {"$count": {}, "window": {"range": [-15, 15]}}}}},
          {"$match": {"id": 3}}, {"$project": {"near": 1}}]""").head
    assert(ranged("near") == 3L) // totals within ±15 of 30: 20, 30, 40

    val sa = agg(fromJsonl("""{"a": [3, 1, 2]}"""),
      """[{"$project": {"up": {"$sortArray": {"input": "$a", "sortBy": 1}},
                        "down": {"$sortArray": {"input": "$a", "sortBy": -1}}}}]""").head
    assert(sa("up").asInstanceOf[scala.collection.Seq[_]] == Seq(1L, 2L, 3L))
    assert(sa("down").asInstanceOf[scala.collection.Seq[_]] == Seq(3L, 2L, 1L))
  }

  test("$bucket groups by boundaries with default") {
    val rows = agg(orders,
      """[{"$bucket": {"groupBy": "$total", "boundaries": [0, 25, 45], "default": -1,
                       "output": {"n": {"$sum": 1}, "mx": {"$max": "$total"}}}},
          {"$sort": {"_id": 1}}]""")
    assert(rows.map(r => (r("_id"), r("n"), r("mx"))) ==
      Seq((-1, 1L, 50.0), (0, 2L, 20.0), (25, 2L, 40.0)))
  }

  test("$facet runs sub-pipelines over same input") {
    val f = agg(orders,
      """[{"$facet": {
           "byStatus": [{"$group": {"_id": "$status", "n": {"$sum": 1}}}, {"$sort": {"_id": 1}}],
           "top2": [{"$sort": {"total": -1}}, {"$limit": 2}, {"$project": {"id": 1}}]}}]""").head
    val byStatus = f("byStatus").asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
    assert(byStatus.map(r => (r.getAs[String]("_id"), r.getAs[Long]("n"))) ==
      Seq(("done", 2L), ("new", 3L)))
    assert(f("top2").asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]].map(_.getAs[Long]("id")) == Seq(5L, 4L))
  }

  test("$unionWith merges collections by name") {
    val extra = fromJsonl("""{"id": 100, "cust": "zz", "status": "new", "total": 1.0}""")
    val n = agg(orders, """[{"$unionWith": "extra"}, {"$count": "n"}]""", Map("extra" -> extra)).head
    assert(n("n") == 6L)
  }

  test("$setWindowFields rank/shift/running sums") {
    val rows = agg(orders,
      """[{"$setWindowFields": {"partitionBy": "$cust", "sortBy": {"total": 1},
           "output": {"rnk": {"$rank": {}},
                      "run": {"$sum": "$total", "window": {"documents": ["unbounded", "current"]}},
                      "partLast": {"$last": "$id"},
                      "prev": {"$shift": {"output": "$id", "by": -1, "default": -1}}}}},
          {"$match": {"cust": "a"}}, {"$sort": {"total": 1}},
          {"$project": {"id": 1, "rnk": 1, "run": 1, "prev": 1, "partLast": 1}}]""")
    assert(rows.map(r => (r("id"), r("rnk"), r("run"), r("prev"), r("partLast"))) ==
      Seq((1L, 1, 10.0, -1L, 5L), (3L, 2, 40.0, 1L, 5L), (5L, 3, 90.0, 3L, 5L)))
  }

  test("$out writes and $merge upserts parquet sinks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val outPath = s"$dir/out.parquet"
    val n = agg(orders, s"""[{"$$match": {"status": "new"}}, {"$$out": "$outPath"}]""").size
    assert(n == 3 && spark.read.parquet(outPath).count() == 3)
    // merge: replace matching ids, insert new ones
    val updates = fromJsonl(
      """{"id": 1, "cust": "a", "status": "merged", "total": 99.0}""",
      """{"id": 9, "cust": "q", "status": "new", "total": 1.0}""")
    Aggo.aggregate(updates, s"""[{"$$merge": {"into": "$outPath", "on": "id"}}]""").count()
    val merged = spark.read.parquet(outPath).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
    assert(merged == Map(1L -> "merged", 2L -> "new", 5L -> "new", 9L -> "new"))
  }

  test("$vectorSearch ranks by cosine, honors filter/limit/scoreField") {
    val vecs = fromJsonl(
      """{"id": 1, "cat": "a", "v": [1.0, 0.0]}""",
      """{"id": 2, "cat": "a", "v": [0.8, 0.6]}""",
      """{"id": 3, "cat": "b", "v": [0.0, 1.0]}""",
      """{"id": 4, "cat": "a", "v": [-1.0, 0.0]}""")
    val top = agg(vecs, """[
      {"$vectorSearch": {"path": "v", "queryVector": [1.0, 0.0], "limit": 2}},
      {"$project": {"id": 1, "search_score": 1}}]""")
    assert(top.map(_("id")) == Seq(1L, 2L))
    assert(top.head("search_score") == 1.0)
    assert(math.abs(top(1)("search_score").asInstanceOf[Double] - 0.8) < 1e-6)
    // pre-filter excludes the would-be winner; custom score field name
    val filtered = agg(vecs, """[
      {"$vectorSearch": {"path": "v", "queryVector": [0.0, 1.0], "limit": 1,
        "filter": {"cat": "a"}, "scoreField": "sim"}},
      {"$project": {"id": 1, "sim": 1}}]""")
    assert(filtered.map(_("id")) == Seq(2L))
    assert(math.abs(filtered.head("sim").asInstanceOf[Double] - 0.6) < 1e-6)
  }

  test("$merge mode matrix: merge keeps existing fields, discard/fail honor contracts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-modes").toString
    val tgt = s"$dir/t.parquet"
    fromJsonl(
      """{"id": 1, "a": "keep_a", "b": "old_b"}""",
      """{"id": 2, "a": "only_existing", "b": "b2"}""")
      .write.parquet(tgt)
    // whenMatched=merge (the Mongo default): incoming null cannot erase, a
    // present incoming field wins, existing-only fields survive
    val up = fromJsonl(
      """{"id": 1, "b": "new_b", "c": "new_c"}""",
      """{"id": 3, "b": "b3", "c": "c3"}""")
    Aggo.aggregate(up, s"""[{"$$merge": {"into": "$tgt", "on": "id"}}]""").count()
    val rows = spark.read.parquet(tgt).collect()
      .map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[String]("a")), r.getAs[String]("b"), Option(r.getAs[String]("c"))))).toMap
    assert(rows(1L) == ((Some("keep_a"), "new_b", Some("new_c"))), s"got ${rows(1L)}")
    assert(rows(2L) == ((Some("only_existing"), "b2", None)))
    assert(rows(3L) == ((None, "b3", Some("c3"))))
    // whenNotMatched=discard drops novel keys
    val up2 = fromJsonl("""{"id": 1, "b": "b1x", "c": "c1x"}""", """{"id": 7, "b": "b7", "c": "c7"}""")
    Aggo.aggregate(up2,
      s"""[{"$$merge": {"into": "$tgt", "on": "id", "whenNotMatched": "discard"}}]""").count()
    val ids = spark.read.parquet(tgt).collect().map(_.getAs[Long]("id")).toSet
    assert(ids == Set(1L, 2L, 3L), s"discard inserted a novel key: $ids")
    // whenMatched=fail rejects collisions; whenNotMatched=fail rejects strays
    intercept[graft.model.ValidationError] {
      Aggo.aggregate(fromJsonl("""{"id": 1, "b": "boom"}"""),
        s"""[{"$$merge": {"into": "$tgt", "on": "id", "whenMatched": "fail"}}]""").count()
    }
    intercept[graft.model.ValidationError] {
      Aggo.aggregate(fromJsonl("""{"id": 42, "b": "stray"}"""),
        s"""[{"$$merge": {"into": "$tgt", "on": "id", "whenNotMatched": "fail"}}]""").count()
    }
    // failed merges must not have mutated the target
    assert(spark.read.parquet(tgt).collect().map(_.getAs[Long]("id")).toSet == Set(1L, 2L, 3L))
    // duplicate incoming on-keys error (Mongo: unique-index requirement)
    // instead of fanning matched rows out or inserting duplicate keys
    intercept[graft.model.ValidationError] {
      Aggo.aggregate(fromJsonl("""{"id": 1, "b": "x"}""", """{"id": 1, "b": "y"}"""),
        s"""[{"$$merge": {"into": "$tgt", "on": "id"}}]""").count()
    }
    assert(spark.read.parquet(tgt).collect().map(_.getAs[Long]("id")).toSet == Set(1L, 2L, 3L))
  }

  test("$percentile method=approximate uses the bounded-memory sketch") {
    val rows = agg(orders,
      """[{"$group": {"_id": null,
            "ex": {"$percentile": {"input": "$total", "p": [0.5]}},
            "ap": {"$percentile": {"input": "$total", "p": [0.5], "method": "approximate"}}}}]""").head
    def arr(x: Any) = x.asInstanceOf[scala.collection.Seq[Double]]
    // totals 10..50: exact interpolated median 30; the sketch returns an
    // actual observed value, which for an odd count is the same 30
    assert(arr(rows("ex")) == Seq(30.0))
    assert(arr(rows("ap")) == Seq(30.0))
    intercept[graft.model.ValidationError] {
      agg(orders,
        """[{"$group": {"_id": null,
              "x": {"$percentile": {"input": "$total", "p": [0.5], "method": "discrete"}}}}]""")
    }
  }

  test("$documents replaces the input with a literal collection, first stage only") {
    val rows = agg(orders,
      """[{"$documents": [{"x": 3}, {"x": 1}, {"x": 2}]},
          {"$limit": 2}, {"$project": {"x": 1}}]""")
    // encounter order of the literal array survives into $limit
    assert(rows.map(_("x")) == Seq(3L, 1L))
    intercept[graft.model.ValidationError] {
      agg(orders, """[{"$match": {}}, {"$documents": [{"x": 1}]}]""")
    }
  }

  test("$rankFusion fuses ranked legs with weighted RRF") {
    // doc 4 (total 40) is 2nd by price and 2nd-cheapest; doc 5 (total 50)
    // tops price; doc 1 (total 10) tops cheap
    val rows = agg(orders,
      """[{"$rankFusion": {
            "input": {"pipelines": {
              "expensive": [{"$sort": {"total": -1, "id": 1}}, {"$limit": 2}],
              "cheap":     [{"$sort": {"total": 1, "id": 1}}, {"$limit": 2}]}},
            "scoreDetails": true}},
          {"$project": {"id": 1, "score": 1}}]""")
    def q(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val byId = rows.map(r => r("id") -> r("score")).toMap
    assert(byId.keySet == Set(5L, 4L, 1L, 2L))
    assert(byId(5L) == q(1.0 / 61) && byId(1L) == q(1.0 / 61))
    assert(byId(4L) == q(1.0 / 62) && byId(2L) == q(1.0 / 62))
    // fused order: score desc, then document tiebreak
    assert(rows.map(_("id")) == Seq(1L, 5L, 2L, 4L))

    // weights skew the fusion; a leg that reshapes the document is rejected
    val weighted = agg(orders,
      """[{"$rankFusion": {
            "input": {"pipelines": {
              "expensive": [{"$sort": {"total": -1, "id": 1}}, {"$limit": 2}],
              "cheap":     [{"$sort": {"total": 1, "id": 1}}, {"$limit": 2}]}},
            "combination": {"weights": {"expensive": 3}},
            "scoreDetails": true}},
          {"$limit": 1}, {"$project": {"id": 1}}]""")
    assert(weighted.head("id") == 5L)
    intercept[graft.model.ValidationError] {
      agg(orders,
        """[{"$rankFusion": {"input": {"pipelines": {
             "bad": [{"$project": {"id": 1}}]}}}}]""")
    }
  }

  test("$scoreFusion normalizes per leg and averages weighted scores") {
    // totals: 1→10, 2→20, 3→30, 4→40, 5→50
    // value leg (top 3 by total, minMax over {50,40,30} → {1.0, 0.5, 0.0})
    // cheap leg (top 3 by -total, minMax over {-10,-20,-30} → {1.0, 0.5, 0.0})
    val rows = agg(orders,
      """[{"$scoreFusion": {
            "input": {"pipelines": {
              "value": [{"$addFields": {"score": "$total"}},
                        {"$sort": {"score": -1, "id": 1}}, {"$limit": 3}],
              "cheap": [{"$addFields": {"score": {"$multiply": [-1.0, "$total"]}}},
                        {"$sort": {"score": -1, "id": 1}}, {"$limit": 3}]},
              "normalization": "minMaxScaler"},
            "scoreDetails": true}},
          {"$project": {"id": 1, "score": 1}}]""")
    val byId = rows.map(r => r("id") -> r("score")).toMap
    // doc 3 appears in both legs (norm 0.0 each) → avg 0.0; doc 5 only in
    // value (1.0); doc 1 only in cheap (1.0); doc 4: value 0.5; doc 2: 0.5
    assert(byId(5L) == 1.0 && byId(1L) == 1.0)
    assert(byId(4L) == 0.5 && byId(2L) == 0.5)
    assert(byId(3L) == 0.0)
    // sigmoid keeps magnitudes without leg-relative scaling
    val sig = agg(orders,
      """[{"$scoreFusion": {
            "input": {"pipelines": {
              "value": [{"$addFields": {"score": 0.0}}, {"$sort": {"id": 1}}, {"$limit": 1}]},
              "normalization": "sigmoid"},
            "scoreDetails": true}},
          {"$project": {"id": 1, "score": 1}}]""").head
    assert(sig("score") == 0.5) // sigmoid(0) = 0.5
    // a leg without a score column is rejected
    intercept[graft.model.ValidationError] {
      agg(orders,
        """[{"$scoreFusion": {"input": {"pipelines": {
             "bad": [{"$sort": {"id": 1}}, {"$limit": 2}]}}}}]""")
    }
  }

  test("standalone per-stage API (reference Aggo.$match/$group/... surface)") {
    assert(Aggo.matchStage(orders, """{"status": "new"}""").count() == 3)
    assert(Aggo.projectStage(orders, """{"id": 1}""").columns.toSeq == Seq("id"))
    assert(Aggo.groupStage(orders, """{"_id": "$status", "n": {"$sum": 1}}""").count() == 2)
    assert(Aggo.sortStage(orders, """{"id": -1}""").first().getAs[Long]("id") == 5L)
    assert(Aggo.unwindStage(orders, "$tags").count() == 4)
    assert(Aggo.limitStage(orders, 2).count() == 2)
    val (n, secs) = Aggo.benchmark(orders, """[{"$count": "n"}]""")
    assert(n == 1 && secs > 0)
    val c = Aggo.expression(orders, """{"$multiply": ["$total", 2]}""")
    assert(orders.select(c.as("x")).agg(org.apache.spark.sql.functions.sum("x")).first().getDouble(0) == 300.0)
  }

  test("$unwind on a nested path substitutes elements in place") {
    val nested = fromJsonl(
      """{"id": 1, "post": {"title": "t1", "comments": ["c1", "c2"]}}""",
      """{"id": 2, "post": {"title": "t2", "comments": []}}""")
    val rows = agg(nested,
      """[{"$unwind": "$post.comments"},
          {"$project": {"id": 1, "c": "$post.comments", "t": "$post.title"}}, {"$sort": {"id": 1, "c": 1}}]""")
    assert(rows.map(r => (r("id"), r("t"), r("c"))) == Seq((1L, "t1", "c1"), (1L, "t1", "c2")))
    val preserved = agg(nested,
      """[{"$unwind": {"path": "$post.comments", "preserveNullAndEmptyArrays": true}}, {"$count": "n"}]""").head
    assert(preserved("n") == 3L)
  }

  test("$fill locf and value gap-filling") {
    val series = fromJsonl(
      """{"k": "a", "t": 1, "v": 10.0}""",
      """{"k": "a", "t": 2, "v": null}""",
      """{"k": "a", "t": 3, "v": null}""",
      """{"k": "a", "t": 4, "v": 40.0}""",
      """{"k": "b", "t": 1, "v": null}""")
    val rows = agg(series,
      """[{"$fill": {"partitionBy": "$k", "sortBy": {"t": 1},
                     "output": {"v": {"method": "locf"}}}},
          {"$sort": {"k": 1, "t": 1}}, {"$project": {"k": 1, "t": 1, "v": 1}}]""")
    assert(rows.map(r => (r("k"), r("t"), r("v"))) ==
      Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 40.0), ("b", 1L, null)))
    val valued = agg(series,
      """[{"$fill": {"output": {"v": {"value": -1}}}}, {"$match": {"k": "b"}}]""").head
    assert(valued("v") == -1.0)
  }

  test("$densify emits missing steps per partition") {
    val sparse = fromJsonl(
      """{"k": "a", "t": 1, "v": 1.0}""",
      """{"k": "a", "t": 4, "v": 4.0}""",
      """{"k": "b", "t": 2, "v": 2.0}""",
      """{"k": "b", "t": 3, "v": 3.0}""")
    val rows = agg(sparse,
      """[{"$densify": {"field": "t", "partitionByFields": ["k"],
                        "range": {"step": 1, "bounds": "partition"}}},
          {"$sort": {"k": 1, "t": 1}}, {"$project": {"k": 1, "t": 1, "v": 1}}]""")
    assert(rows.map(r => (r("k"), r("t"), r("v"))) ==
      Seq(("a", 1L, 1.0), ("a", 2L, null), ("a", 3L, null), ("a", 4L, 4.0),
          ("b", 2L, 2.0), ("b", 3L, 3.0)))
    // off-grid documents are preserved (review regression: step 2 grid is
    // [1,3] but the t=4 doc must survive)
    val offGrid = agg(fromJsonl("""{"k": "a", "t": 1}""", """{"k": "a", "t": 4}"""),
      """[{"$densify": {"field": "t", "partitionByFields": ["k"],
                        "range": {"step": 2, "bounds": "partition"}}},
          {"$sort": {"t": 1}}, {"$project": {"t": 1}}]""")
    assert(offGrid.map(_("t")) == Seq(1L, 3L, 4L))
    // explicit [lo, hi) bounds: Mongo's upper bound is exclusive
    val bounded = agg(fromJsonl("""{"t": 2}"""),
      """[{"$densify": {"field": "t", "range": {"step": 1, "bounds": [0, 3]}}},
          {"$sort": {"t": 1}}, {"$project": {"t": 1}}]""")
    assert(bounded.map(_("t")) == Seq(0L, 1L, 2L))
    // time axis: unit generates timestamp steps
    val ts = fromJsonl(
      """{"k": "a", "t": "2020-01-01T00:00:00"}""",
      """{"k": "a", "t": "2020-01-01T03:00:00"}""")
      .selectExpr("k", "cast(t as timestamp) as t")
    val hours = agg(ts,
      """[{"$densify": {"field": "t", "partitionByFields": ["k"],
                        "range": {"step": 1, "unit": "hour", "bounds": "partition"}}},
          {"$sort": {"t": 1}},
          {"$project": {"h": {"$dateToString": {"format": "%H", "date": "$t"}}}}]""")
    assert(hours.map(_("h")) == Seq("00", "01", "02", "03"))
  }

  test("$fill method linear interpolates between surrounding values") {
    val docs = fromJsonl(
      """{"k": 1, "t": 0, "v": 10.0}""", """{"k": 1, "t": 1, "v": null}""",
      """{"k": 1, "t": 2, "v": null}""", """{"k": 1, "t": 3, "v": 40.0}""",
      """{"k": 1, "t": 4, "v": null}""")
    val rows = agg(docs,
      """[{"$fill": {"partitionBy": "$k", "sortBy": {"t": 1},
                     "output": {"v": {"method": "linear"}}}},
          {"$sort": {"t": 1}}, {"$project": {"t": 1, "v": 1}}]""")
    assert(rows.map(_("v")) == Seq(10.0, 20.0, 30.0, 40.0, null))
  }

  test("$setWindowFields $push preserves null elements") {
    val docs = fromJsonl(
      """{"k": 1, "o": 1, "v": 10}""",
      """{"k": 1, "o": 2, "v": null}""",
      """{"k": 1, "o": 3, "v": 30}""")
    val r = agg(docs,
      """[{"$setWindowFields": {"partitionBy": "$k", "sortBy": {"o": 1},
            "output": {"vs": {"$push": "$v", "window": {"documents": ["unbounded", "current"]}}}}},
          {"$match": {"o": 3}}, {"$project": {"vs": 1}}]""").head
    assert(r("vs").asInstanceOf[scala.collection.Seq[_]].toSeq == Seq(10L, null, 30L))
  }

  test("$graphLookup pins no RDDs after the pipeline returns") {
    val employees = fromJsonl(
      """{"name": "ceo", "boss": null}""",
      """{"name": "vp", "boss": "ceo"}""",
      """{"name": "ic", "boss": "vp"}""")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Aggo.aggregate(employees,
      """[{"$graphLookup": {"from": "employees", "startWith": "$boss",
            "connectFromField": "boss", "connectToField": "name", "as": "chain"}}]""",
      Map("employees" -> employees)).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, "$graphLookup leaked persisted RDDs")
  }

  test("$graphLookup walks a hierarchy breadth-first with depth") {
    val employees = fromJsonl(
      """{"name": "ceo", "boss": null}""",
      """{"name": "vp", "boss": "ceo"}""",
      """{"name": "mgr", "boss": "vp"}""",
      """{"name": "ic", "boss": "mgr"}""")
    val rows = agg(employees,
      """[{"$graphLookup": {"from": "employees", "startWith": "$boss",
            "connectFromField": "boss", "connectToField": "name",
            "as": "chain", "depthField": "d"}},
          {"$project": {"name": 1,
            "chain": {"$map": {"input": "$chain", "as": "c", "in": "$$c.name"}},
            "depths": {"$map": {"input": "$chain", "as": "c", "in": "$$c.d"}}}},
          {"$sort": {"name": 1}}]""",
      Map("employees" -> employees))
    val byName = rows.map(r => r("name") -> (
      r("chain").asInstanceOf[scala.collection.Seq[_]].toSeq,
      r("depths").asInstanceOf[scala.collection.Seq[_]].toSeq)).toMap
    assert(byName("ic") == (Seq("mgr", "vp", "ceo"), Seq(0L, 1L, 2L)))
    assert(byName("mgr") == (Seq("vp", "ceo"), Seq(0L, 1L)))
    assert(byName("ceo")._1.isEmpty)
  }

  test("$graphLookup restrictSearchWithMatch stops chains at restricted docs") {
    val employees = fromJsonl(
      """{"name": "ceo", "boss": null}""",
      """{"name": "vp", "boss": "ceo"}""",
      """{"name": "mgr", "boss": "vp"}""",
      """{"name": "ic", "boss": "mgr"}""")
    val rows = agg(employees,
      """[{"$graphLookup": {"from": "employees", "startWith": "$boss",
            "connectFromField": "boss", "connectToField": "name",
            "as": "chain", "restrictSearchWithMatch": {"name": {"$ne": "vp"}}}},
          {"$project": {"name": 1,
            "chain": {"$map": {"input": "$chain", "as": "c", "in": "$$c.name"}}}},
          {"$sort": {"name": 1}}]""",
      Map("employees" -> employees))
    val byName = rows.map(r => r("name") ->
      r("chain").asInstanceOf[scala.collection.Seq[_]].toSeq).toMap
    // vp can't be visited: ic's walk stops after mgr, mgr's finds nothing;
    // vp's OWN row still walks (restriction filters the foreign side only)
    assert(byName("ic") == Seq("mgr"))
    assert(byName("mgr") == Seq())
    assert(byName("vp") == Seq("ceo"))
    assert(byName("ceo") == Seq())
  }

  test("$graphLookup traverses each element of array-valued keys (multi-parent DAG)") {
    val nodes = fromJsonl(
      """{"name": "a", "parents": []}""",
      """{"name": "b", "parents": ["a"]}""",
      """{"name": "c", "parents": ["a"]}""",
      """{"name": "d", "parents": ["b", "c"]}""")
    val rows = agg(nodes,
      """[{"$graphLookup": {"from": "nodes", "startWith": "$parents",
            "connectFromField": "parents", "connectToField": "name",
            "as": "anc", "depthField": "d"}},
          {"$match": {"name": "d"}},
          {"$project": {"anc": {"$map": {"input": "$anc", "as": "c",
            "in": {"n": "$$c.name", "d": "$$c.d"}}}}}]""",
      Map("nodes" -> nodes))
    val anc = rows.head("anc").asInstanceOf[scala.collection.Seq[_]]
      .map { case r: org.apache.spark.sql.Row => r.getAs[String]("n") -> r.getAs[Long]("d") }
      .sortBy(_._1)
    // both parents at depth 0; the shared grandparent appears ONCE, at its
    // minimum depth, even though it is reachable through b AND c
    assert(anc == Seq("a" -> 1L, "b" -> 0L, "c" -> 0L))
  }

  test("$graphLookup survives deep recursion without plan blowup") {
    // Regression: the BFS loop's `visited` unions every frontier and each
    // frontier anti-joins `visited`; before per-level spill lineage
    // truncation the logical plan DOUBLED per level and an 11-deep walk
    // (binary-heap parent tree over 2k keys — the q_graph_lookup shape)
    // OOM'd the driver in the analyzer. persist() caches rows, not plans.
    import spark.implicits._
    val n = 2000
    val tree = (0 until n)
      .map(k => (k.toLong, if (k == 0) -1L else ((k - 1) / 2).toLong))
      .toDF("k", "parent")
    val out = Aggo.aggregate(tree,
      """[{"$graphLookup": {"from": "tree", "startWith": "$parent",
            "connectFromField": "parent", "connectToField": "k",
            "as": "anc", "depthField": "d"}},
          {"$unwind": "$anc"},
          {"$project": {"k": 1, "anc_k": "$anc.k", "d": "$anc.d"}}]""",
      Map("tree" -> tree))
    // ancestor-chain length of k in a binary heap = floor(log2(k+1))
    def depth(k: Int): Int = if (k == 0) 0 else 1 + depth((k - 1) / 2)
    val expected = (0 until n).map(depth).map(_.toLong).sum
    assert(out.count() == expected)
    assert(out.agg(org.apache.spark.sql.functions.max("d")).head.getLong(0)
      == depth(n - 1) - 1) // deepest node's furthest ancestor sits at depth chainLen-1
  }

  test("$graphLookup walks a 65-level chain (visited consolidated, per-level plan flat)") {
    // Regression for the visited-set union chain: one consolidated visited
    // frame is re-spilled per level, so the depth-d anti-join reads ONE
    // scan leaf instead of d — analyzer cost linear in depth. 65 levels is
    // past the old maxDepth=48 comfort zone; a linear parent chain makes
    // every level a single-row frontier.
    import spark.implicits._
    val n = 66 // chain 0 <- 1 <- ... <- 65; node 65's walk visits 65 ancestors
    val chain = (0 until n)
      .map(k => (k.toLong, if (k == 0) -1L else (k - 1).toLong))
      .toDF("k", "parent")
    val out = Aggo.aggregate(chain.filter(s"k = ${n - 1}"),
      s"""[{"$$graphLookup": {"from": "chain", "startWith": "$$parent",
            "connectFromField": "parent", "connectToField": "k",
            "as": "anc", "depthField": "d", "maxDepth": 80}},
          {"$$unwind": "$$anc"},
          {"$$project": {"k": 1, "anc_k": "$$anc.k", "d": "$$anc.d"}}]""",
      Map("chain" -> chain))
    val rows = out.collect()
    assert(rows.length == n - 1) // all 65 ancestors of node 65
    assert(rows.map(_.getAs[Long]("d")).max == (n - 2).toLong) // deepest at d=64
    assert(rows.map(_.getAs[Long]("anc_k")).sorted.toSeq == (0L until (n - 1).toLong))
  }

  test("$graphLookup with startWith null returns empty arrays (void key regression)") {
    // "startWith": null translates to lit(null) — a void-typed __key that
    // Parquet refuses to spill even for the empty post-filter frame; the
    // key is cast to the connectTo type (or the BFS short-circuits).
    val employees = fromJsonl(
      """{"name": "ceo", "boss": null}""",
      """{"name": "vp", "boss": "ceo"}""")
    val rows = agg(employees,
      """[{"$graphLookup": {"from": "employees", "startWith": null,
            "connectFromField": "boss", "connectToField": "name", "as": "chain"}},
          {"$project": {"name": 1, "n": {"$size": "$chain"}}}, {"$sort": {"name": 1}}]""",
      Map("employees" -> employees))
    assert(rows.map(r => r("name") -> r("n")) == Seq("ceo" -> 0, "vp" -> 0))
  }

  test("$text search over text field") {
    val docs = fromJsonl(
      """{"id": 1, "text": "Spark makes Big Data simple"}""",
      """{"id": 2, "text": "ducks like data"}""")
    val hits = agg(docs, """[{"$match": {"$text": {"$search": "DATA spark"}}}, {"$project": {"id": 1}}]""")
    assert(hits.map(_("id")) == Seq(1L))
  }

  test("eventsTsUs normalizes long-nanos and timestamp-micros ts encodings to epoch µs") {
    import spark.implicits._
    // LongType = TIMESTAMP(NANOS) parquet read under nanosAsLong
    val nanos = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    assert(nanos.select(SparkEntry.eventsTsUs(nanos)).head.getLong(0)
      == 1700000000123456L)
    // LocalDateTime = TIMESTAMP_NTZ; under the UTC session timezone the
    // wall clock IS the epoch instant (2023-11-14T22:13:20 = 1.7e9 s)
    val micros = Seq((1L, java.time.LocalDateTime.of(2023, 11, 14, 22, 13, 20)))
      .toDF("event_id", "ts")
    assert(micros.select(SparkEntry.eventsTsUs(micros)).head.getLong(0)
      == 1700000000000000L)
  }
}
