package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import TestSpark._

/** Whole-pipeline differential fuzzing: random COMPOSITIONS of stages
  * ($match → $addFields → $sort → $skip/$limit → $group) are executed by the
  * engine and by a direct sequential interpreter that shares no code with the
  * translators. The per-stage fuzzers (PropertySpec) pin individual
  * translator paths; this one pins the glue — schema threading between
  * stages, encounter-order bookkeeping across filters and computed fields,
  * sort-then-cut semantics, and aggregation over a transformed frame.
  */
class PipelineFuzzSpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  // base collection: id unique; a small-cardinality long; b one-decimal
  // double; s low-cardinality string; v a computed field seeded from b
  private case class D(id: Long, a: Long, b: Double, s: String, v: Double)
  private val base: Seq[D] = {
    val rnd = new scala.util.Random(41)
    (0 until 150).map { i =>
      val b = rnd.nextInt(1000) / 10.0
      D(i.toLong, rnd.nextInt(12).toLong, b,
        Seq("ruby", "jade", "opal", "onyx")(rnd.nextInt(4)), b)
    }
  }
  private lazy val df = {
    import spark.implicits._
    base.map(d => (d.id, d.a, d.b, d.s)).toDF("id", "a", "b", "s").cache()
  }

  // ---- numeric expression over the live document ---------------------------
  private sealed trait E { def eval(d: D): Double; def json: String }
  private case class FldA() extends E { def eval(d: D) = d.a.toDouble; def json = "\"$a\"" }
  private case class FldB() extends E { def eval(d: D) = d.b; def json = "\"$b\"" }
  private case class FldV() extends E { def eval(d: D) = d.v; def json = "\"$v\"" }
  private case class Lit(n: Int) extends E { def eval(d: D) = n.toDouble; def json = n.toString }
  private case class Bin(op: String, l: E, r: E) extends E {
    def eval(d: D) = op match {
      case "$add"      => l.eval(d) + r.eval(d)
      case "$subtract" => l.eval(d) - r.eval(d)
      case "$multiply" => l.eval(d) * r.eval(d)
    }
    def json = s"""{"$op": [${l.json}, ${r.json}]}"""
  }
  private def genE(depth: Int): Gen[E] = {
    val leaf = Gen.oneOf(Gen.const(FldA()), Gen.const(FldB()), Gen.const(FldV()),
      Gen.choose(-4, 4).map(Lit))
    if (depth <= 0) leaf
    else Gen.frequency(
      2 -> leaf,
      3 -> (for { op <- Gen.oneOf("$add", "$subtract", "$multiply")
                  l <- genE(depth - 1); r <- genE(depth - 1) } yield Bin(op, l, r)))
  }

  // ---- pipeline stages -----------------------------------------------------
  private sealed trait St { def apply(rows: Seq[D]): Seq[D]; def json: String }
  private case class MatchA(op: String, t: Long) extends St {
    def apply(rows: Seq[D]) = rows.filter(d => op match {
      case "$gte" => d.a >= t; case "$lt" => d.a < t; case "$ne" => d.a != t
    })
    def json = s"""{"$$match": {"a": {"$op": $t}}}"""
  }
  private case class MatchS(vs: Seq[String]) extends St {
    def apply(rows: Seq[D]) = rows.filter(d => vs.contains(d.s))
    def json = s"""{"$$match": {"s": {"$$in": [${vs.map(v => s""""$v"""").mkString(",")}]}}}"""
  }
  private case class MatchV(t: Int) extends St {
    def apply(rows: Seq[D]) = rows.filter(_.v > t)
    def json = s"""{"$$match": {"$$expr": {"$$gt": ["$$v", $t]}}}"""
  }
  private case class AddV(e: E) extends St {
    def apply(rows: Seq[D]) = rows.map(d => d.copy(v = e.eval(d)))
    def json = s"""{"$$addFields": {"v": ${e.json}}}"""
  }
  private case class SortSt(field: String, asc: Boolean) extends St {
    // -0.0 == 0.0 under the engine's comparison (Spark normalizes floating
    // zeros in sort keys; the reference's JS comparator likewise has
    // -0 neither < nor > 0) — but Scala's total Ordering[Double] puts -0.0
    // first, so collapse the sign before keying. Reachable: a fuzzed
    // $multiply like (v-4)*(b-b) yields -0.0 exactly when v < 4.
    private def z(x: Double): Double = if (x == 0.0) 0.0 else x
    def apply(rows: Seq[D]) = {
      val keyed = rows.sortBy(_.id)
      val dirr = if (asc) 1 else -1
      field match {
        case "a" => keyed.sortBy(d => (d.a * dirr, d.id))
        case "b" => keyed.sortBy(d => (z(d.b * dirr), d.id))
        case "v" => keyed.sortBy(d => (z(d.v * dirr), d.id))
        case "s" => if (asc) keyed.sortBy(d => (d.s, d.id))
                    else keyed.sortBy(d => (d.s, d.id))(Ordering.Tuple2(Ordering.String.reverse, Ordering.Long))
      }
    }
    def json = s"""{"$$sort": {"$field": ${if (asc) 1 else -1}, "id": 1}}"""
  }
  private case class SkipSt(n: Int) extends St {
    def apply(rows: Seq[D]) = rows.drop(n)
    def json = s"""{"$$skip": $n}"""
  }
  private case class LimitSt(n: Int) extends St {
    def apply(rows: Seq[D]) = rows.take(n)
    def json = s"""{"$$limit": $n}"""
  }

  private case class GroupSt(idField: String, op: String, src: String) {
    def json = {
      val idExpr = if (idField == "null") "null" else s""""$$$idField""""
      s"""{"$$group": {"_id": $idExpr, "x": {"$op": "$$$src"}, "n": {"$$sum": 1}}}"""
    }
    def key(d: D): Any = idField match {
      case "null" => null; case "a" => d.a; case "s" => d.s
    }
    def get(d: D): Double = if (src == "b") d.b else d.v
    def apply(rows: Seq[D]): Map[Any, (Double, Long)] =
      rows.groupBy(key).map { case (k, g) =>
        val vs = g.map(get)
        val x = op match {
          case "$sum" => vs.sum
          case "$avg" => vs.sum / vs.size
          case "$min" => vs.min
          case "$max" => vs.max
        }
        k -> (x, g.size.toLong)
      }
    /** Encounter-ordered $push of id — order within each group must follow
      * the current row order exactly (exercises the sort-order-key encoding,
      * including the desc-string two-pass restamp). */
    def pushJson = {
      val idExpr = if (idField == "null") "null" else s""""$$$idField""""
      s"""{"$$group": {"_id": $idExpr, "ids": {"$$push": "$$id"}}}"""
    }
    def applyPush(rows: Seq[D]): Map[Any, List[Long]] =
      rows.groupBy(key).map { case (k, g) => k -> g.map(_.id).toList }
  }

  private case class Shape(stages: List[St], group: Option[GroupSt])

  private val genShape: Gen[Shape] = for {
    m1 <- Gen.option(Gen.oneOf(
      for { op <- Gen.oneOf("$gte", "$lt", "$ne"); t <- Gen.choose(0L, 12L) } yield MatchA(op, t),
      Gen.someOf(Seq("ruby", "jade", "opal", "onyx", "none")).map(vs => MatchS(vs.toSeq))
        .suchThat(_.vs.nonEmpty)))
    av <- Gen.option(genE(2).map(AddV))
    m2 <- Gen.option(Gen.choose(-50, 150).map(MatchV))
    srt <- Gen.option(for { f <- Gen.oneOf("a", "b", "v", "s"); asc <- Gen.oneOf(true, false) }
      yield SortSt(f, asc))
    cut <- if (srt.isEmpty) Gen.const(List.empty[St])
           else for {
             sk <- Gen.option(Gen.choose(0, 20).map(SkipSt))
             lm <- Gen.option(Gen.choose(1, 30).map(LimitSt))
           } yield List(sk, lm).flatten
    grp <- Gen.option(for {
      idF <- Gen.oneOf("null", "a", "s")
      op <- Gen.oneOf("$sum", "$avg", "$min", "$max")
      src <- Gen.oneOf("b", "v")
    } yield GroupSt(idF, op, src))
  } yield Shape(List(m1, av, m2, srt).flatten ++ cut, grp)

  private def approx(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))

  test("random stage compositions agree with a sequential interpreter") {
    check(Prop.forAllNoShrink(genShape) { sh =>
      val mid = sh.stages.foldLeft(base)((rows, st) => st.apply(rows))
      val prefix = (List("""{"$addFields": {"v": "$b"}}""") ++ sh.stages.map(_.json)).mkString(",")
      val ok = sh.group match {
        case None =>
          val pipeline = s"""[$prefix, {"$$sort": {"id": 1}}, {"$$project": {"id": 1, "v": 1}}]"""
          // all-integer expression trees legitimately come back as LongType
          val got = Aggo.aggregate(df, pipeline).collect()
            .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].doubleValue())).toSeq
          val expected = mid.sortBy(_.id).map(d => (d.id, d.v))
          got.size == expected.size &&
            got.zip(expected).forall { case ((gi, gv), (ei, ev)) => gi == ei && approx(gv, ev) }
        case Some(g) if mid.isEmpty =>
          val pipeline = s"""[$prefix, ${g.json}]"""
          Aggo.aggregate(df, pipeline).collect().isEmpty
        case Some(g) =>
          val pipeline = s"""[$prefix, ${g.json}]"""
          val got = Aggo.aggregate(df, pipeline).collect()
            .map(r => (r.get(0), (r.get(1).asInstanceOf[Number].doubleValue(), r.getLong(2)))).toMap
          val expected = g.apply(mid)
          got.keySet == expected.keySet && expected.forall { case (k, (x, n)) =>
            val (gx, gn) = got(k); gn == n && approx(gx, x)
          }
      }
      if (!ok) println(s"MISMATCH shape=$sh")
      ok
    }, 30)
  }

  test("random sort + encounter-ordered $push agree with the interpreter") {
    // $push must follow the post-$sort row order exactly — this fuzzes the
    // order-key encoding across asc/desc numeric AND string sort keys
    // (desc strings ride the two-pass global-rank restamp).
    val genShape: Gen[(St, SortSt, GroupSt)] = for {
      op <- Gen.oneOf("$gte", "$lt")
      t <- Gen.choose(0L, 12L)
      f <- Gen.oneOf("a", "b", "s")
      asc <- Gen.oneOf(true, false)
      idF <- Gen.oneOf("null", "a", "s")
    } yield (MatchA(op, t), SortSt(f, asc), GroupSt(idF, "$sum", "b"))
    check(Prop.forAllNoShrink(genShape) { case (m, srt, g) =>
      val mid = srt.apply(m.apply(base))
      val pipeline = s"""[${m.json}, ${srt.json}, ${g.pushJson}]"""
      val got = Aggo.aggregate(df.repartition(5), pipeline).collect()
        .map(r => r.get(0) -> r.getSeq[Long](1).toList).toMap
      val expected = g.applyPush(mid)
      val ok = got == expected
      if (!ok) println(s"MISMATCH match=$m sort=$srt group=$g\n got=$got\n exp=$expected")
      ok
    }, 25)
  }
}
