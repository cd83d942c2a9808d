package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import TestSpark._

case class Doc(id: Long, a: Long, b: Double, s: String)

/** Differential property testing: random `$match` queries are executed by
  * the engine AND by an independent in-JVM predicate interpreter over the
  * same documents; results must agree. This replaces the reference's
  * engine-parity suites (IVM vs hot path, SURVEY §5) — here the "second
  * engine" is a 40-line direct interpreter that shares no code with the
  * translator. */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val docs: Seq[Doc] = {
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      Doc(i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000) / 10.0,
        Seq("red", "green", "blue", "teal")(rnd.nextInt(4)) + rnd.nextInt(3))
    }
  }
  private lazy val df = {
    import spark.implicits._
    docs.toDF().cache()
  }

  // --- tiny independent interpreter ---------------------------------------
  sealed trait Q { def eval(d: Doc): Boolean; def json: String }
  case class CmpA(op: String, v: Long) extends Q {
    def eval(d: Doc) = op match {
      case "$eq" => d.a == v; case "$ne" => d.a != v
      case "$gt" => d.a > v; case "$gte" => d.a >= v
      case "$lt" => d.a < v; case "$lte" => d.a <= v
    }
    def json = s"""{"a": {"$op": $v}}"""
  }
  case class CmpB(op: String, v: Double) extends Q {
    def eval(d: Doc) = op match {
      case "$gt" => d.b > v; case "$lte" => d.b <= v
    }
    def json = s"""{"b": {"$op": $v}}"""
  }
  case class InS(vs: Seq[String]) extends Q {
    def eval(d: Doc) = vs.contains(d.s)
    def json = s"""{"s": {"$$in": [${vs.map(v => s""""$v"""").mkString(",")}]}}"""
  }
  case class RegexS(prefix: String) extends Q {
    def eval(d: Doc) = d.s.startsWith(prefix)
    def json = s"""{"s": {"$$regex": "^$prefix"}}"""
  }
  case class And(qs: List[Q]) extends Q {
    def eval(d: Doc) = qs.forall(_.eval(d))
    def json = s"""{"$$and": [${qs.map(_.json).mkString(",")}]}"""
  }
  case class Or(qs: List[Q]) extends Q {
    def eval(d: Doc) = qs.exists(_.eval(d))
    def json = s"""{"$$or": [${qs.map(_.json).mkString(",")}]}"""
  }
  case class Nor(qs: List[Q]) extends Q {
    def eval(d: Doc) = !qs.exists(_.eval(d))
    def json = s"""{"$$nor": [${qs.map(_.json).mkString(",")}]}"""
  }

  private val genLeaf: Gen[Q] = Gen.oneOf(
    for { op <- Gen.oneOf("$eq", "$ne", "$gt", "$gte", "$lt", "$lte"); v <- Gen.choose(0L, 20L) }
      yield CmpA(op, v),
    for { op <- Gen.oneOf("$gt", "$lte"); v <- Gen.choose(0, 1000) } yield CmpB(op, v / 10.0),
    for { vs <- Gen.nonEmptyListOf(Gen.oneOf("red0", "red1", "green2", "blue1", "teal0", "nope")) }
      yield InS(vs.distinct),
    Gen.oneOf("red", "gr", "blu", "t", "x").map(RegexS))

  private def genQ(depth: Int): Gen[Q] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> Gen.listOfN(2, genQ(depth - 1)).map(l => And(l)),
      1 -> Gen.listOfN(2, genQ(depth - 1)).map(l => Or(l)),
      1 -> Gen.listOfN(2, genQ(depth - 1)).map(l => Nor(l)))

  test("random $match queries agree with an independent interpreter") {
    check(Prop.forAllNoShrink(genQ(2)) { q =>
      val expected = docs.filter(q.eval).map(_.id).toSet
      val got = Aggo.aggregate(df, s"""[{"$$match": ${q.json}}, {"$$project": {"id": 1}}]""")
        .collect().map(_.getLong(0)).toSet
      if (got != expected) {
        println(s"MISMATCH for ${q.json}: engine=${got.size} interp=${expected.size}")
      }
      got == expected
    }, 30)
  }

  test("random correlated $lookup pipelines agree with a naive per-row interpreter") {
    // The decorrelation logic (equi-keys + var-free prefilter + residual
    // array filter + array sort/limit) is the hairiest translator path;
    // fuzz it against per-row evaluation.
    case class Shape(op: String, sortAsc: Option[Boolean], limit: Option[Int])
    val genShape: Gen[Shape] = for {
      op <- Gen.oneOf("$lt", "$gte", "none")
      sortAsc <- Gen.option(Gen.oneOf(true, false))
      limit <- Gen.option(Gen.choose(1, 3))
    } yield Shape(op, sortAsc, limit)

    val locals = docs.take(8)
    val foreignDocs = docs.take(40)
    lazy val foreignDf = { import spark.implicits._; foreignDocs.toDF() }
    lazy val localDf = { import spark.implicits._; locals.toDF() }

    check(Prop.forAllNoShrink(genShape) { sh =>
      val varPred = sh.op match {
        case "none" => ""
        case op     => ", {\"" + op + "\": [\"$b\", \"$$t\"]}"
      }
      val sortStage = sh.sortAsc.map(a => s""", {"$$sort": {"b": ${if (a) 1 else -1}, "id": 1}}""").getOrElse("")
      val limitStage = sh.limit.map(n => s""", {"$$limit": $n}""").getOrElse("")
      val pipeline =
        s"""[{"$$lookup": {"from": "f", "let": {"k": "$$a", "t": "$$b"},
             "pipeline": [{"$$match": {"$$expr": {"$$and": [{"$$eq": ["$$$$k", "$$a"]}$varPred]}}}$sortStage$limitStage],
             "as": "m"}},
            {"$$project": {"id": 1, "ids": {"$$map": {"input": "$$m", "as": "x", "in": "$$$$x.id"}}}},
            {"$$sort": {"id": 1}}]"""
      val got = Aggo.aggregate(localDf, pipeline, Map("f" -> foreignDf))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val expected = locals.map { l =>
        var matches = foreignDocs.filter(_.a == l.a)
        matches = sh.op match {
          case "$lt"  => matches.filter(_.b < l.b)
          case "$gte" => matches.filter(_.b >= l.b)
          case _      => matches
        }
        val sorted = sh.sortAsc match {
          case Some(true)  => matches.sortBy(m => (m.b, m.id))
          case Some(false) => matches.sortBy(m => (-m.b, m.id))
          case None        => matches.sortBy(_.id) // engine collects in _fseq (input) order
        }
        val limited = sh.limit.map(sorted.take).getOrElse(sorted)
        l.id -> limited.map(_.id).toList
      }.toMap
      // without an explicit sort, compare as sets (collect order is input order
      // but the interpreter can't see partitioning) — with sort, exact lists
      val ok =
        if (sh.sortAsc.isDefined) got == expected
        else got.keySet == expected.keySet && got.forall { case (k, v) =>
          sh.limit match {
            case Some(_) => v.toSet.subsetOf(expected(k).toSet) || v.toSet == expected(k).toSet // limit without sort: any n of the matches
            case None    => v.toSet == expected(k).toSet
          }
        }
      if (!ok) println(s"MISMATCH shape=$sh\n got=$got\n exp=$expected")
      ok
    }, 25)
  }

  test("random chained $unwind + $push agrees with a per-document interpreter") {
    // The lexicographic (outer, inner) element order across chained unwinds
    // rides the _seq2 position-array mechanism; fuzz random array shapes
    // (empty arrays included) at chain depths 2 and 3 against a direct
    // cross-product interpreter.
    case class Shape(depth: Int, seed: Long)
    val genShape: Gen[Shape] = for {
      depth <- Gen.oneOf(2, 3)
      seed  <- Gen.choose(0L, 10000L)
    } yield Shape(depth, seed)

    check(Prop.forAllNoShrink(genShape) { sh =>
      val rnd = new scala.util.Random(sh.seed)
      def arr(): Seq[Int] = Seq.fill(rnd.nextInt(4))(rnd.nextInt(50))
      val rows = (0 until 12).map { i =>
        val as = arr(); val bs = arr(); val cs = if (sh.depth == 3) arr() else Seq(0)
        (i, as, bs, cs)
      }
      val lines = rows.map { case (i, as, bs, cs) =>
        val base = s""""id": $i, "xs": [${as.mkString(",")}], "ys": [${bs.mkString(",")}]"""
        if (sh.depth == 3) s"""{$base, "zs": [${cs.mkString(",")}]}""" else s"""{$base}"""
      }
      val third = if (sh.depth == 3) """{"$unwind": "$zs"},""" else ""
      val zTerm = if (sh.depth == 3) """, "$zs"""" else ""
      val pipeline =
        s"""[{"$$unwind": "$$xs"}, {"$$unwind": "$$ys"}, $third
            {"$$group": {"_id": "$$id", "vals": {"$$push": {"$$add": [
              {"$$multiply": ["$$xs", 10000]}, {"$$multiply": ["$$ys", 100]}$zTerm]}}}},
            {"$$sort": {"_id": 1}}]"""
      val got = Aggo.aggregate(fromJsonl(lines: _*).repartition(3), pipeline)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val expected = rows.flatMap { case (i, as, bs, cs) =>
        val vals = for (a <- as; b <- bs; c <- cs)
          yield a.toLong * 10000 + b * 100 + (if (sh.depth == 3) c else 0)
        if (vals.isEmpty) None else Some(i.toLong -> vals.toList)
      }.toMap
      val ok = got == expected
      if (!ok) println(s"MISMATCH depth=${sh.depth} seed=${sh.seed}\n got=$got\n exp=$expected")
      ok
    }, 15)
  }

  test("random numeric expressions agree with an independent evaluator") {
    sealed trait E { def eval(d: Doc): Double; def json: String }
    case class FA() extends E { def eval(d: Doc) = d.a.toDouble; def json = "\"$a\"" }
    case class FB() extends E { def eval(d: Doc) = d.b; def json = "\"$b\"" }
    case class Lit(v: Int) extends E { def eval(d: Doc) = v.toDouble; def json = v.toString }
    case class Bin(op: String, l: E, r: E) extends E {
      def eval(d: Doc) = op match {
        case "$add" => l.eval(d) + r.eval(d)
        case "$subtract" => l.eval(d) - r.eval(d)
        case "$multiply" => l.eval(d) * r.eval(d)
      }
      def json = s"""{"$op": [${l.json}, ${r.json}]}"""
    }
    def genE(depth: Int): Gen[E] =
      if (depth <= 0) Gen.oneOf(Gen.const(FA()), Gen.const(FB()), Gen.choose(-5, 5).map(Lit))
      else Gen.frequency(
        2 -> Gen.oneOf(Gen.const(FA()), Gen.const(FB()), Gen.choose(-5, 5).map(Lit)),
        3 -> (for { op <- Gen.oneOf("$add", "$subtract", "$multiply")
                    l <- genE(depth - 1); r <- genE(depth - 1) } yield Bin(op, l, r)))

    check(Prop.forAllNoShrink(genE(3)) { e =>
      val got = Aggo.aggregate(df,
        s"""[{"$$project": {"id": 1, "v": {"$$toDouble": ${e.json}}}}, {"$$sort": {"id": 1}}]""")
        .collect().map(_.getDouble(1)).toSeq
      val expected = docs.sortBy(_.id).map(e.eval)
      // identical IEEE ops in identical order → exact equality
      got == expected
    }, 20)
  }

  test("random string/conditional expressions agree with an independent evaluator") {
    sealed trait SE { def eval(d: Doc): String; def json: String }
    case class FS() extends SE { def eval(d: Doc) = d.s; def json = "\"$s\"" }
    case class SLit(v: String) extends SE { def eval(d: Doc) = v; def json = s""""$v"""" }
    case class Upper(e: SE) extends SE {
      def eval(d: Doc) = e.eval(d).toUpperCase
      def json = s"""{"$$toUpper": ${e.json}}"""
    }
    case class Lower(e: SE) extends SE {
      def eval(d: Doc) = e.eval(d).toLowerCase
      def json = s"""{"$$toLower": ${e.json}}"""
    }
    case class ConcatE(l: SE, r: SE) extends SE {
      def eval(d: Doc) = l.eval(d) + r.eval(d)
      def json = s"""{"$$concat": [${l.json}, ${r.json}]}"""
    }
    case class SubstrE(e: SE, start: Int, len: Int) extends SE {
      def eval(d: Doc) = { val s = e.eval(d)
        if (start >= s.length) "" else s.substring(start, math.min(start + len, s.length)) }
      def json = s"""{"$$substr": [${e.json}, $start, $len]}"""
    }
    case class CondE(thr: Long, t: SE, f: SE) extends SE {
      def eval(d: Doc) = if (d.a > thr) t.eval(d) else f.eval(d)
      def json = s"""{"$$cond": [{"$$gt": ["$$a", $thr]}, ${t.json}, ${f.json}]}"""
    }
    val leaf: Gen[SE] = Gen.oneOf(
      Gen.const(FS()), Gen.alphaLowerStr.map(s => SLit(s.take(4))))
    def genS(depth: Int): Gen[SE] =
      if (depth <= 0) leaf
      else Gen.frequency(
        2 -> leaf,
        1 -> genS(depth - 1).map(Upper),
        1 -> genS(depth - 1).map(Lower),
        2 -> (for { l <- genS(depth - 1); r <- genS(depth - 1) } yield ConcatE(l, r)),
        1 -> (for { e <- genS(depth - 1); st <- Gen.choose(0, 5); ln <- Gen.choose(0, 6) }
               yield SubstrE(e, st, ln)),
        2 -> (for { thr <- Gen.choose(-10L, 10L); t <- genS(depth - 1); f <- genS(depth - 1) }
               yield CondE(thr, t, f)))

    check(Prop.forAllNoShrink(genS(3)) { e =>
      val got = Aggo.aggregate(df,
        s"""[{"$$project": {"id": 1, "v": ${e.json}}}, {"$$sort": {"id": 1}}]""")
        .collect().map(_.getString(1)).toSeq
      val expected = docs.sortBy(_.id).map(e.eval)
      got == expected
    }, 25)
  }

  test("as-of join agrees with a brute-force interpreter on random keys/ts incl. ties") {
    // Tiny key and timestamp domains force key collisions, equal-instant
    // matches, and right-side (key, ts) ties — exactly the cases where the
    // union+window rewrite could silently diverge from as-of semantics.
    // Tie-break contract (documented on Joins.asOf): among right rows at the
    // matched instant, backward takes the MAX payload struct, forward the
    // MIN (struct = non-key right columns in column order).
    val genCase = for {
      seed <- Gen.choose(0L, 100000L)
      dir <- Gen.oneOf("backward", "forward")
      nLeft <- Gen.choose(0, 50)
      nRight <- Gen.choose(0, 30)
    } yield (seed, dir, nLeft, nRight)
    check(Prop.forAllNoShrink(genCase) { case (seed, dir, nl, nr) =>
      val rnd = new scala.util.Random(seed)
      // row 0 always has a real ts: an all-null column would JSON-infer as
      // string and fail the union on types (a fixture artifact, not as-of)
      val left = (0 until nl).map { i =>
        val ts = if (i > 0 && rnd.nextInt(10) == 0) None else Some(rnd.nextInt(20).toLong)
        (i.toLong, s"k${rnd.nextInt(4)}", ts)
      }
      val right = (0 until nr).map { j =>
        val ts = if (j > 0 && rnd.nextInt(10) == 0) None else Some(rnd.nextInt(20).toLong)
        (s"k${rnd.nextInt(4)}", ts, j.toLong)
      }
      val leftDf = fromJsonl(left.map { case (id, k, ts) =>
        s"""{"lid": $id, "k": "$k", "lts": ${ts.map(_.toString).getOrElse("null")}}""" }: _*)
      val rightDf = fromJsonl(right.map { case (k, ts, v) =>
        s"""{"k": "$k", "rts": ${ts.map(_.toString).getOrElse("null")}, "rv": $v}""" }: _*)
      if (nl == 0) true // empty left: nothing to check (fromJsonl needs rows)
      else {
        val rDf = if (nr == 0)
          fromJsonl("""{"k": "x", "rts": 0, "rv": 0}""")
            .filter(org.apache.spark.sql.functions.col("rv") < 0L)
        else rightDf
        val got = graft.ext.Joins.asOf(leftDf, rDf, Seq("k"), "lts", "rts", dir)
          .collect().map { r =>
            (r.getAs[Long]("lid"),
              Option(r.getAs[Any]("rts")).map(_.asInstanceOf[Long]),
              Option(r.getAs[Any]("rv")).map(_.asInstanceOf[Long]))
          }.toSet
        val expected = left.map { case (id, k, lts) =>
          val m: Option[(Long, Long)] = lts.flatMap { t =>
            val cands: Seq[(Long, Long)] = right.collect {
              case (rk, Some(rts), rv) if rk == k &&
                (if (dir == "backward") rts <= t else rts >= t) => (rts, rv)
            }
            if (cands.isEmpty) None
            else if (dir == "backward") Some(cands.max)        // max ts, then max payload
            else {
              val best = cands.map(_._1).min                   // nearest forward instant
              Some(cands.filter(_._1 == best).min)             // then min payload
            }
          }
          (id, m.map(_._1), m.map(_._2))
        }.toSet
        got == expected
      }
    }, 30)
  }

  test("tokenBudgetMix agrees with an md5-replaying interpreter on random strata") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val genCase = for {
      seed <- Gen.choose(0L, 100000L)
      n <- Gen.choose(1, 60)
    } yield (seed, n)
    check(Prop.forAllNoShrink(genCase) { case (seed, n) =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until n).map { i =>
        (i.toLong, s"s${rnd.nextInt(3)}", rnd.nextInt(30).toLong)
      }
      val budgets = Map("s0" -> rnd.nextInt(200).toLong, "s1" -> rnd.nextInt(40).toLong)
      // interpreter: per stratum, md5-of-row order (same separator-joined
      // key recipe as Sampling.rowKey), exclusive prefix < budget
      val sep = "\u0001"
      val expected = rows.groupBy(_._2).flatMap { case (stratum, rs) =>
        val b = budgets.getOrElse(stratum, 0L)
        val ordered = rs.sortBy(r => md5hex(r._1.toString + sep + r._2 + sep + r._3))
        var prefix = 0L
        ordered.flatMap { r =>
          val keep = prefix < b
          prefix += r._3
          if (keep) Some(r._1) else None
        }
      }.toSet
      val df = fromJsonl(rows.map(r =>
        s"""{"id": ${r._1}, "s": "${r._2}", "tok": ${r._3}}"""): _*)
      val got = graft.ext.Sampling.tokenBudgetMix(df, "s",
        org.apache.spark.sql.functions.col("tok"), budgets)
        .collect().map(_.getAs[Long]("id")).toSet
      got == expected
    }, 25)
  }

  test("scoreWeightedKeep agrees with an md5-replaying interpreter on random scores") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sep = "\u0001"
    check(Prop.forAllNoShrink(Gen.choose(0L, 100000L)) { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 50).map { i =>
        (i.toLong, rnd.nextInt(140) - 20)  // score*100 in [-20, 120): clamping exercised
      }
      val expected = rows.filter { case (id, s100) =>
        val frac = java.lang.Long.parseLong(
          md5hex(id.toString + sep + s100.toString).substring(0, 8), 16).toDouble / 4294967296.0
        val score = math.min(1.0, math.max(0.0, s100 / 100.0))
        frac < score
      }.map(_._1).toSet
      val df = fromJsonl(rows.map { case (id, s) =>
        s"""{"id": $id, "s100": $s}""" }: _*)
      val got = graft.ext.Sampling.scoreWeightedKeep(df,
        org.apache.spark.sql.functions.col("s100") / 100.0)
        .collect().map(_.getAs[Long]("id")).toSet
      got == expected
    }, 25)
  }

  test("removeDupSpans agrees with a brute-force interpreter on random corpora") {
    // A 5-word vocabulary forces heavy cross-document n-gram sharing —
    // overlapping spans, spans at document edges, whole-document coverage.
    val vocab = Vector("ash", "birch", "cedar", "dawn", "elm")
    val genCase = for {
      seed <- Gen.choose(0L, 100000L)
      nDocs <- Gen.choose(1, 10)
      n <- Gen.choose(2, 4)
    } yield (seed, nDocs, n)
    check(Prop.forAllNoShrink(genCase) { case (seed, nDocs, n) =>
      val rnd = new scala.util.Random(seed)
      val corpus = (0 until nDocs).map { i =>
        i.toLong -> Vector.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
      }
      // brute force: hot gram = join of n consecutive tokens seen in >= 2 docs
      val gramDocs = corpus.flatMap { case (id, toks) =>
        toks.sliding(n).filter(_.size == n).map(g => (g.mkString(" "), id))
      }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val expected = corpus.map { case (id, toks) =>
        val starts = toks.sliding(n).zipWithIndex
          .filter { case (g, _) => g.size == n && gramDocs(g.mkString(" ")) >= 2 }
          .map(_._2).toSet
        val covered = starts.flatMap(s => s until (s + n))
        val kept = toks.zipWithIndex.collect { case (t, p) if !covered(p) => t }
        (id, kept.mkString(" "), toks.size.toLong, (toks.size - kept.size).toLong)
      }.toSet
      val df = fromJsonl(corpus.map { case (id, toks) =>
        s"""{"doc_id": $id, "text": "${toks.mkString(" ")}"}""" }: _*)
      val got = graft.ext.Dedup.removeDupSpans(df, "doc_id", "text", n)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("cleaned_text"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"))).toSet
      got == expected
    }, 25)
  }
}
