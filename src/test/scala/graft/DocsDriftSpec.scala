package graft

import org.scalatest.funsuite.AnyFunSuite

import TestSpark._

/** Docs ↔ code drift check. README.md / COVERAGE.md counts and tables were
  * hand-maintained, which means they rot silently; this spec diffs them
  * against the exported registries so a stage or oracle gate that is added,
  * renamed, or removed without a doc update fails CI by name instead of
  * waiting for a reviewer to notice.
  */
class DocsDriftSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)
  private lazy val coverage = read("COVERAGE.md")
  private lazy val readme = read("README.md")

  test("stage registry matches the real dispatch (probed, fail-closed)") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")
    // a name the registry claims but apply doesn't handle would throw the
    // unknown-stage error; any OTHER validation error ("requires...") just
    // means the minimal body was insufficient, which is fine — the dispatch
    // arm exists. $documents ignores its input frame, so the generic body
    // works everywhere.
    graft.stages.StageTranslator.supportedStages.foreach { name =>
      val err = try { Aggo.aggregate(df, s"""[{"$name": {}}]""").collect(); None }
        catch { case e: Throwable => Some(e.getMessage + Option(e.getCause).map(_.getMessage).mkString) }
      assert(!err.exists(_.contains("unknown pipeline stage")),
        s"registry lists $name but dispatch does not handle it: $err")
    }
    // control: the probe must be able to SEE the unknown-stage error
    val ctl = intercept[Throwable] {
      Aggo.aggregate(df, """[{"$__nope": {}}]""").collect()
    }
    assert((ctl.getMessage + Option(ctl.getCause).map(_.getMessage).mkString)
      .contains("unknown pipeline stage"))
  }

  test("every supported stage is documented in COVERAGE.md") {
    val missing = graft.stages.StageTranslator.supportedStages
      .filterNot(s => coverage.contains(s"`$s`") || coverage.contains(s + "`") ||
        coverage.contains(s + " ") || coverage.contains(s + ","))
    assert(missing.isEmpty, s"stages with no COVERAGE.md mention: ${missing.mkString(", ")}")
  }

  test("every oracle-gate name mentioned in the docs exists, and every gate is documented") {
    val gateNames = SparkEntry.queries.keySet
    val docTokens = ("""q_[a-z0-9_]+""".r.findAllIn(coverage) ++
      """q_[a-z0-9_]+""".r.findAllIn(readme)).toSet
    // docs may name a FAMILY with a trailing-underscore wildcard (q_match_*
    // scans as "q_match_"): valid iff at least one gate carries the prefix
    def familyPrefix(t: String): Boolean = t.endsWith("_")
    // no stale references: a doc token naming a gate (or family) that no
    // longer exists
    val stale = docTokens.filter {
      case t if familyPrefix(t) => !gateNames.exists(_.startsWith(t))
      case t                    => !gateNames.contains(t)
    }
    assert(stale.isEmpty, s"docs reference nonexistent gates: ${stale.toSeq.sorted.mkString(", ")}")
    // no undocumented gates: every queries entry appears in the docs, either
    // by exact name or under a documented family wildcard
    val undocumented = gateNames.filterNot(g =>
      docTokens.contains(g) ||
        docTokens.exists(t => familyPrefix(t) && g.startsWith(t)))
    assert(undocumented.isEmpty,
      s"gates with no doc mention: ${undocumented.toSeq.sorted.mkString(", ")}")
  }

  test("ADVICE.md entries point at code and specs that still exist") {
    // an open-or-resolved advice entry naming a source file that has moved,
    // or citing a regression spec that was renamed away, misleads the next
    // round's reader — fail by name instead. Paths are any src/... token;
    // spec citations look like `SomeSpec "test name fragment..."`.
    val advicePath = java.nio.file.Paths.get("ADVICE.md")
    if (java.nio.file.Files.exists(advicePath)) {
      val advice = read("ADVICE.md")
      val paths = """src/[A-Za-z0-9_/.\-]+\.scala""".r.findAllIn(advice).toSet
      val gone = paths.filterNot(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      assert(gone.isEmpty, s"ADVICE.md names files that do not exist: ${gone.mkString(", ")}")
      // control: the path regex must actually be able to fail
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get("src/__nope.scala")))
      val specCites = """([A-Za-z]+Spec) "([^".]+)""".r.findAllMatchIn(advice).toSeq
      val testDir = java.nio.file.Paths.get("src/test/scala/graft")
      specCites.foreach { m =>
        // advice may elide a long test name with a trailing ellipsis
        val (spec, frag) = (m.group(1), m.group(2).stripSuffix("…").trim)
        val src = testDir.resolve(s"$spec.scala")
        assert(java.nio.file.Files.exists(src), s"ADVICE.md cites missing spec file $spec")
        assert(read(src.toString).contains(frag),
          s"""ADVICE.md cites $spec "$frag..." but no such test exists there""")
      }
    }
  }

  test("README bench-heap protocol matches every committed record's heap_gb") {
    // the r9 verdict caught README claiming all committed records run at
    // SPARK_DRIVER_MEM=24g while bench_full.json recorded heap_gb: 89 —
    // diff the protocol sentence against the records so the claim can't
    // rot again. The claimed heap and the record list are both parsed from
    // the protocol bullet itself: editing either side keeps them in sync
    // or fails here by name.
    val bullet = readme.linesIterator.dropWhile(!_.contains("Bench heap protocol"))
      .takeWhile(l => l.contains("Bench heap protocol") || l.startsWith("  ")).mkString(" ")
    assert(bullet.nonEmpty, "README lost its 'Bench heap protocol' bullet")
    val claimed = """SPARK_DRIVER_MEM=(\d+)g""".r.findFirstMatchIn(bullet)
      .getOrElse(fail("protocol bullet states no SPARK_DRIVER_MEM")).group(1).toLong
    val records = """bench_[a-z0-9_]+\.json""".r.findAllIn(bullet).toSet
    assert(records.nonEmpty, "protocol bullet names no records")
    records.foreach { f =>
      val p = java.nio.file.Paths.get(f)
      assert(java.nio.file.Files.exists(p), s"protocol names missing record $f")
      val heap = """"heap_gb"\s*:\s*(\d+)""".r.findFirstMatchIn(read(f))
        .getOrElse(fail(s"$f carries no heap_gb field")).group(1).toLong
      // JVM maxMemory under -Xmx24g reports just below 24 GiB; allow the
      // floor-division wobble of one unit, nothing more
      assert(math.abs(heap - claimed) <= 1,
        s"README claims ${claimed}g for all committed records but $f records heap_gb=$heap")
    }
  }

  test("every gate query has an oracle and vice versa") {
    // today's invariant: the correctness gate is oracle-complete — a queries
    // entry without SQL would silently downgrade to a rows-only check
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.diff(q).isEmpty, s"oracle SQL for nonexistent queries: ${o.diff(q).mkString(", ")}")
    assert(q.diff(o).isEmpty, s"queries without an oracle: ${q.diff(o).mkString(", ")}")
  }
}
