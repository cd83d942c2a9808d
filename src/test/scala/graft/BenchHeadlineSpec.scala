package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-session headline record's merge protocol (Bench.scala):
  * json4s parsing (order/extension-insensitive), the min-wall merge, and —
  * the r13 verdict's #2 — the write discipline: a run whose configuration
  * guard mismatches the committed record must NOT overwrite it. */
class BenchHeadlineSpec extends AnyFunSuite {

  private val q = Seq(
    "simpleFilter" -> (0.0417, 0.57),
    "groupAndAggregate" -> (0.0325, 0.07))

  test("parseHeadline round-trips renderHeadline, survives reordered keys and unknown fields") {
    val rendered = Bench.renderHeadline(q, 600000L, 8L, 32, 5, 0.124, 0.178)
    val r = Bench.parseHeadline(rendered).get
    assert(r == Bench.HeadlineRecord(q, 600000L, 8L, 32, 5))
    // hand-reordered keys, an unknown top-level field (numeric — the old
    // regex scan's failure mode: a first-matching "rows"-like field), an
    // unknown per-query field, and whitespace
    val exotic = """{
      "sessions": 3, "note": "x", "heap_gb": 8, "extra_rows": 17,
      "queries": { "groupAndAggregate": {"cpu": 0.07, "wall": 0.0325, "tag": "z"},
                   "simpleFilter": {"wall": 0.0417, "cpu": 0.57} },
      "cpus": 32, "cal": [0.1, 0.2], "rows": 600000 }"""
    val e = Bench.parseHeadline(exotic).get
    assert(e.rows == 600000L && e.heapGb == 8L && e.cpus == 32 && e.sessions == 3)
    assert(e.queries.toMap == q.toMap)
    // structurally broken records parse to None, never to a guessed record
    assert(Bench.parseHeadline("""{"queries":{"a":{"wall":"x","cpu":1}},"rows":1,"heap_gb":1,"cpus":1,"sessions":1}""").isEmpty)
    assert(Bench.parseHeadline("""{"rows":600000,"heap_gb":8,"cpus":32,"sessions":1}""").isEmpty)
    assert(Bench.parseHeadline("not json").isEmpty)
    assert(Bench.parseHeadline("[1,2]").isEmpty)
  }

  test("mergeHeadline: per-query min-wall with its own cpu; guard mismatch never merges") {
    val prior = Bench.HeadlineRecord(Seq(
      "simpleFilter" -> (0.0390, 0.59),        // prior faster: keep prior pair
      "groupAndAggregate" -> (0.0500, 0.05)),  // session faster: keep session pair
      600000L, 8L, 32, 5)
    val (merged, sessions, ok) = Bench.mergeHeadline(Some(prior), q, 8L, 600000L, 32)
    assert(ok && sessions == 6)
    assert(merged.toMap == Map(
      "simpleFilter" -> (0.0390, 0.59), "groupAndAggregate" -> (0.0325, 0.07)))
    // each guard field individually blocks the merge
    for ((h, r, c) <- Seq((89L, 600000L, 32), (8L, 60000L, 32), (8L, 600000L, 16))) {
      val (m, s, o) = Bench.mergeHeadline(Some(prior), q, h, r, c)
      assert(!o && s == 1 && m == q, s"guard ($h,$r,$c) leaked a merge")
    }
    // a query the prior lacks keeps the session's observation
    val (m2, _, _) = Bench.mergeHeadline(
      Some(prior.copy(queries = prior.queries.take(1))), q, 8L, 600000L, 32)
    assert(m2.toMap.apply("groupAndAggregate") == (0.0325, 0.07))
  }

  test("writeHeadline: a guard-mismatched run leaves the committed record byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-headline").toString
    val path = s"$dir/bench_headline.json"
    // seed: first run writes the primary path
    Bench.writeHeadline(path, mergeOn = true, q, 8L, 600000L, 32, 0.1, 0.2)
    val seeded = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(Bench.parseHeadline(new String(seeded, "UTF-8")).get.sessions == 1)
    // a mismatched-heap run must write the SIDE path and not touch the record;
    // the side path carries the FULL guard tuple, not heap alone
    val (sideQ, sideSessions) = Bench.writeHeadline(path, mergeOn = true,
      Seq("simpleFilter" -> (0.0100, 0.5), "groupAndAggregate" -> (0.0100, 0.05)),
      89L, 600000L, 32, 0.1, 0.2)
    assert(sideSessions == 1 && sideQ.head._2._1 == 0.0100)
    val after = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(java.util.Arrays.equals(seeded, after),
      "guard-mismatched run clobbered the committed record")
    val side = new java.io.File(s"$dir/bench_headline.89g.32c.600000r.json")
    assert(side.exists(), "mismatched run's record not written to the side path")
    assert(Bench.parseHeadline(
      new String(java.nio.file.Files.readAllBytes(side.toPath), "UTF-8")).get.heapGb == 89L)
    // a REPEAT off-protocol run MERGES into its own side record (min-wall,
    // sessions counted) instead of clobbering it...
    val (sideQ2, sideSessions2) = Bench.writeHeadline(path, mergeOn = true,
      Seq("simpleFilter" -> (0.0200, 0.6), "groupAndAggregate" -> (0.0050, 0.04)),
      89L, 600000L, 32, 0.1, 0.2)
    assert(sideSessions2 == 2)
    assert(sideQ2.toMap == Map(
      "simpleFilter" -> (0.0100, 0.5), "groupAndAggregate" -> (0.0050, 0.04)))
    // ...while a run mismatched on ROWS at the same heap gets its OWN side
    // file and cannot touch the 89g/600000r one
    Bench.writeHeadline(path, mergeOn = true,
      Seq("simpleFilter" -> (9.0, 9.0)), 89L, 60000L, 32, 0.1, 0.2)
    assert(new java.io.File(s"$dir/bench_headline.89g.32c.60000r.json").exists())
    assert(Bench.parseHeadline(new String(java.nio.file.Files.readAllBytes(
      side.toPath), "UTF-8")).get.sessions == 2,
      "a different-rows run overwrote another configuration's side record")
    // an UNPARSEABLE committed record is equally protected
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "{corrupt".getBytes("UTF-8"))
    Bench.writeHeadline(path, mergeOn = true, q, 8L, 600000L, 32, 0.1, 0.2)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8") == "{corrupt",
      "unparseable record was clobbered")
    assert(new java.io.File(s"$dir/bench_headline.8g.32c.600000r.json").exists())
    // a MATCHED run merges min-wall into the primary path and counts the session
    java.nio.file.Files.write(java.nio.file.Paths.get(path), seeded)
    val (mq, ms) = Bench.writeHeadline(path, mergeOn = true,
      Seq("simpleFilter" -> (0.0300, 0.5), "groupAndAggregate" -> (0.0400, 0.05)),
      8L, 600000L, 32, 0.1, 0.2)
    assert(ms == 2)
    assert(mq.toMap == Map(
      "simpleFilter" -> (0.0300, 0.5), "groupAndAggregate" -> (0.0325, 0.07)))
    val merged = Bench.parseHeadline(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")).get
    assert(merged.sessions == 2 && merged.queries.toMap.apply("simpleFilter")._1 == 0.0300)
    // NO_MERGE yields a single-session record but SIDE-PATHS it when a
    // primary exists — a stray NO_MERGE=1 must not wipe protocol history
    val beforeNoMerge = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (nq, ns) = Bench.writeHeadline(path, mergeOn = false, q, 8L, 600000L, 32, 0.1, 0.2)
    assert(ns == 1 && nq == q)
    assert(java.util.Arrays.equals(beforeNoMerge,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))),
      "NO_MERGE clobbered the committed record")
    assert(Bench.parseHeadline(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/bench_headline.8g.32c.600000r.json")), "UTF-8"))
      .get.sessions == 1, "NO_MERGE record did not land on the side path")
    // NO_MERGE seeding an ABSENT primary writes the primary (bootstrap case)
    val path2 = s"$dir/fresh.json"
    Bench.writeHeadline(path2, mergeOn = false, q, 8L, 600000L, 32, 0.1, 0.2)
    assert(Bench.parseHeadline(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path2)), "UTF-8")).get.sessions == 1)
  }

  test("extras record: flattened cold/warm keys merge min-wall; opt-in soak keys survive a non-soak session") {
    val dir = java.nio.file.Files.createTempDirectory("graft-extras").toString
    val path = s"$dir/bench_extras.json"
    def read() = Bench.parseHeadline(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")).get
    // session 1: a SOAK run — extras plus the opt-in soak tier, each extra
    // contributing independent cold and warm statistics
    Bench.writeHeadline(path, mergeOn = true, Seq(
      "lmTrain.cold" -> (5.0, 4.0), "lmTrain.warm" -> (1.0, 0.9),
      "soakMinhash10x.cold" -> (60.0, 55.0), "soakMinhash10x.warm" -> (50.0, 48.0)),
      8L, 600000L, 32, 0.1, 0.2)
    assert(read().sessions == 1)
    // session 2: NO soak, faster warm / slower cold — per-key min-wall
    // with each key's own CPU, and the soak minima MUST survive
    Bench.writeHeadline(path, mergeOn = true, Seq(
      "lmTrain.cold" -> (6.0, 4.1), "lmTrain.warm" -> (0.8, 0.7)),
      8L, 600000L, 32, 0.1, 0.2)
    val r = read()
    assert(r.sessions == 2)
    assert(r.queries.toMap == Map(
      "lmTrain.cold" -> (5.0, 4.0),          // prior faster: prior pair kept
      "lmTrain.warm" -> (0.8, 0.7),          // session faster: session pair
      "soakMinhash10x.cold" -> (60.0, 55.0), // not run this session: kept
      "soakMinhash10x.warm" -> (50.0, 48.0)))
    // a guard-mismatched extras run side-paths exactly like the headline
    val before = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    Bench.writeHeadline(path, mergeOn = true,
      Seq("lmTrain.cold" -> (0.1, 0.1)), 89L, 600000L, 32, 0.1, 0.2)
    assert(java.util.Arrays.equals(before,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
    assert(new java.io.File(s"$dir/bench_extras.89g.32c.600000r.json").exists())
  }
}
