package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import TestSpark._
import graft.ext._

/** Round-4 extensions: n-gram LM perplexity scoring, URL canonicalization,
  * embedding quantization. */
class LmUrlEmbSpec extends AnyFunSuite {

  // --------------------------------------------------------------- LM ----

  private lazy val lmCorpus = fromJsonl(
    """{"doc_id": 1, "text": "a b a b"}""",
    """{"doc_id": 2, "text": "a b c"}""")

  test("ngramCounts emits every order with the right counts") {
    val counts = LanguageModel.ngramCounts(lmCorpus, "text", 2)
      .collect().map(r => (r.getAs[Int]("order"), r.getAs[String]("gram")) -> r.getAs[Long]("cnt")).toMap
    assert(counts((1, "a")) == 3L && counts((1, "b")) == 3L && counts((1, "c")) == 1L)
    assert(counts((2, "a b")) == 3L && counts((2, "b a")) == 1L && counts((2, "b c")) == 1L)
    assert(counts.keys.count(_._1 == 1) == 3 && counts.keys.count(_._1 == 2) == 3)
  }

  test("stupidBackoffScore matches a hand computation, with backoff and OOV") {
    val counts = LanguageModel.ngramCounts(lmCorpus, "text", 2)
    val doc = fromJsonl("""{"doc_id": 9, "text": "a b x"}""")
    val row = LanguageModel.stupidBackoffScore(doc, "doc_id", "text", counts, 2)
      .collect().head
    // pos0 "a" (no context): 3/7; pos1 "b"|"a": cnt("a b")/cnt("a") = 3/3;
    // pos2 "x"|"b": "b x" unseen -> 0.4 * unigram(x); x OOV -> 0.4 * (0.4/7)
    val expected = math.floor(
      (math.log10(3.0 / 7) + math.log10(1.0) + math.log10(0.16 / 7)) / 3 * 1e6 + 0.5) / 1e6
    assert(row.getAs[Long]("n_tokens") == 3L)
    assert(row.getAs[Double]("avg_logp") == expected)
    val ppl = math.floor(math.pow(10, -expected) * 1e6 + 0.5) / 1e6
    assert(row.getAs[Double]("ppl") == ppl)
  }

  test("token-less documents score null with n_tokens 0") {
    val counts = LanguageModel.ngramCounts(lmCorpus, "text", 2)
    val doc = fromJsonl("""{"doc_id": 9, "text": ""}""")
    val row = LanguageModel.stupidBackoffScore(doc, "doc_id", "text", counts, 2)
      .collect().head
    assert(row.getAs[Long]("n_tokens") == 0L)
    assert(row.isNullAt(row.fieldIndex("avg_logp")))
  }

  test("perplexityFilter keeps in-distribution text, drops gibberish") {
    val counts = LanguageModel.ngramCounts(lmCorpus, "text", 2)
    val mixed = fromJsonl(
      """{"doc_id": 1, "text": "a b a b c"}""",
      """{"doc_id": 2, "text": "zz qq ww vv"}""")
    val kept = LanguageModel.perplexityFilter(mixed, "doc_id", "text", counts, 2, maxPpl = 20.0)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
    assert(kept.columns.toSet == Set("doc_id", "text", "ppl"))
  }

  test("stupidBackoffScore agrees with an in-memory reference on random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    def randDoc(): String =
      Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (1 to 5).foreach { trial =>
      val n = 1 + rnd.nextInt(3)
      val corpusDocs = Seq.fill(4 + rnd.nextInt(5))(randDoc())
      val scoreDocs = Seq.fill(3)(randDoc()) :+ "z z a" // force OOV coverage
      // in-memory reference: count maps + per-token recursive backoff
      val grams = (1 to n).map { k =>
        k -> corpusDocs.flatMap(_.split(" ").toSeq.sliding(k).filter(_.size == k)
          .map(_.mkString(" "))).groupBy(identity).map { case (g, v) => g -> v.size.toLong }
      }.toMap
      val bigN = grams(1).values.sum.toDouble
      def score(toks: IndexedSeq[String], i: Int, k: Int): Double =
        if (k == 1) grams(1).get(toks(i)).map(_ / bigN).getOrElse(0.4 / bigN)
        else if (i < k - 1) score(toks, i, k - 1)
        else {
          val g = (i - k + 1 to i).map(toks).mkString(" ")
          grams(k).get(g) match {
            case Some(c) =>
              c.toDouble / grams(k - 1)((i - k + 1 until i).map(toks).mkString(" "))
            case None => 0.4 * score(toks, i, k - 1)
          }
        }
      val expected = scoreDocs.zipWithIndex.map { case (d, i) =>
        val toks = d.split(" ").toIndexedSeq
        val avg = toks.indices.map(p => math.log10(score(toks, p, n))).sum / toks.size
        i.toLong -> math.floor(avg * 1e6 + 0.5) / 1e6
      }.toMap
      val corpusDf = fromJsonl(corpusDocs.zipWithIndex.map {
        case (d, i) => s"""{"doc_id": $i, "text": "$d"}""" }: _*)
      val scoreDf = fromJsonl(scoreDocs.zipWithIndex.map {
        case (d, i) => s"""{"doc_id": $i, "text": "$d"}""" }: _*)
      val counts = LanguageModel.ngramCounts(corpusDf, "text", n)
      val got = LanguageModel.stupidBackoffScore(scoreDf, "doc_id", "text", counts, n)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logp")).toMap
      expected.foreach { case (id, e) =>
        assert(got(id) == e, s"trial $trial n=$n doc $id: got ${got(id)}, want $e")
      }
    }
  }

  // -------------------------------------------------------------- URL ----

  private def canon(url: String): Option[String] = {
    val r = fromJsonl(s"""{"u": "$url"}""")
      .select(TextFunctions.canonicalizeUrl(col("u")).as("c")).collect().head
    Option(r.getAs[String]("c"))
  }

  test("canonicalizeUrl applies every rule") {
    assert(canon("HTTP://User:pw@WWW.Example.COM:80/Path?utm_source=x&b=2&a=1#f")
      .contains("http://www.example.com/Path?a=1&b=2"))
    assert(canon("https://Site.org:443/p").contains("https://site.org/p"))
    assert(canon("https://site.org:8443/x").contains("https://site.org:8443/x"))
    assert(canon("https://site.org").contains("https://site.org/"))
    assert(canon("https://site.org/p?fbclid=z").contains("https://site.org/p"))
    assert(canon("https://site.org/p?").contains("https://site.org/p"))
    assert(canon("not a url").isEmpty)
  }

  test("canonicalizeUrl agrees with an independent java.net.URI reference on random URLs") {
    val rnd = new scala.util.Random(42)
    def randUrl(): String = {
      val scheme = Seq("http", "HTTP", "https", "HTTPS", "ftp")(rnd.nextInt(5))
      val user = if (rnd.nextBoolean()) "u:p@" else ""
      val host = Seq("Example.COM", "www.site.org", "A.b.C.net", "host")(rnd.nextInt(4))
      val port = Seq("", ":80", ":443", ":8080", ":65000")(rnd.nextInt(5))
      val path = Seq("", "/", "/P/x", "/a/B/c.html")(rnd.nextInt(4))
      val query = Seq("", "?a=1", "?utm_source=n&a=1", "?b=2&a=1&gclid=z",
        "?fbclid=x", "?z=9&y=8&x=7&UTM_medium=m")(rnd.nextInt(6))
      val frag = Seq("", "#f", "#Frag/with?stuff")(rnd.nextInt(3))
      s"$scheme://$user$host$port$path$query$frag"
    }
    // independent implementation: JDK URI parser + collection ops, no regex
    def reference(url: String): String = {
      val u = new java.net.URI(url.split("#", 2)(0))
      val scheme = u.getScheme.toLowerCase
      val host = u.getHost.toLowerCase
      val port = u.getPort match {
        case -1 => ""
        case 80 if scheme == "http" => ""
        case 443 if scheme == "https" => ""
        case p => s":$p"
      }
      val path = if (u.getRawPath == null || u.getRawPath.isEmpty) "/" else u.getRawPath
      val tracking = Set("fbclid", "gclid", "msclkid", "mc_eid", "igshid")
      val kept = Option(u.getRawQuery).toSeq
        .flatMap(_.split("&").toSeq)
        .filter(p => p.nonEmpty && {
          val k = p.split("=", 2)(0).toLowerCase
          !k.startsWith("utm_") && !tracking(k)
        }).sorted
      val queryPart = if (kept.isEmpty) "" else kept.mkString("?", "&", "")
      s"$scheme://$host$port$path$queryPart"
    }
    val urls = Seq.fill(120)(randUrl()).distinct
    val rows = urls.zipWithIndex.map { case (u, i) => s"""{"i": $i, "u": "$u"}""" }
    val got = fromJsonl(rows: _*)
      .select(col("i"), TextFunctions.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getAs[Long]("i") -> r.getAs[String]("c")).toMap
    urls.zipWithIndex.foreach { case (u, i) =>
      assert(got(i.toLong) == reference(u), s"url $u")
    }
  }

  test("urlDedup keeps the smallest id per canonical form and all unparseable rows") {
    val rows = fromJsonl(
      """{"id": 3, "url": "https://a.org/x?utm_source=1"}""",
      """{"id": 1, "url": "HTTPS://A.ORG/x"}""",
      """{"id": 2, "url": "https://b.org/y"}""",
      """{"id": 4, "url": "garbage"}""")
    val kept = TextFunctions.urlDedup(rows, "id", "url")
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    assert(kept.columns.toSet == Set("id", "url"))
  }

  // -------------------------------------------- embedding quantization ----

  test("binaryQuantize packs sign bits little-endian; hammingDistance counts flips") {
    val df = fromJsonl("""{"id": 1}""").select(
      Similarity.binaryQuantize(array(lit(1.0f), lit(-1.0f), lit(2.0f)), 3).as("b1"),
      Similarity.binaryQuantize(array(lit(1.0f), lit(1.0f), lit(2.0f)), 3).as("b2"))
    val r = df.select(col("b1"), col("b2"),
      Similarity.hammingDistance(col("b1"), col("b2")).as("h")).collect().head
    assert(r.getAs[scala.collection.Seq[Long]]("b1").toList == List(5L))
    assert(r.getAs[scala.collection.Seq[Long]]("b2").toList == List(7L))
    assert(r.getAs[Long]("h") == 1L)
  }

  test("binaryQuantize spans words past 64 dims") {
    val v = array((0 until 65).map(i => lit(if (i == 64) 1.0f else -1.0f)): _*)
    val r = fromJsonl("""{"id": 1}""")
      .select(Similarity.binaryQuantize(v, 65).as("b")).collect().head
    assert(r.getAs[scala.collection.Seq[Long]]("b").toList == List(0L, 1L))
  }

  test("matryoshka truncates and re-normalizes") {
    val r = fromJsonl("""{"id": 1}""")
      .select(Similarity.matryoshka(array(lit(3.0f), lit(4.0f), lit(100.0f)), 2).as("m"))
      .collect().head
    assert(r.getAs[scala.collection.Seq[Float]]("m").toList == List(0.6f, 0.8f))
  }

  test("meanPool pools element-wise with weights; unweighted counts chunks") {
    import spark.implicits._
    val chunks = Seq(
      ("a", 1.0, Array(1.0f, 2.0f)),
      ("a", 3.0, Array(3.0f, 4.0f)),
      ("b", 5.0, Array(10.0f, 20.0f)))
      .toDF("doc", "w", "emb")
    val pooled = Similarity.meanPool(chunks, Seq("doc"), "emb", Some("w"))
      .collect().map(r => r.getAs[String]("doc") ->
        (r.getAs[scala.collection.Seq[Double]]("pooled").toList,
          r.getAs[Double]("weight_total"))).toMap
    // (1*1+3*3)/4 = 2.5, (2*1+4*3)/4 = 3.5
    assert(pooled("a") == (List(2.5, 3.5), 4.0))
    assert(pooled("b") == (List(10.0, 20.0), 5.0))
    val unweighted = Similarity.meanPool(chunks, Seq("doc"), "emb")
      .collect().map(r => r.getAs[String]("doc") ->
        (r.getAs[scala.collection.Seq[Double]]("pooled").toList,
          r.getAs[Double]("weight_total"))).toMap
    assert(unweighted("a") == (List(2.0, 3.0), 2.0)) // 2 chunks
    assert(unweighted("b") == (List(10.0, 20.0), 1.0))
  }

  test("meanPool ragged widths use per-dim denominators; weight_total is whole-group Σw; all-empty groups survive") {
    import spark.implicits._
    val chunks = Seq(
      ("a", 1.0, Array(2.0f, 8.0f)),   // reaches dims 0,1
      ("a", 3.0, Array(6.0f)),         // reaches dim 0 only
      ("a", 2.0, Array.empty[Float]),  // contributes to no dim, only Σw
      ("b", 4.0, Array.empty[Float]),  // group of only empty vectors
      ("b", 1.0, Array.empty[Float]))
      .toDF("doc", "w", "emb")
    val got = Similarity.meanPool(chunks, Seq("doc"), "emb", Some("w"))
      .collect().map(r => r.getAs[String]("doc") ->
        (r.getAs[scala.collection.Seq[Double]]("pooled").toList,
          r.getAs[Double]("weight_total"))).toMap
    // dim0: (2*1+6*3)/(1+3) = 5; dim1: 8*1/1 = 8 (masked mean); Σw = 1+3+2
    assert(got("a") == (List(5.0, 8.0), 6.0))
    // all-empty group: present, empty pooled array, Σw = 5
    assert(got("b") == (List(), 5.0))
  }

  test("meanPool agrees with an in-memory reference on random chunk sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { trial =>
      val dim = 2 + rnd.nextInt(6)
      val docs = 1 + rnd.nextInt(5)
      val rows = Seq.fill(8 + rnd.nextInt(20))((
        s"d${rnd.nextInt(docs)}",
        1.0 + rnd.nextInt(7),
        Array.fill(dim)(rnd.nextFloat() * 4 - 2)))
      val got = Similarity.meanPool(
        rows.toDF("doc", "w", "emb"), Seq("doc"), "emb", Some("w"))
        .collect().map(r => r.getAs[String]("doc") ->
          (r.getAs[scala.collection.Seq[Double]]("pooled").toVector,
            r.getAs[Double]("weight_total"))).toMap
      val expected = rows.groupBy(_._1).map { case (doc, g) =>
        val sw = g.map(_._2).sum
        doc -> (Vector.tabulate(dim)(i =>
          g.map(r => r._3(i).toDouble * r._2).sum / sw), sw)
      }
      assert(got.keySet == expected.keySet, s"trial $trial: group sets differ")
      expected.foreach { case (doc, (ev, ew)) =>
        val (gv, gw) = got(doc)
        assert(math.abs(gw - ew) < 1e-9, s"trial $trial doc $doc weight")
        gv.zip(ev).zipWithIndex.foreach { case ((g, e), i) =>
          // Spark's sum order differs from the sequential fold — FP tolerance
          assert(math.abs(g - e) < 1e-9, s"trial $trial doc $doc dim $i: $g vs $e")
        }
      }
    }
  }

  // ------------------------------------------------ sampling additions ----

  test("temperatureMix keeps all of the rarest stratum and downsamples the rest") {
    val rows = (1 to 90).map(i => s"""{"id": $i, "s": "big"}""") ++
      (91 to 100).map(i => s"""{"id": $i, "s": "rare"}""")
    val df = fromJsonl(rows: _*)
    val kept = Sampling.temperatureMix(df, "s", temperature = 2.0)
      .collect().map(r => r.getAs[String]("s"))
    val (big, rare) = (kept.count(_ == "big"), kept.count(_ == "rare"))
    assert(rare == 10)                    // most-upweighted stratum keeps 100%
    // big keeps ~ (10/90)^0.5 = 1/3 of its 90 rows (hash-exact, so just
    // bound it away from both extremes)
    assert(big > 10 && big < 60, s"big kept $big")
    // T=1 is the identity mix
    assert(Sampling.temperatureMix(df, "s", temperature = 1.0).count() == 100)
  }

  test("assignSplit covers every row exactly once, deterministically") {
    val df = fromJsonl((1 to 200).map(i => s"""{"id": $i}"""): _*)
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplit(df, fr)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    assert(a.size == 200 && a.values.toSet.subsetOf(Set("train", "val", "test")))
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 120, s"train ${counts("train")}")  // ~160 expected
    assert(counts.getOrElse("val", 0) + counts.getOrElse("test", 0) > 10)
    // stable under repartitioning
    val b = Sampling.assignSplit(df.repartition(7), fr)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("epochMix upsamples with copy indexes and thins fractional strata") {
    val rows = (1 to 40).map(i => s"""{"id": $i, "s": "up"}""") ++
      (41 to 80).map(i => s"""{"id": $i, "s": "down"}""") ++
      (81 to 90).map(i => s"""{"id": $i, "s": "keep"}""")
    val df = fromJsonl(rows: _*)
    val out = Sampling.epochMix(df, "s",
      Map("up" -> 2.5, "down" -> 0.5, "keep" -> 1.0))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("s"), r.getAs[Long]("epoch")))
    val byS = out.groupBy(_._2)
    // every 'up' row appears at least twice (epochs 0 and 1), some thrice
    val upCounts = byS("up").groupBy(_._1).view.mapValues(_.length).toMap
    assert(upCounts.values.forall(c => c == 2 || c == 3))
    assert(upCounts.values.sum > 80 && upCounts.values.sum < 120)
    // 'down' is a plain deterministic half-thinning, epoch always 0
    assert(byS("down").forall(_._3 == 0L))
    assert(byS("down").length > 5 && byS("down").length < 35)
    // 'keep' passes through exactly once
    assert(byS("keep").map(_._1).sorted.toSeq == (81L to 90L))
    // deterministic: second run identical
    val again = Sampling.epochMix(df, "s",
      Map("up" -> 2.5, "down" -> 0.5, "keep" -> 1.0))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("s"), r.getAs[Long]("epoch")))
    assert(out.sortBy(t => (t._1, t._3)).toSeq == again.sortBy(t => (t._1, t._3)).toSeq)
  }

  test("compressionRatio separates repetitive boilerplate from prose from noise") {
    import spark.implicits._
    val prose = "the committee reviewed seventeen distinct proposals before narrowing " +
      "the field to a shortlist that balanced cost, feasibility and long term impact " +
      "on the surrounding communities in measurable ways"
    val boiler = Seq.fill(40)("click here to subscribe now").mkString(" ")
    val noiseRnd = new scala.util.Random(42)
    val noise = (0 until 200).map(_ => (noiseRnd.nextInt(94) + 33).toChar).mkString
    val out = Seq((1L, prose), (2L, boiler), (3L, noise), (4L, ""), (5L, null))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("r"))).toMap
    val (p, b, n) = (out(1L).get, out(2L).get, out(3L).get)
    assert(b < 0.2, s"boilerplate ratio $b")          // heavy repetition
    assert(p > 0.4 && p < 0.9, s"prose ratio $p")
    assert(n > 0.8, s"noise ratio $n")                // near-incompressible
    assert(b < p && p < n)
    assert(out(4L).isEmpty && out(5L).isEmpty)        // empty/null → null
    // deterministic across runs
    val again = Seq((1L, prose)).toDF("id", "t")
      .select(TextFunctions.compressionRatio(col("t"))).first().getDouble(0)
    assert(again == p)
  }

  test("repairMojibake fixes UTF-8-as-cp1252 double encoding, leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      (1L, "CafÃ© au lait"),          // Ã© → é (latin-1 block)
      (2L, "donâ€™t stop"),      // â€™ → ’ (cp1252 0x80 block)
      (3L, "plain ascii text"),
      (4L, "Café déjà vu"),      // real accented text: not valid UTF-8 bytes
      (5L, "中文 stays"),               // chars with no byte form: untouched
      (6L, null.asInstanceOf[String]))
    val out = rows.toDF("id", "t")
      .select(col("id"), TextFunctions.repairMojibake(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("r")).toMap
    assert(out(1L) == "Café au lait")
    assert(out(2L) == "don’t stop")
    assert(out(3L) == "plain ascii text")
    assert(out(4L) == "Café déjà vu")
    assert(out(5L) == "中文 stays")
    assert(out(6L) == null)
    // idempotent: repairing repaired text is a no-op
    val twice = rows.toDF("id", "t").select(col("id"),
      TextFunctions.repairMojibake(TextFunctions.repairMojibake(col("t"))).as("r"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("r")).toMap
    assert(twice == out)
  }

  test("urlDedupLatest keeps the freshest fetch per canonical URL") {
    val df = fromJsonl(
      """{"id": 1, "url": "https://site.example.org/p?a=1", "ts": 100}""",
      """{"id": 2, "url": "HTTPS://SITE.example.org/p?a=1&utm_source=x", "ts": 300}""",
      """{"id": 3, "url": "https://site.example.org/p?a=1#frag", "ts": 200}""",
      """{"id": 4, "url": "https://other.example.org/q", "ts": 50}""",
      """{"id": 5, "url": "not a url at all", "ts": 10}""")
    val kept = TextFunctions.urlDedupLatest(df, "id", "url", "ts")
      .collect().map(_.getAs[Long]("id")).toSet
    // 1/2/3 share a canonical form — ts=300 (id 2) wins; 4 unique; 5 unparseable kept
    assert(kept == Set(2L, 4L, 5L))
    // tie on ts → smallest id wins
    val tied = fromJsonl(
      """{"id": 7, "url": "https://site.example.org/t", "ts": 100}""",
      """{"id": 8, "url": "https://site.example.org/t", "ts": 100}""")
    assert(TextFunctions.urlDedupLatest(tied, "id", "url", "ts")
      .collect().map(_.getAs[Long]("id")).toSet == Set(7L))
    // string ids (UUID-style) work too — the tie-break is type-agnostic
    val strIds = fromJsonl(
      """{"id": "b-doc", "url": "https://site.example.org/s", "ts": 100}""",
      """{"id": "a-doc", "url": "https://site.example.org/s", "ts": 100}""",
      """{"id": "c-doc", "url": "https://site.example.org/s", "ts": 300}""")
    assert(TextFunctions.urlDedupLatest(strIds, "id", "url", "ts")
      .collect().map(_.getAs[String]("id")).toSet == Set("c-doc"))
  }

  test("scoreWeightedKeep keeps rows in proportion to their own score, deterministically") {
    val rows = (1 to 400).map(i => s"""{"id": $i, "s": ${if (i <= 100) "0.0"
      else if (i <= 200) "1.0" else if (i <= 300) "0.5" else "null"}}""")
    val df = fromJsonl(rows: _*)
    val kept = Sampling.scoreWeightedKeep(df, col("s"))
      .collect().map(_.getAs[Long]("id")).toSet
    // score 0 and null never keep; score 1 always keeps
    assert(kept.forall(i => i > 100 && i <= 300))
    assert((101L to 200L).forall(kept))
    // score 0.5 keeps roughly half (hash-uniform; generous bounds)
    val half = kept.count(i => i > 200 && i <= 300)
    assert(half > 25 && half < 75, s"kept $half of 100 at score 0.5")
    // stable under repartitioning
    val again = Sampling.scoreWeightedKeep(df.repartition(7), col("s"))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == kept)
    // out-of-range scores clamp instead of misbehaving
    val clamped = Sampling.scoreWeightedKeep(df, col("s") * 100 - 30)
    assert(clamped.count() > 0)
  }

  test("tokenBudgetMix cuts each stratum at its token quota in hash order") {
    val rows = (1 to 20).map(i => s"""{"id": $i, "s": "a", "tok": 10}""") ++
      (21 to 40).map(i => s"""{"id": $i, "s": "b", "tok": 10}""") ++
      (41 to 50).map(i => s"""{"id": $i, "s": "c", "tok": 10}""")
    val df = fromJsonl(rows: _*)
    val out = Sampling.tokenBudgetMix(df, "s", col("tok"),
      Map("a" -> 55L, "b" -> 1000L, "c" -> 0L))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("s")))
    val byS = out.groupBy(_._2)
    // 55-token budget over 10-token docs: prefix < 55 keeps exactly 6
    // (prefixes 0..50), overshooting by under one document
    assert(byS("a").length == 6, s"got ${byS("a").length}")
    // budget above the stratum total keeps everything
    assert(byS("b").map(_._1).sorted.toSeq == (21L to 40L))
    // zero budget and absent strata drop entirely
    assert(!byS.contains("c"))
    assert(Sampling.tokenBudgetMix(df, "s", col("tok"), Map("a" -> 55L))
      .select(countDistinct(col("s"))).first().getLong(0) == 1)
    // deterministic under repartitioning
    val again = Sampling.tokenBudgetMix(df.repartition(7), "s", col("tok"),
      Map("a" -> 55L, "b" -> 1000L, "c" -> 0L))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("s")))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a positive budget smaller than one document still takes that document
    val one = Sampling.tokenBudgetMix(df, "s", col("tok"), Map("a" -> 3L))
    assert(one.count() == 1)
  }

  test("materializePacks emits one bounded row per pack in document order") {
    val df = fromJsonl(
      """{"id": 1, "s": "a", "text": "one", "tok": 3}""",
      """{"id": 2, "s": "a", "text": "two", "tok": 3}""",
      """{"id": 3, "s": "a", "text": "three", "tok": 3}""",
      """{"id": 4, "s": "b", "text": "four", "tok": 5}""")
    val packed = Packing.packGreedy(df, Seq("s"), Seq(col("id")), col("tok"), budget = 6L)
    val packs = Packing.materializePacks(packed, Seq("s"), Seq(col("id")),
      col("text"), col("tok"), sep = " | ")
      .collect().map(r => (r.getAs[String]("s"), r.getAs[Long]("pack_id")) ->
        (r.getAs[String]("pack_text"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(packs(("a", 0L)) == (("one | two", 2L, 6L)))
    assert(packs(("a", 1L)) == (("three", 1L, 3L)))
    assert(packs(("b", 0L)) == (("four", 1L, 5L)))
  }

  test("trainingOrder is deterministic with contiguous per-shard positions") {
    val df = fromJsonl((1 to 40).map(i => s"""{"id": $i}"""): _*)
    val a = Sampling.trainingOrder(df, "id", shards = 4, seed = "s1")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    val b = Sampling.trainingOrder(df.repartition(7), "id", shards = 4, seed = "s1")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq) // partitioning-invariant
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // a different seed produces a different order
    val c = Sampling.trainingOrder(df, "id", shards = 4, seed = "s2")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(a.sortBy(_._1).toSeq != c.sortBy(_._1).toSeq)
  }

  test("int8Dot approximates the exact dot product") {
    val v = array(lit(1.0f), lit(-0.5f))
    val df = fromJsonl("""{"id": 1}""")
      .select(Similarity.quantizeInt8(v).as("q"))
      .select(Similarity.int8Dot(col("q"), col("q")).as("d"))
    val d = df.collect().head.getAs[Double]("d")
    assert(math.abs(d - 1.25) < 0.01)
  }
}
