package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{NegSampling, Urls, WebCleaning}
import graft.plans.TopoLayers

/** Web-corpus cleaning (C4 + Gopher), URL canonicalization,
  * negative-sampling table generation, and DAG topological layering. */
class WebPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---------------------------------------------------------- C4

  test("c4Clean: line rule + document rule match a scala reference; zero shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Good sentence here.\nshort.\nAnother proper line!\nno terminal punct line"),
      (2L, "Only one good line stays.\nword\nbad"),
      (3L, "Contains javascript so dropped.\nA fine closing line.\nAnd one more real line."),
      (4L, "Uses a { brace doc.\nSecond good line here.\nThird good line too."),
      (5L, "Lorem Ipsum dolor sit amet.\nAnother valid line here.\nKeep this too."),
      (6L, "")
    ).toDF("id", "text")
    val got = WebCleaning.c4Clean(docs, $"text", 3, 2, $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getBoolean(4))).sortBy(_._1)

    def ref(id: Long, text: String): (Long, Long, Long, String, Boolean) = {
      val lines = text.split("\n", -1)
      val kept = lines.filter(ln =>
        ln.matches(".*[.!?][\"']?") && ln.split(" ").length >= 3 &&
          !ln.toLowerCase.contains("javascript"))
      (id, lines.length.toLong, kept.length.toLong, kept.mkString("\n"),
        kept.length >= 2 && !text.contains("{") && !text.toLowerCase.contains("lorem ipsum"))
    }
    val want = Seq(
      (1L, "Good sentence here.\nshort.\nAnother proper line!\nno terminal punct line"),
      (2L, "Only one good line stays.\nword\nbad"),
      (3L, "Contains javascript so dropped.\nA fine closing line.\nAnd one more real line."),
      (4L, "Uses a { brace doc.\nSecond good line here.\nThird good line too."),
      (5L, "Lorem Ipsum dolor sit amet.\nAnother valid line here.\nKeep this too."),
      (6L, "")).map((ref _).tupled)
    assert(got.toSeq == want)
    // specific semantics: javascript line dropped but doc 3 still keeps 2 lines
    assert(got(2)._3 == 2 && got(2)._5)
    // doc 4 has 3 good lines but the brace kills the document
    assert(got(3)._3 == 3 && !got(3)._5)
    // lorem ipsum kills doc 5
    assert(!got(4)._5)
    val plan = WebCleaning.c4Clean(docs, $"text", 3, 2, $"id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ------------------------------------------------------ Gopher

  test("gopher: metrics and verdict match a scala reference; zero shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(3)("the quick brown fox jumps over the lazy dog again today ok")
        .mkString("\n")), // 3 identical lines -> dup fractions trip
      (2L, "- bullet one\n- bullet two\nplain line here now ok yes sure fine right good" +
        "\nmore words to get over the minimum count for this document rule"),
      (3L, "trailing dots line...\n" +
        "a longer second line with plenty of ordinary words in it today\n" +
        "and a third line that also has a good number of words here"),
      (4L, "### symbols # everywhere # here # we # go # now # ok # yes\n" +
        "second line with several more regular words to pass length")
    ).toDF("id", "text")
    val got = WebCleaning.gopher(docs, $"text", 10L, 100L, $"id")
      .orderBy("id").collect()

    def ref(text: String): (Long, Long, Long, Long, Long, Long, Long, Long) = {
      val lines = text.split("\n", -1)
      val ws = text.replace("\n", " ").split(" ")
      val n = ws.length.toLong
      val nl = lines.length.toLong
      val meanW = ws.map(_.length.toLong).sum * 100 / math.max(n, 1)
      val alpha = ws.count(_.exists(_.isLetter)).toLong * 1000000 / math.max(n, 1)
      val sym = (text.count(_ == '#').toLong +
        ("\\.\\.\\.".r.findAllIn(text).length.toLong)) * 1000000 / math.max(n, 1)
      val bullet = lines.count(l => l.matches("^[-*•].*")).toLong * 1000000 / math.max(nl, 1)
      val ellip = lines.count(_.endsWith("...")).toLong * 1000000 / math.max(nl, 1)
      val dup = (nl - lines.distinct.length) * 1000000 / math.max(nl, 1)
      val chars = lines.map(_.length.toLong).sum
      val dupc = (chars - lines.distinct.map(_.length.toLong).sum) * 1000000 /
        math.max(chars, 1)
      (n, meanW, alpha, sym, bullet, ellip, dup, dupc)
    }
    val texts = docs.orderBy("id").collect().map(_.getString(1))
    got.zip(texts).foreach { case (r, text) =>
      val w = ref(text)
      val g = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8))
      assert(g == w, s"metrics mismatch for '$text': got $g want $w")
    }
    // doc 1: 3 identical lines -> dup_line_ppm = 666666 > 300000 -> dropped
    assert(got(0).getLong(7) == 666666L && !got(0).getBoolean(9))
    // doc 2: 2 of 4 lines bullets (500000 ppm <= 900000) -> bullet rule passes
    assert(got(1).getLong(5) == 500000L)
    // doc 4: heavy '#' -> symbol rule trips
    assert(got(3).getLong(4) > 100000L && !got(3).getBoolean(9))
    val plan = WebCleaning.gopher(docs, $"text", 10L, 100L, $"id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // -------------------------------------------------------- URLs

  test("url normalization: RFC table cases; zero shuffle") {
    import spark.implicits._
    val cases = Seq(
      ("HTTP://Example.COM:80/a/b?x=1#frag", "http://example.com/a/b?x=1"),
      ("https://Example.com:443/", "https://example.com/"),
      ("https://example.com:8443/x", "https://example.com:8443/x"),
      ("http://example.com", "http://example.com/"),
      ("http://example.com?q=2", "http://example.com/?q=2"),
      ("http://a.B.example.com/p?utm_source=x&q=1&gclid=z&fbclid=y",
        "http://a.b.example.com/p?q=1"),
      ("http://example.com/p?utm_campaign=only", "http://example.com/p"),
      ("http://example.com/CaseKept/Path", "http://example.com/CaseKept/Path"),
      ("not a url at all", "not a url at all"),
      ("ftp://Files.example.org:21/pub", "ftp://files.example.org:21/pub")
    )
    val df = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    val got = Urls.normalize(df, $"url", $"id").orderBy("id")
      .collect().map(_.getString(1))
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g == w, s"got $g want $w") }
    // host/domain extraction
    val hd = Urls.normalize(df, $"url", $"id").orderBy("id")
      .collect().map(r => (r.getString(2), r.getString(3)))
    assert(hd(5) == (("a.b.example.com", "example.com")))
    assert(hd(8) == (("", "")))
    val plan = Urls.normalize(df, $"url", $"id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("domainProfile: distinct normalized urls per domain") {
    import spark.implicits._
    val df = Seq(
      "http://A.example.com/x?utm_source=1", // same as below after normalization
      "HTTP://a.example.com/x",
      "http://a.example.com/y",
      "https://b.other.org/z"
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val got = Urls.domainProfile(df, $"url").orderBy("domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("example.com", 2L, 3L), ("other.org", 1L, 1L)))
  }

  // ------------------------------------------- negative sampling

  test("negative sampling: weights are floor(c^0.75), every draw resolves exactly once, " +
    "frequency tracks the weight line; no BNLJ") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common common common rare"),
      (2L, "common common common common mid mid"),
      (3L, "common mid mid other words here")
    ).toDF("doc_id", "text")
    // counts: common=10, mid=5, rare=1, other=1, words=1, here=1
    def w075(c: Long) = math.floor(c.toDouble / math.sqrt(math.sqrt(c.toDouble))).toLong
    val uni = NegSampling.unigramWeights(docs, $"text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    uni.foreach { case (tk, c, ww) => assert(ww == w075(c), s"$tk: $ww != ${w075(c)}") }

    val n = 500L
    val tbl = NegSampling.table(docs, $"text", n, bucketWidth = 4L)
    assert(tbl.count() == n) // every draw resolves to exactly one token
    // draws follow the weight proportions (loose sanity: the heaviest
    // token gets the most draws)
    val byTok = tbl.groupBy("token").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byTok.maxBy(_._2)._1 == "common")
    // the interval resolution must be the bucketed equi-join; the ONLY
    // nested-loop allowed is the one-row scalar total broadcast
    // (IdentityBroadcastMode over the max(hi) aggregate)
    val plan = tbl.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 1 && (bnlj == 0 || plan.contains("IdentityBroadcastMode")), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  // ----------------------------------------------- topo layering

  test("topoLayers: longest-path layers on a hand DAG; cycle detection fires") {
    import spark.implicits._
    // diamond + tail: 1->2, 1->3, 2->4, 3->4, 4->5; plus a long arm 1->6->7->4
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
      (1L, 6L), (6L, 7L), (7L, 4L)).toDF("src", "dst")
    val got = TopoLayers.run(e).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 6L -> 1L, 7L -> 2L,
      4L -> 3L, 5L -> 4L))
    // (layer, id) order is a valid topological order
    val order = got.toSeq.sortBy { case (id, layer) => (layer, id) }.map(_._1)
    val pos = order.zipWithIndex.toMap
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (1L, 6L), (6L, 7L), (7L, 4L))
      .foreach { case (a, b) => assert(pos(a) < pos(b)) }
    // a cycle must abort with the budget error, not loop forever
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val ex = intercept[IllegalStateException](TopoLayers.run(cyc, maxRounds = 16))
    assert(ex.getMessage.contains("cycle"))
  }

  // ------------------------------------------ temporal reachability

  test("temporalReach: time-respecting paths only; earliest arrival; hop budget") {
    import spark.implicits._
    // 1→2 fires at ts 10 and ts 7; 2→3 at ts 9 (after arrival 7: ok)
    // 2→4 at ts 5 (BEFORE any arrival at 2: a static path, not a
    // temporal one); 3→5 at ts 20
    val e = Seq((1L, 2L, 10L), (1L, 2L, 7L), (2L, 3L, 9L), (2L, 4L, 5L),
      (3L, 5L, 20L)).toDF("src", "dst", "ts")
    val seeds = Seq(1L).toDF("id")
    val got3 = graft.plans.TemporalReach.run(e, seeds, maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got3 == Map(1L -> 0L, 2L -> 7L, 3L -> 9L, 5L -> 20L)) // 4 unreachable
    // hop budget cuts the chain: 2 hops cannot reach node 5
    val got2 = graft.plans.TemporalReach.run(e, seeds, maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got2 == Map(1L -> 0L, 2L -> 7L, 3L -> 9L))
  }

  // -------------------------------------------------- co-occurrence

  test("itemPairs: brute-force equality, hub cap excludes, integer cosine²") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L),
      (3L, 11L), (3L, 12L),
      // hub user 4 touches everything — excluded at maxDegree = 3
      (4L, 10L), (4L, 11L), (4L, 12L), (4L, 13L))
    val df = rows.toDF("u", "i")
    val got = operators.Cooccur.itemPairs(df, $"u", $"i", minSupport = 2L, maxDegree = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(p => (p._1, p._2))
    // kept users: 1,2,3. degrees: 10→2, 11→3, 12→2.
    // pairs: (10,11)=2, (10,12)=1(<2 dropped), (11,12)=2
    assert(got.toSeq == Seq(
      (10L, 11L, 2L, 2L, 3L, 2L * 2 * 1000 / (2 * 3)),
      (11L, 12L, 2L, 3L, 2L, 2L * 2 * 1000 / (3 * 2))))
    val plan = operators.Cooccur.itemPairs(df, $"u", $"i", 2L, 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("transitions: lead-pair counts with deterministic tie-break, ppm rows sum to <= 1e6") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "a", 3L, 3L),
      (2L, "a", 1L, 4L), (2L, "a", 1L, 5L), (2L, "c", 2L, 6L)) // tie at ts=1 → id order
      .toDF("u", "s", "t", "k")
    val got = operators.Cooccur.transitions(ev, $"u", $"s", $"t", $"k")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(p => (p._1, p._2))
    // seqs: u1: a→b→a; u2: a→a→c. pairs: (a,b)=1,(b,a)=1,(a,a)=1,(a,c)=1
    assert(got.toSeq == Seq(
      ("a", "a", 1L, 333333L), ("a", "b", 1L, 333333L), ("a", "c", 1L, 333333L),
      ("b", "a", 1L, 1000000L)))
    // per-state ppm never exceeds 1e6 in total
    got.groupBy(_._1).foreach { case (_, g) => assert(g.map(_._4).sum <= 1000000L) }
  }

  // ------------------------------------------------------------ HITS

  test("hits: star graph separates hubs from authorities; L1 mass ~scale") {
    import spark.implicits._
    // 0 → {1,2,3}: node 0 is a pure hub, 1..3 pure authorities
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = graft.plans.Hits.run(e, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 1000000L, 0L),
      (1L, 0L, 333333L), (2L, 0L, 333333L), (3L, 0L, 333333L)))
    // two-hub asymmetry: 4 also points at 1 — 1 gains authority
    val e2 = e.union(Seq((4L, 1L)).toDF("src", "dst"))
    val g2 = graft.plans.Hits.run(e2, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g2(1L)._2 > g2(2L)._2) // auth(1) > auth(2)
    assert(g2(0L)._1 > g2(4L)._1) // 0 points at more authority mass
    // each vector's L1 mass stays within floor loss of the scale
    val hubSum = g2.values.map(_._1).sum
    val authSum = g2.values.map(_._2).sum
    assert(hubSum <= 1000000L && hubSum >= 999990L)
    assert(authSum <= 1000000L && authSum >= 999990L)
  }

  // ------------------------------------------- KG training negatives

  test("kg negatives: deterministic sha draws match a JVM reference; filtered flags exact") {
    import spark.implicits._
    val triples = Seq(
      (1L, "likes", 2L), (1L, "likes", 3L), (2L, "knows", 1L),
      (3L, "likes", 1L), (0L, "knows", 3L))
      .toDF("h", "r", "t")
    val n = 4L
    val got = operators.KgTrain.corruptedNegatives(triples, $"h", $"r", $"t", n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
      .sortBy(p => (p._1, p._2, p._3))

    def sha52(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.substring(0, 13)
      java.lang.Long.parseLong(hex, 16)
    }
    val truth = Set((1L, "likes", 2L), (1L, "likes", 3L), (2L, "knows", 1L),
      (3L, "likes", 1L), (0L, "knows", 3L))
    val want = truth.toSeq.sortBy(p => (p._1, p._2, p._3)).map { case (h, r, t) =>
      val tn = sha52(s"$h|$r|$t|T") % n
      val hn = sha52(s"$h|$r|$t|H") % n
      (h, r, t, tn, hn, truth.contains((h, r, tn)), truth.contains((hn, r, t)))
    }
    assert(got.toSeq == want)
    // at nEntities=4 some corruption must collide with a true triple —
    // the filtered protocol has something to flag (sanity of the fixture)
    assert(got.exists(p => p._6 || p._7))
  }

  // --------------------------------------------- Louvain local move

  test("louvain local move: matches a brute-force gain argmax; bridge node stays put") {
    import spark.implicits._
    // two triangles bridged by 2–3; singleton start communities
    val edgeSeq = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val e = edgeSeq.toDF("a", "b")
    val nodes = (0L to 5L)
    val comms = nodes.map(i => (i, i)).toDF("id", "comm")
    val got = graft.plans.Louvain.localMoveRound(e, comms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1)

    // brute-force reference of the same scoring
    val und = edgeSeq.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val m = und.size.toLong
    val deg = nodes.map(i => i -> und.count(p => p._1 == i || p._2 == i).toLong).toMap
    val commOf = nodes.map(i => i -> i).toMap
    def nbrs(i: Long) = und.collect { case (a, b) if a == i => b; case (a, b) if b == i => a }
    val want = nodes.map { i =>
      val cands = (nbrs(i).map(commOf) :+ commOf(i)).distinct
      val scored = cands.map { c =>
        val kic = nbrs(i).count(commOf(_) == c).toLong
        val tot = nodes.filter(commOf(_) == c).map(deg).sum
        val score = 4L * m * kic - 2L * deg(i) *
          (tot - (if (c == commOf(i)) deg(i) else 0L))
        (c, score)
      }
      val best = scored.minBy { case (c, s) => (-s, c) }
      val stay = scored.find(_._1 == commOf(i)).get._2
      (i, commOf(i), best._1, best._2, stay, best._1 != commOf(i))
    }
    assert(got.toSeq == want)
    // from singletons every node gains by joining SOME neighbor
    assert(got.forall(_._6))
    // the argmax tie-break is the smallest community id: node 1's
    // neighbors 0 and 2 are symmetric (same degree) → joins comm 0
    assert(got(1)._3 == 0L)
  }

  test("louvain weighted round: unit weights == unweighted round; loops/weights match brute force") {
    import spark.implicits._
    val edgeSeq = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val e = edgeSeq.toDF("a", "b")
    val ew = edgeSeq.map { case (a, b) => (a, b, 1L) }.toDF("a", "b", "w")
    val comms = (0L to 5L).map(i => (i, i)).toDF("id", "comm")
    val plainR = graft.plans.Louvain.localMoveRound(e, comms)
      .orderBy("id").collect().map(_.toSeq)
    val weightR = graft.plans.Louvain.localMoveRoundWeighted(ew, comms)
      .orderBy("id").collect().map(_.toSeq)
    assert(plainR.toSeq == weightR.toSeq)

    // weighted multigraph WITH a self-loop and parallel edges:
    // 0-1 (w 2+3 merged), 1-2 (w 1), loop 2-2 (w 4), 2-3 (w 2)
    val wg = Seq((0L, 1L, 2L), (1L, 0L, 3L), (1L, 2L, 1L), (2L, 2L, 4L), (2L, 3L, 2L))
      .toDF("a", "b", "w")
    val wnodes = 0L to 3L
    val wcomms = wnodes.map(i => (i, i)).toDF("id", "comm")
    val got = graft.plans.Louvain.localMoveRoundWeighted(wg, wcomms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    // brute force with the documented conventions
    val und = Map((0L, 1L) -> 5L, (1L, 2L) -> 1L, (2L, 2L) -> 4L, (2L, 3L) -> 2L)
    val m = und.values.sum
    def wOf(i: Long, j: Long) = und.getOrElse((math.min(i, j), math.max(i, j)), 0L)
    val deg = wnodes.map(i => i ->
      (wnodes.filter(_ != i).map(j => wOf(i, j)).sum + 2L * und.getOrElse((i, i), 0L))).toMap
    val commOf = wnodes.map(i => i -> i).toMap
    val want = wnodes.map { i =>
      val nbrC = wnodes.filter(j => j != i && wOf(i, j) > 0).map(commOf)
      val cands = (nbrC :+ commOf(i)).distinct
      val scored = cands.map { c =>
        val kic = wnodes.filter(j => j != i && commOf(j) == c).map(j => wOf(i, j)).sum
        val tot = wnodes.filter(commOf(_) == c).map(deg).sum
        (c, 4L * m * kic - 2L * deg(i) * (tot - (if (c == commOf(i)) deg(i) else 0L)))
      }
      val best = scored.minBy { case (c, s) => (-s, c) }
      (i, commOf(i), best._1, best._2, scored.find(_._1 == commOf(i)).get._2,
        best._1 != commOf(i))
    }
    assert(got.toSeq == want)
  }

  test("louvain coarsen: inter weights sum to super-edges, intra (incl. loops) to self-loops") {
    import spark.implicits._
    val wg = Seq((0L, 1L, 2L), (1L, 0L, 3L), (1L, 2L, 1L), (2L, 2L, 4L), (2L, 3L, 2L),
      (3L, 4L, 7L)).toDF("a", "b", "w")
    val comm = Seq((0L, 10L), (1L, 10L), (2L, 20L), (3L, 20L), (4L, 20L)).toDF("id", "comm")
    val got = graft.plans.Louvain.coarsen(wg, comm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(p => (p._1, p._2))
    // intra(10) = 0-1 merged 5; inter(10,20) = 1-2 w1; intra(20) = loop 4 + 2-3 w2 + 3-4 w7
    assert(got.toSeq == Seq((10L, 10L, 5L), (10L, 20L, 1L), (20L, 20L, 13L)))
    // modularity invariance across coarsening: Σ_c (4m·L_c − D_c²) computed
    // on the fine graph under `comm` equals the coarse graph's value under
    // singleton communities, with L_c/D_c in the weighted conventions
    def scaledQ(edges: Seq[(Long, Long, Long)], cOf: Map[Long, Long]): Long = {
      val m = edges.map(_._3).sum
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val deg = nodes.map(i => i -> (edges.collect {
        case (a, b, w) if a == i && b == i => 2L * w
        case (a, b, w) if a == i || b == i => w
      }.sum)).toMap
      val comms = cOf.values.toSeq.distinct
      comms.map { c =>
        val lc = edges.collect { case (a, b, w) if cOf(a) == c && cOf(b) == c => w }.sum
        val dc = nodes.filter(cOf(_) == c).map(deg).sum
        4L * m * lc - dc * dc
      }.sum
    }
    val fine = Seq((0L, 1L, 5L), (1L, 2L, 1L), (2L, 2L, 4L), (2L, 3L, 2L), (3L, 4L, 7L))
    val fineQ = scaledQ(fine, Map(0L -> 10L, 1L -> 10L, 2L -> 20L, 3L -> 20L, 4L -> 20L))
    val coarseQ = scaledQ(got.toSeq, Map(10L -> 10L, 20L -> 20L))
    assert(fineQ == coarseQ)
  }

  test("louvain weighted round: deterministic across repartitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(89)
    val edges = Seq.fill(80)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong,
      rnd.nextInt(5).toLong + 1L)).filter(e => e._1 != e._2)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val comms = nodes.map(i => (i, i % 4)).toDF("id", "comm")
    val a = graft.plans.Louvain.localMoveRoundWeighted(
        edges.toDF("a", "b", "w").repartition(1), comms)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = graft.plans.Louvain.localMoveRoundWeighted(
        edges.toDF("a", "b", "w").repartition(11), comms)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.toSeq == b.toSeq, "integer-argmax round must be partitioning-invariant")
  }

  test("louvain cluster: recovers planted cliques; modularity strictly improves over singletons") {
    import spark.implicits._
    // two 5-cliques bridged by one edge
    val cliqueA = for (i <- 0 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 to 14; j <- (i + 1) to 14) yield (i.toLong, j.toLong)
    val e = (cliqueA ++ cliqueB :+ ((4L, 10L))).toDF("a", "b")
    val got = graft.plans.Louvain.cluster(e, maxLevels = 4, maxRoundsPerLevel = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // each clique lands in ONE community; the two differ
    val ca = (0L to 4L).map(got).distinct
    val cb = (10L to 14L).map(got).distinct
    assert(ca.size == 1 && cb.size == 1 && ca.head != cb.head)
    val comm = got.toSeq.toDF("id", "comm")
    val qFinal = graft.plans.Modularity.scaled(e, comm)
      .agg(sum("contrib")).first().getLong(0)
    val singles = got.keys.toSeq.map(i => (i, i)).toDF("id", "comm")
    val qSingle = graft.plans.Modularity.scaled(e, singles)
      .agg(sum("contrib")).first().getLong(0)
    assert(qFinal > qSingle)
  }
}
