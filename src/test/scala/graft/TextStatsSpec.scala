package graft

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.text.TextStats
import org.apache.spark.sql.functions._

/** Corpus-statistics + curation operators: TF-IDF, repetition signals,
  * PII redaction, mixture sampling, bucketed shuffle. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "quantum flux polariton condensate"),
    (4L, "spam spam spam spam spam")
  ).toDF("doc_id", "text")

  test("gopherRules: each rule trips on its designed violation") {
    val good = (Seq("the cat and the dog have a house of sticks that") ++
      Seq.fill(5)("they be living with joy and comfort under the open sky"))
      .mkString(" ") // 66 words, all alphabetic, stop words present
    val cases = Seq(
      (1L, good),
      (2L, "too short to pass"),                       // rule 1: < 50 words
      (3L, Seq.fill(60)("### ...").mkString(" ")),     // rule 3 (+6,7): symbols
      (4L, Seq.fill(60)("- bullet line\n").mkString),  // rule 4: bullet starts
      (5L, (good + "\n") + Seq.fill(10)("trailing off...\n").mkString), // rule 5
      (6L, Seq.fill(60)("12345 67890").mkString(" ")), // rule 6 (+7): no alpha
      (7L, Seq.fill(60)("zebra xylophone").mkString(" "))) // rule 7: no stops
      .toDF("doc_id", "text")
    val out = TextStats.gopherRules(cases, "doc_id", "text")
      .select("doc_id", "pass").as[(Long, Boolean)].collect().toMap
    assert(out(1L), "the good document must pass")
    Seq(2L, 3L, 4L, 6L, 7L).foreach(id =>
      assert(!out(id), s"doc $id must fail its designed rule"))
    // rule 5: >30% of lines end with ellipsis
    assert(!out(5L))
    // signal columns are present and sane for the good doc
    val sig = TextStats.gopherRules(cases.filter($"doc_id" === 1L), "doc_id", "text")
      .select("n_words", "alpha_frac", "n_stop_hits")
      .as[(Long, Double, Long)].head()
    assert(sig._1 == 66L && sig._2 == 1.0 && sig._3 >= 2L)
  }

  test("cooccurrencePmi: hand-computed lift, pair direction, vocab cap, determinism") {
    // 4 docs; (rock, band) together in 2 of 4; (rock, jazz) never.
    // "filler" pads df so every term lands in the vocab cap.
    val docs = Seq(
      (1L, "rock band plays"),
      (2L, "rock band tours"),
      (3L, "jazz trio plays"),
      (4L, "jazz solo tours")).toDF("doc_id", "text")
    val out = TextStats.cooccurrencePmi(docs, "doc_id", "text",
      vocabSize = 20, minPairCount = 2, topK = 50).collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // (band, rock): n_xy=2, df both 2, N=4 → lift = 2·4/(2·2) = 2.0 → 2_000_000 ppm
    assert(byPair(("band", "rock")) == (2L, 2L, 2L, 2000000L))
    // pairs are canonical (x < y): no (rock, band) row
    assert(!byPair.contains(("rock", "band")))
    // (jazz, rock) never co-occur → absent
    assert(!byPair.contains(("jazz", "rock")))
    // minPairCount=2 prunes single co-occurrences like (plays, rock)
    assert(!byPair.contains(("plays", "rock")))
    // deterministic
    val again = TextStats.cooccurrencePmi(docs, "doc_id", "text",
      vocabSize = 20, minPairCount = 2, topK = 50).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("tfidfTopK: corpus-unique terms outrank corpus-common ones") {
    val top = TextStats.tfidfTopK(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(-_._3).map(_._2).toSeq).toMap
    // 'the'/'sat'/'on' appear in docs 1+2 → low idf; 'cat'/'mat' unique to 1
    assert(top(1L).toSet == Set("cat", "mat"))
    assert(top(3L).forall(Set("quantum", "flux", "polariton", "condensate")))
    assert(top(4L) == Seq("spam"))
    // every tfidf >= 0 and k bounds group size
    val all = TextStats.tfidfTopK(docs, "doc_id", "text", k = 2)
    assert(all.groupBy("doc_id").count().agg(max("count")).as[Long].head() <= 2)
  }

  test("repetitionSignals: repeated-token doc maxes top_word_frac") {
    val sig = TextStats.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(sig(4L) == ((0.2, 1.0, 1.0))) // 5x 'spam': 1 distinct of 5
    assert(sig(3L)._1 == 1.0) // all-distinct doc
    assert(sig(1L)._2 == math.rint(2.0 / 6 * 1e6) / 1e6) // 'the' twice of 6
    // single-token doc: bigram frac defined (0), no ANSI element_at error
    val one = TextStats.repetitionSignals(
      Seq((9L, "lonely")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Double, Double, Double)].head()
    assert(one == ((9L, 1.0, 1.0, 0.0)))
  }

  test("vocabulary: frequency order, tie-break, df, and coverage telescopes") {
    val corpus = Seq(
      (1L, "aa aa aa bb bb cc"),
      (2L, "aa bb cc dd"),
      (3L, "aa zz")).toDF("doc_id", "text")
    // cf: aa=5, bb=3, cc=2, dd=1, zz=1 (dd before zz on the tie)
    val v = TextStats.vocabulary(corpus, "doc_id", "text", topV = 4)
      .as[(String, Long, Long, Int, Double)].collect().sortBy(_._4)
    assert(v.map(_._1).toSeq == Seq("aa", "bb", "cc", "dd"))
    assert(v.map(_._2).toSeq == Seq(5L, 3L, 2L, 1L))
    assert(v.map(_._3).toSeq == Seq(3L, 2L, 2L, 1L)) // doc frequencies
    assert(v.map(_._4).toSeq == Seq(1, 2, 3, 4))
    // coverage is cumulative over ALL 12 tokens: 5/12, 8/12, 10/12, 11/12
    val exp = Seq(5.0, 8.0, 10.0, 11.0).map(x => math.rint(x / 12 * 1e6) / 1e6)
    assert(v.map(_._5).toSeq == exp)
  }

  test("redactPii: emails and phone runs replaced, plain text untouched") {
    val in = Seq(
      "mail me at john.doe+x@corp.example.org today",
      "call +1 (555) 010-4242, thanks",
      "or 555-010-4242 or 555.010.4242 or 5550104242",
      "ring +44 20 7946 0958 or +15550100042 direct",
      "card 4111111111111111 and id 12345678901234567 swallowed whole",
      "no pii here, just words and 42").toDF("t")
    val out = in.select(TextFunctions.redactPii(col("t")).as("r")).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "call <PHONE>, thanks")
    assert(out(2) == "or <PHONE> or <PHONE> or <PHONE>")
    assert(out(3) == "ring <PHONE> or <PHONE> direct")
    assert(out(4) == "card <PHONE> and id <PHONE> swallowed whole") // no tail-digit leak
    assert(out(5) == "no pii here, just words and 42")
  }

  test("redactPii: dates, decimals, prices, IPs, short IDs survive") {
    val in = Seq(
      "released 2026/08/12, updated 2026-08-12 at 12.30",
      "born +1988-00-00T00:00:00Z per wikidata", // T9 date-string shape
      "pi is 3.14159 and the total was 1234.56 EUR",
      "host 192.168.001.007 order #12345678 v1.2.3").toDF("t")
    val out = in.select(TextFunctions.redactPii(col("t")).as("r")).as[String].collect()
    assert(out.toSeq == in.as[String].collect().toSeq)
  }

  test("mixtureKeep: per-stratum rates honored and deterministic") {
    val rows = (1L to 4000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val kept = rows.filter(Dedup.mixtureKeep(col("id"), col("lang"),
        Map("en" -> 205), defaultRate256 = 26))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("en") > 1450 && kept("en") < 1750)  // ~80% of 2000
    assert(kept("zh") > 120 && kept("zh") < 290)    // ~10% of 2000
    val again = rows.filter(Dedup.mixtureKeep(col("id"), col("lang"),
        Map("en" -> 205), defaultRate256 = 26))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }

  test("shuffleBuckets: total permutation, dense per-bucket positions") {
    val rows = (1L to 300L).toDF("id")
    val out = Dedup.shuffleBuckets(rows, "id", buckets = 16)
      .select("id", "bucket", "pos").as[(Long, Int, Int)].collect()
    assert(out.length == 300)
    assert(out.map(_._1).toSet == (1L to 300L).toSet) // nothing lost
    assert(out.map(_._2).toSet.subsetOf((0 until 16).toSet))
    // positions within each bucket are exactly 1..size (dense ranking)
    out.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length))
    }
  }

  test("temperatureThresholds: sqrt rebalancing, rarest stratum keeps everything") {
    // 400 'a' / 100 'b' / 25 'c': shares 16:4:1 → sqrt weights 4:2:1 →
    // kept proportions rebalance toward the tail
    val rows = ((1 to 400).map(i => (i.toLong, "a")) ++
      (401 to 500).map(i => (i.toLong, "b")) ++
      (501 to 525).map(i => (i.toLong, "c"))).toDF("id", "lang")
    val th = Dedup.temperatureThresholds(rows, "lang")
      .as[(String, Long, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(th("c") == ((25L, 256))) // rarest: keep everything
    assert(th("a")._2 < th("b")._2 && th("b")._2 < th("c")._2) // monotone in share
    // kept counts ∝ sqrt(n): a→4x c's kept mass, b→2x (up to byte-floor error)
    assert(math.abs(th("a")._2 / 256.0 * 400 - 2 * (th("b")._2 / 256.0 * 100)) < 8)
  }

  test("packGreedy: budget respected, oversized docs isolated, groups independent") {
    val docs = Seq(
      ("a", 1L, 50), ("a", 2L, 60), ("a", 3L, 40), // 50+60 > 100 → [1][2,3]
      ("a", 4L, 150),                              // oversized → own bin
      ("a", 5L, 10),                               // overflow after 150 → new bin
      ("b", 6L, 100), ("b", 7L, 1))                // fresh state per group
      .toDF("source", "doc_id", "n_tokens")
    val out = graft.text.Packing.packGreedy(docs, "source", "doc_id", "n_tokens", budget = 100)
      .collect().map(p => p.doc_id -> p.bin).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3, 6L -> 0, 7L -> 1))
    // per-bin fills never exceed the budget unless the bin is a single
    // oversized doc
    val byBin = graft.text.Packing.packGreedy(docs, "source", "doc_id", "n_tokens", budget = 100)
      .collect().groupBy(p => (p.source, p.bin))
    byBin.values.foreach { ps =>
      assert(ps.map(_.n_tokens).sum <= 100 || ps.length == 1)
    }
  }

  test("bm25TopK: rare query term dominates; hand-computed score matches") {
    // query = {cat, the}: 'cat' appears only in doc 1; 'the' in docs 1-2
    val out = TextStats.bm25TopK(docs, "doc_id", "text",
      terms = Seq("cat", "the"), k = 4)
      .as[(Long, Int, Double)].collect()
    assert(out.head._1 == 1L && out.head._2 == 2) // doc 1 first, both terms hit
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // doc 2 matches only 'the'
    // hand-computed BM25 for doc 2 (tf_the=2, df_the=2, N=4, dl=6, avgdl=5.25)
    val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    val s = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 6 / 5.25))
    assert(math.abs(out(1)._3 - math.rint(s * 1e6) / 1e6) < 1e-9)
  }

  test("invertedIndex: impact-ordered postings, cap leaves df/cf exact") {
    val idx = TextStats.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(idx("the") == ((2L, 4L, "1:2,2:2"))) // tf ties → doc order
    assert(idx("spam") == ((1L, 5L, "4:5")))
    // cap: 'sat' in 2 docs, cap 2 keeps both; 'on' likewise
    assert(idx("sat")._3 == "1:1,2:1")
    val uncapped = TextStats.invertedIndex(docs, "doc_id", "text", maxPostings = 1)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(uncapped("the") == ((2L, 4L, "1:2"))) // df/cf still see all postings
  }

  test("entropySignals: degenerate, uniform, and repetitive-word cases") {
    val d = Seq(
      (1L, "aaaa"),           // one char class → 0 bits
      (2L, "abcd"),           // 4 uniform classes → 2 bits
      (3L, "zz zz zz zz"))    // words all equal → word entropy 0
      .toDF("doc_id", "text")
    val out = TextStats.entropySignals(d, "doc_id", "text")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0.0, 0.0)))
    assert(out(2L)._1 == 2.0 && out(2L)._2 == 0.0) // one 4-char token
    assert(out(3L)._2 == 0.0) // 'zz' repeated → zero word entropy
    assert(out(3L)._1 > 0.0)  // chars 'z' and ' ' mix → positive char entropy
  }

  test("lineFilter: dedups repeated lines, drops short and badword lines") {
    val d = Seq(
      (1L, "good line with plenty of words here\n" +
        "good line with plenty of words here\n" + // exact repeat → dropped
        "too short\n" +                            // < 4 words → dropped
        "spam appears inside this longer line today\n" + // badword → dropped
        "another clean line with enough words too"),
      (2L, "only one short line"))
      .toDF("doc_id", "text")
    val out = TextStats.lineFilter(d, "doc_id", "text",
      minWords = 4, badwords = Seq("spam"))
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 5 && out(1L)._3 == 2)
    assert(out(1L)._4 ==
      "good line with plenty of words here\n" +
        "another clean line with enough words too") // order preserved
    assert(out(2L)._2 == 1 && out(2L)._3 == 1 && out(2L)._4 == "only one short line")
  }

  test("corpusLineDedup: cross-doc boilerplate keeps only the global first occurrence") {
    val banner = "accept all cookies to continue reading"
    val d = Seq(
      (3L, s"unique text of document three\n$banner"),
      (1L, s"$banner\nfirst document body text"),
      (2L, s"second document body text\n$banner\n$banner"))
      .toDF("doc_id", "text")
    val out = TextStats.corpusLineDedup(d, "doc_id", "text", minCount = 2)
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    // the banner appears 4× corpus-wide → only (doc 1, i=0), the global
    // minimum (doc, idx), survives; unique lines all pass
    assert(out(1L) == ((1L, 2, 2, s"$banner\nfirst document body text")))
    assert(out(2L) == ((2L, 3, 1, "second document body text")))
    assert(out(3L) == ((3L, 2, 1, "unique text of document three")))
    // below-threshold duplicates pass: same corpus, minCount = 5
    val loose = TextStats.corpusLineDedup(d, "doc_id", "text", minCount = 5)
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(loose(2L)._3 == 3)
  }

  test("lmScore: common-token docs score lower than rare-token docs") {
    // corpus: 'the' appears 8×, 'xyzzy' once → p(the) >> p(xyzzy)
    val d = Seq(
      (1L, "the the the the"),   // all common tokens
      (2L, "the the the xyzzy"), // one rare token
      (3L, ""))                  // tokenless → no output row
      .toDF("doc_id", "text")
    val out = TextStats.lmScore(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._2 == 4L && out(2L)._2 == 4L)
    assert(out(1L)._3 < out(2L)._3) // rare token raises surprise
    // doc 1 exact: all tokens 'the' with cf=7, T=8 → bits = log2(8/7)
    val expect = math.log(8.0 / 7.0) / math.log(2.0)
    assert(math.abs(out(1L)._3 - BigDecimal(expect)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("heavyHittersExact: matches full groupBy top-k, partition-invariant, honest guarantee") {
    import graft.text.TextStats
    // Zipf-ish corpus: term_i appears ~1000/i times, i = 1..50
    val words = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val docs = words.grouped(97).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    def run(parts: Int, cap: Int) =
      TextStats.heavyHittersExact(docs.repartition(parts), "text", k = 10, capacity = cap)
        .as[(String, Long, Boolean)].collect().toSeq
    val exact = docs.select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t").asc).limit(10)
      .as[(String, Long)].collect().toSeq
    val hh = run(4, cap = 64)
    assert(hh.map(r => (r._1, r._2)) == exact) // exact top-10, exact counts
    assert(hh.forall(_._3), "capacity 64 should prove the guarantee here")
    assert(run(13, cap = 64).map(r => (r._1, r._2)) == exact) // layout-invariant
    // a too-small capacity must SAY so (guarantee_ok false on tail rows),
    // not silently claim exactness
    val tight = run(4, cap = 8)
    assert(tight.exists(!_._3), "cap=8 cannot prove top-10 exactness on 50 terms")
  }

  test("heavyHitters guarantee predicate is overflow-free at 100 TB token counts") {
    // round-9 ADVICE: cnt·(capacity+1) wraps Long once n exceeds ~2.2e15;
    // the shipped predicate is cnt > n div (capacity+1). Replay both forms
    // over corpus-scale literals and check against exact BigInt arithmetic.
    val cap1 = 4097L // capacity 4096 + 1
    val cases = Seq(
      // (cnt, n): a genuinely heavy term in a 9e18-token corpus ...
      (3_000_000_000_000_000L, 9_000_000_000_000_000_000L),
      // ... a light term in the same corpus (must be false)
      (1_000_000L, 9_000_000_000_000_000_000L),
      // boundary: cnt exactly n/(cap+1) — strict inequality → false
      (2_000_000_000_000L, 2_000_000_000_000L * 4097L),
      (2_000_000_000_000L + 1, 2_000_000_000_000L * 4097L))
    val df = cases.toDF("cnt", "n")
    val out = df.select(col("cnt"), col("n"),
        (col("cnt") > expr("n div 4097")).as("got"))
      .as[(Long, Long, Boolean)].collect()
    out.foreach { case (cnt, n, got) =>
      val want = BigInt(cnt) * BigInt(cap1) > BigInt(n)
      assert(got == want, s"cnt=$cnt n=$n: got $got want $want")
      // and the old multiplied form is indeed wrong here (overflow), which
      // is the regression this test pins
      if ((cnt * cap1 > n) != want)
        info(s"multiplied form overflows for cnt=$cnt n=$n (as expected)")
    }
  }

  test("stupidBackoffScore: word order matters, backoff fires on unseen bigrams") {
    import graft.text.TextStats
    val docs = Seq(
      // reference: a consistent word order
      (10L, "the cat sat on the mat"),
      (20L, "the cat sat on the rug"),
      // scored: reference-like order vs the SAME unigrams scrambled
      (1L, "the cat sat on the mat"),
      (3L, "mat the on sat cat the"),
      // scored: reference-unseen unigrams → pure backoff, still finite
      (7L, "zyx wvu tsr qpo"))
      .toDF("doc_id", "text")
    val out = TextStats.stupidBackoffScore(docs, "doc_id", "text",
        isRef = col("doc_id") % 10 === 0)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // every ≥2-token doc scored, including the reference docs themselves
    assert(out.keySet == Set(10L, 20L, 1L, 3L, 7L))
    assert(out(1L)._2 == 5L && out(3L)._2 == 5L)
    // identical unigram mix, scrambled order → strictly higher surprisal
    assert(out(3L)._3 > out(1L)._3,
      s"scrambled ${out(3L)._3} should exceed natural ${out(1L)._3}")
    // all-unseen doc is finite (add-1 terminal) and worst of the three
    assert(!out(7L)._3.isNaN && !out(7L)._3.isInfinite)
    assert(out(7L)._3 > out(3L)._3)
    // determinism
    val again = TextStats.stupidBackoffScore(docs, "doc_id", "text",
        isRef = col("doc_id") % 10 === 0)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(again == out)
  }

  test("importanceWeights: target-like source docs score positive, alien docs negative") {
    import graft.text.TextStats
    val docs = Seq(
      (1L, "en", "cats and dogs play in the garden"),
      (2L, "en", "dogs and cats sleep in the garden"),
      (10L, "de", "cats dogs garden play"),           // target-like source doc
      (11L, "de", "xylophon zebra quark flux umlaut") // alien source doc
    ).toDF("doc_id", "lang", "text")
    val out = TextStats.importanceWeights(docs, "doc_id", "text",
        isTarget = col("lang") === "en")
      .as[(Long, Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    // only SOURCE docs are scored
    assert(out.keySet == Set(10L, 11L))
    assert(out(10L)._2 == 4L && out(11L)._2 == 5L) // token counts
    // the target-like doc reads more target-like than the alien one,
    // is positive (selected), and the alien one is negative
    assert(out(10L)._3 > 0.0 && out(10L)._4)
    assert(out(11L)._3 < 0.0 && !out(11L)._4)
    assert(out(10L)._3 > out(11L)._3)
  }

}
