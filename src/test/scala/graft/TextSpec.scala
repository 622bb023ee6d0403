package graft

import graft.functions.{TextFunctions => T}
import graft.text.{Chunker, Sections}
import org.apache.spark.sql.functions._

/** Pure-function + generator tests ported from the reference's test corpus
  * (SURVEY §5.2 item 1: chunker, section parser, normalize, Oxford join). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  // --- fastWordTokens (r16): engine-level pin that the ASCII fast path +
  // fallback composition is row-identical to the built-ins it replaces ---

  test("fastWordTokens equals regexp_extract_all(lower) on mixed input") {
    val rows = Seq(
      "Simple ASCII words 123", "ALL CAPS AND-HYPHENS", "a", "7", "",
      "   ", "no1Match2Gap3", "tabs\tand\nnewlines", "punct!@#$%^&*()",
      "unicode café naïve ÉTÉ", "中文 mixed ascii 42", "İstanbul I ı",
      "ﬁ ligature", "emoji 🙂 here", null)
    val df = rows.toDF("t")
    val got = df.select(
      graft.functions.TextExpressions.fastWordTokens(col("t")).as("a"),
      regexp_extract_all(lower(col("t")), lit("[a-z0-9]+"), lit(0)).as("b"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  // --- Sections (T2; reference wikipedia_helpers.py:104-152 semantics) ---

  test("sections: intro + headers + stop at excluded + min length") {
    val text =
      "Intro text long enough to pass the minimum length filter.\n" +
        "== History ==\n" +
        "History body that is also long enough to be kept here.\n" +
        "== Tiny ==\n" +
        "short\n" +
        "== References ==\n" +
        "Bibliography content that must never appear in the output."
    val out = Sections.parse(text)
    assert(out.map(_._1) == Seq("Introduction", "History")) // Tiny < 30 chars, References stops
    assert(out.forall(_._2.length >= 30))
  }

  test("sections: no headers → single Introduction; short doc → empty") {
    assert(Sections.parse("A document body without any headers at all, kept whole.")
      .map(_._1) == Seq("Introduction"))
    assert(Sections.parse("too short").isEmpty)
  }

  // --- Chunker (T3) ---

  test("fixed chunker: coverage, overlap, and count invariants") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val chunks = Chunker.fixedChunks(text, size = 200, overlap = 50)
    assert(chunks.length == Chunker.nChunks(text.length, 200, 50))
    assert(chunks.head.length == 200)
    // stride coverage: chunk i starts at i*150
    assert(chunks(1) == text.substring(150, 350))
    // overlap: tail-50 of chunk i == head-50 of chunk i+1
    assert(chunks(0).takeRight(50) == chunks(1).take(50))
    // total coverage: concatenating stride-prefixes reconstructs the text
    val rebuilt = chunks.init.map(_.take(150)).mkString + chunks.last
    assert(rebuilt == text)
  }

  test("recursive chunker: respects separators, size cap, non-empty coverage") {
    val text = ("Sentence one is here. " * 6 + "\n\n") * 5
    val chunks = Chunker.recursiveChunks(text, size = 100, overlap = 20)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 120)) // size + carried overlap bound
    // every sentence survives somewhere
    assert(chunks.mkString(" ").contains("Sentence one is here."))
  }

  test("token chunker: calibrated to the reference's measured chunk rate (±5%)") {
    // The reference chunks 4,681 articles into 30,005 chunks at
    // 2048-token windows / 512-token overlap (README.md:422-423 +
    // settings.py:126-127 via /root/reference) — 6.410 chunks/article.
    // Build a deterministic article-shaped fixture whose per-article
    // token masses follow that rate under the closed-form window count,
    // then assert the GREEDY separator-cascade packer (piece-granular
    // overlap, data-dependent boundaries) lands within ±5% of the
    // reference total scaled to the fixture — i.e. greedy packing does
    // not drift from the window model on natural text shapes.
    val rnd = new scala.util.Random(42)
    val words = Seq("the", "band", "released", "album", "in", "a",
      "recording", "sessions", "critically", "acclaimed", "tour",
      "guitarist", "of", "and", "their", "second", "studio",
      "international", "chart", "success", "nineteen", "eighty")
    def sentence(): String = {
      val n = 6 + rnd.nextInt(12)
      val s = Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
      s.capitalize + ". "
    }
    def paragraph(): String = Seq.fill(3 + rnd.nextInt(5))(sentence()).mkString
    def article(targetTokens: Int): String = {
      val sb = new StringBuilder
      while (Chunker.proxyTokenLen(sb.toString) < targetTokens) {
        sb.append(paragraph()).append("\n\n")
      }
      sb.toString
    }
    val nArticles = 60
    // Article token masses drawn around the mean the reference's rate
    // implies for 2048/512 windows: 6.41 chunks/article ⇒ under
    // E[ceil(x)] ≈ E[x] + ½ for widely-spread masses, E[(T−512)/1536]
    // = 5.91 ⇒ mean T ≈ 9.6k tokens, with a long-ish tail like real
    // article corpora.
    val targets = Seq.fill(nArticles)(
      (2500 + rnd.nextInt(12000) + rnd.nextInt(6000)).toInt)
    val mean = targets.sum.toDouble / nArticles
    val scaleAdjust = 9590.0 / mean // pin the fixture mean to the implied mean
    val arts = targets.map(t => article(math.max(600, (t * scaleAdjust).toInt)))
    val expected = arts.map(a =>
      Chunker.nChunks(Chunker.proxyTokenLen(a),
        Chunker.RagSizeTokens, Chunker.RagOverlapTokens)).sum
    val actual = arts.map(a => Chunker.tokenChunks(a).length).sum
    val refRate = 30005.0 / 4681.0
    val refScaled = refRate * nArticles
    // closed-form fixture total reproduces the reference rate (fixture
    // construction is sound) …
    assert(math.abs(expected - refScaled) / refScaled < 0.05,
      s"fixture drifted: closed-form $expected vs reference-scaled $refScaled")
    // … and the greedy packer agrees with both within ±5%
    assert(math.abs(actual - expected).toDouble / expected < 0.05,
      s"greedy packer drifted: $actual vs closed-form $expected")
    assert(math.abs(actual - refScaled) / refScaled < 0.05,
      s"token chunker off the reference rate: $actual vs $refScaled")
    // every produced chunk respects the token budget
    assert(arts.forall(a =>
      Chunker.tokenChunks(a).forall(c =>
        Chunker.proxyTokenLen(c) <= Chunker.RagSizeTokens)))
  }

  test("chunker explode generator: ids and counts line up") {
    val df = Seq((7L, "x" * 500)).toDF("doc_id", "text")
    val out = Chunker.explode(df, 200, 50).collect()
    assert(out.length == 3 && out.forall(_.n_chunks == 3))
    assert(out.map(_.chunk_id).toSet == Set("7_chunk_1", "7_chunk_2", "7_chunk_3"))
  }

  // --- Scalar text functions ---

  test("normalizeText: NFKC + escape/whitespace sanitation (T1)") {
    val df = Seq("ﬁne  \\\"quoted\\\"\n\nand\r\nmore  spaced").toDF("t")
    val out = df.select(T.normalizeText(col("t"))).as[String].collect()(0)
    assert(out == "fine \"quoted\" and more spaced") // ﬁ→fi (NFKC), quotes unescaped, ws collapsed
  }

  test("fixMojibake: repairs classic ftfy cases, leaves sane text alone") {
    import graft.functions.TextExpressions
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    def damage(s: String): String = new String(s.getBytes(UTF_8), ISO_8859_1)
    def fix(s: String, passes: Int = 2): String =
      Seq(s).toDF("t")
        .select(TextExpressions.fixMojibake(col("t"), passes)).as[String].head()
    // the classic single mis-decodes (ftfy's published examples' shape):
    // latin letters, curly quotes (incl. the cp1252-undefined 0x9D
    // mapped through the C1 control), dashes, ellipsis, currency
    assert(fix("Ã©") == "é")
    assert(fix("Ã¼ber naÃ¯ve") == "über naïve")
    assert(fix("â€œquotedâ€") == "“quoted”")
    assert(fix("donâ€™t â€” ever") == "don’t — ever")
    assert(fix("â€¦ â‚¬99") == "… €99")
    // round-trips: damage is exactly inverted, doubly-damaged needs 2 passes
    val s = "« Smörgåsbord — ﬁne™ Ÿ »"
    assert(fix(damage(s), passes = 1) == s)
    assert(fix(damage(damage(s)), passes = 2) == s)
    // non-Latin scripts round-trip too (all UTF-8 bytes are latin-1-
    // representable, so the mis-decode is always invertible)
    for (t <- Seq("Беларусь", "日本語テキスト", "مرحبا", "🎵 notes"))
      assert(fix(damage(t), passes = 1) == t, s"round-trip $t")
    // conservative non-repairs: correct text, truncated mojibake (invalid
    // UTF-8), and MIXED legit+mojibake stay untouched (whole-string
    // deviation from ftfy's per-segment pass)
    assert(fix("café") == "café")
    assert(fix("plain ascii") == "plain ascii")
    assert(fix("Ã") == "Ã")
    assert(fix("naïve Ã©") == "naïve Ã©")
    // lossy-replacement recovery (round-10 stretch item 8, ftfy's
    // behavior): a byte an earlier decoder destroyed (U+FFFD) loses only
    // its OWN scalar — the rest of the string still repairs, instead of
    // the whole string being abandoned
    assert(fix("donâ€�t â€” ever") == "don�t — ever")
    assert(fix("â€� â‚¬99") == "� €99")
    // …but a � in text with no mojibake stays untouched (no high bytes)
    assert(fix("caf� ok") == "caf� ok")
    // and a � cannot force a repair of otherwise-sane accented text
    assert(fix("café �") == "café �")
    // round-11 review: recovery needs INDEPENDENT mojibake evidence (an
    // intact multi-byte sequence elsewhere) — a sane accented char
    // adjacent to destroyed bytes must NOT collapse into the lost scalar
    assert(fix("café��") == "café��")
    assert(fix("café�™") == "café�™")
    // a destroyed LEAD byte leaves its continuations undecodable — the
    // whole string stays untouched (doc point (b))
    assert(fix("don�€™t â€” x") == "don�€™t â€” x")
    // normalizeText runs repair before NFKC + sanitize
    assert(Seq("Ã©tÃ©  \n x").toDF("t")
      .select(T.normalizeText(col("t"))).as[String].head() == "été x")
  }

  test("ftfy parity audit: published README/docs examples, classified") {
    // r15 verdict item 5: close the T1 long-tail question with DATA. Each
    // case is a published ftfy example (README or readthedocs front page /
    // fixes-explained, public test prose) with ftfy's own output as the
    // target. Classification per case:
    //   repaired     — output == ftfy's output (and != input)
    //   agreed-pass  — input already clean; both leave it alone
    //   non-repair   — output == input where ftfy would fix (the
    //                  documented whole-string-conservative deviation)
    //   MIS-REPAIR   — output != input AND != ftfy's output → a BUG,
    //                  asserted to zero
    import graft.functions.TextExpressions
    def fix(s: String): String =
      Seq(s).toDF("t")
        .select(TextExpressions.fixMojibake(col("t"), 2)).as[String].head()
    // (input, ftfy fix_encoding output) — fix_encoding level: no
    // entity/NFKC/uncurl stages involved
    val cases = Seq(
      // README headline examples
      ("âœ” No problems", "✔ No problems"),
      ("Ã¼nicode", "ünicode"),
      ("ÃºnÃ­Ã§Ã¸dÃ©", "úníçødé"),
      // docs / fixes-explained examples
      ("The Mona Lisa doesnÃ¢â‚¬â„¢t have eyebrows.",
        "The Mona Lisa doesn’t have eyebrows."), // double mis-decode
      ("schÃ¶n", "schön"),
      ("l'humanitÃ©", "l'humanité"),
      ("Ã  perturber la rÃ©flexion", "à perturber la réflexion"),
      ("Ð¿Ñ€Ð¸Ð²ÐµÑ‚", "привет"),       // Cyrillic
      ("Î±Î²Î³ Î´Î­Î»Ï„Î±", "αβγ δέλτα"), // Greek
      ("â€œquotesâ€", "“quotes”"),  // sloppy-cp1252 0x9D C1 control
      ("IÂ´m", "I´m"),                    // A0-range acute via Â prefix
      // already-clean prose: ftfy and the engine both pass through
      ("✔ No problems", "✔ No problems"),
      ("Pure ASCII text.", "Pure ASCII text."),
      ("café", "café"),
      ("日本語テキスト", "日本語テキスト"),
      ("naïve — em dash", "naïve — em dash"),
      // conservative deviations: ftfy's per-segment chunker fixes these,
      // the whole-string discipline refuses (a legit ¯/é beside damage)
      ("¯\\_(ã)_/¯", "¯\\_(ツ)_/¯"),
      ("café â€” naïve", "café — naïve"))
    var repaired, agreedPass, nonRepair = 0
    val misRepairs = Seq.newBuilder[String]
    for ((in, want) <- cases) {
      val out = fix(in)
      if (out == want && out != in) repaired += 1
      else if (out == in && want == in) agreedPass += 1
      else if (out == in) nonRepair += 1
      else misRepairs +=
        s"input <$in>: got <$out>, ftfy says <$want>"
    }
    assert(misRepairs.result().isEmpty,
      s"MIS-REPAIRS (bugs):\n${misRepairs.result().mkString("\n")}")
    // pin the audit counts so a future kernel change that flips a case
    // into either direction is caught (PLANS.md round-16 ledger cites
    // these numbers): 11 repaired, 5 agreed-pass, 2 conservative
    assert(repaired == 11, s"repaired=$repaired")
    assert(agreedPass == 5, s"agreedPass=$agreedPass")
    assert(nonRepair == 2, s"nonRepair=$nonRepair")
    // fix_text-level README examples (entity + NFKC stages compose):
    def norm(s: String): String =
      Seq(s).toDF("t").select(T.normalizeText(col("t"))).as[String].head()
    assert(norm("ＬＯＵＤ　ＮＯＩＳＥＳ") == "LOUD NOISES")
    assert(norm("&eacute;tude") == "étude")
    // fix_text default uncurls quotes — so the double-mojibake apostrophe
    // lands as ASCII ' exactly like ftfy.fix_text
    assert(norm("doesnÃ¢â‚¬â„¢t") == "doesn't")
  }

  test("decodeHtmlEntities: numeric dec/hex, named set, guards, one level per pass") {
    def dec(s: String): String =
      Seq(s).toDF("t").select(T.decodeHtmlEntities(col("t"))).as[String].head()
    // decimal, hex (incl. astral plane — the UTF-32 path, beyond chr's
    // Latin-1 ceiling), named set
    assert(dec("A&#66;C") == "ABC")
    assert(dec("caf&#233;") == "café")
    assert(dec("&#x48;i &#x1F600;!") == "Hi 😀!")
    assert(dec("&lt;b&gt; &quot;q&quot; &apos;a&apos; x&nbsp;y &amp; z") ==
      "<b> \"q\" 'a' x y & z")
    // one decode level per pass: escaped-escape resolves ONE level
    assert(dec("&amp;amp;") == "&amp;")
    // guards: zero, surrogate, out-of-range, malformed — all stay literal
    assert(dec("&#0; &#55296; &#9999999; &#zz; &#x; tail&#") ==
      "&#0; &#55296; &#9999999; &#zz; &#x; tail&#")
    // no-op on clean text; empty and entity-free strings pass through
    assert(dec("plain text, no refs") == "plain text, no refs")
    assert(dec("") == "")
  }

  test("normalizeText composed chain: unescape -> repair -> NFKC -> uncurl order") {
    def norm(s: String): String =
      Seq(s).toDF("t").select(T.normalizeText(col("t"))).as[String].head()
    // every stage on one input: entities, NFKC targets (™→TM, ﬁ→fi),
    // curly quotes uncurled, \" unescaped, newline + runs collapsed
    assert(norm("&lt;i&gt; “café™” ‘x’ ﬁ  \n \\\" end&amp;") ==
      "<i> \"caféTM\" 'x' fi \" end&")
    // ORDER: unescape runs BEFORE repair — entities that decode to
    // mojibake bytes get repaired by the next stage
    assert(norm("&#195;&#169;t&#195;&#169;") == "été")
    // ORDER: exactly one unescape level inside the chain — the
    // html.unescape-compatible nested form stays one level deep
    assert(norm("&amp;#38;") == "&#38;")
    // documented deviations (numeric pass precedes named passes):
    // named entities assembled from numeric refs double-decode
    assert(norm("&#38;lt;") == "<")    // single-scan html.unescape: &lt;
    assert(norm("&&#97;mp;") == "&")   // single-scan html.unescape: &amp;
    // documented composition consequence: an entity decoding to a
    // non-ASCII char makes the whole string non-pure-mojibake, so the
    // conservative whole-string repair backs off (the euro re-encodes to
    // 0x80 which cannot start a UTF-8 sequence)
    assert(norm("&#8364; Ã©") == "€ Ã©")
    assert(norm("Ã©") == "é") // …while the same mojibake alone repairs
    // uncurl is literal (ftfy uncurl_quotes default): all four quotes
    assert(norm("“a” ‘b’") == "\"a\" 'b'")
  }

  test("langId: stopword argmax with und fallback") {
    val df = Seq(
      ("the cat sat on the mat and it is that for", "en"),
      ("el perro y la casa de los gatos en un dia", "es"),
      ("zzz qqq xxx", "und")).toDF("t", "want")
    val out = df.select(T.langId(col("t")), col("want")).as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got == want) }
  }

  test("oxfordJoin: dedup-preserving natural-language list (N5)") {
    // mirrors test_data_transformation_helpers.py:10-29
    val cases = Seq(
      (Seq("A"), "A"),
      (Seq("A", "B"), "A and B"),
      (Seq("A", "B", "C"), "A, B, and C"),
      (Seq("A", "B", "A", "C"), "A, B, and C"), // dedup keeps first occurrence
      (Seq.empty[String], ""))
    val df = cases.toDF("arr", "want")
    df.select(T.oxfordJoin(col("arr")).as("got"), col("want"))
      .as[(String, String)].collect()
      .foreach { case (got, want) => assert(got == want) }
  }

  test("quality score bounds and monotonicity") {
    val df = Seq("the of and to in is that it for a", "!!!???;;;:::").toDF("t")
    val s = df.select(T.qualityScore(col("t"))).as[Double].collect()
    assert(s(0) > 0.9 && s(1) < 0.6)
    assert(s.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("q31 oracle corpus assumptions hold: space-only separators, no oversized words") {
    // The q31 recursive-CTE oracle models ONLY the space-split branch of
    // Chunker.recursiveChunks; this pins the corpus properties that make
    // that reduction exact. If the test-data generator ever emits \n,
    // sentence separators, or >200-char words, this fails loudly instead
    // of q31 producing a confusing hash mismatch.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf/documents.parquet"
      if (new java.io.File(dir).exists()) {
        val bad = spark.read.parquet(dir)
          .filter(col("text").contains("\n") || col("text").contains(". ") ||
            col("text").contains("? ") || col("text").contains("! ") ||
            exists(split(col("text"), " "), w => length(w) > 200))
          .count()
        assert(bad == 0L, s"$sf violates q31 oracle corpus assumptions")
      }
    }
  }
}
