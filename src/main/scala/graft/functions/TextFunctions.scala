package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (SURVEY §2.9 + the training-data-pipeline
  * extensions): everything here is composed from codegen'd built-ins (or the
  * native expressions in TextExpressions) — no Scala UDFs in the hot path.
  */
object TextFunctions {

  /** T1 (data_transformation_helpers.py:49-57): repair + normalize text as
    * ONE composed pass, in ftfy `fix_text`'s stage order — HTML unescape →
    * encoding repair (mojibake) → NFKC → quote uncurling — followed by the
    * reference's regex sanitize (unescape `\"` → collapse newlines →
    * collapse whitespace → trim). Stage notes:
    *  - unescape = [[decodeHtmlEntities]] (ftfy's `unescape_html`, which
    *    `fix_text` runs before `fix_encoding`);
    *  - mojibake repair is the algorithmic cp1252/latin-1 round-trip
    *    (TextKernels.fixMojibake; whole-string conservative — see its doc.
    *    Composition consequence: an entity that decodes to a NON-ASCII,
    *    non-byte-mappable char suppresses repair for that string — the
    *    documented whole-string deviation, now observable through this
    *    chain);
    *  - NFKC (custom codegen'd expression);
    *  - uncurl = ftfy's `uncurl_quotes` default (“ ” → ", ‘ ’ → ') as one
    *    `translate` pass — NFKC does NOT uncurl these four, so the step is
    *    order-independent w.r.t. NFKC but kept after it as ftfy does.
    * All codegen'd. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          translate(
            TextExpressions.nfkc(
              TextExpressions.fixMojibake(decodeHtmlEntities(c))),
            "“”‘’", "\"\"''"),
          "\\\\\"", "\""),
        "[\\n\\r]+", " "),
      "\\s+", " "))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\S+"), lit(0)))

  /** BPE-ish token count: letter runs, digit runs, single punctuation —
    * a deterministic JVM proxy for subword tokenizers (SURVEY §7.5 risk 3).
    * Pattern avoids lookahead so the same regex runs on RE2 (DuckDB). */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpeTokenPattern), lit(0)))

  /** Stopword dictionaries for the language-ID heuristic (n-gram/stopword
    * scoring — the classic trigram approach reduced to its top signal). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "zhe4", "men5", "bu4"))

  /** Language-ID: score = |tokens ∩ stopwords(lang)|, pick argmax with
    * alphabetical tie-break; 'und' when no stopword hits at all. Pure
    * column expressions (array_intersect over a split), so it stays in
    * codegen and distributes trivially. */
  def langId(text: Column): Column = {
    val tokens = split(lower(text), "\\s+")
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(tokens, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax: sort (score asc, lang desc) and take the last = highest score,
    // alphabetically-first lang on ties.
    val best = element_at(
      array_sort(
        array(scores: _*),
        (l, r) => when(l.getField("score") < r.getField("score"), -1)
          .when(l.getField("score") > r.getField("score"), 1)
          .when(l.getField("lang") > r.getField("lang"), -1)
          .when(l.getField("lang") < r.getField("lang"), 1)
          .otherwise(0)),
      -1)
    when(best.getField("score") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Quality score: 0.5 * stopword-token ratio + 0.5 * (1 - punctuation
    * ratio) — the length/punct/stopword composite from the brief. Ratios
    * come from integer counts, so the double math is two divisions + one
    * add (bit-identical across engines); callers round for output. */
  def qualityScore(text: Column): Column = {
    val toks = regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))
    val nToks = greatest(size(toks), lit(1))
    val stopHits = size(filter(toks, t => t.isin(stopwords("en"): _*)))
    val nPunct = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
    val nChars = greatest(length(text), lit(1))
    stopHits.cast("double") / nToks * 0.5 +
      (lit(1.0) - nPunct.cast("double") / nChars) * 0.5
  }

  /** HTML character-reference decoding — a measured slice of ftfy's long
    * tail (T1's documented gap: the reference normalizes crawled text
    * with ftfy, whose unescape stage resolves `&amp;`-style references;
    * data_transformation_helpers.py:20-86). Composed entirely from
    * codegen'd built-ins, preference (a) — no UDF, no custom expression:
    *
    *  - numeric refs (`&#65;` decimal, `&#x1F600;` hex) via split on the
    *    literal `&#`, a per-piece prefix parse, and codepoint → string
    *    through `decode(unhex(lpad(hex(n))), 'UTF-32')` — full Unicode
    *    (Spark's `chr` is Latin-1-only); DuckDB replays with `chr(n)`;
    *  - guards: codepoint ∈ [1, 0x10FFFF] and NOT a surrogate
    *    (0xD800–0xDFFF) — out-of-range refs stay LITERAL text in both
    *    engines instead of one erroring and the other emitting U+FFFD;
    *  - named refs: the FULL HTML 4.01 named set (252 entities — Latin-1,
    *    Greek, punctuation/symbols, markup; r16 ftfy-parity audit closed
    *    the `&eacute;`-class gap) via ONE split-on-`&` pass with a
    *    constant-folded literal lookup map — O(1) in entity-set size vs
    *    the former per-entity regexp_replace chain. Unknown names (the
    *    HTML5-only math long tail) stay literal. `&nbsp;` → plain space,
    *    its NFKC image — keeps the oracle free of NBSP byte plumbing;
    *    exactly one decode level resolves per pass (`&amp;amp;` →
    *    `&amp;`, not `&` — the split happens before any `&` re-emerges).
    *
    * Documented deviation from a single-scan html.unescape: the numeric
    * pass runs before the named passes, so ANY named entity assembled
    * from a numeric reference double-decodes — `&#38;lt;` → `<` (the `&`
    * materializes first, completing `&lt;`), and likewise forms like
    * `&&#97;mp;` → `&` where single-scan html.unescape leaves `&lt;` /
    * `&amp;` respectively. Irrelevant on real corpora. */
  def decodeHtmlEntities(c: Column): Column = {
    // codepoint → one-char string, exact for any valid scalar value
    def chrU(n: Column): Column =
      decode(unhex(lpad(hex(n), 8, "0")), "UTF-32")
    def validCp(n: Column): Column =
      n.between(1, 0x10FFFF) && !n.between(0xD800, 0xDFFF)
    def decodePiece(p: Column): Column = {
      val decCode = regexp_extract(p, "^([0-9]{1,7});", 1).cast("int")
      val hexCode = conv(regexp_extract(p, "^[xX]([0-9a-fA-F]{1,6});", 1), 16, 10)
        .cast("int")
      when(p.rlike("^[0-9]{1,7};") && validCp(decCode),
        concat(chrU(decCode), regexp_replace(p, "^[0-9]{1,7};", "")))
        .when(p.rlike("^[xX][0-9a-fA-F]{1,6};") && validCp(hexCode),
          concat(chrU(hexCode), regexp_replace(p, "^[xX][0-9a-fA-F]{1,6};", "")))
        .otherwise(concat(lit("&#"), p))
    }
    val pieces = split(c, "&#", -1)
    val numeric = concat(
      element_at(pieces, 1),
      aggregate(
        transform(slice(pieces, lit(2), greatest(size(pieces) - 1, lit(0))),
          p => decodePiece(p)),
        lit(""), (acc, x) => concat(acc, x)))
    // named pass: split on '&', per-piece name lookup against the
    // constant-folded map (CreateMap of literals folds to one MapData at
    // plan time). try_element_at, not element_at: ANSI mode (Spark 4
    // default) makes a missing map key an ERROR, and unknown entity
    // names must stay literal text.
    val entMap = map(namedEntityPairs.flatMap {
      case (k, v) => Seq(lit(k), lit(v))
    }: _*)
    def decodeNamed(p: Column): Column = {
      val rep = try_element_at(entMap,
        regexp_extract(p, "^([a-zA-Z][a-zA-Z0-9]{1,31});", 1))
      when(rep.isNotNull,
        concat(rep, regexp_replace(p, "^[a-zA-Z][a-zA-Z0-9]{1,31};", "")))
        .otherwise(concat(lit("&"), p))
    }
    val np = split(numeric, "&", -1)
    concat(
      element_at(np, 1),
      aggregate(
        transform(slice(np, lit(2), greatest(size(np) - 1, lit(0))),
          p => decodeNamed(p)),
        lit(""), (acc, x) => concat(acc, x)))
  }

  /** HTML 4.01's complete named character reference set (96 Latin-1 +
    * Greek + symbol + special blocks of the spec's three entity DTDs),
    * built from codepoints so no literal can hide a typo. The single
    * deviation: `nbsp` maps to a plain space — U+00A0's NFKC image —
    * matching the composed normalizeText chain (see decodeHtmlEntities
    * doc). */
  private lazy val namedEntityPairs: Seq[(String, String)] = {
    // HTMLlat1: names for U+00A0..U+00FF, in codepoint order
    val latin1 = ("nbsp iexcl cent pound curren yen brvbar sect uml copy " +
      "ordf laquo not shy reg macr deg plusmn sup2 sup3 acute micro para " +
      "middot cedil sup1 ordm raquo frac14 frac12 frac34 iquest Agrave " +
      "Aacute Acirc Atilde Auml Aring AElig Ccedil Egrave Eacute Ecirc " +
      "Euml Igrave Iacute Icirc Iuml ETH Ntilde Ograve Oacute Ocirc " +
      "Otilde Ouml times Oslash Ugrave Uacute Ucirc Uuml Yacute THORN " +
      "szlig agrave aacute acirc atilde auml aring aelig ccedil egrave " +
      "eacute ecirc euml igrave iacute icirc iuml eth ntilde ograve " +
      "oacute ocirc otilde ouml divide oslash ugrave uacute ucirc uuml " +
      "yacute thorn yuml").split(" ").toSeq
      .zipWithIndex.map { case (n, i) => n -> (0xA0 + i) }
    // HTMLsymbol: Greek letters (capital Sigma block skips U+03A2)
    val greek =
      ("Alpha Beta Gamma Delta Epsilon Zeta Eta Theta Iota Kappa Lambda " +
        "Mu Nu Xi Omicron Pi Rho").split(" ").toSeq
        .zipWithIndex.map { case (n, i) => n -> (0x391 + i) } ++
      "Sigma Tau Upsilon Phi Chi Psi Omega".split(" ").toSeq
        .zipWithIndex.map { case (n, i) => n -> (0x3A3 + i) } ++
      ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda " +
        "mu nu xi omicron pi rho sigmaf sigma tau upsilon phi chi psi " +
        "omega").split(" ").toSeq
        .zipWithIndex.map { case (n, i) => n -> (0x3B1 + i) } ++
      Seq("thetasym" -> 0x3D1, "upsih" -> 0x3D2, "piv" -> 0x3D6)
    // HTMLsymbol: letterlike, arrows, math, misc technical, shapes
    val symbol = Seq(
      "fnof" -> 0x192, "bull" -> 0x2022, "hellip" -> 0x2026,
      "prime" -> 0x2032, "Prime" -> 0x2033, "oline" -> 0x203E,
      "frasl" -> 0x2044, "weierp" -> 0x2118, "image" -> 0x2111,
      "real" -> 0x211C, "trade" -> 0x2122, "alefsym" -> 0x2135,
      "larr" -> 0x2190, "uarr" -> 0x2191, "rarr" -> 0x2192,
      "darr" -> 0x2193, "harr" -> 0x2194, "crarr" -> 0x21B5,
      "lArr" -> 0x21D0, "uArr" -> 0x21D1, "rArr" -> 0x21D2,
      "dArr" -> 0x21D3, "hArr" -> 0x21D4, "forall" -> 0x2200,
      "part" -> 0x2202, "exist" -> 0x2203, "empty" -> 0x2205,
      "nabla" -> 0x2207, "isin" -> 0x2208, "notin" -> 0x2209,
      "ni" -> 0x220B, "prod" -> 0x220F, "sum" -> 0x2211,
      "minus" -> 0x2212, "lowast" -> 0x2217, "radic" -> 0x221A,
      "prop" -> 0x221D, "infin" -> 0x221E, "ang" -> 0x2220,
      "and" -> 0x2227, "or" -> 0x2228, "cap" -> 0x2229, "cup" -> 0x222A,
      "int" -> 0x222B, "there4" -> 0x2234, "sim" -> 0x223C,
      "cong" -> 0x2245, "asymp" -> 0x2248, "ne" -> 0x2260,
      "equiv" -> 0x2261, "le" -> 0x2264, "ge" -> 0x2265, "sub" -> 0x2282,
      "sup" -> 0x2283, "nsub" -> 0x2284, "sube" -> 0x2286,
      "supe" -> 0x2287, "oplus" -> 0x2295, "otimes" -> 0x2297,
      "perp" -> 0x22A5, "sdot" -> 0x22C5, "lceil" -> 0x2308,
      "rceil" -> 0x2309, "lfloor" -> 0x230A, "rfloor" -> 0x230B,
      "lang" -> 0x2329, "rang" -> 0x232A, "loz" -> 0x25CA,
      "spades" -> 0x2660, "clubs" -> 0x2663, "hearts" -> 0x2665,
      "diams" -> 0x2666)
    // HTMLspecial: markup-significant + internationalization (+ XML apos)
    val special = Seq(
      "quot" -> 0x22, "amp" -> 0x26, "lt" -> 0x3C, "gt" -> 0x3E,
      "apos" -> 0x27, "OElig" -> 0x152, "oelig" -> 0x153,
      "Scaron" -> 0x160, "scaron" -> 0x161, "Yuml" -> 0x178,
      "circ" -> 0x2C6, "tilde" -> 0x2DC, "ensp" -> 0x2002,
      "emsp" -> 0x2003, "thinsp" -> 0x2009, "zwnj" -> 0x200C,
      "zwj" -> 0x200D, "lrm" -> 0x200E, "rlm" -> 0x200F,
      "ndash" -> 0x2013, "mdash" -> 0x2014, "lsquo" -> 0x2018,
      "rsquo" -> 0x2019, "sbquo" -> 0x201A, "ldquo" -> 0x201C,
      "rdquo" -> 0x201D, "bdquo" -> 0x201E, "dagger" -> 0x2020,
      "Dagger" -> 0x2021, "permil" -> 0x2030, "lsaquo" -> 0x2039,
      "rsaquo" -> 0x203A, "euro" -> 0x20AC)
    (latin1 ++ greek ++ symbol ++ special).map {
      case ("nbsp", _) => "nbsp" -> " "
      case (n, cp) => n -> new String(Character.toChars(cp))
    }
  }

  /** N5 (data_transformation_helpers.py:123-158): order-preserving dedup +
    * Oxford-comma natural-language join ("A, B, and C"). */
  def oxfordJoin(arr0: Column): Column = {
    val arr = array_distinct(arr0)
    val n = size(arr)
    when(n <= 0, lit(""))
      .when(n === 1, element_at(arr, 1))
      .when(n === 2, concat(element_at(arr, 1), lit(" and "), element_at(arr, 2)))
      .otherwise(concat(
        array_join(slice(arr, lit(1), n - 1), ", "),
        lit(", and "), element_at(arr, -1)))
  }

  /** T5: chunk-id synthesis (extract_artists_articles.py:199-200). */
  def chunkId(docId: Column, idx: Column): Column =
    concat(docId, lit("_chunk_"), idx + 1)

  /** T6: content-addressed doc id — first 32 hex chars of SHA-256 over
    * "article-id" (chroma_helpers.py:111-124). */
  def contentDocId(article: Column, id: Column): Column =
    substring(sha2(concat_ws("-", article, id), 256), 1, 32)

  /** PII scrubbing for training corpora (C4-style): emails then
    * phone-shaped numbers → placeholder tokens. RE2-safe patterns (no
    * lookaround) so the identical regexes run under DuckDB/Go/Rust regex
    * engines; order matters — emails first, so their digits can't
    * half-match as phones.
    *
    * The phone pattern requires phone-shaped structure instead of "any
    * 8+ char digit/punct run" — three alternatives, leftmost-first in
    * both engines:
    *  1. international: `+`CC then 2-4 SPACE-separated 2-4-digit groups
    *     (space-only separators keep Wikidata `+1988-00-00` time strings
    *     unredacted — the reference's T9 date shape);
    *  2. any unbroken run of 10+ digits (contiguous phones, and the
    *     C4-style over-caution that also swallows card-like numbers
    *     whole rather than leaking their tail digits);
    *  3. NANP: optional `+`CC, 3-3-4 groups, single ` `/`.`/`-`
    *     separators.
    * Dates (2026/08/12, 2026-08-12), decimals (1234.5678), prices, IPs,
    * and short IDs pass through (negative cases in TextStatsSpec). */
  def redactPii(c: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+[0-9]{1,3}( [0-9]{2,4}){2,4}|[0-9]{10,}|" +
      "\\+?([0-9]{1,3}[ .-]?)?\\(?[0-9]{3}\\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}"
    regexp_replace(regexp_replace(c, email, "<EMAIL>"), phone, "<PHONE>")
  }
}
