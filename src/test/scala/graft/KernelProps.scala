package graft

import graft.text.{Chunker, Sections}
import graft.functions.TextKernels
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests for the pure kernels (SURVEY §5.2 item 4) —
  * the invariants unit examples can't sweep. */
object KernelProps extends Properties("kernels") {

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 800)
    cs <- Gen.listOfN(n, Gen.frequency(
      (20, Gen.alphaNumChar), (4, Gen.const(' ')), (1, Gen.const('\n')),
      (1, Gen.const('.')), (1, Gen.oneOf('é', 'ü', 'ﬁ', '中'))))
  } yield cs.mkString

  property("fixedChunks covers the text exactly (stride prefixes + last)") =
    Prop.forAll(textGen) { t =>
      val chunks = Chunker.fixedChunks(t, 100, 25)
      val rebuilt =
        if (chunks.length == 1) chunks.head
        else chunks.init.map(_.take(75)).mkString + chunks.last
      rebuilt == t
    }

  property("fixedChunks count matches the closed form; sizes bounded") =
    Prop.forAll(textGen) { t =>
      val chunks = Chunker.fixedChunks(t, 100, 25)
      chunks.length == Chunker.nChunks(t.length, 100, 25) &&
        chunks.forall(_.length <= 100)
    }

  property("consecutive fixed chunks share the overlap") =
    Prop.forAll(textGen.suchThat(_.length > 100)) { t =>
      val chunks = Chunker.fixedChunks(t, 100, 25)
      chunks.sliding(2).forall {
        case Seq(a, b) => b.startsWith(a.takeRight(math.min(25, a.length)))
        case _ => true
      }
    }

  property("recursiveChunks never exceeds size+overlap and loses no ends") =
    Prop.forAll(textGen.suchThat(_.trim.nonEmpty)) { t =>
      val chunks = Chunker.recursiveChunks(t, 100, 25)
      chunks.nonEmpty && chunks.forall(_.length <= 125)
    }

  property("proxyTokenLen: bounded by char length, zero only for whitespace, additive at whitespace joins") =
    Prop.forAll(textGen, textGen) { (a, b) =>
      val la = Chunker.proxyTokenLen(a)
      la <= a.length &&
        (la == 0) == a.forall(Character.isWhitespace) &&
        Chunker.proxyTokenLen(a + " " + b) == la + Chunker.proxyTokenLen(b)
    }

  property("recursiveChunksBy(token): every chunk within the token budget, all substrings of input") =
    Prop.forAll(textGen.suchThat(_.trim.nonEmpty)) { t =>
      val chunks = Chunker.recursiveChunksBy(t, 40, 10, Chunker.proxyTokenLen)
      chunks.nonEmpty &&
        chunks.forall(c => Chunker.proxyTokenLen(c) <= 40) &&
        chunks.forall(t.contains(_))
    }

  property("recursiveChunksBy(token): ends of the text are never lost") =
    Prop.forAll(textGen.suchThat(_.trim.nonEmpty)) { t =>
      val chunks = Chunker.recursiveChunksBy(t, 40, 10, Chunker.proxyTokenLen)
      val tt = t.trim
      chunks.head.startsWith(tt.take(1)) && chunks.last.endsWith(tt.takeRight(1))
    }

  property("sections never emit content below the min length") =
    Prop.forAll(textGen, Gen.choose(0, 60)) { (t, minLen) =>
      Sections.parse(t, minLen).forall(_._2.length >= minLen)
    }

  property("rollingHash is deterministic; equal strings hash equal") =
    Prop.forAll(textGen) { a =>
      val u = UTF8String.fromString(a)
      TextKernels.rollingHash(u) == TextKernels.rollingHash(UTF8String.fromString(a))
    }

  property("rollingHash is order-sensitive (prefix extension changes hash)") =
    Prop.forAll(textGen, Gen.alphaNumChar) { (a, c) =>
      TextKernels.rollingHash(UTF8String.fromString(a)) !=
        TextKernels.rollingHash(UTF8String.fromString(a + c))
    }

  private val packGen = for {
    budget <- Gen.choose(1, 200)
    toks <- Gen.listOf(Gen.choose(1, 300))
  } yield (toks, budget)

  property("packPositions: bins start at 0, grow by at most 1, cover every doc") =
    Prop.forAll(packGen) { case (toks, budget) =>
      val bins = graft.text.Packing.packPositions(toks, budget)
      bins.length == toks.length &&
        (bins.isEmpty || bins.head == 0) &&
        bins.sliding(2).forall {
          case Seq(a, b) => b == a || b == a + 1
          case _ => true
        }
    }

  property("packPositions: bin fills stay within budget unless a single oversized doc") =
    Prop.forAll(packGen) { case (toks, budget) =>
      val bins = graft.text.Packing.packPositions(toks, budget)
      toks.zip(bins).groupBy(_._2).values.forall { docs =>
        docs.map(_._1).sum <= budget || docs.length == 1
      }
    }

  property("packPositions: a new bin opens only on genuine overflow (greedy tightness)") =
    Prop.forAll(packGen) { case (toks, budget) =>
      val bins = graft.text.Packing.packPositions(toks, budget)
      val fills = toks.zip(bins).groupBy(_._2).view.mapValues(_.map(_._1).sum).toMap
      toks.zip(bins).zipWithIndex.drop(1).forall { case ((tok, bin), i) =>
        val prevBin = bins(i - 1)
        bin == prevBin || fills(prevBin) + tok > budget
      }
    }

  // Unicode strings incl. non-BMP (surrogate PAIRS only — lone
  // surrogates are not valid strings and UTF-8 encoding replaces them)
  private val uniGen: Gen[String] = for {
    n <- Gen.choose(0, 200)
    cs <- Gen.listOfN(n, Gen.frequency(
      (10, Gen.alphaNumChar.map(_.toString)), (2, Gen.const(" ")),
      (3, Gen.oneOf("é", "ü", "ß", "–", "—", "“", "”", "€", "™", "…")),
      (2, Gen.oneOf("中", "語", "б", "م")),
      (1, Gen.oneOf("🎵", "🚀"))))
  } yield cs.mkString

  private def fix(s: String, passes: Int): String =
    TextKernels.fixMojibake(UTF8String.fromString(s), passes).toString

  property("fixMojibake inverts a UTF-8→latin-1 mis-decode for ANY string") =
    Prop.forAll(uniGen) { s =>
      val damaged = new String(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      fix(damaged, 1) == s
    }

  property("fixMojibake inverts a double mis-decode in two passes") =
    Prop.forAll(uniGen) { s =>
      def dmg(x: String) = new String(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      fix(dmg(dmg(s)), 2) == s
    }

  property("fixMojibake lossy recovery: one destroyed continuation byte " +
      "loses only its scalar") =
    Prop.forAll(uniGen) { s =>
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // first multi-byte scalar's lead (continuations are < 0xC2, so the
      // first byte >= 0xC2 is a scalar boundary). Recovery requires
      // independent mojibake evidence — a second INTACT multi-byte
      // scalar — so only exercise strings that keep one after the damage
      val leadIdx = bytes.indexWhere(b => (b & 0xFF) >= 0xC2)
      leadIdx < 0 || bytes.count(b => (b & 0xFF) >= 0xC2) < 2 || {
        val lead = bytes(leadIdx) & 0xFF
        val len = if (lead < 0xE0) 2 else if (lead < 0xF0) 3 else 4
        val damaged = new String(
          bytes, java.nio.charset.StandardCharsets.ISO_8859_1).toCharArray
        damaged(leadIdx + len - 1) = '�' // destroy the final continuation
        val prefix = new String(bytes.take(leadIdx),
          java.nio.charset.StandardCharsets.UTF_8)
        val suffix = new String(bytes.drop(leadIdx + len),
          java.nio.charset.StandardCharsets.UTF_8)
        fix(new String(damaged), 1) == prefix + "�" + suffix
      }
    }

  property("fixMojibake leaves already-sane text unchanged") =
    Prop.forAll(uniGen) { s =>
      // sane = contains a non-latin1 char (CJK/emoji make a cp1252
      // re-encode impossible) or is pure ASCII (nothing to repair)
      val sane = s.forall(_ < 0x80) || s.exists(_ > 0x2122)
      !sane || fix(s, 2) == s
    }

  // --- asciiWordTokens (r16): the ASCII fast path must be EXACTLY the
  // regexp_extract_all(lower(s), '[a-z0-9]+') composition it replaces ---

  private val asciiGen: Gen[String] = for {
    n <- Gen.choose(0, 400)
    cs <- Gen.listOfN(n, Gen.frequency(
      (12, Gen.alphaNumChar), (3, Gen.const(' ')), (1, Gen.const('\n')),
      (1, Gen.oneOf('.', ',', '-', '_', '!', '#', '\t', '~', '[', '@'))))
  } yield cs.mkString

  private def refTokens(s: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(s.toLowerCase(java.util.Locale.ROOT)).toSeq

  property("asciiWordTokens equals lower+regex on ASCII input") =
    Prop.forAll(asciiGen) { s =>
      val got = TextKernels.asciiWordTokens(UTF8String.fromString(s))
      got != null &&
        got.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.asInstanceOf[UTF8String].toString).toSeq == refTokens(s)
    }

  property("asciiWordTokens is null exactly on non-ASCII input") =
    Prop.forAll(uniGen) { s =>
      val got = TextKernels.asciiWordTokens(UTF8String.fromString(s))
      (got == null) == s.exists(_ >= 0x80)
    }
}
