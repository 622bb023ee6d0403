package graft

/** Shared BPE test corpus + deterministic trainer (used by BpeSpec and
  * the committed-fixture generator BpeFixtureGen). Test-only — the
  * library takes merges as caller data and never trains. */
object BpeTestCorpus {

  /** Classic BPE training (Sennrich 2016), deterministic: merge the
    * most frequent adjacent pair (ties: lexicographically smallest),
    * n rounds or until no pair repeats. Test-only — the library takes
    * merges as data and never trains. */
  def trainMerges(words: Seq[String], n: Int): Seq[(String, String)] = {
    var seqs: Map[Vector[String], Long] =
      words.groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < n && !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((toks, c) <- seqs; i <- 0 until toks.length - 1)
        pc.updateWith((toks(i), toks(i + 1)))(o => Some(o.getOrElse(0L) + c))
      if (pc.isEmpty) done = true
      else {
        val ((a, b), cnt) = pc.minBy { case ((x, y), c) => (-c, x, y) }
        if (cnt < 2) done = true
        else {
          merges += ((a, b))
          seqs = seqs.groupMapReduce { case (toks, _) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < toks.length) {
              if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += toks(i); i += 1 }
            }
            out.result()
          } { case (_, c) => c }(_ + _)
        }
      }
      round += 1
    }
    merges.result()
  }

  /** The TextSpec article generator's vocabulary and shape (same seed
    * discipline): natural-ish word-length distribution. */
  def articleFixture(nArticles: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val words = Seq("the", "band", "released", "album", "in", "a",
      "recording", "sessions", "critically", "acclaimed", "tour",
      "guitarist", "of", "and", "their", "second", "studio",
      "international", "chart", "success", "nineteen", "eighty")
    def sentence(): String = {
      val n = 6 + rnd.nextInt(12)
      (Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")).capitalize + ". "
    }
    def paragraph(): String = Seq.fill(3 + rnd.nextInt(5))(sentence()).mkString
    Seq.fill(nArticles)(
      Seq.fill(8 + rnd.nextInt(10))(paragraph()).mkString("\n\n"))
  }

}

/** Regenerates src/test/resources/bpe_merges_trained_200.csv — the
  * committed, copyright-free merges fixture (trained on the synthetic
  * article corpus by the deterministic Sennrich trainer above). Run via
  * `sbt "Test/runMain graft.BpeFixtureGen"` after changing the trainer
  * or the corpus; BpeSpec pins the committed file against the trainer
  * output, so drift fails the suite rather than silently shifting. */
object BpeFixtureGen {
  def main(args: Array[String]): Unit = {
    val arts = BpeTestCorpus.articleFixture(12)
    val words = arts.flatMap(
      _.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
    val merges = BpeTestCorpus.trainMerges(words, 200)
    val lines = merges.zipWithIndex
      .map { case ((a, b), r) => s"$r,$a,$b" }.mkString("", "\n", "\n")
    val p = java.nio.file.Paths.get("src/test/resources/bpe_merges_trained_200.csv")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, lines)
    println(s"wrote ${merges.size} merges to $p")
  }
}
