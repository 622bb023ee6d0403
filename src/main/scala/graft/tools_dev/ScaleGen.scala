package graft.tools_dev

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: materialize an sfN-shaped dataset by replicating a smaller
  * SF with key-space offsets — every scaling table becomes `factor`
  * disjoint key ranges whose FK relationships hold within each copy
  * (custkey in orders tracks customer, partkey/suppkey in lineitem
  * track part/supplier, etc.). Dimension tables (region, nation) keep
  * TPC-H's fixed cardinality, as at every real SF. Event timestamps
  * shift by one day per copy so sessionization/windows see a longer,
  * denser timeline rather than stacked identical days. Used for the
  * sf1/sf10 scale smokes — NOT part of the driver contract.
  *
  * Two modes (round-12 verdict item 2):
  *
  *   - `exact` (default, the original behavior): copies are VERBATIM.
  *     For the dedup family this manufactures a pathological corpus —
  *     every document sits in a `factor`-member mutual-near-dup clique,
  *     so the verified pair graph grows ~factor² and sf10 dedup numbers
  *     measure clique-graph CC, not realistic near-dup work.
  *   - `mutate <dupPct>`: copy 0 stays verbatim; each later copy of a
  *     document is, by a hash draw on (doc_id, copy), either a TRUE
  *     near-dup with probability dupPct/100 (light token mutation —
  *     ~2% of tokens substituted/deleted, shingle Jaccard ≈ 0.8, above
  *     the 0.5 dedup threshold) or a DISTINCT document (heavy mutation
  *     — 60% of tokens replaced with hash-derived nonsense tokens,
  *     Jaccard ≈ 0 against everything). Expected near-dup cluster size
  *     is 1 + (factor-1)·dupPct/100 — controlled, not factor-sized —
  *     so the pair graph scales like a real corpus's. Embeddings get
  *     the same treatment (near-dup copies: ±0.001 element jitter,
  *     cosine ≈ 1; distinct copies: fresh hash-derived vectors,
  *     cosine ≈ 0). All mutation is hash-derived from (id, copy,
  *     position) — deterministic, no RNG state (the BlobFixture
  *     discipline), so two runs produce byte-identical corpora.
  *
  * Usage: ScaleGen <src> <dst> <factor> [exact|mutate] [dupPct]
  */
object ScaleGen {
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
  private val Offset = 100000000L

  /** Does copy `i` of the row keyed by `key` stay a near-dup?
    * Hash draw over (key, copy) — the copy index in the hash makes the
    * draw independent per copy. */
  private def isNearDup(key: Column, i: Int, dupPct: Int): Column =
    pmod(xxhash64(key, lit(i)), lit(100)) < dupPct

  /** Token-level text mutation at `perMille`/1000 site rate: a third of
    * mutation sites delete the token, the rest substitute a token no
    * real document contains ("zq" + site hash — distinct per (doc,
    * copy, position), so mutated tokens never collide across copies). */
  private def mutateText(text: Column, key: Column, i: Int,
      perMille: Column): Column = {
    val toks = split(text, " ")
    val mutated = filter(
      transform(toks, (tok, pos) => {
        val site = xxhash64(key, lit(i), pos)
        val h = pmod(site, lit(1000))
        when(h >= perMille, tok)
          .when(pmod(site, lit(3)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("zq"), pmod(site, lit(100000)).cast("string")))
      }),
      t => t.isNotNull)
    array_join(mutated, " ")
  }

  /** Embedding mutation: near-dups jitter each element by ±0.001
    * (cosine ≈ 1 — still a semantic dup); distinct copies become fresh
    * hash-derived vectors in [-1, 1) (cosine ≈ 0 against everything). */
  private def mutateEmbedding(emb: Column, key: Column, i: Int,
      dup: Column): Column =
    transform(emb, (v, j) => {
      val draw = (pmod(xxhash64(key, lit(i), j), lit(2001)).cast("double")
        - 1000.0) / 1000.0
      when(dup, v + (draw * 0.001).cast("float"))
        .otherwise(draw.cast("float"))
    })

  private def mutateDocuments(df: DataFrame, i: Int, dupPct: Int): DataFrame = {
    val dup = isNearDup(col("doc_id"), i, dupPct)
    // light 2% site rate keeps J ≈ 0.8 between independently-mutated
    // near-dup copies; heavy 60% drives J ≈ 0 even vs the original
    val perMille = when(dup, lit(20)).otherwise(lit(600))
    df.withColumn("text", mutateText(col("text"), col("doc_id"), i, perMille))
      // keep derived stats consistent with the mutated text
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def mutateEmbeddings(df: DataFrame, i: Int, dupPct: Int): DataFrame =
    df.withColumn("embedding",
      mutateEmbedding(col("embedding"), col("vec_id"), i,
        isNearDup(col("vec_id"), i, dupPct)))

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val mode = args.lift(3).getOrElse("exact")
    val dupPct = args.lift(4).map(_.toInt).getOrElse(20)
    require(mode == "exact" || mode == "mutate", s"unknown mode $mode")
    require(dupPct >= 0 && dupPct <= 100, "dupPct must be 0..100")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.Tables.names) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = keyCols.get(t) match {
        case None => df // fixed-cardinality dimensions
        case Some(keys) =>
          (0 until factor).map { i =>
            // mutate BEFORE the key offset: the hash draws key on the
            // ORIGINAL id, so the same logical doc mutates the same way
            // regardless of which copy range it lands in
            val mutated =
              if (mode == "mutate" && i > 0 && t == "documents")
                mutateDocuments(df, i, dupPct)
              else if (mode == "mutate" && i > 0 && t == "embeddings")
                mutateEmbeddings(df, i, dupPct)
              else df
            val remapped = keys.foldLeft(mutated) { (d, c) =>
              val dt = df.schema(c).dataType
              d.withColumn(c, (col(c) + lit(i * Offset)).cast(dt))
            }
            if (t == "events")
              remapped.withColumn("ts",
                col("ts") + expr(s"INTERVAL $i DAYS"))
            else remapped
          }.reduce(_ unionByName _)
      }
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"WROTE $t rows=${spark.read.parquet(s"$dst/$t.parquet").count()}")
    }
    spark.stop()
  }
}
