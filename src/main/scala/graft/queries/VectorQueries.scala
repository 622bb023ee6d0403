package graft.queries

import graft.{Q, Tables}
import graft.vector.{Clustering, IvfPqConfig, IvfPqIndex, Similarity}
import org.apache.spark.sql.functions._

/** Vector-similarity queries (SURVEY §2.11 V2 + the brief's ANN scale
  * path) over the `embeddings` table (64-dim float vectors).
  *
  * Dot products fold left-to-right over doubles in both engines
  * (Spark `aggregate(zip_with(...))` ≡ DuckDB `list_reduce`), so raw
  * cosines are bit-identical and the top-k sets/orderings agree exactly.
  */
object VectorQueries {

  private val Dims = 64
  private val Planes = 8

  /** Shared oracle prelude: widened vectors + norms. */
  private val normCte =
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, v,
      |    sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
      |  FROM e)""".stripMargin

  private val dotAB =
    "list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * b.v[k]), (x, y) -> x + y)"

  /** The deterministic ±1 hyperplane matrix, inlined in both engines
    * (derived from md5 parity — Similarity.hyperplaneSigns). */
  private lazy val signsSqlValues: String = signsSqlValuesFor(Planes)

  private def signsSqlValuesFor(planes: Int): String =
    Similarity.hyperplaneSigns(planes, Dims).zipWithIndex
      .map { case (row, p) => s"($p, [${row.mkString(", ")}])" }
      .mkString(", ")

  val all: Seq[Q] = Seq(

    // Embedding near-dup: nearest neighbor per vector within its label
    // block (block → pairwise cosine → best match; thresholding is the
    // caller's last step).
    Q("q36_embedding_neardup",
      s"""$normCte,
         |p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    $dotAB / (a.nrm * b.nrm) AS cos_raw
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT id_a, id_b, cos_raw,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cos_raw DESC, id_b) AS rn
         |  FROM p)
         |SELECT id_a, id_b, ROUND(cos_raw, 6) AS cos_sim FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      Similarity.nearestInBlock(Tables(s, dir, "embeddings"), "vec_id", "embedding", "label")
        .select(col("id_a"), col("id_b"), round(col("cos_raw"), 6).as("cos_sim"))
    },

    // Contrastive-training triple mining: for each of the 4 smallest
    // vec_ids as anchors, the top-3 by cosine are positives and the
    // next 7 are HARD negatives (highest-similarity non-positives — the
    // examples contrastive training learns most from). Raw-cosine rank
    // order is bit-deterministic cross-engine (the q36/q37 convention);
    // cos_sim rounded only for display.
    Q("q139_hard_negatives",
      s"""$normCte,
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n ORDER BY vec_id LIMIT 4),
         |sc AS (
         |  SELECT q.q_id, a.vec_id,
         |    list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |      (x, y) -> x + y) / (a.nrm * q.qn) AS cos_raw
         |  FROM n a CROSS JOIN q WHERE a.vec_id <> q.q_id),
         |r AS (
         |  SELECT q_id, vec_id, cos_raw,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id)
         |         AS BIGINT) AS rank
         |  FROM sc)
         |SELECT q_id, vec_id, rank,
         |  CASE WHEN rank <= 3 THEN 'positive' ELSE 'hard_negative' END AS role,
         |  ROUND(cos_raw, 6) AS cos_sim
         |FROM r WHERE rank <= 10""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.hardNegatives(emb, "vec_id", "embedding",
          anchors = emb.orderBy("vec_id").limit(4), nPos = 3, nNeg = 7)
        .select(col("q_id"), col("vec_id"), col("rank"), col("role"),
          round(col("cos_raw"), 6).as("cos_sim"))
    },

    // Brute-force cosine top-10 for the anchor query vector (min vec_id) —
    // the exact-kNN baseline (V2; ChromaDB collection.query n_results=k).
    Q("q37_knn_brute",
      s"""$normCte,
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n ORDER BY vec_id LIMIT 1)
         |SELECT a.vec_id,
         |  ROUND(list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn), 6) AS cos_sim
         |FROM n a CROSS JOIN q
         |WHERE a.vec_id <> q.q_id
         |ORDER BY list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn) DESC, a.vec_id
         |LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.knnBrute(emb, "vec_id", "embedding",
        query = emb.orderBy("vec_id").limit(1), k = 10)
        .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
    },

    // ANN: sign-random-projection LSH bucketing (8 planes → 256 buckets),
    // exact cosine re-rank inside the anchor's bucket only.
    Q("q38_ann_lsh",
      s"""$normCte,
         |signs(p, sv) AS (VALUES $signsSqlValues),
         |bkt AS (
         |  SELECT n.vec_id,
         |    string_agg(CASE WHEN list_reduce(list_transform(generate_series(1, 64),
         |          k -> v[k] * sv[k]), (x, y) -> x + y) >= 0
         |      THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
         |  FROM n CROSS JOIN signs GROUP BY n.vec_id),
         |nb AS (SELECT n.vec_id, n.v, n.nrm, bkt.bucket FROM n JOIN bkt USING (vec_id)),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket AS q_bucket
         |      FROM nb ORDER BY vec_id LIMIT 1)
         |SELECT a.vec_id, a.bucket,
         |  ROUND(list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn), 6) AS cos_sim
         |FROM nb a JOIN q ON a.bucket = q.q_bucket AND a.vec_id <> q.q_id
         |ORDER BY list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn) DESC, a.vec_id
         |LIMIT 5""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.annLsh(emb, "vec_id", "embedding",
        query = emb.orderBy("vec_id").limit(1), k = 5, planes = Planes, dims = Dims)
        .select(col("vec_id"), col("bucket"), round(col("cos_raw"), 6).as("cos_sim"))
    },

    // Multi-probe LSH (Lv et al. 2007): q38's index probed at the query
    // bucket PLUS every 1-bit flip — the recall remedy for SRP-LSH
    // (single-probe recall@10 measured ~0.19 at sf0.1; SimilaritySpec
    // enforces the multi-probe floor). Probe set built by substring
    // surgery identically in both engines.
    Q("q142_ann_lsh_multiprobe",
      s"""$normCte,
         |signs(p, sv) AS (VALUES $signsSqlValues),
         |bkt AS (
         |  SELECT n.vec_id,
         |    string_agg(CASE WHEN list_reduce(list_transform(generate_series(1, 64),
         |          k -> v[k] * sv[k]), (x, y) -> x + y) >= 0
         |      THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
         |  FROM n CROSS JOIN signs GROUP BY n.vec_id),
         |nb AS (SELECT n.vec_id, n.v, n.nrm, bkt.bucket FROM n JOIN bkt USING (vec_id)),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket AS q_bucket
         |      FROM nb ORDER BY vec_id LIMIT 1),
         |probes AS (
         |  SELECT q_id, qv, qn, q_bucket AS probe FROM q
         |  UNION ALL
         |  SELECT q_id, qv, qn,
         |    substr(q_bucket, 1, CAST(i AS INT)) ||
         |    (CASE WHEN substr(q_bucket, CAST(i AS INT) + 1, 1) = '1'
         |          THEN '0' ELSE '1' END) ||
         |    substr(q_bucket, CAST(i AS INT) + 2, $Planes - CAST(i AS INT) - 1) AS probe
         |  FROM q CROSS JOIN range($Planes) r(i))
         |SELECT a.vec_id, a.bucket,
         |  ROUND(list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * p.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * p.qn), 6) AS cos_sim
         |FROM nb a JOIN probes p ON a.bucket = p.probe AND a.vec_id <> p.q_id
         |ORDER BY list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * p.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * p.qn) DESC, a.vec_id
         |LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.annLshMultiProbe(emb, "vec_id", "embedding",
        query = emb.orderBy("vec_id").limit(1), k = 10, planes = Planes, dims = Dims)
        .select(col("vec_id"), col("bucket"), round(col("cos_raw"), 6).as("cos_sim"))
    },

    // IVF ANN: coarse-quantizer cell assignment (argmax cosine over 16
    // deterministic centroids) + exact re-rank inside the query's cell.
    Q("q58_ann_ivf",
      s"""$normCte,
         |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY vec_id LIMIT 16),
         |asg AS (
         |  SELECT n.vec_id, cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_reduce(list_transform(generate_series(1, 64), k -> n.v[k] * cv[k]),
         |        (x, y) -> x + y) / (n.nrm * cnrm) DESC, cid) AS rn
         |  FROM n CROSS JOIN cent),
         |cells AS (SELECT vec_id AS cell_id, cid AS cell FROM asg WHERE rn = 1),
         |q AS (
         |  SELECT n.vec_id AS q_id, n.v AS qv, n.nrm AS qn, cells.cell AS q_cell
         |  FROM n JOIN cells ON n.vec_id = cells.cell_id
         |  ORDER BY n.vec_id LIMIT 1)
         |SELECT a.vec_id, cells.cell,
         |  ROUND(list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn), 6) AS cos_sim
         |FROM n a JOIN cells ON a.vec_id = cells.cell_id
         |CROSS JOIN q
         |WHERE cells.cell = q.q_cell AND a.vec_id <> q.q_id
         |ORDER BY list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn) DESC, a.vec_id
         |LIMIT 5""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.annIvf(emb, "vec_id", "embedding",
        query = emb.orderBy("vec_id").limit(1), k = 5, nCells = 16)
        .select(col("vec_id"), col("cell"), round(col("cos_raw"), 6).as("cos_sim"))
    },

    // q58 with a TRAINED coarse quantizer (round-9 verdict item 3): the
    // 16 cells come from deterministic k-means (q97's algorithm) instead
    // of the 16 lowest-id vectors, so cell boundaries track the data
    // distribution — measured recall@10 at sf0.1 rises vs the
    // training-free cells (SimilaritySpec reports both + cell balance).
    // Oracle = the unrolled-Lloyd chain as the cell assignment + q58's
    // cell-restricted exact-cosine rank.
    Q("q168_ann_ivf_trained",
      s"""WITH ${kmeansCtes(16, 2)},
         |cells AS (SELECT vec_id AS cell_id, cid AS cell FROM a2),
         |vr AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |       FROM embeddings),
         |nr AS (SELECT vec_id, v,
         |         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
         |       FROM vr),
         |q AS (
         |  SELECT nr.vec_id AS q_id, nr.v AS qv, nr.nrm AS qn, cells.cell AS q_cell
         |  FROM nr JOIN cells ON nr.vec_id = cells.cell_id
         |  ORDER BY nr.vec_id LIMIT 1)
         |SELECT a.vec_id, cells.cell,
         |  ROUND(list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn), 6) AS cos_sim
         |FROM nr a JOIN cells ON a.vec_id = cells.cell_id
         |CROSS JOIN q
         |WHERE cells.cell = q.q_cell AND a.vec_id <> q.q_id
         |ORDER BY list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn) DESC, a.vec_id
         |LIMIT 5""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val cells = Similarity.ivfCellsTrained(emb, "vec_id", "embedding",
        nCells = 16, iters = 2)
      Similarity.annIvfWithCells(emb, "vec_id", "embedding", cells,
        query = emb.orderBy("vec_id").limit(1), k = 5)
        .select(col("vec_id"), col("cell"), round(col("cos_raw"), 6).as("cos_sim"))
    },

    // ANN self-evaluation: recall@10 of the LSH index against the exact
    // brute-force top-10 for the anchor query — the quality metric an
    // index deployment is judged by, computed inside the engine. 4
    // planes (16 buckets) so the candidate set is meaningfully sized at
    // every SF; both sides order by raw cosine (bit-identical fold), so
    // the hit count is exact, not approximate.
    Q("q86_ann_recall",
      s"""$normCte,
         |signs(p, sv) AS (VALUES ${signsSqlValuesFor(4)}),
         |bkt AS (
         |  SELECT n.vec_id,
         |    string_agg(CASE WHEN list_reduce(list_transform(generate_series(1, 64),
         |          k -> v[k] * sv[k]), (x, y) -> x + y) >= 0
         |      THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
         |  FROM n CROSS JOIN signs GROUP BY n.vec_id),
         |nb AS (SELECT n.vec_id, n.v, n.nrm, bkt.bucket FROM n JOIN bkt USING (vec_id)),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket AS q_bucket
         |      FROM nb ORDER BY vec_id LIMIT 1),
         |brute AS (
         |  SELECT a.vec_id FROM nb a CROSS JOIN q WHERE a.vec_id <> q.q_id
         |  ORDER BY list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn) DESC, a.vec_id
         |  LIMIT 10),
         |cand AS (
         |  SELECT a.vec_id FROM nb a JOIN q ON a.bucket = q.q_bucket AND a.vec_id <> q.q_id
         |  ORDER BY list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * q.qn) DESC, a.vec_id
         |  LIMIT 10)
         |SELECT 10 AS k, CAST(COUNT(*) AS BIGINT) AS n_hits,
         |       ROUND(COUNT(*) / 10.0, 6) AS recall
         |FROM cand JOIN brute USING (vec_id)""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val query = emb.orderBy("vec_id").limit(1)
      val brute = Similarity.knnBrute(emb, "vec_id", "embedding", query, k = 10)
        .select(col("vec_id"))
      val cand = Similarity.annLsh(emb, "vec_id", "embedding", query,
          k = 10, planes = 4, dims = Dims)
        .select(col("vec_id"))
      cand.join(brute, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(10).as("k"), col("n_hits"),
          round(col("n_hits").cast("double") / 10.0, 6).as("recall"))
    },

    // Retrieval-quality evaluation: MRR, P@10, NDCG@10 per anchor query
    // (relevance = label equality) — the metrics an index/reranker
    // deployment is judged by, in-engine. Discount weights 1/log2(i+1)
    // are precomputed Scala doubles embedded as literals in BOTH
    // engines (no in-query transcendentals), DCG folds in rank order
    // (the bm25 ordered-sum discipline), so every double is bit-equal.
    Q("q144_retrieval_metrics", {
      val k = 10
      val wt = Similarity.ndcgWeights(k).zipWithIndex
        .map { case (wv, i) => s"(${i + 1}, CAST($wv AS DOUBLE))" }.mkString(", ")
      val pt = Similarity.ndcgIdealPrefix(k).zipWithIndex
        .map { case (pv, i) => s"(${i + 1}, CAST($pv AS DOUBLE))" }.mkString(", ")
      s"""$normCte,
         |q AS (SELECT vec_id AS q_id, label AS q_lbl, v AS qv, nrm AS qn
         |      FROM n ORDER BY vec_id LIMIT 4),
         |sc AS (
         |  SELECT q.q_id, a.vec_id, a.label = q.q_lbl AS rel,
         |    list_reduce(list_transform(generate_series(1, 64), d -> a.v[d] * q.qv[d]),
         |      (x, y) -> x + y) / (a.nrm * q.qn) AS cos_raw
         |  FROM n a CROSS JOIN q WHERE a.vec_id <> q.q_id),
         |r AS (
         |  SELECT q_id, vec_id, rel,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id)
         |         AS BIGINT) AS rank
         |  FROM sc),
         |wt(rk, w) AS (VALUES $wt),
         |pt(nr, pw) AS (VALUES $pt),
         |agg AS (
         |  SELECT q_id,
         |    CAST(COUNT(*) FILTER (rel) AS BIGINT) AS n_rel,
         |    MIN(CASE WHEN rel THEN rank END) AS first_rel_rank,
         |    CAST(COUNT(*) FILTER (rel AND rank <= $k) AS BIGINT) AS hits
         |  FROM r GROUP BY q_id),
         |dcg AS (
         |  SELECT r.q_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      array_agg(wt.w ORDER BY r.rank)), (a, b) -> a + b) AS dcg
         |  FROM r JOIN wt ON r.rank = wt.rk
         |  WHERE r.rel AND r.rank <= $k GROUP BY r.q_id)
         |SELECT a.q_id, a.n_rel, a.first_rel_rank,
         |  CASE WHEN a.first_rel_rank IS NULL THEN 0.0
         |       ELSE 1.0 / a.first_rel_rank END AS mrr,
         |  a.hits / 10.0 AS p_at_k,
         |  CASE WHEN a.n_rel = 0 THEN 0.0
         |       ELSE COALESCE(d.dcg, 0.0) / pt.pw END AS ndcg_at_k
         |FROM agg a
         |LEFT JOIN dcg d USING (q_id)
         |LEFT JOIN pt ON pt.nr = LEAST(GREATEST(a.n_rel, 1), $k)""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.retrievalMetrics(emb, "vec_id", "embedding", "label",
        anchors = emb.orderBy("vec_id").limit(4), k = 10)
    },

    // Similarity-graph transitivity: per-vertex triangle counts over the
    // cosine-threshold graph (within-label blocks, cos ≥ 0.22). Triangles
    // in a similarity graph are the local-clustering signal (how much
    // "neighbors of similar docs are themselves similar") that drives
    // graph-based corpus diagnostics. The engine counts via degree-ordered
    // orientation (GraphOps.triangleCounts — O(√m) wedge fan-out on skewed
    // graphs); the oracle uses the simple id-ordered 3-way join, proving
    // the oriented enumeration exact.
    Q("q92_similarity_triangles",
      s"""$normCte,
         |ce AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE $dotAB / (a.nrm * b.nrm) >= 0.22),
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM ce e1 JOIN ce e2 ON e1.a = e2.a AND e1.b < e2.b
         |       JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
         |corners AS (SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
         |            UNION ALL SELECT z AS v FROM tri),
         |cnt AS (SELECT v, COUNT(*) AS n_triangles FROM corners GROUP BY v)
         |SELECT e.vec_id, CAST(COALESCE(cnt.n_triangles, 0) AS BIGINT) AS n_triangles
         |FROM e LEFT JOIN cnt ON e.vec_id = cnt.v""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val base = emb.select(col("vec_id"), col("label"),
          Similarity.vecD(col("embedding")).as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val a = base.select(col("vec_id").as("ia"), col("label").as("blk"),
        col("v").as("va"), col("nrm").as("na"))
      val b = base.select(col("vec_id").as("ib"), col("label").as("blk"),
        col("v").as("vb"), col("nrm").as("nb"))
      val edges = a.join(b, Seq("blk"))
        .filter(col("ia") < col("ib"))
        .filter(Similarity.cosine(col("va"), col("vb"), col("na"), col("nb"))
          >= 0.22)
        .select(col("ia"), col("ib"))
      val tc = graft.graph.GraphOps.triangleCounts(edges, "ia", "ib")
      emb.select(col("vec_id"))
        .join(tc.select(col("id").as("vec_id"), col("n_triangles")),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
    },

    // k-core extraction (k=3, 3 peeling rounds) of the same similarity
    // graph as q92: repeatedly drop vertices with survivor-induced degree
    // < 3 — the density-nuclei diagnostic (tight semantic clusters
    // survive; fringe vectors peel off). Oracle unrolls the same rounds.
    Q("q102_kcore",
      s"""$normCte,
         |ce AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE $dotAB / (a.nrm * b.nrm) >= 0.22),
         |und AS (SELECT a AS src, b AS dst FROM ce
         |        UNION ALL SELECT b AS src, a AS dst FROM ce),
         |d0 AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src),
         |${(1 to 3).map { i =>
          s"""s$i AS (SELECT id FROM d${i - 1} WHERE d >= 3),
             |d$i AS (SELECT u.src AS id, COUNT(*) AS d
             |        FROM und u JOIN s$i x ON u.src = x.id JOIN s$i y ON u.dst = y.id
             |        GROUP BY u.src)""".stripMargin
        }.mkString(",\n")}
         |SELECT e.vec_id,
         |  COALESCE(s3.id IS NOT NULL, FALSE) AS in_core,
         |  CASE WHEN s3.id IS NOT NULL THEN CAST(COALESCE(d3.d, 0) AS BIGINT) END
         |    AS core_deg
         |FROM e LEFT JOIN s3 ON e.vec_id = s3.id
         |       LEFT JOIN d3 ON e.vec_id = d3.id""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val base = emb.select(col("vec_id"), col("label"),
          Similarity.vecD(col("embedding")).as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val a = base.select(col("vec_id").as("ia"), col("label").as("blk"),
        col("v").as("va"), col("nrm").as("na"))
      val b = base.select(col("vec_id").as("ib"), col("label").as("blk"),
        col("v").as("vb"), col("nrm").as("nb"))
      val edges = a.join(b, Seq("blk"))
        .filter(col("ia") < col("ib"))
        .filter(Similarity.cosine(col("va"), col("vb"), col("na"), col("nb"))
          >= 0.22)
        .select(col("ia"), col("ib"))
      val core = graft.graph.GraphOps.kCorePeel(edges, "ia", "ib", k = 3, rounds = 3)
      emb.select(col("vec_id"))
        .join(core.select(col("id").as("vec_id"), col("in_core"), col("core_deg")),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("in_core"), lit(false)).as("in_core"),
          col("core_deg"))
    },

    // Local clustering coefficient per vertex of the same similarity
    // graph as q92: lcc = 2·T(v)/(d(v)·(d(v)−1)) — cohesion-vs-bridge
    // scoring of each vector's neighborhood (near-1 ⇒ tight semantic
    // cluster; near-0 at high degree ⇒ hub spanning topics). The
    // quotient is one exact-integer double division, identical in both
    // engines; rounded to 6 digits (the tfidf convention).
    Q("q115_clustering_coefficient",
      s"""$normCte,
         |ce AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE $dotAB / (a.nrm * b.nrm) >= 0.22),
         |und AS (SELECT a, b FROM ce UNION ALL SELECT b AS a, a AS b FROM ce),
         |deg AS (SELECT a AS v, COUNT(*) AS degree FROM und GROUP BY a),
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM ce e1 JOIN ce e2 ON e1.a = e2.a AND e1.b < e2.b
         |       JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
         |corners AS (SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
         |            UNION ALL SELECT z AS v FROM tri),
         |cnt AS (SELECT v, COUNT(*) AS n_triangles FROM corners GROUP BY v)
         |SELECT e.vec_id,
         |  CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
         |  CAST(COALESCE(cnt.n_triangles, 0) AS BIGINT) AS n_triangles,
         |  CASE WHEN COALESCE(deg.degree, 0) >= 2
         |       THEN ROUND(2.0 * COALESCE(cnt.n_triangles, 0)
         |                  / (deg.degree * (deg.degree - 1)), 6)
         |       ELSE 0.0 END AS lcc
         |FROM e LEFT JOIN deg ON e.vec_id = deg.v
         |       LEFT JOIN cnt ON e.vec_id = cnt.v""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val base = emb.select(col("vec_id"), col("label"),
          Similarity.vecD(col("embedding")).as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
      val a = base.select(col("vec_id").as("ia"), col("label").as("blk"),
        col("v").as("va"), col("nrm").as("na"))
      val b = base.select(col("vec_id").as("ib"), col("label").as("blk"),
        col("v").as("vb"), col("nrm").as("nb"))
      val edges = a.join(b, Seq("blk"))
        .filter(col("ia") < col("ib"))
        .filter(Similarity.cosine(col("va"), col("vb"), col("na"), col("nb"))
          >= 0.22)
        .select(col("ia"), col("ib"))
      val lcc = graft.graph.GraphOps.clusteringCoefficients(edges, "ia", "ib")
      emb.select(col("vec_id"))
        .join(lcc.select(col("id").as("vec_id"), col("degree"),
            col("n_triangles"), col("lcc")),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("degree"), lit(0L)).as("degree"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
          coalesce(col("lcc"), lit(0.0)).as("lcc"))
    },

    // MMR diversified re-ranking (λ=0.7): greedy top-5 from the anchor
    // query's 12 nearest candidates, maximizing λ·sim(query,d) −
    // (1−λ)·max sim(d, selected) — the diversity step between ANN
    // retrieval and the LLM context window. All similarities quantized
    // to BIGINT (⌊cos·10¹²⌋), so the greedy argmax is integer-exact and
    // the oracle replays the unrolled selection steps.
    Q("q117_mmr_rerank", {
      val dotAQ = "list_reduce(list_transform(generate_series(1, 64), " +
        "k -> a.v[k] * q.qv[k]), (x, y) -> x + y)"
      val dotXY = "list_reduce(list_transform(generate_series(1, 64), " +
        "k -> x.v[k] * y.v[k]), (s, t) -> s + t)"
      val steps = (2 to 5).map { r =>
        s"""s$r AS (SELECT $r AS rnk, c.id, c.qsim
           |  FROM cand c JOIN (SELECT ia, MAX(psim) AS pen FROM pair
           |                    WHERE ib IN (SELECT id FROM sel${r - 1}) GROUP BY ia) p
           |       ON c.id = p.ia
           |  WHERE c.id NOT IN (SELECT id FROM sel${r - 1})
           |  ORDER BY 70 * c.qsim - 30 * p.pen DESC, c.id LIMIT 1),
           |sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM s$r)""".stripMargin
      }.mkString(",\n")
      s"""$normCte,
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n ORDER BY vec_id LIMIT 1),
         |cand AS (
         |  SELECT a.vec_id AS id, a.v, a.nrm,
         |    CAST(floor($dotAQ / (a.nrm * q.qn) * 1000000000000) AS BIGINT) AS qsim
         |  FROM n a CROSS JOIN q WHERE a.vec_id <> q.q_id
         |  ORDER BY qsim DESC, id LIMIT 12),
         |pair AS (
         |  SELECT x.id AS ia, y.id AS ib,
         |    CAST(floor($dotXY / (x.nrm * y.nrm) * 1000000000000) AS BIGINT) AS psim
         |  FROM cand x JOIN cand y ON x.id <> y.id),
         |sel1 AS (SELECT 1 AS rnk, id, qsim FROM cand ORDER BY qsim DESC, id LIMIT 1),
         |$steps
         |SELECT rnk, id AS vec_id, qsim FROM sel5""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.mmrRerank(emb, "vec_id", "embedding",
          query = emb.orderBy("vec_id").limit(1), k = 5, lambdaPct = 70L,
          candidates = 12)
        .select(col("rank").as("rnk"), col("id").as("vec_id"), col("qsim"))
    },

    // The RETRIEVAL-side funnel — the read-path complement of the q150
    // ingest capstone, composed the way a RAG serving stack chains the
    // kernels: ANN candidate pool (top-12 cosine) → document fetch →
    // exact-content dedup among candidates (md5 keep-min-id — near-dup
    // corpus copies must not crowd the context window) → MMR rerank of
    // the survivors (λ=0.70) → top-5 with source metadata. One lazy
    // plan; the oracle replays pool, dedup, and every greedy MMR step.
    Q("q165_retrieval_funnel", {
      val dotAQ = "list_reduce(list_transform(generate_series(1, 64), " +
        "k -> a.v[k] * q.qv[k]), (x, y) -> x + y)"
      val dotXY = "list_reduce(list_transform(generate_series(1, 64), " +
        "k -> x.v[k] * y.v[k]), (s, t) -> s + t)"
      val steps = (2 to 5).map { r =>
        s"""s$r AS (SELECT $r AS rnk, c.id, c.qsim
           |  FROM cand c JOIN (SELECT ia, MAX(psim) AS pen FROM pair
           |                    WHERE ib IN (SELECT id FROM sel${r - 1}) GROUP BY ia) p
           |       ON c.id = p.ia
           |  WHERE c.id NOT IN (SELECT id FROM sel${r - 1})
           |  ORDER BY 70 * c.qsim - 30 * p.pen DESC, c.id LIMIT 1),
           |sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM s$r)""".stripMargin
      }.mkString(",\n")
      s"""$normCte,
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n ORDER BY vec_id LIMIT 1),
         |pool AS (
         |  SELECT a.vec_id AS id, a.v, a.nrm,
         |    CAST(floor($dotAQ / (a.nrm * q.qn) * 1000000000000) AS BIGINT) AS qsim
         |  FROM n a CROSS JOIN q WHERE a.vec_id <> q.q_id
         |  ORDER BY qsim DESC, id LIMIT 12),
         |dd AS (SELECT MIN(p.id) AS id
         |       FROM pool p JOIN documents d ON p.id = d.doc_id
         |       GROUP BY md5(d.text)),
         |cand AS (SELECT p.* FROM pool p JOIN dd USING (id)),
         |pair AS (
         |  SELECT x.id AS ia, y.id AS ib,
         |    CAST(floor($dotXY / (x.nrm * y.nrm) * 1000000000000) AS BIGINT) AS psim
         |  FROM cand x JOIN cand y ON x.id <> y.id),
         |sel1 AS (SELECT 1 AS rnk, id, qsim FROM cand ORDER BY qsim DESC, id LIMIT 1),
         |$steps
         |SELECT s.rnk, s.id AS doc_id, s.qsim, d.source
         |FROM sel5 s JOIN documents d ON s.id = d.doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.operators.{Relational => R}
      val emb = Tables(s, dir, "embeddings")
      val docs = Tables(s, dir, "documents")
      val q = emb.orderBy("vec_id").limit(1)
      val pool = Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 12)
      // exact-content dedup among the candidates: keep the smallest id
      // per md5(text) (argmax on -id — the hash-agg fast path)
      val keep = R.argmaxPerGroup(
        pool.join(docs.select(col("doc_id").as("vec_id"), md5(col("text")).as("h")),
          "vec_id"),
        groupCols = Seq("h"), sortKey = Seq(-col("vec_id")), payload = Seq("vec_id"))
      val survivors = emb.join(keep.select("vec_id"), "vec_id")
      Similarity.mmrRerank(survivors, "vec_id", "embedding", q,
          k = 5, lambdaPct = 70L, candidates = 12)
        .join(docs.select(col("doc_id"), col("source")),
          col("id") === col("doc_id"))
        .select(col("rank").as("rnk"), col("doc_id"), col("qsim"), col("source"))
    },

    // Deterministic distributed k-means (k=8, 3 Lloyd iterations) over
    // integer-quantized embeddings: exact integer centroid sums + IEEE
    // double quotients + left-to-right distance folds make the whole
    // algorithm a pure function of the input — the oracle replays the
    // unrolled iterations bit-for-bit. The run-of-the-mill float k-means
    // is partial-aggregation-order nondeterministic; this one is the
    // reproducible form a curation pipeline can re-run and audit.
    Q("q97_kmeans", kmeansOracle(k = 8, iters = 3)) { (s, dir) =>
      Clustering.kmeans(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 3)
    },

    // Product-quantization codes (Jégou et al. 2011): 4 subvectors × 16
    // dims, k=4 codewords each, deterministic Lloyd — 64-dim float32
    // compressed to 4 small codes. Oracle = 4 suffixed unrolled-kmeans
    // chains over DuckDB list slices, joined on vec_id.
    Q("q145_pq_codes", {
      val (m, sub, k, iters) = (4, 16, 4, 2)
      val chains = (0 until m).map { s =>
        kmeansCtes(k, iters, sfx = s"p$s", dims = sub,
          srcList = s"embedding[${s * sub + 1}:${(s + 1) * sub}]")
      }.mkString(",\n")
      val joins = (0 until m).map(s => s"JOIN ap$s$iters USING (vec_id)").mkString("\n")
      val cols = (0 until m).map(s => s"ap$s$iters.cid AS code_$s").mkString(", ")
      s"""WITH $chains,
         |ids AS (SELECT vec_id FROM embeddings)
         |SELECT ids.vec_id, $cols
         |FROM ids
         |$joins""".stripMargin
    }) { (s, dir) =>
      Similarity.pqCodes(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        m = 4, subDims = 16, k = 4, iters = 2)
    },

    // PQ asymmetric-distance top-10 (the q145 codebook's query path):
    // per-subvector k-entry distance tables vs exact-integer centroids
    // of the final assignment; ADC = fixed-order sum of m lookups —
    // bit-deterministic, so set AND order replay exactly.
    Q("q146_pq_adc_topk", {
      val (m, sub, k, iters) = (4, 16, 4, 2)
      val chains = (0 until m).map { s =>
        val sfx = s"p$s"
        s"""${kmeansCtes(k, iters, sfx = sfx, dims = sub,
             srcList = s"embedding[${s * sub + 1}:${(s + 1) * sub}]")},
           |uF$s AS (SELECT a.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
           |           COUNT(*) AS n
           |         FROM a$sfx$iters a JOIN ed$sfx USING (vec_id)
           |         CROSS JOIN range(1, ${sub + 1}) r(d) GROUP BY a.cid, d),
           |cF$s AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
           |         FROM uF$s GROUP BY cid),
           |qq$s AS (SELECT list_transform(embedding[${s * sub + 1}:${(s + 1) * sub}],
           |           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS qd
           |         FROM embeddings ORDER BY vec_id LIMIT 1),
           |dt$s AS (SELECT cid,
           |           list_reduce(list_transform(generate_series(1, $sub),
           |             d -> (qq.qd[d] - cv[d]) * (qq.qd[d] - cv[d])), (x, y) -> x + y) AS ds
           |         FROM cF$s CROSS JOIN qq$s qq)""".stripMargin
      }.mkString(",\n")
      val joins = (0 until m).map(s =>
        s"JOIN ap$s$iters a$s USING (vec_id) JOIN dt$s ON a$s.cid = dt$s.cid")
        .mkString("\n")
      val adc = (0 until m).map(s => s"dt$s.ds").mkString(" + ")
      s"""WITH $chains,
         |ids AS (SELECT vec_id FROM embeddings),
         |anchor AS (SELECT MIN(vec_id) AS q_id FROM embeddings)
         |SELECT ids.vec_id, ROUND($adc, 6) AS adc_dist
         |FROM ids
         |$joins
         |CROSS JOIN anchor
         |WHERE ids.vec_id <> anchor.q_id
         |ORDER BY $adc ASC, ids.vec_id LIMIT 10""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.pqAdcTopK(emb, "vec_id", "embedding",
        query = emb.orderBy("vec_id").limit(1), topK = 10,
        m = 4, subDims = 16, k = 4, iters = 2)
    },

    // PQ codebook REUSE — the realistic serving shape: fit the model
    // ONCE (pqFit), then serve TWO ADC searches (min- and max-id
    // anchors) AND the corpus codes off the same fitted
    // assignments/centroids. q146 pays a full m-fit per search; here
    // each additional search costs only k-row distance tables + a
    // TakeOrdered (measured ~0.3 s vs ~5.5 s of fit at sf0.1). Oracle =
    // the q146 chains (shared across both probes) with per-anchor
    // distance tables and the assignment codes projected into the
    // select.
    Q("q151_pq_reuse", {
      val (m, sub, k, iters) = (4, 16, 4, 2)
      def qqDt(tag: String, agg: String): String = (0 until m).map { s =>
        s"""qq$tag$s AS (SELECT list_transform(embedding[${s * sub + 1}:${(s + 1) * sub}],
           |           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS qd
           |         FROM embeddings ORDER BY vec_id $agg LIMIT 1),
           |dt$tag$s AS (SELECT cid,
           |           list_reduce(list_transform(generate_series(1, $sub),
           |             d -> (qq.qd[d] - cv[d]) * (qq.qd[d] - cv[d])), (x, y) -> x + y) AS ds
           |         FROM cF$s CROSS JOIN qq$tag$s qq)""".stripMargin
      }.mkString(",\n")
      val chains = (0 until m).map { s =>
        val sfx = s"p$s"
        s"""${kmeansCtes(k, iters, sfx = sfx, dims = sub,
             srcList = s"embedding[${s * sub + 1}:${(s + 1) * sub}]")},
           |uF$s AS (SELECT a.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
           |           COUNT(*) AS n
           |         FROM a$sfx$iters a JOIN ed$sfx USING (vec_id)
           |         CROSS JOIN range(1, ${sub + 1}) r(d) GROUP BY a.cid, d),
           |cF$s AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
           |         FROM uF$s GROUP BY cid)""".stripMargin
      }.mkString(",\n")
      def probeSel(tag: String, anchorAgg: String): String = {
        val joins = (0 until m).map(s =>
          s"JOIN ap$s$iters a$s USING (vec_id) JOIN dt$tag$s ON a$s.cid = dt$tag$s.cid")
          .mkString("\n")
        val adc = (0 until m).map(s => s"dt$tag$s.ds").mkString(" + ")
        val codeCols = (0 until m).map(s => s"a$s.cid AS code_$s").mkString(", ")
        s"""(SELECT '$tag' AS probe, ids.vec_id, $codeCols, ROUND($adc, 6) AS adc_dist
           |FROM ids
           |$joins
           |CROSS JOIN (SELECT $anchorAgg(vec_id) AS q_id FROM embeddings) anchor
           |WHERE ids.vec_id <> anchor.q_id
           |ORDER BY $adc ASC, ids.vec_id LIMIT 10)""".stripMargin
      }
      s"""WITH $chains,
         |${qqDt("lo", "ASC")},
         |${qqDt("hi", "DESC")},
         |ids AS (SELECT vec_id FROM embeddings)
         |${probeSel("lo", "MIN")}
         |UNION ALL
         |${probeSel("hi", "MAX")}""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.pqFit(emb, "vec_id", "embedding",
        m = 4, subDims = 16, k = 4, iters = 2)
      val codes = Similarity.pqCodesFromModel(model, "vec_id")
      val probes = Seq(
        "lo" -> emb.orderBy(col("vec_id").asc).limit(1),
        "hi" -> emb.orderBy(col("vec_id").desc).limit(1))
      val out = probes.map { case (tag, q) =>
        Similarity.pqAdcTopK(model, "vec_id", "embedding", q, topK = 10)
          .select(lit(tag).as("probe"), col("vec_id"), col("adc_dist"))
      }.reduce(_ unionByName _)
        .join(codes, "vec_id")
        .select(Seq(col("probe"), col("vec_id")) ++
          (0 until 4).map(i => col(s"code_$i")) :+ col("adc_dist"): _*)
        .persist()
      out.count() // materialize before releasing the model caches
      model.release()
      out
    },

    // IVF-PQ (Jégou et al. 2011 §V; faiss IVFPQ with by_residual=false):
    // the billion-vector index shape — the coarse quantizer routes the
    // query to its cell, and ONLY that cell's PQ codes are ADC-ranked
    // (per query: |corpus|/nCells lookups instead of the corpus). Oracle
    // = q58's cell CTEs (renamed) + q146's PQ chains + the cell filter.
    Q("q153_ann_ivf_pq", ivfPqAdcOracle(m = 4, sub = 16, k = 4, iters = 2)) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.annIvfPq(emb, "vec_id", "embedding",
        query = emb.orderBy("vec_id").limit(1), topK = 10, nCells = 16,
        m = 4, subDims = 16, k = 4, iters = 2)
    },

    // Multi-probe IVF-PQ (faiss's nprobe knob): rank the PQ codes of the
    // query's 4 nearest cells, not just its own — the recall lever whose
    // per-query cost is nProbe·|cell| (still ≪ corpus). Probe ranking
    // uses the same (cosine desc, cid asc) total order as the cell
    // assignment, so the oracle reads the probes straight off iasg's
    // rn <= 4 rows.
    Q("q154_ivf_pq_nprobe", {
      val (m, sub, k, iters, nProbe) = (4, 16, 4, 2, 4)
      val chains = (0 until m).map { s =>
        val sfx = s"p$s"
        s"""${kmeansCtes(k, iters, sfx = sfx, dims = sub,
             srcList = s"embedding[${s * sub + 1}:${(s + 1) * sub}]")},
           |uF$s AS (SELECT a.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
           |           COUNT(*) AS n
           |         FROM a$sfx$iters a JOIN ed$sfx USING (vec_id)
           |         CROSS JOIN range(1, ${sub + 1}) r(d) GROUP BY a.cid, d),
           |cF$s AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
           |         FROM uF$s GROUP BY cid),
           |qq$s AS (SELECT list_transform(embedding[${s * sub + 1}:${(s + 1) * sub}],
           |           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS qd
           |         FROM embeddings ORDER BY vec_id LIMIT 1),
           |dt$s AS (SELECT cid,
           |           list_reduce(list_transform(generate_series(1, $sub),
           |             d -> (qq.qd[d] - cv[d]) * (qq.qd[d] - cv[d])), (x, y) -> x + y) AS ds
           |         FROM cF$s CROSS JOIN qq$s qq)""".stripMargin
      }.mkString(",\n")
      val joins = (0 until m).map(s =>
        s"JOIN ap$s$iters a$s ON ic.cell_id = a$s.vec_id JOIN dt$s ON a$s.cid = dt$s.cid")
        .mkString("\n")
      val adc = (0 until m).map(s => s"dt$s.ds").mkString(" + ")
      s"""$normCte,
         |icent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY vec_id LIMIT 16),
         |iasg AS (
         |  SELECT n.vec_id, cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_reduce(list_transform(generate_series(1, 64), k -> n.v[k] * cv[k]),
         |        (x, y) -> x + y) / (n.nrm * cnrm) DESC, cid) AS rn
         |  FROM n CROSS JOIN icent),
         |icells AS (SELECT vec_id AS cell_id, cid AS cell FROM iasg WHERE rn = 1),
         |qa AS (SELECT MIN(vec_id) AS q_id FROM embeddings),
         |qprobes AS (SELECT iasg.cid AS q_cell FROM iasg, qa
         |            WHERE iasg.vec_id = qa.q_id AND rn <= $nProbe),
         |$chains
         |SELECT ic.cell_id AS vec_id, ROUND($adc, 6) AS adc_dist
         |FROM icells ic
         |JOIN qprobes ON ic.cell = qprobes.q_cell
         |$joins
         |CROSS JOIN qa
         |WHERE ic.cell_id <> qa.q_id
         |ORDER BY $adc ASC, ic.cell_id
         |LIMIT 10""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val q = emb.orderBy("vec_id").limit(1)
      val cells = Similarity.ivfCells(emb, "vec_id", "embedding", nCells = 16)
      val model = Similarity.pqFit(emb, "vec_id", "embedding",
        m = 4, subDims = 16, k = 4, iters = 2)
      val probes = Similarity.ivfProbeCells(emb, "vec_id", "embedding", q,
        nCells = 16, nProbe = 4)
      val out = Similarity.ivfPqTopK(model, cells, probes,
        "vec_id", "embedding", q, topK = 10).persist()
      out.count() // materialize before releasing the model caches
      model.release()
      out
    },

    // IVF-PQ + exact REFINE (faiss's refine stage): the ADC top-50 PER
    // PROBED CELL (per-cell quota — pool(nProbe=4) ⊇ pool(nProbe=1) by
    // construction, making the nprobe knob provably monotone; a global
    // top-R pool shrinks per-cell as probes widen) is re-ranked by exact
    // cosine and cut to 10. Closes the round-9 coarse-ADC displacement
    // finding (nProbe=4 recall 0.30 < own-cell 0.33; refined: 0.73+).
    // Oracle = q154's probe/ADC CTEs with a per-cell rank window and the
    // exact-cosine re-rank fold.
    Q("q167_ivf_pq_refine", {
      val (m, sub, k, iters, nProbe, topR) = (4, 16, 4, 2, 4, 50)
      val chains = (0 until m).map { s =>
        val sfx = s"p$s"
        s"""${kmeansCtes(k, iters, sfx = sfx, dims = sub,
             srcList = s"embedding[${s * sub + 1}:${(s + 1) * sub}]")},
           |uF$s AS (SELECT a.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
           |           COUNT(*) AS n
           |         FROM a$sfx$iters a JOIN ed$sfx USING (vec_id)
           |         CROSS JOIN range(1, ${sub + 1}) r(d) GROUP BY a.cid, d),
           |cF$s AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
           |         FROM uF$s GROUP BY cid),
           |qq$s AS (SELECT list_transform(embedding[${s * sub + 1}:${(s + 1) * sub}],
           |           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS qd
           |         FROM embeddings ORDER BY vec_id LIMIT 1),
           |dt$s AS (SELECT cid,
           |           list_reduce(list_transform(generate_series(1, $sub),
           |             d -> (qq.qd[d] - cv[d]) * (qq.qd[d] - cv[d])), (x, y) -> x + y) AS ds
           |         FROM cF$s CROSS JOIN qq$s qq)""".stripMargin
      }.mkString(",\n")
      val joins = (0 until m).map(s =>
        s"JOIN ap$s$iters a$s ON ic.cell_id = a$s.vec_id JOIN dt$s ON a$s.cid = dt$s.cid")
        .mkString("\n")
      val adc = (0 until m).map(s => s"dt$s.ds").mkString(" + ")
      val dotAQf = "list_reduce(list_transform(generate_series(1, 64), " +
        "k -> a.v[k] * qf.qv[k]), (x, y) -> x + y)"
      s"""$normCte,
         |icent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY vec_id LIMIT 16),
         |iasg AS (
         |  SELECT n.vec_id, cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_reduce(list_transform(generate_series(1, 64), k -> n.v[k] * cv[k]),
         |        (x, y) -> x + y) / (n.nrm * cnrm) DESC, cid) AS rn
         |  FROM n CROSS JOIN icent),
         |icells AS (SELECT vec_id AS cell_id, cid AS cell FROM iasg WHERE rn = 1),
         |qa AS (SELECT MIN(vec_id) AS q_id FROM embeddings),
         |qprobes AS (SELECT iasg.cid AS q_cell FROM iasg, qa
         |            WHERE iasg.vec_id = qa.q_id AND rn <= $nProbe),
         |$chains,
         |poolr AS (
         |  SELECT vec_id FROM (
         |    SELECT ic.cell_id AS vec_id,
         |      row_number() OVER (PARTITION BY ic.cell
         |        ORDER BY $adc ASC, ic.cell_id) AS prn
         |    FROM icells ic
         |    JOIN qprobes ON ic.cell = qprobes.q_cell
         |    $joins
         |    CROSS JOIN qa
         |    WHERE ic.cell_id <> qa.q_id) t
         |  WHERE prn <= $topR),
         |qf AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n ORDER BY vec_id LIMIT 1)
         |SELECT a.vec_id, ROUND($dotAQf / (a.nrm * qf.qn), 6) AS cos_sim
         |FROM n a JOIN poolr p ON a.vec_id = p.vec_id
         |CROSS JOIN qf
         |ORDER BY $dotAQf / (a.nrm * qf.qn) DESC, a.vec_id
         |LIMIT 10""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val q = emb.orderBy("vec_id").limit(1)
      val cells = Similarity.ivfCells(emb, "vec_id", "embedding", nCells = 16)
      val model = Similarity.pqFit(emb, "vec_id", "embedding",
        m = 4, subDims = 16, k = 4, iters = 2)
      val probes = Similarity.ivfProbeCells(emb, "vec_id", "embedding", q,
        nCells = 16, nProbe = 4)
      val out = Similarity.ivfPqRefineTopK(model, cells, probes, emb,
        "vec_id", "embedding", q, topR = 50, topK = 10).persist()
      out.count() // materialize before releasing the model caches
      model.release()
      out
    },

    // Residual-coded IVF-PQ (faiss by_residual=true; round-9 stretch
    // item 8): the PQ codebook fits CELL-RELATIVE residuals — exact
    // integer differences on the quantization grid, so determinism and
    // the SQL oracle survive the encoding. Oracle = q153's cell CTEs +
    // a residual CTE + the SAME kmeans/ADC chains re-rooted at the
    // residual frame (kmeansCtes srcFrom).
    Q("q169_ivf_pq_residual", {
      val (m, sub, k, iters) = (4, 16, 4, 2)
      val chains = (0 until m).map { s =>
        val sfx = s"p$s"
        s"""${kmeansCtes(k, iters, sfx = sfx, dims = sub,
             srcList = s"rq[${s * sub + 1}:${(s + 1) * sub}]", srcFrom = "resid",
             distinctSeeds = true)},
           |uF$s AS (SELECT a.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
           |           COUNT(*) AS n
           |         FROM a$sfx$iters a JOIN ed$sfx USING (vec_id)
           |         CROSS JOIN range(1, ${sub + 1}) r(d) GROUP BY a.cid, d),
           |cF$s AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
           |         FROM uF$s GROUP BY cid),
           |qq$s AS (SELECT list_transform(rq[${s * sub + 1}:${(s + 1) * sub}],
           |           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS qd
           |         FROM resid ORDER BY vec_id LIMIT 1),
           |dt$s AS (SELECT cid,
           |           list_reduce(list_transform(generate_series(1, $sub),
           |             d -> (qq.qd[d] - cv[d]) * (qq.qd[d] - cv[d])), (x, y) -> x + y) AS ds
           |         FROM cF$s CROSS JOIN qq$s qq)""".stripMargin
      }.mkString(",\n")
      val joins = (0 until m).map(s =>
        s"JOIN ap$s$iters a$s ON ic.cell_id = a$s.vec_id JOIN dt$s ON a$s.cid = dt$s.cid")
        .mkString("\n")
      val adc = (0 until m).map(s => s"dt$s.ds").mkString(" + ")
      s"""$normCte,
         |icent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY vec_id LIMIT 16),
         |iasg AS (
         |  SELECT n.vec_id, cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_reduce(list_transform(generate_series(1, 64), k -> n.v[k] * cv[k]),
         |        (x, y) -> x + y) / (n.nrm * cnrm) DESC, cid) AS rn
         |  FROM n CROSS JOIN icent),
         |icells AS (SELECT vec_id AS cell_id, cid AS cell FROM iasg WHERE rn = 1),
         |qe AS (SELECT vec_id, list_transform(embedding,
         |         x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
         |       FROM embeddings),
         |cq AS (SELECT c2.cell, qe.qv AS cqv
         |       FROM (SELECT DISTINCT cell FROM icells) c2
         |       JOIN qe ON qe.vec_id = c2.cell),
         |resid AS (SELECT qe.vec_id, icells.cell,
         |            list_transform(generate_series(1, 64),
         |              d -> CAST(qe.qv[d] - cq.cqv[d] AS DOUBLE)) AS rq
         |          FROM qe JOIN icells ON qe.vec_id = icells.cell_id
         |                  JOIN cq ON icells.cell = cq.cell),
         |qc AS (SELECT c.cell AS q_cell, n.vec_id AS q_id
         |       FROM n JOIN icells c ON n.vec_id = c.cell_id
         |       ORDER BY n.vec_id LIMIT 1),
         |$chains
         |SELECT ic.cell_id AS vec_id, ROUND($adc, 6) AS adc_dist
         |FROM icells ic
         |$joins
         |CROSS JOIN qc
         |WHERE ic.cell = qc.q_cell AND ic.cell_id <> qc.q_id
         |ORDER BY $adc ASC, ic.cell_id
         |LIMIT 10""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.annIvfPqResidual(emb, "vec_id", "embedding",
        query = emb.orderBy("vec_id").limit(1), topK = 10, nCells = 16,
        m = 4, subDims = 16, k = 4, iters = 2)
    },

    // The full production faiss IVFPQ shape (round-11): TRAINED coarse
    // quantizer (q168's k-means cells) + by_residual coding ANCHORED at
    // each cell's min-id member + ADC. Anchoring (vs q169's seed-vector
    // centroids) keeps residuals cell-relative even when Lloyd drifts a
    // cluster away from its seed id — the mixture-of-scales fix measured
    // on the planted-blob fixture. Oracle = q168's trained-cell CTEs +
    // a min-id-member anchor CTE + q169's residual/PQ/ADC chains.
    Q("q172_ivf_pq_residual_trained", {
      val (m, sub, k, iters) = (4, 16, 4, 2)
      val chains = (0 until m).map { s =>
        val sfx = s"p$s"
        s"""${kmeansCtes(k, iters, sfx = sfx, dims = sub,
             srcList = s"rq[${s * sub + 1}:${(s + 1) * sub}]", srcFrom = "resid",
             distinctSeeds = true)},
           |uF$s AS (SELECT a.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
           |           COUNT(*) AS n
           |         FROM a$sfx$iters a JOIN ed$sfx USING (vec_id)
           |         CROSS JOIN range(1, ${sub + 1}) r(d) GROUP BY a.cid, d),
           |cF$s AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
           |         FROM uF$s GROUP BY cid),
           |qq$s AS (SELECT list_transform(rq[${s * sub + 1}:${(s + 1) * sub}],
           |           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS qd
           |         FROM resid ORDER BY vec_id LIMIT 1),
           |dt$s AS (SELECT cid,
           |           list_reduce(list_transform(generate_series(1, $sub),
           |             d -> (qq.qd[d] - cv[d]) * (qq.qd[d] - cv[d])), (x, y) -> x + y) AS ds
           |         FROM cF$s CROSS JOIN qq$s qq)""".stripMargin
      }.mkString(",\n")
      val joins = (0 until m).map(s =>
        s"JOIN ap$s$iters a$s ON ic.cell_id = a$s.vec_id JOIN dt$s ON a$s.cid = dt$s.cid")
        .mkString("\n")
      val adc = (0 until m).map(s => s"dt$s.ds").mkString(" + ")
      s"""WITH ${kmeansCtes(16, 2)},
         |cells AS (SELECT vec_id AS cell_id, cid AS cell FROM a2),
         |qe AS (SELECT vec_id, list_transform(embedding,
         |         x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
         |       FROM embeddings),
         |anch AS (SELECT cell, MIN(cell_id) AS aid FROM cells GROUP BY cell),
         |cq AS (SELECT anch.cell, qe.qv AS cqv
         |       FROM anch JOIN qe ON qe.vec_id = anch.aid),
         |resid AS (SELECT qe.vec_id, cells.cell,
         |            list_transform(generate_series(1, 64),
         |              d -> CAST(qe.qv[d] - cq.cqv[d] AS DOUBLE)) AS rq
         |          FROM qe JOIN cells ON qe.vec_id = cells.cell_id
         |                  JOIN cq ON cells.cell = cq.cell),
         |qc AS (SELECT cell AS q_cell, cell_id AS q_id
         |       FROM cells ORDER BY cell_id LIMIT 1),
         |$chains
         |SELECT ic.cell_id AS vec_id, ROUND($adc, 6) AS adc_dist
         |FROM cells ic
         |$joins
         |CROSS JOIN qc
         |WHERE ic.cell = qc.q_cell AND ic.cell_id <> qc.q_id
         |ORDER BY $adc ASC, ic.cell_id
         |LIMIT 10""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val idx = IvfPqIndex.fit(emb, IvfPqConfig("vec_id", "embedding",
        nCells = 16, m = 4, subDims = 16, k = 4, iters = 2,
        trained = true, residual = true))
      val out = idx.search(emb.orderBy("vec_id").limit(1), topK = 10).persist()
      out.count() // materialize before dropping the index caches
      idx.release()
      out
    },

    // Trained-quantizer MULTI-PROBE serving (round-11): until now the
    // nprobe knob existed only for the lowest-id quantizer
    // (ivfProbeCells hardcodes it) — trained cells couldn't serve
    // nProbe>1 or the refine funnel. ivfCellsTrainedWithCentroids keeps
    // the Lloyd centroids; ivfProbeCellsTrained ranks them by the SAME
    // grid-euclidean metric the assignment argmin'd (ties on cell id),
    // so nProbe=1 is exactly the query's own cell and probe lists are
    // rank-prefixes (the refine quota's monotonicity argument carries
    // over). Composed with q167's per-cell-quota refine: the full
    // trained-IVF serving funnel. Oracle = q168's trained-cell CTEs
    // (suffixed g) + a centroid-ranked probe CTE + q167's ADC chains,
    // per-cell rank window, and exact-cosine re-rank.
    Q("q174_ivf_pq_refine_trained", {
      val (m, sub, k, iters, nProbe, topR) = (4, 16, 4, 2, 2, 50)
      val chains = (0 until m).map { s =>
        val sfx = s"p$s"
        s"""${kmeansCtes(k, iters, sfx = sfx, dims = sub,
             srcList = s"embedding[${s * sub + 1}:${(s + 1) * sub}]")},
           |uF$s AS (SELECT a.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
           |           COUNT(*) AS n
           |         FROM a$sfx$iters a JOIN ed$sfx USING (vec_id)
           |         CROSS JOIN range(1, ${sub + 1}) r(d) GROUP BY a.cid, d),
           |cF$s AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
           |         FROM uF$s GROUP BY cid),
           |qq$s AS (SELECT list_transform(embedding[${s * sub + 1}:${(s + 1) * sub}],
           |           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS qd
           |         FROM embeddings ORDER BY vec_id LIMIT 1),
           |dt$s AS (SELECT cid,
           |           list_reduce(list_transform(generate_series(1, $sub),
           |             d -> (qq.qd[d] - cv[d]) * (qq.qd[d] - cv[d])), (x, y) -> x + y) AS ds
           |         FROM cF$s CROSS JOIN qq$s qq)""".stripMargin
      }.mkString(",\n")
      val joins = (0 until m).map(s =>
        s"JOIN ap$s$iters a$s ON ic.cell_id = a$s.vec_id JOIN dt$s ON a$s.cid = dt$s.cid")
        .mkString("\n")
      val adc = (0 until m).map(s => s"dt$s.ds").mkString(" + ")
      val dotAQf = "list_reduce(list_transform(generate_series(1, 64), " +
        "k -> a.v[k] * qf.qv[k]), (x, y) -> x + y)"
      s"""$normCte,
         |${kmeansCtes(16, 2, sfx = "g")},
         |cells AS (SELECT vec_id AS cell_id, cid AS cell FROM ag2),
         |qd AS (SELECT dv AS qd FROM edg ORDER BY vec_id LIMIT 1),
         |qprobes AS (SELECT cid AS q_cell FROM (
         |  SELECT cg1.cid, row_number() OVER (ORDER BY
         |    list_reduce(list_transform(generate_series(1, 64),
         |      d -> (qd.qd[d] - cg1.cv[d]) * (qd.qd[d] - cg1.cv[d])),
         |      (x, y) -> x + y) ASC, cg1.cid) AS rn
         |  FROM cg1 CROSS JOIN qd) t WHERE rn <= $nProbe),
         |qa AS (SELECT MIN(vec_id) AS q_id FROM embeddings),
         |$chains,
         |poolr AS (
         |  SELECT vec_id FROM (
         |    SELECT ic.cell_id AS vec_id,
         |      row_number() OVER (PARTITION BY ic.cell
         |        ORDER BY $adc ASC, ic.cell_id) AS prn
         |    FROM cells ic
         |    JOIN qprobes ON ic.cell = qprobes.q_cell
         |    $joins
         |    CROSS JOIN qa
         |    WHERE ic.cell_id <> qa.q_id) t
         |  WHERE prn <= $topR),
         |qf AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n ORDER BY vec_id LIMIT 1)
         |SELECT a.vec_id, ROUND($dotAQf / (a.nrm * qf.qn), 6) AS cos_sim
         |FROM n a JOIN poolr p ON a.vec_id = p.vec_id
         |CROSS JOIN qf
         |ORDER BY $dotAQf / (a.nrm * qf.qn) DESC, a.vec_id
         |LIMIT 10""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val idx = IvfPqIndex.fit(emb, IvfPqConfig("vec_id", "embedding",
        nCells = 16, m = 4, subDims = 16, k = 4, iters = 2, trained = true))
      val out = idx.search(emb.orderBy("vec_id").limit(1), topK = 10,
        nProbe = 2, refine = Some(50)).persist()
      out.count() // materialize before dropping the index caches
      idx.release()
      out
    },

    // IVF-PQ index PERSISTENCE (round-11): fit once, write the index as
    // bucketed tables (codebooks + codes + cells — the band-index
    // pattern), read it back, and SERVE from the tables: after the
    // write, ADC serving touches only the index + the query vector,
    // never the corpus embeddings — the point of PQ at 100 TB (m small
    // codes per row stand in for the full vectors). The oracle is
    // q153's SQL VERBATIM: the roundtrip must be bit-identical to the
    // in-memory fit (deterministic fits + exact parquet roundtrip of
    // integer-grid doubles), and the hash gate proves it.
    Q("q175_pq_index_roundtrip",
      ivfPqAdcOracle(m = 4, sub = 16, k = 4, iters = 2)) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val q = emb.orderBy("vec_id").limit(1)
      val idx = IvfPqIndex.fit(emb, IvfPqConfig("vec_id", "embedding",
        nCells = 16, m = 4, subDims = 16, k = 4, iters = 2))
      // per-sf table name: one warehouse serves every sf's run
      val table = "pq_index_q175_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      idx.write(table)
      idx.release()
      IvfPqIndex.read(s, table, "embedding").search(q, topK = 10)
    },

    // GROW the persisted index without refitting (faiss add(); round-11):
    // fit + write on the 90% "already ingested" corpus slice (q132's
    // split convention), append the 10% batch — new vectors encode
    // against the STORED codebooks (nearest final codeword, grid
    // euclid, low-cid ties) and pick cells via the stored coarse seed
    // vectors (cosine argmax, low-id ties) — then serve a query that
    // only exists in the appended batch. Oracle replays BOTH encoding
    // rules: old rows carry the kmeans assignment (train-time), new
    // rows the final-codebook assignment (add-time); cells are one
    // cosine argmax over the old seeds for ALL rows (the append uses
    // the same stored quantizer the build used).
    Q("q176_pq_index_append", pqIndexAppendServeOracle) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val old = emb.filter(col("vec_id") % 10 =!= 0)
      val fresh = emb.filter(col("vec_id") % 10 === 0)
      val idx = IvfPqIndex.fit(old, IvfPqConfig("vec_id", "embedding",
        nCells = 16, m = 4, subDims = 16, k = 4, iters = 2))
      val table = "pq_index_q176_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      idx.write(table) // growable by default: coarse seeds stored
      idx.release()
      IvfPqIndex.append(s, table, fresh, "embedding")
      val q = fresh.orderBy("vec_id").limit(1)
      IvfPqIndex.read(s, table, "embedding").search(q, topK = 10)
    },

    // COMPACT the appended index (round 14): same build + append + serve
    // flow as q176, with IvfPqIndex.compact between append and serve —
    // compaction is a pure physical rewrite (one file per bucket), so
    // the served top-k is bit-identical and the oracle is q176's
    // verbatim. The file-count shrink itself is pinned by
    // IvfPqIndexSpec (an engine-layout property DuckDB can't see).
    Q("q179_pq_index_compact", pqIndexAppendServeOracle) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val old = emb.filter(col("vec_id") % 10 =!= 0)
      val fresh = emb.filter(col("vec_id") % 10 === 0)
      val idx = IvfPqIndex.fit(old, IvfPqConfig("vec_id", "embedding",
        nCells = 16, m = 4, subDims = 16, k = 4, iters = 2))
      val table = "pq_index_q179_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      idx.write(table)
      idx.release()
      IvfPqIndex.append(s, table, fresh, "embedding")
      IvfPqIndex.compact(s, table)
      val q = fresh.orderBy("vec_id").limit(1)
      IvfPqIndex.read(s, table, "embedding").search(q, topK = 10)
    },

    // SemDeDup (Abbas et al. 2023): semantic near-duplicates — k-means
    // blocking, intra-cluster cosine ≥ 0.35 pairs (threshold chosen
    // against the synthetic embedding distribution: ~271 over-threshold
    // pairs corpus-wide at sf0.01, max pairwise cosine 0.51), min-id
    // similarity components. The dedup mode n-gram methods miss.
    Q("q143_semdedup",
      semDedupOracle(k = 8, iters = 2, tau = "0.35")) { (s, dir) =>
      Similarity.semDedup(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, tau = 0.35)
    },

    // Matryoshka truncation curve: top-10 overlap between each prefix-d
    // cosine ranking and the full 64-dim ranking — the dims-vs-recall
    // trade that sizes a truncated vector index. Prefix cosine is the
    // same left-to-right fold over the slice in both engines.
    Q("q131_matryoshka_recall", {
      val dims = Seq(8, 16, 32, 64)
      val perD = dims.map { d =>
        val dotD = s"list_reduce(list_transform(generate_series(1, $d), k -> a.v[k] * qf.qv[k]), (x, y) -> x + y)"
        val naD = s"sqrt(list_reduce(list_transform(generate_series(1, $d), k -> a.v[k] * a.v[k]), (x, y) -> x + y))"
        val nqD = s"sqrt(list_reduce(list_transform(generate_series(1, $d), k -> qf.qv[k] * qf.qv[k]), (x, y) -> x + y))"
        s"""r$d AS (
           |  SELECT a.vec_id FROM e a CROSS JOIN qf
           |  WHERE a.vec_id <> qf.q_id
           |  ORDER BY $dotD / ($naD * $nqD) DESC, a.vec_id
           |  LIMIT 10),
           |o$d AS (SELECT $d AS dims, CAST(COUNT(*) AS BIGINT) AS n_hits,
           |        ROUND(COUNT(*) / 10.0, 6) AS recall
           |        FROM r$d JOIN full10 USING (vec_id))""".stripMargin
      }.mkString(",\n")
      s"""$normCte,
         |qf AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n ORDER BY vec_id LIMIT 1),
         |full10 AS (
         |  SELECT a.vec_id FROM n a CROSS JOIN qf
         |  WHERE a.vec_id <> qf.q_id
         |  ORDER BY list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * qf.qv[k]),
         |        (x, y) -> x + y) / (a.nrm * qf.qn) DESC, a.vec_id
         |  LIMIT 10),
         |$perD
         |${dims.map(d => s"SELECT * FROM o$d").mkString("\nUNION ALL ")}""".stripMargin
    }) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.matryoshkaRecall(emb, "vec_id", "embedding",
        query = emb.orderBy("vec_id").limit(1), k = 10,
        dimsList = Seq(8, 16, 32, 64))
    },

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical top-20
    // (q93's scoring, documents) and the cosine vector top-20 (q37's
    // anchor query, embeddings) — the standard RAG combiner over
    // uncalibrated retriever scores. Both input rankings and the fusion
    // fold are total-ordered, so the oracle replays list selection
    // (by raw score), in-fusion ranks (by rounded score, id) and the
    // source-ordered 1/(60+r) sum exactly.
    Q("q129_rrf_hybrid",
      s"""$normCte,
         |toks AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
         |lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM lens),
         |tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest(t) AS term FROM toks)
         |  WHERE term IN ('spark', 'window', 'dup') GROUP BY doc_id, term),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |scored AS (
         |  SELECT doc_id, term,
         |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl
         |          / (CAST(sum_dl AS DOUBLE) / n_docs))) AS s
         |  FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
         |bagg AS (
         |  SELECT doc_id, list_reduce(array_agg(s ORDER BY term), (a, b) -> a + b) AS raw
         |  FROM scored GROUP BY doc_id),
         |rb AS (SELECT doc_id AS id, ROUND(raw, 6) AS score
         |       FROM bagg ORDER BY raw DESC, doc_id LIMIT 20),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n ORDER BY vec_id LIMIT 1),
         |rv AS (
         |  SELECT a.vec_id AS id,
         |    ROUND(list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |          (x, y) -> x + y) / (a.nrm * q.qn), 6) AS score
         |  FROM n a CROSS JOIN q
         |  WHERE a.vec_id <> q.q_id
         |  ORDER BY list_reduce(list_transform(generate_series(1, 64), k -> a.v[k] * q.qv[k]),
         |          (x, y) -> x + y) / (a.nrm * q.qn) DESC, a.vec_id
         |  LIMIT 20),
         |rb2 AS (SELECT id, 0 AS src, row_number() OVER (ORDER BY score DESC, id) AS r FROM rb),
         |rv2 AS (SELECT id, 1 AS src, row_number() OVER (ORDER BY score DESC, id) AS r FROM rv),
         |u AS (SELECT * FROM rb2 UNION ALL SELECT * FROM rv2),
         |f AS (
         |  SELECT id, CAST(COUNT(*) AS INT) AS n_lists,
         |    list_reduce(list_transform(array_agg({'s': src, 'r': r} ORDER BY src),
         |      x -> 1.0 / (60 + x.r)), (a, b) -> a + b) AS raw
         |  FROM u GROUP BY id)
         |SELECT id, n_lists, ROUND(raw, 9) AS rrf
         |FROM f ORDER BY raw DESC, id LIMIT 10""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val emb = Tables(s, dir, "embeddings")
      val lexical = graft.text.TextStats.bm25TopK(docs, "doc_id", "text",
          terms = Seq("spark", "window", "dup"), k = 20)
        .select(col("doc_id").as("id"), col("bm25").as("score"))
      val dense = Similarity.knnBrute(emb, "vec_id", "embedding",
          query = emb.orderBy("vec_id").limit(1), k = 20)
        .select(col("vec_id").as("id"), round(col("cos_raw"), 6).as("score"))
      Similarity.rrfFuse(Seq(lexical, dense), "id", "score", topK = 10)
    },

    // Symmetric int8 quantization — the 4× vector-store compression step.
    // Every op is IEEE-exact (no transcendentals, floor not round), so
    // the quantized codes hash-match across engines element for element.
    // The library op (Similarity.quantizeInt8) returns the real
    // array<int> codes; the query surface joins them to one CSV string
    // because the correctness harness cannot sort/hash raw array cells
    // (round-5 lesson) — same information, comparator-safe shape.
    Q("q113_embedding_quantize",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |a AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM v),
        |qt AS (
        |  SELECT vec_id, CAST(len(v) AS INT) AS n_dims, amax,
        |    CASE WHEN amax = 0
        |         THEN list_transform(v, x -> CAST(0 AS INT))
        |         ELSE list_transform(v, x -> CAST(floor(x * 127.0 / amax + 0.5) AS INT))
        |    END AS q
        |  FROM a)
        |SELECT vec_id, n_dims, amax,
        |  array_to_string(q, ',') AS q_codes,
        |  CAST(list_reduce(list_transform(q, x -> CAST(x AS BIGINT)), (a, b) -> a + b)
        |    AS BIGINT) AS sum_q
        |FROM qt""".stripMargin) { (s, dir) =>
      Similarity.quantizeInt8(Tables(s, dir, "embeddings"), "vec_id", "embedding")
        .withColumn("q_codes", array_join(col("q"), ","))
        .drop("q")
    },
  )

  /** Unrolled Lloyd iterations: quantize → seed centroids (k lowest ids)
    * → [assign → integer-sum update]^(iters−1) → final assignment.
    * Mirrors Clustering.kmeans frame by frame. */
  /** The unrolled-Lloyd CTE chain (quantized coords, (distance, cid)
    * argmin — mirrors Clustering.kmeans exactly), ending in the final
    * assignment CTE `a{iters}(vec_id, cid)`. Shared by q97 and the
    * SemDeDup oracle. */
  // private[queries]: q177's composed curation oracle re-roots the
  // semantic-dedup k-means at its mid-funnel survivor CTE
  private[queries] def kmeansCtes(k: Int, iters: Int, sfx: String = "",
      dims: Int = 64, srcList: String = "embedding",
      srcFrom: String = "embeddings", distinctSeeds: Boolean = false): String = {
    def assignCte(a: String, c: String): String =
      s"""$a AS (SELECT vec_id, cid FROM (
         |  SELECT ed$sfx.vec_id, $c.cid, row_number() OVER (PARTITION BY ed$sfx.vec_id
         |    ORDER BY list_reduce(list_transform(generate_series(1, $dims),
         |      d -> (ed$sfx.dv[d] - $c.cv[d]) * (ed$sfx.dv[d] - $c.cv[d])),
         |      (x, y) -> x + y) ASC, $c.cid) AS rn
         |  FROM ed$sfx CROSS JOIN $c) t WHERE rn = 1)""".stripMargin
    val steps = (1 until iters).map { i =>
      s"""${assignCte(s"a$sfx$i", s"c$sfx${i - 1}")},
         |u$sfx$i AS (SELECT a$sfx$i.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
         |          COUNT(*) AS n
         |        FROM a$sfx$i JOIN ed$sfx USING (vec_id) CROSS JOIN range(1, ${dims + 1}) r(d)
         |        GROUP BY a$sfx$i.cid, d),
         |c$sfx$i AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
         |        FROM u$sfx$i GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    s"""e$sfx AS (
       |  SELECT vec_id, list_transform($srcList,
       |    x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
       |  FROM $srcFrom),
       |ed$sfx AS (SELECT vec_id, qv, list_transform(qv, x -> CAST(x AS DOUBLE)) AS dv
       |       FROM e$sfx),
       |c${sfx}0 AS (${
        if (distinctSeeds)
          s"""SELECT MIN(vec_id) AS cid, list_transform(qv, x -> CAST(x AS DOUBLE)) AS cv
             |       FROM ed$sfx GROUP BY qv ORDER BY cid LIMIT $k""".stripMargin
        else
          s"SELECT vec_id AS cid, dv AS cv FROM ed$sfx ORDER BY vec_id LIMIT $k"
      }),
       |$steps,
       |${assignCte(s"a$sfx$iters", s"c$sfx${iters - 1}")}""".stripMargin
  }

  /** q153's own-cell IVF-PQ ADC oracle, factored for reuse: q175's
    * persisted-index roundtrip must return BIT-IDENTICAL results, so it
    * shares this SQL verbatim. */
  /** The q176/q179 oracle: build on the 90% slice, append the 10%
    * batch with the stored-codebook add-time encoding, serve an
    * appended-batch query — compaction (q179) changes only the file
    * layout, never the rows, so both queries replay this verbatim. */
  private lazy val pqIndexAppendServeOracle: String = {
      val (m, sub, k, iters) = (4, 16, 4, 2)
      val chains = (0 until m).map { s =>
        val sfx = s"p$s"
        s"""${kmeansCtes(k, iters, sfx = sfx, dims = sub,
             srcList = s"embedding[${s * sub + 1}:${(s + 1) * sub}]",
             srcFrom = "eold")},
           |uF$s AS (SELECT a.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
           |           COUNT(*) AS n
           |         FROM a$sfx$iters a JOIN ed$sfx USING (vec_id)
           |         CROSS JOIN range(1, ${sub + 1}) r(d) GROUP BY a.cid, d),
           |cF$s AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
           |         FROM uF$s GROUP BY cid),
           |ednew$s AS (SELECT vec_id,
           |    list_transform(embedding[${s * sub + 1}:${(s + 1) * sub}],
           |      x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS dv
           |  FROM enew),
           |anew$s AS (SELECT vec_id, cid FROM (
           |  SELECT en.vec_id, cF$s.cid, row_number() OVER (PARTITION BY en.vec_id
           |    ORDER BY list_reduce(list_transform(generate_series(1, $sub),
           |      d -> (en.dv[d] - cF$s.cv[d]) * (en.dv[d] - cF$s.cv[d])),
           |      (x, y) -> x + y) ASC, cF$s.cid) AS rn
           |  FROM ednew$s en CROSS JOIN cF$s) t WHERE rn = 1),
           |acomb$s AS (SELECT vec_id, cid FROM a$sfx$iters
           |            UNION ALL SELECT vec_id, cid FROM anew$s),
           |qq$s AS (SELECT list_transform(embedding[${s * sub + 1}:${(s + 1) * sub}],
           |           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS qd
           |         FROM enew ORDER BY vec_id LIMIT 1),
           |dt$s AS (SELECT cid,
           |           list_reduce(list_transform(generate_series(1, $sub),
           |             d -> (qq.qd[d] - cv[d]) * (qq.qd[d] - cv[d])), (x, y) -> x + y) AS ds
           |         FROM cF$s CROSS JOIN qq$s qq)""".stripMargin
      }.mkString(",\n")
      val joins = (0 until m).map(s =>
        s"JOIN acomb$s a$s ON ic.cell_id = a$s.vec_id JOIN dt$s ON a$s.cid = dt$s.cid")
        .mkString("\n")
      val adc = (0 until m).map(s => s"dt$s.ds").mkString(" + ")
      s"""WITH eold AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
         |enew AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
         |nA AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |       FROM embeddings),
         |nN AS (SELECT vec_id, v,
         |         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
         |       FROM nA),
         |icent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM nN
         |          WHERE vec_id % 10 <> 0 ORDER BY vec_id LIMIT 16),
         |iasg AS (
         |  SELECT nN.vec_id, cid,
         |    row_number() OVER (PARTITION BY nN.vec_id ORDER BY
         |      list_reduce(list_transform(generate_series(1, 64), k -> nN.v[k] * cv[k]),
         |        (x, y) -> x + y) / (nN.nrm * cnrm) DESC, cid) AS rn
         |  FROM nN CROSS JOIN icent),
         |icells AS (SELECT vec_id AS cell_id, cid AS cell FROM iasg WHERE rn = 1),
         |qc AS (SELECT cell AS q_cell, cell_id AS q_id FROM icells
         |       WHERE cell_id % 10 = 0 ORDER BY cell_id LIMIT 1),
         |$chains
         |SELECT ic.cell_id AS vec_id, ROUND($adc, 6) AS adc_dist
         |FROM icells ic
         |$joins
         |CROSS JOIN qc
         |WHERE ic.cell = qc.q_cell AND ic.cell_id <> qc.q_id
         |ORDER BY $adc ASC, ic.cell_id
         |LIMIT 10""".stripMargin
    }

  private def ivfPqAdcOracle(m: Int, sub: Int, k: Int, iters: Int): String = {
    val chains = (0 until m).map { s =>
      val sfx = s"p$s"
      s"""${kmeansCtes(k, iters, sfx = sfx, dims = sub,
           srcList = s"embedding[${s * sub + 1}:${(s + 1) * sub}]")},
         |uF$s AS (SELECT a.cid, d, CAST(SUM(ed$sfx.qv[d]) AS BIGINT) AS s,
         |           COUNT(*) AS n
         |         FROM a$sfx$iters a JOIN ed$sfx USING (vec_id)
         |         CROSS JOIN range(1, ${sub + 1}) r(d) GROUP BY a.cid, d),
         |cF$s AS (SELECT cid, array_agg(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
         |         FROM uF$s GROUP BY cid),
         |qq$s AS (SELECT list_transform(embedding[${s * sub + 1}:${(s + 1) * sub}],
         |           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS qd
         |         FROM embeddings ORDER BY vec_id LIMIT 1),
         |dt$s AS (SELECT cid,
         |           list_reduce(list_transform(generate_series(1, $sub),
         |             d -> (qq.qd[d] - cv[d]) * (qq.qd[d] - cv[d])), (x, y) -> x + y) AS ds
         |         FROM cF$s CROSS JOIN qq$s qq)""".stripMargin
    }.mkString(",\n")
    val joins = (0 until m).map(s =>
      s"JOIN ap$s$iters a$s ON ic.cell_id = a$s.vec_id JOIN dt$s ON a$s.cid = dt$s.cid")
      .mkString("\n")
    val adc = (0 until m).map(s => s"dt$s.ds").mkString(" + ")
    s"""$normCte,
       |icent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY vec_id LIMIT 16),
       |iasg AS (
       |  SELECT n.vec_id, cid,
       |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |      list_reduce(list_transform(generate_series(1, 64), k -> n.v[k] * cv[k]),
       |        (x, y) -> x + y) / (n.nrm * cnrm) DESC, cid) AS rn
       |  FROM n CROSS JOIN icent),
       |icells AS (SELECT vec_id AS cell_id, cid AS cell FROM iasg WHERE rn = 1),
       |qc AS (SELECT c.cell AS q_cell, n.vec_id AS q_id
       |       FROM n JOIN icells c ON n.vec_id = c.cell_id
       |       ORDER BY n.vec_id LIMIT 1),
       |$chains
       |SELECT ic.cell_id AS vec_id, ROUND($adc, 6) AS adc_dist
       |FROM icells ic
       |$joins
       |CROSS JOIN qc
       |WHERE ic.cell = qc.q_cell AND ic.cell_id <> qc.q_id
       |ORDER BY $adc ASC, ic.cell_id
       |LIMIT 10""".stripMargin
  }

  private def kmeansOracle(k: Int, iters: Int): String =
    s"""WITH ${kmeansCtes(k, iters)}
       |SELECT vec_id, cid AS cluster FROM a$iters""".stripMargin

  /** q143 oracle: unrolled k-means, raw-double norms, intra-cluster
    * τ-threshold pairs, and the similarity components as a constrained
    * min-reachability recursive CTE (the q140 pattern). */
  private def semDedupOracle(k: Int, iters: Int, tau: String): String =
    s"""WITH RECURSIVE ${kmeansCtes(k, iters)},
       |asgf AS (SELECT vec_id, cid AS cluster FROM a$iters),
       |vr AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |       FROM embeddings),
       |nr AS (SELECT vec_id, v,
       |         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
       |       FROM vr),
       |pp AS MATERIALIZED (
       |  SELECT x.vec_id AS src, y.vec_id AS dst
       |  FROM nr x JOIN asgf cx ON x.vec_id = cx.vec_id
       |       JOIN asgf cy ON cx.cluster = cy.cluster
       |       JOIN nr y ON y.vec_id = cy.vec_id AND x.vec_id < y.vec_id
       |  WHERE list_reduce(list_transform(generate_series(1, 64), d -> x.v[d] * y.v[d]),
       |          (p, q) -> p + q) / (x.nrm * y.nrm) >= $tau),
       |und AS (SELECT src, dst FROM pp UNION ALL SELECT dst AS src, src AS dst FROM pp),
       |reach AS (SELECT src AS id, src AS comp FROM und
       |          UNION
       |          SELECT u.src AS id, r.comp FROM und u JOIN reach r ON u.dst = r.id),
       |cc AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id)
       |SELECT a.vec_id, a.cluster,
       |  COALESCE(cc.comp, a.vec_id) AS keep_id,
       |  COALESCE(cc.comp, a.vec_id) <> a.vec_id AS is_dup
       |FROM asgf a LEFT JOIN cc ON a.vec_id = cc.id""".stripMargin
}
