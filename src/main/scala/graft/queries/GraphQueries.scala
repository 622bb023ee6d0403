package graft.queries

import graft.{Q, Tables}
import graft.graph.GraphOps
import graft.operators.{Relational => R}
import org.apache.spark.sql.functions._

/** Graph/community queries (SURVEY §2.10) over graphs derived from the
  * synthetic tables: part–supplier bipartite (lineitem co-occurrence —
  * the artists–genres analog) and customer–nation membership (the
  * artist–country analog).
  *
  * Vertex-id namespacing for bipartite graphs: left = 2k, right = 2k+1
  * (disjoint longs, reversible with shiftright). GraphX results are
  * normalized back to natural keys before comparison.
  */
object GraphQueries {

  val all: Seq[Q] = Seq(

    // G1 + A11 substrate: bipartite graph build + vertex degrees.
    Q("q39_graph_degree",
      """SELECT 'part' AS kind, CAST(l_partkey AS BIGINT) AS key,
        |       CAST(COUNT(DISTINCT l_suppkey) AS INT) AS degree
        |FROM lineitem GROUP BY l_partkey
        |UNION ALL
        |SELECT 'supplier' AS kind, CAST(l_suppkey AS BIGINT) AS key,
        |       CAST(COUNT(DISTINCT l_partkey) AS INT) AS degree
        |FROM lineitem GROUP BY l_suppkey""".stripMargin) { (s, dir) =>
      val edges = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .select((col("l_partkey") * 2).cast("long").as("src"),
                (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      val g = GraphOps.fromEdges(s, edges, "src", "dst")
      GraphOps.degreesDF(s, g).select(
        when(pmod(col("id"), lit(2)) === 0, "part").otherwise("supplier").as("kind"),
        shiftright(col("id"), 1).as("key"),
        col("degree"))
    },

    // G5: 2-hop traversal from the min-key anchor part — parts reachable
    // via shared suppliers, with connecting-supplier counts. Expressed as
    // edge-DataFrame self-joins (the scalable form of the 2-hop Cypher,
    // ingest_graph_db.py:366-377); the anchor is a scalar subquery, not a
    // driver-side collect.
    Q("q40_two_hop",
      """WITH e AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
        |a AS (SELECT MIN(src) AS anchor FROM e),
        |h1 AS (SELECT DISTINCT e.dst AS mid FROM e, a WHERE e.src = a.anchor)
        |SELECT e.src AS neighbor, COUNT(DISTINCT e.dst) AS n_paths
        |FROM e JOIN h1 ON e.dst = h1.mid, a
        |WHERE e.src <> a.anchor
        |GROUP BY e.src""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "lineitem")
        .select(col("l_partkey").as("src"), col("l_suppkey").as("dst")).distinct()
        // three consumers (anchor agg, hop1, main join) — materialize the
        // distinct edge set once instead of re-shuffling it per branch
        .localCheckpoint()
      val anchor = broadcast(e.agg(min("src").as("anchor")))
      val hop1 = e.join(anchor, col("src") === col("anchor"))
        .select(col("dst").as("mid")).distinct()
      e.join(hop1, col("dst") === col("mid"))
        .join(anchor, col("src") =!= col("anchor"))
        .groupBy(col("src").as("neighbor"))
        .agg(countDistinct(col("mid")).as("n_paths"))
    },

    // G1/G3: GraphX connected components on the customer–nation membership
    // graph, labels normalized to min member key (SURVEY §7.5 risk 2:
    // deterministic labeling instead of engine-internal ids).
    Q("q41_connected_components",
      """SELECT c_custkey, MIN(c_custkey) OVER (PARTITION BY c_nationkey) AS component
        |FROM customer""".stripMargin) { (s, dir) =>
      val edges = Tables(s, dir, "customer")
        .select((col("c_custkey") * 2).cast("long").as("src"),
                (col("c_nationkey") * 2 + 1).cast("long").as("dst"))
      val g = GraphOps.fromEdges(s, edges, "src", "dst")
      val cc = GraphOps.connectedComponentsDF(s, g)
      val cust = cc.filter(pmod(col("id"), lit(2)) === 0)
        .select(shiftright(col("id"), 1).as("c_custkey"), col("component"))
      val labels = cust.groupBy("component").agg(min("c_custkey").as("comp_label"))
      cust.join(labels, "component")
        .select(col("c_custkey"), col("comp_label").as("component"))
    },

    // G2: deterministic synchronous label propagation (the Leiden
    // approximation, SURVEY §7.4) on the part–supplier bipartite graph.
    // Not SQL-expressible — determinism + correctness live in GraphSpec.
    Q.noOracle("q42_lpa_communities") { (s, dir) =>
      val edges = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .select((col("l_partkey") * 2).cast("long").as("src"),
                (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      GraphOps.lpaEdges(edges, "src", "dst", maxIter = 3).select(
        when(pmod(col("id"), lit(2)) === 0, "part").otherwise("supplier").as("kind"),
        shiftright(col("id"), 1).as("key"),
        col("label"))
    },

    // G2 multi-resolution: the 3-level community ladder (fine LPA →
    // contracted LPA → components), the reference's resolution stack
    // [2.0, 0.5, 0.1]. Not SQL-expressible — level structure is asserted
    // in GraphSpec.
    Q.noOracle("q60_community_levels") { (s, dir) =>
      val edges = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .select((col("l_partkey") * 2).cast("long").as("src"),
                (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      GraphOps.communityLevels(s, edges, "src", "dst", iterPerLevel = 2).select(
        when(pmod(col("id"), lit(2)) === 0, "part").otherwise("supplier").as("kind"),
        shiftright(col("id"), 1).as("key"),
        col("level"), col("community"))
    },

    // A7-A11/G4: per-community metadata in ONE pass — member count,
    // distinct-subgroup count, top-2 most frequent attribute values —
    // replacing the reference's per-community Python filter loop
    // (detect_communities.py:294-329).
    Q("q43_community_metadata",
      """WITH base AS (
        |  SELECT n.n_regionkey AS community, c.c_mktsegment AS segment, c.c_nationkey
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |stats AS (
        |  SELECT community, COUNT(*) AS n_members,
        |         COUNT(DISTINCT c_nationkey) AS n_nations
        |  FROM base GROUP BY community),
        |cnt AS (SELECT community, segment, COUNT(*) AS cnt FROM base GROUP BY community, segment),
        |top AS (
        |  SELECT community, segment,
        |         row_number() OVER (PARTITION BY community ORDER BY cnt DESC, segment) AS rn
        |  FROM cnt),
        |ts AS (SELECT community, string_agg(segment, ', ' ORDER BY rn) AS top_segments
        |       FROM top WHERE rn <= 2 GROUP BY community)
        |SELECT s.community, s.n_members, s.n_nations, ts.top_segments
        |FROM stats s JOIN ts USING (community)""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val n = broadcast(Tables(s, dir, "nation"))
      val base = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .select(col("n_regionkey").as("community"), col("c_mktsegment").as("segment"),
                col("c_nationkey"))
      val stats = base.groupBy("community")
        .agg(count(lit(1)).as("n_members"), countDistinct("c_nationkey").as("n_nations"))
      val top = R.topNFrequent(base.select("community", "segment"),
          group = Seq("community"), valueCol = "segment", n = 2)
        .groupBy("community")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("segment")))),
            x => x.getField("segment")),
          ", ").as("top_segments"))
      stats.join(top, "community")
    },
  )
}
