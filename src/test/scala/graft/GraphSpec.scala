package graft

import graft.graph.GraphOps
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3, isolated pair 10-11, bridge-free
  private lazy val edges =
    Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")

  test("connected components: path vs isolated pair (G1/CC)") {
    val g = GraphOps.fromEdges(spark, edges, "src", "dst")
    val cc = GraphOps.connectedComponentsDF(spark, g)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) == cc(2L) && cc(2L) == cc(3L))
    assert(cc(10L) == cc(11L))
    assert(cc(1L) != cc(10L))
    assert(cc(1L) == 1L && cc(10L) == 10L) // min-id labels
  }

  test("degrees match adjacency counts") {
    val g = GraphOps.fromEdges(spark, edges, "src", "dst")
    val d = GraphOps.degreesDF(spark, g).as[(Long, Int)].collect().toMap
    assert(d(2L) == 2 && d(1L) == 1 && d(10L) == 1)
  }

  test("label propagation: two cliques converge to two communities, deterministically") {
    // two 4-cliques joined by a single weak edge
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val e = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L)) ++ Seq((4L, 11L)))
      .toDF("src", "dst")
    val g = GraphOps.fromEdges(spark, e, "src", "dst")
    val run1 = GraphOps.lpaDF(spark, g, 8).as[(Long, Long)].collect().toMap
    val run2 = GraphOps.lpaDF(spark, g, 8).as[(Long, Long)].collect().toMap
    assert(run1 == run2) // deterministic tie-breaks
    val c1 = Seq(1L, 2L, 3L).map(run1) // clique cores agree
    val c2 = Seq(12L, 13L, 14L).map(run1)
    assert(c1.distinct.size == 1 && c2.distinct.size == 1)
    assert(c1.head != c2.head)
    // the Catalyst-loop LPA (the scale path) computes the identical result
    val dfRun = GraphOps.lpaEdges(e, "src", "dst", 8)
      .as[(Long, Long)].collect().toMap
    assert(dfRun == run1)
  }

  test("ccEdges (Catalyst loop) equals GraphX connectedComponents") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("src", "dst")
    val dfCC = GraphOps.ccEdges(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val gxCC = GraphOps.connectedComponentsDF(
      spark, GraphOps.fromEdges(spark, e, "src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(dfCC == gxCC)
    assert(dfCC(4L) == 1L && dfCC(12L) == 10L && dfCC(21L) == 20L)
  }

  test("communityLevels: resolution ladder coarsens monotonically") {
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    // two clique-pairs, bridged within pairs; pairs disconnected from each other
    val e = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(11L, 12L, 13L)) ++ Seq((3L, 11L)) ++
      clique(Seq(21L, 22L, 23L))).toDF("src", "dst")
    val out = GraphOps.communityLevels(spark, e, "src", "dst", iterPerLevel = 6)
      .as[(Long, Int, Long)].collect()
    val byLevel = out.groupBy(_._2).view.mapValues(_.map(x => x._1 -> x._3).toMap).toMap
    assert(byLevel.keySet == Set(0, 1, 2))
    // every vertex labeled at every level
    assert(byLevel.values.forall(_.size == 9))
    val nComm = (l: Int) => byLevel(l).values.toSet.size
    assert(nComm(0) >= nComm(1) && nComm(1) >= nComm(2))
    // coarsest level = connected components: bridged cliques merge,
    // the isolated clique stays apart
    assert(nComm(2) == 2)
    assert(byLevel(2)(1L) == byLevel(2)(12L))
    assert(byLevel(2)(1L) != byLevel(2)(21L))
  }

  test("metrics listener records action row counts (K8)") {
    val l = graft.sinks.Metrics.attach(spark)
    try {
      Seq(1, 2, 3).toDF("x").collect()
      // listener events are async — poll briefly
      val deadline = System.nanoTime() + 5000000000L
      while (l.snapshot.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(l.snapshot.nonEmpty)
      assert(l.snapshot.exists(_.wallNs > 0))
    } finally spark.listenerManager.unregister(l)
  }

  test("twoHop: neighbors via shared mids with path counts (G5)") {
    // bipartite: parts {1,2,3} × suppliers {100,101}
    val e = Seq((1L, 100L), (1L, 101L), (2L, 100L), (2L, 101L), (3L, 101L))
      .toDF("src", "dst")
    val out = GraphOps.twoHop(e, "src", "dst", anchor = 1L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 2L, 3L -> 1L)) // 2 via both suppliers, 3 via 101 only
  }
}
