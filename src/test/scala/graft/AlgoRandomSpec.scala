package graft

import java.sql.Timestamp

import graft.graph.GraphOps
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized cross-validation of the iterative algorithms against
  * brute-force in-memory references (seeded, 3 cases each). */
class AlgoRandomSpec extends SparkSpec {
  import spark.implicits._

  test("sessionizeBatch equals brute force over random event streams") {
    for (seed <- Seq(3, 17, 77)) {
      val rnd = new Random(seed)
      val events = (1 to 120).map { i =>
        val us = rnd.nextInt(5000) * 1000000L // 0..5000s in whole seconds
        (i.toLong, new Timestamp(us / 1000), rnd.nextInt(4).toLong)
      }
      val df = events.toDF("event_id", "ts", "user_id")
      val got = EventStreams.sessionizeBatch(df, gapSec = 300)
        .select("user_id", "session_id", "n_events", "start_us", "end_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // brute force: per user, sort by (us, event_id), split on gap > 300s
      val want = events
        .map { case (id, ts, u) => (u, ts.getTime * 1000L, id) }
        .groupBy(_._1).flatMap { case (u, evs) =>
          val sorted = evs.map(e => (e._2, e._3)).sorted
          val sessions = sorted.foldLeft(Vector.empty[Vector[(Long, Long)]]) {
            case (acc, e) =>
              if (acc.isEmpty || e._1 - acc.last.last._1 > 300000000L) acc :+ Vector(e)
              else acc.init :+ (acc.last :+ e)
          }
          sessions.zipWithIndex.map { case (s, i) =>
            (u, (i + 1).toLong, s.length.toLong, s.head._1, s.last._1)
          }
        }.toSet
      assert(got == want, s"sessionize mismatch for seed $seed")
    }
  }

  test("ccEdges equals union-find over random graphs") {
    for (seed <- Seq(5, 23, 101)) {
      val rnd = new Random(seed)
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = GraphOps.ccEdges(edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      // brute force union-find with min-label normalization
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = verts.map(v => v -> find(v)).toMap
      // normalize both to min-member labels per component
      def normalize(m: Map[Long, Long]): Map[Long, Long] = {
        val minOf = m.groupBy(_._2).map { case (c, kv) => c -> kv.keys.min }
        m.map { case (v, c) => v -> minOf(c) }
      }
      assert(normalize(got) == normalize(want), s"cc mismatch for seed $seed")
    }
  }
}
