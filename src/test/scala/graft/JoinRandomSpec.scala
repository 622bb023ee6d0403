package graft

import graft.operators.{Relational => R}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized cross-validation: asofJoin and bucketRangeJoin vs
  * brute-force in-memory references over seeded random data — the
  * operator-level analog of the DuckDB oracle gate. */
class JoinRandomSpec extends SparkSpec {
  import spark.implicits._

  private def randCase(seed: Int) = {
    val rnd = new Random(seed)
    val points = Seq.fill(40)((rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100000)))
      .zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) } // (key, time, pid)
    // one right row per (key, time): dedupe like the operator contract asks
    val rights = Seq.fill(25)((rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    (points, rights)
  }

  test("asofJoin equals brute force over random data (3 seeds)") {
    for (seed <- Seq(1, 7, 42)) {
      val (points, rights) = randCase(seed)
      val l = points.toDF("k", "t", "pid")
      val r = rights.toDF("k", "t", "v")
      val got = R.asofJoin(l, r, Seq("k"), "t", Seq("v", "t"))
        .select(col("pid"),
          col("asof_match.v").as("v"), col("asof_match.t").as("rt"))
        .collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some((row.getDouble(1), row.getLong(2))))).toMap
      val want = points.map { case (k, t, pid) =>
        val cands = rights.filter(q => q._1 == k && q._2 <= t)
        pid -> (if (cands.isEmpty) None
                else { val best = cands.maxBy(_._2); Some((best._3, best._2)) })
      }.toMap
      assert(got == want, s"asof mismatch for seed $seed")
    }
  }

  test("bucketRangeJoin equals brute force over random data (3 seeds)") {
    for (seed <- Seq(2, 11, 99)) {
      val rnd = new Random(seed)
      val points = (0 until 40).map(i => (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val ivs = (0 until 15).map { i =>
        val lo = rnd.nextInt(900).toLong
        (rnd.nextInt(3).toLong, lo, lo + rnd.nextInt(200).toLong, i.toLong)
      }
      val got = R.bucketRangeJoin(
          points.toDF("k", "t", "pid"), ivs.toDF("k", "lo", "hi", "iid"),
          Seq("k"), "t", "lo", "hi", bucketWidth = 128L)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = (for {
        (pk, pt, pid) <- points
        (ik, lo, hi, iid) <- ivs
        if pk == ik && pt >= lo && pt <= hi
      } yield (pid, iid)).toSet
      assert(got == want, s"range mismatch for seed $seed")
    }
  }
}
