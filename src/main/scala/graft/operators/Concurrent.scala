package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent materialization of INDEPENDENT lazy Spark chains.
  *
  * Spark's driver submits jobs from whichever thread calls the action, so
  * a sequence of per-item actions (`cent.count()` per PQ subspace, the
  * per-round scalar probe per Leiden γ) serializes chains that share
  * nothing: each chain's stages wait for the previous chain's LAST job
  * even when task slots sit idle. One submitting thread per item overlaps
  * them — job submission is thread-safe, and under the default FIFO
  * scheduler idle slots drain later jobs' stages (the chains here are
  * k·dim- or vertex-bounded aggregations that rarely saturate a cluster
  * alone, so overlap is nearly free parallelism).
  *
  * Contract: `f` must be a pure function of its item given SHARED INPUTS
  * THE CALLER ALREADY MATERIALIZED (persisted-and-counted or
  * checkpointed). A lazily-persisted shared frame would be raced: every
  * chain's first job computes the upstream plan, same answers but n×
  * the work (Spark fills caches per-partition, best-effort, under
  * concurrency). [[graft.vector.Similarity.pqFit]] and the Leiden γ
  * ladder both materialize their shared state first for exactly this
  * reason.
  *
  * Results keep item order; a failure in any chain propagates (first
  * failure wins, as `Future.sequence` fails fast). Single-item input
  * short-circuits to a plain map — no pool, no overhead.
  */
object Concurrent {
  def mapInParallel[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.lengthCompare(1) <= 0) items.map(f)
    else {
      val pool = Executors.newFixedThreadPool(items.length)
      try {
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        Await.result(
          Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
      } finally pool.shutdown()
    }
}
