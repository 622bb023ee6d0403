package graft.tools_dev

import graft.vector.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DEV probe (not an engine operator): measure trained-vs-untrained IVF
  * cells and residual-vs-raw PQ coding on the planted-blob fixture, over
  * a parameter grid — the measurement behind the q168/q169 positive-case
  * spec thresholds. Usage:
  *   BlobProbe n dims nBlobs spread nCells kmIters m subDims k pqIters
  */
object BlobProbe {
  def main(args: Array[String]): Unit = {
    val Array(n, dims, nBlobs, spread, nCells, kmIters, m, subDims, k, pqIters) =
      args.map(_.toDouble)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = BlobFixture.embeddings(spark, n.toLong, dims.toInt,
      nBlobs.toInt, spread).persist()
    emb.count()
    val nQ = sys.env.getOrElse("BLOB_PROBE_NQ", "8").toInt
    val queries = emb.orderBy("vec_id").limit(nQ).select("vec_id").as[Long].collect()
    def recallOf(fn: DataFrame => DataFrame): Double =
      queries.map { qid =>
        val q = emb.filter(col("vec_id") === qid)
        val truth = Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 10)
          .select("vec_id").as[Long].collect().toSet
        (fn(q).select("vec_id").as[Long].collect().toSet & truth).size / 10.0
      }.sum / queries.length

    val untrained = Similarity.ivfCells(emb, "vec_id", "embedding", nCells.toInt).persist()
    val trained = Similarity.ivfCellsTrained(emb, "vec_id", "embedding",
      nCells.toInt, kmIters.toInt).persist()
    def balance(cells: DataFrame): String = {
      val sizes = cells.groupBy("cell").count().select("count").as[Long].collect().sorted
      s"n=${sizes.length} min=${sizes.min} max=${sizes.max}"
    }
    val exactU = recallOf(q =>
      Similarity.annIvfWithCells(emb, "vec_id", "embedding", untrained, q, k = 10))
    val exactT = recallOf(q =>
      Similarity.annIvfWithCells(emb, "vec_id", "embedding", trained, q, k = 10))
    val model = Similarity.pqFit(emb, "vec_id", "embedding",
      m.toInt, subDims.toInt, k.toInt, pqIters.toInt)
    val adcU = recallOf(q =>
      Similarity.ivfPqTopK(model, untrained, "vec_id", "embedding", q, topK = 10))
    val adcT = recallOf(q =>
      Similarity.ivfPqTopK(model, trained, "vec_id", "embedding", q, topK = 10))
    def residRecall(cells: DataFrame, anchored: Boolean = false): Double = {
      val resid = (if (anchored)
        Similarity.ivfResidualsAnchored(emb, "vec_id", "embedding", cells)
      else Similarity.ivfResiduals(emb, "vec_id", "embedding", cells)).persist()
      val modelRes = Similarity.pqFit(resid, "vec_id", "resid",
        m.toInt, subDims.toInt, k.toInt, pqIters.toInt, distinctSeeds = true)
      val r = recallOf { q =>
        val qResid = resid.join(broadcast(q.select("vec_id")), Seq("vec_id"))
        Similarity.ivfPqTopK(modelRes, cells, "vec_id", "resid", qResid, topK = 10)
      }
      modelRes.release(); resid.unpersist(blocking = false)
      r
    }
    val skipSeed = sys.env.contains("BLOB_PROBE_FAST")
    val resU = if (skipSeed) -1.0 else residRecall(untrained)
    val resT = if (skipSeed) -1.0 else residRecall(trained)
    val resUA = residRecall(untrained, anchored = true)
    val resTA = residRecall(trained, anchored = true)
    model.release()
    println(f"params n=${n.toLong} dims=${dims.toInt} nBlobs=${nBlobs.toInt} " +
      f"spread=$spread nCells=${nCells.toInt} kmIters=${kmIters.toInt} " +
      f"m=${m.toInt} subDims=${subDims.toInt} k=${k.toInt} pqIters=${pqIters.toInt}")
    println(s"balance untrained: ${balance(untrained)} | trained: ${balance(trained)}")
    println(f"exact  recall@10: untrained=$exactU%.3f trained=$exactT%.3f")
    println(f"adcRaw recall@10: untrained=$adcU%.3f trained=$adcT%.3f")
    println(f"adcRes recall@10: untrained=$resU%.3f trained=$resT%.3f")
    println(f"adcResAnchored@10: untrained=$resUA%.3f trained=$resTA%.3f")
    spark.stop()
  }
}
