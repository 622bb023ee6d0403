package graft

import java.nio.file.Files

import graft.multimodal.Multimodal
import graft.sinks.Sinks
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  test("sparse JSONL roundtrip: nulls stripped on disk, restored by schema") {
    val df = Seq((1L, "a", Some("x")), (2L, "b", None))
      .toDF("id", "s", "extra")
    val path = tmp("jsonl")
    Sinks.writeSparseJsonl(df, path)
    // on-disk: the null row must not contain the key at all
    val raw = spark.read.text(path).as[String].collect()
    assert(raw.exists(l => l.contains("\"id\":2") && !l.contains("extra")))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("extra", StringType)))
    val back = Sinks.readJsonl(spark, path, schema)
    assert(back.count() == 2)
    assert(back.filter(col("extra").isNull).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("partitioned parquet write + K7 read-back validation") {
    val df = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("k", "p")
    val path = tmp("part")
    Sinks.writePartitioned(df, path, "p")
    val back = spark.read.parquet(path)
    assert(back.count() == 3)
    assert(back.filter(col("p") === "A").count() == 2)
    val (w, r, ok) = Sinks.writeParquetValidated(df, tmp("val"))
    assert(ok && w == 3 && r == 3)
  }

  test("multi-path scan merges partition directories (all-partitions case)") {
    val df = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C")).toDF("k", "p")
    val path = tmp("multi")
    Sinks.writePartitioned(df, path, "p")
    // the reference's AllPartitionMapping merge: one scan over N partition dirs
    val merged = Tables.multi(spark, Seq(s"$path/p=A", s"$path/p=B"))
    assert(merged.count() == 3) // C excluded
    assert(merged.columns.toSeq == Seq("k")) // partition col lives in the path
  }

  test("compact partitioned write: one file per partition value") {
    val df = (1 to 400).map(i => (i.toLong, s"p${i % 4}")).toDF("k", "p")
      .repartition(8) // simulate many upstream tasks
    val path = tmp("compact")
    Sinks.writePartitionedCompact(df, path, "p")
    val files = new java.io.File(path).listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
    }.toMap
    assert(files.size == 4)
    assert(files.values.forall(_ == 1)) // not 8 task-files per partition
    assert(spark.read.parquet(path).count() == 400)
  }

  test("bucketed tables co-locate the join: no exchange before the SMJ") {
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("graft_bkt_a")
    b.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("graft_bkt_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange")) // bucket layout reused, zero shuffle
      assert(joined.count() == 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("zValue: known Morton codes, bijectivity, locality ordering") {
    val z = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (12345, 67890))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // interleave: x on even bits, y on odd bits
    assert(z((0, 0)) == 0L && z((1, 0)) == 1L && z((0, 1)) == 2L && z((1, 1)) == 3L)
    assert(z((3, 5)) == 39L) // spread(3)=0b0101, spread(5)=0b010001 → 5 | 34
    // bijective on a grid: no two (x,y) collide
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y)).toDF("x", "y")
      .select(graft.functions.ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(grid.distinct.length == 1024)
  }

  test("writeZOrdered: output files cover disjoint z-ranges (skipping layout)") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val data = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y))
      .toDF("x", "y")
    Sinks.writeZOrdered(data, "x", "y", dir, buckets = 8)
    // per-file (min,max) of the recomputed z must not overlap across files
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 2)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .select(graft.functions.ZOrder.zValue(col("x"), col("y")).as("z"))
        .agg(min("z"), max("z")).as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"file z-ranges overlap: $hi >= $lo")
    }
    // locality: MOST files narrow the x range (a sampled range boundary
    // that straddles a z-quad edge can leave individual files wide, but
    // the curve keeps the bulk compact — that's what min/max skipping
    // prunes on)
    val widths = files.map { f =>
      val (lo, hi) = spark.read.parquet(f).agg(min("x"), max("x"))
        .as[(Int, Int)].head()
      hi - lo
    }
    assert(widths.count(_ <= 32) >= files.length / 2,
      s"most z-clustered files must narrow the x range, got ${widths.toSeq}")
  }

  test("multimodal: binary plumbing + partition-batched real decode") {
    // raw UTF-8 text is NOT a media file: the real header parse must
    // degrade to unknown/-1/-1 while the plumbing columns stay exact
    val docs = Seq((5L, "hello world")).toDF("doc_id", "text")
    val meta = Multimodal.extractMeta(Multimodal.asBinary(docs)).collect()(0)
    assert(meta.n_bytes == 11)
    assert(meta.first_byte == 'h'.toInt)
    assert(meta.format == "unknown" && meta.width == -1 && meta.height == -1)
    // synthMedia wraps the same text in a spec-valid header: doc_id 5 →
    // jpeg (5%4), 1+5=6 × 1+35=36
    val m2 = Multimodal.extractMeta(Multimodal.synthMedia(docs)).collect()(0)
    assert(m2.format == "jpeg" && m2.width == 6 && m2.height == 36)
    assert(m2.n_bytes == 11 + 17 && m2.first_byte == 0xFF)
  }

  test("multimodal: frame sampling covers all bytes, fingerprints distinct content") {
    val docs = Seq((7L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes → 3|3|4
    val frames = Multimodal.frameSample(Multimodal.asBinary(docs), 3)
      .collect().sortBy(_.frame_index)
    assert(frames.map(_.n_bytes).toSeq == Seq(3, 3, 4))
    assert(frames.map(_.fp).distinct.length == 3)
    assert(frames.map(_.n_bytes).sum == 10)
  }

  test("multimodal: byte-histogram features normalize; resize honors byte budget") {
    val h = Multimodal.byteHistogram("aaab".getBytes("UTF-8"), bins = 16)
    assert(math.abs(h.sum - 1.0f) < 1e-6)
    assert(h(('a' & 0xFF) % 16) == 0.75f)
    assert(Multimodal.resizeStub("abcdef".getBytes, 4).length == 4)
    assert(Multimodal.resizeStub("ab".getBytes, 8).length == 8)
  }

  test("CSV roundtrip: header + explicit schema, delimiters/doubles survive") {
    import org.apache.spark.sql.types._
    val df = Seq(
      (1L, "plain", 0.1),
      (2L, "with, comma", -2.5),
      (3L, "with \"quotes\"", 1e-7))
      .toDF("id", "name", "x")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_test_csv"
    graft.sinks.Sinks.writeCsv(df, path)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("x", DoubleType)))
    val back = graft.sinks.Sinks.readCsv(spark, path, schema)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(back.toSeq == Seq(
      (1L, "plain", 0.1), (2L, "with, comma", -2.5), (3L, "with \"quotes\"", 1e-7)))
  }
}
