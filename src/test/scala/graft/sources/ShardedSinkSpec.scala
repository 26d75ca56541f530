package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Corpus

class ShardedSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pack -> write produces one directory per shard, one file per " +
      "shard, rows key-ordered inside") {
    val out = "/tmp/sharded_sink_spec"
    val d = (0L until 300L).map(i => (i, 10L, s"doc $i"))
      .toDF("doc_id", "n_chars", "text")
    val packed = Corpus.ShardPack(targetBytes = 500L).transform(d)
    ShardedSink.write(packed, out)

    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("shard=")).toSeq
    // 300 rows x 10 bytes / 500-byte target = 6 shards
    assert(dirs.sorted == (0 to 5).map(s => s"shard=$s"), dirs.toString)
    dirs.foreach { dir =>
      val files = Files.list(Paths.get(out, dir)).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
      assert(files.size == 1, s"$dir: ${files.size} files — shard not " +
        "co-located into one task before the write")
    }

    // round trip: partition column comes back, every row lands in the
    // shard ShardPack assigned, and within-file order is the key order
    val back = spark.read.parquet(out)
    assert(back.count() == 300)
    val mismatched = back.as("r")
      .join(packed.select(col("doc_id"), col("shard").as("want")), "doc_id")
      .filter(col("shard") =!= col("want")).count()
    assert(mismatched == 0)
    val inFileOrder = spark.read.parquet(s"$out/shard=0")
      .select("doc_id").as[Long].collect().toSeq
    assert(inFileOrder == inFileOrder.sorted, "within-shard key order lost")
  }

  test("JSONL export: one gzipped file per shard, rows key-ordered, " +
      "round-trips by count and shard assignment") {
    val out = "/tmp/sharded_sink_jsonl_spec"
    val d = (0L until 300L).map(i => (i, 10L, s"doc $i"))
      .toDF("doc_id", "n_chars", "text")
    val packed = Corpus.ShardPack(targetBytes = 500L).transform(d)
    ShardedSink.writeJsonl(packed, out)

    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("shard=")).toSeq
    assert(dirs.sorted == (0 to 5).map(s => s"shard=$s"), dirs.toString)
    dirs.foreach { dir =>
      val files = Files.list(Paths.get(out, dir)).iterator().asScala
        .map(_.getFileName.toString)
        .filter(f => f.contains(".json") && !f.startsWith(".")).toSeq
      assert(files.size == 1, s"$dir: $files")
      assert(files.head.endsWith(".gz"), s"$dir: ${files.head} not gzip")
    }
    val back = spark.read.json(out)
    assert(back.count() == 300)
    val mismatched = back.as("r")
      .join(packed.select(col("doc_id"), col("shard").as("want")), "doc_id")
      .filter(col("shard") =!= col("want")).count()
    assert(mismatched == 0)
    // within-file order: read shard 0's single text file directly —
    // JSON readers do not guarantee order, the FILE content does
    val lines = spark.read.json(s"$out/shard=0")
      .select("doc_id").as[Long].collect().toSeq
    assert(lines == lines.sorted, "within-shard key order lost")
  }
}
