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

  test("JsonlCorpus: schema-enforced round-trip of the sink's export; " +
      "FAILFAST aborts on a malformed line; PERMISSIVE quarantines it " +
      "with clean rows intact") {
    import org.apache.spark.sql.types._
    val out = "/tmp/jsonl_corpus_spec"
    val d = (0L until 50L).map(i => (i, 10L, s"doc $i"))
      .toDF("doc_id", "n_chars", "text")
    ShardedSink.writeJsonl(Corpus.ShardPack(targetBytes = 200L)
      .transform(d), out)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_chars", LongType), StructField("text", StringType)))
    // round-trip: same ids, typed as declared (no inference pass);
    // the sink's shard=N layout surfaces as a discovered partition
    // column appended after the declared schema
    val back = JsonlCorpus.read(spark, out, schema)
    assert(back.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_chars", "text", "shard"))
    assert(back.schema("doc_id").dataType == LongType)
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
      (0L until 50L))
    // corrupt line handling
    val dir = "/tmp/jsonl_corpus_corrupt"
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "part-0.jsonl"),
      """{"doc_id": 1, "n_chars": 3, "text": "ok"}
        |{not json at all
        |{"doc_id": 2, "n_chars": 4, "text": "also ok"}
        |""".stripMargin)
    val e = intercept[org.apache.spark.SparkException](
      JsonlCorpus.read(spark, dir, schema).collect())
    assert(e.getMessage.contains("FAILFAST") ||
      String.valueOf(e.getCause).contains("Malformed"), e.getMessage)
    val perm = JsonlCorpus.read(spark, dir, schema, failFast = false)
    val (clean, rejects) = JsonlCorpus.quarantine(perm)
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    assert(clean.columns.toSeq == Seq("doc_id", "n_chars", "text"))
    val rejRows = rejects.collect()
    assert(rejRows.map(_.getAs[String](JsonlCorpus.CorruptColumn)).toSeq ==
      Seq("{not json at all"))
    // reject rows carry null schema columns (quarantine keeps the full
    // row shape — see the scaladoc on the corrupt-only-scan restriction)
    assert(rejRows.forall(_.isNullAt(0)))
    // reserved column + empty schema are rejected up front
    assertThrows[IllegalArgumentException](JsonlCorpus.read(spark, dir,
      StructType(Nil)))
    assertThrows[IllegalArgumentException](
      JsonlCorpus.quarantine(clean))
  }
}
