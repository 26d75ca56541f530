package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Tokenize
import graft.util.SparkUtil

/** The streaming encode leg (r13 verdict #6): documents on a stream
  * encode against a persisted self-describing vocab BIT-IDENTICALLY to
  * the batch encoder — across multiple micro-batches (per-batch trie
  * compiles change nothing), with the fit-param contract enforced
  * before the stream starts, and statelessly (no state store).
  */
class StreamingBpeEncodeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "hug hug pug"), (1L, "hug pug hugs"), (2L, "pug spug"),
    (3L, null.asInstanceOf[String]), (4L, "HUG hugs"))

  private def doc(id: Long, text: String): StreamEvent =
    StreamEvent("g", new Timestamp(id * 1000L), id, text)

  // the vocab is batch-learned, PERSISTED, and read back — the fit
  // params must survive the parquet round trip into the stream
  private def persistedVocab = {
    val dir = java.nio.file.Files.createTempDirectory("svocab").toString
    Tokenize.BpeLearn(nMerges = 10)
      .transform(corpus.toDF("doc_id", "text"))
      .drop("merge_rank")
      .write.mode("overwrite").parquet(s"$dir/vocab")
    spark.read.parquet(s"$dir/vocab")
  }

  test("stream token ids equal the batch encoder across several " +
    "micro-batches, including null text and case folding; the encode " +
    "is stateless") {
    implicit val sqlCtx = spark.sqlContext
    val vocab = persistedVocab
    val batch = Tokenize.BpeEncode(vocab)
      .transform(corpus.toDF("doc_id", "text"))
      .as[(Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val input = MemoryStream[StreamEvent]
    val out = new StreamingBpeEncode(vocab, idColumn = "order",
        textColumn = "marker")
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("sbpe")
      .outputMode("append").start()
    try {
      // three separate micro-batches: each recompiles its tries from
      // the one broadcast vocab; ids must not depend on batching
      input.addData(corpus.take(2).map { case (id, tx) => doc(id, tx) }: _*)
      query.processAllAvailable()
      input.addData(corpus.slice(2, 4).map { case (id, tx) => doc(id, tx) }: _*)
      query.processAllAvailable()
      input.addData(corpus.drop(4).map { case (id, tx) => doc(id, tx) }: _*)
      query.processAllAvailable()
      val got = spark.table("sbpe")
        .select("doc_id", "n_bpe_tokens", "bpe_ids")
        .as[(Long, Long, Seq[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == batch)
      assert(got(3L) == ((0L, Seq.empty[Long]))) // null text, row kept
      assert(query.lastProgress.stateOperators.isEmpty) // stateless
    } finally query.stop()
  }

  test("the self-describing vocab contract gates the STREAM too: a " +
    "mismatched encode raises at plan-build time, before any batch") {
    implicit val sqlCtx = spark.sqlContext
    val vocab = persistedVocab
    assert(SparkUtil.fitParamStr(vocab, "piece", "lowercase") ==
      Some("true"))
    val input = MemoryStream[StreamEvent]
    val e = intercept[IllegalArgumentException](
      new StreamingBpeEncode(vocab, idColumn = "order",
        textColumn = "marker", lowercase = false)
        .transform(input.toDF()))
    assert(e.getMessage.contains("lowercase"))
  }

  test("batch DataFrames are refused with a redirect (the family's " +
    "isStreaming contract)") {
    val e = intercept[IllegalArgumentException](
      new StreamingBpeEncode(persistedVocab)
        .transform(corpus.toDF("doc_id", "text")))
    assert(e.getMessage.contains("streaming"))
  }

  test("streaming UNIGRAM (Viterbi) encode equals the batch encoder " +
    "bit-identically across micro-batches against a PERSISTED score " +
    "table; stateless; fit drift gates the stream at plan-build") {
    implicit val sqlCtx = spark.sqlContext
    val vocab = persistedVocab
    val dir = java.nio.file.Files.createTempDirectory("uscore").toString
    Tokenize.UnigramScores(vocab, emRounds = 1)
      .transform(corpus.toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/scores")
    val scores = spark.read.parquet(s"$dir/scores")
    val batch = Tokenize.UnigramEncode(scores)
      .transform(corpus.toDF("doc_id", "text"))
      .as[(Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val input = MemoryStream[StreamEvent]
    val out = new StreamingUnigramEncode(scores, idColumn = "order",
        textColumn = "marker")
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("suni")
      .outputMode("append").start()
    try {
      input.addData(corpus.take(2).map { case (id, tx) => doc(id, tx) }: _*)
      query.processAllAvailable()
      input.addData(corpus.drop(2).map { case (id, tx) => doc(id, tx) }: _*)
      query.processAllAvailable()
      val got = spark.table("suni")
        .select("doc_id", "n_bpe_tokens", "bpe_ids")
        .as[(Long, Long, Seq[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == batch)
      assert(query.lastProgress.stateOperators.isEmpty) // stateless
    } finally query.stop()
    val e = intercept[IllegalArgumentException](
      new StreamingUnigramEncode(scores, idColumn = "order",
        textColumn = "marker", lowercase = false)
        .transform(input.toDF()))
    assert(e.getMessage.contains("lowercase"))
    val e2 = intercept[IllegalArgumentException](
      new StreamingUnigramEncode(scores)
        .transform(corpus.toDF("doc_id", "text")))
    assert(e2.getMessage.contains("streaming"))
  }

  test("streaming decode identity: encode → decode CHAINED in one " +
    "streaming query reproduces the canonical text per micro-batch; " +
    "the decode's fit checks also gate the stream") {
    implicit val sqlCtx = spark.sqlContext
    val vocab = persistedVocab
    val input = MemoryStream[StreamEvent]
    val out = new StreamingBpeDecode(vocab).transform(
      new StreamingBpeEncode(vocab, idColumn = "order",
        textColumn = "marker").transform(input.toDF()))
    val query = out.writeStream.format("memory").queryName("sbperd")
      .outputMode("append").start()
    try {
      input.addData(corpus.take(3).map { case (id, tx) => doc(id, tx) }: _*)
      query.processAllAvailable()
      input.addData(corpus.drop(3).map { case (id, tx) => doc(id, tx) }: _*)
      query.processAllAvailable()
      val got = spark.table("sbperd").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      val want = corpus.map { case (id, tx) =>
        (id, if (tx == null) ""
          else tx.toLowerCase.split("\\s+").filter(_.nonEmpty)
            .mkString(" "))
      }
      assert(got == want)
      assert(query.lastProgress.stateOperators.isEmpty) // stateless
    } finally query.stop()
    // byte-level drift raises at plan-build time
    val e = intercept[IllegalArgumentException](
      new StreamingBpeDecode(vocab, byteLevel = true).transform(
        new StreamingBpeEncode(vocab, idColumn = "order",
          textColumn = "marker").transform(input.toDF())))
    assert(e.getMessage.contains("byteLevel"))
  }
}
