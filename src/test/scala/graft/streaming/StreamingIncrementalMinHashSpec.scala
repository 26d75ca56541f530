package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable
import graft.operators.Dedup

class StreamingIncrementalMinHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val corpusText = Map(
    10L -> "n1 n2 n3 n4 n5 n6",
    11L -> "m1 m2 m3 m4 m5 m6")

  private def indexes = {
    val sigIdx = Dedup.IncrementalMinHashLSH.signatureIndex(
      corpusText.toSeq.toDF("doc_id", "text")).cache()
    (Dedup.IncrementalMinHashLSH.bandIndex(sigIdx).cache(), sigIdx)
  }

  test("minHashSigLocal mirrors the batch signature aggregation " +
    "component-for-component") {
    val (_, sigIdx) = indexes
    val batch = sigIdx.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    for ((id, text) <- corpusText) {
      val local = Portable.minHashSigLocal(text, 3, 32)
      assert(local.toSeq == batch(id).toSeq, s"doc $id")
    }
    // no shingles -> null, matching the agg path's absent row
    assert(Portable.minHashSigLocal("one two", 3, 32) == null)
    assert(Portable.minHashSigLocal(null, 3, 32) == null)
  }

  test("stream-static probe: an exact copy matches its corpus doc ONCE " +
    "(per-band duplicates collapse); disjoint and too-short docs emit " +
    "nothing") {
    implicit val sqlCtx = spark.sqlContext
    val (bandIdx, sigIdx) = indexes
    val input = MemoryStream[StreamEvent]
    // StreamEvent(marker) carries the text; `order` is the stream doc id
    val out = new StreamingIncrementalMinHash(bandIdx, sigIdx,
        idColumn = "order", textColumn = "marker")
      .transform(input.toDF())
    val query = out.writeStream.format("memory").queryName("sim_test")
      .outputMode("append").start()
    try {
      input.addData(
        StreamEvent("g", new Timestamp(1000L), 100L,
          "n1 n2 n3 n4 n5 n6"),     // exact copy of corpus doc 10
        StreamEvent("g", new Timestamp(2000L), 101L,
          "z1 z2 z3 z4 z5 z6"),     // token-disjoint: no pairs
        StreamEvent("g", new Timestamp(3000L), 102L, "one two"))
      query.processAllAvailable()
      val got = spark.table("sim_test")
        .select("id_a", "id_b", "est_jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((10L, 100L, 1.0)))
    } finally query.stop()
  }
}
