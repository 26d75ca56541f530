package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Regression pins for review-found edge cases. */
class ReviewEdgeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("single-pass: markerEnd == markerStart uses identical-marker semantics") {
    val df = Seq((1L, 1L, "A"), (1L, 2L, "x"), (1L, 3L, "A"))
      .toDF("g", "o", "marker")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("o").select("iids").as[Long].collect().toSeq
    val window = new IntervalIdentifier("marker", "A", Some("A"),
      orderbyColumns = Seq("o"), groupbyColumns = Seq("g"))
    val onepass = new IntervalIdentifierSinglePass("marker", "A", Some("A"),
      orderbyColumns = Seq("o"), groupbyColumns = Seq("g"))
    assert(ids(window.transform(df)) == Seq(1L, 1L, 2L))
    assert(ids(onepass.transform(df)) == ids(window.transform(df)))
  }

  test("single-pass: case-insensitive column resolution") {
    val df = Seq((1L, 1L, "s"), (1L, 2L, "e")).toDF("G", "O", "Marker")
    val out = new IntervalIdentifierSinglePass("marker", "s", Some("e"),
      orderbyColumns = Seq("o"), groupbyColumns = Seq("g"))
      .transform(df)
    assert(out.select("iids").as[Int].collect().toSet == Set(1))
  }

  test("shingle tokenization: tabs and newlines match the expression path") {
    val texts = Seq("\ta b c d", "a b c d\n", " \n a b c d")
    texts.foreach { t =>
      val local = graft.functions.Portable.shinglesLocal(t, 3).toSeq
      val viaExpr = Seq(t).toDF("text")
        .select(graft.functions.Portable.shingles(
          graft.functions.Portable.tokens($"text"), 3).as("sh"))
        .as[Seq[String]].head()
      assert(local == viaExpr, s"text=${t.replace("\n", "\\n")}")
    }
  }

  test("CosineTopK: cosine ties across partitions rank by id") {
    // vectors 1 and 2 are identical -> identical cosine to the query;
    // the map-side prune + global rank must order ties by id
    val df = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(2f, 2f)), (2L, Seq(2f, 2f)),
      (3L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding").repartition(4)
    val out = Similarity.CosineTopK(d => d.filter($"vec_id" === 0), k = 3)
      .transform(df)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("ExactDedup rejects clobbering input columns") {
    val df = Seq((1L, "t", true)).toDF("doc_id", "text", "is_dup")
    val e = intercept[IllegalArgumentException](
      Dedup.ExactDedup().transform(df))
    assert(e.getMessage.contains("is_dup"))
  }

  test("MediaFeatures: frame sample count never exceeds maxSample") {
    val df = graft.sources.MediaGen.AttachPayload()
      .transform((1 to 40).map(_.toLong).toDF("doc_id"))
    val feats = Multimodal.MediaFeatures(maxSample = 4).transform(df)
    val counts = Multimodal.FrameSample().transform(feats)
      .groupBy("doc_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 4))
  }
}
