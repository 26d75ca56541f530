package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable
import graft.util.SparkUtil

/** Self-describing persisted indexes (round-12 verdict #2): the fit
  * parameters whose mismatch was structurally undetectable — IVF's
  * larger-nlist probe, Dsir's numFeatures/ngram, SemDedup's shrunken
  * k — now ride the index's column metadata (parquet-round-trip safe)
  * and fail loud at probe/fold time. Indexes WITHOUT the metadata keep
  * the prose contract (no new failures on hand-built tables).
  */
class FitParamsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def vecDF(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private val rnd = new scala.util.Random(7)
  private def corpus(n: Int) =
    vecDF((0L until n.toLong).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f)): _*)

  private def stripMeta(df: DataFrame, c: String): DataFrame =
    df.withColumn(c,
      col(c).as(c, org.apache.spark.sql.types.Metadata.empty))

  test("IncrementalIvf: the index records nlist; BOTH mismatch " +
    "directions now raise (incl. the formerly-silent larger-nlist " +
    "probe); metadata survives a parquet round trip and foldBatch") {
    val idx = Similarity.IncrementalIvf.memberIndex(corpus(20), nlist = 4)
    assert(SparkUtil.fitParam(idx, "cluster", "nlist") == Some(4L))
    // larger-nlist probe: structurally fine (labels < 8) — the silent
    // recall-loss direction the metadata exists to catch
    val e1 = intercept[IllegalArgumentException](
      Similarity.IncrementalIvfTopK(idx, nlist = 8)
        .transform(vecDF(1L -> Seq.fill(8)(1f))))
    assert(e1.getMessage.contains("nlist=4") &&
      e1.getMessage.contains("nlist=8"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.IncrementalIvf.foldBatch(idx,
        vecDF(999L -> Seq.fill(8)(0.5f)), nlist = 8))
    assert(e2.getMessage.contains("foldBatch"))
    // parquet round trip: Spark restores the StructType metadata
    val dir = java.nio.file.Files.createTempDirectory("fitparams").toString
    idx.write.mode("overwrite").parquet(s"$dir/idx")
    val back = spark.read.parquet(s"$dir/idx")
    assert(SparkUtil.fitParam(back, "cluster", "nlist") == Some(4L))
    // matching probe still works against the round-tripped index
    assert(Similarity.IncrementalIvfTopK(back, nlist = 4, nprobe = 4, k = 1)
      .transform(vecDF(1L -> Seq.fill(8)(1f))).count() == 1L)
    // a grown index stays self-describing
    val cutoff = (0L until 20L)
      .map(i => Portable.tokenHashLocal(i.toString)).sorted.apply(3)
    val fresh = (100L until 3000L)
      .find(i => Portable.tokenHashLocal(i.toString) > cutoff).get
    val folded = Similarity.IncrementalIvf.foldBatch(back,
      vecDF(fresh -> Seq.fill(8)(0.5f)), nlist = 4)
    assert(SparkUtil.fitParam(folded, "cluster", "nlist") == Some(4L))
    // an index WITHOUT metadata keeps the prose contract: the larger
    // probe is (still) silently accepted, the structural guard intact
    val legacy = stripMeta(back, "cluster")
    assert(Similarity.IncrementalIvfTopK(legacy, nlist = 8, nprobe = 8,
      k = 1).transform(vecDF(1L -> Seq.fill(8)(1f))).count() == 1L)
  }

  test("Dsir: featureCounts records (numFeatures, ngram); " +
    "IncrementalResample and foldBatch raise on either mismatch; " +
    "fold output stays self-describing") {
    val docs = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3}",
        if (i % 4 == 0L) "tgt" else "raw")).toDF("doc_id", "text", "source")
    val counts = Dsir.featureCounts(docs, "tgt", numFeatures = 1024)
    assert(SparkUtil.fitParam(counts, "feature", "numFeatures") ==
      Some(1024L))
    assert(SparkUtil.fitParam(counts, "feature", "ngram") == Some(1L))
    val batch = (100L until 120L).map(i =>
      (i, s"tok${i % 7} tok${i % 5}")).toDF("doc_id", "text")
    // the SILENT direction: a larger probe numFeatures passes the
    // structural guard (all stored features < it) while the batch
    // hashes into a different cell space — metadata now catches it
    val e1 = intercept[IllegalArgumentException](
      Dsir.IncrementalResample(counts, fraction = 0.5,
        numFeatures = 2048).transform(batch))
    assert(e1.getMessage.contains("numFeatures=1024") &&
      e1.getMessage.contains("numFeatures=2048"))
    val e2 = intercept[IllegalArgumentException](
      Dsir.IncrementalResample(counts, fraction = 0.5,
        numFeatures = 1024, ngram = 2).transform(batch))
    assert(e2.getMessage.contains("ngram"))
    val e3 = intercept[IllegalArgumentException](
      Dsir.foldBatch(counts, docs, "tgt", numFeatures = 2048))
    assert(e3.getMessage.contains("foldBatch"))
    val folded = Dsir.foldBatch(counts, docs, "tgt", numFeatures = 1024)
    assert(SparkUtil.fitParam(folded, "feature", "numFeatures") ==
      Some(1024L))
    // metadata-less legacy table: the prose contract governs — the
    // silent larger-numFeatures direction is (still) silently accepted
    assert(Dsir.IncrementalResample(stripMeta(counts, "feature"),
      fraction = 0.5, numFeatures = 2048).transform(batch).count() > 0L)
  }

  test("Tokenize vocab: VocabBuild records lowercase/continuationPrefix " +
    "(string fit params) + the derivation knobs; a mismatched BpeEncode " +
    "raises instead of silently UNK-ing/mis-splitting; metadata-less " +
    "vocabs keep the prose contract; parquet round trip preserved") {
    val docs = Seq((1L, "Hello World"), (2L, "hello spark world"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.VocabBuild().transform(docs)
    assert(SparkUtil.fitParamStr(vocab, "piece", "lowercase") ==
      Some("true"))
    assert(SparkUtil.fitParamStr(vocab, "piece", "continuationPrefix") ==
      Some("##"))
    assert(SparkUtil.fitParam(vocab, "piece", "topWords") == Some(10L))
    // the formerly-SILENT direction: encode lowercase=false over a
    // lowercase-built vocab — "Hello" has no 'H' piece, so with an
    // unkId set the doc would quietly UNK; the metadata now raises
    // before any encode runs
    val e1 = intercept[IllegalArgumentException](
      Tokenize.BpeEncode(vocab, lowercase = false, unkId = Some(-1L))
        .transform(docs))
    assert(e1.getMessage.contains("lowercase=true") &&
      e1.getMessage.contains("lowercase=false"))
    val e2 = intercept[IllegalArgumentException](
      Tokenize.BpeEncode(vocab, continuationPrefix = "@@").transform(docs))
    assert(e2.getMessage.contains("continuationPrefix"))
    // parquet round trip: the contract travels WITH the table
    val dir = java.nio.file.Files.createTempDirectory("fitvocab").toString
    vocab.write.mode("overwrite").parquet(s"$dir/vocab")
    val back = spark.read.parquet(s"$dir/vocab")
    assert(SparkUtil.fitParamStr(back, "piece", "lowercase") ==
      Some("true"))
    val e3 = intercept[IllegalArgumentException](
      Tokenize.BpeEncode(back, lowercase = false).transform(docs))
    assert(e3.getMessage.contains("lowercase"))
    // the matching encode runs
    assert(Tokenize.BpeEncode(back).transform(docs).count() == 2L)
    // metadata-less (hand-built) vocab: prose contract governs — the
    // mismatched encode is (still) silently accepted
    val legacy = stripMeta(vocab, "piece")
    assert(Tokenize.BpeEncode(legacy, lowercase = false,
      unkId = Some(-1L)).transform(docs).count() == 2L)
  }

  test("SemDedup: the index records the fit's k (self-description + " +
    "the integrity check — empty clusters derive DEAD centers either " +
    "way, so assignment is unaffected); a recorded k below an " +
    "observed label is corruption and raises") {
    // 4 near-identical vectors, k=8: most clusters end up empty, so
    // max(label)+1 under-reports the fit's k (harmlessly — the absent
    // clusters' centers are zero-norm and skipped; the recorded k is
    // for the corruption check below, not for assignment)
    val tight = vecDF((0L until 4L).map(i =>
      i -> Seq.tabulate(8)(d => 1f + (if (d == 0) i * 1e-4f else 0f))): _*)
    val idx = IncrementalSemDedup.memberIndex(tight, nClusters = 8)
    assert(SparkUtil.fitParam(idx, "cluster", "nClusters") == Some(8L))
    val maxLabel = idx.agg(max("cluster")).as[Long].collect().head
    assert(maxLabel < 7L, "fixture: the fit must leave empty clusters")
    // the probe still finds an identical batch vector
    val got = IncrementalSemDedup(idx, threshold = 0.9)
      .transform(vecDF(100L -> Seq.tabulate(8)(d => 1f)))
      .select("is_known").as[Boolean].collect()
    assert(got.sameElements(Array(true)))
    // corruption: recorded k <= observed label
    val corrupt = SparkUtil.withFitParams(idx, "cluster",
      Map("nClusters" -> 0L))
    val e = intercept[IllegalArgumentException](
      IncrementalSemDedup(corrupt)
        .transform(vecDF(1L -> Seq.fill(8)(1f))).collect())
    assert(e.getMessage.contains("corrupt"))
    // metadata-less legacy index: the max(label)+1 fallback still runs
    assert(IncrementalSemDedup(stripMeta(idx, "cluster"), threshold = 0.9)
      .transform(vecDF(100L -> Seq.tabulate(8)(d => 1f))).count() == 1L)
  }
}
