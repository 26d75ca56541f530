package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Properties of the chunking and training-order-shuffle operators.
  * Value-level correctness (exact chunk text, exact permutation
  * positions) is pinned by the DuckDB oracles on `chunk_split` /
  * `shuffle_interleave`; these specs pin the structural invariants the
  * oracle can't state: full token coverage, permutation bijectivity,
  * shard balance, partition invariance and the fail-loud guards.
  */
class ChunkInterleaveSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  // ------------------------------------------------------- ChunkSplit

  test("chunks cover every token; starts advance by the stride") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val got = ChunkSplit(chunkTokens = 32, overlapTokens = 8)
      .transform(docs(Seq(text)))
      .select("chunk_idx", "chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == got.indices.map(_ * 24L),
      "starts must be consecutive stride multiples")
    // coverage: union of [start, start + n) is exactly [0, 100)
    val covered = got.flatMap(c => c._2 until (c._2 + c._3)).toSet
    assert(covered == (0L until 100L).toSet)
    // every chunk but the last is full-width
    assert(got.init.forall(_._3 == 32L) && got.last._3 <= 32L)
    // overlap: chunk i+1 repeats the last 8 tokens of chunk i
    val toks = got.map(_._4.split(" ").toSeq).toSeq
    toks.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0).takeRight(8) == w(1).take(8))
    }
  }

  test("short and empty docs yield exactly one chunk") {
    val got = ChunkSplit(chunkTokens = 32, overlapTokens = 8)
      .transform(docs(Seq("one two three", "")))
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    assert(got.count(_._1 == 0L) == 1 && got.count(_._1 == 1L) == 1)
    val short = got.find(_._1 == 0L).get
    assert(short._3 == 3L && short._4 == "one two three")
    // the empty doc carries the split("") == [""] single-empty-token
    // convention shared with TokenCount and the DuckDB oracle
    val empty = got.find(_._1 == 1L).get
    assert(empty._3 == 1L && empty._4 == "")
  }

  test("external tokenArrayColumn: precomputed whitespace tokens " +
    "reproduce the default path bit-for-bit; text is unread") {
    val base = docs(Seq((1 to 50).map(i => s"w$i").mkString(" "),
      "alpha beta gamma"))
    val viaText = ChunkSplit(chunkTokens = 16, overlapTokens = 4)
      .transform(base)
      .select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens",
        "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    val viaArray = ChunkSplit(chunkTokens = 16, overlapTokens = 4,
        tokenArrayColumn = "tk")
      .transform(base
        .withColumn("tk", split(trim(lower(col("text"))), "\\s+"))
        .drop("text")) // the external path must not require text
      .select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens",
        "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(viaArray.toSeq == viaText.toSeq)
  }

  test("external tokenArrayColumn: an EMPTY external array (a real " +
    "tokenizer's empty output, unlike the whitespace [\"\"] convention) " +
    "still yields exactly one zero-token chunk") {
    val df = Seq((7L, Seq.empty[String]), (8L, Seq("a", "b", "c")))
      .toDF("doc_id", "tk")
    val got = ChunkSplit(chunkTokens = 4, overlapTokens = 1,
        tokenArrayColumn = "tk")
      .transform(df)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    assert(got.count(_._1 == 7L) == 1)
    val empty = got.find(_._1 == 7L).get
    assert(empty._3 == 0L && empty._4 == "")
    val full = got.find(_._1 == 8L).get
    assert(full._3 == 3L && full._4 == "a b c")
  }

  test("external tokenArrayColumn: null array and a non-array<string> " +
    "column fail loudly") {
    val nullArr = Seq((1L, null.asInstanceOf[Seq[String]]))
      .toDF("doc_id", "tk")
    assertThrows[Exception](
      ChunkSplit(tokenArrayColumn = "tk").transform(nullArr).collect())
    // null ELEMENTS would desync n_chunk_tokens (size counts them)
    // from chunk_text (array_join drops them) — raise instead
    val nullElem = Seq((1L, Seq("a", null.asInstanceOf[String], "b")))
      .toDF("doc_id", "tk")
    val ee = intercept[Exception](
      ChunkSplit(tokenArrayColumn = "tk").transform(nullElem).collect())
    assert(ee.getMessage.contains("null elements") ||
      (ee.getCause != null &&
        ee.getCause.getMessage.contains("null elements")))
    val wrongType = Seq((1L, Seq(1, 2, 3))).toDF("doc_id", "tk")
    val e = intercept[IllegalArgumentException](
      ChunkSplit(tokenArrayColumn = "tk").transform(wrongType))
    assert(e.getMessage.contains("array<string>"), e.getMessage)
    val missing = Seq((1L, "x")).toDF("doc_id", "text")
    assertThrows[Exception](
      ChunkSplit(tokenArrayColumn = "nope").transform(missing))
  }

  test("null text fails loudly") {
    val df = Seq((1L, "ok")).toDF("doc_id", "text")
      .withColumn("text", when(col("doc_id") === 1L, lit(null: String)))
    val e = intercept[Exception] {
      ChunkSplit().transform(df).collect()
    }
    assert(e.getMessage.contains("must be non-null"))
  }

  // ------------------------------------------------ InterleaveShuffle

  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, s"doc $i body")).toDF("doc_id", "text")

  test("positions are a bijection onto [0, n) and shards interleave") {
    val n = 500
    val got = InterleaveShuffle(numShards = 8).transform(corpus(n))
      .select("doc_id", "global_pos", "shard", "pos_in_shard")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == n, "row-preserving")
    assert(got.map(_._2).toSet == (0L until n.toLong).toSet,
      "global_pos must be an exact permutation index")
    got.foreach { case (_, gp, s, ps) =>
      assert(s == gp % 8 && ps == gp / 8)
    }
    // round-robin interleave balances shards to within one row
    val sizes = got.groupBy(_._3).view.mapValues(_.length).values
    assert(sizes.max - sizes.min <= 1)
    // the permutation actually permutes (md5 order != id order)
    assert(got.sortBy(_._1).map(_._2).toSeq != (0L until n.toLong).toSeq)
  }

  test("order is deterministic and partition-invariant") {
    val a = InterleaveShuffle(numShards = 4).transform(corpus(200))
    val b = InterleaveShuffle(numShards = 4)
      .transform(corpus(200).repartition(13))
    val pa = a.select("doc_id", "global_pos").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    val pb = b.select("doc_id", "global_pos").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(pa == pb)
  }

  test("few hash buckets and many agree (the prefix-sum algebra)") {
    val one = InterleaveShuffle(numShards = 4, hashBuckets = 1)
      .transform(corpus(150)).select("doc_id", "global_pos")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val many = InterleaveShuffle(numShards = 4, hashBuckets = 4096)
      .transform(corpus(150)).select("doc_id", "global_pos")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(one == many)
  }

  test("null id fails loudly; output columns overwrite stale inputs") {
    val withNull = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      InterleaveShuffle().transform(withNull).collect()
    }
    assert(e.getMessage.contains("non-null"))
    val stale = corpus(10).withColumn("shard", lit("stale"))
    val out = InterleaveShuffle(numShards = 2).transform(stale)
    assert(out.columns.count(_ == "shard") == 1)
    assert(out.select(max(col("shard"))).as[Long].head() <= 1L)
  }
}
