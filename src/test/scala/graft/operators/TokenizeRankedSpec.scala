package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Merge-rank-order BPE inference ([[Tokenize.BpeEncodeRanked]]):
  * the divergence from greedy MaxMatch exhibited on a concrete vocab
  * (proving the distinction is real, not academic), a naive-reference
  * property sweep over learned vocabs (the BpeLearnSpec convention),
  * the decode roundtrip identity, byte-level totality, and the
  * fail-loud edges. Corpus-scale value correctness is pinned by the
  * DuckDB oracle (`bpe_enc_ranked`, `bpe_ranked_byte`), which replays
  * the rank-order application itself in SQL.
  */
class TokenizeRankedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def encIds(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Seq[Long]] =
    df.select("doc_id", "bpe_ids").as[(Long, Seq[Long])]
      .collect().toMap

  test("rank order diverges from MaxMatch where the lowest-rank merge " +
    "sits to the right of a longer head piece: `abc` with merges " +
    "rank1=##bc, rank2=ab splits [a, ##bc] ranked vs [ab, ##c] greedy") {
    val vocab = Seq(
      ("a", 1L, 0L), ("b", 2L, 0L), ("c", 3L, 0L),
      ("##a", 4L, 0L), ("##b", 5L, 0L), ("##c", 6L, 0L),
      ("##bc", 7L, 1L), ("ab", 8L, 2L))
      .toDF("piece", "id", "merge_rank")
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val ranked = encIds(Tokenize.BpeEncodeRanked(vocab).transform(docs))
    val greedy = encIds(Tokenize.BpeEncode(vocab).transform(docs))
    assert(ranked(1L) == Seq(1L, 7L)) // a, ##bc
    assert(greedy(1L) == Seq(8L, 6L)) // ab, ##c
    assert(ranked(1L) != greedy(1L))
  }

  test("re-picking the global minimum each step: a later merge creates " +
    "the adjacency for an earlier one, which a single rank-ordered " +
    "sweep would miss") {
    // merges: rank1 = "xy##z"->"xyz"?? keep it simple:
    // rank1 = "ab" (a+##b), rank2 = "##cd" (##c+##d),
    // rank3 = "a##cd"->"acd". Word "acd b": in "acd", rank1 needs
    // (a,##b) — absent; rank2 merges ##c+##d -> ##cd; THEN a+##cd
    // forms rank3's piece "acd". The loop must come back for it.
    val vocab = Seq(
      ("a", 1L, 0L), ("b", 2L, 0L), ("c", 3L, 0L), ("d", 4L, 0L),
      ("##a", 5L, 0L), ("##b", 6L, 0L), ("##c", 7L, 0L), ("##d", 8L, 0L),
      ("ab", 9L, 1L), ("##cd", 10L, 2L), ("acd", 11L, 3L))
      .toDF("piece", "id", "merge_rank")
    val docs = Seq((1L, "acd")).toDF("doc_id", "text")
    val got = encIds(Tokenize.BpeEncodeRanked(vocab).transform(docs))
    assert(got(1L) == Seq(11L)) // one token: acd
  }

  /** Independent naive rank-order apply over one word (immutable-list
    * formulation — the structural opposite of the operator's in-place
    * buffers). */
  private def naiveRanked(word: String, ranks: Map[String, Long])
      : Vector[String] = {
    val pfx = "##"
    def strip(b: String) = if (b.startsWith(pfx)) b.drop(2) else b
    var s: Vector[String] =
      word.take(1) +: word.drop(1).map(c => pfx + c).toVector
    var go = s.length > 1
    while (go) {
      val cands = (0 until s.length - 1).flatMap { i =>
        val m = s(i) + strip(s(i + 1))
        ranks.get(m).map(r => (r, m))
      }
      if (cands.isEmpty) go = false
      else {
        val p = cands.min._2
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        s.foreach { x =>
          if (out.nonEmpty && out.last + strip(x) == p)
            out(out.length - 1) = p
          else out += x
        }
        s = out.toVector
        go = s.length > 1
      }
    }
    s
  }

  test("property: 30 random corpora — ranked encode over the LEARNED " +
    "vocab agrees with the independent naive reference word by word, " +
    "and the decode roundtrip identity holds") {
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abcd"
    (1 to 30).foreach { trial =>
      val nWords = 1 + rnd.nextInt(8)
      val ws = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      }
      val text = rnd.shuffle(ws.flatMap(w =>
        Seq.fill(1 + rnd.nextInt(3))(w))).mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val nMerges = 1 + rnd.nextInt(8)
      val vocab = Tokenize.BpeLearn(nMerges = nMerges).transform(docs)
      val vrows = vocab.as[(String, Long, Long)].collect()
      val ranks = vrows.filter(_._3 >= 1L)
        .map(r => r._1 -> r._3).toMap
      val ids = vrows.map(r => r._1 -> r._2).toMap
      val want = text.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => naiveRanked(w, ranks).map(ids))
      val enc = Tokenize.BpeEncodeRanked(vocab).transform(docs)
      val got = encIds(enc)(1L)
      assert(got == want, s"trial $trial text=`$text` nMerges=$nMerges")
      // roundtrip: decode(encode(text)) == the canonical normal form
      val dec = Tokenize.BpeDecode(vocab).transform(enc)
        .select("doc_id", "text").as[(Long, String)].collect().head._2
      assert(dec == text.split("\\s+").filter(_.nonEmpty).mkString(" "),
        s"trial $trial roundtrip")
    }
  }

  test("byte-level ranked encode is TOTAL (unseen chars, emoji) and " +
    "roundtrips exactly") {
    val fit = Seq((1L, "hug hug pug"), (2L, "hug pug hugs"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.BpeLearn(nMerges = 6, byteLevel = true,
      baseAlphabet = Tokenize.byteAlphabet).transform(fit)
    val alien = Seq((1L, "hüg 🚀🚀 pug\tzzz"))
      .toDF("doc_id", "text")
    val enc = Tokenize.BpeEncodeRanked(vocab, byteLevel = true)
      .transform(alien)
    assert(encIds(enc)(1L).nonEmpty)
    val dec = Tokenize.BpeDecode(vocab, byteLevel = true).transform(enc)
      .select("text").as[String].collect().head
    assert(dec == "hüg 🚀🚀 pug zzz")
  }

  test("non-BMP chars symbolize per CODEPOINT (not UTF-16 unit): a " +
    "char-level vocab learned over astral text ranked-encodes it with " +
    "no UNK and roundtrips — per-unit stepping would shred emoji into " +
    "lone-surrogate symbols that match nothing and UNK the whole word") {
    val text = "🚀🚀x 🚀🚀x " +
      "y🚀" // 🚀🚀x 🚀🚀x y🚀
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val vocab = Tokenize.BpeLearn(nMerges = 3).transform(docs)
    // unkId = None: any lone-surrogate symbolization fails LOUD here,
    // so a clean encode proves codepoint-aligned initial symbols
    val enc = Tokenize.BpeEncodeRanked(vocab).transform(docs)
    assert(encIds(enc)(1L).nonEmpty)
    val dec = Tokenize.BpeDecode(vocab).transform(enc)
      .select("text").as[String].collect().head
    assert(dec == "🚀🚀x 🚀🚀x " +
      "y🚀")
  }

  test("emitPieces: the emitted pieces are exactly the final merge " +
    "symbols (vocab rows), they reassemble the canonical text, and " +
    "they drive ChunkSplit's external-token path") {
    val docs = Seq((1L, "hug hug pug"), (2L, "hug pug hugs"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.BpeLearn(nMerges = 10).transform(docs)
    val enc = Tokenize.BpeEncodeRanked(vocab, emitPieces = true)
      .transform(docs)
    val got = enc.select("doc_id", "bpe_ids", "bpe_pieces")
      .as[(Long, Seq[Long], Seq[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val byId = vocab.as[(String, Long, Long)].collect()
      .map(r => r._2 -> r._1).toMap
    got.foreach { case (_, (ids, pcs)) =>
      assert(ids.map(byId) == pcs) // pieces ARE the matched vocab rows
    }
    // reassembly: strip continuation prefixes, split at first-form
    // pieces — the canonical text comes back
    def reassemble(pcs: Seq[String]): String = {
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      pcs.foreach { p =>
        if (p.startsWith("##")) words(words.length - 1) += p.drop(2)
        else words += p
      }
      words.mkString(" ")
    }
    assert(reassemble(got(1L)._2) == "hug hug pug")
    // the chunker consumes the pieces unchanged
    val chunks = ChunkSplit(chunkTokens = 2, overlapTokens = 0,
        tokenArrayColumn = "bpe_pieces")
      .transform(enc)
    assert(chunks.count() > 0)
  }

  test("fail loud: a char-level vocab missing a character raises " +
    "naming the word (or UNKs the WHOLE word with unkId); duplicate " +
    "merge ranks and a missing merge_rank column raise at build") {
    val docs = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val vocab = Tokenize.BpeLearn(nMerges = 2).transform(docs)
    val alien = Seq((1L, "ab xq")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Tokenize.BpeEncodeRanked(vocab).transform(alien).collect()
    }
    assert(e.getMessage.contains("xq"), e.getMessage)
    val got = encIds(Tokenize.BpeEncodeRanked(vocab, unkId = Some(-1L))
      .transform(alien))
    assert(got(1L).length == 2 && got(1L).last == -1L)
    val dup = vocab.withColumn("merge_rank",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("merge_rank") >= 1L, 1L)
        .otherwise(0L))
    assert(vocab.filter("merge_rank >= 1").count() == 2)
    val e2 = intercept[IllegalArgumentException] {
      Tokenize.BpeEncodeRanked(dup).transform(docs)
    }
    assert(e2.getMessage.contains("merge_rank"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Tokenize.BpeEncodeRanked(vocab.drop("merge_rank")).transform(docs)
    }
    assert(e3.getMessage.toLowerCase.contains("merge_rank"), e3.getMessage)
  }
}
