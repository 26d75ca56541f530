package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Byte-level BPE: the visible byte alphabet, the column/local mapping
  * agreement, and the TOTALITY guarantee — a vocab learned with the
  * full 256-symbol `baseAlphabet` encodes ANY input with no UNK and no
  * raise, including text the learn corpus never saw (the property
  * char-level vocabs cannot give). Value-level correctness of the
  * learn → encode chain over byte symbols is pinned by the DuckDB
  * oracle on `bpe_byte`, which re-derives the byte mapping, the merge
  * rounds and the encode in SQL.
  */
class TokenizeByteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("byteChar: 256 DISTINCT single-unit BMP chars, never a " +
    "surrogate, never whitespace (the mapped word survives re-split)") {
    val cs = Tokenize.byteAlphabet
    assert(cs.length == 256)
    assert(cs.distinct.length == 256)
    cs.foreach { s =>
      assert(s.length == 1)
      val c = s.charAt(0)
      assert(!Character.isSurrogate(c))
      assert(!Character.isWhitespace(c), s"mapped char U+${c.toInt}")
    }
    // printable bytes keep their codepoint; others land above 255
    assert(Tokenize.byteMapLocal("Ab!") == "Ab!")
    assert(Tokenize.byteMapLocal(" ").charAt(0).toInt >= 256)
  }

  test("byteMapCol == byteMapLocal on ASCII, multi-byte UTF-8 and " +
    "non-BMP input (the column/hot-path seam)") {
    val words = Seq("hello", "café", "日本語", "🚀go", "𝄞clef", "a b")
    val got = words.toDF("w")
      .select(Tokenize.byteMapCol(org.apache.spark.sql.functions.col("w")))
      .as[String].collect().toSeq
    assert(got == words.map(Tokenize.byteMapLocal))
  }

  test("byte-level learn + full baseAlphabet: encode is TOTAL — " +
    "unseen scripts, emoji and control bytes encode with no unkId " +
    "and no raise; token ids are conserved against the mapped length") {
    val corpus = Seq((1L, "low lower lowest"), (2L, "new newer newest"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.BpeLearn(nMerges = 6, byteLevel = true,
      baseAlphabet = Tokenize.byteAlphabet).transform(corpus)
    // unseen at learn time: CJK, emoji, combining marks, a control char
    val alien = Seq((1L, "日本語 🚀🚀 études"), (2L, "xy"),
      (3L, "ĠĠ ##weird"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Tokenize.BpeEncode(vocab, byteLevel = true)
      .transform(alien)
      .as[(Long, Long, Array[Long])].collect().sortBy(_._1)
    assert(out.length == 4)
    assert(out.forall(_._2 >= 0))
    assert(out(3)._3.isEmpty) // null text → empty encode, row kept
    // conservation: with no multi-char merge matching, token count per
    // word == mapped symbol count; in general SUM(piece lengths) ==
    // mapped length — check via pieces
    val withPieces = Tokenize.BpeEncode(vocab, byteLevel = true,
      emitPieces = true).transform(alien)
      .select("doc_id", "bpe_pieces")
      .as[(Long, Array[String])].collect().sortBy(_._1)
    val doc1Pieces = withPieces(0)._2
    val expectedLen = "日本語 🚀🚀 études".toLowerCase.split("\\s+")
      .filter(_.nonEmpty).map(w => Tokenize.byteMapLocal(w).length).sum
    val gotLen = doc1Pieces.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).sum
    assert(gotLen == expectedLen)
  }

  test("byte-level vocab is self-describing: a char-level encode of a " +
    "byte-level vocab (and vice versa) fails loud naming the drift") {
    val corpus = Seq((1L, "aa ab")).toDF("doc_id", "text")
    val byteVocab = Tokenize.BpeLearn(nMerges = 2, byteLevel = true,
      baseAlphabet = Tokenize.byteAlphabet).transform(corpus)
    val e1 = intercept[IllegalArgumentException] {
      Tokenize.BpeEncode(byteVocab).transform(corpus).collect()
    }
    assert(e1.getMessage.contains("byteLevel"))
    val charVocab = Tokenize.BpeLearn(nMerges = 2).transform(corpus)
    val e2 = intercept[IllegalArgumentException] {
      Tokenize.BpeEncode(charVocab, byteLevel = true)
        .transform(corpus).collect()
    }
    assert(e2.getMessage.contains("byteLevel"))
    // VocabBuild vocabs record byteLevel=false too
    val vb = Tokenize.VocabBuild().transform(corpus)
    val e3 = intercept[IllegalArgumentException] {
      Tokenize.BpeEncode(vb, byteLevel = true).transform(corpus).collect()
    }
    assert(e3.getMessage.contains("byteLevel"))
  }

  test("baseAlphabet guards: empty or prefix-classified symbols fail " +
    "loud at construction") {
    intercept[IllegalArgumentException] {
      Tokenize.BpeLearn(baseAlphabet = Seq(""))
    }
    intercept[IllegalArgumentException] {
      Tokenize.BpeLearn(baseAlphabet = Seq("##x"))
    }
  }

  test("decode: round trip is exact through char-level AND byte-level " +
    "vocabs (any merge depth), including CJK/emoji/combining marks; " +
    "null text round-trips to the empty string") {
    val corpus = Seq((1L, "Low lower  \t Lowest"), (2L, "日本語 🚀🚀go"),
      (3L, "études études"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val want = Seq((1L, "low lower lowest"), (2L, "日本語 🚀🚀go"),
      (3L, "études études"), (4L, ""))
    // byte-level
    val bv = Tokenize.BpeLearn(nMerges = 5, byteLevel = true,
      baseAlphabet = Tokenize.byteAlphabet).transform(corpus)
    val bgot = Tokenize.BpeDecode(bv, byteLevel = true)
      .transform(Tokenize.BpeEncode(bv, byteLevel = true)
        .transform(corpus))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(bgot == want)
    // char-level (vocab covers its own corpus)
    val cv = Tokenize.BpeLearn(nMerges = 5).transform(corpus)
    val cgot = Tokenize.BpeDecode(cv)
      .transform(Tokenize.BpeEncode(cv).transform(corpus))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(cgot == want)
  }

  test("decode fail-loud contract: unknown id (incl. an encode unkId), " +
    "continuation piece at word start, and fit-param drift all raise") {
    val corpus = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val v = Tokenize.BpeLearn(nMerges = 1).transform(corpus)
    val maxId = v.agg(org.apache.spark.sql.functions.max("id"))
      .as[Long].collect().head
    // unknown id (an unkId stream is the realistic instance)
    val e1 = intercept[Exception] {
      Tokenize.BpeDecode(v).transform(
        Seq((7L, Array(maxId + 100L))).toDF("doc_id", "bpe_ids"))
        .collect()
    }
    assert(e1.getMessage.contains("not in"))
    // continuation piece at word start
    val contId = v.filter(org.apache.spark.sql.functions.col("piece")
      .startsWith("##")).select("id").as[Long].collect().head
    val e2 = intercept[Exception] {
      Tokenize.BpeDecode(v).transform(
        Seq((8L, Array(contId))).toDF("doc_id", "bpe_ids")).collect()
    }
    assert(e2.getMessage.contains("word start"))
    // drift: byte-level decode of a char-level vocab
    val e3 = intercept[IllegalArgumentException] {
      Tokenize.BpeDecode(v, byteLevel = true).transform(
        Seq((9L, Array(1L))).toDF("doc_id", "bpe_ids")).collect()
    }
    assert(e3.getMessage.contains("byteLevel"))
  }

  test("byte-level merge learning actually merges byte symbols (a " +
    "frequent pair becomes one token) and stays deterministic across " +
    "repartition") {
    val corpus = (0 until 40).map(i => (i.toLong, "ab ab ab ba"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Tokenize.BpeLearn(nMerges = 1, byteLevel = true)
        .transform(df)
        .select("piece", "id", "merge_rank")
        .as[(String, Long, Long)].collect().sortBy(_._2).toSeq
    val vocab = run(corpus)
    // the argmax merge is (a, ##b) → 'ab' at rank 1
    assert(vocab.exists { case (p, _, r) => p == "ab" && r == 1L })
    assert(run(corpus.repartition(7)) == vocab)
    // and the encode uses it: "ab" is ONE token
    val enc = Tokenize.BpeEncode(
        Tokenize.BpeLearn(nMerges = 1, byteLevel = true).transform(corpus),
        byteLevel = true, emitPieces = true)
      .transform(Seq((9L, "ab")).toDF("doc_id", "text"))
      .select("bpe_pieces").as[Array[String]].collect().head
    assert(enc.toSeq == Seq("ab"))
  }
}
