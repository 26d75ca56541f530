package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Non-BMP Unicode coverage for the tokenize family (r13 verdict #4):
  * the engine's trie walks UTF-16 UNITS while the vocab constructions
  * and the SQL oracle count CODEPOINTS. The two longest-match orders
  * agree because pieces matching at one cursor form a prefix chain and
  * well-formed prefix extensions grow units and codepoints together —
  * [[Tokenize.BpeEncode]] enforces the well-formedness precondition
  * fail-loud. This spec pins the argument empirically: surrogate pairs
  * (emoji, musical symbols), CJK, and combining marks through
  * VocabBuild → BpeEncode against an independent CODEPOINT-greedy
  * reference, plus boundary-alignment and guard cases. The corpus-scale
  * pin is the `bpe_enc_uni` oracle row (DuckDB re-derives the encode in
  * codepoint arithmetic).
  */
class TokenizeUnicodeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // alphabet: ASCII, CJK, a COMBINING acute, and two non-BMP chars
  // (2 UTF-16 units each on the JVM)
  private val alphabet: Vector[String] =
    Vector("a", "b", "日", "本", "́", "🚀" /* 🚀 */,
      "𝄞" /* 𝄞 */)

  private def wellFormed(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
          return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
  }

  /** Independent greedy longest-match over CODEPOINT arrays — the
    * DuckDB oracle's arithmetic, reimplemented without the trie. */
  private def naiveEncode(first: Map[String, Long], cont: Map[String, Long],
                          word: String): Option[Seq[Long]] = {
    val cps = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    while (pos < cps.length) {
      val table = if (pos == 0) first else cont
      val best = (1 to (cps.length - pos))
        .map(len => cps.slice(pos, pos + len).mkString)
        .filter(table.contains)
        .sortBy(p => -p.codePointCount(0, p.length))
        .headOption
      best match {
        case None => return None
        case Some(p) =>
          out += table(p)
          pos += p.codePointCount(0, p.length)
      }
    }
    Some(out.toSeq)
  }

  test("property: 30 random surrogate/CJK/combining corpora — engine " +
    "token ids equal the codepoint-greedy reference, every emitted " +
    "piece is well-formed UTF-16, and pieces reassemble the text") {
    val rnd = new scala.util.Random(14L)
    (1 to 30).foreach { trial =>
      val nWords = 1 + rnd.nextInt(6)
      val words = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(5)
        // never start a word with the combining mark (a combining mark
        // needs a base; DuckDB/Spark both treat it as its own codepoint
        // so mid-word positions are fine)
        val head = alphabet(rnd.nextInt(4))
        val tail = (1 until len)
          .map(_ => alphabet(rnd.nextInt(alphabet.length)))
        (head +: tail).mkString
      }
      val text = words.mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val vocabDf = Tokenize.VocabBuild(topWords = 2).transform(docs)
      val vocab = vocabDf.select("piece", "id")
        .as[(String, Long)].collect()
      vocab.foreach { case (p, _) =>
        assert(wellFormed(p), s"trial $trial: ill-formed piece `$p`")
      }
      val (contRaw, firstRaw) = vocab.partition(_._1.startsWith("##"))
      val first = firstRaw.toMap
      val cont = contRaw.map { case (p, id) => p.drop(2) -> id }.toMap
      val got = Tokenize.BpeEncode(vocabDf, emitPieces = true)
        .transform(docs)
        .as[(Long, Long, Seq[Long], Seq[String])].collect().head
      // 1) ids equal the codepoint-greedy reference, word by word
      val expIds = words.flatMap(w => naiveEncode(first, cont, w)
        .getOrElse(fail(s"trial $trial: reference dead-ends on `$w` — " +
          "char coverage must prevent this")))
      assert(got._3 == expIds, s"trial $trial text=`$text`")
      // 2) every emitted piece is well-formed (no split surrogate)
      got._4.foreach(p => assert(wellFormed(p),
        s"trial $trial: emitted piece `$p` splits a surrogate pair"))
      // 3) pieces reassemble the text exactly (boundaries are
      // codepoint-aligned and nothing is lost)
      val rebuilt = got._4.map(p =>
        if (p.startsWith("##")) p.drop(2) else p).mkString
      assert(rebuilt == text.replace(" ", ""), s"trial $trial")
    }
  }

  test("lone surrogates cannot reach the trie: Spark's UTF8String " +
    "sanitizes ill-formed UTF-16 at the column boundary, so every " +
    "collected vocab piece is well-formed by construction (the " +
    "BpeEncode guard is the backstop should that conversion ever " +
    "change)") {
    // pieces with unpaired surrogates, pushed through a string column:
    // the UTF-8 conversion replaces the lone surrogate — what comes
    // back is well-formed and NOT the original
    val back = Seq(("a\uD83D", 1L), ("\uDE80x", 2L))
      .toDF("piece", "id").select("piece").as[String].collect()
    back.foreach { p =>
      assert(wellFormed(p), s"collected piece `$p` ill-formed")
    }
    assert(!back.contains("a\uD83D") && !back.contains("\uDE80x"))
    // and the encode over such a vocab therefore runs on the sanitized
    // well-formed pieces rather than crashing or splitting codepoints
    val vocab = Seq(("a", 1L), ("b", 2L), ("##b", 3L), ("a\uD83D", 4L))
      .toDF("piece", "id")
    val got = Tokenize.BpeEncode(vocab)
      .transform(Seq((1L, "ab")).toDF("doc_id", "text"))
      .as[(Long, Long, Seq[Long])].collect().head
    assert(got._3 == Seq(1L, 3L))
  }

  test("golden: a longer-in-codepoints piece wins over a shorter one " +
    "even when the shorter contains surrogate pairs (prefix-chain " +
    "agreement, not unit-count luck)") {
    // word 🚀🚀go: pieces 🚀 (1 cp, 2 units) and 🚀🚀g (3 cp, 5 units)
    // both match at pos 0; greedy takes the 3-codepoint piece
    val vocab = Seq(
      ("🚀", 1L), ("🚀🚀g", 2L),
      ("##🚀", 3L), ("##g", 4L), ("##o", 5L), ("g", 6L),
      ("o", 7L)).toDF("piece", "id")
    val got = Tokenize.BpeEncode(vocab)
      .transform(Seq((1L, "🚀🚀go"))
        .toDF("doc_id", "text"))
      .as[(Long, Long, Seq[Long])].collect().head
    assert(got._3 == Seq(2L, 5L)) // [🚀🚀g, ##o]
    // and BpeLearn over such text emits only well-formed pieces
    val learned = Tokenize.BpeLearn(nMerges = 4)
      .transform(Seq((1L, "🚀🚀go " +
        "🚀🚀go 日本")).toDF("doc_id", "text"))
      .select("piece").as[String].collect()
    learned.foreach(p => assert(wellFormed(p), s"piece `$p`"))
  }
}
