package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unigram-LM subword inference ([[Tokenize.UnigramScores]] +
  * [[Tokenize.UnigramEncode]]): the max-likelihood divergence from
  * greedy MaxMatch exhibited on a concrete score table, the exact
  * tie-break lattice (total score → fewer tokens → longer final
  * piece), a naive ENUMERATE-ALL-SEGMENTATIONS reference sweep under
  * heavy tie pressure (the structural opposite of the operator's
  * forward DP), the scores' closed-form integer values, the decode
  * roundtrip, byte-level totality, and the fail-loud edges.
  * Corpus-scale value correctness is pinned by the DuckDB oracle
  * (`unigram_scores`, `unigram_encode`), which replays the MaxMatch
  * count, the ln lattice AND the Viterbi DP cell-for-cell in SQL.
  */
class TokenizeUnigramSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def encIds(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Seq[Long]] =
    df.select("doc_id", "bpe_ids").as[(Long, Seq[Long])]
      .collect().toMap

  test("max-likelihood segmentation diverges from greedy MaxMatch " +
    "where the longest head piece forces a poor tail: `abc` splits " +
    "[a, ##bc] under the scores but [ab, ##c] greedily") {
    val scores = Seq(
      ("a", 1L, -1L), ("b", 2L, -10L), ("c", 3L, -10L),
      ("##a", 4L, -10L), ("##b", 5L, -10L), ("##c", 6L, -10L),
      ("ab", 7L, -5L), ("##bc", 8L, -1L))
      .toDF("piece", "id", "score")
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val uni = encIds(Tokenize.UnigramEncode(scores).transform(docs))
    val greedy = encIds(
      Tokenize.BpeEncode(scores.drop("score")).transform(docs))
    assert(uni(1L) == Seq(1L, 8L)) // a(-1) + ##bc(-1) = -2
    assert(greedy(1L) == Seq(7L, 6L)) // ab + ##c (longest head)
    assert(uni(1L) != greedy(1L))
  }

  test("tie-break lattice is exact: equal totals fall to FEWER " +
    "tokens, equal counts fall to the LONGER final piece") {
    // abcd as one piece (-4) vs four singles (-1 each, total -4):
    // fewer tokens wins
    val s1 = Seq(
      ("a", 1L, -1L), ("##b", 2L, -1L), ("##c", 3L, -1L),
      ("##d", 4L, -1L), ("abcd", 5L, -4L),
      ("b", 6L, -9L), ("c", 7L, -9L), ("d", 8L, -9L),
      ("##a", 9L, -9L))
      .toDF("piece", "id", "score")
    val d = Seq((1L, "abcd")).toDF("doc_id", "text")
    assert(encIds(Tokenize.UnigramEncode(s1).transform(d))(1L)
      == Seq(5L))
    // a+##bc (-1,-2) vs ab+##c (-2,-1): totals -3, both 2 tokens —
    // the LONGER final piece (##bc, len 2) wins
    val s2 = Seq(
      ("a", 1L, -1L), ("b", 2L, -9L), ("c", 3L, -9L),
      ("##a", 4L, -9L), ("##b", 5L, -9L), ("##c", 6L, -1L),
      ("ab", 7L, -2L), ("##bc", 8L, -2L))
      .toDF("piece", "id", "score")
    val d2 = Seq((1L, "abc")).toDF("doc_id", "text")
    assert(encIds(Tokenize.UnigramEncode(s2).transform(d2))(1L)
      == Seq(1L, 8L)) // a, ##bc
  }

  /** Independent naive reference: enumerate EVERY full segmentation of
    * the word and pick the winner by the global order (total desc,
    * token count asc, then piece-LENGTH sequence compared from the END
    * — longer-last-piece first). Cell-local DP tie-breaking equals
    * this global rule because (total, count)-tied paths sharing an end
    * length share the final piece itself, so the comparison recurses
    * onto the shared prefix cell.
    */
  private def naiveBest(word: String,
                        sc: Map[String, (Long, Long)]): Seq[Long] = {
    def strip(p: String) = if (p.startsWith("##")) p.drop(2) else p
    def segs(pos: Int): Seq[List[String]] =
      if (pos == word.length) Seq(Nil)
      else sc.keys.toSeq
        .filter(p => (pos == 0) == !p.startsWith("##"))
        .map(p => (p, strip(p)))
        .filter { case (_, body) =>
          body.nonEmpty && word.startsWith(body, pos) }
        .flatMap { case (p, body) =>
          segs(pos + body.length).map(p :: _) }
    val all = segs(0)
    assert(all.nonEmpty, s"no segmentation for `$word`")
    // lexicographic key over REVERSED piece lengths, longer-first:
    // chars '0'+(9-len) sort smaller for longer pieces (lens <= 9);
    // (total, count)-tied paths have equal-length sequences, so no
    // prefix ambiguity exists
    val best = all.minBy { path =>
      val total = path.map(p => sc(p)._2).sum
      val lensKey = path.map(p => strip(p).length).reverse
        .map(l => ('0' + (9 - l)).toChar).mkString
      (-total, path.length, lensKey)
    }
    best.map(p => sc(p)._1)
  }

  test("property: 40 random score tables under HEAVY tie pressure — " +
    "the forward DP equals the enumerate-all-segmentations reference " +
    "word for word") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 40).foreach { trial =>
      // alphabet {a,b}: chars in both forms (totality) + random
      // multi-char pieces; scores in {-3,-2,-1} to force ties
      val base = Seq("a", "b", "##a", "##b")
      val extra = (for {
        len <- 2 to 3
        s <- Seq.fill(6)((0 until len)
          .map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString)
        form <- Seq(s, "##" + s)
      } yield form).distinct.filter(p => rnd.nextBoolean())
      val pieces = (base ++ extra).distinct
      val table = pieces.zipWithIndex.map { case (p, i) =>
        (p, (i + 1).toLong, -(1L + rnd.nextInt(3))) }
      val sc = table.map { case (p, id, s) => p -> (id, s) }.toMap
      val words = (1 to 5).map(_ => (1 to (1 + rnd.nextInt(6)))
        .map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString)
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val got = encIds(Tokenize.UnigramEncode(
        table.toDF("piece", "id", "score")).transform(docs))
      words.zipWithIndex.foreach { case (w, i) =>
        assert(got(i.toLong) == naiveBest(w, sc),
          s"trial $trial word `$w` table $table")
      }
      // r17: the same agreement on a PRUNED vocab — drop a random
      // subset of the multi-char pieces (the base chars stay, so
      // coverage holds) and the DP must still match the reference
      val pruned = table.filter { case (p, _, _) =>
        base.contains(p) || rnd.nextBoolean() }
      val scP = pruned.map { case (p, id, s) => p -> (id, s) }.toMap
      val gotP = encIds(Tokenize.UnigramEncode(
        pruned.toDF("piece", "id", "score")).transform(docs))
      words.zipWithIndex.foreach { case (w, i) =>
        assert(gotP(i.toLong) == naiveBest(w, scP),
          s"trial $trial word `$w` pruned table $pruned")
      }
    }
  }

  test("UnigramScores: closed-form integer values — MaxMatch counts, " +
    "add-one smoothing, the 1e6 ln lattice; encode-then-decode " +
    "roundtrips the canonical text") {
    val docs = Seq((1L, "hug hug pug"), (2L, "hug pug hugs"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.VocabBuild(topWords = 2).transform(docs)
    val scores = Tokenize.UnigramScores(vocab).transform(docs)
    val rows = scores.as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // recompute the expected counts independently: one MaxMatch pass,
    // piece frequencies under that segmentation
    val enc = Tokenize.BpeEncode(vocab, emitPieces = true)
      .transform(docs)
    val cnt = enc.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("bpe_pieces")).as("p"))
      .groupBy("p").count().as[(String, Long)].collect().toMap
    val total = cnt.values.sum
    val v = vocab.count()
    rows.foreach { case (piece, (_, score)) =>
      val expected = math.round(math.log(
        (cnt.getOrElse(piece, 0L) + 1).toDouble / (total + v)) * 1e6)
      assert(score == expected, s"piece `$piece`")
    }
    // pieces never matched by MaxMatch still score (smoothing)
    assert(rows.exists { case (p, (_, _)) => !cnt.contains(p) })
    val out = Tokenize.UnigramEncode(scores).transform(docs)
    val dec = Tokenize.BpeDecode(scores).transform(out)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(dec(1L) == "hug hug pug" && dec(2L) == "hug pug hugs")
  }

  test("hard-EM refinement: emRounds=1 equals the independent replay " +
    "(Viterbi re-segmentation -> integer recount by id -> the same " +
    "smoothed lattice), shifts counts where Viterbi disagrees with " +
    "MaxMatch, and the round cap fails loud") {
    val docs = Seq((1L, "hug hug pug"), (2L, "hug pug hugs"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.VocabBuild(topWords = 2).transform(docs)
    val s0 = Tokenize.UnigramScores(vocab).transform(docs)
    val s1 = Tokenize.UnigramScores(vocab, emRounds = 1).transform(docs)
    // independent replay of the one EM round
    val enc = Tokenize.UnigramEncode(s0).transform(docs)
    val cnt = enc.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("bpe_ids")).as("id"))
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    val total = enc.agg(org.apache.spark.sql.functions.sum(
      "n_bpe_tokens")).collect()(0).getLong(0)
    val v = vocab.count()
    val got1 = s1.as[(String, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    vocab.select("piece", "id").as[(String, Long)].collect()
      .foreach { case (piece, id) =>
        val expected = math.round(math.log(
          (cnt.getOrElse(id, 0L) + 1).toDouble / (total + v)) * 1e6)
        assert(got1(id) == expected, s"piece `$piece` id $id")
      }
    // the fit params survive the EM rounds
    assert(graft.util.SparkUtil.fitParamStr(s1, "piece", "lowercase")
      .contains("true"))
    val e = intercept[IllegalArgumentException](
      Tokenize.UnigramScores(vocab, emRounds = 99))
    assert(e.getMessage.contains("maxEmRounds"), e.getMessage)
  }

  test("vocabulary pruning (Kudo §3.2): one round drops exactly the " +
    "lowest-Viterbi-count removable pieces (count asc, id desc; " +
    "single-codepoint pieces protected), rescores with T'/V' — " +
    "equals the independent replay; multi-round reaches the target; " +
    "a target below the alphabet fails loud") {
    val docs = Seq((1L, "hug hug pug"), (2L, "hug pug hugs"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.VocabBuild(topWords = 2).transform(docs)
    val vrows = vocab.select("piece", "id").as[(String, Long)].collect()
    def isProtected(p: String): Boolean = {
      val core = if (p.startsWith("##")) p.substring(2) else p
      core.codePointCount(0, core.length) == 1
    }
    val removable = vrows.filterNot { case (p, _) => isProtected(p) }
    assert(removable.nonEmpty)
    val dropN = math.max(1, removable.length / 5)
    val target = vrows.length - dropN
    // independent replay: counts under the round-0 Viterbi
    // segmentation, the (cnt asc, id desc) drop pick, the rescore
    val s0 = Tokenize.UnigramScores(vocab).transform(docs)
    val enc = Tokenize.UnigramEncode(s0).transform(docs)
    val cnt = enc.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("bpe_ids")).as("id"))
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    val dropIds = removable
      .sortBy { case (_, id) => (cnt.getOrElse(id, 0L), -id) }
      .take(dropN).map(_._2).toSet
    val kept = vrows.filterNot { case (_, id) => dropIds(id) }
    val keptTotal = kept.map { case (_, id) => cnt.getOrElse(id, 0L) }.sum
    val got = Tokenize.UnigramScores(vocab, pruneTo = Some(target))
      .transform(docs).as[(String, Long, Long)].collect()
    assert(got.length == target)
    assert(got.map(_._2).toSet == kept.map(_._2).toSet)
    got.foreach { case (piece, id, score) =>
      val expected = math.round(math.log(
        (cnt.getOrElse(id, 0L) + 1).toDouble /
          (keptTotal + kept.length)) * 1e6)
      assert(score == expected, s"piece `$piece` id $id")
    }
    // every protected piece survived
    vrows.filter { case (p, _) => isProtected(p) }.foreach {
      case (_, id) => assert(got.exists(_._2 == id)) }
    // multi-round: prune all the way down to the protected alphabet
    val alphabet = vrows.length - removable.length
    val floor = Tokenize.UnigramScores(vocab, pruneTo = Some(alphabet))
      .transform(docs)
    assert(floor.count() == alphabet.toLong)
    // a target below the alphabet fails loud once nothing removable
    // remains (or the round cap trips first — both are fail-loud)
    val e = intercept[IllegalArgumentException](
      Tokenize.UnigramScores(vocab, pruneTo = Some(1)).transform(docs))
    assert(e.getMessage.contains("protected alphabet") ||
      e.getMessage.contains("maxEmRounds"), e.getMessage)
    // the pruned artifact still encodes (coverage held) and the fit
    // params survive
    assert(Tokenize.UnigramEncode(floor).transform(docs)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens"))
      .collect()(0).getLong(0) > 0L)
    assert(graft.util.SparkUtil.fitParamStr(floor, "piece", "lowercase")
      .contains("true"))
  }

  test("byte-level unigram encode is TOTAL (unseen chars, emoji) " +
    "and roundtrips exactly") {
    val fit = Seq((1L, "hug hug pug"), (2L, "hug pug hugs"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.BpeLearn(nMerges = 6, byteLevel = true,
      baseAlphabet = Tokenize.byteAlphabet).transform(fit)
    val scores = Tokenize.UnigramScores(vocab, byteLevel = true)
      .transform(fit)
    val alien = Seq((1L, "hüg 🚀🚀 pug\tzzz")).toDF("doc_id", "text")
    val enc = Tokenize.UnigramEncode(scores, byteLevel = true)
      .transform(alien)
    assert(encIds(enc)(1L).nonEmpty)
    val dec = Tokenize.BpeDecode(scores, byteLevel = true).transform(enc)
      .select("text").as[String].collect().head
    assert(dec == "hüg 🚀🚀 pug zzz")
  }

  test("emitPieces: the emitted pieces are exactly the DP's chosen " +
    "vocab rows, they reassemble the canonical text, and they drive " +
    "ChunkSplit's external-token path") {
    val docs = Seq((1L, "hug hug pug"), (2L, "hug pug hugs"))
      .toDF("doc_id", "text")
    val scores = Tokenize.UnigramScores(
      Tokenize.VocabBuild(topWords = 2).transform(docs)).transform(docs)
    val enc = Tokenize.UnigramEncode(scores, emitPieces = true)
      .transform(docs)
    val got = enc.select("doc_id", "bpe_ids", "bpe_pieces")
      .as[(Long, Seq[Long], Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val byId = scores.select("id", "piece").as[(Long, String)]
      .collect().toMap
    got.foreach { case (_, (ids, pcs)) =>
      assert(ids.map(byId) == pcs) // pieces ARE the chosen vocab rows
    }
    def reassemble(pcs: Seq[String]): String = {
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      pcs.foreach { p =>
        if (p.startsWith("##")) words(words.length - 1) += p.drop(2)
        else words += p
      }
      words.mkString(" ")
    }
    assert(reassemble(got(1L)._2) == "hug hug pug")
    val chunks = ChunkSplit(chunkTokens = 2, overlapTokens = 0,
        tokenArrayColumn = "bpe_pieces")
      .transform(enc)
    assert(chunks.count() > 0)
  }

  test("fail loud: a missing character raises naming the word (or " +
    "UNKs the WHOLE word with unkId); a null score and a missing " +
    "score column raise at build; fit-param drift raises") {
    val docs = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val vocab = Tokenize.VocabBuild(topWords = 2).transform(docs)
    val scores = Tokenize.UnigramScores(vocab).transform(docs)
    val alien = Seq((1L, "ab xq")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Tokenize.UnigramEncode(scores).transform(alien).collect()
    }
    assert(e.getMessage.contains("xq"), e.getMessage)
    val got = encIds(Tokenize.UnigramEncode(scores, unkId = Some(-1L))
      .transform(alien))
    assert(got(1L).length == 2 && got(1L).last == -1L)
    val e2 = intercept[IllegalArgumentException] {
      Tokenize.UnigramEncode(scores.drop("score")).transform(docs)
    }
    assert(e2.getMessage.toLowerCase.contains("score"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Tokenize.UnigramEncode(scores.withColumn("score",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("id") === 1L,
          org.apache.spark.sql.functions.lit(null).cast("long"))
          .otherwise(org.apache.spark.sql.functions.col("score"))))
        .transform(docs)
    }
    assert(e3.getMessage.contains("null score") ||
      e3.getMessage.contains("null"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Tokenize.UnigramEncode(scores, lowercase = false).transform(docs)
    }
    assert(e4.getMessage.contains("lowercase"), e4.getMessage)
  }
}
