package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.SparkUtil

/** Hand-computed merge-round goldens + a naive-reference property sweep
  * for [[Tokenize.BpeLearn]] — the DuckDB oracle replays the merge
  * rounds at corpus scale (`bpe_learn`); these pin the algorithm
  * (deterministic argmax, greedy left-to-right apply, the
  * prefix-hazard filter, early stop) on explicit examples and against
  * an independent in-memory reimplementation over random corpora
  * (the interval family's NaiveIterator convention).
  */
class BpeLearnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def learn(nMerges: Int, texts: String*): Seq[(String, Long, Long)] =
    Tokenize.BpeLearn(nMerges = nMerges)
      .transform(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .orderBy("id")
      .as[(String, Long, Long)].collect().toSeq

  test("golden: hug/pug/hugs — four hand-computed merges, then the " +
    "pair supply runs dry and learning stops early") {
    // words: hug x3, pug x2, hugs x1
    // r1 pairs: (h,##u)=4 (##u,##g)=6 (p,##u)=2 (##g,##s)=1 → ##ug
    // r2: (h,##ug)=4 (p,##ug)=2 (##ug,##s)=1 → hug
    // r3: (p,##ug)=2 (hug,##s)=1 → pug
    // r4: (hug,##s)=1 → hugs;  r5: no pairs → stop
    val got = learn(10, "hug hug pug", "hug pug hugs")
    val expect = Seq(
      ("##g", 1L, 0L), ("##s", 2L, 0L), ("##u", 3L, 0L),
      ("##ug", 4L, 1L), ("h", 5L, 0L), ("hug", 6L, 2L),
      ("hugs", 7L, 4L), ("p", 8L, 0L), ("pug", 9L, 3L))
    assert(got == expect)
  }

  test("deterministic tie break: equal counts pick the (first, second) " +
    "ascending pair — continuation symbols sort before first-form " +
    "(ASCII '#' < letters)") {
    // ab x2, cd x2: (a,##b)=2 ties (c,##d)=2 → "a" < "c" → ab first
    // pieces asc: ##b ##d a ab c cd → ids 1..6
    val got = learn(2, "ab cd", "ab cd")
    assert(got.filter(_._3 > 0L) ==
      Seq(("ab", 4L, 1L), ("cd", 6L, 2L)))
  }

  test("greedy left-to-right apply: a merged symbol does not re-pair " +
    "within its round (aaa merges once, not twice)") {
    // 'aaa': syms [a, ##a, ##a]; counts (a,##a)=1, (##a,##a)=1 — tie,
    // '##a' < 'a' asc → merge (##a,##a) → ##aa; apply on [a,##a,##a]
    // merges exactly ONE trailing pair → [a, ##aa]
    val got = learn(1, "aaa")
    assert(got == Seq(
      ("##a", 1L, 0L), ("##aa", 2L, 1L), ("a", 3L, 0L)))
  }

  test("prefix-hazard filter: a merge whose FIRST-FORM result would " +
    "start with the continuation prefix is never selected (markdown " +
    "'##'-headed words stay encodable through their base symbols)") {
    // word '##x': syms [#, ###, ##x]
    // r1 candidates: (#,###) → merged '##' = bare prefix, HAZARD,
    // excluded; (###,##x) → '###x' (continuation, fine) → selected
    // r2: (#,###x) → merged '##x' starts with prefix, HAZARD → stop
    val got = learn(5, "##x")
    assert(got == Seq(
      ("#", 1L, 0L), ("###", 2L, 0L), ("###x", 3L, 1L), ("##x", 4L, 0L)))
    // and the learned vocab really encodes the hazard word — the base
    // symbols plus the one sanctioned merge cover it with no UNK:
    // '##x' → [#, ###x] (first-form '#', then continuation '#x')
    val enc = Tokenize.BpeEncode(
        Tokenize.BpeLearn(nMerges = 5).transform(
          Seq((1L, "##x")).toDF("doc_id", "text")).drop("merge_rank"))
      .transform(Seq((1L, "##x")).toDF("doc_id", "text"))
      .as[(Long, Long, Seq[Long])].collect()
    assert(enc.head._2 == 2L)
  }

  test("fail loud: nMerges above maxMerges (the rounds x jobs driver " +
    "barrier cap) is a wiring bug, not a workload") {
    val e = intercept[IllegalArgumentException](
      Tokenize.BpeLearn(nMerges = 5000))
    assert(e.getMessage.contains("maxMerges"))
    // raising the cap explicitly is the sanctioned path
    Tokenize.BpeLearn(nMerges = 5000, maxMerges = 5000)
  }

  test("the learned vocab is self-describing and BpeEncode-compatible: " +
    "fit params recorded, mismatched encode raises, matching encode " +
    "covers the learn corpus with no UNKs") {
    val docs = Seq((1L, "hug hug pug"), (2L, "hug pug hugs"))
      .toDF("doc_id", "text")
    val vocab = Tokenize.BpeLearn(nMerges = 10).transform(docs)
    assert(SparkUtil.fitParamStr(vocab, "piece", "lowercase") ==
      Some("true"))
    assert(SparkUtil.fitParam(vocab, "piece", "nMerges") == Some(10L))
    assert(SparkUtil.fitParam(vocab, "piece", "mergesDone") == Some(4L))
    val e = intercept[IllegalArgumentException](
      Tokenize.BpeEncode(vocab.drop("merge_rank"), lowercase = false)
        .transform(docs))
    assert(e.getMessage.contains("lowercase"))
    // base symbols cover every observed word: no unkId needed
    val enc = Tokenize.BpeEncode(vocab.drop("merge_rank"))
      .transform(docs).as[(Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(enc(1L) == 3L && enc(2L) == 3L) // hug, pug, hugs all 1 piece
  }

  // ---- naive-reference property sweep --------------------------------

  /** Independent in-memory reimplementation: same symbolization, pair
    * counting (overlapping occurrences, word-frequency weighted),
    * hazard filter, (count desc, pair asc) argmax, greedy LTR apply.
    */
  private def naiveBpe(words: Map[String, Long], nMerges: Int)
      : (Seq[String], Seq[(String, Long)]) = {
    val pfx = "##"
    def strip(b: String) = if (b.startsWith(pfx)) b.drop(2) else b
    var syms: Map[String, Vector[String]] = words.map { case (w, _) =>
      w -> (w.take(1) +: w.drop(1).map(c => pfx + c).toVector)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var stop = false
    while (merges.length < nMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- syms; i <- 0 until s.length - 1) {
        val (a, b) = (s(i), s(i + 1))
        val m = a + strip(b)
        if (!(!a.startsWith(pfx) && m.startsWith(pfx)))
          counts((a, b)) = counts.getOrElse((a, b), 0L) + words(w)
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), _) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        val m = a + strip(b)
        merges += m
        syms = syms.map { case (w, s) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          s.foreach { x =>
            if (out.nonEmpty && out.last == a && x == b)
              out(out.length - 1) = m
            else out += x
          }
          w -> out.toVector
        }
      }
    }
    val base = words.keys
      .flatMap(w => w.take(1) +: w.drop(1).map(c => pfx + c).toVector)
      .toSet
    val ranked = (base.toSeq.map(_ -> 0L) ++
      merges.zipWithIndex.map { case (p, i) => p -> (i + 1L) })
      .groupMapReduce(_._1)(_._2)(math.min)
    (merges.toSeq, ranked.toSeq.sortBy(_._1))
  }

  /** Independent naive DEEP-VOCAB batched reference: per round, sort
    * the distinct hazard-filtered pairs by (count desc, pair asc),
    * scan the `batch * 8` window, greedily select up to `batch`
    * non-interacting pairs (no symbol shared with — and no
    * merged-string collision against — an earlier selection), apply
    * them all in ONE left-to-right pass. */
  private def naiveBpeBatched(words: Map[String, Long], nMerges: Int,
                              batch: Int): Seq[String] = {
    val pfx = "##"
    def strip(b: String) = if (b.startsWith(pfx)) b.drop(2) else b
    var syms: Map[String, Vector[String]] = words.map { case (w, _) =>
      w -> (w.take(1) +: w.drop(1).map(c => pfx + c).toVector)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var stop = false
    while (merges.length < nMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- syms; i <- 0 until s.length - 1) {
        val (a, b) = (s(i), s(i + 1))
        val m = a + strip(b)
        if (!(!a.startsWith(pfx) && m.startsWith(pfx)))
          counts((a, b)) = counts.getOrElse((a, b), 0L) + words(w)
      }
      if (counts.isEmpty) stop = true
      else {
        val window = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }
          .take(batch * 8)
        val want = math.min(batch, nMerges - merges.length)
        val used = scala.collection.mutable.HashSet.empty[String]
        val sel = scala.collection.mutable
          .ArrayBuffer.empty[(String, String, String)]
        window.foreach { case ((a, b), _) =>
          val m = a + strip(b)
          if (sel.length < want && !used(a) && !used(b) && !used(m)) {
            sel += ((a, b, m)); used ++= Seq(a, b, m)
          }
        }
        if (sel.isEmpty) stop = true
        else {
          merges ++= sel.map(_._3)
          val bySel = sel.map(p => (p._1, p._2) -> p._3).toMap
          syms = syms.map { case (w, s) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            s.foreach { x =>
              val m = if (out.nonEmpty) bySel.get((out.last, x)) else None
              m match {
                case Some(mm) => out(out.length - 1) = mm
                case None => out += x
              }
            }
            w -> out.toVector
          }
        }
      }
    }
    merges.toSeq
  }

  test("deep-vocab batched learning: golden round — the top " +
    "non-interacting pairs merge together, interacting candidates " +
    "wait for the next round") {
    // hug x3, pug x2, hugs x1 — round-1 sorted pairs: (##u,##g)=6,
    // (h,##u)=4, (p,##u)=2, (##g,##s)=1. Select ##ug; (h,##u) shares
    // ##u -> skip; (p,##u) shares -> skip; (##g,##s) shares ##g ->
    // skip. Round 1 = [##ug] alone (everything interacts), THEN the
    // sequential continuation — batched == sequential here because
    // each round's survivors all interact
    val gotB = learn2(10, 4, "hug hug pug", "hug pug hugs")
    val gotS = learn(10, "hug hug pug", "hug pug hugs")
    assert(gotB == gotS)
    // a corpus where batching genuinely packs a round: ab x2, cd x2
    // — both pairs non-interacting, merge in ONE round, ranks 1 and 2
    // in sorted order
    val got = learn2(2, 4, "ab cd", "ab cd")
    assert(got.filter(_._3 > 0L) ==
      Seq(("ab", 4L, 1L), ("cd", 6L, 2L)))
  }

  private def learn2(nMerges: Int, batch: Int, texts: String*)
      : Seq[(String, Long, Long)] =
    Tokenize.BpeLearn(nMerges = nMerges, batchMerges = batch)
      .transform(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .orderBy("id")
      .as[(String, Long, Long)].collect().toSeq

  test("property: 25 random corpora — batched learning agrees with " +
    "the independent naive batched reference merge for merge") {
    val rnd = new scala.util.Random(20260817L)
    val alphabet = "abcde"
    (1 to 25).foreach { trial =>
      val nWords = 2 + rnd.nextInt(10)
      val ws = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      }
      val reps = ws.map(w => w -> (1 + rnd.nextInt(4)))
      val text = rnd.shuffle(
        reps.flatMap { case (w, k) => Seq.fill(k)(w) }).mkString(" ")
      val nMerges = 2 + rnd.nextInt(10)
      val batch = 2 + rnd.nextInt(3)
      val got = learn2(nMerges, batch, text)
      val wordFreq = reps.groupMapReduce(_._1)(_._2.toLong)(_ + _)
      val expMerges = naiveBpeBatched(wordFreq, nMerges, batch)
      val gotMerges = got.filter(_._3 > 0L).sortBy(_._3).map(_._1)
      assert(gotMerges == expMerges,
        s"trial $trial text=`$text` nMerges=$nMerges batch=$batch")
    }
  }

  test("deep-vocab rounds cap: nMerges=5000 passes at batchMerges=128 " +
    "(40 rounds) where the sequential form raises") {
    Tokenize.BpeLearn(nMerges = 5000, batchMerges = 128)
    val e = intercept[IllegalArgumentException](
      Tokenize.BpeLearn(nMerges = 5000))
    assert(e.getMessage.contains("maxMerges"))
  }

  test("local fast path == distributed rounds: identical " +
    "(piece, id, merge_rank) tables on random corpora, sequential " +
    "and batched, char and byte level (r17 optimization equivalence)") {
    val rnd = new scala.util.Random(20260817L)
    val alphabet = "abcdef"
    def table(nMerges: Int, batch: Int, byteLvl: Boolean, limit: Int,
              text: String): Seq[(String, Long, Long)] =
      Tokenize.BpeLearn(nMerges = nMerges, batchMerges = batch,
          byteLevel = byteLvl,
          baseAlphabet = if (byteLvl) Tokenize.byteAlphabet else Nil,
          localWordLimit = limit)
        .transform(Seq((1L, text)).toDF("doc_id", "text"))
        .orderBy("id").as[(String, Long, Long)].collect().toSeq
    (1 to 8).foreach { trial =>
      val nWords = 2 + rnd.nextInt(8)
      val text = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      }.mkString(" ")
      val nMerges = 1 + rnd.nextInt(8)
      val batch = if (trial % 2 == 0) 1 else 2 + rnd.nextInt(3)
      val byteLvl = trial % 3 == 0
      val local = table(nMerges, batch, byteLvl, 1 << 16, text)
      val dist = table(nMerges, batch, byteLvl, 0, text)
      assert(local == dist,
        s"trial $trial text=`$text` nMerges=$nMerges batch=$batch " +
          s"byteLevel=$byteLvl")
    }
    // non-ASCII coverage: the UTF-8-order tie-break and codepoint
    // symbolization must hold on multi-byte and astral chars too
    val uniText = "héé héé 🚀a 🚀a 日本 日本 zz"
    assert(table(4, 1, false, 1 << 16, uniText) ==
      table(4, 1, false, 0, uniText))
    assert(table(4, 2, false, 1 << 16, uniText) ==
      table(4, 2, false, 0, uniText))
  }

  test("localWordLimit fallback: a word table over the limit takes the " +
    "distributed rounds and still matches the local result") {
    val text = "hug hug pug hugs"
    val lo = Tokenize.BpeLearn(nMerges = 4, localWordLimit = 2) // 3 words > 2
      .transform(Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy("id").as[(String, Long, Long)].collect().toSeq
    val hi = Tokenize.BpeLearn(nMerges = 4)
      .transform(Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy("id").as[(String, Long, Long)].collect().toSeq
    assert(lo == hi)
  }

  test("property: 40 random corpora agree with the independent naive " +
    "reference on every merge and every (piece, merge_rank)") {
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "abcde"
    (1 to 40).foreach { trial =>
      val nWords = 1 + rnd.nextInt(8)
      val ws = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      }
      val reps = ws.map(w => w -> (1 + rnd.nextInt(4)))
      val text = rnd.shuffle(
        reps.flatMap { case (w, k) => Seq.fill(k)(w) }).mkString(" ")
      val nMerges = 1 + rnd.nextInt(8)
      val got = learn(nMerges, text)
      val wordFreq = reps.groupMapReduce(_._1)(_._2.toLong)(_ + _)
      val (_, expVocab) = naiveBpe(wordFreq, nMerges)
      val gotPieces = got.map(r => (r._1, r._3))
      assert(gotPieces == expVocab,
        s"trial $trial text=`$text` nMerges=$nMerges")
      // ids are the piece rank
      assert(got.map(_._2) == (1L to got.length.toLong))
    }
  }
}
