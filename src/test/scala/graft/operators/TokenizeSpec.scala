package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed greedy longest-match (WordPiece MaxMatch) goldens for
  * [[Tokenize.BpeEncode]] — the DuckDB oracle pins the corpus-scale
  * replay (`bpe_encode`); these pin the algorithm and the guards on
  * explicit examples.
  */
class TokenizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // vocab: hello=7 hel=1 ##lo=2 h=3 ##e=4 ##l=5 ##o=6 x=8
  private def vocab = Seq(
    ("hello", 7L), ("hel", 1L), ("##lo", 2L), ("h", 3L),
    ("##e", 4L), ("##l", 5L), ("##o", 6L), ("x", 8L))
    .toDF("piece", "id")

  private def encode(unk: Option[Long], texts: (Long, String)*): Map[Long, (Long, Seq[Long])] =
    Tokenize.BpeEncode(vocab, unkId = unk)
      .transform(texts.toDF("doc_id", "text"))
      .as[(Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("greedy longest-match: whole words, splits, multi-word docs, " +
    "case folding, null text") {
    val got = encode(None,
      1L -> "hello",          // whole-word piece wins over hel+##lo
      2L -> "hell",           // hel + ##l
      3L -> "helloo",         // hello + ##o (longest FIRST, then cont)
      4L -> "hello hell x",   // words concatenate in order
      5L -> "HELLO",          // lowercase=true folds before matching
      6L -> "  hello   x ",   // whitespace runs and edges drop
      7L -> null)             // null text = empty encode, row kept
    assert(got(1L) == ((1L, Seq(7L))))
    assert(got(2L) == ((2L, Seq(1L, 5L))))
    assert(got(3L) == ((2L, Seq(7L, 6L))))
    assert(got(4L) == ((4L, Seq(7L, 1L, 5L, 8L))))
    assert(got(5L) == ((1L, Seq(7L))))
    assert(got(6L) == ((2L, Seq(7L, 8L))))
    assert(got(7L) == ((0L, Seq.empty[Long])))
  }

  test("un-encodable word: whole-word UNK with unkId (partial tokens " +
    "roll back), fail-loud naming doc and word without") {
    // hellq: hel consumed, ##l consumed, then q dead-ends -> the
    // already-emitted [1, 5] must NOT leak around the UNK
    val got = encode(Some(0L), 1L -> "hellq hello")
    assert(got(1L) == ((2L, Seq(0L, 7L))))
    val e = intercept[Exception](encode(None, 42L -> "hellq"))
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("42") && msg.contains("hellq"))
  }

  test("emitPieces: the matched piece strings come back verbatim " +
    "(continuation prefix kept), UNK emits unkPiece, rollback trims " +
    "pieces in lockstep with ids") {
    val got = Tokenize.BpeEncode(vocab, unkId = Some(0L),
        emitPieces = true)
      .transform(Seq((1L, "hello hell hellq x")).toDF("doc_id", "text"))
      .as[(Long, Long, Seq[Long], Seq[String])].collect().head
    assert(got == ((1L, 5L, Seq(7L, 1L, 5L, 0L, 8L),
      Seq("hello", "hel", "##l", "<unk>", "x"))))
    // the pieces column is exactly what ChunkSplit's external-token
    // path consumes — the end-to-end composition chunk_bpe rides this
    val enc = Tokenize.BpeEncode(vocab, emitPieces = true)
      .transform(Seq((1L, "hello hell x")).toDF("doc_id", "text"))
    val chunks = ChunkSplit(chunkTokens = 3, overlapTokens = 1,
        tokenArrayColumn = "bpe_pieces")
      .transform(enc)
      .select("chunk_idx", "chunk_text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(chunks == Seq((0L, "hello hel ##l"), (1L, "##l x")))
  }

  test("vocab guards: duplicate piece, empty piece, bare continuation " +
    "prefix, null id, oversized vocab, missing columns") {
    def enc(v: org.apache.spark.sql.DataFrame,
            maxVocab: Int = 1 << 22): Unit =
      Tokenize.BpeEncode(v, maxVocab = maxVocab)
        .transform(Seq((1L, "x")).toDF("doc_id", "text")).collect()
    assertThrows[IllegalArgumentException](
      enc(Seq(("x", 1L), ("x", 2L)).toDF("piece", "id")))
    assertThrows[IllegalArgumentException](
      enc(Seq(("", 1L)).toDF("piece", "id")))
    assertThrows[IllegalArgumentException](
      enc(Seq(("##", 1L), ("x", 2L)).toDF("piece", "id")))
    assertThrows[IllegalArgumentException](
      enc(Seq(("x", "1")).toDF("piece", "id")
        .withColumn("id", org.apache.spark.sql.functions.lit(null))))
    assertThrows[IllegalArgumentException](
      enc(Seq(("x", 1L), ("y", 2L), ("z", 3L)).toDF("piece", "id"),
        maxVocab = 2))
    assertThrows[Exception](
      enc(Seq(("x", 1L)).toDF("notpiece", "id")))
    // id integrity (review finding): duplicate ids conflate tokens;
    // an unkId shadowing a real id makes OOV indistinguishable from it
    assertThrows[IllegalArgumentException](
      enc(Seq(("x", 8L), ("y", 8L)).toDF("piece", "id")))
    assertThrows[IllegalArgumentException](
      Tokenize.BpeEncode(Seq(("x", 8L)).toDF("piece", "id"),
        unkId = Some(8L))
        .transform(Seq((1L, "x")).toDF("doc_id", "text")).collect())
    // the incremental-family empty-structural-input contract
    assertThrows[IllegalArgumentException](
      enc(Seq.empty[(String, Long)].toDF("piece", "id")))
    // VocabBuild over an all-null/empty corpus yields the empty vocab
    // that guard refuses downstream
    assert(Tokenize.VocabBuild().transform(
      Seq((1L, null: String), (2L, "  ")).toDF("doc_id", "text"))
      .count() == 0L)
    // a piece CONTAINING # mid-string is a normal first-form piece
    val ok = Tokenize.BpeEncode(Seq(("a#b", 5L)).toDF("piece", "id"))
      .transform(Seq((1L, "a#b")).toDF("doc_id", "text"))
      .as[(Long, Long, Seq[Long])].collect().head
    assert(ok == ((1L, 1L, Seq(5L))))
  }

  test("VocabBuild: deterministic derivation — top words by (freq desc, " +
    "word asc), char coverage in BOTH forms, suffix pieces, ids = rank " +
    "of piece; the built vocab always encodes its own corpus") {
    val docs = Seq(
      (1L, "aa bb aa cc"),
      (2L, "aa bb ddddd"),
      (3L, "AA ddddd eeddd")).toDF("doc_id", "text")
    val v = Tokenize.VocabBuild(topWords = 2, suffixLen = 3,
        topSuffixes = 1).transform(docs)
      .as[(String, Long)].collect().sortBy(_._2).toSeq
    // words: aa(4: two in doc1 + doc2 + case-folded doc3) bb(2) cc(1)
    // ddddd(2) eeddd(1) -> top-2 = aa, bb (bb beats ddddd on the
    // (freq desc, word asc) tie-break)
    // chars: a b c d e both forms; suffixes (len>=5): ddd(3 incl eeddd)
    val pieces = v.map(_._1)
    assert(pieces.toSet == Set("aa", "bb",
      "a", "b", "c", "d", "e", "##a", "##b", "##c", "##d", "##e",
      "##ddd"))
    // ids are the rank of the piece string
    assert(v == v.sortBy(_._1).zipWithIndex.map {
      case ((p, _), i) => (p, i + 1L) })
    // coverage property: the built vocab encodes its own corpus with
    // zero dead-ends (char completeness in both forms)
    val enc = Tokenize.BpeEncode(
        Tokenize.VocabBuild().transform(docs)).transform(docs)
      .as[(Long, Long, Seq[Long])].collect()
    assert(enc.length == 3 && enc.forall(_._2 > 0))
    // a corpus word that ITSELF starts with the continuation prefix
    // (markdown headings) is excluded from the top-word leg — it could
    // never be a first-form piece and the bare '##' would raise — but
    // its characters still enter through char coverage, so the
    // learn -> encode chain stays alive on such corpora
    val md = Seq((1L, "## ## ##foo plain")).toDF("doc_id", "text")
    val mdv = Tokenize.VocabBuild(topWords = 3).transform(md)
    val mdPieces = mdv.as[(String, Long)].collect().map(_._1).toSet
    // the bare-prefix word never becomes a piece (it would raise);
    // "##foo" survives only as the legitimate SUFFIX continuation
    // piece (matching "foo" mid-word), never as a whole-word piece —
    // and 'plain' (the only prefix-free word) takes a top slot
    assert(!mdPieces.contains("##"))
    assert(mdPieces.contains("#") && mdPieces.contains("plain"))
    val mdEnc = Tokenize.BpeEncode(mdv).transform(md)
      .as[(Long, Long, Seq[Long])].collect().head
    assert(mdEnc._2 > 0L)
    // guards
    assertThrows[IllegalArgumentException](
      Tokenize.VocabBuild(suffixLen = 0))
    assertThrows[Exception](Tokenize.VocabBuild()
      .transform(Seq((1L, "x")).toDF("doc_id", "nottext")))
  }

  test("plan shape: encode is map-side only — zero exchanges after the " +
    "driver-bounded vocab collect") {
    val df = spark.range(64).selectExpr("id AS doc_id",
      "'hello hell x' AS text")
    val out = Tokenize.BpeEncode(vocab).transform(df)
    val shuffles = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "BpeEncode must not shuffle the corpus")
  }
}
