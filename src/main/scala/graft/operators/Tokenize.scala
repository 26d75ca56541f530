package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Wrangler
import graft.util.SparkUtil

/** Deterministic subword tokenization: greedy longest-match-first
  * ("MaxMatch" — the WordPiece inference algorithm, public knowledge:
  * Wu et al. 2016 §4.1 and the BERT reference WordpieceTokenizer)
  * against a CALLER-PROVIDED vocab table. This makes the engine's
  * external-token-weight family ([[Corpus]]'s `tokenCountColumn`,
  * [[Chunking]]'s `tokenArrayColumn`) self-contained: encode here,
  * feed the ids/counts there — no externally-computed columns needed.
  *
  * The reference (pywrangler) has no tokenizer; this is a
  * beyond-parity operator for the LLM-curation surface.
  *
  * Algorithm (per whitespace-separated word, deterministic):
  * start at the word head and repeatedly consume the LONGEST vocab
  * piece matching at the cursor; position 0 matches plain pieces,
  * later positions match continuation pieces (`##`-prefixed in the
  * vocab, matched WITHOUT the prefix). A word with no match at some
  * cursor becomes ONE `unkId` token (the WordPiece whole-word-UNK
  * convention) — or, with `unkId = None` (the default), FAILS LOUD
  * naming the doc and word, because silently UNK-ing a corpus is the
  * quiet-corruption class this engine raises on everywhere else.
  * Note greedy MaxMatch can dead-end even when a different split
  * exists — that is the documented algorithm (no backtracking), and a
  * vocab containing every single character in both forms (the normal
  * construction) can never dead-end.
  *
  * 100 TB shape: pure map side — the vocab is collected once
  * (driver-bounded by `maxVocab`, fail-loud over it: a subword vocab
  * is 30k–200k pieces, never corpus-scale), broadcast, and compiled
  * into per-partition longest-match tries (single O(len) walk per
  * cursor, no per-probe substring allocation); the text never
  * shuffles. Typed `mapPartitions` is the codec-class justification
  * ([[Multimodal]] precedent): per-word imperative trie walks are not
  * expressible as built-in column functions, and the typed pipeline
  * stays inside DeserializeToObject/MapPartitions/SerializeFromObject
  * rather than cutting the plan at an RDD scan.
  */
object Tokenize {

  /** Byte → visible-char alphabet for BYTE-LEVEL BPE (the convention
    * popularized by GPT-2's published byte-level encoder — public
    * knowledge; implemented here from the rule, not the code):
    * printable bytes keep their own codepoint (33–126, 161–172,
    * 174–255), every other byte maps to 256+k in byte order. Every
    * byte is thus a DISTINCT single-codepoint BMP char (all < U+0144 —
    * one UTF-16 unit, never a surrogate), so arbitrary byte streams
    * become plain strings the existing learn/encode machinery handles
    * unchanged, and a vocab seeded with all 256 single-byte symbols
    * can never dead-end: byte-level encode is TOTAL (no UNK, ever).
    */
  private[operators] val byteChar: Array[Char] = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var next = 256
    (0 until 256).foreach { b =>
      if (printable(b)) arr(b) = b.toChar
      else { arr(b) = next.toChar; next += 1 }
    }
    arr
  }

  /** The 256 mapped byte symbols — pass as [[BpeLearn]]'s
    * `baseAlphabet` (with `byteLevel = true`) for total, UNK-free
    * byte-level encoding of ANY input text.
    */
  def byteAlphabet: Seq[String] = byteChar.map(_.toString).toSeq

  /** One word's UTF-8 bytes through [[byteChar]] (the per-word hot-path
    * form the trie encode uses). */
  private[operators] def byteMapLocal(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** The same mapping as codegen'd built-ins (hex of the UTF-8 bytes →
    * per-pair table lookup) — what [[BpeLearn]]'s one corpus pass uses,
    * and exactly the formulation the DuckDB oracle replays. */
  private[operators] def byteMapCol(w: Column): Column = {
    val mapLit = array(byteChar.map(c => lit(c.toString)).toSeq: _*)
    val hexs = hex(encode(w, "UTF-8"))
    array_join(
      org.apache.spark.sql.functions.transform(
        sequence(lit(1), (length(hexs) / lit(2)).cast("int")),
        i => element_at(mapLit,
          conv(hexs.substr(i * 2 - 1, lit(2)), 16, 10).cast("int") + 1)),
      "")
  }

  /** Char-keyed longest-match trie. Built PER PARTITION from the
    * broadcast piece arrays (nodes never serialize); `longest` walks
    * once from `pos`, remembering the deepest terminal. Instances are
    * partition-local, so the `lastId` out-param is single-threaded.
    */
  private[graft] final class Trie {
    private final class Node {
      var terminal = false
      var id = 0L
      var children: java.util.HashMap[Char, Node] = _
      def child(c: Char): Node =
        if (children == null) null else children.get(c)
      def ensure(c: Char): Node = {
        if (children == null) children = new java.util.HashMap[Char, Node]()
        var n = children.get(c)
        if (n == null) { n = new Node; children.put(c, n) }
        n
      }
    }
    private val root = new Node
    var lastId = 0L

    def add(piece: String, id: Long): Unit = {
      var n = root
      var i = 0
      while (i < piece.length) { n = n.ensure(piece.charAt(i)); i += 1 }
      n.terminal = true
      n.id = id
    }

    /** Length of the longest piece matching `w` at `pos` (−1 = none);
      * the matched id lands in [[lastId]]. */
    def longest(w: String, pos: Int): Int = {
      var n = root
      var i = pos
      var best = -1
      while (i < w.length) {
        n = n.child(w.charAt(i))
        if (n == null) return best
        i += 1
        if (n.terminal) { best = i - pos; lastId = n.id }
      }
      best
    }

    /** Visit EVERY terminal on the walk from `pos` — the Viterbi DP's
      * candidate generator ([[UnigramEncode]] relaxes one cell per
      * match). One walk per start position, like [[longest]]. */
    def allMatches(w: String, pos: Int, f: (Int, Long) => Unit): Unit = {
      var n = root
      var i = pos
      while (i < w.length) {
        n = n.child(w.charAt(i))
        if (n == null) return
        i += 1
        if (n.terminal) f(i - pos, n.id)
      }
    }
  }

  /** Unsigned byte-wise UTF-8 comparison — Spark's own string order
    * (`UTF8String.compareTo` is binary over the UTF-8 bytes, which is
    * codepoint order; Java's `String.compareTo` is UTF-16-unit order
    * and DISAGREES between astral and high-BMP codepoints). The local
    * merge loop must break count ties exactly as the distributed
    * `orderBy` would. */
  private[operators] def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** The BPE merge loop over a DRIVER-HELD distinct-word frequency
    * table — the bit-identical local mirror of [[BpeLearn]]'s
    * distributed rounds (same overlapping-pair counting weighted by
    * word frequency, same prefix-hazard filter, same
    * (count desc, a asc, b asc) argmax under UTF-8 binary order, same
    * greedy left-to-right apply, same deep-vocab batched
    * non-interacting selection and multi-pair fold, same
    * `maxMerges` runtime round cap). Returns the merge sequence in
    * learned order. BpeLearnSpec pins local == distributed merge for
    * merge on random corpora in both modes.
    */
  private[operators] def localMergeLoop(words: Array[(String, Long)],
                                        nMerges: Int, batchMerges: Int,
                                        prefix: String,
                                        maxMerges: Int): ArrayBuffer[String] = {
    def strip(b: String): String =
      if (b.startsWith(prefix)) b.substring(prefix.length) else b
    // initial symbolization per CODEPOINT (Spark `substr` semantics —
    // see BpeEncodeRanked's identical loop)
    val syms: Array[ArrayBuffer[String]] = words.map { case (w, _) =>
      val buf = new ArrayBuffer[String](w.length)
      var ci = 0
      while (ci < w.length) {
        val cc = Character.charCount(w.codePointAt(ci))
        buf += (if (ci == 0) w.substring(0, cc)
                else prefix + w.substring(ci, ci + cc))
        ci += cc
      }
      buf
    }
    val cnts: Array[Long] = words.map(_._2)
    val merges = new ArrayBuffer[String]
    var done = false
    var rounds = 0
    // (count desc, a asc, b asc) under UTF-8 binary order — the
    // distributed orderBy's total order, verbatim
    val pairOrd = new Ordering[((String, String), Long)] {
      def compare(x: ((String, String), Long),
                  y: ((String, String), Long)): Int = {
        val c = java.lang.Long.compare(y._2, x._2)
        if (c != 0) c
        else {
          val ca = utf8Compare(x._1._1, y._1._1)
          if (ca != 0) ca else utf8Compare(x._1._2, y._1._2)
        }
      }
    }
    while (merges.length < nMerges && !done) {
      rounds += 1
      require(rounds <= maxMerges,
        s"BpeLearn: merge loop exceeded maxMerges=$maxMerges rounds " +
          s"(${merges.length}/$nMerges merges learned) — the " +
          "batched candidate window is selecting far fewer than " +
          s"batchMerges=$batchMerges non-interacting pairs per " +
          "round; raise maxMerges explicitly if this barrier budget " +
          "is intended")
      // adjacent pairs, overlapping occurrences included, weighted by
      // word frequency; hazard filter applied at selection (the
      // distributed path's `selectable`)
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi)
        val c = cnts(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          val prev = counts.get(k)
          counts.put(k, if (prev == null) c else prev + c)
          i += 1
        }
        wi += 1
      }
      val selectable = new ArrayBuffer[((String, String), Long)](counts.size)
      counts.forEach { (k, v) =>
        val merged = k._1 + strip(k._2)
        if (!(!k._1.startsWith(prefix) && merged.startsWith(prefix)))
          selectable += ((k, v.longValue))
      }
      if (selectable.isEmpty) done = true
      else if (batchMerges == 1) {
        // the sequential algorithm: global argmin under pairOrd
        var best = selectable(0)
        var i = 1
        while (i < selectable.length) {
          if (pairOrd.compare(selectable(i), best) < 0) best = selectable(i)
          i += 1
        }
        val (a, b) = best._1
        val merged = a + strip(b)
        merges += merged
        // greedy left-to-right merge, in place per word
        var w2 = 0
        while (w2 < syms.length) {
          val s = syms(w2)
          if (s.length > 1) {
            val out = new ArrayBuffer[String](s.length)
            var j = 0
            while (j < s.length) {
              val x = s(j)
              if (out.nonEmpty && out.last == a && x == b) {
                out.remove(out.length - 1)
                out += merged
              } else out += x
              j += 1
            }
            syms(w2) = out
          }
          w2 += 1
        }
      } else {
        // deep-vocab batched round: bounded sorted candidate window,
        // greedy non-interacting selection, one multi-pair fold
        val want = math.min(batchMerges, nMerges - merges.length)
        val window = batchMerges * 8
        val cands = selectable.sorted(pairOrd).take(window)
        val used = scala.collection.mutable.HashSet.empty[String]
        val sel = new ArrayBuffer[(String, String, String)]
        cands.iterator.takeWhile(_ => sel.length < want)
          .foreach { case ((a, b), _) =>
            val m = a + strip(b)
            if (!used(a) && !used(b) && !used(m)) {
              sel += ((a, b, m))
              used += a; used += b; used += m
            }
          }
        if (sel.isEmpty) done = true
        else {
          merges ++= sel.map(_._3)
          val byPair = sel.map(p => (p._1, p._2) -> p._3).toMap
          var w2 = 0
          while (w2 < syms.length) {
            val s = syms(w2)
            if (s.length > 1) {
              val out = new ArrayBuffer[String](s.length)
              var j = 0
              while (j < s.length) {
                val x = s(j)
                val m = if (out.nonEmpty) byPair.get((out.last, x))
                        else None
                m match {
                  case Some(mm) =>
                    out.remove(out.length - 1)
                    out += mm
                  case None => out += x
                }
                j += 1
              }
              syms(w2) = out
            }
            w2 += 1
          }
        }
      }
    }
    merges
  }

  /** Corpus-derived subword vocab construction — the LEARN leg of the
    * learn → encode → compose chain: the `topWords` most frequent whole
    * words (first-form pieces), every single character of every word in
    * BOTH first and continuation form (the COVERAGE guarantee — greedy
    * MaxMatch over a char-complete vocab can never dead-end), and the
    * `topSuffixes` most frequent `suffixLen`-char word suffixes as
    * continuation pieces. Ties break deterministically by
    * (freq desc, piece asc); ids are the rank of the piece string, so
    * any engine replaying the same derivation numbers identically.
    *
    * Output: `(piece, id)` — exactly [[BpeEncode]]'s vocab contract:
    * words that themselves START with `continuationPrefix` are
    * excluded from the top-word leg (BpeEncode classifies pieces
    * lexically, so such a word could never be a first-form piece —
    * the bare-prefix word would even raise), and their characters
    * still enter through the char-coverage leg.
    *
    * 100 TB shape: ONE corpus pass — the per-word frequency
    * aggregation (map-side partial) — localCheckpointed at
    * distinct-word size, from which all three legs (top words, char
    * coverage, suffix counts as sums of word counts) derive without
    * re-reading text; the single-partition `row_number` window runs
    * over the RESULT vocab (a few hundred to ~100k rows), never the
    * corpus. Suffix derivation only reads words of length >=
    * suffixLen + 2, so a first-position char always remains.
    */
  final case class VocabBuild(textColumn: String = "text",
                              topWords: Int = 10,
                              suffixLen: Int = 3,
                              topSuffixes: Int = 10,
                              continuationPrefix: String = "##",
                              lowercase: Boolean = true)
      extends Wrangler {
    require(topWords >= 0, "topWords must be >= 0")
    require(suffixLen >= 1, "suffixLen must be >= 1")
    require(topSuffixes >= 0, "topSuffixes must be >= 0")
    require(continuationPrefix.nonEmpty,
      "continuationPrefix must be non-empty")
    override def preservesSampleSize: Boolean = false

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(textColumn))
      import org.apache.spark.sql.expressions.Window
      val textExpr = if (lowercase) lower(col(textColumn).cast("string"))
        else col(textColumn).cast("string")
      // ONE corpus pass: everything below derives from the bounded
      // per-word frequency table (distinct words x (word, cnt)) — the
      // localCheckpoint keeps the three derivations from re-scanning
      // the corpus
      val freq = df
        .select(explode(split(textExpr, "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      // a word that ITSELF starts with the continuation prefix cannot
      // be a first-form piece (BpeEncode classifies pieces lexically:
      // anything `##`-prefixed is a continuation piece) — learning it
      // as a whole word would either raise (the bare-prefix word) or
      // silently reclassify; exclude such words from the top-word leg
      val top = freq.filter(!col("word").startsWith(continuationPrefix))
        .orderBy(col("cnt").desc, col("word").asc).limit(topWords)
        .select(col("word").as("piece"))
      val chars = freq
        .select(explode(sequence(lit(1), length(col("word")))).as("i"),
          col("word"))
        .select(expr("substring(word, i, 1)").as("c")).distinct()
      val charPieces = chars.select(col("c").as("piece"))
        .unionByName(chars.select(
          concat(lit(continuationPrefix), col("c")).as("piece")))
      // suffix frequency over word OCCURRENCES = sum of word counts
      val suff = freq
        .filter(length(col("word")) >= suffixLen + 2)
        .select(concat(lit(continuationPrefix),
          expr(s"substring(word, length(word) - ${suffixLen - 1}, " +
            s"$suffixLen)")).as("piece"), col("cnt"))
        .groupBy("piece").agg(sum("cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("piece").asc).limit(topSuffixes)
        .select("piece")
      val vocab = top.unionByName(charPieces).unionByName(suff).distinct()
        .withColumn("id",
          row_number().over(Window.orderBy("piece")).cast("long"))
      // the vocab is a persisted index like any other fit artifact: a
      // consumer configured differently from the learn (lowercase
      // drift, another continuation prefix) silently UNKs or mis-splits
      // — record the fit params in column metadata (survives the
      // parquet footer) so [[BpeEncode]] raises in-data instead
      SparkUtil.withFitParams(
        SparkUtil.withFitParamsStr(vocab, "piece", Map(
          "lowercase" -> lowercase.toString,
          "continuationPrefix" -> continuationPrefix,
          // VocabBuild always learns in char space; recording the
          // byte-level bit keeps a byte-level ENCODE of this vocab
          // fail-loud (the same drift class as lowercase)
          "byteLevel" -> "false")),
        "piece", Map(
          "topWords" -> topWords.toLong,
          "suffixLen" -> suffixLen.toLong,
          "topSuffixes" -> topSuffixes.toLong))
    }
  }

  /** REAL byte-pair-encoding merge learning (Sennrich et al. 2016,
    * "Neural Machine Translation of Rare Words with Subword Units" —
    * public knowledge), in the WordPiece continuation-prefix spelling
    * so the output is directly [[BpeEncode]]-compatible. Where
    * [[VocabBuild]] is a frequency heuristic (top words + char coverage
    * + suffixes), this is the learning algorithm itself:
    *
    *   1. symbolize every distinct word as its character sequence —
    *      position 0 as a first-form symbol, later positions carrying
    *      `continuationPrefix` (`"slow"` → `[s, ##l, ##o, ##w]`);
    *   2. per round, count every ADJACENT symbol pair weighted by word
    *      frequency (overlapping occurrences each count — Sennrich's
    *      `get_stats`), pick the argmax deterministically
    *      (count desc, then (first, second) asc), and merge it
    *      everywhere with a greedy LEFT-TO-RIGHT scan (after `a b → ab`
    *      the merged symbol does not re-pair as `a` within the round);
    *   3. repeat for `nMerges` rounds or until no pair remains.
    *
    * The merged symbol keeps the FIRST symbol's form and strips the
    * second's prefix (`s + ##l → sl`, `##l + ##o → ##lo`). A candidate
    * pair whose merged FIRST-FORM symbol would itself start with
    * `continuationPrefix` (only reachable on corpora with words
    * containing the prefix text, e.g. markdown `## heading`) is
    * excluded from selection — [[BpeEncode]] classifies pieces
    * lexically, so emitting such a piece would reclassify it; the
    * underlying characters keep their base symbols and stay encodable.
    *
    * Output: `(piece, id, merge_rank)` — base symbols at rank 0,
    * merged pieces at their 1-based round number (a piece string
    * reachable by two different merge paths keeps its FIRST rank);
    * `id` = rank of the piece string, the [[VocabBuild]] numbering
    * convention, so any engine replaying the derivation numbers
    * identically. The `piece`/`id` pair is exactly [[BpeEncode]]'s
    * vocab contract, and the fit params (lowercase, prefix, nMerges)
    * ride the `piece` column's metadata.
    *
    * 100 TB shape: ONE corpus pass (the map-side-partial word-frequency
    * aggregation, localCheckpointed at distinct-word size); every merge
    * round then runs over the BOUNDED distinct-word table, never the
    * corpus — one pair-count aggregation (map-side partial, shuffle
    * bounded by the distinct-pair count), a 1-row argmax collect, and a
    * narrow fold-merge map re-checkpointed to keep lineage flat. The
    * driver-barrier shape is `nMerges × 2` bounded jobs — linear in
    * rounds, NOT corpus size — and is capped fail-loud by `maxMerges`
    * because a runaway round count is a wiring bug, not a workload.
    *
    * BYTE-LEVEL mode (`byteLevel = true`): each word's UTF-8 bytes are
    * mapped through the visible byte alphabet ([[byteChar]]) before
    * symbolization, so merges are learned over byte symbols — and with
    * `baseAlphabet = byteAlphabet` every single-byte symbol enters the
    * vocab at rank 0 in both forms, making the learned vocab TOTAL:
    * [[BpeEncode]] (`byteLevel = true`) can then encode ANY text with
    * no UNK, the property char-level vocabs cannot give on unseen
    * characters. The mapping is codegen'd built-ins (hex of the UTF-8
    * bytes → table lookup), replayed verbatim by the SQL oracle.
    *
    * DEEP-VOCAB mode (`batchMerges > 1`): one merge per round makes a
    * production 32k-merge vocab ~64k serial driver jobs (~90 min of
    * pure barrier at the measured ~80 ms/job). Batching selects up to
    * `batchMerges` NON-INTERACTING pairs per round from the top
    * `batchMerges * 8` candidates in the round's (count desc, pair
    * asc) order — greedily skipping any pair that shares a symbol
    * with, or whose merged string collides with, an earlier selection
    * (so one left-to-right pass applies them all without order
    * effects) — cutting the barrier count by ~the batch factor. This
    * is the standard distributed-BPE trade: merges beyond the first
    * in a round are selected on counts that a sequential learner
    * would have refreshed, so deep batched vocabs are an
    * APPROXIMATION of the sequential merge sequence (the bounded
    * candidate window keeps selection deterministic and
    * oracle-replayable); `batchMerges = 1` (the default) is exactly
    * the sequential algorithm, bit-for-bit.
    *
    * LOCAL fast path (`localWordLimit`, r17 optimization): the merge
    * loop's input is the distinct-word frequency table, and on real
    * corpora that table is usually SMALL (every public BPE trainer —
    * Sennrich's reference, sentencepiece, HF tokenizers — runs its
    * merge loop single-node over exactly this table). When the table
    * holds at most `localWordLimit` rows it is collected ONCE
    * (bounded, like every other fit-artifact collect in this engine)
    * and the merge rounds run in driver memory — same counting, same
    * hazard filter, same (count desc, pair asc) argmax under UTF-8
    * binary string order (Spark's own string ordering), same greedy
    * left-to-right apply, same batched non-interacting selection —
    * producing the IDENTICAL merge sequence with ZERO per-round Spark
    * jobs instead of `rounds x 2` driver-barrier jobs
    * (BpeLearnSpec's local-vs-distributed property pins the
    * equivalence; the DuckDB oracle replays the same rounds). A table
    * over the limit falls back to the distributed rounds unchanged —
    * the 100 TB shape is untouched, the threshold only moves WHERE
    * the bounded table's loop runs. `localWordLimit = 0` forces the
    * distributed path.
    */
  final case class BpeLearn(textColumn: String = "text",
                            nMerges: Int = 50,
                            continuationPrefix: String = "##",
                            lowercase: Boolean = true,
                            maxMerges: Int = 4096,
                            byteLevel: Boolean = false,
                            baseAlphabet: Seq[String] = Nil,
                            batchMerges: Int = 1,
                            localWordLimit: Int = 1 << 16)
      extends Wrangler {
    require(localWordLimit >= 0, "localWordLimit must be >= 0")
    require(nMerges >= 0, "nMerges must be >= 0")
    require(batchMerges >= 1, "batchMerges must be >= 1")
    require(continuationPrefix.nonEmpty,
      "continuationPrefix must be non-empty")
    require((nMerges + batchMerges - 1) / math.max(batchMerges, 1)
        <= maxMerges,
      s"BpeLearn: nMerges=$nMerges at batchMerges=$batchMerges is " +
        s"${(nMerges + batchMerges - 1) / math.max(batchMerges, 1)} " +
        s"rounds, over maxMerges=$maxMerges — every merge round is a " +
        "driver-coordinated pass over the distinct-word table (rounds " +
        "x 2 jobs); raise batchMerges (the deep-vocab regime) or " +
        "maxMerges explicitly if a vocab this deep is intended")
    baseAlphabet.foreach { c =>
      require(c != null && c.nonEmpty,
        "BpeLearn: baseAlphabet contains a null/empty symbol")
      require(!c.startsWith(continuationPrefix),
        s"BpeLearn: baseAlphabet symbol `$c` starts with the " +
          "continuation prefix — it would be lexically reclassified")
    }
    override def preservesSampleSize: Boolean = false

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(textColumn))
      import org.apache.spark.sql.expressions.Window
      val spark0 = df.sparkSession
      import spark0.implicits._
      val prefix = continuationPrefix
      val textExpr = if (lowercase) lower(col(textColumn).cast("string"))
        else col(textColumn).cast("string")
      // ONE corpus pass — everything after runs on the bounded
      // distinct-word frequency table. Byte-level mode maps each word's
      // UTF-8 bytes to the visible byte alphabet HERE (codegen'd
      // built-ins, replayed verbatim by the oracle), so the merge
      // machinery below is untouched — it just learns over byte symbols
      val wordCol =
        if (byteLevel) byteMapCol(col("word0")) else col("word0")
      val freq = df
        .select(explode(split(textExpr, "\\s+")).as("word0"))
        .filter(col("word0") =!= "")
        .select(wordCol.as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      // initial symbolization: char 0 first-form, the rest continuation
      // (`functions.transform` qualified — the wrangler's own
      // `transform` shadows the import here)
      val initSyms = org.apache.spark.sql.functions.transform(
        sequence(lit(1), length(col("word"))),
        i => {
          val c = col("word").substr(i, lit(1))
          when(i === 1, c).otherwise(concat(lit(prefix), c))
        })
      // base symbols derive from the INITIAL symbolization (rank 0) —
      // one cheap narrow map over the checkpointed freq table,
      // identical under either merge-loop path below — plus the
      // caller's baseAlphabet in BOTH forms (with the full byte
      // alphabet under byteLevel, the learned vocab can encode ANY
      // input: the no-UNK totality guarantee)
      val base0 = freq.select(explode(initSyms).as("piece"))
      val baseAll = if (baseAlphabet.isEmpty) base0
        else base0.unionByName(
          baseAlphabet.flatMap(c => Seq(c, prefix + c)).toDF("piece"))
      val base = baseAll.distinct().withColumn("merge_rank", lit(0L))

      def stripPrefix(b: Column): Column =
        when(b.startsWith(prefix),
          b.substr(lit(prefix.length + 1), length(b))).otherwise(b)

      // LOCAL fast path (see scaladoc): a distinct-word table within
      // `localWordLimit` collects once and the merge rounds run in
      // driver memory — the identical merge sequence with zero
      // per-round Spark jobs. Over the limit (or limit 0): the
      // distributed rounds below, unchanged.
      val localWords: Option[Array[(String, Long)]] =
        if (localWordLimit <= 0 || nMerges == 0) None
        else {
          val r = freq.select(col("word").cast("string"), col("cnt"))
            .limit(localWordLimit + 1).as[(String, Long)].collect()
          if (r.length <= localWordLimit) Some(r) else None
        }

      val merges = scala.collection.mutable.ArrayBuffer.empty[String]
      if (localWords.isDefined) {
        merges ++= localMergeLoop(localWords.get, nMerges, batchMerges,
          prefix, maxMerges)
      } else {
      var cur = freq.select(col("word"), col("cnt"),
        initSyms.as("syms")).localCheckpoint()
      var done = false
      var rounds = 0
      while (merges.length < nMerges && !done) {
        // runtime cap matching the constructor's planned-rounds guard:
        // an interaction-heavy candidate window can select ONE merge
        // per batched round, drifting far past the documented
        // rounds-x-2-jobs driver-barrier envelope — fail loud instead
        rounds += 1
        require(rounds <= maxMerges,
          s"BpeLearn: merge loop exceeded maxMerges=$maxMerges rounds " +
            s"(${merges.length}/$nMerges merges learned) — the " +
            "batched candidate window is selecting far fewer than " +
            s"batchMerges=$batchMerges non-interacting pairs per " +
            "round; raise maxMerges explicitly if this barrier budget " +
            "is intended")
        // adjacent pairs, overlapping occurrences included, weighted by
        // word frequency (map-side partial agg; shuffle bounded by the
        // distinct-pair count)
        val pairs = cur
          .select(col("cnt"), explode(expr(
            "transform(slice(syms, 1, size(syms) - 1), (s, i) -> " +
              "named_struct('a', s, 'b', element_at(syms, i + 2)))"))
            .as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"), col("cnt"))
          .groupBy("a", "b").agg(sum("cnt").as("c"))
        val mergedCol = concat(col("a"), stripPrefix(col("b")))
        val selectable = pairs.filter(
          !(!col("a").startsWith(prefix) && mergedCol.startsWith(prefix)))
        if (batchMerges == 1) {
          // the sequential algorithm, bit-for-bit
          val best = selectable
            .orderBy(col("c").desc, col("a").asc, col("b").asc)
            .limit(1).collect()
          if (best.isEmpty) done = true
          else {
            val (a, b) = (best(0).getString(0), best(0).getString(1))
            val merged = a + (if (b.startsWith(prefix))
              b.substring(prefix.length) else b)
            merges += merged
            // greedy left-to-right merge: fold the symbol list,
            // replacing a trailing `a` when `b` follows; the merged
            // symbol is strictly longer than `a`, so it never re-pairs
            // in-round
            val (aL, bL, mL) = (lit(a), lit(b), lit(merged))
            val newSyms = org.apache.spark.sql.functions.aggregate(
              col("syms"), array().cast("array<string>"),
              (acc, x) => when(size(acc) > 0 &&
                  element_at(acc, -1) === aL && x === bL,
                concat(slice(acc, lit(1), size(acc) - 1), array(mL)))
                .otherwise(concat(acc, array(x))))
            // re-checkpoint: each round's symbols feed the next round's
            // aggregation — without the cut, round N replays N narrow
            // maps per pass (O(rounds^2) recompute)
            cur = cur.withColumn("syms", newSyms).localCheckpoint()
          }
        } else {
          // the DEEP-VOCAB batched round: bounded candidate window
          // (deterministic — the order is total, so the prefix is),
          // greedy non-interacting selection, one multi-pair fold
          val want = math.min(batchMerges, nMerges - merges.length)
          val window = batchMerges * 8
          val cands = selectable
            .orderBy(col("c").desc, col("a").asc, col("b").asc)
            .limit(window)
            .select("a", "b").as[(String, String)].collect()
          val used = scala.collection.mutable.HashSet.empty[String]
          val sel = scala.collection.mutable
            .ArrayBuffer.empty[(String, String, String)]
          cands.iterator.takeWhile(_ => sel.length < want)
            .foreach { case (a, b) =>
              val m = a + (if (b.startsWith(prefix))
                b.substring(prefix.length) else b)
              // non-interaction: no shared symbol with an earlier
              // selection, and no merged-string collision — one
              // left-to-right pass then applies all selected pairs
              // with no order effects
              if (!used(a) && !used(b) && !used(m)) {
                sel += ((a, b, m))
                used += a; used += b; used += m
              }
            }
          if (sel.isEmpty) done = true
          else {
            merges ++= sel.map(_._3)
            // pair-keyed lookup: length-prefixed key (codepoint count
            // — what both engines' length functions return) makes the
            // (left, right) boundary unambiguous for any symbol text
            def keyOf(a: String, b: String): String =
              s"${a.codePointCount(0, a.length)}:$a$b"
            val mapLit = map(sel.toSeq.flatMap { case (a, b, m) =>
              Seq(lit(keyOf(a, b)), lit(m)) }: _*)
            val newSyms = org.apache.spark.sql.functions.aggregate(
              col("syms"), array().cast("array<string>"),
              (acc, x) => {
                val last = element_at(acc, -1)
                val m = element_at(mapLit,
                  concat(length(last).cast("string"), lit(":"), last, x))
                when(size(acc) > 0 && m.isNotNull,
                  concat(slice(acc, lit(1), size(acc) - 1), array(m)))
                  .otherwise(concat(acc, array(x)))
              })
            cur = cur.withColumn("syms", newSyms).localCheckpoint()
          }
        }
      }
      }

      val mergedDf = merges.toSeq.zipWithIndex
        .map { case (p, i) => (p, i.toLong + 1L) }
        .toDF("piece", "merge_rank")
      val vocab = base.unionByName(mergedDf)
        .groupBy("piece").agg(min("merge_rank").as("merge_rank"))
        .withColumn("id",
          row_number().over(Window.orderBy("piece")).cast("long"))
        .select("piece", "id", "merge_rank")
      SparkUtil.withFitParams(
        SparkUtil.withFitParamsStr(vocab, "piece", Map(
          "lowercase" -> lowercase.toString,
          "continuationPrefix" -> continuationPrefix,
          "byteLevel" -> byteLevel.toString)),
        "piece", Map("nMerges" -> nMerges.toLong,
          "mergesDone" -> merges.length.toLong,
          "batchMerges" -> batchMerges.toLong))
    }
  }

  /** Typed output row (field order = output schema). */
  private[operators] final case class BpeRow(
      doc_id: Long, n_bpe_tokens: Long, bpe_ids: Array[Long])

  /** Typed decode row. */
  private[operators] final case class BpeDecodeRow(doc_id: Long, text: String)

  /** Decode subword token ids back to text — the inverse of
    * [[BpeEncode]] over its own output: a first-form piece STARTS a
    * word, a continuation piece appends (prefix stripped), words join
    * with a single space; under `byteLevel` each reassembled word
    * unmaps from the visible byte alphabet back to its UTF-8 bytes. On
    * any encode output the round trip is EXACT by construction —
    * `decode(encode(text))` equals the canonical whitespace-normalized
    * (and, with `lowercase` encode, case-folded) text — regardless of
    * vocab or merge depth, because the encode is an exact segmentation
    * of each word. That identity is the `bpe_roundtrip` oracle: DuckDB
    * computes the closed form DIRECTLY from the raw text, no encode
    * replay — the two engines must meet at the same string through
    * completely different paths.
    *
    * Fail-loud contract (the quiet-corruption class): an id not in the
    * vocab (including an encode-side `unkId` — UNK is lossy by
    * definition; decoding it silently would fabricate text) and a
    * CONTINUATION piece at word start (ids no encode could emit) both
    * raise naming the doc and id. Null id arrays decode to the empty
    * string (the null-text row convention).
    *
    * 100 TB shape: identical to the encode — vocab collected once
    * (bounded, fail-loud), broadcast; pure map-side typed pass; no
    * shuffle.
    */
  final case class BpeDecode(vocab: DataFrame,
                             idsColumn: String = "bpe_ids",
                             idColumn: String = "doc_id",
                             pieceColumn: String = "piece",
                             vocabIdColumn: String = "id",
                             continuationPrefix: String = "##",
                             byteLevel: Boolean = false,
                             maxVocab: Int = 1 << 22)
      extends Wrangler {
    require(continuationPrefix.nonEmpty, "continuationPrefix must be non-empty")
    require(maxVocab >= 1, "maxVocab must be positive")
    override def getParams: Seq[(String, Any)] = Seq(
      "idsColumn" -> idsColumn, "idColumn" -> idColumn,
      "pieceColumn" -> pieceColumn, "vocabIdColumn" -> vocabIdColumn,
      "continuationPrefix" -> continuationPrefix,
      "byteLevel" -> byteLevel, "maxVocab" -> maxVocab)
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, idsColumn))
      SparkUtil.validateColumns(vocab, Seq(pieceColumn, vocabIdColumn))
      SparkUtil.requireFitParamStr(vocab, pieceColumn,
        "continuationPrefix", continuationPrefix, "BpeDecode")
      SparkUtil.requireFitParamStr(vocab, pieceColumn, "byteLevel",
        byteLevel.toString, "BpeDecode")
      val spark = df.sparkSession
      import spark.implicits._
      val rows = vocab
        .select(col(vocabIdColumn).cast("long"),
          col(pieceColumn).cast("string"))
        .limit(maxVocab + 1).as[(java.lang.Long, String)].collect()
      require(rows.length <= maxVocab,
        s"BpeDecode: vocab exceeds maxVocab=$maxVocab pieces — a subword " +
          "vocab is bounded; a corpus-scale frame here is a wiring bug")
      require(rows.nonEmpty, "BpeDecode: empty vocab")
      rows.foreach { case (id, p) =>
        require(id != null && p != null && p.nonEmpty,
          "BpeDecode: vocab contains a null id or null/empty piece")
      }
      require(rows.map(_._1).distinct.length == rows.length,
        "BpeDecode: vocab ids must be distinct")
      // inverse byte map (byte-level only): mapped char -> byte
      val charByte: java.util.HashMap[Character, java.lang.Byte] = {
        val m = new java.util.HashMap[Character, java.lang.Byte]()
        if (byteLevel) byteChar.zipWithIndex.foreach { case (c, b) =>
          m.put(c, b.toByte)
        }
        m
      }
      val bcVocab = spark.sparkContext.broadcast(
        rows.map { case (id, p) => (id.longValue, p) })
      val (pfx, bl) = (continuationPrefix, byteLevel)
      val typed = df.select(col(idColumn).cast("long"),
        col(idsColumn).cast("array<long>")).as[(Long, Array[Long])]
      typed.mapPartitions { it =>
        val byId = new java.util.HashMap[java.lang.Long, String]()
        bcVocab.value.foreach { case (id, p) => byId.put(id, p) }
        def unmap(docId: Long, word: String): String = {
          val bytes = new Array[Byte](word.length)
          var i = 0
          while (i < word.length) {
            val b = charByte.get(word.charAt(i))
            if (b == null) throw new IllegalArgumentException(
              s"BpeDecode: doc $docId piece char " +
                s"U+${word.charAt(i).toInt.toHexString} is not in the " +
                "byte alphabet — the vocab was not built byte-level")
            bytes(i) = b
            i += 1
          }
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        }
        it.map { case (docId, ids) =>
          if (ids == null || ids.isEmpty) BpeDecodeRow(docId, "")
          else {
            val sb = new java.lang.StringBuilder(ids.length * 4)
            val word = new java.lang.StringBuilder(32)
            def flush(): Unit = if (word.length() > 0) {
              if (sb.length() > 0) sb.append(' ')
              sb.append(if (bl) unmap(docId, word.toString) else word)
              word.setLength(0)
            }
            var i = 0
            while (i < ids.length) {
              val p = byId.get(ids(i))
              if (p == null) throw new IllegalArgumentException(
                s"BpeDecode: doc $docId token id ${ids(i)} is not in " +
                  "the vocab — an unkId stream is lossy by definition " +
                  "and decoding it would fabricate text")
              if (p.startsWith(pfx)) {
                if (word.length() == 0) throw new IllegalArgumentException(
                  s"BpeDecode: doc $docId token id ${ids(i)} (`$p`) is " +
                    "a continuation piece at word start — no encode " +
                    "emits this; the id stream is corrupt")
                word.append(p, pfx.length, p.length)
              } else {
                flush()
                word.append(p)
              }
              i += 1
            }
            flush()
            BpeDecodeRow(docId, sb.toString)
          }
        }
      }.toDF()
    }
  }

  /** Merge-RANK-ORDER subword inference — real BPE encoding (the GPT-2 /
    * sentencepiece-BPE inference loop, public knowledge: Sennrich et al.
    * 2016 apply merges in learned order; sentencepiece's BPE model
    * selects the best-scoring adjacent pair each step), the inference
    * algorithm that matches what [[BpeLearn]] actually LEARNS — where
    * [[BpeEncode]] is greedy MaxMatch (WordPiece inference), which
    * segments differently on real vocabs (TokenizeRankedSpec exhibits
    * the divergence).
    *
    * Algorithm (per whitespace-separated word, deterministic):
    * symbolize to characters (position 0 first-form, later positions
    * `continuationPrefix`-prefixed — [[BpeLearn]]'s initial state);
    * then repeatedly, among all ADJACENT symbol pairs whose merged
    * string (`first + strip(second)` — the learn's own spelling) is a
    * LEARNED vocab piece (`merge_rank >= 1`; rank-0 base symbols are
    * not merges), pick the piece with the LOWEST merge_rank and merge
    * every adjacent occurrence of it in one greedy left-to-right scan
    * (the learn-side apply fold); stop when no pair merges. Ranks >= 1
    * are unique per piece (one merge per round; a re-reachable string
    * keeps its first rank), so the argmin is total — no tie-break
    * needed beyond the piece identity itself.
    *
    * This is PIECE-driven application (sentencepiece's convention —
    * the artifact stores pieces + ranks, not pairs), and it re-picks
    * the global minimum each step: applying a later merge can create
    * an adjacency for an EARLIER one, which a single rank-ordered
    * sweep would miss.
    *
    * A word whose final symbols are not all vocab pieces (an unseen
    * character under a char-level vocab) becomes ONE `unkId` token, or
    * fails loud with `unkId = None` — [[BpeEncode]]'s whole-word-UNK
    * contract. Under `byteLevel` with a full-byte-alphabet vocab the
    * encode is total (no UNK ever), exactly as for MaxMatch.
    *
    * 100 TB shape: identical to [[BpeEncode]] — the vocab is collected
    * once (bounded fail-loud), broadcast as a rank map + id map; pure
    * map-side typed pass, the text never shuffles. Per-word cost is
    * O(len^2) map probes (len merges, len candidates each) — words are
    * bounded, so this stays a compiled per-row loop.
    */
  final case class BpeEncodeRanked(vocab: DataFrame,
                                   textColumn: String = "text",
                                   idColumn: String = "doc_id",
                                   pieceColumn: String = "piece",
                                   vocabIdColumn: String = "id",
                                   rankColumn: String = "merge_rank",
                                   continuationPrefix: String = "##",
                                   unkId: Option[Long] = None,
                                   unkPiece: String = "<unk>",
                                   lowercase: Boolean = true,
                                   maxVocab: Int = 1 << 22,
                                   byteLevel: Boolean = false,
                                   emitPieces: Boolean = false)
      extends Wrangler {
    require(continuationPrefix.nonEmpty,
      "continuationPrefix must be non-empty")
    require(maxVocab >= 1, "maxVocab must be positive")
    override def getParams: Seq[(String, Any)] = Seq(
      "textColumn" -> textColumn, "idColumn" -> idColumn,
      "pieceColumn" -> pieceColumn, "vocabIdColumn" -> vocabIdColumn,
      "rankColumn" -> rankColumn,
      "continuationPrefix" -> continuationPrefix, "unkId" -> unkId,
      "unkPiece" -> unkPiece, "lowercase" -> lowercase,
      "maxVocab" -> maxVocab, "byteLevel" -> byteLevel,
      "emitPieces" -> emitPieces)
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
      SparkUtil.validateColumns(vocab,
        Seq(pieceColumn, vocabIdColumn, rankColumn))
      val spark = df.sparkSession
      import spark.implicits._
      // ONE bounded collect of (piece, id, merge_rank) — the r16
      // double-collect left a nondeterministic-source drift window
      // between the validated piece set and the rank rows (r16 ADVICE);
      // collecting once makes drift impossible BY CONSTRUCTION and
      // halves the vocab-plan executions (the plan behind a BpeLearn
      // vocab re-runs per collect). The SHARED encode-vocab contract
      // ([[collectEncodeVocab]] — fit-param drift checks, bounded
      // collect, null/empty/duplicate piece+id invariants, UTF-16
      // well-formedness, bare-prefix check, unkId collision) then runs
      // over a LOCAL frame built from these exact rows, with the piece
      // column's fit-param metadata carried over.
      val allRows = vocab
        .select(col(pieceColumn).cast("string").as(pieceColumn),
          col(vocabIdColumn).cast("long").as(vocabIdColumn),
          col(rankColumn).cast("long").as(rankColumn))
        .limit(maxVocab + 1)
        .collect()
      val localVocab = spark.createDataFrame(
        java.util.Arrays.asList(allRows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(pieceColumn,
            org.apache.spark.sql.types.StringType,
            nullable = true,
            metadata = vocab.schema(vocab.schema.fieldIndex(pieceColumn))
              .metadata),
          org.apache.spark.sql.types.StructField(vocabIdColumn,
            org.apache.spark.sql.types.LongType, nullable = true),
          org.apache.spark.sql.types.StructField(rankColumn,
            org.apache.spark.sql.types.LongType, nullable = true))))
      val (firstArr, contArr) = collectEncodeVocab(localVocab,
        pieceColumn, vocabIdColumn, continuationPrefix, lowercase,
        byteLevel, maxVocab, unkId, "BpeEncodeRanked")
      // rank layer on top of the shared contract (same rows, so the
      // piece sets cannot drift)
      val rankRows = allRows.map { r =>
        (r.getString(0),
          if (r.isNullAt(2)) null
          else java.lang.Long.valueOf(r.getLong(2)))
      }
      rankRows.foreach { case (p, r) =>
        require(r != null && r >= 0L,
          s"BpeEncodeRanked: piece `$p` has merge_rank $r — ranks are " +
            "0 (base symbol) or the 1-based merge round; this vocab " +
            "was not produced by BpeLearn")
      }
      val learned = rankRows.filter(_._2 >= 1L)
      require(learned.map(_._2).distinct.length == learned.length,
        "BpeEncodeRanked: two pieces share a merge_rank >= 1 — the " +
          "learn emits ONE merge per round, so the argmin would be " +
          "ambiguous; this vocab was not produced by BpeLearn")
      val bcIds = spark.sparkContext.broadcast(
        firstArr ++ contArr.map { case (p, id) =>
          (continuationPrefix + p, id) })
      val bcRanks = spark.sparkContext.broadcast(
        learned.map { case (p, r) => (p, r.longValue) })
      val (txt, idc, lc, unk) = (textColumn, idColumn, lowercase, unkId)
      val (pfx, bl) = (continuationPrefix, byteLevel)
      val textExpr =
        if (lc) lower(col(txt).cast("string")) else col(txt).cast("string")
      val typed = df.select(col(idc).cast("long"), textExpr.as("__t"))
        .as[(Long, String)]
      val pieces = emitPieces
      val unkP = unkPiece
      def encodedRows[R](it: Iterator[(Long, String)],
                         mk: (Long, ArrayBuffer[Long],
                           ArrayBuffer[String]) => R): Iterator[R] = {
        val ids = new java.util.HashMap[String, java.lang.Long]()
        val ranks = new java.util.HashMap[String, java.lang.Long]()
        bcIds.value.foreach { case (p, id) => ids.put(p, id) }
        bcRanks.value.foreach { case (p, r) => ranks.put(p, r) }
        val ws = java.util.regex.Pattern.compile("\\s+")
        def strip(s: String): String =
          if (s.startsWith(pfx)) s.substring(pfx.length) else s
        val out = new ArrayBuffer[Long](256)
        val pcs = if (pieces) new ArrayBuffer[String](256) else null
        val syms = new ArrayBuffer[String](64)
        val next = new ArrayBuffer[String](64)
        it.map { case (docId, text) =>
          out.clear()
          if (pcs != null) pcs.clear()
          if (text != null) {
            val words = ws.split(text)
            var wi = 0
            while (wi < words.length) {
              val wRaw = words(wi)
              if (wRaw.nonEmpty) {
                val w = if (bl) byteMapLocal(wRaw) else wRaw
                syms.clear()
                // initial symbolization advances per CODEPOINT
                // (Character.charCount), matching BpeLearn's Spark
                // `substr` symbolization — per-UTF-16-unit stepping
                // would shred astral chars (emoji) into lone-surrogate
                // symbols that can never match the rank-0 vocab
                var ci = 0
                while (ci < w.length) {
                  val cc = Character.charCount(w.codePointAt(ci))
                  syms += (if (ci == 0) w.substring(0, cc)
                           else pfx + w.substring(ci, ci + cc))
                  ci += cc
                }
                // min-rank merge loop: re-pick the global argmin each
                // step (a later merge can create an adjacency for an
                // earlier one — a single rank-ordered sweep would miss)
                var merging = true
                while (merging && syms.length > 1) {
                  var bestRank = Long.MaxValue
                  var bestP: String = null
                  var i = 0
                  while (i < syms.length - 1) {
                    val merged = syms(i) + strip(syms(i + 1))
                    val r = ranks.get(merged)
                    if (r != null && r.longValue < bestRank) {
                      bestRank = r.longValue
                      bestP = merged
                    }
                    i += 1
                  }
                  if (bestP == null) merging = false
                  else {
                    // greedy left-to-right merge of every adjacent
                    // occurrence (the learn-side apply fold: a merged
                    // symbol never re-pairs as its left half in-pass)
                    next.clear()
                    var j = 0
                    while (j < syms.length) {
                      val s = syms(j)
                      // the candidate string already carries the left
                      // symbol's form (concatenation keeps its prefix),
                      // so the merged symbol IS bestP verbatim
                      if (next.nonEmpty &&
                          next.last + strip(s) == bestP) {
                        next.remove(next.length - 1)
                        next += bestP
                      } else next += s
                      j += 1
                    }
                    syms.clear()
                    syms ++= next
                  }
                }
                // final symbols -> ids (and, under emitPieces, the
                // symbol strings themselves — they ARE vocab pieces);
                // any miss UNKs the whole word (or raises), the
                // BpeEncode contract
                val mark = out.length
                var ok = true
                var si = 0
                while (si < syms.length && ok) {
                  val id = ids.get(syms(si))
                  if (id == null) ok = false
                  else {
                    out += id.longValue
                    if (pcs != null) pcs += syms(si)
                  }
                  si += 1
                }
                if (!ok) {
                  out.takeInPlace(mark)
                  if (pcs != null) pcs.takeInPlace(mark)
                  unk match {
                    case Some(u) =>
                      out += u
                      if (pcs != null) pcs += unkP
                    case None => throw new IllegalArgumentException(
                      s"BpeEncodeRanked: doc $docId word `$wRaw` has a " +
                        s"post-merge symbol `${syms(si - 1)}` not in " +
                        "the vocab and no unkId is configured — a " +
                        "BpeLearn vocab over the same corpus (or the " +
                        "full byteAlphabet under byteLevel) guarantees " +
                        "coverage")
                  }
                }
              }
              wi += 1
            }
          }
          mk(docId, out, pcs)
        }
      }
      if (pieces)
        typed.mapPartitions(it => encodedRows(it, (docId, out, pcs) =>
          BpePieceRow(docId, out.length.toLong, out.toArray,
            pcs.toArray))).toDF()
      else
        typed.mapPartitions(it => encodedRows(it, (docId, out, _) =>
          BpeRow(docId, out.length.toLong, out.toArray))).toDF()
    }
  }

  /** [[BpeRow]] plus the matched piece STRINGS (`emitPieces = true`) —
    * what downstream chunkers consume ([[Chunking.ChunkSplit]]'s
    * `tokenArrayColumn`). Continuation pieces keep their prefix, so the
    * emitted pieces are exactly the vocab rows that matched. */
  private[operators] final case class BpePieceRow(
      doc_id: Long, n_bpe_tokens: Long, bpe_ids: Array[Long],
      bpe_pieces: Array[String])

  /** Unigram-LM score table — the OTHER major subword inference model
    * (Kudo 2018, sentencepiece's unigram mode; public knowledge): each
    * vocab piece carries an integer log-probability, and inference
    * segments each word into the MAXIMUM-LIKELIHOOD piece sequence
    * (Viterbi DP, [[UnigramEncode]]) instead of greedy MaxMatch or
    * merge-rank order.
    *
    * Scores are deterministic and oracle-replayable: ONE greedy
    * MaxMatch pass ([[BpeEncode]], `emitPieces`) segments the corpus,
    * piece frequencies are counted under that segmentation, and
    * `score = round(1e6 * ln((cnt + 1) / (total + V)))` — add-one
    * smoothed (every vocab piece gets a finite score even at count 0)
    * and held as a scaled LONG (the [[Dsir]] ln lattice: both engines
    * compute the same double and round to the same integer).
    *
    * `emRounds > 0` refines by HARD EM (Viterbi-EM, the deterministic
    * variant of sentencepiece's EM training; public knowledge): each
    * round re-segments the corpus under the CURRENT scores with
    * [[UnigramEncode]] (max-likelihood assignments instead of
    * forward-backward expected counts — every count stays an exact
    * integer, so the whole ladder is oracle-replayable), recounts by
    * id, and rescores through the same smoothed lattice. The artifact
    * shape never changes, so consumers are round-agnostic. Cost is
    * one corpus pass per round, fail-loud capped (`maxEmRounds`).
    *
    * `pruneTo = Some(v)` runs Kudo §3.2's vocabulary-pruning loop
    * FIRST (then any `emRounds` refine the pruned vocab): per round,
    * one Viterbi E-step, drop the lowest-count removable pieces
    * (single-codepoint pieces are protected — coverage), at most
    * `removable / pruneBatchDenom` per round, rescore survivors with
    * `T' = Σ kept counts, V' = kept size`; iterate to the target.
    * Low Viterbi count IS the deterministic likelihood-loss proxy
    * here: corpus log-likelihood is `Σ cnt_i · score_i` and a piece's
    * occurrences re-segment into alternatives on removal, so the
    * pieces the model uses least are the cheapest to lose — the
    * integer-lattice stand-in for sentencepiece's expected-loss
    * estimate, chosen so the oracle can replay the pick row for row.
    *
    * Output: `(piece, id, score)` + the vocab's fit params re-recorded
    * on `piece` — [[UnigramEncode]] raises on drift like every other
    * encoder face.
    *
    * 100 TB shape: the counting pass is [[BpeEncode]]'s stateless
    * broadcast-trie map (text never shuffles); the count agg is
    * map-side partial over at most V distinct pieces; the score table
    * is vocab-sized. Nothing corpus-sized leaves the executors.
    */
  final case class UnigramScores(vocab: DataFrame,
                                 textColumn: String = "text",
                                 idColumn: String = "doc_id",
                                 pieceColumn: String = "piece",
                                 vocabIdColumn: String = "id",
                                 continuationPrefix: String = "##",
                                 unkId: Option[Long] = None,
                                 lowercase: Boolean = true,
                                 maxVocab: Int = 1 << 22,
                                 byteLevel: Boolean = false,
                                 emRounds: Int = 0,
                                 maxEmRounds: Int = 16,
                                 pruneTo: Option[Int] = None,
                                 pruneBatchDenom: Int = 5)
      extends Wrangler {
    require(emRounds >= 0, "emRounds must be >= 0")
    require(emRounds <= maxEmRounds,
      s"UnigramScores: emRounds=$emRounds over maxEmRounds=" +
        s"$maxEmRounds — every EM round is one full corpus encode " +
        "pass + one bounded recount; raise maxEmRounds explicitly if " +
        "this pass budget is intended")
    require(pruneTo.forall(_ >= 1), "pruneTo must be >= 1")
    require(pruneBatchDenom >= 1, "pruneBatchDenom must be >= 1")
    override def getParams: Seq[(String, Any)] = Seq(
      "textColumn" -> textColumn, "idColumn" -> idColumn,
      "pieceColumn" -> pieceColumn, "vocabIdColumn" -> vocabIdColumn,
      "continuationPrefix" -> continuationPrefix, "unkId" -> unkId,
      "lowercase" -> lowercase, "maxVocab" -> maxVocab,
      "byteLevel" -> byteLevel, "emRounds" -> emRounds,
      "pruneTo" -> pruneTo, "pruneBatchDenom" -> pruneBatchDenom)
    override def preservesSampleSize: Boolean = false

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
      val spark = df.sparkSession
      import spark.implicits._
      val base = vocab
        .select(col(pieceColumn).cast("string").as(pieceColumn),
          col(vocabIdColumn).cast("long").as(vocabIdColumn))
      val vsize = vocab.count()

      // one scoring step: counts (by id or piece) -> the smoothed
      // integer ln lattice over the FULL vocab (unseen pieces score
      // the closed-form zero-count value)
      def score(counts: DataFrame, joinCol: String,
                total: Long): DataFrame =
        SparkUtil.withFitParamsStr(
          base.join(counts, Seq(joinCol), "left")
            .select(col(pieceColumn), col(vocabIdColumn),
              round(log((coalesce(col("__cnt"), lit(0L)) + lit(1L))
                  .cast("double") / lit((total + vsize).toDouble))
                  * lit(1e6))
                .cast("long").as("score")),
          pieceColumn, Map(
            "lowercase" -> lowercase.toString,
            "continuationPrefix" -> continuationPrefix,
            "byteLevel" -> byteLevel.toString))

      // round 0: piece frequencies under the greedy MaxMatch
      // segmentation — the cheap deterministic initialization, in ONE
      // corpus pass (r17 optimization, guide §1.2): the vocab-bounded
      // count table is collected and the token total derived from it —
      // every emitted token is exactly one piece occurrence, so
      // Σ counts == Σ n_bpe_tokens, which the r16 shape recomputed
      // with a second full corpus aggregation; and scoring over the
      // collected LOCAL count rows keeps consumers of the returned
      // frame from re-running the corpus encode per collect (the r16
      // lazy counting pass cost one full pass per downstream collect).
      // The smoothed integer lattice stays the same Spark expression
      // over the same exact integers.
      val enc0 = BpeEncode(vocab, textColumn = textColumn,
        idColumn = idColumn, pieceColumn = pieceColumn,
        vocabIdColumn = vocabIdColumn,
        continuationPrefix = continuationPrefix, unkId = unkId,
        lowercase = lowercase, maxVocab = maxVocab,
        byteLevel = byteLevel, emitPieces = true).transform(df)
      val cnt0 = enc0
        .select(explode(col("bpe_pieces")).as(pieceColumn))
        .groupBy(pieceColumn).agg(count(lit(1)).as("__cnt"))
        .as[(String, Long)].collect()
      var cur = score(cnt0.toSeq.toDF(pieceColumn, "__cnt"),
        pieceColumn, cnt0.map(_._2).sum)

      // vocabulary pruning to `pruneTo` (Kudo 2018 §3.2's loop, the
      // deterministic hard-EM variant): each round re-segments the
      // corpus under the CURRENT scores (E step), then drops the
      // lowest-count REMOVABLE pieces — single-codepoint first-form
      // pieces and single-codepoint continuation pieces are protected
      // (the no-dead-end coverage guarantee) — at most
      // `removable / pruneBatchDenom` (min 1) per round, then rescores
      // the survivors through the same smoothed lattice with
      // T' = Σ kept counts and V' = kept size (M step). The drop order
      // is total: count ascending, id DESCENDING on ties (later-added
      // pieces go first), so the oracle replays the pick row for row.
      // Each round is one corpus pass; rounds count against
      // `maxEmRounds` (fail-loud cap).
      pruneTo.foreach { target =>
        var pruneRounds = 0
        var vNow = cur.count()
        while (vNow > target) {
          require(pruneRounds < maxEmRounds,
            s"UnigramScores: pruning from $vNow to $target needs more " +
              s"than maxEmRounds=$maxEmRounds corpus passes at " +
              s"1/$pruneBatchDenom per round — raise maxEmRounds or " +
              "pruneBatchDenom explicitly if this pass budget is " +
              "intended")
          val enc = UnigramEncode(cur, textColumn = textColumn,
            idColumn = idColumn, pieceColumn = pieceColumn,
            vocabIdColumn = vocabIdColumn,
            continuationPrefix = continuationPrefix, unkId = unkId,
            lowercase = lowercase, maxVocab = maxVocab,
            byteLevel = byteLevel).transform(df)
          val cnts = enc
            .select(explode(col("bpe_ids")).as(vocabIdColumn))
            .groupBy(vocabIdColumn).agg(count(lit(1)).as("__cnt"))
          // vocab-sized driver pick (bounded: cur <= maxVocab by the
          // encoder's own fail-loud collect)
          val rowsV = cur
            .join(cnts, Seq(vocabIdColumn), "left")
            .select(col(pieceColumn).cast("string"),
              col(vocabIdColumn).cast("long"),
              coalesce(col("__cnt"), lit(0L)))
            .limit(maxVocab + 1)
            .as[(String, Long, Long)].collect()
          val pfx = continuationPrefix
          def protectedPiece(p: String): Boolean = {
            val core = if (p.startsWith(pfx)) p.substring(pfx.length) else p
            core.codePointCount(0, core.length) == 1
          }
          val removable = rowsV.filter(r => !protectedPiece(r._1))
          require(removable.nonEmpty,
            s"UnigramScores: pruneTo=$target is below the protected " +
              s"alphabet size (${rowsV.length - removable.length} " +
              "single-codepoint pieces) — nothing left to prune")
          val dropN = math.min(vNow - target,
            math.max(1L, removable.length.toLong / pruneBatchDenom))
          val dropIds = removable.sortBy(r => (r._3, -r._2))
            .take(dropN.toInt).map(_._2).toSet
          val kept = rowsV.filter(r => !dropIds(r._2))
          val keptTotal = kept.map(_._3).sum
          val keptV = kept.length.toLong
          // rescore through the SAME Spark lattice expression as
          // score() — driver math would round negatives differently
          cur = SparkUtil.withFitParamsStr(
            kept.toSeq.toDF(pieceColumn, vocabIdColumn, "__cnt")
              .select(col(pieceColumn), col(vocabIdColumn),
                round(log((col("__cnt") + lit(1L)).cast("double") /
                    lit((keptTotal + keptV).toDouble)) * lit(1e6))
                  .cast("long").as("score")),
            pieceColumn, Map(
              "lowercase" -> lowercase.toString,
              "continuationPrefix" -> continuationPrefix,
              "byteLevel" -> byteLevel.toString))
          vNow = keptV
          pruneRounds += 1
        }
      }

      // hard-EM (Viterbi-EM) refinement: re-segment the corpus under
      // the CURRENT scores (the E step, max-likelihood instead of
      // expected counts — the deterministic, oracle-replayable
      // variant), recount by id, rescore (the M step). Each round is
      // one corpus pass; the artifact shape never changes, so any
      // consumer of round-0 scores consumes round-k scores unchanged.
      var r = 0
      while (r < emRounds) {
        val enc = UnigramEncode(cur, textColumn = textColumn,
          idColumn = idColumn, pieceColumn = pieceColumn,
          vocabIdColumn = vocabIdColumn,
          continuationPrefix = continuationPrefix, unkId = unkId,
          lowercase = lowercase, maxVocab = maxVocab,
          byteLevel = byteLevel).transform(df)
        // one corpus pass per round (the round-0 move): counts
        // collected, total = Σ counts == Σ n_bpe_tokens
        val cnts = enc
          .select(explode(col("bpe_ids")).as(vocabIdColumn))
          .groupBy(vocabIdColumn).agg(count(lit(1)).as("__cnt"))
          .as[(Long, Long)].collect()
        cur = score(cnts.toSeq.toDF(vocabIdColumn, "__cnt"),
          vocabIdColumn, cnts.map(_._2).sum)
        r += 1
      }
      cur
    }
  }

  /** Maximum-likelihood subword inference over a [[UnigramScores]]
    * table — the sentencepiece-unigram Viterbi segmentation (Kudo
    * 2018; public knowledge): per whitespace-separated word, the piece
    * sequence maximizing the total integer score, via one forward DP
    * over word positions (cell = chars consumed; each cell relaxed by
    * every vocab piece ending there — first-form pieces only from
    * cell 0, continuation pieces after).
    *
    * Determinism (the oracle replays cell-for-cell): ties on total
    * score break to the FEWER-token path, then to the LONGER final
    * piece — and that triple is total, because equal end + equal
    * length pins the piece itself. The argmax is over exact integers,
    * so no float order-dependence exists anywhere.
    *
    * Divergence from the family's other inference modes is real and
    * spec-exhibited: greedy MaxMatch commits to the longest head piece
    * even when it forces a poor tail (TokenizeUnigramSpec); rank-order
    * BPE follows the learned merge history, which is blind to piece
    * frequencies beyond the merges.
    *
    * A word with an unreachable final cell becomes ONE `unkId` token
    * or fails loud (`unkId = None`) — [[BpeEncode]]'s whole-word-UNK
    * contract; char-complete vocabs ([[VocabBuild]] / [[BpeLearn]])
    * make the DP total on their own corpus.
    *
    * 100 TB shape: identical to [[BpeEncode]] — score table collected
    * once (bounded, fail-loud), broadcast as tries + an id→score map;
    * pure map-side typed pass. Per-word cost is O(len × trie-walk) —
    * each start position walks the trie once collecting all matches.
    */
  final case class UnigramEncode(scores: DataFrame,
                                 textColumn: String = "text",
                                 idColumn: String = "doc_id",
                                 pieceColumn: String = "piece",
                                 vocabIdColumn: String = "id",
                                 scoreColumn: String = "score",
                                 continuationPrefix: String = "##",
                                 unkId: Option[Long] = None,
                                 unkPiece: String = "<unk>",
                                 lowercase: Boolean = true,
                                 maxVocab: Int = 1 << 22,
                                 byteLevel: Boolean = false,
                                 emitPieces: Boolean = false)
      extends Wrangler {
    require(continuationPrefix.nonEmpty,
      "continuationPrefix must be non-empty")
    require(maxVocab >= 1, "maxVocab must be positive")
    override def getParams: Seq[(String, Any)] = Seq(
      "textColumn" -> textColumn, "idColumn" -> idColumn,
      "pieceColumn" -> pieceColumn, "vocabIdColumn" -> vocabIdColumn,
      "scoreColumn" -> scoreColumn,
      "continuationPrefix" -> continuationPrefix, "unkId" -> unkId,
      "unkPiece" -> unkPiece, "lowercase" -> lowercase,
      "maxVocab" -> maxVocab, "byteLevel" -> byteLevel,
      "emitPieces" -> emitPieces)
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
      SparkUtil.validateColumns(scores,
        Seq(pieceColumn, vocabIdColumn, scoreColumn))
      val spark = df.sparkSession
      import spark.implicits._
      // ONE bounded collect of (piece, id, score): the r16 shape
      // collected twice (the shared vocab-contract collect, then the
      // score rows) — but a UnigramScores frame is a LAZY plan whose
      // counting pass re-encodes the whole corpus, so each extra
      // collect re-ran a full corpus pass (r17 optimization, guide
      // §1.2: don't compute things twice). The SHARED encode-vocab
      // contract (fit-param drift, bounded collect, every piece/id
      // invariant) runs over a LOCAL frame built from these exact
      // rows, with the piece column's fit-param metadata carried over
      // — and the piece/score row sets cannot drift by construction.
      val allRows = scores
        .select(col(pieceColumn).cast("string").as(pieceColumn),
          col(vocabIdColumn).cast("long").as(vocabIdColumn),
          col(scoreColumn).cast("long").as(scoreColumn))
        .limit(maxVocab + 1)
        .collect()
      val localScores = spark.createDataFrame(
        java.util.Arrays.asList(allRows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(pieceColumn,
            org.apache.spark.sql.types.StringType,
            nullable = true,
            metadata = scores.schema(scores.schema.fieldIndex(pieceColumn))
              .metadata),
          org.apache.spark.sql.types.StructField(vocabIdColumn,
            org.apache.spark.sql.types.LongType, nullable = true),
          org.apache.spark.sql.types.StructField(scoreColumn,
            org.apache.spark.sql.types.LongType, nullable = true))))
      val (firstArr, contArr) = collectEncodeVocab(localScores,
        pieceColumn, vocabIdColumn, continuationPrefix, lowercase,
        byteLevel, maxVocab, unkId, "UnigramEncode")
      // score layer on top of the shared contract (same rows)
      val scoreRows = allRows.map { r =>
        (if (r.isNullAt(1)) null
         else java.lang.Long.valueOf(r.getLong(1)),
          if (r.isNullAt(2)) null
          else java.lang.Long.valueOf(r.getLong(2)))
      }
      scoreRows.foreach { case (id, s) =>
        require(s != null,
          s"UnigramEncode: vocab id $id has a null $scoreColumn — " +
            "build the table with Tokenize.UnigramScores")
      }
      val bcFirst = spark.sparkContext.broadcast(firstArr)
      val bcCont = spark.sparkContext.broadcast(contArr)
      val bcScores = spark.sparkContext.broadcast(
        scoreRows.map { case (id, s) => (id.longValue, s.longValue) })
      val (txt, idc, lc, unk) = (textColumn, idColumn, lowercase, unkId)
      val (pfx, bl) = (continuationPrefix, byteLevel)
      val (pieces, unkP) = (emitPieces, unkPiece)
      val textExpr =
        if (lc) lower(col(txt).cast("string")) else col(txt).cast("string")
      def rows[R](it: Iterator[(Long, String)],
                  mk: (Long, ArrayBuffer[Long]) => R): Iterator[R] = {
          val firstTrie = new Trie
          bcFirst.value.foreach { case (p, id) => firstTrie.add(p, id) }
          val contTrie = new Trie
          bcCont.value.foreach { case (p, id) => contTrie.add(p, id) }
          val scoreById = new java.util.HashMap[Long, Long]()
          bcScores.value.foreach { case (id, s) => scoreById.put(id, s) }
          val ws = java.util.regex.Pattern.compile("\\s+")
          val out = new ArrayBuffer[Long](256)
          // DP cell arrays, grown to the longest word seen
          var cap = 64
          var sc = new Array[Long](cap + 1)
          var nt = new Array[Int](cap + 1)
          var pl = new Array[Int](cap + 1)
          var pid = new Array[Long](cap + 1)
          var ok = new Array[Boolean](cap + 1)
          it.map { case (docId, text) =>
            out.clear()
            if (text != null) {
              val words = ws.split(text)
              var wi = 0
              while (wi < words.length) {
                val wRaw = words(wi)
                if (wRaw.nonEmpty) {
                  val w = if (bl) byteMapLocal(wRaw) else wRaw
                  val n = w.length
                  if (n > cap) {
                    cap = math.max(n, cap * 2)
                    sc = new Array[Long](cap + 1)
                    nt = new Array[Int](cap + 1)
                    pl = new Array[Int](cap + 1)
                    pid = new Array[Long](cap + 1)
                    ok = new Array[Boolean](cap + 1)
                  }
                  java.util.Arrays.fill(ok, 0, n + 1, false)
                  ok(0) = true; sc(0) = 0L; nt(0) = 0
                  var s = 0
                  while (s < n) {
                    if (ok(s)) {
                      val trie = if (s == 0) firstTrie else contTrie
                      val (ss, sn) = (sc(s), nt(s))
                      trie.allMatches(w, s, (len, id) => {
                        val e = s + len
                        val tot = ss + scoreById.get(id)
                        val tn = sn + 1
                        // relax: max total; tie -> fewer tokens; tie ->
                        // longer final piece (total order — see scaladoc)
                        if (!ok(e) || tot > sc(e) ||
                            (tot == sc(e) && (tn < nt(e) ||
                              (tn == nt(e) && len > pl(e))))) {
                          ok(e) = true; sc(e) = tot; nt(e) = tn
                          pl(e) = len; pid(e) = id
                        }
                      })
                    }
                    s += 1
                  }
                  if (!ok(n)) {
                    unk match {
                      case Some(u) => out += u
                      case None => throw new IllegalArgumentException(
                        s"UnigramEncode: doc $docId word `$wRaw` has no " +
                          "full segmentation under this score table " +
                          "and no unkId is configured — char-complete " +
                          "vocabs (VocabBuild / BpeLearn) guarantee " +
                          "coverage on their own corpus, or set unkId")
                    }
                  } else {
                    // backtrack, then emit in order
                    val mark = out.length
                    var e = n
                    while (e > 0) { out += pid(e); e -= pl(e) }
                    // reverse the appended slice in place
                    var i = mark
                    var j = out.length - 1
                    while (i < j) {
                      val t = out(i); out(i) = out(j); out(j) = t
                      i += 1; j -= 1
                    }
                  }
                }
                wi += 1
              }
            }
            mk(docId, out)
          }
      }
      val typed = df.select(col(idc).cast("long"), textExpr.as("__t"))
        .as[(Long, String)]
      if (pieces) {
        // final DP pieces ARE vocab rows: invert the validated piece
        // arrays (continuation re-prefixed) for the emitPieces face —
        // the chunker's external-token path, like BpeEncode's
        val byId = (firstArr ++ contArr.map { case (p, id) =>
          (continuationPrefix + p, id) })
          .map { case (p, id) => id -> p }.toMap
        val bcById = spark.sparkContext.broadcast(byId)
        typed.mapPartitions { it =>
          val m = bcById.value
          rows(it, (docId, out) => BpePieceRow(docId,
            out.length.toLong, out.toArray,
            out.map(id => m.getOrElse(id, unkP)).toArray))
        }.toDF()
      } else
        typed.mapPartitions(it =>
          rows(it, (docId, out) =>
            BpeRow(docId, out.length.toLong, out.toArray))).toDF()
    }
  }

  /** The encode-side vocab contract, shared verbatim by [[BpeEncode]]
    * and the fused curation recipe
    * ([[graft.streaming.StreamingCuration]]): fit-param drift checks,
    * the bounded collect, every fail-loud piece/id invariant, and the
    * first-form / continuation partition (continuation pieces returned
    * STRIPPED of the prefix — trie space). */
  private[graft] def collectEncodeVocab(vocab: DataFrame,
      pieceColumn: String, vocabIdColumn: String,
      continuationPrefix: String, lowercase: Boolean, byteLevel: Boolean,
      maxVocab: Int, unkId: Option[Long], who: String)
      : (Array[(String, Long)], Array[(String, Long)]) = {
    SparkUtil.validateColumns(vocab, Seq(pieceColumn, vocabIdColumn))
    // self-describing vocab: a learn-side vocab records how it was
    // built; an encode configured differently (lowercase drift, a
    // different continuation prefix) would silently UNK or mis-split
    // — raise from the recorded contract instead. Metadata-less
    // (hand-built/legacy) vocabs pass: the prose contract governs.
    SparkUtil.requireFitParamStr(vocab, pieceColumn, "lowercase",
      lowercase.toString, who)
    SparkUtil.requireFitParamStr(vocab, pieceColumn,
      "continuationPrefix", continuationPrefix, who)
    SparkUtil.requireFitParamStr(vocab, pieceColumn, "byteLevel",
      byteLevel.toString, who)
    val spark = vocab.sparkSession
    import spark.implicits._
    // driver-bounded collect: limit(max+1) keeps a corpus-scale frame
    // from ever materializing on the driver before the require fires
    val rows = vocab
      .select(col(pieceColumn).cast("string"), col(vocabIdColumn).cast("long"))
      .limit(maxVocab + 1).as[(String, java.lang.Long)].collect()
    require(rows.length <= maxVocab,
      s"$who: vocab exceeds maxVocab=$maxVocab pieces — a subword " +
        "vocab is bounded; a corpus-scale frame here is a wiring bug")
    // the incremental-family empty-structural-input contract
    // (IncrementalIvf / SemDedup / IncrementalResample all raise):
    // an empty vocab would UNK or kill every word — a wiring bug,
    // never a meaningful encode
    require(rows.nonEmpty,
      s"$who: empty vocab — build it (e.g. Tokenize.VocabBuild) " +
        "on a non-empty corpus first")
    rows.foreach { case (p, id) =>
      require(p != null && p.nonEmpty,
        s"$who: vocab contains a null/empty piece")
      require(id != null, s"$who: vocab piece `$p` has a null id")
      // Unicode contract: pieces must be WELL-FORMED UTF-16 (no
      // unpaired surrogate). The trie walks UTF-16 units, the
      // engine's own vocab constructions and the SQL oracle count
      // codepoints — the two longest-match orders agree because
      // pieces matching at one cursor form a PREFIX CHAIN (each is a
      // prefix of the text there, hence of each other), and along
      // well-formed prefix extensions both unit count and codepoint
      // count grow strictly together; only a piece ending in a lone
      // high surrogate could add units without completing a
      // codepoint, and that is exactly what this guard excludes. It
      // also makes every match boundary codepoint-aligned, so no
      // emitted piece can split a surrogate pair of well-formed text.
      // In practice Spark's UTF8String conversion already sanitizes
      // lone surrogates at the column boundary (TokenizeUnicodeSpec
      // pins that), so this is a backstop invariant, not a hot path.
      var ci = 0
      while (ci < p.length) {
        val c = p.charAt(ci)
        if (Character.isHighSurrogate(c)) {
          require(ci + 1 < p.length &&
            Character.isLowSurrogate(p.charAt(ci + 1)),
            s"$who: vocab piece `$p` (id $id) contains an " +
              "unpaired high surrogate — pieces must be well-formed " +
              "UTF-16 or greedy matching could split a codepoint")
          ci += 2
        } else {
          require(!Character.isLowSurrogate(c),
            s"$who: vocab piece `$p` (id $id) contains an " +
              "unpaired low surrogate — pieces must be well-formed " +
              "UTF-16 or greedy matching could split a codepoint")
          ci += 1
        }
      }
    }
    require(rows.map(_._1).distinct.length == rows.length,
      s"$who: vocab pieces must be distinct — duplicate pieces " +
        "make the encode ambiguous")
    // id integrity: two pieces sharing an id (or unkId shadowing a
    // real id) would conflate distinct tokens in bpe_ids — silently
    // wrong counts/dedup downstream, the quiet-corruption class
    require(rows.map(_._2).distinct.length == rows.length,
      s"$who: vocab ids must be distinct — two pieces sharing an " +
        "id would encode distinct tokens identically")
    unkId.foreach { u =>
      require(!rows.exists(_._2 == u),
        s"$who: unkId=$u collides with a vocab piece's id — OOV " +
          "words would be indistinguishable from that piece")
    }
    val prefix = continuationPrefix
    val (contRaw, firstRaw) = rows.partition(_._1.startsWith(prefix))
    contRaw.foreach { case (p, _) =>
      require(p.length > prefix.length,
        s"$who: continuation piece `$p` is the bare prefix — it " +
          "would consume zero characters")
    }
    (firstRaw.map { case (p, id) => (p, id.longValue) },
      contRaw.map { case (p, id) =>
        (p.substring(prefix.length), id.longValue)
      })
  }

  /** Partition-local greedy MaxMatch word encoder over compiled tries
    * — the hot path of [[BpeEncode]], shared with the fused curation
    * recipe. `cont` pieces arrive STRIPPED ([[collectEncodeVocab]]'s
    * trie space); construct one instance per partition. */
  private[graft] final class WordEncoder(first: Array[(String, Long)],
                                         cont: Array[(String, Long)],
                                         pfx: String, byteLevel: Boolean,
                                         unkId: Option[Long],
                                         unkPiece: String) {
    // pattern hoisted per partition: String.split("\\s+") would
    // recompile the regex per DOCUMENT on this hot path
    private val ws = java.util.regex.Pattern.compile("\\s+")
    private val firstTrie = {
      val t = new Trie
      first.foreach { case (p, id) => t.add(p, id) }
      t
    }
    private val contTrie = {
      val t = new Trie
      cont.foreach { case (p, id) => t.add(p, id) }
      t
    }

    /** Per-doc greedy walk; `pcs` is null when pieces aren't emitted
      * (no per-token string work then). */
    def encodeInto(docId: Long, text: String, out: ArrayBuffer[Long],
                   pcs: ArrayBuffer[String]): Unit = {
      if (text == null) return
      val words = ws.split(text)
      var wi = 0
      while (wi < words.length) {
        val wRaw = words(wi)
        if (wRaw.nonEmpty) {
          // byte-level: walk the word's UTF-8 bytes through the
          // visible byte alphabet — the trie/vocab live in mapped
          // space (what a byteLevel BpeLearn emits), and emitted
          // pieces are mapped-space strings
          val w = if (byteLevel) byteMapLocal(wRaw) else wRaw
          val mark = out.length
          var pos = 0
          var dead = false
          while (pos < w.length && !dead) {
            val trie = if (pos == 0) firstTrie else contTrie
            val len = trie.longest(w, pos)
            if (len <= 0) dead = true
            else {
              out += trie.lastId
              if (pcs != null)
                pcs += (if (pos == 0) w.substring(pos, pos + len)
                        else pfx + w.substring(pos, pos + len))
              pos += len
            }
          }
          if (dead) {
            out.takeInPlace(mark)
            if (pcs != null) pcs.takeInPlace(mark)
            unkId match {
              case Some(u) => // whole-word UNK
                out += u
                if (pcs != null) pcs += unkPiece
              case None => throw new IllegalArgumentException(
                s"BpeEncode: doc $docId word `$wRaw` is not encodable " +
                  s"at offset $pos${if (byteLevel) " (byte-mapped)" else ""} " +
                  "and no unkId is configured — add the missing " +
                  "pieces (single characters in both forms — or the " +
                  "full byteAlphabet under byteLevel — guarantee " +
                  "coverage) or set unkId")
            }
          }
        }
        wi += 1
      }
    }
  }

  /** Encode `textColumn` into subword token ids against `vocab`
    * (`pieceColumn` string, `vocabIdColumn` long; continuation pieces
    * carry `continuationPrefix`). Output: one row per input row —
    * `(doc_id, n_bpe_tokens, bpe_ids)` ([[Multimodal.MediaFeatures]]'s
    * typed-projection convention; join back on the id for the rest);
    * `emitPieces = true` adds `bpe_pieces` (the matched piece strings,
    * continuation prefix kept; UNK emits `unkPiece`) — the column
    * [[Chunking.ChunkSplit]]'s `tokenArrayColumn` consumes, making the
    * encode → chunk → pack chain self-contained.
    * Null text encodes to the empty array (a real row, never dropped).
    *
    * Vocab contract (all fail loud): pieces non-null, non-empty,
    * DISTINCT; a continuation piece must be strictly longer than the
    * prefix (a bare `##` would consume zero characters and loop); ids
    * non-null. Pieces that merely CONTAIN `#` are fine — only the
    * leading prefix classifies a piece as continuation.
    */
  final case class BpeEncode(vocab: DataFrame,
                             textColumn: String = "text",
                             idColumn: String = "doc_id",
                             pieceColumn: String = "piece",
                             vocabIdColumn: String = "id",
                             continuationPrefix: String = "##",
                             unkId: Option[Long] = None,
                             unkPiece: String = "<unk>",
                             lowercase: Boolean = true,
                             emitPieces: Boolean = false,
                             maxVocab: Int = 1 << 22,
                             byteLevel: Boolean = false)
      extends Wrangler {
    require(continuationPrefix.nonEmpty, "continuationPrefix must be non-empty")
    require(maxVocab >= 1, "maxVocab must be positive")
    // the vocab frame is structural input, not a tunable (the
    // incremental-family convention)
    override def getParams: Seq[(String, Any)] = Seq(
      "textColumn" -> textColumn, "idColumn" -> idColumn,
      "pieceColumn" -> pieceColumn, "vocabIdColumn" -> vocabIdColumn,
      "continuationPrefix" -> continuationPrefix, "unkId" -> unkId,
      "unkPiece" -> unkPiece, "lowercase" -> lowercase,
      "emitPieces" -> emitPieces, "maxVocab" -> maxVocab,
      "byteLevel" -> byteLevel)
    override def preservesSampleSize: Boolean = true

    def transform(df: DataFrame): DataFrame = {
      SparkUtil.validateColumns(df, Seq(idColumn, textColumn))
      val spark = df.sparkSession
      import spark.implicits._
      // the whole vocab contract (fit-param drift, bounded collect,
      // piece/id invariants, first/continuation partition) lives in
      // the shared [[collectEncodeVocab]]; stripped continuation
      // pieces stay distinct because the dup check runs on RAW pieces
      val (firstArr, contArr) = collectEncodeVocab(vocab, pieceColumn,
        vocabIdColumn, continuationPrefix, lowercase, byteLevel,
        maxVocab, unkId, "BpeEncode")
      val bcFirst = spark.sparkContext.broadcast(firstArr)
      val bcCont = spark.sparkContext.broadcast(contArr)
      val (txt, idc, lc, unk) = (textColumn, idColumn, lowercase, unkId)
      val (pfx, unkP, pieces) = (continuationPrefix, unkPiece, emitPieces)
      val bl = byteLevel
      val textExpr =
        if (lc) lower(col(txt).cast("string")) else col(txt).cast("string")
      val typed = df.select(col(idc).cast("long"), textExpr.as("__t"))
        .as[(Long, String)]

      if (pieces)
        typed.mapPartitions { it =>
          val enc = new WordEncoder(bcFirst.value, bcCont.value, pfx,
            bl, unk, unkP)
          val out = new ArrayBuffer[Long](256)
          val pcs = new ArrayBuffer[String](256)
          it.map { case (docId, text) =>
            out.clear(); pcs.clear()
            enc.encodeInto(docId, text, out, pcs)
            BpePieceRow(docId, out.length.toLong, out.toArray, pcs.toArray)
          }
        }.toDF()
      else
        typed.mapPartitions { it =>
          val enc = new WordEncoder(bcFirst.value, bcCont.value, pfx,
            bl, unk, unkP)
          val out = new ArrayBuffer[Long](256)
          it.map { case (docId, text) =>
            out.clear()
            enc.encodeInto(docId, text, out, null)
            BpeRow(docId, out.length.toLong, out.toArray)
          }
        }.toDF()
    }
  }
}
