package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized cross-implementation check of the span-dedup algebra
  * (same protocol as IntervalPropertySpec's NaiveIterator oracle): an
  * independent brute-force model computes duplicated positions, the
  * gap-< n island merge, the exact token union and the stripped token
  * stream, and the operators must agree on every random corpus. A tiny
  * vocabulary forces heavy cross-document collisions; doc lengths span
  * empty / below-shingle-width / long.
  */
class DupSpansPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val n = 3

  /** Brute-force model. Returns per doc:
    * (n_tokens, n_dup_spans, n_dup_tokens, cleanTokens).
    */
  private def model(corpus: Seq[(Long, Seq[String])])
      : Map[Long, (Long, Long, Long, Seq[String])] = {
    val shingles = corpus.map { case (id, tk) =>
      id -> tk.sliding(n).filter(_.size == n).map(_.mkString(" ")).toVector
    }.toMap
    val df = shingles.values.flatMap(_.distinct).toSeq
      .groupBy(identity).map { case (s, xs) => s -> xs.size }
    corpus.map { case (id, tk) =>
      val sh = shingles(id)
      val dupPos = sh.zipWithIndex.collect {
        case (s, p) if df(s) >= 2 => p
      }
      // islands: break when the position gap is >= n (token ranges
      // [p, p+n-1] no longer overlap)
      val islands = dupPos.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc, p) =>
          if (acc.nonEmpty && p - acc.last._2 < n)
            acc.init :+ (acc.last._1, p)
          else acc :+ (p, p)
      }
      val nDupTokens = islands.map { case (lo, hi) => hi - lo + n }.sum
      // cross-check the union identity: sum over islands == |union|
      val covered = dupPos.flatMap(p => p until (p + n)).toSet
      assert(nDupTokens == covered.size, s"union identity broke for $id")
      val clean = tk.zipWithIndex.collect {
        case (t, i) if !covered(i) => t
      }
      id -> (tk.size.toLong, islands.size.toLong, nDupTokens.toLong,
        clean)
    }.toMap
  }

  test("DupSpans and StripDupSpans agree with the brute force on " +
    "random heavy-collision corpora") {
    val rnd = new Random(20260814L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (round <- 1 to 20) {
      val corpus = (0L until 12L).map { id =>
        val len = rnd.nextInt(13) // 0..12 tokens
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      }
      val want = model(corpus)
      val df = corpus.map { case (id, tk) => (id, tk.mkString(" ")) }
        .toDF("doc_id", "text")
      val gotDup = Corpus.DupSpans(n = n).transform(df)
        .select("doc_id", "n_tokens", "n_dup_spans", "n_dup_tokens")
        .as[(Long, Long, Long, Long)].collect()
      assert(gotDup.length == corpus.size, s"round $round row count")
      gotDup.foreach { case (id, nt, ns, nd) =>
        val (wnt, wns, wnd, _) = want(id)
        // empty text tokenizes to one empty token under the whitespace
        // split — align the model for len 0
        val adjNt = if (corpus(id.toInt)._2.isEmpty) 1L else wnt
        assert(nt == adjNt && ns == wns && nd == wnd,
          s"round $round doc $id: got ($nt,$ns,$nd) want ($adjNt,$wns,$wnd)")
      }
      val gotStrip = Corpus.StripDupSpans(n = n).transform(df)
        .select("doc_id", "n_kept_tokens", "clean_text")
        .as[(Long, Long, String)].collect()
      gotStrip.foreach { case (id, nk, clean) =>
        val (_, _, _, wClean) = want(id)
        val adjClean =
          if (corpus(id.toInt)._2.isEmpty) Seq("") else wClean
        assert(nk == adjClean.size.toLong &&
            clean == adjClean.mkString(" "),
          s"round $round doc $id: got ($nk, '$clean') want " +
            s"(${adjClean.size}, '${adjClean.mkString(" ")}')")
      }
    }
  }
}
