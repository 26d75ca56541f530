package graft.tools

import graft.operators.TextAnalysis.GopherRepetition

/** Micro-benchmark for the r17 string-free Gopher n-gram counters
  * (the [[GopherRepetition]] hot loop): A/B the interned-id window
  * counting against the r16 string-keyed formulation (inlined here as
  * the reference) on a realistic web-page token shape, asserting
  * result equality on every document first. Pure JVM, no Spark — this
  * measures the per-task work the typed pass spends per document,
  * which is what scales with corpus size at 100 TB.
  *
  * Usage: `sbt "runMain graft.tools.GramBench [tokensPerDoc] [reps]"`.
  */
object GramBench {

  // ---- the r16 string-keyed reference, verbatim shape ----
  private def gramArray(toks: Array[String], n: Int): Array[String] = {
    val total = toks.length - n + 1
    if (total <= 0) return Array.empty
    val grams = new Array[String](total)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      grams(i) = sb.toString
      i += 1
    }
    grams
  }

  private def oldTop(toks: Array[String], n: Int): Long = {
    val grams = gramArray(toks, n)
    if (grams.isEmpty) return 0L
    val counts = new java.util.HashMap[String, Array[Long]](grams.length * 2)
    grams.foreach { g =>
      val slot = counts.get(g)
      if (slot == null) counts.put(g, Array(1L)) else slot(0) += 1L
    }
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c >= 2L) {
        val k = e.getKey
        val v = c * k.codePointCount(0, k.length).toLong
        if (v > best) best = v
      }
    }
    best
  }

  private def oldDup(toks: Array[String], wlen: Array[Long], n: Int,
                     covered: Array[Boolean]): Long = {
    val grams = gramArray(toks, n)
    if (grams.isEmpty) return 0L
    val counts = new java.util.HashMap[String, Array[Long]](grams.length * 2)
    grams.foreach { g =>
      val slot = counts.get(g)
      if (slot == null) counts.put(g, Array(1L)) else slot(0) += 1L
    }
    java.util.Arrays.fill(covered, 0, toks.length, false)
    var i = 0
    while (i < grams.length) {
      if (counts.get(grams(i))(0) >= 2L) {
        var j = i
        val e = i + n
        while (j < e) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var s = 0L
    i = 0
    while (i < toks.length) {
      if (covered(i)) s += wlen(i)
      i += 1
    }
    s
  }

  def main(args: Array[String]): Unit = {
    val tokensPerDoc = args.headOption.map(_.toInt).getOrElse(600)
    val reps = args.lift(1).map(_.toInt).getOrElse(2000)
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 120).map(i => s"word$i").toArray
    // 50 docs of a realistic shape: Zipf-ish mix with a hot stopword
    // and repeated phrases (so dup rules genuinely fire)
    val docs: Array[Array[String]] = Array.tabulate(50) { d =>
      Array.tabulate(tokensPerDoc) { i =>
        if (i % 7 == 0) "the"
        else if (i % 31 < 6) vocab(i % 31) // repeated phrase region
        else vocab(rnd.nextInt(vocab.length))
      }
    }
    val wlens = docs.map(_.map(t => t.codePointCount(0, t.length).toLong))

    def runNew(): Long = {
      var s = 0L
      var d = 0
      while (d < docs.length) {
        val toks = docs(d)
        val wlen = wlens(d)
        val ids = GopherRepetition.internTokens(toks)
        val plen = GopherRepetition.prefixLens(wlen)
        val covered = new Array[Boolean](toks.length)
        GopherRepetition.TopGramThresholds.foreach { case (n, _, _) =>
          s += GopherRepetition.topGramChars(ids, plen, n) }
        GopherRepetition.DupGramThresholds.foreach { case (n, _, _) =>
          s += GopherRepetition.dupGramChars(ids, wlen, n, covered) }
        d += 1
      }
      s
    }
    def runOld(): Long = {
      var s = 0L
      var d = 0
      while (d < docs.length) {
        val toks = docs(d)
        val wlen = wlens(d)
        val covered = new Array[Boolean](toks.length)
        GopherRepetition.TopGramThresholds.foreach { case (n, _, _) =>
          s += oldTop(toks, n) }
        GopherRepetition.DupGramThresholds.foreach { case (n, _, _) =>
          s += oldDup(toks, wlen, n, covered) }
        d += 1
      }
      s
    }
    require(runNew() == runOld(), "A/B results differ")
    def bench(f: () => Long, r: Int): Double = {
      var x = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < r) { x += f(); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      if (x == Long.MinValue) println(x) // keep the JIT honest
      dt
    }
    bench(runNew _, reps / 4); bench(runOld _, reps / 4) // warm-up
    val tn = bench(runNew _, reps)
    val to = bench(runOld _, reps)
    println(f"[gram-bench] tokens=$tokensPerDoc docs=50 reps=$reps: " +
      f"interned=${tn}%.2f s strings=${to}%.2f s " +
      f"speedup=${to / tn}%.2fx (results equal)")
  }
}
