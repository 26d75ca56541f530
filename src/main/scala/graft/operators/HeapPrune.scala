package graft.operators

/** The worst-first ordering shared by the map-side bounded-heap prunes
  * ([[Sampling.GroupTopK]] and `Similarity.ranked`): the dequeued
  * MAXIMUM under this ordering is the WORST kept row — lowest score,
  * ties broken by HIGHEST key (the final rank windows keep the lowest
  * key on score ties).
  *
  * The comparator reproduces Spark's SQL ordering bit-for-bit so the
  * prune is invisible with respect to the downstream `row_number`
  * window under ALL inputs: NaN sorts LARGEST (best — a zero-norm
  * cosine is legitimate data) and -0.0 == 0.0 (Spark normalizes signed
  * zero). A negated-tuple ordering gets BOTH wrong — NaN negates to
  * NaN (worst instead of best) and zero flips sign — which is how the
  * round-9 ADVICE class slipped into two operators independently; one
  * shared instance keeps the contract in one place.
  */
private[graft] object HeapPrune {
  /** Entries are `(key, score)`. */
  val worstFirstByScore: Ordering[(Long, Double)] =
    new Ordering[(Long, Double)] {
      private def norm(d: Double): Double = if (d == 0.0) 0.0 else d
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(norm(b._2), norm(a._2))
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
}
