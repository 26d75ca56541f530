package graft.util

/** Human-readable size/duration formatting for profiler and pipeline
  * output (reference: src/pywrangler/util/_pprint.py:115-204
  * size/time formatters).
  */
object Format {

  private val SizeUnits = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB")

  /** 1536 -> "1.50 KiB" (binary units, two decimals). */
  def bytes(n: Long): String = {
    require(n >= 0, s"byte size must be non-negative: $n")
    var v = n.toDouble
    var i = 0
    while (v >= 1024 && i < SizeUnits.size - 1) { v /= 1024; i += 1 }
    if (i == 0) s"$n B" else f"$v%.2f ${SizeUnits(i)}"
  }

  /** Seconds -> adaptive "750 ms" / "1.50 s" / "2 min 3.5 s" / "1 h 2 min". */
  def duration(seconds: Double): String = {
    require(seconds >= 0, s"duration must be non-negative: $seconds")
    if (seconds < 1e-3) f"${seconds * 1e6}%.0f µs"
    else if (seconds < 1) f"${seconds * 1e3}%.0f ms"
    else if (seconds < 60) f"$seconds%.2f s"
    else if (seconds < 3600) {
      val m = (seconds / 60).toInt
      f"$m min ${seconds - m * 60}%.1f s"
    } else {
      val h = (seconds / 3600).toInt
      s"$h h ${((seconds - h * 3600) / 60).toInt} min"
    }
  }
}
