package graft.util

import org.scalatest.funsuite.AnyFunSuite

class FormatSpec extends AnyFunSuite {
  test("bytes: binary units") {
    assert(Format.bytes(0) == "0 B")
    assert(Format.bytes(1023) == "1023 B")
    assert(Format.bytes(1536) == "1.50 KiB")
    assert(Format.bytes(3L * 1024 * 1024 * 1024) == "3.00 GiB")
    intercept[IllegalArgumentException](Format.bytes(-1))
  }

  test("duration: adaptive units") {
    assert(Format.duration(0.0005).endsWith("µs"))
    assert(Format.duration(0.75) == "750 ms")
    assert(Format.duration(1.5) == "1.50 s")
    assert(Format.duration(123.5) == "2 min 3.5 s")
    assert(Format.duration(3725) == "1 h 2 min")
  }
}
