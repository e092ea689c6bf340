package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The shared 128-bit accumulator guard: overflow must be detected
  * against the addend's REAL high word — the hi + carry intermediate
  * can itself wrap and mask a genuine overflow near ±2^127. */
class Add128Spec extends AnyFunSuite {

  test("carry-wrapped high word near +2^127 still throws") {
    // buf = 2^64−1; addend = MaxValue·2^64 + 1 → true sum = 2^127.
    // The low-word carry makes hi + carry wrap to MinValue, the exact
    // corrupted-operand case the old guard let through silently.
    val buf = Array(0L, -1L, 0L)
    intercept[ArithmeticException] {
      Int128Sum.add128(buf, Long.MaxValue, 1L, "test")
    }
  }

  test("legitimate carry across zero does not throw") {
    val buf = Array(-1L, -1L, 0L) // value −1 (hi = −1, lo = 2^64−1)
    Int128Sum.add128(buf, 0L, 1L, "test") // −1 + 1 = 0
    assert(buf(0) === 0L)
    assert(buf(1) === 0L)
  }

  test("plain high-word overflow still throws") {
    val buf = Array(Long.MaxValue, 0L, 0L)
    intercept[ArithmeticException] { Int128Sum.add128(buf, 1L, 0L, "test") }
  }

  test("negative overflow past −2^127 throws") {
    val buf = Array(Long.MinValue, 0L, 0L)
    intercept[ArithmeticException] { Int128Sum.add128(buf, -1L, 0L, "test") }
  }
}
