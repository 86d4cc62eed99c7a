package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BloscLz

/** blosclz instruction-stream contract (`sources/BloscLz.scala`) — the
  * FastLZ-level-1 format pinned with HAND-BUILT streams (each byte derived
  * from the public format, so the decoder is checked against the spec, not
  * against the sibling encoder), plus encoder round-trips and adversarial
  * truncation/overrun cases.
  */
class BloscLzSpec extends AnyFunSuite {

  private def dec(stream: Array[Int], expect: Int): Array[Byte] = {
    val src = stream.map(_.toByte)
    val out = new Array[Byte](expect)
    BloscLz.decompress(src, 0, src.length, out, 0, expect)
    out
  }

  private def rt(raw: Array[Byte]): Unit = {
    val comp = BloscLz.compress(raw, 0, raw.length)
    val out = new Array[Byte](raw.length)
    BloscLz.decompress(comp, 0, comp.length, out, 0, raw.length)
    assert(out.sameElements(raw))
  }

  test("KAT: pure literal runs (including the 32-byte cap)") {
    // ctrl 4 -> 5 literals
    assert(dec(Array(4, 'h', 'e', 'l', 'l', 'o'), 5)
      .sameElements("hello".getBytes))
    // 33 literals must be 32 (ctrl 31) + 1 (ctrl 0)
    val in = Array.tabulate(33)(i => i + 1)
    assert(dec((31 +: in.take(32)) ++ Array(0, in(32)), 33)
      .sameElements(in.map(_.toByte)))
  }

  test("KAT: short match, distance-1 RLE overlap") {
    // 'a' then match T=6 D=1: l3 = T-2 = 4 -> ctrl 4<<5 = 128, code 0
    assert(dec(Array(0, 'a', 128, 0), 7).sameElements("aaaaaaa".getBytes))
    // "abc" then T=5 D=3 -> l3=3 ctrl 96, code=D-1=2 => "abcabcab"
    assert(dec(Array(2, 'a', 'b', 'c', 96, 2), 8)
      .sameElements("abcabcab".getBytes))
  }

  test("KAT: extended length (l3 = 7, 255-continuation)") {
    // 'x' + match D=1 T=300: ctrl 7<<5 = 224, ext bytes sum to T-9=291
    // = 255 + 36, then code 0
    val out = dec(Array(0, 'x', 224, 255, 36, 0), 301)
    assert(out.forall(_ == 'x'.toByte))
    // exact boundary T=9: single ext byte 0
    assert(dec(Array(0, 'y', 224, 0, 0), 10).forall(_ == 'y'.toByte))
  }

  test("KAT: near-offset high bits and the far escape") {
    // literal 300 bytes (0..255,0..43), then T=3 match at D=260:
    // D-1 = 259 = 1*256 + 3 -> ctrl (1<<5)|1 = 33, code 3
    val lits = Array.tabulate(300)(i => i % 256)
    val stream = (31 +: lits.take(32)) ++
      lits.slice(32, 300).grouped(32).flatMap(g => (g.length - 1) +: g) ++
      Array(33, 3)
    val out = dec(stream.toArray, 303)
    assert(out.take(300).sameElements(lits.map(_.toByte)))
    assert((300 until 303).forall(i => out(i) == out(i - 260)))

    // FAR escape: build 9000 bytes, then match T=5 at D=8500:
    // l3 = 3 -> ctrl (3<<5)|31 = 127, code 255, o = D-8192 = 308 = 0x0134
    val big = Array.tabulate(9000)(i => (i * 7 + i / 13) % 256)
    val bigLits = big.grouped(32).flatMap(g => (g.length - 1) +: g).toArray
    val out2 = dec(bigLits ++ Array(127, 255, 0x01, 0x34), 9005)
    assert((9000 until 9005).forall(i => out2(i) == out2(i - 8500)))

    // D = 8192 itself must use the far form with o = 0
    val big2 = Array.tabulate(8192)(i => (i * 3) % 251)
    val big2Lits = big2.grouped(32).flatMap(g => (g.length - 1) +: g).toArray
    val out3 = dec(big2Lits ++ Array(127, 255, 0, 0), 8197)
    assert((8192 until 8197).forall(i => out3(i) == out3(i - 8192)))

    // code 255 with ofsHigh != 31 is a NEAR match, NOT the escape:
    // D-1 = 255 -> ctrl (1<<5)|0 = 32, code 255 -> T=3 at D=256
    val lits2 = Array.tabulate(256)(identity)
    val s2 = lits2.grouped(32).flatMap(g => (g.length - 1) +: g).toArray
    val out4 = dec(s2 ++ Array(32, 255), 259)
    assert((256 until 259).forall(i => out4(i) == out4(i - 256)))
  }

  test("malformed streams fail loudly, never misdecode") {
    // truncated literal run
    assert(intercept[IllegalArgumentException](dec(Array(4, 'h'), 5))
      .getMessage.contains("truncated"))
    // match reaching before the stream's own output start
    assert(intercept[IllegalArgumentException](
      dec(Array(0, 'a', 128, 5), 7)).getMessage.contains("before"))
    // inflating past the declared size
    assert(intercept[IllegalArgumentException](
      dec(Array(0, 'a', 224, 255, 36, 0), 10)).getMessage
      .contains("past"))
    // deflating under the declared size
    assert(intercept[IllegalArgumentException](dec(Array(1, 'a', 'b'), 5))
      .getMessage.contains("inflated to"))
  }

  test("encoder round-trips structured, random, and pathological payloads") {
    rt("hello world, hello world, hello world".getBytes)
    rt(Array.fill(10000)('z'.toByte)) // pure RLE
    rt(Array.tabulate(1)(_ => 7.toByte)) // single byte
    rt(Array.tabulate(2)(i => i.toByte))
    // period straddling the near/far boundary: matches at D ~ 8192
    val period = 8192
    rt(Array.tabulate(3 * period + 117)(i => ((i % period) * 31 % 256).toByte))
    val rnd = new scala.util.Random(77)
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(50000)
      val raw = new Array[Byte](n)
      var i = 0
      while (i < n) {
        if (rnd.nextInt(3) == 0) raw(i) = rnd.nextInt(256).toByte
        else raw(i) = ((i / (1 + rnd.nextInt(3))) % 17).toByte
        i += 1
      }
      rt(raw)
    }
  }

  test("encoder output is deterministic for fixed input") {
    val raw = Array.tabulate(4096)(i => ((i * 13) % 97).toByte)
    val a = BloscLz.compress(raw, 0, raw.length)
    val b = BloscLz.compress(raw, 0, raw.length)
    assert(a.sameElements(b))
  }
}
