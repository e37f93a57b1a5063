package graft.curve

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style tests with a seeded generator (deterministic; no
  * scalatest-scalacheck bridge available offline).
  */
class CurvesSpec extends AnyFunSuite {

  private val Trials = 500

  private def randPoint(rnd: Random, n: Int, bits: Int): Array[Long] =
    Array.fill(n)(math.abs(rnd.nextLong()) % (1L << bits))

  test("zValue bijectivity: zInverse(zValue(p)) == p") {
    val rnd = new Random(42)
    for (n <- 1 to 4; _ <- 1 to Trials) {
      val bits = Curves.bitsFor(n)
      val p = randPoint(rnd, n, bits)
      assert(Curves.zInverse(Curves.zValue(p, bits), n, bits).toSeq == p.toSeq)
    }
  }

  test("zValue 2D known values (Morton)") {
    // (x=0b11, y=0b01) with x first: interleaved x1 y1 x0 y0 = 1 0 1 1
    assert(Curves.zValue(Array(3L, 1L), 2) == 0xBL)
    assert(Curves.zValue(Array(0L, 0L), 4) == 0L)
    assert(Curves.zValue(Array(15L, 15L), 4) == 255L)
  }

  test("hilbert bijectivity: hilbertInverse(hilbertValue(p)) == p") {
    val rnd = new Random(43)
    for (n <- 2 to 4; _ <- 1 to Trials) {
      val bits = Curves.bitsFor(n)
      val p = randPoint(rnd, n, bits)
      val h = Curves.hilbertValue(p, bits)
      assert(h >= 0, s"negative index for ${p.toSeq}")
      assert(Curves.hilbertInverse(h, n, bits).toSeq == p.toSeq)
    }
  }

  test("hilbert is a complete permutation of the grid (2D, 3 bits)") {
    val bits = 3; val side = 1 << bits
    val seen = Array.fill(side * side)(false)
    for (x <- 0 until side; y <- 0 until side) {
      val h = Curves.hilbertValue(Array(x.toLong, y.toLong), bits)
      assert(h >= 0 && h < side * side, s"index $h out of range for ($x,$y)")
      assert(!seen(h.toInt), s"collision at h=$h for ($x,$y)")
      seen(h.toInt) = true
    }
    assert(seen.forall(identity))
  }

  test("hilbert adjacency: consecutive indices are grid neighbors (2D,3D)") {
    for (n <- 2 to 3) {
      val bits = if (n == 2) 4 else 3
      val total = 1L << (n * bits)
      var h = 0L
      var prev = Curves.hilbertInverse(0L, n, bits)
      while (h < total - 1) {
        h += 1
        val cur = Curves.hilbertInverse(h, n, bits)
        val dist = prev.zip(cur).map { case (a, b) => math.abs(a - b) }.sum
        assert(dist == 1, s"n=$n h=$h not adjacent: ${prev.toSeq} -> ${cur.toSeq}")
        prev = cur
      }
    }
  }

  test("zValue locality: shared high coordinate bits share the index prefix") {
    val rnd = new Random(44)
    for (_ <- 1 to Trials) {
      val a = randPoint(rnd, 2, 16)
      val b = randPoint(rnd, 2, 16)
      val sharedHigh = 8
      val mask = ~((1L << (16 - sharedHigh)) - 1)
      val b2 = Array((a(0) & mask) | (b(0) & ~mask), (a(1) & mask) | (b(1) & ~mask))
      val za = Curves.zValue(a, 16) >>> (2 * (16 - sharedHigh))
      val zb = Curves.zValue(b2, 16) >>> (2 * (16 - sharedHigh))
      assert(za == zb)
    }
  }

  test("normalize maps domain into [0, 2^bits) with order preserved") {
    val rnd = new Random(45)
    for (_ <- 1 to Trials) {
      val a = rnd.nextDouble() * 2e6 - 1e6
      val b = rnd.nextDouble() * 2e6 - 1e6
      val v = rnd.nextDouble() * 2e6 - 1e6
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val x = Curves.normalize(v, lo, hi, 16)
      assert(x >= 0 && x < (1L << 16))
    }
    val xs = Seq(0.0, 1.0, 2.0, 50.0, 99.9, 100.0).map(Curves.normalize(_, 0, 100, 8))
    assert(xs == xs.sorted)
    assert(Curves.normalize(5.0, 7.0, 7.0, 8) == 0L) // degenerate domain
    assert(Curves.normalize(-10.0, 0.0, 100.0, 8) == 0L) // clamp low
    assert(Curves.normalize(1e9, 0.0, 100.0, 8) == 255L) // clamp high
    assert(Curves.normalize(Double.NaN, 0.0, 100.0, 8) == 0L)
  }

  test("bitsFor keeps total index width under 63 bits") {
    for (n <- 1 to 8) assert(n * Curves.bitsFor(n) <= 63)
  }

  test("StringCode prefix invariance: coding a pool equals coding the " +
      "same pool under any constant prefix") {
    import graft.layout.StringCode
    val rnd = new Random(46)
    def randId(): String =
      (1 to 3 + rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    for (_ <- 1 to Trials) {
      val pool = Seq.fill(12)(randId())
      val prefix = "B000" + (1 to rnd.nextInt(20)).map(_ => '0').mkString
      // the offsets a write derives: common prefix of the pool's min/max
      def skipOf(p: Seq[String]) = StringCode.commonPrefixLen(p.min, p.max)
      val raw = pool.map(StringCode.code(_, skipOf(pool)))
      val deep = pool.map(prefix + _)
      val viaDeep = deep.map(StringCode.code(_, skipOf(deep)))
      // identical codes value-for-value: the strip makes a constant
      // prefix invisible to the curve (results/rq1_amazon C1deep was
      // curves at 1x files-ratio before this)
      assert(raw == viaDeep,
        s"prefix '$prefix' changed codes\n raw=$raw\n deep=$viaDeep")
    }
    // ...and order is preserved within the shared-prefix pool
    val pool = Seq.fill(200)(randId()).distinct
    val skip = StringCode.commonPrefixLen(pool.min, pool.max)
    val sortedByCode = pool.sortBy(StringCode.code(_, skip))
    // code collisions (ids sharing their first skip+Width chars) keep
    // relative order unspecified; compare at code granularity
    assert(sortedByCode.map(StringCode.code(_, skip)) ==
      pool.sorted.map(StringCode.code(_, skip)))
  }

  test("StringCode.commonPrefixLen: edges — identical, disjoint, cap, " +
      "supplementary-plane code points") {
    import graft.layout.StringCode
    assert(StringCode.commonPrefixLen("", "") == 0)
    assert(StringCode.commonPrefixLen("abc", "abc") == 3)
    assert(StringCode.commonPrefixLen("abc", "abd") == 2)
    assert(StringCode.commonPrefixLen("abc", "xyz") == 0)
    assert(StringCode.commonPrefixLen("a" * 200, "a" * 200) == StringCode.MaxSkip)
    // one supplementary code point = TWO UTF-16 units but ONE position
    val g = new String(Character.toChars(0x1D11E)) // 𝄞
    assert(StringCode.commonPrefixLen(g + "ab", g + "ax") == 2)
    assert(StringCode.commonPrefixLen(g, "a") == 0)
  }
}
