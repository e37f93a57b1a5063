package graft.curve

/** Space-filling-curve kernels.
  *
  * The reference delegates curve computation to engine internals (Delta
  * `OPTIMIZE ... ZORDER BY`, reference: lakehouse_op/delta_write_layout.py:206-219;
  * Hudi `hoodie.clustering.layout.optimize.strategy ∈ {z-order, hilbert}`,
  * reference: lakehouse_op/hudi_write_layout.py:111-115; Iceberg
  * `rewrite_data_files(sort_order => 'zorder(...)')`, reference:
  * lakehouse_op/iceberg_write_layout.py:251-265). No lakehouse-format jars are
  * available here, so these kernels are the custom core.
  *
  * Both curves map a point in `[0, 2^bits)^n` to a single Long index whose
  * sort order induces the clustering. `n * bits` must be <= 63 so the index
  * fits a signed Long without wrapping.
  *
  * Hilbert uses the transpose algorithm from John Skilling, "Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 381 (2004) — a published, public
  * algorithm (also the basis of Hudi's HilbertCurveUtils).
  */
object Curves {

  /** Max usable bits per dimension for n dimensions (63-bit budget). */
  def bitsFor(n: Int): Int = math.min(63 / math.max(n, 1), 21)

  // ---------------------------------------------------------------- Z-order

  /** Morton/Z-value: interleave the low `bits` bits of each coordinate.
    * Bit (bits-1) of coords(0) becomes the MSB of the result, then bit
    * (bits-1) of coords(1), ..., down to bit 0 of coords(n-1).
    */
  def zValue(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < n) {
        out = (out << 1) | ((coords(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    out
  }

  /** Inverse of [[zValue]] (for tests). */
  def zInverse(z: Long, n: Int, bits: Int): Array[Long] = {
    val coords = new Array[Long](n)
    var pos = n * bits - 1
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < n) {
        coords(i) |= ((z >>> pos) & 1L) << b
        pos -= 1
        i += 1
      }
      b -= 1
    }
    coords
  }

  // ---------------------------------------------------------------- Hilbert

  /** Hilbert index of a point (Skilling's transpose algorithm).
    * Does not mutate its input.
    */
  def hilbertValue(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    if (n == 1) return coords(0)
    val x = coords.clone()
    // Axes -> transpose: inverse-undo excess work, then Gray encode.
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p // invert low bits of axis 0
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) { if ((x(n - 1) & q) != 0L) t ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // Pack the transposed form: bit b of x(i) is bit (b*n + (n-1-i)) of H.
    zValue(x, bits)
  }

  /** Inverse Hilbert: index -> point (for tests; Skilling transpose-to-axes). */
  def hilbertInverse(h: Long, n: Int, bits: Int): Array[Long] = {
    if (n == 1) return Array(h)
    val x = zInverse(h, n, bits)
    // Gray decode
    var t = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // Undo excess work
    var q = 2L
    while (q != (1L << bits)) {
      val p = q - 1L
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t2 = (x(0) ^ x(i)) & p; x(0) ^= t2; x(i) ^= t2 }
        i -= 1
      }
      q <<= 1
    }
    x
  }

  // ------------------------------------------------------------- Normalize

  /** Linearly scale a double in [min,max] to an integer in [0, 2^bits).
    * Degenerate domains (min==max, NaN) map to 0; values are clamped, so
    * out-of-range inputs (stale stats) stay valid curve coordinates.
    */
  def normalize(v: Double, min: Double, max: Double, bits: Int): Long = {
    val buckets = 1L << bits
    if (v.isNaN || max <= min) return 0L
    val frac = (v - min) / (max - min)
    val clamped = if (frac < 0d) 0d else if (frac > 1d) 1d else frac
    val b = (clamped * buckets).toLong
    if (b >= buckets) buckets - 1 else b
  }

  /** Equi-depth bucket index of v against sorted distinct cut points:
    * the count of cuts <= v, in [0, cuts.length]. Rank normalization for
    * curve coordinates — each bucket holds ~equal row mass regardless of
    * the value distribution, where min-max scaling lets a skewed column
    * collapse onto a few coordinates and waste its interleaved bits.
    */
  def bucketIndex(cuts: Array[Double], v: Double): Long = {
    if (v.isNaN) return 0L
    val ip = java.util.Arrays.binarySearch(cuts, v)
    if (ip >= 0) ip + 1L else -(ip + 1).toLong
  }
}
