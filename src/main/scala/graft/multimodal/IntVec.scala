package graft.multimodal

/** Growable primitive `Int` buffer for codec sample accumulation.
  *
  * `ArrayBuffer[Int]` boxes every element (~16-20 bytes each on a 64-bit
  * JVM), so accumulating toward the shared 1<<27-sample allocation cap
  * could transiently allocate multiple GB of `java.lang.Integer` before
  * the cumulative cap check trips — an OutOfMemoryError that escapes the
  * callers' `catch Exception` guards. This buffer stores 4 bytes per
  * sample in a doubling `Array[Int]`, so the worst-case footprint at the
  * cap is the 512 MB the cap was designed to bound (and real payloads
  * stay far below it).
  */
final class IntVec(initialCapacity: Int = 16) {
  private var arr = new Array[Int](math.max(initialCapacity, 4))
  private var n = 0

  def length: Int = n
  def isEmpty: Boolean = n == 0

  private def ensure(extra: Int): Unit = {
    // long arithmetic: n + extra can overflow Int, and a need above the
    // max array size must throw (a catchable Exception), not clamp the
    // doubling loop into a spin that never reaches `need`
    val need = n.toLong + extra
    require(need <= Int.MaxValue - 8,
      s"IntVec: requested $need ints exceeds max array size")
    if (need > arr.length) {
      var cap = arr.length.toLong
      while (cap < need) cap = math.min(cap * 2, (Int.MaxValue - 8).toLong)
      arr = java.util.Arrays.copyOf(arr, cap.toInt)
    }
  }

  def +=(v: Int): this.type = { ensure(1); arr(n) = v; n += 1; this }

  /** Append `src(0 until len)`. */
  def addSlice(src: Array[Int], len: Int): this.type = {
    ensure(len); System.arraycopy(src, 0, arr, n, len); n += len; this
  }

  def toArray: Array[Int] = java.util.Arrays.copyOf(arr, n)
}
