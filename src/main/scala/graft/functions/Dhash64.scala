package graft.functions

/** The ONE definition of the dHash-64 bit rule (Krawetz 2013) over the
  * 9×8 luma cell grid every pixel decode downsamples to: bit k = r·8+c
  * is set iff cell (r,c) is strictly brighter than its right neighbor
  * (r,c+1). Shared by [[BmpDhash]] and [[PngDhash]] (and any future
  * format leg), so two decodes of the SAME pixels hash identically and
  * near-dup dedup works ACROSS container formats — the property the
  * image dedup family's cross-format contract rests on.
  */
object Dhash64 {
  /** `cells` is row-major 8×9 (72 longs of box-averaged integer luma). */
  def ofCells(cells: Array[Long]): Long = {
    var hash = 0L
    var k = 0
    while (k < 64) {
      val r = k / 8
      val c = k % 8
      if (cells(r * 9 + c) > cells(r * 9 + c + 1)) hash |= (1L << k)
      k += 1
    }
    hash
  }
}
