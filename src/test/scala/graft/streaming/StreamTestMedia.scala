package graft.streaming

/** Shared test-media builders for the streaming suites — ONE copy of the
  * d78 construction rule in plain bytes, so StreamImageDedupSpec and
  * StreamFeatureExtractSpec can never drift onto different corpora
  * (r18 review: they previously held verbatim copies).
  */
object StreamTestMedia {

  /** 9×8 grayscale BMP whose dHash-64 equals `bits` exactly: each row is
    * the luma walk from 128 stepping −10 on a 1-bit, +10 on a 0-bit
    * (the d78 construction's rule).
    */
  def bmpFor(bits: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(278)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(278).putInt(0).putInt(54)
    b.putInt(40).putInt(9).putInt(8).putShort(1).putShort(24)
    b.putInt(0).putInt(224).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (s <- 0 until 8) {
      val r = 7 - s // bottom-up storage
      var v = 128
      for (c <- 0 to 8) {
        if (c > 0)
          v += (if (((bits >> (r * 8 + c - 1)) & 1L) == 1L) -10 else 10)
        b.put(v.toByte).put(v.toByte).put(v.toByte)
      }
      b.put(0.toByte) // stride pad
    }
    b.array()
  }

  /** Lowercase hex for feeding `unhex()` CSV fixtures (unhex is
    * case-insensitive). */
  def hex(bytes: Array[Byte]): String =
    bytes.map(x => f"${x & 0xff}%02x").mkString
}
