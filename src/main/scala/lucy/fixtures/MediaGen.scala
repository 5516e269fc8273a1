package lucy.fixtures

/** Deterministic media fixtures for the multimodal decode path
  * (VERDICT r2 #4). Both formats are written from their PUBLIC
  * specifications (the Windows BMP file layout and the netpbm binary
  * PNM headers) so Multimodal.decodeDims can be verified against real
  * bytes without any media library in the container. Pixels are pure
  * functions of (x, y) — same bytes on every run and executor.
  */
object MediaGen {

  /** Minimal 24-bpp BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + rows padded to 4-byte multiples.
    * Total size = 54 + ceil(w*3/4)*4 * h.
    */
  def bmp(w: Int, h: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowSize * h
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(size).putShort(0).putShort(0).putInt(54) // file size, reserved, pixel offset
    b.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER: size, width, height
    b.putShort(1).putShort(24) // planes, bpp
    b.putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < rowSize) { b.put(((x * 31 + y * 7) & 0xFF).toByte); x += 1 }
      y += 1
    }
    b.array()
  }

  /** Binary PPM (P6) with a comment line in the header.
    * Total size = len("P6\n# lucy fixture\n<w> <h>\n255\n") + w*h*3.
    */
  def ppm(w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n# lucy fixture\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ Array.tabulate(w * h * 3)(i => ((i * 13) & 0xFF).toByte)
  }

  /** Binary PGM (P5), no comment. Total size = len header + w*h. */
  def pgm(w: Int, h: Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ Array.tabulate(w * h)(i => ((i * 7) & 0xFF).toByte)
  }
}
