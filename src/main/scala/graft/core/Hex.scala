package graft.core

/** Allocation-free lowercase hex — the per-byte `f"$b%02x"` Formatter
  * pattern costs a java.util.Formatter instantiation per BYTE, which inside
  * the md5-minhash hot loops (k × shingles digests per document) dominates
  * the kernel it was supposed to speed up.
  */
object Hex {
  private val digits = "0123456789abcdef".toCharArray

  def lower(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = digits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = digits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
