package graft.functions

/** Canonical driver/executor-side hex codec shared by every plane that
  * moves bytes as text (wire-protocol query JSON, `filter.<col>` reader
  * options, Borsh discriminator specs). One implementation so the wire
  * client, the fixture server, and the pushdown option channel can never
  * disagree on byte encoding.
  *
  * Strict by design: `decode` rejects odd-length and non-hex input loudly
  * instead of silently misparsing ("abc" is NOT [0xab, 0x0c] — a truncated
  * topic0 must fail the query, not match the wrong events).
  */
object Hex {
  private val digits = "0123456789abcdef".toCharArray

  /** Lowercase hex, no prefix. */
  def encode(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = digits((b(i) >> 4) & 0xf)
      out(2 * i + 1) = digits(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def encode(b: Seq[Byte]): String = encode(b.toArray)

  /** Parse hex (optional "0x" prefix, case-insensitive). Fails loudly on
    * odd length or non-hex characters.
    */
  def decode(s: String): Array[Byte] = {
    val h = {
      val t = s.trim
      if (t.startsWith("0x") || t.startsWith("0X")) t.substring(2) else t
    }
    if (h.length % 2 != 0)
      throw new IllegalArgumentException(
        s"odd-length hex string (${h.length} chars): '$s'")
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(h.charAt(2 * i), 16)
      val lo = Character.digit(h.charAt(2 * i + 1), 16)
      if (hi < 0 || lo < 0)
        throw new IllegalArgumentException(
          s"non-hex character at offset ${2 * i} in '$s'")
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }
}
