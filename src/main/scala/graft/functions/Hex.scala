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
    // ASCII-only digit parse: Character.digit also accepts fullwidth
    // A–F and non-ASCII Unicode digits (CJK IME / spreadsheet paste),
    // which would silently decode into filter bytes instead of failing
    // the "strict by design" contract
    def nib(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    var i = 0
    while (i < out.length) {
      val hi = nib(h.charAt(2 * i))
      val lo = nib(h.charAt(2 * i + 1))
      if (hi < 0 || lo < 0)
        throw new IllegalArgumentException(
          s"non-hex character at offset ${2 * i} in '$s'")
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }
}
