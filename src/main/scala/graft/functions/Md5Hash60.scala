package graft.functions

/** The repo's md5-60bit convention as ONE JVM-side implementation:
  * first 15 hex chars of the md5 digest (= top 60 bits) as a
  * non-negative long — the value DuckDB computes as
  * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)` and the Column
  * side computes as [[graft.ext.Dedup.md5Hash60]]. CountMin hashing
  * and the multimodal stub synthesis both delegate here, so the
  * convention cannot silently diverge between call sites (each
  * divergence would break a cross-engine hash-compare oracle).
  */
object Md5Hash60 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5 over the parts concatenated, first 8 digest bytes big-endian,
    * low nibble shifted out.
    */
  def of(parts: Array[Byte]*): Long = {
    val md = md5.get()
    md.reset()
    parts.foreach(md.update)
    val dig = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
