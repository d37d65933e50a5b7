package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash/shingle primitives that evaluate bit-identically in Spark and
  * in the DuckDB oracle, so sketch-based operators (minhash, simhash,
  * LSH) can be hash-compared across engines.
  *
  * The only portable hash both engines share is md5 over UTF-8; we
  * take the top 15 hex chars (60 bits, always positive in a signed
  * 64-bit long). Everything downstream is integer arithmetic, which
  * is exact in both engines.
  */
object Portable {

  /** 60-bit positive hash of a string column.
    * DuckDB equivalent: [[h60Sql]]. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def h60Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM-side twin of [[h60]] — THE single implementation every
    * driver/kernel-side consumer delegates to (WinnowFp's digest
    * loop, Multimodal's feature hash, spec recomputations). Byte-shift
    * form: the first 15 hex chars are the high nibbles of the first 8
    * digest bytes, so the value is the big-endian first-8-bytes long
    * shifted right 4 — no hex round-trip, thread-local digest, no
    * per-call allocation beyond the 16-byte digest. */
  def h60jvm(bytes: Array[Byte]): Long = {
    val digest = md5Local.get()
    digest.reset()
    val d = digest.digest(bytes)
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  def h60jvm(s: String): Long =
    h60jvm(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Universal-hash family over Z_p: h_i(x) = (a_i·x + b_i) mod p with
    * x already reduced mod p. a_i·x < p² ≈ 10¹⁸ stays inside a signed
    * 64-bit long in both engines. */
  val P: Long = 1000000007L
  def hashA(i: Int): Long = (2654435761L * (i + 1)) % P
  def hashB(i: Int): Long = (40503L * (i + 1) * (i + 7) + 12345L) % P

  /** Word w-shingles (here w=3) of a space-tokenised text column:
    * array of "w1 w2 w3" strings, one per starting offset.
    * DuckDB equivalent: [[shinglesSql]]. */
  def shingles(text: Column, w: Int = 3): Column = {
    val words = split(text, " ")
    // guard: sequence(0, n) DESCENDS when n < 0, so a doc with fewer
    // than w words would emit bogus negative offsets (and crash
    // slice); the oracle's range() yields [] there — match it
    when(size(words) >= w,
      transform(sequence(lit(0), size(words) - w),
        i => concat_ws(" ", slice(words, i + 1, lit(w)))))
      .otherwise(array().cast("array<string>"))
  }

  def shinglesSql(textExpr: String, w: Int = 3): String = {
    val ws = s"(str_split($textExpr, ' '))"
    s"[array_to_string($ws[i+1:i+$w], ' ') for i in range(len($ws) - ${w - 1})]"
  }
}
