package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The reference's base-50 id codec (code/Stage02CodifyIdxPatents.py:15-49):
  * positional encoding of a non-negative integer over its fixed 50-symbol
  * alphabet. The engine itself uses dense Long ids ([[Ids]]) — Parquet
  * dictionary-encodes them better and the verify kernel wants ints — but the
  * codec is provided so outputs can be rendered with byte-identical ids for
  * a user migrating off the reference's files.
  */
object Base50 {

  private val digits: Array[Char] =
    "0123456789abcdefghijklmnopqrstuvwxyz!@#$%&*()-_=+?".toCharArray
  require(digits.length == 50)

  def encode(n0: Long): String = {
    require(n0 >= 0, s"base50 undefined for negatives: $n0")
    if (n0 == 0) "0"
    else {
      val sb = new StringBuilder
      var n = n0
      while (n > 0) {
        sb.insert(0, digits((n % 50).toInt))
        n /= 50
      }
      sb.toString
    }
  }

  def decode(s: String): Long =
    s.foldLeft(0L)((acc, c) => acc * 50 + digits.indexOf(c).toLong)

  val encodeUdf = udf((n: Long) => encode(n))

  def encodeCol(c: Column): Column = encodeUdf(c)
}
