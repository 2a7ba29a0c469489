package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-digest identifiers.
  *
  * The reference mints synthetic node/association ids as
  * `'b' + sha1(value)[1:20]` — Source.hash_id
  * (dipper/sources/Source.py:259-278) and the identical
  * GraphUtils.digest_id (dipper/utils/GraphUtils.py:137-149); association
  * ids digest `definedby+sub+pred+obj(+attrs)` joined with `+`
  * (dipper/models/assoc/Association.py:260-290).
  *
  * Content digests (not `monotonically_increasing_id`) are the only id
  * scheme that stays deterministic across partitions, retries, and
  * cluster sizes — load-bearing at 100 TB. All forms below are pure
  * Catalyst builtins (`sha1`/`md5`/`substring`/`concat_ws`), fully
  * codegen'd, no UDF.
  */
object Digest {

  /** Reference-faithful id: 'b' + sha1(hex)[1:20] (19 hex chars). */
  def sha1Id(c: Column): Column = concat(lit("b"), substring(sha1(c), 2, 19))

  /** md5 variant with the same shape — used where the correctness oracle
    * (DuckDB 1.0, which lacks sha1) must reproduce the id. */
  def md5Id(c: Column): Column = concat(lit("b"), substring(md5(c), 2, 19))

  /** Association id: digest of definedBy+sub+pred+obj(+attributes),
    * `+`-joined, mirroring Association.make_association_id. */
  def assocId(definedBy: String, sub: Column, pred: Column, obj: Column,
              attrs: Column*): Column =
    sha1Id(concat_ws("+", (lit(definedBy) +: sub +: pred +: obj +: attrs): _*))

  def assocIdMd5(definedBy: String, sub: Column, pred: Column, obj: Column,
                 attrs: Column*): Column =
    md5Id(concat_ws("+", (lit(definedBy) +: sub +: pred +: obj +: attrs): _*))

  private val hexChars = "0123456789abcdef".toCharArray

  // 'b' + hex[1:20] without per-byte String.format (measured ~16 µs per
  // digest for the format form — it dominated the per-fish assembly tier,
  // which mints several digests per group)
  private def idFromDigest(bytes: Array[Byte]): String = {
    val out = new Array[Char](20)
    out(0) = 'b'
    var i = 0
    while (i < 10) { // hex chars 1..20 come from bytes 0..9
      val b = bytes(i) & 0xff
      val hi = hexChars(b >>> 4)
      val lo = hexChars(b & 0xf)
      // hex index h lands at out(h); keep h in [1, 19] ('b' + hex[1:20])
      if (2 * i >= 1) out(2 * i) = hi
      out(2 * i + 1) = lo // 2i+1 ∈ [1, 19] for i ∈ [0, 9]
      i += 1
    }
    new String(out, 0, 20)
  }

  /** Plain-Scala sha1 form, for emitters that run as `Row => Seq[Triple]`
    * flatMap functions and for golden tests. */
  def sha1IdScala(value: String): String =
    idFromDigest(java.security.MessageDigest.getInstance("SHA-1")
      .digest(value.getBytes("UTF-8")))

  def assocIdScala(definedBy: String, parts: String*): String =
    sha1IdScala((definedBy +: parts).mkString("+"))

  /** md5 twin of [[sha1IdScala]] (see [[md5Id]] for why it exists). */
  def md5IdScala(value: String): String =
    idFromDigest(java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes("UTF-8")))

  def assocIdScalaMd5(definedBy: String, parts: String*): String =
    md5IdScala((definedBy +: parts).mkString("+"))
}
