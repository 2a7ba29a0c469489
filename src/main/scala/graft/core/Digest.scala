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

  /** Plain-Scala sha1 form, for emitters that run as `Row => Seq[Triple]`
    * flatMap functions and for golden tests. */
  def sha1IdScala(value: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
    val hex = d.digest(value.getBytes("UTF-8")).map("%02x".format(_)).mkString
    "b" + hex.substring(1, 20)
  }

  def assocIdScala(definedBy: String, parts: String*): String =
    sha1IdScala((definedBy +: parts).mkString("+"))

  /** md5 twin of [[sha1IdScala]] (see [[md5Id]] for why it exists). */
  def md5IdScala(value: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(value.getBytes("UTF-8")).map("%02x".format(_)).mkString
    "b" + hex.substring(1, 20)
  }

  def assocIdScalaMd5(definedBy: String, parts: String*): String =
    md5IdScala((definedBy +: parts).mkString("+"))
}
