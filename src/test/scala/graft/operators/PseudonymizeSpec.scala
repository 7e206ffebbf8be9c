package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The keyed subject-token path must be REAL HMAC-SHA256 (RFC 2104),
  * not merely "some keyed hash": pin the builtin-composed column
  * (sha2/concat/unhex over ipad/opad literals) bit-for-bit against
  * javax.crypto.Mac, for short keys, an over-block (>64 byte) key, and
  * the keyless demo fallback. */
class PseudonymizeSpec extends SparkSuite {

  private def jceHmac(key: String, msg: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(msg.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def tokensFor(key: Option[String]): Map[Long, String] = {
    val s = spark
    import s.implicits._
    key match {
      case Some(k) => s.conf.set("graft.pseudonymize.hmacKey", k)
      case None => s.conf.unset("graft.pseudonymize.hmacKey")
    }
    try {
      val df = Seq(1L, 42L, 999999L).toDF("user_id")
        .select($"user_id", CdcBatch.subjectToken(s, $"user_id").as("tok"))
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    } finally s.conf.unset("graft.pseudonymize.hmacKey")
  }

  test("keyed token == javax.crypto HmacSHA256 (short key)") {
    val key = "per-tenant-secret-7"
    val got = tokensFor(Some(key))
    for (uid <- Seq(1L, 42L, 999999L))
      assert(got(uid) == jceHmac(key, uid.toString), s"uid=$uid")
  }

  test("keyed token == javax.crypto HmacSHA256 (key longer than the 64-byte block)") {
    val key = "x" * 97 // forces the RFC 2104 pre-hash of the key
    val got = tokensFor(Some(key))
    for (uid <- Seq(1L, 42L, 999999L))
      assert(got(uid) == jceHmac(key, uid.toString), s"uid=$uid")
  }

  test("keyless fallback is the documented demo md5 token (oracle-reproducible)") {
    assume(sys.env.get("GRAFT_PSEUDONYMIZE_KEY").isEmpty)
    val got = tokensFor(None)
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("tenant-salt:42".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(42L) == want)
  }
}
