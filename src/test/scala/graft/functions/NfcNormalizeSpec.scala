package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NfcNormalizeSpec extends SparkSpec {

  import spark.implicits._

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(NfcNormalize(col("t")).as("n"))
      .as[String].collect().head

  test("composes base + combining mark sequences to precomposed forms") {
    assert(nfc("café") == "café")
    assert(nfc("ö å") == "ö å")
  }

  test("precomposed and ASCII inputs are fixpoints") {
    assert(nfc("café öl") == "café öl")
    assert(nfc("plain ascii text 42!") == "plain ascii text 42!")
    assert(nfc("") == "")
  }

  test("idempotent: nfc(nfc(x)) == nfc(x)") {
    val mixed = "Åbo café é́x"
    assert(nfc(nfc(mixed)) == nfc(mixed))
  }

  test("NFC only canonical-composes — compatibility chars survive") {
    // U+FB01 (ﬁ ligature) decomposes under NFKC but NOT under NFC.
    assert(nfc("ﬁn") == "ﬁn")
  }

  test("null propagates; non-BMP text round-trips") {
    val out = Seq[Option[String]](None, Some("a😀é"))
      .toDF("t").select(NfcNormalize(col("t")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0).isEmpty && out(1).contains("a😀é"))
  }
}
