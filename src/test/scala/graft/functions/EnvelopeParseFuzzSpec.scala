package graft.functions

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

import graft.SparkSpec
import graft.cdc.Decode
import graft.model.Envelope

/** Property fuzz: envelope_parse must agree with from_json on GENERATED
  * lines — valid envelopes with random field subsets/orders/values,
  * structurally surprising documents, and raw garbage. Seeded generators,
  * reproducible.
  */
class EnvelopeParseFuzzSpec extends SparkSpec {

  import spark.implicits._

  private val schema = Envelope.prunedLineSchema(Envelope.ordersPayload)

  private val jsonString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => "\"" + s + "\""),
    Gen.const("\"with \\\"escape\\\" and \\n newline\""),
    Gen.const("\"\""))

  private val jsonNumber: Gen[String] = Gen.oneOf(
    Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(_.toString),
    Gen.choose(-1e12, 1e12).map(d => f"$d%.6f"),
    Gen.const("99999999999999999999999999"),   // beyond long: coercion path
    Gen.const("1e309"),                        // beyond double: infinity
    Gen.const("3.5"),                          // float token on long fields
    Gen.const("0"), Gen.const("-1"))

  private def jsonValue(depth: Int): Gen[String] =
    if (depth <= 0) Gen.oneOf(jsonString, jsonNumber, Gen.const("null"),
      Gen.const("true"), Gen.const("false"))
    else Gen.oneOf(jsonString, jsonNumber, Gen.const("null"),
      jsonObject(depth - 1), jsonArray(depth - 1))

  private def jsonObject(depth: Int): Gen[String] = for {
    n <- Gen.choose(0, 4)
    keys <- Gen.listOfN(n, Gen.oneOf("id", "status", "totalprice", "op",
      "lsn", "ts_ms", "before", "after", "source", "value", "junk", "x"))
    vals <- Gen.listOfN(n, jsonValue(depth))
  } yield keys.zip(vals)
    .map { case (k, v) => "\"" + k + "\": " + v }.mkString("{", ", ", "}")

  private def jsonArray(depth: Int): Gen[String] = for {
    n <- Gen.choose(0, 3)
    vals <- Gen.listOfN(n, jsonValue(depth))
  } yield vals.mkString("[", ", ", "]")

  private val lineGen: Gen[String] = Gen.frequency(
    6 -> jsonObject(3),
    2 -> jsonValue(2),
    1 -> Gen.alphaNumStr,            // not JSON at all
    1 -> Gen.const("{\"value\""),    // truncated mid-object
    1 -> Gen.const(""))

  test("envelope_parse == from_json over 300 seeded random lines") {
    val params = Gen.Parameters.default
    val lines = (1 to 300).map(i =>
      lineGen.pureApply(params, org.scalacheck.rng.Seed(i.toLong)))
      .toDF("line")

    val a = Decode.parseLineColumn(lines, schema)
      .selectExpr("coalesce(to_json(value), '<null>') AS j")
      .as[String].collect().sorted
    val b = Decode.parseLineColumnNative(lines, schema)
      .selectExpr("coalesce(to_json(value), '<null>') AS j")
      .as[String].collect().sorted
    assert(a.length == b.length)
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i: jackson=$x native=$y")
    }
  }
}
