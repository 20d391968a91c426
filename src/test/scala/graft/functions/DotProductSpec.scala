package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductSpec extends SparkSpec {

  import spark.implicits._

  test("known values, float and mixed float/double inputs") {
    val out = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("d"),
        DotProduct(col("a"), col("a")).as("aa"))
      .as[(Double, Double)].head()
    assert(out == ((32.0, 14.0)))
  }

  test("null array yields null") {
    val out = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("d"))
      .collect().head
    assert(out.isNullAt(0))
  }

  test("matches the interpreted aggregate(zip_with) fold bit-for-bit on real embeddings") {
    val e = graft.ops.Tables(spark, sfDir, "embeddings").limit(50)
    val mismatch = e.as("a").crossJoin(e.as("b"))
      .select(
        DotProduct(col("a.embedding"), col("b.embedding")).as("native"),
        aggregate(zip_with(col("a.embedding"), col("b.embedding"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("folded"))
      .filter(col("native") =!= col("folded"))
      .count()
    assert(mismatch == 0)
  }

  test("SQL-registered as vec_dot and codegen'd") {
    val v = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(v == 11.0)
  }
}
