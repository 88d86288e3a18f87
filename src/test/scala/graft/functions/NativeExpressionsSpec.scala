package graft.functions

import graft.SparkSpec
import graft.cdc.MongoChangelog
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim is registered in SQL and the Column API") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head().getDouble(0)
    assert(r == 1.0)
  }

  test("cosine_sim equals the fold form bit-for-bit on random float vectors") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
    val diff = pairs.select(
      Similarity.cosine(col("a.embedding"), col("b.embedding")).as("nat"),
      Similarity.cosineFold(col("a.embedding"), col("b.embedding")).as("fold"))
      .filter(col("nat") =!= col("fold")) // exact double inequality
    assert(diff.count() == 0)
  }

  test("cosine_sim null semantics: null array, length mismatch, null element") {
    val r = spark.sql(
      """SELECT
        |  cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))),
        |  cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))
        |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("cosine_sim rejects non-array inputs at analysis time") {
    intercept[Exception](spark.sql("SELECT cosine_sim(1, 2)").collect())
  }

  test("cosine_sim zero-norm vectors -> NULL (fold form throws under ANSI)") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))")
      .head()
    assert(r.isNullAt(0))
    // the composed-builtin fold hits ANSI divide-by-zero instead — the
    // native expression is strictly more robust on degenerate vectors
    intercept[Exception] {
      spark.sql("SELECT array(CAST(0.0 AS FLOAT)) AS za, array(CAST(1.0 AS FLOAT)) AS b")
        .select(Similarity.cosineFold(col("za"), col("b"))).collect()
    }
  }

  test("bson_normalize matches the UDF walker on wrapper-rich documents") {
    val docs = Seq(
      """{"_id":{"$oid":"abc"},"n":{"$numberLong":"42"},"nested":{"b":{"$numberInt":"5"}},"tags":["x",{"$numberLong":"5"}],"z":null}""",
      """{"b1":{"$binary":"AAEC"},"b2":{"$binary":{"base64":"AwQF","subType":"00"}},"r":{"$regex":"^a","$options":"i"}}""")
      .toDF("doc")
    val both = docs.select(
      call_function("bson_normalize", col("doc")).as("native"),
      MongoChangelog.normalizeUdf(col("doc")).as("viaUdf"))
      .collect()
    both.foreach { r =>
      assert(r.getAs[Map[String, String]]("native") == r.getAs[Map[String, String]]("viaUdf"))
    }
  }

  test("bson_normalize works from plain SQL") {
    val m = spark.sql("""SELECT bson_normalize('{"a":{"$oid":"ff"}}') AS m""")
      .head().getAs[Map[String, String]]("m")
    assert(m == Map("a" -> "ff"))
  }
}
