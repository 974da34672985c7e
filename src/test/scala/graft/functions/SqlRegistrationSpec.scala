package graft.functions

import graft.{SparkSpec, Tables}

/** The native Catalyst expressions registered into the session's
  * FunctionRegistry and invoked from SQL text (SURVEY.md §2.10 —
  * Expression > UDF, available to both APIs).
  */
class SqlRegistrationSpec extends SparkSpec {

  test("cosine_f32 / array_dot callable from spark.sql") {
    VectorExpressions.registerSql(spark)
    val r = spark.sql(
      """SELECT cosine_f32(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       array_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |                 array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS d""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 23.0) < 1e-12)
  }

  test("sha256_chunks callable from spark.sql, matches the builtin composition") {
    VectorExpressions.registerSql(spark)
    val r = spark.sql(
      """SELECT sha256_chunks('abc', 2)[0] AS h0,
        |       CAST(conv(substring(sha2('abc', 256), 1, 15), 16, 10) AS BIGINT) AS b0""".stripMargin)
      .head()
    assert(r.getLong(0) === r.getLong(1))
  }

  test("sha256_chunks rejects non-literal / null chunk counts at analysis") {
    VectorExpressions.registerSql(spark)
    // a column reference is not foldable — must be an analysis error with
    // a clear message, not an opaque runtime NPE/cast failure
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sha256_chunks('abc', id) FROM range(3)").collect()
    }
    assert(e1.getMessage.contains("integer literal"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sha256_chunks('abc', NULL)").collect()
    }
    assert(e2.getMessage.contains("integer literal"), e2.getMessage)
    // out-of-range literals are analysis errors too, not raw requires
    for (bad <- Seq("0", "5", "-1")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT sha256_chunks('abc', $bad)").collect()
      }
      assert(e.getMessage.contains("[1, 4]"), e.getMessage)
    }
  }

  test("registered function runs over a real table in SQL") {
    VectorExpressions.registerSql(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val n = spark.sql(
      "SELECT count(*) FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1 " +
        "WHERE cosine_f32(a.embedding, b.embedding) > -1.0").head().getLong(0)
    assert(n > 0)
  }
}
