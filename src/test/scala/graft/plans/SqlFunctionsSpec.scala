package graft.plans

import graft.SparkSpec

class SqlFunctionsSpec extends SparkSpec {

  test("native expressions are callable from SQL text after registration") {
    SqlFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |  hyperplane_sig(array(1.0F, -2.0F, 0.5F), 8) AS sig,
        |  word_shingles('a b c d', 3) AS sh,
        |  word_shingles('x y x y', 2, true) AS shd,
        |  sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS ic,
        |  int8_dot(array(CAST(3 AS TINYINT), CAST(-2 AS TINYINT)),
        |           array(CAST(10 AS TINYINT), CAST(5 AS TINYINT))) AS i8,
        |  unicode_normalize('café') AS nfc,
        |  unicode_normalize('\uff21', 'NFKC') AS nfkc
        |""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    // same signature the Column API computes
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaColumn = Seq(Seq(1.0f, -2.0f, 0.5f)).toDF("v")
      .select(graft.functions.Similarity.hyperplaneSig(col("v"), 8))
      .collect().head.getLong(0)
    assert(r.getLong(1) == viaColumn)
    assert(r.getSeq[String](2) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](3) == Seq("x y", "y x"))
    assert(r.getInt(4) == 2)
    assert(r.getLong(5) == 20L) // 3*10 + (-2)*5
    assert(r.getString(6) == "caf\u00e9")
    assert(r.getString(7) == "A")
  }

  test("bad arity / non-literal params fail at registration-time analysis") {
    SqlFunctions.registerAll(spark)
    intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0F))").collect()
    }
    intercept[Exception] {
      // bits must be a literal, not a column
      spark.sql("SELECT hyperplane_sig(array(1.0F), CAST(id AS INT)) FROM range(1)")
        .collect()
    }
  }
}
