package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age_band, disease): zip 10001 x a has 3 rows (2 diseases),
  // zip 10001 x b has 1 row, zip 10002 x a has 2 rows (1 disease)
  private val tbl = Seq(
    ("10001", "a", "flu"), ("10001", "a", "flu"), ("10001", "a", "cold"),
    ("10001", "b", "flu"),
    ("10002", "a", "cold"), ("10002", "a", "cold")).toDF(
    "zip", "age_band", "disease")

  test("kAnonymityViolations names classes under k with sizes") {
    val got = Privacy.kAnonymityViolations(tbl, Seq($"zip", $"age_band"),
        k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("10001", "b", 1L), ("10002", "a", 2L)))
    assert(Privacy.kAnonymityViolations(tbl, Seq($"zip", $"age_band"),
      k = 2).count() == 1)
  }

  test("kAnonymityReport summarizes the class distribution") {
    val r = Privacy.kAnonymityReport(tbl, Seq($"zip", $"age_band"), k = 3)
      .collect()
    assert(r.length == 1)
    // 3 classes, smallest = 1, rows below k=3: 1 + 2 of 6 -> 50%
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getDouble(3)) == ((3L, 1L, 3L, 50.0)), r(0).toString)
    // no violations: below-k counts are zero, not null
    val clean = Privacy.kAnonymityReport(tbl, Seq(lit(1).as("g")), k = 2)
      .collect()(0)
    assert(clean.getLong(2) == 0L && clean.getDouble(3) == 0.0)
  }

  test("lDiversityViolations flags single-valued sensitive classes") {
    val got = Privacy.lDiversityViolations(tbl, Seq($"zip", $"age_band"),
        $"disease", l = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // 10001/b: 1 row 1 value; 10002/a: 2 rows but 1 value (the
    // homogeneity leak k-anonymity misses)
    assert(got == Set(("10001", "b", 1L, 1L), ("10002", "a", 2L, 1L)))
  }
}
