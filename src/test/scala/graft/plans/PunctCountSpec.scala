package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native punct counter must be BIT-IDENTICAL to the legacy
  * `length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", ""))` — the
  * quality oracle derives from that chain's semantics.
  */
class PunctCountSpec extends SparkSpec {
  import spark.implicits._

  private def legacy(c: org.apache.spark.sql.Column) =
    length(regexp_replace(c, "[^!-/:-@\\[-`{-~]", ""))

  private val cases = Seq(
    "plain words only",
    "punctuation!@#$%^&*()[]{};:,.<>?/|\\~`\"=+_-",
    "",
    "   ",
    "a.b,c;d:e",
    "!start and end!",
    // every boundary char of the four ranges
    "! / : @ [ ` { ~",
    "\" . ; ? \\ _ | }",
    // chars just OUTSIDE the ranges: space(32) 0(48) 9(57) A(65)
    // Z(90) a(97) z(122) DEL(127)
    " 09AZaz",
    "digits 0123456789 are not punct",
    "Ünïcödé! wörds, höre.",
    "汉字。，！ ascii!",
    "emoji 😀! split 🎉? here",
    "x" * 5000,
    ("a.b " * 200).trim)

  test("native punct count equals the legacy regexp_replace chain " +
       "on ASCII, Unicode, and boundary inputs") {
    val rows = cases.toDF("t").select(
      graft.plans.PunctCount(col("t")).as("fast"),
      legacy(col("t")).as("slow")).collect()
    rows.zip(cases).foreach { case (r, in) =>
      assert(r.getInt(0) == r.getInt(1),
        s"input=${in.take(60)} fast=${r.getInt(0)} slow=${r.getInt(1)}")
    }
  }

  test("null propagates like the legacy chain") {
    val r = Seq[(Integer, String)]((1, null), (2, "a.b"))
      .toDF("i", "t")
      .select(graft.plans.PunctCount(col("t")).as("fast"),
        legacy(col("t")).as("slow")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getInt(0) == 1 && r(1).getInt(1) == 1)
  }

  test("full byte fuzz: 2000 strings over all ASCII + multibyte, " +
       "exact equality") {
    val rnd = new scala.util.Random(61)
    // sample SURROGATE-SAFE units (full strings), not chars — a lone
    // surrogate half has no defined UTF-8 round-trip
    val alphabet = (33 to 126).map(_.toChar.toString) ++
      Seq(" ", "\t", "\n", "汉", "é", "ß", "😀")
    val strs = (1 to 2000).map { _ =>
      val len = rnd.nextInt(60)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val bad = strs.toDF("t").select(
        graft.plans.PunctCount(col("t")).as("fast"),
        legacy(col("t")).as("slow"), col("t"))
      .collect().filter(r => r.getInt(0) != r.getInt(1))
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }
}
