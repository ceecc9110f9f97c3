package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecordsSpec extends SparkSpec {
  import spark.implicits._

  test("CSV record codec round-trips against a DDL schema") {
    val df = Seq("1,alice,2.5", "2,bob,3.5").toDF("line")
    val parsed = df.select(
      Records.fromCsv($"line", "id BIGINT, name STRING, score DOUBLE").as("r"))
    val got = parsed.select("r.id", "r.name", "r.score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "alice", 2.5), (2L, "bob", 3.5)))
    val back = parsed.select(Records.toCsv($"r").as("line"))
      .collect().map(_.getString(0)).toSeq
    assert(back == Seq("1,alice,2.5", "2,bob,3.5"))
  }

  test("JSON record codec parses typed fields") {
    val df = Seq("""{"k": 7, "tag": "x"}""").toDF("j")
    val got = df.select(Records.fromJson($"j", "k INT, tag STRING").as("r"))
      .select("r.k", "r.tag").collect().head
    assert((got.getInt(0), got.getString(1)) == (7, "x"))
  }

  test("XML record codec parses a simple record") {
    val df = Seq("<rec><k>5</k><tag>y</tag></rec>").toDF("x")
    val got = df.select(Records.fromXml($"x", "k INT, tag STRING").as("r"))
      .select("r.k", "r.tag").collect().head
    assert((got.getInt(0), got.getString(1)) == (5, "y"))
  }

  test("malformed records yield null structs (skip-bad-records composes)") {
    val df = Seq("1,ok,2.0", "not-a-record").toDF("line")
    val parsed = df.select($"line",
      Records.fromCsv($"line", "id BIGINT, name STRING, score DOUBLE").as("r"))
    // permissive mode: malformed -> struct with nulls; route via filter
    val bad = parsed.filter($"r.id".isNull).count()
    assert(bad == 1)
  }
}
