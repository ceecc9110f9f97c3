package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins the engine-wide `events.ts` load contract: epoch-NANOSECOND
  * BIGINT out of `Graft.table`, whatever the fixture's physical
  * parquet unit. The driver regenerated the fixture once already
  * (TIMESTAMP(NANOS) → timestamp[us], round 7), silently breaking
  * every ts consumer — this suite reads one hand-built file of each
  * layout and asserts value-identical results so the next layout
  * change fails HERE, not as 11 oracle mismatches.
  */
class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  // instants chosen on exact microsecond boundaries so both physical
  // units represent the same point in time (a sub-us ns value cannot
  // exist in a us-layout file by construction)
  private val instantsNs =
    Seq(1700000000123456000L, 0L, -1000L, 4102444800000001000L)

  private def writeNanosLayout(dir: String): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageTypeParser}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.Types
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
        .named("ts")
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/part-0.parquet"))
      .withConf(conf).build()
    val f = new SimpleGroupFactory(schema)
    try instantsNs.zipWithIndex.foreach { case (ns, i) =>
      writer.write(f.newGroup().append("event_id", i.toLong).append("ts", ns))
    } finally writer.close()
  }

  // ntz=false: timestamp[us] with UTC adjustment (TimestampType);
  // ntz=true: tz-NAIVE timestamp[us] (TimestampNTZType) — the layout
  // the round-7 driver fixture actually uses (pyarrow tz=None), whose
  // normalization depends on the UTC session zone during the
  // NTZ→Timestamp cast
  private def writeMicrosLayout(dir: String, ntz: Boolean): Unit = {
    val ts = timestamp_micros(col("us"))
    instantsNs.zipWithIndex
      .map { case (ns, i) => (i.toLong, ns / 1000) }
      .toDF("event_id", "us")
      .select(col("event_id"),
        (if (ntz) ts.cast("timestamp_ntz") else ts).as("ts"))
      .write.mode("overwrite").parquet(dir)
  }

  test("ts arrives as epoch-ns BIGINT from NANOS, MICROS and MICROS-NTZ layouts") {
    val base = java.nio.file.Files.createTempDirectory("graft-tslayout").toString
    writeNanosLayout(s"$base/ns/events.parquet")
    writeMicrosLayout(s"$base/us/events.parquet", ntz = false)
    writeMicrosLayout(s"$base/us_ntz/events.parquet", ntz = true)
    val expected = instantsNs.zipWithIndex.map { case (ns, i) => i.toLong -> ns }
    // guard the guard: the naive layout must actually read back as
    // NTZ, or this spec silently stops covering the live fixture path
    assert(spark.read.parquet(s"$base/us_ntz/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    for (layout <- Seq("ns", "us", "us_ntz")) {
      val df = Graft.table(spark, s"$base/$layout", "events")
      assert(df.schema("ts").dataType == LongType,
        s"$layout layout: ts must load as BIGINT ns")
      val got = df.select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
      assert(got == expected, s"$layout layout: ts values drifted")
    }
  }

  test("tables without a ts column or with a non-timestamp ts pass through untouched") {
    val base = java.nio.file.Files.createTempDirectory("graft-tsnone").toString
    Seq((1L, "a")).toDF("id", "name")
      .write.parquet(s"$base/plain.parquet")
    assert(Graft.table(spark, base, "plain").columns.toSeq == Seq("id", "name"))
    // a LongType ts (what nanosAsLong yields, or an already-converted
    // export) must not be double-converted
    Seq((1L, 42L)).toDF("id", "ts").write.parquet(s"$base/longts.parquet")
    val row = Graft.table(spark, base, "longts").collect().head
    assert(row.getLong(1) == 42L)
  }
}
