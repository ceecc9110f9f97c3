package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types.StructType

/** Record I/O — the reference's DDL-compiled record codecs
  * (reference: src/core/org/apache/hadoop/record/ — `.jr` DDL →
  * generated classes with binary/CSV/XML serialization,
  * compiler in record/compiler/JRecord.java).
  *
  * Spark-native form: schemas are `StructType` DDL strings; codecs
  * are the built-in `from_csv/to_csv`, `from_json/to_json`,
  * `from_xml/to_xml` expressions — all codegen'd columnar, no
  * generated classes. Binary = the Encoder framework itself.
  */
object Records {

  /** `.jr`-style DDL → StructType (e.g.
    * `"k BIGINT, name STRING, vals ARRAY<DOUBLE>"`).
    */
  def schemaOf(ddl: String): StructType = StructType.fromDDL(ddl)

  /** Parse a CSV record column against a DDL schema. */
  def fromCsv(c: Column, ddl: String, sep: String = ","): Column =
    from_csv(c, schemaOf(ddl), Map("sep" -> sep))

  /** Serialize a struct to a CSV record. Whitespace-faithful: Spark's
    * CSV WRITE path defaults ignoreLeading/TrailingWhiteSpace=true
    * (silently trimming padded fields on serialization — the read
    * path's defaults are false), which breaks round-trip fidelity the
    * reference's record codecs guarantee.
    */
  def toCsv(c: Column, sep: String = ","): Column =
    to_csv(c, Map("sep" -> sep,
      "ignoreLeadingWhiteSpace" -> "false",
      "ignoreTrailingWhiteSpace" -> "false").asJava)

  /** Parse a JSON record column against a DDL schema. */
  def fromJson(c: Column, ddl: String): Column = from_json(c, schemaOf(ddl))

  def toJson(c: Column): Column = to_json(c)

  /** Parse an XML record column against a DDL schema. */
  def fromXml(c: Column, ddl: String): Column = from_xml(c, schemaOf(ddl))
}
