package graft.tmp
import org.apache.spark.sql.functions._
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(master = "local[16]",
      shufflePartitions = 16, appName = "diag")
    val docs = spark.read.parquet("/root/repo/testdata/sf1/documents.parquet")
    val sigs = graft.functions.Dedup.simhashSignatures(docs,
      col("doc_id"), col("text")).localCheckpoint()
    println("n sigs: " + sigs.count())
    println("distinct sigs: " + sigs.select("sig").distinct.count())
    val widths = Seq(13, 13, 13, 13, 12)
    var off = 0
    val chunks = widths.zipWithIndex.map { case (w, i) =>
      val c = shiftrightunsigned(col("sig"), off)
        .bitwiseAND(lit((1L << w) - 1)).as(s"c$i")
      off += w; c }
    val ck = sigs.select((col("doc_id") +: chunks): _*)
    for (i <- 0 until 5) {
      val top = ck.groupBy(s"c$i").count.orderBy(desc("count")).limit(5).collect()
      println(s"chunk $i top buckets: " + top.map(_.getLong(1)).mkString(","))
    }
    val cl = sigs.groupBy("sig").count.orderBy(desc("count")).limit(5).collect()
    println("top identical-sig cliques: " + cl.map(_.getLong(1)).mkString(","))
    spark.stop()
  }
}
