package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-cover solver + distributed search (the reference's dancing
  * package). The pentomino counts asserted here are public record:
  * 6x10 has 2339 solutions up to the rectangle's symmetries (Dana
  * Scott's 1958 enumeration; the x-in-quadrant constraint picks one
  * orbit representative exactly), 3x20 has 2 up to symmetry — the
  * quadrant constraint only halves the horizontal axis on height-3
  * boards (x is always vertically centered), so the solver sees 4.
  */
class ExactCoverSpec extends SparkSpec {

  private def collectSolutions(m: ExactCover): Seq[Seq[Int]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
    m.solve(ids => out += ids.sorted.toSeq)
    out.toSeq
  }

  test("tiny matrix: all 4 exact covers found, each covers once") {
    // columns 0..2; rows r0={0} r1={1} r2={2} r3={0,1} r4={1,2} r5={0,1,2}
    val rows = Seq(Array(0), Array(1), Array(2), Array(0, 1),
      Array(1, 2), Array(0, 1, 2))
    val m = new ExactCover(3)
    rows.foreach(m.addRow)
    val sols = collectSolutions(m)
    assert(sols.size == 4)
    assert(sols.toSet == Set(Seq(0, 1, 2), Seq(0, 4), Seq(2, 3), Seq(5)))
    // every solution covers every column exactly once
    sols.foreach { s =>
      val covered = s.flatMap(rows(_))
      assert(covered.sorted == Seq(0, 1, 2))
    }
  }

  test("secondary columns: at most once, never branched on") {
    // primary {0}, secondary {1}: r0={0}, r1={0,1}, r2={1}
    val m = new ExactCover(1, numSecondary = 1)
    m.addRow(Array(0))
    m.addRow(Array(0, 1))
    m.addRow(Array(1))
    val sols = collectSolutions(m)
    // r2 covers only the secondary column — never selectable; the
    // secondary column may stay uncovered (r0) or be covered once (r1)
    assert(sols.toSet == Set(Seq(0), Seq(1)))
    // conflict through the secondary column: two rows sharing it
    val m2 = new ExactCover(2, numSecondary = 1)
    m2.addRow(Array(0, 2))
    m2.addRow(Array(1, 2))
    m2.addRow(Array(1))
    // {r0,r1} would cover secondary twice -> only {r0,r2} survives
    assert(collectSolutions(m2).toSet == Set(Seq(0, 2)))
  }

  test("split partitions the solution space exactly") {
    def model() = {
      val m = new ExactCover(3)
      Seq(Array(0), Array(1), Array(2), Array(0, 1), Array(1, 2),
        Array(0, 1, 2)).foreach(m.addRow)
      m
    }
    val full = collectSolutions(model())
    // depth 3 exceeds some solutions' depth ({r5} solves at level 1):
    // shallow-solution prefixes keep the partition exact anyway
    for (depth <- 1 to 3) {
      val splitter = model()
      val prefixes = splitter.split(depth)
      // one reused instance across prefixes (rollback must be exact)
      val viaPrefixes = prefixes.flatMap { p =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
        splitter.solveFrom(p, ids => out += ids.sorted.toSeq)
        out
      }
      assert(viaPrefixes.sortBy(_.mkString(",")) ==
        full.sortBy(_.mkString(",")), s"depth=$depth")
    }
  }

  test("maxSolutions guard fails loud on under-constrained models") {
    val m = new ExactCover(4)
    // every singleton + every pair: lots of covers
    (0 until 4).foreach(c => m.addRow(Array(c)))
    (0 until 4).foreach(a => (a + 1 until 4).foreach(b =>
      m.addRow(Array(a, b))))
    val e = intercept[IllegalArgumentException] {
      m.solve(_ => (), maxSolutions = 3)
    }
    assert(e.getMessage.contains("maxSolutions"))
  }

  test("pentomino 6x10: 2339 solutions (public), boards valid") {
    val spec = PentominoSpec(6, 10, oneSided = false)
    val boards = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = spec.build().solve(ids => boards += spec.render(ids))
    assert(n == 2339L)
    assert(boards.distinct.size == 2339)
    // every board: 60 cells, each of the 12 piece names exactly 5 times
    boards.take(50).foreach { b =>
      val cells = b.replace("\n", "")
      assert(cells.length == 60)
      val counts = cells.groupBy(identity).map { case (k, v) => k -> v.length }
      assert(counts.size == 12 && counts.values.forall(_ == 5), b)
    }
  }

  test("pentomino 3x20: 4 solver solutions (2 up to symmetry)") {
    val spec = PentominoSpec(3, 20, oneSided = false)
    assert(spec.build().solve(_ => ()) == 4L)
  }

  test("distributed pentomino equals the single-node solve") {
    val spec = PentominoSpec(6, 10, oneSided = false)
    val local = scala.collection.mutable.ArrayBuffer.empty[String]
    spec.build().solve(ids => local += spec.render(ids))
    val dist = Search.pentominoSolutions(spark, 6, 10, oneSided = false,
      depth = 2).select("board").collect().map(_.getString(0))
    assert(dist.length == 2339)
    assert(dist.toSet == local.toSet)
  }

  test("q_pentomino witness row is the constant oracle") {
    val row = Search.pentominoValidated(spark, 6, 10, oneSided = false,
      depth = 2).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((2339L, 2339L, 0L)))
  }

  test("pentomino categories partition the solutions") {
    val cats = Search.pentominoSolutions(spark, 6, 10, oneSided = false,
        depth = 2)
      .groupBy("category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cats.values.sum == 2339L)
    // the x piece fits strictly inside the upper-left quadrant in
    // most solutions; every category label is one of the four
    assert(cats.keySet.subsetOf(Set("UPPER_LEFT", "MID_X", "MID_Y", "CENTER")))
    assert(cats.getOrElse("UPPER_LEFT", 0L) > 0L)
  }

  test("sudoku 9x9 fixture: proper, solution is the pattern grid") {
    val spec = SudokuSpec(Search.sudokuFixture9, 3, 3)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = spec.build().solve(ids => out += spec.render(ids))
    assert(n == 1L)
    val expected = IndexedSeq.tabulate(9, 9)((r, c) =>
      (3 * (r % 3) + r / 3 + c) % 9 + 1)
      .map(_.mkString(" ")).mkString("\n")
    assert(out.head == expected)
  }

  test("sudoku generalized geometry: 12x12 with 4x3 boxes") {
    val base = IndexedSeq.tabulate(12, 12)((r, c) =>
      (4 * (r % 3) + r / 3 + c) % 12 + 1)
    val clues = IndexedSeq.tabulate(12, 12)((r, c) =>
      if ((r * 5 + c * 7) % 3 != 1) base(r)(c) else 0)
    val spec = SudokuSpec(clues, 4, 3)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(spec.build().solve(ids => out += spec.render(ids)) == 1L)
    assert(out.head == base.map(_.mkString(" ")).mkString("\n"))
  }

  test("unsatisfiable model: distributedSolve returns an empty frame, " +
       "not an error") {
    // two identical clues in one row -> the row-value column for 5
    // is double-claimed and a cell column starves: every branch dies
    // before the split depth. Zero solutions is a valid outcome.
    val clues = IndexedSeq.tabulate(9, 9)((r, c) =>
      if (r == 0 && (c == 0 || c == 1)) 5 else 0)
    val spec = SudokuSpec(clues, 3, 3)
    assert(spec.build().solve(_ => ()) == 0L)
    val df = ExactCover.distributedSolve(spark, spec, depth = 3)
    assert(df.columns.toSeq == Seq("prefix", "solution"))
    assert(df.count() == 0L)
  }

  test("q_sudoku witness row is the constant oracle") {
    val row = Search.sudokuValidated(spark, Search.sudokuFixture9,
      boxW = 3, boxH = 3, depth = 2).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((1L, 0L, 0L)))
  }
}
