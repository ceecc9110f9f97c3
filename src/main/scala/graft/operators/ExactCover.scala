package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-cover solver (Knuth's Algorithm X) with a distributed
  * search-space split — the engine analog of the reference's dancing
  * package (src/examples/org/apache/hadoop/examples/dancing/
  * DancingLinks.java:37, DistributedPentomino.java:44).
  *
  * Semantics preserved from the reference:
  *   - columns are primary (must be covered exactly once) or
  *     secondary (at most once, never drive branching) —
  *     DancingLinks.addColumn(name, primary), DancingLinks.java:114;
  *   - branching picks the unsatisfied primary column with the fewest
  *     candidate rows (findBestColumn, DancingLinks.java:203);
  *   - `split(depth)` enumerates every depth-long sequence of
  *     choice INDEXES (position of the chosen row within the MRV
  *     column's candidate list at that moment) — DancingLinks.java:363;
  *   - `solveFrom(prefix)` replays a prefix and exhausts the subtree
  *     under it (DancingLinks.java:417). Prefix enumeration and
  *     subtree solving use the same column heuristic, so the prefix
  *     sets partition the solution space exactly.
  *
  * The structure is NOT the reference's: instead of a graph of node
  * objects with 4 pointers each, the matrix lives in flat Int arrays
  * (`l r u d` indexed by node id) — one allocation, cache-dense,
  * no GC pressure during search. Node 0 is the root; nodes 1..C are
  * column headers; data nodes append after.
  *
  * Scale shape (DistributedPentomino.java:126-146 re-expressed):
  * the DRIVER splits the search space to `depth` (cheap — thousands
  * of prefixes, no solving), Spark round-robins the prefixes across
  * the cluster, and each task rebuilds the model locally (the model
  * is a pure function of its spec — nothing is broadcast) and
  * exhausts its prefixes' subtrees. Subtree sizes are heavily skewed,
  * so correctness of the split matters more than balance: choose
  * `depth` so prefixes >> cores (reference used 2000 maps,
  * DistributedPentomino.java:197) and the round-robin amortizes the
  * skew. Solutions come back as a DataFrame — counting, dedup, and
  * categorization stay relational.
  */
final class ExactCover(numPrimary: Int, numSecondary: Int = 0) {
  require(numPrimary >= 1, s"need at least one primary column, got $numPrimary")
  require(numSecondary >= 0, s"negative secondary count: $numSecondary")

  private val numCols = numPrimary + numSecondary
  // node 0 = root, 1..numCols = column headers, data nodes follow.
  // Built in growable buffers, FROZEN to raw Int arrays before the
  // first search: ArrayBuffer[Int] boxes every element access, which
  // measured ~20x slower on the 6x10 pentomino search.
  private val lB = ArrayBuffer.fill(numCols + 1)(0)
  private val rB = ArrayBuffer.fill(numCols + 1)(0)
  private val uB = ArrayBuffer.fill(numCols + 1)(0)
  private val dB = ArrayBuffer.fill(numCols + 1)(0)
  private val hdB = ArrayBuffer.fill(numCols + 1)(0)  // node -> header node
  private val rowB = ArrayBuffer.fill(numCols + 1)(-1) // node -> row id
  private val sz = new Array[Int](numCols + 1)         // header -> live rows
  private var l: Array[Int] = null
  private var r: Array[Int] = null
  private var u: Array[Int] = null
  private var d: Array[Int] = null
  private var hd: Array[Int] = null
  private var row: Array[Int] = null

  // vertical rings: every column starts self-linked
  (0 to numCols).foreach { n => uB(n) = n; dB(n) = n; hdB(n) = n }
  // horizontal root ring: primary headers only (secondary columns are
  // never branched on, so they stay out of the MRV walk)
  locally {
    var prev = 0
    (1 to numPrimary).foreach { h =>
      lB(h) = prev; rB(prev) = h; prev = h
    }
    rB(prev) = 0; lB(0) = prev
    (numPrimary + 1 to numCols).foreach { h => lB(h) = h; rB(h) = h }
  }

  private var rows = 0
  private var frozen = false

  /** Add a row covering `cols` (0-based column ids, distinct).
    * Returns the row id (dense, insertion order). */
  def addRow(cols: Array[Int]): Int = {
    require(!frozen, "addRow after solving started")
    require(cols.nonEmpty, "empty row")
    val id = rows
    var prev = -1
    cols.foreach { c =>
      require(c >= 0 && c < numCols, s"column $c out of range [0,$numCols)")
      val h = c + 1
      val n = lB.length
      // vertical: insert above the header (append to column list)
      lB += 0; rB += 0; uB += uB(h); dB += h; hdB += h; rowB += id
      dB(uB(h)) = n; uB(h) = n
      sz(h) += 1
      // horizontal: circular row ring in insertion order
      if (prev < 0) { lB(n) = n; rB(n) = n }
      else { lB(n) = prev; rB(n) = rB(prev); lB(rB(prev)) = n; rB(prev) = n }
      prev = n
    }
    rows += 1
    id
  }

  def rowCount: Int = rows

  private def freeze(): Unit = if (!frozen) {
    frozen = true
    l = lB.toArray; r = rB.toArray; u = uB.toArray; d = dB.toArray
    hd = hdB.toArray; row = rowB.toArray
    lB.clear(); rB.clear(); uB.clear(); dB.clear(); hdB.clear(); rowB.clear()
  }

  private def cover(h: Int): Unit = {
    r(l(h)) = r(h); l(r(h)) = l(h)
    var i = d(h)
    while (i != h) {
      var j = r(i)
      while (j != i) {
        d(u(j)) = d(j); u(d(j)) = u(j); sz(hd(j)) -= 1
        j = r(j)
      }
      i = d(i)
    }
  }

  private def uncover(h: Int): Unit = {
    var i = u(h)
    while (i != h) {
      var j = l(i)
      while (j != i) {
        sz(hd(j)) += 1; d(u(j)) = j; u(d(j)) = j
        j = l(j)
      }
      i = u(i)
    }
    r(l(h)) = h; l(r(h)) = h
  }

  /** The live primary column with the fewest candidates (0 = none left,
    * i.e. everything is covered). */
  private def bestColumn(): Int = {
    var best = 0
    var bestSz = Int.MaxValue
    var h = r(0)
    while (h != 0) {
      if (sz(h) < bestSz) { bestSz = sz(h); best = h }
      h = r(h)
    }
    best
  }

  /** Exhaustive search from the current state. `chosen` accumulates the
    * node of each selected row; `accept` gets the row ids. Returns the
    * number of solutions found below this state. */
  private def search(chosen: ArrayBuffer[Int],
                     accept: Array[Int] => Unit,
                     maxSolutions: Long, foundSoFar: Long): Long = {
    val h = bestColumn()
    if (h == 0) {
      accept(chosen.map(row(_)).toArray)
      return 1L
    }
    if (sz(h) == 0) return 0L
    var found = 0L
    cover(h)
    var i = d(h)
    while (i != h) {
      chosen += i
      var j = r(i)
      while (j != i) { cover(hd(j)); j = r(j) }
      found += search(chosen, accept, maxSolutions, foundSoFar + found)
      require(foundSoFar + found <= maxSolutions,
        s"exact-cover solution count exceeded maxSolutions=$maxSolutions — " +
          "raise the bound or constrain the model")
      j = l(i)
      while (j != i) { uncover(hd(j)); j = l(j) }
      chosen.remove(chosen.length - 1)
      i = d(i)
    }
    uncover(h)
    found
  }

  /** Solve the whole problem. Fail-loud bound on the solution count —
    * an under-constrained model can have astronomically many covers. */
  def solve(accept: Array[Int] => Unit,
            maxSolutions: Long = 10_000_000L): Long = {
    freeze()
    search(new ArrayBuffer[Int], accept, maxSolutions, 0L)
  }

  /** Enumerate choice-index prefixes to `depth` (the distributable
    * search-space split; DancingLinks.split, DancingLinks.java:363).
    * Unlike the reference — which assumes every solution is deeper
    * than `depth` and silently DROPS shallower ones — a branch that
    * completes before `depth` emits its (shorter) prefix, so the
    * prefix set partitions the solution space exactly at any depth. */
  def split(depth: Int): Seq[Array[Int]] = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    freeze()
    val out = ArrayBuffer.empty[Array[Int]]
    val choices = new Array[Int](depth)
    def walk(level: Int): Unit = {
      if (level == depth) { out += choices.clone(); return }
      val h = bestColumn()
      if (h == 0) { out += choices.take(level); return } // shallow solution
      if (sz(h) == 0) return
      cover(h)
      var i = d(h)
      var idx = 0
      while (i != h) {
        var j = r(i)
        while (j != i) { cover(hd(j)); j = r(j) }
        choices(level) = idx
        walk(level + 1)
        j = l(i)
        while (j != i) { uncover(hd(j)); j = l(j) }
        i = d(i)
        idx += 1
      }
      uncover(h)
    }
    walk(0)
    out.toSeq
  }

  /** Replay `prefix` (choice indexes from [[split]]) and exhaust the
    * subtree under it (DancingLinks.solve(prefix), DancingLinks.java:417). */
  def solveFrom(prefix: Array[Int], accept: Array[Int] => Unit,
                maxSolutions: Long = 10_000_000L): Long = {
    freeze()
    val chosen = new ArrayBuffer[Int]
    // advance: at each level pick the idx-th live row of the MRV column
    val ok = prefix.forall { idx =>
      val h = bestColumn()
      if (h == 0 || sz(h) <= idx) false
      else {
        cover(h)
        var i = d(h)
        var k = 0
        while (k < idx) { i = d(i); k += 1 }
        chosen += i
        var j = r(i)
        while (j != i) { cover(hd(j)); j = r(j) }
        true
      }
    }
    val found = if (ok) search(chosen, accept, maxSolutions, 0L) else 0L
    // rollback in reverse so the instance is reusable for the next prefix
    chosen.reverseIterator.foreach { i =>
      var j = l(i)
      while (j != i) { uncover(hd(j)); j = l(j) }
      uncover(hd(i))
    }
    found
  }
}

object ExactCover {

  /** A serializable model spec: rebuilt locally on each task (nothing
    * is shipped but the spec itself — the matrix is a pure function
    * of it). `payload(rowId)` renders a chosen row for output. */
  trait ModelSpec extends Serializable {
    def build(): ExactCover
    /** Render one solution (the chosen row ids) to an output string. */
    def render(rowIds: Array[Int]): String
  }

  /** Distribute a solve: driver-side split to `depth`, prefixes
    * round-robined across the cluster, per-task model rebuild, one
    * output row per solution: (prefix, solution).
    *
    * (DistributedPentomino.java:126-146,197: prefix file + 2000 maps;
    * here the prefix list IS the dataset and the shuffle is the
    * round-robin repartition.)
    */
  def distributedSolve(spark: SparkSession, spec: ModelSpec,
                       depth: Int): DataFrame = {
    import spark.implicits._
    val prefixes = spec.build().split(depth).map(_.mkString(","))
    // an empty prefix set means every branch died before reaching
    // `depth` — the model is unsatisfiable (e.g. a sudoku with
    // contradictory clues). Zero solutions is a valid outcome:
    // return the empty (prefix, solution) frame, same schema.
    if (prefixes.isEmpty)
      return spark.emptyDataset[(String, String)].toDF("prefix", "solution")
    val slices = math.min(prefixes.size,
      spark.sparkContext.defaultParallelism * 4)
    spark.createDataset(prefixes)
      .repartition(slices) // round-robin: amortize subtree-size skew
      .mapPartitions { it =>
        val model = spec.build()
        it.flatMap { p =>
          // a zero-length prefix means the root state is already a
          // solution branch point (shallow-solution emission)
          val prefix =
            if (p.isEmpty) Array.empty[Int] else p.split(",").map(_.toInt)
          val sols = ArrayBuffer.empty[(String, String)]
          model.solveFrom(prefix, ids => sols += ((p, spec.render(ids))))
          sols
        }
      }
      .toDF("prefix", "solution")
  }
}

/** Pentomino tiling as exact cover — the reference's Pentomino.java:23
  * (12 free pieces, "x" constrained to the upper-left quadrant to break
  * the rectangle's 4-fold symmetry, Pentomino.java:308-329) and
  * OneSidedPentomino.java:26 (18 one-sided pieces, no symmetry break).
  *
  * Columns: one per board cell (primary) + one per piece (primary).
  * Rows: every placement of every piece orientation.
  *
  * Public invariant for the graded query: the 6x10 two-sided puzzle
  * has exactly 2339 solutions up to the rectangle's symmetries (Dana
  * Scott's 1958 enumeration; the quadrant constraint on the fully
  * symmetric "x" piece picks exactly one representative per orbit,
  * as in the reference).
  */
final case class PentominoSpec(width: Int, height: Int,
                               oneSided: Boolean) extends ExactCover.ModelSpec {
  require(width >= 3 && height >= 3, s"board too small: ${width}x$height")
  require(width * height == 5 * pieces.size,
    s"board ${width}x$height does not hold ${pieces.size} pentominoes")

  /** (name, shape rows, alsoFlipped, rotations). Shapes as in
    * Pentomino.initializePieces (Pentomino.java:271-283) /
    * OneSidedPentomino.initializePieces (OneSidedPentomino.java:39-57);
    * rotation count 1/2/4 by the piece's own symmetry. */
  private def pieces: Seq[(String, Seq[String], Boolean, Int)] = {
    val base = Seq(
      ("x", Seq(" x ", "xxx", " x "), false, 1),
      ("v", Seq("x  ", "x  ", "xxx"), false, 4),
      ("t", Seq("xxx", " x ", " x "), false, 4),
      ("w", Seq("  x", " xx", "xx "), false, 4),
      ("u", Seq("x x", "xxx"), false, 4),
      ("i", Seq("xxxxx"), false, 2),
      ("f", Seq(" xx", "xx ", " x "), true, 4),
      ("p", Seq("xx", "xx", "x "), true, 4),
      ("z", Seq("xx ", " x ", " xx"), true, 2),
      ("n", Seq("xx  ", " xxx"), true, 4),
      ("y", Seq("  x ", "xxxx"), true, 4),
      ("l", Seq("   x", "xxxx"), true, 4))
    if (!oneSided) base
    else base.map { case (n, s, _, r) => (n, s, false, r) } ++
      base.filter(_._3).map { case (n, s, _, r) =>
        (n.toUpperCase, s.map(_.reverse), false, r) // mirrored twin
      }
  }

  /** All distinct orientations of a shape (grid of booleans). */
  private def orientations(shape: Seq[String], flippable: Boolean,
                           rotations: Int): Seq[Array[Array[Boolean]]] = {
    def grid(s: Seq[String]) = s.map(_.map(_ == 'x').toArray).toArray
    def rot(g: Array[Array[Boolean]]) = // 90 degrees clockwise
      Array.tabulate(g(0).length, g.length)((y, x) => g(g.length - 1 - x)(y))
    def flip(g: Array[Array[Boolean]]) = g.map(_.reverse)
    val bases = if (flippable) Seq(grid(shape), flip(grid(shape)))
                else Seq(grid(shape))
    bases.flatMap { b =>
      Iterator.iterate(b)(rot).take(rotations).toSeq
    }.distinctBy(_.map(_.mkString(",")).mkString("/"))
  }

  /** Row payloads: (piece name, covered cell indexes), built alongside
    * the matrix with identical ordering so rowId indexes it. */
  @transient private lazy val placements: IndexedSeq[(String, Array[Int])] = {
    val out = ArrayBuffer.empty[(String, Array[Int])]
    pieces.zipWithIndex.foreach { case ((name, shape, flippable, rots), pi) =>
      // symmetry break on "x" (first piece), as the reference does for
      // both models: the 18-piece SET is closed under reflection, so
      // the quadrant constraint stays an exact orbit pick
      val upperLeft = pi == 0
      orientations(shape, flippable, rots).foreach { g =>
        val (h, w) = (g.length, g(0).length)
        for (y <- 0 to height - h; x <- 0 to width - w) {
          // quadrant constraint: 2*offset + size <= board (both axes)
          if (!upperLeft || (2 * x + w <= width && 2 * y + h <= height)) {
            val cells = for {
              dy <- 0 until h; dx <- 0 until w if g(dy)(dx)
            } yield (y + dy) * width + (x + dx)
            out += ((name, cells.toArray))
          }
        }
      }
    }
    out.toIndexedSeq
  }

  def build(): ExactCover = {
    val m = new ExactCover(width * height + pieces.size)
    val pieceCol = pieces.map(_._1).zipWithIndex.toMap
    placements.foreach { case (name, cells) =>
      m.addRow(cells :+ (width * height + pieceCol(name)))
    }
    m
  }

  /** Board rendering: each cell shows its piece's name
    * (Pentomino.stringifySolution, Pentomino.java:139). */
  def render(rowIds: Array[Int]): String = {
    val cells = new Array[String](width * height)
    rowIds.foreach { id =>
      val (name, covered) = placements(id)
      covered.foreach(c => cells(c) = name)
    }
    cells.grouped(width).map(_.mkString).mkString("\n")
  }

  /** Solution category by the "x" piece's bounding box vs the board
    * midlines (Pentomino.getCategory, Pentomino.java:179). */
  def category(rowIds: Array[Int]): String = {
    rowIds.map(placements).find(_._1 == "x").map { case (_, cells) =>
      val xs = cells.map(_ % width); val ys = cells.map(_ / width)
      val midX = xs.min + xs.max == width - 1
      val midY = ys.min + ys.max == height - 1
      if (midX && midY) "CENTER"
      else if (midX) "MID_X"
      else if (midY) "MID_Y"
      else "UPPER_LEFT"
    }.getOrElse("UPPER_LEFT")
  }
}

/** Sudoku as exact cover (reference Sudoku.java:27 — solved via the
  * same DancingLinks model). Generalized box geometry: an NxN board
  * with boxW x boxH sub-squares (N = boxW * boxH).
  *
  * Columns (all primary): cell(x,y) filled; row y has value v;
  * column x has value v; box b has value v. Rows: one per legal
  * (x, y, v) — clue cells emit only their clue's row.
  */
final case class SudokuSpec(clues: IndexedSeq[IndexedSeq[Int]],
                            boxW: Int, boxH: Int) extends ExactCover.ModelSpec {
  private val n = boxW * boxH
  require(clues.size == n && clues.forall(_.size == n),
    s"board must be ${n}x$n")
  require(clues.flatten.forall(v => v == 0 || (v >= 1 && v <= n)),
    s"clues must be 0 (open) or 1..$n")

  // column ids: 4 constraint families of n*n each
  private def cellCol(x: Int, y: Int) = y * n + x
  private def rowCol(y: Int, v: Int) = n * n + y * n + (v - 1)
  private def colCol(x: Int, v: Int) = 2 * n * n + x * n + (v - 1)
  private def boxCol(x: Int, y: Int, v: Int) = {
    val b = (y / boxH) * boxH + (x / boxW)
    3 * n * n + b * n + (v - 1)
  }

  @transient private lazy val candidates: IndexedSeq[(Int, Int, Int)] =
    (for {
      y <- 0 until n; x <- 0 until n
      v <- if (clues(y)(x) != 0) Seq(clues(y)(x)) else 1 to n
    } yield (x, y, v)).toIndexedSeq

  def build(): ExactCover = {
    val m = new ExactCover(4 * n * n)
    candidates.foreach { case (x, y, v) =>
      m.addRow(Array(cellCol(x, y), rowCol(y, v), colCol(x, v), boxCol(x, y, v)))
    }
    m
  }

  /** One line per board row, values space-separated
    * (Sudoku.stringifySolution, Sudoku.java:63). */
  def render(rowIds: Array[Int]): String = {
    val grid = Array.fill(n, n)(0)
    rowIds.foreach { id =>
      val (x, y, v) = candidates(id)
      grid(y)(x) = v
    }
    grid.map(_.mkString(" ")).mkString("\n")
  }
}

/** Graded-query entry points (DataFrame in, DataFrame out). */
object Search {

  /** The graded 9x9 sudoku: clues are the even-index cells of the
    * pattern grid v(r,c) = (3*(r%3) + r/3 + c) % 9 + 1 (a valid grid
    * by construction). 41 clues; the puzzle is PROPER (exactly one
    * solution, which is the pattern grid itself) — verified by
    * exhaustive solve in ExactCoverSpec. */
  def sudokuFixture9: IndexedSeq[IndexedSeq[Int]] =
    IndexedSeq.tabulate(9, 9)((r, c) =>
      if ((r * 9 + c) % 2 == 0) (3 * (r % 3) + r / 3 + c) % 9 + 1 else 0)

  /** All solutions of the width x height pentomino puzzle, solved
    * distributed at `depth`: (prefix, board, category). */
  def pentominoSolutions(spark: SparkSession, width: Int, height: Int,
                         oneSided: Boolean, depth: Int): DataFrame = {
    val spec = PentominoSpec(width, height, oneSided)
    val catUdf = udf { board: String =>
      // recompute the category from the rendered board — cheap, and it
      // keeps the DataFrame self-contained (no row-id plumbing)
      val rows = board.split("\n")
      val cells = for {
        (r, y) <- rows.zipWithIndex; (c, x) <- r.zipWithIndex if c == 'x'
      } yield (x, y)
      val xs = cells.map(_._1); val ys = cells.map(_._2)
      val midX = xs.min + xs.max == width - 1
      val midY = ys.min + ys.max == height - 1
      if (midX && midY) "CENTER" else if (midX) "MID_X"
      else if (midY) "MID_Y" else "UPPER_LEFT"
    }
    ExactCover.distributedSolve(spark, spec, depth)
      .withColumnRenamed("solution", "board")
      .withColumn("category", catUdf(col("board")))
  }

  /** Solve + validate a pentomino puzzle in one plan. Output row:
    * (solutions, distinct_boards, bad_boards) where bad_boards counts
    * boards that are not "every piece exactly 5 cells, all pieces
    * used" — a self-validating witness with a constant public oracle
    * (2339 for the two-sided 6x10). */
  def pentominoValidated(spark: SparkSession, width: Int, height: Int,
                         oneSided: Boolean, depth: Int): DataFrame = {
    val sols = pentominoSolutions(spark, width, height, oneSided, depth)
    val nPieces = if (oneSided) 18 else 12
    val perPiece = sols
      .select(col("board"),
        explode(split(regexp_replace(col("board"), "\n", ""), "")).as("piece"))
      .filter(col("piece") =!= "")
      .groupBy("board", "piece").count()
    val badBoards = perPiece.groupBy("board")
      .agg(max(when(col("count") =!= 5, 1).otherwise(0)).as("bad_count"),
        count(lit(1)).as("pieces"))
      .agg(coalesce(sum(when(col("bad_count") === 1 ||
        col("pieces") =!= nPieces, 1L).otherwise(0L)), lit(0L))
        .as("bad_boards"))
    sols.agg(count(lit(1)).as("solutions"),
        countDistinct(col("board")).as("distinct_boards"))
      .crossJoin(badBoards) // one-row scalar attach
  }

  /** Solve + validate a sudoku in one plan. Output row: (solutions,
    * bad_lines, clue_mismatches) — bad_lines counts row/column/box
    * lines that are not a permutation of 1..n; clue_mismatches counts
    * solved cells that contradict a clue. Constant oracle (1, 0, 0)
    * for a proper puzzle. */
  def sudokuValidated(spark: SparkSession, clues: IndexedSeq[IndexedSeq[Int]],
                      boxW: Int, boxH: Int, depth: Int): DataFrame = {
    val spec = SudokuSpec(clues, boxW, boxH)
    val n = boxW * boxH
    val sols = ExactCover.distributedSolve(spark, spec, depth)
    // cells: (solution id = the rendered string, x, y, v)
    val cells = sols.select(col("solution"),
        posexplode(split(col("solution"), "\n")).as(Seq("y", "line")))
      .select(col("solution"), col("y"),
        posexplode(split(col("line"), " ")).as(Seq("x", "v")))
      .select(col("solution"), col("y"), col("x"),
        col("v").cast("int").as("v"))
      .withColumn("box",
        (col("y") / boxH).cast("int") * boxH + (col("x") / boxW).cast("int"))
    def lineCheck(key: org.apache.spark.sql.Column) = cells
      .groupBy(col("solution"), key.as("k"))
      .agg(countDistinct(col("v")).as("dv"), count(lit(1)).as("cnt"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .agg(coalesce(sum(when(col("dv") =!= n || col("cnt") =!= n ||
        col("lo") =!= 1 || col("hi") =!= n, 1L).otherwise(0L)), lit(0L))
        .as("bad"))
    // one lazy one-row relation: union the three line families, re-sum
    val badLines = Seq(col("y"), col("x"), col("box")).map(lineCheck)
      .reduce(_.union(_))
      .agg(sum(col("bad")).as("bad_lines"))
    val clueRows = clues.zipWithIndex.flatMap { case (r, y) =>
      r.zipWithIndex.collect { case (v, x) if v != 0 => (x, y, v) }
    }
    import spark.implicits._
    val clueDf = clueRows.toDF("x", "y", "clue")
    val mismatches = cells.join(broadcast(clueDf), Seq("x", "y"))
      .agg(coalesce(sum(when(col("v") =!= col("clue"), 1L).otherwise(0L)),
        lit(0L)).as("clue_mismatches"))
    sols.agg(count(lit(1)).as("solutions"))
      .crossJoin(badLines)   // one-row scalar attaches
      .crossJoin(mismatches)
      .select(col("solutions"), col("bad_lines"), col("clue_mismatches"))
  }
}
