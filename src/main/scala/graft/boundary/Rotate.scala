package graft.boundary

import graft.core.Block

/** rotate's content (VERDICT r2 residual 5; rotate.cpp:35-72) — the exact
  * fast paths, transplanted.
  *
  * The reference rotates a Mat by a GIVEN angle: exact transpose/flip for
  * 90/180/270 (rotate.cpp:38-57), general warpAffine otherwise (:58-71).
  * Detection of the angle belongs to the caller (findAngle/deskew) — rotate
  * itself is a pure reindexing.
  *
  * Webtext transplant: the DOM emits tables row-major (tr→td), but a
  * tables-for-layout page whose content FLOWS DOWN COLUMNS reads correctly
  * only in column-major order — precisely the 90° transpose of the
  * row-major block grid (SURVEY §2.4 rotate row). So the operator reorders
  * a rows×`cols` grid of consecutive blocks:
  *
  *   -  0 : identity — returned AS THE SAME ARRAY (the exact no-op fast
  *          path, rotate.cpp:38-41)
  *   -  90: transpose — column-major reading order
  *   - 180: full reverse (flip both axes)
  *   - 270: reverse column-major (transpose + flip)
  *
  * General "affine" angles have no webtext analogue (a block sequence has
  * no fractional positions) and are rejected — the warpAffine branch is a
  * documented exclusion, matching the library's use of the exact paths for
  * the canonical cases.
  *
  * A RAGGED last row (n not a multiple of cols) keeps its short length:
  * missing grid positions are skipped, never padded — every input block
  * appears exactly once in the output.
  *
  * `idx` is reassigned to the new position: after linearization the new
  * order IS the document order every downstream window/region operator
  * sees.
  */
object Rotate {

  def apply(blocks: Array[Block], angle: Int, cols: Int): Array[Block] = {
    require(angle == 0 || angle == 90 || angle == 180 || angle == 270,
      s"rotate: exact fast paths only (0/90/180/270), got $angle")
    require(cols >= 1, s"rotate: cols must be >= 1, got $cols")
    val n = blocks.length
    // Identity fast path is only sound for 90°: transposing a single row or
    // a single column leaves the order unchanged. 270° of the same degenerate
    // grid is the FULL REVERSE (transpose + flip), and 180° always reverses —
    // both must fall through to the permutation (ADVICE r3: the old
    // `angle != 180` guard wrongly treated 270° here as identity).
    if (angle == 0 || n <= 1 || (angle == 90 && (cols == 1 || cols >= n)))
      return blocks // identity fast path: nothing to transpose
    val perm = permutation(n, angle, cols)
    val out = new Array[Block](n)
    var p = 0
    while (p < n) {
      out(p) = blocks(perm(p)).copy(idx = p)
      p += 1
    }
    out
  }

  /** Pipeline entry (Extract.Config(rotate, rotateCols), r4): apply the
    * exact rotation to every MAXIMAL RUN of table-cell blocks (tagPath leaf
    * `td`/`th`) — the webtext analogue of rotating the page Mat by a
    * caller-given angle (rotate.cpp:35-72 takes the angle as a parameter;
    * here the caller states the layout-grid geometry). Non-cell blocks and
    * single-cell runs are untouched; `idx` is rewritten to the new document
    * order across the whole array.
    */
  def tableRuns(blocks: Array[Block], angle: Int, cols: Int): Array[Block] = {
    if (angle == 0 || cols <= 0 || blocks.length <= 1) return blocks
    @inline def isCell(b: Block): Boolean = {
      val p = b.tagPath
      p.endsWith("/td") || p.endsWith("/th") || p == "td" || p == "th"
    }
    var out: Array[Block] = null // allocate only if a run actually rotates
    var i = 0
    while (i < blocks.length) {
      if (isCell(blocks(i))) {
        // a maximal run additionally SPLITS where the tagPath PREFIX ABOVE
        // the cell leaf changes between consecutive cells (ADVICE r4): two
        // layout tables under different wrappers must rotate as separate
        // grids, not as one concatenated grid under the global geometry.
        // The leaf itself is excluded so a th header row and td body rows
        // of the SAME table stay one grid. Two back-to-back sibling tables
        // with byte-identical cell paths remain one run — the block schema
        // carries no signal to tell them apart, and the caller-supplied
        // geometry is authoritative there (exactly as the reference trusts
        // the caller's angle, rotate.cpp:35-37).
        val prefix = cellPrefix(blocks(i).tagPath)
        var j = i
        while (j < blocks.length && isCell(blocks(j)) &&
          cellPrefix(blocks(j).tagPath) == prefix) j += 1
        if (j - i > 1) {
          val rot = apply(java.util.Arrays.copyOfRange(blocks, i, j), angle, cols)
          if (out == null) out = blocks.clone()
          var k = 0
          while (k < rot.length) { out(i + k) = rot(k).copy(idx = i + k); k += 1 }
        }
        i = j
      } else i += 1
    }
    if (out == null) blocks else out
  }

  /** tagPath with the cell leaf (`td`/`th`) stripped — the table-context
    * key consecutive cells must share to belong to one grid.
    */
  @inline private def cellPrefix(p: String): String = {
    val cut = p.lastIndexOf('/')
    if (cut < 0) "" else p.substring(0, cut)
  }

  /** The source index read at each output position, for a row-major
    * rows×cols grid of n cells (ragged last row allowed).
    */
  def permutation(n: Int, angle: Int, cols: Int): Array[Int] = {
    val out = new Array[Int](n)
    angle match {
      case 180 =>
        var p = 0
        while (p < n) { out(p) = n - 1 - p; p += 1 }
      case 90 | 270 =>
        // column-major walk over the row-major grid, skipping positions
        // beyond the ragged end
        var p = 0
        var c = 0
        while (c < cols) {
          var idx = c
          while (idx < n) {
            out(p) = idx
            p += 1
            idx += cols
          }
          c += 1
        }
        if (angle == 270) {
          // transpose + flip: reverse the column-major order
          var i = 0
          var j = n - 1
          while (i < j) {
            val t = out(i); out(i) = out(j); out(j) = t
            i += 1; j -= 1
          }
        }
      case _ => // angle 0 handled by caller
        var p = 0
        while (p < n) { out(p) = p; p += 1 }
    }
    out
  }
}
