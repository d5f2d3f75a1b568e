package graft.ops

/** Cube-face hierarchical cell geometry (scalar side).
  *
  * The reference keys places by S2 cell ids — a sphere→cube-face
  * projection followed by a space-filling-curve walk over each face —
  * and relies on two properties (src/coverage.rs:4-21,
  * src/pipeline/conflate/mod.rs:131-136): parent cells are bit-prefixes
  * (coarsen by shift) and cell AREA stays bounded everywhere on the
  * sphere. Round 2 quantized raw lat/lng, which kept the shift-coarsening
  * but degenerated toward the poles (cells shrink by 1/cos(lat) — 100×
  * key skew at |lat|=89.5°). This module projects to cube faces instead:
  * the linear chart (no tan reprojection) bounds the max/min cell area
  * ratio by ~5.2 globally, so no polar degeneracy and no polar key skew.
  *
  * Cell id at level L: `(8 + face) * 4^L + morton(iu, iv)` with face ∈
  * [0,6), iu/iv ∈ [0, 2^L) — ids live in [8·4^L, 14·4^L), and
  * `parent(id) = id >> 2` (the 8+face prefix is untouched; exactly the
  * reference's shift-coarsening).
  *
  * The math here MUST stay operation-for-operation identical to the
  * Column formulation in GeoOps (spec-asserted): both run on the same
  * JVM doubles, so equality is exact, and the DuckDB oracle reproduces
  * the same IEEE sequence.
  */
object GeoCells {
  val EarthRadiusKm = 6371.0088

  /** face, u, v of a unit-sphere point. Chart: the largest-|coordinate|
    * axis is the face normal; u, v divide the remaining two coordinates
    * (in axis order x→(y,z), y→(z,x), z→(x,y)) by the SIGNED major
    * coordinate, so u, v ∈ [-1, 1] on either hemisphere. */
  def faceUV(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax >= ay && ax >= az) (if (x >= 0) 0 else 3, y / x, z / x)
    else if (ay >= az) (if (y >= 0) 1 else 4, z / y, x / y)
    else (if (z >= 0) 2 else 5, x / z, y / z)
  }

  /** Inverse chart: a 3D direction for (face, u, v); |u|,|v| may exceed 1
    * (points beyond the face square land on neighboring faces after
    * re-projection — how neighbor stepping crosses faces). */
  def faceDirection(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1.0, u, v)
      case 3 => (-1.0, -u, -v)
      case 1 => (v, 1.0, u)
      case 4 => (-v, -1.0, -u)
      case 2 => (u, v, 1.0)
      case _ => (-u, -v, -1.0)
    }

  def toUnit(latDeg: Double, lngDeg: Double): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg); val lng = math.toRadians(lngDeg)
    (math.cos(lat) * math.cos(lng), math.cos(lat) * math.sin(lng), math.sin(lat))
  }

  private def morton(ix: Long, iy: Long, level: Int): Long = {
    var out = 0L
    var b = 0
    while (b < level) {
      out |= ((ix >> b) & 1L) << (2 * b)
      out |= ((iy >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    out
  }

  private def deinterleave(m: Long, level: Int, odd: Boolean): Long = {
    var out = 0L
    var b = 0
    val off = if (odd) 1 else 0
    while (b < level) {
      out |= ((m >> (2 * b + off)) & 1L) << b
      b += 1
    }
    out
  }

  private def quantize(c: Double, level: Int): Long = {
    val n = 1L << level
    math.min(math.max(math.floor((c + 1) / 2 * n).toLong, 0L), n - 1)
  }

  def cellFromUV(face: Int, u: Double, v: Double, level: Int): Long =
    ((8L + face) << (2 * level)) | morton(quantize(u, level), quantize(v, level), level)

  def cellOf(latDeg: Double, lngDeg: Double, level: Int): Long = {
    val (x, y, z) = toUnit(latDeg, lngDeg)
    val (f, u, v) = faceUV(x, y, z)
    cellFromUV(f, u, v, level)
  }

  /** (face, iu, iv) of a cell id at the given level. */
  def decode(cell: Long, level: Int): (Int, Long, Long) = {
    val face = (cell >> (2 * level)).toInt - 8
    val m = cell & ((1L << (2 * level)) - 1)
    (face, deinterleave(m, level, odd = false), deinterleave(m, level, odd = true))
  }

  /** Center (u, v) of cell index i at the given level. */
  private def centerCoord(i: Long, level: Int): Double =
    (i + 0.5) / (1L << level) * 2 - 1

  /** Unit-vector center of a cell. */
  def cellCenter(cell: Long, level: Int): (Double, Double, Double) = {
    val (f, iu, iv) = decode(cell, level)
    val (x, y, z) = faceDirection(f, centerCoord(iu, level), centerCoord(iv, level))
    val n = math.sqrt(x * x + y * y + z * z)
    (x / n, y / n, z / n)
  }

  /** Great-circle distance (km) between unit vectors via the chord. */
  def chordDistKm(a: (Double, Double, Double), b: (Double, Double, Double)): Double = {
    val dx = a._1 - b._1; val dy = a._2 - b._2; val dz = a._3 - b._3
    val chord = math.sqrt(dx * dx + dy * dy + dz * dz)
    2 * EarthRadiusKm * math.asin(math.min(1.0, chord / 2))
  }

  /** Max distance from the cell center to its 4 corners (km) — the
    * circumradius bound used for conservative cap-intersection tests. */
  def circumRadiusKm(cell: Long, level: Int): Double = {
    val (f, iu, iv) = decode(cell, level)
    val c = cellCenter(cell, level)
    val n = 1L << level
    def corner(cu: Long, cv: Long): (Double, Double, Double) = {
      val (x, y, z) = faceDirection(f, cu.toDouble / n * 2 - 1, cv.toDouble / n * 2 - 1)
      val r = math.sqrt(x * x + y * y + z * z)
      (x / r, y / r, z / r)
    }
    Seq((iu, iv), (iu + 1, iv), (iu, iv + 1), (iu + 1, iv + 1))
      .map(p => chordDistKm(c, corner(p._1, p._2))).max
  }

  /** The 8 neighbors of a cell, crossing faces naturally: step one cell
    * width beyond the face square in (u, v), take the 3D direction, and
    * re-project — the chart itself resolves which face the neighbor
    * lives on (no adjacency tables, poles need no special case). */
  def neighbors(cell: Long, level: Int): Seq[Long] = {
    val (f, iu, iv) = decode(cell, level)
    val cu = centerCoord(iu, level)
    val cv = centerCoord(iv, level)
    val step = 2.0 / (1L << level)
    for {
      du <- Seq(-step, 0.0, step)
      dv <- Seq(-step, 0.0, step)
      if du != 0.0 || dv != 0.0
    } yield {
      val (x, y, z) = faceDirection(f, cu + du, cv + dv)
      val (ff, uu, vv) = faceUV(x, y, z)
      cellFromUV(ff, uu, vv, level)
    }
  }

  /** Cells covering the spherical cap of `radiusKm` around the point —
    * the reference's RegionCoverer (C15, src/coverage.rs:357-362) as a
    * per-row BFS: include every cell whose center lies within
    * radius + circumradius (a cell intersecting the cap always does, so
    * the covering is SOUND/over-complete; false candidates die on the
    * exact distance filter after the join). Fan-out is
    * O((radius/cellWidth + 2)²) — level is chosen per radius tier so
    * this stays ~10–25 cells. */
  def cover(latDeg: Double, lngDeg: Double, radiusKm: Double, level: Int): Array[Long] = {
    val p = toUnit(latDeg, lngDeg)
    def include(cell: Long): Boolean =
      chordDistKm(p, cellCenter(cell, level)) <= radiusKm + circumRadiusKm(cell, level)
    val start = cellOf(latDeg, lngDeg, level)
    val out = scala.collection.mutable.LinkedHashSet[Long](start)
    val seen = scala.collection.mutable.HashSet[Long](start)
    val queue = scala.collection.mutable.Queue[Long](start)
    var guard = 0
    while (queue.nonEmpty && guard < 100000) {
      val c = queue.dequeue()
      neighbors(c, level).foreach { nb =>
        if (seen.add(nb) && include(nb)) {
          out += nb
          queue.enqueue(nb)
        }
      }
      guard += 1
    }
    out.toArray
  }
}
