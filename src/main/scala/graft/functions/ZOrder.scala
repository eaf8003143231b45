package graft.functions

/** Morton (Z-order) encoding over two 16-bit dimensions — the
  * space-filling-curve layout key that makes ONE sort order serve range
  * predicates on BOTH dimensions (the rectangular analogue of the
  * HEALPix nested index, `Healpix.scala`: a z-tile is a quadrant
  * exactly like a healpix cell is a sky patch, and prefix arithmetic
  * gives the same parent/child containment).
  *
  * Reference analogue: HiSS-Cube keeps its heal/time index sorted so
  * region queries prune (`hisscube/processors/metadata_strategy.py` —
  * dense index over [heal, time, ds]); the z-order key generalizes that
  * to any two bounded integer dimensions (user × hour here). At 100 TB
  * the point is LAYOUT: one `repartitionByRange(zkey)` write gives
  * min/max row-group pruning and partition pruning for user-range,
  * time-range, and user×time-box predicates simultaneously — no second
  * copy of the data sorted the other way.
  *
  * Pure integer bit-twiddling (interleave via parallel-prefix masks),
  * bit-identical to the oracle's Σ ((x>>i)&1)<<2i replay.
  */
object ZOrder {

  val Bits = 16

  /** Spread the low 16 bits of v so bit i lands at position 2i
    * (the classic parallel-prefix morton spread). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton key of (x, y): x bits at even positions, y bits at odd.
    * Inputs are masked to 16 bits — callers reduce their dimension to
    * the grid first (`% 65536`), same as the oracle. */
  def encode(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** The quadrant law that makes tiles work: dropping s bits of each
    * dimension is the same as dropping 2s bits of the key. A z-tile at
    * scale s is therefore `encode(x,y) >>> (2*s)` — computable from the
    * key alone, no decode needed. */
  def tile(zkey: Long, s: Int): Long = zkey >>> (2 * s)

  /** Tile cover of the axis-aligned box [x0,x1]×[y0,y1] at scale s —
    * the rectangular analogue of `Healpix.queryDisc`: enumerate the
    * (coarse) tile grid cells the box touches and return their tile
    * ids, for an `isin`/range partition-pruning probe. Cover size is
    * ((x1-x0)>>s + 2) · ((y1-y0)>>s + 2) — driver-side trivial for the
    * scales this is used at (the caller picks s so the grid is coarse,
    * exactly like picking a healpix order). */
  def tilesForBox(x0: Long, x1: Long, y0: Long, y1: Long, s: Int): Seq[Long] = {
    require(s >= 0 && s <= Bits, s"tile scale $s outside [0, $Bits]")
    require(x0 <= x1 && y0 <= y1, "empty box")
    val (tx0, tx1) = ((x0 & 0xFFFFL) >> s, (x1 & 0xFFFFL) >> s)
    val (ty0, ty1) = ((y0 & 0xFFFFL) >> s, (y1 & 0xFFFFL) >> s)
    for {
      ty <- ty0 to ty1
      tx <- tx0 to tx1
    } yield encode(tx, ty)
  }
}
