package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{BpeEncode, DotLong, HyperplaneBands, IntersectCountAtLeastFrac, IntersectCountSortedLong, Md5Prefix60, MisraGries, NearestCentroidId, PqBestCodes, PqLutArr, SparkShim, TopCellsExpr, TopKPairs}

/** Column-level entry points for the native vector/set expressions (see
  * [[org.apache.spark.sql.graftshim.DotLong]] and
  * [[org.apache.spark.sql.graftshim.IntersectCountSortedLong]]).
  */
object VectorFunctions {
  /** Exact int64 dot product of two `array<long>` columns. */
  def dotLong(a: Column, b: Column): Column =
    SparkShim.column(DotLong(SparkShim.expression(a), SparkShim.expression(b)))

  /** Exact int64 squared L2 norm of an `array<long>` column. */
  def normSqLong(a: Column): Column = dotLong(a, a)

  /** All `numBits` hyperplane sign bits of a scaled int vector packed
    * into `numBits / bitsPerBand` band codes (one codegen'd loop).
    */
  def hyperplaneBands(a: Column, numBits: Int, bitsPerBand: Int): Column =
    SparkShim.column(HyperplaneBands(SparkShim.expression(a), numBits, bitsPerBand))

  /** Common-element count of two SORTED `array<long>` set columns. */
  def intersectCountSorted(a: Column, b: Column): Column =
    SparkShim.column(IntersectCountSortedLong(
      SparkShim.expression(a), SparkShim.expression(b)))

  /** Thresholded variant (PPJoin positional verification): the exact
    * common count when it reaches `⌈num·|a|/den⌉`, −1 as soon as the
    * remaining elements can no longer get there — failing pairs bail
    * after the disjoint prefix instead of walking both full arrays.
    */
  def intersectCountAtLeastFrac(a: Column, b: Column,
      num: Int, den: Int): Column =
    SparkShim.column(IntersectCountAtLeastFrac(
      SparkShim.expression(a), SparkShim.expression(b), num, den))

  /** Bounded top-k aggregate: the k largest (key DESC, payload ASC)
    * pairs per group as `array<struct<key, payload>>` in rank order.
    * Partial-aggregable — at most k pairs per group leave each map task
    * (vs every row under a `row_number().over(window)` plan).
    */
  def topK(key: Column, payload: Column, k: Int): Column =
    SparkShim.column(TopKPairs(
      SparkShim.expression(key), SparkShim.expression(payload), k)
      .toAggregateExpression())

  /** Misra–Gries heavy-hitters CANDIDATE sketch: the surviving candidate
    * items (every item with frequency > n/(capacity+1) guaranteed
    * present, possibly plus run-dependent extras) as a sorted
    * `array<long>`. Partial-aggregable — ≤ capacity counters leave each
    * map task. Consume with an exact semi-join recount; never treat the
    * candidate set as final.
    */
  def misraGries(item: Column, capacity: Int): Column =
    SparkShim.column(MisraGries(SparkShim.expression(item), capacity)
      .toAggregateExpression())

  /** Replay an ORDERED BPE merge table over an `array<string>` token
    * column in one map-only codegen'd pass (each merge a leftmost-non-
    * overlapping rewrite, in training order) — encode cost independent
    * of the corpus-wide round count.
    */
  def bpeEncode(toks: Column, merges: Seq[(String, String)]): Column =
    SparkShim.column(BpeEncode(SparkShim.expression(toks), merges))

  /** Row-local argmin centroid id over a broadcast-attached
    * `array<struct<cid, vc, nc>>` column — the zero-Exchange replacement
    * for the crossJoin + window row_number()=1 assignment pattern.
    * `useL2`: rank by (nc − 2·v·vc, cid); else by the exact cosine desc
    * with cid-asc tie-break (same IEEE evaluation order as the composed
    * plan it replaces).
    */
  def nearestCentroidId(v: Column, nrm: Column, cents: Column,
      useL2: Boolean): Column =
    SparkShim.column(NearestCentroidId(SparkShim.expression(v),
      SparkShim.expression(nrm), SparkShim.expression(cents), useL2))

  /** Per-subspace nearest-codeword emit over a broadcast-attached
    * `array<struct<j, code, emit, cv, cn>>` codebook column: winner per j
    * by (cn − 2·sv_j·cv, code), output the winners' `emit` fields as
    * `array<long>(m)`.
    */
  def pqBestCodes(v: Column, books: Column, m: Int = 8, sub: Int = 8): Column =
    SparkShim.column(PqBestCodes(SparkShim.expression(v),
      SparkShim.expression(books), m, sub))

  /** Per-query ADC lookup table (`array<array<long>>`, subspace-major,
    * positioned by dense codeword index) over the same codebook layout as
    * [[pqBestCodes]] with `emit` = the dense index.
    */
  def pqLutArr(v: Column, books: Column, m: Int = 8, sub: Int = 8): Column =
    SparkShim.column(PqLutArr(SparkShim.expression(v),
      SparkShim.expression(books), m, sub))

  /** Top-`npe` probed cells (rank order, exact coarse dot riding along) as
    * `array<struct<cell, cdot>>` — the zero-Exchange replacement for the
    * query×centroid crossJoin + window probe.
    */
  def topCells(v: Column, nrm: Column, npe: Column, cents: Column,
      useL2: Boolean): Column =
    SparkShim.column(TopCellsExpr(SparkShim.expression(v),
      SparkShim.expression(nrm), SparkShim.expression(npe),
      SparkShim.expression(cents), useL2))

  /** First 60 bits of md5(s) as a long — bit-identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)::long` (the engine's
    * oracle-replayable string hash) without the hex-encode / substring /
    * base-16-parse detour.
    */
  def md5Prefix60(s: Column): Column =
    SparkShim.column(Md5Prefix60(SparkShim.expression(s)))
}
