package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (`array<float>` columns) for similarity search
  * and near-duplicate detection.
  *
  * Dot products are computed over scaled-integer components: each float is quantized
  * to `round(x * 1e6)` (a 64-bit long). Integer sums are associative, so the result is
  * bit-identical regardless of partial-aggregation order or partitioning — a property
  * plain float sums do NOT have on a cluster. The quantization error (1e-6 per
  * component) is far below any useful similarity threshold, and the final cosine is a
  * deterministic IEEE double. All pure column expressions — no UDFs, stays in codegen.
  */
object VectorFns {

  val Scale = 1000000.0

  /** `round(x·1e6)` as long, with non-finite components (NaN/±Inf) mapped to 0.
    * A bare `.cast("long")` throws CAST_OVERFLOW under ANSI on one degenerate
    * component and kills the whole job; saturating to Long.Min/Max instead
    * would overflow the downstream plane/dot multiplications. Zero is the one
    * value that is crash-free through every consumer, and the native kernel
    * (`HyperplaneBucketExpr.compute`) applies the identical rule. */
  private def quantizeComponent(x: Column): Column = {
    val s = x.cast("double") * Scale
    when(isnan(s) || s === Double.PositiveInfinity ||
        s === Double.NegativeInfinity, lit(0L))
      .otherwise(round(s).cast("long"))
  }

  /** Quantize a float/double vector to longs: round(x_i·1e6). Do this ONCE per row
    * before any pairwise join — quantizing inside an O(n²) candidate loop was
    * measured 6× slower (higher-order functions evaluate interpreted). */
  def quantize(v: Column): Column =
    transform(v, quantizeComponent(_))

  /** Dot product of two pre-quantized long vectors (exact integer). Native
    * fused-loop expression — the column form (`dotLongCols`) evaluates its
    * lambdas interpreted per pair and is kept as the spec-pinned reference. */
  def dotLong(a: Column, b: Column): Column = QuantizedDot(a, b)

  /** Reference column-expression implementation of `dotLong`. */
  def dotLongCols(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Euclidean norm of a pre-quantized vector, as a deterministic double. */
  def normLong(a: Column): Column = sqrt(dotLong(a, a).cast("double"))

  /** Elementwise quantized product sum: Σ round(a_i·1e6)·round(b_i·1e6) as long. */
  def dotScaled(a: Column, b: Column): Column = dotLong(quantize(a), quantize(b))

  def normSqScaled(a: Column): Column = dotScaled(a, a)

  /** Cosine similarity from quantized components; deterministic double.
    * Prefer `cosineFromQuantized` in pairwise loops. Zero-norm operands yield
    * NULL (never a divide — ANSI mode would throw), so a `cosine >= t` filter
    * drops them: zero vectors match nothing, by contract. */
  def cosine(a: Column, b: Column): Column = {
    val d = sqrt(normSqScaled(a).cast("double")) *
      sqrt(normSqScaled(b).cast("double"))
    when(d === 0.0, lit(null).cast("double"))
      .otherwise(dotScaled(a, b).cast("double") / d)
  }

  /** Cosine from pre-quantized vectors + pre-computed norms (per-pair cost = one
    * zip_with fold). Bit-identical to `cosine` on the raw vectors, including
    * the zero-norm → NULL contract. */
  def cosineFromQuantized(qa: Column, qb: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dotLong(qa, qb).cast("double") / (na * nb))

  /** Sign-bit signature against `nPlanes` deterministic pseudo-random hyperplanes —
    * the LSH bucketing primitive for approximate nearest neighbor at scale. Plane
    * components are derived from `xxhash64(planeIdx * 4099 + dimIdx)` so every
    * executor materializes identical planes with zero driver coordination or
    * broadcast payload. Returns an int bucket id in [0, 2^nPlanes).
    *
    * Backed by the native `HyperplaneBucketExpr` compiled loop;
    * `hyperplaneBucketCols` is the interpreted column reference the
    * equivalence spec pins it against (the column form nests
    * aggregate/zip_with/transform lambdas per plane — 96 interpreted folds
    * per row at 12 planes × 8 bands). */
  def hyperplaneBucket(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    HyperplaneBucketExpr(vec, nPlanes, planeOffset)

  /** Reference column-expression implementation of `hyperplaneBucket`. */
  def hyperplaneBucketCols(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column = {
    val bits = (0 until nPlanes).map { pl =>
      val p = pl + planeOffset // plane family index; offset gives independent bands
      // plane_p[d] = (xxhash64(p*4099+d) mod 2001) - 1000  (zero-mean integer plane)
      val dot = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            d => pmod(xxhash64(lit(p) * lit(4099) + d), lit(2001L)) - lit(1000L)),
          (x, plane) => quantizeComponent(x) * plane),
        lit(0L), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << pl)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).cast("int")
  }
}
