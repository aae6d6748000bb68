package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector primitives over `array<float>` embedding columns, composed
  * from codegen'd higher-order functions (`zip_with` + `aggregate`) —
  * no UDF, no driver round-trip. Accumulation is left-to-right in
  * DOUBLE, matching DuckDB's `list_cosine_similarity` order so oracle
  * hashes line up.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² in double precision. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))

  /** Cosine similarity in double precision. Native one-pass expression
    * (see [[graft.functions.expressions.CosineSimilarity]]) — the HOF
    * composition `dot/(sqrt(normSq)·sqrt(normSq))` is interpreted per
    * element and dominates pairwise workloads; the native loop keeps
    * the identical IEEE op order, so results are bit-equal. */
  def cosine(a: Column, b: Column): Column = GraftColumns.cosineSim(a, b)

  /** Random-hyperplane LSH signature: `numBits` deterministic
    * pseudo-random hyperplanes; plane j's component for dimension i is
    * derived from xxhash64(j, i) scaled to [-1, 1). The signature is
    * the integer whose bit j is sign(v · plane_j). Fully deterministic
    * and reproducible across runs and engines — no RNG state.
    *
    * The plane matrix is materialized ONCE driver-side (same xxhash64
    * chain Spark's expression evaluates — parity spec-asserted against
    * [[hyperplaneSignatureHof]]) and signing runs through the native
    * [[graft.functions.expressions.HyperplaneSignature]] loop; the HOF
    * formulation re-hashed numBits × dim times per ROW, interpreted.
    */
  def hyperplaneSignature(vec: Column, dim: Int, numBits: Int, seed: Int = 0): Column =
    GraftColumns.hyperplaneSignature(vec, planeMatrix(dim, numBits, seed))

  /** The deterministic plane matrix [[hyperplaneSignature]] signs
    * against — exposed so the s02 DuckDB oracle can interpolate the
    * SAME plane values as SQL literals (java.lang.Double.toString
    * round-trips exactly, so both engines dot against identical
    * doubles). */
  private[graft] def planeMatrix(dim: Int, numBits: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(numBits, dim)((j, i) => hashToUnitScala(seed + j, i))

  /** HOF reference formulation of [[hyperplaneSignature]] — kept as
    * the parity oracle for the native expression. */
  def hyperplaneSignatureHof(vec: Column, dim: Int, numBits: Int, seed: Int = 0): Column = {
    val bits = (0 until numBits).map { j =>
      // dot(vec, plane_j) where plane_j[i] = hashToUnit(seed + j, i)
      val contrib = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast(DoubleType) * hashToUnit(lit(seed + j), i)),
        lit(0.0), (acc, x) => acc + x)
      when(contrib >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Deterministic pseudo-random double in [-1, 1) from two ints. */
  private def hashToUnit(a: Column, b: Column): Column =
    (pmod(xxhash64(a, b), lit(1000003L)).cast(DoubleType) / lit(500001.5)) - lit(1.0)

  /** Driver-side replica of [[hashToUnit]]: Spark's xxhash64(a, b)
    * chains XxHash64Function over the operands starting from seed 42. */
  private def hashToUnitScala(a: Int, b: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.IntegerType
    val h1 = XxHash64Function.hash(a, IntegerType, 42L)
    val h2 = XxHash64Function.hash(b, IntegerType, h1)
    (java.lang.Math.floorMod(h2, 1000003L).toDouble / 500001.5) - 1.0
  }
}
