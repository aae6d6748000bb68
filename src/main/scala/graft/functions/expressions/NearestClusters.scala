package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Indices of the `k` nearest centroids to a vector, by cosine
  * similarity, ties broken by lower index — the coarse-quantizer
  * assignment step of IVF indexing (s03 probe lists, d07 multi-probe
  * blocking).
  *
  * The HOF formulation (`array_sort(transform(centroids, c ->
  * struct(-cosine, idx)))`) evaluates an interpreted lambda per
  * centroid per row — k × dim work with per-element overhead, the
  * assignment hot spot once k scales as √corpus. This expression
  * holds the centroid matrix as `Seq[Seq[Double]]` — structural
  * equality, so Catalyst canonicalization / `semanticEquals` /
  * common-subexpression elimination see two identical assignments as
  * one (array params compare by identity and silently defeat all
  * three) — and materializes a primitive copy ONCE for the hot loop,
  * keeping a running top-k insertion, so assignment is one tight loop.
  *
  * Zero-norm inputs score -1.0, consistent with [[CosineSimilarity]];
  * a vector whose dimension differs from the centroid dimension
  * raises (same contract) — a garbage assignment would silently
  * poison the inverted lists.
  */
case class NearestClusters(child: Expression,
                           centroids: Seq[Seq[Double]], k: Int)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (k >= 1 && centroids.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs k >= 1 and a non-empty centroid set")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.simpleString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  // primitive copy + norms precomputed once — the per-row loop only
  // needs dots over primitive arrays
  private lazy val centArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  private lazy val centNorms: Array[Double] =
    centArr.map(c => math.sqrt(c.map(x => x * x).sum))

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = a.numElements()
    val vec = new Array[Double](dim)
    var i = 0
    var vNormSq = 0.0
    while (i < dim) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      vec(i) = x; vNormSq += x * x; i += 1
    }
    val vNorm = math.sqrt(vNormSq)
    val kk = math.min(k, centArr.length)
    val bestIdx = new Array[Int](kk)
    val bestScore = Array.fill(kk)(Double.NegativeInfinity)
    var c = 0
    while (c < centArr.length) {
      val cent = centArr(c)
      if (cent.length != dim) {
        throw new IllegalArgumentException(
          s"$prettyName: vector dimension $dim does not match centroid dimension ${cent.length}")
      }
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += vec(j) * cent(j); j += 1 }
      val denom = vNorm * centNorms(c)
      val cos = if (denom == 0.0) -1.0 else dot / denom
      // ascending index iteration + strict > keeps the lower index on ties
      if (cos > bestScore(kk - 1)) {
        var p = kk - 1
        while (p > 0 && cos > bestScore(p - 1)) {
          bestScore(p) = bestScore(p - 1); bestIdx(p) = bestIdx(p - 1); p -= 1
        }
        bestScore(p) = cos; bestIdx(p) = c
      }
      c += 1
    }
    new GenericArrayData(bestIdx)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestClusters =
    copy(child = newChild)
  override def prettyName: String = "nearest_clusters"
}
