package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.functions.GraftColumns

/** Replayable k-means: Lloyd's algorithm over INTEGER-QUANTIZED
  * vectors, every step exact and order-independent, so the entire fit
  * re-derives as plain SQL in the DuckDB oracle — the mechanism that
  * graduated MinHash/SimHash (affine-mod-prime family) and s02
  * (plane-literal LSH) from rows-only to hash-exact, applied to the
  * last rows-only family (the d07/s03/s04/s05 coarse quantizers and
  * PQ codebooks).
  *
  * Why a float k-means can never be oracle-exact: centroid means are
  * float reductions, and IEEE addition is order-sensitive — a shuffle
  * repartition (or another engine) perturbs ulps, which flips argmin
  * assignments, which moves centroids. This fit removes floats from
  * every decision point:
  *
  *  - vectors quantize to a 1/1024 integer grid:
  *    `floor(x·1024 + 0.5)` — float→double is exact, the scaled add
  *    stays well under 53 mantissa bits, both engines floor the same
  *    double to the same integer;
  *  - assignment is argmin of SQUARED L2 IN LONGS
  *    ([[graft.functions.expressions.NearestCentroidSq]]), ties to
  *    the lowest centroid id — `ORDER BY dist, cluster LIMIT 1` in
  *    SQL;
  *  - the centroid update is `floor(sum / count)` where sum is an
  *    exact integer sum (order-independent in any engine) and the one
  *    double division of exactly-representable integers is correctly
  *    rounded identically everywhere;
  *  - init and the training sample are salted-md5 draws (t07's
  *    admission idiom) — deterministic, layout-independent, and
  *    replayable since md5 agrees across engines.
  *
  * Embeddings are unit-normalized, so L2 argmin on the quantized grid
  * tracks the cosine objective the probes use; quantizer quality is
  * recall-gated either way (PipelineScaleSpec).
  *
  * Scale shape is unchanged from the ML fit it replaces: training is
  * an ABSOLUTE-capped sample, each Lloyd iteration is one map-side
  * assignment job over the sample (compiled argmin against broadcast
  * centroids — no join blow-up) plus a bounded groupBy, and the only
  * driver-side state is the centroid matrix itself (k × dim longs —
  * exactly what the ML fit held). PQ fits all M subspaces in ONE pass
  * over the sample via a subspace column instead of M separate jobs.
  */
object IntLloyd {
  /** Quantization grid: 1/1024. Products of two quantized
    * unit-vector elements stay ≤ ~2^22; 64-dim squared distances
    * ≤ ~2^28 — exact in Long and in double. */
  val Scale = 1024

  /** Exact integer quantization of a float/double vector column. */
  def quantize(vec: Column): Column =
    transform(vec, x =>
      floor(x.cast(DoubleType) * lit(Scale.toDouble) + lit(0.5d)).cast(LongType))

  /** The same grid in DuckDB. */
  def quantizeSql(vecExpr: String): String =
    s"list_transform(CAST($vecExpr AS DOUBLE[]), x -> " +
      s"CAST(floor(x * CAST($Scale AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))"

  /** Deterministic ≈`cap`-row training sample: t07's salted-md5
    * admission test at rate cap/n. Unlike `sample(fraction)` the
    * training-set SIZE is an absolute cap, not a corpus fraction — at
    * 100 TB of embeddings a 25–50% fraction is a 25–50 TB k-means
    * input, where the cap stays what the fit needs. The hash test is
    * map-side, layout-independent (repartition-stable) and replayable,
    * unlike `rand()` sampling. Its SQL twin is the `tr0` admission
    * predicate in [[fitSql]] — keep the two IN THIS FILE, side by
    * side: the d07/s03/s04/s05 hash-exact gate is the equality of
    * exactly these two formulas. */
  private[graft] def trainingSample(df: DataFrame, idCol: Column,
                                    n: Long, cap: Long, salt: String): DataFrame =
    if (n <= cap) df
    else {
      // first 8 md5 hex chars as a uniform draw in [0, 2^32)
      val threshold = math.ceil(math.pow(2, 32) * cap.toDouble / n).toLong
      df.filter(conv(substring(md5(concat(idCol.cast(StringType), lit(s"|$salt"))), 1, 8),
        16, 10).cast(LongType) < lit(threshold))
    }

  /** [[trainingSample]]'s admission predicate in DuckDB (`n`/`cap`
    * are in scope in the generated `tr0` CTE; the threshold formula
    * replays `ceil(2^32 · cap / n)` with the same op order). */
  private def admissionSql(salt: String): String =
    s"""n <= cap
       |     OR CAST(('0x' || substr(md5(CAST(id AS VARCHAR) || '|$salt'), 1, 8)) AS BIGINT)
       |        < CAST(ceil(CAST(4294967296 AS DOUBLE) * CAST(cap AS DOUBLE)
       |                    / CAST(n AS DOUBLE)) AS BIGINT)""".stripMargin

  /** Fit `numSub` independent codebooks of `k` centroids each (coarse
    * quantizer: numSub = 1, subLen = dim) on a capped salted-md5
    * training sample. Returns centroids(subspace)(cluster)(dim) as
    * exact integers; clusters that go empty in an iteration keep
    * their previous centroid (COALESCE in the SQL replay).
    *
    * Driver-side state is bounded by configuration, not data: the
    * init collect is ≤ numSub·k rows, each iteration's update collect
    * is ≤ numSub·k·subLen (cluster, dim) partial rows.
    */
  /** Scale gate for the driver-side fit below: the exploded sample
    * may hold at most this many Long cells (rows × numSub × subLen —
    * 32 MiB at 4M cells), and one fit may cost at most
    * [[DriverFitMaxFlops]] distance multiply-adds, before the fit
    * falls back to the distributed per-iteration path. The coarse
    * quantizer's cap is 64·k with k ≈ √n, so at warehouse scale
    * (k ~ 10⁴⁺) both bounds trip and the fit stays distributed —
    * the same small-side/big-side dispatch a broadcast join makes. */
  private val DriverFitMaxCells = 4L << 20
  private val DriverFitMaxFlops = 4L << 30

  def fit(vecs: DataFrame, idCol: String, vecCol: String, n: Long,
          numSub: Int, subLen: Int, k: Int, cap: Long, iters: Int,
          salt: String): Array[Array[Array[Long]]] = {
    val q = vecs.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
    val train0 = trainingSample(q, col("id"), n, cap, salt)
    // The sample is ABSOLUTE-capped (≈`cap` rows in expectation), so
    // below the gates the whole fit runs on the driver from ONE
    // bounded collect — the previous shape paid 1 + iters collect
    // jobs per fit (init + every Lloyd update), which the r16 profile
    // measured at ~0.1–0.2 s of scheduling per job across ~30 fit
    // sites in the suite (guide §1.2 step 1: remove passes). The
    // arithmetic below is the SAME exact integer arithmetic in the
    // same order as the distributed path (IntLloydSpec pins
    // driver == distributed on random frames), so centroids are
    // bit-identical and every oracle replay is unchanged.
    val sampleRows = math.min(n, cap)
    if (sampleRows * numSub * subLen <= DriverFitMaxCells &&
        iters.toLong * k * subLen * numSub * sampleRows <= DriverFitMaxFlops)
      fitOnDriver(train0, numSub, subLen, k, cap, iters, salt, n)
    else
      fitDistributed(train0, numSub, subLen, k, cap, iters, salt, n)
  }

  /** The distributed fit: one assignment+update job per Lloyd
    * iteration — the scale path once the sample or the fit's FLOPs
    * outgrow the driver gate. Kept callable separately so
    * IntLloydSpec can pin driver == distributed. */
  private[graft] def fitDistributed(train0: DataFrame, numSub: Int,
                                    subLen: Int, k: Int, cap: Long,
                                    iters: Int, salt: String,
                                    n: Long): Array[Array[Array[Long]]] = {
    val subCols = (0 until numSub).map(m =>
      struct(lit(m).as("m"), slice(col("qv"), m * subLen + 1, subLen).as("sv")))
    val tr = train0
      .select(col("id"), explode(array(subCols: _*)).as("t"))
      .select(col("t.m").as("m"), col("id"), col("t.sv").as("sv"))
      .persist()
    try {
      val wInit = Window.partitionBy(col("m")).orderBy(
        md5(concat(col("id").cast(StringType), lit(s"|init|$salt"))), col("id"))
      val initRows = tr
        .withColumn("cluster", row_number().over(wInit) - 1)
        .filter(col("cluster") < k)
        .select(col("m"), col("cluster"), col("sv"))
        .collect()
      require(initRows.nonEmpty,
        s"IntLloyd: empty training set (n=$n, cap=$cap, salt=$salt) — " +
          "the source table has no rows to fit on")
      // fail fast on geometry drift: a vector shorter than
      // numSub·subLen would CLAMP in both slice paths and silently
      // fit on truncated subvectors the oracle SQL doesn't mirror
      initRows.foreach { r =>
        val len = r.getSeq[Long](2).size
        require(len == subLen,
          s"IntLloyd: subspace slice is $len-dim, expected $subLen — " +
            "vector dimension does not match the numSub×subLen geometry")
      }
      var cents: Array[Array[Array[Long]]] = {
        val byM = initRows.groupBy(_.getInt(0))
        Array.tabulate(numSub) { m =>
          byM(m).sortBy(_.getInt(1))
            .map(_.getSeq[Long](2).toArray)
        }
      }
      for (_ <- 1 to iters) {
        val assigned = tr.withColumn("cluster",
          GraftColumns.nearestCentroidSq(col("m"), col("sv"), cents))
        val partials = assigned
          .select(col("m"), col("cluster"), posexplode(col("sv")).as(Seq("j", "v")))
          .groupBy(col("m"), col("cluster"), col("j"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
          .collect()
        val next = cents.map(_.map(_.clone())) // empty clusters keep their centroid
        partials.foreach { r =>
          val m = r.getInt(0); val cl = r.getInt(1); val j = r.getInt(2)
          next(m)(cl)(j) =
            math.floor(r.getLong(3).toDouble / r.getLong(4).toDouble).toLong
        }
        cents = next
      }
      cents
    } finally { tr.unpersist(); () }
  }

  /** The driver-side fit: ONE collect of the capped training sample,
    * then init + `iters` Lloyd rounds in local exact-integer
    * arithmetic — element-for-element the distributed path's
    * operations (md5-ordered init with id tie-break, strict-< argmin
    * by squared L2 in Longs, exact Long sums, floor(sum/count) of the
    * one double division), so the returned centroids are
    * bit-identical to the distributed path's and to the SQL replay.
    * Long sums are associative, so collect order is irrelevant. */
  private[graft] def fitOnDriver(train0: DataFrame, numSub: Int, subLen: Int,
                          k: Int, cap: Long, iters: Int, salt: String,
                          n: Long): Array[Array[Array[Long]]] = {
    val rows = train0.collect()
    require(rows.nonEmpty,
      s"IntLloyd: empty training set (n=$n, cap=$cap, salt=$salt) — " +
        "the source table has no rows to fit on")
    val ids = new Array[Long](rows.length)
    val qvs = new Array[Array[Long]](rows.length)
    var i = 0
    while (i < rows.length) {
      ids(i) = rows(i).get(0) match {
        case l: Long => l
        case x: Int => x.toLong
        case other => throw new IllegalArgumentException(
          s"IntLloyd: id column must be integral, got ${other.getClass}")
      }
      val s = rows(i).getSeq[Long](1)
      // same fail-fast as the distributed path's init check: a short
      // vector would silently fit on truncated subvectors otherwise
      require(s.length == numSub * subLen,
        s"IntLloyd: vector is ${s.length}-dim, expected ${numSub * subLen} — " +
          "vector dimension does not match the numSub×subLen geometry")
      qvs(i) = s.toArray
      i += 1
    }
    // init: the window's (md5(id || "|init|" || salt), id) order —
    // md5 hex is ASCII so String compare == the engine's binary
    // compare; the first min(k, rows) rows seed every subspace
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      val sb = new java.lang.StringBuilder(32)
      d.foreach(b => sb.append(f"${b & 0xff}%02x"))
      sb.toString
    }
    val order = Array.range(0, rows.length)
      .map(j => (md5hex(s"${ids(j)}|init|$salt"), ids(j), j))
      .sortBy(t => (t._1, t._2)).map(_._3)
    val kEff = math.min(k, rows.length)
    var cents = Array.tabulate(numSub) { m =>
      Array.tabulate(kEff) { c =>
        val qv = qvs(order(c))
        java.util.Arrays.copyOfRange(qv, m * subLen, (m + 1) * subLen)
      }
    }
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Long](numSub, kEff, subLen)
      val cnts = Array.ofDim[Long](numSub, kEff)
      var r = 0
      while (r < rows.length) {
        val qv = qvs(r)
        var m = 0
        while (m < numSub) {
          val cm = cents(m)
          val base = m * subLen
          var best = -1
          var bestD = Long.MaxValue
          var c = 0
          while (c < kEff) {
            val cent = cm(c)
            var d = 0L
            var j = 0
            while (j < subLen) {
              val t = qv(base + j) - cent(j); d += t * t; j += 1
            }
            if (d < bestD) { bestD = d; best = c } // strict <: lowest index wins
            c += 1
          }
          val sb = sums(m)(best)
          var j = 0
          while (j < subLen) { sb(j) += qv(base + j); j += 1 }
          cnts(m)(best) += 1
          m += 1
        }
        r += 1
      }
      val next = cents.map(_.map(_.clone())) // empty clusters keep their centroid
      var m = 0
      while (m < numSub) {
        var c = 0
        while (c < kEff) {
          if (cnts(m)(c) > 0) {
            var j = 0
            while (j < subLen) {
              next(m)(c)(j) =
                math.floor(sums(m)(c)(j).toDouble / cnts(m)(c).toDouble).toLong
              j += 1
            }
          }
          c += 1
        }
        m += 1
      }
      cents = next
      it += 1
    }
    cents
  }

  /** The fit as a DuckDB CTE chain (append inside a WITH clause). The
    * oracle strings are scale-factor-independent, so n/k/cap/threshold
    * are all computed IN SQL: `kExpr` may reference `n`, `capExpr`
    * may reference `k` and `n`. Emits `{p}cent(m, cluster, cv
    * DOUBLE[])` — integer-valued doubles, so downstream
    * `list_cosine_similarity` probes see bit-identical inputs to the
    * engine's [[graft.functions.expressions.NearestClusters]].
    */
  def fitSql(srcSql: String, idExpr: String, vecExpr: String,
             numSub: Int, subLen: Int, kExpr: String, capExpr: String,
             iters: Int, salt: String, p: String): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""${p}a$i AS (
         |  SELECT m, cluster, sv FROM (
         |    SELECT t.m, t.id, t.sv, c.cluster,
         |      row_number() OVER (PARTITION BY t.m, t.id ORDER BY
         |        list_sum(list_transform(generate_series(1, $subLen),
         |          j -> (t.sv[j]-c.cv[j])*(t.sv[j]-c.cv[j]))), c.cluster) AS rn
         |    FROM ${p}tr t JOIN ${p}c${i - 1} c ON t.m = c.m)
         |  WHERE rn = 1),
         |${p}u$i AS (
         |  SELECT a.m, a.cluster, g.j,
         |    CAST(floor(CAST(SUM(a.sv[g.j]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
         |  FROM ${p}a$i a CROSS JOIN generate_series(1, $subLen) AS g(j)
         |  GROUP BY a.m, a.cluster, g.j),
         |${p}c$i AS (
         |  SELECT c.m, c.cluster, COALESCE(u.cv, c.cv) AS cv
         |  FROM ${p}c${i - 1} c LEFT JOIN (
         |    SELECT m, cluster, list(v ORDER BY j) AS cv
         |    FROM ${p}u$i GROUP BY m, cluster) u
         |  ON u.m = c.m AND u.cluster = c.cluster)""".stripMargin
    }.mkString(",\n")
    s"""${p}q AS (SELECT $idExpr AS id, ${quantizeSql(vecExpr)} AS qv FROM ($srcSql)),
       |${p}pp AS (SELECT n, $kExpr AS k FROM (SELECT COUNT(*) AS n FROM ${p}q)),
       |${p}cp AS (SELECT n, k, $capExpr AS cap FROM ${p}pp),
       |${p}tr0 AS (
       |  SELECT id, qv FROM ${p}q, ${p}cp
       |  WHERE ${admissionSql(salt)}),
       |${p}tr AS (
       |  SELECT g.m, id, qv[(g.m*$subLen+1):((g.m+1)*$subLen)] AS sv
       |  FROM ${p}tr0 CROSS JOIN generate_series(0, ${numSub - 1}) AS g(m)),
       |${p}c0 AS (
       |  SELECT m, cluster, sv AS cv FROM (
       |    SELECT m, sv, row_number() OVER (PARTITION BY m ORDER BY
       |      md5(CAST(id AS VARCHAR) || '|init|$salt'), id) - 1 AS cluster
       |    FROM ${p}tr), ${p}cp
       |  WHERE cluster < k),
       |$iterCtes,
       |${p}cent AS (SELECT m, cluster, CAST(cv AS DOUBLE[]) AS cv FROM ${p}c$iters)""".stripMargin
  }
}
