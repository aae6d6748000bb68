package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftColumns
import graft.operators.IntLloyd

/** The replayable integer Lloyd fit: the invariants the d07/s03/s04/
  * s05 oracle-exact gate rests on. The cross-engine replay itself is
  * proven by the DuckDB correctness gate (scripts/check.py); these
  * pin the ENGINE-side contract so a refactor can't silently break
  * the properties the SQL generator assumes. */
class IntLloydSpec extends SparkSpec {
  import spark.implicits._

  test("quantize is the exact floor(x*1024 + 0.5) grid, including negatives") {
    val out = Seq((1L, Array(0.0f, 1.0f, -1.0f, 0.00048828125f, -0.00048828125f)))
      .toDF("id", "vec")
      .select(IntLloyd.quantize(col("vec")).as("qv"))
      .as[Array[Long]].head()
    // 0.00048828125 = 0.5/1024 exactly: *1024 + 0.5 = 1.0 → floor 1;
    // the negative twin lands on 0.0 → floor 0 (round-half-up via
    // floor, not HALF_EVEN — the convention both engines share).
    assert(out.toSeq == Seq(0L, 1024L, -1024L, 1L, 0L))
  }

  test("NearestCentroidSq: exact argmin, lowest-index ties, per-subspace codebooks") {
    val cents: Array[Array[Array[Long]]] = Array(
      Array(Array(0L, 0L), Array(10L, 0L), Array(0L, 10L)), // subspace 0
      Array(Array(5L, 5L), Array(5L, 5L), Array(-5L, -5L))) // subspace 1 (dup centroids)
    val rows = Seq(
      (0, Array(1L, 0L)),   // nearest (0,0) → cluster 0
      (0, Array(6L, 0L)),   // nearest (10,0) → cluster 1
      (0, Array(5L, 0L)),   // EXACT tie between (0,0) and (10,0) → lowest index 0
      (1, Array(6L, 6L)),   // dup centroids 0/1 tie → 0
      (1, Array(-4L, -4L))) // → cluster 2
    val got = rows.toDF("m", "sv")
      .select(GraftColumns.nearestCentroidSq(col("m"), col("sv"), cents).as("c"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 1, 0, 0, 2))
  }

  test("fit is deterministic, carries empty clusters, and subspaces are independent") {
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 0.3f else -0.3f
      (i, Array.tabulate(8)(j => base + 0.001f * ((i + j) % 5)))
    }.toDF("id", "vec")
    def coarse() = IntLloyd.fit(vecs, "id", "vec", n = 40,
      numSub = 1, subLen = 8, k = 4, cap = 100, iters = 3, salt = "spec")
    val a = coarse(); val b = coarse()
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq,
      "fit must be bit-deterministic across invocations")
    assert(a(0).length == 4 && a(0).forall(_.length == 8))

    // subspace independence: a 2-subspace fit over the 8-dim vectors
    // equals two 1-subspace fits over the 4-dim halves (same salt —
    // the training sample and init draws are row-level, not
    // subspace-level)
    val joint = IntLloyd.fit(vecs, "id", "vec", n = 40,
      numSub = 2, subLen = 4, k = 3, cap = 100, iters = 3, salt = "spec")
    val lo = IntLloyd.fit(vecs.select(col("id"), slice(col("vec"), 1, 4).as("vec")),
      "id", "vec", n = 40, numSub = 1, subLen = 4, k = 3, cap = 100,
      iters = 3, salt = "spec")
    val hi = IntLloyd.fit(vecs.select(col("id"), slice(col("vec"), 5, 4).as("vec")),
      "id", "vec", n = 40, numSub = 1, subLen = 4, k = 3, cap = 100,
      iters = 3, salt = "spec")
    assert(joint(0).map(_.toSeq).toSeq == lo(0).map(_.toSeq).toSeq)
    assert(joint(1).map(_.toSeq).toSeq == hi(0).map(_.toSeq).toSeq)
  }

  test("driver-side fit equals the distributed fit bit-for-bit (random frames)") {
    // fit() dispatches to a driver-local Lloyd loop below the scale
    // gate (r16 optimization: one bounded collect instead of 1+iters
    // collect jobs per fit); this pins the two paths to the SAME
    // centroids on random frames — over- and under-k regimes, an
    // admission-filtered sample (n > cap), and a multi-subspace fit.
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 60L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    }.toDF("id", "vec")
    for ((numSub, subLen, k, cap, n) <- Seq(
        (1, 8, 4, 100L, 60L),   // n <= cap: sample = identity
        (1, 8, 128, 100L, 60L), // k > rows: kEff clamps to the sample
        (2, 4, 3, 32L, 60L),    // n > cap: md5 admission filters
        (4, 2, 5, 100L, 60L))) {
      val q = vecs.select(col("id"), IntLloyd.quantize(col("vec")).as("qv"))
      val train0 = IntLloyd.trainingSample(q, col("id"), n, cap, "spec2")
      val drv = IntLloyd.fitOnDriver(train0, numSub, subLen, k, cap,
        iters = 3, salt = "spec2", n = n)
      val dist = IntLloyd.fitDistributed(train0, numSub, subLen, k, cap,
        iters = 3, salt = "spec2", n = n)
      assert(drv.map(_.map(_.toSeq).toSeq).toSeq ==
        dist.map(_.map(_.toSeq).toSeq).toSeq,
        s"driver != distributed at numSub=$numSub k=$k cap=$cap")
    }
  }

  test("empty clusters carry their previous centroid (never vanish or zero)") {
    // all vectors identical → init duplicates the same centroid k=2
    // times; every row assigns to cluster 0 (lowest-index tie), so
    // cluster 1 is EMPTY every iteration and must keep its init
    // coordinates — the COALESCE contract the SQL replay mirrors.
    // (n <= cap → the training sample is the identity, the
    // sf0.01/sf0.1 gate regime; the >cap admission path is exercised
    // by the scale corpora and replayed in SQL by check.py.)
    val vecs = (0L until 10L).map(i => (i, Array.fill(4)(0.1f))).toDF("id", "vec")
    val cents = IntLloyd.fit(vecs, "id", "vec", n = 10,
      numSub = 1, subLen = 4, k = 2, cap = 10, iters = 2, salt = "spec")
    assert(cents(0).length == 2)
    // quantize(0.1f) = floor(0.1f·1024 + 0.5) = 102
    assert(cents(0).forall(_.toSeq == Seq(102L, 102L, 102L, 102L)))
  }
}
