package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures decodes per-partition with deterministic stub features") {
    val media = Seq((1L, "s0", "abc"), (2L, "s1", ""))
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"), col("text").cast(BinaryType).as("payload"))
      .as[Multimodal.MediaRecord]
    val out = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(out(0).n_bytes == 3)
    assert(out(0).width == 3 && out(0).height == 21)
    // brightness of "abc" = mean(97,98,99)/255 = 98/255 (raw double,
    // same IEEE op order as the DuckDB oracle)
    assert(out(0).brightness == 294.0 / 3 / 255.0)
    assert(out(1).n_bytes == 0 && out(1).brightness == 0.0)
  }

  test("embed produces the 64-bin byte histogram; identical payloads cosine to 1") {
    val media = Seq((1L, "s0", "abcabc"), (2L, "s0", "abcabc"), (3L, "s0", "zzzzzz"))
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"), col("text").cast(BinaryType).as("payload"))
      .as[Multimodal.MediaRecord]
    val out = Multimodal.embed(spark, media).collect().sortBy(_.doc_id)
    assert(out.forall(_.hist.size == 64), "fixed 64-dim vector contract")
    // 'a'=97,'b'=98,'c'=99 all land in bin 24; counts are exact ints
    assert(out(0).hist(24) == 6.0 && out(0).hist.sum == 6.0)
    assert(out(2).hist(30) == 6.0) // 'z'=122 -> bin 30
    assert(out(0).hist == out(1).hist, "identical payloads embed identically")
    // the p05 composition finds the identical pair at cosine 1
    val pairs = SparkEntry.queries("p05_multimodal_dedup")(spark, sfDir)
    assert(pairs.columns.toSeq == Seq("a_id", "b_id", "source", "cosine"))
    val top = pairs.filter(col("cosine") >= 0.9999).count()
    assert(pairs.count() > 0, "sf0.001 corpus must yield some near-dup pairs")
    assert(top > 0, "the corpus contains identical payloads; they must pair at cosine ~1")
  }

  test("approx sketches track exact values (q33/q34 self-check)") {
    val d33 = SparkEntry.queries("q33_approx_distinct")(spark, sfDir)
      .select("approx_students", "exact_students").as[(Double, Long)].collect()
    d33.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) <= math.max(2.0, exact * 0.1),
        s"approx $approx too far from exact $exact")
    }
    val d34 = SparkEntry.queries("q34_approx_percentile")(spark, sfDir)
    Seq("p25", "p50", "p75", "p95").foreach { p =>
      d34.select(s"approx_$p", s"exact_$p").as[(Double, Double)].collect()
        .foreach { case (a, e) =>
          assert(math.abs(a - e) <= math.max(1.0, e * 0.05), s"$p approx $a vs exact $e")
        }
    }
  }
}
