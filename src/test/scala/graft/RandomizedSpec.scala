package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.GraftColumns
import graft.operators.Operators

/** Seeded randomized invariants — each property generates one batch
  * and checks it in a single Spark job (not one job per case). */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private val vocab = Vector("spark", "query", "join", "scan", "filter", "agg",
    "window", "sort", "hash", "merge", "row", "column", "table", "stream")

  private def doc(n: Int): String = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("minhash estimate tracks true shingle jaccard on random near-dup pairs") {
    // pairs: (base, mutated copy) with varying mutation rates
    val pairs = (0 until 40).map { i =>
      val base = doc(60)
      val toks = base.split(" ")
      val mutRate = i % 4 * 0.15
      val mutated = toks.map(t =>
        if (rnd.nextDouble() < mutRate) vocab(rnd.nextInt(vocab.size)) else t).mkString(" ")
      (i.toLong, base, mutated)
    }
    def shingleSet(t: String) = t.sliding(8).toSet
    val expected = pairs.map { case (i, a, b) =>
      val (sa, sb) = (shingleSet(a), shingleSet(b))
      i -> (sa intersect sb).size.toDouble / (sa union sb).size
    }.toMap
    val est = pairs.toDF("id", "a", "b")
      .select(col("id"),
        GraftColumns.minHashShingles(col("a"), 8, 128).as("sa"),
        GraftColumns.minHashShingles(col("b"), 8, 128).as("sb"))
      .select(col("id"), (aggregate(zip_with(col("sa"), col("sb"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
        .cast("double") / 128).as("est"))
      .as[(Long, Double)].collect().toMap
    pairs.foreach { case (i, _, _) =>
      assert(math.abs(est(i) - expected(i)) < 0.2,
        s"pair $i: est ${est(i)} vs true ${expected(i)}")
    }
  }

  test("latestWins emits exactly one row per key, the maximal one") {
    val rows = (0 until 500).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(1000), rnd.nextInt(100))
    }
    val df = rows.toDF("k", "t", "tie")
    val out = Operators.latestWins(df, Seq(col("k")),
        Seq(col("t").desc, col("tie").desc))
      .as[(Long, Int, Int)].collect()
    val byKey = rows.groupBy(_._1)
    assert(out.length == byKey.size)
    out.foreach { case (k, t, tie) =>
      val best = byKey(k).maxBy(r => (r._2, r._3))
      assert((t, tie) == (best._2, best._3), s"key $k: got ($t,$tie) want $best")
    }
  }

  test("saltedSumCount equals direct aggregation on skewed random data") {
    // 90% of rows on one hot key — the scenario salting exists for
    val rows = (0 until 2000).map { _ =>
      val k = if (rnd.nextDouble() < 0.9) 0L else rnd.nextInt(20).toLong
      (k, math.rint(rnd.nextDouble() * 10000) / 100)
    }
    val df = rows.toDF("k", "v")
    val salted = Operators.saltedSumCount(df, Seq(col("k")), QUtil.money(col("v")), 16)
      .withColumn("sum_value", col("sum_value").cast("double"))
      .orderBy("k").as[(Long, Double, Long)].collect()
    val direct = df.groupBy("k")
      .agg(QUtil.moneySum(col("v")).as("s"), count(lit(1)).as("c"))
      .orderBy("k").as[(Long, Double, Long)].collect()
    assert(salted.toSeq == direct.toSeq)
  }

  test("sessionize: within-session gaps <= threshold, cross-session gaps > threshold") {
    val ts0 = 1700000000000000L // µs
    val rows = (0 until 300).scanLeft((0L, ts0)) { case ((_, prev), i) =>
      val user = i % 5
      val gap = if (rnd.nextDouble() < 0.2) 3600L * 1000000 else rnd.nextInt(600) * 1000000L
      (user.toLong, prev + gap)
    }.drop(1).map { case (u, t) => (u, new java.sql.Timestamp(t / 1000)) }
    val df = rows.toDF("user_id", "ts")
    val out = Operators.sessionize(df, "user_id", "ts", gapSeconds = 1800)
      .select("user_id", "ts", "session_id")
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).values
    out.foreach { events =>
      val sorted = events.toSeq.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Seq((_, t1, s1), (_, t2, s2)) =>
          val gapS = (t2.getTime - t1.getTime) / 1000.0
          if (s1 == s2) assert(gapS <= 1800, s"same session but gap $gapS")
          else assert(gapS > 1800, s"new session but gap $gapS")
        case _ =>
      }
    }
  }

  test("d12 repeated-span cover equals a brute-force reference on random corpora") {
    // small vocab forces plenty of repeated 8-grams, including
    // overlapping and same-doc repeats — the interval-union edge cases
    val docs = (0 until 60).map(i => (i.toLong, doc(6 + rnd.nextInt(30))))
    val df = docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("d12rand").toString
    df.write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d12_dedup_substring")(spark, dir)
      .select("doc_id", "total_tokens", "n_spans", "repeated_tokens")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // brute force: count each gram string's corpus occurrences, mark
    // covered token positions, measure runs — independent formulation
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val occ = toks.values.flatMap(ts => ts.sliding(8).filter(_ => true)
      .map(_.mkString(" "))).toSeq
      .filter(_ => true).groupBy(identity).map { case (g, v) => g -> v.size }
    docs.foreach { case (id, _) =>
      val ts = toks(id)
      val covered = Array.fill(ts.size)(false)
      if (ts.size >= 8) ts.sliding(8).zipWithIndex.foreach { case (g, p) =>
        if (ts.size - p >= 8 && occ(g.mkString(" ")) >= 2)
          (p until p + 8).foreach(covered(_) = true)
      }
      val runs = covered.foldLeft((0, false)) { case ((n, in), c) =>
        if (c && !in) (n + 1, true) else (n, c)
      }._1
      val (_, total, spans, rep) = out(id)
      assert(total == ts.size, s"doc $id token count")
      assert(rep == covered.count(identity), s"doc $id covered tokens")
      assert(spans == runs, s"doc $id span count")
    }
  }

  test("q79-style distribution-frame rank equals percent_rank on random scores") {
    // the scalable cnt_less/(n-1) formulation vs the textbook window,
    // with deliberate score TIES (small value domain)
    val rows = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(6), rnd.nextInt(25).toDouble))
    val df = rows.toDF("id", "band", "score")
    val dist = df.groupBy(col("band"), col("score")).agg(count(lit(1)).as("cnt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band")).orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("band"))
    val ranked = dist
      .withColumn("cnt_less", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .withColumn("n_band", sum(col("cnt")).over(wTot))
    val got = df.join(ranked, Seq("band", "score"))
      .withColumn("pct", when(col("n_band") === 1, lit(0d))
        .otherwise(col("cnt_less").cast("double") / (col("n_band") - 1)))
      .select("id", "pct").as[(Long, Double)].collect().toMap
    val wPr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band")).orderBy(col("score"))
    val expected = df.withColumn("pct", percent_rank().over(wPr))
      .select("id", "pct").as[(Long, Double)].collect().toMap
    rows.foreach { case (id, _, _) =>
      assert(got(id) == expected(id), s"row $id: ${got(id)} vs ${expected(id)}")
    }
  }

  test("p11 water-filling invariants hold on random frames at every budget regime") {
    // random per-source corpora; capacity = 3 epochs, weight = ⌊√cap⌋
    val base = (0 until 25).map { i =>
      val cap = 1L + rnd.nextInt(1000000)
      (f"src$i%02d", cap, cap * 3, math.max(1L, math.sqrt(cap.toDouble).toLong))
    }.toDF("source", "cap_tokens", "capacity", "w")
    for (factor <- Seq(1L, 2L, 4L)) {
      val out = graft.queries.Pipeline.waterfill(base, factor)
        .select("source", "cap_tokens", "capacity", "weight", "is_capped", "alloc_tokens")
        .as[(String, Long, Long, Long, Boolean, Long)].collect().toSeq
      assert(out.size == 25, "one allocation row per source")
      val budget = out.map(_._2).sum * factor
      val totalCapacity = out.map(_._3).sum
      out.foreach { case (s, _, capacity, _, _, alloc) =>
        assert(alloc >= 0 && alloc <= capacity, s"$s alloc $alloc beyond capacity $capacity")
      }
      if (budget >= totalCapacity) {
        // data-rich regime: every source caps at max epochs
        assert(out.forall(_._5), s"factor $factor: budget ≥ capacity must cap all")
        assert(out.map(_._6).sum == totalCapacity)
      } else {
        // constrained regime: budget conserved up to one floor per source
        val total = out.map(_._6).sum
        assert(total <= budget && total > budget - out.size,
          s"factor $factor: Σalloc $total vs budget $budget")
        // capped set is the low capacity/weight prefix
        val cappedR = out.filter(_._5).map(r => r._3.toDouble / r._4)
        val openR = out.filterNot(_._5).map(r => r._3.toDouble / r._4)
        if (cappedR.nonEmpty && openR.nonEmpty)
          assert(cappedR.max <= openR.min + 1e-9,
            s"factor $factor: capped ratios must not exceed uncapped ones")
        // uncapped sources share one water level (⌊λ·w⌋ → ratios within 1/w)
        val levels = out.filterNot(_._5)
          .map(r => r._6.toDouble / r._4)
        if (levels.nonEmpty)
          assert(levels.max - levels.min <= 1.0,
            s"factor $factor: uncapped allocation levels diverge: $levels")
      }
    }
  }

  test("q87/e12 integer chi-square terms track the exact rational statistic") {
    // term_micro = floor(1e6 · (O·N1 − C·N2)² / (C·N1·N2)) must sit
    // within 1 micro-unit of the true rational term — the floor is
    // the ONLY approximation in the whole statistic
    val cases = (0 until 200).map { _ =>
      val n1 = 1L + rnd.nextInt(100000)
      val n2 = 1L + rnd.nextInt(100000)
      val c = 1L + rnd.nextInt(n1.toInt)
      val o = rnd.nextInt(n2.toInt + 1).toLong
      (o, c, n1, n2)
    }
    val out = cases.toDF("o", "c", "n1", "n2")
      .selectExpr("o", "c", "n1", "n2",
        "CAST((CAST(o AS DECIMAL(38,0)) * n1 - CAST(c AS DECIMAL(38,0)) * n2) " +
          "* (CAST(o AS DECIMAL(38,0)) * n1 - CAST(c AS DECIMAL(38,0)) * n2) " +
          "* 1000000 div (CAST(c AS DECIMAL(38,0)) * n1 * n2) AS BIGINT) AS tm")
      .collect()
    out.foreach { r =>
      val (o, c, n1, n2) = (BigInt(r.getLong(0)), BigInt(r.getLong(1)),
        BigInt(r.getLong(2)), BigInt(r.getLong(3)))
      val exactFloor = ((o * n1 - c * n2).pow(2) * 1000000) / (c * n1 * n2)
      assert(BigInt(r.getLong(4)) == exactFloor, s"term drifted: $r")
      // and the micro value is within one unit of the real statistic
      val ref = ((o * n1 - c * n2).pow(2)).toDouble / (c * n1 * n2).toDouble
      assert(math.abs(r.getLong(4) / 1e6 - ref) <= 1e-6 + 1e-9 * ref)
    }
  }

  test("q89's multiplied-out 3σ inequality equals the z-rule exactly") {
    (0 until 100).foreach { _ =>
      val n = 5 + rnd.nextInt(400)
      val xs = Seq.fill(n)(BigInt(rnd.nextInt(100000)))
      val s = xs.sum
      val ss = xs.map(x => x * x).sum
      xs.foreach { x =>
        val intFlag = (BigInt(n) * x - s).pow(2) > 9 * (BigInt(n) * ss - s * s)
        val mu = BigDecimal(s) / n
        val varPop = (BigDecimal(ss) / n) - mu * mu
        if (varPop > 0) {
          val z2 = (BigDecimal(x) - mu).pow(2) / varPop
          // away from the exact z = 3 boundary the two must agree
          if ((z2 - 9).abs > BigDecimal("1e-9"))
            assert(intFlag == (z2 > 9), s"n=$n x=$x z2=$z2 flag=$intFlag")
        } else assert(!intFlag, "zero variance can never flag")
      }
    }
  }

  test("t19 intra-doc dedup equals a reference implementation on random docs") {
    val docs = (0 until 60).map { i =>
      val nSegs = rnd.nextInt(6)
      val segs = Seq.fill(nSegs)(doc(8))
      // plant repeats: shuffle in copies of earlier segments
      val withRepeats = segs ++ Seq.fill(rnd.nextInt(3))(
        if (segs.nonEmpty) segs(rnd.nextInt(segs.size)) else doc(8))
      val tail = doc(rnd.nextInt(8)) // possibly empty sub-segment tail
      (i.toLong, (rnd.shuffle(withRepeats) ++ Seq(tail).filter(_.nonEmpty))
        .mkString(" ").trim)
    }.filter(_._2.nonEmpty)
    def reference(text: String): (Long, Long, Long, Long, String) = {
      val toks = text.split(" ")
      val segs = toks.grouped(8).filter(_.length == 8).map(_.mkString(" ")).toSeq
      val tail = toks.drop(segs.size * 8)
      val kept = segs.zipWithIndex.filter { case (sg, i) => segs.indexOf(sg) == i }.map(_._1)
      (toks.length.toLong, segs.size.toLong, kept.size.toLong,
        (segs.size - kept.size).toLong, (kept ++ tail).mkString(" "))
    }
    val out = graft.queries.Pipeline.intraDocDedup(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    docs.foreach { case (id, text) =>
      assert(out(id) == reference(text), s"doc $id: ${out(id)} vs ${reference(text)}")
    }
  }

  test("t20 BPE training equals a reference unit-list trainer on random corpora") {
    import spark.implicits._
    // short words over a tiny alphabet force multi-char merges, ties,
    // and overlapping runs (aa a a...) within a few rounds
    def word(): String = Seq.fill(2 + rnd.nextInt(4))("abc".charAt(rnd.nextInt(3))).mkString
    val docs = (0 until 30).map(i => (i.toLong, Seq.fill(20)(word()).mkString(" ")))
    def reference(words: Map[String, Long], k: Int): Seq[(Int, String, String, String, Long)] = {
      var segs: Seq[(Vector[String], Long)] =
        words.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
      for (r <- 1 to k) {
        val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((u, c) <- segs; i <- 0 until u.length - 1)
          cnt((u(i), u(i + 1))) = cnt.getOrElse((u(i), u(i + 1)), 0L) + c
        if (cnt.nonEmpty) {
          val ((l, rr), c) = cnt.toSeq.minBy { case ((l, rr), c) => (-c, l, rr) }
          out += ((r, l, rr, l + rr, c))
          segs = segs.map { case (u, wc) =>
            val b = Vector.newBuilder[String]; var i = 0
            while (i < u.length) {
              if (i < u.length - 1 && u(i) == l && u(i + 1) == rr) { b += l + rr; i += 2 }
              else { b += u(i); i += 1 }
            }
            (b.result(), wc)
          }
        }
      }
      out.toSeq
    }
    val wordCounts = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
    val got = graft.queries.Pipeline.bpeTrain(docs.toDF("doc_id", "text"), 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(got == reference(wordCounts, 8), s"got $got\nref ${reference(wordCounts, 8)}")
    // the batched trainer must emit the IDENTICAL merge table — the
    // disjoint-prefix + strict-gap argument, fuzzed (this is the pin
    // that lets the sequential oracle certify the batched t20); small
    // bmax values exercise the window-boundary branches
    for (bmax <- Seq(2, 4, 16)) {
      // bpeTrainBatched routes tiny corpora to the driver-side fit, so
      // exercise the DISTRIBUTED batched loop directly as well — both
      // must equal the sequential argmax
      val batched = graft.queries.Pipeline
        .bpeTrainBatched(docs.toDF("doc_id", "text"), 8, bmax).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
      assert(batched == got, s"bmax=$bmax: batched $batched\nsequential $got")
      val wf = docs.toDF("doc_id", "text")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val dist = graft.queries.Pipeline.bpeTrainDistributed(wf, 8, bmax).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
      assert(dist == got, s"bmax=$bmax: distributed $dist\nsequential $got")
    }
  }

  test("t20 driver-side BPE fit equals the distributed loop, non-ASCII ties included") {
    import spark.implicits._
    // alphabet where UTF-16 code-unit order and UTF-8 byte order
    // DISAGREE: U+FF5A sorts BELOW U+1F600 in UTF-8/code-point order
    // but ABOVE it in UTF-16 code-unit order (high surrogates < FF5A)
    // — tie-breaks must follow the engines' UTF-8 order
    val alpha = Seq("a", "z", "\u00e9", "\uff5a", new String(Character.toChars(0x1F600)))
    def word(): String =
      Seq.fill(2 + rnd.nextInt(4))(alpha(rnd.nextInt(alpha.size))).mkString
    val docs = (0 until 40).map(i => (i.toLong, Seq.fill(12)(word()).mkString(" ")))
      .toDF("doc_id", "text")
    val wf = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val dist = graft.queries.Pipeline.bpeTrainDistributed(wf, 12, 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    val rows = wf.collect().map(r => (r.getString(0), r.getLong(1)))
    val fit = graft.queries.Pipeline.bpeTrainLocal(rows, 12)
    assert(fit.merges == dist, s"local ${fit.merges}\ndistributed $dist")
    // wordTok must equal the string-rewrite apply (leftmost-nonoverlap
    // replace of the bracketed form, merge order) — the path t23/p13
    // price the corpus through
    val bl = "\u0010"; val br = "\u0011"
    val tokRef = rows.map { case (w, _) =>
      var st = w.codePoints().toArray
        .map(cp => bl + new String(Character.toChars(cp)) + br).mkString
      fit.merges.foreach { case (_, l, r, m, _) =>
        st = st.replace(bl + l + br + bl + r + br, bl + m + br)
      }
      (w, st.count(_ == bl.charAt(0)).toLong)
    }.toMap
    assert(fit.wordTok.size == tokRef.size)
    fit.wordTok.foreach { case (w, t) => assert(t == tokRef(w), s"word $w: $t vs ref") }
  }
}
