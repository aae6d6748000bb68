package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles produce all k-grams, 1-based, clipped at the end") {
    val out = Seq("abcdef").toDF("t")
      .select(TF.shingles(col("t"), 4).as("s")).as[Seq[String]].head()
    assert(out == Seq("abcd", "bcde", "cdef"))
  }

  test("wordNgrams guards short arrays (Spark sequence counts down!)") {
    val out = Seq("a b c", "solo").toDF("t")
      .select(TF.wordNgrams(split(col("t"), " "), 2).as("n")).as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b c"))
    assert(out(1) == Seq.empty)
  }

  test("canonicalize lowercases and collapses non-alphanumerics") {
    val out = Seq("  Hello,  WORLD!! 42 ").toDF("t")
      .select(TF.canonicalize(col("t")).as("c")).as[String].head()
    assert(out == "hello world 42")
  }

  test("minhash: identical inputs → identical signatures; est jaccard sane") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
                 "the quick brown fox jumps over the lazy dog",
                 "completely different words entirely here now").toDF("t")
      .withColumn("hashes", transform(array_distinct(TF.shingles(col("t"), 4)), e => xxhash64(e)))
      .select(TF.minHashFromHashes(col("hashes"), 32).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    val agree02 = sigs(0).zip(sigs(2)).count { case (a, b) => a == b }
    assert(agree02 < 16, s"unrelated texts should not agree on most permutations ($agree02/32)")
  }

  test("simhash: identical → hamming 0; near texts closer than far texts") {
    val df = Seq("alpha beta gamma delta epsilon zeta eta theta",
                 "alpha beta gamma delta epsilon zeta eta iota",
                 "one two three four five six seven eight").toDF("t")
      .withColumn("hashes", transform(TF.tokens(col("t")), t => xxhash64(t)))
      .select(TF.simHashFromHashes(col("hashes")).as("sig"))
    val s = df.as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(0), s(0)) == 0)
    assert(ham(s(0), s(1)) < ham(s(0), s(2)),
      s"near pair ${ham(s(0), s(1))} should be closer than far pair ${ham(s(0), s(2))}")
  }

  test("dot and cosine compute exact values") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val (dot, cos) = df.select(VF.dot(col("a"), col("b")).as("d"),
      VF.cosine(col("a"), col("b")).as("c")).as[(Double, Double)].head()
    assert(dot == 32.0)
    assert(math.abs(cos - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq(Seq(0.5f, -1.5f, 2.5f)).toDF("a")
    val c = df.select(VF.cosine(col("a"), col("a")).as("c")).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("native hyperplaneSignature is bit-exact with the HOF formulation") {
    val rnd = new scala.util.Random(13)
    val dim = 64
    val df = Seq.tabulate(40)(_ => Seq.fill(dim)(rnd.nextGaussian().toFloat)).toDF("v")
    Seq(0, 1000, 3000).foreach { seed =>
      val rows = df.select(
        VF.hyperplaneSignature(col("v"), dim, 6, seed).as("native"),
        VF.hyperplaneSignatureHof(col("v"), dim, 6, seed).as("ref"))
        .as[(Long, Long)].collect()
      rows.foreach { case (n, r) =>
        assert(n == r, s"seed $seed: native $n != hof $r — plane replication drifted")
      }
    }
  }

  test("nearestClusters matches the array_sort HOF formulation, including ties") {
    import graft.functions.GraftColumns
    val rnd = new scala.util.Random(11)
    val dim = 8
    val cents = Array.tabulate(6, dim)((_, _) => rnd.nextGaussian())
    cents(3) = cents(1).clone() // duplicate centroid → cosine tie, lower idx must win
    val vecs = Seq.tabulate(50)(i => Seq.tabulate(dim)(_ => rnd.nextGaussian().toFloat)) :+
      Seq.fill(dim)(0.0f) // zero-norm row
    val df = vecs.toDF("v")
    val centroidArr = array(cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("idx"), array(c.toIndexedSeq.map(lit(_)): _*).as("cent"))
    }: _*)
    val hof = slice(array_sort(transform(centroidArr,
      c => struct((-VF.cosine(col("v"), c.getField("cent"))).as("d"),
        c.getField("idx").as("idx")))), 1, 3).getField("idx")
    val rows = df.select(
      graft.functions.GraftColumns.nearestClusters(col("v"), cents, 3).as("native"), hof.as("ref"))
      .as[(Seq[Int], Seq[Int])].collect()
    rows.foreach { case (native, ref) => assert(native == ref, s"$native != $ref") }
  }

  test("cosine edge contract matches DuckDB: length mismatch raises, zero-norm = -1, bad types rejected") {
    val mismatched = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      mismatched.select(VF.cosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("dimensions must be equal") ||
      Option(e.getCause).exists(_.getMessage.contains("dimensions must be equal")))
    val zero = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(zero.select(VF.cosine(col("a"), col("b")).as("c")).as[Double].head() == -1.0)
    // non-numeric arrays fail at ANALYSIS time, not mid-job
    val strings = Seq((Seq("x"), Seq("y"))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      strings.select(VF.cosine(col("a"), col("b"))).collect()
    }
  }

  test("native cosine is bit-equal to the HOF formulation and handles double arrays") {
    import org.apache.spark.sql.types.DoubleType
    val df = Seq((Seq(0.1f, -2.3f, 4.5f, 0.007f), Seq(3.3f, 0.0f, -1.25f, 9.9f)))
      .toDF("a", "b")
    // the native op is the HOF quotient CLAMPED to [-1, 1] (DuckDB's
    // contract — only bit-identical-vector pairs can leave the range)
    val hof = least(greatest(VF.dot(col("a"), col("b")) /
      (sqrt(VF.normSq(col("a"))) * sqrt(VF.normSq(col("b")))), lit(-1.0)), lit(1.0))
    val (native, viaHof) = df.select(VF.cosine(col("a"), col("b")).as("n"), hof.as("h"))
      .as[(Double, Double)].head()
    assert(java.lang.Double.doubleToLongBits(native) ==
      java.lang.Double.doubleToLongBits(viaHof))
    // a self-pair whose unclamped quotient rounds one ulp above 1.0
    // must clamp to exactly 1.0 (the p05 exact-duplicate case)
    val selfV = Seq.tabulate(16)(i => (69.0 + 52.0 * i) % 311.0)
    val selfCos = Seq((selfV, selfV)).toDF("a", "b")
      .select(VF.cosine(col("a"), col("b")).as("c")).as[Double].head()
    assert(java.lang.Double.doubleToLongBits(selfCos) ==
      java.lang.Double.doubleToLongBits(1.0), s"self-cosine must clamp to 1.0, got $selfCos")
    // mixed float/double operands (s03 probes: float query × double centroid)
    val mixed = df.select(VF.cosine(col("a"),
      transform(col("b"), x => x.cast(DoubleType))).as("m")).as[Double].head()
    assert(java.lang.Double.doubleToLongBits(mixed) ==
      java.lang.Double.doubleToLongBits(native))
    // SQL registration path
    org.apache.spark.sql.graftbridge.SqlBridge.registerGraftFunctions(spark)
    val viaSql = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c").as[Double].head()
    assert(math.abs(viaSql - 1.0) < 1e-12)
  }

  test("char_shingles and simhash_tokens SQL registrations match the Column API") {
    org.apache.spark.sql.graftbridge.SqlBridge.registerGraftFunctions(spark)
    val viaSql = spark.sql("SELECT char_shingles('abcdef', 4) AS s").as[Seq[String]].head()
    val viaCol = Seq("abcdef").toDF("t")
      .select(graft.functions.GraftColumns.charShingles(col("t"), 4).as("s"))
      .as[Seq[String]].head()
    assert(viaSql == viaCol && viaSql.toSet == Set("abcd", "bcde", "cdef"))
    val simSql = spark.sql("SELECT simhash_tokens('hello world') AS h").as[Long].head()
    val simCol = Seq("hello world").toDF("t")
      .select(graft.functions.GraftColumns.simHashTokens(col("t")).as("h")).as[Long].head()
    assert(simSql == simCol)
  }

  test("hyperplane signature is deterministic and seed-sensitive") {
    val df = Seq(Seq.tabulate(64)(i => (i % 7 - 3).toFloat)).toDF("v")
    val (s1, s2, s3) = df.select(
      VF.hyperplaneSignature(col("v"), 64, 8).as("a"),
      VF.hyperplaneSignature(col("v"), 64, 8).as("b"),
      VF.hyperplaneSignature(col("v"), 64, 8, seed = 99).as("c"))
      .as[(Long, Long, Long)].head()
    assert(s1 == s2)
    assert(s1 != s3)
  }

  test("hyperplaneSignature / nearestClusters raise on dimension mismatch (CosineSimilarity contract)") {
    // a wrong-dim vector must fail loudly — a silently truncated dot
    // product would poison every downstream LSH bucket / IVF list
    val bad = Seq(Seq.tabulate(5)(_.toDouble)).toDF("v")
    val planes = Array.tabulate(4, 8)((j, i) => (j + i + 1).toDouble)
    val e1 = intercept[Exception] {
      bad.select(graft.functions.GraftColumns.hyperplaneSignature(col("v"), planes)).collect()
    }
    def msg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msg(e1).contains("does not match plane dimension"))
    val e2 = intercept[Exception] {
      bad.select(graft.functions.GraftColumns.nearestClusters(col("v"), planes, 2)).collect()
    }
    assert(msg(e2).contains("does not match centroid dimension"))
  }

  test("hll_registers native aggregate == declarative register build, partitioning-invariant, SQL-registered") {
    import org.apache.spark.sql.types.LongType
    val df = spark.range(5000).select((col("id") % 7).as("g"),
      conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast(LongType).as("hv"))
    def native(parts: Int) = df.repartition(parts).groupBy(col("g"))
      .agg(graft.functions.GraftColumns.hllRegisters(col("hv")).as("h"))
      .select(col("g"), col("h.s_total"), col("h.v_zero"))
      .as[(Long, Long, Int)].collect().toSet
    // declarative (group × register) formulation — the shape the
    // DuckDB oracle replays; the aggregate must be bit-equal to it
    val decl = df
      .withColumn("r", expr("hv DIV 16777216"))
      .withColumn("rest", col("hv") % 16777216L)
      .withColumn("rho", when(col("rest") === 0, lit(25))
        .otherwise(lit(25) - length(bin(col("rest")))))
      .groupBy(col("g"), col("r")).agg(max(col("rho")).as("mj"))
      .groupBy(col("g"))
      .agg((sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 25 - mj) AS BIGINT)")) +
        (lit(256L) - count(lit(1))) * 33554432L).as("s_total"),
        (lit(256L) - count(lit(1))).cast("int").as("v_zero"))
      .select(col("g"), col("s_total"), col("v_zero"))
      .as[(Long, Long, Int)].collect().toSet
    assert(native(1) == decl)
    assert(native(13) == decl, "merge across partitions must be exact")
    org.apache.spark.sql.graftbridge.SqlBridge.registerGraftFunctions(spark)
    df.createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      "SELECT g, h.s_total, h.v_zero FROM (SELECT g, hll_registers(hv) AS h FROM hll_in GROUP BY g)")
      .as[(Long, Long, Int)].collect().toSet
    assert(viaSql == decl)
  }

  test("matrix-holding expressions canonicalize structurally (CSE sees duplicates)") {
    // case classes over Array params compare by identity, which would
    // defeat semanticEquals / common-subexpression elimination; the
    // Seq[Seq[Double]] params restore structural equality. Two
    // instances built from DISTINCT backing arrays must compare equal.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.functions.expressions.{HyperplaneSignature, NearestClusters}
    val child = BoundReference(0, ArrayType(DoubleType), nullable = false)
    def mat = Array.tabulate(4, 8)((j, i) => (j - i).toDouble)
      .map(_.toIndexedSeq).toIndexedSeq
    val s1 = HyperplaneSignature(child, mat)
    val s2 = HyperplaneSignature(child, mat)
    assert(s1 == s2 && s1.semanticEquals(s2))
    val n1 = NearestClusters(child, mat, 2)
    val n2 = NearestClusters(child, mat, 2)
    assert(n1 == n2 && n1.semanticEquals(n2))
  }

  test("minhash_shingles: SQL registration matches the Column API and is fast-path native") {
    org.apache.spark.sql.graftbridge.SqlBridge.registerGraftFunctions(spark)
    val viaSql = spark.sql("SELECT minhash_shingles('abcdefgh', 4, 8) AS s")
      .as[Seq[Long]].head()
    val viaCol = Seq("abcdefgh").toDF("t")
      .select(graft.functions.GraftColumns.minHashShingles(col("t"), 4, 8).as("s"))
      .as[Seq[Long]].head()
    assert(viaSql.length == 8)
    assert(viaSql == viaCol)
    // identical text → identical signature; different text → different
    val two = Seq("aaaa bbbb cccc", "aaaa bbbb cccc", "xxxx yyyy zzzz").toDF("t")
      .select(graft.functions.GraftColumns.minHashShingles(col("t"), 4, 16).as("s"))
      .as[Seq[Long]].collect()
    assert(two(0) == two(1))
    assert(two(0) != two(2))
  }

  test("simHashTokens: identical → hamming 0; near texts closer than far") {
    val df = Seq("alpha beta gamma delta epsilon zeta eta theta",
                 "alpha beta gamma delta epsilon zeta eta iota",
                 "one two three four five six seven eight").toDF("t")
      .select(graft.functions.GraftColumns.simHashTokens(col("t")).as("sig"))
    val s = df.as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(0), s(0)) == 0)
    assert(ham(s(0), s(1)) < ham(s(0), s(2)))
    // whitespace-run splitting matches tokens(): leading/multiple spaces ignored
    val pair = Seq(("  a   b c ", "a b c")).toDF("x", "y")
      .select(graft.functions.GraftColumns.simHashTokens(col("x")).as("sx"),
        graft.functions.GraftColumns.simHashTokens(col("y")).as("sy"))
      .as[(Long, Long)].head()
    assert(pair._1 == pair._2)
  }

  test("tokenizer contract is RE2's \\s class: U+000B is NOT a separator in any tokenizer") {
    // DuckDB/RE2's \s is [ \t\n\f\r] while Java's adds U+000B — the
    // engine sides all use the RE2 set so the oracle tokenization
    // agrees on every input (round-4 ADVICE)
    val vt = "a\u000Bb c"
    val toks = Seq(vt).toDF("t")
      .select(TF.tokens(col("t")).as("k")).as[Seq[String]].head()
    assert(toks == Seq("a\u000Bb", "c"), s"tokens() split on U+000B: $toks")
    // native simhash agrees: the VT-joined token is atomic — the
    // signature is whitespace-RUN-insensitive (extra spaces change
    // nothing) yet differs from the text where VT IS a separator
    val sigs = Seq(vt, "a\u000Bb  c", "a b c").toDF("t")
      .select(graft.functions.GraftColumns.simHashTokens(col("t")).as("s"))
      .as[Long].collect()
    assert(sigs(0) == sigs(1), "token content must be independent of separator-run width")
    assert(sigs(0) != sigs(2), "U+000B must not split the token the way a space does")
    // one definition of the separator set: the hand-unrolled isSep
    // must equal SepChars membership over the whole char range
    import graft.functions.expressions.SimHashTokens
    (Char.MinValue to Char.MaxValue).foreach { c =>
      assert(SimHashTokens.isSep(c.toChar) == (SimHashTokens.SepChars.indexOf(c.toChar.toInt) >= 0),
        f"isSep drifted from SepChars at U+${c.toInt}%04X")
    }
    // native repetition stats agree: 2 tokens, both distinct
    val st = Seq(vt).toDF("t")
      .select(graft.functions.GraftColumns.tokenRepetitionStats(col("t")).as("st"))
      .select(col("st.n_tok"), col("st.n_distinct")).as[(Int, Int)].head()
    assert(st == ((2, 2)), s"repetition stats split on U+000B: $st")
  }

  test("wordBigrams native expression equals the HOF formulation (empties, trailing space, short)") {
    val df = Seq("a b c", "a  b", "a ", "single", "", "x y z w").toDF("t")
    val native = df.select(graft.functions.GraftColumns.wordBigrams(col("t")).as("g"))
      .as[Seq[String]].collect().toSeq
    val hof = df.select(TF.wordNgrams(split(col("t"), " "), 2).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(native == hof, s"native $native != hof $hof")
    assert(native(0) == Seq("a b", "b c"))
    assert(native(1) == Seq("a ", " b")) // double space → empty middle token
    assert(native(2) == Seq("a "))      // trailing empty token kept
    assert(native(3) == Seq() && native(4) == Seq())
  }

  test("charShingles native expression equals the HOF formulation") {
    val df = Seq("abcabcabc", "xy").toDF("t")
    val native = df.select(graft.functions.GraftColumns.charShingles(col("t"), 4).as("s"))
      .as[Seq[String]].collect().map(_.sorted.toSeq)
    val hof = df.select(array_distinct(TF.shingles(col("t"), 4)).as("s"))
      .as[Seq[String]].collect().map(_.sorted.toSeq)
    assert(native.toSeq == hof.toSeq)
    assert(native(1) == Seq("xy")) // shorter than k → whole string
  }

  test("charGramCounts equals the charGrams explode+count formulation (incl. short/empty)") {
    val df = Seq("ababa", "xy", "", "the cat sat on the mat").toDF("t")
      .withColumn("id", monotonically_increasing_id())
    val native = df
      .select(col("id"), explode(graft.functions.GraftColumns.charGramCounts(col("t"), 3)).as("gc"))
      .select(col("id"), col("gc.g").as("g"), col("gc.c").cast("long").as("c"))
      .as[(Long, String, Long)].collect().toSet
    val viaGrams = df
      .select(col("id"), explode(graft.functions.GraftColumns.charGrams(col("t"), 3)).as("g"))
      .groupBy("id", "g").count()
      .as[(Long, String, Long)].collect().toSet
    assert(native == viaGrams, s"count-map drifted from the occurrence stream")
    // duplicates counted: "ababa" has aba twice
    val ababa = native.filter(r => r._2 == "aba").map(_._3)
    assert(ababa == Set(2L))
    // SQL registration path
    val viaSql = spark.sql("SELECT char_gram_counts('ababa', 3) AS g")
      .selectExpr("g[0].g", "g[0].c").as[(String, Int)].head()
    assert(viaSql == (("aba", 2)))
  }

  test("supplementary-plane parity: every native text expression iterates code points") {
    // Round-13 verdict #3: the former charAt walks silently diverged
    // from the oracle's unicode(substr(..)) replay on any text with
    // supplementary-plane characters. This corpus mixes emoji
    // (U+1F600), CJK-extB (U+20000..U+20003) and BMP text; the
    // reference implementations below ARE the oracle formulas, folded
    // over code points.
    import graft.functions.expressions.{MinHashShingles, SimHashTokens}
    val M = 1000000007L
    def fold(cps: Seq[Int]): Long =
      cps.foldLeft(0L)((acc, c) => (acc * 131L + c) % M)
    val emoji = "😀😀ab😀"
    val cjk = "𠀀𠀁𠀂𠀃" // U+20000-3
    val mixed = s"x😀y ${cjk.substring(0, 2)}z w"
    val corpus = Seq(emoji, cjk, mixed, "plain bmp text")

    // charShingles / charGrams: code-point slicing == Spark's substr HOF
    for (t <- corpus) {
      val df = Seq(t).toDF("t")
      val grams = df.select(graft.functions.GraftColumns.charGrams(col("t"), 2).as("g"))
        .as[Seq[String]].head()
      val hof = df.select(TF.shingles(col("t"), 2).as("g"))
        .as[Seq[String]].head()
      assert(grams == hof, s"charGrams != HOF substr on: $t")
      val sh = df.select(graft.functions.GraftColumns.charShingles(col("t"), 2).as("s"))
        .as[Seq[String]].head().sorted
      assert(sh == hof.distinct.sorted, s"charShingles != distinct HOF on: $t")
      // no gram may be an invalid half-pair
      grams.foreach { g =>
        assert(!g.exists(c => Character.isSurrogate(c) &&
          g.codePointCount(0, g.length) * 2 == g.length && g.length == 1),
          s"half-pair gram from: $t")
      }
    }
    // explicit slice check: 😀😀ab😀 at k=2 → [😀😀, 😀a, ab, b😀]
    val eg = Seq(emoji).toDF("t")
      .select(graft.functions.GraftColumns.charGrams(col("t"), 2).as("g"))
      .as[Seq[String]].head()
    assert(eg == Seq("😀😀", "😀a", "ab", "b😀"), s"got $eg")

    // minHashShingles: min over affine maps of the code-point fold
    val k = 2; val perms = 8
    for (t <- corpus) {
      val cps = t.codePoints().toArray.toSeq
      val n = math.max(cps.length - k + 1, 1)
      val hs = (0 until n).map(i => fold(cps.slice(i, math.min(i + k, cps.length))))
      val expected = (0 until perms).map { p =>
        hs.map(h => (MinHashShingles.aConst(p) * h + MinHashShingles.bConst(p)) % M).min
      }
      val got = Seq(t).toDF("t")
        .select(graft.functions.GraftColumns.minHashShingles(col("t"), k, perms).as("s"))
        .as[Seq[Long]].head()
      assert(got == expected, s"minhash diverged on: $t")
    }

    // simHashTokens: parity bits of the per-token code-point fold
    for (t <- corpus) {
      val toks = t.split("[ \t\n\f\r]+", -1).filter(_.nonEmpty)
      val counts = new Array[Int](64)
      toks.foreach { tok =>
        val h = fold(tok.codePoints().toArray.toSeq)
        (0 until 64).foreach { b =>
          val v = (SimHashTokens.aConst(b) * h + SimHashTokens.bConst(b)) % M
          if ((v & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        }
      }
      val expected = (0 until 64).foldLeft(0L)((s, b) =>
        if (counts(b) > 0) s | (1L << b) else s)
      val got = Seq(t).toDF("t")
        .select(graft.functions.GraftColumns.simHashTokens(col("t")).as("s"))
        .as[Long].head()
      assert(got == expected, s"simhash diverged on: $t")
    }

    // winnowFingerprint: window minima over the code-point gram hashes
    val wk = 3; val ww = 2
    for (t <- corpus) {
      val cps = t.codePoints().toArray.toSeq
      val numGrams = cps.length - wk + 1
      val expected =
        if (numGrams < ww) Seq.empty[Long]
        else {
          val hs = (0 until numGrams).map(i => fold(cps.slice(i, i + wk)))
          (0 to numGrams - ww).map(i => hs.slice(i, i + ww).min)
            .distinct.sorted
        }
      val got = Seq(t).toDF("t")
        .select(graft.functions.GraftColumns.winnowFingerprint(col("t"), wk, ww).as("f"))
        .as[Seq[Long]].head()
      assert(got == expected, s"winnow diverged on: $t")
    }

    // charGramCounts == charGrams explode+count on the same corpus
    val df = corpus.toDF("t").withColumn("id", monotonically_increasing_id())
    val viaCounts = df
      .select(col("id"), explode(graft.functions.GraftColumns.charGramCounts(col("t"), 2)).as("gc"))
      .select(col("id"), col("gc.g"), col("gc.c").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    val viaGrams = df
      .select(col("id"), explode(graft.functions.GraftColumns.charGrams(col("t"), 2)).as("g"))
      .groupBy("id", "g").count()
      .as[(Long, String, Long)].collect().toSet
    assert(viaCounts == viaGrams, "charGramCounts != charGrams explode+count on non-BMP")
  }

  test("charGrams keeps duplicates in position order (the LM occurrence stream)") {
    val df = Seq("ababa", "xy", "").toDF("t")
    val got = df.select(graft.functions.GraftColumns.charGrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("aba", "bab", "aba")) // duplicate kept, unlike charShingles
    assert(got(1) == Seq("xy"))                // shorter than k → whole string
    assert(got(2) == Seq(""))                  // SQL substr('', 1, 3) semantics
    // SQL registration path (GraftExtensions)
    val viaSql = spark.sql("SELECT char_grams('ababa', 3) AS g")
      .as[Seq[String]].head()
    assert(viaSql == Seq("aba", "bab", "aba"))
  }

  test("cosine doGenCode compiles and runs inside codegen (fallback disabled)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq(
          (Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 1.0f, 2.0f)),
          (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f)))
        .toDF("a", "b")
        .select(graft.functions.GraftColumns.cosineSim(col("a"), col("b")).as("c"))
        .as[Double].collect().toSeq
      assert(math.abs(out.head - 8.0 / 9.0) < 1e-12)
      assert(out(1) == -1.0) // zero-norm contract survives codegen
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("UnaryRefCodegen expressions run with codegen fallback disabled (long/array/struct)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq("the cat and the hat").toDF("t")
      val sim = df.select(graft.functions.GraftColumns.simHashTokens(col("t")).as("s"))
        .as[Long].head()
      val sim2 = df.select(graft.functions.GraftColumns.simHashTokens(col("t")).as("s"))
        .as[Long].head()
      assert(sim == sim2) // deterministic through the generated call
      val sh = df.select(graft.functions.GraftColumns.charShingles(col("t"), 4).as("s"))
        .as[Seq[String]].head()
      assert(sh.contains("the ") && sh.contains(" cat"))
      val st = df.select(
          graft.functions.GraftColumns.tokenRepetitionStats(col("t")).as("st"))
        .select(col("st.n_tok"), col("st.n_distinct"), col("st.top_token_c"))
        .as[(Int, Int, Int)].head()
      assert(st == ((5, 4, 2)))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("tokenRepetitionStats replicates split(trim, cls, -1) on boundary whitespace") {
    // trim strips SPACES only and split keeps boundary empty tokens —
    // the exact Spark/DuckDB semantics (Java's .trim/skip-runs would
    // count "x\t" as 1 token where both engines count ["x", ""] = 2)
    def splitRef(t: String): Seq[String] = {
      val tr = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      tr.split("[ \t\n\f\r]+", -1).toIndexedSeq
    }
    val cases = Seq("x\t", "\tx", "\t", "a\u000Bb c", "  x  ", "a \t b", "")
    val native = cases.toDF("t")
      .select(graft.functions.GraftColumns.tokenRepetitionStats(col("t")).as("st"))
      .select(col("st.n_tok"), col("st.n_distinct"), col("st.top_token_c"))
      .as[(Int, Int, Int)].collect().toSeq
    val expected = cases.map { t =>
      val toks = splitRef(t)
      (toks.size, toks.distinct.size, toks.groupBy(identity).values.map(_.size).max)
    }
    assert(native == expected, s"native $native != split-ref $expected for $cases")
    // the two named edge shapes explicitly
    assert(native(0) == ((2, 2, 1)), "trailing tab must keep its empty token")
    assert(native(2) == ((2, 1, 2)), "a lone tab is two empty tokens (leading + trailing)")
  }

  test("tokenRepetitionStats native struct equals the explode/groupBy formulation") {
    val df = Seq(
      "the cat and the hat and the cat",  // repeats: 'the'×3, 'the cat'×2
      "all distinct words here",
      "solo",
      "loop loop loop loop").toDF("t")
    val native = df
      .select(graft.functions.GraftColumns.tokenRepetitionStats(col("t")).as("st"))
      .select(col("st.n_tok"), col("st.n_distinct"), col("st.top_token_c"),
        col("st.n_bi"), col("st.top_bigram_c"))
      .as[(Int, Int, Int, Int, Int)].collect().toSeq
    // declarative reference: token/bigram maps per row
    val expected = Seq("the cat and the hat and the cat",
        "all distinct words here", "solo", "loop loop loop loop").map { t =>
      val toks = t.trim.split("\\s+").toSeq
      val bis = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      (toks.size, toks.distinct.size,
        toks.groupBy(identity).values.map(_.size).max,
        bis.size,
        if (bis.isEmpty) 0 else bis.groupBy(identity).values.map(_.size).max)
    }
    assert(native == expected)
    assert(native.head == ((8, 4, 3, 7, 2)))
  }

  test("tokenGramHashes matches the double-polynomial fold over rebuilt gram strings") {
    val k = 3
    val M = 1000000007L
    def ref(t: String): Seq[Long] = {
      val toks = t.split(" ", -1).toSeq // Spark split semantics, empties kept
      if (toks.size < k) Seq.empty
      else toks.sliding(k).map { g =>
        val s = g.mkString(" ")
        def fold(base: Long) = s.foldLeft(0L)((acc, c) => (acc * base + c) % M)
        fold(131L) * M + fold(137L)
      }.toSeq
    }
    val texts = Seq(
      "a b c d e",
      "one two",                 // fewer than k tokens -> empty
      "x  y z w",                // consecutive spaces -> empty token kept
      " lead and trail ",        // boundary empties
      "same same same same")
    val native = texts.toDF("t")
      .select(graft.functions.GraftColumns.tokenGramHashes(col("t"), k).as("h"))
      .as[Seq[Long]].collect().toSeq
    assert(native == texts.map(ref), s"native=$native expected=${texts.map(ref)}")
  }

  test("tokenCountIn counts membership") {
    val out = Seq("the cat and the hat").toDF("t")
      .select(TF.tokenCountIn(TF.tokens(col("t")), Seq("the", "and")).as("n"))
      .as[Int].head()
    assert(out == 3)
  }

  test("learnedTokenStats: greedy longest-match with one-code-point fallback") {
    def stats(text: String, vocab: Seq[String]): (Long, Long) =
      Seq(text).toDF("t")
        .select(graft.functions.GraftColumns.learnedTokenStats(col("t"), vocab).as("s"))
        .select(col("s.ws_tokens"), col("s.learned_tokens"))
        .as[(Long, Long)].head()
    val vocab = Seq("ab", "abc", "cd", "xyzu")
    // greedy takes the LONGEST match first: abc + d(fallback) — not ab+cd
    assert(stats("abcd", vocab) == ((1L, 2L)))
    assert(stats("abab", vocab) == ((1L, 2L)))     // ab + ab
    assert(stats("qq", vocab) == ((1L, 2L)))       // two fallbacks
    assert(stats("ab cd xyzu", vocab) == ((3L, 3L))) // three full-word matches
    assert(stats("", vocab) == ((0L, 0L)))         // empty text: no words
    assert(stats("  ", vocab) == ((0L, 0L)))       // separator-only: no words
    assert(stats(" ab  ab ", vocab) == ((2L, 2L))) // boundary/repeated spaces skip empties
    // a word never matched anywhere: one piece per code point
    assert(stats("zzzzz", Seq("ab")) == ((1L, 5L)))
    // empty vocab degenerates to code-point counting
    assert(stats("abc de", Seq.empty) == ((2L, 5L)))
  }

  test("learnedTokenStats counts code points, not UTF-16 units (non-BMP fallback)") {
    // U+1D538 (double-struck A) is a surrogate pair in UTF-16: the
    // fallback must consume it as ONE piece, matching the oracle's
    // substr()/length() code-point arithmetic
    val gothic = new String(Character.toChars(0x1D538))
    val out = Seq(s"$gothic$gothic ab").toDF("t")
      .select(graft.functions.GraftColumns.learnedTokenStats(col("t"), Seq("ab")).as("s"))
      .select(col("s.ws_tokens"), col("s.learned_tokens"))
      .as[(Long, Long)].head()
    assert(out == ((2L, 3L)), s"surrogate pair must fold as one code point: $out")
  }

  test("learnedTokenStats equals the explode/join/groupBy declarative formulation") {
    val docs = graft.Tables.documents(spark, sfDir).limit(200)
      .select(col("doc_id"), col("text"))
    val vocab = graft.queries.Pipeline.learnedVocab(spark, sfDir)
    val native = docs
      .select(col("doc_id"),
        graft.functions.GraftColumns.learnedTokenStats(col("text"), vocab.toSeq).as("s"))
      .select(col("doc_id"), col("s.ws_tokens").as("ws"), col("s.learned_tokens").as("lt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: per-word greedy in plain Scala, joined back per doc
    val byLen = vocab.groupBy(_.length)
    def pieces(w: String): Long = {
      val cps = w.codePoints().toArray
      var pos = 0; var n = 0L
      while (pos < cps.length) {
        var len = math.min(4, cps.length - pos); var m = 0
        while (m == 0 && len >= 2) {
          if (byLen.getOrElse(len, Array.empty[String])
                .contains(new String(cps, pos, len))) m = len
          else len -= 1
        }
        pos += (if (m == 0) 1 else m); n += 1
      }
      n
    }
    val ref = docs.collect().map { r =>
      val ws = r.getString(1).split(" ", -1).filter(_.nonEmpty)
      (r.getLong(0), ws.length.toLong, ws.map(pieces).sum)
    }.toSet
    assert(native == ref)
  }

  test("learnedVocab fit is deterministic and bounded") {
    val v1 = graft.queries.Pipeline.learnedVocab(spark, sfDir)
    val v2 = graft.queries.Pipeline.learnedVocab(spark, sfDir)
    assert(v1.toSeq == v2.toSeq, "vocab fit must be run-stable")
    assert(v1.length <= 256 && v1.forall(u => u.length >= 2 && u.length <= 4))
  }

  test("t17 exhibits the whitespace-vs-learned divergence it exists to price") {
    val df = SparkEntry.queries("t17_learned_tokenizer")(spark, sfDir)
    val row = df.agg(avg(col("ratio")), min(col("ratio"))).head()
    assert(row.getDouble(1) >= 1.0, "learned count can never undercut one piece per word")
    assert(row.getDouble(0) > 1.2,
      s"mean ratio ${row.getDouble(0)} — the capped-unit config should diverge from whitespace counting")
  }

  test("t20 BPE training anchors merges to WHOLE units (xa/ab/xab fixture)") {
    import spark.implicits._
    // After merge 1 (x,a)->xa, a flat single-separator state would let
    // pair (a,b) falsely rewrite the SUFFIX of unit "xa" in "xab".
    // Correct BPE: merge 2 is (a,b) cnt 6 (the standalone "ab" words
    // only), merge 3 is (xa,b) cnt 5.
    val docs = Seq((1L, (Seq.fill(10)("xa") ++ Seq.fill(6)("ab") ++
      Seq.fill(5)("xab")).mkString(" "))).toDF("doc_id", "text")
    val got = graft.queries.Pipeline.bpeTrain(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq((1, "x", "a", "xa", 15L), (2, "a", "b", "ab", 6L),
      (3, "xa", "b", "xab", 5L)), got.toString)
  }

  test("t20 merge counts are non-increasing and the table is run-stable on the corpus") {
    val df = SparkEntry.queries("t20_bpe_train")(spark, sfDir)
    val rows = df.collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(rows.length <= graft.queries.Pipeline.t20Merges &&
      rows.map(_._1).toSeq == (1 to rows.length),
      s"ranks must be consecutive from 1; got ${rows.length} merges")
    // K=512 exceeds what the 31-type corpus can supply, so training
    // must stop via GENUINE exhaustion: applying the emitted merges
    // must fully merge every distinct word to a single unit (tok=1
    // for the whole vocab under the trained tokenizer). A trainer
    // that stopped early for any other reason fails this witness.
    if (rows.length < graft.queries.Pipeline.t20Merges) {
      val toks = graft.queries.Pipeline
        .bpeWordTok(graft.Tables.documents(spark, sfDir))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(toks.nonEmpty && toks.forall(_._2 == 1L),
        s"non-exhausted stop: ${toks.filter(_._2 != 1L).take(5).toSeq}")
      // the oracle's truncation-soundness bound: exhaustion must land
      // strictly inside the unrolled window (witness round included)
      assert(rows.length < graft.queries.Pipeline.t20OracleRounds,
        s"corpus exhausts at ${rows.length} merges but the oracle only unrolls " +
          s"${graft.queries.Pipeline.t20OracleRounds} rounds")
    }
    // best-pair frequency can only fall: untouched pairs keep their
    // count, pairs created by a merge are bounded by that merge's count
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, s"merge ${b._1} count rose: $a -> $b")
    }
    val again = SparkEntry.queries("t20_bpe_train")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(rows.toSeq == again.toSeq, "training must be run-stable")
    // batched == sequential on the real corpus (RandomizedSpec fuzzes
    // the same pin on random corpora; k=12 keeps the sequential run cheap)
    val seq12 = graft.queries.Pipeline.bpeTrain(graft.Tables.documents(spark, sfDir), 12)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    assert(rows.take(12).toSeq == seq12,
      "the batched trainer's first 12 merges must equal sequential training")
  }

  test("t21 readability: sentence split, min-1 syllables, complex words on crafted docs") {
    import spark.implicits._
    import graft.Tables
    val dir = java.nio.file.Files.createTempDirectory("t21docs").toString
    Seq(
      (1L, "The quick brown fox. It jumps! Over the lazy dog?", "en", "s", 0L),
      (2L, "xyz zzz", "en", "s", 0L), // vowel-less words still carry one beat each
      (3L, "beautiful extraordinary cat", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t21_readability")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 3L, s"3 sentences: ${out(1L)}")
    assert(out(2L).getLong(2) == 1L && out(2L).getLong(3) == 2L,
      s"no punctuation -> 1 sentence; two vowel-less words -> 2 syllables: ${out(2L)}")
    assert(out(3L).getLong(4) == 2L, s"beautiful+extraordinary are complex: ${out(3L)}")
    // flesch must equal the textbook formula evaluated in the same order
    val r3 = out(3L)
    val (w, sn, sy) = (r3.getLong(1), r3.getLong(2), r3.getLong(3))
    val expected = 206.835 - 1.015 * (w.toDouble / sn) - 84.6 * (sy.toDouble / w)
    assert(r3.getDouble(5) == expected, s"${r3.getDouble(5)} vs $expected")
  }
}
