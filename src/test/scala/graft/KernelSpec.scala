package graft

import graft.dedup._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Kernel-level unit + property tests: tokenizer parity (Column vs Scala vs
  * reference fixtures), Jaccard rounding semantics, MinHash statistics,
  * dense-id determinism, connected components vs union-find.
  */
class KernelSpec extends SparkSpec {
  import spark.implicits._

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge in
    * the offline resolver cache). */
  private def check(prop: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // --- tokenizer: FIXTURES.md §2 adversarial behaviors (cites in Tokenize) ---

  val adversarial = "of to in 1 22 333 1-2 12-34 12-34x x _foo bar_baz co-operate the and a"

  test("tokenizer drops stopwords, single chars, digits, digit-chains and _-joined words") {
    // `_` is a regex word char: `\b` never fires inside `_foo`/`bar_baz`, so
    // the reference tokenizer emits nothing for them (verified vs CPython).
    val got = Tokenize.tokenSetScala(adversarial)
    assert(got.toSet == Set("12-34x", "co-operate"))
    assert(got.sameElements(got.sorted), "tokens must be sorted asc")
  }

  test("Column tokenizer agrees with the Scala twin and the oracle tokenizer") {
    val texts = Seq(
      adversarial,
      "Machine learning algorithm, advanced MACHINE learning!",
      "",
      "a b c 1 2 3",
      "x-1 1-x 1-2-3 a-b-c 12-34 1--2 -1-2 1-2- co-op 99bottles bottles99",
      CorpusGen.corpusLocal(5).map(_.content).mkString(" ")
    )
    // both the codegen'd TokenSet expression and the pure-built-ins chain
    val viaExpr = texts
      .toDF("text")
      .select(Tokenize.tokenSet(col("text")).as("t"))
      .as[Seq[String]]
      .collect()
    val viaBuiltins = texts
      .toDF("text")
      .select(Tokenize.tokenSetBuiltins(col("text")).as("t"))
      .as[Seq[String]]
      .collect()
    texts.indices.foreach { i =>
      val gotScala = Tokenize.tokenSetScala(texts(i)).toSeq
      val gotOracle = RefOracle.tokenize(texts(i)).distinct.sorted
      assert(viaExpr(i) == gotScala, s"expr vs scala on: ${texts(i)}")
      assert(viaBuiltins(i) == gotScala, s"builtins vs scala on: ${texts(i)}")
      assert(viaExpr(i) == gotOracle, s"expr vs oracle on: ${texts(i)}")
    }
  }

  test("non-ASCII boundaries match CPython re (Unicode \\b, not Java ASCII \\b)") {
    // Expectations computed with CPython:
    //   re.findall(r'\b[a-zA-Z0-9][-a-zA-Z0-9]*[a-zA-Z0-9]\b', s.lower())
    // CPython's \b treats ï/ö/é/ü as WORD chars: "naïve" yields NO token
    // (Java's ASCII \b would wrongly emit "na"/"ve"). (?U) aligns them.
    val fixtures = Seq(
      "naïve zorbly vectör glomp" -> Seq("glomp", "zorbly"),
      "déjà-vu kernelô x9 blip-7a" -> Seq("blip-7a", "vu", "x9"),
      "über prägnanz qq" -> Seq("qq"),
      "touché flambé zz9" -> Seq("zz9")
    )
    val viaExpr = fixtures
      .map(_._1)
      .toDF("text")
      .select(Tokenize.tokenSet(col("text")).as("t"))
      .as[Seq[String]]
      .collect()
    fixtures.zipWithIndex.foreach { case ((text, want), i) =>
      assert(Tokenize.tokenSetScala(text).toSeq == want, s"scala kernel on: $text")
      assert(viaExpr(i) == want, s"column expr on: $text")
    }
    val viaBuiltins = fixtures
      .map(_._1)
      .toDF("text")
      .select(Tokenize.tokenSetBuiltins(col("text")).as("t"))
      .as[Seq[String]]
      .collect()
    fixtures.zipWithIndex.foreach { case ((text, want), i) =>
      assert(viaBuiltins(i) == want, s"builtins on: $text")
    }
  }

  test("shingles: ordered k-grams before dedup") {
    val got = Tokenize.tokenSetScala("alpha beta gamma alpha beta", 2)
    assert(got.toSet == Set("alpha beta", "beta gamma", "gamma alpha"))
    val short = Tokenize.tokenSetScala("alpha", 2)
    assert(short.isEmpty)
  }

  // --- Jaccard kernel ---

  test("round6 reproduces CPython round-half-even on exact binary doubles") {
    assert(Jaccard.round6(1.0 / 128.0) == 0.007812) // exact tie -> even
    assert(Jaccard.round6(3.0 / 128.0) == 0.023438) // exact tie -> even (23437|5 -> 23438)
    assert(Jaccard.round6(2.0 / 3.0) == 0.666667)
    assert(Jaccard.round6(1.0) == 1.0)
    assert(Jaccard.round6(1.5e-6) == 2e-6) // exact binary value is just above the tie
  }

  test("WordGramSet equals the built-ins chain (regexp + transform + distinct), incl. non-ASCII lowercase") {
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog 42 times",
      "a b", "", "  --- !!! ", "single",
      "Kelvin K sign and dotted İstanbul i̇ test", // lower() maps U+212A -> k
      "ÅÉÎØÜ mixed CASE words 123abc456 x9y",
      "repeat repeat repeat repeat gram gram gram",
      "tabs\tand\nnewlines  and   runs-of-punct.,;:!?"
    ).toDF("text")
    for (k <- Seq(1, 2, 3)) {
      val ws = graft.ops.TextAnalysis.words(col("text"))
      val builtins = array_distinct(Tokenize.shingles(ws, k))
      val rows = texts
        .select(
          WordGramSet(col("text"), k).as("kernel"),
          builtins.as("builtins")
        )
        .as[(Seq[String], Seq[String])]
        .collect()
      rows.zipWithIndex.foreach { case ((kr, br), i) =>
        assert(kr == br, s"k=$k row $i: kernel=$kr builtins=$br")
      }
    }
    // padShort mode = the fingerprint fallback (space-joined word list)
    val padded = texts
      .select(
        WordGramSet(col("text"), 3, padShort = true).as("kernel"),
        array_distinct(
          when(
            size(graft.ops.TextAnalysis.words(col("text"))) >= 3,
            Tokenize.shingles(graft.ops.TextAnalysis.words(col("text")), 3)
          ).otherwise(array(concat_ws(" ", graft.ops.TextAnalysis.words(col("text")))))
        ).as("builtins")
      )
      .as[(Seq[String], Seq[String])]
      .collect()
    padded.zipWithIndex.foreach { case ((kr, br), i) =>
      assert(kr == br, s"padShort row $i: kernel=$kr builtins=$br")
    }
  }

  test("MinGramMd5 equals explode(WordGramSet) + min(md5(gram))") {
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog 42 times",
      "a b", "", "  --- !!! ", "single",
      "Kelvin K sign and dotted İstanbul i̇ test",
      "ÅÉÎØÜ mixed CASE words 123abc456 x9y",
      "repeat repeat repeat repeat gram gram gram",
      "tabs\tand\nnewlines  and   runs-of-punct.,;:!?"
    ).zipWithIndex.map(_.swap).toDF("doc_id", "text")
    for (k <- Seq(1, 2, 3)) {
      // null fp = empty gram set (wordless doc at k=1) = the row explode drops
      val kernel = texts
        .select(col("doc_id"), graft.dedup.MinGramMd5(col("text"), k).as("fp"))
        .filter(col("fp").isNotNull)
      val reference = texts
        .select(col("doc_id"), explode(WordGramSet(col("text"), k, padShort = true)).as("gram"))
        .groupBy("doc_id")
        .agg(min(md5(col("gram"))).as("fp"))
      val got = kernel.as[(Int, String)].collect().toMap
      val want = reference.as[(Int, String)].collect().toMap
      assert(got == want, s"k=$k: kernel=$got reference=$want")
    }
  }

  test("round6 is NOT Spark's bround: CPython rounds the true binary value, bround the shortest repr") {
    // Why ExactPairs keeps its rounding UDF instead of the codegen'd
    // bround(_, 6): the two semantics diverge on decimal-exact but
    // binary-INexact 7th-digit ties. 1/640 = 0.0015625 exactly in decimal,
    // but 640 = 2^7*5 is not a binary power, so the nearest double sits just
    // ABOVE the tie: CPython's round() (and round6, which models it with the
    // exact-binary BigDecimal constructor) rounds UP, while
    // BigDecimal.valueOf — bround's reading — sees "0.0015625" as an exact
    // tie and rounds to EVEN. A full sweep over quotients i/u, u <= 2000
    // found this class (640, 1280, ...), so the swap is semantically wrong
    // on the reference-parity path.
    val d = 1.0 / 640.0
    assert(Jaccard.round6(d) == 0.001563) // == CPython round(1/640, 6)
    val viaValueOf =
      java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_EVEN).doubleValue()
    assert(viaValueOf == 0.001562) // bround's HALF_EVEN on the shortest repr
    // binary-exact ties (u a power of two) agree in both readings
    val exact = 1.0 / 128.0
    assert(Jaccard.round6(exact) ==
      java.math.BigDecimal.valueOf(exact).setScale(6, java.math.RoundingMode.HALF_EVEN).doubleValue())
  }

  test("two-pointer intersection equals naive set intersection (property)") {
    val gen = Gen.listOf(Gen.choose(0, 200)).map(_.distinct.sorted.toArray)
    check(Prop.forAll(gen, gen) { (a: Array[Int], b: Array[Int]) =>
      val naive = a.toSet.intersect(b.toSet).size
      val expected =
        if (naive == 0 || a.isEmpty || b.isEmpty) 0.0
        else RefOracle.pythonRound6(naive.toDouble / (a.toSet ++ b.toSet).size)
      Jaccard.intersectSorted(a, b) == naive && Jaccard.jaccard6(a, b) == expected
    })
  }

  test("JaccardSorted expression equals the scala kernel (codegen + interpreted)") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map { _ =>
      val a = Array.fill(rnd.nextInt(40))(rnd.nextInt(300)).distinct.sorted
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt(300)).distinct.sorted
      (a, b)
    }
    val got = rows
      .toDF("a", "b")
      .select(dedup.JaccardSorted(col("a"), col("b")).as("sim"))
      .as[Double]
      .collect()
    rows.zip(got).foreach { case ((a, b), sim) =>
      assert(sim == dedup.Jaccard.jaccard6(a, b), s"a=${a.mkString(",")} b=${b.mkString(",")}")
    }
  }

  // --- MinHash ---

  test("minhash estimate approximates true jaccard within 128-perm tolerance") {
    val cfg = Config()
    val (as, bs) = MinHash.coefficients(cfg.numPerms, cfg.seed)
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val base = Array.tabulate(120)(_ => rnd.nextInt(100000)).distinct
      val keep = base.filter(_ => rnd.nextDouble() < 0.8)
      val other = (keep ++ Array.tabulate(30)(_ => rnd.nextInt(100000))).distinct
      val a = base.sorted
      val b = other.sorted
      val trueJ = Jaccard.intersectSorted(a, b).toDouble /
        (a.length + b.length - Jaccard.intersectSorted(a, b))
      val est = MinHash.estimate(
        MinHash.signatureScala(a, as, bs),
        MinHash.signatureScala(b, as, bs)
      )
      // std error ~ sqrt(j(1-j)/128) <= 0.045; 4 sigma
      assert(math.abs(est - trueJ) < 0.18, s"est=$est true=$trueJ")
    }
  }

  test("identical token sets get identical signatures and band hashes") {
    val cfg = Config()
    val (as, bs) = MinHash.coefficients(cfg.numPerms, cfg.seed)
    val t = Array(3, 17, 99, 2048)
    val s1 = MinHash.signatureScala(t, as, bs)
    val s2 = MinHash.signatureScala(t.clone(), as, bs)
    assert(s1.sameElements(s2))
    (0 until cfg.bands).foreach { b =>
      assert(
        MinHash.bandHashScala(s1, b, cfg.rowsPerBand) ==
          MinHash.bandHashScala(s2, b, cfg.rowsPerBand)
      )
    }
  }

  test("native hash expressions equal the scala kernels (minhash, simhash, band hashes)") {
    val cfg = Config()
    val (as, bs) = MinHash.coefficients(cfg.numPerms, cfg.seed)
    val sets = Seq(
      Array(3, 17, 99, 2048),
      Array(0, 1, 2, 3, 4, 5),
      Array(2147483646),
      (1 to 200).map(_ * 7).toArray
    )
    val df = sets.map(_.toSeq).toDF("tokens")
    val got = df
      .select(
        MinHashSig(col("tokens"), cfg).as("mh"),
        SimHash64(col("tokens"), cfg).as("sh"),
        BandHashes(MinHashSig(col("tokens"), cfg), cfg).as("bh")
      )
      .collect()
    sets.zip(got).foreach { case (t, row) =>
      val wantSig = MinHash.signatureScala(t, as, bs)
      val wantSim = SimHash.simhash64(t, cfg.seed)
      val wantBands = Array.tabulate(cfg.bands)(b => MinHash.bandHashScala(wantSig, b, cfg.rowsPerBand))
      assert(row.getAs[collection.Seq[Int]]("mh").toSeq.map(_.toLong) == wantSig.toSeq)
      assert(row.getAs[Long]("sh") == wantSim)
      assert(row.getAs[collection.Seq[Long]]("bh").toSeq == wantBands.toSeq)
    }
  }

  test("ArrayExceptSorted equals array_except on sorted distinct inputs (property)") {
    val gen = for {
      tokens <- Gen.listOf(Gen.choose(0, 500))
      drop <- Gen.listOf(Gen.choose(0, 500))
    } yield (tokens.distinct.sorted, drop.distinct.sorted)
    check(Prop.forAll(gen) { case (tokens, drop) =>
      val df = Seq(tokens).toDF("tokens")
      val got = df
        .select(ArrayExceptSorted(col("tokens"), drop.toArray).as("t"))
        .as[Seq[Int]]
        .head()
      val want = tokens.filterNot(drop.toSet)
      got == want
    }, n = 30)
  }

  test("simhash of near-identical sets is within small hamming distance") {
    val tokens = Array.tabulate(200)(i => i * 7)
    val mutated = tokens.updated(5, 99991).updated(50, 99993)
    val h1 = SimHash.simhash64(tokens, 42L)
    val h2 = SimHash.simhash64(mutated, 42L)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= SimHash.MaxHamming)
    val unrelated = SimHash.simhash64(Array.tabulate(200)(i => i * 13 + 1), 42L)
    assert(java.lang.Long.bitCount(h1 ^ unrelated) > SimHash.MaxHamming)
  }

  // --- dense ids ---

  test("assignDense: dense, deterministic, ordered by sort key") {
    val df = spark
      .createDataFrame((0 until 500).map(i => (f"k${499 - i}%04d", i)))
      .toDF("k", "v")
      .repartition(7)
    val a = Ids.assignDense(df, Seq("k"), "id").select("k", "id").as[(String, Long)].collect().sortBy(_._2)
    val b = Ids.assignDense(df, Seq("k"), "id").select("k", "id").as[(String, Long)].collect().sortBy(_._2)
    assert(a.sameElements(b))
    assert(a.map(_._2).sameElements(0L until 500L))
    assert(a.map(_._1).sameElements(a.map(_._1).sorted))
  }

  test("assignDense: ids survive a downstream no-shuffle coalesce(1)") {
    // TaskContext.getPartitionId() inside a fused coalesce task returns the
    // COALESCED partition id for every parent split — stamping from it
    // duplicates ids. The pid is materialized into the cached rows instead;
    // this pins that a coalesced sink (the driver's Verify writes
    // .coalesce(1).parquet) still sees dense unique ids.
    val df = spark
      .createDataFrame((0 until 400).map(i => (f"k$i%04d", i)))
      .toDF("k", "v")
      .repartition(11)
    val ids = Ids
      .assignDense(df, Seq("k"), "id")
      .coalesce(1)
      .select("id")
      .as[Long]
      .collect()
      .sorted
    assert(ids.sameElements(0L until 400L), "coalesced stamp must stay dense and unique")
  }

  test("assignDense with dropDuplicateKeys keeps one row per key, ids stay dense") {
    val df = spark
      .createDataFrame((0 until 300).map(i => (f"k${i % 100}%04d", i)))
      .toDF("k", "v")
      .repartition(5)
    val got = Ids
      .assignDenseByKey(df, Seq("k"), "id", dropDuplicateKeys = true)
      .select("k", "id")
      .as[(String, Long)]
      .collect()
      .sortBy(_._2)
    assert(got.length == 100)
    assert(got.map(_._2).sameElements(0L until 100L))
    assert(got.map(_._1).distinct.length == 100)
  }

  // --- connected components ---

  test("large-star/small-star equals union-find (randomized graphs)") {
    val rnd = new scala.util.Random(424242)
    (0 until 8).foreach { trial =>
      val n = 2 + rnd.nextInt(60)
      val nEdges = 1 + rnd.nextInt(80)
      val edges = List.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val pairs = edges.map { case (a, b) => RefOracle.Pair("g", a, b, 1.0) }
      val universe = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = RefOracle.clusters(universe, pairs, 0.5)
      // force the DISTRIBUTED star-contraction path (threshold 0)
      val got = Components
        .run(edges.toDF("a", "b"), driverLocalMaxEdges = 0L)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      // the driver-local union-find path must agree
      val gotLocal = Components
        .run(edges.toDF("a", "b"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(gotLocal == got, s"local vs distributed CC mismatch, edges=$edges")
      // Components.run covers nodes that appear in non-self-loop edges
      val wantCovered = want.filter { case (k, _) =>
        edges.exists(e => (e._1 == k || e._2 == k) && e._1 != e._2)
      }
      assert(got == wantCovered, s"trial $trial edges=$edges")
    }
  }

  test("incremental merge equals full recompute (randomized base + delta)") {
    val rnd = new scala.util.Random(171717)
    (0 until 5).foreach { trial =>
      val nBase = 20 + rnd.nextInt(50) // docs 0..nBase-1 exist up front
      val nNew = 1 + rnd.nextInt(15) // docs nBase..nBase+nNew-1 arrive in the delta
      val baseEdges = List
        .fill(1 + rnd.nextInt(60))((rnd.nextInt(nBase).toLong, rnd.nextInt(nBase).toLong))
        .filter(e => e._1 != e._2)
      // delta edges may touch old docs, new docs, or bridge the two
      val all = nBase + nNew
      val deltaEdges = List
        .fill(1 + rnd.nextInt(40))((rnd.nextInt(all).toLong, rnd.nextInt(all).toLong))
        .filter(e => e._1 != e._2)
      val baseDocs = (0L until nBase.toLong).map(Tuple1(_)).toDF("doc_id")
      val newDocs = (nBase.toLong until all.toLong).map(Tuple1(_)).toDF("doc_id")
      val existing = Components.assignAll(baseDocs, baseEdges.toDF("a", "b"))
      // exercise the distributed delta path on one trial, driver-local else
      val localMax = if (trial == 0) 0L else Components.DriverLocalMaxEdges
      val got = Components
        .merge(existing, deltaEdges.toDF("a", "b"), newDocs, localMax)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val want = Components
        .assignAll(baseDocs.unionByName(newDocs), (baseEdges ++ deltaEdges).toDF("a", "b"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == want, s"trial $trial base=$baseEdges delta=$deltaEdges")
      // empty delta: merge is the identity on the assignment
      val idle = Components
        .merge(existing, Seq.empty[(Long, Long)].toDF("a", "b"), spark.emptyDataset[Long].toDF("doc_id"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val before = existing.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(idle == before, s"trial $trial: empty delta changed the assignment")
    }
  }
}
