package graft

import graft.dedup._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The correctness gate (BASELINE.md): exact parity with the reference
  * semantics on the exact path, recall >= 0.99 + cluster-assignment equality
  * on the scalable LSH path, sha256 lineage, and checkpoint resume.
  */
class PipelineParitySpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Config()

  /** Oracle doc ids must equal the pipeline's dense ids: both are the rank in
    * (repo, path, commit) sort order (ASCII corpus => same collation). */
  private def oracleDocs(files: Seq[CodeFile]): Seq[RefOracle.Doc] =
    files
      .sortBy(f => (f.repo, f.path, f.commit))
      .zipWithIndex
      .map { case (f, i) => RefOracle.Doc(i.toLong, f.lang, f.content) }

  private def pairsOf(df: DataFrame): Set[(String, Long, Long, Double)] =
    df.select("group", "a", "b", "sim")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("exact path equals the reference oracle pair-for-pair (tiny corpus)") {
    val files = CorpusGen.corpusLocal(200)
    val input = spark.createDataFrame(files)
    val docs = Pipeline.prepareDocs(input, cfg)
    val vocab = Vocabulary.build(docs, cfg)
    val encoded = Vocabulary.encode(docs, vocab)
    val got = pairsOf(ExactPairs.allPairs(encoded))
    val want = RefOracle
      .allPairs(oracleDocs(files), cfg.shingleK, cfg.minDf)
      .map(p => (p.group, p.a, p.b, p.sim))
      .toSet
    assert(want.nonEmpty, "oracle produced no pairs — fixture is broken")
    assert(got == want)
  }

  test("LSH path: recall >= 0.99 at threshold and exact precision (small corpus)") {
    val files = CorpusGen.corpusLocal(1000)
    val input = spark.createDataFrame(files)
    val work = tmpDir("graft-lsh")
    val t = Pipeline.run(spark, input, cfg, work)

    val oracle = RefOracle.allPairs(oracleDocs(files), cfg.shingleK, cfg.minDf)
    val oracleAtTau = oracle.filter(_.sim >= cfg.threshold).map(p => (p.group, p.a, p.b, p.sim)).toSet
    val got = pairsOf(t.pairs)

    assert(oracleAtTau.size > 50, s"fixture too weak: ${oracleAtTau.size} oracle pairs at tau")
    // precision: every emitted pair is a true pair at the threshold
    assert(got.subsetOf(oracleAtTau))
    val recall = got.intersect(oracleAtTau).size.toDouble / oracleAtTau.size
    assert(recall >= 0.99, s"recall $recall < 0.99 (${got.size} of ${oracleAtTau.size})")

    // cluster assignments equal union-find over the oracle pair set
    val universe = t.encoded.select("doc_id").as[Long].collect().toSeq
    val wantClusters = RefOracle.clusters(universe, oracle, cfg.threshold)
    val gotClusters = t.components
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(gotClusters == wantClusters)
  }

  test("broadcast-map encode equals the shuffle-join encode plan") {
    val files = CorpusGen.corpusLocal(300)
    val docs = Pipeline.prepareDocs(spark.createDataFrame(files), cfg)
    val vocab = Vocabulary.build(docs, cfg)
    def rows(df: DataFrame): Map[Long, (String, Seq[Int])] =
      df.select("doc_id", "group", "tokens")
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getAs[collection.Seq[Int]](2).toSeq))
        .toMap
    val viaJoin = rows(Vocabulary.encodeJoin(docs, vocab))
    val viaBroadcast = rows(Vocabulary.encodeBroadcast(docs, vocab))
    assert(viaJoin.nonEmpty && viaJoin == viaBroadcast)
  }

  test("topN config produces a ranked per-probe report stage equal to TopN.perProbe") {
    val files = CorpusGen.corpusLocal(300)
    val input = spark.createDataFrame(files)
    val work = tmpDir("graft-topn")
    val t = Pipeline.run(spark, input, cfg.copy(topN = Some(3)), work)
    val report = t.topn.getOrElse(fail("topN=Some(3) must yield a topn stage"))
    def rows(df: DataFrame): Set[(String, Long, Long, Int, Double)] =
      df.select("group", "probe", "matched", "rank", "sim")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
        .toSet
    val want = rows(TopN.perProbe(t.pairs, 3))
    assert(want.nonEmpty && rows(report) == want)
    assert(!rows(report).exists(_._4 > 3))
    // the stage is checkpointed + resumable like every other stage
    assert(Checkpoints.exists(spark, s"$work/topn"))
  }

  test("CompactDict: exact lookups, absent -> -1, measured footprint at the cap") {
    // realistic token shapes (repo-local identifiers like the bench corpus)
    val n = graft.dedup.Vocabulary.BroadcastMaxVocab.toInt
    val entries = Array.tabulate(n)(i => (s"r${i / 200}v${i % 200}tok$i", i))
    val dict = graft.dedup.CompactDict.build(entries)
    assert(dict.size == n)
    var i = 0
    while (i < n) { // every entry found with its exact id (sampled stride 97 + edges)
      assert(dict.get(entries(i)._1) == i)
      i += 97
    }
    assert(dict.get(entries(n - 1)._1) == n - 1)
    assert(dict.get("absent-token") == -1)
    assert(dict.get("") == -1)
    val mb = dict.heapBytes / (1024.0 * 1024.0)
    info(f"CompactDict heap at $n%d entries: $mb%.1f MB")
    // the BroadcastMaxVocab doc promises <= ~400 MB at the cap
    assert(dict.heapBytes < 420L * 1024 * 1024, f"footprint $mb%.1f MB exceeds the documented budget")
  }

  test("composite group keys: pairs stay within (lang, repo) groups") {
    val files = CorpusGen.corpusLocal(600)
    val input = spark.createDataFrame(files)
    val cfg2 = Config(groupCols = Seq("lang", "repo"))
    val work = tmpDir("graft-twokey")
    val t = Pipeline.run(spark, input, cfg2, work)

    // every emitted pair's group is the composite of BOTH members' keys
    val keyOf = files.sortBy(f => (f.repo, f.path, f.commit)).zipWithIndex.map {
      case (f, i) => i.toLong -> s"${f.lang}\u0001${f.repo}"
    }.toMap
    val got = t.pairs.select("group", "a", "b").collect()
    assert(got.nonEmpty, "two-key fixture produced no pairs")
    got.foreach { r =>
      val (g, a, b) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(keyOf(a) == g && keyOf(b) == g, s"pair ($a,$b) crosses groups: $g")
    }

    // and it matches the oracle pair set restricted to same-(lang,repo)
    // pairs (CorpusGen plants all duplicate classes within one repo, so the
    // composite grouping must not LOSE planted pairs): exact precision,
    // LSH-grade recall
    val oracle = RefOracle
      .allPairs(oracleDocs(files), cfg2.shingleK, cfg2.minDf)
      .filter(_.sim >= cfg2.threshold)
      .filter(p => keyOf(p.a) == keyOf(p.b))
      .map(p => (keyOf(p.a), p.a, p.b, p.sim))
      .toSet
    val gotPairs = pairsOf(t.pairs)
    assert(oracle.size > 50, s"fixture too weak: ${oracle.size} oracle pairs")
    assert(gotPairs.subsetOf(oracle))
    val recall = gotPairs.intersect(oracle).size.toDouble / oracle.size
    assert(recall >= 0.99, s"recall $recall < 0.99 (${gotPairs.size} of ${oracle.size})")
  }

  test("per-row invariant: content sha256 carried unchanged into the docs checkpoint") {
    val files = CorpusGen.corpusLocal(100)
    val input = spark.createDataFrame(files)
    val docs = Pipeline.prepareDocs(input, cfg)
    val mismatches = docs
      .join(input.withColumn("want_sha", sha2(col("content"), 256)), Seq("repo", "path", "commit"))
      .filter(col("content_sha") =!= col("want_sha"))
      .count()
    assert(mismatches == 0)
  }

  test("resume: a partially-checkpointed run completes to identical output") {
    val files = CorpusGen.corpusLocal(300)
    val input = spark.createDataFrame(files)

    val full = tmpDir("graft-full")
    val firstPairs = pairsOf(Pipeline.run(spark, input, cfg, full).pairs)

    // simulate a killed run: only the first stages exist
    val partial = tmpDir("graft-partial")
    val docs = Checkpoints.stage(spark, "docs", s"$partial/docs", Seq("group"))(
      Pipeline.prepareDocs(input, cfg)
    )
    Checkpoints.stage(spark, "vocab", s"$partial/vocab")(Vocabulary.build(docs, cfg))
    val resumed = pairsOf(Pipeline.run(spark, input, cfg, partial).pairs)
    assert(resumed == firstPairs)

    // idempotence: re-running over complete checkpoints changes nothing
    val again = pairsOf(Pipeline.run(spark, input, cfg, full).pairs)
    assert(again == firstPairs)
  }

  test("config-aware resume: a threshold change reuses docs..candidates, rebuilds pairs+components") {
    val files = CorpusGen.corpusLocal(300)
    val input = spark.createDataFrame(files)
    val work = tmpDir("graft-rethreshold")
    val strict = Pipeline.run(spark, input, Config(threshold = 0.9), work)
    val strictPairs = pairsOf(strict.pairs)
    def mtime(stage: String): Long = new java.io.File(s"$work/$stage/_SUCCESS").lastModified()
    val upstreamBefore = Seq("docs", "vocab", "encoded", "signatures", "candidates").map(mtime)
    val pairsBefore = mtime("pairs")

    // loosen the threshold against the SAME work dir: upstream checkpoints
    // must be reused verbatim, verify + components must recompute
    val loose = Pipeline.run(spark, input, Config(threshold = 0.7), work)
    val loosePairs = pairsOf(loose.pairs)
    assert(Seq("docs", "vocab", "encoded", "signatures", "candidates").map(mtime) == upstreamBefore)
    assert(mtime("pairs") != pairsBefore || strictPairs == loosePairs)
    assert(strictPairs.subsetOf(loosePairs))
    assert(loosePairs.exists(_._4 < 0.9), "fixture too weak: no pair between the thresholds")

    // the incrementally-rebuilt result equals a from-scratch run at 0.7
    val fresh = tmpDir("graft-rethreshold-fresh")
    assert(pairsOf(Pipeline.run(spark, input, Config(threshold = 0.7), fresh).pairs) == loosePairs)
  }

  test("mega exact-dup class: collapsed before LSH, fully expanded after, one cluster") {
    // the 100 TB hazard this pins: a content duplicated C times must
    // contribute ZERO intra-class LSH candidates (the class collapses to one
    // representative per (group, content_sha) BEFORE banding, so it cannot
    // create a hot bucket), while the FINAL pair table still carries all
    // C(C,2) sim=1.0 member pairs (reference emits pairs over raw docs)
    val C = 300
    val dupContent =
      "def megaDup(x: Int): Int = {\n  val widget = x * frobnicate(x)\n  widget + renderTemplate(x)\n}\n"
    val noise = CorpusGen.corpusLocal(60)
    val clones = (0 until C).map(i => CodeFile(s"dup-repo-$i", s"src/clone$i.scala", f"c$i%04d", "scala", dupContent))
    val input = spark.createDataFrame(new scala.util.Random(7L).shuffle(noise ++ clones))

    val t = Pipeline.run(spark, input, cfg, tmpDir("graft-mega"))

    val nReps = t.docs.select("group", "content_sha").distinct().count()
    assert(
      t.candidates.count() <= nReps * (nReps - 1) / 2,
      "candidate volume must be bounded by representative count, not raw doc count"
    )

    val memberIds = t.docs
      .filter(col("content_sha") === sha2(lit(dupContent), 256))
      .select("doc_id").as[Long].collect().toSet
    assert(memberIds.size == C, s"expected $C class members, got ${memberIds.size}")

    val intra = t.pairs
      .filter(col("a").isin(memberIds.toSeq: _*) && col("b").isin(memberIds.toSeq: _*))
      .select("a", "b", "sim").collect()
    assert(intra.length == C * (C - 1) / 2, s"expected all ${C * (C - 1) / 2} member pairs, got ${intra.length}")
    assert(intra.forall(_.getDouble(2) == 1.0), "every intra-class pair must be sim=1.0")

    val clusters = t.components
      .filter(col("doc_id").isin(memberIds.toSeq: _*))
      .select("cluster_id").distinct().as[Long].collect()
    assert(clusters.length == 1, s"class must land in ONE cluster, got ${clusters.length}")
  }

  test("collapseVersions: only the newest version per (repo, path) is clustered") {
    val base = CorpusGen.corpusLocal(100)
    // 3-commit history per file: two stale versions with perturbed content
    val versioned = base.flatMap { f =>
      Seq(
        f.copy(commit = "c1", content = f.content + " stalemarker1 xyz1"),
        f.copy(commit = "c2", content = f.content + " stalemarker2"),
        f.copy(commit = "c3")
      )
    }
    val t = Pipeline.run(
      spark,
      spark.createDataFrame(versioned),
      cfg.copy(collapseVersions = true),
      tmpDir("graft-versions")
    )
    val docs = t.docs.select("repo", "path", "commit").collect()
    assert(docs.length == base.length, "one doc per (repo, path)")
    assert(docs.forall(_.getString(2) == "c3"), "the greatest commit wins")
    // byte-identical output to a plain run over the manually-filtered latest
    // rows (same keys -> same dense ids)
    val plain = Pipeline.run(
      spark,
      spark.createDataFrame(base.map(_.copy(commit = "c3"))),
      cfg,
      tmpDir("graft-versions-plain")
    )
    assert(pairsOf(t.pairs) == pairsOf(plain.pairs))
  }

  test("vendoredMinRepos: vendored content skips LSH but keeps its exact class clustered") {
    val license = (0 until 120).map(k => s"lic$k term$k").mkString(" ")
    val nearContent = license.split(' ').drop(12).mkString(" ") // Jaccard 228/240 = 0.95
    val vendored = (0 until 12).map(r => CodeFile(f"repo$r%02d", "LICENSE.txt", "c0", "scala", license))
    val near = CodeFile("repo99", "LICENSE-mod.txt", "c0", "scala", nearContent)
    val fill = CorpusGen.corpusLocal(80)
    val input = spark.createDataFrame((vendored :+ near) ++ fill)

    def idsOf(t: Pipeline.Tables, path: String): Set[Long] =
      t.docs.filter(col("path") === path).select("doc_id").as[Long].collect().toSet

    val off = Pipeline.run(spark, input, cfg, tmpDir("graft-vend-off"))
    val vOff = idsOf(off, "LICENSE.txt"); val nOff = idsOf(off, "LICENSE-mod.txt")
    def crossPairs(t: Pipeline.Tables, xs: Set[Long], ys: Set[Long]): Long =
      t.pairs.filter(
        (col("a").isin(xs.toSeq: _*) && col("b").isin(ys.toSeq: _*)) ||
          (col("a").isin(ys.toSeq: _*) && col("b").isin(xs.toSeq: _*))
      ).count()
    assert(crossPairs(off, vOff, nOff) > 0, "without routing, the near-dup pairs with the license class")

    val on = Pipeline.run(spark, input, cfg.copy(vendoredMinRepos = 8L), tmpDir("graft-vend-on"))
    val v = idsOf(on, "LICENSE.txt"); val n = idsOf(on, "LICENSE-mod.txt")
    assert(v.size == 12 && n.size == 1)
    assert(crossPairs(on, v, n) == 0, "vendored reps must generate no near-dup candidates")
    // the exact class itself still collapses, pairs at sim=1.0 and clusters
    val intra = on.pairs
      .filter(col("a").isin(v.toSeq: _*) && col("b").isin(v.toSeq: _*))
      .select("sim").as[Double].collect()
    assert(intra.length == 12 * 11 / 2 && intra.forall(_ == 1.0))
    val vClusters = on.components
      .filter(col("doc_id").isin(v.toSeq: _*))
      .select("cluster_id").distinct().count()
    assert(vClusters == 1, "vendored class stays one cluster")
    assert(on.components.count() == on.docs.count(), "every doc keeps a component row")
  }

  test("stage metrics sidecars exist with per-partition rows") {
    val files = CorpusGen.corpusLocal(100)
    val input = spark.createDataFrame(files)
    val work = tmpDir("graft-metrics")
    Pipeline.run(spark, input, cfg, work)
    val m = spark.read.parquet(s"$work/docs_metrics")
    assert(m.columns.toSet == Set("partition", "rows", "stage", "wall_ms"))
    assert(m.count() >= 4) // one row per lang partition
    assert(Checkpoints.exists(spark, s"$work/components"))
  }
}
