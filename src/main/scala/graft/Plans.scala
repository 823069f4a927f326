package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.dedup._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dumps `explain("formatted")` for the load-bearing plans to PLANS.md —
  * the artifact for reviewing shuffle placement, pushed filters, and
  * whole-stage-codegen coverage after each change.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-plans")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf = "/root/testdata/sf0.001"
    def capture(df: DataFrame): String = {
      val bos = new ByteArrayOutputStream()
      Console.withOut(new PrintStream(bos, true, "UTF-8")) { df.explain("formatted") }
      bos.toString(StandardCharsets.UTF_8)
    }

    val cfg = Config()
    val cfg64 = Config(threshold = 0.5, bands = 64, maxBucket = 1 << 20)
    val corpusSize = 1000L
    val input = CorpusGen.corpus(spark, corpusSize).toDF()
    val docs = Pipeline.prepareDocs(input, cfg)
    val vocab = Vocabulary.build(docs, cfg)
    val encoded = Vocabulary.encode(docs, vocab)
    val sigs = SimHash.withSimhash(MinHash.withSignature(encoded, cfg), cfg)

    val sections = Seq(
      "q13_doc_pairs (flagship: within-group exact Jaccard over pruned tokens)" ->
        SparkEntry.queries("q13_doc_pairs")(spark, sf),
      "q04_join_revenue_by_nation (broadcast dim join)" ->
        SparkEntry.queries("q04_join_revenue_by_nation")(spark, sf),
      "q07_filter_project (pushdown check: PushedFilters + pruned ReadSchema)" ->
        SparkEntry.queries("q07_filter_project")(spark, sf),
      "vocabulary build (explode + partial hash agg)" -> vocab,
      "dictionary encode, broadcast-map plan (narrow projection)" -> encoded,
      "dictionary encode, shuffle-join plan (explode + join + collect_list)" ->
        Vocabulary.encodeJoin(docs, vocab),
      "LSH candidate pairs (band explode + bucket pairing)" ->
        MinHash.candidatePairs(sigs, cfg),
      "verify (candidates x encoded x encoded + jaccard kernel)" ->
        Jaccard.verify(MinHash.candidatePairs(sigs, cfg), encoded, cfg.threshold),
      "q16_ngram_jaccard (compiled WordGramSet kernel + PPJoin over 3-gram sets)" ->
        SparkEntry.queries("q16_ngram_jaccard")(spark, sf),
      "q20_fingerprint (single-pass MinGramMd5 kernel, no explode/groupBy)" ->
        SparkEntry.queries("q20_fingerprint")(spark, sf),
      // The q23/q31a SparkEntry entries return MEMOIZED tables (explain would
      // show an InMemoryTableScan and shared() would materialize the whole
      // chain just to print a plan) — dump the un-memoized builders at the
      // same configs instead, so the kernel operators are actually visible.
      // (The first-collision builder is not job-free: its oversized-bucket
      // probe runs one aggregation over the small plan corpus at
      // construction — see PairGen.pairsFromBandBucketsFirstCollision.)
      "first-collision-band candidates (64x2 oracle config, the q23 generator)" ->
        MinHash.candidatePairs(
          MinHash.withSignature(encoded, cfg64), cfg64),
      "q28_lsh_cosine_top3 (compiled HyperplaneSketch + CosineFloat re-rank)" ->
        SparkEntry.queries("q28_lsh_cosine_top3")(spark, sf),
      "winnow candidate pairs (native WinnowFingerprints, the q31a/q31b front-end)" ->
        graft.dedup.SuffixDedup.candidatePairs(
          spark.read.parquet(s"$sf/documents.parquet")
            .selectExpr("doc_id", "lang as group", "text as content"),
          graft.dedup.SuffixDedup.SubConfig(k = 16, window = 5, minMatch = 20),
          graft.dedup.CacheRegistry.unmanaged),
      "q37_semdedup (SemDeDup: coarse-quantizer assign + within-cluster cosine self-join)" ->
        SparkEntry.queries("q37_semdedup")(spark, sf),
      "q40_decontaminate (13-gram eval-overlap: deduped gram explode + semi-join-shaped probe)" ->
        SparkEntry.queries("q40_decontaminate")(spark, sf),
      "q41_quality_filter (composed gate: one map-side projection, no shuffle)" ->
        SparkEntry.queries("q41_quality_filter")(spark, sf),
      // q25b's union-find runs EAGERLY at construction (driver-local at this
      // edge count); the dumped plan is the distributed remainder — the
      // broadcast relabel of the existing assignment + singleton fill-in,
      // which is the part that scans the corpus-sized table
      "q25b incremental components (delta CC + relabel join of the existing assignment)" ->
        SparkEntry.queries("q25b_components_incremental")(spark, sf),
      "q42 cluster representatives (doc_id equi-join + window partitioned BY CLUSTER — no global sort)" ->
        SparkEntry.queries("q42_cluster_representatives")(spark, sf),
      // q43's per-partition sum job runs EAGERLY at construction; the dumped
      // plan is the stamping pass — InMemoryTableScan of the range-partitioned
      // copy + one narrow mapPartitions, no single-partition window anywhere
      "q43 shard pack (global prefix sum: cached range partition + narrow stamp)" ->
        SparkEntry.queries("q43_shard_pack")(spark, sf),
      "q45 vendored flags (distinct-first repo count — mega dup classes cannot skew the agg)" ->
        SparkEntry.queries("q45_vendored_flags")(spark, sf),
      // the streaming ingest plan, dumped through its batch-parity shape
      // (identical operators; a started streaming query can't be explained
      // here): broadcast-dict encode -> band explode -> index equi-join ->
      // first-collision filter -> verify kernel
      "streaming near-dup probe (stream-static LSH join, batch-parity shape)" -> {
        val hot = Vocabulary.hotTokenIds(vocab, corpusSize, cfg)
        // the index contract: exact-class representatives only
        val encodedReps = Pipeline.repEncoded(docs, encoded)
        graft.streaming.StreamingDedup.nearDupAgainstCorpus(
          graft.streaming.StreamingDedup.prepareStream(input.limit(50), cfg),
          vocab,
          encodedReps,
          graft.streaming.StreamingDedup.corpusIndex(encodedReps, cfg, hot),
          cfg,
          hot
        )
      }
    )

    val md = new StringBuilder("# Physical plans (explain formatted)\n")
    sections.foreach { case (title, df) =>
      md.append(s"\n## $title\n\n```\n${capture(df)}```\n")
    }
    Files.write(
      Paths.get("PLANS.md"),
      md.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING
    )
    println(s"wrote PLANS.md (${md.length} chars)")
    spark.stop()
  }
}
