package graft

import graft.dedup._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only sub-chain profiler for the oracle-config detector queries
  * (q23/q25 are the suite's remaining fat queries): times the encoded chain,
  * the LSH candidate stage, the verify stage, and connected components
  * separately at an sf dir. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"QPROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cfg = Config(threshold = 0.5, bands = 64, maxBucket = 1 << 20)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.select(
      col("doc_id"), col("lang").as("group"),
      Tokenize.tokenSet(col("text"), cfg.shingleK).as("tokens")
    ).filter(size(col("tokens")) > 0)
    val enc = time("encode-chain") {
      val vocab = Vocabulary.build(base, cfg)
      val e = Vocabulary.encode(base, vocab).persist()
      e.count()
      e
    }
    val sigs = time("signatures") {
      val s = MinHash.withSignature(enc, cfg).persist()
      s.count()
      s
    }
    val bandN = time("band-rows") { MinHash.bandRows(sigs, cfg).count() }
    println(s"QPROBE   band rows: $bandN")
    val raw = time("raw-pair-volume") {
      val rows = MinHash.bandRows(sigs, cfg)
      rows
        .groupBy("group", "band", "band_hash")
        .agg(count(lit(1)).as("n"))
        .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")))
        .head()
        .getLong(0)
    }
    println(s"QPROBE   raw pre-distinct pairs: $raw")
    val cand = time("candidates(PairGen)") {
      val c = MinHash.candidatePairs(sigs, cfg).persist()
      println(s"QPROBE   candidate pairs: ${c.count()}")
      c
    }
    val pairs = time("verifyCounts") {
      val p = Jaccard.verifyCounts(cand, enc, cfg.threshold).persist()
      println(s"QPROBE   verified pairs: ${p.count()}")
      p
    }
    time("components") { Components.assignAll(enc, pairs).count() }
    spark.stop()
  }
}
