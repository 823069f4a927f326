package graft

import graft.dedup._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: candidate-pair duplication factor (raw band-bucket pair
  * slots vs distinct pairs) at a given config — decides whether first-band
  * dedup pays for the band-hash arrays it must carry through the exchange.
  *
  * Usage: runMain graft.BandProbe [nFiles] [cpus]
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Config()
    val docs = Pipeline.prepareDocs(CorpusGen.corpus(spark, n).toDF(), cfg)
    val vocab = Vocabulary.build(docs, cfg)
    val encoded = Vocabulary.encode(docs, vocab).persist()
    encoded.count()
    // pipeline shape: signatures on exact-class reps with the max-df cap
    val classMap = Pipeline.exactClassMap(docs.join(encoded.select("doc_id"), "doc_id"))
    val nDocs = docs.count()
    val hot = Vocabulary.hotTokenIds(vocab, nDocs, cfg)
    val reps = classMap.filter(col("doc_id") === col("rep_id")).select("doc_id")
    val sigInput = encoded
      .join(reps, "doc_id")
      .withColumn("sig_tokens", ArrayExceptSorted(col("tokens"), hot))
      .filter(size(col("sig_tokens")) > 0)
      .withColumn("tokens", col("sig_tokens"))
      .drop("sig_tokens")
    val sigs = MinHash.withSignature(sigInput, cfg).persist()
    sigs.count()
    val rows = MinHash.bandRows(sigs, cfg)
    val agg = rows
      .groupBy("group", "band", "band_hash")
      .agg(count(lit(1)).as("n"))
      .agg(
        sum(expr("(n * (n - 1)) div 2")).as("raw_pairs"),
        count(lit(1)).as("buckets"),
        max(col("n")).as("max_bucket")
      )
      .head()
    val distinctPairs = MinHash.candidatePairs(sigs, cfg).count()
    println(s"BANDPROBE nFiles=$n sigRows=${sigs.count()} rawPairSlots=${agg.getLong(0)} " +
      s"buckets=${agg.getLong(1)} maxBucket=${agg.getLong(2)} distinctPairs=$distinctPairs " +
      f"dupFactor=${agg.getLong(0).toDouble / math.max(1, distinctPairs)}%.2f")
    spark.stop()
  }
}
