package graft

import graft.dedup.SuffixDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the substring-dedup chain (q31a/q31b). */
object SDProbe {
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
      println(f"SDPROBE $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cfg = SuffixDedup.SubConfig(k = 16, window = 5, minMatch = 20)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang").as("group"), col("text").as("content"))
      .persist()
    println(s"SDPROBE docs ${docs.count()}")
    val cand = time("candidates") {
      val c = SuffixDedup.candidatePairs(docs, cfg).persist()
      println(s"SDPROBE   candidate pairs: ${c.count()}")
      c
    }
    // distinct a-side fan-out: how much automaton reuse is available
    val aStats = cand.groupBy("a").count().agg(count(lit(1)), max(col("count")), avg(col("count"))).head()
    println(s"SDPROBE   distinct a=${aStats.getLong(0)} maxPerA=${aStats.getLong(1)} avgPerA=${aStats.getDouble(2)}")
    val run = time("full-run") {
      val r = SuffixDedup.run(docs, cfg)
      println(s"SDPROBE   verified pairs: ${r.count()}")
    }
    // verify-only (candidates cached): join + lcs UDF
    val minMatch = cfg.minMatch
    val lcsUdf = udf((x: String, y: String) =>
      if (x.length <= y.length) SuffixDedup.lcsLen(x, y) else SuffixDedup.lcsLen(y, x))
    val ca = docs.select(col("doc_id").as("a"), col("group"), col("content").as("content_a"))
    val cb = docs.select(col("doc_id").as("b"), col("content").as("content_b"))
    time("verify-cached-cand") {
      val n = cand.join(ca, "a").join(cb, "b")
        .withColumn("lcs_len", lcsUdf(col("content_a"), col("content_b")))
        .filter(col("lcs_len") >= minMatch)
        .count()
      println(s"SDPROBE   verify rows: $n")
    }
    spark.stop()
  }
}
