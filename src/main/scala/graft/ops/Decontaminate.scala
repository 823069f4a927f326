package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (the GPT-3 appendix-C / PaLM eval-overlap
  * scrub): flag training documents that share any word n-gram (default 13,
  * the GPT-3 choice) with a benchmark/eval set so they can be dropped before
  * training.
  *
  * Spark shape for 100 TB: both sides explode to gram keys, but the
  * benchmark side is orders of magnitude smaller — its DISTINCT gram set is
  * semi-join-shaped (AQE broadcasts it when it fits, hash-shuffles
  * otherwise), so the training scan stays one pass and the doc x doc space
  * is never materialized. Per-doc grams are deduped BEFORE the explode so a
  * doc repeating one benchmark gram k times costs one joined row, bounding
  * the join fan-out at (distinct grams per doc).
  */
object Decontaminate {

  /** Per training doc: the count of distinct word n-grams shared with the
    * benchmark set, and the drop flag. Docs with fewer than `n` words carry
    * no grams and are trivially clean. */
  def contaminated(
      train: DataFrame,
      benchmark: DataFrame,
      n: Int = 13,
      textCol: String = "text"
  ): DataFrame = {
    def grams = TextAnalysis.gramsOf(TextAnalysis.words(col(textCol)), n)
    val bGrams = benchmark.select(explode(grams).as("gram")).distinct()
    val tGrams = train.select(col("doc_id"), explode(array_distinct(grams)).as("gram"))
    val hits = tGrams.join(bGrams, "gram").groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    train
      .select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
