package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucket -> candidate-pair generation, shared by the LSH band pass and the
  * SimHash block pass.
  *
  * Skew design (SURVEY.md §4): boilerplate shingles put thousands of docs in
  * one bucket; a naive self-join on the bucket key makes one O(B^2) straggler
  * task and `collect_list` over the bucket OOMs. Two paths instead:
  *
  *  - B <= maxBucket: full pair expansion, but via collect_list + DOUBLE
  *    explode (posexplode of the id array, then explode of the per-row tail
  *    slice), so no row ever holds more than B ids (~8 KB at the default cap)
  *    and the B^2/2 pairs stream out of the generator incrementally.
  *
  *  - B > maxBucket: chain-linking — sort the bucket by doc_id and emit only
  *    the `chainWidth` forward neighbors of each doc (lead_1..lead_w). This
  *    bounds output at B*w while preserving CONNECTIVITY of the bucket (a
  *    chain spans it), which is what clustering needs; pairwise completeness
  *    for near-dup pairs is carried by the other bands (each pair gets
  *    `bands` independent chances to land in a small bucket). Dropped-pair
  *    exposure is observable: callers can log `oversizedBuckets`.
  *
  * Exact duplicates should be collapsed to one representative per content
  * hash BEFORE this runs (see [[Pipeline]]) — otherwise a 100k-copy file
  * makes every one of its band buckets oversized by construction.
  */
object PairGen {

  val ChainWidth = 4

  /** rows: bucket key columns + `doc_id`. Returns distinct (a, b), a < b. */
  def pairsFromBuckets(rows: DataFrame, bucketCols: Seq[String], maxBucket: Int): DataFrame = {
    val keys = bucketCols.map(col)
    val w = Window.partitionBy(keys: _*)
    val sized = rows.withColumn("bucket_n", count(lit(1)).over(w))

    // Small buckets: full B^2/2 expansion through two streaming explodes.
    val small = sized
      .filter(col("bucket_n") > 1 && col("bucket_n") <= maxBucket)
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(posexplode(col("ids")).as(Seq("i", "a")), col("ids"))
      .select(col("a"), explode(slice(col("ids"), col("i") + lit(2), greatest(size(col("ids")) - col("i") - 1, lit(0)))).as("b"))

    // Oversized buckets: sorted chain, w forward neighbors each.
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("doc_id"))
    val leads = (1 to ChainWidth).map(i => lead(col("doc_id"), i).over(wOrd))
    val large = sized
      .filter(col("bucket_n") > maxBucket)
      .select(col("doc_id").as("a"), array(leads: _*).as("nexts")) // window exprs first,
      .select(col("a"), explode(col("nexts")).as("b"))             // generator second
      .filter(col("b").isNotNull)

    small.unionByName(large).distinct()
  }

  /** Count of buckets above the cap (metrics / observability). */
  def oversizedBuckets(rows: DataFrame, bucketCols: Seq[String], maxBucket: Int): Long =
    rows.groupBy(bucketCols.map(col): _*).count().filter(col("count") > maxBucket).count()
}
