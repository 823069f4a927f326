package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 64-bit SimHash pass — the second detector of the three-stage design
  * (BASELINE.json north_star). Catches near-clones whose token MULTISET is
  * almost identical (small edits), complementing MinHash which estimates
  * set Jaccard.
  *
  * simhash(doc) = sign-bit vector of the per-bit vote sum over SplitMix64
  * token hashes. Candidates: two docs within Hamming distance k must agree
  * exactly on at least one of k+1 disjoint 16-bit blocks (pigeonhole), so
  * blocking on (block_idx, block_value) finds all of them; pairs are then
  * filtered to hamming <= k and finally verified with exact Jaccard like
  * every other candidate source.
  */
object SimHash {

  val Blocks = 4 // 4 x 16-bit blocks -> complete for hamming <= 3
  val MaxHamming = 3

  private[dedup] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def simhash64(tokens: Array[Int], seed: Long): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = mix64(tokens(t).toLong ^ seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def withSimhash(encoded: DataFrame, cfg: Config): DataFrame =
    // native expression, not the UDF: no per-element boxing (see HashExpressions)
    encoded.withColumn("simhash", SimHash64(col("tokens"), cfg))

  /** (doc_id, group, simhash) -> block rows (group, block, block_val, doc_id). */
  def blockRows(signatures: DataFrame): DataFrame = {
    val blocks = array((0 until Blocks).map { b =>
      shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))
    }: _*)
    signatures.select(
      col("group"),
      posexplode(blocks).as(Seq("block", "block_val")),
      col("doc_id")
    )
  }

  /** Hamming-filtered candidate pairs (a < b). */
  def candidatePairs(signatures: DataFrame, cfg: Config): DataFrame = {
    val pairs = PairGen.pairsFromBuckets(
      blockRows(signatures),
      bucketCols = Seq("group", "block", "block_val"),
      maxBucket = cfg.maxBucket
    )
    val ha = signatures.select(col("doc_id").as("a"), col("simhash").as("sh_a"))
    val hb = signatures.select(col("doc_id").as("b"), col("simhash").as("sh_b"))
    pairs
      .join(ha, "a")
      .join(hb, "b")
      .filter(Jaccard.hamming(col("sh_a"), col("sh_b")) <= MaxHamming)
      .select(col("a"), col("b"))
  }
}
