package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batched MinHash signatures + LSH band hashing.
  *
  * Replaces the reference's exact inverted-index candidate generation
  * (code/Stage05ComputeSimilarity.py:98-111 — every pair sharing >= 1 token)
  * with MinHash(128)+LSH: the reference design cannot scale because candidate
  * volume is quadratic in token document frequency; LSH banding bounds the
  * candidate set to pairs likely above the dedup threshold
  * (capture probability at the default config: see [[Config.captureProbability]]).
  *
  * All `numPerms` permutations are computed in one pass per row (batched,
  * per BASELINE.json north_star): h_i(x) = (a_i * x + b_i) mod p with
  * p = 2^31 - 1 and deterministic seeds, min-folded over the token array.
  * Token ids and coefficients fit in 31 bits so a_i * x + b_i stays inside
  * a signed 64-bit long with no overflow.
  */
object MinHash {

  private val P: Long = (1L << 31) - 1 // Mersenne prime 2^31-1

  /** Deterministic (a_i, b_i) coefficient table from the config seed. */
  def coefficients(numPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val as = Array.fill(numPerms)(1L + rnd.nextInt((P - 1).toInt).toLong)
    val bs = Array.fill(numPerms)(rnd.nextInt(P.toInt).toLong)
    (as, bs)
  }

  def signatureScala(tokens: Array[Int], as: Array[Long], bs: Array[Long]): Array[Long] = {
    val k = as.length
    val sig = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < tokens.length) {
      val x = tokens(t).toLong & 0x7fffffffL
      var i = 0
      while (i < k) {
        // exact (a*x + b) mod P via Mersenne folding — see MinHashKernel
        val v = as(i) * x + bs(i)
        val f1 = (v & P) + (v >>> 31)
        var h = (f1 & P) + (f1 >>> 31)
        if (h >= P) h -= P
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    sig
  }

  /** 64-bit mix of one band's signature slice (SplitMix64-style avalanche),
    * band index folded in so identical slices in different bands cannot
    * collide into one bucket. */
  def bandHashScala(sig: Array[Long], band: Int, rows: Int): Long = {
    var h = 0x9e3779b97f4a7c15L * (band + 1)
    var i = band * rows
    val end = i + rows
    while (i < end) {
      h ^= sig(i)
      h *= 0xbf58476d1ce4e5b9L
      h ^= (h >>> 31)
      i += 1
    }
    h
  }

  /** encoded (doc_id, group, tokens) -> (doc_id, group, minhash: array<long>).
    * Native expression, not the UDF: no per-element boxing (HashExpressions). */
  def withSignature(encoded: DataFrame, cfg: Config): DataFrame =
    encoded.withColumn("minhash", MinHashSig(col("tokens"), cfg))

  /** signatures -> exploded band rows (group, band, band_hash, doc_id). */
  def bandRows(signatures: DataFrame, cfg: Config): DataFrame =
    signatures
      .withColumn("bh", BandHashes(col("minhash"), cfg))
      .select(
        col("group"),
        posexplode(col("bh")).as(Seq("band", "band_hash")),
        col("doc_id")
      )

  /** [[bandRows]] with the doc's FULL band-hash array carried per row (the
    * input shape of the first-collision pair generator). */
  def bandRowsWithHashes(signatures: DataFrame, cfg: Config): DataFrame =
    signatures
      .withColumn("bhs", BandHashes(col("minhash"), cfg))
      .select(
        col("group"),
        posexplode(col("bhs")).as(Seq("band", "band_hash")),
        col("doc_id"),
        col("bhs")
      )

  /** LSH candidate pairs (a < b), deduped across bands.
    *
    * Plan choice by collision regime (both emit the SAME pair set, asserted
    * by the PairGen spec): few rows per band (<= 2 — the oracle-equality
    * detector configs) means a near-dup pair collides in MOST bands, so the
    * default generator shuffles a large duplication factor into its
    * distinct() (measured 27x / 86M raw rows on the sf0.1 queries) — the
    * first-collision generator emits each pair once from its minimal
    * non-oversized band instead, paying a wider band-row exchange (the
    * carried hash array). At production banding (32x4) the measured
    * duplication is only 1.92x and the narrow exchange wins. */
  def candidatePairs(signatures: DataFrame, cfg: Config, docCountBound: Long = Long.MaxValue): DataFrame =
    if (cfg.rowsPerBand <= 2)
      PairGen.pairsFromBandBucketsFirstCollision(
        bandRowsWithHashes(signatures, cfg),
        groupCols = Seq("group"),
        maxBucket = cfg.maxBucket,
        // one row per doc per band bucket: the doc count bounds bucket size
        bucketSizeBound = docCountBound
      )
    else
      PairGen.pairsFromBuckets(
        bandRows(signatures, cfg),
        bucketCols = Seq("group", "band", "band_hash"),
        maxBucket = cfg.maxBucket
      )

  /** MinHash estimate of Jaccard from two signatures (fraction of equal
    * components) — used in tests to validate the statistical promise. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  def estimateCol(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), v => v)) / size(a)
}
