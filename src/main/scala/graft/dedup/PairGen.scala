package graft.dedup

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket -> candidate-pair generation, shared by the LSH band pass and the
  * SimHash block pass.
  *
  * Skew design (SURVEY.md §4): boilerplate shingles put thousands of docs in
  * one bucket; a naive self-join on the bucket key makes one O(B^2) straggler
  * task and a per-bucket `collect_list` OOMs. Two semantics, one pass:
  *
  *  - B <= maxBucket: full B^2/2 pair expansion;
  *  - B > maxBucket: chain-linking — each doc pairs with its `chainWidth`
  *    sorted forward neighbors only. This bounds output at B*w while
  *    preserving CONNECTIVITY of the bucket (a chain spans it), which is what
  *    clustering needs; pairwise completeness for near-dup pairs is carried
  *    by the other bands (each pair gets `bands` independent chances to land
  *    in a small bucket). Dropped-pair exposure is observable via
  *    [[oversizedBuckets]].
  *
  * Physical shape (round-3 rewrite): ONE hash exchange on the bucket key +
  * ONE in-partition sort by (key, doc_id) + a STREAMING mapPartitions
  * generator. The round-2 plan (window count + collect_list + double explode
  * + a second window for the chain path) paid two window sorts over the full
  * band-row table — the worst-scaling stage of the official bench. The
  * generator buffers at most maxBucket+1 ids per bucket (it switches to chain
  * emission the moment a bucket exceeds the cap), so task memory stays
  * bounded no matter how hot a bucket gets — strictly better than any
  * collect_list shape. It emits one (id, tail-array) row per doc per bucket
  * — NOT one JVM object per pair — and the quadratic pair fan-out happens in
  * a codegen'd `explode` over the primitive long arrays (the oracle-config
  * detectors expand ~60x more raw pairs than distinct ones; boxing each was
  * measurably slower than Tungsten generation). Emitted pair sets are
  * bitwise-identical to round 2's (asserted by the PairGen spec and the
  * q23/q24/q28/q31a oracles).
  *
  * Exact duplicates should be collapsed to one representative per content
  * hash BEFORE this runs (see [[Pipeline]]) — otherwise a 100k-copy file
  * makes every one of its band buckets oversized by construction.
  */
object PairGen {

  val ChainWidth = 4

  /** rows: bucket key columns + `doc_id`. Returns distinct (a, b), a < b.
    *
    * The streaming bucket/cap/chain state machine below has a deliberate
    * TWIN in [[pairsFromBandBucketsFirstCollision]] (different emission:
    * pairs filtered to their first collision band, so it buffers signatures
    * too). Any change to bucket boundaries, cap crossing, or chain-window
    * maintenance must be applied to BOTH — the PairGen spec asserts their
    * emitted pair sets stay equal. */
  def pairsFromBuckets(rows: DataFrame, bucketCols: Seq[String], maxBucket: Int): DataFrame = {
    val keys = bucketCols.map(col)
    val spark = rows.sparkSession
    import spark.implicits._
    val prepared = rows
      .select(keys :+ col("doc_id").cast("long").as("doc_id"): _*)
      .repartition(keys: _*)
      .sortWithinPartitions(keys :+ col("doc_id"): _*)
    val nKeys = bucketCols.length
    val docIdx = nKeys // doc_id is the last projected column
    val cap = maxBucket
    prepared
      .mapPartitions { it =>
        new Iterator[(Long, Array[Long])] {
          private val buf = new ArrayBuffer[Long]()
          private val curKey = new Array[Any](nKeys)
          private var haveKey = false
          private var chain = false
          private var pending: Iterator[(Long, Array[Long])] = Iterator.empty

          private def sameKey(r: org.apache.spark.sql.Row): Boolean = {
            var i = 0
            while (i < nKeys) {
              if (r.get(i) != curKey(i)) return false
              i += 1
            }
            true
          }

          /** Small completed bucket: one (id, full tail) row per doc — the
            * exploded union is the full B^2/2 pair set (ids ascending). */
          private def fullRows(ids: Array[Long]): Iterator[(Long, Array[Long])] =
            if (ids.length < 2) Iterator.empty
            else
              (0 until ids.length - 1).iterator.map { i =>
                (ids(i), java.util.Arrays.copyOfRange(ids, i + 1, ids.length))
              }

          /** Chain rows among `ids`: each id with its <=ChainWidth forward
            * neighbors — the buffered prefix when a bucket crosses the cap. */
          private def chainRows(ids: Array[Long]): Iterator[(Long, Array[Long])] =
            (0 until ids.length - 1).iterator.map { i =>
              (ids(i), java.util.Arrays.copyOfRange(ids, i + 1, math.min(i + 1 + ChainWidth, ids.length)))
            }

          /** Close the current bucket: small buckets emit their rows now;
            * chain-mode buckets already streamed everything. */
          private def flushBucket(): Iterator[(Long, Array[Long])] =
            if (!chain && buf.length > 1) fullRows(buf.toArray) else Iterator.empty

          private def advance(): Unit = {
            while (!pending.hasNext && it.hasNext) {
              val r = it.next()
              val id = r.getLong(docIdx)
              if (!haveKey || !sameKey(r)) {
                pending = flushBucket()
                var i = 0
                while (i < nKeys) { curKey(i) = r.get(i); i += 1 }
                haveKey = true
                chain = false
                buf.clear()
                buf += id
              } else if (chain) {
                // stream one row: (id, the <=ChainWidth ids before it) — the
                // exploded orientation is fixed by least/greatest below
                val from = math.max(0, buf.length - ChainWidth)
                pending = Iterator.single((id, buf.slice(from, buf.length).toArray))
                buf += id
                if (buf.length > ChainWidth) buf.remove(0, buf.length - ChainWidth)
              } else {
                buf += id
                if (buf.length > cap) {
                  // bucket just crossed the cap: the WHOLE bucket is chain-
                  // linked — emit chain rows for the buffered prefix, then
                  // stream; drop all but the trailing window
                  chain = true
                  val ids = buf.toArray
                  pending = chainRows(ids)
                  buf.clear()
                  buf ++= ids.takeRight(ChainWidth)
                }
              }
            }
            if (!pending.hasNext && !it.hasNext && haveKey) {
              pending = flushBucket()
              haveKey = false
              buf.clear()
            }
          }

          def hasNext: Boolean = {
            if (!pending.hasNext) advance()
            pending.hasNext
          }
          def next(): (Long, Array[Long]) = {
            if (!hasNext) throw new NoSuchElementException
            pending.next()
          }
        }
      }
      .toDF("x", "ys")
      // quadratic fan-out in codegen over primitive arrays, not in the JVM
      // iterator; chain rows arrive (later, earlier) so orient explicitly
      .select(col("x"), explode(col("ys")).as("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
  }

  /** Count of buckets above the cap (metrics / observability). */
  def oversizedBuckets(rows: DataFrame, bucketCols: Seq[String], maxBucket: Int): Long =
    rows.groupBy(bucketCols.map(col): _*).count().filter(col("count") > maxBucket).count()

  /** Broadcastable oversized-bucket sets above this size fall back to
    * [[pairsFromBuckets]] (correctness never depends on the fast path). */
  val OversizedBroadcastMax: Long = 2000000L

  /** FIRST-COLLISION-BAND pair generation for HIGH-COLLISION banding configs
    * (e.g. 64 bands x 2 rows at threshold 0.5: a sim-0.9 pair collides in
    * ~52 of 64 bands, so [[pairsFromBuckets]] shuffles ~27 duplicate rows
    * per distinct pair into its distinct() — measured 86M raw vs 3.2M
    * distinct on the sf0.1 detector queries). Each band row carries the
    * doc's FULL band-hash array (`bhs`), and a pair is emitted only in the
    * minimal band where the two docs collide in a NON-oversized bucket —
    * so the generator's output is already (nearly) duplicate-free and the
    * final distinct shuffles ~1x the pair set.
    *
    * The emitted pair SET is identical to [[pairsFromBuckets]]:
    *  - oversized buckets chain-link exactly as before (unfiltered; the
    *    final distinct removes cross-mode duplicates);
    *  - the first-collision filter treats collisions inside oversized
    *    buckets as non-emitting (those buckets emitted chains, not pairs),
    *    via a broadcast of the oversized bucket keys — rare by design
    *    (boilerplate caps keep buckets small; the bench measures 0), and if
    *    their count exceeds [[OversizedBroadcastMax]] the function falls
    *    back to [[pairsFromBuckets]] wholesale.
    *
    * NOT the default: carrying `bands` hashes per band row multiplies the
    * exchange width, which only pays when the duplication factor is large.
    * Measured: production 32x4 config dup factor 1.92 (keep
    * pairsFromBuckets); oracle 64x2 config dup factor 27 (use this).
    *
    * Memory shape vs [[pairsFromBuckets]]: buffering a bucket holds every
    * member's full hash array, up to min(|bucket|, maxBucket+1) x bands x
    * 8 bytes per task (chain mode drops the buffers past the cap), where
    * the default generator buffers bare ids. Capped production-style
    * configs stay ~1 MB/task; an UNCAPPED config (oracle-parity
    * maxBucket = 1<<20) accepts up to ~0.5 GB on a pathological hot bucket
    * as the price of exact pair parity — cap maxBucket when taking this
    * path at scale. The oversized-key probe's driver cost is bounded by
    * [[OversizedBroadcastMax]] keys (~100 MB transient worst-case) before
    * the wholesale fallback.
    *
    * rows: groupCols ++ (band: int, band_hash: long, doc_id, bhs:
    * array<long> — the doc's hash per band, indexed by `band`). */
  def pairsFromBandBucketsFirstCollision(
      rows: DataFrame,
      groupCols: Seq[String],
      maxBucket: Int,
      bucketSizeBound: Long = Long.MaxValue
  ): DataFrame = {
    val keyCols = groupCols ++ Seq("band", "band_hash")
    val keys = keyCols.map(col)
    val spark = rows.sparkSession
    import spark.implicits._

    // A doc contributes at most ONE row per (band) bucket, so any upper
    // bound on the doc count bounds every bucket's size. When the caller
    // proves bucketSizeBound <= maxBucket, no bucket can be oversized and
    // the probe aggregation + collect below is a job spent learning an
    // empty set — skip it (arithmetic, not an estimate: the generator's cap
    // state machine still runs, it just never fires).
    val oversizedRows: Array[org.apache.spark.sql.Row] =
      if (bucketSizeBound <= maxBucket) Array.empty
      else {
        val oversizedDf = rows
          .groupBy(keys: _*)
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBucket)
          .select(keys: _*)
        oversizedDf.limit((OversizedBroadcastMax + 1).toInt).collect()
      }
    if (oversizedRows.length > OversizedBroadcastMax)
      return pairsFromBuckets(rows.drop("bhs"), keyCols, maxBucket)
    val nGroup = groupCols.length
    val oversized: Set[(String, Int, Long)] = oversizedRows.map { r =>
      val g = (0 until nGroup).map(i => String.valueOf(r.get(i))).mkString("\u0001")
      (g, r.getInt(nGroup), r.getLong(nGroup + 1))
    }.toSet
    val bOversized = spark.sparkContext.broadcast(oversized)

    val prepared = rows
      .select(keys ++ Seq(col("doc_id").cast("long").as("doc_id"), col("bhs")): _*)
      .repartition(keys: _*)
      .sortWithinPartitions(keys :+ col("doc_id"): _*)
    val docIdx = keyCols.length
    val bhsIdx = docIdx + 1
    val bandIdx = nGroup
    val cap = maxBucket
    prepared
      .mapPartitions { it =>
        val over = bOversized.value
        new Iterator[(Long, Long)] {
          private val ids = new ArrayBuffer[Long]()
          private val sigs = new ArrayBuffer[Array[Long]]()
          private val curKey = new Array[Any](keyCols.length)
          private var curGroup: String = null
          private var curBand: Int = 0
          private var haveKey = false
          private var chain = false
          private var pending: Iterator[(Long, Long)] = Iterator.empty

          private def sameKey(r: org.apache.spark.sql.Row): Boolean = {
            var i = 0
            while (i < curKey.length) {
              if (r.get(i) != curKey(i)) return false
              i += 1
            }
            true
          }

          /** Pair survives iff no band before `band` holds BOTH docs in a
            * small (pair-emitting) bucket. */
          private def firstCollisionAt(
              a: Array[Long], b: Array[Long], band: Int, group: String): Boolean = {
            var k = 0
            while (k < band) {
              if (a(k) == b(k) && !over.contains((group, k, a(k)))) return false
              k += 1
            }
            true
          }

          private def fullPairs(): Iterator[(Long, Long)] = {
            val n = ids.length
            if (n < 2) Iterator.empty
            else {
              // snapshot EVERYTHING the lazy iterator reads: the pending
              // iterator is consumed after advance() has already moved
              // curBand/curGroup to the NEXT bucket
              val myIds = ids.toArray
              val mySigs = sigs.toArray
              val myBand = curBand
              val myGroup = curGroup
              (0 until n - 1).iterator.flatMap { i =>
                (i + 1 until n).iterator
                  .filter(j => firstCollisionAt(mySigs(i), mySigs(j), myBand, myGroup))
                  .map(j => (myIds(i), myIds(j)))
              }
            }
          }

          /** Chain rows keep pairsFromBuckets semantics exactly: unfiltered,
            * <=ChainWidth forward neighbors, orientation fixed here (ids
            * ascend within a bucket, so earlier-buffered < current). */
          private def chainPairsFor(id: Long): Iterator[(Long, Long)] = {
            val from = math.max(0, ids.length - ChainWidth)
            ids.slice(from, ids.length).map(p => (p, id)).iterator
          }

          private def flushBucket(): Iterator[(Long, Long)] =
            if (!chain && ids.length > 1) fullPairs() else Iterator.empty

          private def advance(): Unit = {
            while (!pending.hasNext && it.hasNext) {
              val r = it.next()
              val id = r.getLong(docIdx)
              val bhs = r.getSeq[Long](bhsIdx).toArray
              if (!haveKey || !sameKey(r)) {
                pending = flushBucket()
                var i = 0
                while (i < curKey.length) { curKey(i) = r.get(i); i += 1 }
                curGroup = (0 until nGroup).map(i => String.valueOf(r.get(i))).mkString("\u0001")
                curBand = r.getInt(bandIdx)
                haveKey = true
                chain = false
                ids.clear(); sigs.clear()
                ids += id; sigs += bhs
              } else if (chain) {
                pending = chainPairsFor(id)
                ids += id
                if (ids.length > ChainWidth) ids.remove(0, ids.length - ChainWidth)
                sigs.clear() // chain mode never consults signatures
              } else {
                ids += id; sigs += bhs
                if (ids.length > cap) {
                  // bucket crossed the cap: chain-link the buffered prefix
                  // exactly like pairsFromBuckets (unfiltered)
                  chain = true
                  val snapshot = ids.toArray
                  pending = (0 until snapshot.length - 1).iterator.flatMap { i =>
                    (i + 1 until math.min(i + 1 + ChainWidth, snapshot.length)).iterator
                      .map(j => (snapshot(i), snapshot(j)))
                  }
                  ids.clear()
                  ids ++= snapshot.takeRight(ChainWidth)
                  sigs.clear()
                }
              }
            }
            if (!pending.hasNext && !it.hasNext && haveKey) {
              pending = flushBucket()
              haveKey = false
              ids.clear(); sigs.clear()
            }
          }

          def hasNext: Boolean = {
            if (!pending.hasNext) advance()
            pending.hasNext
          }
          def next(): (Long, Long) = {
            if (!hasNext) throw new NoSuchElementException
            pending.next()
          }
        }
      }
      .toDF("a", "b")
      // near-duplicate-free already; distinct removes chain/full overlaps
      // over ~1x the pair set instead of the raw band-collision volume
      .distinct()
  }
}
