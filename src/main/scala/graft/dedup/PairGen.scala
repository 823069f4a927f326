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

  /** rows: bucket key columns + `doc_id`. Returns distinct (a, b), a < b. */
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
}
