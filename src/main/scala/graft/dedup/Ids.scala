package graft.dedup

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic dense Long id assignment at cluster scale.
  *
  * The reference assigns ids by line position in a single file
  * (code/Stage02CodifyIdxPatents.py:61-85) — inherently single-node. The
  * Spark-native equivalent must avoid both `monotonically_increasing_id`
  * (nondeterministic under retries / partition changes) and a global
  * single-partition `row_number()` window (all rows through one task).
  *
  * Two paths, one contract (ids = dense rank over the distinct sort-key
  * tuples, in key order — a pure function of the input's key set):
  *
  *  - [[assignDense]]: direct two-pass stamp for SKINNY inputs whose keys
  *    are already unique (vocabulary rows, element-df tables). One range
  *    shuffle; the input is persisted so the sampling pass does not re-run
  *    an expensive upstream lineage.
  *  - [[assignDenseByKey]]: for WIDE payload rows (the corpus). The payload
  *    never enters the id machinery — only the key projection flows through
  *    the stamp; the payload pays exactly one hash shuffle (the id join).
  *    The round-3 version persisted the full corpus TWICE inside the docs
  *    stage and its 2.97x core-scaling showed it.
  */
object Ids {

  // Cache lifetime is CALLER-owned via the CacheRegistry parameter: the
  // persisted scaffolding pins the sampled range partitioning that both the
  // count job and the (lazy) stamp job must share — a JVM-global release
  // hook could fire between them from an unrelated caller and silently
  // re-sample the boundaries (duplicated/skipped ids). Callers release their
  // registry only after the consuming plan is materialized.

  /** Direct stamp: `df`'s rows must be UNIQUE by `sortCols` (vocabulary
    * aggregates and similar skinny tables are, by construction). Payload
    * columns ride along through the range shuffle. */
  def assignDense(
      df: DataFrame,
      sortCols: Seq[String],
      idCol: String,
      reg: CacheRegistry = CacheRegistry.unmanaged
  ): DataFrame =
    assignDenseWithCount(df, sortCols, idCol, reg)._1

  /** [[assignDense]] plus the input's exact row count — free: the stamp's
    * per-partition count pass already totals it, so callers that need the
    * cardinality (e.g. the encode-plan choice) skip a separate count job. */
  def assignDenseWithCount(
      df: DataFrame,
      sortCols: Seq[String],
      idCol: String,
      reg: CacheRegistry = CacheRegistry.unmanaged
  ): (DataFrame, Long) = {
    // the sampling pass of repartitionByRange re-executes the input lineage;
    // persist so an upstream aggregate is computed once
    val input = reg.persist(df)
    stampDense(input, sortCols, idCol, reg)
  }

  /** Id assignment for wide rows: stamp the distinct key projection, join
    * ids back (null-safe, shuffle-hash on the skinny build side). With
    * `dropDuplicateKeys`, rows sharing a key tuple collapse to one
    * arbitrary row — detected on the SKINNY side and resolved with a fat
    * aggregate only when duplicates actually exist, so the common
    * unique-key corpus never pays a payload sort. */
  def assignDenseByKey(
      df: DataFrame,
      sortCols: Seq[String],
      idCol: String,
      dropDuplicateKeys: Boolean = false,
      reg: CacheRegistry = CacheRegistry.unmanaged
  ): DataFrame = {
    // The payload's ONE shuffle hash-partitions on the FIRST key only
    // (repo, for the corpus). A subset of the join/agg keys satisfies their
    // clustering requirement (equal full keys share the prefix), so the
    // downstream key-count aggregate, the optional dedup, and the id join
    // all reuse this exchange — and the output keeps same-prefix rows in
    // one partition, which is what lets parquet dictionary-encode the
    // token arrays (hash-on-full-key scattered every repo across every
    // file and wrote a 60% larger docs table). Prefix skew (a mega-repo)
    // is AQE's skew-join case, and the skew splits preserve adjacency.
    val base = reg.persist(
      df.repartition(col(sortCols.head))
    )
    val keyCnt = base.groupBy(sortCols.map(col): _*).agg(count(lit(1)).as("__cnt"))
    val keyIds = stampDense(keyCnt, sortCols, idCol, reg)._1
    val hasDups = dropDuplicateKeys &&
      keyIds.filter(col("__cnt") > 1).limit(1).count() > 0
    val deduped = if (hasDups) base.dropDuplicates(sortCols) else base
    val right = keyIds
      .select(sortCols.map(c => col(c).as(s"__k_$c")) :+ col(idCol): _*)
      .repartition(col(s"__k_${sortCols.head}"))
      // build-side hint: the ids table is the small side; without it a
      // sort-merge join would re-sort the wide payload
      .hint("shuffle_hash")
    // null-safe join keys: a null key tuple is still a (single) valid key,
    // and plain `=` would silently drop those rows
    val cond = sortCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    deduped
      .join(right, cond)
      .select(df.columns.map(col) :+ col(idCol): _*)
  }

  /** Two-pass dense stamp over rows unique by `sortCols`: range-partition +
    * sort (one shuffle), count rows per partition (narrow job over the
    * cached sorted copy), fold counts into start offsets on the driver
    * (O(#partitions) state), stamp offset + local index (second narrow
    * job). The persist pins the partitioning both jobs must share.
    *
    * The partition id is MATERIALIZED INTO THE CACHED ROWS
    * (spark_partition_id() at cache-build time), not read from TaskContext
    * at stamp time: TaskContext.getPartitionId() returns the TASK's
    * partition id, and a downstream no-shuffle coalesce() fuses many parent
    * partitions into one task — every parent would then read the same
    * (coalesced) id and restart from the same offset, silently DUPLICATING
    * ids. A fused coalesce still invokes the stamp function once per parent
    * split with that split's rows, so reading the stored pid from the rows
    * is correct under any downstream plan (the bug was latent here only
    * because every current caller shuffles a stamped output before any
    * sink; ShardPack hit it for real under the driver's coalesce(1)). */
  private def stampDense(
      input: DataFrame,
      sortCols: Seq[String],
      idCol: String,
      reg: CacheRegistry
  ): (DataFrame, Long) = {
    val cols = sortCols.map(col)
    val sorted = reg.persist(
      input
        .repartitionByRange(cols: _*)
        .sortWithinPartitions(cols: _*)
        .withColumn("__pid", spark_partition_id())
    )
    val pidIdx = sorted.schema.fieldIndex("__pid")

    // per-partition counts over the CACHED sorted copy. Dataset.mapPartitions,
    // not queryExecution.toRdd: a Dataset action plans through the cache
    // manager and scans the InMemoryRelation, while toRdd on a fresh
    // QueryExecution re-executed the whole upstream lineage — profiled as a
    // +70% vocab-stage wall in the round-4 bench before this fix.
    import org.apache.spark.sql.Encoders.{scalaInt, scalaLong, tuple}
    val counts: Array[(Int, Long)] = sorted
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          var n = 0L
          var pid = -1
          while (it.hasNext) { pid = it.next().getInt(pidIdx); n += 1 }
          Iterator.single((pid, n))
        }
      }(tuple(scalaInt, scalaLong))
      .collect()
      .sortBy(_._1)

    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }.toMap
    }
    val bOffsets = input.sparkSession.sparkContext.broadcast(offsets)

    val outSchema = StructType(
      sorted.schema.fields.filterNot(_.name == "__pid") :+
        StructField(idCol, LongType, nullable = false)
    )
    val stamped = sorted.mapPartitions { it =>
      var next = -1L
      it.map { r =>
        if (next < 0) next = bOffsets.value.getOrElse(r.getInt(pidIdx), 0L)
        val out = Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) :+ next)
        next += 1
        out
      }
    }(Encoders.row(outSchema))
    (stamped, counts.foldLeft(0L)(_ + _._2))
  }
}
