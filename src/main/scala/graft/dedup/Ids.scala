package graft.dedup

import org.apache.spark.TaskContext
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
  * Strategy (the classic two-pass dense-rank):
  *  1. range-repartition + sort within partitions on the sort keys — one
  *     real shuffle, scales to any row count;
  *  2. one narrow mapPartitions job counts (distinct) rows per partition; the
  *     driver folds counts into per-partition start offsets (O(#partitions)
  *     driver state, no extra shuffle);
  *  3. a second narrow pass stamps offset + local index — and, when
  *     `dropDuplicateKeys` is set, skips rows whose key repeats the previous
  *     row's (equal keys are adjacent after the sort and can never span a
  *     range-partition boundary), folding `dropDuplicates` into the same
  *     shuffle for free.
  *
  * Deterministic as long as the sort keys identify rows uniquely: range
  * boundaries only move rows between partitions, never change the global
  * sorted order, so ids are a pure function of the input rows.
  */
object Ids {

  def assignDense(
      df: DataFrame,
      sortCols: Seq[String],
      idCol: String,
      dropDuplicateKeys: Boolean = false
  ): DataFrame = {
    val cols = sortCols.map(col)
    // repartitionByRange runs a separate SAMPLING job before the shuffle —
    // without caching the input, the whole upstream lineage executes twice
    val input = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persist: the count job and the stamping job MUST see the same physical
    // partitioning — without it each action re-samples range boundaries and
    // the per-partition offsets would not line up.
    val sorted = input
      .repartitionByRange(cols: _*)
      .sortWithinPartitions(cols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val keyIdx = sortCols.map(sorted.schema.fieldIndex)
    def keyOf(r: Row): Seq[Any] = keyIdx.map(r.get)

    import org.apache.spark.sql.Encoders.{scalaInt, scalaLong, tuple}
    val counts: Array[(Int, Long)] = sorted
      .mapPartitions { it =>
        var n = 0L
        var prev: Seq[Any] = null
        it.foreach { r =>
          val k = keyOf(r)
          if (!dropDuplicateKeys || prev == null || k != prev) n += 1
          prev = k
        }
        Iterator.single((TaskContext.getPartitionId(), n))
      }(tuple(scalaInt, scalaLong))
      .collect()
      .sortBy(_._1)

    input.unpersist() // sorted copy is materialized; upstream no longer needed

    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }.toMap
    }
    val bOffsets = df.sparkSession.sparkContext.broadcast(offsets)

    val outSchema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val start = bOffsets.value.getOrElse(pid, 0L)
      var i = -1L
      var prev: Seq[Any] = null
      it.flatMap { r =>
        val k = keyOf(r)
        val dup = dropDuplicateKeys && prev != null && k == prev
        prev = k
        if (dup) None
        else {
          i += 1
          Some(Row.fromSeq(r.toSeq :+ (start + i)))
        }
      }
    }(Encoders.row(outSchema))
  }
}
