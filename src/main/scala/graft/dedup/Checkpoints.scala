package graft.dedup

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage checkpointing with metrics + lineage — the engine's resumability
  * subsystem (BASELINE.json north_rule: "resumable from checkpoint with
  * per-partition lineage + metrics").
  *
  * Reference precedent: stage-skip memoization via output-file existence
  * (code/main_script.py:39-41, 237-252) and anti-join resume against already
  * written output (code/main_citation_pair.py:232-246). Here each stage is an
  * atomic Parquet table (Iceberg-shaped layout: data files under partition
  * directories + a `_metrics` sidecar table + a `_lineage.json` manifest);
  * swapping the writer to an Iceberg catalog is a one-class change — the
  * runtime image ships no Iceberg jars (offline resolver), so plain
  * partitioned Parquet stands in.
  *
  * A stage is complete iff Parquet's `_SUCCESS` marker exists (the write is
  * atomic: task commit + job commit), so a killed run re-executes exactly the
  * incomplete stages and the final output is byte-identical — verified by the
  * resume test in the suite.
  */
object Checkpoints {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Run `build` unless `path` already holds a completed stage; always return
    * the checkpointed table. Writes row-count metrics per partition column
    * value (per-partition lineage) into `<path>_metrics`.
    */
  def stage(
      spark: SparkSession,
      name: String,
      path: String,
      partitionCols: Seq[String] = Nil,
      inputs: Seq[String] = Nil
  )(build: => DataFrame): DataFrame = {
    if (!exists(spark, path)) {
      val t0 = System.nanoTime()
      val df = build
      val writer = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .parquet(path)
      val wallMs = (System.nanoTime() - t0) / 1000000

      // Per-partition row counts straight from the parquet FOOTERS — a
      // driver-side metadata walk, no Spark job, no data re-scan. Partition
      // value = the hive-style directory components of each file's path.
      val counts = footerCounts(spark, path)
      import spark.implicits._
      counts.toSeq
        .map { case (part, rows) => (part, rows, name, wallMs) }
        .toDF("partition", "rows", "stage", "wall_ms")
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(path + "_metrics")

      val lineage =
        s"""{"stage":"${name}","path":"${path}","inputs":[${inputs.map(i => "\"" + i + "\"").mkString(",")}],"wall_ms":${wallMs}}"""
      val lp = new Path(path + "_lineage.json")
      val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(lp, true)
      try out.write(lineage.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
    spark.read.parquet(path)
  }

  /** (partition -> row count) from parquet file footers under `path`.
    * O(#files) driver-side metadata reads; "__table__" for unpartitioned. */
  def footerCounts(spark: SparkSession, path: String): Map[String, Long] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val acc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val rootStr = root.toUri.getPath
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath
      if (p.getName.endsWith(".parquet")) {
        val rel = p.getParent.toUri.getPath.stripPrefix(rootStr).stripPrefix("/")
        val part = if (rel.isEmpty) "__table__" else rel
        val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
          spark.sparkContext.hadoopConfiguration,
          p,
          org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER
        )
        acc(part) += footer.getBlocks.asScala.map(_.getRowCount).sum
      }
    }
    if (acc.isEmpty) Map("__table__" -> 0L) else acc.toMap
  }

  /** Anti-join resume for incrementally extended outputs (reference:
    * code/main_citation_pair.py:232-246): rows of `work` whose key is already
    * in the checkpoint are skipped. */
  def resumeAnti(work: DataFrame, checkpoint: DataFrame, keys: Seq[String]): DataFrame =
    work.join(checkpoint.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
