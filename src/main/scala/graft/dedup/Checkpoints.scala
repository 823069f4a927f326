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

  // Sidecar (metrics + lineage) writes run OFF the critical path: the next
  // stage's jobs start while the sidecar count job runs concurrently (Spark
  // schedules jobs from multiple threads). Pipeline.run awaits all pending
  // sidecars before returning, so readers of a returned Tables always see
  // complete sidecars. Without this, 7 stages x (count job + tiny write)
  // serialize into the run's fixed cost — the kind of constant that caps
  // scaling efficiency.
  private val pendingSidecars =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.Future[_]]()
  private lazy val sidecarPool = java.util.concurrent.Executors.newFixedThreadPool(
    2,
    (r: Runnable) => { val t = new Thread(r, "graft-sidecar"); t.setDaemon(true); t }
  )

  /** Block until `path`'s sidecar is written (no-op if none pending). */
  def awaitSidecar(path: String): Unit = {
    val f = pendingSidecars.remove(path)
    if (f != null) f.get()
  }

  /** Block until every pending sidecar is written. */
  def awaitAllSidecars(): Unit = {
    val it = pendingSidecars.keys()
    while (it.hasMoreElements) awaitSidecar(it.nextElement())
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
      // zstd (not snappy), DEFAULT dictionary budget: token-array columns
      // overflow parquet's 1MB dictionary page and fall back to PLAIN, and
      // zstd recovers that redundancy at codec level. Raising the dictionary
      // cap instead was measured SLOWER end-to-end (64MB write-side
      // dictionaries cost more than PLAIN+zstd saves — official-methodology
      // legs regressed ~8-12%), so the fallback is the intended plan.
      val writer = df.write.mode("overwrite").option("compression", "zstd")
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .parquet(path)
      val wallMs = (System.nanoTime() - t0) / 1000000
      pendingSidecars.put(
        path,
        sidecarPool.submit(new Runnable {
          def run(): Unit = writeSidecars(spark, name, path, partitionCols, inputs, wallMs)
        })
      )
    } else {
      // drain any still-in-flight async sidecar for this path FIRST: a second
      // stage() call over the same dir in one JVM would otherwise race the
      // pending write and could heal-over a half-written _metrics dir
      awaitSidecar(path)
      if (!exists(spark, path + "_metrics")) {
        // heal a run killed between data commit and sidecar write: the stage
        // itself is complete (atomic _SUCCESS), only the sidecar is missing
        writeSidecars(spark, name, path, partitionCols, inputs, wallMs = 0L)
      }
    }
    spark.read.parquet(path)
  }

  /** Metrics (per-partition rows) + lineage manifest for a committed stage.
    *
    * Row counts come from a DISTRIBUTED count(*) over the written table: the
    * scan reads zero data columns (partition values come from directory
    * names, counts from parquet footers), so it is metadata-cheap AND
    * parallel across files — unlike a driver-side footer walk, whose
    * O(#files) serial time is a fixed cost that breaks scaling efficiency
    * and would take hours at 10^9 files.
    */
  private def writeSidecars(
      spark: SparkSession,
      name: String,
      path: String,
      partitionCols: Seq[String],
      inputs: Seq[String],
      wallMs: Long
  ): Unit = {
    val written = spark.read.parquet(path)
    val counts =
      if (partitionCols.nonEmpty)
        written
          .groupBy(partitionCols.map(col): _*)
          .agg(count(lit(1)).as("rows"))
          .withColumn(
            "partition",
            concat_ws(
              "/",
              partitionCols.map(c => concat(lit(c + "="), col(c).cast("string"))): _*
            )
          )
      else written.agg(count(lit(1)).as("rows")).withColumn("partition", lit("__table__"))
    counts
      .select(
        col("partition"),
        col("rows"),
        lit(name).as("stage"),
        lit(wallMs).as("wall_ms")
      )
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(path + "_metrics")

    val lineage =
      s"""{"stage":${JsonText.quote(name)},"path":${JsonText.quote(path)},"inputs":[${inputs.map(JsonText.quote).mkString(",")}],"wall_ms":${wallMs}}"""
    val lp = new Path(path + "_lineage.json")
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lp, true)
    try out.write(lineage.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Total row count of a completed stage from its `_metrics` sidecar —
    * O(1) driver work (the sidecar is one tiny file written at stage-commit
    * time), replacing per-use footer walks. */
  def stageRowCount(spark: SparkSession, path: String): Long = {
    awaitSidecar(path)
    spark.read
      .parquet(path + "_metrics")
      .agg(coalesce(sum(col("rows")), lit(0L)))
      .head()
      .getLong(0)
  }

  /** (partition -> row count) from parquet file footers under `path`.
    * O(#files) driver-side metadata reads; "__table__" for unpartitioned.
    * Test/debug utility only — the engine's hot path uses the `_metrics`
    * sidecar ([[stageRowCount]]) written distributed at stage-commit time. */
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

/** Minimal JSON string quoting for the hand-authored manifests (lineage,
  * oracle dump): backslash, quote, and ALL control chars (<0x20) — a quote
  * or tab in a workDir path or builder-authored SQL would otherwise emit
  * invalid JSON that fails a reader's json.load. */
object JsonText {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
