package graft

import graft.dedup._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point: run the near-duplicate pipeline over either the
  * deterministic synthetic corpus (`--gen N`) or a parquet table of
  * (repo, path, commit, lang, content) rows (`--input PATH`), checkpointing
  * every stage under `--work DIR`.
  *
  * Usage:
  *   graft.Main --gen 10000 --work /tmp/graft-work [--threshold 0.7]
  *              [--shingle-k 1] [--group-col lang] [--cpus 8]
  *              [--topn 3] [--substring true]
  *   graft.Main --input /data/files.parquet --work /data/graft-work
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args
      .sliding(2, 2)
      .collect { case Array(k, v) => k -> v }
      .toMap
    val cpus = opts.getOrElse("--cpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val work = opts.getOrElse("--work", "/tmp/graft-work")

    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-dedup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = Config(
      groupCols = opts.getOrElse("--group-col", "lang").split(',').toSeq,
      shingleK = opts.getOrElse("--shingle-k", "1").toInt,
      threshold = opts.getOrElse("--threshold", "0.7").toDouble,
      topN = opts.get("--topn").map(_.toInt),
      substringDedup = opts.get("--substring").exists(_.toBoolean)
    )

    val input = opts.get("--input") match {
      case Some(path) => spark.read.parquet(path)
      case None =>
        val n = opts.getOrElse("--gen", "1000").toLong
        CorpusGen.corpus(spark, n).toDF()
    }

    val t0 = System.nanoTime()
    val t = Pipeline.run(spark, input, cfg, work)
    val stages = Seq(
      "docs" -> t.docs,
      "vocab" -> t.vocab,
      "encoded" -> t.encoded,
      "signatures" -> t.signatures,
      "candidates" -> t.candidates,
      "pairs" -> t.pairs,
      "components" -> t.components
    ) ++ t.substring.map("substring" -> _) ++ t.topn.map("topn" -> _)
    stages.foreach { case (name, df) => println(f"$name%-12s ${df.count()}%10d rows") }
    val wall = (System.nanoTime() - t0) / 1e9
    val nDocs = t.docs.count()
    println(f"wall ${wall}%.1f s  throughput ${nDocs / wall}%.0f files/sec")

    println("\ntop pairs per group:")
    TopN.globalPerGroup(t.pairs, 3).orderBy(col("group"), desc("sim")).show(12, truncate = false)
    println("largest clusters:")
    t.components
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("cluster_id"))
      .show(5)
    spark.stop()
  }
}
