package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Delimited-text sources with the reference's header handling.
  *
  * The reference sniffs whether a file's first row names the expected
  * columns and otherwise treats the columns positionally
  * (code/main_citation_pair.py:52-56, code/main_citation_sample.py:149-165).
  * Spark's CSV reader only offers a static `header` flag, so this reader
  * reads ONE line to decide (O(1) driver work regardless of file size), then
  * hands the full scan to the distributed CSV source.
  */
object Sources {

  /** True iff the file's first line names every expected column
    * (case-insensitive, order-free — the reference matches by name). */
  def sniffHeader(
      spark: SparkSession,
      path: String,
      expectedCols: Seq[String],
      sep: String
  ): Boolean = {
    val first = spark.read
      .text(path)
      .limit(1)
      .collect()
      .headOption
      .map(_.getString(0))
      .getOrElse("")
    val tokens = first.split(java.util.regex.Pattern.quote(sep)).map(_.trim.toLowerCase).toSet
    expectedCols.nonEmpty && expectedCols.forall(c => tokens.contains(c.toLowerCase))
  }

  /** Read a delimited path as `expectedCols`:
    *  - header present: columns selected BY NAME (any order, extras dropped);
    *  - header absent: the first `expectedCols.length` columns POSITIONALLY.
    *
    * Directories and globs are expanded and each file is sniffed
    * INDEPENDENTLY, matching the reference's per-file decision
    * (code/main_citation_sample.py:149-165) — `spark.read.text(dir).limit(1)`
    * has no defined "first file", and one file's header must not strip the
    * first data row of another (ADVICE_r02). The per-file scan fan-out is the
    * reference's own semantics; homogeneous big inputs should be read with
    * `spark.read.csv` directly.
    */
  def readDelimited(
      spark: SparkSession,
      path: String,
      expectedCols: Seq[String],
      sep: String = ","
  ): DataFrame = {
    val files = expand(spark, path)
    if (files.lengthCompare(1) <= 0) readOne(spark, files.headOption.getOrElse(path), expectedCols, sep)
    else files.map(f => readOne(spark, f, expectedCols, sep)).reduce(_.unionByName(_))
  }

  /** Expand a file / directory / glob into its data files (sorted, hidden
    * `_`/`.` files skipped). A plain file returns itself. */
  private def expand(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    matched
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile).map(_.getPath)
        else Seq(st.getPath)
      }
      .filterNot(q => q.getName.startsWith("_") || q.getName.startsWith("."))
      .map(_.toString)
      .sorted
  }

  private def readOne(
      spark: SparkSession,
      path: String,
      expectedCols: Seq[String],
      sep: String
  ): DataFrame = {
    val hasHeader = sniffHeader(spark, path, expectedCols, sep)
    val base = spark.read
      .option("sep", sep)
      .option("header", hasHeader.toString)
      .csv(path)
    if (hasHeader) base.select(expectedCols.map(col): _*)
    else {
      require(
        base.columns.length >= expectedCols.length,
        s"positional read needs >= ${expectedCols.length} columns, file has ${base.columns.length}"
      )
      base
        .select(base.columns.take(expectedCols.length).toIndexedSeq.map(col): _*)
        .toDF(expectedCols: _*)
    }
  }
}
