package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation survivorship operators for a VERSIONED code-file table
  * — the `(repo, path, commit, lang, content)` input shape. The reference
  * pipeline has no equivalent (its corpus is one immutable snapshot of
  * patents); these are the two collapse steps a 10^12-file repository crawl
  * needs BEFORE near-dup detection:
  *
  *  1. [[latestVersion]] — a crawl holds every commit's version of every
  *     file; near-dup detection run on the raw table would spend most of its
  *     candidate budget "discovering" that v1..vN of the same path are
  *     similar. Collapse to the newest version per (repo, path) first.
  *  2. [[vendoredFlags]] — files byte-identical across many DISTINCT repos
  *     (licenses, vendored dependencies, generated lockfiles) are
  *     boilerplate, not signal: they form the mega exact-dup classes that
  *     dominate hot LSH buckets and add no training value. Flag content
  *     whose identical bytes appear in >= minRepos repos.
  *
  * Scale notes: latestVersion is one window over (repo, path) — partition
  * cardinality is the file-path universe, group size the per-file version
  * count (bounded by commit history, no mega-groups). vendoredFlags avoids
  * `countDistinct` skew on mega dup classes (one content hash shared by
  * 100k+ copies) by pre-collapsing to DISTINCT (hash, repo) pairs — a
  * map-side-combined exact aggregate whose per-hash row count is bounded by
  * the repo universe, not the copy count — then broadcast-joins the skinny
  * per-hash repo counts back to the rows.
  */
object CorpusPrep {

  /** Keep the newest version of each (repoCol, pathCol) file: `keep` = row
    * with the greatest `orderCol` (ties to the SMALLEST doc id via
    * `tieCol` asc). Input rows pass through with `keep: Boolean` appended —
    * callers filter or route on it (the pipeline keeps the flag so dropped
    * versions stay lineage-addressable, same policy as
    * [[graft.dedup.Components.representatives]]). */
  def latestVersion(
      df: DataFrame,
      repoCol: String,
      pathCol: String,
      orderCol: String,
      tieCol: String
  ): DataFrame = {
    val w = Window.partitionBy(repoCol, pathCol).orderBy(col(orderCol).desc, col(tieCol).asc)
    df.withColumn("keep", row_number().over(w) === 1)
  }

  /** Flag vendored/boilerplate content: rows whose EXACT content (md5 of
    * `contentCol`) occurs in at least `minRepos` distinct `repoCol` values.
    * Output: input columns + `n_repos: Long` + `vendored: Boolean`.
    * NULL-content rows pass through (n_repos=0, vendored=false) — md5(NULL)
    * is NULL and never joins, so an inner join would silently drop them. */
  def vendoredFlags(
      df: DataFrame,
      contentCol: String,
      repoCol: String,
      minRepos: Long
  ): DataFrame = {
    require(minRepos >= 1, s"minRepos must be >= 1, got $minRepos")
    val hashed = df.withColumn("__h", md5(col(contentCol)))
    // distinct-first keeps the per-hash fan-in at |repos|, not |copies|:
    // the groupBy sees one row per (hash, repo), so a 100k-copy license
    // file costs the same as a 2-copy one past the map-side combine.
    val counts = hashed
      .select(col("__h"), col(repoCol))
      .distinct()
      .groupBy("__h")
      .agg(count(lit(1)).as("n_repos"))
    hashed
      .join(counts, Seq("__h"), "left")
      .withColumn("n_repos", coalesce(col("n_repos"), lit(0L)))
      .withColumn("vendored", col("n_repos") >= minRepos)
      .drop("__h")
  }
}
