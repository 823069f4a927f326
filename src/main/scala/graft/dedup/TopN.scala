package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's three top-N report modes over a verified pair table
  * (group, a, b, sim). All ties broken deterministically by ids so output is
  * stable run to run (the reference inherits heap insertion order instead —
  * we pin the orientation that sorts equal-sim pairs ascending by id).
  */
object TopN {

  /** Global top-N pairs per group, sim desc — the reference's per-year-file
    * bounded heap + final truncate (code/Stage05ComputeSimilarity.py:132-150,
    * 204-208). Spark plans the per-group window as a partial top-N per
    * partition; for a single global limit `orderBy(...).limit(n)` lowers to
    * TakeOrderedAndProject (the same distributed heap). */
  def globalPerGroup(pairs: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("group")).orderBy(desc("sim"), asc("a"), asc("b"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .drop("rank")
  }

  /** Top-N matches per probe doc with rank 1..N
    * (code/main_citation_control.py:626-642, default N=3 at :845). Pairs are
    * expanded symmetrically so every doc is a probe over its matches. */
  def perProbe(pairs: DataFrame, n: Int): DataFrame = {
    val sym = pairs
      .select(col("group"), col("a").as("probe"), col("b").as("matched"), col("sim"))
      .unionByName(pairs.select(col("group"), col("b").as("probe"), col("a").as("matched"), col("sim")))
    val w = Window.partitionBy(col("probe")).orderBy(desc("sim"), asc("matched"))
    sym
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("group"), col("probe"), col("matched"), col("rank"), col("sim"))
  }

  /** Symmetric closest-match report with a similarity floor
    * (code/main_closest.py:29-47, min_similarity default 0.05 at :366). */
  def closest(pairs: DataFrame, n: Int, minSimilarity: Double = 0.05): DataFrame =
    perProbe(pairs.filter(col("sim") >= minSimilarity), n)

  /** Case/control matching (code/main_closest.py:133-141): for each TARGET
    * (case) doc, rank its matches among NON-target (control) docs only —
    * target-target pairs are excluded on both orientations. `targets` is a
    * one-column (doc_id) table; broadcast-friendly when small (the usual
    * case: a study cohort vs the corpus).
    *
    * Pairs where neither side is a target never become probe rows, matching
    * the reference's per-line filter.
    */
  def caseControl(
      pairs: DataFrame,
      targets: DataFrame,
      n: Int,
      minSimilarity: Double = 0.05
  ): DataFrame =
    caseControlRanked(pairs, targets, n, minSimilarity, identity)

  /** The shared case/control body: symmetrize above the sim floor, keep
    * target probes (semi) against non-target controls (anti), apply the
    * caller's control filter, rank per probe by desc(sim) with asc(matched)
    * tie-break. Reference-parity semantics live HERE, once — the public
    * variants differ only in `controlFilter`. */
  private def caseControlRanked(
      pairs: DataFrame,
      targets: DataFrame,
      n: Int,
      minSimilarity: Double,
      controlFilter: DataFrame => DataFrame
  ): DataFrame = {
    val t = targets.select(col("doc_id")).distinct()
    val sym = pairs
      .filter(col("sim") >= minSimilarity)
      .select(col("group"), col("a").as("probe"), col("b").as("matched"), col("sim"))
      .unionByName(
        pairs
          .filter(col("sim") >= minSimilarity)
          .select(col("group"), col("b").as("probe"), col("a").as("matched"), col("sim"))
      )
    val cased = controlFilter(
      sym
        .join(t.select(col("doc_id").as("probe")), Seq("probe"), "left_semi")
        .join(t.select(col("doc_id").as("matched")), Seq("matched"), "left_anti")
    )
    val w = Window.partitionBy(col("probe")).orderBy(desc("sim"), asc("matched"))
    cased
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("group"), col("probe"), col("matched"), col("rank"), col("sim"))
  }

  /** [[caseControl]] with the reference's control SAMPLING step
    * (code/main_citation_sample.py:376-484: `random.sample` over the control
    * candidates BEFORE ranking, so ranks are computed within the sample).
    *
    * The sample is a seeded deterministic hash, not a driver RNG: control id
    * c is kept iff (SplitMix64(c ^ seed) >>> 1) % 100 < keepPct. A
    * driver-side random sample is neither reproducible under task retries
    * nor computable without collecting the control universe; hashing makes
    * the sample a pure function of (doc_id, seed) — identical on every
    * executor, every retry, and in the SQL oracle (the same SplitMix64 chain
    * the SimHash oracle already validates bit-for-bit). Statistically it is
    * a keepPct% Bernoulli sample, which is what random.sample approximates
    * at corpus scale. */
  def caseControlSampled(
      pairs: DataFrame,
      targets: DataFrame,
      n: Int,
      minSimilarity: Double = 0.05,
      keepPct: Int = 50,
      seed: Long = 7L
  ): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"keepPct must be in [0,100]: $keepPct")
    val s = seed
    val keepUdf = udf((id: Long) => ((SimHash.mix64(id ^ s) >>> 1) % 100) < keepPct)
    caseControlRanked(pairs, targets, n, minSimilarity, _.filter(keepUdf(col("matched"))))
  }

  /** Per-group corpus stats (code/main_closest.py:272-315), including the
    * reference's distinct-participant count (the "Patents" column,
    * code/main_closest.py:305-314): number of distinct docs appearing on
    * either side of a pair in the group. `keys` supports composite groups
    * (e.g. the reference's (year, patent_type)). */
  def groupStats(pairs: DataFrame, keys: Seq[String] = Seq("group")): DataFrame = {
    val kc = keys.map(col)
    val base = pairs
      .groupBy(kc: _*)
      .agg(
        count(lit(1)).as("n_pairs"),
        avg(col("sim")).as("avg_sim"),
        min(col("sim")).as("min_sim"),
        max(col("sim")).as("max_sim")
      )
    val sym = pairs
      .select(kc :+ col("a").as("doc"): _*)
      .unionByName(pairs.select(kc :+ col("b").as("doc"): _*))
    val participants = sym.groupBy(kc: _*).agg(countDistinct(col("doc")).as("n_docs"))
    base.join(participants, keys)
  }
}
