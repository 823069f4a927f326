package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact all-pairs similarity — the reference's own candidate semantics
  * (every within-group pair sharing >= 1 token, code/
  * Stage05ComputeSimilarity.py:98-140) expressed as a PPJoin-style token
  * equi-join instead of the reference's in-memory inverted index + O(n)
  * position scan (its known inefficiency, SURVEY.md §4).
  *
  * The token self-join IS the inverted index: exploding (doc, token) and
  * equi-joining on (group, token) materializes exactly the posting-list
  * cross products; `a < b` keeps each unordered pair once (the Spark shape
  * of the reference's position-order triangular dedup,
  * code/Stage05ComputeSimilarity.py:108-111); the pair-count aggregation is
  * the intersection size, so sim needs no second pass over the arrays.
  *
  * This is the oracle/parity path — exact but O(sum over tokens of df^2);
  * at corpus scale the MinHash+LSH path replaces it.
  */
object ExactPairs {

  /** encoded: (doc_id, group, tokens array<int>, n_tokens).
    * Returns (group, a, b, sim) for every within-group pair with sim > 0,
    * 6-dp HALF_EVEN, a < b.
    */
  def allPairs(encoded: DataFrame, minSim: Double = 0.0): DataFrame = {
    val toks = encoded.select(
      col("group"),
      col("doc_id"),
      col("n_tokens"),
      explode(col("tokens")).as("tok")
    )
    val left = toks.select(col("group"), col("tok"), col("doc_id").as("a"), col("n_tokens").as("na"))
    val right = toks.select(col("group"), col("tok"), col("doc_id").as("b"), col("n_tokens").as("nb"))
    // The rounding DELIBERATELY stays a (boxed) UDF: Spark's codegen'd
    // bround(_, 6) is HALF_EVEN over the double's SHORTEST-DECIMAL reading
    // (BigDecimal.valueOf), while the reference's CPython round() — which
    // Jaccard.round6 reproduces via the exact-binary BigDecimal constructor —
    // rounds the double's TRUE value. They disagree on decimal-exact,
    // binary-INexact ties: round(1/640, 6) is 0.001563 in CPython (the
    // nearest double sits just above the .0015625 tie) but 0.001562 under
    // bround (shortest repr "0.0015625" reads as an exact tie -> even).
    // KernelSpec pins this divergence; this is the reference-parity path,
    // so CPython semantics win over codegen.
    val round6 = udf((d: Double) => Jaccard.round6(d))
    left
      .join(right, Seq("group", "tok"))
      .filter(col("a") < col("b"))
      .groupBy("group", "a", "b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn(
        "sim",
        round6(col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      )
      .filter(col("sim") > 0.0 && col("sim") >= minSim)
      .select(col("group"), col("a"), col("b"), col("sim"))
  }
}
