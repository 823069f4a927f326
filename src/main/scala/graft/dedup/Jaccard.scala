package graft.dedup

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-Jaccard verification kernel.
  *
  * Semantics from the reference inner loop
  * (code/Stage05ComputeSimilarity.py:113-140):
  *   sim = |A n B| / (|A| + |B| - |A n B|), rounded to 6 decimals with
  *   Python `round` (banker's / HALF_EVEN on the exact binary double),
  *   pairs kept only when sim > 0.
  *
  * `new BigDecimal(double)` (exact binary expansion, NOT `valueOf`) +
  * HALF_EVEN reproduces CPython's `round(float, 6)` bit-for-bit; Spark's
  * built-in `round()` is HALF_UP and must not be used on this path.
  *
  * The intersection is a two-pointer merge over the sorted int arrays —
  * O(|A|+|B|), allocation-free — replacing the reference's O(|A|*|B|)
  * membership loop (code/Stage05ComputeSimilarity.py:119-122).
  */
object Jaccard {

  def intersectSorted(a: Array[Int], b: Array[Int]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  def round6(d: Double): Double =
    new JBigDecimal(d).setScale(6, RoundingMode.HALF_EVEN).doubleValue()

  def jaccard6(a: Array[Int], b: Array[Int]): Double = {
    val inter = intersectSorted(a, b)
    if (inter == 0) 0.0
    else round6(inter.toDouble / (a.length + b.length - inter).toDouble)
  }

  /** Verify candidate pairs against exact Jaccard.
    *
    * @param candidates (a: long, b: long) with a < b
    * @param encoded    (doc_id, group, tokens: array<int>)
    * @param minSim     keep pairs with sim >= minSim (and always sim > 0)
    * @return (group, a, b, sim) — reference layout
    *         (code/Stage05ComputeSimilarity.py:211-221)
    */
  def verify(candidates: DataFrame, encoded: DataFrame, minSim: Double): DataFrame = {
    val docsA = encoded.select(col("doc_id").as("a"), col("group"), col("tokens").as("tokens_a"))
    val docsB = encoded.select(col("doc_id").as("b"), col("tokens").as("tokens_b"))
    // single predicate: `sim >= max(minSim, minPositive)` subsumes the
    // reference's `sim > 0` (code/Stage05ComputeSimilarity.py:132) — Catalyst
    // substitutes the kernel into every predicate conjunct it pushes into the
    // join, so one conjunct = one fewer kernel evaluation per candidate row
    val floor = math.max(minSim, java.lang.Double.MIN_VALUE)
    candidates
      // shuffle-hash build on the skinny (a,b) pair side: an SMJ here would
      // sort the wide token-array table. The SECOND join stays SMJ on
      // purpose: its only possible build sides both carry token arrays, and
      // an UnsafeHashedRelation build does not spill — at N tasks each gets
      // 1/N of the executor pool and a fat build OOMs exactly when the
      // machine is busiest (observed at the 2.5M-file local[8] leg).
      .hint("shuffle_hash")
      .join(docsA, "a")
      .join(docsB, "b")
      // codegen'd Catalyst expression (no UDF boxing) — see JaccardExpression
      .withColumn("sim", JaccardSorted(col("tokens_a"), col("tokens_b")))
      .filter(col("sim") >= floor)
      .select(col("group"), col("a"), col("b"), col("sim"))
  }

  def hamming(x: Column, y: Column): Column = bit_count(x.bitwiseXOR(y))

  /** Oracle-facing verification: like [[verify]] but emits the raw integer
    * counts and the UNROUNDED quotient, so an ANSI-SQL oracle can reproduce
    * every emitted value bit-for-bit (the 6-dp HALF_EVEN rounding of the
    * reference pipeline is deliberately not SQL-portable — DuckDB rounds
    * half away from zero). Columns: (group, a, b, inter_cnt, union_cnt, sim).
    */
  def verifyCounts(candidates: DataFrame, encoded: DataFrame, minSim: Double): DataFrame = {
    val docsA = encoded.select(col("doc_id").as("a"), col("group"), col("tokens").as("tokens_a"))
    val docsB = encoded.select(col("doc_id").as("b"), col("tokens").as("tokens_b"))
    candidates
      // first join SHJ (skinny pair build), second SMJ — see verify()
      .hint("shuffle_hash")
      .join(docsA, "a")
      .join(docsB, "b")
      // codegen'd Catalyst expression, no per-element boxing (JaccardExpression)
      .withColumn("inter_cnt", IntersectCountSorted(col("tokens_a"), col("tokens_b")).cast("long"))
      .withColumn(
        "union_cnt",
        (size(col("tokens_a")) + size(col("tokens_b"))).cast("long") - col("inter_cnt")
      )
      .withColumn("sim", col("inter_cnt").cast("double") / col("union_cnt"))
      .filter(col("sim") >= minSim)
      .select(col("group"), col("a"), col("b"), col("inter_cnt"), col("union_cnt"), col("sim"))
  }
}
