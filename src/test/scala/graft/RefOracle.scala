package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.dedup.Stopwords

/** In-memory transliteration of the reference semantics — the golden oracle
  * (SURVEY.md §5.1). Deliberately written in naive collection style,
  * independent of the Spark engine code paths it validates:
  *
  *  - tokenize/filter: code/Stage01PreprocessData.py:31, 78-98
  *  - vocabulary min-df prune: code/Stage01PreprocessData.py:106-152
  *    (threshold 2, code/main_script.py:57); emptied docs dropped (:202)
  *  - within-group all-pairs Jaccard over token sets, 6-dp HALF_EVEN
  *    (Python round), sim > 0, each unordered pair once oriented by corpus
  *    order: code/Stage05ComputeSimilarity.py:98-140
  *  - union-find clustering over pairs at a threshold (north_rule's cluster
  *    assignment check; cluster id = min member id)
  */
object RefOracle {

  final case class Doc(id: Long, group: String, content: String)
  final case class Pair(group: String, a: Long, b: Long, sim: Double)

  // (?U): CPython's \b is Unicode-aware — see Tokenize.TokenPattern
  private val tokenRe = java.util.regex.Pattern.compile("(?U)\\b[a-zA-Z0-9][-a-zA-Z0-9]*[a-zA-Z0-9]\\b")

  def tokenize(content: String, shingleK: Int = 1): Vector[String] = {
    val m = tokenRe.matcher(content.toLowerCase(java.util.Locale.ROOT))
    val buf = Vector.newBuilder[String]
    while (m.find()) {
      val t = m.group()
      val keep = t.length > 1 &&
        !Stopwords.english.contains(t) &&
        !t.forall(_.isDigit) &&
        !t.matches("[0-9]+(-[0-9]+)+$")
      if (keep) buf += t
    }
    val stream = buf.result()
    if (shingleK <= 1) stream
    else if (stream.length < shingleK) Vector.empty
    else stream.sliding(shingleK).map(_.mkString(" ")).toVector
  }

  def pythonRound6(d: Double): Double =
    new JBigDecimal(d).setScale(6, RoundingMode.HALF_EVEN).doubleValue()

  /** (docId -> pruned token set) after vocabulary min-df pruning. */
  def prunedSets(docs: Seq[Doc], shingleK: Int = 1, minDf: Int = 2): Map[Long, Set[String]] = {
    val sets = docs.map(d => d.id -> tokenize(d.content, shingleK).toSet).filter(_._2.nonEmpty)
    val df = scala.collection.mutable.Map.empty[String, Int]
    sets.foreach { case (_, s) => s.foreach(t => df(t) = df.getOrElse(t, 0) + 1) }
    val vocab = df.filter(_._2 >= minDf).keySet
    sets.map { case (id, s) => id -> s.intersect(vocab) }.filter(_._2.nonEmpty).toMap
  }

  /** Every within-group pair with sim > 0, ordered a < b (corpus order = id). */
  def allPairs(docs: Seq[Doc], shingleK: Int = 1, minDf: Int = 2): Seq[Pair] = {
    val sets = prunedSets(docs, shingleK, minDf)
    val byGroup = docs.filter(d => sets.contains(d.id)).groupBy(_.group)
    byGroup.toSeq.flatMap { case (g, ds) =>
      val sorted = ds.sortBy(_.id)
      for {
        i <- sorted.indices
        j <- (i + 1) until sorted.length
        sa = sets(sorted(i).id)
        sb = sets(sorted(j).id)
        inter = sa.intersect(sb).size
        if inter > 0
        sim = pythonRound6(inter.toDouble / (sa.size + sb.size - inter).toDouble)
        if sim > 0.0
      } yield Pair(g, sorted(i).id, sorted(j).id, sim)
    }
  }

  /** Union-find clusters over pairs with sim >= threshold; id -> min-id label
    * for every doc id in `universe` (singletons label themselves). */
  def clusters(universe: Seq[Long], pairs: Seq[Pair], threshold: Double): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(x: Long, y: Long): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
    }
    pairs.filter(_.sim >= threshold).foreach(p => union(p.a, p.b))
    universe.map(id => id -> find(id)).toMap
  }
}
