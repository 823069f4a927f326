package graft

import graft.dedup.{CorpusGen, SuffixDedup}
import org.apache.spark.sql.functions._

class SuffixDedupSpec extends SparkSpec {
  import SuffixDedup._

  test("lcsLen equals naive longest common substring") {
    val rnd = new scala.util.Random(99)
    def naive(a: String, b: String): Int = {
      var best = 0
      for (i <- a.indices; j <- b.indices) {
        var l = 0
        while (i + l < a.length && j + l < b.length && a(i + l) == b(j + l)) l += 1
        if (l > best) best = l
      }
      best
    }
    (0 until 30).foreach { _ =>
      val a = Array.fill(5 + rnd.nextInt(60))(('a' + rnd.nextInt(4)).toChar).mkString
      val b = Array.fill(5 + rnd.nextInt(60))(('a' + rnd.nextInt(4)).toChar).mkString
      assert(lcsLen(a, b) == naive(a, b), s"a=$a b=$b")
    }
    assert(lcsLen("", "abc") == 0)
    assert(lcsLen("abc", "xabcy") == 3)
  }

  test("winnowing guarantee: shared substring >= k+window-1 shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    val shared = Array.fill(200)(('a' + rnd.nextInt(26)).toChar).mkString
    (0 until 10).foreach { _ =>
      val a = Array.fill(300)(('a' + rnd.nextInt(26)).toChar).mkString + shared
      val b = shared + Array.fill(300)(('a' + rnd.nextInt(26)).toChar).mkString
      val fa = fingerprints(a, 64, 33).toSet
      val fb = fingerprints(b, 64, 33).toSet
      assert(fa.intersect(fb).nonEmpty, "winnowing guarantee violated")
    }
  }

  test("fingerprints are deterministic and sparse") {
    val s = "x" * 50 + CorpusGen.corpusLocal(3).map(_.content).mkString(" ")
    val f1 = fingerprints(s, 64, 33)
    val f2 = fingerprints(s, 64, 33)
    assert(f1.sameElements(f2))
    // density ~2/window of gram count
    assert(f1.length < s.length / 8)
  }

  test("finds planted substring clones that Jaccard misses") {
    val files = CorpusGen.corpusLocal(500)
    val docs = spark
      .createDataFrame(files.zipWithIndex.map { case (f, i) => (i.toLong, f.lang, f.content) })
      .toDF("doc_id", "group", "content")
    val found = SuffixDedup
      .run(docs)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(4))
      .toMap

    // planted: i % 50 == 7 embeds base (i - 7 % 10 => i-7? base = i - i%10) content
    val planted = files.zipWithIndex.collect {
      case (_, i) if i % 50 == 7 && i >= 10 => ((i - i % 10).toLong, i.toLong)
    }
    assert(planted.nonEmpty)
    planted.foreach { case (base, clone) =>
      val c = found.get((base, clone)).orElse(found.get((clone, base)))
      assert(c.isDefined, s"substring clone ($base,$clone) not found")
      // the clone embeds the base BODY; when the base additionally carries
      // the license header its own length exceeds the shared span, so the
      // containment floor is conservative
      assert(c.get > 0.3, s"containment ${c.get} too low for ($base,$clone)")
    }
  }
}
