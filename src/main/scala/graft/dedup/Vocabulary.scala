package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary build + dictionary encoding.
  *
  * Reference: document-frequency count over per-doc-deduped tokens
  * (code/Stage01PreprocessData.py:118-130), min-df prune at threshold 2
  * (code/Stage01PreprocessData.py:139-152, value from code/main_script.py:57),
  * then re-encoding of every doc through the dictionary
  * (code/Stage03IndexPatents.py:40-48). Docs emptied by pruning are dropped
  * (code/Stage01PreprocessData.py:202).
  *
  * Scale addition (no reference equivalent): max-df cap — tokens present in
  * more than `maxDf` fraction of docs (default 0.2, see [[Config]]) are
  * boilerplate (license headers, ubiquitous keywords) that both blow up the
  * candidate join and carry no discriminating signal. The cap applies to
  * SIGNATURES only — verification keeps full sets, so reference parity of
  * emitted sims is unaffected (asserted by the parity suite at recall 0.99).
  */
object Vocabulary {

  /** docs: (doc_id, group, tokens: array<string>) with tokens distinct.
    * Returns (token: string, df: long, token_id: long) with dense determin-
    * istic ids ordered by token — a pure hash aggregate + one ranged shuffle.
    *
    * NOTE: only the reference's min-df prune happens here; the max-df
    * boilerplate cap applies to SIGNATURES only (see [[hotTokenIds]]) so the
    * verification sets keep full reference semantics.
    */
  def build(docs: DataFrame, cfg: Config): DataFrame = {
    val df = docs
      .select(explode(col("tokens")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= cfg.minDf)
    Ids.assignDense(df, Seq("token"), "token_id")
  }

  /** Token ids too common to carry signal: df > maxDf * nDocs. By pigeonhole
    * there are at most avgTokensPerDoc / maxDf of them (a few hundred), so a
    * driver-side collect + broadcast is safe at any corpus size. */
  def hotTokenIds(vocab: DataFrame, nDocs: Long, cfg: Config): Array[Int] =
    if (cfg.maxDf >= 1.0) Array.empty
    else
      vocab
        .filter(col("df") > lit(cfg.maxDf * nDocs))
        .select(col("token_id").cast("int"))
        .collect()
        .map(_.getInt(0))
        .sorted

  /** Vocabularies up to this many entries encode via a broadcast dictionary
    * (a ~100-200 MB map — the standard small-dim treatment); beyond it the
    * shuffle join takes over. At 10^12 files the min-df/max-df pruned
    * vocabulary of token SHINGLES can exceed this, which is exactly when a
    * shuffle join is the right plan anyway. */
  val BroadcastMaxVocab: Long = 20000000L

  /** Dictionary-encode docs to sorted int arrays: (doc_id, group,
    * tokens: array<int>, n_tokens) — the reference's per-doc dictionary
    * lookup loop (code/Stage03IndexPatents.py:40-48). Two plans, identical
    * output:
    *
    *  - vocab fits [[BroadcastMaxVocab]]: MAP-SIDE encode through a
    *    broadcast hash map. No explode, no shuffle, no re-grouping — the
    *    round-2 bench showed the explode+join+groupBy shape shuffling ~90
    *    token rows per doc (the single largest stage at 1.5M files); the
    *    broadcast path is a narrow projection.
    *  - otherwise: explode + shuffle equi-join + collect_list re-group
    *    (scales to any vocabulary size).
    *
    * `vocabRows` lets callers pass a known count (e.g. from the checkpoint
    * metrics sidecar) to skip the count job.
    */
  def encode(docs: DataFrame, vocab: DataFrame, vocabRows: Option[Long] = None): DataFrame = {
    val n = vocabRows.getOrElse(vocab.count())
    if (n <= BroadcastMaxVocab) encodeBroadcast(docs, vocab) else encodeJoin(docs, vocab)
  }

  /** Shuffle-join encode path (any vocabulary size). */
  def encodeJoin(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val exploded = docs.select(col("doc_id"), col("group"), explode(col("tokens")).as("token"))
    exploded
      .join(vocab.select(col("token"), col("token_id").cast("int").as("tid")), "token")
      .groupBy("doc_id", "group")
      .agg(sort_array(collect_list(col("tid"))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
      .filter(col("n_tokens") > 0)
  }

  /** Broadcast-map encode path: one narrow pass, tokens absent from the
    * vocabulary (min-df casualties) are dropped like the join would. */
  def encodeBroadcast(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val dict = new java.util.HashMap[String, Integer](1 << 16)
    vocab.select(col("token"), col("token_id").cast("int")).collect().foreach { r =>
      dict.put(r.getString(0), Integer.valueOf(r.getInt(1)))
    }
    val bDict = spark.sparkContext.broadcast(dict)
    val encodeUdf = udf { (tokens: Seq[String]) =>
      val d = bDict.value
      val out = Array.newBuilder[Int]
      tokens.foreach { t =>
        val id = d.get(t)
        if (id != null) out += id.intValue
      }
      val arr = out.result()
      java.util.Arrays.sort(arr)
      arr
    }
    docs
      .select(col("doc_id"), col("group"), encodeUdf(col("tokens")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
      .filter(col("n_tokens") > 0)
  }
}
