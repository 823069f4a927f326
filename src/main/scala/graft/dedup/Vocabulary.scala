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

  /** Dictionary-encode docs to sorted int arrays: (doc_id, group,
    * tokens: array<int>, n_tokens). The explode + equi-join is the Spark
    * shape of the reference's per-doc dictionary lookup loop
    * (code/Stage03IndexPatents.py:40-48) — Catalyst broadcasts the vocab
    * when it is small and falls back to a shuffle join when it is not.
    */
  def encode(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val exploded = docs.select(col("doc_id"), col("group"), explode(col("tokens")).as("token"))
    exploded
      .join(vocab.select(col("token"), col("token_id").cast("int").as("tid")), "token")
      .groupBy("doc_id", "group")
      .agg(sort_array(collect_list(col("tid"))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
      .filter(col("n_tokens") > 0)
  }
}
