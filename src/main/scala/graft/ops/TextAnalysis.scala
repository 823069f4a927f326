package graft.ops

import graft.dedup.Stopwords
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a `documents`
  * table (doc_id, text, lang, ...). All ratios are quotients of integer
  * counts computed with codegen'd built-ins, so a SQL oracle (DuckDB)
  * reproduces them bit-for-bit — no UDFs, no rounding-mode hazards.
  */
object TextAnalysis {

  /** Simple word tokenizer used by the analysis ops (distinct from the
    * reference-parity tokenizer in [[graft.dedup.Tokenize]] — analysis ops
    * favor SQL-portability over patent-pipeline fidelity). */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  private lazy val stopwordsArray: Column = lit(Stopwords.english.toArray.sorted)

  /** Token counting: whitespace tokens + a BPE-ish segmentation (letter runs,
    * digit runs, single punctuation marks each count as one token). */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
      col("doc_id"),
      size(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .as("bpe_tokens")
    )

  /** Quality signals: length, token count, punctuation ratio, stopword ratio,
    * mean word length — the standard cheap filters for corpus curation. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ws = regexp_extract_all(col(textCol), lit("\\S+"), lit(0))
    val ltrs = length(regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""))
    val sw = filter(words(col(textCol)), w => array_contains(stopwordsArray, w))
    df.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(ws).as("n_tokens"),
      size(words(col(textCol))).as("n_words"),
      size(sw).as("n_stopwords"),
      ltrs.as("n_alnum")
    ).withColumn(
      "stopword_ratio",
      when(col("n_words") > 0, col("n_stopwords").cast("double") / col("n_words")).otherwise(lit(0.0))
    ).withColumn(
      "alnum_ratio",
      when(col("n_chars") > 0, col("n_alnum").cast("double") / col("n_chars")).otherwise(lit(0.0))
    )
  }

  /** Heuristic language ID: English function-word density. A real system
    * swaps in per-language n-gram tables; the Spark shape (broadcast word
    * table + higher-order filter, no shuffle) is the same. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ws = words(col(textCol))
    val sw = filter(ws, w => array_contains(stopwordsArray, w))
    df.select(
      col("doc_id"),
      size(ws).as("n_words"),
      size(sw).as("n_en_function_words")
    ).withColumn(
      "en_score",
      when(col("n_words") > 0, col("n_en_function_words").cast("double") / col("n_words"))
        .otherwise(lit(0.0))
    ).withColumn("looks_english", (col("en_score") > 0.05).cast("int"))
  }

  /** Document fingerprint: the minimum MD5 over word 3-gram shingles — a
    * winnowing-style content fingerprint that is stable under small appends
    * and identical across engines (md5 + lexicographic min are portable). */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    // single-pass compiled kernel: min(md5(gram)) per row — no gram explode,
    // no shuffle/agg (the old plan exchanged every gram row to regroup by
    // doc). Null-text docs are DROPPED — a deliberate semantic change from
    // the round-4 explode plan, whose <3-words fallback turned a null text
    // into concat_ws("")="" and emitted md5("") for it; the SQL oracle (and
    // any sane reading of "fingerprint of the content") has no row there.
    df.filter(col(textCol).isNotNull)
      .select(col("doc_id"), graft.dedup.MinGramMd5(col(textCol), 3).as("fingerprint"))

  /** Composed keep/drop document gate (the C4/FineWeb-style filter step):
    * length, stopword-density, duplicate-word and bigram-repetition rules
    * evaluated in ONE map-side projection. Deliberately NOT a join of
    * [[qualityScore]] and [[repetitionSignals]] outputs — at 100 TB the
    * gate is a scan-stage predicate over each row, and joining two derived
    * tables of the same corpus would add two extra scans plus a shuffle
    * for what is per-row arithmetic.
    *
    * Rule nulls need no special casing: dup/top-bigram metrics are NULL
    * only below the word minimums, where the n_words conjunct is already
    * false, and SQL three-valued AND collapses (false AND NULL) to false
    * identically in both engines.
    */
  def qualityFilter(
      df: DataFrame,
      textCol: String = "text",
      minWords: Int = 20,
      minStopwordRatio: Double = 0.05,
      maxDupWordFrac: Double = 0.6,
      maxTopBigramCharFrac: Double = 0.2
  ): DataFrame = {
    val w = words(col(textCol))
    df.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      w.as("w"),
      gramsOf(w, 2).as("bg")
    ).select(
      col("doc_id"),
      size(col("w")).cast("long").as("n_words"),
      when(
        size(col("w")) > 0,
        size(filter(col("w"), x => array_contains(stopwordsArray, x))).cast("double") / size(col("w"))
      ).otherwise(lit(0.0)).as("stopword_ratio"),
      when(
        size(col("w")) > 0,
        (size(col("w")) - size(array_distinct(col("w")))).cast("double") / size(col("w"))
      ).as("dup_word_frac"),
      when(
        size(col("bg")) > 0,
        array_max(
          transform(array_distinct(col("bg")), g => size(filter(col("bg"), x => x === g)) * length(g))
        ).cast("double") / col("n_chars")
      ).as("top_bigram_char_frac")
    ).withColumn(
      "keep",
      col("n_words") >= minWords &&
        col("stopword_ratio") >= minStopwordRatio &&
        col("dup_word_frac") <= maxDupWordFrac &&
        col("top_bigram_char_frac") <= maxTopBigramCharFrac
    )
  }

  /** PII / secret redaction patterns shared by [[redact]] and the SQL
    * oracle: kept inside the Java-regex / RE2 common subset (ASCII classes,
    * bounded quantifiers, \b word boundaries) so both engines match the
    * same spans. Redaction order matters and is part of the contract:
    * emails first (their local part can contain hex runs), then IPs, then
    * long hex secrets. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val HexSecretRe = "\\b[0-9a-f]{32,}\\b"

  /** PII / secret scrubbing: redact emails, IPv4 addresses and long hex
    * secrets (the BigCode/The-Stack-style pre-training scrub for code
    * corpora), emitting per-type counts alongside the cleaned text. Pure
    * per-row regex built-ins — no shuffle, codegen'd, and safe to run as
    * the first map stage over a 100 TB scan. */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
      col("doc_id"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(col(textCol), lit(HexSecretRe), lit(0))).cast("long").as("n_secrets"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), lit(EmailRe), lit("<EMAIL>")),
          lit(Ipv4Re),
          lit("<IP>")
        ),
        lit(HexSecretRe),
        lit("<SECRET>")
      ).as("redacted")
    )

  /** Repetition signals in the style of Gopher's repetition filters (Rae et
    * al. 2021, "Scaling Language Models", table A1): duplicate-word and
    * duplicate-trigram rates plus the character fraction covered by the most
    * repetitive word bigram. Pure per-row higher-order functions over the
    * word array — no shuffle, no UDF, embarrassingly parallel at any scale.
    *
    * The bigram metric maximizes covered characters (occurrences × gram
    * length) directly rather than picking "the most frequent gram" first, so
    * count ties need no ordering rule and an ANSI oracle reproduces it
    * exactly. Fractions are single int/int divisions in double — no
    * accumulation-order hazard. Docs with too few words for an n-gram emit
    * NULL for that metric (not 0: "no signal", not "no repetition").
    */
  /** Space-joined word n-grams of a word-array column (empty when the doc
    * has fewer than `n` words — NOT a padded fallback). 1-based positions,
    * matching SQL list indexing so oracles reproduce the gram strings. */
  def gramsOf(wc: Column, n: Int): Column =
    when(
      size(wc) >= n,
      transform(
        sequence(lit(1), size(wc) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(wc, i + o)): _*)
      )
    ).otherwise(array().cast("array<string>"))

  def repetitionSignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val w = words(col(textCol))
    def grams(wc: Column, n: Int): Column = gramsOf(wc, n)
    df.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      w.as("w"),
      grams(w, 2).as("bg"),
      grams(w, 3).as("tg")
    ).select(
      col("doc_id"),
      size(col("w")).cast("long").as("n_words"),
      when(
        size(col("w")) > 0,
        (size(col("w")) - size(array_distinct(col("w")))).cast("double") / size(col("w"))
      ).as("dup_word_frac"),
      when(
        size(col("tg")) > 0,
        (size(col("tg")) - size(array_distinct(col("tg")))).cast("double") / size(col("tg"))
      ).as("dup_trigram_frac"),
      when(
        size(col("bg")) > 0,
        array_max(
          transform(
            array_distinct(col("bg")),
            g => size(filter(col("bg"), x => x === g)) * length(g)
          )
        ).cast("double") / col("n_chars")
      ).as("top_bigram_char_frac")
    )
  }
}
