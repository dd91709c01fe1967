package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis column functions for the LLM-data pipeline — all
  * built-in expressions (codegen'd, no UDFs).
  */
object TextFns {

  /** Whitespace tokens (single-space split: the documents corpus is
    * space-joined; identical to DuckDB string_split).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles (n=3). */
  def shingles3(toks: Column): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
        element_at(toks, i + 3))))

  /** Count of regex-token matches (BPE-ish word/number pieces). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+"), lit(0))).cast(LongType)

  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords: _*))).cast(LongType)

  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast(LongType)

  def digitCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast(LongType)

  /** Sum of token lengths (for mean word length). */
  def tokenChars(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(LongType)

  /** Winnowing fingerprints (MOSS-style): delegated to the O(n)
    * [[WinnowFingerprints]] custom expression — rolling hash +
    * monotonic-deque minima in one byte pass.
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    WinnowFingerprints.winnow(text, k, w)
}
