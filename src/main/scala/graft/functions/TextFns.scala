package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup and text-analysis
  * operators. Everything is built from codegen'd Spark SQL built-ins
  * (split / filter / transform / higher-order functions) — no Scala
  * UDFs — so the expressions stay inside whole-stage codegen and the
  * DuckDB oracle can mirror them exactly.
  */
object TextFns {

  /** whitespace tokens with empties dropped (set semantics left to the
    * caller). Mirrors DuckDB `list_filter(string_split(text,' '), ...)`. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** n-word shingles of the token array (sliding window, space-joined).
    * Mirrors DuckDB `list_transform(range(len(t)-n+1), i ->
    * array_to_string(t[i+1:i+n], ' '))`. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    ).otherwise(array().cast("array<string>"))

  /** distinct 3-shingle set of a raw text column — the unit of the
    * set-similarity (Jaccard / MinHash) operators. */
  def shingleSet(text: Column, n: Int = 3): Column =
    array_distinct(shingles(tokens(text), n))

  /** canonical document fingerprint: md5 over the sorted distinct token
    * set — order- and duplication-insensitive content identity. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** count of tokens from `words` present in the token array (with
    * multiplicity — a frequency signal, not set membership). */
  def markerCount(toks: Column, words: Seq[String]): Column = {
    val lst = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(lst, t)))
  }

  /** number of non-ASCII characters (CJK detection signal). */
  def nonAsciiCount(text: Column): Column =
    length(regexp_replace(text, "[\\x00-\\x7F]", ""))
}
