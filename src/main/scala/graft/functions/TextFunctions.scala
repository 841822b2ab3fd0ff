package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (dedup, quality,
  * language-ID, fingerprinting). All pure column expressions — codegen
  * friendly, no UDFs, executor-local, so they hold at 100 TB where a
  * Python/Scala closure would dominate the profile.
  *
  * Cross-engine determinism contract: every derived value must be
  * reproducible by the DuckDB oracle, so hashing goes through md5
  * (identical bytes on both engines) rather than Spark's murmur3
  * `hash()` (which DuckDB lacks).
  */
object TextFunctions {

  /** 60-bit stable content hash: first 15 hex chars of md5 as a long.
    * 15 nibbles = 60 bits, safely inside a signed 64-bit value on both
    * engines (DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT). Bound to
    * the native [[Hash60]] kernel — value-identical to the composed
    * `conv(substring(md5(c), 1, 15), 16, 10)` without its five string
    * round-trips per call (pinned equal in Hash60Spec).
    */
  def hash60(c: Column): Column = Hash60.hash60(c)

  /** Canonical text normalization: punctuation -> space, collapse
    * whitespace, trim, lowercase. The shared preprocessing step for
    * shingling / fingerprinting / quality. Bound to the native
    * [[NormText]] kernel — value-identical to the composed regex chain
    * (pinned in NormTextSpec) without the two regex passes per call.
    */
  def normText(c: Column): Column = NormText.normText(c)

  /** The composed regex form — the DuckDB-oracle contract the kernel
    * is pinned against.
    */
  def normTextComposed(c: Column): Column =
    lower(trim(regexp_replace(regexp_replace(c, "[^a-zA-Z0-9\\s]", " "), "\\s+", " ")))

  /** Normalized whitespace tokens. Bound to the native [[NormTokens]]
    * kernel — value-identical to `split(normText(c), " ")` (pinned in
    * NormTokensSpec) without the two regex passes per call; this is
    * the hottest scalar in the text path (7.6 s -> sub-second for the
    * tokenize-only pass over the sf1 corpus).
    */
  def tokens(c: Column): Column = NormTokens.normTokens(c)

  /** The composed regex form `split(normText(c), " ")` — the
    * DuckDB-oracle contract the kernel is pinned against.
    */
  def tokensComposed(c: Column): Column = split(normText(c), " ")

  /** Word k-gram shingles (space-joined) with an empty-array guard for
    * short docs (Spark's `sequence(0, n)` flips direction for n<0).
    *
    * PERFORMANCE CONTRACT: pass an ATTRIBUTE column (a materialized
    * token array), not an expression tree. A lambda-captured outer
    * expression is re-evaluated once per array element — with `toks =
    * split(regexp_replace(...))` inlined here, the tokenizer ran ~60x
    * per row and dominated the whole dedup pipeline (measured 12s for
    * 5k docs at sf0.1; <1s materialized). Call sites do
    * `df.select(tokens(col).as("toks"))` first — CollapseProject keeps
    * non-cheap multiply-referenced aliases in their own projection.
    */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Hashed word k-gram shingles — hash60 of every space-joined
    * k-token window as a primitive long array. Bound to the native
    * [[ShingleHash60]] kernel: value-identical to
    * `transform(wordShingles(toks, k), g => hash60(g))` (pinned in
    * ShingleHash60Spec) with zero gram-string materialization. Use
    * wherever downstream only needs gram HASHES (dedup blocking,
    * decontamination, span counting, set intersection) — long compares
    * and long distinct beat UTF8 compares at every stage after the
    * scan. Same attribute-not-expression contract as wordShingles.
    */
  def gramHashes(toks: Column, k: Int): Column = ShingleHash60.shingleHash60(toks, k)

  /** Character k-gram shingles. Same attribute-not-expression contract
    * as wordShingles: `norm` must be a materialized column.
    */
  def charShingles(norm: Column, k: Int): Column =
    when(length(norm) >= k,
      transform(sequence(lit(0), length(norm) - k),
        i => substr(norm, i + 1, lit(k))))
      .otherwise(array().cast("array<string>"))
}
