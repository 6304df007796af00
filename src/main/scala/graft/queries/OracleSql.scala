package graft.queries

/** Shared DuckDB fragments for the oracle SQLs.
  *
  * The Spark side tokenizes with Text.tokens (F9–F11: lowercase → strip
  * punctuation → strip digit runs → split on whitespace runs → drop
  * empties). Every oracle that consumes tokens must replicate that pipeline
  * exactly — a raw `string_split(text, ' ')` only agrees on text that
  * happens to be pre-normalized, which silently weakens the parity check
  * (ADVICE r01). This is the single source of truth for the DuckDB
  * equivalent.
  */
object OracleSql {

  /** DuckDB expression replicating Text.tokens(col): list of non-empty,
    * lowercased, punctuation/digit-stripped tokens split on whitespace runs.
    * The `\x0B → ' '` pre-pass mirrors Text.tokens — vertical tab is the one
    * character Java's `\s` contains and RE2's does not, so without the
    * normalization the engines tokenize such text differently (ADVICE r02).
    */
  def toks(col: String): String =
    s"list_filter(regexp_split_to_array(regexp_replace(regexp_replace(" +
      s"regexp_replace(lower($col), '\\x0B', ' ', 'g'), " +
      s"'[^\\w\\s]', '', 'g'), '\\d+', '', 'g'), '\\s+'), " +
      "t -> t <> '')"
}
