package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning…", §2.2 — the rules behind the C4 corpus): lines
  * must end in terminal punctuation, carry at least `minLineWords`
  * words, and not mention javascript; a PAGE survives only if it has at
  * least `minKeptLines` surviving lines, no curly brace, and no "lorem
  * ipsum". The famous web-text cleanup stage between raw extraction and
  * dedup.
  *
  * Scale shape: every rule is a pure Column expression over the row's
  * own text (split / filter / array_join HOFs — whole-stage codegen, no
  * UDFs), so cleaning is a map-only pass at scan speed: no shuffle, no
  * driver work, trivially parallel at any corpus size.
  */
object C4Filters {

  private val TerminalPunct = Seq(".", "!", "?", "\"")

  /** The lines of `text` that survive C4's line rules. */
  def keptLines(text: Column, minLineWords: Int = 5): Column =
    filter(split(text, "\n"), l => {
      val t = trim(l)
      val words = size(filter(split(t, " "), w => length(w) > 0))
      substring(t, -1, 1).isin(TerminalPunct: _*) &&
        words >= minLineWords &&
        !contains(lower(t), lit("javascript"))
    })

  /** Page-level verdict over the already-filtered lines. */
  def pageKept(text: Column, kept: Column, minKeptLines: Int = 3): Column =
    size(kept) >= minKeptLines &&
      !contains(text, lit("{")) &&
      !contains(lower(text), lit("lorem ipsum"))

  /** Case-insensitive hit count against a badwords list (C4's page
    * blocklist rule, Raffel 2020 §2.2: any page containing a listed
    * word is removed; the paper uses the public "List of Dirty,
    * Naughty, Obscene…" list, which the CALLER supplies — this corpus
    * ships none). Entries are word sequences: single words match whole
    * `[a-z0-9_]` tokens, multi-word entries match with `\b…\b`
    * boundary semantics. One fused codegen pass
    * ([[graft.plans.BlocklistHits]]); the list rides codegen as a
    * pre-lowercased reference object — map-only, scan speed.
    */
  def blocklistHits(text: Column, words: Seq[String]): Column =
    graft.plans.expressions.blocklist_hits(text, words)

  /** C4's page verdict for the blocklist rule: zero hits. */
  def keepPageBlocklist(text: Column, words: Seq[String]): Column =
    blocklistHits(text, words) === 0L

  /** Per-document C4 cleaning: `idCol`, `page_kept`, `n_lines`,
    * `n_kept`, and `clean` (surviving lines re-joined; empty when the
    * page is dropped). Downstream stages filter on `page_kept` and feed
    * `clean` to dedup/tokenization.
    */
  def clean(df: DataFrame, idCol: String, textCol: String,
            minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val kept = keptLines(col(textCol), minLineWords)
    val page = pageKept(col(textCol), kept, minKeptLines)
    df.select(col(idCol),
      page.as("page_kept"),
      size(split(col(textCol), "\n")).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      when(page, concat_ws("\n", kept)).otherwise(lit("")).as("clean"))
  }
}
