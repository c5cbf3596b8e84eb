package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Line-level boilerplate removal — the CCNet-style cleanup pass (Wenzek et
 * al., "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
 * Data", LREC'20) every web-scale training corpus runs before training:
 * navigation menus, cookie banners, copyright footers and other lines
 * repeated across many pages are deleted IN PLACE inside each document,
 * preserving the order of what remains.
 *
 * Scale design (the 100 TB shape):
 *
 *  1. Counting never shuffles line text. Lines are exploded narrowly and
 *     counted by their 64-bit hash — with map-side partial aggregation the
 *     shuffle carries (8-byte hash, count) pairs, one per distinct line per
 *     mapper, never the strings (most lines are unique, so a string-keyed
 *     count would shuffle nearly the whole corpus).
 *  2. Exactness is restored on the SMALL side. Hashes at or above the
 *     frequency threshold are heavy hitters — bounded by corpus_lines /
 *     minCount — so they broadcast; matching line instances regroup by the
 *     actual string (map-side combine bounds that second shuffle by
 *     mappers x distinct frequent lines) and the threshold is re-applied to
 *     EXACT string counts. A 64-bit collision can therefore only ever add a
 *     false candidate (discarded here), never remove an innocent line.
 *  3. Removal is a broadcast join of the corpus against the tiny frequent
 *     set — no corpus shuffle — and reassembly is one hash-aggregate by
 *     doc id whose per-group state is a single document's lines.
 */
object Lines {

  /** One row per physical line: `(id, line_no, line)` — a narrow
    * posexplode of `split(text, "\n")`. Empty documents still produce one
    * empty-string line (split semantics), so every input row is represented. */
  def explodeLines(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("ld_id"), posexplode(split(text, "\n")).as(Seq("line_no", "line")))

  /**
   * Lines occurring at least `minCount` times corpus-wide, with exact
   * occurrence counts: `(line, n_inst)`. Hash-first counting per the object
   * doc — the string-keyed regroup only ever sees instances whose hash is
   * already a candidate.
   */
  def frequentLines(df: DataFrame, id: Column, text: Column, minCount: Long): DataFrame = {
    require(minCount >= 2, s"minCount must be at least 2, got $minCount")
    val lines = explodeLines(df, id, text)
    val candHashes = lines
      .groupBy(xxhash64(col("line")).as("lh"))
      .agg(count(lit(1)).as("n_inst"))
      .filter(col("n_inst") >= minCount)
      .select(col("lh"))
    lines
      .join(broadcast(candHashes), xxhash64(col("line")) === col("lh"))
      .groupBy(col("line"))
      .agg(count(lit(1)).as("n_inst"))
      .filter(col("n_inst") >= minCount)
  }

  /**
   * Remove every line occurring at least `minCount` times corpus-wide from
   * every document: `(id, clean_text, n_lines_kept, n_lines_removed)`.
   * Remaining lines keep their original order; a document whose every line
   * is boilerplate survives with `clean_text = ""` (dropping it is the
   * caller's policy decision, e.g. `filter(col("n_lines_kept") > 0)`).
   *
   * Exactly equivalent to counting and removing by full line strings — the
   * hash pass is bytes optimization, not semantics (see [[frequentLines]]).
   */
  def removeBoilerplate(df: DataFrame, id: Column, text: Column, minCount: Long): DataFrame = {
    val freq = frequentLines(df, id, text, minCount)
      .select(col("line").as("freq_line"))
    explodeLines(df, id, text)
      .join(broadcast(freq), col("line") === col("freq_line"), "left")
      .groupBy(col("ld_id").as("id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("freq_line").isNull, struct(col("line_no"), col("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"),
        count(when(col("freq_line").isNull, 1)).as("n_lines_kept"),
        count(col("freq_line")).as("n_lines_removed"))
  }
}
