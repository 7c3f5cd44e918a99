package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Paragraph-grain exact deduplication across the whole corpus —
  * the C4 "remove repeated lines" / RefinedWeb "exact substring
  * dedup" curation step, at a fixed word-window grain: every
  * document is cut into consecutive `chunkWords`-word chunks, each
  * distinct chunk keeps exactly ONE occurrence corpus-wide (the
  * first by (docId, position)), and every other occurrence is cut
  * out of its document's text.
  *
  * Scale shape — document text NEVER enters a shuffle:
  *  1. each doc row emits only (id, idx, hash(chunk)) — the winner
  *     per chunk-hash is a `min(struct(id, idx))` aggregate, which
  *     partial-aggregates map-side, so a duplicate-heavy corpus
  *     shuffles ~one light row per DISTINCT chunk;
  *  2. winners fold back to a per-doc sorted keep-index list
  *     (hash-only rows again);
  *  3. one join on the doc id re-derives the kept chunks from the
  *     original text locally. The only wide text movement is that
  *     final id-partitioned join of the source table — the floor for
  *     any operator that rewrites documents.
  * A windowed rank partitioned by the chunk STRING (the naive plan,
  * and what the DuckDB oracle runs) would instead shuffle the full
  * corpus text once for ranking and once for reassembly.
  *
  * Output: (id, clean_text, kept_chunks, total_chunks); clean_text
  * is NULL when every chunk of the doc lost (an exact-duplicate doc).
  *
  * @param wideHash false = xxhash64 chunk keys (8 shuffle bytes,
  *   birthday-safe below ~10^9 distinct chunks); true = md5 (16
  *   bytes) for a 100 TB corpus — same escape hatch as
  *   [[ExactDedup.representatives]].
  */
object ChunkDedup {

  def cleanDocs(df: DataFrame, idCol: String, textCol: String,
                chunkWords: Int = 15, wideHash: Boolean = false): DataFrame = {
    require(chunkWords >= 1, s"chunkWords must be >= 1, got $chunkWords")
    val cw = chunkWords

    def words(c: Column): Column = split(c, " ")
    def nChunks(c: Column): Column =
      ceil(size(words(c)) / lit(cw.toDouble)).cast(LongType)
    def chunkAt(text: Column, i: Column): Column =
      array_join(slice(words(text), (i * cw + 1).cast("int"), lit(cw)), " ")
    def hashOf(c: Column): Column =
      if (wideHash) unhex(md5(c.cast("binary"))) else xxhash64(c)

    val id = col(idCol)
    val text = col(textCol)

    // The (id, idx) winner is packed into ONE long — `min(long)` is a
    // codegen'd HashAggregate with map-side combine, where
    // `min(struct(id, idx))` planned as a SortAggregate that SORTS
    // every chunk row by hash twice (partial + final). Bounds: idx <
    // 2^24 chunks per doc (16M chunks = quarter-billion words — no
    // real document) and id < 2^39; both are enforced loudly below,
    // not assumed.
    val IdxSpace = 1L << 24
    val MaxId = (Long.MaxValue / IdxSpace) - 1 // 2^39 - 1
    def packed(i: Column): Column =
      when(id.between(0, MaxId) && i < IdxSpace, id * IdxSpace + i)
        .otherwise(raise_error(concat(
          lit(s"ChunkDedup: id must be in [0, $MaxId] and chunk count " +
            s"< $IdxSpace; got id="), id, lit(" idx="), i)).cast(LongType))

    // 1. light rows: (chunk hash, packed winner key) — the text stays
    //    at the scan
    val paras = df.select(
        id,
        posexplode(transform(
          sequence(lit(0L), nChunks(text) - 1),
          i => hashOf(chunkAt(text, i)))).as(Seq("idx", "h")))
      .select(col("h"), packed(col("idx")).as("p"))

    // 2. first occurrence per distinct chunk, folded to keep-lists
    val keep = paras
      .groupBy(col("h"))
      .agg(min(col("p")).as("w"))
      .select(expr(s"w div $IdxSpace").as(idCol),
        pmod(col("w"), lit(IdxSpace)).cast("int").as("idx"))
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("idx"))).as("__graft_keep"))

    // 3. single id-partitioned join; kept chunks re-derived locally —
    //    the word array is materialized ONCE per row (not re-split
    //    inside every lambda element)
    df.join(keep, Seq(idCol), "left")
      .withColumn("__graft_w", words(text))
      .select(
        id,
        when(col("__graft_keep").isNotNull,
          array_join(
            transform(col("__graft_keep"), i =>
              array_join(slice(col("__graft_w"),
                (i * cw + 1).cast("int"), lit(cw)), " ")), " "))
          .as("clean_text"),
        coalesce(size(col("__graft_keep")), lit(0)).cast(LongType)
          .as("kept_chunks"),
        ceil(size(col("__graft_w")) / lit(cw.toDouble)).cast(LongType)
          .as("total_chunks"))
  }
}
