package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking and sequence packing — the two shaping steps between
  * a cleaned corpus and a training run: long documents are split into
  * bounded, overlapping token windows, and short pieces are packed into
  * fixed token budgets so no batch capacity is wasted.
  *
  * Both are pure Column/window formulations: chunking is a per-row
  * explode (no shuffle at all), packing is one window pass per pack
  * group. Chunks are whitespace-normalized (tokens re-joined with a
  * single space) — the usual contract once text reaches the tokenizer.
  */
object TextChunker {

  /** Whitespace tokens of `text` (non-empty). */
  private def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** One row per chunk: `idCol`, `chunk_id` (0-based), `chunk_text`
    * (whitespace-normalized), `n_chunk_tokens`. Chunks hold `maxTokens`
    * tokens and successive chunks share `overlap` tokens (stride =
    * maxTokens - overlap); the final chunk may be shorter. Documents with
    * no tokens produce no chunks.
    *
    * Scale shape: tokens → slice windows → posexplode, all inside one
    * projection — chunking never shuffles; downstream writers see rows
    * already colocated with their document.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            maxTokens: Int = 512, overlap: Int = 64): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap max=$maxTokens")
    val stride = maxTokens - overlap
    val toks = "__toks"
    val nChunks = "__n_chunks"
    val staged = df
      .withColumn(toks, wsTokens(col(textCol)))
      // ceil((n - overlap) / stride), min 1 when any token exists
      .withColumn(nChunks,
        when(size(col(toks)) === 0, lit(0)).otherwise(
          greatest(lit(1),
            ceil((size(col(toks)) - lit(overlap)).cast("double") / stride)
              .cast("int"))))
    staged
      .select(col(idCol), col(toks),
        // guard nChunks=0: sequence(0, -1) DESCENDS in Spark ([0, -1]),
        // it is not empty — token-less docs must produce no chunks
        posexplode(when(col(nChunks) === 0,
            array().cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.StringType))))
          .otherwise(transform(sequence(lit(0), col(nChunks) - 1),
            i => slice(col(toks), i * stride + 1, lit(maxTokens)))))
          .as(Seq("chunk_id", "__chunk_toks")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", col("__chunk_toks")).as("chunk_text"),
        size(col("__chunk_toks")).cast("long").as("n_chunk_tokens"))
  }

  /** Token-budget sharding for sequence packing: rows ordered by `idCol`
    * within each of `groups` hash groups are assigned to consecutive
    * shards (`pack_id` = group_bin) whose token totals fill `capacity`.
    * A shard's total may OVERFLOW the budget by at most its last
    * document (the shard that crosses the boundary keeps the crossing
    * row) — the bounded-overflow contract real packing pipelines shard
    * under, and the strongest guarantee a single window pass can give
    * (exact first-fit-with-reset is a stateful sequential scan).
    * Deterministic: fill order is id order.
    *
    * Scale shape: a true global pack is inherently sequential; rows salt
    * into `groups` independent streams (one shuffle on the group key,
    * one window pass each), so every group packs in parallel.
    */
  def shardByTokenBudget(df: DataFrame, idCol: String, tokenCountCol: String,
                         capacity: Long, groups: Int = 64): DataFrame = {
    require(capacity > 0 && groups > 0)
    val g = "__pack_group"
    // id-modulo grouping: deterministic, cross-engine reproducible, and
    // uniform for the usual dense numeric ids (pass strings through a
    // numeric surrogate first)
    val grouped = df.withColumn(g, pmod(col(idCol).cast("long"), lit(groups.toLong)))
    val w = Window.partitionBy(col(g)).orderBy(col(idCol))
    // shard index from the running total BEFORE each row: the row that
    // crosses a capacity boundary stays in the shard it started in
    grouped
      .withColumn("__cum_before",
        coalesce(sum(col(tokenCountCol).cast("long")).over(w) -
          col(tokenCountCol).cast("long"), lit(0L)))
      .withColumn("pack_bin", floor(col("__cum_before") / capacity))
      .withColumn("pack_id", concat_ws("_", col(g), col("pack_bin")))
      .drop("__cum_before")
  }

  /** Chunk ENCODED id sequences into bounded overlapping windows — the
    * same window arithmetic as [[chunk]], but over real token ids (a
    * training pipeline's max-sequence-length split is in TOKENS, and a
    * whitespace proxy mis-sizes long-word or high-fertility text): one
    * row per chunk with `idCol`, `chunk_id`, `chunk_ids` (`array<int>`),
    * `n_chunk_tokens`. Same shuffle-free shape — slices and a
    * posexplode inside one projection.
    */
  def chunkIds(df: DataFrame, idCol: String, idsCol: String,
               maxTokens: Int = 512, overlap: Int = 64): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap max=$maxTokens")
    val stride = maxTokens - overlap
    val nChunks = "__n_chunks"
    df
      .withColumn(nChunks,
        when(size(col(idsCol)) === 0, lit(0)).otherwise(
          greatest(lit(1),
            ceil((size(col(idsCol)) - lit(overlap)).cast("double") / stride)
              .cast("int"))))
      .select(col(idCol),
        posexplode(when(col(nChunks) === 0,
            array().cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.IntegerType))))
          .otherwise(transform(sequence(lit(0), col(nChunks) - 1),
            i => slice(col(idsCol), i * stride + 1, lit(maxTokens)))))
          .as(Seq("chunk_id", "chunk_ids")))
      .withColumn("n_chunk_tokens", size(col("chunk_ids")).cast("long"))
  }

  /** Sequence packing over ACTUAL token-id arrays (the artifact a
    * training run loads): documents shard into token budgets via
    * [[shardByTokenBudget]] on `size(idsCol)`, then each pack
    * concatenates its documents' id sequences in id order — one row per
    * pack with `pack_id`, `n_docs`, `input_ids` (flattened `array<int>`)
    * and `n_tokens`. `sepId` (e.g. an end-of-text id) is appended after
    * every document when given, marking boundaries the way packed
    * pretraining batches do; separator ids count toward `n_tokens` but
    * NOT toward the shard budget (the budget governs document tokens —
    * same contract either way, bounded overflow by one document).
    *
    * Scale shape: one shuffle to shard (hash on the salt group), one
    * window pass, one groupBy on `pack_id` to assemble — the id arrays
    * shuffle exactly once, and every pack group packs in parallel.
    */
  def packSequences(df: DataFrame, idCol: String, idsCol: String,
                    capacity: Long, groups: Int = 64,
                    sepId: Option[Int] = None): DataFrame = {
    val sized = df.withColumn("__n_ids", size(col(idsCol)).cast("long"))
    val sharded = shardByTokenBudget(sized, idCol, "__n_ids", capacity, groups)
    val docIds = sepId match {
      case Some(sep) => concat(col(idsCol), array(lit(sep)))
      case None => col(idsCol)
    }
    sharded
      .select(col("pack_id"), col(idCol).cast("long").as("__oid"),
        docIds.as("__ids"))
      .groupBy("pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        // array_sort on (id, ids) structs pins concatenation to id order
        flatten(transform(
          array_sort(collect_list(struct(col("__oid"), col("__ids")))),
          s => s.getField("__ids"))).as("input_ids"))
      .withColumn("n_tokens", size(col("input_ids")).cast("long"))
  }

  /** BEST-FIT-DECREASING token-budget sharding — the greedy bin packer
    * the training literature actually uses (Krell 2021's packed BERT
    * pretraining and its descendants): within each of `groups` hash
    * groups, documents sort by length DESCENDING (id ascending as the
    * tiebreaker) and each goes to the open bin with the LEAST remaining
    * capacity that still fits (ties to the lowest bin index); no fit
    * opens a new bin. Unlike [[shardByTokenBudget]]'s id-ordered fill —
    * which wastes budget whenever a long document straggles past a
    * nearly-full shard — BFD ends within 11/9·OPT + 6/9 bins (the
    * classic Johnson bound), and in practice near-optimal when docs are
    * small against `capacity`. Bins never overflow except for a single
    * document longer than `capacity`, which gets a bin of its own.
    *
    * Deterministic: the assignment is a pure function of each group's
    * (length, id) multiset — partitioning-independent.
    *
    * Scale shape: the packer itself is inherently sequential, so rows
    * salt into `groups` independent streams (same contract as
    * [[shardByTokenBudget]]): one shuffle + intra-partition sort of
    * 24-byte `(grp, n, id)` tuples — never the payload — then ONE
    * streaming pass per group with O(log bins) placement (a TreeMap of
    * remainder → bin indices), memory O(bins-per-group). The payload
    * joins the 16-byte assignment table back by id afterwards.
    */
  def shardByTokenBudgetBfd(df: DataFrame, idCol: String,
                            tokenCountCol: String, capacity: Long,
                            groups: Int = 64): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(groups >= 1, "groups must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df.select(
        pmod(col(idCol).cast("long"), lit(groups.toLong)).as("g"),
        col(tokenCountCol).cast("long").as("n"),
        col(idCol).cast("long").as("id"))
      .as[(Long, Long, Long)]
    val assigned = slim
      .repartition(col("g"))
      .sortWithinPartitions(col("g").asc, col("n").desc, col("id").asc)
      .mapPartitions { it =>
        // remainder -> bin indices with that remainder (ascending), so
        // ceilingEntry(n) is the tightest fit and .first() the tie rule
        var grp = Long.MinValue
        var nextBin = 0L
        val byRemainder = new java.util.TreeMap[Long, java.util.TreeSet[Long]]()
        def place(n: Long): Long = {
          val e = byRemainder.ceilingEntry(n)
          if (e == null) {
            val bin = nextBin
            nextBin += 1
            val rem = capacity - n // may go negative: oversized doc, own bin
            if (rem >= 0)
              byRemainder.computeIfAbsent(rem,
                _ => new java.util.TreeSet[Long]()).add(bin)
            bin
          } else {
            val rem = e.getKey
            val bins = e.getValue
            val bin = bins.first()
            bins.remove(bin)
            if (bins.isEmpty) byRemainder.remove(rem)
            val left = rem - n
            byRemainder.computeIfAbsent(left,
              _ => new java.util.TreeSet[Long]()).add(bin)
            bin
          }
        }
        it.map { case (g, n, id) =>
          if (g != grp) { grp = g; nextBin = 0L; byRemainder.clear() }
          (id, s"${g}_${place(n)}")
        }
      }.toDF("__bfd_id", "pack_id")
    df.join(assigned, df(idCol).cast("long") === col("__bfd_id"))
      .drop("__bfd_id")
  }

  /** [[packSequences]] over the [[shardByTokenBudgetBfd]] shards:
    * identical output shape (`pack_id`, `n_docs`, `input_ids`,
    * `n_tokens`, id-ordered concatenation within each pack), better
    * budget utilization.
    */
  def packSequencesBfd(df: DataFrame, idCol: String, idsCol: String,
                       capacity: Long, groups: Int = 64,
                       sepId: Option[Int] = None): DataFrame = {
    val sized = df.withColumn("__n_ids", size(col(idsCol)).cast("long"))
    val sharded = shardByTokenBudgetBfd(sized, idCol, "__n_ids", capacity,
      groups)
    val docIds = sepId match {
      case Some(sep) => concat(col(idsCol), array(lit(sep)))
      case None => col(idsCol)
    }
    sharded
      .select(col("pack_id"), col(idCol).cast("long").as("__oid"),
        docIds.as("__ids"))
      .groupBy("pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        flatten(transform(
          array_sort(collect_list(struct(col("__oid"), col("__ids")))),
          s => s.getField("__ids"))).as("input_ids"))
      .withColumn("n_tokens", size(col("input_ids")).cast("long"))
  }

  /** Packing-efficiency audit for a sharded frame: one row of
    * `(n_packs, n_tokens, waste_frac)` where `waste_frac` is the unused
    * fraction of the allocated budget, Σ max(capacity − packTokens, 0)
    * / (n_packs · capacity) — oversized single-doc packs count as full,
    * not negative. The number `shardByTokenBudgetBfd` exists to push
    * down.
    */
  def packingEfficiency(sharded: DataFrame, tokenCountCol: String,
                        capacity: Long): DataFrame =
    sharded.groupBy(col("pack_id"))
      .agg(sum(col(tokenCountCol).cast("long")).as("__pt"))
      .agg(count(lit(1)).as("n_packs"),
        sum(col("__pt")).as("n_tokens"),
        round(sum(greatest(lit(capacity) - col("__pt"), lit(0L))) /
          (count(lit(1)) * lit(capacity)), 4).as("waste_frac"))
}
