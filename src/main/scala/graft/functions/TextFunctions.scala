package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality stats, language-ID heuristic, fingerprinting.
  *
  * Everything here is built from codegen'd built-ins + higher-order
  * array functions — no UDFs — so each operator is a narrow per-row
  * projection that stays inside whole-stage codegen and scales
  * embarrassingly parallel (no shuffle).
  */
object TextFunctions {

  /** Let-binding for expression trees: evaluates `e` exactly once per
    * row and exposes it to `f` as a lambda variable. Without this,
    * Catalyst's CollapseProject inlines the sub-expression at every use
    * site, so an expensive array (tokenization, hash signatures) gets
    * re-evaluated once per reference — quadratic blowups in
    * higher-order-function pipelines. */
  def bound(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Word n-gram shingles (default 3) over `tokens`. Documents shorter
    * than `n` tokens yield an empty array. The token array is bound
    * once — the n `element_at` probes per window are O(1) lookups, not
    * n re-tokenizations. */
  def shingles(text: Column, n: Int = 3): Column =
    bound(tokens(text)) { t =>
      when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n), i =>
          concat_ws(" ", (0 until n).map(o => element_at(t, i + o + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    }

  /** Distinct shingle set (for Jaccard/MinHash). */
  def shingleSet(text: Column, n: Int = 3): Column = array_distinct(shingles(text, n))

  /** Exact-phrase occurrence count: how many token positions start the
    * consecutive sequence `phrase` (overlapping occurrences each
    * count — "a a a" holds TWO "a a"). A phrase match is precisely a
    * length-m shingle equal to the space-joined phrase, so this reuses
    * [[shingles]] verbatim: tokens cannot contain whitespace, making
    * the join-by-space unambiguous. Pure scan→project — no explode, no
    * window, no exchange; the positional self-join a posting-list
    * engine would do is replayed only in the ORACLE. */
  def phraseMatches(text: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phrase terms must be non-empty single tokens, got $phrase")
    size(filter(shingles(text, phrase.length),
      s => s === lit(phrase.mkString(" ")))).cast("bigint")
  }

  /** Exact phrase search over a corpus: (id, n_matches) for every
    * document containing the phrase at least once — the positional
    * query BM25's bag-of-words postings cannot answer.
    *
    * Scale shape: one pass, map-side only (the match counter is a
    * per-row expression over the token array); the only data movement
    * is whatever the caller does with the result. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol), phraseMatches(col(textCol), phrase).as("n_matches"))
      .filter(col("n_matches") > 0)

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** BPE-ish subword proxy: runs of letters, runs of digits, and single
    * punctuation marks each count as one token. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0))).cast("bigint")

  /** English stopword list used by the quality score (fixed, small). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this")

  def stopwordCount(text: Column): Column = {
    val stop = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stop, t))).cast("bigint")
  }

  /** Punctuation character count (global). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", "")).cast("bigint")

  /** Sum of token lengths (exact int; ratios derived from it divide
    * exactly in any engine). */
  def tokenLenSum(text: Column): Column =
    aggregate(transform(tokens(text), t => length(t).cast("bigint")),
      lit(0L), (acc, x) => acc + x)

  /** Marker-word tables for the language-ID heuristic — tiny
    * closed-class word lists per language (public linguistic facts). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "y", "que", "por", "para"))

  /** Hit count for one language's marker list. */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(tokens(text), t => array_contains(m, t))).cast("bigint")
  }

  /** n-gram-heuristic language ID: argmax of marker hits with a fixed
    * priority order (en > de > fr > es) on ties; 'und' when no marker
    * hits at all. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> langScore(text, m) }
    val all = scores.map(_._2)
    val anyHit = all.reduce(_ + _) > 0
    val best = scores.foldRight(lit("und")) { case ((l, s), rest) =>
      when(anyHit && s >= scores.collect { case (l2, s2) if l2 != l => s2 }
        .reduce((a, b) => greatest(a, b)), lit(l)).otherwise(rest)
    }
    // foldRight builds: en wins ties, then de, fr, es.
    best
  }

  /** Composite quality heuristics (training-data filtering): boolean
    * flags for degenerate documents plus a weighted score in [0,1].
    * Thresholds follow common web-corpus filtering practice (e.g.
    * C4/Gopher-style length + symbol-ratio rules, public papers). */
  val minTokens = 10
  val minStopwordRatio = 0.05
  val maxPunctRatio = 0.10

  def qualityFlags(text: Column): Column = {
    val nTok = wsTokenCount(text)
    val stopRatio = stopwordCount(text).cast("double") / nTok.cast("double")
    val punctRatio = punctCount(text).cast("double") / length(text).cast("double")
    struct(
      (nTok < minTokens).as("too_short"),
      (stopRatio < minStopwordRatio).as("low_stopword_ratio"),
      (punctRatio > maxPunctRatio).as("high_punct_ratio"))
  }

  /** score = 1 − 0.4·too_short − 0.3·low_stopword − 0.3·high_punct.
    * Computed as integer tenths with one final division so the double
    * result is bit-identical in any engine (0.4+0.3 chained double
    * subtraction is not). */
  def qualityScore(flags: Column): Column =
    (lit(10) -
      when(flags.getField("too_short"), 4).otherwise(0) -
      when(flags.getField("low_stopword_ratio"), 3).otherwise(0) -
      when(flags.getField("high_punct_ratio"), 3).otherwise(0))
      .cast("double") / 10.0

  /** Document fingerprint: md5 of whitespace-normalized lowercase text
    * (the SQL-expressible normalize-then-hash form). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 60-bit SimHash from md5 token hashes: for each bit, sum +1/-1
    * across tokens by whether the token hash has that bit set; the
    * sign vector packs into a long. Pure HOF pipeline — no UDF. */
  def simhash60(text: Column): Column =
    bound(transform(tokens(text), t =>
      conv(substring(md5(t), 1, 15), 16, 10).cast("long"))) { hashes =>
      (0 until 60).map { b =>
        val vote = aggregate(hashes, lit(0L), (acc, h) =>
          acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        when(vote > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce((a, c) => a.bitwiseOR(c))
    }

  /** Hamming distance between two simhash values. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling (polynomial) document hash over token hashes:
    * h = fold(h·31 + hash(tokenᵢ)) mod 2^31, seeded with the first
    * token's hash — order-sensitive (unlike the set-based fingerprint)
    * so token transpositions change the value. Engine-portable: the
    * fold is left-to-right integer arithmetic. */
  def rollingHash(text: Column): Column = {
    val m = 1L << 31
    val hs = transform(tokens(text), t =>
      conv(substring(md5(t), 1, 15), 16, 10).cast("long") % m)
    bound(hs) { h =>
      aggregate(
        slice(h, lit(2), greatest(size(h) - 1, lit(0))),
        element_at(h, 1),
        (acc, x) => (acc * 31L + x) % m)
    }
  }

  /** Fixed-window token chunking for LLM context packing: tokens are
    * grouped into windows of `chunkTokens` (last window ragged) and
    * re-joined with single spaces. Emits an array; explode it for one
    * row per chunk. */
  def chunks(text: Column, chunkTokens: Int): Column = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    bound(tokens(text)) { t =>
      transform(
        sequence(lit(0), ceil(size(t).cast("double") / chunkTokens).cast("int") - 1),
        i => concat_ws(" ", slice(t, i * chunkTokens + 1, lit(chunkTokens))))
    }
  }

  /** OVERLAPPING token windows — the retrieval-chunking pattern:
    * windows of `chunkTokens` starting every `stride` tokens
    * (overlap = chunkTokens − stride), so a sentence near a boundary
    * appears whole in at least one chunk instead of being split across
    * two — the property retrieval recall depends on, at the cost of
    * chunkTokens/stride× storage. The last window is the first one
    * reaching the end (no redundant sub-window tails); docs of ≤
    * chunkTokens yield exactly one window. Emits an array of
    * (start_tok, chunk_text) structs; explode for one row per chunk.
    * Pure map-side — text never crosses an exchange. */
  def chunksOverlap(text: Column, chunkTokens: Int, stride: Int): Column = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(stride > 0 && stride <= chunkTokens,
      s"stride in [1, chunkTokens], got $stride")
    bound(tokens(text)) { t =>
      val n = size(t)
      val nWin = when(n <= chunkTokens, lit(1))
        .otherwise(ceil((n - chunkTokens).cast("double") / stride).cast("int") + 1)
      transform(sequence(lit(0), nWin - 1),
        i => struct((i * stride).as("start_tok"),
          concat_ws(" ", slice(t, i * stride + 1, lit(chunkTokens))).as("chunk_text")))
    }
  }

  /** PII-style scrubbing (RE2-safe patterns shared with any oracle
    * engine): email-shaped tokens → [EMAIL], digit runs of 4+ → [NUM].
    * Order matters — emails first, so their digits survive as part of
    * the email redaction, not as [NUM]. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
      "[0-9]{4,}", "[NUM]")

  /** Sequence-length bucketing report — the batch scheduler's view of
    * a corpus: documents binned by pad-to-power-of-two token count,
    * with the padding waste naive pad-to-bucket-top batching pays per
    * bucket. Length-bucketed batching is the standard fix for padding
    * waste in LLM training/inference serving; this reports, in exact
    * integer tokens and bps of the padded volume, how much remains.
    *
    * Bucket top: the smallest power of two ≥ the doc's token count
    * (n ≤ 1 keeps n — a 0/1-token doc pads nothing), computed with
    * integer bit arithmetic (`length(bin(n-1))` = ⌈log₂ n⌉), never
    * float log2 — a 2^k-token doc must not round into the next bucket.
    *
    * Scale shape: one map-side projection (token count → bucket top)
    * feeding ONE hash aggregate on the bucket id — text never leaves
    * the scan; the exchange carries (bucket, count, token sum), at most
    * ~64 groups regardless of corpus size. */
  def lengthBuckets(df: org.apache.spark.sql.DataFrame,
                    textCol: String = "text")
      : org.apache.spark.sql.DataFrame = {
    val n = size(tokens(col(textCol))).cast("long")
    df.select(n.as("__n"))
      .withColumn("bucket_top", when(col("__n") <= 1, col("__n"))
        .otherwise(expr("shiftleft(CAST(1 AS BIGINT), length(bin(__n - 1)))")))
      .groupBy("bucket_top")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("total_tokens"))
      .select(col("bucket_top"), col("n_docs"), col("total_tokens"),
        (col("bucket_top") * col("n_docs") - col("total_tokens"))
          .as("padding_tokens"),
        expr("((bucket_top * n_docs - total_tokens) * 10000) div " +
          "greatest(bucket_top * n_docs, 1)").as("waste_bps"))
  }

  /** Streaming sequence packing for LLM training: documents are
    * concatenated in id order within `nShards` deterministic shards
    * (id % nShards) and cut into fixed `windowTokens` context windows —
    * each doc reports the window (`bin_id`) its first token lands in
    * and its token offset there, the boundary-agnostic packing used
    * when training sequences may cross document boundaries.
    *
    * Scale: the running total is a window sum PARTITIONED BY shard, so
    * packing parallelizes across shards (a single global order would
    * serialize the sort at 100 TB); one narrow shuffle of
    * (doc_id, n_tokens) pairs per shard. */
  def packDocuments(docs: org.apache.spark.sql.DataFrame,
                    windowTokens: Int, nShards: Int = 32,
                    textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowTokens > 0 && nShards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(col(idCol).as("doc_id"),
        (col(idCol) % nShards).cast("int").as("shard"),
        wsTokenCount(col(textCol)).as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin_id", floor(col("start_tok") / windowTokens).cast("bigint"))
      .withColumn("offset_in_bin", col("start_tok") % windowTokens)
  }

  /** Per-window document segments for packed training — the
    * block-diagonal attention-mask map that keeps cross-document
    * attention OFF when sequences are packed boundary-agnostically
    * ([[packDocuments]] concatenates; the trainer must still mask
    * token i from attending across the document boundary — the
    * standard packing discipline from T5/GPT-3 data pipelines). Each
    * (shard, bin_id) context window lists the documents inside it
    * with their in-window span; a document crossing window boundaries
    * contributes one segment per window it touches. Within any
    * fully-covered window the segments tile [0, windowTokens) exactly
    * (spec-proven), so the mask is constructible from this frame
    * alone.
    *
    * One row per (shard, bin_id, doc_id): `seg_start` (0-based
    * in-window first token) and `seg_len`. Zero-token documents
    * occupy no tokens and emit no segment.
    *
    * Scale shape: [[packDocuments]]'s one narrow per-shard shuffle,
    * then a pure map-side explode over the ≤ n_tokens/windowTokens+1
    * windows each document touches — no further exchange, text never
    * enters the plan. */
  def packAttentionSpans(docs: org.apache.spark.sql.DataFrame,
                         windowTokens: Int, nShards: Int = 32,
                         textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    val wt = lit(windowTokens.toLong)
    val packed = packDocuments(docs, windowTokens, nShards, textCol, idCol)
      .filter(col("n_tokens") > 0)
    val endTok = col("start_tok") + col("n_tokens") // exclusive
    val segStart = greatest(col("start_tok") - col("bin") * wt, lit(0L))
    packed
      .withColumn("bin", explode(sequence(col("bin_id"),
        floor((endTok - 1) / windowTokens).cast("bigint"))))
      .select(col("shard"), col("bin").as("bin_id"), col("doc_id"),
        segStart.as("seg_start"),
        (least(endTok - col("bin") * wt, wt) - segStart).as("seg_len"))
  }

  /** 60-bit shingle hash (md5 hex chars 1-15) — the same derivation
    * the MinHash family uses; engine-portable. */
  def shingleHash(sh: Column): Column =
    conv(substring(md5(sh), 1, 15), 16, 10).cast("long")

  /** Content-defined chunking: variable-length chunks whose boundaries
    * sit wherever the `w`-token rolling window's 60-bit hash is ≡ 0
    * (mod 2^maskBits) — the storage-dedup boundary rule (LBFS-style)
    * applied to token streams. A fixed-window scheme ([[graft.dedup
    * .Dedup.spanDedup]]) loses every window after an insertion shifts
    * the stream; content-defined boundaries re-synchronize within ~w
    * tokens, so the unchanged tail hashes to the same chunks again —
    * the property that makes chunk-level dedup robust to edits.
    * Expected chunk length 2^maskBits tokens; the final token always
    * closes the last chunk.
    *
    * One row per (doc, chunk): (doc_id, chunk_idx, n_tokens,
    * chunk_hash). Pure map-side higher-order functions — the token
    * array is bound once, text never crosses an exchange; downstream
    * duplicate-chunk analytics group on the 60-bit hash only. */
  /** array<struct<chunk,n_tokens>> of [[cdcChunkRows]]'s chunks — the
    * shared map-side construction, reused by [[cdcDedup]]'s rebuild so
    * election and reassembly cannot drift. */
  private def cdcChunksCol(text: Column, w: Int, maskBits: Int): Column = {
    require(w >= 1, s"need w >= 1, got $w")
    require(maskBits >= 0 && maskBits < 30, s"need 0 <= maskBits < 30, got $maskBits")
    val m = 1L << maskBits
    bound(tokens(text)) { ts =>
      val n = size(ts)
      // 0-based boundary positions: rolling-hash rule + forced final.
      // The per-end-position window hash is element i-(w-1) of the
      // native WindowHashes array (window [i-w+1, i], computed in one
      // tight kernel pass); the filter lambda then only indexes —
      // the old slice+md5 composition re-hashed per position through
      // interpreted lambda frames. w == 1 keeps the degenerate
      // single-token window via the kernel's w >= 2 floor twin below.
      val boundaryHashes =
        if (w >= 2) graft.expressions.WindowHashFunctions.windowHashes(ts, w)
        else transform(ts, t => shingleHash(t))
      bound(boundaryHashes) { wh =>
      val bIdx = filter(sequence(lit(0), n - 1), i =>
        (i === n - 1) ||
          (i >= w - 1 &&
            element_at(wh, i - lit(w - 2)) % m === 0))
      bound(bIdx) { b =>
        // previous boundary per chunk (-1 before the first): chunk j
        // spans 0-based tokens prev+1 .. end
        val prev = concat(array(lit(-1)), slice(b, lit(1), greatest(size(b) - 1, lit(0))))
        zip_with(b, prev, (e, p) => struct(
          concat_ws(" ", slice(ts, p + 2, e - p)).as("chunk"),
          (e - p).cast("long").as("n_tokens")))
      }
      }
    }
  }

  def cdcChunkRows(docs: org.apache.spark.sql.DataFrame,
                   w: Int = 4, maskBits: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(cdcChunksCol(col(textCol), w, maskBits)))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
        col("col.n_tokens").as("n_tokens"),
        shingleHash(col("col.chunk")).as("chunk_hash"))

  /** Chunk-level dedup over content-defined chunks: drop every chunk
    * whose hash was seen earlier (first occurrence by (doc_id,
    * chunk_idx) wins) and rebuild each document from its surviving
    * chunks — the insertion-robust twin of [[graft.dedup.Dedup
    * .spanDedup]], same scale shape: only (doc_id, idx, 60-bit hash)
    * reaches the winner-election exchange, never text; the rebuild
    * recomputes the doc's own chunk array map-side and selects the
    * kept indices. Documents whose every chunk was seen earlier come
    * back with empty text rather than vanishing. */
  def cdcDedup(docs: org.apache.spark.sql.DataFrame,
               w: Int = 4, maskBits: Int = 3,
               textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = Window.partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    val kept = cdcChunkRows(docs, w, maskBits, textCol, idCol)
      .withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") === 1)
      .groupBy("doc_id").agg(sort_array(collect_list(col("chunk_idx"))).as("keep"))
    docs.select(col(idCol).as("doc_id"), cdcChunksCol(col(textCol), w, maskBits).as("chunks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("keep").isNull, lit(""))
          .otherwise(array_join(
            transform(col("keep"), j => element_at(col("chunks"), j + 1).getField("chunk")),
            " "))
          .as("text_dedup"),
        coalesce(size(col("keep")), lit(0)).as("n_chunks_kept"))
  }

  /** The shared distinct-shingle posting: one row per (doc_id,
    * 60-bit span hash), spans hashed map-side so text never reaches
    * an exchange. `shingleSet` is distinct per doc, so rows per hash
    * equal distinct docs per hash (modulo a same-doc 60-bit md5
    * collision, ~2^-61 per span pair — and every oracle counts the
    * same folded rows, so even that cannot diverge a comparison).
    * Feeds [[dupSpanStats]] and [[ngramNovelty]]. */
  private def spanPosting(docs: org.apache.spark.sql.DataFrame, width: Int,
                          textCol: String, idCol: String)
      : org.apache.spark.sql.DataFrame =
    // native kernel + distinct over the LONG hashes: identical rows to
    // hash(distinct shingle strings) — the 60-bit fold is the same
    // derivation, and the scaladoc's collision note already counts by
    // the folded hash — without materializing shingle strings
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(graft.expressions.WindowHashFunctions
          .windowHashes(tokens(col(textCol)), width))).as("sp_h"))

  /** Train→test contamination check (decontamination stage): for each
    * test document, the fraction of its distinct 3-token shingles that
    * appear ANYWHERE in the training corpus.
    *
    * Scale: shingles are hashed to 60-bit longs before anything
    * shuffles — the join is (hash) against (doc_id, hash), never text;
    * the distinct train-shingle table is corpus-sized, so no broadcast
    * hint (Catalyst/AQE picks; at 100 TB it is a shuffled hash join
    * keyed by the hash). */
  def contamination(train: org.apache.spark.sql.DataFrame,
                    test: org.apache.spark.sql.DataFrame,
                    textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame =
    contaminationOfSets(train,
      test.select(col(idCol).as("doc_id"), shingleSet(col(textCol)).as("shingles")),
      textCol)

  /** [[contamination]] against PRECOMPUTED test-side distinct-shingle
    * sets (doc_id, shingles) — the reuse entry point for pipelines
    * that already shingled the test corpus (e.g.
    * [[graft.pipeline.CorpusPipeline.prepare]]'s MinHash stage
    * produces exactly this frame), saving a full re-tokenization scan
    * of the test text. */
  def contaminationOfSets(train: org.apache.spark.sql.DataFrame,
                          testShingles: org.apache.spark.sql.DataFrame,
                          textCol: String = "text")
      : org.apache.spark.sql.DataFrame = {
    // native kernel (see spanPosting): same 60-bit fold, post-hash
    // distinct was already the semantics, no shingle strings built
    val th = train
      .select(explode(array_distinct(graft.expressions.WindowHashFunctions
        .windowHashes(tokens(col(textCol)), 3))).as("h")).distinct()
    // ONE pass over the test shingle sets: explode_outer keeps
    // zero-shingle docs alive (null hash never joins), and the shingle
    // count rides along each exploded row, so totals need no second
    // scan
    val te = testShingles
      .select(col("doc_id"), size(col("shingles")).as("__n"),
        explode_outer(col("shingles")).as("__s"))
      .select(col("doc_id"), col("__n"), shingleHash(col("__s")).as("h"))
    te.join(th.withColumn("__m", lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(first(col("__n")).cast("bigint").as("n_shingles"),
        sum(coalesce(col("__m"), lit(0))).as("n_matched"))
      .select(col("doc_id"), col("n_shingles"), col("n_matched"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(col("n_matched").cast("double") /
            col("n_shingles").cast("double")).as("contamination"))
  }

  /** The k Bloom probe positions of one shingle: the Kirsch-
    * Mitzenmacher two-hash family `(h1 + i·h2) mod mBits` over the two
    * 60-bit md5 halves — the same construction [[graft.expressions
    * .SketchAggregates.cmEstimate]] uses for Count-Min buckets, so
    * every position is reproducible in any engine with md5. The md5 is
    * bound once per shingle; k ≤ 7 keeps `h1 + i·h2 < 2^63`. */
  def bloomPositions(sh: Column, mBits: Int, k: Int): Column = {
    require(k >= 1 && k <= 7, s"k in [1,7], got $k")
    bound(md5(sh)) { hex =>
      val h1 = conv(substring(hex, 1, 15), 16, 10).cast("long")
      val h2 = conv(substring(hex, 16, 15), 16, 10).cast("long")
      transform(sequence(lit(0L), lit((k - 1).toLong)), i => (h1 + i * h2) % mBits)
    }
  }

  /** Fold the eval set's distinct shingles into an `mBits`-wide Bloom
    * bitset, returned as packed little-endian long words.
    *
    * The distinct-position collect is DRIVER-SIDE but bounded by
    * construction: at most `mBits` distinct positions exist (≤ 8 MB of
    * longs at the default 2^20 bits, packing to a 128 KB word array),
    * independent of eval-set size — the same bounded-inline pattern as
    * the IVF centroid collect ([[graft.similarity.Similarity]]).
    * The eval set itself is scanned distributively. Size `mBits` ≥
    * ~10× the eval set's distinct-shingle count × k: a saturated
    * bitset stays deterministic but over-flags uselessly (fill f →
    * false-positive rate f^k). */
  def bloomWordsOfEval(evalDocs: DataFrame, mBits: Int = 1 << 20, k: Int = 3,
                       textCol: String = "text"): Array[Long] = {
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= (1 << 24),
      s"mBits a multiple of 64 in [64, 2^24], got $mBits")
    val words = new Array[Long](mBits / 64)
    evalDocs
      .select(explode(shingleSet(col(textCol))).as("sh"))
      .select(explode(bloomPositions(col("sh"), mBits, k)).as("p"))
      .distinct()
      .collect()
      .foreach { r =>
        val p = r.getLong(0)
        words((p >>> 6).toInt) |= 1L << (p & 63)
      }
    words
  }

  /** Broadcast-Bloom benchmark decontamination — the scale path for
    * [[contamination]] when the corpus is huge and the eval set small
    * (the usual regime: a 100 TB training corpus screened against a
    * fixed benchmark suite). Instead of joining every corpus shingle
    * against an eval-shingle table, the eval shingles are folded into
    * a Bloom bitset once ([[bloomWordsOfEval]]), the bitset rides into
    * the plan as a literal word array, and every corpus document is
    * screened MAP-SIDE with array built-ins: the query is scan →
    * project — no join, no aggregate, ZERO exchanges (spec-asserted),
    * where [[contamination]] shuffles the corpus's exploded shingle
    * hashes.
    *
    * Bloom false positives only OVER-count: `n_flagged` is ≥ the exact
    * matched-shingle count per document (never below — no contaminated
    * shingle is missed), so thresholding errs toward dropping a few
    * clean documents, the safe direction for decontamination. And
    * because the probe positions are md5 derivations, the screen —
    * false positives included — is deterministic and reproducible in
    * any engine: the SQL oracle replays the bitset as a distinct
    * position set and checks all-k-probes membership.
    *
    * Output per corpus document: (doc_id, n_shingles, n_flagged,
    * bloom_frac, flagged). */
  def contaminationBloom(corpus: DataFrame, words: Array[Long], mBits: Int = 1 << 20,
                         k: Int = 3, maxOverlap: Double = 0.1,
                         textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    require(words.length == mBits / 64,
      s"words.length ${words.length} != mBits/64 ${mBits / 64}")
    // All-k-probes screen as ONE native kernel over the shingle array
    // ([[graft.expressions.BloomContamHits]]) — the declarative
    // size(filter(sh, s -> forall(bloomPositions(s), bit))) nested
    // three interpreted higher-order functions and built the md5 hex
    // string + base-16 conv per probe; the kernel runs the identical
    // derivation off the digest bytes in one compiled loop
    // (bit-identical counts; parity spec-pinned).
    corpus.select(col(idCol).as("doc_id"),
        bound(shingleSet(col(textCol))) { sh =>
          struct(size(sh).cast("bigint").as("n"),
            graft.expressions.BloomFunctions
              .bloomContamHits(sh, words, mBits, k).as("f"))
        }.as("__s"))
      .select(col("doc_id"),
        col("__s.n").as("n_shingles"), col("__s.f").as("n_flagged"),
        when(col("__s.n") === 0, lit(0.0))
          .otherwise(col("__s.f").cast("double") / col("__s.n").cast("double"))
          .as("bloom_frac"))
      .withColumn("flagged", col("bloom_frac") > maxOverlap)
  }

  /** Intra-document repetition metrics (Gopher-style quality rules):
    * duplicate-2-gram fraction and most-frequent-2-gram share per doc.
    * Docs with fewer than 2 tokens report zero metrics.
    *
    * Scale: 2-grams are hashed to 60-bit longs and counted with two
    * hash aggregates — only (doc_id, hash) pairs shuffle, never text;
    * no per-row O(n²) higher-order scan, so a 10k-token document costs
    * 10k narrow rows, not 10^8 comparisons. */
  def repetition(docs: org.apache.spark.sql.DataFrame,
                 textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), explode(shingles(col(textCol), 2)).as("g"))
      .select(col("doc_id"), shingleHash(col("g")).as("h"))
    val per = grams.groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
    val rep = per.groupBy("doc_id").agg(
      sum(col("c")).as("n_2grams"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_count"))
    docs.select(col(idCol).as("doc_id"))
      .join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        when(coalesce(col("n_2grams"), lit(0L)) === 0, lit(0.0))
          .otherwise((col("n_2grams") - col("n_distinct")).cast("double") /
            col("n_2grams").cast("double")).as("dup_2gram_frac"),
        when(coalesce(col("n_2grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("top_count").cast("double") /
            col("n_2grams").cast("double")).as("top_2gram_frac"))
  }

  /** C4/Gopher-style corpus filter, composed from the engine's own
    * primitives: keep a document iff it (a) has at least `minTokens`
    * whitespace tokens, (b) is its exact-duplicate group's
    * representative (minimum id per md5(text)), and (c) is not
    * dominated by one repeated 2-gram (share < `maxTopGramFrac`).
    * Returns every doc with its three flags + the final keep verdict,
    * so downstream can audit why a row dropped.
    *
    * Scale: (b) is one narrow (md5, id) shuffle — the window min runs
    * over the text hash, text itself never moves; (c) reuses
    * [[repetition]]'s two hash aggregates. */
  def corpusFilter(docs: org.apache.spark.sql.DataFrame,
                   minTokens: Int = 20, maxTopGramFrac: Double = 0.2,
                   textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // narrow (id, token count, text hash) projection BEFORE the window:
    // the dup-group exchange then shuffles 3 slim columns, not the text
    val slim = docs.select(col(idCol).as("doc_id"),
      wsTokenCount(col(textCol)).as("__nt"), md5(col(textCol)).as("__th"))
    val w = Window.partitionBy(col("__th"))
    val flags = slim.select(col("doc_id"),
        (col("__nt") >= minTokens).as("len_ok"),
        (col("doc_id") === min(col("doc_id")).over(w)).as("not_dup"))
    flags.join(repetition(docs, textCol, idCol)
        .select(col("doc_id"), (col("top_2gram_frac") < maxTopGramFrac).as("rep_ok")),
        "doc_id")
      .select(col("doc_id"), col("len_ok"), col("not_dup"), col("rep_ok"),
        (col("len_ok") && col("not_dup") && col("rep_ok")).as("keep"))
  }

  /** TF-IDF top terms per document. The relevance score uses the
    * log-free rational form `tf * (N + 1) / (df + 1)` — monotone in the
    * classic tf·idf for fixed tf, and (unlike `ln`) exactly reproducible
    * across engines, so results stay hash-comparable to a SQL oracle.
    *
    * Plan shape at scale: explode → two hash aggregates (term counts,
    * doc frequencies) → join tf↔df on `term` (strategy left to
    * Catalyst/AQE: at web scale the distinct-term table is billions of
    * rows, so a mandatory broadcast would OOM the driver — both sides
    * are already keyed by `term` and shuffle-hash-join cleanly) →
    * per-doc top-k via rank filter, which Spark bounds map-side with
    * WindowGroupLimit. The corpus size N is folded into the plan as a
    * one-row aggregate broadcast-nested-loop-joined onto tf — no eager
    * driver action at operator-construction time. Document text never
    * shuffles.
    */
  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", table A1 — public paper): word-count
    * bounds, mean-word-length bounds, symbol-to-word ratio, bullet- and
    * ellipsis-line fractions, alphabetic-word fraction, and
    * required-stopword hits. All measures are INTEGER counts and every
    * ratio rule is compared cross-multiplied (`sum*10 <= n*ratio*10`)
    * so the flags are engine-exact with no floating-point divide.
    *
    * Pure per-row projection (codegen'd built-ins, token array bound
    * once) — no shuffle, embarrassingly parallel at any scale.
    *
    * `minRequiredHits` defaults to Gopher's 2; corpora whose vocabulary
    * lacks most closed-class words (e.g. keyword-soup logs) can lower
    * it — the registered `quality_gopher` query uses 1 for the
    * synthetic corpus.
    */
  val gopherMinWords = 50
  val gopherMaxWords = 100000
  val gopherMinMeanWordLen = 3 // inclusive bounds, integer-exact
  val gopherMaxMeanWordLen = 10
  val gopherRequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherMeasures(text: Column): Column =
    bound(tokens(text)) { t =>
      bound(split(text, "\n")) { lines =>
        val req = array(gopherRequiredStops.map(lit): _*)
        struct(
          size(t).cast("bigint").as("n_words"),
          aggregate(transform(t, w => length(w).cast("bigint")),
            lit(0L), (acc, x) => acc + x).as("word_len_sum"),
          size(filter(t, w => w.rlike("[a-z]"))).cast("bigint").as("n_alpha_words"),
          size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0)))
            .cast("bigint").as("n_symbols"),
          size(lines).cast("bigint").as("n_lines"),
          size(filter(lines, l => trim(l).rlike("^[-*•]")))
            .cast("bigint").as("n_bullet_lines"),
          size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
            .cast("bigint").as("n_ellipsis_lines"),
          size(filter(req, w => array_contains(t, w)))
            .cast("bigint").as("req_stop_hits"))
      }
    }

  /** Rule flags + keep decision from `gopherMeasures`. Ratio rules:
    * symbols/words <= 0.1, bullet lines <= 0.9, ellipsis lines <= 0.3,
    * alpha words >= 0.8 — all cross-multiplied integer comparisons. */
  def gopherFlags(m: Column, minRequiredHits: Int = 2): Column = {
    val n = m.getField("n_words")
    val nl = m.getField("n_lines")
    val wordCountOk = n >= gopherMinWords && n <= gopherMaxWords
    val wordLenOk = m.getField("word_len_sum") >= n * gopherMinMeanWordLen &&
      m.getField("word_len_sum") <= n * gopherMaxMeanWordLen
    val symbolOk = m.getField("n_symbols") * 10 <= n
    val bulletOk = m.getField("n_bullet_lines") * 10 <= nl * 9
    val ellipsisOk = m.getField("n_ellipsis_lines") * 10 <= nl * 3
    val alphaOk = m.getField("n_alpha_words") * 10 >= n * 8
    val stopOk = m.getField("req_stop_hits") >= minRequiredHits
    struct(
      wordCountOk.as("word_count_ok"),
      wordLenOk.as("word_len_ok"),
      symbolOk.as("symbol_ok"),
      bulletOk.as("bullet_ok"),
      ellipsisOk.as("ellipsis_ok"),
      alphaOk.as("alpha_ok"),
      stopOk.as("stopword_ok"),
      (wordCountOk && wordLenOk && symbolOk && bulletOk &&
        ellipsisOk && alphaOk && stopOk).as("keep"))
  }

  /** Keyword search over the corpus: score every document against a
    * literal query-term list with the tf·idf-monotone rational
    * `Σ_i tf_i · (N+1) / (df_i+1)` and return the top-k. To keep the
    * score ENGINE-EXACT the sum is carried as one integer numerator
    * over the common denominator `Π_j (df_j+1)`:
    * `score_num = Σ_i tf_i · (N+1) · Π_{j≠i} (df_j+1)` — no double
    * accumulates across terms (double + is order-sensitive; integer +
    * is not), and the reported double is a single final division.
    * Bounded: numerator ≤ |q| · tf · (N+1) · (N+1)^(|q|-1); with the
    * default 3-term query this needs N·tf ≲ 10^4·10^2 — inside long
    * range below ~10^5 docs per shard; larger corpora should shard or
    * drop to the per-term double form.
    *
    * Plan shape: explode → tf hash-agg (term-filtered FIRST, so only
    * query-term postings survive the explode) → two one-row broadcast
    * stats (per-term df pivot, corpus N) → map-side score → global
    * top-k via TakeOrderedAndProject. The inverted-index pattern
    * without materializing an index; document text never shuffles.
    */
  def keywordSearch(docs: org.apache.spark.sql.DataFrame, terms: Seq[String],
                    k: Int = 20, textCol: String = "text",
                    idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, s"1..8 literal terms, got ${terms.size}")
    val posting = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = posting.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docTf = tf.groupBy("doc_id").pivot("term", terms).agg(first("tf"))
      .select(col("doc_id") +:
        terms.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"__tf_$t")): _*)
    // per-term document frequency as ONE broadcastable row, derived
    // from docTf (not from a second pass over `tf`) so the expensive
    // scan→explode→tf subtree is IDENTICAL in both branches and
    // ReuseExchange runs it once
    val dfCols = terms.map(t =>
      sum(when(col(s"__tf_$t") > 0, 1L).otherwise(0L)).as(s"__df_$t"))
    val dfRow = docTf.agg(dfCols.head, dfCols.tail: _*)
    val nRow = docs.select(col(idCol)).distinct().agg(count(lit(1)).as("__n"))
    val scored = docTf.crossJoin(broadcast(dfRow)).crossJoin(broadcast(nRow))
    val denom = terms.map(t => col(s"__df_$t") + 1L).reduce(_ * _)
    val num = terms.map { t =>
      val others = terms.filterNot(_ == t)
      val prodOthers =
        if (others.isEmpty) lit(1L)
        else others.map(o => col(s"__df_$o") + 1L).reduce(_ * _)
      col(s"__tf_$t") * (col("__n") + 1L) * prodOthers
    }.reduce(_ + _)
    scored
      .withColumn("score_num", num)
      .withColumn("score", col("score_num").cast("double") / denom.cast("double"))
      .filter(col("score_num") > 0)
      .orderBy(col("score_num").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id") +: terms.map(t => col(s"__tf_$t").as(s"tf_$t")) :+
        col("score_num") :+ col("score"): _*)
  }

  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, k: Int = 5,
                    textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // one row, always broadcast-safe; same semantics as distinct().count()
    val n = docs.select(col(idCol)).distinct().agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        (col("tf") * (col("__n") + 1)).cast("double") / (col("df") + 1).cast("double"))
      .drop("__n")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Okapi BM25 ranking for a literal query-term list, with the
    * standard constants expressed as rationals (k1 = 6/5, b = 3/4) so
    * every per-term score is ONE division of two exactly-computed
    * longs:
    *
    *   tf-part = tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·N/T)
    *           = 44·tf·T / (20·T·tf + 6·T + 18·dl·N)
    *   idf     = (N+1)/(df+1)   (same monotone surrogate as
    *                             [[keywordSearch]] — no ln, exact)
    *   score_t = 44·tf·T·(N+1) / ((df+1)·(20·T·tf + 6·T + 18·dl·N))
    *
    * where dl = document token count, N = corpus docs, T = corpus
    * tokens (avgdl = T/N is never materialized as a double). The ≤8
    * per-term doubles are summed inside a single fixed-order
    * projection expression — deterministic IEEE arithmetic, never a
    * SUM across rows — so the result is hash-exact cross-engine.
    * Long bounds: num ≤ 44·tf·T·(N+1) needs tf·T·N ≲ 2·10^17 —
    * fine to ~10^7 docs/shard; larger corpora score per shard.
    *
    * Plan shape mirrors [[keywordSearch]]: term-filtered explode →
    * tf hash-agg → pivot, plus two one-row broadcast stat frames
    * (per-term df, corpus N/T); document text never shuffles and the
    * top-k is a TakeOrderedAndProject, not a global sort. */
  def bm25Search(docs: org.apache.spark.sql.DataFrame, terms: Seq[String],
                 k: Int = 20, textCol: String = "text",
                 idCol: String = "doc_id",
                 requireAll: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, s"1..8 literal terms, got ${terms.size}")
    val posting = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = posting.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docTf0 = tf.groupBy("doc_id").pivot("term", terms).agg(first("tf"))
      .select(col("doc_id") +:
        terms.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"__tf_$t")): _*)
    // conjunctive (AND) retrieval: only docs containing EVERY term
    // compete, and df is computed over that competing set — the
    // self-consistent convention, replayable in SQL. The map-side
    // filter lands before the join, so the AND query is strictly
    // cheaper than the OR query, as it should be.
    val docTf =
      if (requireAll)
        docTf0.filter(terms.map(t => col(s"__tf_$t") > 0).reduce(_ && _))
      else docTf0
    val dl = docs.select(col(idCol).as("doc_id"),
      wsTokenCount(col(textCol)).as("dl"))
    val statsRow = dl.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__t"))
    rankBm25(docTf.join(dl, "doc_id"), statsRow, terms, k)
  }

  /** The shared BM25 scoring tail — ONE set of expressions for the
    * ad-hoc path ([[bm25Search]]) and the persisted-index path
    * ([[graft.search.Bm25Index.topK]]), so index-served results are
    * bit-identical to the ad-hoc scan by construction (same rational
    * constants, same per-term double divisions summed in the same
    * order). `docTfDl` carries (doc_id, dl, __tf_<term>... for docs
    * matching ≥1 term); `statsRow` carries the WHOLE-corpus
    * (__n, __t) — the corpus the df/idf statistics are relative to,
    * which for the index is the stats table's delta sum. */
  private[graft] def rankBm25(docTfDl: org.apache.spark.sql.DataFrame,
                              statsRow: org.apache.spark.sql.DataFrame,
                              terms: Seq[String], k: Int)
      : org.apache.spark.sql.DataFrame = {
    val dfCols = terms.map(t =>
      sum(when(col(s"__tf_$t") > 0, 1L).otherwise(0L)).as(s"__df_$t"))
    val dfRow = docTfDl.agg(dfCols.head, dfCols.tail: _*)
    val scored = docTfDl
      .crossJoin(broadcast(dfRow)).crossJoin(broadcast(statsRow))
    def termScore(t: String): Column = {
      val num = (lit(44L) * col(s"__tf_$t") * col("__t") * (col("__n") + 1L))
        .cast("double")
      val den = ((col(s"__df_$t") + 1L) *
        (lit(20L) * col("__t") * col(s"__tf_$t") + lit(6L) * col("__t") +
          lit(18L) * col("dl") * col("__n"))).cast("double")
      when(col(s"__tf_$t") > 0, num / den).otherwise(lit(0.0))
    }
    val score = terms.map(termScore).reduce(_ + _)
    scored.withColumn("__score", score)
      .filter(col("__score") > 0)
      .orderBy(col("__score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id") +: col("dl") +:
        terms.map(t => col(s"__tf_$t").as(s"tf_$t")) :+
        round(col("__score"), 9).as("score"): _*)
  }

  /** Per-document TOKEN ENTROPY in exact fixed point — the lexical-
    * diversity quality signal (a near-zero entropy document is a
    * repeated token or boilerplate; filtering on it is standard in
    * crawl curation, e.g. the Gopher repetition rules' information-
    * theoretic cousin). Shannon entropy over the document's token
    * distribution, H = Σ (c/n)·log2(n/c), carried in 1/2^16 bits via
    * the 16-step integer log2 (`entropy_fp16 = Σ c·(lg n − lg c) div
    * n`) — order-free integer sums, so any engine reproduces the
    * exact value where a double Σ p·log p never hashes stable.
    *
    * Scale shape: one (doc, term) count aggregate + one narrow
    * per-doc rollup; text never crosses an exchange (only token
    * hashes would at 100 TB — swap the term string for its 60-bit
    * hash upstream of the exchange, the shingle discipline). */
  def tokenEntropy(docs: org.apache.spark.sql.DataFrame,
                   textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("sym"))
      .filter(length(col("sym")) > 0)
      .groupBy(col("doc_id"), col("sym")).agg(count(lit(1)).as("c"))
    // Σ c·(lg n − lg c) = n·lg n − Σ c·lg c (all exact integers, no
    // division until the end), so the per-doc rollup needs no tf ⋈ n
    // self-join — the two chained aggregates share one exchange less
    // and lg runs once per (doc, term) instead of twice per joined row.
    tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * ilog2Fp16(col("c"))).as("slc"))
      .withColumn("lgn", ilog2Fp16(col("n")))
      .select(col("doc_id"), expr("(n * lgn - slc) div n").as("entropy_fp16"))
  }

  /** Multinomial Naive Bayes text classifier, trained AND served in
    * exact integer fixed point (McCallum & Nigam, AAAI-98 workshop —
    * the event model fastText-class data-curation classifiers reduce
    * to at their simplest) — the TRAINABLE half of the corpus
    * curation tier: domain/source attribution, quality-proxy
    * classification, contamination triage. Every production LLM data
    * pipeline trains such a classifier on labeled seed data and
    * scores the crawl with it.
    *
    * Training: per-(label, term) counts, add-one smoothing, and
    * per-term costs `26·2^16 − ilog2fp16((c+1)·1e6 div (T_l + V))` —
    * the unigram trainer's fixed-point log2 convention, so the whole
    * model is integer and any engine replays it bit-for-bit. The
    * model stays SPARSE (observed (label, term) pairs only, never the
    * dense label × vocab cross): unseen-in-label terms score the
    * label's closed-form default cost (c = 0) at serve time.
    *
    * Serving: per-doc term frequencies cross the (tiny, broadcast)
    * label list, left-join the sparse cost table on (label, term),
    * and the per-(doc, label) total is `prior_cost + Σ tf·cost` — an
    * integer sum, order-free. Prediction = the minimum-cost label,
    * ties to the lexicographically smaller. Unknown terms (absent
    * from the training vocabulary) drop — the standard open-vocab
    * rule.
    *
    * Scale shape: training is one (label, term) aggregate; scoring
    * shuffles (doc, term, tf) × |labels| narrow rows and joins the
    * sparse model on (label, term) — text never crosses an exchange,
    * and the only broadcast is |labels| rows of stats. Returns
    * (doc_id, pred_label, cost_fp). */
  def nbClassify(train: org.apache.spark.sql.DataFrame,
                 score: org.apache.spark.sql.DataFrame,
                 textCol: String = "text", labelCol: String = "source",
                 idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val toks = train.select(col(labelCol).as("label"),
        explode(tokens(col(textCol))).as("sym"))
      .filter(length(col("sym")) > 0)
    val cnt = toks.groupBy(col("label"), col("sym")).agg(count(lit(1)).as("c"))
    val lt = cnt.groupBy(col("label")).agg(sum(col("c")).as("t"))
    val vs = cnt.select(col("sym")).distinct().agg(count(lit(1)).as("v"))
    // sparse per-(label, term) costs under add-one smoothing
    val model = cnt.join(lt, "label").crossJoin(broadcast(vs))
      .withColumn("p", expr("((c + 1) * 1000000) div (t + v)"))
      .select(col("label"), col("sym"),
        (lit(26L * 65536L) - ilog2Fp16(col("p"))).as("cost"))
    // per-label serve-time stats: the c = 0 default cost and the
    // smoothed document prior — |labels| rows, broadcastable
    val nd = train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n"))
    val ns = nd.agg(sum(col("n")).as("nn"), count(lit(1)).as("l"))
    val stats = lt.join(nd, "label").crossJoin(broadcast(vs)).crossJoin(broadcast(ns))
      .withColumn("p0", expr("1000000 div (t + v)"))
      .withColumn("pp", expr("((n + 1) * 1000000) div (nn + l)"))
      .select(col("label"),
        (lit(26L * 65536L) - ilog2Fp16(col("p0"))).as("default_cost"),
        (lit(26L * 65536L) - ilog2Fp16(col("pp"))).as("prior_cost"))
    val tf = score.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("sym"))
      .filter(length(col("sym")) > 0)
      .groupBy(col("doc_id"), col("sym")).agg(count(lit(1)).as("tf"))
    tf.crossJoin(broadcast(stats))
      .join(model, Seq("label", "sym"), "left")
      .groupBy(col("doc_id"), col("label"))
      .agg((first(col("prior_cost")) +
        sum(col("tf") * coalesce(col("cost"), col("default_cost")))).as("total"))
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("label"), col("total")),
        struct(col("total"), col("label"))).as("best"))
      .select(col("doc_id"), col("best.label").as("pred_label"),
        col("best.total").as("cost_fp"))
  }

  /** Corpus-trained bigram-LM quality score — the CCNet-style signal
    * "how surprising is this document under a language model of the
    * corpus itself". MLE bigram probabilities p(w₂|w₁) =
    * c(w₁w₂)/c(w₁·) are carried in fixed-point millionths via integer
    * floor division, so the per-document SUM is an integer sum —
    * order-independent and engine-portable (a double log-prob sum
    * would be order-sensitive and never hash-stable). Low
    * `avg_p_fp` = improbable token transitions = low-quality /
    * out-of-distribution text. Counts are self-trained (the document's
    * own mass included — standard for corpus-level filtering; no
    * leave-one-out join).
    *
    * Plan shape: ONE shingle projection, scanned once — bigram and
    * prefix counts ride two count windows over the posting's own
    * partitionings (the aggregate-plus-join form re-scans the corpus
    * per count table); only (doc_id, bigram, prefix) rows cross the
    * exchanges, never the text. At 100 TB hash the bigram strings to
    * 64-bit keys before the exchanges, and add unseen-bigram
    * smoothing via a `c2 >= minCount` gate inside the projection. */
  def lmBigramScore(docs: org.apache.spark.sql.DataFrame,
                    textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    val posting = docs.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), 2)).as("bigram"))
      .withColumn("prefix", substring_index(col("bigram"), " ", 1))
    // bigram and prefix counts via windows over the posting's own
    // partitionings — the aggregate-plus-join form scans and explodes
    // the corpus THREE times (the posting feeds both count tables and
    // the join); two windows pay comparable exchanges and scan once
    import org.apache.spark.sql.expressions.Window
    val perDoc = posting
      .withColumn("c2", count(lit(1)).over(Window.partitionBy(col("bigram"))))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy(col("prefix"))))
      // fixed-point millionths, floor division: exact integers both
      // engines, so the sum below is order-independent
      .withColumn("p_fp", expr("(1000000 * c2) div c1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_fp")).as("sum_p_fp"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_p_fp"), lit(0L)).as("sum_p_fp"))
      .withColumn("avg_p_fp",
        when(col("n_bigrams") > 0,
          col("sum_p_fp").cast("double") / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Cross-source span-overlap matrix — corpus forensics for "which
    * sources plagiarize/mirror each other": for every source pair, the
    * number of DISTINCT `width`-token spans both carry. Exact
    * fingerprints rarely cross source boundaries (mirrors edit
    * headers/footers); spans catch the shared boilerplate and quoted
    * passages that matter for mixing decisions and contamination
    * triage.
    *
    * Scale shape: spans md5-fold to longs before the exchange (same
    * convention as [[dupSpanStats]] — identical fold both engines);
    * the per-span self-join fans out at most nSources rows per span
    * side, and only (source, span_hash) pairs ever shuffle. */
  def sourceSpanOverlap(docs: org.apache.spark.sql.DataFrame, width: Int = 8,
                        textCol: String = "text",
                        sourceCol: String = "source")
      : org.apache.spark.sql.DataFrame = {
    // native kernel: per-position window hashes in one pass — the
    // shingle STRING never materializes (the value is the identical
    // 60-bit md5 fold, and the post-hash distinct was already the
    // semantics here)
    val sp = docs.select(col(sourceCol).as("source"),
        explode(array_distinct(graft.expressions.WindowHashFunctions
          .windowHashes(tokens(col(textCol)), width))).as("sp_h"))
      .distinct()
    val a = sp.select(col("source").as("source_a"), col("sp_h"))
    val b = sp.select(col("source").as("source_b"), col("sp_h"))
    a.join(b, "sp_h").filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
  }

  /** Feature-hashed term-frequency vectors (the "hashing trick",
    * Weinberger et al. 2009): token → 60-bit md5 → bucket = hash mod
    * `dim`; vec[b] = tokens landing in bucket b. Vectorizes text with
    * NO trained model and NO vocabulary dictionary — the standard
    * corpus-scale choice, where a vocab table would itself be big
    * data — and bridges the text tier to the similarity/ANN tier
    * (counts are small integers, exact in float32, so cosine over
    * hashed vectors is engine-exact).
    *
    * Plan: explode → (doc, bucket, count) hash-agg → per-doc map →
    * dense array fill; only slim (doc_id, bucket, count) triples cross
    * an exchange, never tokens or text. Null-text docs get the zero
    * vector (total via the left join). */
  def hashedTf(docs: org.apache.spark.sql.DataFrame, dim: Int = 64,
               textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("t"))
    val b = tok.withColumn("bucket",
        (conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long") % dim).cast("int"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
    val m = b.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("c")))).as("__m"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(m, Seq("doc_id"), "left")
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__m"), i.cast("int")), lit(0L))).as("vec"))
  }

  /** Per-document duplicated-span statistics — the "what fraction of
    * this document's n-token windows also occur elsewhere" metric that
    * drives exact-substring dedup decisions (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * measures dup fraction before cutting). Spans are DISTINCT
    * `width`-token shingles per document; a span is duplicated when
    * ≥2 distinct documents carry it.
    *
    * Scale shape: spans are md5-folded to a long BEFORE the exchange,
    * so only (doc_id, span_hash) pairs shuffle — never span text, and
    * both engines fold identically so hash collisions (if any) cannot
    * diverge the oracle. Two narrow hash-aggs + one narrow join. */
  /** Term co-occurrence over the `topN` highest-document-frequency
    * tokens: for each unordered term pair, in how many documents both
    * occur, alongside each term's own document frequency — the exact
    * integer inputs to PMI/lift (PMI = ln(N·n_both/(n_a·n_b)); the
    * log is left to the reader so the table stays engine-exact —
    * cross-engine ln differs in final ulps, integer counts never do).
    *
    * Scale shape: the vocabulary is cut to `topN` FIRST (tie-broken
    * by token text, so the cut is deterministic), and the tiny term
    * list broadcasts back onto the (doc, token) pairs — the
    * within-doc self-join is then bounded by C(topN, 2) per document,
    * never vocabulary-squared. Token text crosses the exchange only
    * for the topN survivors. */
  def termCooccurrence(docs: org.apache.spark.sql.DataFrame, topN: Int = 50,
                       textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    require(topN >= 2, s"need topN >= 2, got $topN")
    val dt = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
    val top = dt.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc).limit(topN)
    val member = dt.join(broadcast(top), "term")
    member.select(col("doc_id"), col("term").as("term_a"), col("df").as("n_a"))
      .join(member.select(col("doc_id"), col("term").as("term_b"), col("df").as("n_b")),
        "doc_id")
      .filter(col("term_a") < col("term_b"))
      .groupBy("term_a", "term_b", "n_a", "n_b")
      .agg(count(lit(1)).as("n_both"))
      .select("term_a", "term_b", "n_a", "n_b", "n_both")
  }

  /** Span-share candidate graph: one undirected edge per document
    * pair sharing at least one duplicated `width`-token span — the
    * exact-substring analogue of an LSH candidate graph, feeding the
    * graph operators (triangle counts separate clique-like boilerplate
    * families from star-shaped template hubs).
    *
    * `maxDocsPerSpan` is the boilerplate guard: a span carried by m
    * docs yields C(m,2) pairs, so one universal footer would turn the
    * build quadratic at scale; spans above the cap are dropped (they
    * are boilerplate, not kinship evidence — same rationale as
    * [[graft.dedup.Dedup.DefaultBucketCap]]). Spans md5-fold to longs
    * before the exchange; span text never shuffles. */
  def spanShareEdges(docs: org.apache.spark.sql.DataFrame, width: Int = 8,
                     maxDocsPerSpan: Int = 20,
                     textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    // native kernel (see spanPosting): same 60-bit fold per distinct
    // window, no shingle strings built
    val sp = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(graft.expressions.WindowHashFunctions
          .windowHashes(tokens(col(textCol)), width))).as("sp_h"))
    val sel = sp.groupBy("sp_h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd").between(2, maxDocsPerSpan))
      .select("sp_h")
    val member = sp.join(sel, "sp_h")
    member.select(col("sp_h"), col("doc_id").as("a"))
      .join(member.select(col("sp_h"), col("doc_id").as("b")), "sp_h")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  def dupSpanStats(docs: org.apache.spark.sql.DataFrame, width: Int = 8,
                   textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    // per-span doc count via a window over the posting's own hash
    // partitioning: the count-distinct-aggregate-plus-join form scans
    // and explodes the corpus TWICE (the posting feeds both sides);
    // see [[spanPosting]] for the rows-equal-distinct-docs argument
    import org.apache.spark.sql.expressions.Window
    val perDoc = spanPosting(docs, width, textCol, idCol)
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(col("sp_h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        when(col("n_spans") > 0,
          col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
          .otherwise(lit(0.0)))
  }

  // ----------------------------------------------------------------
  // BPE tokenizer training (Sennrich et al., ACL 2016)
  // ----------------------------------------------------------------

  /** One BPE training step's pair table: weighted counts of ADJACENT
    * symbol pairs across the current word segmentations, each word
    * type weighted by its corpus frequency (adjacent duplicates count
    * with multiplicity, per the algorithm). `segs` has
    * (word, freq, syms: array<string>). */
  private def bpePairCounts(segs: DataFrame): DataFrame = {
    val pairs = when(size(col("syms")) >= 2,
      transform(sequence(lit(1), size(col("syms")) - 1), j =>
        struct(element_at(col("syms"), j).as("l"),
          element_at(col("syms"), (j + 1).cast("int")).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
    segs.select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.l").as("sym_left"), col("p.r").as("sym_right"))
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** Apply one merge (the 1-row `winner` frame, broadcast) to every
    * segmentation: left-to-right non-overlapping replacement of the
    * adjacent pair (l, r) by the fused symbol l||r — a fold that
    * replaces the accumulator's last element when it is `l` and the
    * incoming symbol is `r`. After fusing, the new last element is
    * l||r (strictly longer than l), so it can never re-match as the
    * left of the same pair — exactly the scan semantics. */
  private def bpeApplyMerge(segs: DataFrame, winner: DataFrame): DataFrame = {
    val merged = aggregate(
      slice(col("syms"), lit(2), size(col("syms")) - 1),
      array(element_at(col("syms"), 1)),
      (acc, x) =>
        when(element_at(acc, -1) === col("__ml") && x === col("__mr"),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(col("__ml"), col("__mr")))))
          .otherwise(concat(acc, array(x))))
    segs.crossJoin(broadcast(
        winner.select(col("sym_left").as("__ml"), col("sym_right").as("__mr"))))
      .select(col("word"), col("freq"), merged.as("syms"))
  }

  /** Test hook: the merge fold behind [[bpeTrain]], callable on a
    * crafted (segs, winner) pair so the property spec can compare it
    * against a reference scan implementation. */
  private[graft] def bpeApplyMergeForTest(segs: DataFrame,
                                          winner: DataFrame): DataFrame =
    bpeApplyMerge(segs, winner)

  /** BPE tokenizer-training merge table: the first `nMerges` merges
    * learned from the corpus, `(iter, sym_left, sym_right,
    * pair_count)` — the most frequent adjacent symbol pair per round,
    * ties broken lexicographically so the trained vocabulary is
    * deterministic in any engine.
    *
    * Scale shape: training runs over the word-TYPE table (words ×
    * their corpus frequency), not the token stream — the per-round
    * work is proportional to the vocabulary, not the corpus, after
    * the single initial word-count aggregation over the text. Each
    * round is: narrow pair-count aggregate → 1-row argmax broadcast →
    * codegen'd fold re-segmentation; the winner never touches the
    * driver (no collect — a 1-row crossJoin carries it into the
    * lambda), and `localCheckpoint` cuts the growing plan per round
    * exactly like the connected-components loop. */
  def bpeTrain(df: DataFrame, textCol: String = "text",
               nMerges: Int = 2): DataFrame =
    bpeRounds(df, textCol, nMerges)._1

  /** Vocabulary after `nMerges` BPE rounds: the top-`topN` symbols of
    * the final segmentations by corpus-weighted count — the train →
    * encode loop closed (what the learned tokenizer would actually
    * emit). Ties break lexicographically; counts are exact integers. */
  def bpeVocab(df: DataFrame, textCol: String = "text",
               nMerges: Int = 2, topN: Int = 30): DataFrame =
    bpeRounds(df, textCol, nMerges)._2
      .select(col("freq"), explode(col("syms")).as("sym"))
      .groupBy("sym").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("sym").asc)
      .limit(topN)

  /** The shared training loop: returns (merge table, final
    * segmentations). The final-round apply is plan-only until someone
    * consumes the segmentations — lazy evaluation makes `bpeTrain`
    * pay nothing for it. */
  private def bpeRounds(df: DataFrame, textCol: String,
                        nMerges: Int): (DataFrame, DataFrame) = {
    require(nMerges >= 1, s"need nMerges >= 1, got $nMerges")
    val words = df.select(
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
          .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var segs = words.select(col("word"), col("freq"),
      transform(sequence(lit(1), length(col("word"))), i =>
        col("word").substr(i, lit(1))).as("syms"))
    val merges = Seq.newBuilder[DataFrame]
    var prevSegsCp: Option[DataFrame] = None
    for (i <- 1 to nMerges) {
      segs = segs.localCheckpoint()
      // checkpointing round i consumed round i−1's blocks (the lazy
      // merge-apply chain reads them exactly once) — release them
      prevSegsCp.foreach(graft.core.Checkpoints.releaseAll)
      prevSegsCp = Some(segs)
      val winner = bpePairCounts(segs)
        .orderBy(col("pair_count").desc, col("sym_left"), col("sym_right"))
        .limit(1)
        .localCheckpoint()
        // the checkpoint replaces the plan with a bare RDD scan, erasing
        // the provable 1-row bound; re-asserting it is free (the frame
        // IS one row) and keeps the downstream crossJoin visibly linear
        // to plan linting
        .limit(1)
      merges += winner.select(lit(i.toLong).as("iter"),
        col("sym_left"), col("sym_right"), col("pair_count"))
      segs = bpeApplyMerge(segs, winner)
    }
    (merges.result().reduce(_ unionAll _), segs)
  }

  /** The trained tokenizer APPLIED to the corpus — per-document token
    * counts under the learned merge table, closing the train → encode
    * loop at the document level: `n_bpe_tokens` is what the tokenizer
    * of [[bpeTrain]] would emit for each doc, `compression_fp` the
    * chars-per-token ratio in fixed-point millionths (the standard
    * "how well does this tokenizer fit this corpus" measure).
    *
    * Scale shape: encoding never re-runs the merge fold per document —
    * each word TYPE's token count comes from the training
    * segmentations (vocabulary-sized), and the corpus-sized side only
    * tokenizes to words and joins on the word key. That join is the
    * plan's one wide edge; the vocabulary side is aggregate-shrunk
    * (word, n_syms, n_chars) and AQE broadcasts it when it fits —
    * at web scale it stays a shuffle join on the word key, which is
    * exactly how distributed tokenizer encoding is done. Docs with no
    * `[a-z]+` word count zero (left join). */
  def bpeEncodeStats(df: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", nMerges: Int = 2): DataFrame = {
    val lens = bpeRounds(df, textCol, nMerges)._2
      .select(col("word"), size(col("syms")).cast("bigint").as("n_syms"),
        length(col("word")).cast("bigint").as("n_chars"))
    val docWords = df.select(col(idCol).as("doc_id"),
      explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as("word"))
    val perDoc = docWords.join(lens, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"),
        sum(col("n_chars")).as("n_char_tokens"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        coalesce(col("n_char_tokens"), lit(0L)).as("n_char_tokens"))
      .withColumn("compression_fp",
        when(col("n_bpe_tokens") > 0,
          expr("(1000000 * n_char_tokens) div n_bpe_tokens"))
          .otherwise(lit(0L)))
  }

  /** Deterministic fixed-point log2 in 1/2^16 units over an integer
    * p in [1, 2^20): `length(bin(p)) - 1` gives the integer part (the
    * HLL register discipline) and 16 squaring steps extract the
    * fraction bits — PURE integer arithmetic throughout (the squares
    * stay under 2^44), so any engine replays it bit-exactly where a
    * double `ln`/`log2` could differ in its last ulp and flip a
    * Viterbi tie. */
  private[graft] def ilog2Fp16(p: Column): Column =
    graft.expressions.IntegerVectorFunctions.ilog2Fp16(p.cast("long"))

  /** Smoothed integer probabilities + Viterbi piece costs for one
    * unigram-LM vocabulary state: p_micro = (cnt+1)·1e6 div (Σcnt+V)
    * (add-one smoothing keeps every piece usable), cost =
    * 26·2^16 − ilog2(p_micro) > 0 in 1/2^16 nats-of-log2. One-row
    * stats crossJoin — the ivf-stats broadcast shape. */
  private def unigramProbed(vocab: DataFrame): DataFrame = {
    val stats = vocab.agg(sum(col("cnt")).as("__t"), count(lit(1)).as("__v"))
    vocab.crossJoin(broadcast(stats))
      .withColumn("p_micro", expr("((cnt + 1) * 1000000) div (__t + __v)"))
      .withColumn("cost", lit(26L * 65536L) - ilog2Fp16(col("p_micro")))
      .drop("__t", "__v")
  }

  /** Unigram-LM tokenizer training (Kudo, "Subword Regularization",
    * ACL 2018 — the SentencePiece unigram model), in the hard-EM
    * (Viterbi) variant that stays engine-exact:
    *
    *  - seed vocabulary: every substring of length ≤ `maxPiece` of the
    *    word TYPES, corpus-weighted; all single characters (coverage)
    *    plus the top `seedMulti` multi-character pieces;
    *  - E-step: each word type takes its MINIMUM-COST segmentation
    *    under the current model — cost per piece from the fixed-point
    *    integer log2 of its smoothed millionths probability, ties
    *    broken by the piece-path string, so the best path is a total
    *    deterministic order any engine reproduces;
    *  - M-step: piece counts from the best paths (word-frequency
    *    weighted), probabilities re-derived by integer floor division;
    *  - prune: singles always survive; multi-char pieces keep only the
    *    top `keepPct`% by (count, sym) — the lowest-likelihood
    *    vocabulary shrink of the paper, integer-ceiling sized.
    *
    * Scale shape (the [[bpeTrain]] discipline): the corpus is
    * tokenized ONCE into the word-type table; every round's work is
    * vocabulary×word-type-sized — substring/edge explosion is
    * map-side, the Viterbi DP is one codegen'd fold per word type
    * (positions ≤ `maxWordLen`, edges ≤ maxWordLen·maxPiece), and the
    * only exchanges carry narrow (sym, cnt) rows. Driver work per
    * round is one bounded vocabulary count (the prune size). Word
    * types longer than `maxWordLen` are excluded from training (the
    * tail carries negligible mass; SentencePiece caps candidate
    * lengths the same way). Returns (sym, cnt, p_micro) — the trained
    * vocabulary, its final Viterbi counts, and smoothed millionths
    * probabilities. */
  def unigramTrain(df: DataFrame, textCol: String = "text",
                   rounds: Int = 2, maxPiece: Int = 4,
                   seedMulti: Int = 100, maxWordLen: Int = 16,
                   keepPct: Int = 80): DataFrame = {
    val (vocab, words) =
      unigramLoop(df, textCol, rounds, maxPiece, seedMulti, maxWordLen, keepPct)
    val out = unigramProbed(vocab)
      .select(col("sym"), col("cnt"), col("p_micro")).localCheckpoint()
    graft.core.Checkpoints.releaseAll(vocab)
    graft.core.Checkpoints.releaseAll(words)
    out
  }

  /** The trained unigram tokenizer APPLIED to the corpus — the
    * [[bpeEncodeStats]] twin, closing train → encode for the
    * SentencePiece family: per document, the token count the trained
    * model's Viterbi segmentation would emit, and the
    * chars-per-token compression ratio in fixed-point millionths.
    *
    * Scale shape (identical to [[bpeEncodeStats]]): one more Viterbi
    * pass over the WORD-TYPE table under the final model (vocabulary-
    * sized), then the corpus-sized side only tokenizes to words and
    * joins on the word key. Words longer than `maxWordLen` (excluded
    * from training) fall back to their character segmentation —
    * deterministic, replayable, and honest about the cap. Docs with
    * no `[a-z]+` word count zero. */
  def unigramEncodeStats(df: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id", rounds: Int = 2,
                         maxPiece: Int = 4, seedMulti: Int = 100,
                         maxWordLen: Int = 16, keepPct: Int = 80): DataFrame = {
    val (vocab, words) =
      unigramLoop(df, textCol, rounds, maxPiece, seedMulti, maxWordLen, keepPct)
    // materialize before releasing the loop's checkpointed blocks the
    // lazy encode plan still references
    val out = unigramEncodeWith(df, vocab, textCol, idCol, maxPiece, maxWordLen)
      .localCheckpoint()
    graft.core.Checkpoints.releaseAll(vocab)
    graft.core.Checkpoints.releaseAll(words)
    out
  }

  /** Encode under an ALREADY-TRAINED vocabulary (sym, cnt[, …]) —
    * the serve-from-storage half: a model trained once per corpus
    * snapshot (persist [[unigramTrain]]'s output) encodes any number
    * of batches without re-running EM. Same semantics and cost shape
    * as [[unigramEncodeStats]]'s tail: one Viterbi pass over the
    * word-TYPE table, corpus side joins on the word key. */
  def unigramEncodeWith(df: DataFrame, vocab: DataFrame,
                        textCol: String = "text", idCol: String = "doc_id",
                        maxPiece: Int = 4, maxWordLen: Int = 16): DataFrame = {
    val words = df.select(
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
          .as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val probed = unigramProbed(vocab.select(col("sym"), col("cnt")))
    val wordPieces = unigramBestPaths(words, probed, maxPiece)
      .select(col("word"),
        size(split(expr("substring(path, 2)"), "\\|")).cast("long").as("n_pieces"))
    val docWords = df.select(col(idCol).as("doc_id"),
      explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as("word"))
    val perDoc = docWords.join(wordPieces, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_pieces"),
          length(col("word")).cast("long"))).as("n_unigram_tokens"),
        sum(length(col("word")).cast("long")).as("n_char_tokens"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_unigram_tokens"), lit(0L)).as("n_unigram_tokens"),
        coalesce(col("n_char_tokens"), lit(0L)).as("n_char_tokens"))
      .withColumn("compression_fp",
        when(col("n_unigram_tokens") > 0,
          expr("(1000000 * n_char_tokens) div n_unigram_tokens"))
          .otherwise(lit(0L)))
  }

  /** WordPiece-style GREEDY longest-match-first encode next to the
    * trained model's OPTIMAL Viterbi segmentation — the BERT-family
    * runtime tokenizer rule (Wu et al. 2016, "Google's Neural Machine
    * Translation System": maximal munch over the vocabulary) measured
    * against [[unigramEncodeStats]]'s probability-optimal path on the
    * SAME vocabulary: per document, both token counts and their ratio
    * in millionths — the fertility cost of serving with the cheap
    * greedy matcher instead of the trained model's own decoder.
    * Greedy is well-defined on every word (the vocabulary always
    * keeps all single characters) and is NOT always the longer
    * segmentation — Viterbi minimizes probability cost, not piece
    * count, so the ratio is a genuine two-sided diagnostic.
    *
    * Scale shape: both segmentations run once per word TYPE
    * (vocabulary-sized — the [[bpeEncodeStats]] discipline); greedy
    * is one codegen'd fold of at most `maxWordLen` longest-match hops
    * over each word's in-vocab span list; the corpus side only
    * tokenizes and joins on the word key. */
  def wordpieceEncodeStats(df: DataFrame, textCol: String = "text",
                           idCol: String = "doc_id", rounds: Int = 2,
                           maxPiece: Int = 4, seedMulti: Int = 100,
                           maxWordLen: Int = 16, keepPct: Int = 80): DataFrame = {
    val (vocab, words) =
      unigramLoop(df, textCol, rounds, maxPiece, seedMulti, maxWordLen, keepPct)
    val out = wordpieceEncodeWith(df, vocab, textCol, idCol,
      maxPiece, maxWordLen).localCheckpoint()
    graft.core.Checkpoints.releaseAll(vocab)
    graft.core.Checkpoints.releaseAll(words)
    out
  }

  /** [[wordpieceEncodeStats]] under an ALREADY-TRAINED vocabulary —
    * [[unigramEncodeWith]]'s greedy-vs-Viterbi twin, serving from the
    * persisted model without re-running EM. */
  def wordpieceEncodeWith(df: DataFrame, vocab: DataFrame,
                          textCol: String = "text", idCol: String = "doc_id",
                          maxPiece: Int = 4, maxWordLen: Int = 16): DataFrame = {
    val words = df.select(
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
          .as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val v = vocab.select(col("sym"), col("cnt"))
    val viterbi = unigramBestPaths(words, unigramProbed(v), maxPiece)
      .select(col("word"),
        size(split(expr("substring(path, 2)"), "\\|")).cast("long").as("n_viterbi"))
    val greedy = greedyCounts(words, v, maxPiece, maxWordLen)
    val docWords = df.select(col(idCol).as("doc_id"),
      explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as("word"))
    val perDoc = docWords
      .join(viterbi, Seq("word"), "left")
      .join(greedy, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_viterbi"),
          length(col("word")).cast("long"))).as("n_viterbi_tokens"),
        sum(coalesce(col("n_greedy"),
          length(col("word")).cast("long"))).as("n_greedy_tokens"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_viterbi_tokens"), lit(0L)).as("n_viterbi_tokens"),
        coalesce(col("n_greedy_tokens"), lit(0L)).as("n_greedy_tokens"))
      .withColumn("greedy_ratio_fp",
        when(col("n_viterbi_tokens") > 0,
          expr("(1000000 * n_greedy_tokens) div n_viterbi_tokens"))
          .otherwise(lit(0L)))
  }

  /** Greedy longest-match piece counts per word TYPE: one fold of at
    * most `maxWordLen` hops, each consuming the LONGEST in-vocabulary
    * piece at the current position (always defined — single chars are
    * never pruned from the vocabulary). */
  private def greedyCounts(words: DataFrame, vocab: DataFrame,
                           maxPiece: Int, maxWordLen: Int): DataFrame = {
    val edges = unigramPosSubs(words, maxPiece)
      .join(vocab.select(col("sym").as("piece")), Seq("piece"))
      .groupBy("word")
      .agg(collect_list(struct(col("i"), col("j"))).as("edges"))
    val folded = aggregate(sequence(lit(1), lit(maxWordLen)),
      struct(lit(0L).as("pos"), lit(0L).as("cnt")),
      (s, _) => {
        val here = filter(col("edges"), e => e.getField("i") === s.getField("pos"))
        when(s.getField("pos") >= length(col("word")).cast("long"), s)
          .otherwise(struct(
            array_max(transform(here, e => e.getField("j"))).as("pos"),
            (s.getField("cnt") + lit(1L)).as("cnt")))
      })
    edges.select(col("word"), folded.getField("cnt").as("n_greedy"))
  }

  /** (word, i, j, piece): every substring of length ≤ maxPiece with
    * its 0-based span — the Viterbi DP's edge list. */
  private def unigramPosSubs(words: DataFrame, maxPiece: Int): DataFrame =
    words.select(col("word"), col("freq"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          transform(sequence(lit(1),
            least(lit(maxPiece), length(col("word")) - i + 1)), l =>
            struct((i - 1).cast("long").as("i"),
              (i - 1 + l).cast("long").as("j"),
              col("word").substr(i, l).as("piece")))))).as("e"))
      .select(col("word"), col("freq"), col("e.i").as("i"),
        col("e.j").as("j"), col("e.piece").as("piece"))

  /** Minimum-cost segmentation of every word type under `probed`
    * (sym, cost) — ONE codegen'd fold per word: best[j] = min over
    * pieces ending at j of best[i] + cost, tie-broken by the path
    * string, so array_min over (cost, path) structs is the total
    * order the oracle's ROW_NUMBER replays. Returns
    * (word, freq, path) with path "|p1|p2|…". */
  private def unigramBestPaths(words: DataFrame, probed: DataFrame,
                               maxPiece: Int): DataFrame = {
    val edges = unigramPosSubs(words, maxPiece)
      .join(probed.select(col("sym").as("piece"), col("cost")), Seq("piece"))
      .groupBy("word", "freq")
      .agg(collect_list(struct(col("i"), col("j"), col("piece"),
        col("cost"))).as("edges"))
    val initArr = array(struct(lit(0L).as("cost"), lit("").as("path")))
    val bestArr = aggregate(
      sequence(lit(1L), length(col("word")).cast("long")), initArr,
      (acc, j) => concat(acc, array(array_min(
        transform(filter(col("edges"), e => e.getField("j") === j), e => {
          val prev = element_at(acc, (e.getField("i") + 1).cast("int"))
          struct((prev.getField("cost") + e.getField("cost")).as("cost"),
            concat(prev.getField("path"), lit("|"),
              e.getField("piece")).as("path"))
        })))))
    edges.select(col("word"), col("freq"),
      element_at(bestArr, (length(col("word")) + 1).cast("int"))
        .getField("path").as("path"))
  }

  /** The shared EM loop: returns (final vocab, word-type table), both
    * checkpointed — callers release both. */
  private def unigramLoop(df: DataFrame, textCol: String, rounds: Int,
                          maxPiece: Int, seedMulti: Int, maxWordLen: Int,
                          keepPct: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1 && maxPiece >= 2 && seedMulti >= 1 &&
      maxWordLen >= maxPiece && keepPct >= 1 && keepPct <= 100,
      s"bad unigramTrain params: rounds=$rounds maxPiece=$maxPiece " +
        s"seedMulti=$seedMulti maxWordLen=$maxWordLen keepPct=$keepPct")
    val words = df.select(
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
          .as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .localCheckpoint() // reused by every round's edge build
    val seed = unigramPosSubs(words, maxPiece).groupBy(col("piece").as("sym"))
      .agg(sum(col("freq")).as("cnt"))
    var vocab = seed.filter(length(col("sym")) === 1).unionByName(
      seed.filter(length(col("sym")) > 1)
        .orderBy(col("cnt").desc, col("sym").asc).limit(seedMulti))
      .localCheckpoint()
    var prevVocab = vocab
    for (_ <- 1 to rounds) {
      val best = unigramBestPaths(words, unigramProbed(vocab), maxPiece)
      val counts = best.select(col("freq"),
          explode(split(expr("substring(path, 2)"), "\\|")).as("sym"))
        .groupBy("sym").agg(sum(col("freq")).as("cnt"))
      val joined = vocab.select("sym").join(counts, Seq("sym"), "left")
        .select(col("sym"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val multis = joined.filter(length(col("sym")) > 1)
      val keepN = (multis.count() * keepPct + 99) / 100 // bounded: vocab rows
      vocab = joined.filter(length(col("sym")) === 1).unionByName(
          multis.orderBy(col("cnt").desc, col("sym").asc).limit(keepN.toInt))
        .localCheckpoint()
      graft.core.Checkpoints.releaseAll(prevVocab)
      prevVocab = vocab
    }
    (vocab, words)
  }

  /** Fixed-weight linear quality model — the classifier-based
    * filtering stage (a fastText-style quality model's scoring pass,
    * with the learned weights stood in by fixed public-heuristic
    * weights; swapping in trained weights changes only the
    * coefficients). Features are fixed-point-millionth ratios computed
    * with integer floor division, and the score is an integer linear
    * combination — bit-exact in any engine, no float accumulation.
    *
    * score_fp = 400000 + 3·stopword_ratio_fp − 10·punct_ratio_fp
    *            − |avg_token_len_fp − 5e6| ÷ 5, keep ⇔ score_fp > 0:
    * rewards stopword density (fluent prose), penalizes
    * punctuation-heavy noise and token lengths far from English's
    * typical ~5 chars.
    *
    * Scale shape: a pure per-row projection — no shuffle, no model
    * table; stays inside whole-stage codegen. */
  def qualityLinear(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id",
                    carryCols: Seq[String] = Seq.empty): DataFrame = {
    val t = col(textCol)
    // carryCols ride the projection end-to-end so a grouped consumer
    // (per-domain calibration) needs no join back onto the corpus
    val carry = carryCols.map(col)
    docs.select(Seq(col(idCol).as("doc_id"),
        wsTokenCount(t).as("n_tokens"),
        stopwordCount(t).as("n_stopwords"),
        punctCount(t).as("n_punct"),
        tokenLenSum(t).as("token_len_sum"),
        length(t).cast("bigint").as("len_chars")) ++ carry: _*)
      .withColumn("stop_fp",
        when(col("n_tokens") > 0,
          expr("(1000000 * n_stopwords) div n_tokens")).otherwise(lit(0L)))
      .withColumn("punct_fp",
        when(col("len_chars") > 0,
          expr("(1000000 * n_punct) div len_chars")).otherwise(lit(0L)))
      .withColumn("len_dev_fp",
        when(col("n_tokens") > 0,
          abs(expr("(1000000 * token_len_sum) div n_tokens") - lit(5000000L)))
          .otherwise(lit(5000000L)))
      .select(Seq(col("doc_id"), col("stop_fp"), col("punct_fp"),
        col("len_dev_fp")) ++ carry: _*)
      .withColumn("score_fp",
        lit(400000L) + lit(3L) * col("stop_fp") - lit(10L) * col("punct_fp")
          - expr("len_dev_fp div 5"))
      .withColumn("keep", col("score_fp") > 0)
  }

  /** N-gram novelty scoring — the curation signal for "does this doc
    * add anything": the fraction of a document's distinct 3-token
    * shingles that appear NOWHERE else in the corpus (df = 1), in
    * fixed-point millionths. High novelty = unique content worth
    * keeping; near-zero = the doc is assembled from corpus-common
    * spans (boilerplate, mirrors, quote farms) even when no single
    * near-dup partner exists — the case pairwise dedup can't see.
    *
    * Scale shape: shingles md5-fold to longs map-side (same convention
    * as [[dupSpanStats]]); the df window and the doc aggregate carry
    * only (doc_id, hash) — text never shuffles, and the corpus is
    * scanned exactly once. Shingle-less docs (< 3 tokens) score zero
    * via the left join. */
  def ngramNovelty(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // df via a window over the posting's own hash partitioning — a
    // count-aggregate-plus-join would scan and explode the corpus
    // TWICE (the posting feeds both sides); the window pays the same
    // one exchange on sh_h and reuses the single pass
    val perDoc = spanPosting(docs, 3, textCol, idCol)
      .withColumnRenamed("sp_h", "sh_h")
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh_h"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .withColumn("novelty_fp",
        when(col("n_shingles") > 0,
          expr("(1000000 * n_unique) div n_shingles")).otherwise(lit(0L)))
  }

  /** Wordlist-based safety filtering (the C4-style "bad words" pass):
    * per-document hit counts against a fixed blocklist, with
    * `keep ⇔ total hits ≤ maxHits`. Counts are reported rather than
    * just the verdict so the threshold can be re-tuned from the stats
    * table without re-scanning the corpus.
    *
    * Scale shape: the blocklist is a literal array in the expression
    * tree (real-world lists are hundreds of terms — well under literal
    * limits); the whole operator is a per-row codegen projection, no
    * shuffle, no join. */
  def blocklistFilter(docs: DataFrame, terms: Seq[String], maxHits: Int = 0,
                      textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    // tokens() lowercases, so match case-insensitively regardless of
    // how the list was authored
    val termArr = array(terms.map(t => lit(t.toLowerCase)): _*)
    docs.select(col(idCol).as("doc_id"),
        bound(tokens(col(textCol))) { t =>
          struct(
            size(filter(t, w => array_contains(termArr, w))).cast("bigint")
              .as("n_blocked"),
            size(array_intersect(array_distinct(t), termArr)).cast("bigint")
              .as("n_blocked_distinct"))
        }.as("__b"))
      .select(col("doc_id"), col("__b.n_blocked").as("n_blocked"),
        col("__b.n_blocked_distinct").as("n_blocked_distinct"))
      .withColumn("keep", col("n_blocked") <= maxHits)
  }

  /** CCNet-style perplexity bucketing + per-bucket sampling policy
    * (Wenzek et al. 2020): score every doc under the corpus bigram LM
    * ([[lmBigramScore]]), cut the score distribution into
    * head/middle/tail thirds by exact quantile cut points, then keep
    * head fully, sample middle at `midPct`% and tail at `tailPct`% by
    * deterministic doc-id hash. The ranking key is the average bigram
    * probability in fixed-point millionths (higher = more fluent =
    * head); docs with no bigrams sink below every scored doc (key −1).
    *
    * Scale shape: [[lmBigramScore]]'s narrow count joins, then
    * [[graft.operators.Sampling.quantileBuckets]]'s
    * one-tiny-aggregate-row broadcast — no global sort, no
    * single-partition window; the keep decision is a per-row hash
    * projection. */
  def pplSample(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id", midPct: Int = 50,
                tailPct: Int = 10, salt: String = ""): DataFrame = {
    require(midPct >= 0 && midPct <= 100 && tailPct >= 0 && tailPct <= 100,
      "pcts must be in [0,100]")
    val keyed = lmBigramScore(docs, textCol, idCol)
      .withColumn("avg_fp",
        when(col("n_bigrams") > 0,
          expr("(1000000 * sum_p_fp) div n_bigrams")).otherwise(lit(-1L)))
      .select(col("doc_id"), col("avg_fp"))
    graft.operators.Sampling.quantileBuckets(keyed, "avg_fp", 3, "bucket")
      .withColumn("keep",
        graft.operators.Sampling.hashBucket(col("doc_id"), salt) <
          when(col("bucket") === 3, lit(100))
            .when(col("bucket") === 2, lit(midPct))
            .otherwise(lit(tailPct)))
  }

  /** The corpus's boilerplate vocabulary: 60-bit hashes of the
    * non-overlapping `width`-token segments that occur in more than
    * `maxDf` distinct documents, highest document-frequency first
    * (ties by hash, so the cut is deterministic), capped at `capN`.
    *
    * This is the line-dedup signal of RefinedWeb/CCNet-style curation:
    * headers, footers, cookie banners and navigation chrome repeat
    * verbatim across pages, and stripping the repeated SEGMENTS keeps
    * documents whose remaining prose is fine — where document-level
    * dedup would either keep the noise or drop the whole page.
    *
    * Scale shape: segments are hashed map-side (per-doc distinct, so
    * the count IS document frequency) and only (hash) rows cross the
    * one aggregation exchange. The returned vocabulary is collected to
    * the driver — bounded by `capN`, same bounded-inline convention as
    * the IVF centroid table ([[graft.similarity.Similarity.ivfTopK]]) —
    * because real boilerplate vocabularies are small (a site's chrome,
    * not its content) and inlining them makes the removal pass a pure
    * map-side projection with zero joins. */
  def boilerplateHashes(docs: DataFrame, width: Int = 6, maxDf: Int = 1,
                        capN: Int = 256, textCol: String = "text",
                        idCol: String = "doc_id"): Array[Long] = {
    require(width > 0, s"width must be positive, got $width")
    require(capN > 0, s"capN must be positive, got $capN")
    docs.select(explode(array_distinct(chunks(col(textCol), width))).as("seg"))
      .select(shingleHash(col("seg")).as("seg_h"))
      .groupBy("seg_h").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .orderBy(col("df").desc, col("seg_h").asc)
      .limit(capN)
      .select("seg_h")
      .collect().map(_.getLong(0))
  }

  /** Rewrite each document with its boilerplate segments removed:
    * the text is cut into the same non-overlapping `width`-token
    * segments as [[boilerplateHashes]], segments whose hash is in
    * `badHashes` are dropped, and the survivors re-join in order.
    * Emits (doc_id, n_segments, n_removed, text_clean).
    *
    * Scale shape: `badHashes` is an inlined literal array (bounded by
    * the producer's `capN`), so the whole operator is a per-row
    * codegen projection — no join, no shuffle; text never leaves its
    * partition. */
  def boilerplateRemove(docs: DataFrame, badHashes: Array[Long],
                        width: Int = 6, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    docs.select(col(idCol).as("doc_id"),
        bound(chunks(col(textCol), width)) { cs =>
          bound(keptSegments(cs, badHashes)) { keep =>
            struct(
              size(cs).cast("bigint").as("n_segments"),
              (size(cs) - size(keep)).cast("bigint").as("n_removed"),
              concat_ws(" ", keep).as("text_clean"))
          }
        }.as("__b"))
      .select(col("doc_id"), col("__b.n_segments").as("n_segments"),
        col("__b.n_removed").as("n_removed"),
        col("__b.text_clean").as("text_clean"))
  }

  /** Column form of the boilerplate rewrite — the cleaned text alone,
    * for callers that replace a text column in place (e.g.
    * [[graft.pipeline.CorpusPipeline.prepare]]'s optional stage)
    * without dropping their other columns. Same semantics as
    * [[boilerplateRemove]]'s `text_clean`. */
  def stripSegments(text: Column, badHashes: Array[Long], width: Int): Column = {
    require(width > 0, s"width must be positive, got $width")
    concat_ws(" ", keptSegments(chunks(text, width), badHashes))
  }

  private def keptSegments(segments: Column, badHashes: Array[Long]): Column = {
    val badArr =
      if (badHashes.isEmpty) array().cast("array<bigint>")
      else array(badHashes.map(lit(_)): _*)
    filter(segments, s => !array_contains(badArr, shingleHash(s)))
  }

  /** DSIR-style hashed importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling", in its
    * hashed-feature space): tokens hash into `dim` buckets, the target
    * and raw corpora each induce an add-1-smoothed bucket distribution,
    * and a document's importance is the inner product of its hashed
    * term frequencies with the target-minus-raw probability gap —
    * score = Σ_tokens (p_target[b] − p_raw[b]) in fixed-point
    * millionths. The paper ranks by the log-ratio; the difference form
    * is the same linear-in-hashed-features family and keeps every
    * number integer-exact across engines (the fixed-point convention
    * of [[lmBigramScore]] — "the log is left to the reader"). The
    * `topM` highest-scoring documents (ties by doc_id) are flagged
    * `selected` — the resampling step at its deterministic limit.
    *
    * Scale shape: tokens fold to bucket ids map-side, so only
    * (doc_id, bucket) pairs cross the exchanges; the bucket
    * distribution tables are `dim` rows (broadcast), the totals are
    * one-row aggregates (broadcast cross join, the
    * [[graft.operators.Sampling.quantileBuckets]] shape), and the
    * top-M cut is a TakeOrdered over narrow (doc_id, score) — no
    * global sort, no payload shuffle. */
  def dsirWeights(raw: DataFrame, target: DataFrame, dim: Int = 64,
                  topM: Int = 100, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    require(topM > 0, s"topM must be positive, got $topM")
    val bucketOf =
      (conv(substring(md5(col("__t")), 1, 15), 16, 10).cast("long") % dim)
        .cast("int").as("b")
    val posting = raw
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("__t"))
      .select(col("doc_id"), bucketOf)
    val tgtPosting = target
      .select(explode(tokens(col(textCol))).as("__t"))
      .select(bucketOf)
    val rawCounts = posting.groupBy("b").agg(count(lit(1)).as("c_r"))
    val tgtCounts = tgtPosting.groupBy("b").agg(count(lit(1)).as("c_t"))
    // totals fold the dim-row count tables, not the corpus — no third scan
    val rawTot = rawCounts.agg(sum(col("c_r")).as("n_r"))
    val tgtTot = tgtCounts.agg(coalesce(sum(col("c_t")), lit(0L)).as("n_t"))
    // every bucket the raw posting mentions is present in rawCounts by
    // construction; target-absent buckets smooth to (0 + 1)
    val probs = rawCounts
      .join(tgtCounts, Seq("b"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("b"),
        expr(s"(1000000 * (coalesce(c_t, 0) + 1)) div (n_t + $dim)").as("p_t_fp"),
        expr(s"(1000000 * (c_r + 1)) div (n_r + $dim)").as("p_r_fp"))
    val perDoc = posting
      .join(broadcast(probs), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("p_t_fp") - col("p_r_fp")).as("score_fp"))
    val top = perDoc.orderBy(col("score_fp").desc, col("doc_id").asc)
      .limit(topM).select(col("doc_id"), lit(true).as("selected"))
    perDoc.join(broadcast(top), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("score_fp"),
        coalesce(col("selected"), lit(false)).as("selected"))
  }
}
