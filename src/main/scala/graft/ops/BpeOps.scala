package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding tokenizer TRAINING — the subword-vocab
  * learning stage of a training-data pipeline (public algorithm: Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"; the word-frequency formulation is the one every public
  * BPE trainer uses).
  *
  * Scale shape (the reason this is corpus-size-safe at 100 TB):
  *   - the corpus is aggregated ONCE into a word-frequency table (one
  *     map-side-combinable shuffle keyed by word);
  *   - every merge iteration then runs over the VOCAB table only — |V| is
  *     Zipf-bounded (~10^5–10^6 distinct words for web-scale corpora,
  *     regardless of corpus size), so per-iteration cost is independent of
  *     corpus size;
  *   - driver state is the learned merge list alone (`merges` rows — the
  *     bounded-model-state class kmeansCentroidsExact established); the
  *     vocab itself never leaves the cluster;
  *   - tokenization applies the merges to the vocab (|V| folds), then the
  *     corpus joins its per-word symbol counts — the corpus is scanned
  *     once and never folded per-row.
  *
  * Cross-engine determinism (oracle-visible): pair counts are long sums of
  * long word frequencies; the argmax tie-breaks on (count DESC, left ASC,
  * right ASC); the merge itself is a left fold over the space-joined symbol
  * string that provably reproduces the greedy left-to-right scan (see
  * `mergePair`), expressed identically in DuckDB via `list_reduce`. No
  * floating point anywhere.
  */
object BpeOps {

  /** One learned merge rule: 1-based rank, the two symbols merged, and the
    * frequency-weighted adjacent-pair count that won the argmax.
    */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Word-frequency table — the only corpus-scale aggregation in training.
    * Whitespace tokenization; empty tokens dropped.
    */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: its characters, space-joined.
    * (Symbols never contain spaces — words are whitespace tokens — so the
    * space-joined string is a faithful list encoding.)
    */
  private def initialSyms(word: Column): Column =
    concat_ws(" ", filter(split(word, ""), x => x =!= ""))

  /** Greedy left-to-right merge of ONE (l, r) pair over a space-joined
    * symbol string, as a left fold.
    *
    * Equivalence to the scan algorithm (merge at i when s(i)=l ∧ s(i+1)=r,
    * then skip both): after the fold appends an unmerged symbol x, the tail
    * of the accumulator is x — the same state the scan is in; after a
    * merge the tail is l+r, which differs from l (r is non-empty), so the
    * freshly merged symbol can never left-match the pair again — exactly
    * the scan's skip-2. The tail test `acc endsWith (" "+l)` cannot
    * false-positive on a longer symbol ending in l because the preceding
    * space pins the symbol boundary. Property-specced against the scan
    * reference on random inputs (BpeSpec).
    */
  private[ops] def mergePair(syms: Column, l: Column, r: Column): Column =
    aggregate(
      split(syms, " "),
      lit(""),
      (acc, x) =>
        when(acc === "", x)
          .when(x === r && (acc === l || acc.endsWith(concat(lit(" "), l))),
            concat(acc.substr(lit(1), length(acc) - length(l)), l, r))
          .otherwise(concat(acc, lit(" "), x)))

  /** Frequency-weighted adjacent-pair counts over the vocab's current
    * symbol sequences. Map-side combinable; rows bounded by distinct
    * adjacent pairs (≤ symbol-vocab²  in principle, tiny in practice).
    */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val lst = split(col("syms"), " ")
    // sequence(0, n-2) only when n >= 2: Spark's sequence() DESCENDS for
    // stop < start, which would fabricate pairs for 1-symbol words
    val idx = when(size(lst) >= 2, sequence(lit(0), size(lst) - 2))
      .otherwise(array().cast(ArrayType(IntegerType)))
    val prs = transform(idx, i =>
      struct(element_at(lst, i + 1).as("l"), element_at(lst, i + 2).as("r")))
    vocab.select(col("freq"), explode(prs).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum("freq").as("cnt"))
  }

  /** Train `merges` BPE merge rules over the corpus. Returns the learned
    * rules (driver-held model, bounded) and the final vocab DataFrame
    * (word, freq, syms) for inspection/tokenization reuse.
    *
    * Stops early (returning fewer rules) only when no adjacent pair exists
    * anywhere — every word fully merged to a single symbol; a corpus that
    * small is not a training corpus, and the oracle queries document the
    * full-`merges` assumption.
    *
    * `batch` (default 1 = the classic one-merge-per-round loop) bounds how
    * many merge rules ONE driver round may emit: at production vocab sizes
    * a tokenizer wants 30–50k rules, and a 1-rule round loop makes the
    * driver argmax collect the bottleneck. Each round collects the top
    * (batch+1) pairs and accepts a GREEDY PREFIX of them, provably equal
    * to running the sequential argmax `m` times (see [[acceptBatch]] for
    * the three conditions and the proof sketch); whenever a condition
    * fails the round degrades toward batch = 1, never past it, so the
    * learned rule list is IDENTICAL to the sequential trainer's for every
    * batch setting — batching divides the round count without changing
    * any individual merge (property-specced against batch = 1 on random
    * corpora).
    *
    * `strict = false` trades that guarantee for throughput — the classic
    * batched-trainer behavior (every fast public BPE implementation makes
    * this trade at scale): conflicting pairs in the window are SKIPPED
    * (not acceptance-stopping) and the 2× emergent-pair margin is not
    * required, so a round emits up to `batch` rules even on the flat
    * pair-count distributions where the strict rule degrades to one rule
    * per round (measured on the toy-vocab sf0.1 fixture, 89 rules to
    * exhaustion: strict batching fires almost never — 89 → 88 rounds —
    * because the top of its pair distribution is all chained, near-tied
    * pairs; non-strict compresses the same run to 12–14 rounds at
    * B = 8–16, ~7× fewer driver round-trips). The cost: where counts
    * interact
    * mid-batch, rule ORDER (occasionally membership near the tail) can
    * differ from sequential greedy — fine for a production tokenizer,
    * wrong for the oracle-gated x70 entry, which is why strict is the
    * default.
    */
  def trainMerges(docs: DataFrame, merges: Int,
                  textCol: String = "text",
                  batch: Int = 1,
                  strict: Boolean = true): (Seq[Merge], DataFrame) =
    trainMergesDetailed(docs, merges, textCol, batch, strict) match {
      case (rules, vocab, _) => (rules, vocab)
    }

  /** [[trainMerges]] plus the driver round count (for measuring the
    * batch-B loop reduction).
    */
  def trainMergesDetailed(docs: DataFrame, merges: Int,
                          textCol: String = "text",
                          batch: Int = 1,
                          strict: Boolean = true): (Seq[Merge], DataFrame, Int) = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var vocab = wordFreq(docs, textCol)
      .withColumn("syms", initialSyms(col("word")))
      .localCheckpoint()
    val learned = Seq.newBuilder[Merge]
    var rank = 1
    var rounds = 0
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val b = math.min(batch, merges - rank + 1)
      // strict mode needs exactly the first excluded row for its margin
      // check; loose mode skips conflicts, so it wants slack to skip INTO
      val win = if (strict) b + 1 else 3 * b
      val window = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(win).collect()
        .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
      if (window.isEmpty) exhausted = true
      else {
        rounds += 1
        val accepted =
          if (strict) acceptBatch(window.toIndexedSeq, b)
          else acceptBatchLoose(window.toIndexedSeq, b)
        // one vocab fold + ONE checkpoint per ROUND (not per rule): the
        // accepted merges apply left-to-right exactly as the sequential
        // loop would, but the lineage flattens once per round. The
        // superseded round's checkpoint blocks are freed as soon as the
        // new one has materialized (eager localCheckpoint) — at
        // production merge counts (~1000 rounds) letting every round's
        // vocab table pile up pinned old-gen until the session boundary
        // was the trainer's dominant retained allocation
        val prev = vocab
        vocab = accepted.foldLeft(vocab) { case (v, (l, r, _)) =>
          v.withColumn("syms", mergePair(col("syms"), lit(l), lit(r)))
        }.localCheckpoint()
        org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(prev)
        accepted.foreach { case (l, r, cnt) =>
          learned += Merge(rank, l, r, cnt)
          rank += 1
        }
      }
    }
    (learned.result(), vocab, rounds)
  }

  /** Greedy-prefix batch acceptance over the collected top-(b+1) pair
    * window (rows = (l, r, cnt), already ordered by the sequential
    * tie-break cnt DESC, l ASC, r ASC). Returns the accepted prefix —
    * always ≥ 1 row (the argmax alone IS one sequential step).
    *
    * The accepted prefix P1..Pm is EXACTLY what m rounds of the
    * sequential argmax would pick, because three conditions hold:
    *
    *  1. PREFIX of the global order — everything ranked above an accepted
    *     pair is accepted, so after merging P1..P(k−1), no untouched pair
    *     outranks Pk (untouched counts are unchanged; ties resolve by the
    *     same lexicographic order the window is sorted in).
    *  2. PAIRWISE SYMBOL-DISJOINT, and no accepted pair's symbol equals
    *     an earlier accepted pair's concatenation — so merging Pj neither
    *     creates nor destroys occurrences of Pk (j < k): adjacency of
    *     (lk, rk) can't involve the fused symbol, and fusing "lj rj" into
    *     one token preserves every other adjacency. Accepted counts are
    *     therefore STILL CORRECT when their sequential turn comes.
    *  3. STRICT 2× MARGIN over the first non-accepted row — a merge can
    *     create/boost pairs touching the fused symbol (x, "ljrj"), but
    *     each such occurrence maps injectively to a consumed (x, lj)
    *     occurrence, and any pre-existing (x, "ljrj") count rides on top:
    *     both sources are non-accepted pairs bounded by the first
    *     non-accepted count, so boosted counts stay < 2× that bound <
    *     cnt(Pm) ≤ cnt(Pk) — no emergent pair can outrank a remaining
    *     accepted one mid-batch.
    *
    * When any condition fails the prefix is trimmed (worst case to the
    * bare argmax), so batching NEVER alters the learned sequence — it
    * only compresses rounds where the top of the distribution is
    * separated and disjoint, which Zipf-shaped pair counts usually are.
    */
  private[ops] def acceptBatch(window: IndexedSeq[(String, String, Long)],
                               b: Int): IndexedSeq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set[String]()
    val concats = scala.collection.mutable.Set[String]()
    var m = 0
    var blocked = false
    while (m < math.min(b, window.size) && !blocked) {
      val (l, r, _) = window(m)
      if (m > 0 && (used(l) || used(r) || concats(l) || concats(r))) blocked = true
      else {
        used += l; used += r; concats += l + r
        m += 1
      }
    }
    // strict-margin trim against the first non-accepted row (if any pair
    // was left out — by conflict, window overflow, or the b cap)
    while (m > 1 && m < window.size && window(m - 1)._3 <= 2 * window(m)._3)
      m -= 1
    window.take(math.max(m, 1))
  }

  /** Non-strict batch acceptance (`strict = false`): take every
    * symbol-disjoint pair in the window top-down, SKIPPING conflicts
    * instead of stopping at them, with no emergent-pair margin — up to
    * `b` rules per round regardless of distribution shape. Merge order
    * within the batch is the window order, which is sequential greedy's
    * order over round-start counts; divergence from pure greedy happens
    * only where a skipped/emergent pair would have outranked a later
    * accepted one mid-batch.
    */
  private[ops] def acceptBatchLoose(window: IndexedSeq[(String, String, Long)],
                                    b: Int): IndexedSeq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set[String]()
    val concats = scala.collection.mutable.Set[String]()
    val out = IndexedSeq.newBuilder[(String, String, Long)]
    var taken = 0
    val it = window.iterator
    while (taken < b && it.hasNext) {
      val p @ (l, r, _) = it.next()
      if (taken == 0 || !(used(l) || used(r) || concats(l) || concats(r))) {
        used += l; used += r; concats += l + r
        out += p
        taken += 1
      }
    }
    out.result()
  }

  /** Tokenize the corpus with a learned merge list: per-doc whitespace
    * token count and post-merge BPE token count.
    *
    * The folds run over the DISTINCT words of the corpus (|V| rows), never
    * per occurrence; each occurrence then joins its word's symbol count —
    * broadcast, because a Zipf vocab is always ≪ the corpus it tokenizes.
    * Docs with no words (empty text) produce no output row, mirrored by
    * the oracle's inner join.
    */
  def tokenize(docs: DataFrame, idCol: String, merges: Seq[Merge],
               textCol: String = "text"): DataFrame = {
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .distinct()
    val folded = merges.foldLeft(words.withColumn("syms", initialSyms(col("word")))) {
      (df, m) =>
        df.withColumn("syms", mergePair(col("syms"), lit(m.left), lit(m.right)))
    }.select(col("word"),
      size(split(col("syms"), " ")).cast(LongType).as("n_syms"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(folded), "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("ws_tokens"), sum("n_syms").as("bpe_tokens"))
  }
}
