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
    * Each iteration: one vocab-sized pair aggregation, a 1-row argmax
    * collect (count DESC, then lexicographically smallest pair — fully
    * deterministic), and a vocab-sized fold; localCheckpoint keeps the
    * iterated lineage flat (the k-means precedent).
    */
  def trainMerges(docs: DataFrame, merges: Int,
                  textCol: String = "text"): (Seq[Merge], DataFrame) = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    var vocab = wordFreq(docs, textCol)
      .withColumn("syms", initialSyms(col("word")))
      .localCheckpoint()
    val learned = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += Merge(rank, l, r, cnt)
        vocab = vocab
          .withColumn("syms", mergePair(col("syms"), lit(l), lit(r)))
          .localCheckpoint()
        rank += 1
      }
    }
    (learned.result(), vocab)
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
