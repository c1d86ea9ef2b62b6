package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Token-level quality classification — the model-based filter tier of a
  * training-data pipeline (the role fastText linear classifiers play in
  * CCNet/DataComp curation: train on labeled pages, score the corpus,
  * keep by score). The classifier here is multinomial Naive Bayes with
  * Laplace smoothing (Manning et al., IIR §13.2) — pure counting plus a
  * per-token log-odds table, so training is ONE map-side-combinable
  * aggregation over the labeled tokens and scoring is one broadcast-or-
  * shuffle join against the weight table: exactly the shape that holds
  * at 100 TB (no gradient loop, no driver-resident feature vector; the
  * model is a DataFrame artifact, persistable via
  * [[graft.ops.ModelIO.saveNbModel]]).
  *
  * No reference analog (engine capability, like the rest of §2.10).
  *
  * Cross-engine determinism: per-token log-odds are scaled to
  * MICRO-NATS and floored to LONG (`floor(1e6 * ln(...))`), so document
  * scores are INTEGER sums — summation-order-free across engines and
  * partitionings (the x90 BM25 convention).
  */
object ClassifyOps {

  /** A trained token-NB model: `weights(token, w)` — per-token scaled
    * log-odds, positive favors the positive class — and `consts` (one
    * row): `w_default` (the smoothed log-odds of an unseen token) and
    * `prior` (scaled log prior-odds), both micro-nat LONGs, plus the
    * raw counts they derive from (audit columns).
    */
  final case class NbModel(weights: DataFrame, consts: DataFrame)

  private def scaledLn(c: org.apache.spark.sql.Column) =
    floor(lit(1000000d) * log(c)).cast(LongType)

  /** Train on labeled docs: `labelCol` boolean (true = positive class).
    * Tokenization: lowercase, whitespace split (the suite's standard
    * token contract). Both classes must be present — a single-class
    * training set has no odds to estimate, and the loud gate beats a
    * division-by-zero NULL propagating into every score.
    */
  def trainTokenNb(train: DataFrame, labelCol: String,
                   textCol: String = "text"): NbModel = {
    // localCheckpoint: the vocab-sized count table is the model's core —
    // materialize it once for its two consumers (the totals reduce and
    // the weight projection) instead of re-running the corpus explode
    val toks = train.select(col(labelCol).as("pos"),
        explode(split(lower(col(textCol)), " ")).as("token"))
      .groupBy("token")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("c_neg"))
      .localCheckpoint()
    // Bounded driver state: 7 scalars in ONE action (token totals per
    // class + vocab size, crossJoined with the two doc counts).
    val tot = toks.agg(sum(col("c_pos")).as("n_pos"),
        sum(col("c_neg")).as("n_neg"), count(lit(1)).as("vocab"))
      .crossJoin(train.agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("d_pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("d_neg")))
      .first()
    val (nPos, nNeg, vocab) =
      (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val (dPos, dNeg) = (tot.getLong(3), tot.getLong(4))
    require(dPos > 0 && dNeg > 0,
      s"trainTokenNb needs both classes in the training set, got " +
        s"positive=$dPos negative=$dNeg")
    val denomPos = lit((nPos + vocab).toDouble)
    val denomNeg = lit((nNeg + vocab).toDouble)
    val weights = toks.select(col("token"), col("c_pos"), col("c_neg"),
      (scaledLn((col("c_pos") + lit(1L)).cast(DoubleType) / denomPos) -
        scaledLn((col("c_neg") + lit(1L)).cast(DoubleType) / denomNeg))
        .as("w"))
    val consts = train.sparkSession.range(1).select(
      (scaledLn(lit(1.0) / denomPos) - scaledLn(lit(1.0) / denomNeg))
        .as("w_default"),
      (scaledLn(lit(dPos.toDouble)) - scaledLn(lit(dNeg.toDouble)))
        .as("prior"),
      lit(nPos).as("n_pos"), lit(nNeg).as("n_neg"),
      lit(vocab).as("vocab"), lit(dPos).as("d_pos"), lit(dNeg).as("d_neg"))
    NbModel(weights, consts)
  }

  /** Score docs against a trained model: `(idCol, n_toks, score, pred)`
    * — score = prior + Σ per-occurrence token weight (unseen tokens get
    * `w_default`), an exact integer; pred = score > 0. A doc whose text
    * is empty still scores (`split` of "" yields one empty token, which
    * is simply an unseen-vocab token — every doc appears in the output).
    * One explode + one token-keyed join (broadcast when the vocab is
    * small; co-partitioned shuffle otherwise) + one per-doc aggregate.
    */
  def scoreTokenNb(docs: DataFrame, model: NbModel,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(lower(col(textCol)), " ")).as("token"))
    toks.join(model.weights.select("token", "w"), Seq("token"), "left")
      .crossJoin(broadcast(
        model.consts.select("w_default", "prior")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        (first(col("prior")) +
          sum(coalesce(col("w"), col("w_default")))).as("score"))
      .select(col(idCol), col("n_toks"), col("score"),
        (col("score") > 0).as("pred"))
  }
}
