package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing.
  *
  * Both samplers key on an md5 row hash (null positions sentinel-coalesced,
  * same recipe as `$sample`), so results are reproducible across runs,
  * partitionings, and external engines — a DuckDB oracle replays them
  * exactly. Nothing here uses `rand()`.
  */
object Sampling {

  private def rowKey(df: DataFrame): Column =
    graft.stages.StageTranslator.md5RowKey(df.columns.toSeq.map(col))

  /** Up to `n` rows per stratum, chosen by md5 row-hash order: one hash
    * shuffle on the strata columns + a partitioned window. For very
    * low-cardinality strata over huge frames, pre-thin with
    * [[deterministicFraction]] first — the window sorts each stratum's
    * full partition before truncating. */
  def stratified(df: DataFrame, strataCols: Seq[String], n: Int): DataFrame = {
    require(strataCols.nonEmpty,
      "stratified needs strata columns — an unstratified call would sort the whole " +
        "frame through one window partition; use deterministicFraction for global thinning")
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(rowKey(df))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_rn")
  }

  /** Weighted corpus mixing: keep a different deterministic fraction per
    * stratum — how a training mix is rebalanced toward target source/
    * language ratios ("2 epochs of wiki, 0.3 of common-crawl"). The same
    * md5-threshold filter as [[deterministicFraction]], with the threshold
    * chosen per row by the stratum column: still a pure scan-side filter —
    * no shuffle, no per-group state, stable under repartitioning — so it
    * costs the same at 100 TB as at 100 rows. Strata absent from
    * `fractions` keep `default` (0.0 = drop unlisted sources, the usual
    * allowlist posture). */
  def mix(df: DataFrame, strataCol: String, fractions: Map[String, Double],
          default: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1),
      "every mix fraction must be in [0,1]")
    val key = substring(rowKey(df), 1, 8)
    def keepFor(f: Double): Column =
      if (f >= 1.0) lit(true)
      else if (f <= 0.0) lit(false)
      else key < lit(f"${math.max(1L, math.round(f * 4294967296.0))}%08x")
    val keep = fractions.toSeq.sortBy(_._1).foldRight(keepFor(default)) {
      case ((value, f), els) => when(col(strataCol) === lit(value), keepFor(f)).otherwise(els)
    }
    df.filter(keep)
  }

  /** Deterministic train/val/test assignment: the row hash's first 8 hex
    * digits land in cumulative `[0, 2^32)` ranges sized by `fractions`
    * (which must sum to 1; the last split absorbs the rounding remainder so
    * every row gets exactly one label). Pure scan-side arithmetic — stable
    * under repartitioning, re-runs and engines, which is what keeps a
    * held-out set held out across pipeline versions. */
  def assignSplit(df: DataFrame,
                  fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty, "assignSplit needs at least one split")
    require(fractions.forall(_._2 > 0), "every split fraction must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val key = substring(rowKey(df), 1, 8)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val labeled = fractions.init.zip(cum.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), c), els) =>
      when(key < lit(f"${math.max(1L, math.round(c * 4294967296.0))}%08x"), lit(name))
        .otherwise(els)
    }
    df.withColumn("split", labeled)
  }

  /** Epoch-weighted mixing: each stratum's rows appear `epochs_s` times in
    * the output — the "2 epochs of wiki, 0.3 of common-crawl" recipe with
    * UPsampling, where [[mix]] can only thin. A row in a stratum with
    * `e = 2.3` is emitted twice unconditionally plus once more for the
    * deterministic 30% of rows whose md5 hash clears the fractional
    * threshold — so the corpus-level expectation is exactly `e` epochs and
    * the selection is reproducible anywhere. Output rows carry a 0-based
    * `epoch` copy index (downstream shuffles spread copies; nothing else
    * distinguishes them).
    *
    * Pure scan-side arithmetic + a row generator — no shuffle, no state;
    * strata with `e = 0` vanish. */
  def epochMix(df: DataFrame, strataCol: String, epochs: Map[String, Double],
               default: Double = 1.0): DataFrame = {
    require((epochs.values ++ Seq(default)).forall(_ >= 0),
      "every epoch weight must be non-negative")
    val key = substring(rowKey(df), 1, 8)
    def thresholdHex(f: Double): String =
      f"${math.max(1L, math.round(f * 4294967296.0))}%08x"
    def copiesFor(e: Double): Column = {
      val whole = math.floor(e).toLong
      val frac = e - whole
      if (frac <= 0.0) lit(whole)
      else lit(whole) + when(key < lit(thresholdHex(frac)), 1L).otherwise(0L)
    }
    val n = epochs.toSeq.sortBy(_._1).foldRight(copiesFor(default)) {
      case ((value, e), els) => when(col(strataCol) === lit(value), copiesFor(e)).otherwise(els)
    }
    df.withColumn("__graft_n", n)
      .filter(col("__graft_n") >= 1)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__graft_n") - 1)))
      .drop("__graft_n")
  }

  /** Temperature-rescaled source mixing (the multilingual sampling recipe
    * of Conneau & Lample 2019 / mT5): target share `q_s ∝ p_s^(1/T)` where
    * `p_s` is stratum `s`'s natural share. `T > 1` flattens the mix toward
    * uniform (upweights rare sources), `T < 1` sharpens it, `T = 1` keeps
    * everything. Realized by pure downsampling: keep fraction
    * `f_s = n_s^(1/T-1) / max_s' n_s'^(1/T-1)`, which hits the target
    * ratios exactly while the most-upweighted stratum keeps 100% (no
    * upsampling, maximal retained data).
    *
    * Cost: one aggregate over the strata column — its result is
    * strata-bounded, the same bounded driver materialization class as the
    * ANN centroids — then the same scan-side md5-threshold filter as
    * [[mix]]. Rows with a null stratum are dropped (no natural share). */
  def temperatureMix(df: DataFrame, strataCol: String,
                     temperature: Double): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val e = 1.0 / temperature - 1.0
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) df.filter(lit(false))
    else {
      val wMax = counts.values.map(n => math.pow(n.toDouble, e)).max
      val fractions = counts.map { case (s, n) =>
        s -> math.min(1.0, math.pow(n.toDouble, e) / wMax)
      }
      mix(df.filter(col(strataCol).isNotNull), strataCol, fractions)
    }
  }

  /** Score-weighted sampling: keep each row with probability equal to its
    * (clamped to [0,1]) `score` — soft quality filtering, where a hard
    * threshold would cliff: a 0.9-quality document keeps 90% of its mass,
    * a 0.2 document still contributes 20% instead of dying at the gate
    * (the shape model-scored corpus filters use when the classifier is
    * noisy). Realized deterministically: the row's md5-hash fraction in
    * [0,1) is compared to its own score — a pure scan-side filter, no
    * shuffle, no RNG, stable under repartitioning, replayable by any
    * engine. Null scores drop (no signal, no keep).
    *
    * The hash fraction is the first 8 hex digits / 2^32 — the same
    * uniform key [[mix]] thresholds against, compared row-wise here. */
  def scoreWeightedKeep(df: DataFrame, score: Column): DataFrame = {
    val frac = conv(substring(rowKey(df), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    df.filter(frac < least(greatest(score.cast("double"), lit(0.0)), lit(1.0)))
  }

  /** Token-budget mixing: keep documents per stratum, in md5 row-hash
    * order, until the stratum's token budget is met — the "N tokens of
    * source X" form real pretraining mixes are specified in (documents are
    * what a crawl gives you; tokens are what the training run consumes,
    * so the quota lives in token units). A row is kept while the running
    * total of already-kept tokens is below its stratum's budget: every
    * positive budget takes at least one document and overshoots by less
    * than one document; budget 0 and strata absent from `budgets` drop
    * entirely (allowlist posture, like [[mix]]).
    *
    * One hash exchange on the stratum column + a per-stratum window —
    * same skew posture as [[stratified]]: pre-thin a dominant stratum
    * with [[deterministicFraction]] before the exact cut if its window
    * partition would be huge. */
  def tokenBudgetMix(df: DataFrame, strataCol: String, tokenCol: Column,
                     budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ >= 0), "every token budget must be >= 0")
    val w = Window.partitionBy(col(strataCol)).orderBy(rowKey(df))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = budgets.toSeq.sortBy(_._1).foldRight(lit(0L): Column) {
      case ((value, b), els) => when(col(strataCol) === lit(value), lit(b)).otherwise(els)
    }
    df.withColumn("__graft_prefix", coalesce(sum(tokenCol).over(w), lit(0L)))
      .filter(col("__graft_prefix") < budget)
      .drop("__graft_prefix")
  }

  /** Deterministic global shuffle for training-data ordering: every row
    * gets a `shard` (seeded-hash mod `shards`) and a 0-based `pos` within
    * its shard (seeded-hash order, id tiebreak). Same (seed, id) ⇒ same
    * (shard, pos) on any cluster, any partitioning, any engine — the
    * property a resumable training run needs from its data order.
    *
    * Plan shape: one hash exchange on the shard id + a per-shard window
    * sort. No global sort, no driver state; each window partition is
    * `1/shards` of the corpus — pick `shards` ≥ the downstream file/worker
    * count (thousands at 100 TB) and the sort stays partition-local. */
  def trainingOrder(df: DataFrame, idCol: String, shards: Int,
                    seed: String = ""): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val h = md5(concat_ws("\u0001", lit(seed),
      coalesce(col(idCol).cast("string"), lit("\u0002"))))
    val w = Window.partitionBy(col("__graft_shard"))
      .orderBy(col("__graft_h"), col(idCol))
    df.withColumn("__graft_h", h)
      .withColumn("__graft_shard",
        conv(substring(col("__graft_h"), 1, 8), 16, 10).cast("long") % shards)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .withColumn("shard", col("__graft_shard"))
      .drop("__graft_h", "__graft_shard")
  }

  /** Keep ~`fraction` of rows deterministically: a pure filter comparing
    * the first 8 hex digits of the row hash against a threshold — no
    * shuffle, no state, scales to any size, and the kept set is stable
    * under repartitioning and re-runs. The comparison is a fixed-width
    * lowercase-hex STRING compare, portable to any SQL engine. Granularity
    * is 1/2^32 (rounded, min 1 for any positive fraction), so billion-row
    * corpora can be thinned to ~per-thousandth-of-a-percent rates. */
  def deterministicFraction(df: DataFrame, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    if (fraction >= 1.0) df
    else if (fraction <= 0.0) df.filter(lit(false))
    else {
      val threshold = math.max(1L, math.round(fraction * 4294967296.0))
      df.filter(substring(rowKey(df), 1, 8) < lit(f"$threshold%08x"))
    }
  }
}
