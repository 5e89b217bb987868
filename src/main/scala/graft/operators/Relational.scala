package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational combinators the reference hand-rolls in pandas,
  * re-expressed as single declarative plans so Catalyst can push filters,
  * prune columns, and pick join strategies.
  */
object Relational {

  /** Resume ledger anti-join: work remaining = candidates − done
    * (reference: pipelines/utils/progress.py:121-137, which does an outer
    * merge + indicator and keeps left_only). `left_anti` is the native
    * translation — one shuffle on the key, no indicator column
    * materialized. A null/empty ledger means everything is pending.
    */
  def remaining(candidates: DataFrame, done: Option[DataFrame], keys: Seq[String]): DataFrame =
    done match {
      case Some(d) => candidates.join(d.select(keys.map(col): _*).distinct(),
        keys, "left_anti")
      case None => candidates
    }

  /** Band (range-membership) join: left rows matched to the right interval
    * table where `value` ∈ [startCol, endCol] (reference: the CID-group
    * band join at pipelines/reports/informes_seguranca/utils.py:71-82,
    * which appends a high-sentinel to the interval end to make the bound
    * inclusive of prefixed codes). The interval table is broadcast — a
    * non-equi join against a non-broadcast side would be a cartesian
    * BroadcastNestedLoopJoin over the big side only, which is exactly what
    * we want for a small dimension of ranges.
    */
  def bandJoin(left: DataFrame, ranges: DataFrame, value: Column,
      startCol: String, endCol: String, joinType: String = "inner"): DataFrame =
    left.join(broadcast(ranges),
      value >= ranges(startCol) && value <= ranges(endCol), joinType)

  /** Union-by-name fold over heterogeneous parts with schema-drift
    * tolerance (reference: pd.concat accumulation at
    * pipelines/datalake/extract_load/diario_oficial_rj/tasks.py:235 and
    * missing-column fill at migrate/bq_to_subpav/utils.py:182-201).
    */
  def unionAll(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Schema drift report: (missing, extra) column sets vs an expected list
    * (reference: pipelines/datalake/extract_load/vitacare_gdrive/
    * tasks.py:176-179).
    */
  def schemaDrift(df: DataFrame, expected: Seq[String]): (Set[String], Set[String]) = {
    val actual = df.columns.toSet
    (expected.toSet -- actual, actual -- expected.toSet)
  }

  /** Rate rollup: per-group and global success/error rates in ONE pass via
    * ROLLUP grouping sets (reference computes per-AP metrics in a Python
    * loop plus a separate global pass,
    * extract_load/vitacare_api_v2/tasks.py:205-240). Partial aggregation
    * makes the shuffle carry one row per (group, flag-sums) — the rollup
    * costs nothing extra at scale.
    */
  def rateRollup(df: DataFrame, groupCol: String, flags: Map[String, Column]): DataFrame = {
    val aggs = flags.toSeq.sortBy(_._1).map { case (name, cond) =>
      avg(when(cond, 1.0).otherwise(0.0)).as(s"${name}_rate")
    } :+ count(lit(1)).as("n")
    df.rollup(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Row-size guard: drop (or fail on) rows whose JSON-serialized payload
    * exceeds `maxBytes` (reference: >10MB rows rejected before the native-
    * table load, prontuario_gcs/tasks.py:496-506). Codegen'd length check —
    * no row materialization beyond the serialization itself.
    */
  def oversizedRows(df: DataFrame, maxBytes: Long): DataFrame =
    df.filter(octet_length(to_json(struct(df.columns.map(col): _*))) > maxBytes)

  def dropOversizedRows(df: DataFrame, maxBytes: Long): DataFrame =
    df.filter(octet_length(to_json(struct(df.columns.map(col): _*))) <= maxBytes)

  /** Schema adequacy score: fraction of expected columns present
    * (reference: the gdrive ingest computes a conformance score and fails
    * below a threshold, vitacare_gdrive/tasks.py:98-242).
    */
  def schemaAdequacy(df: DataFrame, expected: Seq[String]): Double =
    if (expected.isEmpty) 1.0
    else expected.count(df.columns.contains).toDouble / expected.size

  /** Count-reconciliation invariant: |actual − expected| / expected within
    * tolerance (reference: minhasaude_mongodb/tasks.py:259-300 and
    * sisreg_api/tasks.py:137-144 use ±5%). Throws on violation, mirroring
    * the reference's hard failure.
    */
  def reconcileCount(actual: Long, expected: Long, tolerance: Double = 0.05): Unit = {
    require(expected >= 0 && actual >= 0, "counts must be non-negative")
    if (expected == 0) {
      require(actual == 0, s"expected 0 rows, got $actual")
    } else {
      val drift = math.abs(actual - expected).toDouble / expected
      require(drift <= tolerance,
        f"count reconciliation failed: actual=$actual expected=$expected drift=$drift%.4f > $tolerance")
    }
  }

  /** As-of (backward) join: each left row picks up the latest right row
    * with `rightTs <= leftTs` per key — the standard enrichment join for
    * event streams against slowly-changing checkpoints. Spark has no native
    * ASOF operator; rather than a range join (quadratic per key) this is the
    * union + running-last formulation: ONE shuffle on the key, one sort,
    * `last(ignoreNulls)` carries each payload forward. Right rows sort
    * before left rows at equal timestamps, making the match inclusive.
    * `payloadCols` must not collide with left column names.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lNorm = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val rNorm = right.select(
        (keys.map(col) :+ col(rightTs).as("__ts")) ++ payloadCols.map(col): _*)
      .withColumn("__side", lit(0))
    val u = lNorm.unionByName(rNorm, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(u)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }

  /** Skew-salted equi join: when a handful of hot keys dominate, a plain
    * shuffle join puts an entire hot key in one task. Salting splits every
    * left key into `saltFactor` sub-keys (deterministically, hashing the
    * keys plus up to 8 hash-safe spread columns — see [[saltSpreadCols]])
    * and replicates each RIGHT row `saltFactor` times, so a hot
    * key spreads over `saltFactor` tasks. Result is row-identical to the
    * unsalted inner join. AQE's skew handling covers sort-merge joins
    * post-hoc; explicit salting remains the tool when the skew is known and
    * extreme, or the join must be hash-partitioned a specific way.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(saltSpreadCols(left, keys): _*), lit(saltFactor))
        .cast("int"))
    val saltedRight = right.crossJoin(
      right.sparkSession.range(saltFactor).select(col("id").cast("int").as("__salt")))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }

  /** Salt-hash input columns shared by [[saltedJoin]] and
    * [[adaptiveSaltedJoin]]: the key columns plus up to 8 more HASH-SAFE
    * columns for row-spreading entropy — skipping unhashable types
    * (MapType, directly or nested) instead of letting `xxhash64` throw,
    * and capping the per-row hash cost on wide frames. Degenerate worst
    * case (all spread columns equal within a key) collapses to one
    * replica: un-spread skew, never wrong rows.
    */
  private def saltSpreadCols(left: DataFrame, keys: Seq[String]): Seq[Column] = {
    def hashSafe(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.ArrayType(e, _) => hashSafe(e)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashSafe(f.dataType))
      case _: org.apache.spark.sql.types.MapType => false
      case _ => true
    }
    keys.map(col) ++ left.schema.fields
      .filter(f => !keys.contains(f.name) && hashSafe(f.dataType))
      .take(8).map(f => col(f.name))
  }

  // separator for the composite hot-key probe string; a key value
  // containing it can only MISCLASSIFY a key as hot (extra replication),
  // never change join results
  private val HotKeySep = "\u0001"

  private def hotKeyOf(keys: Seq[String]): Column =
    concat_ws(HotKeySep, keys.map(k => col(k).cast("string")): _*)

  /** The skew-sample planner behind [[adaptiveSaltedJoin]]: ONE Misra-
    * Gries aggregate over the left side's key tuple (driver state = k
    * counters, corpus-size-independent) estimates the heaviest keys; keys
    * whose estimated row count exceeds `targetRowsPerTask` get a per-key
    * salt factor `ceil(est / target)` capped at `maxSaltFactor`. Returns
    * ONLY the hot keys — everything absent salts at factor 1, i.e. cold
    * keys are never replicated. At `sampleFraction = 1` Misra-Gries
    * UNDERestimates, so a key can only be under-salted (mild residual
    * skew), never phantom-salted by overcounting; with a sampled probe
    * the scaled estimate can swing either way, and a phantom-salted cold
    * key costs only its own replication — join rows are unchanged.
    */
  def saltPlan(left: DataFrame, keys: Seq[String],
      targetRowsPerTask: Long, maxSaltFactor: Int = 64,
      probeK: Int = 64, sampleFraction: Double = 1.0): Map[String, Int] = {
    require(targetRowsPerTask > 0 && maxSaltFactor > 0 && probeK > 0)
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction $sampleFraction out of (0, 1]")
    import graft.functions.SketchFunctions
    // the probe scan is column-pruned to the key columns; sampleFraction
    // < 1 additionally probes a seeded Bernoulli sample (estimates scaled
    // back up) — skew planning only needs the order of magnitude, and a
    // sampling error can only mis-SIZE a factor, never change join rows
    val probeSide =
      if (sampleFraction < 1.0) left.sample(withReplacement = false,
        fraction = sampleFraction, seed = 42L)
      else left
    val scale = 1.0 / sampleFraction
    probeSide
      .select(SketchFunctions.heavyHitters(hotKeyOf(keys), probeK).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("k"),
        (col("e.est_count") * scale).cast("long").as("est"))
      .filter(col("est") > targetRowsPerTask)
      .collect() // bounded: at most probeK rows
      .map(r => r.getString(0) ->
        math.min(maxSaltFactor.toLong,
          (r.getLong(1) + targetRowsPerTask - 1) / targetRowsPerTask).toInt)
      .toMap
  }

  /** Skew-aware salted equi join: [[saltedJoin]] replicates the WHOLE
    * right side `saltFactor` times with a caller-guessed factor; this
    * variant probes the left side's key frequencies ([[saltPlan]]) and
    * salts ONLY the hot keys, each with its own factor — cold keys join
    * completely un-replicated (salt 0 on both sides), so the shuffle
    * carries no redundant right rows and no magic constant. The hot map
    * (≤ probeK entries) rides a broadcast join onto both sides. Result is
    * row-identical to the plain inner join for ANY probe outcome:
    * misclassification costs replication, never rows.
    */
  def adaptiveSaltedJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], targetRowsPerTask: Long,
      maxSaltFactor: Int = 64, probeK: Int = 64,
      sampleFraction: Double = 1.0,
      plan: Option[Map[String, Int]] = None): DataFrame = {
    val hot = plan.getOrElse(
      saltPlan(left, keys, targetRowsPerTask, maxSaltFactor, probeK,
        sampleFraction))
    if (hot.isEmpty) return left.join(right, keys)
    val spark = left.sparkSession
    import spark.implicits._
    val hotDf = broadcast(hot.toSeq.toDF("__hotkey", "__factor"))
    // the salt must be DETERMINISTIC per row content: it sits upstream of
    // the (keys, __salt) shuffle, and a nondeterministic salt (row counter,
    // rand) re-salts rows differently when a lost executor re-runs only
    // SOME map tasks — reducers that already fetched the old output then
    // see a row joined twice or dropped (Spark only rolls back whole
    // stages for round-robin repartition, not nondeterministic SQL
    // expressions). Spread-column choice (hash-safe filter + 8-col cap)
    // is shared with [[saltedJoin]] — see [[saltSpreadCols]].
    val spreadCols = saltSpreadCols(left, keys)
    val lf = left.withColumn("__hotkey", hotKeyOf(keys))
      .join(hotDf, Seq("__hotkey"), "left")
      .withColumn("__salt", pmod(xxhash64(spreadCols: _*),
        coalesce(col("__factor"), lit(1)).cast("long")).cast("int"))
      .drop("__hotkey", "__factor")
    val rf = right.withColumn("__hotkey", hotKeyOf(keys))
      .join(hotDf, Seq("__hotkey"), "left")
      // cold rows: sequence(0, 0) = exactly one salt row, no replication
      // (sequence of two ints is already array<int> — no cast, which a
      // generator cannot nest under anyway)
      .withColumn("__salt", explode(
        sequence(lit(0), coalesce(col("__factor"), lit(1)) - 1)))
      .drop("__hotkey", "__factor")
    lf.join(rf, keys :+ "__salt").drop("__salt")
  }

  /** Deterministic surrogate key from natural-key columns: the reference
    * uses uuid5 over pipe-joined keys (cientificalab_api/tasks.py:131-188);
    * any deterministic namespaced hash preserves the semantics, so we use
    * sha2-256 which is native and codegen'd. The encoding is injective:
    * backslashes and pipe separators inside values are escaped and null is
    * a reserved token, so ("a|b","c") vs ("a","b|c") and null vs any real
    * value hash differently.
    */
  def surrogateKey(cols: Seq[Column]): Column = {
    val encoded = cols.map { c =>
      when(c.isNull, lit("\\N"))
        .otherwise(regexp_replace(
          regexp_replace(c.cast("string"), "\\\\", "\\\\\\\\"), "\\|", "\\\\|"))
    }
    sha2(concat_ws("|", encoded: _*), 256)
  }

  /** Batch event-time sessionization: assign a per-key session id that
    * increments whenever the gap to the previous event exceeds
    * `gapSeconds`. One shuffle (the window partition); the running sum is
    * computed in the same sorted pass as the lag. `order` must make the
    * within-key order total (append a unique tiebreaker) for deterministic
    * ids. The batch complement of `streaming/Incremental.sessionize` —
    * same session semantics, replayable by any engine with window
    * functions.
    */
  /** Reject inputs that already carry a column this operator is about to
    * write — silent `withColumn` overwrite corrupts user data; fail loud.
    */
  private[operators] def requireFreshColumns(df: DataFrame, reserved: Seq[String], op: String): Unit = {
    val clash = df.columns.filter(c => reserved.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"$op writes output column(s) ${reserved.mkString(", ")} but the input " +
        s"already contains ${clash.mkString(", ")}; rename or drop them first")
  }

  def sessionize(df: DataFrame, keys: Seq[String], ts: Column,
      order: Seq[Column], gapSeconds: Long): DataFrame = {
    requireFreshColumns(df, Seq("session_id"), "sessionize")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    // tolerate TIMESTAMP_NTZ inputs (parquet written by engines that don't
    // stamp a zone — unix_micros rejects NTZ outright): the cast reads the
    // wall-clock in the session zone, which this engine pins to UTC, and
    // gaps are DIFFERENCES so any fixed zone interpretation cancels out
    val tsz = ts.cast(org.apache.spark.sql.types.TimestampType)
    // integer microseconds (not seconds-as-double): gap comparison is
    // integer-exact, so any engine replays boundaries identically
    val gapBreak = when(
      unix_micros(tsz) - unix_micros(lag(tsz, 1).over(w)) > gapSeconds * 1000000L, 1L)
      .otherwise(lit(0L))
    // running sum of gap-breaks = 0-based session ordinal within the key
    df.withColumn("session_id", sum(gapBreak).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** SCD type-2 history builder: collapse per-key state observations (daily
    * full snapshots, event streams) into validity intervals — one output row
    * per consecutive run of identical tracked state, with `valid_from`,
    * `valid_to` (null = current version), a per-key `version` ordinal, and
    * the run's observation count `n_obs`. The warehouse pattern behind the
    * reference's snapshot-stamped lake tables (reference:
    * pipelines/datalake/utils/data_transformations.py:146-199 adds
    * `snapshot_date` metadata to every full extract): day N's full extract
    * usually repeats day N-1's state, and history queries want intervals,
    * not a row per day.
    *
    * ONE shuffle: every window partitions by `keys` alone — change
    * detection (null-safe `<=>` against `lag`), the running-sum run
    * ordinal, the forward-looking `valid_to` (min of future change
    * timestamps), and the per-run count (partitioning by keys+run is
    * satisfied by the keys hash partitioning, so no second exchange) all
    * share the same sorted pass. `order` must be a total order within key
    * (append a unique tiebreaker).
    */
  def scd2(df: DataFrame, keys: Seq[String], ts: Column,
      order: Seq[Column], tracked: Seq[String]): DataFrame = {
    requireFreshColumns(df,
      Seq("version", "valid_from", "valid_to", "n_obs", "__chg"), "scd2")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = w.rowsBetween(1, Window.unboundedFollowing)
    val changed = tracked.map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val base = df
      .withColumn("__chg",
        when(changed || row_number().over(w) === 1, 1L).otherwise(0L))
      .withColumn("version", sum(col("__chg")).over(run))
      .withColumn("valid_to",
        min(when(col("__chg") === 1L, ts)).over(future))
      .withColumn("n_obs",
        count(lit(1)).over(Window.partitionBy(
          (keys.map(col) :+ col("version")): _*)))
    base.filter(col("__chg") === 1L)
      .select((keys.map(col) ++ tracked.map(col)) ++ Seq(
        col("version"), ts.as("valid_from"), col("valid_to"), col("n_obs")): _*)
  }

  /** Sequence packing: assign each document to a fixed-capacity context
    * bin (training-batch window) by exclusive running token count within
    * its shard — `bin_id = tokens_before DIV capacity`, `offset_in_bin =
    * tokens_before - bin_id * capacity`. The offset-packing definition: a
    * bin may overrun by less than one document (standard constant-slack
    * packing — an exact greedy reset is a sequential scan by definition),
    * and everything is integer arithmetic, so any engine replays bin
    * assignments exactly.
    *
    * `shardKeys` bounds the running sum's sort to a shard (e.g. language,
    * source, hash bucket) — packing 100 TB globally would serialize into
    * one partition; per-shard packing is one shuffle and each shard sorts
    * independently. `order` must totally order docs within the shard.
    */
  def packSequences(df: DataFrame, shardKeys: Seq[String],
      order: Seq[Column], tokens: Column, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    requireFreshColumns(df,
      Seq("n_tokens", "bin_id", "offset_in_bin", "__cum"), "packSequences")
    val w = Window.partitionBy(shardKeys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"__cum DIV ${capacity}L"))
      .withColumn("offset_in_bin", col("__cum") - col("bin_id") * capacity)
      .drop("__cum")
  }

  /** Exact grouped order-statistic percentiles: for each key, the value at
    * ascending rank `ceil(p * n)` (1-indexed) per requested percentile —
    * the discontinuous ("disc") definition, which SELECTS an input value
    * instead of interpolating, so doubles pass through bit-identical and
    * any engine replays the result (interpolating definitions differ
    * engine-to-engine; rank arithmetic here is the same IEEE
    * `ceil(p * n)` everywhere). Ties in `value` are safe: the value AT a
    * fixed rank is deterministic regardless of tie order.
    *
    * One shuffle; the rank window and the count window share the key
    * partitioning, and the final per-key agg collapses in the same
    * exchange. Exact percentiles require the per-key sort by definition —
    * at scales where that sort hurts, reach for `approx_percentile`
    * (t-digest, no sort) and accept engine-specific results.
    */
  def exactPercentiles(df: DataFrame, keys: Seq[String], value: Column,
      percentiles: Seq[Double]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0 && p <= 1),
      s"percentiles must be in (0, 1], got $percentiles")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(value)
    val ranked = df.filter(value.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(keys.map(col): _*)))
    val pcols = percentiles.map { p =>
      max(when(col("__rn") === ceil(col("__n") * p), value))
        .as(s"p${math.round(p * 100)}")
    } :+ max(col("__n")).as("n_values")
    ranked.groupBy(keys.map(col): _*).agg(pcols.head, pcols.tail: _*)
  }

  /** Deterministic train/val/test assignment: the key's portable md5
    * bucket (0–99) mapped to a split label by cumulative percentage.
    * Pure column expression — no shuffle, no state, pushes into scans —
    * and the same key lands in the same split in every table, run, and
    * engine, which is what keeps a held-out set actually held out across
    * a 100 TB corpus rebuild.
    */
  def splitAssign(key: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need train > 0, val >= 0, train + val < 100; got $trainPct/$valPct")
    val bucket = pmod(
      conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(100L))
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic fixed-size sample: the n keys with the smallest
    * portable md5 hashes (tie-broken by key). Compiles to
    * TakeOrderedAndProject — per-partition bounded heaps, only n survivors
    * shuffle to the driver-side merge — so picking a 10k-doc eval set from
    * 100 TB never materializes a global sort. Same n keys every run and in
    * every engine.
    */
  def deterministicSample(df: DataFrame, key: Column, n: Int): DataFrame = {
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    df.withColumn("__h", h).orderBy(col("__h"), key).limit(n).drop("__h")
  }

  /** Deterministic (hash-based) sampling: keep a row iff its key's portable
    * 60-bit md5 bucket mod 100 falls under `percent` — which may be a
    * per-row expression, giving STRATIFIED rates (e.g. downsample one
    * source to 10% while keeping another at 50%) in the same single pass.
    *
    * Versus `df.sample()`: reproducible across runs, engines, and
    * repartitioning (seeded `sample` is partition-order-dependent), and
    * co-sampling holds — the same key draws the same verdict in every
    * table, so sampled fact/dim joins stay consistent. This is the sampling
    * discipline a training-data pipeline needs for stable held-out splits.
    * Pure filter: pushes to the scan, no shuffle.
    */
  def hashSample(df: DataFrame, key: Column, percent: Column): DataFrame =
    df.filter(pmod(
      conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(100L)) < percent)

  /** Rebalance a corpus to TARGET source-mixture proportions (the training-
    * data "domain weights" step: e.g. 50% web, 30% code, 20% books) by
    * deterministic per-source down-sampling. `targets` must sum to 1; the
    * output is the LARGEST corpus achieving those proportions exactly-in-
    * expectation without upsampling: T = min over sources of n_s/w_s, and
    * source s keeps floor(1e6·w_s·T/n_s) parts-per-million of its rows by
    * portable md5 bucket — same rows every run and in every engine
    * (the q97 DuckDB oracle replays rates AND row picks bit-for-bit).
    * Sources outside `targets` are dropped.
    *
    * One tiny count aggregate (one row per source, collected — bounded by
    * source cardinality, never row count) sizes the rates; the sample
    * itself is a stateless codegen'd filter on the scan: no shuffle at all.
    */
  def rebalanceMixture(df: DataFrame, sourceCol: String, key: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "rebalanceMixture needs at least one target")
    require(targets.values.forall(_ > 0), "target weights must be positive")
    require(math.abs(targets.values.sum - 1.0) < 1e-9,
      s"target weights must sum to 1, got ${targets.values.sum}")
    val counts = df.filter(col(sourceCol).isInCollection(targets.keys.toSeq))
      .groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.keys.foreach(s => require(counts.getOrElse(s, 0L) > 0L,
      s"rebalanceMixture: no rows for target source '$s'"))
    // largest feasible total without upsampling; rate arithmetic uses ONE
    // fixed expression shape (((1e6*w)*t)/n, floored) so any engine
    // replaying it gets identical ppm thresholds
    val t = targets.map { case (s, w) => counts(s) / w }.min
    val ppm = targets.map { case (s, w) =>
      s -> math.floor(1000000.0 * w * t / counts(s)).toLong }
    val rate = ppm.foldLeft(lit(-1L)) { case (acc, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(acc) }
    df.filter(col(sourceCol).isInCollection(targets.keys.toSeq))
      .filter(pmod(
        conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
        lit(1000000L)) < rate)
  }

  /** Deterministic fixed-N sample PER GROUP (stratified eval sets, per-source
    * quotas): the n keys with the smallest portable md5 hashes within each
    * group. Runs through [[graft.plans.TopKPerKey]] — per-partition bounded
    * heaps and a survivors-only shuffle (≤ n rows per group leave the map
    * side), never a global or per-group full sort. Same rows every run and
    * in every engine (`row_number() OVER (PARTITION BY g ORDER BY md5h60,
    * key) <= n` replays it).
    */
  def sampleFixedNPerGroup(df: DataFrame, groups: Seq[String], key: Column,
      n: Int): DataFrame = {
    requireFreshColumns(df, Seq("__h"), "sampleFixedNPerGroup")
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    graft.plans.TopKPerKey(df.withColumn("__h", h),
      groups.map(col), Seq(col("__h").asc, key.asc), n).drop("__h")
  }

  /** Bloom-filter join pruning — the 100 TB semi-join strategy: build a
    * bloom filter over the SMALL side's join keys (distributed
    * `BloomFilterAggregate`, mergeable bounded-bit buffers), embed it as a
    * literal, and pre-filter the BIG side before the real join. False
    * positives pass the filter and are then dropped by the join itself, so
    * the result is EXACTLY the plain join — the bloom only sheds the
    * (usually dominant) never-matching rows before they pay the shuffle.
    * Spark's own runtime filtering (`InjectRuntimeFilter`) does this
    * opportunistically under AQE thresholds; this operator is the explicit,
    * always-on form for when the pipeline KNOWS the big side is mostly
    * non-matching (e.g. filtering a crawl against an allowlist).
    *
    * EAGER: the bloom bits are aggregated at call time (one job over the
    * small side, O(numBits) driver memory — bounded by `fpp`/`expectedItems`,
    * NOT by small-side row count).
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      expectedItems: Long = 1000000L, fpp: Double = 0.03,
      joinType: String = "inner"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType
    require(keys.nonEmpty, "bloomPrunedJoin needs join keys")
    // pre-filtering the BIG side is only result-preserving for join types
    // that do not preserve non-matching big-side rows: under left_outer /
    // full_outer / left_anti the plain join KEEPS (or returns) exactly the
    // rows the bloom sheds, so the pruned result would diverge — left_anti
    // catastrophically (it would drop nearly the entire correct answer)
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "leftsemi", "semi", "rightouter", "right")
        .contains(jt),
      s"bloomPrunedJoin: joinType '$joinType' preserves non-matching " +
        "big-side rows; bloom pre-filtering would change the result. " +
        "Use inner/left_semi/right_outer/cross, or a plain join.")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    def keyHash(df: DataFrame): Column = xxhash64(keys.map(df(_)): _*)
    val bloom = small.agg(Bridge.column(new BloomFilterAggregate(
      Bridge.catalystExpression(keyHash(small)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
      .as("bf")).head().getAs[Array[Byte]](0)
    // an all-null/empty small side yields no filter — the join answers
    if (bloom == null) return big.join(small, keys, joinType)
    val pruned = big.filter(Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      Bridge.catalystExpression(keyHash(big)))))
    pruned.join(small, keys, joinType)
  }

  /** Fixed-width histogram: clamp-bucketed counts over `[lo, hi)` in one
    * map-side-combinable aggregation (shuffle = O(bins)). The bucket math
    * is one subtraction, one division, and a floor — all correctly rounded
    * under IEEE 754 — so every engine assigns identical bins. Empty
    * buckets are absent (no spine join); out-of-range values clamp to the
    * edge buckets.
    */
  def histogram(df: DataFrame, value: Column, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val bucket = least(greatest(floor((value - lit(lo)) / lit(width)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    // NaN is dropped, not clamped: Spark orders NaN above +Inf while other
    // engines differ, so letting NaN through would give engine-dependent
    // edge-bin counts
    df.filter(value.isNotNull && !isnan(value.cast("double")))
      .groupBy(bucket.as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** CDC apply (MERGE): roll a changelog into a base snapshot. `changes`
    * carries the same payload columns as `base` plus an op marker
    * (`"upsert"` or `"delete"`) and ordering columns; for each key the
    * LATEST change wins — an upsert replaces the base row (or inserts),
    * a delete removes it — and keys with no changes keep their base row.
    * The lake-side half of the reference's reverse-ETL upsert
    * (reference: pipelines/tools/api_vitai/flows.py batched upserts), done
    * as a set operation instead of row RPCs.
    *
    * Latest-change selection runs through [[graft.plans.TopKPerKey]]
    * (k=1 per key, survivors-only shuffle — the changelog never sorts);
    * the merge is ONE full-outer join on the keys.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keys: Seq[String],
      order: Seq[Column], op: Column, payload: Seq[String]): DataFrame = {
    requireFreshColumns(base, Seq("__op"), "applyCdc")
    requireFreshColumns(changes, Seq("__op"), "applyCdc (changes side)")
    val latest = graft.plans.TopKPerKey(
      changes.withColumn("__op", op),
      keys.map(col), order.map(_.desc), 1)
      .select(keys.map(col) ++ payload.map(c => col(c).as(s"__new_$c"))
        :+ col("__op"): _*)
    base.join(latest, keys, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "delete")
      .select(keys.map(col) ++ payload.map(c =>
        when(col("__op").isNotNull, col(s"__new_$c")).otherwise(col(c)).as(c)): _*)
  }
}
