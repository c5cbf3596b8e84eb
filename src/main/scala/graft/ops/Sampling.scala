package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-based sampling — the sampling discipline that
 * actually works at 100 TB. `df.sample()` draws from a per-partition RNG,
 * so the selected set changes with partitioning, retries, and cluster
 * size; a hash sample is a pure function of the row KEY: reproducible
 * across runs, stable under repartitioning, consistent between a pipeline
 * and its backfill, and composable (disjoint rate bands never overlap).
 *
 * A row is kept iff `xxhash64(seed, key) mod 2^20` falls below
 * `fraction * 2^20` — a narrow codegen'd projection, no shuffle, no RNG
 * state. Different seeds give independent samples; `[lo, hi)` bands of
 * the same seed partition the data exactly.
 */
object Sampling {

  private val Buckets = 1L << 20

  /** The row's sample bucket in [0, 2^20): pure function of (seed, key). */
  def bucket(key: Column, seed: Long): Column =
    pmod(xxhash64(lit(seed), key), lit(Buckets))

  /** Keep approximately `fraction` of rows, deterministically by key —
    * exactly the `[0, fraction)` band, so a sample and the bands of the
    * same seed compose without overlap by construction. */
  def hashSample(df: DataFrame, key: Column, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    hashBand(df, key, 0.0, fraction, seed)
  }

  /** Keep rows whose bucket falls in `[lo, hi)` of the unit interval —
    * bands of one seed are exactly disjoint and exactly exhaustive, the
    * right way to carve held-out/eval/train splits of a corpus. */
  def hashBand(df: DataFrame, key: Column, lo: Double, hi: Double,
      seed: Long = 42L): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi, s"band [$lo, $hi) out of range")
    val b = bucket(key, seed)
    df.filter(b >= (lo * Buckets).toLong && b < (hi * Buckets).toLong)
  }

  /** ARITHMETIC hash of an integral key in [0, 1000003). Weaker mixing than
    * xxhash64 but exactly reproducible in plain SQL by any engine (the
    * oracle path); the inner `pmod` keeps the multiply overflow-safe under
    * ANSI for any long key. */
  def arithHash(key: Column): Column =
    pmod(pmod(key, lit(1000003L)) * lit(2654435761L) + lit(104729L),
      lit(1000003L))

  /** Deterministic percentage bucket in [0, 100) from [[arithHash]]. */
  def arithBucket(key: Column): Column = arithHash(key) % 100

  /**
   * Weighted dataset mixture: keep each row with its SOURCE's percentage
   * weight, deterministically by key — the "80% web, 50% books, 20% code"
   * recipe that composes a training mix from heterogeneous corpora. A
   * narrow filter (no shuffle, no RNG): a row is kept iff its key's bucket
   * falls below the weight of its source; re-running, repartitioning, or
   * backfilling selects the SAME rows. Sources missing from `weights` are
   * dropped (null weight never compares true).
   */
  def mixture(df: DataFrame, source: Column, key: Column,
      weights: Map[String, Int]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 100),
      s"mixture weights must be percentages in [0,100], got $weights")
    df.filter(arithBucket(key) < element_at(litMap(weights), source))
  }

  /**
   * Per-source keep-permilles for a temperature-scaled mixture
   * (alpha = 1/2): sampling probability proportional to
   * `count(source)^alpha` — the standard multilingual/low-resource
   * up-weighting recipe (large sources are flattened toward small ones)
   * with the exponent fixed at 1/2 so every weight is an EXACT integer
   * (integer sqrt of the source count; a general `pow` is not correctly
   * rounded and would not replay across engines). Expected kept rows
   * total ~`targetRows`, allocated proportionally to sqrt(count):
   * `permille_s = min(1000, (1000 * targetRows * isqrt(n_s)) div
   * (sum_w * n_s))` — floor semantics, so a source whose allocation
   * rounds below 1/1000 of its rows drops out VISIBLY here (permille 0)
   * rather than silently oversampling.
   *
   * One aggregate job collects one row per source (counter scale — source
   * cardinality is small by the same contract as [[mixture]]'s weights
   * map); the arithmetic is driver-side BigInt, exact at any corpus size
   * and any target (the in-plan Long product `1000 * targetRows * w`
   * would overflow at ~10^19). A SQL oracle replays it with 128-bit
   * integer division.
   */
  def temperaturePermilles(df: DataFrame, source: Column,
      targetRows: Long): Map[String, Int] = {
    require(targetRows >= 0, s"targetRows must be non-negative, got $targetRows")
    def bigIsqrt(n: BigInt): BigInt = {
      var x = BigInt(math.floor(math.sqrt(n.toDouble)).toLong)
      while ((x + 1) * (x + 1) <= n) x += 1
      while (x * x > n) x -= 1
      x
    }
    // null sources are excluded: a null map key is rejected by the map
    // literal at runtime, and element_at(map, null) drops the row in the
    // gate anyway — same semantics as [[mixture]]'s missing-source drop.
    // The cast to string makes a non-string source column (an int shard
    // id, a date) legal: the collected keys are read as strings, and
    // [[temperatureMixture]] casts identically on its gate side.
    val counts = df.groupBy(source.cast("string").as("__src"))
      .agg(count(lit(1)).as("__n"))
      .collect().flatMap(r =>
        Option(r.getString(0)).map(_ -> BigInt(r.getLong(1)))).toMap
    val ws = counts.map { case (s, n) => s -> bigIsqrt(n) }
    val sw = ws.values.sum
    counts.map { case (s, n) =>
      val p = (BigInt(1000) * targetRows * ws(s)) / (sw * n)
      s -> p.min(1000).toInt
    }
  }

  /**
   * Temperature-scaled mixture (alpha = 1/2): [[temperaturePermilles]]
   * inlined into a NARROW deterministic [[arithHash]] gate — zero joins,
   * zero shuffles on the corpus; re-running, repartitioning, or
   * backfilling keeps the SAME rows.
   */
  def temperatureMixture(df: DataFrame, source: Column, key: Column,
      targetRows: Long): DataFrame = {
    val perm = temperaturePermilles(df, source, targetRows)
    if (perm.isEmpty) df.filter(lit(false))
    else df.filter(arithHash(key) % 1000 <
      element_at(litMap(perm), source.cast("string")))
  }

  /**
   * Quality-mass (top-p / nucleus) carve: per group, keep the HIGHEST-mass
   * rows until `permille`/1000 of the group's total mass is covered — the
   * relative counterpart of [[budgetCarvePerGroup]]'s absolute budgets
   * ("the best docs making up 80% of each source's quality mass", "the
   * longest docs holding 90% of the chars"). Kept rows per group are
   * exactly `SUM(mass) OVER (PARTITION BY group ORDER BY mass DESC, key)
   * <= (total_mass(group) * permille) div 1000` — plain-SQL replayable,
   * exact integer arithmetic throughout.
   *
   * Scale shape: the same crossing-bucket plan as the budget carves, with
   * the bucket axis laid along MASS instead of a hash — `mass div
   * binWidth`, descending. The (group, bin) ledger is counter scale (mass
   * range / binWidth rows per group), group totals and the per-group
   * crossing bin come from that ledger alone, whole bins above the
   * crossing pass a narrow filter, and only crossing-bin rows (~one bin's
   * worth per group) pay a keyed window — never a per-group sort of the
   * data. A group's rows never serialize through one window partition, so
   * a dominant group costs ledger rows only.
   *
   * Contracts: `mass` integral and non-negative (enforced like the budget
   * carves' cost — fractional mass would silently truncate, negative mass
   * breaks both the total and the prefix); null key/mass/group rows drop;
   * keys unique. `binWidth` trades ledger size against crossing-bin
   * volume, exactly like the salted as-of's bucket width.
   */
  def massCarve(df: DataFrame, group: Column, key: Column, mass: Column,
      permille: Int, binWidth: Long = 64L): DataFrame = {
    require(permille >= 0 && permille <= 1000,
      s"permille must be in [0, 1000], got $permille")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val massL = guardedCost(df, mass, api = "mass carve", param = "mass")
    val taken = df.columns.toSet
    val Seq(gCol, mCol, bCol, sCol, cumCol, totCol, bsCol, remCol) =
      Seq("__g", "__m", "__bin", "__s", "__cum", "__tot", "__bstar", "__rem")
        .map(RangeJoin.freshName(_, taken))
    val rows = df.filter(key.isNotNull && mass.isNotNull && group.isNotNull)
      .withColumn(gCol, group)
      .withColumn(mCol, massL)
      .withColumn(bCol, expr(s"`$mCol` div $binWidth"))
    // (group, mass-bin) ledger: counter scale; cum runs DOWN the mass axis
    val ledger = rows.groupBy(col(gCol), col(bCol)).agg(sum(col(mCol)).as(sCol))
      .withColumn(cumCol,
        sum(col(sCol)).over(Window.partitionBy(col(gCol)).orderBy(col(bCol).desc)))
      .withColumn(totCol, sum(col(sCol)).over(Window.partitionBy(col(gCol))))
    // floor(tot * permille / 1000) decomposed so tot*permille never forms:
    // tot = 1000q + r gives q*permille + floor(r*permille/1000), with
    // q*permille <= tot and r*permille < 10^6 — exact for ANY long total,
    // where the naive product wraps past ~9.2e15 total mass at permille
    // 1000 (the DuckDB replay computes the product in HUGEINT and needs
    // no decomposition)
    val thr = expr(s"(`$totCol` div 1000) * $permille" +
      s" + (`$totCol` % 1000) * $permille div 1000")
    carveByCrossing(rows, ledger, thr,
      gCol = gCol, bktCol = bCol, sCol = sCol, cumCol = cumCol,
      bsCol = bsCol, remCol = remCol, descending = true,
      measure = col(mCol), withinOrder = Seq(col(mCol).desc, key),
      dropCols = Seq(gCol, mCol, bCol, bsCol, remCol))
  }

  /** Literal map in sorted key order (stable plans regardless of the
    * input map's iteration order); `element_at` lookups yield null for
    * missing keys, which never compares true — the drop-unknown-sources
    * semantics [[mixture]] and [[budgetCarvePerGroup]] share. */
  private def litMap[T](m: Map[String, T]): Column =
    map(m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** The carve cost/mass contract, enforced: integral at plan time (a
    * silent fractional cast would truncate sub-1 costs to 0 and report the
    * whole corpus as within budget — same loud rejection as
    * [[weightedPriority]]'s weights) and non-negative at runtime (a
    * negative cost breaks prefix monotonicity, so the crossing-bucket
    * selection would silently diverge from the documented windowed-prefix
    * semantics). `api`/`param` name the calling operator in the errors. */
  private def guardedCost(df: DataFrame, cost: Column,
      api: String = "budget carve", param: String = "cost"): Column = {
    val cType = df.select(cost).schema.head.dataType
    require(Seq("tinyint", "smallint", "int", "bigint").contains(cType.simpleString),
      s"$api requires an integral $param column, got ${cType.simpleString}; " +
        s"scale fractional ${param}s to integers first (e.g. micro-units)")
    val c = cost.cast("long")
    when(c < 0L, raise_error(concat(
        lit(s"$api: negative $param "), c.cast("string"),
        lit(" breaks prefix monotonicity"))))
      .otherwise(c)
  }

  /**
   * Per-group quota: keep at most `n` rows per group, chosen by descending
   * deterministic-hash score with id tie-break — bounded, reproducible
   * "random N per domain" capping. Uses the bounded top-k heap aggregate
   * ([[graft.functions.TopKByScore]]), so the shuffle carries at most
   * `mappers x groups x n` rows and no per-group window sort exists: the
   * plan that survives a group with 10^9 rows. Returns (group, id).
   */
  def quotaPerGroup(df: DataFrame, group: Column, id: Column, n: Int): DataFrame =
    df.select(group.as("group"), id.as("id"))
      .groupBy(col("group"))
      .agg(Similarity.topKAgg(
        arithBucket(col("id")).cast("double"), col("id"), n).as("top"))
      .select(col("group"), explode(col("top")).as("e"))
      .select(col("group"), col("e.id").as("id"))

  /**
   * Deterministic weighted sampling without replacement: keep the `n` rows
   * with the highest integer PRIORITY `w * 1000003 div (arithHash(key)+1)`
   * — a row's chance of surviving scales with its weight (the
   * priority-sampling scheme of Duffield-Lund-Thorup, CACM'07, with the
   * uniform draw replaced by the deterministic key hash), yet the selected
   * set is a pure function of (key, weight): reproducible across runs,
   * engines, and partitionings, and exactly replayable in plain SQL.
   * Selection is one bounded-heap top-n aggregate — no global sort, no
   * shuffle of the losers. Returns (rank, id, priority), rank 1..n by
   * (priority desc, id asc).
   *
   * Weight domain: an INTEGRAL column (fractional weights are rejected at
   * plan time — a silent cast would truncate quality scores in (0,1) to 0
   * and degenerate the sample to the id tie-break) with |w| < 2^32,
   * enforced at runtime with a loud error. The bound keeps `w * modulus`
   * (a) overflow-free and (b) below 2^53, so the heap's double score
   * carries the integer priority EXACTLY — a silently rounded priority
   * would pick different rows than the documented plain-SQL replay.
   */
  def weightedPriority(df: DataFrame, key: Column, weight: Column, n: Int): DataFrame = {
    val wType = df.select(weight).schema.head.dataType
    require(Seq("tinyint", "smallint", "int", "bigint").contains(wType.simpleString),
      s"weightedPriority requires an integral weight column, got ${wType.simpleString}; " +
        "scale fractional scores to integers first (e.g. micro-units)")
    df.select(key.as("id"), weight.cast("long").as("w"))
      .withColumn("w",
        when(col("w") <= lit(-(1L << 32)) || col("w") >= lit(1L << 32), expr(
          "raise_error(concat('weightedPriority: |weight| must be < 2^32 for exact " +
            "double-carried priorities, got ', CAST(w AS STRING)))"))
          .otherwise(col("w")))
      .withColumn("h", arithHash(col("id")))
      .select(col("id"), expr("(w * 1000003L) div (h + 1L)").as("priority"))
      .agg(Similarity.topKAgg(col("priority").cast("double"), col("id"), n).as("top"))
      .select(posexplode(col("top")))
      // priorities are integers < 2^53: the heap's double score is exact,
      // so the priority is recovered from the sketch, not re-scanned
      .select((col("pos") + 1).cast("long").as("rank"), col("col.id").as("id"),
        col("col.score").cast("long").as("priority"))
  }

  /**
   * Token-budget carve: the deterministic pseudo-random PREFIX of the
   * corpus whose cumulative cost stays within `budget` — "carve exactly N
   * training tokens" as a reproducible set, not a fraction. Semantically
   * the kept rows are exactly
   * `SUM(cost) OVER (ORDER BY arithHash(key), key) <= budget`
   * (plain-SQL replayable, like every sampler here), but that window is a
   * global sort plus a single-partition running total — a non-starter at
   * corpus scale. The plan instead exploits that the order's FIRST
   * component is the hash bucket, so the budget boundary cuts the bucket
   * axis at one point:
   *
   *  1. bucket ledger: `groupBy(arithHash(key)).agg(sum(cost))` — counter
   *     scale (at most 1,000,003 rows REGARDLESS of corpus size), with a
   *     running total over those ledger rows only;
   *  2. ONE row to the driver: the first bucket whose running total
   *     exceeds the budget (none = the whole corpus fits), carrying the
   *     budget remainder left for it;
   *  3. buckets strictly before the crossing keep ALL rows — a narrow
   *     codegen'd filter, no shuffle, no per-row window; buckets after
   *     keep none;
   *  4. only the crossing bucket's rows (~1/1,000,003 of the corpus) pay
   *     a keyed window cumsum to split at the remainder.
   *
   * Contracts: `cost` must be non-negative (a negative cost breaks prefix
   * monotonicity — rows after it could re-enter the budget); rows with a
   * null key or cost are dropped eagerly (they can neither order nor
   * account); `key` unique per row (the id tie-break contract every
   * sampler here shares).
   */
  def budgetCarve(df: DataFrame, key: Column, cost: Column, budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be non-negative, got $budget")
    val costL = guardedCost(df, cost)
    val taken = df.columns.toSet
    val hCol = RangeJoin.freshName("__h", taken)
    val sCol = RangeJoin.freshName("__s", taken + hCol)
    val cumCol = RangeJoin.freshName("__cum", taken + hCol + sCol)
    val rows = df.filter(key.isNotNull && cost.isNotNull)
      .withColumn(hCol, arithHash(key))
    val ledger = rows.groupBy(col(hCol)).agg(sum(costL).as(sCol))
      .withColumn(cumCol, sum(col(sCol)).over(Window.orderBy(col(hCol))))
    // the single crossing bucket (TakeOrdered over ledger rows): its id and
    // the budget left after every bucket strictly before it
    val cross = ledger.filter(col(cumCol) > lit(budget))
      .orderBy(col(hCol)).limit(1)
      .select(col(hCol), (lit(budget) - (col(cumCol) - col(sCol))).as(sCol))
      .collect()
    if (cross.isEmpty) rows.drop(hCol) // whole corpus fits the budget
    else {
      val (hStar, remainder) = (cross(0).getLong(0), cross(0).getLong(1))
      val kept = rows.filter(col(hCol) < lit(hStar))
      val w = Window.partitionBy(col(hCol)).orderBy(key)
      val boundary = rows.filter(col(hCol) === lit(hStar))
        .withColumn(cumCol, sum(costL).over(w))
        .filter(col(cumCol) <= lit(remainder))
        .drop(cumCol)
      kept.unionByName(boundary).drop(hCol)
    }
  }

  /**
   * Budgeted mixture carve — [[budgetCarve]] per group: "exactly 30B web
   * tokens, 5B code tokens" as absolute per-source budgets, where
   * [[mixture]] expresses only relative rates. Kept rows per group are
   * exactly the group's deterministic pseudo-random prefix
   * `SUM(cost) OVER (PARTITION BY group ORDER BY arithHash(key), key)
   * <= budget(group)`; groups absent from `budgets` are dropped (null
   * budget never compares true — the [[mixture]] contract).
   *
   * Same scale shape as [[budgetCarve]], with the driver round-trip
   * replaced by a broadcast: the (group, bucket) ledger is counter scale,
   * each group's single crossing bucket (one row per group, none when the
   * whole group fits) broadcast-joins back onto the corpus, whole buckets
   * pass a narrow filter, and ONLY crossing-bucket rows (~1/1,000,003 of
   * each group) pay a keyed window cumsum. A dominant group costs ledger
   * rows, never a corpus-sized window partition. Contracts as
   * [[budgetCarve]]: non-negative costs, null key/cost/group rows dropped,
   * unique keys.
   */
  def budgetCarvePerGroup(df: DataFrame, group: Column, key: Column,
      cost: Column, budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ >= 0L),
      s"budgets must be non-negative, got $budgets")
    val costL = guardedCost(df, cost)
    val taken = df.columns.toSet
    val Seq(gCol, hCol, sCol, cumCol, bCol, hsCol, remCol) =
      Seq("__g", "__h", "__s", "__cum", "__budget", "__hstar", "__rem")
        .map(RangeJoin.freshName(_, taken))
    val rows = df.filter(key.isNotNull && cost.isNotNull && group.isNotNull)
      .withColumn(gCol, group)
      .withColumn(bCol, element_at(litMap(budgets), group))
      .filter(col(bCol).isNotNull)
      .withColumn(hCol, arithHash(key))
    // counter-scale ledger: at most |groups| x 1,000,003 rows
    val ledger = rows.groupBy(col(gCol), col(bCol), col(hCol))
      .agg(sum(costL).as(sCol))
      .withColumn(cumCol,
        sum(col(sCol)).over(Window.partitionBy(col(gCol)).orderBy(col(hCol))))
    carveByCrossing(rows, ledger, thr = col(bCol),
      gCol = gCol, bktCol = hCol, sCol = sCol, cumCol = cumCol,
      bsCol = hsCol, remCol = remCol, descending = false,
      measure = costL, withinOrder = Seq(key),
      dropCols = Seq(gCol, bCol, hCol, hsCol, remCol))
  }

  /**
   * Shared crossing-bucket carve tail: given the corpus tagged with its
   * group and bucket, and the counter-scale ledger carrying per-bucket
   * sums (`sCol`), the group-running total (`cumCol`, accumulated in
   * bucket order — ascending or descending per `descending`), and a
   * per-group threshold column (`thr`, evaluable against ledger rows),
   * keep each group's prefix: whole buckets strictly inside the crossing
   * via a narrow filter, crossing-bucket rows via a keyed window against
   * the threshold remainder, groups with no crossing row kept whole
   * (left join). The broadcast crossing table is one row per group.
   */
  private def carveByCrossing(
      rows: DataFrame, ledger: DataFrame, thr: Column,
      gCol: String, bktCol: String, sCol: String, cumCol: String,
      bsCol: String, remCol: String, descending: Boolean,
      measure: Column, withinOrder: Seq[Column],
      dropCols: Seq[String]): DataFrame = {
    // each group's first over-threshold bucket (in scan order) + the
    // threshold remainder left for it
    val pick = struct(col(bktCol).as(bsCol),
      (thr - (col(cumCol) - col(sCol))).as(remCol))
    val crossing = ledger.filter(col(cumCol) > thr)
      .groupBy(col(gCol)).agg(
        (if (descending) max_by(pick, col(bktCol))
         else min_by(pick, col(bktCol))).as(sCol))
      .select(col(gCol), col(sCol).getField(bsCol).as(bsCol),
        col(sCol).getField(remCol).as(remCol))
    val joined = rows.join(broadcast(crossing), Seq(gCol), "left")
    val inside =
      if (descending) col(bktCol) > col(bsCol) else col(bktCol) < col(bsCol)
    val whole = joined.filter(col(bsCol).isNull || inside)
    val w = Window.partitionBy(col(gCol), col(bktCol)).orderBy(withinOrder: _*)
    val boundary = joined.filter(col(bktCol) === col(bsCol))
      .withColumn(cumCol, sum(measure).over(w))
      .filter(col(cumCol) <= col(remCol))
      .drop(cumCol)
    whole.unionByName(boundary).drop(dropCols: _*)
  }

  /**
   * Deterministic named-split assignment (train/val/test carving): maps the
   * row's [[arithBucket]] percentage to the split whose cumulative band it
   * falls in. `splits` are ordered (name, percent) pairs summing to exactly
   * 100, so every row gets exactly one split and the bands are disjoint and
   * exhaustive BY CONSTRUCTION — no sampling-twice bugs, no leakage between
   * train and eval, stable under repartitioning, retries, and backfills. A
   * narrow codegen'd CASE projection: no shuffle, no RNG state.
   */
  def splitColumn(key: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0),
      s"splits must be non-negative percents, got $splits")
    require(splits.map(_._2).sum == 100,
      s"split percents must sum to 100, got ${splits.map(_._2).sum} in $splits")
    val b = arithBucket(key)
    val bounds = splits.map(_._2).scanLeft(0)(_ + _).tail // cumulative upper bounds
    // first-match-wins CASE chain over ascending cumulative bounds
    splits.init.zip(bounds.init).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), ub)) =>
        when(b < ub, lit(name)).otherwise(acc)
      }
  }
}
