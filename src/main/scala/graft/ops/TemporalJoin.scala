package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/**
 * As-of (temporal) join: for every left row, the single most recent right
 * row with `right.ts <= left.ts` on the same key (backward; the forward
 * mirror takes the earliest right row at-or-after) — the
 * price-at-trade-time / last-touch-attribution operator. The reference
 * engine delegates all join algebra to its host (reference:
 * src/main/scala/com/github/sadikovi/metadata/DefaultSource.scala exposes a
 * plain BaseRelation), and Spark itself has no ASOF join, so this is a
 * composed-operator implementation per the extension contract.
 *
 * Plan shape — the merge formulation, NOT a range join: tag both inputs,
 * union them, and run ONE window pass ordered by (ts, side) per key where
 * `last(right_payload, ignoreNulls)` carries the latest right row forward
 * onto each left row. Cost at scale:
 *
 *  - one shuffle of each input, keyed by the join key (identical to what
 *    any keyed join would pay), one in-partition sort — no range-bin
 *    explosion, no per-(left-row) probe join, never a cartesian;
 *  - state per window frame is a single struct (the running latest right
 *    row), so memory is O(1) per key regardless of per-key row count;
 *  - the inequality-join formulation Catalyst would pick for the naive
 *    `l.ts >= r.ts` condition is a broadcast-nested-loop over every
 *    (left, right) pair per key — quadratic per key; this is linear.
 *
 * A key whose combined row count dwarfs the rest serializes its own
 * window (inherent to per-key ordered semantics); the standard mitigation
 * is time-range salting with boundary carry-over, which callers can layer
 * on because the operator is a pure DataFrame transform.
 */
object TemporalJoin {

  /**
   * Backward as-of join (inner): left rows keep their columns; the matched
   * right row contributes its timestamp plus payload columns. Left rows
   * with no right row at-or-before their timestamp are dropped.
   *
   * Semantics and contracts:
   *  - match is INCLUSIVE (`right.ts == left.ts` matches, right sorts
   *    before left at equal timestamps);
   *  - `tolerance`, if set, drops matches older than
   *    `left.ts - tolerance` (both timestamps must be integral for exact
   *    arithmetic — enforced eagerly, like the top-k id contract);
   *  - the right side must be unique per (keys, ts): with two right rows
   *    on the same key and timestamp the "latest" row is ill-defined.
   *    Pre-aggregate the right side (the query inventory does) — this is
   *    the same determinism contract DuckDB's ASOF JOIN imposes;
   *  - rows with a null timestamp OR a null equi-key (either side) match
   *    nothing and are dropped — SQL join equality semantics, mirroring
   *    DuckDB's ASOF JOIN (a key-partitioned window would instead group
   *    null keys together and "match" through them);
   *  - non-key column names must not collide across the two inputs.
   */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keys, leftTs, rightTs, tolerance, backward = true)

  /**
   * Forward as-of join (inner): for every left row, the single EARLIEST
   * right row with `right.ts >= left.ts` on the same key — time-to-first-
   * event after a trigger (first shipment after an order, first response
   * after a page). Same contracts as [[asofBackward]], mirrored:
   * inclusive at equal timestamps, `tolerance` drops matches later than
   * `left.ts + tolerance`, null timestamps match nothing, the right side
   * must be unique per (keys, ts).
   */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keys, leftTs, rightTs, tolerance, backward = false)

  /**
   * Nearest as-of join (inner): for every left row, the single right row
   * with minimal |left.ts - right.ts| on the same key; the EARLIER row
   * wins a distance tie (backward bias, matching pandas `merge_asof`
   * `direction='nearest'`). `tolerance` drops matches farther than
   * `tolerance` in EITHER direction. Both timestamp columns must be
   * integral — the distance comparison is exact long arithmetic (the
   * same contract `tolerance` and the salted variants already carry).
   * Null keys/timestamps match nothing; the right side must be unique
   * per (keys, ts), as in both directional joins.
   *
   * Same merge shape as [[asofBackward]]/[[asofForward]]: ONE shuffle on
   * the keys, then TWO in-partition window passes over the union — an
   * ascending growing frame finds the at-or-before candidate and a
   * descending one the at-or-after; the exchange is reused between them
   * (identical partitioning), only the second in-partition sort is extra,
   * and both frames are O(1)/row. Never a join operator, so the per-key
   * cost stays linear like the directional forms.
   */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    require(integral(left.schema(leftTs).dataType) &&
      integral(right.schema(rightTs).dataType),
      "nearest as-of requires integral timestamp columns " +
        s"(got ${left.schema(leftTs).dataType.simpleString} / " +
        s"${right.schema(rightTs).dataType.simpleString})")
    val tu = tagAndUnion(left, right, keys, leftTs, rightTs)
    import tu.{union, cTs, cSide, cR, cL, taken}
    val Seq(cB, cF, cM) =
      Seq("__b", "__f", "__m").map(RangeJoin.freshName(_, taken))

    // both orders put the right row first at equal timestamps (side 0 < 1)
    // => both candidates are INCLUSIVE at ties, like the directional forms
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(cTs).asc, col(cSide))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(cTs).desc, col(cSide))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = union
      .withColumn(cB, last(col(cR), ignoreNulls = true).over(wB))
      .withColumn(cF, last(col(cR), ignoreNulls = true).over(wF))
      .filter(col(cSide) === 1)
    // gaps are non-negative by construction; longGap widens to long first
    // (exact for every admitted type) and nulls only a genuine long
    // overflow, which is wider than any tolerance — null loses every
    // comparison below, which is exactly the wanted semantics
    val gated = tolerance match {
      case Some(t) => both
        .withColumn(cB,
          when(longGap(col(cTs), col(cB).getField(rightTs)) <= lit(t), col(cB)))
        .withColumn(cF,
          when(longGap(col(cF).getField(rightTs), col(cTs)) <= lit(t), col(cF)))
      case None => both
    }
    // distances against the (possibly tolerance-nulled) candidates: a
    // nulled candidate has a null distance and loses; ties go backward
    val dBack = longGap(col(cTs), col(cB).getField(rightTs))
    val dFwd = longGap(col(cF).getField(rightTs), col(cTs))
    val pickBack = col(cB).isNotNull && (col(cF).isNull ||
      (dBack.isNotNull && (dFwd.isNull || dBack <= dFwd)))
    finishSelect(
      gated.withColumn(cM, when(pickBack, col(cB)).otherwise(col(cF)))
        .filter(col(cM).isNotNull),
      tu, cM)
  }

  private val integral: Set[Any] = Set(ByteType, ShortType, IntegerType, LongType)

  /** Exact timestamp gap in long arithmetic. Sub-long integral operands are
    * widened BEFORE subtracting — at the native width a gap like
    * `Int.MaxValue - Int.MinValue` overflows int and try_subtract would
    * null (dropping an in-tolerance match); widened, overflow is only
    * possible when both sides are genuine longs straddling Long.MIN/MAX,
    * where the true gap exceeds any long tolerance and null-drops-row is
    * exactly the wanted semantics. */
  private def longGap(a: Column, b: Column): Column =
    try_subtract(a.cast(LongType), b.cast(LongType))

  /** Shared merge-formulation scaffolding: payload classification, the
    * collision contract, fresh working names, and the tagged union of both
    * inputs (right rows carry their payload struct in `cR`, left rows
    * theirs in `cL`; null keys/timestamps are dropped on both sides). */
  private case class TaggedUnion(
      union: DataFrame, keys: Seq[String], leftTs: String, rightTs: String,
      leftPayload: Seq[String], rightPayload: Seq[String],
      cTs: String, cSide: String, cR: String, cL: String, taken: Set[String])

  private def tagAndUnion(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): TaggedUnion = {
    // case-insensitive classification: Spark resolves column references
    // case-insensitively by default, so an exact-case comparison would
    // let a miscased key ride along as payload and duplicate struct fields
    def sameName(a: String, b: String) = a.equalsIgnoreCase(b)
    val leftPayload = left.columns
      .filterNot(c => keys.exists(sameName(c, _)) || sameName(c, leftTs))
    val rightPayload = right.columns
      .filterNot(c => keys.exists(sameName(c, _)) || sameName(c, rightTs))
    // Both timestamps appear in the output, so leftTs participates in the
    // collision contract like any other surviving column (leftTs == rightTs
    // would otherwise emit two same-named columns and poison every
    // downstream reference). Callers alias one side first.
    val collisions = (leftPayload.toSet + leftTs).map(_.toLowerCase)
      .intersect((rightPayload.toSet + rightTs).map(_.toLowerCase))
    require(collisions.isEmpty,
      s"as-of join: colliding non-key column names ${collisions.mkString(", ")}; " +
        "alias the columns of one input before joining")

    // working columns must not shadow (or ambiguate against) user columns
    val taken = keys.toSet ++ left.columns ++ right.columns
    val Seq(cTs, cSide, cR, cL) =
      Seq("__ts", "__side", "__r", "__l").map(RangeJoin.freshName(_, taken))

    // A null timestamp cannot order against anything: such rows match
    // nothing (and nothing matches through them) — the same rows DuckDB's
    // ASOF JOIN drops. Without this, nulls sort FIRST in the window and a
    // null-ts right row would be carried onto left rows that have no real
    // at-or-before match. Null keys match nothing (SQL join equality; the
    // window would otherwise group them together).
    val keysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val rStruct = struct(col(rightTs) +: rightPayload.map(col): _*)
    val r = right.filter(col(rightTs).isNotNull && keysNotNull).select(
      keys.map(col) ++ Seq(col(rightTs).as(cTs), lit(0).as(cSide),
        rStruct.as(cR), lit(null).cast(structTypeOf(left, leftPayload)).as(cL)): _*)
    val l = left.filter(col(leftTs).isNotNull && keysNotNull).select(
      keys.map(col) ++ Seq(col(leftTs).as(cTs), lit(1).as(cSide),
        lit(null).cast(structTypeOf(right, rightTs +: rightPayload)).as(cR),
        struct(leftPayload.map(col): _*).as(cL)): _*)
    TaggedUnion(r.unionByName(l), keys, leftTs, rightTs,
      leftPayload, rightPayload, cTs, cSide, cR, cL, taken)
  }

  /** Shared output projection: keys, left timestamp + payload, then the
    * matched right row's timestamp + payload pulled out of `cM`. */
  private def finishSelect(matched: DataFrame, tu: TaggedUnion, cM: String): DataFrame =
    matched.select(
      tu.keys.map(col) ++
        Seq(col(tu.cTs).as(tu.leftTs)) ++
        tu.leftPayload.map(c => col(tu.cL).getField(c).as(c)) ++
        Seq(col(cM).getField(tu.rightTs).as(tu.rightTs)) ++
        tu.rightPayload.map(c => col(cM).getField(c).as(c)): _*)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Long],
      backward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    if (tolerance.isDefined) {
      require(integral(left.schema(leftTs).dataType) &&
        integral(right.schema(rightTs).dataType),
        "as-of tolerance requires integral timestamp columns " +
          s"(got ${left.schema(leftTs).dataType.simpleString} / " +
          s"${right.schema(rightTs).dataType.simpleString})")
    }
    val tu = tagAndUnion(left, right, keys, leftTs, rightTs)
    import tu.{union, cTs, cSide, cR, cL, taken}
    val cM = RangeJoin.freshName("__m", taken)

    // BOTH directions scan the GROWING preceding frame with `last` — Spark
    // evaluates unboundedPreceding..currentRow incrementally (O(1) per
    // row), while a currentRow..unboundedFollowing frame re-aggregates the
    // partition suffix for every row (O(n^2) per key). Forward simply
    // orders time DESCENDING: the nearest preceding row in that order is
    // the earliest at-or-after. In both orders the right row sorts before
    // the left at equal timestamps (side 0 < 1) => inclusive match.
    val tsOrder = if (backward) col(cTs).asc else col(cTs).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col(cSide))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = union
      .withColumn(cM, last(col(cR), ignoreNulls = true).over(w))
      .filter(col(cSide) === 1 && col(cM).isNotNull)
    val withinTol = tolerance match {
      // The window established the gap is non-negative in the scan
      // direction; longGap widens to long (exact for every admitted type)
      // and nulls only a genuine long overflow — wider than any tolerance,
      // so null-drops-row is exactly the wanted semantics.
      case Some(t) =>
        val gap =
          if (backward) longGap(col(cTs), col(cM).getField(rightTs))
          else longGap(col(cM).getField(rightTs), col(cTs))
        matched.filter(gap <= lit(t))
      case None => matched
    }
    finishSelect(withinTol, tu, cM)
  }

  /**
   * Time-range-salted backward as-of join — the dominant-key mitigation
   * the scale audit names. A key whose row count dwarfs the rest
   * serializes its whole window under [[asofBackward]]; here time is cut
   * into integral buckets of `bucketWidth` (`ts div width` — exact, and
   * monotone, so `bucket(r) < bucket(l)` implies `r.ts <= l.ts`), the
   * bucket id joins the equi-key, and each (key, bucket) windows
   * independently — the hot key's work spreads over `span/width` tasks.
   *
   * Boundary carry: a left row's true match may precede its bucket. Per
   * (key, bucket), the LATEST right row is pre-aggregated (one row per
   * key x bucket — counter-row scale), a running `last` over the bucket
   * spine (left AND right buckets, so empty-on-the-right buckets still
   * receive a carry) injects that boundary row into every later bucket,
   * and the within-bucket as-of then sees exactly the candidates the
   * global one would: in-bucket rows, or the carried global-latest
   * earlier row. Results are EXACTLY [[asofBackward]]'s (property-tested
   * across widths), `tolerance` included.
   *
   * Cost: carry volume is one right row per (key, active bucket) —
   * `bucketWidth` dials salt spread against carry replication. Both
   * timestamp columns must be integral (exact `div`; same contract as
   * `tolerance`).
   */
  def asofBackwardSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      bucketWidth: Long,
      tolerance: Option[Long] = None): DataFrame =
    asofSaltedImpl(left, right, keys, leftTs, rightTs, bucketWidth, tolerance,
      backward = true)

  /** Forward mirror of [[asofBackwardSalted]]: carries each bucket's
    * EARLIEST right row backward onto earlier buckets (monotonicity gives
    * `bucket(r) > bucket(l)` implies `r.ts >= l.ts`). */
  def asofForwardSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      bucketWidth: Long,
      tolerance: Option[Long] = None): DataFrame =
    asofSaltedImpl(left, right, keys, leftTs, rightTs, bucketWidth, tolerance,
      backward = false)

  private def asofSaltedImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      bucketWidth: Long,
      tolerance: Option[Long],
      backward: Boolean): DataFrame = {
    val (lB, rB, bCol, taken) =
      bucketed(left, right, keys, leftTs, rightTs, bucketWidth)
    val carry = boundaryCarry(lB, rB, right, keys, bCol, taken,
      leftTs, rightTs, Seq(backward))
    // a carried row's ts sits in an earlier (later, forward) bucket than
    // every in-bucket row, so per-(keys,bucket,ts) uniqueness is preserved
    val rAug = rB.unionByName(carry)
    asofImpl(lB, rAug, keys :+ bCol, leftTs, rightTs, tolerance, backward)
      .drop(bCol)
  }

  /** Shared salted prolog: contracts, the fresh bucket column, and both
    * inputs tagged with their time bucket (`ts div width` — exact and
    * monotone over the admitted integral types, so bucket order implies
    * timestamp order). Returns the tagged frames, the bucket column name,
    * and the taken-name set including it. */
  private def bucketed(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, bucketWidth: Long)
      : (DataFrame, DataFrame, String, Set[String]) = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(integral(left.schema(leftTs).dataType) &&
      integral(right.schema(rightTs).dataType),
      "salted as-of requires integral timestamp columns " +
        s"(got ${left.schema(leftTs).dataType.simpleString} / " +
        s"${right.schema(rightTs).dataType.simpleString})")
    val taken = keys.toSet ++ left.columns ++ right.columns
    val bCol = RangeJoin.freshName("__bucket", taken)
    def bucketOf(ts: String) =
      expr(s"CAST(`$ts` AS BIGINT) div CAST($bucketWidth AS BIGINT)")
    val keysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val lB = left.withColumn(bCol, bucketOf(leftTs))
    val rB = right.filter(col(rightTs).isNotNull && keysNotNull)
      .withColumn(bCol, bucketOf(rightTs))
    (lB, rB, bCol, taken + bCol)
  }

  /**
   * Time-range-salted NEAREST as-of — [[asofNearest]] with the
   * [[asofBackwardSalted]] dominant-key mitigation. Boundary carries are
   * injected in BOTH directions (latest strictly-prior right and earliest
   * strictly-later right per (key, bucket)), which is exactly the
   * candidate set the global argmin needs: any right row beyond a carry
   * in its direction is farther than the carry, so it can never be the
   * nearest. Results are EXACTLY [[asofNearest]]'s (property-tested
   * across widths), tolerance included; both carries land in foreign
   * buckets' groups with out-of-bucket timestamps, so the per-(keys +
   * bucket, ts) uniqueness contract is preserved.
   */
  def asofNearestSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      bucketWidth: Long,
      tolerance: Option[Long] = None): DataFrame = {
    val (lB, rB, bCol, taken) =
      bucketed(left, right, keys, leftTs, rightTs, bucketWidth)
    val carries = boundaryCarry(lB, rB, right, keys, bCol, taken,
      leftTs, rightTs, Seq(true, false))
    val rAug = rB.unionByName(carries)
    asofNearest(lB, rAug, keys :+ bCol, leftTs, rightTs, tolerance)
      .drop(bCol)
  }

  /** Per-(key, bucket) boundary carry, unioned over the requested
    * `directions` (true = backward: the latest right row of any STRICTLY
    * earlier bucket; false = forward: the earliest of any strictly later
    * one), materialized for every bucket on the spine — left AND right
    * buckets, so a bucket with no right rows still receives its carry.
    *
    * ONE summary aggregate computes both directions' boundary rows and ONE
    * spine serves both window passes, so the full-input scans (the right
    * aggregate, the left distinct) are paid once regardless of how many
    * directions are asked for — the identical subtrees collapse to a
    * single exchange under Spark's ReuseExchange. Window rows are
    * per-(key, bucket) aggregates: counter-row scale, never the hot key's
    * row volume. */
  private def boundaryCarry(
      lB: DataFrame, rB: DataFrame, right: DataFrame, keys: Seq[String],
      bCol: String, taken: Set[String], leftTs: String, rightTs: String,
      directions: Seq[Boolean]): DataFrame = {
    val rowColB = RangeJoin.freshName("__rrow_b", taken)
    val rowColF = RangeJoin.freshName("__rrow_f", taken + rowColB)
    def rowCol(backward: Boolean) = if (backward) rowColB else rowColF
    val keyCols = (keys :+ bCol).map(col)
    val keysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    // unique per (keys, ts) by the right side's uniqueness contract
    val pickRow = struct(right.columns.map(col): _*)
    val summary = rB.groupBy(keyCols: _*).agg(
      max_by(pickRow, col(rightTs)).as(rowColB),
      min_by(pickRow, col(rightTs)).as(rowColF))
    val spine = lB.filter(col(leftTs).isNotNull && keysNotNull)
      .select(keyCols: _*).distinct()
      .unionByName(summary.select(keyCols: _*)).distinct()
    val joined = spine.join(summary, keys :+ bCol, "left")
    val nonKey = right.columns.filterNot(c => keys.exists(_.equalsIgnoreCase(c)))
    directions.map { backward =>
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(if (backward) col(bCol).asc else col(bCol).desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val rc = rowCol(backward)
      joined
        .select(keyCols :+ last(col(rc), ignoreNulls = true).over(w).as(rc): _*)
        .filter(col(rc).isNotNull)
        .select(keyCols ++ nonKey.map(c => col(rc).getField(c).as(c)): _*)
    }.reduce(_ unionByName _)
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String]): String =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c))).sql
}
