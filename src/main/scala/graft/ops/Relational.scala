package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operators re-expressing the reference's interpreted joins
  * (SURVEY.md §2.3) as declarative Spark plans, plus the generic engine
  * surface (dedup-keep-first, top-k, skew-safe join).
  *
  * Scale notes (100 TB): every function here is a pure LogicalPlan
  * transformation — no driver-side iteration, no collect. Joins against
  * dimension tables are explicitly broadcast; the merge diff is one shuffle
  * on the join key on each side (sort-merge at fact scale, AQE-skew-safe).
  */
object Relational {

  /** Co-located (bucketed) join path: write both fact tables bucketed+sorted
    * on the join key, and the sort-merge join between them needs NO exchange
    * and NO sort — each bucket pair merges directly. At 100 TB this converts
    * the recurring fact⋈fact shuffle (the single largest cost in a star
    * pipeline run repeatedly over the same tables) into a one-time layout
    * decision at ingest. Requires a catalog table (`saveAsTable`); plain
    * parquet paths do not carry bucket metadata.
    *
    * The repartition on the bucket key makes each bucket a SINGLE file —
    * the defense against the many-small-files problem of bucketed writes
    * from wide stages, and the precondition for Sort elision. Note: the
    * EXCHANGE is what bucketing removes by default; since Spark 3.0 the
    * scan only reports `sortBy` order (eliding the join-side Sort too) when
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — the
    * remaining Sort is in-partition over one already-sorted file, i.e.
    * near-free, while the eliminated shuffle was the 100 TB cost. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: Option[String] = None): Unit = {
    val w = df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** J1/J2 (main.py:107-110,120,123): broadcast lookup-join enrichment.
    * The reference builds a Python dict and probes it per row — the exact
    * hand-rolled build side of a broadcast hash join. `left` semantics with
    * a coalesce default mirrors `MAP_ROOMS[...] or ""` (main.py:120) without
    * the reference's KeyError on unknown keys.
    */
  def lookupEnrich(facts: DataFrame, dim: DataFrame, factKey: Column,
                   dimKey: Column): DataFrame =
    facts.join(broadcast(dim), factKey === dimKey, "left")

  /** J3+J4 (main.py:134-163) as ONE full-outer join instead of two O(n*m)
    * nested loops: matched -> update, source-only -> create, target-only ->
    * delete. Keys are case-normalized on both sides (main.py:135,137,152,155).
    *
    * `srcKey`/`tgtKey` name key columns of `source`/`target`; output carries
    * all source columns, the target id column, and `op_flag`.
    * The reference's "first match wins" (main.py:142) is nondeterministic
    * API-page order; we make it deterministic by deduplicating the target on
    * the lowered key, keeping the smallest `tgtId` (SURVEY.md §2.3 note).
    */
  def mergePlan(source: DataFrame, target: DataFrame, srcKey: String,
                tgtKey: String, tgtId: String): DataFrame = {
    // Sides are identified by explicit marker literals, NOT by key
    // nullness: a source row with a NULL key never joins (NULL != NULL in
    // the equi-join) and must classify as `create`, not be mistaken for a
    // target-only `delete`. Likewise a target row with a NULL id stays an
    // `update` when matched.
    val src = source.withColumn("__k", lower(col(srcKey)))
      .withColumn("__src", lit(true))
    val tgt = dedupKeepFirst(
        target.withColumn("__k", lower(col(tgtKey))), Seq("__k"), Seq(col(tgtId)))
      .select(col("__k"), col(tgtId).as("__tid"), lit(true).as("__tgt"))
    src.join(tgt, Seq("__k"), "full_outer")
      .withColumn("op_flag",
        when(col("__src").isNull, lit("delete"))
          .when(col("__tgt").isNull, lit("create"))
          .otherwise(lit("update")))
      .withColumn("target_id", col("__tid"))
      .drop("__k", "__tid", "__src", "__tgt")
  }

  /** J4 alone (main.py:150-163): rows of `left` with no key match in `right`. */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** ⊕J7: EXISTS dual of the anti join. */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** Dedup-keep-first: row_number over (keys, orderBy tiebreak) == 1.
    * Deterministic version of the reference's first-match-wins (main.py:142)
    * and the exact-dedup north-star operator. One shuffle on `keys`.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Global top-k with a total-order tiebreak. Spark plans this as
    * TakeOrderedAndProject: per-partition heap + driver merge of k rows,
    * no full sort and no full shuffle — safe at any scale for small k. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-k via ranking window (one shuffle on the group key). */
  def topKPerGroup(df: DataFrame, k: Int, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** SCD2 (slowly-changing-dimension type 2) history built from an event
    * log: for each key, consecutive runs of the same `attr` value collapse
    * to ONE validity interval — (key, attr, valid_from, valid_to,
    * is_current), with `valid_to` = the next change's `valid_from` (open
    * interval, null = current). The warehouse-standard dimension-history
    * shape, derived declaratively: a lag window marks change points, a
    * lead window closes intervals. Both windows partition on `key` with
    * the same ordering, so Catalyst reuses one exchange — ONE shuffle
    * total, no self-join, no driver iteration; at 100 TB the state per
    * task is a single previous-row buffer. `tiebreak` makes same-`ts`
    * events deterministic. Null `attr` values compare null-safely (a
    * null→value transition is a change). */
  def scd2FromLog(log: DataFrame, key: String, attr: String, ts: String,
                  tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, col(tiebreak).asc)
    log.withColumn("__prev", lag(col(attr), 1).over(w))
      // lag of the (non-null) tiebreak distinguishes "first event of the
      // key" from "previous attr was genuinely null"
      .withColumn("__prev_tb", lag(col(tiebreak), 1).over(w))
      .filter(col("__prev_tb").isNull || !(col("__prev") <=> col(attr)))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col(tiebreak), col(attr),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** ⊕J6: binned (bucketed) range join — facts joined to intervals
    * `[start, start + width)` via an EQUI join on the `floor(ts / width)`
    * bin, with the interval side exploded to its two covering bins and the
    * exact range predicate applied after the hash match. A naive interval
    * join plans BroadcastNestedLoopJoin — every (fact, interval) pair
    * evaluated, O(|facts| × |intervals|), the classic range-join
    * scale-killer. Here each fact row hashes ONCE and meets only the
    * intervals sharing its bin (every interval of length `width` spans at
    * most two width-sized bins), so cost is O(|facts| + matches) and the
    * join is a plain broadcast/shuffle HASH join that AQE can manage.
    * Returns the inner bin-join; aggregate-then-outer-join-back to keep
    * unmatched intervals (see q31). */
  def rangeJoinBinned(facts: DataFrame, intervals: DataFrame,
                      factTsCol: String, startCol: String,
                      widthSeconds: Long,
                      broadcastIntervals: Boolean = true): DataFrame = {
    val startBin = floor(unix_timestamp(col(startCol)) / widthSeconds)
    val binned = intervals.withColumn("__bin", explode(array(startBin, startBin + 1)))
    val side = if (broadcastIntervals) broadcast(binned) else binned
    facts.withColumn("__bin", floor(unix_timestamp(col(factTsCol)) / widthSeconds))
      .join(side, Seq("__bin"))
      .filter(col(factTsCol) >= col(startCol) &&
        col(factTsCol) < col(startCol) + expr(s"INTERVAL $widthSeconds SECONDS"))
      .drop("__bin")
  }

  /** ⊕J6: generic as-of join — for each left row, the latest right row with
    * `rightTs <= leftTs` per key. Implemented as union + running `last`
    * window rather than a range join: one shuffle on (key), no
    * per-row range probe, no candidate blow-up — the scalable form when the
    * right side is large (a range join materializes |left|×|matching-range|
    * candidates; this materializes |left|+|right| rows exactly).
    * Right columns to carry are given in `carry` (renamed as-is). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    val lCols = left.columns
    // NULL join keys match NOTHING (SQL comparison semantics, identical to
    // every equi-join in the engine and to a native ASOF JOIN): drop
    // null-key RIGHT rows before the union — the window's partitionBy
    // would otherwise group null-key rows of both sides together and
    // carry values between them. Null-key LEFT rows then land in a
    // partition with no right rows and carry null, exactly the SQL
    // answer. Caught by the r11 cross-engine fuzz lane (asof_join family,
    // seeds 3003/3050 vs DuckDB ASOF LEFT JOIN).
    val rightKeyed = right.filter(col(key).isNotNull)
    // tag sides, align schemas: left rows carry null payload, right rows null left-cols
    val rTagged = rightKeyed.select(
      (col(key).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        carry.map(c => col(c).as(s"__c_$c")) ++: lCols.toIndexedSeq.map(c => lit(null).cast(
          left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (col(key).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__c_$c")) ++:
        lCols.toIndexedSeq.map(col(_))): _*)
    // Deterministic tiebreak: among right rows sharing the same (key, ts),
    // the carried value is whichever sorts LAST by the carry columns — an
    // explicit total order instead of shuffle-arrival nondeterminism.
    // Non-orderable carry types (maps) are excluded from the sort key.
    val tiebreak = carry
      .filter(c => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType))
      .map(c => col(s"__c_$c").asc)
    val w = Window.partitionBy(col("__key"))
      .orderBy((col("__ts").asc +: col("__side").asc +: tiebreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .select((col("*") +: carry.map(c =>
        last(col(s"__c_$c"), ignoreNulls = true).over(w).as(c))): _*)
    carried.filter(col("__side") === 1)
      .select(lCols.toIndexedSeq.map(col(_)) ++ carry.map(col(_)): _*)
  }

  /** ⊕J6: as-of join with DIRECTION and TOLERANCE — the full
    * pandas-`merge_asof` surface over the same union+window machinery as
    * [[asofJoin]] (one shuffle on `key`, |left|+|right| rows, no range
    * probe):
    *  - `backward`: latest right with `rightTs <= leftTs` (the
    *    [[asofJoin]] semantics);
    *  - `forward`: earliest right with `rightTs >= leftTs` — the same
    *    running-`last` window with the time axis reversed;
    *  - `nearest`: whichever of the two is closer in time, ties to
    *    backward (pandas' rule). Both windows share the one exchange on
    *    `key` (same partitioning, two sort orders).
    * `toleranceSeconds` nulls the carried values when the matched right
    * row is further than the tolerance (merge_asof semantics: the left row
    * survives with null payload, it is not dropped). Timestamps must be
    * TimestampType. Among right rows sharing (key, ts) the carried value
    * is the one sorting last by the carry columns — deterministic. */
  def asofJoinDirectional(left: DataFrame, right: DataFrame, key: String,
                          leftTs: String, rightTs: String, carry: Seq[String],
                          direction: String = "backward",
                          toleranceSeconds: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val lCols = left.columns
    // null keys match nothing — same rule and same fuzz-caught rationale
    // as [[asofJoin]]
    val rightKeyed = right.filter(col(key).isNotNull)
    val rTagged = rightKeyed.select(
      (col(key).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        col(rightTs).as("__c___rts") +:
        carry.map(c => col(c).as(s"__c_$c")) ++: lCols.toIndexedSeq.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (col(key).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(right.schema(rightTs).dataType).as("__c___rts") +:
        carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__c_$c")) ++:
        lCols.toIndexedSeq.map(col(_))): _*)
    val tiebreak = carry
      .filter(c => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType))
      .map(c => col(s"__c_$c").asc)
    def win(reversed: Boolean) = {
      val ord = if (reversed) col("__ts").desc else col("__ts").asc
      Window.partitionBy(col("__key"))
        .orderBy((ord +: col("__side").asc +: tiebreak): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val dirs = direction match {
      case "nearest" => Seq("b" -> false, "f" -> true)
      case "backward" => Seq("b" -> false)
      case "forward" => Seq("f" -> true)
    }
    val internal = "__rts" +: carry
    val carriedCols = dirs.flatMap { case (tag, rev) =>
      internal.map(c =>
        last(col(s"__c_$c"), ignoreNulls = true).over(win(rev)).as(s"__${tag}_$c"))
    }
    val carried = rTagged.unionByName(lTagged)
      .select(col("*") +: carriedCols: _*)
      .filter(col("__side") === 1)
    val tol = toleranceSeconds.map(lit(_).cast("long"))
    def ok(tag: String, delta: Column): Column =
      col(s"__${tag}___rts").isNotNull &&
        tol.map(t => delta <= t).getOrElse(lit(true))
    val bDelta = unix_timestamp(col("__ts")) - unix_timestamp(col("__b___rts"))
    val fDelta = unix_timestamp(col("__f___rts")) - unix_timestamp(col("__ts"))
    def pick(c: String): Column = direction match {
      case "backward" => when(ok("b", bDelta), col(s"__b_$c"))
      case "forward" => when(ok("f", fDelta), col(s"__f_$c"))
      case "nearest" =>
        when(ok("b", bDelta) && ok("f", fDelta),
            when(bDelta <= fDelta, col(s"__b_$c")).otherwise(col(s"__f_$c")))
          .when(ok("b", bDelta), col(s"__b_$c"))
          .when(ok("f", fDelta), col(s"__f_$c"))
    }
    carried.select(lCols.toIndexedSeq.map(col(_)) ++
      carry.map(c => pick(c).as(c)): _*)
  }

  /** Skew-safe equi-join: salt ONLY the hot keys of the skewed (left) side
    * into `buckets` sub-keys and explode the matching build rows; all other
    * keys take the plain join.
    *
    * DECISION RULE (demonstrated in SkewJoinSpec): a skewed sort-merge
    * join under AQE needs NO salting — AQE splits the oversized
    * post-shuffle partition at runtime and replicates the matching build
    * partition (`skew=true` in the final plan), and the result is
    * row-identical to this operator. Reach for saltedJoin only when
    * [[skewProfile]] recommends `salt > 1` AND the hot key feeds a stage
    * AQE's split cannot fix: a same-key aggregation downstream (a hash
    * aggregate re-concentrates every row of the key in one task), or a
    * plan that must reuse the un-split exchange.
    *
    * Hot keys are detected first with a cheap count aggregate (map-side
    * partial combine makes it one light shuffle); rows above `hotThreshold`
    * are salted, the rest join unsalted. Salting everything would pay a
    * `buckets`× replication of the ENTIRE build side to fix a handful of
    * keys — at 100 TB that 8× build shuffle dwarfs the skew it fixes. The
    * hot-key list is tiny by construction (keys whose row count exceeds the
    * threshold) and is broadcast into the semi/anti splits.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 buckets: Int, hotThreshold: Long = 2000000): DataFrame = {
    val hot = broadcast(hotKeys(skewed, key, hotThreshold))
    val saltedHot = skewed.join(hot, Seq(key), "left_semi")
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val explodedHot = other.join(hot, Seq(key), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    val hotJoined = saltedHot.join(explodedHot, Seq(key, "__salt")).drop("__salt")
    val coldJoined = skewed.join(hot, Seq(key), "left_anti")
      .join(other.join(hot, Seq(key), "left_anti"), Seq(key))
    hotJoined.unionByName(coldJoined)
  }

  /** Keys of `df` whose row count exceeds `threshold` — the salted-join
    * split criterion, exposed so callers (and tests) can size the hot set. */
  /** Time-series resample with gap fill: per-key counts in fixed
    * `stepSec` buckets over the GLOBAL [min, max] bucket range, missing
    * buckets zero-filled — the densification step before any rolling
    * window / anomaly model (a gap is signal, and a rolling mean over a
    * sparse series silently skips it). Grid = (distinct keys) ×
    * (sequence of buckets): both sides are tiny relative to the data
    * (keys × range/step rows), built from a 1-row bounds agg — the fact
    * table is scanned once, the grid join shuffles grid-sized input, not
    * data-sized. */
  def gapFillCounts(df: DataFrame, key: String, ts: String,
                    stepSec: Int): DataFrame = {
    val bucketed = df.select(col(key),
      (floor(col(ts).cast("timestamp").cast("double") / stepSec) * stepSec)
        .cast("timestamp").as("bucket"))
    val counts = bucketed.groupBy(col(key), col("bucket")).agg(count(lit(1)).as("n"))
    val bounds = bucketed.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val grid = bounds
      .select(explode(expr(s"sequence(lo, hi, interval $stepSec seconds)")).as("bucket"))
      .crossJoin(df.select(col(key)).distinct())
    // `<=>` on the key: the null-key group gap-fills like any other
    // stratum (its counts must land on the grid, not vanish into n=0 —
    // see joinGroupNullSafe); buckets in the grid are never null
    grid.join(
        counts.withColumnRenamed(key, "__graft_gkey")
          .withColumnRenamed("bucket", "__graft_gbucket"),
        col(key) <=> col("__graft_gkey") &&
          col("bucket") === col("__graft_gbucket"),
        "left")
      .drop("__graft_gkey", "__graft_gbucket")
      .na.fill(0L, Seq("n"))
  }

  /** Batch sessionization: split each key's event stream into sessions at
    * inactivity gaps > `gapSec` (the batch sibling of the streaming
    * session window, q38). Two window passes over the SAME
    * (partitionBy key, orderBy ts, id) spec — lag() marks session starts,
    * a running sum of the marks numbers them — so Spark plans ONE
    * exchange + one sort and evaluates both Window execs on it (the
    * second finds its required ordering already satisfied). The group-by
    * that follows re-uses the hash partitioning by key. All outputs are
    * integer microseconds — exact in any engine.
    *
    * Scale: state is one window partition per key (a user's events), the
    * natural skew bound for behavioral data; no driver-side anything.
    * Ties on ts are ordered by `idCol`, so session NUMBERING is
    * deterministic even when events collide on the same microsecond. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isStart = when(prev.isNull || us - prev > gapSec * 1000000L, 1L)
      .otherwise(0L)
    events.select(col(userCol), col(tsCol), col(idCol), us.as("__us"))
      .withColumn("__start", isStart)
      .withColumn("sess",
        sum(col("__start")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(userCol), col("sess"))
      .agg(min(col("__us")).as("start_us"), max(col("__us")).as("end_us"),
        count(lit(1)).as("n_events"),
        (max(col("__us")) - min(col("__us"))).as("dur_us"))
  }

  /** Deterministic train/val/test split assignment: each row hashes to a
    * bucket in [0, 100) via the q107 md5 idiom (first 8 hex chars of
    * md5(seed|id) as an integer), and bucket thresholds carve the splits —
    * the same row lands in the same split in any engine, any run, any
    * partitioning, and the assignment is STABLE under corpus growth (new
    * rows never move old ones — the property a reshuffle-based split
    * lacks, and the reason eval sets stay uncontaminated across corpus
    * versions). Pure scan-stage projection: no shuffle, no RNG state. */
  def splitAssign(df: DataFrame, id: Column, seed: String = "split0",
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = conv(substring(md5(concat(lit(seed + "|"), id.cast("string"))),
      1, 8), 16, 10).cast("long") % 100
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise(lit("test")))
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis–
    * Spirakis A-Res): each row gets key = ln(u)/w with u a hash-derived
    * uniform in (0,1], and the global top-`k` keys ARE a weighted sample
    * without replacement — heavier rows win proportionally more often.
    * This is the training-data mixture sampler ("sample 10M docs,
    * proportional to quality×length") expressed as a one-pass top-k:
    * Spark plans orderBy+limit as TakeOrderedAndProject (a bounded heap
    * per partition + merge of k-row heads — no global sort, no RNG state,
    * nothing driver-sized but the k winners).
    *
    * Deterministic and engine-portable by construction: u derives from
    * md5(seed|id) (not from a stateful RNG), so the SAME rows win in any
    * engine, any partitioning, any run — reproducible mixtures are a
    * pipeline requirement, not a nicety. ln(u)/w is the monotone
    * equivalent of the textbook u^(1/w) (same selection), chosen because
    * ln has cross-engine parity precedent (q40/q100) while pow does not.
    * Rows with weight <= 0 (or null) are EXCLUDED, not undefined:
    * ln(u)/0 = -Inf and a negative weight flips the key's sign, and
    * engines disagree on ±Inf through floor/cast — filtering is the only
    * cross-engine-identical treatment of a non-positive weight. */
  def weightedSample(df: DataFrame, id: Column, weight: Column, k: Int,
                     seed: String = "ws0"): DataFrame = {
    val h = conv(substring(md5(concat(lit(seed), lit("|"), id.cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(4294967296.0) // (0,1]
    val key = log(u) / weight.cast("double")
    df.filter(weight.cast("double") > 0.0)
      .withColumn("samp_key",
        floor(key * lit(1e9)).cast("double") / lit(1e9))
      .orderBy(col("samp_key").desc, id)
      .limit(k)
  }

  /** Rolling z-score anomaly detection over a per-key series (the step
    * after [[gapFillCounts]] densifies it — a gap IS a zero, and without
    * densification the window would silently skip it): each point is
    * compared against the mean/variance of the previous `lookback` points
    * of ITS key, flagged when its squared deviation exceeds z²·variance.
    * One window per key — a single shuffle on the key, O(1) state per row
    * (running sums), no self-join; at 100 TB the series table partitions
    * by key like any other and each key's window is processed within its
    * partition.
    *
    * Determinism (oracle-hash-proof): the window aggregates are BIGINT
    * sums of the integer counts (exact, association-free), and every
    * double below derives from those identical integers through identical
    * IEEE ops — no float accumulation order anywhere. Warmup rows (frame
    * shorter than `lookback`) are never flagged; a zero-variance history
    * flags ANY deviation (a jump from a constant baseline is the clearest
    * anomaly there is). */
  def rollingAnomalies(series: DataFrame, key: String, bucket: String,
                       valueCol: String, lookback: Int,
                       z: Double): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
      .rowsBetween(-lookback, -1)
    val n = col(valueCol).cast("long")
    val cnt = count(n).over(w)
    val s1 = sum(n).over(w)
    val s2 = sum(n * n).over(w)
    val mean = s1.cast("double") / cnt.cast("double")
    val varg = (s2.cast("double")
      - s1.cast("double") * s1.cast("double") / cnt.cast("double")) / cnt.cast("double")
    val dev = n.cast("double") - mean
    series
      .withColumn("__cnt", cnt)
      // NULL until the frame is full: avoids 0/0 NaN on warmup rows (NaN
      // round-trips differently through parquet/pandas than NULL does)
      .withColumn("mean_prev",
        when(col("__cnt") === lookback,
          floor(mean * lit(1e6)).cast("double") / lit(1e6)))
      .withColumn("is_anomaly",
        col("__cnt") === lookback &&
          (when(varg > 0, dev * dev > lit(z * z) * varg)
            .otherwise(dev =!= 0)))
      .drop("__cnt")
  }

  /** Exponentially weighted moving average over a gap-filled integer
    * series — the smoothing/decay sibling of [[rollingAnomalies]]'s
    * flat-window z-score (monitoring dashboards read the EWMA; alerting
    * reads the z-flags). Decay is fixed at 3/4 per step (α = 1/4) so the
    * whole computation stays EXACT: weight_j ∝ 3^j·4^(L-1-j) are integer
    * coefficients, the weighted sum is one exact BIGINT lag-chain, the
    * normalizer has the closed form 4^L − 3^L, and only the final
    * division is a double (floor-truncated to 6dp) — bit-identical in any
    * engine, no float-power drift. Warmup rows (fewer than `lookback`
    * lags) drop via NULL propagation, like q103's NULL-until-full frame.
    *
    * Scale: one key-partitioned window exchange; the L lag() calls share
    * the single sort (same window spec), so the plan is one exchange +
    * one sort regardless of L. */
  def ewmaSmooth(series: DataFrame, key: String, bucket: String,
                 valueCol: String, lookback: Int = 12): DataFrame = {
    require(lookback >= 1 && lookback <= 20, s"lookback 1..20, got $lookback")
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
    // coef_j = 3^j · 4^(L-1-j); Σ coef = 4^L − 3^L (geometric, ratio 3/4)
    val coefs = (0 until lookback).map(j =>
      BigInt(3).pow(j).toLong * BigInt(4).pow(lookback - 1 - j).toLong)
    val norm = coefs.sum
    // DECIMAL, not BIGINT: at lookback=20 the leading coefficient is
    // 4^19 ≈ 2.7e11, so a long chain would silently wrap (non-ANSI) for
    // |value| above ~3e7. decimal(20,0) holds any long exactly; each
    // product stays ≤ ~2.5e30 and the 20-term sum ≤ ~5e31 — both well
    // inside decimal(38,0), so the chain is exact for the full long range.
    val v = col(valueCol).cast("decimal(20,0)")
    val wsum = (1 until lookback)
      .map(j => lag(v, j).over(w) * lit(coefs(j)))
      .foldLeft(v * lit(coefs.head))(_ + _)
    series.withColumn("__wsum", wsum)
      .where(col("__wsum").isNotNull) // any missing lag nulls the chain
      .select(col(key), col(bucket), col(valueCol),
        (floor(col("__wsum").cast("double") / lit(norm.toDouble) * lit(1e6))
          .cast("double") / lit(1e6)).as("ewma"))
  }

  /** Column profiler — the ANALYZE-statistics surface (row count, null
    * count, exact NDV, numeric min/max per column) a cost-based optimizer
    * and a data-quality gate both read. TWO aggregations over the table,
    * deliberately split: the exact multi-column DISTINCTs plan as a single
    * Expand (one row per (input row × profiled column)) + hash agg — one
    * shuffle regardless of column count — while the flat stats (nulls,
    * min/max, row count) run in their own Expand-FREE pass. Mixing them
    * into one agg forces Spark to evaluate the cheap flat aggregates over
    * the expanded rows too (Expand factor columns+1) — measured ~30%
    * slower at 6 columns than the split, whose two 1-row results combine
    * in a free cross join. The wide 1-row result is then exploded into
    * the (col_name, stats) long form. `numeric` columns must be castable
    * to double (pre-cast timestamps to epoch seconds); `categorical`
    * columns get null min/max. */
  def profile(df: DataFrame, numeric: Seq[String], categorical: Seq[String]): DataFrame = {
    val all = numeric ++ categorical
    val flatAggs = all.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nn")) ++
        (if (numeric.contains(c))
           Seq(min(col(c)).cast("double").as(s"__${c}_mn"),
               max(col(c)).cast("double").as(s"__${c}_mx"))
         else Nil)
    }
    val ndvAggs = all.map(c => countDistinct(col(c)).as(s"__${c}_nd"))
    val row = df.agg(count(lit(1)).as("__n"), flatAggs: _*)
      .crossJoin(df.agg(ndvAggs.head, ndvAggs.tail: _*))
    val entries = all.map { c =>
      val (mn, mx) =
        if (numeric.contains(c)) (col(s"__${c}_mn"), col(s"__${c}_mx"))
        else (lit(null).cast("double"), lit(null).cast("double"))
      struct(lit(c).as("col_name"), col("__n").as("n"),
        col(s"__${c}_nn").as("n_null"), col(s"__${c}_nd").as("n_distinct"),
        mn.as("min_d"), mx.as("max_d"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Ordered-funnel analysis: for each user, the time of step 1, then for
    * every later step i the first step-i event STRICTLY AFTER step i-1's
    * time — the sequential-pattern query behind conversion funnels (a
    * row-wise `min(ts WHERE type=s)` is NOT a funnel: steps must happen in
    * order). ONE exchange for any k: each t_i is a whole-partition
    * conditional window min over hash(user) — `min(ts WHERE type=s_i AND
    * ts > t_{i-1})` — and chained Window operators with the SAME partition
    * spec reuse one exchange + one sort; the closing per-user aggregate is
    * co-partitioned, so it adds none (vs the former k-1 join+agg rounds,
    * each a shuffle). The sequential dependence lives in the expression
    * (t_i references the t_{i-1} column), not in extra stages. A user's
    * rows sit in one partition; the window frames spill via Spark's row
    * buffer if a single user's history outgrows memory. Timestamps compare
    * exactly (µs longs). Returns one row per user who completed step 1,
    * with nullable t2..tk. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    val u = col(userCol)
    val w = Window.partitionBy(u)
    // events irrelevant to every step never enter the exchange
    val slim = events.filter(col(typeCol).isin(steps: _*))
      .select(u, col(typeCol), col(tsCol))
    val withTs = steps.zipWithIndex.foldLeft(slim) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"t$i")
      df.withColumn(s"t${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    withTs.filter(col("t1").isNotNull)
      .groupBy(u)
      .agg(min(col("t1")).as("t1"),
        steps.indices.tail.map(i => min(col(s"t${i + 1}")).as(s"t${i + 1}")): _*)
  }

  /** Retention cohort matrix: users grouped by first-activity week
    * (cohort), counted per (cohort, activity-week) — the
    * "week-N retention" table. Two aggregations (first-seen per user,
    * distinct user-week activity) and one user-keyed join; weeks via
    * ISO `date_trunc('week')` (engine-portable, Monday-anchored).
    * `week_n` is the 0-based week offset, ready to pivot. */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val wk = date_trunc("week", col(tsCol))
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(wk).as("cohort_week"))
    val active = events.select(col(userCol), wk.as("act_week")).distinct()
    active.join(firstSeen, Seq(userCol))
      .groupBy(col("cohort_week"), col("act_week"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .withColumn("week_n",
        floor((col("act_week").cast("long") - col("cohort_week").cast("long"))
          / lit(604800L)).cast("long"))
  }

  /** Winsorized (percentile-clipped) robust stats per group: values are
    * clamped to the group's [pLo, pHi] exact percentiles before
    * aggregating — the standard defense against sensor spikes / metric
    * outliers poisoning a mean. Exact `percentile` full-sorts each group
    * (the q88 caveat: at 100 TB swap in `percentile_approx`; this is the
    * audit/verification form). Percentile bounds are rounded to 4
    * decimals BEFORE clipping (the q88 cross-engine parity discipline —
    * interpolation formulas differ in last-ulp between engines), and the
    * clipped mean is a DECIMAL-exact sum over the clamped values. */
  /** Broadcast join of a grouped-profile table back onto its source with
    * NULL as a matchable group value (`<=>`): GROUP BY made the null key
    * a group, so the join-back must keep it — a plain equi-join silently
    * drops the whole "uncategorized" stratum, which at 100 TB is
    * invisible data loss (caught by the cross-engine fuzz lane: the
    * winsorized/MAD/histogram profilers lost every null-key row at this
    * seam). The grouped side's key is renamed first so the self-derived
    * lineage cannot trip ambiguous-self-join resolution.
    *
    * Scale boundary: the broadcast is correct while the KEY CARDINALITY is
    * driver-bounded — the profiler contract (strata: event types, langs,
    * suppliers), one row per group. Profiling an id-cardinality key would
    * make the "profile" data-sized; that is a different operator (a
    * window), not a bigger broadcast. */
  private def joinGroupNullSafe(df: DataFrame, grouped: DataFrame,
                                key: String): DataFrame = {
    require(!df.columns.contains("__graft_gkey"),
      "joinGroupNullSafe: input already carries the reserved __graft_gkey column")
    df.join(broadcast(grouped.withColumnRenamed(key, "__graft_gkey")),
        col(key) <=> col("__graft_gkey"))
      .drop("__graft_gkey")
  }

  def winsorizedStats(df: DataFrame, key: String, valueCol: String,
                      pLo: Double, pHi: Double): DataFrame = {
    val v = col(valueCol)
    val bounds = df.groupBy(col(key)).agg(
      round(expr(s"percentile($valueCol, $pLo)"), 4).as("lo"),
      round(expr(s"percentile($valueCol, $pHi)"), 4).as("hi"),
      count(lit(1)).as("n"))
    joinGroupNullSafe(df, bounds, key)
      .withColumn("__clip", least(greatest(v, col("lo")), col("hi")))
      .groupBy(col(key), col("lo"), col("hi"), col("n"))
      .agg(sum(col("__clip").cast(DecimalType(18, 6))).cast("double")
        .as("__sum"))
      .select(col(key), col("n"), col("lo"), col("hi"),
        (floor(col("__sum") / col("n") * lit(1e6)).cast("double") / lit(1e6))
          .as("clipped_mean"))
  }

  /** The 100 TB form of [[winsorizedStats]]: identical plan shape, but the
    * clip bounds come from `percentile_approx` (a KLL-style mergeable
    * sketch — one partial-agg pass, no per-group full sort). Bound error is
    * ≤ 1/`accuracy` of rank, which perturbs only values INSIDE the clip
    * window's error band; the q88 gating pattern applies — use the exact
    * form when an oracle must hash-match, this one when the group is too
    * large to sort. Note the two variants are NOT bit-identical even on
    * small groups: exact `percentile` interpolates between order statistics
    * while the sketch returns an actual data value — the clipped mean
    * differs only by values falling between those two bounds (bounded by
    * (pHi-pLo) rank error + interpolation gap). */
  def winsorizedStatsApprox(df: DataFrame, key: String, valueCol: String,
                            pLo: Double, pHi: Double,
                            accuracy: Int = 10000): DataFrame = {
    val v = col(valueCol)
    val bounds = df.groupBy(col(key)).agg(
      round(expr(s"percentile_approx($valueCol, $pLo, $accuracy)"), 4).as("lo"),
      round(expr(s"percentile_approx($valueCol, $pHi, $accuracy)"), 4).as("hi"),
      count(lit(1)).as("n"))
    joinGroupNullSafe(df, bounds, key)
      .withColumn("__clip", least(greatest(v, col("lo")), col("hi")))
      .groupBy(col(key), col("lo"), col("hi"), col("n"))
      .agg(sum(col("__clip").cast(DecimalType(18, 6))).cast("double")
        .as("__sum"))
      .select(col(key), col("n"), col("lo"), col("hi"),
        (floor(col("__sum") / col("n") * lit(1e6)).cast("double") / lit(1e6))
          .as("clipped_mean"))
  }

  /** Per-group equi-width histogram: `bins` equal-width buckets between
    * the group's min and max, counts per bucket — the distribution
    * profile behind data-quality dashboards and CBO histograms. Two
    * aggregations (bounds, then bucket counts off a broadcast bounds
    * join); bucket index arithmetic is pure IEEE double over exact group
    * bounds — identical in any engine. A constant group (min = max)
    * lands entirely in bucket 0. Empty buckets are not emitted (left to
    * the consumer to densify via [[gapFillCounts]]-style grids). */
  def histogram(df: DataFrame, key: String, valueCol: String,
                bins: Int): DataFrame = {
    val v = col(valueCol)
    val bounds = df.groupBy(col(key))
      .agg(min(v).cast("double").as("mn"), max(v).cast("double").as("mx"))
    def trunc6(c: Column): Column = floor(c * lit(1e6)).cast("double") / lit(1e6)
    val bin = when(col("mx") === col("mn"), lit(0L))
      .otherwise(least(
        floor((v.cast("double") - col("mn")) / (col("mx") - col("mn")) * bins)
          .cast("long"),
        lit(bins - 1L)))
    joinGroupNullSafe(df, bounds, key)
      .withColumn("bin", bin)
      .groupBy(col(key), col("bin"), col("mn"), col("mx"))
      .agg(count(lit(1)).as("n"))
      .select(col(key), col("bin"),
        trunc6(col("mn") + col("bin").cast("double") * (col("mx") - col("mn")) / bins)
          .as("lo_edge"),
        col("n"))
  }

  /** Median-absolute-deviation outlier profile per group: med = p50(v),
    * mad = p50(|v - med|), outliers = rows with |v - med| > k·mad. The
    * median-based sibling of [[rollingAnomalies]]' mean/variance flags —
    * robust to the very outliers it is hunting (a single huge spike moves
    * a mean and variance, not a median). Two exact-percentile passes with
    * a broadcast bounds join between them; both medians are rounded to 4
    * decimals before reuse (the q88 cross-engine percentile discipline).
    * The 1.4826 normal-consistency constant is deliberately NOT applied —
    * fold it into `k` if normal-equivalent z-scores are wanted. */
  def madOutliers(df: DataFrame, key: String, valueCol: String,
                  k: Double): DataFrame = {
    val v = col(valueCol)
    val med = df.groupBy(col(key))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 4).as("med"),
        count(lit(1)).as("n"))
    val mad = joinGroupNullSafe(df, med, key)
      .groupBy(col(key), col("med"), col("n"))
      .agg(round(expr(s"percentile(abs($valueCol - med), 0.5)"), 4).as("mad"))
    joinGroupNullSafe(df, mad, key)
      .groupBy(col(key), col("med"), col("mad"), col("n"))
      .agg(sum(when(abs(v - col("med")) > lit(k) * col("mad"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .select(col(key), col("n"), col("med"), col("mad"), col("n_outliers"))
  }

  /** Per-key linear trend + one-step forecast over a [[gapFillCounts]]
    * series: ordinary least squares of count against the bucket index,
    * computed from INTEGER power sums only (x = 0-based bucket offset,
    * y = bucket count — every sum is an exact BIGINT, so slope/intercept/
    * forecast are engine-deterministic double formulas over identical
    * integers; the q89 decimal-exact-regression discipline with the
    * decimals replaced by plain longs). One aggregation per key after the
    * index projection; the forecast predicts the bucket AFTER the last
    * observed one. Keys with a single bucket get slope 0 (flat forecast). */
  def trendForecast(series: DataFrame, key: String, bucket: String,
                    valueCol: String, stepSec: Int): DataFrame = {
    val w = Window.partitionBy(col(key))
    val x = ((col(bucket).cast("long") - min(col(bucket).cast("long")).over(w))
      / stepSec).cast("long")
    val y = col(valueCol).cast("long")
    val staged = series.select(col(key), x.as("__x"), y.as("__y"))
    val agg = staged.groupBy(col(key)).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__x") * col("__y")).as("sxy"),
      max(col("__x")).as("xmax"))
    def d(c: Column): Column = c.cast("double")
    val denom = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val slope = when(denom === 0, lit(0.0))
      .otherwise((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / denom)
    def trunc6(c: Column): Column = floor(c * lit(1e6)).cast("double") / lit(1e6)
    agg
      .withColumn("__slope", slope)
      .withColumn("__icept", (d(col("sy")) - col("__slope") * d(col("sx"))) / d(col("n")))
      .select(col(key), col("n"), trunc6(col("__slope")).as("slope"),
        trunc6(col("__icept")).as("intercept"),
        trunc6(col("__icept") + col("__slope") * (d(col("xmax")) + lit(1.0)))
          .as("forecast_next"))
  }

  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > threshold).select(col(key))

  /** Deterministic exact-k-per-group sample: the reproducible eval-set
    * builder. Rows are ordered within each group by the md5 of
    * (group, id) — a fixed pseudo-random permutation, so the draw is
    * uniform-ish over the group yet bit-stable across runs, engines, and
    * partitionings (no RNG state; the [[weightedSample]] discipline with
    * uniform weights) — and the first `k` win. Unlike a fraction-based
    * `rn <= ceil(n * f)` slice (q52), the output size per group is exactly
    * min(k, group size) regardless of how the corpus grows.
    *
    * One exchange on the group key; the per-group sort is bounded by the
    * group size. For groups large enough that a full sort hurts, the
    * hash-threshold trick (filter `md5 < t` with t sized from a count,
    * then exact top-k on survivors) bounds the sort input — at that point
    * prefer [[weightedSample]]'s TakeOrderedAndProject shape per group.
    *
    * Returns the input columns plus `draw` (1-based rank within the
    * group's sample). */
  def sampleKPerGroup(df: DataFrame, group: String, idCol: String,
                      k: Int): DataFrame = {
    val hk = md5(concat_ws(":", col(group).cast("string"),
      col(idCol).cast("string")))
    val w = Window.partitionBy(col(group)).orderBy(hk, col(idCol))
    df.withColumn("draw", row_number().over(w).cast("long"))
      .filter(col("draw") <= k)
  }

  /** Join-key skew diagnosis: the "decide WHEN to salt" companion to
    * [[saltedJoin]]/[[hotKeys]]. Profiles the key's frequency distribution
    * and, per hot key, recommends the salt fan-out that brings its
    * partition back under `targetRowsPerTask`.
    *
    * Shape: one hash agg over the table (per-key counts), a distributed
    * top-k on the counts (TakeOrderedAndProject — never a global sort),
    * one scalar agg for the denominators, and a cross join of two
    * driver-tiny sides. Safe at any table size: the only data-sized pass
    * is the initial count agg.
    *
    * Returns `topN` rows (rank, key_value, cnt, share, skew_factor, salt):
    * share = key's row fraction, skew_factor = max_cnt / mean_cnt (>= 1;
    * ~1 means uniform, no salting needed), salt = ceil(cnt /
    * targetRowsPerTask). Fractions floor-truncated to 6 decimals; `salt`
    * is exact for counts below 2^53 (the double-division bound —
    * universe-scale tables exceed it long after the recommendation has
    * saturated). */
  /** A/B experiment readout: per `groupCol`, Welch's unequal-variance
    * t-test between the two arms of `variantCol` (0 = control, 1 =
    * treatment) over `valueCol`. The whole test reduces to six
    * conditionally-aggregated sums per group — ONE exchange with map-side
    * partial aggregation, no per-arm subqueries, no second pass — so at
    * 100 TB it costs exactly one grouped scan.
    *
    * Determinism discipline (the q89 pattern): sums accumulate in
    * DECIMAL(18,6) (order-independent exact), every derived stat is a
    * fixed closed-form double expression over those exact sums — mirrored
    * token-for-token in the oracle SQL — and reported stats are
    * floor-truncated to 6 decimals (round() half-way ties differ between
    * engines; floor never does). Sample variance uses the n-1 denominator.
    * Arms with < 2 observations or zero pooled variance yield NULL t/df
    * (insufficient evidence is not "t=0"). `significant` = |t| > 1.96
    * (two-sided 5%), computed from the SAME double both engines derived. */
  def welchTTest(df: DataFrame, groupCol: String, variantCol: String,
                 valueCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast(DecimalType(18, 6))
    def trunc6(c: Column): Column = floor(c * lit(1e6)).cast("double") / lit(1e6)
    val v = col(variantCol)
    val x = col(valueCol)
    def armSum(arm: Int, e: Column): Column =
      sum(when(v === arm, e).otherwise(lit(null)))
    val g = df.groupBy(col(groupCol)).agg(
      // count(when(v===arm, x)) counts non-NULL observations in the arm —
      // rows with a NULL value join neither the count nor the sums
      count(when(v === 0, x)).cast("double").as("na"),
      count(when(v === 1, x)).cast("double").as("nb"),
      armSum(0, dec(x)).cast("double").as("sa"),
      armSum(1, dec(x)).cast("double").as("sb"),
      armSum(0, dec(x) * dec(x)).cast("double").as("saa"),
      armSum(1, dec(x) * dec(x)).cast("double").as("sbb"))
    val ma = col("sa") / col("na")
    val mb = col("sb") / col("nb")
    val va = (col("saa") - col("sa") * col("sa") / col("na")) / (col("na") - 1)
    val vb = (col("sbb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1)
    val se2 = va / col("na") + vb / col("nb")
    val tStat = (ma - mb) / sqrt(se2)
    val dfW = (se2 * se2) /
      ((va / col("na")) * (va / col("na")) / (col("na") - 1) +
       (vb / col("nb")) * (vb / col("nb")) / (col("nb") - 1))
    val ok = col("na") > 1 && col("nb") > 1 && se2 > 0
    g.select(col(groupCol),
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      trunc6(ma).as("mean_a"), trunc6(mb).as("mean_b"),
      when(ok, trunc6(tStat)).as("t_stat"),
      when(ok, trunc6(dfW)).as("df_welch"),
      when(ok, abs(tStat) > lit(1.96)).as("significant"))
  }

  def skewProfile(df: DataFrame, key: String, topN: Int = 5,
                  targetRowsPerTask: Long = 10000L): DataFrame = {
    def trunc6(c: Column): Column = floor(c * lit(1e6)).cast("double") / lit(1e6)
    def d(c: Column): Column = c.cast("double")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("__n_keys"),
      sum(col("cnt")).as("__total"), max(col("cnt")).as("__max_cnt"))
    val top = counts.orderBy(col("cnt").desc, col(key)).limit(topN)
    // the window ranks only the topN surviving rows — single tiny partition
    val w = Window.orderBy(col("cnt").desc, col(key))
    top.crossJoin(stats)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(key).cast("string").as("key_value"), col("cnt"),
        trunc6(d(col("cnt")) / d(col("__total"))).as("share"),
        trunc6(d(col("__max_cnt")) * d(col("__n_keys")) / d(col("__total")))
          .as("skew_factor"),
        floor((col("cnt") + lit(targetRowsPerTask - 1)) / lit(targetRowsPerTask))
          .cast("long").as("salt"))
  }
}
