#!/usr/bin/env python3
"""Per-query perf guardrail: flag engine queries slower than N x their
DuckDB-oracle time, so plan regressions surface in-round instead of at
judging.

Usage:
  # 1. time the oracle SQL in DuckDB and write the fixture
  python3 tools/perf_check.py time <sfDir> <oracle_sql.json> <fixture.json>

  # 2. compare a graft.Bench JSON line against the fixture
  python3 tools/perf_check.py check <fixture.json> <bench.json> [ratio] [min_spark_sec]

`bench.json` is the one-line JSON that graft.Bench prints (or a file whose
last '{"metric"' line is that JSON). Default ratio 4.0; queries faster than
min_spark_sec (default 2.5 s quiet-host, scaled by the bench's self-measured host_load) are never flagged: at sf0.1 a Spark query
carries ~0.5-1.5 s of fixed cost (planning, codegen, 32-task scheduling)
on a QUIET host — and the driver's shared host measures 1.3-1.8x that
(round 8: three sub-2.6 s queries with unchanged plans flagged there,
re-measured clean in isolation) — so a ratio on a sub-3s query measures
that constant plus host load, not the plan. Every plan weakness the
round-2 audit found was >= 6 s absolute. Exit code = number of violations.
"""
import json
import re
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def time_oracle(sf_dir: str, oracle_path: str, fixture_path: str,
                only: set = None) -> int:
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    times = {}
    if only:  # incremental: retime named queries, keep the rest
        oracle = {k: v for k, v in oracle.items() if k in only}
        times = json.load(open(fixture_path))["times"]
        # drop fixture entries for queries no longer in the oracle map
        current = set(json.load(open(oracle_path)))
        times = {k: v for k, v in times.items() if k in current}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(2):  # best-of-2: first run pays buffer warmup
            t0 = time.monotonic()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                print(f"ERR  {name}: {e}")
                best = None
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = round(best, 4)
            print(f"{name:28s} {best:8.3f}s")
    json.dump({"sf_dir": sf_dir, "engine": "duckdb", "times": times},
              open(fixture_path, "w"), indent=1)
    print(f"wrote {fixture_path} ({len(times)} queries)")
    return 0


def load_bench(path: str) -> dict:
    """Last graft.Bench JSON line that carries the per-query map.

    Bench prints TWO lines since round 10: the full contract line (with
    "queries") first, then a short summary (headline fields + compact
    "t_ms" array) sized to survive the driver's bounded log-tail capture.
    Prefer the line with "queries"; fall back to expanding "t_ms" against
    name-sorted fixture keys when only the summary survived (a truncated
    capture)."""
    txt = open(path).read()
    with_queries, summary = None, None
    for m in re.finditer(r'\{"metric".*\}', txt):
        d = json.loads(m.group(0))
        if "queries" in d:
            with_queries = d
        elif "t_ms" in d:
            summary = d
    if with_queries is not None:
        if summary is not None and "host_load" in summary:
            with_queries.setdefault("host_load", summary["host_load"])
        return with_queries
    if summary is not None:
        return summary
    raise SystemExit(f"no graft.Bench JSON line found in {path}")


# Streaming queries carry micro-batch planning + per-partition state-store
# setup on top of the batch fixed cost (a stream-stream join allocates 4
# state stores per shuffle partition): measured spin-up floor ~2-3 s at
# sf0.1, amortized over the stream at scale. A ratio against a batch oracle
# below this floor measures the spin-up, not the plan.
STREAMING = {"q35_stream_tumbling", "q37_stream_sliding", "q38_session_window",
             "q39_stateful_sessions", "q58_stream_join", "q155_stream_dedup"}
STREAMING_MIN_SPARK = 3.5   # quiet-host; scaled by measured host_load

# q156 replays the month as 2 time-ordered micro-batches (r11; was 4, was
# 8) so the watermark advances (stream-stream LEFT OUTER join: the
# null-side emission requires watermark movement a single-batch source
# never produces; any batch count >= 2 yields the identical settled
# region). Each batch is a full stateful outer-join step committing 4
# state stores per shuffle partition, plus the final no-data flush —
# ~3.0-3.4 s measured at sf0.1; host_load scaling covers the driver
# host's measured 1.2-1.5x factor. Pure protocol cost that amortizes over
# batch duration at scale: the ScaleCheck probe measures per-event cost
# FALLING (43 -> 3.4 µs/event).
REPLAY_STREAMING = {"q156_stream_outer_join",
                    # q141 runs TWO whole streaming queries (crash +
                    # checkpoint-resume) over two MergeTable commits to
                    # prove exactly-once replay — the heaviest protocol
                    # query in the suite (BENCH_r17: 6.1 s at load 1.32,
                    # normalized ~4.7 s quiet-host)
                    "q141_stream_replay"}
# BENCH_r17 measured q156 at 8.55 s under the driver host's 1.32 load
# (normalized ~6.5 s): the stateful outer-join replay's state-store
# commits contend with background load super-linearly, so the quiet-host
# floor carries that measured normalization, not the 3.4 s quiet wall
REPLAY_STREAMING_MIN_SPARK = 6.5  # quiet-host; scaled by measured host_load

# Multi-stage compositions pay each stage's fixed cost (scan scheduling,
# codegen, checkpoint materialization at the fan-out) once per stage;
# q168 runs entropy + NB classifier + span removal back to back (~0.8 s
# fixed each at sf0.1), so its wall sits at the sum of three per-stage
# floors while the DuckDB CTE pipeline fuses into one plan.
COMPOSITION = {"q168_curation_v2"}
COMPOSITION_MIN_SPARK = 3.5  # quiet-host; scaled by measured host_load

# Transactional-load queries execute the full multi-commit protocol the
# closed-form oracle never performs: q63 runs TWO MergeTable commits (each
# a checkpoint — whose job also delivers the batch stats as observe()
# metrics since r11 — + CAS claim + partitioned snapshot write + manifest
# swap) plus a versioned read-back; q64 runs TWO foreachBatch commits
# (r11; was 3) inside a streaming query (micro-batch spin-up on top). The
# DuckDB SQL states the final table analytically in one SELECT, so the
# ratio below this floor measures protocol I/O that amortizes at scale
# (commit cost is delta-proportional), not plan inefficiency. Measured
# 1.7-2.5 s at sf0.1 depending on JIT warmth (q141, the
# two-streaming-query crash-resume proof, is the heaviest); host_load
# scaling covers the driver host's measured 1.2-1.5x factor.
MULTI_COMMIT = {"q63_merge_upsert", "q64_stream_upsert",
                # q141 deliberately runs TWO streaming queries (crash +
                # checkpoint-resume) over two MERGE commits to prove
                # exactly-once replay; the oracle is one SELECT
                "q141_stream_replay",
                # time-travel / CDC read a memoized two-commit table (no
                # rebuild inside the timed query since round 4), kept here
                # because the FIRST bench run of whichever query builds it
                # pays the protocol once
                "q66_time_travel", "q67_cdc_diff",
                # schema evolution runs the same two-commit protocol as q63
                "q77_schema_evolution",
                # composite-key form of q64: same two foreachBatch commits
                "q186_stream_upsert_ck",
                # q191 runs a whole streaming follower (rate ticker +
                # transactional sink merge) for one delivered window
                "q191_cdc_follow",
                # the r16/r17 protocol queries measured at the same
                # two-commit MERGE wall on the driver host (BENCH_r17:
                # 3.5-4.3 s at load 1.32 = 2.6-3.3 s normalized):
                # q179 widens the schema across two commits, q182 runs
                # the composite-key SQL MERGE protocol, q184 the whole
                # SQL lifecycle (CREATE+MERGE+DELETE+OPTIMIZE)
                "q179_evolution_widen", "q182_sql_merge_composite",
                "q184_sql_lifecycle",
                # q212 runs TWO transactional merge-on-read commits over
                # the shared seeded base (r19: the identical-every-run
                # CREATE moved to the q174-class shared fixture) — the
                # same per-commit protocol wall as q63
                "q212_merge_mor"}
MULTI_COMMIT_MIN_SPARK = 4.5  # quiet-host; scaled by measured host_load


# queries with no standalone DuckDB timing (their oracles read
# engine-written fixtures): needed to expand a summary-only t_ms capture
NON_FIXTURE_QUERIES = {"q94_ann_ivf", "q140_ann_ivfpq", "q151_ann_upsert"}


def check(fixture_path: str, bench_path: str, ratio: float, min_spark: float) -> int:
    fixture = json.load(open(fixture_path))["times"]
    parsed = load_bench(bench_path)
    if "queries" in parsed:
        bench = parsed["queries"]
    else:
        # summary-only capture (the truncated-log scenario the second
        # Bench line exists for): t_ms is in ascending-query-name order
        # over ALL SparkEntry.queries = the fixture's names plus the
        # fixture-less ANN queries (their oracles read engine-written
        # fixtures, so they carry no standalone DuckDB timing)
        names = sorted(set(fixture) | NON_FIXTURE_QUERIES)
        t_ms = parsed["t_ms"]
        if len(names) != len(t_ms):
            raise SystemExit(
                f"t_ms has {len(t_ms)} entries but {len(names)} query names "
                "are known (fixture + NON_FIXTURE_QUERIES) — regenerate the "
                "fixture or update NON_FIXTURE_QUERIES")
        bench = {n: ms / 1000.0 for n, ms in zip(names, t_ms)}
    # floors below are quiet-host values; Bench self-calibrates a host load
    # factor (stderr "[bench] host load factor: X") — pass it as min_spark
    # scaling when checking a loaded host's artifact
    # clamp to the same [1.0, 2.0] band Bench's self-measured calibration
    # enforces — an inflated artifact/env host_load must not be able to
    # silently disable the regression gate
    host_load = max(1.0, min(2.0, float(parsed.get("host_load", 1.0))))
    # graft.Bench emits qNN short keys (the full-name line outgrew the
    # driver's log-tail capture window at 168 queries); expand them back to
    # the fixture's full names so floors and ratios match either form
    by_short = {full.split("_", 1)[0]: full for full in fixture}
    bench = {by_short.get(k, k): v for k, v in bench.items()}
    violations = 0
    for name, spark_s in sorted(bench.items()):
        if spark_s < 0:
            print(f"FAIL {name}: errored in bench")
            violations += 1
            continue
        duck_s = fixture.get(name)
        if duck_s is None:
            continue  # rows-only query, no oracle timing
        floor = min_spark
        if name in STREAMING:
            floor = max(floor, STREAMING_MIN_SPARK)
        if name in MULTI_COMMIT:
            floor = max(floor, MULTI_COMMIT_MIN_SPARK)
        if name in REPLAY_STREAMING:
            floor = max(floor, REPLAY_STREAMING_MIN_SPARK)
        if name in COMPOSITION:
            floor = max(floor, COMPOSITION_MIN_SPARK)
        floor *= host_load
        if spark_s >= floor and spark_s > ratio * host_load * duck_s:
            print(f"FLAG {name}: spark {spark_s:.2f}s > {ratio:g}x duckdb {duck_s:.2f}s"
                  f" ({spark_s / duck_s:.1f}x)")
            violations += 1
        else:
            print(f"ok   {name}: spark {spark_s:.2f}s vs duckdb {duck_s:.2f}s")
    print(f"{violations} violation(s)")
    return violations


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "time":
        only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
        sys.exit(time_oracle(sys.argv[2], sys.argv[3], sys.argv[4], only))
    elif mode == "check":
        r = float(sys.argv[4]) if len(sys.argv) > 4 else 4.0
        ms = float(sys.argv[5]) if len(sys.argv) > 5 else 2.5
        sys.exit(check(sys.argv[2], sys.argv[3], r, ms))
    else:
        sys.exit(__doc__)
