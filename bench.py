#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6 / M7).

Default mode: run the flagship geo pipeline (ingest -> STRtree PIP join
-> ring-expansion kNN -> decode+salted tiling, BASELINE.json:6) over a
deterministic synthetic image+caption fixture sized to the scale factor,
plus every driver-contract query over ``$GRAFT_SF_DIR``, and print ONE
JSON line::

    {"metric": ..., "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "flagship": {"rows": n, "sec": s, "rows_per_s": r}}

``--scaling``: the sandbox protocol for the north rule's two-cluster-size
criterion (BASELINE.md) — run the identical flagship job in two FRESH
processes at ``num_cpus=4`` and ``num_cpus=16`` (N and 4N; see
BASELINE.md for why this pair stays under the VM's non-scaling disk and
memory-bandwidth ceilings) on the same input and report throughput at
both plus ``efficiency = (rps_hi/rps_lo)/(hi/lo)``; the measured table
in BASELINE.md is updated in place.

This script OWNS its Ray session (ray.init/ray.shutdown); library code
and ``__ray_entry__`` never init Ray (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32") or "32")
# Fixture + outputs live on tmpfs: the sandbox's single virtio disk
# tops out ~160MB/s and would make every run disk-bound, which measures
# the VM's disk, not the engine. On a multi-node cluster storage
# bandwidth (S3/HDFS) scales with node count, so taking the one
# non-scaling disk out of the single-node measurement is what makes the
# two-parallelism-level protocol meaningful. Falls back to /tmp if shm
# is small.
_SHM = "/dev/shm"


def _scratch_root() -> str:
    try:
        s = os.statvfs(_SHM)
        if s.f_bavail * s.f_frsize > 30 * 2**30:
            return _SHM
    except OSError:
        pass
    return "/tmp"


FIXTURE_ROOT = os.path.join(_scratch_root(), "graft_bench_images")
BASELINE_MD = os.path.join(REPO, "BASELINE.md")
MARK_BEGIN = "<!-- BENCH:BEGIN -->"
MARK_END = "<!-- BENCH:END -->"
CORPUS_MARK_BEGIN = "<!-- CORPUS-BENCH:BEGIN -->"
CORPUS_MARK_END = "<!-- CORPUS-BENCH:END -->"


def parse_sf(sf_dir: str) -> float | None:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return None


def fixture_rows(sf: float | None) -> int:
    """Flagship fixture size: ~2.4M rows/sf-unit, floor 2k — 240k rows
    at the driver's sf0.1 so the headline rows/s is real pipeline
    throughput, not per-execution scheduling overhead (round-3 verdict
    item 7: 60k rows ran in ~5.5s, mostly fixed cost; the protocol
    number at 1.2M rows was 4x the 60k-row rate)."""
    return max(2000, int(2_400_000 * (sf if sf is not None else 0.1)))


def ensure_fixture(n: int, px_scale: int = 1) -> str:
    """Deterministic parquet fixture, generated once (Ray-parallel) and
    reused by every run/level — generation is excluded from all timings."""
    from engine import fixtures

    d = f"{FIXTURE_ROOT}_{n}" + (f"_s{px_scale}" if px_scale != 1 else "")
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    fixtures.images_dataset(
        n, parallelism=max(32, n // 4096), px_scale=px_scale
    ).write_parquet(d)
    with open(marker, "w") as f:
        f.write(str(n))
    return d


def _ramp_warmup(cpus: int, seconds: float = 2.0) -> None:
    """Force-spawn the full worker pool AND ramp each worker's CPU.

    Two effects: (1) Ray spawns workers gradually — without this the
    first executions run at a fraction of the CPU budget (measured
    100s -> 43s across identical executions); (2) the sandbox throttles
    each process's first seconds of heavy compute (measured: identical
    matmul+argpartition 1.33s -> 0.40s -> 0.08s across calls in a fresh
    process) — real numpy work, not a sleep-spin, ramps the quota/BLAS
    so the timed run doesn't absorb a 10-20x first-task penalty."""
    import numpy as _np
    import ray.data

    def _spin(batch):
        a = _np.ones((4000, 3))
        b = _np.ones((1121, 3))
        t_end = time.perf_counter() + seconds
        while time.perf_counter() < t_end:
            d = a @ b.T
            _np.argpartition(-d, 12, axis=1)
            _np.sin(d[:64])
        return batch

    ray.data.range(cpus * 2, override_num_blocks=cpus * 2).map_batches(
        _spin, batch_size=1
    ).materialize()


def run_flagship_bench(
    n: int, cpus: int, target_partitions: int = 0, px_scale: int = 1,
    pre_seconds: float = 20.0, series: int = 1,
) -> dict:
    from engine.pipeline import flagship

    if not target_partitions:
        # ~600k rows/partition: fused partitions are shuffle-free streams
        # (pack combiner replaced the per-partition sort), so partitions
        # can be large. Floor 1, not 4: each partition EXECUTION carries
        # ~1.8s of scheduling/ramp fixed cost (measured at 240k rows /
        # 32 cpus: 1 partition 99.5k rows/s, 4 partitions 30.3k), and
        # the throughput metric should measure the stream, not resume
        # granularity (real runs keep target_partitions=4+ for resume).
        target_partitions = max(1, round(n / 600_000))

    img_dir = ensure_fixture(n, px_scale)
    # Warmup (see _ramp_warmup) + a tiny end-to-end run so workers have
    # imported the engine. Throughput / scaling efficiency are
    # steady-state metrics (a real cluster job runs warm); cold-start is
    # reported separately by the driver's wall clock.
    _ramp_warmup(cpus)
    warm_dir = ensure_fixture(2000)
    warm_out = tempfile.mkdtemp(prefix="graft_bench_warm_", dir=_scratch_root())
    flagship.run_flagship(
        warm_dir, warm_out, target_partitions=2, batch_size=2048,
        resume=False, run_id="warmup", partition_threads=1, use_actors=False,
    )
    shutil.rmtree(warm_out, ignore_errors=True)

    from engine import fixtures

    # Italy-scale admin hierarchy (20 regions / 100 provinces / 1000
    # municipalities + hotspot): the reference's real workload joins
    # against thousands of boundary polygons, not a toy set
    poly = fixtures.polygons(n_regions=20, provinces=5, munis=10)

    # Steady-state pre-runs: the sandbox lifts a process's CPU quota
    # gradually over MINUTES of sustained load — the first full-size run
    # after a short warmup is reproducibly ~2x slower than an identical
    # second run (measured 48.9s -> 21.0s and 57.7s -> 23.6s at 16
    # cpus), and long-lived sessions keep speeding up past that. A short
    # spin can't buy those credits, so the full job runs UNTIMED until
    # ~90s of sustained load has accrued (one run at the low level,
    # several at the high level) — giving both levels the same
    # wall-clock ramp before the timed run. Without this the ratio is
    # poisoned asymmetrically: the short high-cpu run enters its timed
    # section less ramped than the long low-cpu one (efficiency read
    # 0.60-0.71 from that artifact alone).
    pre_deadline = time.perf_counter() + pre_seconds
    while time.perf_counter() < pre_deadline:
        pre_out = tempfile.mkdtemp(prefix="graft_bench_pre_", dir=_scratch_root())
        flagship.run_flagship(
            img_dir, pre_out, poly=poly, target_partitions=target_partitions,
            batch_size=2048, pip_concurrency=(1, cpus),
            decoder_concurrency=(1, cpus), resume=False, run_id="steady_warm",
            partition_threads=1, use_actors=False, read_blocks=32,
        )
        shutil.rmtree(pre_out, ignore_errors=True)

    # Timed series: R identical runs, min counts. External interference
    # arrives in multi-minute episodes 2-3x deep, so a series spread
    # over ~5-10 minutes gives the min a real chance at a clean window;
    # single timed runs per fresh process were a lottery (the bests
    # table swung 0.57..1.46 in efficiency across protocol attempts).
    secs = []
    res = None
    for i in range(max(1, series)):
        out_dir = tempfile.mkdtemp(  # fresh: no resume reuse
            prefix="graft_bench_out_", dir=_scratch_root()
        )
        t0 = time.perf_counter()
        r = flagship.run_flagship(
            img_dir,
            out_dir,
            poly=poly,
            target_partitions=target_partitions,
            batch_size=2048,
            pip_concurrency=(1, cpus),
            decoder_concurrency=(1, cpus),
            resume=False,
            run_id=f"bench_c{cpus}_{i}",
            # sequential partitions: each fused execution saturates the
            # available CPUs on its own (32 fat blocks). partition_threads=2
            # re-tested post-warmup-fix: equal to 1 within the VM's 2-3x
            # interference noise (bests 21.0s vs 23.6s at 16 cpus), so the
            # simpler sequential mode stays
            partition_threads=1,
            use_actors=False,  # warm-worker tasks: many short executions (see engine.state)
            # ~32 fat blocks per partition: per-task driver bookkeeping is
            # the single-driver scaling ceiling — fewer, longer tasks
            read_blocks=32,
        )
        secs.append(round(time.perf_counter() - t0, 3))
        if res is None:
            res = r
        else:
            # parity must be identical across every run of the series
            assert r["joined_rows"] == res["joined_rows"], "parity drift"
        shutil.rmtree(out_dir, ignore_errors=True)
    sec = min(secs)
    summary = {
        "rows": n,
        "sec": sec,
        "rows_per_s": round(n / sec, 1),
        "series_secs": secs,
        "joined_rows": res["joined_rows"],
        "knn_rows": res["knn_rows"],
        "tiles": res["tiles"],
        "partitions": res["partitions"],
    }
    return summary


def consume(result) -> int:
    """Force execution of a query result; return its row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return len(result)
    if isinstance(result, pa.Table):
        return result.num_rows
    return result.count()  # ray.data.Dataset


def run_queries_bench(sf_dir: str, cpus: int | None = None) -> tuple[dict, dict]:
    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    if cpus:
        _ramp_warmup(cpus)
    qtimes: dict[str, float] = {}
    qrows: dict[str, int] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        qrows[name] = consume(fn(sf_dir))
        qtimes[name] = round(time.perf_counter() - t0, 3)
    return qtimes, qrows


def update_baseline_md(block: str, begin: str = MARK_BEGIN,
                       end: str = MARK_END) -> None:
    text = open(BASELINE_MD).read()
    section = f"{begin}\n{block}\n{end}"
    if begin in text:
        pre = text.split(begin)[0]
        post = text.split(end)[-1]
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(BASELINE_MD, "w") as f:
        f.write(text)


def scaling_mode(args) -> dict:
    """Fresh-process two-level scaling run (BASELINE.md protocol).

    Each level runs ``--repeats`` times in fresh processes; the BEST
    wall time per level is reported (this sandbox VM shows 2-3x
    run-to-run interference noise; min-of-N is the standard throughput
    methodology under external interference)."""
    levels = sorted({args.scale_lo, args.scale_hi})
    # 1.2M rows at px_scale=1 (~2.3GB) against the Italy-scale polygon
    # set: large enough that compute dominates fixed latency at both
    # levels. px_scale=4 (64-128px, ~18GB) was measured memory-
    # bandwidth-bound end-to-end on this VM (~13GB/s ceiling) —
    # bandwidth doesn't scale with local CPUs, so a heavier fixture
    # measures the VM, not the engine.
    n = args.n or 1_200_000
    results = {}
    # ONE fresh process per level; inside it, an equal ~90s ramp then a
    # SERIES of timed runs with the min counting. The VM's external
    # interference arrives in multi-minute 2-3x episodes, so a series
    # spread over ~5-10 minutes per level gives each level's min a real
    # chance at a clean window — one timed run per process was a
    # lottery (measured efficiency swung 0.57..1.46 across protocol
    # attempts from windowing alone, with identical engine code).
    series = max(3, args.repeats)
    for cpus in levels:
        out = tempfile.mktemp(prefix="graft_scaling_", suffix=".json")
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--flagship-only", "--cpus", str(cpus),
            "--sf-dir", args.sf_dir, "--json-out", out, "--n", str(n),
            "--px-scale", str(args.px_scale or 1),
            "--pre-seconds", "90", "--series", str(series),
        ]
        subprocess.run(cmd, check=True, cwd=REPO)
        with open(out) as f:
            results[cpus] = json.load(f)
        os.remove(out)
    lo, hi = levels[0], levels[-1]
    rps_lo = results[lo]["flagship"]["rows_per_s"]
    rps_hi = results[hi]["flagship"]["rows_per_s"]
    eff = (rps_hi / rps_lo) / (hi / lo)
    report = {
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "sf": results[hi].get("sf"),
        "num_cpus": hi,
        "levels": {
            str(c): {
                "rows_per_s": results[c]["flagship"]["rows_per_s"],
                "sec": results[c]["flagship"]["sec"],
            }
            for c in levels
        },
        "rows": results[hi]["flagship"]["rows"],
        "px_scale": args.px_scale or 1,
        "target": 0.8,
    }
    block = (
        "## Measured results (sandbox two-level protocol)\n\n"
        f"Flagship ingest+join+kNN+tile job, {report['rows']} image rows "
        f"at px_scale={report['px_scale']}, "
        "one fresh `ray.init(address=\"local\", num_cpus=C)` process per "
        "level, same input fixture, fresh output dirs; equal ~90s "
        f"steady-state ramp then a series of {series} timed runs per "
        "level, min counting (the sandbox VM shows 2-3x external "
        "interference noise in multi-minute episodes):\n\n"
        "| num_cpus | wall sec (min of series) | rows/s | series secs |\n"
        "|---|---|---|---|\n"
        + "".join(
            f"| {c} | {report['levels'][str(c)]['sec']} | "
            f"{report['levels'][str(c)]['rows_per_s']} | "
            f"{results[c]['flagship'].get('series_secs', [])} |\n"
            for c in levels
        )
        + f"\nScaling efficiency {lo}->{hi} cpus: "
        f"**{report['value']}** (target >= 0.8; "
        f"efficiency = (rps_{hi}/rps_{lo})/({hi}/{lo}))\n"
    )
    update_baseline_md(block)
    return report




def synth_docs_parquet(n_docs: int, out_dir: str, num_files: int = 8) -> None:
    """Deterministic large documents fixture for the corpus-prep
    scaling bench (the sf tables top out at 5k docs): zipf-ish word
    mix over a 4k vocabulary, doc lengths 20-200 tokens, ~3% exact
    duplicates so the dedup stage has real work. Cached by marker;
    lives on tmpfs (the virtio disk is ~160MB/s)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i:04d}" for i in range(4000)], dtype=object)
    zipf_p = 1.0 / np.arange(1, len(vocab) + 1)
    zipf_p /= zipf_p.sum()
    per = n_docs // num_files
    doc_id = 0
    for f_ix in range(num_files):
        n = per if f_ix < num_files - 1 else n_docs - per * (num_files - 1)
        lens = rng.integers(20, 200, n)
        texts = []
        for L in lens:
            texts.append(" ".join(rng.choice(vocab, size=L, p=zipf_p)))
        # ~3% exact duplicates of earlier docs in the same file
        dup_ix = rng.integers(0, n, max(1, n // 33))
        for di in dup_ix:
            texts[di] = texts[int(di) // 2]
        pq.write_table(
            pa.table({
                "doc_id": pa.array(
                    np.arange(doc_id, doc_id + n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }),
            os.path.join(out_dir, f"docs-{f_ix}.parquet"),
        )
        doc_id += n
    open(marker, "w").write("ok")


def run_corpus_bench(
    n_docs: int, cpus: int, pre_seconds: float = 20.0, series: int = 1,
) -> dict:
    """prepare_corpus (lang-id -> quality gate -> dedup -> tokens ->
    packing) over the synthetic docs fixture; same ramp + untimed
    steady-state pre-run + min-of-series discipline as the flagship."""
    import ray.data

    from engine.pipeline.corpus import prepare_corpus

    d = f"/dev/shm/graft_docs_{n_docs}"
    synth_docs_parquet(n_docs, d)
    _ramp_warmup(cpus)

    def once() -> tuple[float, int]:
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(d, columns=["doc_id", "text"])
        rows = prepare_corpus(ds).count()
        return time.perf_counter() - t0, rows

    t_pre = 0.0
    while t_pre < pre_seconds:  # equal steady-state budget per level
        dt, _ = once()
        t_pre += dt
    secs, rows = [], 0
    for _ in range(series):
        dt, rows = once()
        secs.append(round(dt, 3))
    best = min(secs)
    return {
        "docs": n_docs, "rows_out": rows, "sec": best,
        "docs_per_s": round(n_docs / best, 1), "series_secs": secs,
    }


def scaling_corpus_mode(args) -> dict:
    """Two-level fresh-process protocol for the corpus-prep pipeline —
    the training-data twin of ``scaling_mode`` (same ramp/series/min
    rules); writes the CORPUS-BENCH block in BASELINE.md."""
    levels = sorted({args.scale_lo, args.scale_hi})
    # 960k: the round-5 Arrow combiner made 480k fixed-overhead-bound
    # at 16 cpus (same reasoning as round 4's 120k -> 480k bump)
    n = args.corpus_n or 960_000
    series = max(3, args.repeats)
    results = {}
    for cpus in levels:
        out = tempfile.mktemp(prefix="graft_cscaling_", suffix=".json")
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--corpus-only", "--cpus", str(cpus), "--corpus-n", str(n),
            "--json-out", out, "--pre-seconds", "60",
            "--series", str(series),
        ]
        subprocess.run(cmd, check=True, cwd=REPO)
        with open(out) as f:
            results[cpus] = json.load(f)
        os.remove(out)
    lo, hi = levels[0], levels[-1]
    eff = (results[hi]["corpus"]["docs_per_s"]
           / results[lo]["corpus"]["docs_per_s"]) / (hi / lo)
    report = {
        "metric": "corpus_scaling_efficiency", "value": round(eff, 4),
        "unit": "ratio", "num_cpus": hi, "docs": n, "target": 0.8,
        "levels": {str(c): results[c]["corpus"] for c in levels},
    }
    block = (
        "## Corpus-prep pipeline scaling (second data point)\n\n"
        f"`prepare_corpus` (lang-id -> quality gate -> exact dedup -> "
        f"token count -> packing) over {n} synthetic docs (tmpfs), "
        "same fresh-process / equal-ramp / min-of-series protocol as "
        "the flagship block above:\n\n"
        "| num_cpus | wall sec (min of series) | docs/s | series secs |\n"
        "|---|---|---|---|\n"
        + "".join(
            f"| {c} | {report['levels'][str(c)]['sec']} | "
            f"{report['levels'][str(c)]['docs_per_s']} | "
            f"{report['levels'][str(c)]['series_secs']} |\n"
            for c in levels
        )
        + f"\nCorpus scaling efficiency {lo}->{hi} cpus: "
        f"**{report['value']}** (target >= 0.8)\n"
    )
    update_baseline_md(block, CORPUS_MARK_BEGIN, CORPUS_MARK_END)
    return report


CHANGEFILE_MARK_BEGIN = "<!-- CHANGEFILE-BENCH:BEGIN -->"
CHANGEFILE_MARK_END = "<!-- CHANGEFILE-BENCH:END -->"


def run_changefile_bench(
    n: int, cpus: int, pre_seconds: float = 20.0,
    change_frac: float = 0.01, target_partitions: int = 16,
) -> dict:
    """Incremental nightly-loop benchmark (round-4 verdict item 6):
    base flagship run at bench scale, then a ~``change_frac``
    changefile concentrated in one key neighborhood (the realistic
    nightly shape — edits cluster in the areas that changed), then
    ``run_incremental_update`` vs a from-scratch full rerun over the
    SAME post-update images. Reports touched-partition count and the
    incremental-vs-full wall-time ratio — the number that prices the
    lineage/manifest machinery. The fixture is COPIED to scratch
    first: the changefile application rewrites fragments in place."""
    from engine import fixtures
    from engine.pipeline import flagship, incremental

    src = ensure_fixture(n)
    work = tempfile.mkdtemp(prefix="graft_chbench_", dir=_scratch_root())
    img_dir = os.path.join(work, "images")
    shutil.copytree(src, img_dir)
    marker = os.path.join(img_dir, "_COMPLETE")
    if os.path.exists(marker):
        os.remove(marker)

    _ramp_warmup(cpus, seconds=max(2.0, pre_seconds / 10))
    warm_dir = ensure_fixture(2000)
    warm_out = tempfile.mkdtemp(prefix="graft_chbench_warm_",
                                dir=_scratch_root())
    flagship.run_flagship(
        warm_dir, warm_out, target_partitions=2, batch_size=2048,
        resume=False, run_id="warmup", partition_threads=1,
        use_actors=False)

    out_base = os.path.join(work, "out")
    t0 = time.perf_counter()
    flagship.run_flagship(
        img_dir, out_base, target_partitions=target_partitions,
        batch_size=2048, resume=False, run_id="base")
    t_base = round(time.perf_counter() - t0, 3)

    # ~1% changefile concentrated in a contiguous id window: 40%
    # deletes, 60% in-place upserts, plus 0.1% brand-new inserts past
    # every fragment's range (the spill partition)
    nch = max(10, int(n * change_frac))
    w0 = int(n * 0.37)
    ndel = nch * 2 // 5
    del_ids = [f"img{i:09d}" for i in range(w0, w0 + ndel)]
    up_idx = list(range(w0 + ndel, w0 + nch))
    donor = fixtures.images_table(len(up_idx), offset=n + 500_000)
    import pyarrow as pa
    ups = donor.set_column(
        0, "image_id",
        pa.array([f"img{i:09d}" for i in up_idx], pa.string()))
    ins = fixtures.images_table(max(1, n // 1000), offset=n)
    d_tab = pa.table({
        "image_id": pa.array(del_ids, pa.string()),
        "bytes": pa.array([b""] * ndel, pa.binary()),
        "w": pa.array([0] * ndel, pa.int32()),
        "h": pa.array([0] * ndel, pa.int32()),
        "fmt": pa.array([""] * ndel, pa.string()),
        "caption": pa.array([""] * ndel, pa.string()),
        "phash": pa.array([0] * ndel, pa.int64()),
    })
    changes = pa.concat_tables([d_tab, ups, ins]).append_column(
        "__op", pa.array(
            ["D"] * ndel + ["U"] * (len(up_idx) + ins.num_rows),
            pa.string()))

    t1 = time.perf_counter()
    summary = incremental.run_incremental_update(
        img_dir, out_base, changes, run_id="night1", batch_size=2048)
    t_incr = round(time.perf_counter() - t1, 3)

    # honest comparator: full rerun over the SAME post-update images,
    # equally warm (it runs after the base run primed every worker)
    out_full = os.path.join(work, "out_full")
    t2 = time.perf_counter()
    flagship.run_flagship(
        img_dir, out_full, target_partitions=target_partitions,
        batch_size=2048, resume=False, run_id="full2")
    t_full = round(time.perf_counter() - t2, 3)

    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(warm_out, ignore_errors=True)
    return {
        "rows": n, "changes": changes.num_rows,
        "change_frac": change_frac,
        "partitions": summary["partitions"],
        "stale_partitions": len(summary["stale_partitions"]) + 1,
        "resumed_skipped": summary["resumed_skipped"],
        "rewritten_fragments": len(summary["rewritten_fragments"]),
        "base_sec": t_base, "incremental_sec": t_incr,
        "full_rerun_sec": t_full,
        "speedup_vs_full": round(t_full / t_incr, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--n", type=int, default=0, help="flagship fixture rows (0 = auto from sf)")
    ap.add_argument("--flagship-only", action="store_true")
    ap.add_argument("--queries-only", action="store_true")
    ap.add_argument("--corpus-only", action="store_true")
    ap.add_argument("--corpus-n", type=int, default=0)
    ap.add_argument("--changefile-bench", action="store_true")
    ap.add_argument("--change-frac", type=float, default=0.01)
    ap.add_argument("--scaling-corpus", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    # N vs 4N protocol levels. 4->16 keeps BOTH levels under the
    # sandbox VM's ~13GB/s memory-bandwidth ceiling (measured: the
    # image-decode stage scales 0.86 from 4->16 procs but collapses at
    # 32); on a real 4N-node cluster memory bandwidth scales with
    # nodes, so the single-box ceiling is a measurement artifact to
    # stay below, like the single disk.
    ap.add_argument("--scale-lo", type=int, default=4)
    ap.add_argument("--scale-hi", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--px-scale", type=int, default=0,
                    help="image-dimension multiplier for the flagship fixture "
                         "(0 = 1 in default mode, 4 in --scaling)")
    # defaults sized for the DRIVER-invoked per-round run: the round-2
    # flagship block was a series of ONE un-ramped run sitting on the
    # sandbox's ramp floor and not comparable round-over-round, so the
    # ramp + >=3-run min-of-series protocol is now the default path too
    ap.add_argument("--pre-seconds", type=float, default=45.0)
    ap.add_argument("--series", type=int, default=3)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    if args.scaling:
        report = scaling_mode(args)
        print(json.dumps(report))
        return
    if args.scaling_corpus:
        report = scaling_corpus_mode(args)
        print(json.dumps(report))
        return

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus, include_dashboard=False,
            ignore_reinit_error=True,
        )
    import ray.data

    # progress-bar rendering measurably serializes the driver when
    # several streaming executions run concurrently (measured 2x on the
    # flagship job) — benchmarks run without it
    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        sf = parse_sf(args.sf_dir)
        if args.changefile_bench:
            rep = run_changefile_bench(
                args.n or 1_200_000, args.cpus,
                pre_seconds=args.pre_seconds,
                change_frac=args.change_frac)
            block = (
                "## Incremental nightly loop (changefile bench)\n\n"
                f"`run_incremental_update` over a {rep['rows']}-row "
                f"flagship base run ({rep['partitions']} partitions, "
                "tmpfs), applying a "
                f"{rep['changes']}-row changefile (~"
                f"{round(rep['change_frac'] * 100, 1)}% of rows, "
                "contiguous key window + out-of-range inserts) vs a "
                "from-scratch full rerun over the same post-update "
                "images, equally warm:\n\n"
                "| metric | value |\n|---|---|\n"
                f"| touched (stale+spill) partitions | "
                f"{rep['stale_partitions']} / {rep['partitions']} |\n"
                f"| partitions skipped by resume | "
                f"{rep['resumed_skipped']} |\n"
                f"| fragments rewritten in place | "
                f"{rep['rewritten_fragments']} |\n"
                f"| incremental wall sec | {rep['incremental_sec']} |\n"
                f"| full-rerun wall sec | {rep['full_rerun_sec']} |\n"
                f"| **speedup vs full rerun** | "
                f"**{rep['speedup_vs_full']}x** |\n"
            )
            update_baseline_md(block, CHANGEFILE_MARK_BEGIN,
                               CHANGEFILE_MARK_END)
            line = {"metric": "changefile_incr_sec",
                    "value": rep["incremental_sec"], "unit": "sec",
                    "queries": {}, "sf": sf, "num_cpus": args.cpus,
                    "changefile": rep}
            out = json.dumps(line)
            print(out)
            if args.json_out:
                with open(args.json_out, "w") as f:
                    f.write(out)
            return
        if args.corpus_only:
            rep = run_corpus_bench(
                args.corpus_n or 480_000, args.cpus,
                pre_seconds=args.pre_seconds, series=args.series,
            )
            line = {"metric": "corpus_prep_sec", "value": rep["sec"],
                    "unit": "sec", "queries": {}, "sf": sf,
                    "num_cpus": args.cpus, "corpus": rep}
            out = json.dumps(line)
            print(out)
            if args.json_out:
                with open(args.json_out, "w") as f:
                    f.write(out)
            return
        n = args.n or fixture_rows(sf)
        t_all = time.perf_counter()
        flag = (
            None if args.queries_only
            else run_flagship_bench(n, args.cpus, px_scale=args.px_scale or 1,
                                    pre_seconds=args.pre_seconds,
                                    series=args.series)
        )
        qtimes, qrows = (
            ({}, {}) if args.flagship_only
            else run_queries_bench(
                args.sf_dir, cpus=args.cpus if args.queries_only else None
            )
        )
        total = round(time.perf_counter() - t_all, 3)
        line = {
            "metric": "flagship_plus_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": qtimes,
            "sf": sf,
            "num_cpus": args.cpus,
            "flagship": flag,
            "query_rows": qrows,
        }
        out = json.dumps(line)
        # Full detail goes to a file (and a non-final stdout line for
        # humans); the driver's stdout capture keeps only a ~3KB tail, so
        # the LAST line must be compact or the driver records
        # `parsed: null` (round 1 failure mode: the 139-query line was
        # ~5KB and its head fell off the tail buffer).
        with open(os.path.join(REPO, "bench_detail.json"), "w") as f:
            f.write(out)
        if args.json_out:
            with open(args.json_out, "w") as f:
                f.write(out)
        print(out)
        print(json.dumps(compact_line(line)))
    finally:
        ray.shutdown()


def compact_line(line: dict) -> dict:
    """Driver-parseable summary (< ~1.5KB): aggregate query stats, the
    slowest queries by name, flagship throughput, and the last measured
    scaling efficiency from BASELINE.md."""
    qtimes = line.get("queries") or {}
    top = dict(sorted(qtimes.items(), key=lambda kv: -kv[1])[:8])
    return {
        "metric": line["metric"],
        "value": line["value"],
        "unit": line["unit"],
        "queries": top,
        "queries_total_sec": round(sum(qtimes.values()), 3),
        "queries_count": len(qtimes),
        "sf": line.get("sf"),
        "num_cpus": line.get("num_cpus"),
        "flagship": line.get("flagship"),
        "scaling_efficiency": read_scaling_efficiency(),
        "detail": "bench_detail.json",
    }


def read_scaling_efficiency() -> float | None:
    """Last measured flagship scaling efficiency recorded between the
    BENCH markers in BASELINE.md by `--scaling` (None if absent)."""
    import re

    try:
        text = open(BASELINE_MD).read()
    except OSError:
        return None
    if MARK_BEGIN not in text:
        return None
    block = text.split(MARK_BEGIN, 1)[1].split(MARK_END, 1)[0]
    m = re.search(r"Scaling efficiency[^*]*\*\*([0-9.]+)\*\*", block)
    return float(m.group(1)) if m else None


if __name__ == "__main__":
    main()
