"""bench.py's driver contract: stdout's LAST line always parses as JSON.

Round 3's benchmark result was lost because a fast backend-init failure
(`Unable to initialize backend 'axon': UNAVAILABLE`) escaped bench.py as a
raw traceback — the driver recorded rc=1 / parsed:null and the round had no
perf number.  These tests run bench.py as the driver does (a subprocess,
reading stdout) and pin the three terminal behaviors:

  * backend never comes up  → retry loop exhausts its budget, honest error
    JSON, non-zero rc;
  * the measurement itself raises → honest error JSON from the child;
  * backend up → the real headline JSON with no "error" key (tiny CPU run).
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def _run_bench(env_overrides, timeout):
    env = dict(os.environ)
    env.update(env_overrides)
    r = subprocess.run([sys.executable, BENCH], env=env, text=True,
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                       timeout=timeout)
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines, f"no stdout at all; stderr tail: {r.stderr[-500:]}"
    return r.returncode, lines[-1], r.stderr


def test_poisoned_platform_retries_then_emits_honest_json():
    """A backend that can never initialize (the BENCH_r03 failure mode) must
    produce a parseable error line after bounded retries, not a traceback."""
    rc, last, err = _run_bench({
        "MDRT_BENCH_PLATFORM": "bogus9",
        "MDRT_BENCH_WATCHDOG_S": "25",
        "MDRT_BENCH_MIN_RUN_S": "5",
        "MDRT_BENCH_RETRY_BACKOFF_S": "1",
        "MDRT_BENCH_PROBE_TIMEOUT_S": "20",
    }, timeout=180)
    parsed = json.loads(last)
    assert rc != 0
    assert parsed["value"] == 0.0
    assert "error" in parsed
    assert parsed["attempts"] >= 2, "orchestrator must have retried"
    assert "retrying" in err, "backoff loop should narrate to stderr"


def test_child_exception_emits_honest_json():
    """Any exception inside the measurement must still end in the JSON
    contract line (child mode, exercised via the poison hook)."""
    rc, last, _ = _run_bench({
        "MDRT_BENCH_CHILD": "1",
        "MDRT_BENCH_POISON": "1",
        "MDRT_BENCH_PLATFORM": "cpu",
    }, timeout=180)
    parsed = json.loads(last)
    assert rc == 1
    assert parsed["value"] == 0.0
    assert "poisoned" in parsed["error"]


@pytest.mark.slow
def test_orchestrator_success_path_tiny_cpu(tmp_path):
    """Probe → child → headline JSON with no error key, on a 4k-doc CPU
    run of the real pipeline (~40s incl. compile).  Also pins the
    persistent-compile-cache wiring: the run must populate the cache dir
    (the driver's end-of-round TPU run relies on a warm cache to dodge the
    ~5-min remote-compile window that lost round 3's number)."""
    cache = tmp_path / "compile_cache"
    rc, last, _ = _run_bench({
        "MDRT_BENCH_PLATFORM": "cpu",
        "MDRT_BENCH_N": "4096",
        "MDRT_BENCH_BATCH": "8",
        "MDRT_BENCH_REPS": "2",
        "MDRT_BENCH_LAYERS": "2",
        "MDRT_BENCH_FAST": "1",
        "MDRT_BENCH_MIN_RUN_S": "5",
        "MDRT_BENCH_WATCHDOG_S": "900",
        "MDRT_BENCH_COMPILE_CACHE": str(cache),
    }, timeout=600)
    parsed = json.loads(last)
    assert rc == 0
    assert "error" not in parsed
    assert parsed["value"] > 0
    assert parsed["metric"] == "2hop_beam_search_queries_per_sec"
    assert cache.exists() and any(cache.iterdir()), \
        "persistent compile cache was not populated"


def test_midrun_backend_death_is_retried():
    """A child that dies with a backend-down error (tunnel flake AFTER the
    probe passed) must be retried with backoff, and budget exhaustion must
    still end in the honest JSON line."""
    rc, last, err = _run_bench({
        "MDRT_BENCH_PLATFORM": "cpu",       # probes succeed
        "MDRT_BENCH_POISON": "backend",     # child dies with UNAVAILABLE
        "MDRT_BENCH_WATCHDOG_S": "45",
        "MDRT_BENCH_MIN_RUN_S": "5",
        "MDRT_BENCH_RETRY_BACKOFF_S": "1",
        "MDRT_BENCH_PROBE_TIMEOUT_S": "30",
    }, timeout=240)
    parsed = json.loads(last)
    assert rc != 0
    assert parsed["value"] == 0.0
    assert "UNAVAILABLE" in parsed["error"]
    assert err.count("will retry") >= 2, "child was not retried"


@pytest.mark.slow
def test_beam4_prune_auto_emits_both_operating_points(tmp_path):
    """MDRT_BENCH_B4_PRUNE=auto must record BOTH margins the 65k quality
    sweep measured (docs/prune_sweep_r5.json): the median hop-1 gap
    (max throughput) as beam4_pruned_qps and the p90 gap (quality-neutral)
    as beam4_pruned_p90_qps, each with its margin, alongside the unpruned
    cross-round-comparable beam4_qps."""
    rc, last, _ = _run_bench({
        "MDRT_BENCH_CHILD": "1",            # skip orchestrator probe loop
        "MDRT_BENCH_PLATFORM": "cpu",
        "MDRT_BENCH_N": "4096",
        "MDRT_BENCH_BATCH": "8",
        "MDRT_BENCH_REPS": "2",
        "MDRT_BENCH_LAYERS": "2",
        "MDRT_BENCH_MIN_RUN_S": "5",
        "MDRT_BENCH_B4_PRUNE": "auto",
        # every extra except beam4 off: keeps this a ~2-min test
        "MDRT_BENCH_LATENCY": "0", "MDRT_BENCH_BF16": "0",
        "MDRT_BENCH_PCA": "0", "MDRT_BENCH_READER": "0",
        "MDRT_BENCH_E2E": "0", "MDRT_BENCH_HNSW": "0",
        "MDRT_BENCH_TRAIN": "0", "MDRT_BENCH_QA_TRAIN": "0",
        "MDRT_BENCH_UNIFIED": "0",
        "MDRT_BENCH_COMPILE_CACHE": str(tmp_path / "cc"),
    }, timeout=600)
    parsed = json.loads(last)
    assert rc == 0 and "error" not in parsed
    assert parsed["beam4_qps"] > 0
    assert parsed["beam4_pruned_qps"] > 0
    assert parsed["beam4_pruned_p90_qps"] > 0
    # p90 prunes a superset margin: margin_p90 >= margin_median > 0
    assert (parsed["beam4_prune_p90_margin"]
            >= parsed["beam4_prune_margin"] > 0)


@pytest.mark.slow
def test_extras_deadline_skips_stages_but_keeps_headline(tmp_path):
    """When the extras deadline has already passed (here: a margin larger
    than the watchdog budget), every optional stage must be SKIPPED — the
    run still completes with a real headline and lists what it dropped,
    instead of the watchdog discarding everything (bench.py::_stage_ok)."""
    rc, last, _ = _run_bench({
        "MDRT_BENCH_PLATFORM": "cpu",
        "MDRT_BENCH_N": "4096",
        "MDRT_BENCH_BATCH": "8",
        "MDRT_BENCH_REPS": "2",
        "MDRT_BENCH_LAYERS": "2",
        "MDRT_BENCH_MIN_RUN_S": "5",
        "MDRT_BENCH_WATCHDOG_S": "900",
        "MDRT_BENCH_EXTRAS_MARGIN_S": "100000",
        "MDRT_BENCH_COMPILE_CACHE": str(tmp_path / "cc"),
    }, timeout=600)
    parsed = json.loads(last)
    assert rc == 0
    assert "error" not in parsed
    assert parsed["value"] > 0
    skipped = set(parsed["skipped_for_time"])
    assert {"bf16", "beam4", "latency", "end2end", "train",
            "qa_train", "reader", "hnsw"} <= skipped
