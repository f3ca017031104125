"""The benchmark harness must refuse to publish implausible measurements.

Round 2's driver artifact recorded 16e9 frames/sec because a non-positive
lax.scan slope (the relay content-cache failure mode) was silently clamped
to 1 ns and published.  These tests pin the hardened contract (VERDICT r2
item 1): a poisoned slope makes bench.py exit non-zero with NO JSON line,
and an honest run emits exactly one well-formed JSON line.  The analogous
floor in the reference is the pass/fail square test
(/root/reference/tests/square_test.py:54-57).
"""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]

TINY_CONFIG = {
    "DIRT_BENCH_BATCH": "2",
    "DIRT_BENCH_RES": "32",
    "DIRT_BENCH_SEGMENTS": "4",
    "DIRT_BENCH_ITERS": "2",
}


def run_bench(extra_env):
    env = dict(os.environ)
    env.update(TINY_CONFIG)
    env.update(extra_env)
    # Hermetic CPU run: skip the TPU-relay handshake, force the cpu platform,
    # reuse the CPU compile cache (never the TPU one).
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/dirt_tpu_jax_cache_cpu"
    env.pop("DIRT_BENCH_POISON_SLOPE", None)
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)


def json_lines(stdout):
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_poisoned_slope_exits_nonzero_with_no_number():
    result = run_bench({"DIRT_BENCH_POISON_SLOPE": "1"})
    assert result.returncode != 0, (
        f"poisoned slope must fail the run\nstdout:\n{result.stdout}\n"
        f"stderr:\n{result.stderr}")
    assert not json_lines(result.stdout), (
        f"no JSON measurement may be published on failure:\n{result.stdout}")
    assert "MEASUREMENT FAILURE" in result.stderr


def test_honest_run_emits_one_json_line():
    # Generous spread limit: host-CPU timing jitter at the tiny config is
    # not the relay drift the limit polices; the schema is what's pinned.
    result = run_bench({"DIRT_BENCH_SPREAD_LIMIT": "500"})
    assert result.returncode == 0, (
        f"rc={result.returncode}\nstdout:\n{result.stdout}\n"
        f"stderr:\n{result.stderr}")
    lines = json_lines(result.stdout)
    assert len(lines) == 1, result.stdout
    record = lines[0]
    assert set(record) == {"metric", "value", "unit", "vs_baseline",
                           "spread_pct"}
    assert record["unit"] == "frames/sec/chip"
    assert 0 < record["value"] < 1e6
    assert 0 <= record["spread_pct"]
    # The parity gate must have run (it is no longer opt-in).
    assert "# parity vs native oracle: OK" in result.stdout


def test_drift_swamped_spread_exits_nonzero_with_no_number():
    # A spread limit below any real measurement's spread forces the
    # re-measure-then-fail path: the drift guard must refuse to publish.
    result = run_bench({"DIRT_BENCH_SPREAD_LIMIT": "1e-9"})
    assert result.returncode != 0, (
        f"drift-swamped spread must fail the run\nstdout:\n{result.stdout}\n"
        f"stderr:\n{result.stderr}")
    assert not json_lines(result.stdout), (
        f"no JSON measurement may be published on failure:\n{result.stdout}")
    assert "MEASUREMENT FAILURE" in result.stderr
    assert "re-measuring the full set" in result.stderr
