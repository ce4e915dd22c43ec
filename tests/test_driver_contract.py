"""Driver-contract tests: bare-subprocess invocations, no conftest env.

Round 1 shipped a dryrun_multichip that was green under the test suite's
conftest (which pre-sets XLA_FLAGS/JAX_PLATFORMS) but red when the driver
invoked it in a bare process (MULTICHIP_r01.json rc=1). These tests exercise
the *driver's* exact call pattern: a fresh subprocess with the conftest's
JAX environment variables stripped, so self-provisioning of the virtual CPU
mesh is actually required to pass.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bare_env():
    """The ambient environment as the driver sees it: without the JAX
    platform overrides tests/conftest.py injected into this process."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    return env


def _run(args, timeout=900):
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, env=_bare_env(),
        capture_output=True, text=True, timeout=timeout)


def test_dryrun_multichip_driver_invocation():
    """Exactly the driver's call: bare python -c, 8 virtual devices."""
    r = _run(["-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"])
    assert r.returncode == 0, f"stderr:\n{r.stderr[-4000:]}"
    assert "dryrun_multichip(8): OK" in r.stdout


def test_graft_entry_main():
    r = _run(["__graft_entry__.py"])
    assert r.returncode == 0, f"stderr:\n{r.stderr[-4000:]}"
    assert "entry: compiled" in r.stdout


def test_ici_scaling_bench_smoke():
    """The multi-chip scaling harness (scripts/ici_scaling_bench.py) runs
    its full measurement loop — per-mesh-size trainers, sharded renders,
    interleaved windows — on the self-provisioned virtual CPU mesh."""
    r = _run(["scripts/ici_scaling_bench.py", "--smoke"])
    assert r.returncode == 0, f"stderr:\n{r.stderr[-4000:]}"
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    summary = json.loads(lines[-1])
    assert summary["summary"] == "ici_scaling"
    assert summary["mesh_sizes"] == [1, 2, 4, 8]
    rows = [json.loads(ln) for ln in lines[:-1]]
    assert [row["mesh"] for row in rows] == [1, 2, 4, 8]
    for row in rows:
        assert row["train_rays_per_sec"] > 0
        assert row["render_frame_ms"] > 0
        assert row["weak_scaling_eff"] > 0


def test_bench_smoke():
    r = _run(["bench.py", "--smoke"])
    assert r.returncode == 0, f"stderr:\n{r.stderr[-4000:]}"
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "train_rays_per_sec_per_chip_lego_workload"
    assert out["value"] > 0
    assert out["smoke"] is True
    for key in ("unit", "vs_baseline", "render_rays_per_sec_per_chip",
                "train_step_ms", "final_loss"):
        assert key in out
