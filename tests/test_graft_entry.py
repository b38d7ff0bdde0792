"""Driver-contract tests for __graft_entry__.

The driver imports the module in a process whose JAX backend is already attached to
the real device(s) — NOT an 8-virtual-device CPU platform — and calls
``dryrun_multichip(8)``. Round 1 failed exactly here (MULTICHIP_r01.json: mesh 2x2x2
!= 1 devices), so this test reproduces the driver's invocation verbatim: a fresh
subprocess with no CPU-forcing env, importing the module and calling the function.
Since round 3 the dryrun drives the REAL entry point (train_titok.py --mesh dp,fsdp,tp
— VERDICT r2 task 1) in a virtual-device subprocess.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Env as the driver would have it: no virtual-device forcing."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    # Keep the child off any real TPU: tests must not contend for the single
    # tunneled chip. The subprocess re-exec only depends on env construction.
    env.setdefault("JAX_PLATFORM_NAME", "cpu")
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_dryrun_multichip_runs_the_entry_point_like_the_driver():
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_driver_env(), cwd=REPO,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dryrun_multichip OK" in proc.stdout, (proc.stdout, proc.stderr)
    assert "--mesh 2,2,2" in proc.stdout  # the script path, production shardings
