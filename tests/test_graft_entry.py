"""The driver's entry points must work no matter how they are invoked.

Round-1 regression (VERDICT.md "What's weak" #1): the driver imports
``__graft_entry__`` and calls ``dryrun_multichip`` directly in an
environment where ``JAX_PLATFORMS=axon`` (the TPU tunnel) and no
host-device-count flag is set. The function itself must force a CPU mesh
before any JAX backend initialization.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def test_dryrun_multichip_inprocess():
    # Direct call with jax already initialized on the 8-device CPU mesh
    # (conftest.py): should take the in-process path.
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_driverlike_env():
    # Exactly how the driver invokes it: fresh process, JAX_PLATFORMS=axon
    # exported, no xla_force_host_platform_device_count. The function must
    # never initialize the axon/TPU backend and must still pass.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "axon"
    parts = [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                      if p and p != REPO]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"rc={r.returncode}\n{r.stdout}\n{r.stderr}"
    assert "OK" in r.stdout


def test_dryrun_multichip_subprocess_fallback():
    # Asking for more devices than this (already-initialized) process has
    # must route through the clean-subprocess fallback and still pass.
    import __graft_entry__ as g

    g.dryrun_multichip(16)
