"""Driver-contract regression: __graft_entry__ must work in a FRESH process
with the default platform and no conftest — exactly how the driver invokes it
(round 1 failed precisely because only the test harness provisioned the
virtual mesh).
"""

import os
import subprocess
import sys

import pytest


def _fresh_env():
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # strip the harness's virtual-device forcing: the entry point must
    # self-provision (the driver does not set these)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f)
    return env


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    code = ("import __graft_entry__; "
            "__graft_entry__.dryrun_multichip(8); print('DRYRUN_OK')")
    proc = subprocess.run([sys.executable, "-c", code], env=_fresh_env(),
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRYRUN_OK" in proc.stdout


@pytest.mark.slow
def test_entry_compiles_and_runs():
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"  # keep the test off the TPU
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__, numpy as np\n"
        "fn, args = __graft_entry__.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert np.isfinite(np.asarray(out)).all()\n"
        "print('ENTRY_OK', out.shape)\n")
    proc = subprocess.run([sys.executable, "-c", code], env=_fresh_env(),
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ENTRY_OK" in proc.stdout
