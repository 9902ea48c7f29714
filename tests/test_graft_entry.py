"""The driver only ever runs ``__graft_entry__.entry`` and
``__graft_entry__.dryrun_multichip`` — exercise BOTH in fresh subprocesses
with a driver-like environment (round-1 shipped a red MULTICHIP_r01.json
precisely because nothing in the suite invoked them)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # Simulate the driver: no CPU-forcing test vars. Only keep the relay
    # disabled so the test never dials TPU hardware.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900,
    )


def test_dryrun_multichip_8():
    """dryrun_multichip must self-provision 8 virtual devices and exit 0."""
    proc = _run(
        "import sys; sys.path.insert(0, '.')\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "[dryrun] train_step ok" in proc.stdout, proc.stdout
    assert "[dryrun] dp stereo render ok" in proc.stdout, proc.stdout


def test_entry_compiles():
    """entry() must return (jittable fn, example args) that compile + run."""
    proc = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.path.insert(0, '.')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "out.block_until_ready()\n"
        "print('[entry] ok', out.shape, out.dtype)\n"
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "[entry] ok" in proc.stdout, proc.stdout
