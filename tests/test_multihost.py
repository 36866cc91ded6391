"""Multi-host data-parallel coverage (VERDICT r1 weak #4).

Two layers:
  * pure unit tests of the per-process slicing math (process_local_slice),
  * a real 2-process jax.distributed CPU integration test (gloo collectives,
    4 virtual devices per process = 8 global) exercising shard_batch's
    make_array_from_process_local_data branch and psum'd metrics end to end.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tinyedm_tpu.parallel.mesh import process_local_slice

REPO = Path(__file__).resolve().parents[1]


class TestProcessLocalSlice:
    def test_disjoint_cover_in_order(self):
        x = np.arange(24).reshape(12, 2)
        parts = [process_local_slice(x, i, 4) for i in range(4)]
        assert all(p.shape == (3, 2) for p in parts)
        np.testing.assert_array_equal(np.concatenate(parts), x)

    def test_matches_manual_slice(self):
        x = np.arange(16)
        np.testing.assert_array_equal(process_local_slice(x, 1, 2), x[8:])
        np.testing.assert_array_equal(process_local_slice(x, 0, 2), x[:8])

    def test_indivisible_raises(self):
        with pytest.raises(ValueError, match="not divisible"):
            process_local_slice(np.arange(10), 0, 3)

    def test_single_process_identity(self):
        x = np.arange(6)
        np.testing.assert_array_equal(process_local_slice(x, 0, 1), x)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_cpu():
    """Spin up 2 real processes under jax.distributed and run the shard_batch
    + psum-metric path (tests/_multihost_worker.py)."""
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_multihost_worker.py"), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # compile-heavy workers take ~200 s on an IDLE box; a shared/
            # loaded machine (parallel suites, background compiles) pushed
            # a 300 s bound into flaky-timeout territory
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK process={i}" in out
