"""Multi-host runtime integration test: two spawned CPU processes (4 virtual
devices each) join a jax.distributed runtime, run chain-sharded sweepMC and
cross-process parallel tempering, and the results must be BIT-IDENTICAL to
the same run unsharded in this (single) process — chains are keyed by global
chain id, so sharding topology must not change any trajectory."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharding_bit_exact(tmp_path):
    port = _free_port()
    out = tmp_path / "dist_out.json"
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    logs = []
    for p in procs:
        so, se = p.communicate(timeout=540)
        logs.append((p.returncode, so.decode()[-2000:], se.decode()[-2000:]))
    assert all(rc == 0 for rc, _, _ in logs), logs
    got = json.loads(out.read_text())

    # reference: identical run, unsharded, in this process (8 virtual devs)
    import jax
    import rrrmc_tpu as rt
    from rrrmc_tpu.parallel.tempering import parallel_tempering

    X = rt.GraphEA(4, 2, (-1, 1), seed=3)
    Es, st = rt.sweepMC(X, 1.5, 40, step=10, chains=16, seed=5,
                        backend="xla")
    np.testing.assert_array_equal(np.asarray(got["Es"]), np.asarray(Es))
    np.testing.assert_array_equal(np.asarray(got["E"]), np.asarray(st.E))
    np.testing.assert_array_equal(np.asarray(got["sigma"]),
                                  np.asarray(st.sigma))

    betas = np.linspace(0.5, 2.0, 8)
    EsP, ranks, _ = parallel_tempering(X, betas, 6, sweeps_per_round=2,
                                       chains=4, seed=7)
    np.testing.assert_allclose(np.asarray(got["EsP"]), np.asarray(EsP),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(got["ranks"]),
                                  np.asarray(ranks))
