"""utils/profiling: trace capture, annotations, dispatch counters."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_trace_captures_annotated_region(tmp_path):
    from rrrmc_tpu.utils.profiling import annotate, trace

    logdir = str(tmp_path / "tr")
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    with trace(logdir):
        with annotate("hot_region"):
            np.asarray(f(x))
    # TensorBoard/XProf artifacts must exist
    found = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert found, os.listdir(logdir)


def test_dispatch_counters():
    from rrrmc_tpu.utils.profiling import DispatchCounters

    pc = DispatchCounters()
    f = jax.jit(lambda x: x * 2)
    x = jnp.arange(8.0)
    out = pc.timed("double", f, x)
    np.testing.assert_allclose(np.asarray(out), np.arange(8.0) * 2)
    pc.tick("double", 2)
    with pc.measure("region", sync_value=out):
        _ = f(out)
    s = pc.summary()
    assert s["double"]["count"] == 3 and s["double"]["synced"] == 1
    assert s["region"]["count"] == 1 and s["region"]["wall_s"] >= 0.0
    pc.reset()
    assert pc.summary() == {}


def test_runtest_profile_dir(tmp_path):
    import rrrmc_tpu as rt
    from rrrmc_tpu.experiments import runtest

    X = rt.GraphRRG(64, 3, (-1, 1), seed=3)
    logdir = str(tmp_path / "prof")
    r = runtest(rt.standardMC, X, 1.0, 200, chains=8, profile_dir=logdir)
    assert r["flips_per_s"] > 0
    assert glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True)
