"""Subprocess worker for tests/test_distributed.py: joins a 2-process CPU
distributed runtime (4 virtual devices each -> 8 global), runs chain-sharded
sampling and cross-process parallel tempering, and writes process 0's global
results to a JSON file for the parent to compare against an unsharded run."""

import json
import os
import sys


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    outfile = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    import rrrmc_tpu as rt
    from rrrmc_tpu.parallel import distributed as dist
    from rrrmc_tpu.parallel.tempering import parallel_tempering

    dist.initialize(coordinator_address=f"127.0.0.1:{port}",
                    num_processes=2, process_id=proc_id)
    assert jax.process_count() == 2
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    # chain-sharded sampling across both processes
    mesh = dist.global_mesh()
    X = rt.GraphEA(4, 2, (-1, 1), seed=3)
    Es, st = dist.sample_distributed(rt.sweepMC, X, 1.5, 40, step=10,
                                     chains=16, mesh=mesh, seed=5,
                                     backend="xla")
    Es_g = dist.fetch_global(Es, mesh)
    E_g = dist.fetch_global(st.E, mesh)
    sig_g = dist.fetch_global(st.sigma, mesh)

    # parallel tempering with the temperature ladder sharded across processes
    mesh_t = dist.global_mesh({"temp": 8})
    betas = np.linspace(0.5, 2.0, 8)
    EsP, ranks, _ = parallel_tempering(X, betas, 6, sweeps_per_round=2,
                                       chains=4, seed=7, mesh=mesh_t,
                                       axis="temp")
    EsP_g = dist.fetch_global(EsP, mesh_t)
    ranks_g = dist.fetch_global(ranks, mesh_t)

    if proc_id == 0:
        with open(outfile, "w") as f:
            json.dump({"Es": np.asarray(Es_g).tolist(),
                       "E": np.asarray(E_g).tolist(),
                       "sigma": np.asarray(sig_g).tolist(),
                       "EsP": np.asarray(EsP_g).tolist(),
                       "ranks": np.asarray(ranks_g).tolist()}, f)


if __name__ == "__main__":
    main()
