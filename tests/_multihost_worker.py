"""One process of the 2-process multi-host training test.

Run as ``python _multihost_worker.py <process_id> <port> <out_json>`` with
``XLA_FLAGS=--xla_force_host_platform_device_count=2`` in the env: two
processes x 2 virtual CPU devices = a 4-device global mesh, the smallest
fabric that exercises cross-process gradient psum (gloo collectives) and
``make_array_from_process_local_data`` batch assembly.
"""

import json
import os
import sys


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))

    import jax

    # sitecustomize may have imported jax already (JAX_PLATFORMS=axon);
    # backends are lazy, so config.update still wins (see conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    # Per-cluster-run cache dir SHARED by both processes (out_path's dir is
    # the test's tmp_path): every process either compiles fresh or loads an
    # entry written by its peer THIS run. The global /tmp cache can hold
    # entries from older/incompatible producers (observed: machine-feature
    # mismatched AOT results), and a process that loads a stale executable
    # while its peer compiles fresh diverges in gloo collective-context
    # order — rendezvous deadlock.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(out_path)),
                             "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from phnet_tpu.parallel import (
        global_batch, initialize, is_multihost, make_mesh,
    )
    from phnet_tpu.parallel.multihost import (
        barrier, global_key, replicate_tree, warm_collectives,
    )

    initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert is_multihost(), jax.process_count()
    assert jax.process_count() == 2
    assert jax.local_device_count() == 2
    assert jax.device_count() == 4

    import numpy as np

    from test_train import setup_training, tiny_cfg

    # Compile choreography: the train-step compile is minutes-scale on
    # XLA:CPU, so process 1 parks at a coordination barrier while process
    # 0 compiles EVERYTHING and populates the shared per-run cache; it
    # then compiles from that cache (seconds). This both bounds the test's
    # wall time (one fresh compile, not two racing ones) and guarantees
    # the two processes execute byte-identical executables — a process
    # that loads a cached executable while its peer compiles fresh can
    # diverge in gloo collective-context order, which deadlocks the
    # 30 s rendezvous. Everything up to (and excluding) warm_collectives
    # is process-local: jit compiles, make_array_from_* assembly — no
    # collective executes before both processes pass the barrier.
    if pid != 0:
        barrier("phnet-cache-warm", timeout_s=1500)

    cfg = tiny_cfg()
    # setup_training is deterministic: both processes build the identical
    # GLOBAL batch and initial params; each contributes rows [2p, 2p+2)
    model, state, step, frames, labels = setup_training(cfg, b=4, t=2, seed=3)

    mesh = make_mesh(4, model_parallel=1)
    state = state.replace(
        params=replicate_tree(mesh, state.params),
        batch_stats=replicate_tree(mesh, state.batch_stats),
        opt_state=replicate_tree(mesh, state.opt_state),
    )
    local_f = np.asarray(frames)[2 * pid : 2 * pid + 2]
    local_l = np.asarray(labels)[2 * pid : 2 * pid + 2]
    gf = global_batch(mesh, local_f)
    gl = global_batch(mesh, local_l)
    assert gf.shape == (4, 2, cfg.img_h, cfg.img_w, 3), gf.shape

    # keep the AOT executable: lower().compile() does not populate the jit
    # dispatch cache, so calling the jit wrapper later would re-trace and
    # re-load from the persistent cache AFTER the alignment point
    rng0 = global_key(mesh, jax.random.key(0))
    jstep = jax.jit(step).lower(state, gf, gl, rng0).compile()

    if pid == 0:
        barrier("phnet-cache-warm", timeout_s=1500)
    # first collective ever: establish the gloo contexts in lockstep
    # (warm_collectives compiles, re-aligns at its own barrier, executes)
    warm_collectives(mesh)
    barrier("phnet-test-compiled")
    losses = []
    for i in range(2):
        rng = global_key(mesh, jax.random.key(i))
        state, metrics = jstep(state, gf, gl, rng)
        losses.append(float(metrics["loss"]))

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "losses": losses}, f)
    print(f"proc {pid} done: {losses}", flush=True)


if __name__ == "__main__":
    main()
