"""Two-process DCN dry-run: exercise the multi-host path for real.

`parallel.mesh.init_distributed` (the multi-host/DCN layer, SURVEY.md §2.8)
cannot be tested on this single-chip rig with real hardware, so this script
stands up a REAL two-process `jax.distributed` cluster on CPU (2 local
virtual devices per process, 4 global) and runs one data-parallel training
step with the global batch split across the processes — gradient psum over
the process boundary included.  The parent then runs the identical step
single-process on a 4-device mesh and checks the losses agree.

  python scripts/dcn_dryrun.py            # parent: spawns workers, verifies

Driven by tests/test_dcn_dryrun.py.
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GLOBAL_BATCH = 16
SEQ = 40


def tiny_cfg():
    from tip_tpu.models.tip_model import ModelConfig
    from tip_tpu.train import train as train_lib
    model = ModelConfig(size_s=131, with_acc_sum=True, tf_in_dim=32,
                        tf_hid_size=64, n_heads=4, tf_layers=2,
                        rnn_hid_size=48)
    return train_lib.TrainConfig(model=model, batch_size=GLOBAL_BATCH,
                                 seed=7)


def global_batch(cfg):
    rng = np.random.default_rng(42)
    d_imu = 90
    x_imu = rng.normal(size=(GLOBAL_BATCH, SEQ, d_imu)).astype(np.float32)
    x_s = rng.normal(size=(GLOBAL_BATCH, SEQ, 131)).astype(np.float32) * 0.1
    y = rng.normal(size=(GLOBAL_BATCH, SEQ, 131)).astype(np.float32) * 0.1
    return x_imu, x_s, y


def run_step(mesh, local_slice):
    """One data-parallel step; returns the (replicated) loss as float."""
    import jax

    from tip_tpu.parallel import mesh as mesh_lib
    from tip_tpu.train import train as train_lib

    cfg = tiny_cfg()
    state = train_lib.init_state(cfg)
    state = train_lib.shard_state(state, mesh)
    step_fn = train_lib.make_train_step(cfg, mesh)

    bs = mesh_lib.batch_sharding(mesh)
    arrays = []
    for a in global_batch(cfg):
        if local_slice is None:
            arrays.append(jax.device_put(a, bs))
        else:
            arrays.append(jax.make_array_from_process_local_data(
                bs, a[local_slice], global_shape=a.shape))
    _, aux = step_fn(state, *arrays)
    # loss is fully replicated -> addressable from every process
    return float(np.asarray(jax.device_get(aux["loss"])))


def worker(process_id: int, num_processes: int, port: int):
    import jax
    # this rig's sitecustomize force-registers the tunneled TPU plugin and
    # overwrites jax_platforms even when the env var says cpu (CLAUDE.md);
    # the dry-run must run on the CPU backend to get per-process devices
    jax.config.update("jax_platforms", "cpu")

    from tip_tpu.parallel import mesh as mesh_lib

    mesh_lib.init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    mesh = mesh_lib.make_mesh()            # 4 global devices, data axis
    per = GLOBAL_BATCH // num_processes
    sl = slice(process_id * per, (process_id + 1) * per)
    loss = run_step(mesh, sl)
    print(json.dumps({"process_id": process_id, "loss": loss,
                      "n_devices": len(jax.devices()),
                      "n_local": len(jax.local_devices())}), flush=True)


def parent():
    # ephemeral coordinator port: concurrent/back-to-back runs must not
    # collide on a fixed bind
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--process_id", str(i),
         "--num_processes", "2", "--port", str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            print(err[-4000:], file=sys.stderr)
            raise SystemExit(f"worker failed rc={p.returncode}")
        rec = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
        outs.append(rec)

    assert all(o["n_devices"] == 4 and o["n_local"] == 2 for o in outs), outs
    losses = [o["loss"] for o in outs]
    assert abs(losses[0] - losses[1]) < 1e-6, losses

    # single-process reference on a 4-device mesh, same global batch
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    from tip_tpu.parallel import mesh as mesh_lib
    ref = run_step(mesh_lib.make_mesh(), None)

    rel = abs(losses[0] - ref) / max(abs(ref), 1e-9)
    result = {"ok": bool(rel < 1e-5), "two_process_loss": losses[0],
              "single_process_loss": ref, "rel_err": rel}
    print(json.dumps(result))
    if not result["ok"]:
        raise SystemExit("loss mismatch")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--port", type=int, default=52123)
    args = ap.parse_args()
    if args.process_id is None:
        parent()
    else:
        worker(args.process_id, args.num_processes, args.port)


if __name__ == "__main__":
    main()
