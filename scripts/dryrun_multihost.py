"""Two-process CPU multihost dryrun.

Certifies the multi-host story end to end (reference analogue:
detectron2.engine.launch over torch.distributed,
train_effocr_localizer_d2.py:258-265): each process calls
``initialize_multihost`` with an explicit coordinator (the analogue of
launch()'s dist_url/machine_rank), builds the GLOBAL mesh spanning both
processes' devices, and runs one pjit recognizer train step with the batch
sharded over the cross-process data axis.  Parameter updates involve a
gradient all-reduce across processes; both processes print a digest of
their (addressable) updated params, and the parent asserts the digests
match — the DDP "replicas stay in sync" invariant.

Usage (parent spawns the workers):
    python scripts/dryrun_multihost.py
Worker mode (spawned internally):
    python scripts/dryrun_multihost.py --worker <rank> --port <port>
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
LOCAL_DEVICES = 4  # per process -> 8-device global mesh


def worker(rank: int, port: int) -> None:
    # force the CPU backend with LOCAL_DEVICES local devices BEFORE jax init
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()

    import jax

    # explicit-argument path of initialize_multihost (core/distributed.py):
    # the single-host env heuristics must NOT swallow an explicit request
    from effocr_tpu.core.distributed import initialize_multihost, is_primary

    initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=N_PROC,
        process_id=rank,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.process_index() == rank, (jax.process_index(), rank)
    assert is_primary() == (rank == 0)

    import jax.numpy as jnp
    import numpy as np

    from effocr_tpu.core.config import EncoderConfig, RecognizerTrainConfig
    from effocr_tpu.core.distributed import global_mesh
    from effocr_tpu.core.mesh import DATA_AXIS
    from effocr_tpu.models import create_encoder
    from effocr_tpu.train.recognizer import RecognizerTrainer

    mesh = global_mesh()
    assert mesh.shape[DATA_AXIS] == N_PROC * LOCAL_DEVICES, mesh.shape

    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch="mobilenetv3_small_050", image_size=32),
        batch_size=16,
        lang="en",
        aux_ce_weight=0.0,
        no_aug=True,
    )
    model = create_encoder(cfg.encoder.arch)
    run_dir = os.path.join("/tmp", f"dryrun_multihost_r{rank}")
    trainer = RecognizerTrainer(cfg, model, run_dir, mesh=mesh)
    trainer.init_state(jax.random.PRNGKey(0))

    # one global batch: every process constructs the SAME global arrays and
    # jax.make_array_from_process_local_data shards each process's slice
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (16, 32, 32, 3), np.uint8)
    targets = (np.arange(16) % 4).astype(np.int32)
    paired = np.zeros((16,), bool)

    data = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    per = 16 // N_PROC
    lo = rank * per
    gbatch = [
        jax.make_array_from_process_local_data(
            data, np.ascontiguousarray(a[lo : lo + per]), a.shape
        )
        for a in (imgs, targets, paired)
    ]
    key = jax.device_put(jax.random.PRNGKey(7), repl)
    state, loss = trainer._step_fn(trainer.state, *gbatch, key)

    # digest over this process's addressable shards of the updated params —
    # params are replicated, so both processes must print the same value
    leaves = jax.tree_util.tree_leaves(state["params"])
    digest = 0.0
    for leaf in leaves:
        shard = leaf.addressable_shards[0].data
        digest += float(jnp.sum(jnp.abs(shard.astype(jnp.float32))))
    print(f"DRYRUN_DIGEST rank={rank} digest={digest:.6f} "
          f"loss={float(loss):.6f}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=37551)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.port)
        return

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the axon plugin would grab the TPU in both processes; force CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(r),
             "--port", str(args.port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for r in range(N_PROC)
    ]
    outs = []
    ok = True
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        if p.returncode != 0:
            ok = False
            print(f"--- rank {r} FAILED (rc={p.returncode}):\n{out}")
    if not ok:
        sys.exit(1)
    digests = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("DRYRUN_DIGEST"):
                digests.append(line.split("digest=")[1])
    print("\n".join(
        line for out in outs for line in out.splitlines()
        if line.startswith("DRYRUN_DIGEST")
    ))
    assert len(digests) == N_PROC, f"missing digests: {outs}"
    assert digests[0] == digests[1], f"param divergence: {digests}"
    print("dryrun_multihost OK: 2 processes, 8-device global mesh, "
          "params in sync after one sharded train step")


if __name__ == "__main__":
    main()
