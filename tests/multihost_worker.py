"""Worker process for the multi-host tests (tests/test_multihost.py).

Each worker is one "host" of a 2-process jax.distributed job: 4 local
virtual CPU devices, gloo cross-process collectives, a global 8-device
("data","model") mesh. This exercises the real multi-host code path —
`distributed_initialize` (the reference's init_process_group analogue,
src/utils/misc.py:390-415) plus GSPMD collectives that cross the process
boundary (the DCN stand-in) — without TPU pod hardware.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <mode>
       [local_devices]
Modes:
  psum — device_put a data-sharded global array, jit a sum (allreduce
         across processes), print RESULT <value>; then host_gather the
         sharded array (process_allgather) and print GATHER <sum> — the
         epoch-end metrics path over cross-process predictions.
  ssl  — run ONE full SSL train step (dual ResNet-18, fused aug, 3-way
         NT-Xent, AdamW) on a global batch sharded over both processes,
         print RESULT <loss>; then re-run the SAME compiled step from a
         copy of the initial state on a batch assembled by the
         process-sharded feed (sm3x.data.multihost.ProcessShardedData —
         each process gathers only its own rows), print SHARD <loss>.
         Feed parity requires RESULT == SHARD.
  mlc  — run a FULL DeepCluster epoch (init_memory -> per-head k-means ->
         train steps -> bank slot updates; reference
         tools/mlc_train.py:198-285) through the real MLCTrainer, then
         print RESULT <loss>, BANKHASH/PROTOHASH/ASSIGNHASH <sha256> of
         the final bank / prototype kernels / epoch-boundary assignments.
         Run once with 2 processes and once with 1 process on the same
         global device count: equal hashes prove the replicated k-means
         determinism claim (sm3x/ops/kmeans.py) across the process
         boundary — no rank-0 gather/broadcast needed (the reference's
         dist.gather/broadcast at tools/mlc_train.py:137-186).

`local_devices` (default 4) sets the per-process virtual CPU device
count, so a 1-process x 8-device run builds the SAME global mesh as a
2-process x 4-device run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-process FRESH compile cache: with the shared persistent cache one
# process can load the big train step as an AOT artifact in milliseconds
# while the other compiles for minutes — the early process then times out
# gloo context initialization (30s handshake deadline) waiting for the
# late one. Equal (empty) caches keep compile skew well under the window.
os.environ["SM3X_COMPILATION_CACHE"] = f"/tmp/sm3x_mh_cache_{os.getpid()}"

LOCAL_DEVICES = int(sys.argv[5]) if len(sys.argv) > 5 else 4

import jax

# Order matters: platform + device count + collectives impl must be set
# before the backend is created (sitecustomize pre-imports jax, so env
# vars are too late on this machine — config.update still works).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, nprocs, port, mode = (int(sys.argv[1]), int(sys.argv[2]),
                               int(sys.argv[3]), sys.argv[4])
    from sm3x.parallel import distributed_initialize

    distributed_initialize(f"127.0.0.1:{port}" if nprocs > 1 else None,
                           nprocs, pid)
    assert jax.process_count() == nprocs
    assert jax.device_count() == LOCAL_DEVICES * nprocs
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import numpy as np

    from sm3x.core.mesh import make_mesh, shard_batch

    mesh = make_mesh()  # global mesh over every device of every process

    if mode == "psum":
        import jax.numpy as jnp

        n = jax.device_count()
        # identical host value on every process; device_put places each
        # process's addressable shards
        x = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
        arr = shard_batch(mesh, {"x": x})["x"]
        out = jax.jit(lambda a: a.sum())(arr)  # cross-process allreduce
        print(f"RESULT {float(out):.6f}", flush=True)

        # host_gather: every process reconstructs the FULL array from its
        # addressable shards (the multi-host eval-metrics path)
        from sm3x.parallel import host_gather

        full = host_gather(arr)
        assert full.shape == x.shape, full.shape
        assert (full == x).all()
        print(f"GATHER {float(full.sum()):.6f}", flush=True)

        # the MLC init_memory layout: (H, B, D) sharded on dim 1 (the
        # embed output's batch axis) — host_gather must rebuild the full
        # bank rows on every process (sm3x/train/mlc_train.py)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sa = np.arange(2 * n * 3, dtype=np.float32).reshape(2, n, 3)
        arr2 = jax.device_put(sa, NamedSharding(mesh, P(None, "data")))
        full2 = host_gather(arr2)
        assert full2.shape == sa.shape, full2.shape
        assert (full2 == sa).all()
        print(f"BANK {float(full2.sum()):.6f}", flush=True)
        return

    if mode == "ssl":
        from sm3x.core import prng
        from sm3x.core.config import (SSLConfig, DataConfig, ModelConfig,
                                      OptimConfig, RunConfig)
        from sm3x.data.synthetic import synthetic_canvas_batch
        from sm3x.train.backbone_train import SSLTrainer

        batch = 16
        cfg = SSLConfig(
            data=DataConfig(img_sz=(32, 32)),
            model=ModelConfig(arch="resnet18", arch_version="v32",
                              proj_dim=16, temperature=0.1),
            optim=OptimConfig(epochs=1, batch_size=batch, base_lr=1e-3,
                              amp=False),
            run=RunConfig(log_path=f"/tmp/sm3x_mh_{pid}", seed=0),
        )
        trainer = SSLTrainer(cfg, mesh=mesh)
        canvases, hw, _ = synthetic_canvas_batch(batch, canvas=64, seed=0)
        db = shard_batch(mesh, {"derm": canvases, "derm_hw": hw,
                                "clinic": canvases, "clinic_hw": hw})
        rng = prng.step_rng(trainer.rng, 0, 0)
        # AOT-compile, then rendezvous before dispatch: execution is what
        # initializes the gloo cliques, so both processes must reach it
        # within the handshake deadline
        compiled = trainer.train_step.lower(
            trainer.state, db["derm"], db["derm_hw"],
            db["clinic"], db["clinic_hw"], rng).compile()
        from jax.experimental import multihost_utils

        # keep a copy of the initial state: the compiled step donates its
        # state argument, and the SHARD leg below must start identically
        import jax.numpy as jnp

        state0 = jax.tree.map(jnp.copy, trainer.state)
        multihost_utils.sync_global_devices("sm3x_mh_compiled")
        trainer.state, metrics = compiled(
            trainer.state, db["derm"], db["derm_hw"],
            db["clinic"], db["clinic_hw"], rng)
        # the loss is replicated after the GSPMD psum: every process reads
        # the same scalar
        print(f"RESULT {float(metrics['loss']):.6f}", flush=True)

        # feed parity: the process-sharded feed (each host assembles only
        # its addressable rows) must reproduce the same step loss
        from types import SimpleNamespace

        from sm3x.data.multihost import ProcessShardedData

        host = SimpleNamespace(
            derm=SimpleNamespace(canvases=canvases, valid_hw=hw),
            clinic=SimpleNamespace(canvases=canvases, valid_hw=hw),
            labels=np.zeros((batch, 8), np.int32), n=batch,
            meta_codes=None, meta_vocab_sizes=None,
            epoch_order=lambda epoch, seed=3407, shuffle=True: np.arange(batch),
            steps_per_epoch=lambda b: 1)
        psd = ProcessShardedData(host, mesh)
        b0 = next(iter(psd.batches(batch, epoch=0, shuffle=False)))
        _, metrics2 = compiled(state0, b0.derm, b0.derm_hw,
                               b0.clinic, b0.clinic_hw, rng)
        print(f"SHARD {float(metrics2['loss']):.6f}", flush=True)
        return

    if mode == "mlc":
        import hashlib
        from types import SimpleNamespace

        import jax.numpy as jnp

        from sm3x.core import prng
        from sm3x.core.config import (MLCTrainConfig, DataConfig, ModelConfig,
                                      OptimConfig, RunConfig)
        from sm3x.data.pipeline import PairedImageData
        from sm3x.data.synthetic import synthetic_canvas_batch
        from sm3x.train.mlc_train import MLCTrainer, cluster_and_update

        def sha(x):
            return hashlib.sha256(
                np.ascontiguousarray(np.asarray(x)).tobytes()).hexdigest()

        # host-identical synthetic dataset on every process; the trainer's
        # internal shard_batch turns each host copy into the global
        # batch-sharded array (same convention as the psum/ssl modes)
        n, canvas, batch = 16, 64, 8
        derm_c, derm_hw, labels = synthetic_canvas_batch(n, canvas, seed=0)
        clin_c, clin_hw, _ = synthetic_canvas_batch(n, canvas, seed=1)
        data = PairedImageData.__new__(PairedImageData)
        data.derm = SimpleNamespace(canvases=derm_c, valid_hw=derm_hw)
        data.clinic = SimpleNamespace(canvases=clin_c, valid_hw=clin_hw)
        data.labels = labels
        data.n = n
        data.meta_codes = None
        data.meta_vocab_sizes = None

        cfg = MLCTrainConfig(
            data=DataConfig(img_sz=(32, 32)),
            model=ModelConfig(arch="resnet18", mlc_proj="v4",
                              mlc_proj_dim=16, num_heads=1, sa_dim_ff=16,
                              sa_dropout=0.0, temperature=1.0),
            optim=OptimConfig(epochs=1, batch_size=batch, base_lr=1e-3,
                              amp=False),
            run=RunConfig(log_path=f"/tmp/sm3x_mh_mlc_{pid}", seed=0,
                          save_freq=100),
            kmeans_iters=3,
        )
        trainer = MLCTrainer(cfg, mesh=mesh)
        trainer.init_memory(data)

        # the exact assignments train_epoch(0) is about to derive
        # (cluster_and_update is pure in (rng, bank, params))
        kkey = prng.fold_in_axis(jax.random.fold_in(trainer.rng, 0), "kmeans")
        cparams, assignments = cluster_and_update(
            kkey, trainer.bank, trainer.state.params,
            tuple(cfg.model.num_classes), cfg.kmeans_iters)
        print(f"ASSIGNHASH {sha(assignments)}", flush=True)

        def proto_blob(params):
            protos = jax.device_get(params)["head"]["prototypes"]
            return b"".join(
                np.ascontiguousarray(np.asarray(protos[k]["kernel"],
                                                np.float32)).tobytes()
                for k in sorted(protos))

        # epoch-boundary centroids: pure k-means output, before any
        # gradient step touches the prototypes
        cblob = proto_blob(cparams)
        print(f"CENTHASH {hashlib.sha256(cblob).hexdigest()}", flush=True)
        cvals = np.frombuffer(cblob, np.float32)
        print(f"CENTSUM {float(np.abs(cvals).sum())!r}", flush=True)

        stat = trainer.train_epoch(data, epoch=0)
        print(f"RESULT {stat['loss']!r}", flush=True)
        print(f"BANKHASH {sha(trainer.bank)}", flush=True)
        print(f"BANKSUM {float(np.abs(np.asarray(trainer.bank)).sum())!r}",
              flush=True)
        blob = proto_blob(trainer.state.params)
        print(f"PROTOHASH {hashlib.sha256(blob).hexdigest()}", flush=True)
        proto_vals = np.frombuffer(blob, np.float32)
        print(f"PROTOSUM {float(np.abs(proto_vals).sum())!r}", flush=True)
        return

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
