"""True multi-PROCESS integration worker — launched by tests/test_multiprocess.py.

NOT a pytest module (no ``test_`` prefix). Each of the two coordinated
processes runs this script with 4 virtual CPU devices (parent sets
``XLA_FLAGS=--xla_force_host_platform_device_count=4``), joins a
``jax.distributed`` rendezvous, and exercises the code paths that are dead in
single-process CI (every one is guarded by ``jax.process_count() > 1``):

  - ``Loader`` epoch sharding across processes (loader.py);
  - ``shard_batch``'s ``make_array_from_process_local_data`` branch (mesh.py);
  - pjit FSDP training where each process holds half of every parameter;
  - the explicit ``shard_map`` DP step spanning both processes;
  - ``run_evaluation``'s host-batch replication branch (apps/vit/eval.py);
  - sharded checkpoint save producing REAL per-process shard files, then a
    fresh-Checkpointer resume through ``_assemble_from_shards``;
  - the full ``apps.vit.train`` CLI flow end-to-end (mode "app").

Reference capability being proven: src/vitef/distributed.py:140-283 (the
torch.distributed process-group lifecycle).

Usage: python tests/multiproc_worker.py <mode> <rank> <nproc> <coord> <workdir>
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def fingerprint(tree):
    """Global sum-of-squares over a (possibly process-sharded) pytree —
    replicated scalar, fetchable on every process."""
    import jax
    import jax.numpy as jnp

    def ssq(t):
        leaves = [jnp.sum(jnp.square(l.astype(jnp.float32)))
                  for l in jax.tree.leaves(t)]
        return jnp.sum(jnp.stack(leaves))

    return float(jax.jit(ssq)(tree))


def wait_for(predicate, timeout=120.0, what=""):
    t0 = time.time()
    while not predicate():
        if time.time() - t0 > timeout:
            raise TimeoutError(f"timed out waiting for {what}")
        time.sleep(0.2)


def run_lib(rank: int, nproc: int, workdir: Path) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vitef_tpu.data.images.loader import Loader, build_dataset
    from vitef_tpu.models import build_model
    from vitef_tpu.monitor.checkpoint import Checkpointer, CheckpointerConfig, \
        _unflatten_like
    from vitef_tpu.optim import build_optimizer
    from vitef_tpu.parallel import (
        TrainState, init_train_state, make_train_step, shard_batch,
        shard_params,
    )
    from vitef_tpu.parallel.mesh import build_computing_manager

    summary: dict = {"rank": rank}

    # -- mesh over both processes (reference build_manager equivalent) ------
    mesh = build_computing_manager({
        "coordinator_address": os.environ["VITEF_TEST_COORD"],
        "num_processes": nproc, "process_id": rank, "dp": -1, "tp": 1,
    })
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    # -- 1. Loader epoch sharding: disjoint stride per process --------------
    ds = build_dataset({"dataset_name": "synthetic", "n_samples": 103,
                        "image_size": 32})
    loader = Loader(ds, batch_size=8, size=32, mode="train", seed=7,
                    num_workers=0, shard_index=rank, shard_count=nproc)
    summary["epoch_order"] = [int(i) for i in loader._epoch_order()]
    summary["loader_len"] = len(loader)

    # -- 2. FSDP pjit training: each process holds half of every param -----
    model = build_model({
        "implementation": "vit", "model_name": "tiny", "patch_size": 16,
        "image_dim": (3, 32, 32), "pretrained": False, "finetuning": True,
        "n_classes": 10, "attn_impl": "xla", "norm_impl": "xla",
    }, key=jax.random.key(0))
    # host snapshot BEFORE any training: device_put may alias the source
    # buffer on its origin device, so the donated train step would delete
    # model.params leaves out from under later shard_params calls
    host_params = jax.device_get(model.params)
    params = shard_params(host_params, mesh, fsdp=True)
    tx, _ = build_optimizer(
        {"optimizer": "sgd", "lr": 0.01, "momentum": 0.9,
         "weight_decay": 0.0}, params=params, grad_clip=1.0)
    step_fn = make_train_step(model.apply, tx)
    state = init_train_state(params, tx)

    batches = []
    it = iter(loader)
    rng = jax.random.key(0)
    losses = []
    for i in range(3):
        x, y = next(it)
        batches.append((np.asarray(x), np.asarray(y)))
        batch = shard_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
        # multi-process branch: the global batch is assembled from each
        # process's DIFFERENT local shard
        assert batch[0].shape[0] == nproc * x.shape[0]
        rng, srng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, srng)
        losses.append(float(metrics["loss"]))
    summary["fsdp_losses"] = losses
    summary["fp_after_3"] = fingerprint(state.params)

    # -- 3. shard_map DP step across processes vs pjit ----------------------
    # two independent replicated copies: the train step donates its state,
    # so each run needs its own buffers
    params_rep_a = shard_params(host_params, mesh, fsdp=False)
    params_rep_b = shard_params(host_params, mesh, fsdp=False)
    tx2, _ = build_optimizer(
        {"optimizer": "sgd", "lr": 0.01, "momentum": 0.9,
         "weight_decay": 0.0}, params=params_rep_a, grad_clip=1.0)
    batch = shard_batch(
        (jnp.asarray(batches[0][0]), jnp.asarray(batches[0][1])), mesh)
    srng = jax.random.key(42)
    s_pjit, m_pjit = make_train_step(model.apply, tx2)(
        init_train_state(params_rep_a, tx2), batch, srng)
    s_smap, m_smap = make_train_step(model.apply, tx2, mesh=mesh)(
        init_train_state(params_rep_b, tx2), batch, srng)
    summary["pjit_loss"] = float(m_pjit["loss"])
    summary["shard_map_loss"] = float(m_smap["loss"])
    summary["pjit_vs_shard_map_fp"] = [fingerprint(s_pjit.params),
                                       fingerprint(s_smap.params)]

    # -- 4. replicated evaluation (identical full val set on every host) ---
    from apps.vit.eval import run_evaluation

    val_ds = build_dataset({"dataset_name": "synthetic", "n_samples": 48,
                            "image_size": 32, "mode": "val"})
    val_loader = Loader(val_ds, batch_size=16, size=32, mode="val",
                        shuffle=False, drop_last=False, num_workers=0)
    ev = run_evaluation(model, state.params, val_loader, mesh=mesh)
    summary["eval"] = ev

    # -- 5. sharded checkpoint: save -> fresh Checkpointer resume ----------
    ckpt_path = workdir / "ckpt"
    state_box = {"state": state}

    def get_state():
        s: TrainState = state_box["state"]
        return {"model": s.params, "optim": s.opt_state,
                "training": {"step": int(s.step), "acc_step": int(s.acc_step)}}

    def set_state(model_flat, optim_flat, training):
        # mirrors apps/vit/train.py: structure/shapes only — no device_get of
        # process-sharded state (non-addressable), reshard onto live shardings
        s: TrainState = state_box["state"]
        p = shard_params(_unflatten_like(s.params, model_flat), mesh,
                         fsdp=True)
        opt_state = s.opt_state
        if optim_flat is not None:
            from jax.sharding import NamedSharding

            opt_state = jax.tree.map(
                lambda live, host: jax.device_put(host, live.sharding)
                if isinstance(live.sharding, NamedSharding)
                else jnp.asarray(host),
                s.opt_state, _unflatten_like(s.opt_state, optim_flat))
        state_box["state"] = TrainState(
            params=p, opt_state=opt_state,
            step=jnp.asarray(int(training["step"]), jnp.int32),
            acc_step=jnp.asarray(int(training.get("acc_step", 0)), jnp.int32))

    with Checkpointer(CheckpointerConfig(period=0, n_kept=0,
                                         path=str(ckpt_path)),
                      get_state=get_state, set_state=set_state) as ck:
        ck.sync_step(3)
        ck.step = 3
        ck.saved_step = 0  # force the save
        ck.update()
    # context exit waited for this process's async write; the OTHER process's
    # shard lands on its own schedule — wait for the full set
    cdir = ckpt_path / Checkpointer.folder_name.format(3)
    wait_for(lambda: all((cdir / f).exists() for f in
                         ["index.json", "training.json"]
                         + [f"model.shard{r}.npz" for r in range(nproc)]
                         + [f"optim.shard{r}.npz" for r in range(nproc)]),
             what="both processes' checkpoint shards")
    summary["shard_piece_counts"] = [
        len(np.load(cdir / f"model.shard{r}.npz").files) for r in range(nproc)]

    # fresh Checkpointer (simulated restart): __enter__ auto-resumes through
    # _assemble_from_shards, reading BOTH processes' shard files
    state_box["state"] = init_train_state(
        shard_params(host_params, mesh, fsdp=True), tx)  # reset to step 0
    with Checkpointer(CheckpointerConfig(period=0, n_kept=0,
                                         path=str(ckpt_path)),
                      get_state=get_state, set_state=set_state) as ck2:
        resumed = state_box["state"]
        summary["resumed_step"] = int(resumed.step)
        summary["fp_resumed"] = fingerprint(resumed.params)
        # continue training after resume
        for i in range(2):
            x, y = next(it)
            batch = shard_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
            rng, srng = jax.random.split(rng)
            resumed, metrics = step_fn(resumed, batch, srng)
        state_box["state"] = resumed
        summary["fp_after_5"] = fingerprint(resumed.params)
        summary["loss_after_resume"] = float(metrics["loss"])
        ck2.sync_step(5)
        ck2.saved_step = 0
        ck2.update()
    wait_for(lambda: all(
        (ckpt_path / Checkpointer.folder_name.format(5) / f).exists()
        for f in ["index.json"] + [f"model.shard{r}.npz" for r in range(nproc)]),
        what="final checkpoint shards")
    return summary


def run_app(rank: int, nproc: int, workdir: Path) -> dict:
    import jax

    jax.distributed.initialize(
        coordinator_address=os.environ["VITEF_TEST_COORD"],
        num_processes=nproc, process_id=rank)

    from apps.vit.train import TrainingConfig, train

    train(TrainingConfig(
        model_name="tiny", patch_size=16, image_dim=(3, 32, 32),
        components=["mha"], pretrained=False, in21k=False,
        dataset_name="synthetic", batch_size=16, val_batch_size=16,
        num_workers=0, n_steps=4, grad_clip=1.0, eval_period=2,
        optimizer="sgd", lr=0.01, momentum=0.9, scheduler="cosine",
        warmup=1, log_dir="mp_smoke", logging_period=2, seed=42,
        utility_period=100, dp=-1, tp=1, fsdp=True,
    ))
    return {"rank": rank, "done": True}


def main():
    mode, rank, nproc, coord, workdir = sys.argv[1:6]
    rank, nproc = int(rank), int(nproc)
    workdir = Path(workdir)
    os.environ["VITEF_TEST_COORD"] = coord
    # the app writes its run dir under SAVING_DIR (read from env at import)
    os.environ.setdefault("VITEF_SAVING_DIR", str(workdir / "savings"))

    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")  # before backend init

    summary = run_lib(rank, nproc, workdir) if mode == "lib" \
        else run_app(rank, nproc, workdir)
    out = workdir / f"summary_{mode}_{rank}.json"
    tmp = out.with_suffix(".tmp")
    tmp.write_text(json.dumps(summary))
    tmp.replace(out)
    print(f"WORKER {mode} rank {rank} OK")


if __name__ == "__main__":
    main()
