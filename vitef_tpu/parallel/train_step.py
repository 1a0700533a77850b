"""One jitted train step: forward + backward + clip + optim + metrics.

Reference hot loop: apps/vit/train.py:243-340 — per microbatch forward,
``F.cross_entropy / grad_acc``, backward, then (after grad_acc_steps microbatches)
clip_grad_norm_ → optimizer.step → scheduler.step → zero_grad, logging loss /
grad_norm / lr.

TPU-first redesign (SURVEY §7.0): the whole thing is ONE ``jax.jit``-compiled
function over the mesh. Gradient accumulation is a ``lax.scan`` over microbatches
inside the step (identical loss scaling: grads averaged over microbatches —
hard part 8). The data-parallel gradient all-reduce is inserted by XLA from the
batch/param shardings; no explicit collectives. Freeze masks live inside the
optax transform (see vitef_tpu.optim), so one compiled step serves every freeze
configuration.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    """Carries exactly what the reference checkpoints: model params, optimizer
    state, and the step counters of apps/vit/utils.py TrainingState (:23-46).
    ``acc_step`` is always 0 at step boundaries here (accumulation happens
    inside the jitted step) but is kept for checkpoint-layout parity."""

    params: Any
    opt_state: Any
    step: jax.Array  # optimizer steps taken
    acc_step: jax.Array  # microbatches since last optimizer step


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross entropy with integer labels (torch F.cross_entropy)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def init_train_state(params, tx) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        acc_step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    *,
    grad_acc_steps: int = 1,
    loss_fn: Callable = cross_entropy_loss,
    schedule: Callable | None = None,
    base_lr: float = 0.0,
    trainable: Any = None,
    donate: bool = True,
    update_stats: bool = False,
    stats_momentum: float = 0.1,
    mesh: Any = None,
    block_grad_norms: bool = False,
    moe_aux_coefs: tuple | None = None,
    hidden_loss: Callable | None = None,
):
    """Build the jitted train step ``(state, batch, rng) -> (state, metrics)``.

    ``batch`` is ``(x, y)`` with a leading batch axis of ``grad_acc_steps * micro``;
    when ``grad_acc_steps > 1`` the step scans over microbatches and averages
    gradients (reference loss/grad_acc scaling, train.py:263-274). ``trainable``
    is the bool mask used only for the logged grad_norm (clip itself lives in
    ``tx``), matching clip_grad_norm_ over requires_grad params (train.py:278).

    ``mesh`` switches from pjit auto-sharding (default; XLA inserts the
    gradient all-reduce from the batch/param shardings) to an EXPLICIT
    shard_map data-parallel step — required when the per-device compute uses
    a pallas kernel (no SPMD partitioning rule). dp-only; params replicated.

    ``update_stats=True`` (batch-norm models, e.g. PatchTST) makes the step
    update the running statistics like nn.BatchNorm1d (momentum=0.1, reference
    transformer/utils.py:184-230): each train-mode forward yields batch stats
    (``apply_fn(..., return_stats=True)``), the EMA chains across grad-acc
    microbatches (per-forward updates, like the reference's per-microbatch
    forward passes), and the result is written back into ``state.params``.

    ``moe_aux_coefs=(lb_coef, z_coef)`` (MoE families) adds the router
    load-balance and z losses (parallel/moe.router_aux) to the task loss
    and surfaces their raw values as ``moe_lb`` / ``moe_z`` metrics;
    averaged across grad-acc microbatches and pmean'd over 'dp' like the
    loss. Pass ``(cfg.moe_lb_coef, cfg.moe_z_coef)`` when nonzero.
    """
    from ..models.norms import ema_update_stats, extract_running_stats, \
        merge_running_stats
    from ..optim import global_grad_norm

    if moe_aux_coefs is not None and update_stats:
        raise ValueError("moe_aux_coefs and update_stats are mutually "
                         "exclusive (no batch-norm MoE family)")
    if hidden_loss is not None and update_stats:
        raise ValueError("hidden_loss and update_stats are mutually "
                         "exclusive (no batch-norm causal-LM family)")

    def loss_of(params, x, y, rng):
        # Train mode unconditionally (deterministic=False): batch norm must use
        # batch statistics even when no rng is passed (rng only gates dropout,
        # and all dropout applications guard on rate > 0).
        # ``hidden_loss`` (fused head+CE, ops/losses.make_fused_head_loss):
        # the forward stops at the pre-head hidden and the loss fuses the
        # vocab matmul — no (N, L, V) logits tensor in the step.
        fwd_kw = {"return_hidden": True} if hidden_loss is not None else {}
        task = ((lambda out, yy: hidden_loss(params, out, yy))
                if hidden_loss is not None else loss_fn)
        if moe_aux_coefs is not None:
            # MoE router auxiliary losses (parallel/moe.router_aux): the
            # load-balance and z terms join the task loss, and their raw
            # values surface in the step metrics.
            c_lb, c_z = moe_aux_coefs
            out, aux = apply_fn(params, x, deterministic=False, rng=rng,
                                return_moe_aux=True, **fwd_kw)
            loss = task(out, y) + c_lb * aux["lb"] + c_z * aux["z"]
            return loss, ({}, {"moe_lb": aux["lb"], "moe_z": aux["z"]})
        if update_stats:
            logits, stats = apply_fn(params, x, deterministic=False, rng=rng,
                                     return_stats=True)
            return loss_fn(logits, y), (stats, {})
        out = apply_fn(params, x, deterministic=False, rng=rng, **fwd_kw)
        return task(out, y), ({}, {})

    grad_fn = jax.value_and_grad(loss_of, has_aux=True)

    def compute_grads(params, running, x, y, rng):
        if grad_acc_steps == 1:
            (loss, (stats, moem)), grads = grad_fn(params, x, y, rng)
            return loss, grads, \
                ema_update_stats(running, stats, stats_momentum), moem
        micro = x.shape[0] // grad_acc_steps
        xs = x.reshape(grad_acc_steps, micro, *x.shape[1:])
        ys = y.reshape(grad_acc_steps, micro, *y.shape[1:])
        rngs = (
            jax.random.split(rng, grad_acc_steps) if rng is not None
            else jnp.zeros((grad_acc_steps,))
        )

        # NB: UNROLLING small accumulation counts (python loop over
        # microbatches, fused add+scale) was A/B-measured 7% SLOWER e2e at
        # 2x256 (1145 vs 1233 img/s): without the scan carry's forced
        # serialization XLA interleaves the microbatches and the working set
        # grows back to the full-batch HBM footprint (panic remat — the very
        # regression the auto-microbatch split removes). The scan IS the
        # memory fence; do not "optimize" it away.
        def body(carry, inp):
            loss_acc, grads_acc, run, moem_acc = carry
            xi, yi, ri = inp
            (loss, (stats, moem)), grads = grad_fn(params, xi, yi,
                                                   ri if rng is not None else None)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            run = ema_update_stats(run, stats, stats_momentum)
            moem_acc = jax.tree.map(jnp.add, moem_acc, moem)
            return (loss_acc + loss, grads_acc, run, moem_acc), None

        zero = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        run0 = jax.tree.map(lambda s: s.astype(jnp.float32), running)
        moem0 = ({"moe_lb": jnp.zeros(()), "moe_z": jnp.zeros(())}
                 if moe_aux_coefs is not None else {})
        (loss_sum, grads_sum, running, moem_sum), _ = jax.lax.scan(
            body, (jnp.zeros(()), zero, run0, moem0), (xs, ys, rngs)
        )
        scale = 1.0 / grad_acc_steps
        return loss_sum * scale, jax.tree.map(lambda g: g * scale, grads_sum), \
            running, jax.tree.map(lambda m: m * scale, moem_sum)

    def update_from_grads(state, loss, grads, running, moem=None):
        grad_norm = global_grad_norm(grads, trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if update_stats:
            params = merge_running_stats(params, running)
        step = state.step + 1
        metrics = {"loss": loss, "grad_norm": grad_norm}
        if moem:
            metrics.update(moem)
        if block_grad_norms and isinstance(grads, dict) and "blocks" in grads:
            # Per-block gradient norms computed on device inside the step
            # (BASELINE.json north star: no host round-trips); a handful of
            # scalars per step, fused into the existing reduction pass.
            for i, bg in enumerate(grads["blocks"]):
                metrics[f"grad_norm_block_{i}"] = global_grad_norm(bg)
        if schedule is not None:
            metrics["lr"] = base_lr * schedule(state.step)
        new_state = TrainState(params=params, opt_state=opt_state, step=step,
                               acc_step=state.acc_step * 0)
        return new_state, metrics

    def train_step(state: TrainState, batch, rng=None):
        x, y = batch
        running = extract_running_stats(state.params) if update_stats else {}
        loss, grads, running, moem = compute_grads(
            state.params, running, x, y, rng)
        return update_from_grads(state, loss, grads, running, moem)

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    # ---- shard_map data-parallel step (explicit collectives) -------------
    # pjit auto-sharding is the default multi-chip path, but a pallas_call
    # has no SPMD partitioning rule, so the packed MHA kernel cannot ride it.
    # This variant runs the per-shard forward/backward inside shard_map
    # (params/optimizer replicated, batch split over 'dp', gradients pmean'd
    # over ICI) so the kernel executes per-device on its local batch — the
    # DDP topology of reference distributed.py:234-240 with the collective
    # made explicit. tp/fsdp-sharded params need the pjit path (attn_impl
    # falls back to XLA there, apps/vit/train.py).
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    assert mesh.shape.get("tp", 1) == 1, (
        "shard_map train step is data-parallel only; use the pjit path "
        "(attn_impl=xla) for tp/fsdp sharding"
    )

    def per_shard(state, x, y, rng):
        # Distinct dropout streams per shard (replicated key folded with the
        # shard index), like independent DDP replicas on disjoint data.
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        running = extract_running_stats(state.params) if update_stats else {}
        loss, grads, running, moem = compute_grads(
            state.params, running, x, y, rng)
        loss = jax.lax.pmean(loss, "dp")
        grads = jax.lax.pmean(grads, "dp")
        if moem:
            moem = jax.lax.pmean(moem, "dp")
        if update_stats:
            # Synced batch-norm statistics: unsynced per-shard EMAs would
            # diverge the replicated params across devices.
            running = jax.lax.pmean(running, "dp")
        return update_from_grads(state, loss, grads, running, moem)

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P()),
        out_specs=P(),
        check_rep=False,
    )

    def train_step_dp(state: TrainState, batch, rng=None):
        x, y = batch
        if rng is None:
            rng = jax.random.key(0)  # dropout-free models ignore it
        return sharded(state, x, y, rng)

    return jax.jit(train_step_dp, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, loss_fn: Callable = cross_entropy_loss):
    """Jitted eval step ``(params, batch) -> (batch_acc, batch_loss)``.

    Matches reference run_evaluation per-batch stats (eval.py:45-89: batch-mean
    accuracy and loss; the caller averages over batches — mean of batch means).
    """

    @jax.jit
    def eval_step(params, batch):
        x, y = batch
        logits = apply_fn(params, x, deterministic=True)
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == y).astype(jnp.float32))
        return acc, loss_fn(logits, y)

    return eval_step
