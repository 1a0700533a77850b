"""Build a NON-degenerate (target, draft) pair for speculative-decoding profiling.

PERF.md's round-2 caveat: random-weight models degenerate into repeated
tokens, so a random 2-layer draft "accepted" ~100% of proposals — near the
mechanical ceiling, not evidence for real workloads. This tool makes the
measurement honest offline (zero egress — no real GPT2 weights):

  1. train the GPT2-small-shaped TARGET briefly on synthetic order-1 Markov
     sequences (stochastic but learnable structure → varied generations);
  2. DISTILL a 2-layer draft against the target's logits (KL), the standard
     recipe for serving drafts (Leviathan et al. 2023);
  3. save both under checkpoints/spec_pair/ for tools/profile_speculative.py
     (--trained), which then reports a real acceptance rate alpha < 1.

Run from the repo root on the TPU:  python tools/distill_spec_pair.py
(copied to .distill_pair.py at the root if running via the dotfile pattern).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vitef_tpu.config import MODEL_DIR
from vitef_tpu.models import build_model
from vitef_tpu.monitor.checkpoint import _flatten_with_paths

VOCAB = 50257
EFF_VOCAB = 2048   # Markov support: keeps the transition table small
SEQ = 256
BATCH = 16


def gpt2ish(layers, seed):
    return build_model(dict(
        implementation="transformer", vocab_size=VOCAB, emb_type="dict",
        emb_dim=768, n_heads=12, n_layers=layers, seq_len=1024, causal=True,
        pre_norm=True, weight_tying=True, output_type="sequence_to_sequence",
        attn_bias=True, ffn_bias=True, norm_bias=True,
        compute_dtype="bfloat16"), key=jax.random.key(seed))


def markov_batches(n_steps, seed=0):
    """Order-1 Markov chain over EFF_VOCAB tokens, ~8 successors per state."""
    rng = np.random.default_rng(seed)
    succ = rng.integers(0, EFF_VOCAB, size=(EFF_VOCAB, 8))
    cum = rng.dirichlet(np.full(8, 0.6), size=EFF_VOCAB).cumsum(axis=1)
    for _ in range(n_steps):
        toks = np.empty((BATCH, SEQ + 1), np.int64)
        toks[:, 0] = rng.integers(0, EFF_VOCAB, size=BATCH)
        for t in range(SEQ):
            cur = toks[:, t]
            u = rng.random(BATCH)  # inverse-CDF draw, vectorized over batch
            choice = np.minimum((u[:, None] > cum[cur]).sum(axis=1), 7)
            toks[:, t + 1] = succ[cur, choice]
        yield jnp.asarray(toks[:, :-1], jnp.int32), jnp.asarray(
            toks[:, 1:], jnp.int32)


def train_target(model, n_steps=300, lr=3e-4):
    tx = optax.adamw(lr)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = model.params, tx.init(model.params)
    t0 = time.perf_counter()
    for i, (x, y) in enumerate(markov_batches(n_steps, seed=1)):
        params, opt_state, loss = step(params, opt_state, x, y)
        if (i + 1) % 50 == 0:
            print(f"target step {i+1}: loss {float(loss):.3f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    return params


def distill_draft(draft, target, target_params, n_steps=600, lr=6e-4):
    tx = optax.adamw(lr)

    # target_params MUST be a traced argument, not a closure: closed-over
    # arrays are baked into the HLO as constants, and a 124M-param constant
    # blob exceeds the axon remote-compile request limit (HTTP 413).
    @jax.jit
    def step(params, opt_state, t_params, x):
        t_logits = jax.lax.stop_gradient(target.apply(t_params, x))
        t_logp = jax.nn.log_softmax(t_logits.astype(jnp.float32))

        def loss_fn(p):
            d_logp = jax.nn.log_softmax(
                draft.apply(p, x).astype(jnp.float32))
            return jnp.mean(jnp.sum(jnp.exp(t_logp) * (t_logp - d_logp),
                                    axis=-1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = draft.params, tx.init(draft.params)
    t0 = time.perf_counter()
    for i, (x, _) in enumerate(markov_batches(n_steps, seed=2)):
        params, opt_state, loss = step(params, opt_state, target_params, x)
        if (i + 1) % 100 == 0:
            print(f"distill step {i+1}: KL {float(loss):.3f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    return params


def main():
    out_dir = MODEL_DIR / "spec_pair"
    out_dir.mkdir(parents=True, exist_ok=True)
    target = gpt2ish(12, 0)
    draft = gpt2ish(2, 7)
    print("training target on Markov data...", flush=True)
    t_params = train_target(target)
    print("distilling draft...", flush=True)
    d_params = distill_draft(draft, target, t_params)
    np.savez(out_dir / "target.npz", **_flatten_with_paths(t_params))
    np.savez(out_dir / "draft.npz", **_flatten_with_paths(d_params))
    print(f"saved pair under {out_dir}", flush=True)


if __name__ == "__main__":
    main()
