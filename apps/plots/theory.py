"""Theoretical plasticity upper bounds from pretrained weights (SVDs in JAX).

Reference: apps/plots/theory.py (get_radius :68-107 — average token-embedding
norm, r=19.4 for CIFAR-10; norm_ub :111 — max LN weight; linear_ub :141 — top
singular value of fc1/fc2; attention_ub :173 — per-head bound
Σ σ(O_h)·σ(V_h)·√(3L + (12L+3)·r⁴·σ(QK_h)²) at :209-212;
plot_theoretical_bounds :245; fire CLI radius/plot :339).

Layout note: the reference slices torch (out, in) weight matrices by *columns*
(input dims) per head (theory.py:190-205); our weights are stored (in, out), so
the equivalent sub-matrices are row slices / transposes — singular values are
transpose-invariant, so the bounds are identical.
"""

from __future__ import annotations

import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.data.images import build_loader, make_iterable
from vitef_tpu.models import build_model
from vitef_tpu.models.transformer import apply_embedding
from vitef_tpu.utils.cli import make_cli

from .common import ALPHA_GRID, COLORS, FONTSIZE, save_plot, set_style

logger = logging.getLogger("vitef")

VIT_COMPONENTS = ["LN1", "MHA", "LN2", "FC1", "FC2"]
N_LAYERS = {"base": 12, "large": 24, "huge": 32}
N_HEADS = {"base": 12, "large": 16, "huge": 16}
EMB_DIM = {"base": 768, "large": 1024, "huge": 1280}
SEQ_LEN = {14: 257, 16: 197}
LINEWIDTH = 5


def _build_vit(model_name: str, patch_size: int):
    return build_model(
        {
            "implementation": "vit",
            "model_name": model_name,
            "pretrained": True,
            "in21k": True,
            "patch_size": patch_size,
            "image_dim": (3, 224, 224),
        },
        key=jax.random.key(0),
    )


def get_radius(model_name: str, patch_size: int, dataset_name: str,
               batch_size: int, max_steps: int, data_dir: str | None = None) -> float:
    """Average token-embedding norm over a dataset (reference :68-107; r=19.4
    for CIFAR-10 with ViT-B/16 in21k)."""
    loader_config = {
        "dataset_name": dataset_name,
        "batch_size": batch_size,
        "mode": "test",
        "size": 224,
    }
    if data_dir:
        loader_config["save_dir"] = data_dir
    loader = build_loader(config=loader_config, drop_last=False)
    model = _build_vit(model_name, patch_size)

    @jax.jit
    def token_norm(params, x):
        emb = apply_embedding(params["embedding"], model.config, x)
        norms = jnp.sqrt(jnp.sum(jnp.square(emb.astype(jnp.float32)), axis=-1))
        return norms.mean()

    iterator = iter(make_iterable(loader))
    mean_norm = []
    for _ in range(max_steps):
        x_batch, _ = next(iterator)
        mean_norm.append(float(token_norm(model.params, x_batch)))
    r = float(np.mean(mean_norm))
    print("The radius of the token embedding space is: r =", np.round(r, 2))
    return r


def _top_sv(w) -> float:
    return float(jnp.linalg.svd(jnp.asarray(w, jnp.float32), compute_uv=False)[0])


def norm_ub(model_name: str, patch_size: int, model=None) -> tuple[list, list]:
    """Max LN weight per block for attn_norm/ffn_norm (reference :111-138)."""
    model = model or _build_vit(model_name, patch_size)
    attn_norm_ub, ffn_norm_ub = [], []
    for block in model.params["blocks"]:
        attn_norm_ub.append(float(jnp.max(block["attn_norm"]["weight"])))
        ffn_norm_ub.append(float(jnp.max(block["ffn_norm"]["weight"])))
    return attn_norm_ub, ffn_norm_ub


def linear_ub(model_name: str, patch_size: int, model=None) -> tuple[list, list]:
    """Top singular value of fc1/fc2 per block (reference :141-170)."""
    model = model or _build_vit(model_name, patch_size)
    fc1_ub, fc2_ub = [], []
    for block in model.params["blocks"]:
        fc1_ub.append(_top_sv(block["ffn"]["fc1"]["weight"]))
        fc2_ub.append(_top_sv(block["ffn"]["fc2"]["weight"]))
    return fc1_ub, fc2_ub


def attention_ub(model_name: str, patch_size: int, r: float, model=None) -> list:
    """Per-block MHA bound Σ_h σ(O_h)·σ(V_h)·√(3L + (12L+3)·r⁴·σ(QK_h)²)
    (reference :173-214). Our (in, out) weights: the reference's per-head
    column slices of torch (out, in) matrices become row slices here."""
    model = model or _build_vit(model_name, patch_size)
    n_heads = N_HEADS[model_name]
    emb_dim = EMB_DIM[model_name]
    seq_len = SEQ_LEN[patch_size]
    d = emb_dim // n_heads
    mha_ub = []
    for block in model.params["blocks"]:
        w_qkv = jnp.asarray(block["attn"]["qkv_mat"]["weight"], jnp.float32)  # (E, 3E)
        w_out = jnp.asarray(block["attn"]["output"]["weight"], jnp.float32)  # (E, E)
        # torch: q = A[:E] with A (3E, E) → ours: w_qkv[:, :E].T etc.
        q = w_qkv[:, :emb_dim].T  # (E_out, E_in)
        k = w_qkv[:, emb_dim:2 * emb_dim].T
        v = w_qkv[:, 2 * emb_dim:].T
        comp = 0.0
        for i in range(n_heads):
            sl = slice(i * d, (i + 1) * d)
            # torch column slices (input dims): X[:, sl]
            o_h = _top_sv(w_out.T[:, sl])  # torch A[:, sl] with A = w_out.T
            v_h = _top_sv(v[:, sl])
            qk_h = q[:, sl] @ k[:, sl].T / math.sqrt(d)
            s_qk = _top_sv(qk_h)
            comp += o_h * v_h * math.sqrt(
                3 * seq_len + (12 * seq_len + 3) * r**4 * s_qk**2
            )
        mha_ub.append(comp)
    return mha_ub


def get_theoretical_bounds(model_name: str, patch_size: int,
                           r: float = 19.4) -> tuple:
    """(LN1, MHA, LN2, FC1, FC2) per-block bounds (reference :217-229)."""
    model = _build_vit(model_name, patch_size)
    LN1, LN2 = norm_ub(model_name, patch_size, model=model)
    FC1, FC2 = linear_ub(model_name, patch_size, model=model)
    MHA = attention_ub(model_name, patch_size, r, model=model)
    return LN1, MHA, LN2, FC1, FC2


def plot_theoretical_bounds(model_name: str, patch_size: int, r: float = 19.4,
                            save: bool = False, ncol: int = 6) -> None:
    """Log-scale per-depth bound curves (reference :245-323)."""
    set_style()
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 4))
    n_layers = N_LAYERS[model_name]
    x_range = np.arange(n_layers) / (n_layers - 1) * 100
    bounds = get_theoretical_bounds(model_name, patch_size, r=r)
    for j, comp in enumerate(VIT_COMPONENTS):
        plt.plot(x_range, bounds[j], label=comp, color=COLORS[comp],
                 linewidth=LINEWIDTH)
    ax = fig.axes[0]
    ax.set_yscale("log")
    ax.grid(alpha=ALPHA_GRID, lw=1.3)
    ax.set_xticks([0, 50, 100])
    ax.set_xlabel("Layer Depth (%)", fontsize=FONTSIZE)
    ax.set_ylabel("Plasticity Upper Bound", fontsize=FONTSIZE)
    fig.legend(loc="upper center", bbox_to_anchor=(0.5, 1.08), ncol=ncol,
               fontsize=FONTSIZE, frameon=True)
    plt.tight_layout()
    if save:
        save_plot("theoretical_bounds", subdir="theory")
    plt.close(fig)


def print_radius() -> None:
    get_radius(model_name="base", patch_size=16, dataset_name="cifar10",
               batch_size=16, max_steps=1000)


def plot_figures() -> None:
    plot_theoretical_bounds(model_name="base", patch_size=16, save=True)


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s [%(levelname)s] %(filename)s:%(lineno)d - %(message)s",
        handlers=[logging.StreamHandler()],
    )
    make_cli({"radius": print_radius, "plot": plot_figures})


if __name__ == "__main__":
    main()
