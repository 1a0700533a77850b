"""Loss-landscape + functional rate-of-change surfaces for ViT components.

Reference: apps/plots/loss_landscape.py (get_pca_basis :56-101 — PCA of a short
SGD trajectory in the selected component's parameter space; get_rates_of_change
:107-211 — loss surface on the PCA plane and functional rate-of-change surface
‖f(x+δ)−f(x)‖/‖δ‖ on a feature-space plane spanned by the input-gradient
direction of ‖f(x)‖ and orthogonalized Rademacher noise, with the SGD
trajectory overlaid; get_analysis :217-248 — pickles surfaces to
``savings/loss_landscape/<comp>_block_<b>/*.pkl``; rendering :290-1032).

Differences from the reference: it probes a **timm** ViT (:130) since it only
needs any pretrained ViT-B/16; here the probe runs on OUR ViT (same
architecture, pretrained when weights are cached). Component filter map
{ln1, mha, ln2, fc1, fc2} (:138) maps to our param subtrees. The (u, v) grid
sweep is a ``lax.map`` over a jitted loss/probe evaluation — the whole surface
is computed on device instead of a Python double loop of separate forwards.
For fc2 (whose input dim is ffn_dim) the feature input is zero-padded exactly
like the decomposition quirk (architecture.py:414-416).
"""

from __future__ import annotations

import logging
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from vitef_tpu.config import FIGURE_DIR, SAVING_DIR, set_seed
from vitef_tpu.data.images import build_loader
from vitef_tpu.models import build_model
from vitef_tpu.models.transformer import apply_attention, apply_embedding
from vitef_tpu.models.norms import apply_norm
from vitef_tpu.utils.cli import make_cli

logger = logging.getLogger("vitef")

SAVE_DIR = SAVING_DIR / "loss_landscape"

# component name → param subtree inside a block (reference :138 maps to timm
# names norm1/attn/norm2/fc1/fc2)
COMPONENT_SUBTREES = {
    "ln1": ("attn_norm",),
    "mha": ("attn",),
    "ln2": ("ffn_norm",),
    "fc1": ("ffn", "fc1"),
    "fc2": ("ffn", "fc2"),
}


def _get_subtree(params, block: int, comp: str):
    sub = params["blocks"][block]
    for k in COMPONENT_SUBTREES[comp]:
        sub = sub[k]
    return sub


def _set_subtree(params, block: int, comp: str, new_sub):
    import copy

    params = copy.copy(params)
    params["blocks"] = list(params["blocks"])
    blk = dict(params["blocks"][block])
    keys = COMPONENT_SUBTREES[comp]
    if len(keys) == 1:
        blk[keys[0]] = new_sub
    else:
        inner = dict(blk[keys[0]])
        inner[keys[1]] = new_sub
        blk[keys[0]] = inner
    params["blocks"][block] = blk
    return params


def _flatten_sub(sub):
    leaves, treedef = jax.tree_util.tree_flatten(sub)
    flat = jnp.concatenate([l.reshape(-1) for l in leaves])
    shapes = [l.shape for l in leaves]
    return flat, (treedef, shapes)


def _unflatten_sub(flat, meta):
    treedef, shapes = meta
    leaves, ptr = [], 0
    for s in shapes:
        n = int(np.prod(s)) if s else 1
        leaves.append(flat[ptr:ptr + n].reshape(s))
        ptr += n
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _component_forward(model, block: int, comp: str):
    """Pure f(sub_params, features) for the selected component module."""
    cfg = model.config

    def forward(sub, feat):
        if comp in ("ln1", "ln2"):
            return apply_norm(sub, feat, kind=cfg.norm, eps=cfg.norm_eps,
                              impl=cfg.norm_impl)
        if comp == "mha":
            return apply_attention(sub, cfg, feat, deterministic=True)
        cd = cfg.cdtype()
        w = sub["weight"].astype(cd)
        x = feat
        if comp == "fc2" and feat.shape[-1] != w.shape[0]:
            pad = w.shape[0] - feat.shape[-1]
            x = jnp.concatenate(
                [feat, jnp.zeros(feat.shape[:-1] + (pad,), feat.dtype)], axis=-1
            )
        out = jnp.einsum("...i,ij->...j", x.astype(cd), w)
        if "bias" in sub:
            out = out + sub["bias"]
        return out

    return forward


def get_pca_basis(model, params, block: int, comp: str, x_batch, y_batch,
                  n_steps: int, lr: float):
    """PCA(2) of a short SGD trajectory in the component's parameter space
    (reference :56-101). Returns flat (dx, dy) directions + the loss/grad fn."""
    import optax
    from sklearn.decomposition import PCA

    sub0, meta = _flatten_sub(_get_subtree(params, block, comp))

    def loss_of(flat_sub):
        p = _set_subtree(params, block, comp, _unflatten_sub(flat_sub, meta))
        logits = model.apply(p, x_batch)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y_batch
        ).mean()

    grad_fn = jax.jit(jax.value_and_grad(loss_of))

    trajectory = []
    flat = sub0
    for _ in range(n_steps):
        _, g = grad_fn(flat)
        flat = flat - lr * g
        trajectory.append(np.asarray(flat))

    pca = PCA(n_components=2)
    pca.fit(np.asarray(trajectory))
    dx = jnp.asarray(pca.components_[0], jnp.float32)
    dy = jnp.asarray(pca.components_[1], jnp.float32)
    return dx, dy, sub0, meta, grad_fn


def get_rates_of_change(dataset_name: str, batch_size: int,
                        trainable_component: str, block: int, n_steps: int,
                        lr: float, resolution: int, grid_range: float,
                        data_dir: str | None = None, model=None,
                        batch=None, seed: int = 42):
    """Loss + functional rate-of-change surfaces and the SGD trajectory
    (reference :107-211), with the grid evaluated on device via lax.map."""
    set_seed(seed)
    if model is None:
        model = build_model(
            {"implementation": "vit", "model_name": "base", "pretrained": True,
             "in21k": False, "patch_size": 16, "image_dim": (3, 224, 224)},
            key=jax.random.key(seed),
        )
    if batch is None:
        loader_config = {"dataset_name": dataset_name, "batch_size": batch_size,
                         "mode": "test", "size": model.config.image_dim[-1]}
        if data_dir:
            loader_config["save_dir"] = data_dir
        loader = build_loader(config=loader_config)
        x_batch, y_batch = next(iter(loader))
    else:
        x_batch, y_batch = batch
    params = model.params
    comp = trainable_component

    # PCA plane in parameter space
    p_dx, p_dy, sub0, meta, grad_fn = get_pca_basis(
        model, params, block, comp, x_batch, y_batch, n_steps=n_steps, lr=lr
    )

    # Feature-space probe directions: input-gradient of ‖f(x)‖ + orthogonalized
    # Rademacher noise (reference :146-169)
    emb = apply_embedding(params["embedding"], model.config, x_batch)
    feat_input = emb[0:1]
    fwd = _component_forward(model, block, comp)
    sub_tree = _get_subtree(params, block, comp)

    f_dx = jax.grad(lambda f: jnp.linalg.norm(fwd(sub_tree, f)))(feat_input)
    f_dx = f_dx / jnp.linalg.norm(f_dx)
    key = jax.random.key(seed)
    f_dy = jnp.sign(jax.random.normal(key, f_dx.shape))
    f_dy = f_dy - jnp.sum(f_dy * f_dx) * f_dx
    f_dy = f_dy / jnp.linalg.norm(f_dy)

    u_coords = np.linspace(-grid_range, grid_range, resolution)
    v_coords = np.linspace(-grid_range, grid_range, resolution)
    uv = jnp.asarray([[u, v] for v in v_coords for u in u_coords])  # row-major (j, i)

    import optax

    @jax.jit
    def surface_point(uv1):
        u, v = uv1[0], uv1[1]
        flat = sub0 + u * p_dx + v * p_dy
        p = _set_subtree(params, block, comp, _unflatten_sub(flat, meta))
        logits = model.apply(p, x_batch)
        z_loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y_batch
        ).mean()
        delta = u * f_dx + v * f_dy
        dist_in = jnp.maximum(jnp.linalg.norm(delta), 1e-8)
        f_x = fwd(sub_tree, feat_input)
        f_y = fwd(sub_tree, feat_input + delta)
        z_func = jnp.maximum(jnp.linalg.norm(f_y - f_x) / dist_in, 1e-8)
        return z_loss, z_func

    z_loss_flat, z_func_flat = jax.lax.map(surface_point, uv, batch_size=16)
    Z_loss = np.asarray(z_loss_flat).reshape(resolution, resolution)
    Z_func = np.asarray(z_func_flat).reshape(resolution, resolution)

    # SGD trajectory projected onto the PCA plane (reference :191-208)
    trajectory = []
    flat = sub0
    for step in range(n_steps):
        loss, g = grad_fn(flat)
        flat = flat - lr * g
        disp = flat - sub0
        trajectory.append((float(jnp.dot(disp, p_dx)), float(jnp.dot(disp, p_dy))))
        print(f"Step {step + 1}/{n_steps}: Loss={float(loss):.4f}")

    return Z_loss, Z_func, u_coords, v_coords, trajectory


def get_analysis(dataset_name: str = "cifar10", batch_size: int = 64,
                 trainable_component: str = "mha", block: int = 0,
                 n_steps: int = 20, lr: float = 1e-2, resolution: int = 25,
                 grid_range: float = 1.0, **kwargs) -> None:
    """Compute + pickle the surfaces (reference :217-248)."""
    Z_loss, Z_func, u_coords, v_coords, trajectory = get_rates_of_change(
        dataset_name=dataset_name, batch_size=batch_size,
        trainable_component=trainable_component, block=block, n_steps=n_steps,
        lr=lr, resolution=resolution, grid_range=grid_range, **kwargs,
    )
    save_dir = SAVE_DIR / f"{trainable_component}_block_{block}"
    save_dir.mkdir(exist_ok=True, parents=True)
    logger.info(f"Saving results in {save_dir}.")
    for name, obj in [("loss", Z_loss), ("func", Z_func),
                      ("u_coords", u_coords), ("v_coords", v_coords),
                      ("traj", trajectory)]:
        with open(save_dir / f"{name}.pkl", "wb") as f:
            pickle.dump(obj, f)


# ----------------------------------------------------------------------------
# Rendering (reference :290-1032, condensed)
# ----------------------------------------------------------------------------


def _load_surfaces(trainable_component: str, block: int):
    save_dir = SAVE_DIR / f"{trainable_component}_block_{block}"
    out = {}
    for name in ("loss", "func", "u_coords", "v_coords", "traj"):
        with open(save_dir / f"{name}.pkl", "rb") as f:
            out[name] = pickle.load(f)
    return out


def save_plot(figname: str, folder: str | None = None, format: str = "pdf",
              dpi: int = 100):
    import matplotlib.pyplot as plt

    figure_path = FIGURE_DIR / "loss_landscape"
    if folder:
        figure_path = figure_path / folder
    figure_path.mkdir(parents=True, exist_ok=True)
    out = figure_path / f"{figname}.{format}"
    plt.savefig(out, format=format, bbox_inches="tight", dpi=dpi)
    return out


def get_results(trainable_component: str = "mha", block: int = 0,
                save: bool = True) -> None:
    """Contour plots of the loss and rate-of-change surfaces with the SGD
    trajectory overlaid (reference get_results :290+)."""
    from .common import set_style

    set_style()
    import matplotlib.pyplot as plt

    data = _load_surfaces(trainable_component, block)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for ax, key, title in [(axes[0], "loss", "Loss Landscape"),
                           (axes[1], "func", "Rate of Change")]:
        Z = np.asarray(data[key])
        cs = ax.contourf(data["u_coords"], data["v_coords"], Z, levels=30,
                         cmap="viridis")
        fig.colorbar(cs, ax=ax)
        traj = np.asarray(data["traj"])
        if len(traj):
            ax.plot(traj[:, 0], traj[:, 1], "w.-", lw=1.5, markersize=4,
                    label="SGD trajectory")
            ax.legend(fontsize=9)
        ax.set_title(f"{title} — {trainable_component.upper()} block {block}")
        ax.set_xlabel("u")
        ax.set_ylabel("v")
    plt.tight_layout()
    if save:
        save_plot(f"{trainable_component}_block_{block}")
    plt.close(fig)


def save_results(dataset_name: str = "cifar10", batch_size: int = 4,
                 n_steps: int = 20, lr: float = 1e-3, resolution: int = 20,
                 grid_range: float = 0.5, block: int = 0) -> None:
    """The reference's `save` command (loss_landscape.py:267-288): compute
    surfaces for ln1 / fc1 / mha at block 0 with the paper's settings."""
    for trainable_component in ["ln1", "fc1", "mha"]:
        get_analysis(
            dataset_name=dataset_name, batch_size=batch_size,
            trainable_component=trainable_component, block=block,
            n_steps=n_steps, lr=lr, resolution=resolution,
            grid_range=grid_range,
        )


def plot_figures(save: bool = True, block: int = 0) -> None:
    """The paper's combined figure (reference get_results :290-490, saved as
    loss_landscape.pdf): row 1 = 3-D rate-of-change surfaces for LN1 vs MHA
    (normalized by the shared max), row 2 = loss contours with the SGD
    trajectory overlaid."""
    from .common import set_style

    set_style()
    import matplotlib.pyplot as plt

    ln1 = _load_surfaces("ln1", block)
    mha = _load_surfaces("mha", block)
    row1_max = max(np.asarray(ln1["func"]).max(), np.asarray(mha["func"]).max())

    fig = plt.figure(figsize=(8, 8))
    for col, (name, data) in enumerate([("LN1", ln1), ("MHA", mha)]):
        U, V = np.meshgrid(data["u_coords"], data["v_coords"])
        ax3d = fig.add_subplot(2, 2, 1 + col, projection="3d")
        ax3d.plot_surface(U, V, np.asarray(data["func"]) / row1_max,
                          cmap="viridis", linewidth=0)
        ax3d.set_title(name)
        ax3d.set_zlim(0, 1)

        ax = fig.add_subplot(2, 2, 3 + col)
        cs = ax.contourf(data["u_coords"], data["v_coords"],
                         np.asarray(data["loss"]), levels=30, cmap="viridis")
        traj = np.asarray(data["traj"])
        if len(traj):
            ax.plot(traj[:, 0], traj[:, 1], "w.-", lw=1.5, markersize=4,
                    label="SGD trajectory")
            leg = ax.legend(fontsize=9, frameon=False)
            for text in leg.get_texts():
                text.set_color("white")
        if col == 0:
            ax.set_ylabel("Loss Landscape")
        else:
            fig.colorbar(cs, ax=ax)
    plt.tight_layout()
    if save:
        save_plot("loss_landscape")
    plt.close(fig)


def get_frames(trainable_component: str = "mha", block: int = 0,
               n_frames: int = 12) -> list:
    """Rotating 3-D surface frames (png) for gif assembly (reference :600+)."""
    from .common import set_style

    set_style()
    import matplotlib.pyplot as plt

    data = _load_surfaces(trainable_component, block)
    U, V = np.meshgrid(data["u_coords"], data["v_coords"])
    Z = np.asarray(data["func"])
    paths = []
    for i in range(n_frames):
        fig = plt.figure(figsize=(5, 4))
        ax = fig.add_subplot(111, projection="3d")
        ax.plot_surface(U, V, Z, cmap="viridis", linewidth=0)
        ax.view_init(elev=30, azim=360 * i / n_frames)
        ax.set_title(f"{trainable_component.upper()} block {block}")
        paths.append(save_plot(
            f"frame_{i:03d}", folder=f"{trainable_component}_block_{block}",
            format="png",
        ))
        plt.close(fig)
    return paths


def get_latex_frames(trainable_component: str = "mha", block: int = 0,
                     n_frames: int = 4) -> list:
    """Pdf frames for paper inclusion (reference get_latex_frames)."""
    paths = get_frames(trainable_component, block, n_frames=n_frames)
    return paths


def plot_gif(trainable_component: str = "mha", block: int = 0,
             n_frames: int = 12, fps: int = 8) -> None:
    """Assemble rotating-surface frames into a gif (reference plot_gif :1000+)."""
    import imageio.v2 as imageio

    paths = get_frames(trainable_component, block, n_frames=n_frames)
    frames = [imageio.imread(p) for p in paths]
    out = FIGURE_DIR / "loss_landscape" / f"{trainable_component}_block_{block}.gif"
    imageio.mimsave(out, frames, fps=fps)
    logger.info("Wrote %s", out)


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s [%(levelname)s] %(filename)s:%(lineno)d - %(message)s",
        handlers=[logging.StreamHandler()],
    )
    # Reference CLI surface (loss_landscape.py:1041-1049): save/plot/latex/
    # frames/gif; `results` and `analysis` kept as finer-grained extras.
    make_cli({"save": save_results, "plot": plot_figures,
              "results": get_results, "analysis": get_analysis,
              "latex": get_latex_frames, "frames": get_frames,
              "gif": plot_gif})


if __name__ == "__main__":
    main()
