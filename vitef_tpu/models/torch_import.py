"""Convert torch-layout state dicts into vitef_tpu parameter pytrees.

Two layers of mapping, matching the reference contracts:

  1. :func:`from_vitef_state_dict` — reference-vitef module names (the layout the
     reference caches as ``checkpoints/vit/<model>.pt``, reference vit.py:214-312)
     → our param pytree. torch Linear/Conv weights are (out, in)/(E, C, P, P);
     ours are (in, out)/(C·P·P, E), so this transposes/reshapes.
  2. :func:`hf_vit_to_vitef` / :func:`hf_gpt2_to_vitef` — HuggingFace model names
     → reference-vitef names, reproducing the exact key correspondence maps of
     reference vit.py:263-303 (incl. q/k/v concat into fused qkv) and
     gpt2.py:194-231 (incl. Conv1D transpose + wpe unsqueeze).

All values are numpy arrays (no torch dependency at call time — callers convert).
"""

from __future__ import annotations

import numpy as np


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _set(tree: dict, dotted: str, value) -> None:
    keys = dotted.split(".")
    cur = tree
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


def from_vitef_state_dict(sd: dict[str, np.ndarray], n_layers: int) -> dict:
    """vitef-named torch-layout state dict → vitef_tpu param pytree."""
    import jax.numpy as jnp

    tree: dict = {"embedding": {}, "output": {}}
    emb = tree["embedding"]

    def take(name):
        return sd.pop(name) if name in sd else None

    # Embedding
    v = take("embedding.cls_token")
    if v is not None:
        emb["cls_token"] = jnp.asarray(v)
    v = take("embedding.pos_emb")
    if v is not None:
        emb["pos_emb"] = jnp.asarray(v)
    w = take("embedding.patching.patching.0.weight")  # (E, C, P, P)
    if w is not None:
        conv = {"weight": jnp.asarray(_t(w.reshape(w.shape[0], -1)))}
        b = take("embedding.patching.patching.0.bias")
        if b is not None:
            conv["bias"] = jnp.asarray(b)
        emb["patching"] = {"conv": conv}
    w = take("embedding.token_emb.weight")
    if w is not None:
        b = take("embedding.token_emb.bias")
        if b is None:
            emb["token_emb"] = {"weight": jnp.asarray(w)}  # dict embedding: (V, E)
        else:
            emb["token_emb"] = {"weight": jnp.asarray(_t(w)), "bias": jnp.asarray(b)}

    def take_norm(prefix: str) -> dict:
        # LayerNorm/RMSNorm: <prefix>.weight/.bias; BatchNorm wrapper:
        # <prefix>.batchnorm.weight/.bias + running stats (kept — eval-mode
        # batch norm reads them; norms.apply_norm deterministic path).
        if prefix + ".weight" in sd:
            p = {"weight": jnp.asarray(sd.pop(prefix + ".weight"))}
            b = take(prefix + ".bias")
        else:
            p = {"weight": jnp.asarray(sd.pop(prefix + ".batchnorm.weight"))}
            b = take(prefix + ".batchnorm.bias")
            for stat, name in ((".running_mean", "running_mean"),
                               (".running_var", "running_var")):
                v = sd.pop(prefix + ".batchnorm" + stat, None)
                if v is not None:
                    p[name] = jnp.asarray(v)
            sd.pop(prefix + ".batchnorm.num_batches_tracked", None)
        if b is not None:
            p["bias"] = jnp.asarray(b)
        return p

    # Blocks
    blocks = []
    for i in range(n_layers):
        pre = f"blocks.{i}."
        block: dict = {}
        for norm in ("attn_norm", "ffn_norm"):
            block[norm] = take_norm(pre + norm)
        attn = {}
        for ours, theirs in (("qkv_mat", "attn.qkv_mat"), ("output", "attn.output")):
            p = {"weight": jnp.asarray(_t(sd.pop(pre + theirs + ".weight")))}
            b = take(pre + theirs + ".bias")
            if b is not None:
                p["bias"] = jnp.asarray(b)
            attn[ours] = p
        block["attn"] = attn
        ffn = {}
        for fc in ("fc1", "fc2"):
            p = {"weight": jnp.asarray(_t(sd.pop(pre + f"ffn.{fc}.weight")))}
            b = take(pre + f"ffn.{fc}.bias")
            if b is not None:
                p["bias"] = jnp.asarray(b)
            ffn[fc] = p
        block["ffn"] = ffn
        blocks.append(block)
    tree["blocks"] = blocks

    # Output head (names: reference transformer/utils.py ClassificationLayer
    # output_norm/output, Seq2SeqLayer output_norm/output, ForecastingLayer output)
    out_layer: dict = {}
    if ("output.output_layer.output_norm.weight" in sd
            or "output.output_layer.output_norm.batchnorm.weight" in sd):
        out_layer["norm"] = take_norm("output.output_layer.output_norm")
    w = take("output.output_layer.output.weight")
    if w is not None:
        p = {"weight": jnp.asarray(_t(w))}
        b = take("output.output_layer.output.bias")
        if b is not None:
            p["bias"] = jnp.asarray(b)
        out_layer["head"] = p
    tree["output"] = {"output_layer": out_layer}
    return tree


def hf_vit_to_vitef(hf: dict[str, np.ndarray], n_layers: int) -> dict[str, np.ndarray]:
    """HF ViTForImageClassification state dict → vitef-named torch-layout dict.

    Exact correspondence of reference vit.py:263-303, including the concat of
    separate q/k/v into the fused qkv matrix.
    """
    out: dict[str, np.ndarray] = {
        "embedding.cls_token": hf["vit.embeddings.cls_token"],
        "embedding.patching.patching.0.weight": hf["vit.embeddings.patch_embeddings.projection.weight"],
        "embedding.patching.patching.0.bias": hf["vit.embeddings.patch_embeddings.projection.bias"],
        "embedding.pos_emb": hf["vit.embeddings.position_embeddings"],
        "output.output_layer.output_norm.weight": hf["vit.layernorm.weight"],
        "output.output_layer.output_norm.bias": hf["vit.layernorm.bias"],
        "output.output_layer.output.weight": hf["classifier.weight"],
        "output.output_layer.output.bias": hf["classifier.bias"],
    }
    for i in range(n_layers):
        h = f"vit.encoder.layer.{i}."
        v = f"blocks.{i}."
        out[v + "attn_norm.weight"] = hf[h + "layernorm_before.weight"]
        out[v + "attn_norm.bias"] = hf[h + "layernorm_before.bias"]
        out[v + "attn.output.weight"] = hf[h + "attention.output.dense.weight"]
        out[v + "attn.output.bias"] = hf[h + "attention.output.dense.bias"]
        out[v + "ffn_norm.weight"] = hf[h + "layernorm_after.weight"]
        out[v + "ffn_norm.bias"] = hf[h + "layernorm_after.bias"]
        out[v + "ffn.fc1.weight"] = hf[h + "intermediate.dense.weight"]
        out[v + "ffn.fc1.bias"] = hf[h + "intermediate.dense.bias"]
        out[v + "ffn.fc2.weight"] = hf[h + "output.dense.weight"]
        out[v + "ffn.fc2.bias"] = hf[h + "output.dense.bias"]
        out[v + "attn.qkv_mat.weight"] = np.concatenate(
            [hf[h + f"attention.attention.{m}.weight"] for m in ("query", "key", "value")],
            axis=0,
        )
        out[v + "attn.qkv_mat.bias"] = np.concatenate(
            [hf[h + f"attention.attention.{m}.bias"] for m in ("query", "key", "value")],
            axis=0,
        )
    return out


def hf_gpt2_to_vitef(hf: dict[str, np.ndarray], n_layers: int) -> dict[str, np.ndarray]:
    """HF GPT2LMHeadModel state dict → vitef-named torch-layout dict.

    Exact correspondence of reference gpt2.py:194-231: HF Conv1D weights are
    (in, out) so they are transposed to torch-Linear (out, in); wpe gets a
    leading batch dim.
    """
    out: dict[str, np.ndarray] = {
        "embedding.token_emb.weight": hf["transformer.wte.weight"],
        "embedding.pos_emb": hf["transformer.wpe.weight"][None],
        "output.output_layer.output_norm.weight": hf["transformer.ln_f.weight"],
        "output.output_layer.output_norm.bias": hf["transformer.ln_f.bias"],
        "output.output_layer.output.weight": hf["lm_head.weight"],
    }
    for i in range(n_layers):
        h = f"transformer.h.{i}."
        v = f"blocks.{i}."
        out[v + "attn_norm.weight"] = hf[h + "ln_1.weight"]
        out[v + "attn_norm.bias"] = hf[h + "ln_1.bias"]
        out[v + "attn.qkv_mat.weight"] = _t(hf[h + "attn.c_attn.weight"])
        out[v + "attn.qkv_mat.bias"] = hf[h + "attn.c_attn.bias"]
        out[v + "attn.output.weight"] = _t(hf[h + "attn.c_proj.weight"])
        out[v + "attn.output.bias"] = hf[h + "attn.c_proj.bias"]
        out[v + "ffn_norm.weight"] = hf[h + "ln_2.weight"]
        out[v + "ffn_norm.bias"] = hf[h + "ln_2.bias"]
        out[v + "ffn.fc1.weight"] = _t(hf[h + "mlp.c_fc.weight"])
        out[v + "ffn.fc1.bias"] = hf[h + "mlp.c_fc.bias"]
        out[v + "ffn.fc2.weight"] = _t(hf[h + "mlp.c_proj.weight"])
        out[v + "ffn.fc2.bias"] = hf[h + "mlp.c_proj.bias"]
    return out


def hf_llama_to_vitef(hf: dict[str, np.ndarray], n_layers: int) -> dict[str, np.ndarray]:
    """HF LlamaForCausalLM state dict → vitef-named torch-layout dict.

    Beyond-parity family (the reference stops at ViT/GPT2/PatchTST). Key
    subtleties: q/k/v concat into the fused qkv (k/v are n_kv_heads wide —
    GQA), gate_proj/up_proj concat into the packed swiglu fc1 ([gate ++ up],
    matching transformer.apply_ffn's split), RMSNorms have no bias, the head
    is untied, and HF llama stores q/k in the rotate_half RoPE convention —
    the same one models/rope.py implements, so weights import unchanged.
    """
    out: dict[str, np.ndarray] = {
        "embedding.token_emb.weight": hf["model.embed_tokens.weight"],
        "output.output_layer.output_norm.weight": hf["model.norm.weight"],
        "output.output_layer.output.weight": hf["lm_head.weight"],
    }
    for i in range(n_layers):
        h = f"model.layers.{i}."
        v = f"blocks.{i}."
        out[v + "attn_norm.weight"] = hf[h + "input_layernorm.weight"]
        out[v + "ffn_norm.weight"] = hf[h + "post_attention_layernorm.weight"]
        out[v + "attn.qkv_mat.weight"] = np.concatenate(
            [hf[h + f"self_attn.{m}_proj.weight"] for m in ("q", "k", "v")],
            axis=0)
        out[v + "attn.output.weight"] = hf[h + "self_attn.o_proj.weight"]
        out[v + "ffn.fc1.weight"] = np.concatenate(
            [hf[h + "mlp.gate_proj.weight"], hf[h + "mlp.up_proj.weight"]],
            axis=0)
        out[v + "ffn.fc2.weight"] = hf[h + "mlp.down_proj.weight"]
    return out


def torch_state_dict_to_numpy(sd) -> dict[str, np.ndarray]:
    """torch state dict → {name: numpy} (detached, cpu)."""
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}
