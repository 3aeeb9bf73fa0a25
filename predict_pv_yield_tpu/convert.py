"""PyTorch-checkpoint → flax parameter conversion.

The reference's trained artifacts are Lightning ``.ckpt`` files whose
``state_dict`` holds torch tensors (loading idiom at reference
``experiments/2021-09/2021-09-03/conv3d.py:10-23``; the documented conv3d
checkpoint is ``weights/conv3d/readme.md`` / Neptune PRED-189). This module
maps such state dicts onto the native flax modules so the NMAE-parity gate
(SURVEY §7 phase 4) can score reference weights inside this framework.

Layout translations:

* ``Conv3d.weight`` (O, I, D, H, W) → flax Conv kernel (D, H, W, I, O);
* ``Linear.weight`` (out, in) → Dense kernel (in, out);
* the Dense layer *after* a flattened conv tower additionally needs its
  input rows permuted: torch flattens channel-first (C, T, H, W), the native
  tower flattens channel-last (T, H, W, C) — ``flatten_permutation`` maps
  between the two orders;
* ``Embedding.weight`` → ``Embed.embedding`` unchanged.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def to_numpy(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        tensor = tensor.detach().cpu().numpy()
    return np.asarray(tensor, dtype=np.float32)


def conv3d_kernel(weight) -> np.ndarray:
    """(O, I, D, H, W) → (D, H, W, I, O)."""
    return to_numpy(weight).transpose(2, 3, 4, 1, 0)


def dense_kernel(weight) -> np.ndarray:
    """(out, in) → (in, out)."""
    return to_numpy(weight).T


def flatten_permutation(channels: int, time: int, height: int, width: int) -> np.ndarray:
    """perm such that ``torch_flat[perm] == native_flat`` for one example.

    torch order: index(c, t, h, w) = ((c·T + t)·H + h)·W + w
    native order: index(t, h, w, c) = ((t·H + h)·W + w)·C + c
    """
    torch_idx = np.arange(channels * time * height * width).reshape(
        channels, time, height, width
    )
    return torch_idx.transpose(1, 2, 3, 0).reshape(-1)


def dense_kernel_after_flatten(
    weight, channels: int, time: int, height: int, width: int
) -> np.ndarray:
    """Dense kernel fed by a flattened conv output, rows reordered from the
    torch (C,T,H,W) to the native (T,H,W,C) flatten order."""
    kernel = dense_kernel(weight)  # (in, out)
    perm = flatten_permutation(channels, time, height, width)
    return kernel[perm]


def _tower(state_dict: Mapping, prefix_fn, n_layers: int) -> Dict:
    params = {}
    for i in range(n_layers):
        name = prefix_fn(i)
        params[f"conv{i}"] = {
            "kernel": conv3d_kernel(state_dict[f"{name}.weight"]),
            "bias": to_numpy(state_dict[f"{name}.bias"]),
        }
    return params


def _dense(state_dict: Mapping, name: str) -> Dict:
    return {
        "kernel": dense_kernel(state_dict[f"{name}.weight"]),
        "bias": to_numpy(state_dict[f"{name}.bias"]),
    }


def strip_lightning_prefix(state_dict: Mapping) -> Dict:
    """Lightning checkpoints prefix module params with ``model.`` sometimes;
    also accepts the raw ``checkpoint["state_dict"]`` mapping."""
    out = {}
    for key, value in state_dict.items():
        if key.startswith("model."):
            key = key[len("model."):]
        out[key] = value
    return out


def convert_conv3d(state_dict: Mapping, model) -> Dict:
    """Reference ``models/conv3d/model.py`` state_dict → native conv3d params.

    ``model`` is the native ``predict_pv_yield_tpu.models.conv3d.Model`` whose
    static shape metadata drives the flatten permutation.
    """
    state_dict = strip_lightning_prefix(state_dict)
    n = model.number_of_conv3d_layers
    params: Dict = {}
    params["sat_tower"] = _tower(
        state_dict, lambda i: "sat_conv0" if i == 0 else f"conv3d_{i}", n
    )

    size = model.image_size_pixels - 2 * n
    time = model.seq_lens.seq_len_5 - 2 * n
    params["fc1"] = {
        "kernel": dense_kernel_after_flatten(
            state_dict["fc1.weight"], model.conv3d_channels, time, size, size
        ),
        "bias": to_numpy(state_dict["fc1.bias"]),
    }
    params["fc2"] = _dense(state_dict, "fc2")
    if model.include_nwp and "fc_nwp.weight" in state_dict:
        params["fc_nwp"] = _dense(state_dict, "fc_nwp")
    params["fc3"] = _dense(state_dict, "fc3")
    params["fc4"] = _dense(state_dict, "fc4")
    return {"params": params}


def convert_conv3d_sat_nwp(state_dict: Mapping, model) -> Dict:
    """Reference ``models/conv3d/model_sat_nwp.py`` state_dict → native params."""
    state_dict = strip_lightning_prefix(state_dict)
    n = model.number_of_conv3d_layers
    params: Dict = {}
    params["sat_tower"] = _tower(state_dict, lambda i: f"sat_conv{i}", n)

    sat_size = model.image_size_pixels - 2 * n
    sat_time = (
        model.seq_lens.seq_len_5
        if model.include_future_satellite
        else model.history_len_5 + 1
    )
    params["fc1"] = {
        "kernel": dense_kernel_after_flatten(
            state_dict["fc1.weight"], model.conv3d_channels, sat_time, sat_size, sat_size
        ),
        "bias": to_numpy(state_dict["fc1.bias"]),
    }
    params["fc2"] = _dense(state_dict, "fc2")

    if model.include_nwp and "nwp_conv0.weight" in state_dict:
        params["nwp_tower"] = _tower(state_dict, lambda i: f"nwp_conv{i}", n)
        nwp_size = model.nwp_image_size_pixels - 2 * n
        params["nwp_fc1"] = {
            "kernel": dense_kernel_after_flatten(
                state_dict["nwp_fc1.weight"],
                model.conv3d_channels,
                model.seq_lens.seq_len_60,
                nwp_size,
                nwp_size,
            ),
            "bias": to_numpy(state_dict["nwp_fc1.bias"]),
        }
        params["nwp_fc2"] = _dense(state_dict, "nwp_fc2")

    if model.include_pv_yield_history and "pv_fc1.weight" in state_dict:
        params["pv_fc1"] = _dense(state_dict, "pv_fc1")

    if model.embedding_dem and "pv_system_id_embedding.weight" in state_dict:
        params["pv_system_id_embedding"] = {
            "embedding": to_numpy(state_dict["pv_system_id_embedding.weight"])
        }

    params["fc3"] = _dense(state_dict, "fc3")
    params["fc4"] = _dense(state_dict, "fc4")
    return {"params": params}


def load_lightning_checkpoint(path: str) -> Dict:
    """Read a Lightning ``.ckpt`` (torch pickle) and return its state_dict."""
    import torch

    # weights_only=True (the torch>=2.6 default) refuses the pickled
    # hyper_parameters/Namespace objects real Lightning checkpoints carry;
    # these files are trusted local inputs supplied by the user
    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = checkpoint.get("state_dict", checkpoint)
    return strip_lightning_prefix(state_dict)


# ---------------------------------------------------------------------------
# reverse direction: native flax params → reference torch state_dict
# ---------------------------------------------------------------------------


def _export_conv3d_kernel(kernel) -> np.ndarray:
    """(D, H, W, I, O) → (O, I, D, H, W)."""
    return np.asarray(kernel, np.float32).transpose(4, 3, 0, 1, 2)


def _export_dense(params: Mapping, out: Dict, torch_name: str) -> None:
    out[f"{torch_name}.weight"] = np.asarray(params["kernel"], np.float32).T
    out[f"{torch_name}.bias"] = np.asarray(params["bias"], np.float32)


def _export_dense_after_flatten(
    params: Mapping, out: Dict, torch_name: str,
    channels: int, time: int, height: int, width: int,
) -> None:
    """Inverse of ``dense_kernel_after_flatten``: reorder the kernel rows
    back from the native (T,H,W,C) to the torch (C,T,H,W) flatten order."""
    perm = flatten_permutation(channels, time, height, width)
    native_kernel = np.asarray(params["kernel"], np.float32)  # (in, out)
    torch_rows = native_kernel[np.argsort(perm)]
    out[f"{torch_name}.weight"] = torch_rows.T
    out[f"{torch_name}.bias"] = np.asarray(params["bias"], np.float32)


def export_conv3d(variables: Mapping, model) -> Dict[str, np.ndarray]:
    """Native conv3d params → a torch-layout state_dict (numpy values; wrap
    with ``torch.from_numpy`` to ``load_state_dict`` into the reference
    architecture). Exact inverse of :func:`convert_conv3d`, so trained
    checkpoints flow back to reference users."""
    params = variables["params"]
    n = model.number_of_conv3d_layers
    out: Dict[str, np.ndarray] = {}
    for i in range(n):
        torch_name = "sat_conv0" if i == 0 else f"conv3d_{i}"
        conv = params["sat_tower"][f"conv{i}"]
        out[f"{torch_name}.weight"] = _export_conv3d_kernel(conv["kernel"])
        out[f"{torch_name}.bias"] = np.asarray(conv["bias"], np.float32)

    size = model.image_size_pixels - 2 * n
    time = model.seq_lens.seq_len_5 - 2 * n
    _export_dense_after_flatten(
        params["fc1"], out, "fc1", model.conv3d_channels, time, size, size
    )
    _export_dense(params["fc2"], out, "fc2")
    if "fc_nwp" in params:
        _export_dense(params["fc_nwp"], out, "fc_nwp")
    _export_dense(params["fc3"], out, "fc3")
    _export_dense(params["fc4"], out, "fc4")
    return out


# ---------------------------------------------------------------------------
# Perceiver family: torch (perceiver_pytorch layout) → native flax
# ---------------------------------------------------------------------------


def _norm_params(state_dict: Mapping, name: str) -> Dict:
    return {
        "scale": to_numpy(state_dict[f"{name}.weight"]),
        "bias": to_numpy(state_dict[f"{name}.bias"]),
    }


def _attention_params(state_dict: Mapping, prefix: str) -> Dict:
    return {
        "to_q": {"kernel": dense_kernel(state_dict[f"{prefix}.to_q.weight"])},
        "to_k": {"kernel": dense_kernel(state_dict[f"{prefix}.to_k.weight"])},
        "to_v": {"kernel": dense_kernel(state_dict[f"{prefix}.to_v.weight"])},
        "to_out": _dense(state_dict, f"{prefix}.to_out"),
    }


def _geglu_ff_params(state_dict: Mapping, prefix: str) -> Dict:
    return {
        "in": _dense(state_dict, f"{prefix}.net_in"),
        "out": _dense(state_dict, f"{prefix}.net_out"),
    }


def _perceiver_block_params(state_dict: Mapping, prefix: str) -> Dict:
    """One depth step (cross-attn + FF + one self-attn + FF, pre-norm)."""
    return {
        "cross_norm": _norm_params(state_dict, f"{prefix}.cross_norm"),
        "cross_context_norm": _norm_params(state_dict, f"{prefix}.cross_context_norm"),
        "cross_attn": _attention_params(state_dict, f"{prefix}.cross_attn"),
        "cross_ff_norm": _norm_params(state_dict, f"{prefix}.cross_ff_norm"),
        "cross_ff": _geglu_ff_params(state_dict, f"{prefix}.cross_ff"),
        "self_norm0": _norm_params(state_dict, f"{prefix}.self_norm"),
        "self_attn0": _attention_params(state_dict, f"{prefix}.self_attn"),
        "self_ff_norm0": _norm_params(state_dict, f"{prefix}.self_ff_norm"),
        "self_ff0": _geglu_ff_params(state_dict, f"{prefix}.self_ff"),
    }


def convert_perceiver_encoder(state_dict: Mapping, prefix: str = "") -> Dict:
    """Weight-tied perceiver_pytorch-layout state_dict → flax ``Perceiver``
    params (inner dict, no ``{"params": ...}`` wrapper so it composes into a
    parent model's tree).

    Expects the torch module names of the parity mirror (= the tying
    structure of perceiver_pytorch's ``cache_fn``, reference consumption
    ``models/perceiver/perceiver.py:70-80``): ``latents``, ``block0`` (the
    untied first depth step), ``block`` (the single shared set for steps
    1..depth-1 — absent when depth == 1), ``head_norm`` + ``to_logits``
    (the ``to_logits`` Sequential unpacked)."""
    p = f"{prefix}." if prefix else ""
    params: Dict = {
        "latents": to_numpy(state_dict[f"{p}latents"]),
        "block0": _perceiver_block_params(state_dict, f"{p}block0"),
        "head_norm": _norm_params(state_dict, f"{p}head_norm"),
        "to_logits": _dense(state_dict, f"{p}to_logits"),
    }
    if f"{p}block.cross_norm.weight" in state_dict:
        params["block"] = {"inner": _perceiver_block_params(state_dict, f"{p}block")}
    return params


def _gru_layer_params(state_dict: Mapping, prefix: str, layer: int) -> Dict:
    """One ``torch.nn.GRU`` layer → flax ``GRUCell`` params.

    torch packs gates row-wise in (r, z, n) order with TWO bias vectors;
    flax's GRUCell has one bias on the input denses only, except the ``hn``
    dense (the reset gate multiplies ``W_hn h + b_hn`` as a unit in both
    frameworks), so ``b_ih`` and ``b_hh`` merge exactly for r/z and stay
    separate for n."""
    w_ih = to_numpy(state_dict[f"{prefix}.weight_ih_l{layer}"])
    w_hh = to_numpy(state_dict[f"{prefix}.weight_hh_l{layer}"])
    b_ih = to_numpy(state_dict[f"{prefix}.bias_ih_l{layer}"])
    b_hh = to_numpy(state_dict[f"{prefix}.bias_hh_l{layer}"])
    h = w_hh.shape[1]
    return {
        "ir": {"kernel": w_ih[:h].T, "bias": b_ih[:h] + b_hh[:h]},
        "iz": {"kernel": w_ih[h:2 * h].T, "bias": b_ih[h:2 * h] + b_hh[h:2 * h]},
        "in": {"kernel": w_ih[2 * h:].T, "bias": b_ih[2 * h:]},
        "hr": {"kernel": w_hh[:h].T},
        "hz": {"kernel": w_hh[h:2 * h].T},
        "hn": {"kernel": w_hh[2 * h:].T, "bias": b_hh[2 * h:]},
    }


def convert_stacked_gru(state_dict: Mapping, prefix: str, num_layers: int = 2) -> Dict:
    """``torch.nn.GRU(num_layers=n, batch_first=True)`` → ``StackedGRU`` params."""
    return {
        f"gru{layer}": _gru_layer_params(state_dict, prefix, layer)
        for layer in range(num_layers)
    }


def convert_perceiver_model(state_dict: Mapping, model) -> Dict:
    """Reference ``models/perceiver/perceiver.py`` PerceiverModel state_dict
    → native ``PerceiverModel`` variables (full tree: encoder + fc head +
    ID embedding + GRU seq2seq).

    The encoder sub-layout is auto-detected: real reference checkpoints
    serialize ``perceiver_pytorch``'s module tree (``perceiver.layers.0.0.
    norm.weight``, fused ``to_kv`` — handled by
    :func:`convert_perceiver_pytorch_encoder`); the plain ``perceiver.
    block0.*`` layout is the parity-test mirror."""
    state_dict = strip_lightning_prefix(state_dict)
    if any(key.startswith("perceiver.layers.") for key in state_dict):
        encoder = convert_perceiver_pytorch_encoder(state_dict, "perceiver")
    else:
        encoder = convert_perceiver_encoder(state_dict, "perceiver")
    params: Dict = {
        "perceiver": encoder,
        "fc1": _dense(state_dict, "fc1"),
        "fc2": _dense(state_dict, "fc2"),
        "fc3": _dense(state_dict, "fc3"),
        "fc4": _dense(state_dict, "fc4"),
        "fc5": _dense(state_dict, "fc5"),
        "encoder_rnn": convert_stacked_gru(state_dict, "encoder_rnn"),
        "decoder_rnn": convert_stacked_gru(state_dict, "decoder_rnn"),
        "decoder_fc1": _dense(state_dict, "decoder_fc1"),
        "decoder_fc2": _dense(state_dict, "decoder_fc2"),
    }
    if model.embedding_dem and "pv_system_id_embedding.weight" in state_dict:
        params["pv_system_id_embedding"] = {
            "embedding": to_numpy(state_dict["pv_system_id_embedding.weight"])
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# reverse direction: native perceiver params → torch state_dict
# ---------------------------------------------------------------------------


def _export_norm(params: Mapping, out: Dict, torch_name: str) -> None:
    out[f"{torch_name}.weight"] = np.asarray(params["scale"], np.float32)
    out[f"{torch_name}.bias"] = np.asarray(params["bias"], np.float32)


def _export_dense_no_bias(params: Mapping, out: Dict, torch_name: str) -> None:
    out[f"{torch_name}.weight"] = np.asarray(params["kernel"], np.float32).T


def _export_attention(params: Mapping, out: Dict, prefix: str) -> None:
    _export_dense_no_bias(params["to_q"], out, f"{prefix}.to_q")
    _export_dense_no_bias(params["to_k"], out, f"{prefix}.to_k")
    _export_dense_no_bias(params["to_v"], out, f"{prefix}.to_v")
    _export_dense(params["to_out"], out, f"{prefix}.to_out")


def _export_block(params: Mapping, out: Dict, prefix: str) -> None:
    _export_norm(params["cross_norm"], out, f"{prefix}.cross_norm")
    _export_norm(params["cross_context_norm"], out, f"{prefix}.cross_context_norm")
    _export_attention(params["cross_attn"], out, f"{prefix}.cross_attn")
    _export_norm(params["cross_ff_norm"], out, f"{prefix}.cross_ff_norm")
    _export_dense(params["cross_ff"]["in"], out, f"{prefix}.cross_ff.net_in")
    _export_dense(params["cross_ff"]["out"], out, f"{prefix}.cross_ff.net_out")
    _export_norm(params["self_norm0"], out, f"{prefix}.self_norm")
    _export_attention(params["self_attn0"], out, f"{prefix}.self_attn")
    _export_norm(params["self_ff_norm0"], out, f"{prefix}.self_ff_norm")
    _export_dense(params["self_ff0"]["in"], out, f"{prefix}.self_ff.net_in")
    _export_dense(params["self_ff0"]["out"], out, f"{prefix}.self_ff.net_out")


def export_perceiver_encoder(params: Mapping, out: Dict, prefix: str = "") -> None:
    """Flax ``Perceiver`` params → the torch-mirror layout (inverse of
    :func:`convert_perceiver_encoder`).

    Only the weight-TIED single-self-attn layout is supported (the only
    configuration the reference uses); anything else must fail loudly —
    silently exporting a subset would drop trained weights."""
    unsupported = sorted(
        key for key in params
        if key not in ("latents", "block0", "block", "head_norm", "to_logits")
    )
    if unsupported:
        raise NotImplementedError(
            f"cannot export Perceiver params {unsupported}: only the "
            "weight-tied block0+block layout is supported"
        )
    if any(key.startswith("self_attn") and key != "self_attn0"
           for key in params["block0"]):
        raise NotImplementedError(
            "cannot export self_per_cross_attn > 1 Perceivers"
        )
    p = f"{prefix}." if prefix else ""
    out[f"{p}latents"] = np.asarray(params["latents"], np.float32)
    _export_block(params["block0"], out, f"{p}block0")
    if "block" in params:
        _export_block(params["block"]["inner"], out, f"{p}block")
    _export_norm(params["head_norm"], out, f"{p}head_norm")
    _export_dense(params["to_logits"], out, f"{p}to_logits")


def _export_gru_layer(params: Mapping, out: Dict, prefix: str, layer: int) -> None:
    """Inverse of :func:`_gru_layer_params`. The merged r/z biases cannot be
    split back into torch's two vectors uniquely; the exact functional
    inverse puts the merged bias in ``bias_ih`` and zeros ``bias_hh`` for
    r/z (b_hn keeps its own slot — it sits inside the reset-gate product)."""
    h = np.asarray(params["hr"]["kernel"], np.float32).shape[0]
    w_ih = np.concatenate([
        np.asarray(params[g]["kernel"], np.float32).T for g in ("ir", "iz", "in")
    ])
    w_hh = np.concatenate([
        np.asarray(params[g]["kernel"], np.float32).T for g in ("hr", "hz", "hn")
    ])
    b_ih = np.concatenate([
        np.asarray(params["ir"]["bias"], np.float32),
        np.asarray(params["iz"]["bias"], np.float32),
        np.asarray(params["in"]["bias"], np.float32),
    ])
    b_hh = np.concatenate([
        np.zeros(h, np.float32),
        np.zeros(h, np.float32),
        np.asarray(params["hn"]["bias"], np.float32),
    ])
    out[f"{prefix}.weight_ih_l{layer}"] = w_ih
    out[f"{prefix}.weight_hh_l{layer}"] = w_hh
    out[f"{prefix}.bias_ih_l{layer}"] = b_ih
    out[f"{prefix}.bias_hh_l{layer}"] = b_hh


def export_stacked_gru(params: Mapping, out: Dict, prefix: str) -> None:
    for layer in range(len(params)):
        _export_gru_layer(params[f"gru{layer}"], out, prefix, layer)


# ---------------------------------------------------------------------------
# the REAL perceiver_pytorch state_dict layout (what reference checkpoints
# actually contain: PreNorm wrappers, fused to_kv, nn.ModuleList indices,
# to_logits Sequential — perceiver_pytorch/perceiver_pytorch.py)
# ---------------------------------------------------------------------------


def _attention_params_from_kv(state_dict: Mapping, prefix: str) -> Dict:
    """perceiver_pytorch fuses K and V into one ``to_kv`` projection;
    k, v = to_kv(context).chunk(2, dim=-1) → K is the FIRST inner rows."""
    kv = to_numpy(state_dict[f"{prefix}.to_kv.weight"])  # (2·inner, context)
    inner = kv.shape[0] // 2
    return {
        "to_q": {"kernel": dense_kernel(state_dict[f"{prefix}.to_q.weight"])},
        "to_k": {"kernel": kv[:inner].T},
        "to_v": {"kernel": kv[inner:].T},
        "to_out": _dense(state_dict, f"{prefix}.to_out"),
    }


def _real_block_params(state_dict: Mapping, layer: str, nested: bool) -> Dict:
    """One ``layers.{i}`` entry: [cross PreNorm, cross-FF PreNorm, latent
    attn/ff — nested ``ModuleList`` in self_per_cross_attn builds, flat
    indices 2/3 in older ones]."""
    params = {
        "cross_norm": _norm_params(state_dict, f"{layer}.0.norm"),
        "cross_context_norm": _norm_params(state_dict, f"{layer}.0.norm_context"),
        "cross_attn": _attention_params_from_kv(state_dict, f"{layer}.0.fn"),
        "cross_ff_norm": _norm_params(state_dict, f"{layer}.1.norm"),
        "cross_ff": {
            "in": _dense(state_dict, f"{layer}.1.fn.net.0"),
            "out": _dense(state_dict, f"{layer}.1.fn.net.2"),
        },
    }
    if nested:
        index = 0
        while f"{layer}.2.{index}.0.norm.weight" in state_dict:
            params[f"self_norm{index}"] = _norm_params(
                state_dict, f"{layer}.2.{index}.0.norm"
            )
            params[f"self_attn{index}"] = _attention_params_from_kv(
                state_dict, f"{layer}.2.{index}.0.fn"
            )
            params[f"self_ff_norm{index}"] = _norm_params(
                state_dict, f"{layer}.2.{index}.1.norm"
            )
            params[f"self_ff{index}"] = {
                "in": _dense(state_dict, f"{layer}.2.{index}.1.fn.net.0"),
                "out": _dense(state_dict, f"{layer}.2.{index}.1.fn.net.2"),
            }
            index += 1
    else:
        params["self_norm0"] = _norm_params(state_dict, f"{layer}.2.norm")
        params["self_attn0"] = _attention_params_from_kv(state_dict, f"{layer}.2.fn")
        params["self_ff_norm0"] = _norm_params(state_dict, f"{layer}.3.norm")
        params["self_ff0"] = {
            "in": _dense(state_dict, f"{layer}.3.fn.net.0"),
            "out": _dense(state_dict, f"{layer}.3.fn.net.2"),
        }
    return params


def convert_perceiver_pytorch_encoder(state_dict: Mapping, prefix: str = "") -> Dict:
    """A real ``perceiver_pytorch.Perceiver`` state_dict (weight-tied) →
    flax ``Perceiver`` params. Only the tied configuration the reference
    uses is importable; untied checkpoints raise."""
    p = f"{prefix}." if prefix else ""
    nested = any(
        key.startswith(f"{p}layers.0.2.0.") for key in state_dict
    )
    depth = 0
    while f"{p}layers.{depth}.0.norm.weight" in state_dict:
        depth += 1
    if depth == 0:
        raise KeyError(f"no perceiver_pytorch layers under prefix {prefix!r}")
    params: Dict = {
        "latents": to_numpy(state_dict[f"{p}latents"]),
        "block0": _real_block_params(state_dict, f"{p}layers.0", nested),
    }
    if depth > 1:
        params["block"] = {
            "inner": _real_block_params(state_dict, f"{p}layers.1", nested)
        }
        # cache_fn ties layers 1..depth-1: the serialized copies must agree
        shared = to_numpy(state_dict[f"{p}layers.1.0.fn.to_q.weight"])
        for i in range(2, depth):
            if not np.array_equal(
                to_numpy(state_dict[f"{p}layers.{i}.0.fn.to_q.weight"]), shared
            ):
                raise NotImplementedError(
                    "untied perceiver_pytorch checkpoint "
                    "(weight_tie_layers=False) is not supported"
                )
    # to_logits: Sequential(Reduce, LayerNorm, Linear) → .1/.2 in modern
    # builds; Sequential(LayerNorm, Linear) → .0/.1 in older ones
    if f"{p}to_logits.2.weight" in state_dict:
        norm_key, linear_key = f"{p}to_logits.1", f"{p}to_logits.2"
    else:
        norm_key, linear_key = f"{p}to_logits.0", f"{p}to_logits.1"
    params["head_norm"] = _norm_params(state_dict, norm_key)
    params["to_logits"] = _dense(state_dict, linear_key)
    return params


def _export_attention_to_kv(params: Mapping, out: Dict, prefix: str) -> None:
    out[f"{prefix}.to_q.weight"] = np.asarray(params["to_q"]["kernel"], np.float32).T
    out[f"{prefix}.to_kv.weight"] = np.concatenate([
        np.asarray(params["to_k"]["kernel"], np.float32).T,
        np.asarray(params["to_v"]["kernel"], np.float32).T,
    ])
    _export_dense(params["to_out"], out, f"{prefix}.to_out")


def _export_real_block(params: Mapping, out: Dict, layer: str) -> None:
    """Inverse of ``_real_block_params`` in the modern nested sublayout."""
    _export_norm(params["cross_norm"], out, f"{layer}.0.norm")
    _export_norm(params["cross_context_norm"], out, f"{layer}.0.norm_context")
    _export_attention_to_kv(params["cross_attn"], out, f"{layer}.0.fn")
    _export_norm(params["cross_ff_norm"], out, f"{layer}.1.norm")
    _export_dense(params["cross_ff"]["in"], out, f"{layer}.1.fn.net.0")
    _export_dense(params["cross_ff"]["out"], out, f"{layer}.1.fn.net.2")
    _export_norm(params["self_norm0"], out, f"{layer}.2.0.0.norm")
    _export_attention_to_kv(params["self_attn0"], out, f"{layer}.2.0.0.fn")
    _export_norm(params["self_ff_norm0"], out, f"{layer}.2.0.1.norm")
    _export_dense(params["self_ff0"]["in"], out, f"{layer}.2.0.1.fn.net.0")
    _export_dense(params["self_ff0"]["out"], out, f"{layer}.2.0.1.fn.net.2")


def export_perceiver_pytorch_encoder(
    params: Mapping, out: Dict, depth: int, prefix: str = ""
) -> None:
    """Flax ``Perceiver`` params → a real perceiver_pytorch state_dict
    (modern nested sublayout; ``to_logits`` Sequential(Reduce, LN, Linear)).
    Tied layers 1..depth-1 are materialised at every index, exactly as
    ``nn.ModuleList`` serializes shared modules."""
    p = f"{prefix}." if prefix else ""
    out[f"{p}latents"] = np.asarray(params["latents"], np.float32)
    _export_real_block(params["block0"], out, f"{p}layers.0")
    if depth > 1:
        if "block" not in params:
            raise ValueError(f"depth {depth} but no tied 'block' params")
        for i in range(1, depth):
            _export_real_block(params["block"]["inner"], out, f"{p}layers.{i}")
    _export_norm(params["head_norm"], out, f"{p}to_logits.1")
    _export_dense(params["to_logits"], out, f"{p}to_logits.2")


def export_perceiver_model(
    variables: Mapping, model, layout: str = "perceiver_pytorch"
) -> Dict[str, np.ndarray]:
    """Native ``PerceiverModel`` params → a torch state_dict so checkpoints
    trained here flow back to reference users.

    ``layout="perceiver_pytorch"`` (default) targets the REAL library
    layout the reference's model serializes (loadable with
    ``load_state_dict(strict=True)``); ``layout="mirror"`` targets the
    plain torch mirror used by the parity tests. GRU biases are exported as
    the functional inverse — see :func:`_export_gru_layer`."""
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    if layout == "perceiver_pytorch":
        export_perceiver_pytorch_encoder(
            params["perceiver"], out, model.total_seq_length, "perceiver"
        )
    elif layout == "mirror":
        export_perceiver_encoder(params["perceiver"], out, "perceiver")
    else:
        raise ValueError(f"unknown layout {layout!r}")
    for name in ("fc1", "fc2", "fc3", "fc4", "fc5"):
        _export_dense(params[name], out, name)
    if "pv_system_id_embedding" in params:
        out["pv_system_id_embedding.weight"] = np.asarray(
            params["pv_system_id_embedding"]["embedding"], np.float32
        )
    export_stacked_gru(params["encoder_rnn"], out, "encoder_rnn")
    export_stacked_gru(params["decoder_rnn"], out, "decoder_rnn")
    _export_dense(params["decoder_fc1"], out, "decoder_fc1")
    _export_dense(params["decoder_fc2"], out, "decoder_fc2")
    return out
