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

    checkpoint = torch.load(path, map_location="cpu")
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
