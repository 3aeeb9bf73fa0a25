"""Shared neural layers, laid out for TPU.

All image-like tensors inside models are channel-last ``(B, T, H, W, C)`` —
XLA's preferred conv layout on TPU (the MXU tiles the trailing feature
dimension). Batches arrive channel-first ``(B, C, T, H, W)`` to match the
reference's on-disk contract and are transposed once on entry; XLA folds the
transpose into the first convolution.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def to_channel_last(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T, H, W) -> (B, T, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def checked_ids(ids: jnp.ndarray, num_embeddings: int) -> jnp.ndarray:
    """int32 ids with out-of-range entries redirected to a loud NaN.

    flax's ``nn.Embed`` silently WRAPS negative ids onto valid rows and
    NaNs too-large ones; torch's ``nn.Embedding`` (the reference) raises
    IndexError either way. Raising on data-dependent values is impossible
    inside jit, so the honest analog is: clamp invalid ids to row 0 and
    let the CALLER NaN those embedding rows — a bad system id then
    surfaces as a NaN loss (caught by ``terminate_on_nan``/``debug_nans``)
    instead of silently training on an arbitrary embedding row.

    Returns ``(safe_ids, invalid_mask)``.
    """
    ids = ids.astype(jnp.int32)
    invalid = (ids < 0) | (ids >= num_embeddings)
    return jnp.where(invalid, 0, ids), invalid


def embed_checked(embed: nn.Embed, ids: jnp.ndarray) -> jnp.ndarray:
    """Apply an Embed with :func:`checked_ids` semantics — invalid ids
    produce NaN rows instead of wrapped/arbitrary embeddings."""
    safe, invalid = checked_ids(ids, embed.num_embeddings)
    rows = embed(safe)
    return jnp.where(invalid[..., None], jnp.nan, rows)


class Conv3dTower(nn.Module):
    """N stacked 3-D convolutions with ReLU, kernel 3×3×3.

    Native equivalent of the reference's hand-rolled conv stacks
    (``models/conv3d/model.py:80-90``, ``model_sat_nwp.py:102-139``).
    ``pad_time=True`` reproduces the sat_nwp variant's ``padding=(1, 0, 0)``
    (time preserved, H/W valid); ``pad_time=False`` the plain model's
    ``padding=0`` (all dims valid).
    """

    channels: int
    num_layers: int
    pad_time: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, H, W, C)
        time_pad: Tuple[int, int] = (1, 1) if self.pad_time else (0, 0)
        padding = [time_pad, (0, 0), (0, 0)]
        for i in range(self.num_layers):
            x = nn.Conv(
                features=self.channels,
                kernel_size=(3, 3, 3),
                padding=padding,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Dense stack with ReLU between layers (and optionally after the last)."""

    features: Sequence[int]
    final_relu: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(features=f, dtype=self.dtype, name=f"fc{i}")(x)
            if i + 1 < len(self.features) or self.final_relu:
                x = nn.relu(x)
        return x


class StackedGRU(nn.Module):
    """Multi-layer GRU over a (B, T, F) sequence via ``lax.scan``.

    Native equivalent of ``nn.GRU(num_layers=2, batch_first=True)``
    (reference ``perceiver.py:94-106``). Returns the top-layer output sequence
    and the final hidden state of every layer so an encoder's carry can seed a
    decoder (reference ``perceiver.py:193-194``).

    The scan is sequential by construction (hidden size 16 in the reference —
    the FLOPs are negligible; correctness over parallelism, SURVEY §7).
    ``unroll`` trades compile time for fewer scan iterations on TPU.
    """

    hidden_size: int
    num_layers: int = 2
    unroll: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        initial_carry: Optional[Tuple[jnp.ndarray, ...]] = None,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        carries = []
        out = x
        for layer in range(self.num_layers):
            cell = nn.GRUCell(features=self.hidden_size, dtype=self.dtype, name=f"gru{layer}")
            if initial_carry is not None:
                carry0 = initial_carry[layer]
            else:
                carry0 = jnp.zeros((x.shape[0], self.hidden_size), dtype=out.dtype)
            rnn = nn.RNN(cell, unroll=self.unroll, name=f"rnn{layer}")
            carry, out = rnn(out, initial_carry=carry0, return_carry=True)
            carries.append(carry)
        return out, tuple(carries)


class Conv3dMaxPool(nn.Module):
    """Conv3d (k3, SAME) + MaxPool3d (k3, stride (1, 2, 2), pad 1): halves H and
    W, keeps T (reference ``perceiver_conv3d_nwp_sat.py:42-57``)."""

    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, H, W, C)
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(3, 3, 3),
            padding=[(1, 1), (1, 1), (1, 1)],
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.max_pool(
            x,
            window_shape=(3, 3, 3),
            strides=(1, 2, 2),
            padding=[(1, 1), (1, 1), (1, 1)],
        )
