"""Numerical parity: flax PerceiverBlock vs a minimal torch reimplementation
of one perceiver_pytorch depth step (cross-attn + GEGLU FF + self-attn + FF,
all pre-norm with residuals — the architecture the reference consumes at
``models/perceiver/perceiver.py:70-80``).

Mirrors the conv3d approach in tests/test_convert.py: build the block in
plain torch from the library's documented structure, convert the weights,
and require 1e-4 agreement on random inputs. perceiver_pytorch itself is not
installed; this pins the *semantics* (head split order, GEGLU chunk order,
exact-erf GELU, pre-norm residual wiring) rather than the import.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from predict_pv_yield_tpu.models.perceiver_core import PerceiverBlock  # noqa: E402

LATENT_DIM = 32
INPUT_DIM = 24
CROSS_HEADS = 1
LATENT_HEADS = 4
DIM_HEAD = 16


class TorchAttention(nn.Module):
    """perceiver_pytorch.Attention: q from x, k/v from context, no biases on
    projections, heads folded as ``(h d)`` with h slowest."""

    def __init__(self, query_dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Linear(inner, query_dim)

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        q = self.to_q(x).view(b, n, h, d).transpose(1, 2)
        k = self.to_k(context).view(b, context.shape[1], h, d).transpose(1, 2)
        v = self.to_v(context).view(b, context.shape[1], h, d).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-2, -1) * d**-0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, h * d)
        return self.to_out(out)


class TorchGEGLUFF(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net_in = nn.Linear(dim, dim * mult * 2)
        self.net_out = nn.Linear(dim * mult, dim)

    def forward(self, x):
        value, gate = self.net_in(x).chunk(2, dim=-1)
        return self.net_out(value * F.gelu(gate))


class TorchPerceiverBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.cross_norm = nn.LayerNorm(LATENT_DIM)
        self.cross_context_norm = nn.LayerNorm(INPUT_DIM)
        self.cross_attn = TorchAttention(LATENT_DIM, INPUT_DIM, CROSS_HEADS, DIM_HEAD)
        self.cross_ff_norm = nn.LayerNorm(LATENT_DIM)
        self.cross_ff = TorchGEGLUFF(LATENT_DIM)
        self.self_norm = nn.LayerNorm(LATENT_DIM)
        self.self_attn = TorchAttention(LATENT_DIM, LATENT_DIM, LATENT_HEADS, DIM_HEAD)
        self.self_ff_norm = nn.LayerNorm(LATENT_DIM)
        self.self_ff = TorchGEGLUFF(LATENT_DIM)

    def forward(self, latents, data):
        x = latents
        x = x + self.cross_attn(self.cross_norm(x), self.cross_context_norm(data))
        x = x + self.cross_ff(self.cross_ff_norm(x))
        x = x + self.self_attn(self.self_norm(x))
        x = x + self.self_ff(self.self_ff_norm(x))
        return x


def _dense(linear: nn.Linear, bias=True):
    params = {"kernel": linear.weight.detach().numpy().T}
    if bias:
        params["bias"] = linear.bias.detach().numpy()
    return params


def _norm(layer_norm: nn.LayerNorm):
    return {
        "scale": layer_norm.weight.detach().numpy(),
        "bias": layer_norm.bias.detach().numpy(),
    }


def _attention(attn: TorchAttention):
    return {
        "to_q": _dense(attn.to_q, bias=False),
        "to_k": _dense(attn.to_k, bias=False),
        "to_v": _dense(attn.to_v, bias=False),
        "to_out": _dense(attn.to_out),
    }


def _feed_forward(ff: TorchGEGLUFF):
    return {"in": _dense(ff.net_in), "out": _dense(ff.net_out)}


def test_perceiver_block_torch_parity():
    torch.manual_seed(0)
    torch_block = TorchPerceiverBlock().eval()

    rng = np.random.default_rng(0)
    latents = rng.standard_normal((2, 6, LATENT_DIM)).astype(np.float32)
    data = rng.standard_normal((2, 50, INPUT_DIM)).astype(np.float32)

    with torch.no_grad():
        y_torch = torch_block(torch.from_numpy(latents), torch.from_numpy(data)).numpy()

    block = PerceiverBlock(
        latent_dim=LATENT_DIM,
        cross_heads=CROSS_HEADS,
        latent_heads=LATENT_HEADS,
        cross_dim_head=DIM_HEAD,
        latent_dim_head=DIM_HEAD,
    )
    variables = {
        "params": {
            "cross_norm": _norm(torch_block.cross_norm),
            "cross_context_norm": _norm(torch_block.cross_context_norm),
            "cross_attn": _attention(torch_block.cross_attn),
            "cross_ff_norm": _norm(torch_block.cross_ff_norm),
            "cross_ff": _feed_forward(torch_block.cross_ff),
            "self_norm0": _norm(torch_block.self_norm),
            "self_attn0": _attention(torch_block.self_attn),
            "self_ff_norm0": _norm(torch_block.self_ff_norm),
            "self_ff0": _feed_forward(torch_block.self_ff),
        }
    }
    y_flax = np.asarray(block.apply(variables, jnp.asarray(latents), jnp.asarray(data)))
    np.testing.assert_allclose(y_flax, y_torch, rtol=1e-4, atol=1e-4)

    # the converted param tree is exactly the block's expected structure
    expected = jax.tree_util.tree_structure(
        block.init(jax.random.key(0), jnp.asarray(latents), jnp.asarray(data))
    )
    assert jax.tree_util.tree_structure(variables) == expected
