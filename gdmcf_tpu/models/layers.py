"""Functional NN primitives: params are plain pytrees, applies are pure.

Initialization matches the reference exactly (``/root/reference/models/DNN.py``):
  - Linear: weight ~ N(0, sqrt(2/(fan_in+fan_out))) ("Xavier-normal"),
    bias ~ N(0, 0.001)   (ref init_weights, e.g. DNN.py:42-70)
  - Embedding tables: Xavier-uniform (ref DNN.py:599-600)
  - GCNConv: Xavier-uniform weight, zero bias (torch_geometric glorot default)

Weights are stored [d_in, d_out] (JAX convention; the transpose of torch's
[out, in]) so applies are plain ``x @ w + b`` feeding the MXU directly.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> dict:
    """Reference Linear init: Xavier-normal weight, N(0, 0.001) bias."""
    kw, kb = jax.random.split(key)
    std = math.sqrt(2.0 / (d_in + d_out))
    return {
        "w": jax.random.normal(kw, (d_in, d_out), dtype) * std,
        "b": jax.random.normal(kb, (d_out,), dtype) * 0.001,
    }


def xavier_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    fan_in, fan_out = shape[0], shape[1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def gcn_conv_init(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> dict:
    """torch_geometric GCNConv default init: glorot weight, zero bias."""
    return {
        "w": xavier_uniform(key, (d_in, d_out), dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def mlp_init(key: jax.Array, dims: Sequence[int], dtype=jnp.float32) -> List[dict]:
    """A stack of Linear layers over consecutive dim pairs."""
    keys = jax.random.split(key, max(len(dims) - 1, 1))
    return [linear_init(k, d_in, d_out, dtype)
            for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])]


# ---------------------------------------------------------------------------
# applies
# ---------------------------------------------------------------------------

def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def mlp_tanh(layers: List[dict], h: jnp.ndarray) -> jnp.ndarray:
    """tanh after every layer (reference in_layers loop, DNN.py:79-81)."""
    for p in layers:
        h = jnp.tanh(linear(p, h))
    return h


def mlp_out(layers: List[dict], h: jnp.ndarray, act=jnp.tanh) -> jnp.ndarray:
    """Activation after every layer except the last (ref out_layers loop)."""
    for i, p in enumerate(layers):
        h = linear(p, h)
        if i != len(layers) - 1:
            h = act(h)
    return h


def dropout(key: Optional[jax.Array], x: jnp.ndarray, rate: float,
            train: bool) -> jnp.ndarray:
    """Inverted dropout matching torch.nn.Dropout (scale 1/(1-p) at train)."""
    if not train or rate == 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal [cos || sin] timestep embedding (ref DNN.py:1806-1825)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize equivalent (clamped L2 norm)."""
    norm = jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    return x / norm


def cosine_scores(user_vecs: jnp.ndarray, item_table: jnp.ndarray,
                  eps: float = 0.0) -> jnp.ndarray:
    """Full-catalog cosine similarity head (ref cosine_similarity_cuda,
    DNN.py:1304-1327): one [B,D] @ [D,N] matmul on the MXU, normalized.

    ``eps=0.0`` (default) is bit-faithful to the reference: no denominator
    guard, so a zero-norm user vector or item row NaNs its scores. The
    corrected mode (``Config.fidelity=False``) passes a small eps.
    """
    u_norm = jnp.linalg.norm(user_vecs, axis=1, keepdims=True)
    i_norm = jnp.linalg.norm(item_table, axis=1)
    denom = u_norm * i_norm[None, :]
    if eps:
        denom = jnp.maximum(denom, eps)
    return (user_vecs @ item_table.T) / denom


# NT-Xent inner form: "softmax" materializes the normalized [B, B] matrix
# (the shape the reference computes); "lse" needs only the row logsumexp and
# the diagonal. Same math — switchable for the on-chip A/B
# (benchmarks/ab_ntxent.py). "auto" (default) routes on the STATIC batch
# size: at the recipe's 1024 the forms are within measurement noise
# (round-3 A/B, BENCH_NOTES dead-end #3), but once the quadratic [B,B]
# term dominates the step the lse form's avoided materialization is a real
# HBM win — measured 8.17 -> 7.29 ms/step (-10.7%) at batch 4096
# (BENCH_NOTES round-4 "large-batch NT-Xent"). Threshold = the measured
# crossover.
_NT_XENT_IMPL = "auto"
_NT_XENT_LSE_MIN_BATCH = 4096


def _resolve_ntxent_impl(batch: int) -> str:
    """'auto' -> concrete form by static batch size; explicit forms pass
    through (the A/B + form-equality tests set them directly)."""
    if _NT_XENT_IMPL != "auto":
        return _NT_XENT_IMPL
    return "lse" if batch >= _NT_XENT_LSE_MIN_BATCH else "softmax"


def nt_xent_softmax_core(z1: jnp.ndarray, z2: jnp.ndarray,
                         temperature: float = 0.1,
                         eps: float = 1e-5) -> jnp.ndarray:
    """Plain softmax form, rematerializable (see nt_xent_loss 'remat')."""
    sim = (z1 @ z2.T) / temperature
    p = jax.nn.softmax(sim, axis=-1)
    diag = jnp.diagonal(p)
    neg_sum = p.sum(axis=1) - diag
    return -jnp.log((diag + eps) / (neg_sum + eps)).mean()


def nt_xent_loss(z1: jnp.ndarray, z2: jnp.ndarray, temperature: float = 0.1,
                 eps: float = 1e-5) -> jnp.ndarray:
    """NT-Xent contrastive loss between tower latents (ref DNN.py:479-508).

    The reference's diagonal masking is commented out, so the softmax runs over
    the full row including the positive; loss = -log(diag / sum(off-diag)).
    """
    impl = _resolve_ntxent_impl(z1.shape[0])
    if impl == "remat":
        # A/B variant (benchmarks/ab_ntxent.py): recompute the [B, B]
        # softmax in the backward instead of storing it — trades ~8 MB of
        # HBM residency for one extra sim matmul
        import functools

        core = jax.checkpoint(functools.partial(
            nt_xent_softmax_core, temperature=temperature, eps=eps))
        return core(z1, z2)
    if impl == "lse":
        # Algebraically identical: softmax rows sum to 1, so the off-diagonal
        # mass is 1 - diag; only the row logsumexp and the diagonal are
        # needed, never the normalized [B, B] matrix. diag <= 1 because the
        # row logsumexp includes the diagonal term.
        sim = (z1 @ z2.T) / temperature
        lse = jax.nn.logsumexp(sim, axis=-1)
        diag = jnp.exp(jnp.diagonal(sim) - lse)
        neg_sum = 1.0 - diag
        # ALWAYS-ON REPAIR (documented divergence, applies even under
        # fidelity=True; see docs/PARITY.md "Always-on repairs"): epsilon
        # also in the denominator — the reference guards only the numerator
        # (ref DNN.py:502), so when the positive saturates the softmax,
        # neg_sum underflows to 0 and the loss — then the whole run — goes
        # inf/NaN (reproduced within ~50 steps on random data). Not gated
        # behind fidelity because a training run that NaNs reproduces
        # nothing. nt_xent_softmax_core carries the same repair.
        return -jnp.log((diag + eps) / (neg_sum + eps)).mean()
    # softmax form: ONE implementation — the core is the production default
    # here and the remat path's target; duplicating its body risked the two
    # copies silently diverging (round-5 review finding)
    return nt_xent_softmax_core(z1, z2, temperature=temperature, eps=eps)
