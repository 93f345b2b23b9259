"""Attention dispatch: XLA reference path and the Pallas flash kernel.

Replaces the reference's xformers ``memory_efficient_attention`` CUDA path
(vwm/modules/attention.py:384-407). Two workload shapes matter (SURVEY.md
§2.9, §5.7):

- *spatial*: sequences of h*w tokens (2304..9216 at 576x1024), batch b*t —
  long-sequence flash attention on the MXU;
- *temporal*: sequences of only ``t=25`` tokens but batch b*h*w (tens of
  thousands) — a tiny-seq/huge-batch problem where the reference needed
  32768-row chunking; on TPU it lowers to one batched matmul, no chunking.

``backend="xla"`` uses XLA's fused attention lowering with an fp32 softmax.
``backend="pallas"`` calls the Pallas TPU flash kernel
(vista_tpu/ops/flash_attention.py) for the long-sequence shapes and falls
back to XLA when the shape doesn't profit from it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _xla_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """(B, S, H, D) attention with fp32 softmax accumulation.

    Layout note: fold heads into the batch dim with ONE transpose each way
    ((B,S,H,D) -> (B,H,S,D) batched matmul) instead of head-strided einsums —
    measurably fewer relayouts on TPU for the tiny-seq temporal workload."""
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qt, kt, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vt)
    return out.transpose(0, 2, 1, 3)


def resolve_backend(backend: str) -> str:
    """'auto' -> pallas on TPU, xla elsewhere (interpret-mode Pallas on CPU
    is only for small-shape tests; golden-parity tests must stay fast)."""
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


def attention_packed(
    q: Array,
    k: Array,
    v: Array,
    num_heads: int,
    backend: str = "xla",
    causal: bool = False,
) -> Array:
    """Multi-head attention on packed ``(batch, seq, heads*head_dim)``
    tensors — the dense projections' natural layout. The Pallas kernels
    consume this layout directly (no head split/merge relayouts, which are
    real copies on TPU); the XLA fallback reshapes internally.

    Dispatch (backend="pallas"): tiny sequences (the t=25 temporal
    attention) go to the fused tiny-seq kernel; long sequences (spatial
    h*w tokens) to the flash kernel; everything else to XLA.
    """
    b, s_q, hd = q.shape
    s_k = k.shape[1]
    d = hd // num_heads
    backend = resolve_backend(backend)
    if backend == "pallas" and not causal:
        from vista_tpu.ops.flash_attention import flash_attention_packed, flash_shape_supported
        from vista_tpu.ops.tiny_attention import tiny_attention_packed, tiny_shape_supported

        if tiny_shape_supported(s_q, s_k, num_heads):
            return tiny_attention_packed(q, k, v, num_heads)
        if flash_shape_supported((b, s_q, num_heads, d), (b, s_k, num_heads, d)):
            return flash_attention_packed(q, k, v, num_heads)
    out = dot_product_attention(
        q.reshape(b, s_q, num_heads, d), k.reshape(b, s_k, num_heads, d),
        v.reshape(b, s_k, num_heads, d), backend="xla", causal=causal)
    return out.reshape(b, s_q, hd)


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    backend: str = "xla",
    causal: bool = False,
) -> Array:
    """Multi-head attention over ``(batch, seq, heads, head_dim)`` tensors."""
    scale = q.shape[-1] ** -0.5
    if causal and backend != "xla":
        backend = "xla"  # the causal path is cold (unused in shipped configs)

    if backend == "pallas":
        from vista_tpu.ops.flash_attention import flash_attention, flash_shape_supported

        if flash_shape_supported(q.shape, k.shape):
            return flash_attention(q, k, v)
        backend = "xla"

    if causal:
        s_q, s_k = q.shape[1], k.shape[1]
        mask = jnp.tril(jnp.ones((s_q, s_k), dtype=bool))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = jnp.where(mask[None, None], logits * scale, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    return _xla_attention(q, k, v, scale)
