"""Frame-major temporal convolution (kernel size 3 over t) as one packed matmul.

The VideoResBlock temporal branch convolves only the frame axis — the
reference runs ``torch.nn.Conv3d(kernel=(3,1,1))`` on ``(b, c, t, h, w)``
(reference vwm/modules/diffusionmodules/video_model.py VideoResBlock /
util.py AE3DConv). Expressed as an XLA 3-D convolution on the
``(b, t, h, w, c)`` view, the TPU layout assigner places the CFG batch
(b=2) on the sublane axis — a ``T(2,128)`` tiling that idles 3/4 of the
MXU's sublanes (measured 50 TF/s vs 136-170 TF/s for the spatial 1x1/3x3
convs, ~95ms/eval across the UNet at 576x1024).

This op never leaves the tensor's native frame-major packing ``(b*t, s, c)``:

    z   = x @ [W0 | W1 | W2]                  # one (M, c) x (c, 3c) matmul
    out[i] = z0[i-1] + z1[i] + z2[i+1] + bias # row-shifted add over frames

Neighbor rows along the packed ``b*t`` axis are adjacent *frames*; the taps
that would cross a video boundary (t=0 / t=T-1 inside each video — SAME
zero padding) are masked by ``arange(bt) % T``. The matmul runs at the
spatial-conv rate (K=c, N=3c keeps the MXU full), and the shifted add is a
single fused elementwise pass.

A Pallas version of this op (three VMEM-resident tap matmuls with clamped
neighbor blocks) wedged the v5e on first contact — dynamic block index
maps left the device spinning; do not reintroduce without validating a
tiny shape under a hard timeout first. The packed-matmul form is within
~30% of that kernel's roofline with none of the hazard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def temporal_conv3_supported(s: int, c_in: int, c_out: int) -> bool:
    return s % 8 == 0 and c_in % 8 == 0 and c_out % 8 == 0


def _xla_reference(x: Array, w: Array, b: Array, num_frames: int) -> Array:
    """lax 3-tap conv over the frame axis on the (bt, s, c) packing."""
    bt, s, cin = x.shape
    cout = w.shape[-1]
    xv = x.reshape(bt // num_frames, num_frames, s, cin)
    dn = jax.lax.conv_dimension_numbers(
        xv.shape, (3, 1, cin, cout), ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xv, w.reshape(3, 1, cin, cout).astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (0, 0)),
        dimension_numbers=dn)
    return (y + b.astype(x.dtype)).reshape(bt, s, cout)


def temporal_conv3(x: Array, w: Array, b: Array, num_frames: int) -> Array:
    """SAME 3-tap convolution over the frame axis of frame-major ``x``.

    x: ``(b*num_frames, s, c_in)`` with frames of each video contiguous.
    w: ``(3, c_in, c_out)`` taps (t-1, t, t+1). b: ``(c_out,)``.
    """
    bt, s, cin = x.shape
    cout = w.shape[-1]
    wcat = jnp.concatenate([w[0], w[1], w[2]], axis=-1).astype(x.dtype)
    # NOTE measured (bench.py A/B at 576x1024): keeping z in f32 is 0.6118
    # f/s vs 0.5949 with a bf16 epilogue cast — the cast looks like a
    # bandwidth win (halves the (bt,s,3c) intermediate) but breaks XLA's
    # fusion of the shifted add into the matmul consumers. Do not "optimize".
    z = jax.lax.dot_general(
        x.reshape(bt * s, cin), wcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bt, s, 3 * cout)
    z0, z1, z2 = z[..., :cout], z[..., cout:2 * cout], z[..., 2 * cout:]

    # out[i] takes z0 from the previous frame row and z2 from the next;
    # rows whose neighbor lies in a different video contribute zero (the
    # conv's SAME padding)
    zero = jnp.zeros_like(z0[:1])
    z0s = jnp.concatenate([zero, z0[:-1]], axis=0)
    z2s = jnp.concatenate([z2[1:], zero], axis=0)
    tidx = jnp.arange(bt) % num_frames
    m0 = (tidx > 0)[:, None, None]
    m2 = (tidx < num_frames - 1)[:, None, None]
    acc = z1 + jnp.where(m0, z0s, 0.0) + jnp.where(m2, z2s, 0.0)
    return acc.astype(x.dtype) + b.astype(x.dtype)
