"""The diffusion engine: networks + diffusion math wired into pure functions.

Behavioral counterpart of ``vwm/models/diffusion.py`` (DiffusionEngine) minus
the Lightning runtime: latent encode/decode with chunking and overlap-blended
temporal decoding, the denoiser closure, and single-shot sampling. The
training loop lives in ``vista_tpu/engine/training.py``; the autoregressive
rollout in ``vista_tpu/engine/rollout.py``.

Design notes (TPU-first):
- one parameter pytree ``{"unet", "encoder", "decoder", "conditioner"}``;
  the conditioner's cond-frame encoder *shares* the first-stage encoder
  weights (the reference instantiates a redundant second VAE copy —
  configs/inference/vista.yaml:69-98; here there is exactly one encoder);
- encode/decode chunking is expressed with ``jax.lax.map`` over fixed-size
  frame chunks (one compiled body), replacing the reference's Python
  micro-batching (diffusion.py:149-195);
- the overlap-blend decode (diffusion.py:149-180: decode windows of
  ``chunk`` frames with ``overlap``-frame overlap, averaging the seam) keeps
  the temporal VideoDecoder consistent across chunk boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, FrozenSet, Optional, Tuple

import jax
import jax.numpy as jnp

from vista_tpu.diffusion.denoiser import precondition_denoise
from vista_tpu.diffusion.sampler import SamplerConfig, sample_euler_edm
from vista_tpu.diffusion.scaling import get_scaling
from vista_tpu.models.conditioner import ConditionerConfig, GeneralConditioner
from vista_tpu.models.unet import VideoUNet, VideoUNetConfig
from vista_tpu.models.vae import (
    VAEConfig,
    VAEEncoder,
    VideoVAEDecoder,
    gaussian_mode,
    gaussian_sample,
)
from vista_tpu.utils.basic import repeat_as_img_seq

Array = jnp.ndarray
Params = Dict


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    unet: VideoUNetConfig = dataclasses.field(default_factory=VideoUNetConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    conditioner: ConditionerConfig = dataclasses.field(default_factory=ConditionerConfig)
    scaling: str = "v_edm_cnoise"
    num_frames: int = 25
    decode_chunk: int = 14   # en_and_decode_n_samples_a_time (inference)
    decode_overlap: int = 3
    encode_chunk: int = 14

    def tiny(self) -> "EngineConfig":
        unet = self.unet.tiny()
        cond = self.conditioner.tiny()
        # keep the conditioner's output widths consistent with the tiny UNet:
        # vector = 3 * vector_outdim == adm_in_channels; clip dim == context_dim
        cond = dataclasses.replace(
            cond,
            vector_outdim=unet.adm_in_channels // 3,
            clip=dataclasses.replace(cond.clip, output_dim=unet.context_dim),
        )
        return dataclasses.replace(
            self,
            unet=unet,
            vae=self.vae.tiny(),
            conditioner=cond,
            num_frames=unet.num_frames,
            decode_chunk=3,
            decode_overlap=1,
            encode_chunk=4,
        )


class VistaEngine:
    """Stateless orchestrator: holds module definitions, params are explicit."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.unet = VideoUNet(cfg.unet)
        self.encoder = VAEEncoder(cfg.vae)
        self.decoder = VideoVAEDecoder(cfg.vae)
        self.conditioner = GeneralConditioner(cfg.conditioner)
        self.scaling = get_scaling(cfg.scaling)
        self._jit_cache: Dict = {}

    # ---------------- cached jitted programs ----------------
    # jax.jit caches by function identity: wrappers must be created ONCE per
    # engine (per static options), or every caller-level closure recompiles
    # the same program (a full rollout recompiled ~8 programs per call).

    def _cached(self, key, build):
        if key not in self._jit_cache:
            self._jit_cache[key] = build()
        return self._jit_cache[key]

    def jit_encode(self):
        return self._cached(("encode",), lambda: jax.jit(
            lambda p, x, k: self.encode_first_stage(p, x, key=k)))

    def jit_decode(self):
        return self._cached(("decode",), lambda: jax.jit(self.decode_first_stage))

    def jit_condition_pair(self, force_uc_zero: FrozenSet[str], skip_encode: bool = False):
        key = ("cond_pair", tuple(sorted(force_uc_zero)), skip_encode)
        return self._cached(key, lambda: jax.jit(
            lambda p, b: self.condition_pair(p, b, force_uc_zero, skip_encode)))

    def jit_sample(self, sampler: SamplerConfig):
        return self._cached(("sample", sampler), lambda: jax.jit(
            lambda p, noise, c, uc, cf, cm: self.sample(p, noise, c, uc, cf, cm, sampler)))

    def jit_sample_sharded(self, sampler: SamplerConfig, mesh, axis: str = "data",
                           mode: str = "frames", fsdp_min_size: int = 2 ** 16):
        """Multi-chip sampling: the frame axis is sharded over ``mesh[axis]``,
        params are replicated, and XLA's SPMD partitioner inserts the
        collectives (all-to-alls at the spatial<->temporal rearranges,
        all-gathers around single-chip custom kernels). The spatial stages
        (convs, spatial attention) are embarrassingly frame-parallel; only
        the temporal stages communicate, and those ride ICI.

        Counterpart of the reference's lack of any multi-GPU inference story
        (sample.py is single-device); scaling-book-style sharded inference
        comes free from the mesh. The Pallas kernel stack stays live
        multi-chip: tracing runs under ``parallel.kernel_sharding``, so
        every kernel call site becomes a ``shard_map`` island executing the
        unmodified single-chip kernel on its local batch shard (exactness
        pinned by tests/test_sharded_sampling.py::test_pallas_*).
        ``mesh.shape[axis]`` must divide the frame count itself — the
        (t, h, w, c) latents are the sharded arrays (t=25: mesh axes of 5
        or 25 work; pjit rejects uneven shardings rather than silently
        padding, which would corrupt temporal attention).

        ``mode="height"`` shards the latent *height* axis instead — the
        sequence-parallel layout (SURVEY.md §5.7 / parallel/sp_attention.py,
        here integrated into the full sampling program): convs get halo
        exchanges, spatial attention keeps its query rows local and
        all-gathers K/V, temporal attention is token-parallel for free.
        Use when the frame axis is exhausted (more chips than CFG-doubled
        frames) or when single-video latency matters more than throughput.

        ``mode="weights"`` shards the *parameters* instead (each leaf's
        largest divisible dim over ``mesh[axis]``, ``parallel/mesh.py``
        fsdp rule; activations replicated, GSPMD all-gathers each layer's
        weights just-in-time). This is ZeRO-style inference for serving a
        model whose weights exceed one chip's HBM; compute does not scale.
        """
        key = ("sample_sharded", sampler, mesh, axis, mode, fsdp_min_size)

        def build():
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            frames = NamedSharding(
                mesh, P(axis) if mode == "frames"
                else P(None, axis) if mode == "height" else P())

            def cond_spec(c, n_frames):
                if mode == "weights":
                    return {k: repl for k in c}
                if mode == "height":
                    # every rank-4 (t-or-1, h, w, c) entry carries the height
                    # shard; vectors/context replicate
                    return {k: frames if v.ndim == 4 else repl
                            for k, v in c.items()}
                # concat conditioning is sharded only when it is actually
                # per-frame; the conditioner's per-video (batch-1) concat is
                # replicated and broadcast inside network_fn
                return {k: frames if (k == "concat" and v.shape[0] == n_frames)
                        else repl for k, v in c.items()}

            def fn(p, noise, cond, uc, cf, cm):
                return self.sample(p, noise, cond, uc, cf, cm, sampler)

            jitted = {}  # one jit per argument-presence signature

            def wrapper(p, noise, cond, uc, cf, cm):
                from vista_tpu.parallel.kernel_sharding import kernel_sharding

                n = noise.shape[0]
                sig = (tuple(sorted(cond)),
                       None if uc is None else tuple(sorted(uc)),
                       cond["concat"].shape[0] == n if "concat" in cond else None,
                       cf is None, cm is None)
                if sig not in jitted:
                    if mode == "weights":
                        from vista_tpu.parallel import fsdp_param_specs

                        p_shard = jax.tree.map(
                            lambda s: NamedSharding(mesh, s),
                            fsdp_param_specs(p, mesh, axis=axis,
                                             min_size=fsdp_min_size))
                    else:
                        p_shard = repl
                    jitted[sig] = jax.jit(
                        fn,
                        in_shardings=(p_shard, frames, cond_spec(cond, n),
                                      None if uc is None else cond_spec(uc, n),
                                      None if cf is None else frames,
                                      None if cm is None else
                                      (repl if mode == "height" else frames)),
                        out_shardings=frames,
                    )
                # trace-time context: kernel call sites become shard_map
                # islands over the frame/batch-sharded axis instead of
                # GSPMD-replicated opaque custom calls (no-op re-entry once
                # the program is compiled)
                with kernel_sharding(mesh, (axis,)):
                    return jitted[sig](p, noise, cond, uc, cf, cm)

            return wrapper

        return self._cached(key, build)

    # ---------------- init ----------------

    def init_params(self, key: jax.Array, height: int, width: int) -> Params:
        """Initialize all modules for a given pixel resolution."""
        cfg = self.cfg
        t = cfg.num_frames
        f = cfg.vae.downsample_factor
        hl, wl = height // f, width // f
        zc = cfg.vae.z_channels
        k1, k2, k3, k4 = jax.random.split(key, 4)

        x_unet = jnp.zeros((t, hl, wl, cfg.unet.in_channels))
        ctx_dim = cfg.unet.context_dim + (128 * 19 if cfg.unet.action_control else 0)
        context = jnp.zeros((1, 1, ctx_dim))
        y = jnp.zeros((1, cfg.unet.adm_in_channels))
        # jit the inits: eager init dispatches thousands of tiny ops (slow,
        # especially over a remote-device tunnel); compiled it is one program
        unet_params = jax.jit(self.unet.init, static_argnums=(6,))(
            k1, x_unet, jnp.zeros((t,)), context, y, jnp.zeros((t,)), t)

        pixels = jnp.zeros((1, height, width, cfg.vae.in_channels))
        enc_params = jax.jit(self.encoder.init)(k2, pixels)
        dec_params = jax.jit(self.decoder.init, static_argnums=(2,))(
            k3, jnp.zeros((t, hl, wl, zc)), t)

        batch = {
            "cond_frames_without_noise": jnp.zeros((1, height, width, 3)),
            "cond_frames": jnp.zeros((1, height, width, 3)),
            "fps_id": jnp.zeros((1,)),
            "motion_bucket_id": jnp.zeros((1,)),
            "cond_aug": jnp.zeros((1,)),
        }
        cond_params = jax.jit(self.conditioner.init)(k4, batch)
        # share the first-stage encoder with the conditioner's cond-frame encoder
        cond_params = self._tie_encoder(cond_params, enc_params)
        return {
            "unet": unet_params["params"],
            "encoder": enc_params["params"],
            "decoder": dec_params["params"],
            "conditioner": cond_params["params"],
        }

    @staticmethod
    def _tie_encoder(cond_params: Dict, enc_params: Dict) -> Dict:
        cond = dict(cond_params)
        params = dict(cond["params"])
        params["cond_frames_encoder"] = enc_params["params"]
        cond["params"] = params
        return cond

    # ---------------- first stage ----------------

    def encode_first_stage(
        self, params: Params, pixels: Array, key: Optional[jax.Array] = None
    ) -> Array:
        """Pixels ``(n, h, w, 3)`` -> scaled latents ``(n, h/f, w/f, z)``.

        Samples the diagonal-Gaussian posterior when ``key`` is given (the
        first stage's regularizer samples; the conditioner's takes the mode),
        otherwise uses the mode. Chunked over frames with ``lax.map`` so the
        encoder body compiles once regardless of n.
        """
        cfg = self.cfg
        n = pixels.shape[0]
        chunk = min(cfg.encode_chunk, n)

        def encode(x):
            return self.encoder.apply({"params": params["encoder"]}, x)

        if n % chunk == 0 and n > chunk:
            xs = pixels.reshape(n // chunk, chunk, *pixels.shape[1:])
            moments = jax.lax.map(encode, xs)
            moments = moments.reshape(n, *moments.shape[2:])
        else:
            moments = encode(pixels)
        z = gaussian_sample(moments, key) if key is not None else gaussian_mode(moments)
        return z * cfg.vae.scale_factor

    def decode_first_stage(self, params: Params, z: Array) -> Array:
        """Scaled latents ``(n, hl, wl, z)`` -> pixels, overlap-blended chunks.

        Windows of ``decode_chunk`` frames with ``decode_overlap`` shared
        frames; seam regions are averaged (diffusion.py:160-174).
        """
        cfg = self.cfg
        z = z / cfg.vae.scale_factor
        n = z.shape[0]
        chunk, overlap = cfg.decode_chunk, cfg.decode_overlap

        def decode(zc, t):
            return self.decoder.apply({"params": params["decoder"]}, zc, t)

        if n <= chunk:
            return decode(z, n)

        outs = []
        prev = z[:overlap]
        step = chunk - overlap
        start = overlap
        while start < n:
            cur = z[start:start + step]
            window = jnp.concatenate([prev, cur], axis=0)
            if outs:
                # chain each window on the previous output: without this the
                # windows are independent subgraphs and XLA overlaps their
                # buffer lifetimes — n_windows x decoder peak memory (46 GB
                # at 576x1024 instead of ~6 GB)
                window, _ = jax.lax.optimization_barrier((window, outs[-1]))
            out = decode(window, window.shape[0])
            if not outs:
                outs.append(out)
            else:
                outs[-1] = outs[-1].at[-overlap:].set((outs[-1][-overlap:] + out[:overlap]) / 2.0)
                outs.append(out[overlap:])
            prev = cur[-overlap:]
            start += step
        return jnp.concatenate(outs, axis=0)

    # ---------------- denoising ----------------

    def network_fn(self, params: Params, num_frames: int):
        """The OpenAIWrapper counterpart: channel-concat the ``concat`` cond
        (broadcast per-frame) and map the cond dict to UNet inputs
        (vwm/modules/diffusionmodules/wrappers.py:24-40)."""

        def fn(x: Array, c_noise: Array, cond: Dict[str, Array], cond_mask: Optional[Array]):
            concat = cond.get("concat")
            if concat is not None:
                if concat.shape[0] != x.shape[0]:
                    concat = repeat_as_img_seq(concat, num_frames)
                x = jnp.concatenate([x, concat.astype(x.dtype)], axis=-1)
            return self.unet.apply(
                {"params": params["unet"]}, x, c_noise,
                cond.get("crossattn"), cond.get("vector"), cond_mask, num_frames,
            )

        return fn

    def denoise_fn(self, params: Params, num_frames: Optional[int] = None):
        """Preconditioned denoiser: ``(x, sigma, cond, cond_mask) -> denoised``."""
        nf = num_frames or self.cfg.num_frames
        net = self.network_fn(params, nf)

        def fn(x, sigma, cond, cond_mask):
            return precondition_denoise(net, x, sigma, cond, cond_mask, self.scaling)

        return fn

    # ---------------- conditioning ----------------

    def condition_pair(
        self,
        params: Params,
        batch: Dict[str, Array],
        force_uc_zero: FrozenSet[str] = frozenset(
        {"cond_frames", "cond_frames_without_noise",
         "command", "trajectory", "speed", "angle", "goal"}),
        skip_encode: bool = False,
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        return self.conditioner.apply(
            {"params": params["conditioner"]}, batch, force_uc_zero, skip_encode,
            method=GeneralConditioner.conditional_pair,
        )

    def conditions(
        self,
        params: Params,
        batch: Dict[str, Array],
        force_zero: FrozenSet[str] = frozenset(),
        skip_encode: bool = False,
        ucg_key: Optional[jax.Array] = None,
    ) -> Dict[str, Array]:
        return self.conditioner.apply(
            {"params": params["conditioner"]}, batch, force_zero, skip_encode, ucg_key,
        )

    # ---------------- sampling ----------------

    def sample(
        self,
        params: Params,
        noise: Array,
        cond: Dict[str, Array],
        uc: Optional[Dict[str, Array]] = None,
        cond_frame: Optional[Array] = None,
        cond_mask: Optional[Array] = None,
        sampler: SamplerConfig = SamplerConfig(),
        key: Optional[jax.Array] = None,
    ) -> Array:
        """One sampling pass over ``num_frames`` latents."""
        return sample_euler_edm(
            self.denoise_fn(params), noise, cond, uc,
            cond_frame=cond_frame, cond_mask=cond_mask,
            config=sampler, num_frames=self.cfg.num_frames, key=key,
        )
