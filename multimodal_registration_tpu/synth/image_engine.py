"""SynthMorph grayscale-image engine, fully on device.

Parity target: ``ne.models.labels_to_image`` as configured by the reference
(`train_synthmorph.py:258-268,288-291`; parameter semantics documented at
`config/README.md:28-35`):

  1. map raw label values to contiguous indices,
  2. draw a random SVF (Perlin noise at relative resolution ``vel_res``, std
     ~ U(0, ``vel_std``)), integrate it (scaling-and-squaring), and warp the
     label map (nearest),
  3. draw per-label Gaussian intensities — means ~ U(25, 225), stds ~
     U(5, 25), the SynthMorph uint8-range defaults — optionally zeroing the
     background with probability ``zero_background``,
  4. Gaussian blur with std ~ U(0, ``blur_std``) (separable 1-D convs),
  5. multiplicative bias field ``exp(perlin(bias_res, U(0, bias_std)))``,
  6. min-max normalize to [0, 1],
  7. gamma augmentation ``img ** exp(N(0, gamma))``.

Returns ``(image, one_hot(warped labels))`` — the two outputs consumed by the
training graph (`train_synthmorph.py:290-298`). Everything is jax.random keyed
and jit/vmap-compatible, so image synthesis fuses into the training step and no
synthetic image ever touches the host (the reference materializes label maps on
host every batch — SURVEY §3.1).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from multimodal_registration_tpu.ops.integrate import integrate_svf
from multimodal_registration_tpu.ops.resize import rescale_field
from multimodal_registration_tpu.ops.warp import warp_labels_soft_hard
from multimodal_registration_tpu.synth.perlin import draw_perlin


@dataclass(frozen=True)
class ImageEngineConfig:
    """Key names follow `config/config.json:23-28`."""

    num_labels: int = 26
    vel_std: float = 3.0  # warp_std
    # warp_res: relative resolution(s) of the SVF noise. A scalar draws one
    # Perlin scale; a tuple draws one noise component PER scale and sums them
    # (reference `draw_perlin` list semantics). The reference's two-step
    # recipe trains the smooth step-1 model with vel_res [32, 64]
    # (`README.md:157`) and the fine step-2 model with 16.
    vel_res: float | tuple = 16.0
    bias_std: float = 0.3
    bias_res: float = 40.0
    blur_std: float = 1.0  # max blur std
    gamma: float = 0.25  # gamma_std
    mean_min: float = 25.0
    mean_max: float = 225.0
    std_min: float = 5.0
    std_max: float = 25.0
    zero_background: float = 0.2  # neurite labels_to_image default
    int_steps: int = 5
    # resolution divisor for drawing/integrating the synthesis SVF. The noise
    # itself lives at relative resolution vel_res (=16 by default), far
    # coarser than this grid, so integrating at 1/2 resolution and upsampling
    # is statistically equivalent and ~8x cheaper (scaling-and-squaring warps
    # are the hot op — see PERF.md).
    svf_int_res: int = 2
    integrate_payload_dtype: str = "bfloat16"  # see ops.integrate / PERF.md
    blur_radius: int = 3  # static kernel radius (≥ 3·blur_std covers the mass)

    def __post_init__(self):
        # tuple-ize list-valued vel_res at the config boundary: the frozen
        # dataclass is used as a jit-static argument and must stay hashable
        # no matter who constructs it (advisor round-3 finding).
        if isinstance(self.vel_res, (list, tuple)):
            object.__setattr__(
                self, "vel_res", tuple(float(s) for s in self.vel_res))


def _blur_kernel(sigma: jnp.ndarray, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-4)
    k = jnp.exp(-0.5 * (x / sig) ** 2)
    return k / jnp.sum(k)


def _gaussian_blur_convolve(img, sigma, radius: int):
    """Separable blur via per-column ``jnp.convolve`` (historical default)."""
    k = _blur_kernel(sigma, radius)
    out = img
    for axis in range(3):
        perm = [axis] + [a for a in range(3) if a != axis]
        inv = [perm.index(a) for a in range(3)]
        v = jnp.transpose(out, perm).reshape(img.shape[perm[0]], -1)
        v = jax.vmap(lambda col: jnp.convolve(col, k, mode="same"), in_axes=1, out_axes=1)(v)
        out = jnp.transpose(
            v.reshape([img.shape[p] for p in perm]), inv
        )
    return out


def _gaussian_blur_shifts(img, sigma, radius: int):
    """Separable blur as 2r+1 shifted multiply-adds per axis.

    Same zero-padded 'same' semantics as :func:`_gaussian_blur_convolve`
    (the Gaussian kernel is symmetric, so convolution == correlation), but
    expressed as pad + static slices + fused VPU multiply-adds — no batched
    1-D conv lowering, no transposes. Traffic floor at (160,160,192) f32 is
    ~1.3 ms for both images; the convolve form pays transpose copies and a
    (M,1,N)-batched conv per axis.
    """
    k = _blur_kernel(sigma, radius)
    out = img
    for axis in range(3):
        pad = [(radius, radius) if a == axis else (0, 0) for a in range(3)]
        p = jnp.pad(out, pad)
        acc = None
        for d in range(2 * radius + 1):
            sl = [slice(None)] * 3
            sl[axis] = slice(d, d + img.shape[axis])
            term = k[d] * p[tuple(sl)]
            acc = term if acc is None else acc + term
        out = acc
    return out


def _gaussian_blur(img: jnp.ndarray, sigma: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable 3-D Gaussian blur with traced sigma and static kernel width.

    ``MMREG_BLUR_MODE`` selects the lowering: ``shifts`` (pad + static-slice
    multiply-adds, fuses on the VPU — the default) or ``convolve`` (the
    per-column ``jnp.convolve`` form, the historical default). Both compute
    the same zero-padded separable convolution. Measured head-to-head on TPU
    (benchmarks/blur_probe.py, (160,160,192) f32 r=3): shifts 2.11 ms vs
    convolve 4.12, and shifts stays in f32 on the VPU while the batched-conv
    lowering routes through bf16 MXU convs (probe maxerr 0.008 on unit
    normals is the convolve form's rounding, not the shifts form's).
    """
    import os

    if os.environ.get("MMREG_BLUR_MODE", "shifts") == "convolve":
        return _gaussian_blur_convolve(img, sigma, radius)
    return _gaussian_blur_shifts(img, sigma, radius)


def _vel_scales(cfg: ImageEngineConfig, r: float = 1.0):
    """``vel_res`` as a list of Perlin scales in units of the (possibly
    reduced-by-``r``) drawing grid."""
    res = cfg.vel_res
    if isinstance(res, (int, float)):
        res = (res,)
    return [float(s) / r for s in res]


def reduced_svf_grid(shape, cfg: ImageEngineConfig):
    """The reduced integration grid for ``shape``, or ``None`` when the
    engine would integrate at full resolution (``svf_int_res`` 1 or not a
    divisor)."""
    r = max(int(cfg.svf_int_res), 1)
    if cfg.vel_std > 0 and r > 1 and all(s % r == 0 for s in shape):
        return tuple(s // r for s in shape)
    return None


def draw_svf_small(key: jax.Array, shape, cfg: ImageEngineConfig):
    """Draw the generator SVF at the reduced grid (small-grid units),
    consuming exactly the key schedule :func:`_labels_to_image_impl` uses —
    so a caller can pre-integrate a STACKED batch of SVFs through
    ``integrate_svf_batch`` (one rolled loop for all samples) and hand the
    result back via ``phi_small``. Returns ``None`` when the reduced path
    doesn't apply (caller falls back to the in-engine draw)."""
    small = reduced_svf_grid(shape, cfg)
    if small is None:
        return None
    r = max(int(cfg.svf_int_res), 1)
    k_svf = jax.random.split(key, 8)[0]
    svf = draw_perlin(k_svf, (*small, 3), _vel_scales(cfg, r), max_std=cfg.vel_std)
    return svf / r


def _labels_to_image_impl(
    key: jax.Array,
    label_map: jnp.ndarray,
    cfg: ImageEngineConfig,
    phi_small_pre=None,
):
    """Core engine: returns ``(image, soft_map, phi, phi_small)``.

    ``phi_small`` is the generator field at the reduced integration grid
    (vectors in small-grid units) when ``svf_int_res > 1`` divides the shape,
    else ``None``. The trainer composes it with the model's int-res flow at
    the SMALL grid (one cheap compose + one upsample instead of a full-res
    compose — see ``train/trainer.py`` / PERF.md round 3).

    ``phi_small_pre``: an already-integrated reduced-grid field (from
    :func:`draw_svf_small` + ``integrate_svf_batch``); skips the in-engine
    draw+integrate but consumes the same keys, so results are identical."""
    shape = label_map.shape
    L = cfg.num_labels
    (k_svf, k_mean, k_std, k_noise, k_blur, k_bias, k_gamma, k_zbg) = jax.random.split(key, 8)

    # 2. random diffeomorphic deformation of the label map
    phi_small = None
    if cfg.vel_std > 0:
        r = max(int(cfg.svf_int_res), 1)
        pd = jnp.dtype(cfg.integrate_payload_dtype) if cfg.integrate_payload_dtype else None
        if phi_small_pre is not None:
            assert reduced_svf_grid(shape, cfg) is not None
            phi_small = phi_small_pre
            phi = rescale_field(phi_small, float(r), out_shape=shape)
        elif r > 1 and all(s % r == 0 for s in shape):
            small = tuple(s // r for s in shape)
            svf = draw_perlin(k_svf, (*small, 3), _vel_scales(cfg, r), max_std=cfg.vel_std)
            # integrate at reduced res (vectors in small-grid units), then
            # upsample; rescale_field scales the vectors by r
            phi_small = integrate_svf(svf / r, cfg.int_steps, payload_dtype=pd)
            phi = rescale_field(phi_small, float(r), out_shape=shape)
        else:
            svf = draw_perlin(k_svf, (*shape, 3), _vel_scales(cfg), max_std=cfg.vel_std)
            phi = integrate_svf(svf, cfg.int_steps, payload_dtype=pd)
        # ONE packed int8 corner gather serves both the soft map (trilinear
        # one-hot mix — the training target) and the hard nearest-warped
        # labels (for the intensity lookup); either output is DCE'd when
        # unused. No chunk/cond inside → safe under the trainer's vmap.
        soft, lab_idx = warp_labels_soft_hard(label_map.astype(jnp.int32), phi, L)
    else:
        phi = jnp.zeros((*shape, 3), jnp.float32)
        lab_idx = label_map.astype(jnp.int32)
        soft = None

    # 3. per-label Gaussian intensities
    means = jax.random.uniform(k_mean, (L,), minval=cfg.mean_min, maxval=cfg.mean_max)
    stds = jax.random.uniform(k_std, (L,), minval=cfg.std_min, maxval=cfg.std_max)
    if cfg.zero_background > 0:
        zero_bg = jax.random.uniform(k_zbg, ()) < cfg.zero_background
        means = means.at[0].set(jnp.where(zero_bg, 0.0, means[0]))
        stds = stds.at[0].set(jnp.where(zero_bg, 0.0, stds[0]))
    # NOT means[lab_idx]: a tiny-table gather over the full volume runs on
    # the TPU gather engine at ~0.13 G lookups/s — 37 ms per lookup at
    # 160x160x192, 148 ms/step across means/stds x src/trg (train_profile
    # round 3b). The L-way select chain below is pure VPU and fuses with
    # the noise multiply (~1-2 ms), sharing one comparison per label for
    # both tables.
    img_mean = jnp.full(shape, means[0], jnp.float32)
    img_std = jnp.full(shape, stds[0], jnp.float32)
    for l in range(1, L):
        sel = lab_idx == l
        img_mean = jnp.where(sel, means[l], img_mean)
        img_std = jnp.where(sel, stds[l], img_std)
    img = img_mean + img_std * jax.random.normal(k_noise, shape)

    # 4. blur
    if cfg.blur_std > 0:
        sigma = jax.random.uniform(k_blur, (), minval=0.0, maxval=cfg.blur_std)
        img = _gaussian_blur(img, sigma, cfg.blur_radius)

    # 5. bias field
    if cfg.bias_std > 0:
        bias = draw_perlin(k_bias, (*shape, 1), [cfg.bias_res], max_std=cfg.bias_std)[..., 0]
        img = img * jnp.exp(bias)

    # 6. min-max normalize
    lo = jnp.min(img)
    hi = jnp.max(img)
    img = (img - lo) / jnp.maximum(hi - lo, 1e-7)

    # 7. gamma
    if cfg.gamma > 0:
        g = jnp.exp(cfg.gamma * jax.random.normal(k_gamma, ()))
        img = jnp.power(jnp.clip(img, 1e-7, 1.0), g)

    # The map output is the LINEARLY warped one-hot (soft boundaries) —
    # matching the reference generator, whose SpatialTransformer interpolates
    # the one-hot map linearly. This softness is load-bearing: with hard
    # (nearest-then-one-hot) maps the Dice gradient only exists in a razor-thin
    # boundary band and training provably stalls at zero flow (PERF.md
    # "training correctness" note). warp_onehot gathers only the integer map.
    if soft is None:
        soft = jax.nn.one_hot(lab_idx, L, dtype=jnp.float32)
    return img, soft, phi, phi_small


def labels_to_image(key: jax.Array, label_map: jnp.ndarray, cfg: ImageEngineConfig,
                    phi_small_pre=None):
    """Synthesize ``(image (X,Y,Z), soft_one_hot_map (X,Y,Z,L))`` from an
    integer label map whose values already lie in ``[0, num_labels)``."""
    img, soft, _, _ = _labels_to_image_impl(key, label_map, cfg, phi_small_pre)
    return img, soft


def labels_to_image_full(key, label_map, cfg: ImageEngineConfig,
                         phi_small_pre=None):
    """:func:`labels_to_image` variant that additionally returns the raw
    (pre-warp) integer label map and the generator's displacement field —
    full-res ``phi`` plus the reduced-grid ``phi_small`` (or ``None``) — so
    the training loss can warp labels with a single composed interpolation
    (``warp_onehot(raw, compose(phi_gen, flow))``), composing at the reduced
    grid when the model's int-res grid matches. Unused outputs are
    dead-code-eliminated by XLA under jit."""
    img, soft, phi, phi_small = _labels_to_image_impl(key, label_map, cfg,
                                                      phi_small_pre)
    return img, soft, label_map.astype(jnp.int32), phi, phi_small
