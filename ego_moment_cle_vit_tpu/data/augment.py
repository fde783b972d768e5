"""On-device dual-view augmentation (the CLE-ViT positive-view generator).

The reference runs its entire augmentation chain per-sample on CPU workers
with PIL/numpy (/root/reference/src/models/cle_vit_backbone.py:21-167:
Resize -> RandomCrop -> HFlip -> ColorJitter -> RandomRotation for both
views, plus rectangular masking + 4x4 tile shuffling for the positive view,
then ToTensor + ImageNet normalize).  Per BASELINE.json's north star, this
framework moves the whole chain on device: one jitted, batched XLA program
over uint8 [B, S, S, 3] inputs, fused into the training step so the only
host->device transfer is the raw resized bytes.

Parity is **distributional**, not RNG-stream-exact (impossible across PIL /
``random`` vs ``jax.random``; SURVEY.md §7 hard-part #4): each op draws the
same distribution over the same parameter ranges as the reference.

Known divergences (documented):
* RandomRotation uses bilinear resampling with zero fill; PIL uses nearest
  by default.  Affects pixels, not distributional semantics of training.
(ColorJitter matches torchvision's per-sample random op order as of round 3
— see ``color_jitter``.)
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Mirrors the reference transform knobs (cle_vit_backbone.py:108-141 and
    configs/ufg_base.yaml:71-91) — including the config keys the reference
    reads but never plumbs (grid_size, jitter strengths; ledger #5)."""

    input_size: int = 448
    resize_size: int = 600
    hflip_prob: float = 0.5
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.1
    rotation_degrees: float = 10.0
    mask_ratio: Tuple[float, float] = (0.15, 0.45)
    grid_size: int = 4
    mask_value: float = 0.0
    rotation_method: str = "shear_fft"  # 'shear_fft' (fast) | 'gather'
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD


# ---------------------------------------------------------------------------
# Color ops (all on [H, W, 3] float32 in [0, 1])
# ---------------------------------------------------------------------------


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def _adjust_contrast(img, factor):
    mean = jnp.mean(_grayscale(img))
    return jnp.clip((img - mean) * factor + mean, 0.0, 1.0)


def _adjust_saturation(img, factor):
    gray = _grayscale(img)
    return jnp.clip((img - gray) * factor + gray, 0.0, 1.0)


def _rgb_to_hsv(img: jnp.ndarray):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe_delta = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(img, shift):
    h, s, v = _rgb_to_hsv(img)
    return jnp.clip(_hsv_to_rgb((h + shift) % 1.0, s, v), 0.0, 1.0)


def color_jitter(img: jnp.ndarray, key: jax.Array, cfg: AugmentConfig) -> jnp.ndarray:
    """torchvision.ColorJitter(0.2, 0.2, 0.2, 0.1) parameter ranges:
    factor ~ U[max(0, 1-x), 1+x], hue shift ~ U[-h, h].

    The enabled adjustments are applied in a PER-SAMPLE random order, like
    torchvision's ``fn_idx = torch.randperm(4)``
    (/root/reference/src/models/cle_vit_backbone.py:121-127 uses stock
    ColorJitter) — at the COST of a fixed order.  Brightness, contrast and
    saturation are all affine in the image:

        out = a * img + b * gray(img) + g * mean(gray(img))

    and the projector algebra closes (gray∘gray = gray, mean∘gray = mean),
    so ANY ordering of the three composes into scalar coefficients
    ``(a, b, g)`` — computed here by a tiny per-sample unrolled fold over
    the sampled permutation (scalar ``lax.switch``es; free under vmap).
    Only hue is nonlinear, so the chain is applied as
    ``affine_post(hue(affine_pre(img)))`` with hue evaluated exactly once
    in its sampled slot.  One gray/mean pass per affine segment + one HSV
    round-trip — the same heavy-op count as a fixed-order chain, versus
    16 full-image passes for a vmapped 4-way switch over image-level ops
    (measured as a step regression).

    Divergence (documented): the [0, 1] clamp lands once per segment
    (pre-hue / hue / post-hue) instead of after every sub-op, so outputs
    differ from torchvision only at pixels that saturate mid-chain —
    distribution-level parity, like the rest of this module.
    """
    kb, kc, ks, kh, korder = jax.random.split(key, 5)
    # op codes: 0=brightness 1=contrast 2=saturation 3=hue
    enabled = []
    if cfg.brightness > 0:
        fb = jax.random.uniform(
            kb, (), minval=max(0.0, 1 - cfg.brightness), maxval=1 + cfg.brightness
        )
        enabled.append((0, fb))
    if cfg.contrast > 0:
        fc = jax.random.uniform(
            kc, (), minval=max(0.0, 1 - cfg.contrast), maxval=1 + cfg.contrast
        )
        enabled.append((1, fc))
    if cfg.saturation > 0:
        fs = jax.random.uniform(
            ks, (), minval=max(0.0, 1 - cfg.saturation), maxval=1 + cfg.saturation
        )
        enabled.append((2, fs))
    hue_on = cfg.hue > 0
    if hue_on:
        shift = jax.random.uniform(kh, (), minval=-cfg.hue, maxval=cfg.hue)
        enabled.append((3, shift))

    if not enabled:
        return img

    perm = jax.random.permutation(korder, len(enabled))
    codes = jnp.asarray([c for c, _ in enabled])[perm]
    factors = jnp.stack([f for _, f in enabled])[perm]

    # Fold the permutation into two affine segments (scalars only).
    # seg = (a, b, g); hue stashes the running segment and restarts it.
    ident = (jnp.float32(1), jnp.float32(0), jnp.float32(0))

    def apply_op(seg, code, f):
        a, b, g = seg
        branches = [
            lambda: (f * a, f * b, f * g),  # brightness
            lambda: (f * a, f * b, f * g + (1 - f) * (a + b + g)),  # contrast
            lambda: (f * a, f * b + (1 - f) * (a + b), g),  # saturation
            lambda: (a, b, g),  # hue: affine-identity (handled separately)
        ]
        return jax.lax.switch(code, branches)

    seg, pre = ident, ident
    for slot in range(len(enabled)):
        code, f = codes[slot], factors[slot]
        new_seg = apply_op(seg, code, f)
        is_hue = code == 3
        # on hue (occurs at most once): stash the running segment as the
        # pre-hue affine and restart accumulation for the post-hue one
        pre = tuple(jnp.where(is_hue, s, p) for s, p in zip(seg, pre))
        seg = tuple(jnp.where(is_hue, i, n) for i, n in zip(ident, new_seg))

    def affine(x, coeffs):
        a, b, g = coeffs
        gray = _grayscale(x)
        return jnp.clip(a * x + b * gray + g * jnp.mean(gray), 0.0, 1.0)

    if not hue_on:
        # single affine segment; the fold left it all in ``seg``
        return affine(img, seg)

    y = affine(img, pre)
    y = _adjust_hue(y, shift)
    return affine(y, seg)


# ---------------------------------------------------------------------------
# Geometric ops
# ---------------------------------------------------------------------------


def random_crop(img: jnp.ndarray, key: jax.Array, out_size: int) -> jnp.ndarray:
    """[S, S, C] -> [out, out, C] at a uniform random offset."""
    s = img.shape[0]
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, s - out_size + 1)
    x0 = jax.random.randint(kx, (), 0, s - out_size + 1)
    return jax.lax.dynamic_slice(img, (y0, x0, 0), (out_size, out_size, img.shape[2]))


def center_crop(img: jnp.ndarray, out_size: int) -> jnp.ndarray:
    s = img.shape[0]
    off = (s - out_size) // 2
    return jax.lax.dynamic_slice(img, (off, off, 0), (out_size, out_size, img.shape[2]))


def random_hflip(img: jnp.ndarray, key: jax.Array, prob: float) -> jnp.ndarray:
    flip = jax.random.bernoulli(key, prob)
    return jnp.where(flip, img[:, ::-1, :], img)


def rotate_gather(img: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate about the center by ``angle_deg`` (bilinear, zero fill) via a
    generic gather (map_coordinates).  Correct everywhere but SLOW on TPU
    (generic scalar gathers don't vectorize on the VPU — measured ~7 ms per
    224^2 image on v5e); kept as the reference implementation and for CPU.
    """
    h, w = img.shape[0], img.shape[1]
    theta = angle_deg * jnp.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse map: source coords for each destination pixel
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    coords = jnp.stack([src_y.ravel(), src_x.ravel()])

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, coords, order=1, mode="constant", cval=0.0
        ).reshape(h, w)

    return jnp.stack(
        [sample_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1
    )


def _next_fast_len(n: int) -> int:
    """Smallest 7-smooth integer >= n (FFT lengths with large prime factors
    are several times slower; 380 = 2^2*5*19 was the measured hot spot of
    the whole augmentation chain)."""
    m = n
    while True:
        k = m
        for p in (2, 3, 5, 7):
            while k % p == 0:
                k //= p
        if k == 1:
            return m
        m += 1


def _fft_shift_rows(
    img: jnp.ndarray, shifts: jnp.ndarray, pad: int, n: int | None = None
) -> jnp.ndarray:
    """Sub-pixel per-row translation along axis 1 via the FFT shift theorem:
    out[i, j] = in[i, j - shifts[i]] with sinc interpolation.  Zero-padding
    by ``pad`` on the left (and at least ``pad`` on the right, extended to
    the 7-smooth FFT length ``n``) keeps the circular wrap out of the
    image.  (Channel-minor [H, W, C] layout — kept for reference/tests; the
    hot path uses ``_fft_shift_last`` on channel-LEADING data, where the
    FFT axis is the 128-lane minor dim instead of the 3-wide channel.)"""
    h, w, c = img.shape
    if n is None:
        n = _next_fast_len(w + 2 * pad)
    x = jnp.pad(img, ((0, 0), (pad, n - w - pad), (0, 0)))
    f = jnp.fft.rfft(x, axis=1)
    k = jnp.arange(f.shape[1])
    phase = jnp.exp(
        (-2j * jnp.pi / n) * k[None, :] * shifts[:, None].astype(jnp.float32)
    )
    out = jnp.fft.irfft(f * phase[:, :, None], n=n, axis=1)
    return out[:, pad : pad + w, :]


def _fft_shift_last(
    x: jnp.ndarray, shifts: jnp.ndarray, pad: int, n: int | None = None
) -> jnp.ndarray:
    """Per-row translation along the LAST axis: x [C, R, W], shifts [R].

    Same math as ``_fft_shift_rows`` but with the FFT on the minor axis —
    on TPU a [H, W, 3] layout runs every FFT/phase op at 3/128 lane
    utilization (measured: 17.9 of the 22.3 ms augmentation chain was the
    rotate), while [C, R, W] fills the lanes with the transform axis."""
    w = x.shape[-1]
    if n is None:
        n = _next_fast_len(w + 2 * pad)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, n - w - pad)))
    f = jnp.fft.rfft(xp, axis=-1)
    k = jnp.arange(f.shape[-1])
    phase = jnp.exp(
        (-2j * jnp.pi / n) * k[None, :] * shifts[:, None].astype(jnp.float32)
    )  # [R, nf]
    out = jnp.fft.irfft(f * phase[None, :, :], n=n, axis=-1)
    return out[..., pad : pad + w]


@lru_cache(maxsize=None)
def _dft_matrices(n: int):
    """Trace-time real-DFT matmul constants for length ``n``:
    C/S [n, nf] analysis, ICw/ISw [nf, n] weighted synthesis."""
    nf = n // 2 + 1
    ang = 2.0 * np.pi * np.outer(np.arange(n), np.arange(nf)) / n
    cos, sin = np.cos(ang), np.sin(ang)
    wk = np.full(nf, 2.0)
    wk[0] = 1.0
    if n % 2 == 0:
        wk[-1] = 1.0
    return (
        cos.astype(np.float32),
        sin.astype(np.float32),
        (cos * wk / n).T.astype(np.float32),
        (sin * wk / n).T.astype(np.float32),
    )


def _dft_shift_last(
    x: jnp.ndarray, shifts: jnp.ndarray, pad: int, n: int | None = None
) -> jnp.ndarray:
    """``_fft_shift_last`` computed with MATMUL DFTs instead of FFT ops.

    XLA's TPU FFT runs ~20x off bandwidth at these sizes (measured 3 ms per
    rfft/irfft on [64, 3, 224, 280] — 18 ms of rotate per step); with
    n ~= 272 the O(n^2) DFT-as-matmul is ~13 GFLOP per shear batch, under
    0.3 ms on the MXU.  The analysis/synthesis matrices are trace-time
    constants; only the per-row phase rotation (the random shift) is
    computed on device.  Same transform (sinc interpolation) to ~1e-4 on
    0..1 images (HIGH matmul precision — see the A/B note below)."""
    w = x.shape[-1]
    if n is None:
        # no 7-smooth rounding needed for a matmul DFT — any even n works
        n = w + 2 * pad + ((w + 2 * pad) % 2)
    cos, sin, icw, isw = (jnp.asarray(m) for m in _dft_matrices(n))
    nf = n // 2 + 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, n - w - pad)))
    # HIGH precision (3-pass bf16): the DEFAULT TPU matmul rounds f32
    # operands to bf16 in one pass (measured max error 1.5e-2 on 0..1
    # images — visible), HIGHEST costs 6.26 ms vs HIGH's 4.79 per 64
    # rotations while HIGH already tracks it to 9.2e-5 (on-chip A/B,
    # docs/PROFILE_FLAGSHIP_R4.md).  HIGH keeps the transform f32-faithful
    # to ~1e-4 at 2/3 the cost.
    hp = jax.lax.Precision.HIGH
    f_re = jnp.matmul(xp, cos, precision=hp)  # [C, R, nf]
    f_im = -jnp.matmul(xp, sin, precision=hp)
    th = (2.0 * jnp.pi / n) * shifts[:, None].astype(jnp.float32) * jnp.arange(
        nf, dtype=jnp.float32
    )[None, :]  # [R, nf]
    p_re, p_im = jnp.cos(th), -jnp.sin(th)
    g_re = f_re * p_re[None] - f_im * p_im[None]
    g_im = f_re * p_im[None] + f_im * p_re[None]
    # real irfft of the Hermitian spectrum
    out = jnp.matmul(g_re, icw, precision=hp) - jnp.matmul(g_im, isw, precision=hp)
    return out[..., pad : pad + w]


def rotate(
    img: jnp.ndarray,
    angle_deg: jnp.ndarray,
    method: str = "shear_fft",
    max_abs_deg: float | None = None,
) -> jnp.ndarray:
    """Center rotation by ``angle_deg`` degrees.

    'shear_fft' (default): exact 3-shear decomposition
        R(theta) = Shear_x(-tan(theta/2)) . Shear_y(sin(theta)) . Shear_x(...)
    with each shear as a batch of per-row 1-D FFT translations — fully
    vectorized on the VPU, ~40x faster than the gather path on TPU (5.8 ms
    vs 246 ms for 32x224^2 on v5e).  Sinc interpolation instead of bilinear
    (distributional parity; the torch reference uses PIL *nearest*, so
    neither matches it bit-wise — see docs/DIVERGENCES.md).  Output clipped
    to the input range to suppress ringing overshoot.

    'gather': bilinear map_coordinates (reference implementation).
    """
    if method == "gather":
        return rotate_gather(img, angle_deg)
    h, w = img.shape[0], img.shape[1]
    theta = angle_deg * jnp.pi / 180.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rows = jnp.arange(h, dtype=jnp.float32) - cy
    cols = jnp.arange(w, dtype=jnp.float32) - cx
    # Zero-pad against circular wrap.  Max per-shear shift is
    # max(|tan(theta/2)|, |sin(theta)|) * dim/2.  When the caller declares
    # a static angle bound (random_rotate passes the config's degrees) the
    # pad shrinks accordingly; the 0.35*dim fallback covers |theta| to
    # ~40 deg (beyond that use method='gather').
    if max_abs_deg is not None:
        r = abs(max_abs_deg) * np.pi / 180.0
        frac = max(np.tan(r / 2.0), np.sin(r))
        pad = max(8, int(np.ceil(frac * max(h, w) / 2.0)) + 4)
    else:
        pad = max(16, int(0.35 * max(h, w)))
    lo, hi = jnp.min(img), jnp.max(img)
    # channel-leading layout for the shears: the FFT axis becomes the
    # 128-lane minor dim (vs 3-wide channels minor — a ~40x lane-
    # utilization difference, see _fft_shift_last)
    x = img.transpose(2, 0, 1)  # [C, H, W]
    x = _dft_shift_last(x, a * rows, pad)  # shear along W, per row
    x = jnp.swapaxes(x, 1, 2)  # [C, W, H]
    x = _dft_shift_last(x, b * cols, pad)  # shear along H, per col
    x = jnp.swapaxes(x, 1, 2)  # [C, H, W]
    x = _dft_shift_last(x, a * rows, pad)
    return jnp.clip(x.transpose(1, 2, 0), lo, hi)


def random_rotate(
    img: jnp.ndarray,
    key: jax.Array,
    degrees: float,
    method: str = "shear_fft",
) -> jnp.ndarray:
    angle = jax.random.uniform(key, (), minval=-degrees, maxval=degrees)
    return rotate(img, angle, method=method, max_abs_deg=degrees)


# ---------------------------------------------------------------------------
# CLE-ViT positive-view ops: rectangular mask + grid shuffle
# ---------------------------------------------------------------------------


def random_rect_mask(
    img: jnp.ndarray,
    key: jax.Array,
    ratio_range: Tuple[float, float],
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """Area-ratio rectangular mask (reference cle_vit_backbone.py:61-71):
    ratio ~ U[lo, hi]; mask side = floor(dim * sqrt(ratio)); uniform random
    position; fill with ``mask_value``."""
    h, w = img.shape[0], img.shape[1]
    kr, ky, kx = jax.random.split(key, 3)
    ratio = jax.random.uniform(kr, (), minval=ratio_range[0], maxval=ratio_range[1])
    mask_h = jnp.floor(h * jnp.sqrt(ratio)).astype(jnp.int32)
    mask_w = jnp.floor(w * jnp.sqrt(ratio)).astype(jnp.int32)
    y0 = jax.random.randint(ky, (), 0, jnp.maximum(1, h - mask_h) + 1)
    x0 = jax.random.randint(kx, (), 0, jnp.maximum(1, w - mask_w) + 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (yy >= y0) & (yy < y0 + mask_h) & (xx >= x0) & (xx < x0 + mask_w)
    return jnp.where(inside[..., None], jnp.asarray(mask_value, img.dtype), img)


def grid_shuffle(img: jnp.ndarray, key: jax.Array, grid_size: int) -> jnp.ndarray:
    """Uniform random permutation of an s x s tile grid (reference
    cle_vit_backbone.py:73-95).  Pure reshape + one gather — TPU-friendly."""
    s = grid_size
    h, w, c = img.shape
    gh, gw = h // s, w // s
    tiles = img[: gh * s, : gw * s].reshape(s, gh, s, gw, c)
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(s * s, gh, gw, c)
    perm = jax.random.permutation(key, s * s)
    shuffled = tiles[perm]
    out = shuffled.reshape(s, s, gh, gw, c).transpose(0, 2, 1, 3, 4)
    out = out.reshape(s * gh, s * gw, c)
    if s * gh == h and s * gw == w:
        return out
    # non-divisible sizes: the remainder strip stays un-shuffled, exactly
    # like the reference's integer-division tile loop (cle_vit_backbone.py
    # :73-95 never touches pixels beyond s * (dim // s))
    return img.at[: s * gh, : s * gw].set(out)


# ---------------------------------------------------------------------------
# Full dual-view pipelines
# ---------------------------------------------------------------------------


def normalize(img: jnp.ndarray, cfg: AugmentConfig) -> jnp.ndarray:
    mean = jnp.asarray(cfg.mean, img.dtype)
    std = jnp.asarray(cfg.std, img.dtype)
    return (img - mean) / std


def _base_augment(img: jnp.ndarray, key: jax.Array, cfg: AugmentConfig) -> jnp.ndarray:
    """The shared 'standard augmentation' chain (reference :121-127):
    RandomCrop -> HFlip -> ColorJitter -> RandomRotation.  Input is the
    host-resized [S, S, 3] float in [0, 1]."""
    kc, kf, kj, kr = jax.random.split(key, 4)
    img = random_crop(img, kc, cfg.input_size)
    img = random_hflip(img, kf, cfg.hflip_prob)
    img = color_jitter(img, kj, cfg)
    if cfg.rotation_degrees > 0:
        img = random_rotate(img, kr, cfg.rotation_degrees, cfg.rotation_method)
    return img


def _positive_augment(img: jnp.ndarray, key: jax.Array, cfg: AugmentConfig) -> jnp.ndarray:
    """Mask + grid shuffle applied AFTER the base chain, BEFORE normalize —
    same composition point as the reference (:158-162)."""
    km, ks = jax.random.split(key)
    img = random_rect_mask(img, km, cfg.mask_ratio, cfg.mask_value)
    return grid_shuffle(img, ks, cfg.grid_size)


def _train_sample(img_u8: jnp.ndarray, key: jax.Array, cfg: AugmentConfig):
    """uint8 [S, S, 3] -> (anchor, positive) float32 normalized [I, I, 3].

    The two views draw INDEPENDENT base augmentations, exactly like the
    reference's two ``base_transform`` calls (:155, :160)."""
    img = img_u8.astype(jnp.float32) / 255.0
    ka, kp, kpa = jax.random.split(key, 3)
    anchor = _base_augment(img, ka, cfg)
    positive = _base_augment(img, kp, cfg)
    positive = _positive_augment(positive, kpa, cfg)
    return normalize(anchor, cfg), normalize(positive, cfg)


def _eval_sample(img_u8: jnp.ndarray, cfg: AugmentConfig):
    """Eval path: CenterCrop, positive := anchor (reference :129-132, :164)."""
    img = img_u8.astype(jnp.float32) / 255.0
    img = center_crop(img, cfg.input_size)
    anchor = normalize(img, cfg)
    return anchor, anchor


@partial(jax.jit, static_argnames=("cfg",))
def dual_view_train_batch(
    images_u8: jnp.ndarray, key: jax.Array, cfg: AugmentConfig
):
    """Batched on-device training augmentation.

    [B, S, S, 3] uint8 + key -> (anchor, positive) [B, I, I, 3] float32.
    """
    keys = jax.random.split(key, images_u8.shape[0])
    return jax.vmap(lambda i, k: _train_sample(i, k, cfg))(images_u8, keys)


@partial(jax.jit, static_argnames=("cfg",))
def dual_view_eval_batch(images_u8: jnp.ndarray, cfg: AugmentConfig):
    """Batched on-device eval preprocessing."""
    return jax.vmap(lambda i: _eval_sample(i, cfg))(images_u8)
