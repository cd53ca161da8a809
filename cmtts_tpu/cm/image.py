"""Image-domain consistency-model sampling + zero-shot editing.

Parity sources (reference ``model/cm_tool/karras_diffusion.py``):
- ``karras_sample`` image entry (:480-577 / image_sample.py:68-85) —
  here :func:`karras_sample_image`, reusing the shape-generic samplers in
  :mod:`cmtts_tpu.cm.sampling`;
- ``iterative_colorization`` (:894-944), ``iterative_inpainting``
  (:947-1004), ``iterative_superres`` (:1006-1123) — zero-shot editing
  by projecting the denoised estimate onto a measurement-consistent
  subspace between sampler steps.

All functions are pure jnp on NHWC images in [-1, 1]; the editing loops
unroll over the (static, short) ``ts`` index list so the whole edit jits
as one XLA program.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from cmtts_tpu.cm.karras import KarrasSchedule, append_dims
from cmtts_tpu.cm.sampling import sample_mel


def make_image_denoise_fn(apply_fn, params, sched: KarrasSchedule,
                          clip_denoised: bool = True, model_kwargs=None):
    """EDM-parameterized denoiser over an ImageUNet apply
    (KarrasDenoiser.denoise, karras_diffusion.py:392-407 + the
    clip_denoised clamp of karras_sample :528-534)."""
    model_kwargs = model_kwargs or {}

    def denoise(x_t, sigma):
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32),
                                 (x_t.shape[0],))
        c_skip, c_out, c_in = sched.active_scalings(sigma)
        out = apply_fn(params, append_dims(c_in, x_t.ndim) * x_t,
                       sched.rescale_t(sigma), **model_kwargs)
        x0 = append_dims(c_out, x_t.ndim) * out + \
            append_dims(c_skip, x_t.ndim) * x_t
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    return denoise


def karras_sample_image(apply_fn, params, shape, rng,
                        sched: KarrasSchedule, sampler: str = "heun",
                        steps: int = 40, ts=None, clip_denoised: bool = True,
                        s_churn: float = 0.0, s_tmin: float = 0.0,
                        s_tmax: float = float("inf"), s_noise: float = 1.0,
                        model_kwargs=None):
    """Sample images (B, H, W, 3) in [-1, 1] (image_sample.py:68-85).

    Delegates to the shape-generic :func:`cmtts_tpu.cm.sampling.sample_mel`
    dispatch (same samplers; ``T`` for our_multistep follows the
    documented ts mapping: len(ts) - 1) and applies the image entry's
    final clamp (karras_diffusion.py:477 — the TTS entry has no clamp,
    mels are unbounded).
    """
    denoise = make_image_denoise_fn(apply_fn, params, sched,
                                    clip_denoised, model_kwargs)
    x0 = sample_mel(denoise, shape, rng, sched, sampler=sampler,
                    T=(len(ts) - 1 if ts else 1), steps=steps, ts=ts,
                    s_churn=s_churn, s_tmin=s_tmin, s_noise=s_noise,
                    s_tmax=s_tmax)
    return jnp.clip(x0, -1.0, 1.0)


def to_uint8(sample: jnp.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8 HWC (image_sample.py:87-90)."""
    arr = np.asarray((sample + 1.0) * 127.5)
    return np.clip(arr, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Zero-shot editing
# ---------------------------------------------------------------------------

def _edit_schedule(ts, steps, sched: KarrasSchedule):
    lo = sched.sigma_max ** (1.0 / sched.rho)
    hi = sched.sigma_min ** (1.0 / sched.rho)
    return [float(np.clip((lo + t / (steps - 1) * (hi - lo)) ** sched.rho,
                          sched.sigma_min, sched.sigma_max)) for t in ts]


def _edit_loop(distill, replacement, images, x, ts, steps,
               sched: KarrasSchedule, rng):
    """Shared projection loop (karras_diffusion.py:930-943 et al.):
    denoise -> clamp -> project onto the measurement subspace -> renoise
    to the next sigma."""
    sig = _edit_schedule(ts, steps, sched)
    for i in range(len(ts) - 1):
        x0 = jnp.clip(distill(x, sig[i]), -1.0, 1.0)
        x0 = replacement(images, x0)
        rng, sub = jax.random.split(rng)
        std = math.sqrt(max(sig[i + 1] ** 2 - sched.sigma_min ** 2, 0.0))
        x = x0 + jax.random.normal(sub, x.shape, x.dtype) * std
    return x


def _gray_orthogonal_matrix() -> np.ndarray:
    """QR-completed basis whose first axis is the luminance direction
    (karras_diffusion.py:906-917)."""
    v = np.asarray([0.2989, 0.5870, 0.1140])
    v = v / np.linalg.norm(v)
    m = np.eye(3)
    m[:, 0] = v
    m = np.linalg.qr(m)[0]
    if np.sum(m[:, 0]) < 0:
        m = -m
    return m


def iterative_colorization(distill, images, x, ts, sched: KarrasSchedule,
                           rng, steps: int = 40):
    """Colorize: keep the grayscale (luminance) component of ``images``,
    let the model fill the chroma plane (karras_diffusion.py:894-944).

    distill: (x (B,H,W,3), sigma scalar) -> x0; images/x NHWC in [-1,1].
    Returns (edited, projected measurement images).
    """
    Q = jnp.asarray(_gray_orthogonal_matrix(), jnp.float32)
    mask = jnp.zeros((3,)).at[0].set(1.0)

    def replacement(x0, x1):
        a = jnp.einsum("bhwc,cd->bhwd", x0, Q)
        b = jnp.einsum("bhwc,cd->bhwd", x1, Q)
        mix = a * mask + b * (1.0 - mask)
        return jnp.einsum("bhwd,cd->bhwc", mix, Q)

    images = replacement(images, jnp.zeros_like(images))
    return _edit_loop(distill, replacement, images, x, ts, steps,
                      sched, rng), images


def letter_mask(image_size: int, letter: str = "S",
                font_path: str | None = None, font_size: int = 250,
                xy: tuple[int, int] = (50, 0)) -> np.ndarray:
    """(S, S) float {0,1} glyph mask.  ``font_size``/``xy`` default to the
    reference's literal constants (karras_diffusion.py:970-978 — sized
    for its 256x256 demo; scale them for other resolutions).  The
    reference draws with ``arial.ttf``, absent from this environment, so
    any available TTF is used (DejaVu by default) — same semantics,
    different glyph outline."""
    try:
        from PIL import Image, ImageDraw, ImageFont

        if font_path is None:
            import glob

            cands = ["arial.ttf"] + sorted(
                glob.glob("/usr/share/fonts/**/*Bold.ttf", recursive=True)
            ) + sorted(glob.glob("/usr/share/fonts/**/*.ttf", recursive=True))
        else:
            cands = [font_path]
        font = None
        for c in cands:
            try:
                font = ImageFont.truetype(c, font_size)
                break
            except OSError:
                continue
        if font is None:
            raise OSError("no TTF font found")
        img = Image.new("RGB", (image_size, image_size), color="white")
        ImageDraw.Draw(img).text(xy, letter, font=font, fill=(0, 0, 0))
        arr = np.array(img)[..., 0]
        # reference semantics (karras_diffusion.py:984-985): background =
        # any value > 0.5 on the uint8 canvas, glyph = pure black only
        return (arr <= 0.5).astype(np.float32)  # 1 inside the glyph
    except ImportError:
        # crude block-letter fallback (keeps the API total without PIL)
        m = np.zeros((image_size, image_size), np.float32)
        t = max(image_size // 8, 1)
        m[:t], m[-t:], m[image_size // 2 - t // 2: image_size // 2 + t // 2] = 1, 1, 1
        m[: image_size // 2, :t] = 1
        m[image_size // 2:, -t:] = 1
        return m


def iterative_inpainting(distill, images, x, ts, sched: KarrasSchedule,
                         rng, steps: int = 40, mask: jnp.ndarray | None = None):
    """Inpaint: even batch rows keep the measurement OUTSIDE the glyph
    (the model paints the letter's interior), odd rows the inverse —
    the reference's alternating mask (karras_diffusion.py:979-990; there
    the alternation runs over groups of 7, an artifact of its demo batch
    — here it alternates per sample).  ``mask`` overrides the glyph
    ((H, W), 1 = glyph interior)."""
    B, H, W, C = x.shape
    if mask is None:
        mask = jnp.asarray(letter_mask(H))
    inside = mask[None, :, :, None]
    rows = jnp.arange(B) % 2 == 0
    # 1 = keep the measurement pixel, 0 = model's to paint
    full = jnp.where(rows[:, None, None, None], 1.0 - inside, inside)
    full = jnp.broadcast_to(full, (B, H, W, C))

    def replacement(x0, x1):
        return x0 * full + x1 * (1.0 - full)

    images = replacement(images, -jnp.ones_like(images))
    return _edit_loop(distill, replacement, images, x, ts, steps,
                      sched, rng), images


def _patch_orthogonal_matrix(p: int) -> np.ndarray:
    """QR basis whose first axis is the patch mean
    (karras_diffusion.py:1020-1030)."""
    v = np.ones(p * p)
    v = v / np.linalg.norm(v)
    m = np.eye(p * p)
    m[:, 0] = v
    m = np.linalg.qr(m)[0]
    if np.sum(m[:, 0]) < 0:
        m = -m
    return m


def _to_patches(x, p):
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    return jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(
        B, (H // p) * (W // p), C, p * p)


def _from_patches(x, p, H, W):
    B = x.shape[0]
    C = x.shape[2]
    x = x.reshape(B, H // p, W // p, C, p, p)
    return jnp.transpose(x, (0, 1, 4, 2, 5, 3)).reshape(B, H, W, C)


def iterative_superres(distill, images, x, ts, sched: KarrasSchedule,
                       rng, steps: int = 40, patch_size: int = 8):
    """Super-resolve: constrain each pxp patch's mean to the low-res
    measurement, let the model fill intra-patch detail
    (karras_diffusion.py:1006-1123)."""
    B, H, W, C = x.shape
    p = patch_size
    Q = jnp.asarray(_patch_orthogonal_matrix(p), jnp.float32)

    def replacement(x0, x1):
        a = jnp.einsum("bncd,de->bnce", _to_patches(x0, p), Q)
        b = jnp.einsum("bncd,de->bnce", _to_patches(x1, p), Q)
        mix = jnp.concatenate([a[..., :1], b[..., 1:]], axis=-1)
        mix = jnp.einsum("bnce,de->bncd", mix, Q)
        return _from_patches(mix, p, H, W)

    def average_patches(z):
        pt = _to_patches(z, p)
        return _from_patches(
            jnp.broadcast_to(pt.mean(-1, keepdims=True), pt.shape), p, H, W)

    images = average_patches(images)
    return _edit_loop(distill, replacement, images, x, ts, steps,
                      sched, rng), images
