"""Fused multi-receptive-field (MRF) vocoder stage as a Pallas TPU kernel.

Why: each HiFi-GAN upsample stage runs 3 parallel ResBlocks (kernels
3/7/11, dilation pairs 1/3/5) = 18 convolutions + activations + residual
adds over very long waveforms (up to 256x the mel rate).  XLA executes
each conv as its own HBM round trip — at the late stages (32/64
channels, ~200k samples) that is ~15 full tensor traversals and the
stage is HBM-bandwidth-bound, not FLOP-bound.  This kernel computes the
ENTIRE MRF stage per length-tile in VMEM: x is read once and the fused
output written once.

Design notes (see /opt/skills/guides/pallas_guide.md):
- internal layout is channels-first (C, X): the length axis maps to
  lanes (128-wide, fully used), channels to sublanes — at C=32 a
  channels-last layout would idle 3/4 of every lane.
- narrow stages (C < 128) build a shifted-copy patch matrix
  (C*k, TILE+pad) in VMEM and run ONE matmul per conv,
  W (C, C*k) @ patches, lifting the contraction dim from C to C*k;
  wide stages (C >= 128) accumulate per-tap matmuls (K=C is already
  MXU-sized) to keep VMEM bounded.
- halo handling: x is pre-padded host-side by H = total receptive radius
  (lane-aligned); every tile computes on [t*TILE, t*TILE + TILE + 2H)
  and writes only the central TILE, so tile boundaries are exact.
- activations stay in the input dtype (bf16 on the inference path);
  matmuls accumulate in f32 via preferred_element_type.

Parity: equivalent (up to float reassociation) to the flax ``ResBlock``
stack in cmtts_tpu.models.hifigan (reference ``hifigan/models.py:20-103``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _receptive_radius(kernel_sizes, dilations) -> int:
    r = 0
    for k in kernel_sizes:
        rk = sum(((k - 1) // 2) * d + (k - 1) // 2 for d in dilations)
        r = max(r, rk)
    return r


def _lrelu(x, slope=LRELU_SLOPE):
    # max-form leaky relu: for 0 < slope < 1, max(x, slope*x) == lrelu(x)
    # (2 VPU ops vs 3 for compare+select; and jnp.maximum lowers fine on
    # bf16 where a direct bf16 vector compare does not on this Mosaic)
    return jnp.maximum(x, x * x.dtype.type(slope))


def default_tile(C: int) -> int:
    """Length-tile keeping all per-tile buffers within VMEM (with margin:
    Mosaic's scoped-vmem stack for the patch matmuls runs ~2x the naive
    buffer estimate at higher matmul precisions).  C=128 carries ~8 MB of
    fused weights resident in VMEM — tile 512 is the largest that
    compiles on v5e (1024 exhausts scoped vmem)."""
    return {512: 512, 256: 512, 128: 512, 64: 2048}.get(C, 2048)


def _shift(h, off, C, W):
    if off < 0:
        return jnp.concatenate(
            [jnp.zeros((C, -off), h.dtype), h[:, :W + off]], axis=1)
    if off > 0:
        return jnp.concatenate(
            [h[:, off:], jnp.zeros((C, off), h.dtype)], axis=1)
    return h


def _conv_same(h, w_flat, bias, k, d, C, W, dtype, dot_dtype=None):
    """SAME conv on the local buffer (C, W).  Edge positions read zeros —
    they lie inside the halo and never reach the central TILE.

    ``dot_dtype``: dtype the matmul OPERANDS are cast to (accumulation
    stays f32 via preferred_element_type).  bf16 here matches what XLA
    itself does for f32 convolutions on TPU (single-pass bf16 MXU with
    f32 accumulate, the default precision) — storage and elementwise math
    stay in ``dtype``, so this avoids the bf16-activation-storage Mosaic
    regression seen in round 1 while doubling MXU throughput."""
    dd = dot_dtype or dtype
    half = (k - 1) // 2
    offs = [(t - half) * d for t in range(k)]
    if C < 128:
        patches = jnp.concatenate([_shift(h, o, C, W) for o in offs], axis=0)
        out = jnp.dot(w_flat.astype(dd), patches.astype(dd),
                      preferred_element_type=jnp.float32)
    else:
        out = jnp.zeros((C, W), jnp.float32)
        for t, o in enumerate(offs):
            out = out + jnp.dot(w_flat[:, t * C:(t + 1) * C].astype(dd),
                                _shift(h, o, C, W).astype(dd),
                                preferred_element_type=jnp.float32)
    return (out + bias.astype(jnp.float32)).astype(dtype)


def _mrf_body(x, refs, kernel_sizes, dilations, C, W, dtype, mask,
              dot_dtype=None):
    """x (C, W) -> fused MRF output (C, W) (valid only in the center).

    ``mask`` (1, W) is 1 where the position lies inside the true sequence
    [0, L), or None for interior tiles whose whole window lies inside the
    sequence (the mask would be all-ones — skipping it drops 2 VPU
    multiplies per conv).  When present, every conv output is re-masked:
    the stack of SAME convs zero-pads at EVERY layer, so activations
    outside the sequence must stay exactly zero — conv(0) = bias would
    otherwise bleed into the edge region through subsequent taps.
    """
    n_blocks = len(kernel_sizes)
    acc = None
    for b in range(n_blocks):
        w1, b1, w2, b2 = refs[4 * b: 4 * b + 4]
        k = kernel_sizes[b]
        y = x
        for p, d in enumerate(dilations):
            h = _lrelu(y)
            h = _conv_same(h, w1[p], b1[p], k, d, C, W, dtype, dot_dtype)
            if mask is not None:
                h = h * mask
            h = _lrelu(h)
            h = _conv_same(h, w2[p], b2[p], k, 1, C, W, dtype, dot_dtype)
            if mask is not None:
                h = h * mask
            y = y + h
        acc = y if acc is None else acc + y
    return (acc / n_blocks).astype(dtype)


@functools.partial(jax.jit, static_argnames=("kernel_sizes", "dilations",
                                             "tile", "interpret",
                                             "compute_dtype", "dot_dtype",
                                             "post_k"))
def fused_mrf_stage(x, stage_params_packed, kernel_sizes=(3, 7, 11),
                    dilations=(1, 3, 5), tile: int | None = None,
                    interpret: bool = False, compute_dtype=None,
                    dot_dtype=None, post_params=None, post_k: int = 7):
    """Apply one fused MRF stage.

    x: (B, L, C) channels-last (the generator's layout).
    stage_params_packed: flat tuple from ``pack_mrf_params``.
    ``compute_dtype``: in-VMEM activation dtype (defaults to x.dtype).
    Casting INSIDE the kernel keeps the XLA-side transpose/pad in the
    input dtype — an f32->bf16 cast fused into the pre-kernel relayout
    measured pathologically slow on v5e (round-1 "bf16 embedded"
    regression; resolved by in-kernel casts).
    ``post_params``: optional ``(w_flat (1, post_k*C), bias (1, 1))`` from
    ``pack_post_params`` — fuses the generator head
    (leaky_relu(0.01) -> conv_post k=7 -> tanh, reference
    hifigan/models.py:166-173) into this kernel, and the waveform
    (B, L) is returned instead of the stage output.  XLA's standalone
    head is pathological (N=1 conv + two full-length layout copies).
    Returns (B, L, C) in x.dtype, or (B, L) when post_params is given.
    """
    B, L, C = x.shape
    dtype = x.dtype
    compute_dtype = compute_dtype or dtype
    H = _receptive_radius(kernel_sizes, dilations)
    if post_params is not None:
        H += (post_k - 1) // 2
    H = int(math.ceil(H / 128) * 128)
    TILE = tile or default_tile(C)
    TILE = min(TILE, int(math.ceil(L / 128) * 128))
    n_tiles = -(-L // TILE)
    Lp = n_tiles * TILE
    W = TILE + 2 * H

    # channels-first + halo pad (one XLA relayout; the kernel then reads
    # x exactly once).  NOTE: a channels-last kernel (which would avoid
    # the relayout) is blocked on this Mosaic version — DMA slices with a
    # minor-most dim < 128 (C=32/64) fail "must be aligned to tiling".
    xt = jnp.transpose(x, (0, 2, 1))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (H, H + Lp - L)))

    n_blocks = len(kernel_sizes)
    post = post_params is not None
    extra = tuple(post_params) if post else ()

    def kernel(x_hbm, *refs):
        b = pl.program_id(0)
        t = pl.program_id(1)
        weight_vals = [r[:] for r in refs[:-1]]
        out_ref = refs[-1]

        def body(x_vmem, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[b, :, pl.ds(t * TILE, W)], x_vmem, sem)
            dma.start()
            dma.wait()
            xin = x_vmem[:].astype(compute_dtype)

            def run(mask):
                out = _mrf_body(xin, weight_vals[:4 * n_blocks],
                                kernel_sizes, dilations, C, W, compute_dtype,
                                mask, dot_dtype)
                if post:
                    w_post, b_post = weight_vals[4 * n_blocks:]
                    h = _lrelu(out, 0.01)
                    wav = _conv_same(h, w_post, b_post, post_k, 1, C, W,
                                     compute_dtype, dot_dtype)
                    return jnp.tanh(
                        wav[:1, H: H + TILE].astype(jnp.float32)).astype(dtype)
                return out[:, H: H + TILE].astype(dtype)

            def edge_case():
                # global padded coordinate of each local position
                pos = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) \
                    + t * TILE
                return run(((pos >= H) & (pos < H + L))
                           .astype(compute_dtype))

            # interior tiles (window fully inside [0, L)) skip the 2-per-
            # conv mask multiplies — the mask would be all-ones there
            interior = (t * TILE >= H) & (t * TILE + TILE + H <= L)
            out_ref[0] = jax.lax.cond(interior, lambda: run(None), edge_case)

        pl.run_scoped(
            body,
            x_vmem=pltpu.VMEM((C, W), dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)
                    for _ in range(4 * n_blocks + len(extra))]

    out_block = (1, 1, TILE) if post else (1, C, TILE)
    out_shape = (B, 1, Lp) if post else (B, C, Lp)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + weight_specs,
        out_specs=pl.BlockSpec(out_block, lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
        interpret=interpret,
    )(xt, *stage_params_packed, *extra)

    if post:
        return out[:, 0, :L]
    return jnp.transpose(out[:, :, :L], (0, 2, 1))


@functools.partial(jax.jit, static_argnames=("kernel_sizes", "dilations",
                                             "tile", "interpret",
                                             "compute_dtype", "dot_dtype"))
def fused_mrf_stage_streamed(x, weights_hbm, biases, kernel_sizes=(3, 7, 11),
                             dilations=(1, 3, 5), tile: int | None = None,
                             interpret: bool = False, compute_dtype=None,
                             dot_dtype=None):
    """Fused MRF stage for channel widths whose weights exceed VMEM
    (stage 0, C=256: ~16.5 MB bf16 vs ~16 MB VMEM): weights stay in HBM
    and are DMA'd per-conv into a double-buffered VMEM scratch, each
    prefetch overlapping the previous conv's matmuls (canonical
    double-buffer pattern, pallas_guide.md "Patterns: Double Buffering").

    Why it wins: XLA runs the C=256 MRF at ~9 TFLOP/s effective on the
    single-sample path (layout copies + one-HBM-round-trip-per-conv);
    here x is read once per tile, all 18 convs hit the MXU back-to-back
    in bf16, and the total weight re-stream per tile (16.5 MB, ~20 us at
    HBM speed) hides behind ~80 us of matmuls.

    x: (B, L, C) channels-last.
    weights_hbm: tuple of 2*n_blocks bf16 arrays (w1_b, w2_b per block),
        each (n_pairs, C, k_b*C) — from ``pack_mrf_params_streamed``.
    biases: tuple of 2*n_blocks f32 arrays (b1_b, b2_b per block), each
        (n_pairs, C, 1), VMEM-resident (18 KB total).
    Returns (B, L, C) in x.dtype.  Same math as ``fused_mrf_stage``
    (reference ``hifigan/models.py:20-103``).
    """
    B, L, C = x.shape
    dtype = x.dtype
    compute_dtype = compute_dtype or dtype
    dd = dot_dtype or compute_dtype
    H = _receptive_radius(kernel_sizes, dilations)
    H = int(math.ceil(H / 128) * 128)
    TILE = tile or 512
    TILE = min(TILE, int(math.ceil(L / 128) * 128))
    n_tiles = -(-L // TILE)
    Lp = n_tiles * TILE
    W = TILE + 2 * H

    xt = jnp.transpose(x, (0, 2, 1))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (H, H + Lp - L)))

    n_blocks = len(kernel_sizes)
    n_pairs = len(dilations)
    kmax = max(kernel_sizes)
    # execution order of the 2*n_pairs*n_blocks convs:
    # (block, pair, conv1|conv2) -> (weight ref index, pair row, k)
    seq = []
    for bidx, k in enumerate(kernel_sizes):
        for p in range(n_pairs):
            seq.append((2 * bidx + 0, p, k))   # conv1 (dilated)
            seq.append((2 * bidx + 1, p, k))   # conv2 (dilation 1)

    def kernel(x_hbm, *refs):
        w_refs = refs[:2 * n_blocks]           # HBM (ANY)
        b_refs = refs[2 * n_blocks:-1]         # VMEM-resident biases
        out_ref = refs[-1]
        b = pl.program_id(0)
        t = pl.program_id(1)

        def body(x_vmem, wbuf, xsem, wsem):
            xdma = pltpu.make_async_copy(
                x_hbm.at[b, :, pl.ds(t * TILE, W)], x_vmem, xsem)
            xdma.start()

            def wcopy(i):
                ridx, p, k = seq[i]
                return pltpu.make_async_copy(
                    w_refs[ridx].at[p],
                    wbuf.at[i % 2, :, pl.ds(0, k * C)],
                    wsem.at[i % 2])

            wcopy(0).start()
            xdma.wait()
            xin = x_vmem[:].astype(compute_dtype)
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) + t * TILE
            mask = ((pos >= H) & (pos < H + L)).astype(compute_dtype)

            def conv(h, w, bias, k, d):
                half = (k - 1) // 2
                out = jnp.zeros((C, W), jnp.float32)
                for tap in range(k):
                    o = (tap - half) * d
                    out = out + jnp.dot(
                        w[:, tap * C:(tap + 1) * C].astype(dd),
                        _shift(h, o, C, W).astype(dd),
                        preferred_element_type=jnp.float32)
                return ((out + bias.astype(jnp.float32))
                        .astype(compute_dtype)) * mask

            acc = None
            i = 0
            for bidx, k in enumerate(kernel_sizes):
                b1 = b_refs[2 * bidx][:]
                b2 = b_refs[2 * bidx + 1][:]
                y = xin
                for p in range(n_pairs):
                    h = _lrelu(y)
                    if i + 1 < len(seq):
                        wcopy(i + 1).start()
                    wcopy(i).wait()
                    h = conv(h, wbuf[i % 2, :, :k * C], b1[p], k,
                             dilations[p])
                    i += 1
                    h = _lrelu(h)
                    if i + 1 < len(seq):
                        wcopy(i + 1).start()
                    wcopy(i).wait()
                    h = conv(h, wbuf[i % 2, :, :k * C], b2[p], k, 1)
                    i += 1
                    y = y + h
                acc = y if acc is None else acc + y
            out_ref[0] = (acc / n_blocks)[:, H: H + TILE].astype(dtype)

        pl.run_scoped(
            body,
            x_vmem=pltpu.VMEM((C, W), dtype),
            wbuf=pltpu.VMEM((2, C, kmax * C), weights_hbm[0].dtype),
            xsem=pltpu.SemaphoreType.DMA(()),
            wsem=pltpu.SemaphoreType.DMA((2,)),
        )

    specs = ([pl.BlockSpec(memory_space=pl.ANY)]            # x
             + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_blocks)
             + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_blocks))
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, C, TILE), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Lp), dtype),
        interpret=interpret,
    )(xt, *weights_hbm, *biases)
    return jnp.transpose(out[:, :, :L], (0, 2, 1))


def pack_mrf_params_streamed(gen_params: dict, stage: int, C: int,
                             kernel_sizes=(3, 7, 11),
                             weight_dtype=jnp.bfloat16):
    """Pack a stage's MRF params for ``fused_mrf_stage_streamed``:
    (weights, biases) with weights (n_pairs, C, k*C) in ``weight_dtype``
    (left in HBM) and biases (n_pairs, C, 1) f32 (VMEM-resident)."""
    flat = pack_mrf_params(gen_params, stage, C, kernel_sizes, jnp.float32)
    weights, biases = [], []
    for j in range(len(kernel_sizes)):
        w1, b1, w2, b2 = flat[4 * j: 4 * j + 4]
        weights += [w1.astype(weight_dtype), w2.astype(weight_dtype)]
        biases += [b1, b2]
    return tuple(weights), tuple(biases)


def pack_post_params(gen_params: dict, C: int, dtype=jnp.float32):
    """Flatten the conv_post params into the fused head's layout:
    w_flat[(0), t*C + i] = K[t, i, 0] (tap-major rows, matching the patch
    matrix)."""
    k = gen_params["conv_post"]["kernel"]  # (k, C, 1)
    w = jnp.transpose(k, (2, 0, 1)).reshape(1, -1).astype(dtype)
    b = gen_params["conv_post"]["bias"].reshape(1, 1).astype(dtype)
    return (w, b)


def pack_mrf_params(gen_params: dict, stage: int, C: int,
                    kernel_sizes=(3, 7, 11), dtype=jnp.float32):
    """Flatten the flax res_{stage}_{j} param subtrees into the kernel's
    stacked layout (w1, b1, w2, b2) per block.

    flax Conv kernel is (k, C_in, C_out); the patch matrix stacks taps as
    [tap0 rows; tap1 rows; ...], so w_flat[o, t*C + i] = K[t, i, o].
    """
    packed = []
    for j, k in enumerate(kernel_sizes):
        bp = gen_params[f"res_{stage}_{j}"]
        n_pairs = len([n for n in bp if n.startswith("conv1_")])
        w1s, b1s, w2s, b2s = [], [], [], []
        for p in range(n_pairs):
            k1 = bp[f"conv1_{p}"]["kernel"]
            k2 = bp[f"conv2_{p}"]["kernel"]
            w1s.append(jnp.transpose(k1, (2, 0, 1)).reshape(C, k * C))
            w2s.append(jnp.transpose(k2, (2, 0, 1)).reshape(C, k * C))
            b1s.append(bp[f"conv1_{p}"]["bias"][:, None])
            b2s.append(bp[f"conv2_{p}"]["bias"][:, None])
        packed.extend([
            jnp.stack(w1s).astype(dtype), jnp.stack(b1s).astype(dtype),
            jnp.stack(w2s).astype(dtype), jnp.stack(b2s).astype(dtype)])
    return tuple(packed)
