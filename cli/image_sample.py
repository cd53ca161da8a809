"""Image-domain CM sampling harness.

Parity with reference ``image_sample.py`` (147 LoC, duplicated verbatim
at ``model/cm_tool/image_sample.py``): build the image UNet + EDM
schedule from the same flag surface, draw ``num_samples`` samples with
the chosen Karras sampler, and save a ``samples_{shape}.npz`` of uint8
NHWC images (+ labels when class-conditional).

TPU-first: one jitted sampler graph per batch (NHWC, bf16-capable);
data-parallel sharding comes from running under a mesh the same way the
TTS CLIs do.  The reference's per-rank ``dist.all_gather`` loop is
unnecessary under single-controller JAX.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def str2bool(v):  # reference script_util.py:262-271
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def create_argparser():
    """Same surface as reference image_sample.py:121-140 +
    model_and_diffusion_defaults (script_util.py:27-53)."""
    defaults = dict(
        training_mode="edm", generator="determ", clip_denoised=True,
        num_samples=64, batch_size=16, sampler="heun", s_churn=0.0,
        s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0, steps=40,
        model_path="", seed=42, ts="",
        # model_and_diffusion_defaults
        sigma_min=0.002, sigma_max=80.0, image_size=64, num_channels=128,
        num_res_blocks=2, num_heads=4, num_heads_upsample=-1,
        num_head_channels=-1, attention_resolutions="32,16,8",
        channel_mult="", dropout=0.0, class_cond=False,
        use_scale_shift_norm=True, resblock_updown=False,
        use_new_attention_order=False, learn_sigma=False,
        weight_schedule="karras", out_dir="./image_samples",
        # accepted for reference-command-line compatibility; no-ops on
        # TPU (bf16 replaces fp16, remat replaces torch checkpointing)
        use_fp16=False, use_checkpoint=False, loss_norm="lpips",
    )
    p = argparse.ArgumentParser()
    for k, v in defaults.items():
        t = type(v)
        if t is bool:
            p.add_argument(f"--{k}", type=str2bool, default=v)
        else:
            p.add_argument(f"--{k}", type=t, default=v)
    return p


def load_unet_params(path: str, model, rng):
    import jax
    import jax.numpy as jnp

    from cmtts_tpu.models.unet import convert_torch_unet

    c = model.cfg
    if path and (path.endswith(".pt") or path.endswith(".pth")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        return convert_torch_unet(sd, c)
    if path and path.endswith(".npz"):
        from cmtts_tpu.models.hifigan import unflatten_npz

        return unflatten_npz(path)
    import warnings

    warnings.warn("no --model_path given; sampling from a random-init UNet")
    y0 = jnp.zeros((1,), jnp.int32) if c.num_classes else None
    return model.init(rng, jnp.zeros((1, c.image_size, c.image_size,
                                      c.in_channels)),
                      jnp.zeros((1,)), y0)["params"]


def main():
    args = create_argparser().parse_args()
    import jax
    from cmtts_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from cmtts_tpu.cm.image import karras_sample_image, to_uint8
    from cmtts_tpu.cm.karras import KarrasSchedule
    from cmtts_tpu.models.unet import NUM_CLASSES, create_image_unet

    model = create_image_unet(
        args.image_size, args.num_channels, args.num_res_blocks,
        channel_mult=args.channel_mult, learn_sigma=args.learn_sigma,
        class_cond=args.class_cond,
        attention_resolutions=args.attention_resolutions,
        num_heads=args.num_heads, num_head_channels=args.num_head_channels,
        num_heads_upsample=args.num_heads_upsample,
        use_scale_shift_norm=args.use_scale_shift_norm,
        dropout=args.dropout, resblock_updown=args.resblock_updown,
        use_new_attention_order=args.use_new_attention_order)
    sched = KarrasSchedule(
        sigma_min=args.sigma_min, sigma_max=args.sigma_max,
        distillation="consistency" in args.training_mode)

    rng = jax.random.PRNGKey(args.seed)
    rng, sub = jax.random.split(rng)
    params = load_unet_params(args.model_path, model, sub)

    ts = tuple(int(x) for x in args.ts.split(",")) if args.ts else None
    if args.sampler == "multistep":
        assert ts, "--ts required for the multistep sampler"

    def apply_fn(p, x, t, y=None):
        return model.apply({"params": p}, x, t, y)

    @jax.jit
    def draw(p, rng_s, y):
        return karras_sample_image(
            apply_fn, p,
            (args.batch_size, args.image_size, args.image_size, 3),
            rng_s, sched, sampler=args.sampler, steps=args.steps, ts=ts,
            clip_denoised=args.clip_denoised, s_churn=args.s_churn,
            s_tmin=args.s_tmin, s_tmax=args.s_tmax, s_noise=args.s_noise,
            model_kwargs=None if y is None else {"y": y})

    all_images, all_labels = [], []
    n_done = 0
    while n_done < args.num_samples:
        rng, s1, s2 = jax.random.split(rng, 3)
        y = jax.random.randint(s2, (args.batch_size,), 0, NUM_CLASSES) \
            if args.class_cond else None
        sample = draw(params, s1, y)
        all_images.append(to_uint8(sample))
        if args.class_cond:
            all_labels.append(np.asarray(y))
        n_done += args.batch_size
        print(f"created {n_done} samples")

    arr = np.concatenate(all_images, axis=0)[: args.num_samples]
    os.makedirs(args.out_dir, exist_ok=True)
    shape_str = "x".join(str(x) for x in arr.shape)
    out_path = os.path.join(args.out_dir, f"samples_{shape_str}.npz")
    if args.class_cond:
        labels = np.concatenate(all_labels, axis=0)[: args.num_samples]
        np.savez(out_path, arr, labels)
    else:
        np.savez(out_path, arr)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
