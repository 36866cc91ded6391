"""Generation CLI — PNG sample dumps from a checkpoint.

Same flag surface as the reference (src/tinyedm/generate.py:50-90):
--ckpt_path --load_ema --output_dir --num_samples --image_size --num_classes
--batch_size --num_steps. The whole 2*num_steps-1-forward Heun solve runs as
one jitted lax.scan per batch on device; PNG writing overlaps on host.

Improvements over the reference: --load_ema is unambiguous (the reference
loads the checkpoint twice and the second load can clobber the EMA swap,
SURVEY.md §2.1 quirk); the denormalization stats come from flags instead
of being hardcoded to CIFAR-10 (generate.py:31-34 "need to do better"); and
sampling is data-parallel over every visible chip (batch split on the mesh
``data`` axis, weights replicated; multi-host processes write only their
own rows) — the reference samples on one GPU.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.data.datamodules import RandomNoiseDataModule
from tinyedm_tpu.diffusion.solver import DeterministicSolver
from tinyedm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    process_local_slice,
    replicated,
    shard_batch,
    variables_shardings,
)
from tinyedm_tpu.training.callbacks import PreditionWriter
from tinyedm_tpu.training.checkpoint import load_edm_from_checkpoint
from tinyedm_tpu.utils.tpu import tune_for_tpu

# reference default stats (generate.py:31-34) — CIFAR-10; override via flags
CIFAR10_MEAN = (0.49139968, 0.48215841, 0.44653091)
CIFAR10_STD = (0.24703223, 0.24348513, 0.26158784)


def device_denormalize_uint8(x, mean, std):
    """The PreditionWriter pixel mapping (x*std*2 + mean -> clamp [0,1] ->
    *255 -> uint8, reference callbacks.py:141-156), as a jittable tail for
    the solver so each batch crosses the device->host boundary as uint8 —
    4x less transfer than f32. Same op order and all-f32 arithmetic as the
    host path in PreditionWriter.write_batch (parity pinned in
    tests/test_e2e.py::test_device_denormalize_matches_host_writer)."""
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)
    y = x.astype(jnp.float32) * std * 2.0 + mean
    return (jnp.clip(y, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def local_rows(batch_size: int, n_valid: int, indices, pi: int, pc: int):
    """Multi-host write split: (local_offsets, global_indices) for the rows
    this process owns out of a padded global batch. Local offsets index the
    process's contiguous local block (as assembled by assemble_local_batch)
    — the process-contiguity invariant (process pi owns global rows
    [pi*bs/pc, (pi+1)*bs/pc), the same slice process_local_slice feeds)
    lives entirely here. Pad rows (global position >= n_valid) are
    dropped."""
    per = batch_size // pc
    pos = process_local_slice(np.arange(batch_size), pi, pc)
    kept = pos[pos < n_valid]
    return kept - pi * per, [indices[int(k)] for k in kept]


def assemble_local_batch(shard_pairs):
    """Concatenate a process's addressable shards of a batch-sharded array
    into its contiguous local rows, in row order.

    ``shard_pairs`` is [(row_start, array), ...]. Under tensor parallelism
    the output's P('data') sharding replicates every data chunk across the
    model axis, so a process sees each of its chunks ``model_parallel``
    times — keep exactly one copy per unique row_start (duplicates are
    identical replicas by construction)."""
    unique = {}
    for start, data in shard_pairs:
        unique.setdefault(int(start), data)
    return np.concatenate([unique[k] for k in sorted(unique)])


def generate(
    ckpt_path: str,
    load_ema: bool,
    output_dir: str,
    num_samples: int,
    image_size: int,
    num_classes: int | None,
    batch_size: int,
    num_workers: int = 16,
    num_steps: int = 32,
    num_channels: int = 3,
    mean=CIFAR10_MEAN,
    std=CIFAR10_STD,
    solver_dtype: str | None = None,
    seed: int = 0,
    ckpt_step: int | None = None,
    ema_index: int = 0,
    s_churn: float = 0.0,
    s_noise: float = 1.0,
    s_min: float = 0.0,
    s_max: float = float("inf"),
    guidance_scale: float | None = None,
    guide_ckpt_path: str | None = None,
    guide_ckpt_step: int | None = None,
    guide_ema_index: int = 0,
    guidance_sigma_min: float = 0.0,
    guidance_sigma_max: float = float("inf"),
    model_parallel: int = 1,
    solver_name: str = "heun",
) -> None:
    tune_for_tpu()
    spec, model, variables, _ = load_edm_from_checkpoint(
        ckpt_path, step=ckpt_step, load_ema=load_ema, ema_index=ema_index
    )
    model = spec.build_model(inference_fast=True)  # Pallas attention on TPU
    if load_ema:
        print("EMA weights loaded.")
    guide_model = guide_vars = None
    if guide_ckpt_path is not None:
        # autoguidance: a second (weaker) model supplies the guide branch
        guide_spec, _, guide_vars, _ = load_edm_from_checkpoint(
            guide_ckpt_path, step=guide_ckpt_step, load_ema=load_ema,
            ema_index=guide_ema_index,
        )
        guide_model = guide_spec.build_model(inference_fast=True)
        print(f"autoguidance model loaded from {guide_ckpt_path}")

    # data-parallel sampling over every visible chip: batch split on the
    # mesh ``data`` axis, weights replicated. On one device this degenerates
    # to the plain jit. (The reference samples on a single GPU; 50k-sample
    # FID dumps are embarrassingly batch-parallel.) --model_parallel N
    # additionally TP-shards the weight-normed kernels over the ``model``
    # axis — for models whose weights don't fit one chip's HBM.
    mesh = make_mesh(model_parallel=model_parallel)
    n_data = mesh.shape["data"]
    if batch_size % n_data:
        batch_size = -(-batch_size // n_data) * n_data
        print(f"[generate] batch_size rounded up to {batch_size} "
              f"(multiple of the {n_data}-way data axis)")
    var_shd = variables_shardings(mesh, variables)
    variables = jax.device_put(variables, var_shd)
    stochastic = s_churn > 0
    if stochastic and solver_name != "heun":
        raise ValueError(
            "--S_churn is the Heun stochastic sampler (EDM Algorithm 2); "
            f"it does not compose with --solver {solver_name}"
        )
    if stochastic:
        from tinyedm_tpu.diffusion.solver import StochasticSolver

        solver = StochasticSolver(
            num_steps=num_steps, dtype=solver_dtype,
            S_churn=s_churn, S_noise=s_noise, S_min=s_min, S_max=s_max,
        )
    elif solver_name == "dpmpp2m":
        # DPM-Solver++(2M): one forward per step (Heun costs 2n-1)
        from tinyedm_tpu.diffusion.solver import MultistepSolver

        solver = MultistepSolver(num_steps=num_steps, dtype=solver_dtype)
    elif solver_name == "heun":
        solver = DeterministicSolver(num_steps=num_steps, dtype=solver_dtype)
    else:
        raise ValueError(f"unknown solver {solver_name!r} (heun | dpmpp2m)")
    datamodule = RandomNoiseDataModule(
        batch_size=batch_size,
        num_workers=num_workers,
        image_size=image_size,
        num_samples=num_samples,
        num_classes=num_classes,
        num_channels=num_channels,
        seed=seed,
    )
    writer = PreditionWriter(output_dir, "batch", mean=mean, std=std)
    conditional = model.conditional

    data_shd = batch_sharding(mesh)
    rep = replicated(mesh)

    guided = guidance_scale is not None
    auto_guided = guided and guide_model is not None
    if guided and not auto_guided and guidance_scale == 1.0:
        # scale 1 IS the conditional model — skip the stacked 2B forward
        # (the wrapper's d_u + 1*(d_c - d_u) also isn't bitwise d_c)
        print("[generate] guidance_scale 1.0 = conditional model; "
              "sampling unguided (no stacked forward)")
        guided = False
    if guided and not auto_guided and not conditional:
        raise ValueError(
            "--guidance_scale needs a conditional model "
            "(or --guide_ckpt_path for autoguidance)"
        )
    if guide_model is not None and not guided:
        raise ValueError("--guide_ckpt_path needs --guidance_scale")
    gvar_shd = rep
    if auto_guided:
        gvar_shd = variables_shardings(mesh, guide_vars)
        guide_vars = jax.device_put(guide_vars, gvar_shd)
    # limited-interval guidance: only wrap in the sigma gate when the
    # interval actually restricts something (default (0, inf) = always on)
    interval = None
    if guidance_sigma_min > 0 or guidance_sigma_max != float("inf"):
        if guidance_scale is None:
            raise ValueError(
                "--guidance_sigma_min/--guidance_sigma_max need "
                "--guidance_scale (an interval without a scale would "
                "silently sample unguided)"
            )
        interval = (guidance_sigma_min, guidance_sigma_max)

    # device-side denormalization in the jitted solve tail: uint8 readback
    # is 4x fewer bytes over the device link (614 -> 154 MB per 50k CIFAR
    # run). Measured steady-state rate is unchanged on this shape (~91
    # img/s — the two-level pipeline below already hid the f32 transfer;
    # the 78.8-vs-91.8 average gap in the 50k protocol log was startup
    # amortization: ~30 s of backend init + weight restore + warm-cache
    # compile, ~47 s cold — BENCH.md round 5).
    def _to_uint8(x):
        return device_denormalize_uint8(x, mean, std)

    def _sample(variables, gvars, x0, labels, churn_key):
        def denoise_fn(x, sigma, lab):
            return model.apply(variables, x, sigma, lab)

        fn = denoise_fn
        if auto_guided:
            # autoguidance: D_guide + s * (D_main - D_guide), two forwards
            from tinyedm_tpu.diffusion.guidance import autoguidance_denoise_fn

            fn = autoguidance_denoise_fn(
                denoise_fn,
                lambda x, s, l: guide_model.apply(gvars, x, s, l),
                guidance_scale,
                interval=interval,
            )
        elif guided and guidance_scale == 0.0 and interval is None:
            # scale 0 = fully unconditional: one null-label forward, no
            # stacked batch needed
            from tinyedm_tpu.diffusion.guidance import NULL_LABEL

            fn = lambda x, s, l: denoise_fn(x, s, jnp.full_like(l, NULL_LABEL))  # noqa: E731
        elif guided:
            # classifier-free guidance: one stacked (2B) forward per
            # half-step, cond + null-label branches combined on-device
            from tinyedm_tpu.diffusion.guidance import cfg_denoise_fn

            fn = cfg_denoise_fn(denoise_fn, guidance_scale, interval=interval)
        lab = labels if conditional else None
        if stochastic:
            return _to_uint8(solver.solve(fn, x0, lab, rng=churn_key))
        return _to_uint8(solver.solve(fn, x0, lab))

    # weight in_shardings come from the placed trees (replicated on a DP
    # mesh, kernel-sharded under --model_parallel); gvars is None (an empty
    # pytree — sharding prefix vacuous) unless autoguidance loaded a second
    # model
    sample = jax.jit(
        _sample,
        in_shardings=(var_shd, gvar_shd, data_shd, data_shd, rep),
        out_shardings=data_shd,
    )

    t0 = time.time()
    done = 0
    # two-level pipeline (the reference round-trips serially per batch,
    # callbacks.py:153): one solve is always IN FLIGHT on the device while
    # the host reads back the previous batch's result and PNG-encodes older
    # ones in pool threads — jax dispatch is async, so blocking on batch k's
    # device->host transfer only after batch k+1 is dispatched keeps the
    # chip busy through the transfer + host noise generation.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=8)
    pending = []
    churn_rng = jax.random.PRNGKey(seed ^ 0xC4A2)
    pc, pi = jax.process_count(), jax.process_index()

    def drain(xT, n, indices):
        nonlocal done
        if pc == 1:
            arr = np.asarray(xT)[:n]
            idx = indices
        else:
            # multi-host: every process solves its batch shard and writes
            # ONLY its own rows (process-contiguous by shard_batch; TP
            # model-axis replicas deduped by row start)
            arr = assemble_local_batch(
                (s.index[0].start or 0, np.asarray(s.data))
                for s in xT.addressable_shards
            )
            local_pos, idx = local_rows(batch_size, n, indices, pi, pc)
            arr = arr[local_pos]
        if len(idx):
            pending.append(pool.submit(writer.write_batch, arr, idx))
        done += n
        if done % (batch_size * 10) < batch_size:
            rate = done / (time.time() - t0)
            print(f"{done}/{num_samples} images ({rate:.1f} img/s)")

    in_flight = None  # (device result, n_valid, indices)
    for batch_idx, (noise, labels, indices) in enumerate(datamodule.predict_batches()):
        n = len(indices)
        if n < batch_size:  # pad the tail batch: one compiled shape only
            pad = batch_size - n
            noise = np.concatenate([noise, noise[:1].repeat(pad, 0)])
            labels = np.concatenate([labels, labels[:1].repeat(pad, 0)])
        noise_d, labels_d = shard_batch(mesh, (noise, labels))
        xT = sample(
            variables, guide_vars, noise_d, labels_d,
            jax.random.fold_in(churn_rng, batch_idx),
        )
        if in_flight is not None:
            drain(*in_flight)  # blocks on batch k while k+1 runs
        in_flight = (xT, n, indices)
    if in_flight is not None:
        drain(*in_flight)
    for f in pending:
        f.result()
    pool.shutdown()
    elapsed = time.time() - t0
    print(f"wrote {done} images to {output_dir} in {elapsed:.1f}s "
          f"({done / elapsed:.1f} img/s end-to-end incl. PNG IO)")
    try:  # protocol-scale accounting (50k runs); not all backends report
        mstats = jax.local_devices()[0].memory_stats() or {}
        peak = mstats.get("peak_bytes_in_use")
        if peak:
            print(f"[generate] device peak HBM: {peak / 2**30:.2f} GiB")
    except Exception:
        pass


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Run the model generation")
    parser.add_argument("--ckpt_path", type=str, required=True, help="Path to the checkpoint directory")
    parser.add_argument("--load_ema", action="store_true", help="Load the exponential moving average of the weights")
    parser.add_argument("--output_dir", type=str, required=True, help="Directory for output")
    parser.add_argument("--num_samples", type=int, required=True, help="Number of samples to generate")
    parser.add_argument("--image_size", type=int, required=True, help="Image size")
    parser.add_argument("--num_classes", type=int, required=True, help="Number of classes (0 = unconditional)")
    parser.add_argument("--batch_size", type=int, required=True, help="Batch size")
    parser.add_argument("--num_workers", type=int, default=16, help="Number of workers (default: 16)")
    parser.add_argument("--num_steps", type=int, default=32, help="Number of steps (default: 32)")
    parser.add_argument("--num_channels", type=int, default=3)
    parser.add_argument("--mean", type=float, nargs="+", default=list(CIFAR10_MEAN))
    parser.add_argument("--std", type=float, nargs="+", default=list(CIFAR10_STD))
    parser.add_argument("--solver_dtype", type=str, default=None, choices=[None, "float32", "bfloat16", "float64"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ckpt_step", type=int, default=None, help="checkpoint step (default: latest)")
    parser.add_argument("--ema_index", type=int, default=0, help="EMA profile index for multi-profile checkpoints")
    parser.add_argument("--S_churn", type=float, default=0.0, help=">0 enables the stochastic (churn) sampler")
    parser.add_argument("--S_noise", type=float, default=1.0)
    parser.add_argument("--S_min", type=float, default=0.0)
    parser.add_argument("--S_max", type=float, default=float("inf"))
    parser.add_argument(
        "--guidance_scale", type=float, default=None,
        help="guidance scale: with --guide_ckpt_path it weights main vs "
             "guide model (autoguidance); alone it is classifier-free "
             "guidance, cond vs null-label (train with label_dropout > 0 "
             "for a meaningful unconditional branch). 1 = main model",
    )
    parser.add_argument(
        "--guide_ckpt_path", type=str, default=None,
        help="autoguidance: checkpoint of a weaker (smaller/less-trained) "
             "model to guide with (Karras et al. 2024)",
    )
    parser.add_argument("--guide_ckpt_step", type=int, default=None)
    parser.add_argument("--guide_ema_index", type=int, default=0)
    parser.add_argument(
        "--guidance_sigma_min", type=float, default=0.0,
        help="limited-interval guidance (Kynkaanniemi et al. 2024): apply "
             "guidance only while sigma_min < sigma <= sigma_max, the plain "
             "model elsewhere — improves FID at high scales AND skips the "
             "guide forward outside the interval (EDM2's ImageNet-512 "
             "interval is [0.19, 1.61])",
    )
    parser.add_argument("--guidance_sigma_max", type=float, default=float("inf"))
    parser.add_argument(
        "--solver", type=str, default="heun", choices=["heun", "dpmpp2m"],
        help="ODE sampler: 2nd-order Heun (reference, 2n-1 forwards) or "
             "DPM-Solver++(2M) (order-2 multistep, n forwards — comparable "
             "quality at roughly half the compute per image)",
    )
    parser.add_argument(
        "--model_parallel", type=int, default=1,
        help="tensor-parallel sampling: shard the weight-normed kernels "
             "over a model axis of this size (for models too large for one "
             "chip's HBM); the batch splits over the remaining devices/N "
             "data axis",
    )
    args = parser.parse_args(argv)
    generate(
        args.ckpt_path,
        args.load_ema,
        args.output_dir,
        args.num_samples,
        args.image_size,
        args.num_classes if args.num_classes > 0 else None,
        args.batch_size,
        args.num_workers,
        args.num_steps,
        args.num_channels,
        tuple(args.mean),
        tuple(args.std),
        args.solver_dtype,
        args.seed,
        args.ckpt_step,
        args.ema_index,
        args.S_churn,
        args.S_noise,
        args.S_min,
        args.S_max,
        args.guidance_scale,
        args.guide_ckpt_path,
        args.guide_ckpt_step,
        args.guide_ema_index,
        args.guidance_sigma_min,
        args.guidance_sigma_max,
        args.model_parallel,
        args.solver,
    )


if __name__ == "__main__":
    main()
