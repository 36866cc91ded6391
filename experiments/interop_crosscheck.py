"""Recipe-scale interop cross-check (VERDICT r3 next-round #7): export a
TRAINED checkpoint to the reference's lightning .ckpt format and verify the
REFERENCE code — its own torch modules, its own loss math — computes the
same validation loss on the same batch.

    python experiments/interop_crosscheck.py --ckpt_dir runs/soak_r4/ckpt [--load_ema]

What runs on the torch side: the reference's actual ``Denoiser``/``Embedding``
(imported from /root/reference/src/tinyedm/networks.py) in eval mode, driven
by the exported ``state_dict`` exactly as ``EDM.load_from_checkpoint``
(edm.py:159-203) would — lightning itself is not installed in this image, so
the lightning-free part of that loader (architecture from
``hyper_parameters``, weights from ``state_dict``, EMA from
``optimizer_states[0]['ema']``) is replicated here line-for-line, and the
validation math is the reference's validation_step (edm.py:238-248) with the
torchmetrics WeightedMeanSquaredError reduction (metric.py:21-54):
sum_b mean_pixels(w_b * (D - x)^2) / B.

The JAX side evaluates the SAME (clean, noisy, sigma, label) batch through
the checkpoint's model in fp32 (the comparison precision; training ran bf16
but the stored weights are fp32). PASS = losses agree to fp32 tolerance —
train -> export -> reference-consume closed at recipe scale, not toy scale.
"""

from __future__ import annotations

import argparse
import dataclasses
import importlib.util
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REF_NETWORKS = Path("/root/reference/src/tinyedm/networks.py")


def _load_ref_networks():
    spec = importlib.util.spec_from_file_location("ref_networks", REF_NETWORKS)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _strip_prefix(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _ref_loss(ref, torch, ckpt, batch, sigma, use_ema: bool) -> float:
    """The reference's validation_step math on its own modules."""
    hp = ckpt["hyper_parameters"]

    def kwargs(tree):
        return {k: v for k, v in tree.items() if k != "_target_"}

    denoiser = ref.Denoiser(**kwargs(hp["denoiser"]))
    embedding = ref.Embedding(**kwargs(hp["embedding"]))
    sd = ckpt["state_dict"]
    denoiser.load_state_dict(_strip_prefix(sd, "denoiser."))
    embedding.load_state_dict(_strip_prefix(sd, "embedding."), strict=False)
    if use_ema:
        # EDM.load_from_checkpoint(load_ema=True) zips the flat tuple at
        # optimizer_states[0]['ema'] against model.parameters() — NOT
        # state_dict order (which interleaves buffers) — and swaps tensors
        # (edm.py:172-181, 197-203). EDM registers embedding, denoiser,
        # then the optional uncertainty head (edm.py:128-146), so replicate
        # that parameters() sequence here; zip truncation drops the unused
        # trailing u.* tensors (validation_step never touches them).
        ema = ckpt["optimizer_states"][0]["ema"]
        params = list(embedding.parameters()) + list(denoiser.parameters())
        assert len(ema) >= len(params), (
            f"EMA tuple has {len(ema)} tensors, model has {len(params)} params"
        )
        with torch.no_grad():
            for param, ema_param in zip(params, ema):
                if tuple(param.shape) != tuple(ema_param.shape):
                    raise ValueError(
                        f"EMA/parameter order mismatch: {tuple(param.shape)} "
                        f"vs {tuple(ema_param.shape)}"
                    )
                param.copy_(ema_param)
    denoiser.eval()
    embedding.eval()

    clean, noisy, labels = batch
    clean_t = torch.from_numpy(clean.transpose(0, 3, 1, 2))
    noisy_t = torch.from_numpy(noisy.transpose(0, 3, 1, 2))
    sigma_t = torch.from_numpy(sigma)
    labels_t = torch.from_numpy(labels).long() if labels is not None else None
    sigma_data = denoiser.sigma_data
    with torch.no_grad():
        _, emb = embedding(sigma_t, labels_t)
        denoised = denoiser(noisy_t, sigma_t, emb)
        weight = (sigma_t**2 + sigma_data**2) / (sigma_t * sigma_data) ** 2
        # torchmetrics WeightedMeanSquaredError update (metric.py:21-36):
        # per-sample pixel mean of w*(err^2), summed, / N
        err2 = (denoised - clean_t) ** 2
        per_sample = (weight.view(-1, 1, 1, 1) * err2).mean(dim=(1, 2, 3))
        return float(per_sample.sum() / len(per_sample))


def _jax_loss(ckpt_dir, step, ema_index, use_ema, batch, sigma) -> float:
    import jax
    import jax.numpy as jnp

    from tinyedm_tpu.models.edm import EDM
    from tinyedm_tpu.training.checkpoint import load_edm_from_checkpoint

    spec, model, variables, _ = load_edm_from_checkpoint(
        ckpt_dir, step=step, load_ema=use_ema, ema_index=ema_index
    )
    # fp32 comparison graph (the torch side runs fp32; stored weights are fp32)
    model = EDM(
        embedding=spec.embedding,
        denoiser=dataclasses.replace(spec.denoiser, dtype=jnp.float32),
        use_uncertainty=spec.use_uncertainty,
    )
    clean, noisy, labels = batch
    sigma_data = spec.denoiser.sigma_data

    @jax.jit
    def val_loss(variables, clean, noisy, sigma, labels):
        denoised = model.apply(variables, noisy, sigma, labels)
        weight = (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2
        per_sample = jnp.mean(
            weight[:, None, None, None] * (denoised - clean) ** 2, axis=(1, 2, 3)
        )
        return jnp.sum(per_sample) / len(per_sample)

    return float(
        val_loss(
            variables,
            jnp.asarray(clean),
            jnp.asarray(noisy),
            jnp.asarray(sigma),
            jnp.asarray(labels) if labels is not None else None,
        )
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_dir", required=True, help="orbax checkpoint root")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--load_ema", action="store_true")
    p.add_argument("--ema_index", type=int, default=0)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--rtol", type=float, default=2e-3)
    args = p.parse_args(argv)

    if not REF_NETWORKS.exists():
        raise SystemExit("reference not mounted at /root/reference")
    import torch

    from tinyedm_tpu.utils import interop

    ref = _load_ref_networks()

    with tempfile.TemporaryDirectory() as td:
        out = Path(td) / "exported.ckpt"
        interop.export_torch_checkpoint(
            args.ckpt_dir, str(out), step=args.step, ema_index=args.ema_index
        )
        ckpt = torch.load(out, map_location="cpu", weights_only=False)

    hp = ckpt["hyper_parameters"]
    in_ch = hp["denoiser"]["in_channels"]
    num_classes = hp["embedding"].get("num_classes")
    # synthetic val batch + the reference diffuser's sigma law (edm.py:84-93)
    rng = np.random.default_rng(args.seed)
    size = 32
    clean = rng.normal(0.0, 0.5, (args.batch, size, size, in_ch)).astype(np.float32)
    sigma = np.exp(rng.normal(-1.2, 1.2, (args.batch,))).astype(np.float32)
    noisy = clean + sigma[:, None, None, None] * rng.standard_normal(
        clean.shape
    ).astype(np.float32)
    labels = (
        rng.integers(0, num_classes, (args.batch,)).astype(np.int32)
        if num_classes
        else None
    )
    batch = (clean, noisy, labels)

    loss_ref = _ref_loss(ref, torch, ckpt, batch, sigma, args.load_ema)
    loss_jax = _jax_loss(
        args.ckpt_dir, args.step, args.ema_index, args.load_ema, batch, sigma
    )
    rel = abs(loss_ref - loss_jax) / max(abs(loss_ref), 1e-12)
    tag = " (EMA weights)" if args.load_ema else ""
    print(
        f"val_loss reference(torch){tag}: {loss_ref:.6f}  "
        f"tinyedm_tpu(jax): {loss_jax:.6f}  rel diff: {rel:.2e}"
    )
    if rel > args.rtol:
        print(f"FAIL: rel diff {rel:.2e} > rtol {args.rtol:g}")
        return 1
    print("PASS: reference consumes the exported checkpoint and agrees")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
