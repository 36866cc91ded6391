"""Latent extraction CLI: encode an ImageFolder through the VAE on TPU and
write per-sample ``{idx}.npy`` latents + labels.

Reference: src/tinyedm/datamodules/extract_latents.py — ADM center-crop
(:41-59), hflip + Normalize(0.5, 0.5) (:84-106), vae.encode(...).sample()
then ``(x - mean) / (std * 2)`` with the ImageNet latent stats (:68-82),
per-sample npy output named by global index (:14-38). Same flags
(--data-dir, --out-dir, --image-size, --batch-size, --vae, --seed, --flip).

TPU-native: the VAE encoder is a jitted flax pass (tinyedm_tpu.data.vae);
host side does image decode/crop in a thread pool while the device encodes
the previous batch.
"""

from __future__ import annotations

import argparse
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# hardcoded latent statistics from the reference (extract_latents.py:69-74)
LATENT_MEAN = np.asarray([5.81, 3.25, 0.12, -2.15], np.float32)
LATENT_STD = np.asarray([4.17, 4.62, 3.71, 3.28], np.float32)

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def center_crop_arr(pil_image, image_size: int) -> np.ndarray:
    """ADM center-crop (reference :41-59 / openai/guided-diffusion): repeated
    2x box-downsampling while min side >= 2*target, then bicubic resize so the
    min side equals target, then center crop."""
    from PIL import Image

    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.Resampling.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size),
        resample=Image.Resampling.BICUBIC,
    )
    arr = np.array(pil_image.convert("RGB"))
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    return arr[crop_y : crop_y + image_size, crop_x : crop_x + image_size]


def list_image_folder(data_dir: Path) -> tuple[list[Path], list[int], list[str]]:
    """torchvision ImageFolder semantics: class-per-subdir, sorted."""
    classes = sorted(
        d.name for d in data_dir.iterdir() if d.is_dir() and not d.name.startswith(".")
    )
    files: list[Path] = []
    labels: list[int] = []
    for ci, cls in enumerate(classes):
        for p in sorted((data_dir / cls).rglob("*")):
            if p.suffix.lower() in IMG_EXTENSIONS:
                files.append(p)
                labels.append(ci)
    return files, labels, classes


def extract(
    data_dir: str,
    out_dir: str,
    image_size: int = 256,
    batch_size: int = 64,
    vae_name: str = "stabilityai/sd-vae-ft-ema",
    seed: int = 42,
    flip: bool = True,
    vae=None,
) -> int:
    """Returns the number of samples written (2x input count with flips,
    matching the reference's hflip-expanded dataset)."""
    from PIL import Image

    data_dir_p = Path(data_dir)
    out_p = Path(out_dir)
    (out_p / "latents").mkdir(parents=True, exist_ok=True)
    (out_p / "labels").mkdir(parents=True, exist_ok=True)

    if vae is None:
        from tinyedm_tpu.data.vae import load_vae

        vae = load_vae(vae_name)

    files, labels, _ = list_image_folder(data_dir_p)
    # reference: dataset = originals + flipped copies (extract_latents.py:95-101)
    entries = [(f, l, False) for f, l in zip(files, labels)]
    if flip:
        entries += [(f, l, True) for f, l in zip(files, labels)]

    rng = jax.random.PRNGKey(seed)
    pool = ThreadPoolExecutor(max_workers=8)

    def load_one(entry):
        path, label, flipped = entry
        with Image.open(path) as im:
            arr = center_crop_arr(im, image_size)
        if flipped:
            arr = arr[:, ::-1]
        x = arr.astype(np.float32) / 255.0
        return (x - 0.5) / 0.5, label  # Normalize(0.5, 0.5)

    written = 0
    n = len(entries)
    write_futs: list = []

    def _write_one(idx: int, lat_row: np.ndarray, label) -> None:
        np.save(out_p / "latents" / f"{idx}.npy", lat_row)
        np.save(out_p / "labels" / f"{idx}.npy", np.asarray(label))

    def _drain(lat_dev, labs, start, real) -> None:
        nonlocal written
        lat = (np.asarray(lat_dev) - LATENT_MEAN) / (LATENT_STD * 2.0)
        for i in range(real):
            write_futs.append(pool.submit(_write_one, start + i, lat[i], labs[i]))
        written += real
        if (start // batch_size) % 20 == 0:
            print(f"{written}/{n} latents written", flush=True)

    # one-deep pipeline (same shape as generate.py's): while batch k's
    # encode is in flight on the device, the host decodes/crops batch k+1
    # on the pool threads; blocking on k's latents happens only after k+1
    # is dispatched, and npy writes run on pool threads behind both. The
    # serial form paid sum(decode)+sum(encode)+sum(write) — at 1.2M-sample
    # ImageNet scale that near-doubles a multi-hour job.
    in_flight = None  # (device latents, labels, start, real)
    # drop_last=True in the reference (:124); keep every sample here but pad
    # the tail batch so one compiled shape serves all batches
    for start in range(0, n, batch_size):
        chunk = entries[start : start + batch_size]
        loaded = list(pool.map(load_one, chunk))
        imgs = np.stack([x for x, _ in loaded])
        labs = [l for _, l in loaded]
        real = len(imgs)
        if real < batch_size:
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[:1], batch_size - real, axis=0)]
            )
        rng, sub = jax.random.split(rng)
        lat_dev = vae.encode(jnp.asarray(imgs), sub)
        if in_flight is not None:
            _drain(*in_flight)
        in_flight = (lat_dev, labs, start, real)
    if in_flight is not None:
        _drain(*in_flight)
    for f in write_futs:
        f.result()  # surface any write error
    pool.shutdown()
    return written


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Extract VAE latents on TPU")
    parser.add_argument("--data-dir", required=True, help="ImageFolder root")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument(
        "--vae",
        default="stabilityai/sd-vae-ft-ema",
        choices=["stabilityai/sd-vae-ft-ema", "stabilityai/sd-vae-ft-mse"],
    )
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--no-flip", action="store_true")
    args = parser.parse_args(argv)
    n = extract(
        args.data_dir,
        args.out_dir,
        args.image_size,
        args.batch_size,
        args.vae,
        args.seed,
        flip=not args.no_flip,
    )
    print(f"wrote {n} latents to {args.out_dir}")


if __name__ == "__main__":
    main()
