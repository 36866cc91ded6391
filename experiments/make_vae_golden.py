"""Generate the sd-vae-ft-ema golden triple for tests/test_vae_latents.py::
test_vae_golden_file_when_present.

Run this WHEREVER the official weights are reachable (this build environment
has no network egress, so the golden cannot be generated here — the test
skips until both files exist):

    python experiments/make_vae_golden.py --out-dir datasets \
        [--weights stabilityai/sd-vae-ft-ema | /path/to/local/dir]

Writes two files into --out-dir:
  - sd_vae_ft_ema_state_dict.npz : the torch state dict as numpy arrays
    (input format of tinyedm_tpu.data.vae.convert_torch_vae)
  - vae_golden.npz : {input, mean, logvar, decoded} — a fixed-seed
    (1, 64, 64, 3) input in [-1, 1], the encoder's deterministic moments,
    and decode(mean), all computed by the OFFICIAL diffusers torch model in
    fp32 eval mode. A few hundred KB; check both into `datasets/`.

The flax port + converter must then reproduce the triple bit-for-tolerance
(reference consumption sites: extract_latents.py:66-82, callbacks.py:102-119).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default="stabilityai/sd-vae-ft-ema",
                   help="HF id or local diffusers model directory")
    p.add_argument("--out-dir", default="datasets")
    args = p.parse_args()

    import torch
    from diffusers import AutoencoderKL  # needs an environment WITH diffusers

    vae = AutoencoderKL.from_pretrained(args.weights)
    vae.eval()

    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, (1, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        dist = vae.encode(xt).latent_dist
        mean, logvar = dist.mean, dist.logvar
        decoded = vae.decode(mean).sample

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.savez(
        out / "sd_vae_ft_ema_state_dict.npz",
        **{k: v.numpy() for k, v in vae.state_dict().items()},
    )
    to_nhwc = lambda t: t.numpy().transpose(0, 2, 3, 1)
    np.savez(
        out / "vae_golden.npz",
        input=x,
        mean=to_nhwc(mean),
        logvar=to_nhwc(logvar),
        decoded=to_nhwc(decoded),
    )
    print(f"wrote {out / 'sd_vae_ft_ema_state_dict.npz'} and {out / 'vae_golden.npz'}")


if __name__ == "__main__":
    main()
