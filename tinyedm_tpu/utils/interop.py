"""Weight interop with the torch reference implementation.

Lets a reference user bring their trained checkpoints along: converts
parameter trees between this framework's layout (NHWC/HWIO flax trees) and
the reference's torch state_dict layout (NCHW/OIHW modules,
src/tinyedm/networks.py) in both directions, for the Denoiser, the
Embedding, the UncertaintyNet, and the full EDM composite (the
``state_dict`` of the reference EDM LightningModule uses ``embedding.*`` /
``denoiser.*`` / ``u.*`` prefixes, edm.py:128-146).

Key layout facts encoded here (verified element-wise by
tests/test_reference_parity.py and tests/test_interop.py):
  * conv kernels: HWIO <-> OIHW transpose
  * linear weights: (out, in) in both — no transpose
  * qkv 1x1 conv: this framework factorizes the output channels as
    (3, heads, head_dim); the reference views them as (heads, head_dim, 3)
    (networks.py:194) — a pure permutation of output channels
  * fourier freqs/phases are buffers here ('constants' collection)
  * ScaleLong convs: layer1/layer2 <-> WNConv_0/WNConv_1
  * UncertaintyNet: linear1/linear2 <-> WNLinear_0/WNLinear_1

CLI — both directions:

    # reference -> here: torch .ckpt (lightning or raw state_dict) -> orbax
    python -m tinyedm_tpu.utils.interop import --torch_ckpt last.ckpt \
        --config experiments/conf/cifar10.yaml --out_dir runs/imported

    # here -> reference: orbax -> lightning-style .ckpt that the reference's
    # EDM.load_from_checkpoint consumes (incl. load_ema=True and Adam moments)
    python -m tinyedm_tpu.utils.interop export --ckpt_dir runs/cifar10/checkpoints \
        --out exported.ckpt --ema_index 0

(the bare legacy form without the ``import`` subcommand still works)
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _to_torch(x):
    """np/jax array -> torch tensor (owning copy: jax arrays surface as
    non-writable numpy views, which torch.from_numpy warns about)."""
    import torch

    return torch.from_numpy(np.array(x, np.float32, copy=True))


# -------------------------------------------------------------- primitives


def conv_to_torch(w_hwio) -> np.ndarray:
    return np.transpose(_to_np(w_hwio), (3, 2, 0, 1))


def conv_from_torch(w_oihw) -> np.ndarray:
    return np.transpose(_to_np(w_oihw), (2, 3, 1, 0))


def qkv_perm_to_torch(w_hwio, heads: int) -> np.ndarray:
    w = _to_np(w_hwio)
    c = w.shape[-1] // 3
    hd = c // heads
    w = w.reshape(*w.shape[:3], 3, heads, hd).transpose(0, 1, 2, 4, 5, 3)
    return conv_to_torch(w.reshape(*w.shape[:3], 3 * c))


def qkv_perm_from_torch(w_oihw, heads: int) -> np.ndarray:
    w = conv_from_torch(w_oihw)  # HWIO with torch channel order (heads, hd, 3)
    c = w.shape[-1] // 3
    hd = c // heads
    w = w.reshape(*w.shape[:3], heads, hd, 3).transpose(0, 1, 2, 5, 3, 4)
    return w.reshape(*w.shape[:3], 3 * c)


# ----------------------------------------------------------------- denoiser


def _attention_to_torch(sd, prefix, p, heads):
    sd[f"{prefix}.qkv_conv.weight"] = qkv_perm_to_torch(p["qkv_conv"]["w"], heads)
    sd[f"{prefix}.out_conv.weight"] = conv_to_torch(p["out_conv"]["w"])


def _attention_from_torch(sd, prefix, heads):
    return {
        "qkv_conv": {"w": qkv_perm_from_torch(sd[f"{prefix}.qkv_conv.weight"], heads)},
        "out_conv": {"w": conv_from_torch(sd[f"{prefix}.out_conv.weight"])},
    }


def denoiser_params_to_torch(params: Mapping, denoiser) -> dict:
    """flax Denoiser params -> reference Denoiser state_dict (numpy values)."""
    heads = denoiser.num_heads
    sd: dict[str, np.ndarray] = {
        "conv_in.weight": conv_to_torch(params["conv_in"]["w"]),
        "conv_out.weight": conv_to_torch(params["conv_out"]["w"]),
        "gain_out": _to_np(params["gain_out"]),
    }

    def block(side, i, p):
        prefix = f"{side}_blocks.{i}"
        if "conv_1x1" in p:
            sd[f"{prefix}.conv_1x1.weight"] = conv_to_torch(p["conv_1x1"]["w"])
        sd[f"{prefix}.conv_3x3_1.weight"] = conv_to_torch(p["conv_3x3_1"]["w"])
        sd[f"{prefix}.conv_3x3_2.weight"] = conv_to_torch(p["conv_3x3_2"]["w"])
        sd[f"{prefix}.embed.weight"] = _to_np(p["embed"]["w"])
        sd[f"{prefix}.gain"] = _to_np(p["gain"])
        if "attention" in p:
            _attention_to_torch(sd, f"{prefix}.attention", p["attention"], heads)
        if "cat_factor" in p:
            sd[f"{prefix}.cat_factor.layer1.weight"] = conv_to_torch(
                p["cat_factor"]["WNConv_0"]["w"]
            )
            sd[f"{prefix}.cat_factor.layer2.weight"] = conv_to_torch(
                p["cat_factor"]["WNConv_1"]["w"]
            )

    for i in range(len(denoiser.encoder_block_types)):
        block("encoder", i, params[f"encoder_blocks_{i}"])
    for i in range(len(denoiser.decoder_block_types)):
        block("decoder", i, params[f"decoder_blocks_{i}"])
    return sd


def denoiser_params_from_torch(sd: Mapping, denoiser) -> dict:
    """reference Denoiser state_dict -> flax Denoiser params."""
    heads = denoiser.num_heads
    out: dict[str, Any] = {
        "conv_in": {"w": conv_from_torch(sd["conv_in.weight"])},
        "conv_out": {"w": conv_from_torch(sd["conv_out.weight"])},
        "gain_out": _to_np(sd["gain_out"]),
    }

    def block(side, i, btype):
        prefix = f"{side}_blocks.{i}"
        p: dict[str, Any] = {}
        if f"{prefix}.conv_1x1.weight" in sd:
            p["conv_1x1"] = {"w": conv_from_torch(sd[f"{prefix}.conv_1x1.weight"])}
        p["conv_3x3_1"] = {"w": conv_from_torch(sd[f"{prefix}.conv_3x3_1.weight"])}
        p["conv_3x3_2"] = {"w": conv_from_torch(sd[f"{prefix}.conv_3x3_2.weight"])}
        p["embed"] = {"w": _to_np(sd[f"{prefix}.embed.weight"])}
        p["gain"] = _to_np(sd[f"{prefix}.gain"])
        if f"{prefix}.attention.qkv_conv.weight" in sd:
            p["attention"] = _attention_from_torch(sd, f"{prefix}.attention", heads)
        if f"{prefix}.cat_factor.layer1.weight" in sd:
            p["cat_factor"] = {
                "WNConv_0": {"w": conv_from_torch(sd[f"{prefix}.cat_factor.layer1.weight"])},
                "WNConv_1": {"w": conv_from_torch(sd[f"{prefix}.cat_factor.layer2.weight"])},
            }
        out[f"{side}_blocks_{i}"] = p

    for i, bt in enumerate(denoiser.encoder_block_types):
        block("encoder", i, bt)
    for i, bt in enumerate(denoiser.decoder_block_types):
        block("decoder", i, bt)
    return out


# ---------------------------------------------------------------- embedding


def embedding_to_torch(params: Mapping, constants: Mapping) -> dict:
    sd = {
        "fourier_embed.freqs": _to_np(constants["fourier_embed"]["freqs"]),
        "fourier_embed.phases": _to_np(constants["fourier_embed"]["phases"]),
        "sigma_embed.weight": _to_np(params["sigma_embed"]["w"]),
    }
    if "class_embed" in params:
        sd["class_embed.linear.weight"] = _to_np(params["class_embed"]["WNLinear_0"]["w"])
    return sd


def embedding_from_torch(sd: Mapping) -> tuple[dict, dict]:
    params: dict[str, Any] = {"sigma_embed": {"w": _to_np(sd["sigma_embed.weight"])}}
    if "class_embed.linear.weight" in sd:
        params["class_embed"] = {
            "WNLinear_0": {"w": _to_np(sd["class_embed.linear.weight"])}
        }
    constants = {
        "fourier_embed": {
            "freqs": _to_np(sd["fourier_embed.freqs"]),
            "phases": _to_np(sd["fourier_embed.phases"]),
        }
    }
    return params, constants


# ---------------------------------------------------- EMA flat-tuple import


def reference_parameter_order(torch_sd: Mapping) -> list[str]:
    """Parameter names in the reference's ``model.parameters()`` order.

    The reference checkpoints EMA weights as a FLAT tuple in optimizer
    param-group order (ema.py:222-226,326-336), read back by zipping against
    ``model.parameters()`` (edm.py:172-181). That order is torch's
    named_parameters DFS: each module yields its DIRECT nn.Parameters (in
    registration order) before descending into submodules. EDM registers
    embedding, denoiser, then the optional uncertainty head (edm.py:128-146);
    Denoiser's direct param gain_out precedes conv_in/conv_out/blocks
    (networks.py:528-546); each block's direct param ``gain`` precedes
    [cat_factor] -> [conv_1x1] -> conv_3x3_1 -> conv_3x3_2 -> [attention] ->
    embed (networks.py:210-244,268-304); UncertaintyNet's ``gain`` precedes
    linear1/linear2. Optional modules are detected by key presence in
    ``torch_sd``; buffers (fourier freqs/phases) are not parameters and are
    excluded. Pinned against the live reference module in
    tests/test_interop.py.
    """

    def block_count(side: str) -> int:
        idxs = [
            int(k.split(".")[2])
            for k in torch_sd
            if k.startswith(f"denoiser.{side}_blocks.")
        ]
        return max(idxs) + 1 if idxs else 0

    order = [
        "embedding.sigma_embed.weight",
        "embedding.class_embed.linear.weight",
        "denoiser.gain_out",
        "denoiser.conv_in.weight",
        "denoiser.conv_out.weight",
    ]
    for side in ("encoder", "decoder"):
        for i in range(block_count(side)):
            p = f"denoiser.{side}_blocks.{i}"
            order.append(f"{p}.gain")
            if side == "decoder":
                order += [f"{p}.cat_factor.layer1.weight", f"{p}.cat_factor.layer2.weight"]
            order += [
                f"{p}.conv_1x1.weight",
                f"{p}.conv_3x3_1.weight",
                f"{p}.conv_3x3_2.weight",
                f"{p}.attention.qkv_conv.weight",
                f"{p}.attention.out_conv.weight",
                f"{p}.embed.weight",
            ]
    order += ["u.gain", "u.linear1.weight", "u.linear2.weight"]
    return [k for k in order if k in torch_sd]


def ema_state_dict_from_flat(torch_sd: Mapping, ema_flat) -> dict:
    """Rebuild a named state_dict from the reference's flat EMA tuple.

    ``torch_sd`` is the checkpoint's ``state_dict`` (supplies the name order
    and the non-parameter buffers); ``ema_flat`` is
    ``checkpoint["optimizer_states"][0]["ema"]``.
    """
    param_names = reference_parameter_order(torch_sd)
    if len(param_names) != len(ema_flat):
        raise ValueError(
            f"EMA tuple has {len(ema_flat)} tensors but the state_dict has "
            f"{len(param_names)} parameters — architecture mismatch"
        )
    out = {}
    for name, ema_t in zip(param_names, ema_flat):
        ref_shape = tuple(_to_np(torch_sd[name]).shape)
        ema_np = _to_np(ema_t)
        if tuple(ema_np.shape) != ref_shape:
            raise ValueError(
                f"EMA tensor for {name} has shape {tuple(ema_np.shape)}, "
                f"expected {ref_shape} — parameter-order mismatch"
            )
        out[name] = ema_np
    # carry the buffers (fourier freqs/phases) unchanged — they are constants,
    # not EMA-tracked parameters
    for name, v in torch_sd.items():
        if name not in out:
            out[name] = _to_np(v)
    return out


# ------------------------------------------------------------ EDM composite


def _strip(sd: Mapping, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def edm_params_from_torch_state_dict(spec, torch_sd: Mapping) -> dict:
    """Reference EDM LightningModule state_dict -> {'params', 'constants'}
    variables for this framework's EDM module. ``spec`` is the EDMSpec whose
    architecture matches the checkpoint (from the same YAML config)."""
    emb_params, emb_constants = embedding_from_torch(_strip(torch_sd, "embedding."))
    den_params = denoiser_params_from_torch(_strip(torch_sd, "denoiser."), spec.denoiser)
    params: dict[str, Any] = {"embedding": emb_params, "denoiser": den_params}
    u_sd = _strip(torch_sd, "u.")
    if u_sd:
        params["u"] = {
            "WNLinear_0": {"w": _to_np(u_sd["linear1.weight"])},
            "WNLinear_1": {"w": _to_np(u_sd["linear2.weight"])},
            "gain": _to_np(u_sd["gain"]),
        }
    constants = {"embedding": emb_constants}
    import jax

    params = jax.tree_util.tree_map(jnp.asarray, params)
    constants = jax.tree_util.tree_map(jnp.asarray, constants)
    return {"params": params, "constants": constants}


def edm_params_to_torch_state_dict(spec, variables: Mapping) -> dict:
    """Inverse: this framework's EDM variables -> reference EDM state_dict.

    Accepts either param layout: a ``scan_blocks=True`` checkpoint (stacked
    ``{side}_scan_{start}`` groups) is unrolled here first — the reference
    has no scanned layout, its state_dict is always per-block. This is the
    single chokepoint all export paths go through (weights, EMA trees, Adam
    moments), so every tree gets the same treatment."""
    params = variables["params"]
    if any(
        k.startswith(("encoder_scan_", "decoder_scan_"))
        for k in params.get("denoiser", {})
    ):
        params = migrate_params_from_scanned(params)
    constants = variables["constants"]
    sd = {}
    for k, v in embedding_to_torch(
        params["embedding"], constants["embedding"]
    ).items():
        sd[f"embedding.{k}"] = v
    for k, v in denoiser_params_to_torch(params["denoiser"], spec.denoiser).items():
        sd[f"denoiser.{k}"] = v
    if "u" in params:
        sd["u.linear1.weight"] = _to_np(params["u"]["WNLinear_0"]["w"])
        sd["u.linear2.weight"] = _to_np(params["u"]["WNLinear_1"]["w"])
        sd["u.gain"] = _to_np(params["u"]["gain"])
    return sd


# ----------------------------------------------------------------------- CLI


def import_torch_checkpoint(
    torch_ckpt: str, config_path: str, out_dir: str, load_ema: bool = False
) -> None:
    """Convert a reference checkpoint (lightning .ckpt or raw state_dict
    .pt) into an orbax checkpoint consumable by generate.py."""
    import jax
    import torch

    from tinyedm_tpu.config.registry import deinstantiate, instantiate, load_config
    from tinyedm_tpu.training.checkpoint import save_checkpoint
    from tinyedm_tpu.training.ema import EMAConfig
    from tinyedm_tpu.training.state import TrainState
    from tinyedm_tpu.training.train_step import OptimizerConfig, make_adam

    ckpt = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
        step = int(ckpt.get("global_step", 0))
    else:
        sd = ckpt
        step = 0

    cfg = load_config(config_path)
    spec = instantiate(cfg["model"])
    variables = edm_params_from_torch_state_dict(spec, sd)
    params = variables["params"]

    # a scan_blocks=True target config stores stacked {side}_scan_{start}
    # groups; restack the unrolled conversion into that layout or the saved
    # checkpoint's tree will not match what spec.build_model() expects at
    # restore (generate.py / trainer resume would fail on apply)
    to_scanned = None
    if getattr(spec.denoiser, "scan_blocks", False):
        model = spec.build_model()
        hw = 64  # params are spatial-size-independent; any 2^k-safe size works
        img = jnp.zeros((1, hw, hw, spec.denoiser.in_channels), jnp.float32)
        labels = jnp.zeros((1,), jnp.int32) if model.conditional else None
        abstract = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)},
                img,
                jnp.ones((1,), jnp.float32),
                labels,
                train=False,
                method=model.denoise_with_aux,
            )
        )

        def to_scanned(tree):  # noqa: F811 — deliberate rebind from None
            return migrate_params_to_scanned(tree, abstract["params"])

        params = to_scanned(params)

    ema = ()
    if load_ema:
        if not isinstance(ckpt, dict) or "optimizer_states" not in ckpt:
            raise ValueError("EMA weights not found in the checkpoint.")
        try:
            ema_flat = ckpt["optimizer_states"][0]["ema"]
        except (KeyError, IndexError):
            raise ValueError("EMA weights not found in the checkpoint.")
        # the reference stores EMA as a flat tuple in model.parameters()
        # order (ema.py:326-336); rebuild the named state_dict, then convert
        # like any other weight tree and store it as EMA profile 0 — our
        # generate.py --load_ema evaluates it (no in-place swap needed)
        ema_sd = ema_state_dict_from_flat(sd, ema_flat)
        ema_params = edm_params_from_torch_state_dict(spec, ema_sd)["params"]
        if to_scanned is not None:
            ema_params = to_scanned(ema_params)
        ema = (ema_params,)

    opt_cfg = spec.build_optimizer_config()
    tx = make_adam(opt_cfg.betas, opt_cfg.eps)
    state = TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        constants=variables["constants"],
        opt_state=tx.init(params),
        ema=ema,
    )
    save_checkpoint(out_dir, state, config={"model": deinstantiate(spec)})
    print(f"imported {torch_ckpt} (step {step}) -> {out_dir}")


def reference_hyper_parameters(spec, ema_index: int = 0) -> dict:
    """EDMSpec -> the reference EDM's self-describing ``hyper_parameters``
    tree — what ``EDM.save_config`` writes into every checkpoint
    (edm.py:152-157 via utils.py:5-27): hydra ``_target_`` dicts using the
    reference's own ``tinyedm.*`` names, restricted to reference constructor
    fields (edm.py:100-118, networks.py:144-161, networks.py:491-506).
    TPU-only knobs (mod_fp32, remat, scan_blocks, use_pallas_attention,
    grad_clip_norm, log_norms, accum_steps, ema_lengths, val_ema_index) have
    no reference analog and are dropped; with multiple tracked EMA profiles,
    ``ema_length`` becomes the EXPORTED profile's sigma_rel so a reference
    resume continues that profile's power-function decay curve."""
    emb, den = spec.embedding, spec.denoiser
    sigma_rels = tuple(spec.ema_lengths or ())
    if not sigma_rels and spec.ema_length is not None:
        sigma_rels = (spec.ema_length,)
    ema_length = spec.ema_length
    if sigma_rels:
        if not 0 <= ema_index < len(sigma_rels):
            raise ValueError(
                f"ema_index={ema_index} out of range for {len(sigma_rels)} "
                "tracked EMA profile(s)"
            )
        ema_length = sigma_rels[ema_index]
    return {
        "_target_": "tinyedm.EDM",
        "diffuser": {
            "_target_": "tinyedm.Diffuser",
            "P_mean": spec.diffuser.P_mean,
            "P_std": spec.diffuser.P_std,
        },
        "embedding": {
            "_target_": "tinyedm.Embedding",
            "fourier_dim": emb.fourier_dim,
            "embedding_dim": emb.embedding_dim,
            "num_classes": emb.num_classes,
            "add_factor": emb.add_factor,
        },
        "denoiser": {
            "_target_": "tinyedm.Denoiser",
            "in_channels": den.in_channels,
            "out_channels": den.out_channels,
            "encoder_block_types": list(den.encoder_block_types),
            "decoder_block_types": list(den.decoder_block_types),
            "encoder_out_channels": list(den.encoder_out_channels),
            "decoder_out_channels": list(den.decoder_out_channels),
            "skip_connections": list(den.skip_connections),
            "dropout_rate": den.dropout_rate,
            "sigma_data": den.sigma_data,
            "encoder_add_factor": den.encoder_add_factor,
            "decoder_add_factor": den.decoder_add_factor,
            "embedding_dim": den.embedding_dim,
            "num_heads": den.num_heads,
        },
        "use_ema": spec.use_ema,
        "use_uncertainty": spec.use_uncertainty,
        "steady_steps": spec.steady_steps,
        "rampup_steps": spec.rampup_steps,
        "scheduler_interval": spec.scheduler_interval,
        "sigma_data": spec.sigma_data,
        "lr": spec.lr,
        "betas": list(spec.betas),
        "ema_length": ema_length,
        "validate_original_weights": spec.validate_original_weights,
        "every_n_steps": spec.every_n_steps,
        "cpu_offload": False,
    }


def _adam_moments(opt_state) -> tuple[Any, Any]:
    """Extract the (mu, nu) moment trees from an optax ``scale_by_adam``
    state — live (``ScaleByAdamState(count, mu, nu)``) or as orbax restores
    it generically (a namedtuple flattened to a ``{"0","1","2"}`` mapping or
    a plain 3-list, in field order)."""
    if hasattr(opt_state, "mu"):
        return opt_state.mu, opt_state.nu
    if isinstance(opt_state, Mapping):
        if "mu" in opt_state and "nu" in opt_state:
            return opt_state["mu"], opt_state["nu"]
        if "1" in opt_state and "2" in opt_state:
            return opt_state["1"], opt_state["2"]
    if isinstance(opt_state, (list, tuple)) and len(opt_state) == 3:
        return opt_state[1], opt_state[2]
    raise ValueError(
        f"cannot locate Adam moments in opt_state of type {type(opt_state)!r}"
    )


def adam_state_to_torch(spec, opt_state, constants, order, step: int) -> dict:
    """optax ``scale_by_adam`` moments -> a ``torch.optim.Adam.state_dict()``.

    Both frameworks store RAW first/second moments and bias-correct at use
    time with the same formula, so moments transfer verbatim (after the same
    layout conversion as the weights they shadow). ``order`` is the flat
    parameter order from :func:`reference_parameter_order`."""
    import torch

    mu, nu = _adam_moments(opt_state)
    mu_sd = edm_params_to_torch_state_dict(
        spec, {"params": mu, "constants": constants}
    )
    nu_sd = edm_params_to_torch_state_dict(
        spec, {"params": nu, "constants": constants}
    )
    state = {
        i: {
            "step": torch.tensor(float(step)),
            "exp_avg": _to_torch(mu_sd[k]),
            "exp_avg_sq": _to_torch(nu_sd[k]),
        }
        for i, k in enumerate(order)
    }
    group = {
        "lr": spec.lr,
        "betas": tuple(spec.betas),
        "eps": 1e-8,
        "weight_decay": 0,
        "amsgrad": False,
        "maximize": False,
        "foreach": None,
        "capturable": False,
        "differentiable": False,
        "fused": None,
        "params": list(range(len(order))),
    }
    return {"state": state, "param_groups": [group]}


def export_torch_checkpoint(
    ckpt_dir: str,
    out_path: str,
    step: int | None = None,
    ema_index: int = 0,
) -> None:
    """Inverse of :func:`import_torch_checkpoint`: write a lightning-style
    ``.ckpt`` the REFERENCE consumes — ``EDM.load_from_checkpoint`` re-builds
    the architecture from ``hyper_parameters`` (edm.py:168-169), loads
    ``state_dict``, and ``load_ema=True`` finds the flat EMA tuple at
    ``optimizer_states[0]["ema"]`` (edm.py:197-203, ema.py:326-336). Adam
    moments are exported too (same raw-moment semantics both sides), so a
    run can even resume training under the reference with its optimizer
    state intact. With multiple tracked EMA profiles, ``--ema_index`` picks
    which one rides in the (single-profile) reference slot."""
    import torch

    from tinyedm_tpu.config.registry import instantiate
    from tinyedm_tpu.training.checkpoint import load_checkpoint
    from tinyedm_tpu.training.ema import sigma_rel_to_gamma

    state, config = load_checkpoint(ckpt_dir, step)
    if config is None:
        raise ValueError(
            f"checkpoint at {ckpt_dir} has no embedded config; cannot build "
            "reference hyper_parameters"
        )
    spec = instantiate(config["model"] if "model" in config else config)
    gstep = int(state.step)

    sd_np = edm_params_to_torch_state_dict(
        spec, {"params": state.params, "constants": state.constants}
    )
    sd = {k: _to_torch(v) for k, v in sd_np.items()}
    order = reference_parameter_order(sd)

    adam_sd = adam_state_to_torch(spec, state.opt_state, state.constants, order, gstep)
    if state.ema:
        # EMA runs wrap the optimizer in EMAOptimizer, whose state_dict nests
        # the inner Adam under "opt" next to the flat EMA tuple (ema.py:326-336)
        if not 0 <= ema_index < len(state.ema):
            raise ValueError(
                f"ema_index={ema_index} out of range: checkpoint tracks "
                f"{len(state.ema)} EMA profile(s)"
            )
        ema_sd = edm_params_to_torch_state_dict(
            spec, {"params": state.ema[ema_index], "constants": state.constants}
        )
        sigma_rels = tuple(
            spec.ema_lengths
            or ((spec.ema_length,) if spec.ema_length is not None else ())
        )
        if sigma_rels and not 0 <= ema_index < len(sigma_rels):
            # checkpoint may carry more EMA trees than the spec declares
            # profiles (e.g. hand-assembled states); fail with the real
            # reason instead of an IndexError on the sigma_rel lookup
            raise ValueError(
                f"ema_index={ema_index} has no declared sigma_rel: the spec "
                f"declares {len(sigma_rels)} EMA profile(s) while the "
                f"checkpoint stores {len(state.ema)} tree(s) — the exported "
                "gamma would be untraceable"
            )
        opt0: dict[str, Any] = {
            "opt": adam_sd,
            "ema": tuple(_to_torch(ema_sd[k]) for k in order),
            "current_step": gstep,
            "gamma": float(sigma_rel_to_gamma(sigma_rels[ema_index]))
            if sigma_rels
            else 0.0,
            "every_n_steps": spec.every_n_steps,
        }
    else:
        # no EMA -> the reference's optimizer is a bare torch.optim.Adam;
        # its load_state_dict expects the adam dict at the top level
        opt0 = adam_sd
    hp = reference_hyper_parameters(spec, ema_index)
    if not state.ema and hp["use_ema"]:
        # spec says use_ema but the checkpoint carries no EMA trees (e.g.
        # imported without --load_ema): exporting use_ema=True would make
        # the reference wrap its optimizer in EMAOptimizer and fail to read
        # the bare Adam dict on resume
        hp["use_ema"] = False
        hp["ema_length"] = None
        print("[export] checkpoint has no EMA trees; exporting use_ema=False")
    elif state.ema and not hp["use_ema"]:
        # the inverse inconsistency: EMA trees present (e.g. imported with
        # --load_ema into a use_ema:false config) but the reference would
        # build a bare torch Adam and choke on the nested EMAOptimizer
        # dict. Export the bare Adam and drop the EMA trees, loudly — a
        # use_ema:true config is the way to carry them across
        opt0 = adam_sd
        print(
            "[export] checkpoint carries EMA tree(s) but the spec has "
            "use_ema=False; exporting a bare Adam (EMA trees dropped). "
            "Re-export with a use_ema: true config to keep them."
        )
    ckpt: dict[str, Any] = {
        "state_dict": sd,
        "global_step": gstep,
        "epoch": 0,
        "pytorch-lightning_version": "2.0.0",
        "hyper_parameters": hp,
        "lr_schedulers": [],
        "optimizer_states": [opt0],
    }
    torch.save(ckpt, out_path)
    print(f"exported {ckpt_dir} (step {gstep}) -> {out_path}")


def main(argv=None) -> None:
    import argparse
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "export":
        p = argparse.ArgumentParser(
            description="Export an orbax checkpoint as a reference-loadable "
            "lightning .ckpt"
        )
        p.add_argument("--ckpt_dir", required=True, help="orbax checkpoint dir")
        p.add_argument("--out", required=True, help="output .ckpt path")
        p.add_argument("--step", type=int, default=None)
        p.add_argument(
            "--ema_index",
            type=int,
            default=0,
            help="which tracked EMA profile rides in the reference's "
            "single-profile optimizer_states[0]['ema'] slot",
        )
        args = p.parse_args(argv[1:])
        export_torch_checkpoint(args.ckpt_dir, args.out, args.step, args.ema_index)
        return

    if argv and argv[0] == "import":
        argv = argv[1:]
    p = argparse.ArgumentParser(description="Import a reference torch checkpoint")
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--config", required=True, help="matching experiment YAML")
    p.add_argument("--out_dir", required=True)
    p.add_argument(
        "--load_ema",
        action="store_true",
        help="also import the reference's EMA weights "
        "(optimizer_states[0]['ema']) as EMA profile 0",
    )
    args = p.parse_args(argv)
    import_torch_checkpoint(args.torch_ckpt, args.config, args.out_dir, args.load_ema)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# scan_blocks checkpoint migration (Denoiser(scan_blocks=True) stacks runs of
# identical blocks under {encoder,decoder}_scan_{start} with a leading block
# axis; these convert existing unrolled checkpoints in either direction).
# ---------------------------------------------------------------------------


def _scan_group_names(scanned_tree: Mapping) -> list[tuple[str, str, int, int]]:
    """(scan_name, side, start, length) for every scanned group, length read
    from the leading axis of any leaf."""
    import jax

    groups = []
    for name, sub in scanned_tree.items():
        for side in ("encoder", "decoder"):
            prefix = f"{side}_scan_"
            if name.startswith(prefix):
                start = int(name[len(prefix):])
                leaf = jax.tree_util.tree_leaves(sub)[0]
                groups.append((name, side, start, int(leaf.shape[0])))
    return groups


def migrate_params_to_scanned(unrolled: Mapping, scanned_abstract: Mapping) -> dict:
    """Restack an unrolled denoiser param tree into the scan_blocks layout.

    ``scanned_abstract`` is the target structure (e.g. from jax.eval_shape of
    the scanned model's init); unrolled per-block subtrees
    ``{side}_blocks_{start+k}`` are stacked along axis 0 into
    ``{side}_scan_{start}/block``. Leaves not in any group copy through.
    Works on the denoiser subtree or any tree that contains it."""
    import jax.numpy as jnp

    out = {k: v for k, v in unrolled.items()}
    for name, side, start, length in _scan_group_names(scanned_abstract):
        members = []
        for k in range(length):
            key = f"{side}_blocks_{start + k}"
            members.append(out.pop(key))
        import jax

        out[name] = {
            "block": jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *members)
        }
    # recurse into nested containers (e.g. a full params tree with 'denoiser')
    for k, v in list(out.items()):
        if isinstance(v, Mapping) and not any(
            g[0] == k for g in _scan_group_names(scanned_abstract)
        ):
            if k in scanned_abstract and isinstance(scanned_abstract[k], Mapping):
                out[k] = migrate_params_to_scanned(v, scanned_abstract[k])
    return out


def migrate_params_from_scanned(scanned: Mapping) -> dict:
    """Inverse: unstack every {side}_scan_{start} group back into per-block
    subtrees {side}_blocks_{start+k}."""
    import jax
    import jax.numpy as jnp

    out = {}
    for name, sub in scanned.items():
        matched = False
        for side in ("encoder", "decoder"):
            prefix = f"{side}_scan_"
            if name.startswith(prefix):
                start = int(name[len(prefix):])
                block = sub["block"]
                length = int(jax.tree_util.tree_leaves(block)[0].shape[0])
                for k in range(length):
                    out[f"{side}_blocks_{start + k}"] = jax.tree_util.tree_map(
                        lambda l, kk=k: l[kk], block
                    )
                matched = True
        if not matched:
            out[name] = (
                migrate_params_from_scanned(sub) if isinstance(sub, Mapping) else sub
            )
    return out
