"""Weight-interop tests: roundtrips and forward parity through the actual
reference modules (loaded standalone from /root/reference)."""

import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.models.edm import EDM
from tinyedm_tpu.models.layers import Embedding
from tinyedm_tpu.models.unet import Denoiser
from tinyedm_tpu.utils import interop

# jit-heavy integration module: excluded from the fast profile (-m 'not slow')
pytestmark = pytest.mark.slow

REF = Path("/root/reference/src/tinyedm/networks.py")

TOPOLOGY = dict(
    encoder_block_types=("Enc", "EncD", "EncA"),
    decoder_block_types=("DecA", "Dec", "DecU", "Dec", "Dec"),
    encoder_out_channels=(16, 32, 32),
    decoder_out_channels=(32, 32, 32, 16, 16),
    skip_connections=(False, True, True, True, True),
)


def small_spec():
    from tinyedm_tpu.training.experiment import EDMSpec
    from tinyedm_tpu.diffusion.diffuser import Diffuser

    return EDMSpec(
        diffuser=Diffuser(-1.2, 1.2),
        embedding=Embedding(fourier_dim=16, embedding_dim=32, num_classes=10),
        denoiser=Denoiser(
            in_channels=3, out_channels=3, embedding_dim=32, num_heads=2,
            sigma_data=0.5, **TOPOLOGY,
        ),
        use_uncertainty=True,
    )


@pytest.fixture(scope="module")
def edm_variables():
    spec = small_spec()
    model = spec.build_model()
    x = jnp.zeros((2, 8, 8, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, jnp.ones((2,)),
        jnp.asarray([0, 1]), method=EDM.denoise_with_aux,
    )
    return spec, model, variables


def test_roundtrip_mine_torch_mine(edm_variables):
    """params -> torch state_dict -> params is exact."""
    spec, model, variables = edm_variables
    sd = interop.edm_params_to_torch_state_dict(spec, variables)
    back = interop.edm_params_from_torch_state_dict(spec, sd)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(back["params"])[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(variables["constants"]["embedding"]["fourier_embed"]["freqs"]),
        np.asarray(back["constants"]["embedding"]["fourier_embed"]["freqs"]),
    )


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_imported_reference_weights_forward_parity(edm_variables):
    """Export to a real reference Denoiser module, load there, run both —
    proves the exported state_dict is genuinely loadable + equivalent."""
    torch = pytest.importorskip("torch")
    spec, model, variables = edm_variables
    ref_spec = importlib.util.spec_from_file_location("ref_networks", REF)
    ref = importlib.util.module_from_spec(ref_spec)
    ref_spec.loader.exec_module(ref)

    sd = interop.denoiser_params_to_torch(
        variables["params"]["denoiser"], spec.denoiser
    )
    theirs = ref.Denoiser(
        in_channels=3, out_channels=3, embedding_dim=32, num_heads=2,
        sigma_data=0.5, **TOPOLOGY,
    ).eval()
    missing, unexpected = theirs.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=True
    ), None
    x = np.random.default_rng(0).standard_normal((2, 8, 8, 3)).astype(np.float32)
    sigma = np.asarray([0.7, 1.4], np.float32)
    emb = np.random.default_rng(1).standard_normal((2, 32)).astype(np.float32)
    mine = np.asarray(
        model.denoiser.apply(
            {"params": variables["params"]["denoiser"]},
            jnp.asarray(x), jnp.asarray(sigma), jnp.asarray(emb),
        )
    )
    with torch.no_grad():
        out_ref = theirs(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(sigma),
            torch.from_numpy(emb),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(mine, out_ref, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def ref_networks():
    ref_spec = importlib.util.spec_from_file_location("ref_networks", REF)
    ref = importlib.util.module_from_spec(ref_spec)
    ref_spec.loader.exec_module(ref)
    return ref


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_reference_parameter_order_matches_live_module(edm_variables, ref_networks):
    """Pin the EMA flat-tuple ordering against the real reference modules.

    The reference zips checkpoint["optimizer_states"][0]["ema"] against
    model.parameters() (edm.py:172-181); parameters() order is module
    registration order. Build the same composite from the REAL reference
    networks.py modules (EDM registers embedding -> denoiser -> u,
    edm.py:128-146; diffuser has no parameters) and assert our synthesized
    order equals named_parameters() exactly."""
    torch = pytest.importorskip("torch")
    spec, model, variables = edm_variables
    ref = ref_networks

    class RefComposite(torch.nn.Module):
        # registration order mirrors reference EDM.__init__ (edm.py:128-146)
        def __init__(self):
            super().__init__()
            self.embedding = ref.Embedding(
                fourier_dim=16, embedding_dim=32, num_classes=10
            )
            self.denoiser = ref.Denoiser(
                in_channels=3, out_channels=3, embedding_dim=32, num_heads=2,
                sigma_data=0.5, **TOPOLOGY,
            )
            self.u = ref.UncertaintyNet(16, 16)

    module = RefComposite()
    live_order = [n for n, _ in module.named_parameters()]
    sd = interop.edm_params_to_torch_state_dict(spec, variables)
    assert interop.reference_parameter_order(sd) == live_order


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_import_torch_checkpoint_with_ema(tmp_path, edm_variables, ref_networks):
    """Full --load_ema import flow: synthesize a lightning-style checkpoint
    whose EMA rides as the reference's flat tuple in model.parameters()
    order (ema.py:326-336), import it, and check the EMA tree lands on the
    right leaves (values distinguish EMA from live weights)."""
    torch = pytest.importorskip("torch")
    import yaml

    spec, model, variables = edm_variables
    ref = ref_networks

    class RefComposite(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = ref.Embedding(
                fourier_dim=16, embedding_dim=32, num_classes=10
            )
            self.denoiser = ref.Denoiser(
                in_channels=3, out_channels=3, embedding_dim=32, num_heads=2,
                sigma_data=0.5, **TOPOLOGY,
            )
            self.u = ref.UncertaintyNet(16, 16)

    module = RefComposite()
    sd_np = interop.edm_params_to_torch_state_dict(spec, variables)
    module.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}, strict=True
    )
    # EMA values = 2p + 1: same shapes as the parameters, different values,
    # built by iterating parameters() exactly as the reference does
    ema_flat = tuple(p.detach().clone() * 2.0 + 1.0 for p in module.parameters())
    ckpt = {
        "state_dict": module.state_dict(),
        "optimizer_states": [
            {"ema": ema_flat, "current_step": 777, "gamma": 4.6, "every_n_steps": 1}
        ],
        "global_step": 777,
    }
    torch.save(ckpt, tmp_path / "ref_ema.ckpt")

    from tinyedm_tpu.config.registry import deinstantiate

    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump({"model": deinstantiate(spec)}, f)

    interop.import_torch_checkpoint(
        str(tmp_path / "ref_ema.ckpt"), str(tmp_path / "config.yaml"),
        str(tmp_path / "imported_ema"), load_ema=True,
    )

    from tinyedm_tpu.training.checkpoint import load_edm_from_checkpoint

    spec2, model2, variables2, state = load_edm_from_checkpoint(
        tmp_path / "imported_ema"
    )
    assert len(state.ema) == 1
    # every EMA leaf must equal 2*param + 1 under the same tree paths
    flat_p = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_e = jax.tree_util.tree_flatten_with_path(state.ema[0])[0]
    assert len(flat_p) == len(flat_e)
    for (pp, p), (pe, e) in zip(flat_p, flat_e):
        assert pp == pe
        np.testing.assert_allclose(
            np.asarray(e), np.asarray(p) * 2.0 + 1.0, rtol=1e-6, atol=1e-6
        )


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_ema_flat_length_mismatch_rejected(edm_variables):
    """A truncated EMA tuple (architecture mismatch) must raise, not
    silently mis-zip."""
    spec, model, variables = edm_variables
    sd = interop.edm_params_to_torch_state_dict(spec, variables)
    order = interop.reference_parameter_order(sd)
    flat = [np.asarray(sd[k]) for k in order][:-1]
    with pytest.raises(ValueError, match="architecture mismatch"):
        interop.ema_state_dict_from_flat(sd, flat)


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_import_torch_checkpoint_cli(tmp_path, edm_variables):
    """Full import flow: synthesize a lightning-style .ckpt whose state_dict
    comes from real reference modules, import via the CLI path, and generate
    with the result."""
    torch = pytest.importorskip("torch")
    import yaml

    spec, model, variables = edm_variables
    # build a torch-side state dict from our variables (already proven
    # loadable into the reference modules above)
    sd_np = interop.edm_params_to_torch_state_dict(spec, variables)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    ckpt = {"state_dict": sd, "global_step": 1234}
    torch.save(ckpt, tmp_path / "ref.ckpt")

    # a minimal config file describing the same architecture
    from tinyedm_tpu.config.registry import deinstantiate

    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump({"model": deinstantiate(spec)}, f)

    interop.import_torch_checkpoint(
        str(tmp_path / "ref.ckpt"), str(tmp_path / "config.yaml"),
        str(tmp_path / "imported"),
    )

    from tinyedm_tpu.training.checkpoint import load_edm_from_checkpoint

    spec2, model2, variables2, state = load_edm_from_checkpoint(tmp_path / "imported")
    assert int(state.step) == 1234
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 3))
    out_a = model.apply(
        {k: variables[k] for k in ("params", "constants")},
        x, jnp.ones((2,)), jnp.asarray([3, 7]),
    )
    out_b = model2.apply(variables2, x, jnp.ones((2,)), jnp.asarray([3, 7]))
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-6
    )


# ------------------------------------------------------------------ export


def test_export_torch_checkpoint_roundtrip(tmp_path, edm_variables):
    """Full export flow (the inverse of the import CLI): orbax checkpoint ->
    lightning-style .ckpt -> verify every piece the reference reads
    (state_dict, hyper_parameters, optimizer_states[0]['ema'/'opt']) -> import
    it back and recover the exact trees."""
    torch = pytest.importorskip("torch")
    import dataclasses

    from tinyedm_tpu.config.registry import deinstantiate, instantiate
    from tinyedm_tpu.training.checkpoint import save_checkpoint
    from tinyedm_tpu.training.ema import sigma_rel_to_gamma
    from tinyedm_tpu.training.state import TrainState
    from tinyedm_tpu.training.train_step import make_adam

    spec0, model, variables = edm_variables
    spec = dataclasses.replace(spec0, use_ema=True, ema_length=0.13)
    params = variables["params"]

    # distinctive Adam moments + EMA tree so the round-trip is meaningful
    mu = jax.tree_util.tree_map(lambda p: p * 0.5 + 0.125, params)
    nu = jax.tree_util.tree_map(lambda p: p * p * 0.25 + 1e-3, params)
    opt_state = make_adam((0.9, 0.999), 1e-8).init(params)._replace(mu=mu, nu=nu)
    ema_tree = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    state = TrainState(
        step=jnp.asarray(777, jnp.int32),
        params=params,
        constants=variables["constants"],
        opt_state=opt_state,
        ema=(ema_tree,),
    )
    save_checkpoint(tmp_path / "orbax", state, config={"model": deinstantiate(spec)})

    out = tmp_path / "exported.ckpt"
    interop.main(
        ["export", "--ckpt_dir", str(tmp_path / "orbax"), "--out", str(out)]
    )
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["global_step"] == 777

    # hyper_parameters re-instantiate through the tinyedm.* aliases into an
    # equivalent spec (what the reference's hydra instantiate would build)
    spec2 = instantiate(ckpt["hyper_parameters"])
    assert spec2.use_ema and spec2.ema_length == pytest.approx(0.13)
    assert tuple(spec2.denoiser.encoder_block_types) == tuple(
        spec.denoiser.encoder_block_types
    )
    assert tuple(spec2.denoiser.decoder_out_channels) == tuple(
        spec.denoiser.decoder_out_channels
    )
    assert spec2.embedding.num_classes == spec.embedding.num_classes

    # state_dict converts back to the exact params
    back = interop.edm_params_from_torch_state_dict(spec, ckpt["state_dict"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(back["params"])[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # EMA rides as the reference's flat tuple: rebuild the named dict by
    # parameter order and recover the exact EMA tree
    opt0 = ckpt["optimizer_states"][0]
    assert opt0["current_step"] == 777
    assert opt0["gamma"] == pytest.approx(sigma_rel_to_gamma(0.13))
    ema_sd = interop.ema_state_dict_from_flat(ckpt["state_dict"], opt0["ema"])
    ema_back = interop.edm_params_from_torch_state_dict(spec, ema_sd)["params"]
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(ema_tree)[0],
        jax.tree_util.tree_flatten_with_path(ema_back)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Adam moments: the exported torch state dict loads into a real
    # torch.optim.Adam over the exported parameters, and the moments convert
    # back to the exact mu/nu trees
    order = interop.reference_parameter_order(ckpt["state_dict"])
    tparams = [
        torch.nn.Parameter(ckpt["state_dict"][k].clone()) for k in order
    ]
    tadam = torch.optim.Adam(tparams, lr=spec.lr, betas=tuple(spec.betas))
    tadam.load_state_dict(opt0["opt"])  # format must be accepted verbatim
    mu_flat = [opt0["opt"]["state"][i]["exp_avg"] for i in range(len(order))]
    mu_sd = interop.ema_state_dict_from_flat(ckpt["state_dict"], mu_flat)
    mu_back = interop.edm_params_from_torch_state_dict(spec, mu_sd)["params"]
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(mu)[0],
        jax.tree_util.tree_flatten_with_path(mu_back)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

    # and the exported file round-trips through the import CLI (orbax ->
    # torch -> orbax), EMA intact
    import yaml

    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump({"model": deinstantiate(spec)}, f)
    interop.import_torch_checkpoint(
        str(out), str(tmp_path / "config.yaml"), str(tmp_path / "reimported"),
        load_ema=True,
    )
    from tinyedm_tpu.training.checkpoint import load_checkpoint

    state2, _ = load_checkpoint(tmp_path / "reimported")
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state2.ema[0])[0]),
        np.asarray(jax.tree_util.tree_leaves(ema_tree)[0]),
    )

    # no-EMA checkpoints export the BARE Adam dict at optimizer_states[0]
    # (the reference's plain torch.optim.Adam reads it directly; only EMA
    # runs nest it under 'opt' inside an EMAOptimizer state, ema.py:326-336)
    state_noema = dataclasses.replace(state, ema=())
    save_checkpoint(
        tmp_path / "orbax_noema", state_noema, config={"model": deinstantiate(spec0)}
    )
    out2 = tmp_path / "exported_noema.ckpt"
    interop.export_torch_checkpoint(str(tmp_path / "orbax_noema"), str(out2))
    ckpt2 = torch.load(out2, map_location="cpu", weights_only=False)
    opt_plain = ckpt2["optimizer_states"][0]
    assert "opt" not in opt_plain and "ema" not in opt_plain
    assert set(opt_plain) == {"state", "param_groups"}
    tadam2 = torch.optim.Adam(tparams, lr=spec0.lr, betas=tuple(spec0.betas))
    tadam2.load_state_dict(opt_plain)


def test_interop_crosscheck_script(tmp_path, edm_variables):
    """experiments/interop_crosscheck.py end-to-end at toy scale: train-free
    checkpoint -> export -> the REFERENCE's torch modules + loss math agree
    with the jax side on the same batch (the recipe-scale run of the same
    script is recorded in BENCH.md)."""
    import dataclasses

    sys_path = str(Path(__file__).resolve().parents[1] / "experiments")
    import sys

    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    import interop_crosscheck

    from tinyedm_tpu.config.registry import deinstantiate
    from tinyedm_tpu.training.checkpoint import save_checkpoint
    from tinyedm_tpu.training.state import TrainState
    from tinyedm_tpu.training.train_step import make_adam

    spec0, model, variables = edm_variables
    spec = dataclasses.replace(spec0, use_ema=True, ema_length=0.13)
    params = variables["params"]
    opt_state = make_adam((0.9, 0.999), 1e-8).init(params)
    # EMA tree distinct from params so --load_ema is a real branch
    ema_tree = jax.tree_util.tree_map(lambda p: p * 0.9, params)
    state = TrainState(
        step=jnp.asarray(11, jnp.int32),
        params=params,
        constants=variables["constants"],
        opt_state=opt_state,
        ema=(ema_tree,),
    )
    save_checkpoint(tmp_path / "ckpt", state, config={"model": deinstantiate(spec)})

    rc = interop_crosscheck.main(
        ["--ckpt_dir", str(tmp_path / "ckpt"), "--batch", "8"]
    )
    assert rc == 0
    rc = interop_crosscheck.main(
        ["--ckpt_dir", str(tmp_path / "ckpt"), "--batch", "8", "--load_ema"]
    )
    assert rc == 0


def test_scanned_checkpoint_export_import_roundtrip(tmp_path):
    """scan_blocks=True checkpoints must export (unrolled — the reference
    state_dict is always per-block) and import back into a scanned config
    (restacked to what spec.build_model() expects). Before the fix, export
    KeyError'd on the missing encoder_blocks_i keys and import wrote an
    unrolled tree under a scanned config (unusable at restore)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    import yaml

    from tinyedm_tpu.config.registry import deinstantiate
    from tinyedm_tpu.diffusion.diffuser import Diffuser
    from tinyedm_tpu.training.checkpoint import (
        load_edm_from_checkpoint,
        save_checkpoint,
    )
    from tinyedm_tpu.training.experiment import EDMSpec
    from tinyedm_tpu.training.state import TrainState
    from tinyedm_tpu.training.train_step import make_adam

    # topology with genuine scannable runs (mirrors tests/test_scan_blocks.py
    # CFG: Enc x2, EncA x2, DecA x3, Dec x3 — the fixture TOPOLOGY above has
    # no runs of identical blocks and would not exercise the scan layout)
    scan_topology = dict(
        encoder_block_types=("Enc", "Enc", "EncD", "EncA", "EncA"),
        decoder_block_types=("DecA", "DecA", "DecA", "DecU", "Dec", "Dec", "Dec"),
        encoder_out_channels=(16, 16, 16, 16, 16),
        decoder_out_channels=(16, 16, 16, 16, 16, 16, 16),
        skip_connections=(True, True, True, False, True, True, True),
    )
    spec = EDMSpec(
        diffuser=Diffuser(-1.2, 1.2),
        embedding=Embedding(fourier_dim=16, embedding_dim=32, num_classes=10),
        denoiser=Denoiser(
            in_channels=3, out_channels=3, embedding_dim=32, num_heads=2,
            sigma_data=0.5, scan_blocks=True, **scan_topology,
        ),
        use_uncertainty=True,
        use_ema=True,
        ema_length=0.13,
    )
    model = spec.build_model()
    x = jnp.zeros((2, 8, 8, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1)}, x, jnp.ones((2,)),
        jnp.asarray([0, 1]), method=EDM.denoise_with_aux,
    )
    params = variables["params"]
    # the fixture TOPOLOGY's trailing Dec,Dec run must actually scan
    assert any(k.startswith("decoder_scan_") for k in params["denoiser"])

    ema_tree = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    state = TrainState(
        step=jnp.asarray(55, jnp.int32),
        params=params,
        constants=variables["constants"],
        opt_state=make_adam((0.9, 0.999), 1e-8).init(params),
        ema=(ema_tree,),
    )
    save_checkpoint(tmp_path / "orbax", state, config={"model": deinstantiate(spec)})

    out = tmp_path / "exported.ckpt"
    interop.main(["export", "--ckpt_dir", str(tmp_path / "orbax"), "--out", str(out)])

    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump({"model": deinstantiate(spec)}, f)
    interop.import_torch_checkpoint(
        str(out), str(tmp_path / "config.yaml"), str(tmp_path / "imported"),
        load_ema=True,
    )

    spec2, model2, v2, st = load_edm_from_checkpoint(
        tmp_path / "imported", load_ema=True
    )
    assert any(k.startswith("decoder_scan_") for k in v2["params"]["denoiser"])
    # the restored (scanned) EMA tree computes the same forward as the
    # original scanned model with the original EMA tree
    xq = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 3))
    out_a = model.apply(
        {"params": ema_tree, "constants": variables["constants"]},
        xq, jnp.ones((2,)), jnp.asarray([3, 7]),
    )
    out_b = model2.apply(v2, xq, jnp.ones((2,)), jnp.asarray([3, 7]))
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-6
    )
