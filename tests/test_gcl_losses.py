"""Contrastive-loss math: closed-form checks for JSD-G2L, intraview
InfoNCE, and GGD BCE (PyGCL-equivalent formulas, gcl_module.py:127-234)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biomedkg_tpu.training.gcl_module import (ggd_bce_loss,
                                              infonce_intraview_loss,
                                              jsd_g2l_loss)


def softplus(x):
    return math.log1p(math.exp(-abs(x))) + max(x, 0.0)


def test_jsd_g2l_closed_form():
    z = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    zn = jnp.array([[0.5, 0.5], [0.2, -0.1]])
    g = jnp.array([[0.3, 0.7]])
    mask = jnp.array([True, True])
    got = float(jsd_g2l_loss(z, g, zn, mask))

    d_pos = [0.3, 0.7]
    d_neg = [0.5 * 0.3 + 0.5 * 0.7, 0.2 * 0.3 - 0.1 * 0.7]
    e_pos = np.mean([math.log(2) - softplus(-d) for d in d_pos])
    e_neg = np.mean([softplus(-d) + d - math.log(2) for d in d_neg])
    np.testing.assert_allclose(got, e_neg - e_pos, rtol=1e-5)


def test_jsd_masking_ignores_padding():
    z = jnp.array([[1.0, 0.0], [9.9, 9.9]])
    zn = jnp.array([[0.5, 0.5], [9.9, 9.9]])
    g = jnp.array([[0.3, 0.7]])
    full = float(jsd_g2l_loss(z[:1], g, zn[:1], jnp.array([True])))
    masked = float(jsd_g2l_loss(z, g, zn, jnp.array([True, False])))
    np.testing.assert_allclose(full, masked, rtol=1e-6)


def test_infonce_two_nodes_closed_form():
    h1 = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    h2 = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    mask = jnp.array([True, True])
    tau = 0.2
    got = float(infonce_intraview_loss(h1, h2, mask, tau=tau))
    # identical views, orthonormal rows: per anchor i —
    # pos = 1/τ; inter sims = [1/τ, 0]; intra (excl self) = [0]
    pos = 1 / tau
    denom = math.log(math.exp(1 / tau) + math.exp(0.0) + math.exp(0.0))
    expected = -(pos - denom)  # same for both anchors and both directions
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_infonce_masking():
    h1 = jnp.array([[1.0, 0.0], [0.0, 1.0], [5.0, 5.0]])
    h2 = jnp.array([[1.0, 0.0], [0.0, 1.0], [5.0, 5.0]])
    m2 = jnp.array([True, True, False])
    got = float(infonce_intraview_loss(h1, h2, m2))
    ref = float(infonce_intraview_loss(h1[:2], h2[:2],
                                       jnp.array([True, True])))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ggd_bce_closed_form():
    pos = jnp.array([2.0, -1.0])
    neg = jnp.array([0.5])
    # node_mask applies to each half separately; use all-real here
    mask = jnp.ones(2, bool)
    # manual masked BCE with w = [1,1,1,1] over [pos, neg-padded...]
    got = float(ggd_bce_loss(pos, jnp.array([0.5, 0.5]), mask))
    terms = [softplus(-2.0), softplus(1.0), softplus(0.5), softplus(0.5)]
    np.testing.assert_allclose(got, np.mean(terms), rtol=1e-5)


def test_infonce_blocked_matches_dense():
    """Flash-style streamed InfoNCE (VERDICT #5) == dense form."""
    import jax
    import jax.numpy as jnp

    from biomedkg_tpu.training.gcl_module import infonce_intraview_loss

    rng = np.random.default_rng(3)
    n, d = 512, 32
    h1 = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    h2 = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.9)
    dense = infonce_intraview_loss(h1, h2, mask, block=0)
    blocked = infonce_intraview_loss(h1, h2, mask, block=128)
    np.testing.assert_allclose(float(blocked), float(dense), rtol=1e-6)

    # gradients agree too — BOTH sides: the flash custom VJP recomputes
    # tiles and accumulates the b-side (column) grads in a scan carry
    g_d = jax.grad(lambda a, b: infonce_intraview_loss(a, b, mask,
                                                       block=0),
                   (0, 1))(h1, h2)
    g_b = jax.grad(lambda a, b: infonce_intraview_loss(a, b, mask,
                                                       block=128),
                   (0, 1))(h1, h2)
    for gb, gd in zip(g_b, g_d):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                                   rtol=2e-5, atol=1e-6)

    # bf16 inputs: flash grads track the dense-bf16 grads to bf16 noise
    h1b, h2b = h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16)
    gb16 = jax.grad(lambda a: infonce_intraview_loss(
        a, h2b, mask, block=128).astype(jnp.float32))(h1b)
    gd16 = jax.grad(lambda a: infonce_intraview_loss(
        a, h2b, mask, block=0).astype(jnp.float32))(h1b)
    d_ref = np.asarray(gd16, np.float32)
    err = np.abs(np.asarray(gb16, np.float32) - d_ref).max()
    assert err <= 0.05 * np.abs(d_ref).max(), err


def _batch(rng, n=40, e=120, d=16):
    from biomedkg_tpu.sampling.batch import pad_graph_batch

    x = rng.standard_normal((n, d)).astype(np.float32)
    ei = rng.integers(0, n, (2, e)).astype(np.int64)
    et = np.zeros(e, np.int32)
    return pad_graph_batch(x, ei, et, num_relations=1, node_budget=64,
                           edge_budget=128, block_size=64)


def test_gcl_bf16_mode_trains():
    """compute_dtype=bfloat16 GCL step runs and loss stays finite/close
    to the f32 step on the same batch."""
    import jax

    from biomedkg_tpu.training.gcl_module import GRACEModule

    rng = np.random.default_rng(0)
    losses = {}
    for dtype in ("float32", "bfloat16"):
        mod = GRACEModule(in_dim=16, hidden_dim=32, out_dim=32,
                          num_hidden_layers=1, fuse_method=None,
                          compute_dtype=dtype)
        mod.configure_optimizers(4)
        state = mod.init_state(jax.random.PRNGKey(0))
        batch = _batch(rng)
        state, logs = mod.train_step(state, batch, jax.random.PRNGKey(1))
        losses[dtype] = float(logs["train_loss"])
    assert np.isfinite(losses["bfloat16"])
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.1, losses


def test_flashnce_kernel_matches_xla_flash():
    """The fused Pallas denominators (fwd + both backward kernels) must
    match the XLA flash path (_flash_fwd / its custom VJP) on the same
    inputs — interpret mode, f32 and bf16."""
    from jax.experimental.pallas import tpu as pltpu

    from biomedkg_tpu.ops.pallas import flashnce
    from biomedkg_tpu.training.gcl_module import _flash_pos_denom

    n, d, block, tau = 256, 128, 64, 0.2
    rng = np.random.default_rng(11)
    an = rng.standard_normal((n, d)).astype(np.float32)
    bn = rng.standard_normal((n, d)).astype(np.float32)
    an /= np.linalg.norm(an, axis=1, keepdims=True)
    bn /= np.linalg.norm(bn, axis=1, keepdims=True)
    mask = np.ones(n, bool)
    mask[-17:] = False
    col = np.where(mask, 0.0, np.finfo(np.float32).min).astype(np.float32)
    w = rng.standard_normal(n).astype(np.float32) * mask

    def via_kernel(a, b):
        return jnp.sum(flashnce.flash_denom(a, b, jnp.asarray(col),
                                            block, tau) * w)

    def via_xla(a, b):
        _, den = _flash_pos_denom(a, b, jnp.asarray(col), block, tau)
        return jnp.sum(den * w)

    assert flashnce.fits(n, d, block)
    flashnce._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            dk = flashnce.flash_denom(jnp.asarray(an), jnp.asarray(bn),
                                      jnp.asarray(col), block, tau)
            gk = jax.grad(via_kernel, (0, 1))(jnp.asarray(an),
                                              jnp.asarray(bn))
        _, dx = _flash_pos_denom(jnp.asarray(an), jnp.asarray(bn),
                                 jnp.asarray(col), block, tau)
        gx = jax.grad(via_xla, (0, 1))(jnp.asarray(an), jnp.asarray(bn))
        np.testing.assert_allclose(np.asarray(dk)[mask],
                                   np.asarray(dx)[mask], rtol=2e-6,
                                   atol=2e-6)
        for a, b in zip(gk, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

        # bf16 operands through the same kernels
        with pltpu.force_tpu_interpret_mode():
            dk16 = flashnce.flash_denom(
                jnp.asarray(an, jnp.bfloat16), jnp.asarray(bn, jnp.bfloat16),
                jnp.asarray(col), block, tau)
        assert np.abs(np.asarray(dk16)[mask]
                      - np.asarray(dx)[mask]).max() < 0.1
    finally:
        flashnce._FORCE_KERNEL = False


def test_infonce_kernel_path_matches_dense():
    """infonce_intraview_loss with the Pallas kernel path forced must
    match the dense form (value + grads), interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    from biomedkg_tpu.ops.pallas import flashnce

    rng = np.random.default_rng(4)
    n, d = 256, 128
    h1 = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    h2 = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    mask = np.ones(n, bool)
    mask[-9:] = False
    mask = jnp.asarray(mask)

    dense = infonce_intraview_loss(h1, h2, mask, block=0)
    g_d = jax.grad(lambda a, b: infonce_intraview_loss(a, b, mask,
                                                       block=0),
                   (0, 1))(h1, h2)
    flashnce._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            blocked = infonce_intraview_loss(h1, h2, mask, block=64)
            g_k = jax.grad(lambda a, b: infonce_intraview_loss(
                a, b, mask, block=64), (0, 1))(h1, h2)
    finally:
        flashnce._FORCE_KERNEL = False
    np.testing.assert_allclose(float(blocked), float(dense), rtol=1e-6)
    for a, b in zip(g_k, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_mask_feature_is_entrywise():
    """PyG mode='all' parity: different nodes must get different masks
    (the old column mask shared one (F,) pattern across all nodes)."""
    from biomedkg_tpu import nn

    x = jnp.ones((64, 32))
    out = np.asarray(nn.mask_feature(jax.random.PRNGKey(0), x, 0.4))
    zero = out == 0.0
    assert 0.2 < zero.mean() < 0.6                # ~p mass masked
    # column mask would zero entire columns: every column must be mixed
    col_all_zero = zero.all(axis=0)
    col_all_keep = (~zero).all(axis=0)
    assert not col_all_zero.all() and not col_all_keep.all()
    # node-level stochasticity: rows differ
    assert (zero[0] != zero[1]).any()


def test_flashnce_kernel_is_opt_in(monkeypatch):
    """The fused Pallas denom kernels are OPT-IN (chip-measured slower
    than the XLA flash-VJP path, PERF.md round-4 "flash-NCE decision"):
    on a TPU backend the default must take the XLA path, and
    BIOMEDKG_FLASHNCE=1 must route through flashnce.flash_denom."""
    from biomedkg_tpu.ops.pallas import flashnce
    from biomedkg_tpu.training import gcl_module

    class KernelTouched(Exception):
        pass

    def boom(*a, **k):
        raise KernelTouched

    monkeypatch.setattr(flashnce, "flash_denom", boom)
    monkeypatch.setattr(gcl_module.jax, "default_backend", lambda: "tpu")
    assert not flashnce._FORCE_KERNEL

    n, d = 128, 128
    rng = np.random.default_rng(0)
    h1 = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    h2 = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    mask = jnp.ones(n, bool)

    for off in (None, "0", "false", "False", ""):
        if off is None:
            monkeypatch.delenv("BIOMEDKG_FLASHNCE", raising=False)
        else:
            monkeypatch.setenv("BIOMEDKG_FLASHNCE", off)
        assert np.isfinite(float(infonce_intraview_loss(h1, h2, mask,
                                                        block=64)))
    monkeypatch.setenv("BIOMEDKG_FLASHNCE", "1")
    with pytest.raises(KernelTouched):
        infonce_intraview_loss(h1, h2, mask, block=64)
