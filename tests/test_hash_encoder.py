import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nicer_slam_tpu.ops import hash_encoder as he


def small_dense_spec():
    # all levels dense: base 8 -> 16, logmap 19 easily covers 16^3
    return he.make_spec(input_dim=3, num_levels=3, level_dim=2,
                        base_resolution=8, desired_resolution=16,
                        log2_hashmap_size=19)


def hashed_spec():
    # replica fine grid: 8 levels 32->128, logmap 19 => upper levels hashed
    return he.make_spec(input_dim=3, num_levels=8, level_dim=4,
                        base_resolution=32, desired_resolution=128,
                        log2_hashmap_size=19)


def test_spec_offsets_match_reference_formula():
    spec = hashed_spec()
    # reproduce hashgrid.py:160-171 independently
    pls = np.exp2(np.log2(128 / 32) / (8 - 1))
    offset = 0
    for i in range(8):
        res = int(np.ceil(32 * pls ** i))
        expect = min(2 ** 19, res ** 3)
        assert spec.offsets[i + 1] - spec.offsets[i] == expect
        offset += expect
    assert spec.total_entries == offset


def test_dense_matches_reference_impl(rng):
    spec = small_dense_spec()
    emb = he.init_hash_params(rng, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), minval=-0.999,
                           maxval=0.999)
    got = np.asarray(jax.jit(lambda e, xx: he.hash_encode(spec, e, xx))(emb, x))
    want = he.hash_encode_dense_ref(spec, np.asarray(emb), np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_out_of_bounds_zero(rng):
    spec = small_dense_spec()
    emb = he.init_hash_params(rng, spec)
    x = jnp.array([[1.5, 0.0, 0.0], [0.0, -1.2, 0.3], [0.2, 0.2, 0.2]])
    out = jax.jit(lambda e, xx: he.hash_encode(spec, e, xx))(emb, x)
    assert np.all(np.asarray(out[:2]) == 0.0)
    assert np.any(np.asarray(out[2]) != 0.0)
    # gradient wrt inputs must be zero for oob points too
    g = jax.jit(jax.grad(lambda xx: he.hash_encode(spec, emb, xx).sum()))(x)
    assert np.all(np.asarray(g[:2]) == 0.0)


def test_gradients_vs_finite_difference(rng):
    spec = hashed_spec()
    emb = he.init_hash_params(rng, spec) * 1e3  # scale up for fd resolution
    x0 = jnp.array([[0.123, -0.456, 0.321], [0.77, 0.11, -0.65]])

    f = jax.jit(lambda xx: he.hash_encode(spec, emb, xx).sum())
    g = np.asarray(jax.jit(jax.grad(f))(x0))
    eps = 1e-4
    for i in range(x0.shape[0]):
        for d in range(3):
            xp = x0.at[i, d].add(eps)
            xm = x0.at[i, d].add(-eps)
            fd = (f(xp) - f(xm)) / (2 * eps)
            np.testing.assert_allclose(g[i, d], fd, rtol=2e-2, atol=1e-4)


def test_second_order_grad_exists_and_matches_fd(rng):
    """grad-of-grad (the eikonal-through-normals path) must be finite and
    correct: d/demb of |grad_x f|^2."""
    spec = small_dense_spec()
    emb = he.init_hash_params(rng, spec) * 1e3
    x0 = jnp.array([[0.2, 0.3, -0.1]])

    @jax.jit
    def norm_of_grad(e):
        g = jax.grad(lambda xx: he.hash_encode(spec, e, xx).sum())(x0)
        return (g ** 2).sum()

    ge = jax.jit(jax.grad(norm_of_grad))(emb)
    assert np.isfinite(np.asarray(ge)).all()
    assert np.abs(np.asarray(ge)).max() > 0

    # finite-difference check on one touched entry
    touched = np.argwhere(np.abs(np.asarray(ge)) > 0)
    i, j = touched[0]
    eps = 1e-3
    ep = emb.at[i, j].add(eps)
    em = emb.at[i, j].add(-eps)
    fd = (norm_of_grad(ep) - norm_of_grad(em)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(ge)[i, j], fd, rtol=5e-2, atol=1e-5)


def test_smoothstep_continuity_of_gradient(rng):
    """C1: input-gradients should be continuous across a cell boundary."""
    spec = small_dense_spec()
    emb = he.init_hash_params(rng, spec)

    g = jax.jit(lambda xx: jax.grad(
        lambda p: he.hash_encode(spec, emb, p).sum())(xx))

    # boundary of the coarsest level at scale=7: u = k/7 -> x = 2u-1
    ub = 3.0 / 7.0
    xb = 2 * ub - 1
    eps = 1e-5
    g_lo = np.asarray(g(jnp.array([[xb - eps, 0.1, 0.1]])))
    g_hi = np.asarray(g(jnp.array([[xb + eps, 0.1, 0.1]])))
    np.testing.assert_allclose(g_lo, g_hi, atol=1e-3)


def test_jit_and_shapes(rng):
    spec = hashed_spec()
    emb = he.init_hash_params(rng, spec)
    x = jax.random.uniform(rng, (4, 5, 3), minval=-1, maxval=1)
    out = jax.jit(lambda e, xx: he.hash_encode(spec, e, xx))(emb, x)
    assert out.shape == (4, 5, spec.output_dim)
    assert spec.output_dim == 32


# ---------------------------------------------------------------------------
# Analytic dy_dx forward (hash_encode_with_grad) — the gather-minimal route
# used by the training path (fields.implicit_outputs_analytic).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("spec_fn", [small_dense_spec, hashed_spec])
def test_with_grad_matches_encode_and_autodiff(rng, spec_fn):
    spec = spec_fn()
    emb = he.init_hash_params(rng, spec)
    x = jax.random.uniform(jax.random.PRNGKey(3), (129, 3), minval=-0.95,
                           maxval=0.95)
    feats, dfeat = he.hash_encode_with_grad(spec, emb, x)
    # values match the plain encode exactly (same gathered corners/weights)
    ref = he.hash_encode(spec, emb, x)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # the analytic Jacobian matches autodiff of the plain encode
    jac = jax.vmap(jax.jacrev(lambda p: he.hash_encode(spec, emb, p)))(x)
    np.testing.assert_allclose(np.asarray(dfeat), np.asarray(jac),
                               rtol=1e-4, atol=1e-5)


def test_with_grad_oob_zero(rng):
    spec = small_dense_spec()
    emb = he.init_hash_params(rng, spec)
    x = jnp.asarray([[1.5, 0.0, 0.0], [0.0, -1.2, 0.3]])
    feats, dfeat = he.hash_encode_with_grad(spec, emb, x)
    assert np.all(np.asarray(feats) == 0.0)
    assert np.all(np.asarray(dfeat) == 0.0)


def test_with_grad_differentiable_second_order(rng):
    """grad-of-grad through the analytic route: d/d(emb) of an eikonal-style
    loss built from dfeat must match the same derivative through the plain
    encode's autodiff gradient."""
    spec = small_dense_spec()
    emb = he.init_hash_params(rng, spec)
    x = jax.random.uniform(jax.random.PRNGKey(5), (65, 3), minval=-0.9,
                           maxval=0.9)

    def loss_analytic(e):
        _, dfeat = he.hash_encode_with_grad(spec, e, x)
        g = dfeat.sum(axis=1)          # pseudo SDF grad: sum over channels
        return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()

    def loss_autodiff(e):
        def sdf_sum(p):
            return he.hash_encode(spec, e, p[None]).sum()
        g = jax.vmap(jax.grad(sdf_sum))(x)
        return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()

    ga = jax.grad(loss_analytic)(emb)
    gb = jax.grad(loss_autodiff)(emb)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Row-layout TRAINING gather (custom_jvp linear formulation): the hashed
# levels' forward fetches [T, C] table rows (the fast gather direction on
# TPU) while gradients transpose through scalar scatter-adds (the fast
# scatter direction). Exact f32 both ways.
# ---------------------------------------------------------------------------

def test_row_gather_matches_scalar_exact(rng):
    spec = hashed_spec()
    emb = he.init_hash_params(rng, spec) * 1e3
    x = jax.random.uniform(jax.random.PRNGKey(11), (257, 3), minval=-0.95,
                           maxval=0.95)
    assert he.ROW_GATHER_TRAIN  # default on
    f_row = np.asarray(he.hash_encode(spec, emb, x))
    fr, dfr = he.hash_encode_with_grad(spec, emb, x)
    try:
        he.ROW_GATHER_TRAIN = False
        f_sc = np.asarray(he.hash_encode(spec, emb, x))
        fs, dfs = he.hash_encode_with_grad(spec, emb, x)
    finally:
        he.ROW_GATHER_TRAIN = True
    # same table values, same weights — identical up to f32 summation order
    np.testing.assert_allclose(f_row, f_sc, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fr), f_sc, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dfr), np.asarray(dfs),
                               rtol=1e-5, atol=1e-5)


def test_row_gather_gradient_matches_scalar(rng):
    """The custom_jvp transpose must be the exact scalar scatter of the
    output cotangent — identical to the fallback path's gradient."""
    spec = hashed_spec()
    emb = he.init_hash_params(rng, spec)
    x = jax.random.uniform(jax.random.PRNGKey(13), (129, 3), minval=-0.9,
                           maxval=0.9)
    cot = jax.random.normal(jax.random.PRNGKey(14),
                            (129, spec.output_dim), jnp.float32)
    _, vjp_r = jax.vjp(lambda e: he.hash_encode(spec, e, x), emb)
    try:
        he.ROW_GATHER_TRAIN = False
        _, vjp_s = jax.vjp(lambda e: he.hash_encode(spec, e, x), emb)
    finally:
        he.ROW_GATHER_TRAIN = True
    (gr,) = vjp_r(cot)
    (gs,) = vjp_s(cot)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gs),
                               rtol=1e-6, atol=1e-7)


def test_row_gather_second_order(rng):
    spec = hashed_spec()
    emb = he.init_hash_params(rng, spec) * 1e3
    x = jax.random.uniform(jax.random.PRNGKey(15), (65, 3), minval=-0.9,
                           maxval=0.9)

    def loss(e):
        _, df = he.hash_encode_with_grad(spec, e, x)
        g = df.sum(axis=1)
        return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()

    ge = jax.jit(jax.grad(loss))(emb)
    assert np.isfinite(np.asarray(ge)).all()
    assert np.abs(np.asarray(ge)).max() > 0


def test_fields_analytic_outputs_match_vjp(rng):
    from nicer_slam_tpu.models import fields

    cfg = fields.CombineConfig(
        coarse=fields.ImplicitNetConfig(
            dims=(32,), multires=6, base_size=8, end_size=16, logmap=15,
            num_levels=2, level_dim=4, feature_vector_size=16,
            geometric_init=True, bias=0.9, name="coarse"),
        fine=fields.ImplicitNetConfig(
            dims=(32, 32), multires=6, base_size=8, end_size=32, logmap=15,
            num_levels=3, level_dim=2, feature_vector_size=16,
            geometric_init=False, name="fine"),
    )
    params = fields.init_combine(np.random.default_rng(0), cfg)
    # give the grids some signal so gradients are nontrivial
    params["coarse"]["encoding"] = params["coarse"]["encoding"] * 100.0
    params["fine"]["encoding"] = params["fine"]["encoding"] * 100.0
    x = jax.random.uniform(jax.random.PRNGKey(7), (97, 3), minval=-0.9,
                           maxval=0.9)
    for stage in ("coarse", "fine"):
        s_a, f_a, g_a = fields.combine_get_outputs(cfg, params, x, stage)
        s_v, f_v, g_v = fields.combine_get_outputs_vjp(cfg, params, x, stage)
        np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_v),
                                   rtol=1e-5, atol=1e-6, err_msg=stage)
        np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_v),
                                   rtol=1e-5, atol=1e-6, err_msg=stage)
        np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_v),
                                   rtol=1e-4, atol=1e-5, err_msg=stage)

    # second order: d/d(params) of an eikonal loss equal via both routes
    def eik(p, route):
        _, _, g = route(cfg, p, x, "fine")
        return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()

    ga = jax.grad(lambda p: eik(p, fields.combine_get_outputs))(params)
    gv = jax.grad(lambda p: eik(p, fields.combine_get_outputs_vjp))(params)
    fa = jax.tree.leaves(ga)
    fv = jax.tree.leaves(gv)
    assert len(fa) == len(fv)
    for a, v in zip(fa, fv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(v),
                                   rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Unified sorted-backward encode (big-grid path, hash_encoder.py
# _hash_encode_unified / _grid_corner_values)
# ---------------------------------------------------------------------------

def _mixed_spec():
    # dense + hashed mix like the color grid, tiny tables
    return he.make_spec(input_dim=3, num_levels=6, level_dim=2,
                        base_resolution=4, desired_resolution=32,
                        log2_hashmap_size=10)


def test_unified_forward_matches_standard(rng):
    spec = _mixed_spec()
    nprng = np.random.default_rng(3)
    emb = he.init_hash_params(nprng, spec) * 1e4
    x = jnp.asarray(nprng.uniform(-1.05, 1.05, (513, 3)).astype(np.float32))
    ref = he.hash_encode(spec, emb, x)          # small tables: standard path
    uni = he._hash_encode_unified(spec, emb, x)
    np.testing.assert_allclose(np.asarray(uni), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_unified_gradients_match_standard(rng):
    """demb (the sorted-scatter backward) and dx must equal the standard
    custom_jvp path's gradients; exercised with the threshold forced low so
    BOTH the small-level direct scatter and the big-level sorted scatter
    branches run (levels straddle the patched threshold)."""
    spec = _mixed_spec()
    nprng = np.random.default_rng(3)
    emb = he.init_hash_params(nprng, spec) * 1e4
    x = jnp.asarray(nprng.uniform(-0.95, 0.95, (257, 3)).astype(np.float32))

    old_min, old_sorted = he.SORTED_BWD_MIN_ENTRIES, he.SORTED_BWD
    try:
        # median level size so both bwd branches are non-empty
        sizes = sorted(spec.offsets[l + 1] - spec.offsets[l]
                       for l in range(spec.num_levels))
        he.SORTED_BWD_MIN_ENTRIES = sizes[len(sizes) // 2]
        g_uni = jax.grad(
            lambda e, xx: (he._hash_encode_unified(spec, e, xx) ** 2).sum(),
            argnums=(0, 1))(emb, x)
        he.SORTED_BWD = False   # keep hash_encode off the unified route
        g_ref = jax.grad(
            lambda e, xx: (he.hash_encode(spec, e, xx) ** 2).sum(),
            argnums=(0, 1))(emb, x)
    finally:
        he.SORTED_BWD_MIN_ENTRIES, he.SORTED_BWD = old_min, old_sorted
    for a, b, name in [(g_ref[0], g_uni[0], "demb"), (g_ref[1], g_uni[1], "dx")]:
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=3e-6 * max(scale, 1.0),
                                   err_msg=name)


def test_unified_under_checkpoint_policy(rng):
    """The scene-model usage: unified encode inside jax.checkpoint with the
    save_only_these_names("hash_gather") policy."""
    spec = _mixed_spec()
    nprng = np.random.default_rng(3)
    emb = he.init_hash_params(nprng, spec) * 1e4
    x = jnp.asarray(nprng.uniform(-0.9, 0.9, (129, 3)).astype(np.float32))
    pol = jax.checkpoint_policies.save_only_these_names("hash_gather")
    f = jax.checkpoint(
        lambda e: (he._hash_encode_unified(spec, e, x) ** 3).sum(),
        policy=pol)
    g1 = jax.grad(f)(emb)
    old = he.SORTED_BWD
    try:
        he.SORTED_BWD = False
        g2 = jax.grad(lambda e: (he.hash_encode(spec, e, x) ** 3).sum())(emb)
    finally:
        he.SORTED_BWD = old
    scale = float(jnp.abs(g2).max())
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=0, atol=3e-6 * max(scale, 1.0))


def test_unified_oob_zero_grad(rng):
    spec = _mixed_spec()
    emb = he.init_hash_params(np.random.default_rng(3), spec) * 1e4
    x = jnp.asarray(np.array([[1.5, 0.0, 0.0], [0.0, -2.0, 0.5]],
                             np.float32))
    out = he._hash_encode_unified(spec, emb, x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    g = jax.grad(lambda e: he._hash_encode_unified(spec, e, x).sum())(emb)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
