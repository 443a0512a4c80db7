"""Model family unit tests: shapes, similarity-matrix semantics, golden
activation check of RGL against an independent numpy reimplementation
(SURVEY.md §4 — per-layer allclose golden strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu.configs.base import GCNConfig, PolicyConfig
from relationalgraphlearning_tpu.models import (
    MLP,
    MPRLNetworks,
    RGL,
    StatePredictor,
    ValueEstimator,
    linear_state_predictor,
)

B, N = 3, 5


def _inputs(key=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    robot = jax.random.normal(k1, (B, 9))
    humans = jax.random.normal(k2, (B, N, 5))
    action = jax.random.normal(k3, (B, 2))
    return robot, humans, action


def test_mlp_shapes():
    m = MLP((64, 32))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 9)))
    out = m.apply(params, jnp.ones((4, 9)))
    assert out.shape == (4, 32)


def test_rgl_forward_shapes_and_rowstochastic():
    cfg = GCNConfig()
    robot, humans, _ = _inputs()
    model = RGL(cfg)
    params = model.init(jax.random.PRNGKey(1), robot, humans)
    H, A = model.apply(params, robot, humans)
    assert H.shape == (B, N + 1, cfg.final_state_dim)
    assert A.shape == (B, N + 1, N + 1)
    # embedded_gaussian softmax rows sum to 1
    np.testing.assert_allclose(np.asarray(jnp.sum(A, -1)), 1.0, rtol=1e-5)


@pytest.mark.parametrize(
    "sim",
    ["embedded_gaussian", "gaussian", "cosine", "cosine_softmax", "squared",
     "equal_attention", "general", "concatenation"],
)
def test_similarity_variants(sim):
    cfg = GCNConfig(similarity_function=sim)
    robot, humans, _ = _inputs()
    model = RGL(cfg)
    params = model.init(jax.random.PRNGKey(2), robot, humans)
    H, A = model.apply(params, robot, humans)
    assert H.shape == (B, N + 1, cfg.final_state_dim)
    assert np.all(np.isfinite(np.asarray(H)))


def test_rgl_golden_vs_numpy():
    """Per-layer golden test: independent numpy forward with the same params
    must match the flax RGL (embedded_gaussian, layerwise_graph=True)."""
    cfg = GCNConfig()
    robot, humans, _ = _inputs(7)
    model = RGL(cfg)
    params = model.init(jax.random.PRNGKey(3), robot, humans)
    H, A = model.apply(params, robot, humans)

    p = jax.tree.map(np.asarray, params["params"])

    def np_mlp(x, layers, last_relu):
        names = sorted(layers.keys(), key=lambda s: int(s.split("_")[1]))
        for i, name in enumerate(names):
            x = x @ layers[name]["kernel"] + layers[name]["bias"]
            if i < len(names) - 1 or last_relu:
                x = np.maximum(x, 0)
        return x

    r = np_mlp(np.asarray(robot), p["w_r"], True)[:, None, :]
    h = np_mlp(np.asarray(humans), p["w_h"], True)
    X = np.concatenate([r, h], axis=1)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def sim_matrix(Xc):
        scores = np.einsum("bnd,bmd->bnm", Xc @ p["w_a"]["kernel"], Xc)
        return softmax(scores)

    Hn = X
    for i in range(cfg.num_layer):
        An = sim_matrix(Hn)
        W = p[f"gcn_w{i+1}"]["kernel"]
        Hn = np.maximum(np.einsum("bnm,bmd->bnd", An, Hn @ W), 0)
    np.testing.assert_allclose(np.asarray(H), Hn, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(A), An, rtol=2e-4, atol=2e-5)


def test_value_estimator():
    robot, humans, _ = _inputs()
    model = ValueEstimator(GCNConfig())
    params = model.init(jax.random.PRNGKey(4), robot, humans)
    v = model.apply(params, robot, humans)
    assert v.shape == (B,)


def test_state_predictor():
    robot, humans, action = _inputs()
    model = StatePredictor(GCNConfig(), time_step=0.25, kinematics="holonomic")
    params = model.init(jax.random.PRNGKey(5), robot, humans, action)
    nr, nh = model.apply(params, robot, humans, action)
    assert nr.shape == (B, 9)
    assert nh.shape == (B, N, 5)
    # robot kinematics are analytic: position advances by action * dt
    np.testing.assert_allclose(
        np.asarray(nr[:, :2]),
        np.asarray(robot[:, :2] + action * 0.25), rtol=1e-5)


def test_linear_state_predictor():
    robot, humans, action = _inputs()
    nr, nh = linear_state_predictor(robot, humans, action, 0.25, "holonomic")
    np.testing.assert_allclose(
        np.asarray(nh[..., :2]),
        np.asarray(humans[..., :2] + humans[..., 2:4] * 0.25), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nh[..., 4]), np.asarray(humans[..., 4]))


@pytest.mark.parametrize("share,linear", [(False, False), (True, False), (False, True)])
def test_mprl_networks_variants(share, linear):
    from relationalgraphlearning_tpu.configs.base import MPRLConfig
    import dataclasses

    cfg = PolicyConfig(
        mprl=MPRLConfig(share_graph_model=share, linear_state_predictor=linear))
    robot, humans, action = _inputs()
    model = MPRLNetworks(cfg)
    params = model.init(jax.random.PRNGKey(6), robot, humans, action)
    v = model.apply(params, robot, humans, method=MPRLNetworks.value)
    nr, nh = model.apply(params, robot, humans, action,
                         method=MPRLNetworks.next_state)
    assert v.shape == (B,)
    assert nr.shape == (B, 9) and nh.shape == (B, N, 5)
    names = set(params["params"].keys())
    if share:
        assert "pred_graph_model" not in names
    if linear:
        assert "human_motion_predictor" not in names


def test_unicycle_kinematics():
    from relationalgraphlearning_tpu import geometry, types as T

    state = T.full_state(0.0, 0.0, 0.0, 0.0, 0.3, 0.0, 4.0, 1.0, 0.0)
    act = jnp.array([1.0, np.pi / 2])
    ns = geometry.propagate_full_state(state, act, 1.0, T.UNICYCLE)
    np.testing.assert_allclose(np.asarray(ns[T.THETA]), np.pi / 2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ns[T.PX]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ns[T.PY]), 1.0, rtol=1e-6)


def test_point_to_segment_dist():
    from relationalgraphlearning_tpu.geometry import point_to_segment_dist

    p1 = jnp.array([0.0, 0.0])
    p2 = jnp.array([2.0, 0.0])
    q = jnp.array([[1.0, 1.0], [-1.0, 0.0], [3.0, 4.0]])
    d = point_to_segment_dist(p1, p2, q)
    np.testing.assert_allclose(np.asarray(d), [1.0, 1.0, np.sqrt(17.0)], rtol=1e-6)


def test_cadrl_multi_human_min_reduction():
    """Reference parity: CADRL.predict on multi-human states takes the MIN
    pairwise value over humans (torch.min(outputs, 0)) — the Table-I 5-human
    protocol for the single-human-trained net. At N=1 the reduction is the
    identity, so training semantics are unchanged."""
    import numpy as np
    from relationalgraphlearning_tpu.models.baseline_nets import CADRLNet

    net = CADRLNet((32, 1))
    rows5 = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 13))
    params = net.init(jax.random.PRNGKey(1), rows5)
    v5 = net.apply(params, rows5)
    assert v5.shape == (3,)
    # equals the min over per-human single evaluations
    per_human = jnp.stack(
        [net.apply(params, rows5[:, i:i + 1, :]) for i in range(5)], axis=-1)
    np.testing.assert_allclose(
        np.asarray(v5), np.asarray(jnp.min(per_human, -1)), rtol=1e-6)


def test_mprl_canonicalize_invariance():
    """canonicalize=True makes value() exactly invariant and next_state()
    exactly covariant under rigid transforms of the scene (the env is
    isotropic, so this is a pure symmetry reduction)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from relationalgraphlearning_tpu import types as T
    from relationalgraphlearning_tpu.configs.base import (
        MPRLConfig, PolicyConfig)
    from relationalgraphlearning_tpu.models.mprl_networks import MPRLNetworks

    cfg = PolicyConfig(mprl=MPRLConfig(canonicalize=True))
    net = MPRLNetworks(cfg, kinematics=T.UNICYCLE)
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    robot = jax.random.normal(k[0], (9,))
    robot = robot.at[T.VPREF].set(1.0).at[T.RADIUS].set(0.3)
    humans = jax.random.normal(k[1], (5, 5))
    action = jnp.asarray([0.7, 0.2])
    params = net.init(k[2], robot, humans, action)

    phi, tx, ty = 1.1, 3.0, -2.0
    c, s = np.cos(phi), np.sin(phi)

    def rigid_robot(r):
        out = r
        for ix, iy in ((T.PX, T.PY), (T.VX, T.VY), (T.GX, T.GY)):
            x, y = r[..., ix], r[..., iy]
            out = out.at[..., ix].set(c * x - s * y + (tx if ix in (T.PX, T.GX) else 0.0))
            out = out.at[..., iy].set(s * x + c * y + (ty if iy in (T.PY, T.GY) else 0.0))
        return out.at[..., T.THETA].set(r[..., T.THETA] + phi)

    def rigid_humans(h):
        out = h
        x, y = h[..., T.PX], h[..., T.PY]
        out = out.at[..., T.PX].set(c * x - s * y + tx)
        out = out.at[..., T.PY].set(s * x + c * y + ty)
        vx, vy = h[..., T.VX], h[..., T.VY]
        out = out.at[..., T.VX].set(c * vx - s * vy)
        out = out.at[..., T.VY].set(s * vx + c * vy)
        return out

    v1 = net.apply(params, robot, humans, method=net.value)
    v2 = net.apply(params, rigid_robot(robot), rigid_humans(humans),
                   method=net.value)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)

    _, nh1 = net.apply(params, robot, humans, action,
                       method=net.next_state)
    _, nh2 = net.apply(params, rigid_robot(robot), rigid_humans(humans),
                       action, method=net.next_state)
    np.testing.assert_allclose(np.asarray(rigid_humans(nh1)),
                               np.asarray(nh2), atol=1e-4)
