"""Batched multi-mesh solves + device-mesh sharding (config 5)."""

import numpy as np
import jax
import jax.numpy as jnp

import gravomg_tpu as g
from gravomg_tpu.geometry.meshes import icosphere, torus_points
from gravomg_tpu.parallel.batch import (batched_solve, batched_v_cycle,
                                        stack_solvers, stackable)
from gravomg_tpu.parallel.sharding import make_mesh
from jax.sharding import NamedSharding, PartitionSpec as P


def _family(rng, n_meshes=4):
    """Same-family meshes (jittered icospheres) -> same shape buckets."""
    base, _ = icosphere(3)
    hs = []
    cfg = g.MultigridConfig(coarse_threshold=64, degree_multiple=32)
    for i in range(n_meshes):
        pts = base + rng.normal(scale=1e-3, size=base.shape)
        graph = g.knn_graph(jnp.asarray(pts), k=8)
        lap, mass = g.graph_laplacian(graph, "invdist")
        spd = lap._replace(diag=lap.diag + 0.5 * mass)
        hs.append(g.build_hierarchy(graph, spd, cfg).solver)
    return hs, cfg


def test_stack_and_batched_solve(rng):
    hs, cfg = _family(rng)
    if not stackable(hs):
        # Bucketing can differ slightly across jittered meshes; force a
        # same-bucket subset.
        shapes = [jax.tree_util.tree_map(lambda x: x.shape, h) for h in hs]
        keep = [h for h, s in zip(hs, shapes) if s == shapes[0]]
        assert len(keep) >= 2
        hs = keep
    hb = stack_solvers(hs)
    b0 = hs[0].levels[0].op.num_vertices
    bs = jnp.asarray(rng.normal(size=(len(hs), b0)))
    xs, rels, it = batched_solve(hb, bs, cfg)
    assert float(jnp.max(rels)) < cfg.tolerance
    # Each batch entry must match its standalone solve.
    x0, rel0, _ = g.solve(hs[0], bs[0], cfg)
    r = float(jnp.linalg.norm(g.spmv(hs[0].levels[0].op, xs[0]) - bs[0])
              / jnp.linalg.norm(bs[0]))
    assert r < 10 * cfg.tolerance


def test_batched_vcycle_sharded_over_devices(rng):
    hs, cfg = _family(rng, n_meshes=2)
    hs = hs[:1] * 8  # 8 copies -> shard over 8 virtual devices
    hb = stack_solvers(hs)
    mesh = make_mesh(8)
    v0 = hs[0].levels[0].op.num_vertices
    bs = jnp.asarray(rng.normal(size=(8, v0)))
    sharding = NamedSharding(mesh, P("data"))
    bs = jax.device_put(bs, sharding)
    hb = jax.device_put(hb, NamedSharding(mesh, P("data")))
    xs = batched_v_cycle(hb, jnp.zeros_like(bs), bs, cfg)
    assert xs.shape == bs.shape
    # One cycle reduces the residual.
    r0 = jnp.linalg.norm(bs, axis=1)
    r1 = jnp.linalg.norm(
        bs - jax.vmap(g.spmv)(hb.levels[0].op, xs), axis=1)
    assert float(jnp.max(r1 / r0)) < 0.5


def test_attach_collection_stackable_and_exact(rng):
    """Shared-geometry fast forms across a collection: shapes agree
    (stackable), and the batched fast-form V-cycle matches each mesh's
    plain ELL cycle to f32 roundoff."""
    from gravomg_tpu.parallel.batch import attach_collection

    hs, cfg = _family(rng, n_meshes=3)
    shapes = [jax.tree_util.tree_map(lambda x: x.shape, h) for h in hs]
    hs = [h for h, s in zip(hs, shapes) if s == shapes[0]]
    assert len(hs) >= 2
    fast = attach_collection(hs, block=64)
    assert stackable(fast)
    for h in fast:
        assert h.levels[0].banded is not None
        assert h.levels[0].uw is not None and h.levels[0].utw is not None
    hb = stack_solvers(fast)
    v0 = hs[0].levels[0].op.num_vertices
    bs = jnp.asarray(rng.normal(size=(len(hs), v0)))
    xs = batched_v_cycle(hb, jnp.zeros_like(bs), bs, cfg)
    for i, h in enumerate(hs):
        ref = g.v_cycle(h, jnp.zeros_like(bs[i]), bs[i], cfg)
        err = float(jnp.max(jnp.abs(xs[i] - ref))
                    / (1e-30 + float(jnp.max(jnp.abs(ref)))))
        assert err < 5e-5, f"mesh {i}: batched fast cycle diverges {err}"
