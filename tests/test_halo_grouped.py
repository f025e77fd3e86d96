"""Component-grouped halo exchange (DESIGN.md §5 alternative (c), round 3):
the two KGs of the block-diagonal merged graph get disjoint halves of the
'graph' axis and the boundary all_to_all runs within each half only —
shipping (S/2, B) instead of (S, B) padded rows per shard per layer pass."""

import numpy as np
import pytest

from tpugraph.sparse.build import coo_from_triples, coo_normalize, coo_to_dense
from tpugraph.sparse.partition import partition_edges


def _two_component_graph(n1=64, n2=80, t=300, seed=0):
    """Block-diagonal graph: component A rows [0, n1), component B rows
    [n1, n1+n2) — no cross edges (the merged-KG shape)."""
    rng = np.random.default_rng(seed)
    tris = []
    for base, nn in ((0, n1), (n1, n2)):
        h = base + rng.integers(0, nn, t)
        tt = base + rng.integers(0, nn, t)
        keep = h != tt
        tris.append(np.stack([h[keep], rng.integers(0, 5, keep.sum()), tt[keep]], 1))
    tri = np.concatenate(tris, 0)
    n = n1 + n2
    src, dst, w = coo_from_triples(n, tri, weighting="uniform")
    w = coo_normalize(src, dst, w, n, "sym")
    return n, src, dst, w


def _aligned_remap(src, dst, n1, n2, g_half):
    n_loc = -(-max(n1, n2) // g_half)
    r0 = g_half * n_loc

    def row_of(ids):
        return np.where(ids < n1, ids, ids - n1 + r0).astype(ids.dtype)

    return row_of(src), row_of(dst), r0, n_loc


@pytest.mark.parametrize("n_shards", [4, 8])
@pytest.mark.parametrize("impl", ["sorted", "ell"])
def test_grouped_halo_spmm_matches_dense(n_shards, impl):
    """Grouped halo SpMM (axis_index_groups a2a, group-local recv buffer)
    ≡ the dense operator, fwd and grad, for both aggregation impls."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpugraph.dist.halo import halo_spmm, halo_spmm_ell
    from tpugraph.sparse.halo_ell import build_halo_ell, squeeze_shard

    n1, n2 = 60, 84
    n, src, dst, w = _two_component_graph(n1, n2)
    src_r, dst_r, r0, _ = _aligned_remap(src, dst, n1, n2, n_shards // 2)
    n_rows_pad = 2 * r0
    hg = partition_edges(src_r, dst_r, w, n_rows_pad, n_shards, n_groups=2)
    assert hg.n_groups == 2 and hg.send_idx.shape[1] == n_shards // 2
    n_pad = hg.n_loc * n_shards
    halo = build_halo_ell(hg) if impl == "ell" else hg

    mesh = Mesh(np.asarray(jax.devices()[:n_shards]).reshape(n_shards, 1),
                ("graph", "feature"))
    rng = np.random.default_rng(1)
    x = np.zeros((n_pad, 8), np.float32)
    xr = rng.standard_normal((n, 8)).astype(np.float32)
    x[:n1] = xr[:n1]
    x[r0:r0 + n2] = xr[n1:]

    @partial(shard_map, mesh=mesh, in_specs=(P("graph", None), P("graph")),
             out_specs=P("graph", None))
    def apply(x_local, hs):
        g = hs.group_size
        if impl == "ell":
            hsq = squeeze_shard(hs)
            return halo_spmm_ell(
                x_local, hsq.loc, hsq.bnd,
                hsq.send_idx.reshape(g, hs.halo_b),
                hsq.send_mask.reshape(g, hs.halo_b),
                axis_index_groups=hs.axis_groups)
        return halo_spmm(
            x_local,
            hs.loc_src.reshape(-1), hs.loc_dst.reshape(-1), hs.loc_w.reshape(-1),
            hs.bnd_src.reshape(-1), hs.bnd_dst.reshape(-1), hs.bnd_w.reshape(-1),
            hs.send_idx.reshape(g, hs.halo_b),
            hs.send_mask.reshape(g, hs.halo_b),
            axis_index_groups=hs.axis_groups)

    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("graph", None)))
    hgd = jax.device_put(halo, NamedSharding(mesh, P("graph")))
    with mesh:
        got = np.asarray(apply(xg, hgd))
        grad = np.asarray(jax.grad(
            lambda xx: jnp.sum(apply(xx, hgd) ** 2))(xg))

    a = coo_to_dense(src, dst, w, n, n)
    want = a @ xr
    got_c = np.concatenate([got[:n1], got[r0:r0 + n2]], 0)
    np.testing.assert_allclose(got_c, want, rtol=1e-5, atol=1e-5)

    # grad vs dense: d/dx sum((Ax)^2) = 2 A^T A x
    want_g = 2.0 * a.T @ (a @ xr)
    grad_c = np.concatenate([grad[:n1], grad[r0:r0 + n2]], 0)
    np.testing.assert_allclose(grad_c, want_g, rtol=1e-4, atol=1e-4)
    # padding rows get zero gradient
    np.testing.assert_allclose(grad[n1:r0], 0.0, atol=1e-7)
    np.testing.assert_allclose(grad[r0 + n2:], 0.0, atol=1e-7)


def test_grouped_partition_rejects_cross_group_edges():
    n, src, dst, w = _two_component_graph(64, 64)
    # add one cross-component edge; WITHOUT remap the 64/64 split already
    # aligns on a 4-shard partition, so the cross edge is the only violation
    src = np.concatenate([src, [3]])
    dst = np.concatenate([dst, [100]])
    w = np.concatenate([w, [0.5]])
    with pytest.raises(ValueError, match="crosses shard groups"):
        partition_edges(src, dst, w, n, 4, n_groups=2)


def test_grouped_exchange_is_smaller():
    """The point of the feature: grouped send buffers ship ~half the padded
    rows of the full-mesh exchange on the block-diagonal graph."""
    n1 = n2 = 96
    n, src, dst, w = _two_component_graph(n1, n2, t=500)
    S = 8
    hg_full = partition_edges(src, dst, w, n, S, pad_halo_to=8)
    src_r, dst_r, r0, _ = _aligned_remap(src, dst, n1, n2, S // 2)
    hg_grp = partition_edges(src_r, dst_r, w, 2 * r0, S, n_groups=2, pad_halo_to=8)
    rows_full = hg_full.send_idx.shape[1] * hg_full.halo_b  # per shard
    rows_grp = hg_grp.send_idx.shape[1] * hg_grp.halo_b
    assert rows_grp <= rows_full // 2 + hg_grp.halo_b


@pytest.mark.parametrize("impl", ["ell", "sorted"])
def test_fit_distributed_halo_grouped_matches(impl):
    """halo_grouped=True reproduces the ungrouped run exactly on an
    evenly-divisible task (the row remap is the identity there, so the only
    difference is the exchange structure), for both spmm impls — including
    boot + hard mining + eval, the paths that consume remapped ids."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=25, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=4, neg_every=4,
              neg_mode="hard", syn_n_ent=120, boot_cap=16, boot_start=4,
              boot_weight=0.5, n_shards=4, spmm_impl=impl)
    rg = fit_distributed(get_config("base", halo_grouped=True, **kw), task=task)
    ru = fit_distributed(get_config("base", **kw), task=task)
    assert rg.history[-1]["loss"] == pytest.approx(ru.history[-1]["loss"], rel=1e-4)
    np.testing.assert_allclose(np.asarray(rg.params["emb"]),
                               np.asarray(ru.params["emb"]), rtol=1e-4, atol=1e-6)
    assert rg.metrics["hits@1"] == pytest.approx(ru.metrics["hits@1"], abs=1e-6)


def test_fit_distributed_halo_grouped_uneven_rows():
    """Non-identity row remap (n1 not divisible by S/2): training runs, the
    loss is finite, and metrics land near the ungrouped run (init vectors
    per entity differ under the remap, so exact equality is not expected)."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    # 111 ents/side: odd, so n1 % (S/2) != 0 and the remap genuinely shifts
    # KG2 rows (110 would be an identity remap at S=4)
    task = synthetic_align_task(seed=27, n_ent=111, n_rel=5, n_triples=450)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=4, neg_every=4,
              neg_mode="uniform", syn_n_ent=111, n_shards=4)
    rg = fit_distributed(get_config("base", halo_grouped=True, **kw), task=task)
    ru = fit_distributed(get_config("base", **kw), task=task)
    assert np.isfinite(rg.metrics["final_loss"])
    assert rg.metrics["final_loss"] == pytest.approx(ru.metrics["final_loss"], rel=0.1)
    assert rg.metrics["hits@1"] == pytest.approx(ru.metrics["hits@1"], abs=0.15)


def test_fit_distributed_halo_grouped_mtl_channels():
    """Grouped mode with the full MTL surface (rel head + attr head + AE
    channel + sinkhorn): all remapped id consumers line up — equal to the
    ungrouped run on an identity-remap task."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=29, n_ent=120, n_rel=5, n_triples=500,
                                n_attr=16)
    kw = dict(dim=16, epochs=6, eval_every=6, k_neg=4, neg_every=3,
              neg_mode="uniform", syn_n_ent=120, n_shards=4,
              use_rel_head=True, use_attr_head=True, use_attr_channel=True,
              use_sinkhorn=True, sinkhorn_weight=0.5, attr_beta=0.8)
    rg = fit_distributed(get_config("base", halo_grouped=True, **kw), task=task)
    ru = fit_distributed(get_config("base", **kw), task=task)
    assert rg.history[-1]["loss"] == pytest.approx(ru.history[-1]["loss"], rel=1e-4)
    np.testing.assert_allclose(np.asarray(rg.params["emb"]),
                               np.asarray(ru.params["emb"]), rtol=1e-4, atol=1e-6)


def test_fit_distributed_halo_grouped_rel_head_respects_remap():
    """Review r3 item 1 regression: rel-head negative corruptions are drawn
    in entity-id space and mapped to rows — under a NON-identity remap they
    must never hit the KG1 padding rows [n1, r0).  Padding rows receive no
    gradient from any loss, so they must sit at their init values no matter
    how long training runs: two runs of different lengths must agree on
    them exactly (drift there ⇒ something sampled a padding row)."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=31, n_ent=111, n_rel=5, n_triples=450)
    n1 = task.kg1.n_ent  # 111 ents/side (odd); S=4 -> g_half=2, n_loc=56, r0=112
    g_half = 2
    n_loc = -(-max(n1, task.n_ent - n1) // g_half)
    r0 = g_half * n_loc
    assert r0 > n1, "test needs a non-identity remap (padding rows exist)"
    kw = dict(dim=16, epochs=2, eval_every=0, k_neg=4, neg_every=2,
              neg_mode="uniform", syn_n_ent=111, n_shards=4,
              halo_grouped=True, use_rel_head=True, rel_k_neg=4)
    r_a = fit_distributed(get_config("base", **kw), task=task)
    kw["epochs"] = 6
    r_b = fit_distributed(get_config("base", **kw), task=task)
    pad_a = np.asarray(r_a.params["emb"])[n1:r0]
    pad_b = np.asarray(r_b.params["emb"])[n1:r0]
    np.testing.assert_array_equal(pad_a, pad_b)
    # and training itself moved (the real rows differ between the runs)
    assert not np.allclose(np.asarray(r_a.params["emb"])[:n1],
                           np.asarray(r_b.params["emb"])[:n1])


def test_halo_grouped_rejects_odd_shards():
    from tpugraph.configs import get_config
    from tpugraph.dist.trainer import fit_distributed

    cfg = get_config("base", n_shards=3, halo_grouped=True, syn_n_ent=64,
                     syn_n_triples=200)
    with pytest.raises(ValueError, match="even n_shards"):
        fit_distributed(cfg)


def test_halo_grouped_checkpoint_layout_enforced(tmp_path):
    """ADVICE r3 item 1: with equal-sized KGs the grouped and ungrouped row
    layouts have IDENTICAL padded shapes (here both (256, d)), so Orbax's
    shape check cannot catch a restore across the flag — the layout stamp
    must.  A matching-layout resume keeps working."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=37, n_ent=128, n_rel=5, n_triples=500)
    ckdir = str(tmp_path / "ck")
    kw = dict(dim=16, epochs=4, eval_every=0, k_neg=4, neg_every=2,
              neg_mode="uniform", syn_n_ent=128, n_shards=4,
              checkpoint_dir=ckdir, checkpoint_every=2)
    fit_distributed(get_config("base", halo_grouped=True, **kw), task=task)
    # cross-layout restore: same padded shape, permuted KG2 rows -> raise
    with pytest.raises(ValueError, match="row layout"):
        fit_distributed(get_config("base", halo_grouped=False,
                                   **{**kw, "epochs": 6}), task=task)
    # same-layout restore-continue still works
    r = fit_distributed(get_config("base", halo_grouped=True,
                                   **{**kw, "epochs": 6}), task=task)
    assert np.isfinite(r.metrics["final_loss"])


def test_fit_distributed_halo_grouped_attr_channel_csls_eval():
    """Round-4 cross-term: component-grouped exchange × the GCN-Align AE
    channel × CSLS ring eval.  The AE incidence rows and attr-head batches
    are remapped through row_of; the CSLS eval runs on the grouped row
    space; grouped ≡ ungrouped on an evenly-divisible task (identity
    remap)."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=47, n_ent=128, n_rel=5, n_triples=500,
                                n_attr=16)
    kw = dict(dim=16, epochs=6, eval_every=3, k_neg=4, neg_every=3,
              neg_mode="uniform", syn_n_ent=128, n_shards=4,
              use_attr_channel=True, attr_beta=0.8, eval_csls_k=5)
    rg = fit_distributed(get_config("base", halo_grouped=True, **kw), task=task)
    ru = fit_distributed(get_config("base", **kw), task=task)
    assert rg.history[-1]["loss_margin"] == pytest.approx(
        ru.history[-1]["loss_margin"], rel=1e-3)
    assert rg.history[-1]["loss_ae"] == pytest.approx(
        ru.history[-1]["loss_ae"], rel=1e-3)
    assert rg.metrics["hits@1"] == pytest.approx(ru.metrics["hits@1"], abs=1e-6)
    assert rg.metrics["mrr"] == pytest.approx(ru.metrics["mrr"], abs=1e-6)


def test_legacy_checkpoint_without_layout_stamp_raises(tmp_path):
    """A pre-round-4 checkpoint (no 'layout' key) must fail with the
    actionable version-boundary error, not an opaque Orbax structure
    mismatch (round-4b review finding)."""
    import os

    import orbax.checkpoint as ocp

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=39, n_ent=128, n_rel=5, n_triples=500)
    ckdir = str(tmp_path / "ck")
    kw = dict(dim=16, epochs=2, eval_every=0, k_neg=4, neg_every=2,
              neg_mode="uniform", syn_n_ent=128, n_shards=4,
              checkpoint_dir=ckdir, checkpoint_every=1)
    fit_distributed(get_config("base", **kw), task=task)
    # strip the layout stamp to simulate the pre-round-4 on-disk format
    mgr = ocp.CheckpointManager(
        os.path.abspath(ckdir),
        options=ocp.CheckpointManagerOptions(max_to_keep=3))
    step = mgr.latest_step()
    state = mgr.restore(step)
    assert "layout" in state
    del state["layout"]
    mgr.save(step + 1, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    with pytest.raises(ValueError, match="pre-round-4"):
        fit_distributed(get_config("base", **{**kw, "epochs": 4}), task=task)
