"""Distributed path tests on the virtual 8-device CPU mesh (SURVEY.md §4.2):
partitioner invariants, halo-SpMM ≡ dense oracle, and the N-shard trainer
matching the single-device trainer step-for-step."""

import numpy as np
import pytest

from tpugraph.sparse.build import coo_from_triples, coo_normalize, coo_to_dense
from tpugraph.sparse.partition import partition_edges


def _graph(n=96, t=400, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.integers(0, n, t)
    tt = rng.integers(0, n, t)
    keep = h != tt
    tri = np.stack([h[keep], rng.integers(0, 5, keep.sum()), tt[keep]], axis=1)
    src, dst, w = coo_from_triples(n, tri, weighting="uniform")
    w = coo_normalize(src, dst, w, n, "sym")
    return n, src, dst, w


def test_partition_conserves_edges():
    n, src, dst, w = _graph()
    for s in (2, 4, 8):
        hg = partition_edges(src, dst, w, n, s)
        total_w = float(np.asarray(hg.loc_w).sum() + np.asarray(hg.bnd_w).sum())
        assert total_w == pytest.approx(float(w.sum()), rel=1e-6)
        assert hg.nnz == len(src)
        # per-shard dst are sorted (pad rows n_loc at the end)
        for arr in (np.asarray(hg.loc_dst), np.asarray(hg.bnd_dst)):
            assert (np.diff(arr, axis=1) >= 0).all()


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_halo_spmm_matches_dense(n_shards):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import PartitionSpec as P

    from tpugraph.dist.halo import halo_spmm
    from tpugraph.dist.mesh import make_mesh
    from tpugraph.sparse.partition import HaloGraph

    n, src, dst, w = _graph()
    hg = partition_edges(src, dst, w, n, n_shards)
    n_pad = hg.n_loc * n_shards
    mesh = make_mesh(n_shards, 1)
    rng = np.random.default_rng(1)
    d = 8
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d)).astype(np.float32)

    from jax import shard_map

    g = P("graph")
    spec_tree = HaloGraph(
        loc_src=g, loc_dst=g, loc_w=g, bnd_src=g, bnd_dst=g, bnd_w=g,
        send_idx=g, send_mask=g, n_shards=hg.n_shards, n_loc=hg.n_loc,
        halo_b=hg.halo_b, nnz=hg.nnz, n_rows=hg.n_rows,
    )

    @partial(shard_map, mesh=mesh, in_specs=(P("graph", None), spec_tree),
             out_specs=P("graph", None))
    def run(x_local, hgs):
        return halo_spmm(
            x_local,
            hgs.loc_src.reshape(-1), hgs.loc_dst.reshape(-1), hgs.loc_w.reshape(-1),
            hgs.bnd_src.reshape(-1), hgs.bnd_dst.reshape(-1), hgs.bnd_w.reshape(-1),
            hgs.send_idx.reshape(hgs.n_shards, hgs.halo_b),
            hgs.send_mask.reshape(hgs.n_shards, hgs.halo_b),
        )

    with mesh:
        out = np.asarray(jax.jit(run)(jnp.asarray(x), hg))
    a = coo_to_dense(src, dst, w, n, n)
    want = a @ x[:n]
    np.testing.assert_allclose(out[:n], want, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(out[n:], 0.0, atol=1e-6)


def test_halo_spmm_grad_matches_dense():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tpugraph.dist.halo import halo_spmm
    from tpugraph.dist.mesh import make_mesh
    from tpugraph.sparse.partition import HaloGraph

    n, src, dst, w = _graph(n=64, t=250, seed=2)
    n_shards = 4
    hg = partition_edges(src, dst, w, n, n_shards)
    n_pad = hg.n_loc * n_shards
    mesh = make_mesh(n_shards, 1)
    rng = np.random.default_rng(3)
    d = 4
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d)).astype(np.float32)
    g = P("graph")
    spec_tree = HaloGraph(
        loc_src=g, loc_dst=g, loc_w=g, bnd_src=g, bnd_dst=g, bnd_w=g,
        send_idx=g, send_mask=g, n_shards=hg.n_shards, n_loc=hg.n_loc,
        halo_b=hg.halo_b, nnz=hg.nnz, n_rows=hg.n_rows,
    )

    @partial(shard_map, mesh=mesh, in_specs=(P("graph", None), spec_tree),
             out_specs=P("graph", None))
    def run(x_local, hgs):
        return halo_spmm(
            x_local,
            hgs.loc_src.reshape(-1), hgs.loc_dst.reshape(-1), hgs.loc_w.reshape(-1),
            hgs.bnd_src.reshape(-1), hgs.bnd_dst.reshape(-1), hgs.bnd_w.reshape(-1),
            hgs.send_idx.reshape(hgs.n_shards, hgs.halo_b),
            hgs.send_mask.reshape(hgs.n_shards, hgs.halo_b),
        )

    with mesh:
        grad = jax.jit(jax.grad(lambda x: jnp.sum(run(x, hg) ** 2)))(jnp.asarray(x))
    a = coo_to_dense(src, dst, w, n, n)
    want = 2 * a.T @ (a @ x[:n])
    np.testing.assert_allclose(np.asarray(grad)[:n], want, rtol=2e-4, atol=1e-4)


def test_fit_distributed_matches_single_device():
    """N=8 sharded trainer ≡ single-device trainer (same seeds, uniform negs)."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=4, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=12, eval_every=6, k_neg=6, neg_every=4,
              neg_mode="uniform", pad_bucket=256, syn_n_ent=120)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r8 = fit_distributed(get_config("base", n_shards=8, **kw), task=task)
    # identical math up to collective reduction order
    assert r1.history[-1]["loss"] == pytest.approx(r8.history[-1]["loss"], rel=1e-4)
    assert r1.metrics["hits@1"] == pytest.approx(r8.metrics["hits@1"], abs=1e-6)
    assert r1.metrics["hits@10"] == pytest.approx(r8.metrics["hits@10"], abs=1e-6)


def test_fit_distributed_mtl_heads():
    """Distributed MTL: sinkhorn/rel/attr head losses over the sharded
    encoder; N=8 matches N=1 step-for-step."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=7, n_ent=120, n_rel=5, n_triples=500, n_attr=16)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=6, neg_every=4,
              neg_mode="uniform", syn_n_ent=120, use_sinkhorn=True,
              use_rel_head=True, use_attr_head=True, sinkhorn_iters=5, rel_k_neg=3)
    r1 = fit_distributed(get_config("mtl", n_shards=1, **kw), task=task)
    r8 = fit_distributed(get_config("mtl", n_shards=8, **kw), task=task)
    h1, h8 = r1.history[-1], r8.history[-1]
    for k in ("loss_margin", "loss_sinkhorn", "loss_rel", "loss_attr"):
        assert np.isfinite(h1[k]) and np.isfinite(h8[k]), k
        assert h1[k] == pytest.approx(h8[k], rel=1e-3), k
    assert r1.metrics["hits@1"] == pytest.approx(r8.metrics["hits@1"], abs=1e-6)


def test_fit_distributed_hard_negatives_ring():
    """Hard mining in the sharded trainer (ring k-NN) trains and matches the
    single-shard hard run's metrics (same mining semantics: L1 k-NN)."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=9, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=12, eval_every=6, k_neg=4, neg_every=4,
              neg_mode="hard", syn_n_ent=120)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r8 = fit_distributed(get_config("base", n_shards=8, **kw), task=task)
    assert r1.history[-1]["loss"] == pytest.approx(r8.history[-1]["loss"], rel=1e-3)
    assert r1.metrics["hits@1"] == pytest.approx(r8.metrics["hits@1"], abs=1e-6)


def test_dist_interval_fusion_matches():
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=10, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=16, eval_every=8, k_neg=4, neg_every=4,
              neg_mode="hard", syn_n_ent=120, n_shards=4)
    r1 = fit_distributed(get_config("base", steps_per_call=1, **kw), task=task)
    r4 = fit_distributed(get_config("base", steps_per_call=4, **kw), task=task)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r4.params["emb"]), rtol=1e-5, atol=1e-6)
    assert r1.metrics["hits@1"] == pytest.approx(r4.metrics["hits@1"], abs=1e-6)


def test_fit_distributed_highway_weighted_variant():
    """config[1] shape distributed: funifun weights + rw norm + highway."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=11, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=10, eval_every=5, k_neg=4, neg_every=5,
              neg_mode="uniform", syn_n_ent=120, weighting="funifun",
              norm="rw", highway=True)
    r1 = fit_distributed(get_config("highway", n_shards=1, **kw), task=task)
    r8 = fit_distributed(get_config("highway", n_shards=8, **kw), task=task)
    assert r1.history[-1]["loss"] == pytest.approx(r8.history[-1]["loss"], rel=1e-4)
    assert np.isfinite(r8.metrics["hits@1"])


def test_fit_distributed_attr_channel():
    """GCN-Align AE channel in the sharded trainer: edge-partitioned attribute
    incidence + β-combined SE‖AE eval; N=8 ≡ N=1."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=13, n_ent=120, n_rel=5, n_triples=500, n_attr=16)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=6, neg_every=4,
              neg_mode="uniform", syn_n_ent=120, use_attr_channel=True,
              attr_beta=0.8)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r8 = fit_distributed(get_config("base", n_shards=8, **kw), task=task)
    h1, h8 = r1.history[-1], r8.history[-1]
    for k in ("loss_margin", "loss_ae"):
        assert np.isfinite(h1[k]) and np.isfinite(h8[k]), k
        assert h1[k] == pytest.approx(h8[k], rel=1e-3), k
    # params are the strong invariant (hits can flip a rank on fp noise at
    # this tiny scale: 28 test pairs, combined-channel distances)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r8.params["emb"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.params["attr_emb"]),
                               np.asarray(r8.params["attr_emb"]), rtol=1e-4, atol=1e-6)
    assert r1.metrics["hits@1"] == pytest.approx(r8.metrics["hits@1"], abs=0.05)


def test_dist_attr_incidence_matches_single_device():
    """Stacked incidence ELL == the single-device attr operator's SpMM."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from tpugraph.dist.mesh import make_mesh
    from tpugraph.kernels.spmm_ell import spmm_ell
    from tpugraph.models.attr_channel import build_attr_operator
    from tpugraph.sparse.halo_ell import build_attr_incidence_ell, squeeze_shard

    rng = np.random.default_rng(2)
    n_ent, n_attr, n_shards = 96, 20, 4
    attr_triples = np.stack(
        [rng.integers(0, n_ent, 400), rng.integers(0, n_attr, 400)], 1)
    n_loc = (n_ent + n_shards - 1) // n_shards
    inc = build_attr_incidence_ell(attr_triples, n_ent, n_attr, n_shards, n_loc)
    mesh = make_mesh(n_shards, 1)
    from jax.sharding import NamedSharding

    inc = jax.device_put(inc, NamedSharding(mesh, P("graph")))
    attr_emb = rng.standard_normal((n_attr, 8)).astype(np.float32)

    @partial(shard_map, mesh=mesh, in_specs=(P("graph"), P()),
             out_specs=P("graph", None))
    def apply(op, x):
        return spmm_ell(squeeze_shard(op), x)

    got = np.asarray(apply(inc, jnp.asarray(attr_emb)))[:n_ent]
    ref_op = build_attr_operator(attr_triples, n_ent, n_attr, fmt="ell")
    want = np.asarray(spmm_ell(ref_op, jnp.asarray(attr_emb)))[:n_ent]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fit_distributed_rejects_unsupported():
    from tpugraph.configs import get_config
    from tpugraph.dist.trainer import fit_distributed

    # feature TP requires divisible widths — knob must not silently degrade
    cfg = get_config("base", n_shards=2, feature_shards=3, dim=16,
                     syn_n_ent=64, syn_n_triples=200)
    with pytest.raises(ValueError, match="must divide"):
        fit_distributed(cfg)


def test_fit_distributed_rejects_uncapped_ring_ot():
    """VERDICT r4 weak #2 / Next #3: at n_shards > 1 with sinkhorn_pairs=0
    (the recipe default) a DWY100K-seed run silently entered the ring loss's
    ~3·S² per-iteration recompute (measured 8.1e13 flops/interval —
    BASELINE.md 'Distributed OT').  The same reject-don't-ignore guard as
    the single-shard path must fire, with the sinkhorn_pairs remedy; a
    capped config and an eval-only (epochs=0) run must pass the guard."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    # 10.5k seed pairs — DWY100K-scale seed count, tiny build cost
    task = synthetic_align_task(seed=3, n_ent=30000, n_rel=20,
                                n_triples=60000, train_ratio=0.7)
    assert len(task.train_pairs) > 8192
    cfg = get_config("base", n_shards=8, dim=16, use_sinkhorn=True,
                     sinkhorn_iters=4, epochs=2, eval_every=0,
                     train_ratio=0.7)
    with pytest.raises(ValueError, match="sinkhorn_pairs"):
        fit_distributed(cfg, task=task)
    # the guard reads the EFFECTIVE size: a cap larger than 8192 still dies
    with pytest.raises(ValueError, match="sinkhorn_pairs"):
        fit_distributed(cfg.replace(sinkhorn_pairs=9000), task=task)
    # capped run passes the guard (trains for real — small epochs)
    r = fit_distributed(cfg.replace(sinkhorn_pairs=64, k_neg=4, neg_every=2,
                                    neg_mode="uniform"), task=task)
    assert r.metrics["final_loss"] == r.metrics["final_loss"]  # not NaN
    # eval-only never compiles the OT loss: uncapped is fine at epochs=0
    r0 = fit_distributed(cfg.replace(epochs=0), task=task)
    assert r0.history == []


def test_fit_distributed_ot_subsample_matches():
    """sinkhorn_pairs in the distributed trainer (VERDICT r3 missing #2 —
    previously rejected, leaving the ring OT quadratic-compute-uncapped at
    exactly the DWY100K scale config[4] targets): a key-deterministic
    per-interval seed subsample feeds the ring Sinkhorn loss; N=8 ≡ N=1."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=43, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=6, neg_every=4,
              neg_mode="uniform", syn_n_ent=120, use_sinkhorn=True,
              sinkhorn_iters=5, sinkhorn_pairs=16)
    r1 = fit_distributed(get_config("sinkhorn", n_shards=1, **kw), task=task)
    r8 = fit_distributed(get_config("sinkhorn", n_shards=8, **kw), task=task)
    h1, h8 = r1.history[-1], r8.history[-1]
    assert np.isfinite(h1["loss_sinkhorn"]) and np.isfinite(h8["loss_sinkhorn"])
    assert h1["loss_sinkhorn"] == pytest.approx(h8["loss_sinkhorn"], rel=1e-3)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r8.params["emb"]), rtol=1e-4, atol=1e-6)
    # the cap is real: an uncapped run must differ from the capped one
    r_full = fit_distributed(get_config("sinkhorn", n_shards=8,
                                        **{**kw, "sinkhorn_pairs": 0}), task=task)
    assert abs(r_full.history[-1]["loss_sinkhorn"] - h8["loss_sinkhorn"]) > 1e-6


def test_fit_distributed_slice_dp_matches():
    """3-D DCN-aware mesh ('slice','graph','feature'): slicing the loss batch
    across the 'slice' axis is data-parallel gradient accumulation with
    GLOBAL means — identical math to the unsliced run."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=15, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=6, neg_every=4,
              neg_mode="uniform", syn_n_ent=120, n_shards=2)
    r0 = fit_distributed(get_config("base", slice_shards=1, **kw), task=task)
    r2 = fit_distributed(get_config("base", slice_shards=2, **kw), task=task)
    np.testing.assert_allclose(np.asarray(r0.params["emb"]),
                               np.asarray(r2.params["emb"]), rtol=1e-4, atol=1e-6)
    assert r0.history[-1]["loss"] == pytest.approx(r2.history[-1]["loss"], rel=1e-4)


def test_fit_distributed_bootstrap_matches():
    """Bootstrapped mutual-NN pair augmentation in the sharded trainer:
    N=8 ≡ N=1 (params allclose), proposals actually fire."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=17, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=12, eval_every=6, k_neg=6, neg_every=4,
              neg_mode="uniform", syn_n_ent=120, boot_cap=16, boot_start=4,
              boot_weight=0.5)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r8 = fit_distributed(get_config("base", n_shards=8, **kw), task=task)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r8.params["emb"]), rtol=1e-4, atol=1e-6)
    assert r1.history[-1]["loss"] == pytest.approx(r8.history[-1]["loss"], rel=1e-3)


def test_fit_distributed_boot_hard_mining_matches():
    """Boot + hard mining (the full accuracy recipe) in the sharded trainer:
    N=4 ≡ N=1 within the dist engine.  (Cross-engine loss equality with
    train.loop.fit is NOT expected — the engines use different negative-key
    schedules by design.)"""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=18, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=4, neg_every=4,
              neg_mode="hard", syn_n_ent=120, boot_cap=16, boot_start=4,
              boot_weight=0.5, pad_bucket=256)
    rd = fit_distributed(get_config("base", n_shards=4, **kw), task=task)
    rs = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    assert rd.history[-1]["loss"] == pytest.approx(rs.history[-1]["loss"], rel=1e-3)
    assert rd.metrics["hits@1"] == pytest.approx(rs.metrics["hits@1"], abs=0.05)


def test_fit_distributed_bf16_matches():
    """bf16 activations in the sharded encoder (fp32 params/accumulators,
    bf16 halo exchange): N=8 tracks N=1, and bf16 tracks fp32 loosely."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=19, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=6, neg_every=4,
              neg_mode="uniform", syn_n_ent=120)
    rb1 = fit_distributed(get_config("base", n_shards=1,
                                     param_dtype="bfloat16", **kw), task=task)
    rb8 = fit_distributed(get_config("base", n_shards=8,
                                     param_dtype="bfloat16", **kw), task=task)
    rf1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    assert rb1.history[-1]["loss"] == pytest.approx(rb8.history[-1]["loss"], rel=0.02)
    assert rb1.history[-1]["loss"] == pytest.approx(rf1.history[-1]["loss"], rel=0.05)
    assert np.isfinite(rb8.metrics["hits@1"])
    # params stay fp32 under the mixed-precision recipe
    assert np.asarray(rb8.params["emb"]).dtype == np.float32


def test_fit_distributed_feature_tp_matches():
    """Tensor parallelism over 'feature' (column-parallel GEMMs, all_gather'd
    layer inputs): a (graph=4, feature=2) mesh reproduces N=1 — the knob is
    real, not cosmetic (highway variant included: gates shard columns too)."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=11, n_ent=240, n_rel=6, n_triples=800)
    kw = dict(dim=16, epochs=6, eval_every=6, k_neg=5, neg_every=3,
              neg_mode="uniform", syn_n_ent=240, highway=True)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r42 = fit_distributed(get_config("base", n_shards=4, feature_shards=2,
                                     **kw), task=task)
    assert r1.history[-1]["loss"] == pytest.approx(r42.history[-1]["loss"], rel=1e-3)
    # embeddings are the strong invariant (ranks can flip on fp reduction
    # order under TP at this near-random tiny scale)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r42.params["emb"]),
                               rtol=2e-3, atol=2e-4)
    for gc in ("gc1", "gc2", "hw1"):
        np.testing.assert_allclose(np.asarray(r1.params[gc]["w"]),
                                   np.asarray(r42.params[gc]["w"]),
                                   rtol=2e-3, atol=2e-4)


def test_fit_distributed_attr_channel_feature_tp():
    """AE channel under feature TP: attr table + AE GEMMs column-sharded."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=13, n_ent=120, n_rel=5, n_triples=500, n_attr=16)
    kw = dict(dim=16, epochs=6, eval_every=6, k_neg=6, neg_every=3,
              neg_mode="uniform", syn_n_ent=120, use_attr_channel=True,
              attr_beta=0.8)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r22 = fit_distributed(get_config("base", n_shards=2, feature_shards=2,
                                     **kw), task=task)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r22.params["emb"]), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(r1.params["attr_emb"]),
                               np.asarray(r22.params["attr_emb"]), rtol=2e-3, atol=2e-4)


def test_fit_distributed_dropout_matches_across_shards():
    """Dropout in the sharded trainer: the mask is generated globally from the
    epoch key, so training is shard-count-invariant; dropout visibly changes
    the trajectory vs no-dropout; eval-mode embeddings are dropout-inert."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=11, n_ent=240, n_rel=6, n_triples=800)
    kw = dict(dim=16, epochs=6, eval_every=6, k_neg=5, neg_every=3,
              neg_mode="uniform", syn_n_ent=240)
    rd1 = fit_distributed(get_config("base", n_shards=1, dropout=0.3, **kw), task=task)
    rd8 = fit_distributed(get_config("base", n_shards=8, dropout=0.3, **kw), task=task)
    np.testing.assert_allclose(np.asarray(rd1.params["emb"]),
                               np.asarray(rd8.params["emb"]), rtol=1e-4, atol=1e-6)
    r0 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    assert abs(rd1.history[-1]["loss"] - r0.history[-1]["loss"]) > 1e-4
    # eval-inert: with no training steps the reported metrics ignore dropout
    kw0 = {**kw, "epochs": 0, "eval_every": 0}
    ra = fit_distributed(get_config("base", n_shards=8, dropout=0.6, **kw0), task=task)
    rb = fit_distributed(get_config("base", n_shards=8, **kw0), task=task)
    assert ra.metrics["hits@1"] == rb.metrics["hits@1"]


def test_fit_distributed_l2_normalize_tp():
    """l2_normalize under TP: the row squared-sum psums over 'feature'."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=11, n_ent=240, n_rel=6, n_triples=800)
    kw = dict(dim=16, epochs=6, eval_every=6, k_neg=5, neg_every=3,
              neg_mode="uniform", syn_n_ent=240, l2_normalize=True)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r42 = fit_distributed(get_config("base", n_shards=4, feature_shards=2,
                                     **kw), task=task)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r42.params["emb"]), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("impl,extras", [
    ("ell", False), ("sorted", False), ("ell", True),
])
def test_fit_distributed_slice_feature_cross(impl, extras):
    """The round-2 driver dryrun failure (VERDICT.md weak #1) was exactly the
    untested cross-term: slice_shards>1 TOGETHER WITH feature_shards>1 on the
    3-D ('slice','graph','feature') mesh, where the spmm custom-VJP cotangent
    could come back with fewer varying axes than the primal (fixed by the
    x-token VMA pin in kernels/spmm_ell.py / spmm.py).  Pin it for BOTH spmm
    impls: 2×2×2 must reproduce the unsharded run.  ``extras`` adds the
    highway gates + l2-normalize (the feature-psum transpose path)."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=21, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=6, eval_every=6, k_neg=5, neg_every=3,
              neg_mode="uniform", syn_n_ent=120, spmm_impl=impl,
              highway=extras, l2_normalize=extras)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r222 = fit_distributed(get_config("base", n_shards=2, slice_shards=2,
                                      feature_shards=2, **kw), task=task)
    assert r1.history[-1]["loss"] == pytest.approx(r222.history[-1]["loss"], rel=1e-3)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r222.params["emb"]),
                               rtol=2e-3, atol=2e-4)


def test_fit_distributed_hard_negatives_ring_csls():
    """CSLS hard mining at n_shards>1 now runs the ring hubness pass (no
    GSPMD quadratic fallback); N=8 ≡ N=1 on the training trajectory."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=17, n_ent=240, n_rel=6, n_triples=800)
    kw = dict(dim=16, epochs=6, eval_every=6, k_neg=5, neg_every=3,
              neg_mode="hard", neg_csls_k=8, syn_n_ent=240)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r8 = fit_distributed(get_config("base", n_shards=8, **kw), task=task)
    assert r1.history[-1]["loss"] == pytest.approx(r8.history[-1]["loss"], rel=1e-3)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r8.params["emb"]), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("approx_k", [0, 16])
def test_fit_distributed_csls_eval_matches_single_device(approx_k):
    """The adopted-recipe eval convention (eval_csls_k=10, v3+ recipes) in
    the DISTRIBUTED trainer: N=8 metrics ≡ N=1 metrics on the same task —
    before round 4 the ring path silently dropped eval_csls_k (VERDICT r3
    missing #1 / weak #1: the whole matrix ran eval_csls_k=0).  approx_k
    parametrizes the MXU-prefiltered history evals; final metrics are exact
    either way."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=41, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=6, neg_every=4,
              neg_mode="uniform", syn_n_ent=120, eval_csls_k=10,
              eval_approx_k=approx_k)
    r1 = fit_distributed(get_config("base", n_shards=1, **kw), task=task)
    r8 = fit_distributed(get_config("base", n_shards=8, **kw), task=task)
    # final metrics: exact CSLS both sides -> tight equality
    assert r1.metrics["hits@1"] == pytest.approx(r8.metrics["hits@1"], abs=1e-6)
    assert r1.metrics["hits@10"] == pytest.approx(r8.metrics["hits@10"], abs=1e-6)
    assert r1.metrics["mrr"] == pytest.approx(r8.metrics["mrr"], abs=1e-6)
    # history evals (approx path when approx_k>0): same convention both sides
    h1, h8 = r1.history[-1], r8.history[-1]
    tol = 1e-6 if approx_k == 0 else 0.02
    assert h1["hits@1"] == pytest.approx(h8["hits@1"], abs=tol)
    # CSLS is actually applied: the raw-L1 run must differ somewhere
    r_raw = fit_distributed(get_config("base", n_shards=8,
                                       **{**kw, "eval_csls_k": 0}), task=task)
    assert any(abs(r_raw.metrics[k] - r8.metrics[k]) > 1e-9
               for k in ("mrr", "hits@1", "hits@10"))


def test_fit_distributed_slice_dp_uneven_batch():
    """Uneven slice-DP (round 5, caught by the fitprod2 rehearsal): a
    seed-pair count NOT divisible by slice_shards previously crashed in
    batch construction (with_sharding_constraint rejects uneven splits);
    non-divisible leaves now stay replicated, and the sliced run must
    still reproduce the unsliced one exactly."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    # 128 entities -> 19 train pairs on this seed: 19 % 2 != 0
    task = synthetic_align_task(seed=23, n_ent=128, n_rel=6, n_triples=500)
    assert len(task.train_pairs) % 2 == 1
    kw = dict(dim=16, epochs=4, eval_every=4, k_neg=4, neg_every=2,
              neg_mode="uniform", syn_n_ent=128, n_shards=2,
              feature_shards=2)
    r1 = fit_distributed(get_config("base", slice_shards=1, **kw), task=task)
    r2 = fit_distributed(get_config("base", slice_shards=2, **kw), task=task)
    assert r1.history[-1]["loss"] == pytest.approx(r2.history[-1]["loss"], rel=1e-4)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r2.params["emb"]), rtol=1e-4, atol=1e-6)


def test_fit_distributed_ot_subsample_slice_cross():
    """Cross-term: sinkhorn_pairs × slice-DP (3-D mesh).  The OT subsample
    feeds the graph-axis ring and is deliberately NOT slice-sharded; the
    sliced run must reproduce the unsliced one exactly."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=45, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=6, eval_every=6, k_neg=4, neg_every=3,
              neg_mode="uniform", syn_n_ent=120, use_sinkhorn=True,
              sinkhorn_iters=4, sinkhorn_pairs=16, n_shards=2)
    r0 = fit_distributed(get_config("sinkhorn", slice_shards=1, **kw), task=task)
    r2 = fit_distributed(get_config("sinkhorn", slice_shards=2, **kw), task=task)
    assert r0.history[-1]["loss_sinkhorn"] == pytest.approx(
        r2.history[-1]["loss_sinkhorn"], rel=1e-3)
    np.testing.assert_allclose(np.asarray(r0.params["emb"]),
                               np.asarray(r2.params["emb"]), rtol=1e-4, atol=1e-6)
