"""Edge-partitioned distributed trainer (BASELINE.json config[4]).

The encoder runs inside ``shard_map`` over the 'graph' mesh axis with the
entity-embedding table sharded by entity range and the adjacency
edge-partitioned (sparse/partition.py); neighborhood aggregation uses the
halo-exchange SpMM (dist/halo.py).  Everything outside the encoder — margin
loss over seed pairs, negatives, the optimizer — runs under GSPMD on the
row-sharded embedding output, with XLA inserting the needed gathers.

Functionally identical to the single-device path: tests assert N=1 ≡ N=8
(virtual devices) step-for-step.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from tpugraph.configs.configs import TrainConfig
from tpugraph.dist.halo import halo_spmm
from tpugraph.dist.mesh import make_mesh
from tpugraph.dist.ring import _pcast_varying
from tpugraph.sparse.partition import HaloGraph, partition_edges
from tpugraph.sparse.build import coo_from_triples, coo_normalize
from tpugraph.sparse.graph import AlignTask
from tpugraph.train.eval import hits_at_k
from tpugraph.train.loop import TrainResult, eager_cond, load_task, traced_cond
from tpugraph.train.losses import margin_align_loss
from tpugraph.train.metrics import MetricsLogger, epoch_edge_ops
from tpugraph.train.negatives import sample_hard_negatives, sample_uniform_negatives


def init_params(key, n_pad: int, dim: int, hidden: int, highway: bool,
                n_rel: int = 0, n_attr: int = 0, n_attr_channel: int = 0):
    """n_attr > 0 adds the categorical attribute HEAD (attr_out);
    n_attr_channel > 0 adds the GCN-Align AE CHANNEL params (attr_emb +
    ae_gc1/ae_gc2) — independent capabilities."""
    ks = jax.random.split(key, 10)
    xavier = jax.nn.initializers.xavier_uniform()
    p = {
        "emb": jax.random.normal(ks[0], (n_pad, dim)) / dim**0.5,
        "gc1": {"w": xavier(ks[1], (dim, hidden)), "b": jnp.zeros((hidden,))},
        "gc2": {"w": xavier(ks[2], (hidden, dim)), "b": jnp.zeros((dim,))},
    }
    if highway:
        p["hw1"] = {"w": xavier(ks[3], (hidden, hidden)), "b": jnp.zeros((hidden,))}
        p["hw2"] = {"w": xavier(ks[4], (dim, dim)), "b": jnp.zeros((dim,))}
    if n_rel:
        p["rel"] = jax.random.normal(ks[5], (n_rel, dim)) / dim**0.5
    if n_attr:
        p["attr_out"] = {"w": xavier(ks[6], (dim, n_attr)), "b": jnp.zeros((n_attr,))}
    if n_attr_channel:
        p["attr_emb"] = jax.random.normal(ks[7], (n_attr_channel, dim)) / dim**0.5
        p["ae_gc1"] = {"w": xavier(ks[8], (dim, dim)), "b": jnp.zeros((dim,))}
        p["ae_gc2"] = {"w": xavier(ks[9], (dim, dim)), "b": jnp.zeros((dim,))}
    return p


def make_encoder(mesh, halo, highway: bool, impl: str = "sorted",
                 attr_channel: bool = False, compute_dtype: str = "float32",
                 dropout: bool = False, l2_normalize: bool = False):
    """Returns encode(params, halo[, mask][, attr_op]) -> (N_pad, d) sharded
    P('graph', 'feature') — or an (se, ae) pair when ``attr_channel``
    (GCN-Align AE).

    The shard_map body mirrors models/encoder.py AlignGCN exactly (parity
    is asserted in tests/test_dist.py); only the SpMM is halo-exchanged.
    ``impl``: 'sorted' (segment-sum groups, HaloGraph) or 'ell' (scatter-free
    stacked ELL operators, HaloEll — the fast path, see docs/DESIGN.md §2).
    The AE channel (models/attr_channel.py semantics) takes a stacked
    incidence EllOperator (sparse/halo_ell.build_attr_incidence_ell): its
    sources (attr embeddings) are replicated, so only the adjacency
    propagation needs the halo exchange.
    ``compute_dtype='bfloat16'``: bf16 activations through the SpMMs and
    GEMMs (params and K-axis accumulation stay fp32; the halo all_to_all
    ships bf16 rows — half the ICI bytes); output cast back to fp32.

    Tensor parallelism over the mesh's 'feature' axis (SURVEY.md §2.2 TP
    row): every GEMM is column-parallel — weights and biases are sharded on
    the OUTPUT dim, each feature shard ``all_gather``s the layer input to
    full width and computes its column slice.  All row-wise work downstream
    of a GEMM (the SpMMs, the halo all_to_all bytes, highway gates) then
    carries width d/F per shard, and the final embeddings come out
    P('graph', 'feature').  Backward through the all_gather is a
    reduce-scatter — inserted by AD, no hand-written collectives.

    ``dropout``: encode takes an extra (n_loc, hidden) mask argument (values
    {0, 1/keep} for training, all-ones for eval), applied to the gc2 input —
    same placement as AlignGCN.  The mask is generated GLOBALLY by the
    caller, so runs are bit-identical across shard counts.
    ``l2_normalize``: per-row L2 norm of the fp32 output; the squared-sum
    reduces over 'feature' with a psum (rows are column-sharded under TP).
    """
    col = P(None, "feature")  # GEMM weights: output-dim (column) sharded
    bias = P("feature")
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            {  # params
                "emb": P("graph", "feature"),
                "gc1": {"w": col, "b": bias},
                "gc2": {"w": col, "b": bias},
                **({"hw1": {"w": col, "b": bias}, "hw2": {"w": col, "b": bias}}
                   if highway else {}),
                **({"attr_emb": col,
                    "ae_gc1": {"w": col, "b": bias},
                    "ae_gc2": {"w": col, "b": bias}} if attr_channel else {}),
            },
            P("graph"),  # halo operator: prefix spec — every leaf splits dim 0
        ) + ((P("graph", None),) if dropout else ())
        + ((P("graph"),) if attr_channel else ()),
        out_specs=(P("graph", "feature"), P("graph", "feature")) if attr_channel
        else P("graph", "feature"),
    )
    def encode(params, hs, *extra):
        if dropout:
            mask, attr_ops = extra[0], extra[1:]
        else:
            mask, attr_ops = None, extra
        if impl == "ell":
            from tpugraph.dist.halo import halo_spmm_ell
            from tpugraph.kernels.spmm_ell import spmm_ell
            from tpugraph.sparse.halo_ell import squeeze_shard

            hsq = squeeze_shard(hs)
            g = hs.group_size  # == n_shards ungrouped; within-group size else
            send_idx = hsq.send_idx.reshape(g, hs.halo_b)
            send_mask = hsq.send_mask.reshape(g, hs.halo_b)

            if hs.has_halo:
                def spmm(x):
                    return halo_spmm_ell(x, hsq.loc, hsq.bnd, send_idx, send_mask,
                                         axis_index_groups=hs.axis_groups)
            else:
                # boundary-free partition (static, e.g. n_shards=1): skip the
                # padded all-zero exchange + boundary aggregation entirely —
                # halo_b is floored at pad_halo_to, so the full exchange would
                # be pure waste every layer pass (round-4b halo review)
                def spmm(x):
                    with jax.named_scope("spmm_local"):
                        return spmm_ell(hsq.loc, x)

        else:
            from tpugraph.dist.halo import _segsum

            loc_src = hs.loc_src.reshape(-1)
            loc_dst = hs.loc_dst.reshape(-1)
            loc_w = hs.loc_w.reshape(-1)
            bnd_src = hs.bnd_src.reshape(-1)
            bnd_dst = hs.bnd_dst.reshape(-1)
            bnd_w = hs.bnd_w.reshape(-1)
            send_idx = hs.send_idx.reshape(hs.group_size, hs.halo_b)
            send_mask = hs.send_mask.reshape(hs.group_size, hs.halo_b)

            if hs.has_halo:
                def spmm(x):
                    return halo_spmm(x, loc_src, loc_dst, loc_w, bnd_src, bnd_dst,
                                     bnd_w, send_idx, send_mask,
                                     axis_index_groups=hs.axis_groups)
            else:
                def spmm(x):  # boundary-free: local aggregation only (above)
                    with jax.named_scope("spmm_local"):
                        return _segsum(loc_w, x, loc_src, loc_dst, x.shape[0])

        def w_(p):  # params stay fp32; cast at use (mixed-precision recipe)
            return p["w"].astype(cdt)

        def b_(p):
            return p["b"].astype(cdt)

        def gather_f(v):  # (n_loc, d/F) column shard -> (n_loc, d) full width
            return jax.lax.all_gather(v, "feature", axis=1, tiled=True)

        x_c = params["emb"].astype(cdt)  # (n_loc, dim/F)
        x = gather_f(x_c)  # (n_loc, dim)
        h_c = jax.nn.relu(spmm(x @ w_(params["gc1"])) + b_(params["gc1"]))
        if highway:
            t_c = jax.nn.sigmoid(x @ w_(params["hw1"]) + b_(params["hw1"]))
            h_c = t_c * h_c + (1.0 - t_c) * x_c
        h = gather_f(h_c)  # (n_loc, hidden)
        h_in = h if mask is None else h * mask.astype(cdt)
        h2_c = spmm(h_in @ w_(params["gc2"])) + b_(params["gc2"])
        if highway:
            t2_c = jax.nn.sigmoid(h @ w_(params["hw2"]) + b_(params["hw2"]))
            h2_c = t2_c * h2_c + (1.0 - t2_c) * h_c
        se = h2_c.astype(jnp.float32)
        if l2_normalize:
            ss = jax.lax.psum(jnp.sum(se * se, axis=-1, keepdims=True), "feature")
            se = se / (jnp.sqrt(ss) + 1e-8)
        if not attr_channel:
            return se
        from tpugraph.kernels.spmm_ell import spmm_ell
        from tpugraph.sparse.halo_ell import squeeze_shard as _sq

        inc = _sq(attr_ops[0])
        # pvary: mark the graph-replicated attr table as device-varying so the
        # custom-VJP SpMM's per-shard cotangent transposes through a psum
        # (shard_map's VMA check cannot infer this across a custom_vjp)
        ae_emb = _pcast_varying(params["attr_emb"], "graph").astype(cdt)
        x0 = gather_f(spmm_ell(inc, ae_emb))  # (n_loc, dim) — shard-local rows
        ah_c = jax.nn.relu(spmm(x0 @ w_(params["ae_gc1"])) + b_(params["ae_gc1"]))
        ah = gather_f(ah_c)
        ae_c = spmm(ah @ w_(params["ae_gc2"])) + b_(params["ae_gc2"])
        return se, ae_c.astype(jnp.float32)

    return encode


def fit_distributed(cfg: TrainConfig, task: AlignTask | None = None,
                    verbose: bool = False) -> TrainResult:
    task = task or load_task(cfg)
    n_shards = cfg.n_shards
    if cfg.param_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unsupported param_dtype {cfg.param_dtype!r}")
    if cfg.use_sinkhorn and cfg.epochs > 0:
        # Effective OT problem size, guarded on BOTH shard-count branches
        # (epochs == 0 / eval-only never compiles the OT loss).
        # n_shards == 1: the path materializes the S×S cost matrix — same
        # compile-failure guard as fit_mtl (train/mtl.py).
        # n_shards > 1: the ring path never materializes S×S, but its
        # compute is still quadratic PER Sinkhorn iteration — the
        # rematerializing ring body recomputes every S×S cost tile ~3× per
        # iteration, measured at 8.1e13 flops/interval on uncapped DWY100K
        # seeds (BASELINE.md "Distributed OT") vs 5.4e11 capped at 4096
        # (149×).  Before round 5 this branch was unguarded: a DWY100K run
        # with the recipe default sinkhorn_pairs=0 silently entered that
        # regime (VERDICT r4 weak #2) — the repo's reject-don't-ignore rule
        # wants the same loud error with the sinkhorn_pairs remedy.
        n_seed_ = len(task.train_pairs)
        ot_eff = (min(cfg.sinkhorn_pairs, n_seed_)
                  if cfg.sinkhorn_pairs > 0 else n_seed_)
        if ot_eff > 8192:
            where = ("does not compile at this scale on one shard"
                     if n_shards == 1 else
                     f"runs the ring loss's ~3·S² per-iteration recompute "
                     f"({3 * cfg.sinkhorn_iters * ot_eff**2 * cfg.dim:.1e} "
                     f"flops per loss step at dim={cfg.dim}) — quadratically "
                     f"past any training-relevant budget")
            raise ValueError(
                f"use_sinkhorn with an effective OT problem of {ot_eff} pairs "
                f"(seeds={n_seed_}, sinkhorn_pairs={cfg.sinkhorn_pairs}) "
                f"{where} — set sinkhorn_pairs <= 8192 (e.g. 4096; the "
                f"measured 149×-flops-cap subsample, BASELINE.md "
                f"'Distributed OT')")
    use_ae = cfg.use_attr_channel
    if use_ae and (task.merged_attr_triples is None or task.n_attr == 0):
        raise ValueError("attribute channel enabled but the task has no attribute triples")
    # same actionable-validation treatment for the other data-dependent heads:
    # use_attr_head on a task without attributes previously crashed deep in
    # interval_batch (None.shape), use_rel_head with n_rel == 0 as a KeyError
    # inside the jitted loss (round-4b trainer review)
    if cfg.use_attr_head and (task.merged_attr_triples is None or task.n_attr == 0):
        raise ValueError("attribute head enabled but the task has no attribute triples")
    if cfg.use_rel_head and task.n_rel == 0:
        raise ValueError("relation head enabled but the task has no relation types")
    mesh = make_mesh(n_shards, cfg.feature_shards, n_slice=cfg.slice_shards)

    def shard_slice(tree):
        """Shard loss-side batches along the DCN 'slice' axis (3-D mesh):
        each slice scores a contiguous stripe of the pairs/negatives, and the
        per-step gradient all-reduce is the only cross-slice traffic.  Values
        are bit-identical to the unsliced run (means are global).

        Leaves whose leading dim is NOT divisible by slice_shards (e.g. an
        odd seed-pair count on a 2-slice mesh) stay replicated: GSPMD's
        with_sharding_constraint hard-rejects uneven splits, so before
        round 5 such a run CRASHED in batch construction (caught by the
        fitprod2 cross-process rehearsal, whose 19-seed task is exactly
        this shape).  Replication only lowers that leaf's parallelism
        degree — the loss value is unchanged either way."""
        if cfg.slice_shards <= 1:
            return tree
        spec = NamedSharding(mesh, P("slice"))

        def _constrain(v):
            if getattr(v, "ndim", 0) >= 1 and v.shape[0] % cfg.slice_shards == 0:
                return jax.lax.with_sharding_constraint(v, spec)
            return v

        return jax.tree_util.tree_map(_constrain, tree)

    src, dst, w = coo_from_triples(task.n_ent, task.merged_triples, n_rel=task.n_rel,
                                   weighting=cfg.weighting)
    w = coo_normalize(src, dst, w, task.n_ent, norm=cfg.norm)
    n1, n = task.kg1.n_ent, task.n_ent
    n2 = n - n1
    if cfg.halo_grouped:
        # Component-grouped exchange (DESIGN.md §5 (c)): give each KG its own
        # contiguous HALF of the shard range so the block-diagonal merged
        # graph has zero cross-group halo needs, then all_to_all within each
        # half only.  Entity ids are row-remapped so the KG boundary lands
        # exactly on the group boundary: KG1 keeps rows [0, n1) (pad up to
        # r0), KG2 entity n1+j lives at row r0+j.  Every id array the trainer
        # touches is remapped through row_of below; r0/r1 replace the n1/n
        # KG2 bases everywhere (ungrouped: r0 == n1, r1 == n, remap a no-op).
        if n_shards < 2 or n_shards % 2:
            raise ValueError("halo_grouped requires an even n_shards >= 2")
        g_half = n_shards // 2
        n_loc_g = -(-max(n1, n2) // g_half)  # ceil
        r0 = g_half * n_loc_g
        import numpy as _np

        def row_of(ids):
            ids = _np.asarray(ids)
            return _np.where(ids < n1, ids, ids - n1 + r0).astype(ids.dtype)

        src, dst = row_of(src), row_of(dst)
        hg = partition_edges(src, dst, w, 2 * r0, n_shards, n_groups=2)
    else:
        r0 = n1

        def row_of(ids):
            return ids

        hg = partition_edges(src, dst, w, task.n_ent, n_shards)
    r1 = r0 + n2
    n_pad = hg.n_loc * n_shards

    hidden = cfg.hidden or cfg.dim
    if cfg.highway and hidden != cfg.dim:
        raise ValueError("highway gates require hidden == dim")
    n_feat = max(1, cfg.feature_shards)
    if cfg.dim % n_feat or hidden % n_feat:
        raise ValueError(
            f"feature_shards={n_feat} must divide dim={cfg.dim} and hidden={hidden}")
    key = jax.random.PRNGKey(cfg.seed)
    key, ik = jax.random.split(key)
    attr_all = task.merged_attr_triples
    params = init_params(
        ik, n_pad, cfg.dim, hidden, cfg.highway,
        n_rel=task.n_rel if cfg.use_rel_head else 0,
        n_attr=task.n_attr if cfg.use_attr_head else 0,
        n_attr_channel=task.n_attr if use_ae else 0,
    )
    emb_sharding = NamedSharding(mesh, P("graph", "feature"))
    col_sharding = NamedSharding(mesh, P(None, "feature"))
    bias_sharding = NamedSharding(mesh, P("feature"))
    repl = NamedSharding(mesh, P())

    def place_params(p):
        """emb entity+feature sharded; GEMM weights column-sharded on
        'feature' (TP); heads (rel/attr_out) replicated."""
        out = {}
        for name, sub in p.items():
            if name == "emb":
                out[name] = jax.device_put(sub, emb_sharding)
            elif name in ("gc1", "gc2", "hw1", "hw2", "ae_gc1", "ae_gc2"):
                out[name] = {"w": jax.device_put(sub["w"], col_sharding),
                             "b": jax.device_put(sub["b"], bias_sharding)}
            elif name == "attr_emb":
                out[name] = jax.device_put(sub, col_sharding)
            else:
                out[name] = jax.device_put(sub, repl)
        return out

    params = place_params(params)
    if cfg.spmm_impl in ("ell", "pallas"):
        from tpugraph.sparse.halo_ell import build_halo_ell

        halo = build_halo_ell(hg)
    else:
        halo = hg
    halo = jax.device_put(halo, NamedSharding(mesh, P("graph")))
    # one remapped copy of the attribute triples feeds BOTH consumers (the
    # AE incidence build and the attr-head batch source) — review r3 item 5
    attr_rows = attr_all
    if cfg.halo_grouped and attr_all is not None:
        attr_rows = attr_all.copy()
        attr_rows[:, 0] = row_of(attr_all[:, 0])
    attr_args = ()
    if use_ae:
        from tpugraph.sparse.halo_ell import build_attr_incidence_ell

        attr_inc = build_attr_incidence_ell(attr_rows, n_pad, task.n_attr,
                                            n_shards, hg.n_loc)
        attr_args = (jax.device_put(attr_inc, NamedSharding(mesh, P("graph"))),)

    use_dropout = cfg.dropout > 0
    encode = make_encoder(mesh, halo, cfg.highway,
                          impl="ell" if cfg.spmm_impl in ("ell", "pallas") else "sorted",
                          attr_channel=use_ae, compute_dtype=cfg.param_dtype,
                          dropout=use_dropout, l2_normalize=cfg.l2_normalize)
    from tpugraph.train.optim import make_tx

    tx = make_tx(cfg)

    # moments come out of zeros_like(params) and inherit the params'
    # shardings directly — emb moments entity+feature sharded, GEMM-weight
    # moments column-sharded; no replicate-then-reshard round trip
    opt_state = tx.init(params)

    def _reshard_opt_like(t, tmpl):
        """Place restored optimizer-state leaves on this run's shardings
        (the checkpoint may come from a different mesh shape): the fresh
        pre-restore ``tx.init`` state provides the target placement
        leaf-by-leaf — reused rather than re-initialized, so restore does
        not transiently materialize a second set of embedding-sized Adam
        moments (ADVICE r2 item 4).  Only adopt mesh (Named) shardings —
        scalar leaves like Adam's step count come out of tx.init with an
        uncommitted single-device placement, and committing a restored
        scalar to device 0 would conflict with the replicated layout
        train_step expects."""
        return jax.tree_util.tree_map(
            lambda x, m: jax.device_put(
                x, m.sharding if (hasattr(m, "sharding")
                                  and isinstance(m.sharding, NamedSharding))
                else repl)
            if hasattr(x, "shape") else x, t, tmpl)

    pairs = jax.device_put(jnp.asarray(row_of(task.train_pairs)), repl)

    use_boot = cfg.boot_cap > 0
    if use_boot:
        import numpy as _np

        from tpugraph.train.bootstrap import propose_mutual_nn_pairs

        _m1 = _np.zeros(r0, bool)  # rows [n1, r0) are grouped-mode padding
        _m1[:n1] = True
        _m1[task.train_pairs[:, 0]] = False
        _m2 = _np.ones(n2, bool)
        _m2[task.train_pairs[:, 1] - n1] = False
        boot_mask1 = jax.device_put(jnp.asarray(_m1), repl)
        boot_mask2 = jax.device_put(jnp.asarray(_m2), repl)
        ones_seed = jnp.ones((pairs.shape[0],), jnp.float32)
        boot_placeholder = (
            jnp.tile(jnp.array([0, r0], jnp.int32), (cfg.boot_cap, 1)),
            jnp.zeros((cfg.boot_cap,), jnp.float32),
        )

        def with_boot(bp, bw):
            return (jnp.concatenate([pairs, bp], 0),
                    jnp.concatenate([ones_seed, bw * cfg.boot_weight], 0))

    _rel = task.merged_triples
    if cfg.halo_grouped:
        _rel = _rel.copy()
        _rel[:, 0] = row_of(_rel[:, 0])
        _rel[:, 2] = row_of(_rel[:, 2])
    rel_triples = jax.device_put(jnp.asarray(_rel), repl)
    attr_triples = (jax.device_put(jnp.asarray(attr_rows), repl)
                    if attr_rows is not None else None)

    def row_of_j(ids):
        """jit-safe entity-id → row map (identity when ungrouped)."""
        if not cfg.halo_grouped:
            return ids
        return jnp.where(ids < n1, ids, ids - n1 + r0)

    def head_losses(p, emb, batch):
        """MTL heads on the row-sharded encoder output (GSPMD inserts the
        gathers/collectives; only the encoder needs explicit shard_map)."""
        aux = {}
        extra = 0.0
        if cfg.use_sinkhorn:
            # seed pairs, or the per-interval sinkhorn_pairs subsample (caps
            # the quadratic OT problem at DWY100K seed counts — the ring
            # loss recomputes every S×S cost tile ~3× per iteration, so an
            # uncapped 100k-seed run is ~1e16 flops/epoch)
            ot_pairs = batch.get("ot_pairs", pairs)
            if n_shards > 1:
                # ring-blockwise OT (SURVEY.md §5.7): cost tiles rotate via
                # ppermute, grads flow through the collective; required at
                # DWY100K seed-set scale where the cost matrix cannot exist
                from tpugraph.dist.ring import ring_sinkhorn_align_loss

                l_ot = ring_sinkhorn_align_loss(emb, ot_pairs, mesh,
                                                tau=cfg.sinkhorn_tau,
                                                n_iters=cfg.sinkhorn_iters)
            else:
                from tpugraph.train.ot import sinkhorn_align_loss

                l_ot = sinkhorn_align_loss(emb, ot_pairs, tau=cfg.sinkhorn_tau,
                                           n_iters=cfg.sinkhorn_iters)
            aux["sinkhorn"] = l_ot
            extra = extra + cfg.sinkhorn_weight * l_ot
        if cfg.use_rel_head:
            h = jnp.take(emb, rel_triples[:, 0], axis=0)
            r = jnp.take(p["rel"], rel_triples[:, 1], axis=0)
            t = jnp.take(emb, rel_triples[:, 2], axis=0)
            pos = jnp.sum(h * r * t, axis=-1)
            tn = jnp.take(emb, batch["rel_neg_t"], axis=0)
            hn = jnp.take(emb, batch["rel_neg_h"], axis=0)
            neg_t = jnp.einsum("td,tkd->tk", h * r, tn)
            neg_h = jnp.einsum("td,tkd->tk", r * t, hn)
            l_rel = (-jax.nn.log_sigmoid(pos).mean()
                     - 0.5 * (jax.nn.log_sigmoid(-neg_t).mean()
                              + jax.nn.log_sigmoid(-neg_h).mean()))
            aux["rel"] = l_rel
            extra = extra + cfg.rel_weight * l_rel
        if cfg.use_attr_head:
            at = batch["attr_triples"]
            logits = jnp.take(emb, at[:, 0], axis=0) @ p["attr_out"]["w"] + p["attr_out"]["b"]
            log_p = jax.nn.log_softmax(logits, axis=-1)
            l_attr = -jnp.take_along_axis(log_p, at[:, 1:2], axis=1).mean()
            aux["attr"] = l_attr
            extra = extra + cfg.attr_weight * l_attr
        return extra, aux

    def enc_sub(p):
        """Encoder-only param subtree (shard_map in_specs match it)."""
        keys = ("emb", "gc1", "gc2", "hw1", "hw2", "attr_emb", "ae_gc1", "ae_gc2")
        return {k: p[k] for k in keys if k in p}

    mask_sharding = NamedSharding(mesh, P("graph", None))
    if use_dropout:
        # eval/mining mask: all-ones — dropout is inert outside training
        # steps (mirrors AlignGCN's deterministic=not train)
        eval_mask = jax.device_put(jnp.ones((n_pad, hidden), jnp.float32),
                                   mask_sharding)
        drop_base = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 1 << 20)

        def drop_mask(key):
            """Global (n_pad, hidden) inverted-dropout mask — generated from
            the global key, so identical at every shard count."""
            keep = 1.0 - cfg.dropout
            m = jax.random.bernoulli(key, keep, (n_pad, hidden))
            return jax.lax.with_sharding_constraint(
                m.astype(jnp.float32) / keep, mask_sharding)

    # jitted functions must take the cross-process-sharded constants (the
    # halo operator, the attr incidence, the P('graph')-sharded eval dropout
    # mask) as ARGUMENTS: closing over a jax.Array that spans non-addressable
    # devices is an error under multi-process jax.distributed (caught by the
    # 2-process fit_distributed rehearsal, round 3).  Fully-replicated
    # constants (pairs, rel/attr triples, boot masks) may stay closed over —
    # their value is locally addressable on every process.
    enc_consts = {"halo": halo, "attr": attr_args}
    if use_dropout:
        enc_consts["eval_mask"] = eval_mask

    def encode_se_ae(p, ec, mask=None):
        """(se, ae) — ae is None without the attribute channel."""
        mask_args = ((ec["eval_mask"] if mask is None else mask,)
                     if use_dropout else ())
        out = encode(enc_sub(p), ec["halo"], *mask_args, *ec["attr"])
        return out if use_ae else (out, None)

    def encode_emb(p, ec):
        """Eval/mining embeddings: SE, or the GCN-Align β-combined SE‖AE."""
        se, ae = encode_se_ae(p, ec)
        if use_ae:
            from tpugraph.models.attr_channel import combine_channels

            return combine_channels(se, ae, cfg.attr_beta)
        return se

    def joint_loss(p, batch, ec):
        """Margin on SE (+ AE-channel margin) + MTL head losses.  batch
        carries the (possibly boot-augmented) pairs and their weights; the
        Sinkhorn head stays on the seed pairs (as in the single-device MTL)."""
        mask = drop_mask(batch["drop_key"]) if use_dropout else None
        se, ae = encode_se_ae(p, ec, mask=mask)
        bp, bw = batch["pairs"], batch["w"]
        loss = margin_align_loss(se, bp, batch["neg_l"], batch["neg_r"], cfg.gamma, bw)
        aux = {"margin": loss}
        if use_ae:
            l_ae = margin_align_loss(ae, bp, batch["neg_l"], batch["neg_r"], cfg.gamma, bw)
            aux["ae"] = l_ae
            loss = loss + cfg.attr_channel_weight * l_ae
        extra, aux2 = head_losses(p, se, batch)
        return loss + extra, {**aux, **aux2}

    @jax.jit
    def train_step(params, opt_state, batch, ec):
        (loss, aux), grads = jax.value_and_grad(joint_loss, has_aux=True)(
            params, batch, ec)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, aux

    @jax.jit
    def embed(params, ec):
        return encode_emb(params, ec)

    @jax.jit
    def resample_hard(params, pairs_t, ec):
        emb = encode_emb(params, ec)
        if n_shards > 1:
            # ring-blockwise mining (SURVEY.md §5.7): candidate shards rotate
            # via ppermute; no shard ever holds the full candidate pool.
            # csls_k > 0 adds the hubness ring pass (CSLS-corrected mining).
            from tpugraph.dist.ring import ring_knn

            e_l = jnp.take(emb, pairs_t[:, 0], axis=0)
            e_r = jnp.take(emb, pairs_t[:, 1], axis=0)
            cand_l = jax.lax.slice_in_dim(emb, 0, n1, axis=0)
            cand_r = jax.lax.slice_in_dim(emb, r0, r1, axis=0)
            neg_r = ring_knn(e_l, cand_r, pairs_t[:, 1] - r0, cfg.k_neg, mesh,
                             metric=cfg.neg_metric, csls_k=cfg.neg_csls_k,
                             approx=cfg.neg_approx) + r0
            neg_l = ring_knn(e_r, cand_l, pairs_t[:, 0], cfg.k_neg, mesh,
                             metric=cfg.neg_metric, csls_k=cfg.neg_csls_k,
                             approx=cfg.neg_approx)
            return neg_l, neg_r
        return sample_hard_negatives(emb, pairs_t, n1, n, cfg.k_neg,
                                     metric=cfg.neg_metric, approx=cfg.neg_approx,
                                     csls_k=cfg.neg_csls_k)

    if use_boot:
        def propose_boot(params, ec):
            emb = encode_emb(params, ec)
            return propose_mutual_nn_pairs(
                emb, boot_mask1, boot_mask2, r0, r1, cfg.boot_cap,
                metric=cfg.neg_metric, csls_k=cfg.boot_csls_k,
                approx=cfg.boot_approx)

        propose_boot_jit = jax.jit(propose_boot)

    test_rows = row_of(task.test_pairs)

    def dist_eval(params, final: bool = False):
        """Ring-blockwise eval (SURVEY.md §5.7) when actually sharded.

        eval_csls_k / eval_approx_k follow the same convention as fit():
        every adopted v3+ recipe pins eval_csls_k=10, and before round 4 the
        ring path silently dropped it — any n_shards>1 run reported Hits@k
        under a different ranking convention than the single-chip numbers
        (VERDICT r3 missing #1).  History evals may use the MXU-prefiltered
        approx path; FINAL metrics stay exact."""
        approx = 0 if final else cfg.eval_approx_k
        if n_shards > 1:
            from tpugraph.dist.ring import ring_hits_at_k

            return ring_hits_at_k(embed(params, enc_consts), test_rows, mesh,
                                  csls_k=cfg.eval_csls_k, approx_k=approx)
        return hits_at_k(embed(params, enc_consts), jnp.asarray(test_rows),
                         csls_k=cfg.eval_csls_k, approx_k=approx)

    from tpugraph.train.checkpoint import Checkpointer, abstract_like

    ckpt = Checkpointer(cfg.checkpoint_dir, cfg.checkpoint_every)
    ckpt.install_preemption_handler()
    # Row-layout stamp saved inside every checkpoint: halo_grouped permutes
    # the embedding table's rows (KG2 base moves n1 → r0) WITHOUT changing
    # its padded shape when the KGs are equal-sized, so Orbax's shape check
    # cannot catch a restore across the flag — enforce it here instead of a
    # config comment (ADVICE r3 item 1).  r0 is shard-count-invariant when
    # ungrouped, so the supported cross-mesh restore is unaffected.
    # Mesh-replicated placement: Orbax refuses host-local single-device
    # arrays under multi-process jax.distributed (caught by the 2-process
    # rehearsal).
    layout = jax.device_put(jnp.asarray([int(cfg.halo_grouped), r0], jnp.int32),
                            repl)
    steps = max(1, cfg.steps_per_call)
    if cfg.neg_every < 1:
        raise ValueError(
            "neg_every must be >= 1 (to effectively never resample, set "
            "neg_every >= epochs)")
    if steps > 1 and steps != cfg.neg_every:
        raise ValueError("steps_per_call > 1 requires steps_per_call == neg_every")
    if steps > 1 and cfg.epochs % steps:
        raise ValueError(
            f"epochs={cfg.epochs} is not a multiple of steps_per_call={steps}: "
            f"the fused interval always runs a full {steps}-epoch scan, so the "
            f"run would silently train to epoch {(cfg.epochs // steps + 1) * steps} "
            f"(round-4b trainer review) — adjust epochs or steps_per_call")
    if steps > 1 and cfg.profile_dir:
        raise ValueError("profile_dir requires steps_per_call=1 (per-epoch trace windows)")
    # Resume state beyond params/opt_state (mirrors train/loop.py): the
    # interval's hard negatives and boot-merged pairs are mined from the
    # params AT THE INTERVAL BOUNDARY — after further updates they are
    # unreconstructable, so a mid-interval resume that re-mined them from
    # the restored params silently diverged from the uninterrupted
    # trajectory (round-4b trainer review).  Saved on the steps == 1 path
    # only: fused chunks always start and save at interval boundaries,
    # where regeneration IS exact.  ``loss`` rides along so a relaunch of a
    # completed run reports the checkpointed loss, not nan.
    state_tpl = {"params": params, "opt_state": opt_state, "layout": layout,
                 "loss": jax.ShapeDtypeStruct((), jnp.float32)}
    if steps == 1:
        s_all = int(pairs.shape[0]) + (cfg.boot_cap if use_boot else 0)
        neg_shape = jax.ShapeDtypeStruct((s_all, cfg.k_neg), jnp.int32)
        state_tpl["batch_pairs"] = jax.ShapeDtypeStruct((s_all, 2), jnp.int32)
        state_tpl["batch_neg_l"] = neg_shape
        state_tpl["batch_neg_r"] = neg_shape
        if use_boot:
            state_tpl["batch_w"] = jax.ShapeDtypeStruct((s_all,), jnp.float32)
    start_epoch = 0
    restored_loss = None
    restored_override = None
    try:
        restored = ckpt.restore_latest(abstract_like(state_tpl))
    except Exception as e:
        # a checkpoint saved before the layout stamp existed fails the Orbax
        # structure match with an opaque "layout ... MISSING" — surface the
        # real situation instead.  The legacy hypothesis is confirmed from
        # the checkpoint's own metadata (key genuinely absent on disk), not
        # by string-matching the exception — a corrupted round-4 checkpoint
        # whose error text mentions 'layout' must NOT be misreported as
        # legacy.  No silent legacy fallback: the stamp is unverifiable, and
        # the interval key schedule changed alongside it (split(bk, 3) →
        # split(bk, 4)), so a resume across this boundary could not
        # reproduce the original trajectory anyway.
        if ckpt.latest_has_key("layout") is False:
            raise ValueError(
                f"checkpoint at {cfg.checkpoint_dir!r} predates the row-layout "
                f"stamp (pre-round-4 format) — its partition layout cannot be "
                f"verified and the resume key schedule has changed; retrain "
                f"or point checkpoint_dir elsewhere") from e
        if ckpt.latest_has_key("loss") is False:
            raise ValueError(
                f"checkpoint at {cfg.checkpoint_dir!r} predates the resume "
                f"state (loss + interval negatives, round-4b format) — "
                f"resuming it would re-mine the interval batch from the "
                f"restored params and silently diverge; retrain or point "
                f"checkpoint_dir elsewhere") from e
        if steps == 1 and ckpt.latest_has_key("batch_pairs") is False:
            raise ValueError(
                f"checkpoint at {cfg.checkpoint_dir!r} was saved with "
                f"steps_per_call > 1 (no interval-batch state) — resume it "
                f"with the same fused steps_per_call, or retrain") from e
        if steps > 1 and ckpt.latest_has_key("batch_pairs") is True:
            raise ValueError(
                f"checkpoint at {cfg.checkpoint_dir!r} was saved with "
                f"steps_per_call == 1 (carries interval-batch state) — "
                f"resume it with steps_per_call=1, or retrain") from e
        raise
    if restored is not None:
        start_epoch, state = restored
        start_epoch += 1
        import numpy as _np

        got = tuple(int(v) for v in _np.asarray(state["layout"]))
        want = (int(cfg.halo_grouped), int(r0))
        if got != want:
            raise ValueError(
                f"checkpoint at {cfg.checkpoint_dir!r} was written with row "
                f"layout (halo_grouped, kg2_base)={got} but this run uses "
                f"{want} — restoring would permute entity rows silently; "
                f"retrain or point checkpoint_dir elsewhere")
        # re-place everything on THIS run's mesh: the checkpoint may come
        # from a different shard count (Orbax restores global arrays)
        params = place_params(state["params"])
        # opt_state moments mirror param shapes: shard them identically
        opt_state = _reshard_opt_like(state["opt_state"], opt_state)
        restored_loss = jnp.asarray(state["loss"])
        if steps == 1 and start_epoch % cfg.neg_every != 0:
            # mid-interval resume: rebuild the batch around the BOUNDARY's
            # mined negatives / boot pairs (below, first loop iteration);
            # a boundary resume regenerates them exactly instead
            restored_override = {
                "pairs": jax.device_put(jnp.asarray(state["batch_pairs"]), repl),
                "neg_l": jax.device_put(jnp.asarray(state["batch_neg_l"]), repl),
                "neg_r": jax.device_put(jnp.asarray(state["batch_neg_r"]), repl),
            }
            if use_boot:
                restored_override["w"] = jax.device_put(
                    jnp.asarray(state["batch_w"]), repl)

    base_key = jax.random.PRNGKey(cfg.seed)

    def interval_batch(epoch, p, cond, ec, override=None):
        """The per-interval batch (boot-augmented pairs + negatives + MTL
        head batches) — ONE construction shared by both dispatch modes
        (VERDICT r2 Next #5; the two copies had already diverged on
        dropout-key handling).  ``cond(pred, then, orelse)`` abstracts the
        control-flow style: a Python if for the eager path (epoch is an
        int) vs lax.cond for the fused path (epoch is traced).  The
        key-drawn pieces fold the interval-aligned epoch, so they are
        identical on every host and across restarts (SURVEY.md §7 hard
        part 6).  The PARAMS-dependent pieces (hard negatives, boot-merged
        pairs) are only reconstructable at the interval boundary they were
        mined at — a mid-interval resume passes them back in via
        ``override`` (from the checkpoint, mirroring train/loop.py's
        saved-negatives design; round-4b trainer review)."""
        bk = jax.random.fold_in(base_key, epoch - epoch % cfg.neg_every)
        ks = jax.random.split(bk, 4)
        if override is not None:
            pairs_t, w = override["pairs"], override.get("w")
            neg_l, neg_r = override["neg_l"], override["neg_r"]
        else:
            if use_boot:
                bp, bw = cond((epoch >= cfg.boot_start) & (epoch > 0),
                              lambda: propose_boot_jit(p, ec), lambda: boot_placeholder)
                pairs_t, w = with_boot(bp, bw)
            else:
                pairs_t, w = pairs, None

            def negs_uniform():
                nl, nr = sample_uniform_negatives(ks[0], pairs_t, n1, n, cfg.k_neg)
                return nl, nr + (r0 - n1)  # KG2 draws -> row space (no-op ungrouped)

            if cfg.neg_mode == "hard":
                neg_l, neg_r = cond(epoch > 0,
                                    lambda: resample_hard(p, pairs_t, ec), negs_uniform)
            else:
                neg_l, neg_r = negs_uniform()
        batch = {"pairs": pairs_t, "w": w, "neg_l": neg_l, "neg_r": neg_r}
        if cfg.use_rel_head:
            kt, kh = jax.random.split(ks[1])
            t = rel_triples.shape[0]
            # corruptions drawn in ENTITY-id space then mapped to rows: under
            # halo_grouped a raw [0, n) draw would hit KG1 padding rows and
            # never reach the tail of KG2 (review r3 item 1)
            batch["rel_neg_t"] = row_of_j(
                jax.random.randint(kt, (t, cfg.rel_k_neg), 0, n, dtype=jnp.int32))
            batch["rel_neg_h"] = row_of_j(
                jax.random.randint(kh, (t, cfg.rel_k_neg), 0, n, dtype=jnp.int32))
        if cfg.use_attr_head:
            bs = min(8192, attr_triples.shape[0])
            idx = jax.random.randint(ks[2], (bs,), 0, attr_triples.shape[0], dtype=jnp.int32)
            batch["attr_triples"] = jnp.take(attr_triples, idx, axis=0)
        batch = shard_slice(batch)
        if cfg.use_sinkhorn and 0 < cfg.sinkhorn_pairs < pairs.shape[0]:
            # key-deterministic per-interval OT seed subsample — identical on
            # every host (SURVEY.md §7 hard part 6), static shape, drawn from
            # the SEED pairs only (the Sinkhorn head stays on seeds, as in
            # train/mtl.py make_batch).  Added AFTER shard_slice: it feeds
            # the graph-axis ring loss, not the slice-DP loss stripes —
            # slicing it would just force a GSPMD reshard at the ring entry.
            sub = jax.random.choice(ks[3], pairs.shape[0],
                                    (cfg.sinkhorn_pairs,), replace=False)
            batch["ot_pairs"] = jnp.take(pairs, sub, axis=0)
        return batch

    def make_batch(epoch):
        return interval_batch(epoch, params, eager_cond, enc_consts)

    @jax.jit
    def train_interval(params, opt_state, epoch0, ec):
        """Fused resample + neg_every steps (see train/loop.py rationale).
        NOTE: fused chunks always start and save at interval boundaries,
        where key-deterministic regeneration is exact — so this path saves
        no interval-batch state (the steps == 1 path does, see the
        checkpoint template; mixing steps_per_call across a save/resume
        raises actionably)."""
        batch = interval_batch(epoch0, params, traced_cond, ec)

        def body(carry, e):
            params, opt_state = carry
            b = ({**batch, "drop_key": jax.random.fold_in(drop_base, e)}
                 if use_dropout else batch)
            (loss, aux), grads = jax.value_and_grad(joint_loss, has_aux=True)(
                params, b, ec)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), (loss, aux)

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            body, (params, opt_state), epoch0 + jnp.arange(steps, dtype=jnp.int32)
        )
        return params, opt_state, losses[-1], jax.tree_util.tree_map(lambda a: a[-1], auxs)

    # metrics/TB sinks write from process 0 only: under multi-process
    # jax.distributed every host runs this loop, and shared metrics_path /
    # tb_dir storage would get one interleaved copy of every record per
    # process (round-4b trainer review); history (in-memory) stays on all
    # processes — it feeds each process's TrainResult
    proc0 = jax.process_index() == 0
    logger = MetricsLogger(cfg.metrics_path if proc0 else None,
                           config=cfg.to_dict(),
                           tb_dir=cfg.tb_dir if proc0 else None)

    def preempt_agreed() -> bool:
        """Cross-process agreement on the SIGTERM latch: the signal lands on
        each host at a different instant, and acting on the local flag alone
        lets hosts exit the loop (and enter the collective Orbax save /
        final-eval programs) at DIFFERENT epochs — mismatched collectives
        hang until the grace period kills the job (round-4b trainer
        review).  One tiny allgather per epoch, multi-process only."""
        if jax.process_count() == 1:
            return ckpt.preempted
        from jax.experimental import multihost_utils

        import numpy as _np

        return bool(_np.asarray(multihost_utils.process_allgather(
            _np.asarray([ckpt.preempted]))).any())

    history = []
    batch = None
    loss = restored_loss if restored_loss is not None else jnp.nan
    # ^ nan only on a fresh run that never enters the loop; a relaunch of a
    # completed run reports the checkpointed loss like fit() does
    aux = {}
    trace_on = False  # start/stop must pair even if the loop ends early
    t_start = time.perf_counter()
    with mesh:
        for epoch in range(start_epoch, cfg.epochs, steps):
            if cfg.profile_dir and epoch == start_epoch + 2:
                # same window as train/loop.fit; on a pod slice this is the
                # one-command decisive overlap measurement — the trace shows
                # whether all-to-all-start/done brackets the local SpMM
                # (process 0 writes; other processes skip)
                if jax.process_index() == 0:
                    jax.profiler.start_trace(cfg.profile_dir)
                    trace_on = True
            if steps > 1:
                params, opt_state, loss, aux = train_interval(
                    params, opt_state, jnp.int32(epoch), enc_consts
                )
            else:
                if epoch % cfg.neg_every == 0 or batch is None:
                    if restored_override is not None and epoch % cfg.neg_every != 0:
                        # mid-interval resume: the boundary's mined negatives /
                        # boot pairs come from the checkpoint; the key-drawn
                        # pieces are rebuilt from the interval key as usual
                        batch = interval_batch(epoch, params, eager_cond,
                                               enc_consts,
                                               override=restored_override)
                    else:
                        batch = make_batch(epoch)
                    restored_override = None  # one-shot: next boundary regenerates
                if use_dropout:  # fresh mask every epoch (matches fit())
                    batch = {**batch,
                             "drop_key": jax.random.fold_in(drop_base, epoch)}
                params, opt_state, loss, aux = train_step(params, opt_state, batch,
                                                           enc_consts)
            if trace_on and epoch >= start_epoch + 5:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                trace_on = False
            last = epoch + steps - 1
            def _save_ckpt(at_epoch):
                state = {"params": params, "opt_state": opt_state,
                         "layout": layout,
                         "loss": jax.device_put(
                             jnp.asarray(loss, jnp.float32), repl)}
                if steps == 1:
                    # the interval's params-dependent batch state — see the
                    # resume-state comment at the checkpoint template.
                    # device_put to the mesh-replicated sharding: with
                    # slice_shards == 1 these are eager host-local arrays and
                    # Orbax refuses host-local values under multi-process
                    # jax.distributed (same placement rule as `layout`)
                    state["batch_pairs"] = jax.device_put(batch["pairs"], repl)
                    state["batch_neg_l"] = jax.device_put(batch["neg_l"], repl)
                    state["batch_neg_r"] = jax.device_put(batch["neg_r"], repl)
                    if use_boot:
                        state["batch_w"] = jax.device_put(batch["w"], repl)
                ckpt.maybe_save(at_epoch, state, force=True)

            if ckpt.enabled and (
                (last > 0 and last % cfg.checkpoint_every < steps) or last >= cfg.epochs - 1
                or preempt_agreed()
            ):
                _save_ckpt(last)
            if cfg.eval_every and (last % cfg.eval_every < steps or last >= cfg.epochs - 1):
                m = dist_eval(params)
                wall = time.perf_counter() - t_start
                # whole-system rate (global nnz); _chip divides by every
                # mesh axis so pod-slice logs compare directly to the bench
                # headline's per-chip convention (metrics.py::epoch_edge_ops)
                eps = (epoch_edge_ops(hg.nnz, use_ae) * (last + 1 - start_epoch)
                       / max(wall, 1e-9))  # epochs run in THIS process
                rec = {
                    "epoch": last, "loss": float(loss), "wall_s": round(wall, 3),
                    "edges_per_s": round(eps, 1),
                    "edges_per_s_chip": round(eps / mesh.size, 1),
                    **{f"loss_{k}": float(v) for k, v in aux.items()},
                    **{k: round(v, 4) for k, v in m.items()},
                }
                history.append(rec)
                logger.log(rec)
                if verbose:
                    print(f"[dist:{cfg.name}@{n_shards}] epoch {last} loss {rec['loss']:.4f} "
                          f"hits@1 {m['hits@1']:.3f}")
            if preempt_agreed():
                # latch may fire after the save block's check (e.g. during
                # eval); the agreement collective guarantees every process
                # takes this branch at the SAME epoch
                if ckpt.enabled:
                    _save_ckpt(last)
                break  # clean exit for relaunch
        if trace_on:
            # fewer than 6 epochs remained after the trace started: stop here
            # or the trace is never written (ADVICE r3 item 2)
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()
            trace_on = False
        ckpt.restore_handler()
        # flush pending async saves BEFORE the exact full-pool final eval:
        # on the preemption path the emergency save is still in flight here,
        # and if the scheduler kills the VM mid-eval the save is silently
        # lost — fit() closes before its final eval for the same reason
        # (round-4b trainer review); close() is idempotent.
        ckpt.close()
        final = dist_eval(params, final=True)
    final["final_loss"] = float(loss)
    if cfg.save_emb_path:  # gather the sharded table and hand it to serving
        import numpy as _np

        from tpugraph.serve import save_embeddings

        with mesh:
            # re-place replicated first: under multi-process jax.distributed
            # the P('graph','feature')-sharded embed output spans
            # non-addressable devices and a direct device_get raises
            # (round-4b trainer review); a fully-replicated array is
            # host-fetchable everywhere
            emb_repl = jax.jit(embed, out_shardings=repl)(params, enc_consts)
            emb_host = _np.asarray(emb_repl)
        if cfg.halo_grouped:  # de-remap: serving expects row == entity id
            emb_host = _np.concatenate([emb_host[:n1], emb_host[r0:r1]], axis=0)
        if proc0:  # one writer — every process holds the same replica
            save_embeddings(cfg.save_emb_path, emb_host)
    logger.close()
    return TrainResult(params=params, metrics=final, history=history, task=task)
