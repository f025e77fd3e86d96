"""Multi-task training loop (BASELINE.json configs [2] and [3]).

Same full-graph epoch structure as train/loop.py, but over the AlignMTL
model: each resample interval draws fresh alignment negatives, relation
triple corruptions, and an attribute-triple batch — all on device with
explicit keys, so the step itself never retraces.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import optax

from tpugraph.configs.configs import TrainConfig
from tpugraph.models.align import AlignMTL
from tpugraph.sparse.build import build_adjacency
from tpugraph.sparse.graph import AlignTask
from tpugraph.train.eval import hits_at_k
from tpugraph.train.loop import TrainResult, load_task
from tpugraph.train.metrics import MetricsLogger, epoch_edge_ops
from tpugraph.train.negatives import sample_hard_negatives, sample_uniform_negatives


def _rel_batch(key, triples: jnp.ndarray, n_ent: int, k: int):
    """Corrupt tails and heads uniformly over the merged entity set."""
    t = triples.shape[0]
    kt, kh = jax.random.split(key)
    neg_t = jax.random.randint(kt, (t, k), 0, n_ent, dtype=jnp.int32)
    neg_h = jax.random.randint(kh, (t, k), 0, n_ent, dtype=jnp.int32)
    return neg_t, neg_h


def _attr_batch(key, attr_triples: jnp.ndarray, batch: int):
    idx = jax.random.randint(key, (batch,), 0, attr_triples.shape[0], dtype=jnp.int32)
    return jnp.take(attr_triples, idx, axis=0)


def fit_mtl(cfg: TrainConfig, task: AlignTask | None = None, verbose: bool = False) -> TrainResult:
    task = task or load_task(cfg)
    op = build_adjacency(
        task.n_ent, task.merged_triples, n_rel=task.n_rel,
        weighting=cfg.weighting, norm=cfg.norm, bucket=cfg.pad_bucket,
        fmt="ell" if cfg.spmm_impl in ("ell", "pallas") else "sorted",
    )
    attr_all = task.merged_attr_triples
    if (cfg.use_attr_head or cfg.use_attr_channel) and (attr_all is None or task.n_attr == 0):
        raise ValueError("attribute head/channel enabled but the task has no attribute triples")
    if cfg.use_sinkhorn and cfg.epochs > 0:
        # effective OT problem size: the cap only bites when it is set AND
        # smaller than the seed count (review r3: a 10k cap on 15k seeds
        # bypassed the original ==0 check and still died in remote compile).
        # epochs == 0 (eval-only, train/driver.evaluate) never compiles the
        # OT loss, so the guard would reject a legitimate big-seed eval.
        n_seed = len(task.train_pairs)
        ot_eff = min(cfg.sinkhorn_pairs, n_seed) if cfg.sinkhorn_pairs > 0 else n_seed
        if ot_eff > 8192:
            # the S×S OT cost matrix above ~8k fails the remote compiler
            # outright (measured round 3) and wastes memory well before
            # that; fail actionably rather than deep inside compilation
            raise ValueError(
                f"use_sinkhorn with an effective OT problem of {ot_eff} pairs "
                f"(seeds={n_seed}, sinkhorn_pairs={cfg.sinkhorn_pairs}) does "
                f"not compile at this scale — set sinkhorn_pairs <= 8192 "
                f"(e.g. 4096)")
    attr_op = None
    if cfg.use_attr_channel:
        from tpugraph.models.attr_channel import build_attr_operator

        attr_op = build_attr_operator(
            attr_all, task.n_ent, task.n_attr,
            fmt="ell" if cfg.spmm_impl in ("ell", "pallas") else "sorted", bucket=cfg.pad_bucket,
        )
    model = AlignMTL(n_ent=task.n_ent, n_rel=task.n_rel, n_attr=max(task.n_attr, 1), cfg=cfg)

    pairs = jnp.asarray(task.train_pairs)
    rel_triples = jnp.asarray(task.merged_triples)
    attr_triples = jnp.asarray(attr_all) if attr_all is not None else None
    n1, n = task.kg1.n_ent, task.n_ent
    attr_bs = min(8192, attr_triples.shape[0]) if attr_triples is not None else 0

    use_boot = cfg.boot_cap > 0
    if use_boot:
        import numpy as _np

        from tpugraph.train.bootstrap import propose_mutual_nn_pairs

        _m1 = _np.ones(n1, bool)
        _m1[task.train_pairs[:, 0]] = False
        _m2 = _np.ones(n - n1, bool)
        _m2[task.train_pairs[:, 1] - n1] = False
        boot_mask1, boot_mask2 = jnp.asarray(_m1), jnp.asarray(_m2)
        ones_seed = jnp.ones((pairs.shape[0],), jnp.float32)
        boot_placeholder = (
            jnp.tile(jnp.array([0, n1], jnp.int32), (cfg.boot_cap, 1)),
            jnp.zeros((cfg.boot_cap,), jnp.float32),
        )

        def propose(params):
            # proposals in EVAL space (SE, or combined SE‖AE) — same space
            # hard mining uses
            emb = model.apply({"params": params}, op, attr_op=attr_op,
                              method=model.embed)
            return propose_mutual_nn_pairs(
                emb, boot_mask1, boot_mask2, n1, n, cfg.boot_cap,
                metric=cfg.neg_metric, csls_k=cfg.boot_csls_k,
                approx=cfg.boot_approx)

    def make_batch(key, params=None, epoch=None):
        """params=None → init-time probe: uniform negatives + placeholder
        boot (same pytree structure as live batches).  ``epoch`` may be a
        traced int32 (fused path) — all branching on it is lax.cond."""
        ks = jax.random.split(key, 4)
        if use_boot and params is not None:
            bp, bw = jax.lax.cond(
                (epoch >= cfg.boot_start) & (epoch > 0),
                lambda _: propose(params), lambda _: boot_placeholder, None)
            pairs_m = jnp.concatenate([pairs, bp], 0)
            w = jnp.concatenate([ones_seed, bw * cfg.boot_weight], 0)
        elif use_boot:
            pairs_m = jnp.concatenate([pairs, boot_placeholder[0]], 0)
            w = jnp.concatenate([ones_seed, boot_placeholder[1]], 0)
        else:
            pairs_m, w = pairs, None
        if cfg.neg_mode == "hard" and params is not None:
            def mine(_):
                emb = model.apply({"params": params}, op, attr_op=attr_op,
                                  method=model.embed)
                return sample_hard_negatives(emb, pairs_m, n1, n, cfg.k_neg,
                                             metric=cfg.neg_metric,
                                             approx=cfg.neg_approx,
                                             csls_k=cfg.neg_csls_k)

            def uni(_):
                return sample_uniform_negatives(ks[0], pairs_m, n1, n, cfg.k_neg)

            neg_l, neg_r = jax.lax.cond(epoch > 0, mine, uni, None)
        else:
            neg_l, neg_r = sample_uniform_negatives(ks[0], pairs_m, n1, n, cfg.k_neg)
        batch = {"pairs": pairs, "neg_l": neg_l, "neg_r": neg_r}
        if cfg.use_sinkhorn and 0 < cfg.sinkhorn_pairs < pairs.shape[0]:
            # static-shape per-interval subsample for the OT head
            sub = jax.random.choice(ks[3], pairs.shape[0],
                                    (cfg.sinkhorn_pairs,), replace=False)
            batch["ot_pairs"] = jnp.take(pairs, sub, axis=0)
        if use_boot:
            batch["pairs_aug"], batch["w"] = pairs_m, w
        if cfg.use_rel_head:
            batch["rel_neg_t"], batch["rel_neg_h"] = _rel_batch(ks[1], rel_triples, n, cfg.rel_k_neg)
            batch["rel_triples"] = rel_triples
        if cfg.use_attr_head:
            batch["attr_triples"] = _attr_batch(ks[2], attr_triples, attr_bs)
        return batch

    base_key = jax.random.PRNGKey(cfg.seed)
    params = model.init(jax.random.fold_in(base_key, 2**30), op,
                        make_batch(jax.random.fold_in(base_key, 2**31 - 1)),
                        attr_op=attr_op)["params"]
    from tpugraph.train.optim import make_tx

    tx = make_tx(cfg)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, step_key):
        rngs = {"dropout": step_key} if cfg.dropout > 0 else None
        (loss, aux), grads = jax.value_and_grad(
            lambda p, b: model.apply({"params": p}, op, b, train=True, rngs=rngs,
                                     attr_op=attr_op),
            has_aux=True,
        )(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    make_batch_live = jax.jit(lambda key, params, epoch: make_batch(key, params, epoch))

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
            f"run would silently train past cfg.epochs — adjust one of them")

    @jax.jit
    def train_interval(params, opt_state, epoch0):
        """Fused resample + neg_every steps (see train/loop.py rationale)."""
        bk = jax.random.fold_in(base_key, epoch0)
        batch = make_batch(bk, params, epoch0)

        def body(carry, i):
            params, opt_state = carry
            sk = jax.random.fold_in(base_key, 2**29 + epoch0 + i)
            rngs = {"dropout": sk} if cfg.dropout > 0 else None
            (loss, aux), grads = jax.value_and_grad(
                lambda p, b: model.apply({"params": p}, op, b, train=True, rngs=rngs,
                                         attr_op=attr_op),
                has_aux=True,
            )(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), (loss, aux)

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps)
        )
        return params, opt_state, losses[-1], jax.tree_util.tree_map(lambda a: a[-1], auxs), batch

    @jax.jit
    def embed(params):
        return model.apply({"params": params}, op, attr_op=attr_op, method=model.embed)

    from tpugraph.train.checkpoint import Checkpointer, abstract_like

    ckpt = Checkpointer(cfg.checkpoint_dir, cfg.checkpoint_every)
    ckpt.install_preemption_handler()
    start_epoch = 0
    batch = None
    # state includes the batch: hard-mode resume mid-interval must reuse the
    # interval-boundary negatives/corruptions (see train/loop.py)
    probe_batch = make_batch(jax.random.fold_in(base_key, 2**31 - 2))
    restored_loss = None
    restored = ckpt.restore_latest(abstract_like(
        {"params": params, "opt_state": opt_state, "batch": probe_batch,
         "loss": jax.ShapeDtypeStruct((), jnp.float32)}))
    if restored is not None:
        start_epoch, state = restored
        start_epoch += 1
        if steps > 1 and start_epoch % steps:
            raise ValueError(
                f"checkpoint at {cfg.checkpoint_dir!r} resumes at epoch "
                f"{start_epoch}, mid-interval for steps_per_call={steps} — "
                f"it was saved under steps_per_call=1; resume with "
                f"steps_per_call=1 or retrain (see train/loop.py)")
        params, opt_state, batch = state["params"], state["opt_state"], state["batch"]
        restored_loss = jnp.asarray(state["loss"])

    logger = MetricsLogger(cfg.metrics_path, config=cfg.to_dict(), tb_dir=cfg.tb_dir)
    history = []
    # a relaunch of a completed run reports the checkpointed loss, not nan
    # (same convention as fit()/fit_distributed)
    loss = restored_loss if restored_loss is not None else jnp.nan
    t_start = time.perf_counter()
    for epoch in range(start_epoch, cfg.epochs, steps):
        if steps > 1:
            params, opt_state, loss, aux, batch = train_interval(
                params, opt_state, jnp.int32(epoch)
            )
        else:
            if epoch % cfg.neg_every == 0 or batch is None:
                # epoch-derived keys: deterministic across restarts and hosts
                bk = jax.random.fold_in(base_key, epoch - epoch % cfg.neg_every)
                batch = make_batch_live(bk, params, jnp.int32(epoch))
            params, opt_state, loss, aux = train_step(
                params, opt_state, batch, jax.random.fold_in(base_key, 2**29 + epoch)
            )
        last = epoch + steps - 1
        def _save_ckpt(at_epoch):
            ckpt.maybe_save(at_epoch, {"params": params, "opt_state": opt_state,
                                       "batch": batch,
                                       "loss": jnp.asarray(loss, jnp.float32)},
                            force=True)

        if ckpt.enabled and (
            (last > 0 and last % cfg.checkpoint_every < steps) or last >= cfg.epochs - 1
            or ckpt.preempted
        ):
            _save_ckpt(last)
        if cfg.eval_every and (last % cfg.eval_every < steps or last >= cfg.epochs - 1):
            m = hits_at_k(embed(params), jnp.asarray(task.test_pairs),
                          csls_k=cfg.eval_csls_k, approx_k=cfg.eval_approx_k)
            wall = time.perf_counter() - t_start
            rec = {
                "epoch": last,
                "wall_s": round(wall, 3),
                "edges_per_s": round(
                    # epochs run in THIS process — see train/loop.py note
                    epoch_edge_ops(op.nnz, cfg.use_attr_channel)
                    * (last + 1 - start_epoch)
                    / max(wall, 1e-9), 1),
                **{f"loss_{k}": float(v) for k, v in aux.items()},
                **{k: round(v, 4) for k, v in m.items()},
            }
            history.append(rec)
            logger.log(rec)
            if verbose:
                parts = " ".join(f"{k}={float(v):.4f}" for k, v in aux.items())
                print(f"[mtl:{cfg.name}] epoch {last} {parts} hits@1 {m['hits@1']:.3f}")
        if ckpt.preempted:
            # latch may fire after the save block's check (e.g. during eval)
            if ckpt.enabled:
                _save_ckpt(last)
            break  # exit cleanly for relaunch
    ckpt.restore_handler()
    ckpt.close()  # flush async saves (the emergency one especially)
    final = hits_at_k(embed(params), jnp.asarray(task.test_pairs), csls_k=cfg.eval_csls_k)
    final["final_loss"] = float(loss)
    if cfg.save_emb_path:  # hand the table to the serving path (tpugraph.serve)
        from tpugraph.serve import save_embeddings

        save_embeddings(cfg.save_emb_path, embed(params))
    logger.close()
    return TrainResult(params=params, metrics=final, history=history, op=op, model=model, task=task)
