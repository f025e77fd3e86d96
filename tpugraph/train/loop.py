"""Full-graph training loop (reference family train.py — SURVEY.md §3.1).

Functional JAX trainer: one jitted train step per epoch over the whole merged
graph, periodic on-device negative resampling, blockwise Hits@k eval.
Everything inside the step is traced once; negatives are resampled by a
separate jitted function so the hot step never retraces.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from tpugraph.configs.configs import TrainConfig
from tpugraph.data.dbp15k import load_dbp15k
from tpugraph.data.synthetic import synthetic_align_task
from tpugraph.models.encoder import AlignGCN
from tpugraph.sparse.build import build_adjacency
from tpugraph.sparse.graph import AlignTask, SpMMOperator
from tpugraph.train.eval import hits_at_k
from tpugraph.train.losses import margin_align_loss
from tpugraph.train.metrics import MetricsLogger, epoch_edge_ops
from tpugraph.train.negatives import sample_hard_negatives, sample_uniform_negatives


def eager_cond(pred, then, orelse):
    """Python-if control-flow style for the interval builders shared between
    the eager and fused dispatch paths (VERDICT r2 Next #5: one batch
    construction, two control-flow styles — see ``interval_negs`` here and
    ``interval_batch`` in dist/trainer.py)."""
    return then() if pred else orelse()


def traced_cond(pred, then, orelse):
    """lax.cond counterpart of ``eager_cond`` for traced epoch arguments."""
    return jax.lax.cond(pred, lambda _: then(), lambda _: orelse(), None)


@dataclass
class TrainResult:
    params: Any
    metrics: dict
    history: list = field(default_factory=list)
    op: SpMMOperator | None = None
    model: AlignGCN | None = None
    task: AlignTask | None = None


def load_task(cfg: TrainConfig) -> AlignTask:
    if cfg.dataset == "synthetic":
        return synthetic_align_task(
            seed=cfg.syn_seed,
            n_ent=cfg.syn_n_ent,
            n_rel=cfg.syn_n_rel,
            n_triples=cfg.syn_n_triples,
            drop_frac=cfg.syn_drop_frac,
            noise_frac=cfg.syn_noise_frac,
            train_ratio=cfg.train_ratio,
            name=f"synthetic-{cfg.pair}",
        )
    if cfg.dataset == "dbp15k":
        return load_dbp15k(cfg.data_root, cfg.pair, train_ratio=cfg.train_ratio, seed=cfg.seed)
    if cfg.dataset == "openea":
        from tpugraph.data.openea import load_openea

        # openea_fold selects the official 721_5fold split (0 = seeded
        # train_ratio split); previously fold 1 was hardwired and
        # train_ratio/seed silently ignored whenever folds existed on disk
        return load_openea(cfg.data_root, train_ratio=cfg.train_ratio,
                           seed=cfg.seed,
                           fold=cfg.openea_fold if cfg.openea_fold > 0 else None)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def build_model(cfg: TrainConfig, task: AlignTask) -> AlignGCN:
    return AlignGCN(
        n_ent=task.n_ent,
        dim=cfg.dim,
        hidden=cfg.hidden,
        highway=cfg.highway,
        dropout=cfg.dropout,
        spmm_impl=cfg.spmm_impl,
        compute_dtype=cfg.param_dtype,
        l2_normalize=cfg.l2_normalize,
    )


def fit(
    cfg: TrainConfig,
    task: AlignTask | None = None,
    extra_loss_fn: Callable | None = None,
    verbose: bool = False,
) -> TrainResult:
    """Train an AlignGCN per config; returns final params + eval metrics.

    ``extra_loss_fn(emb, params) -> (loss, aux_dict)`` lets the MTL driver
    (train/mtl.py) add head losses without forking this loop.
    """
    task = task or load_task(cfg)
    op = build_adjacency(
        task.n_ent,
        task.merged_triples,
        n_rel=task.n_rel,
        weighting=cfg.weighting,
        norm=cfg.norm,
        bucket=cfg.pad_bucket,
        fmt="ell" if cfg.spmm_impl in ("ell", "pallas") else "sorted",
    )
    model = build_model(cfg, task)
    base_key = jax.random.PRNGKey(cfg.seed)
    params = model.init(jax.random.fold_in(base_key, 2**30), op)["params"]

    from tpugraph.train.optim import make_tx

    tx = make_tx(cfg)
    opt_state = tx.init(params)

    pairs = jnp.asarray(task.train_pairs)
    n1, n = task.kg1.n_ent, task.n_ent
    s_seed = pairs.shape[0]

    use_boot = cfg.boot_cap > 0
    if use_boot:
        import numpy as _np

        from tpugraph.train.bootstrap import propose_mutual_nn_pairs

        _m1 = _np.ones(n1, bool)
        _m1[task.train_pairs[:, 0]] = False
        _m2 = _np.ones(n - n1, bool)
        _m2[task.train_pairs[:, 1] - n1] = False
        mask1, mask2 = jnp.asarray(_m1), jnp.asarray(_m2)
        ones_seed = jnp.ones((s_seed,), jnp.float32)
        boot_placeholder = (
            jnp.tile(jnp.array([0, n1], jnp.int32), (cfg.boot_cap, 1)),
            jnp.zeros((cfg.boot_cap,), jnp.float32),
        )

        def propose(params):
            emb = model.apply({"params": params}, op)
            return propose_mutual_nn_pairs(
                emb, mask1, mask2, n1, n, cfg.boot_cap,
                metric=cfg.neg_metric, csls_k=cfg.boot_csls_k,
                approx=cfg.boot_approx)

        propose_jit = jax.jit(propose)

        def with_boot(bp, bw):
            return (jnp.concatenate([pairs, bp], 0),
                    jnp.concatenate([ones_seed, bw * cfg.boot_weight], 0))

    def loss_fn(params, pairs_t, weights, neg_l, neg_r, step_key):
        rngs = {"dropout": step_key} if cfg.dropout > 0 else None
        emb = model.apply({"params": params}, op, train=True, rngs=rngs)
        loss = margin_align_loss(emb, pairs_t, neg_l, neg_r, cfg.gamma, weights)
        aux = {"margin": loss}
        if extra_loss_fn is not None:
            extra, extra_aux = extra_loss_fn(emb, params)
            loss = loss + extra
            aux.update(extra_aux)
        return loss, aux

    @jax.jit
    def train_step(params, opt_state, pairs_t, weights, neg_l, neg_r, step_key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pairs_t, weights, neg_l, neg_r, step_key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    steps = max(1, cfg.steps_per_call)
    if cfg.neg_every < 1:
        raise ValueError(
            "neg_every must be >= 1 (negatives are resampled per interval; "
            "to effectively never resample, set neg_every >= epochs) — 0 "
            "previously died as a ZeroDivisionError (round-4b loop review)")
    if steps > 1 and steps != cfg.neg_every:
        raise ValueError("steps_per_call > 1 requires steps_per_call == neg_every "
                         "(one fused dispatch per resample interval)")
    if steps > 1 and cfg.epochs % steps:
        raise ValueError(
            f"epochs={cfg.epochs} is not a multiple of steps_per_call={steps}: "
            f"the fused interval always runs a full {steps}-epoch scan, so the "
            f"run would silently train past cfg.epochs — adjust one of them")
    if steps > 1 and cfg.profile_dir:
        raise ValueError("profile_dir requires steps_per_call=1 (per-epoch trace windows)")

    @jax.jit
    def resample_hard(params, pairs_t):
        emb = model.apply({"params": params}, op)
        return sample_hard_negatives(emb, pairs_t, n1, n, cfg.k_neg, metric=cfg.neg_metric,
                                     approx=cfg.neg_approx, csls_k=cfg.neg_csls_k)

    def interval_negs(epoch, p, cond):
        """Boot proposal + negative (re)sampling for the interval starting at
        ``epoch`` — ONE construction shared by the eager and fused dispatch
        modes (``cond`` = eager_cond / traced_cond).  The uniform key folds
        the interval-aligned epoch so a resume mid-interval reproduces the
        same negatives.  Returns (pairs_t, weights, neg_l, neg_r, boot).

        Known cost (eager mode only, boot+hard): propose_jit and
        resample_hard are separate dispatches, each running the encoder
        forward — two GCN forwards per interval boundary.  The fused path
        (steps_per_call > 1 — every adopted --fast recipe) traces both into
        ONE jit where XLA CSEs the identical forwards; not worth a shared
        staging rewrite for the eager path (round-4b loop review)."""
        if use_boot:
            boot = cond((epoch >= cfg.boot_start) & (epoch > 0),
                        lambda: propose_jit(p), lambda: boot_placeholder)
            pairs_t, weights = with_boot(*boot)
        else:
            boot = None
            pairs_t, weights = pairs, None

        def uni_negs():
            nk = jax.random.fold_in(base_key, epoch - epoch % cfg.neg_every)
            return sample_uniform_negatives(nk, pairs_t, n1, n, cfg.k_neg)

        if cfg.neg_mode == "hard":
            neg_l, neg_r = cond(epoch > 0, lambda: resample_hard(p, pairs_t), uni_negs)
        else:
            neg_l, neg_r = uni_negs()
        return pairs_t, weights, neg_l, neg_r, boot

    @jax.jit
    def train_interval(params, opt_state, epoch0):
        """One resample interval — negative (re)sampling + neg_every train
        steps — fused into a single dispatch (lax.scan): per-dispatch tunnel
        latency (~0.4 s here) otherwise dominates the ~40 ms/epoch compute
        at DBP15K scale.  Semantics identical to the unfused path (bitwise
        test in tests/test_train_e2e.py)."""
        pairs_t, weights, neg_l, neg_r, _ = interval_negs(epoch0, params, traced_cond)

        def body(carry, i):
            params, opt_state = carry
            sk = jax.random.fold_in(base_key, 2**29 + epoch0 + i)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, pairs_t, weights, neg_l, neg_r, sk
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), (loss, aux)

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps)
        )
        last_aux = jax.tree_util.tree_map(lambda a: a[-1], auxs)
        return params, opt_state, losses[-1], last_aux

    @jax.jit
    def embed(params):
        return model.apply({"params": params}, op)

    from tpugraph.train.checkpoint import Checkpointer, abstract_like

    ckpt = Checkpointer(cfg.checkpoint_dir, cfg.checkpoint_every)
    ckpt.install_preemption_handler()
    start_epoch = 0
    # negatives are part of the state: a resume mid-interval must reuse the
    # interval-boundary negatives (hard mode mines from boundary params —
    # unreconstructable after the boundary; uniform is key-pinned but saved
    # too for uniformity).  With bootstrapping, the boundary's proposed pairs
    # are state for the same reason.
    s_all = s_seed + (cfg.boot_cap if use_boot else 0)
    neg_shape = jax.ShapeDtypeStruct((s_all, cfg.k_neg), jnp.int32)
    state = {"params": params, "opt_state": opt_state,
             "neg_l": neg_shape, "neg_r": neg_shape,
             "loss": jax.ShapeDtypeStruct((), jnp.float32)}
    if use_boot:
        state["boot_pairs"] = jax.ShapeDtypeStruct((cfg.boot_cap, 2), jnp.int32)
        state["boot_w"] = jax.ShapeDtypeStruct((cfg.boot_cap,), jnp.float32)
    restored_negs = None
    restored_boot = None
    restored_loss = None
    try:
        restored = ckpt.restore_latest(abstract_like(state))
    except Exception as e:
        # pre-round-4 single-chip checkpoints (params+opt_state only) fail
        # the structure match opaquely — same actionable conversion as
        # dist/trainer.py, confirmed from the on-disk metadata, not the
        # exception text (round-4b loop review)
        if ckpt.latest_has_key("loss") is False:
            raise ValueError(
                f"checkpoint at {cfg.checkpoint_dir!r} predates the resume "
                f"state (loss + interval negatives) — resuming it would "
                f"re-mine the interval batch from the restored params and "
                f"silently diverge; retrain or point checkpoint_dir "
                f"elsewhere") from e
        raise
    if restored is not None:
        start_epoch, state = restored
        start_epoch += 1
        if steps > 1 and start_epoch % steps:
            raise ValueError(
                f"checkpoint at {cfg.checkpoint_dir!r} resumes at epoch "
                f"{start_epoch}, mid-interval for steps_per_call={steps} — "
                f"it was saved under steps_per_call=1 (fused chunks always "
                f"save at interval ends); resume with steps_per_call=1 or "
                f"retrain.  A misaligned fused resume would silently train "
                f"past cfg.epochs with wrong interval keys (round-4b loop "
                f"review)")
        params, opt_state = state["params"], state["opt_state"]
        restored_negs = (state["neg_l"], state["neg_r"])
        if use_boot:
            restored_boot = (state["boot_pairs"], state["boot_w"])
        restored_loss = state["loss"]

    logger = MetricsLogger(cfg.metrics_path, config=cfg.to_dict(), tb_dir=cfg.tb_dir)
    history = []
    neg_l, neg_r = restored_negs if restored_negs is not None else (None, None)
    if use_boot:
        cur_boot = restored_boot if restored_boot is not None else boot_placeholder
        pairs_t, weights = with_boot(*cur_boot)
    else:
        cur_boot = None
        pairs_t, weights = pairs, None
    nnz = op.nnz  # full logical edge count (incl. any split-out diagonal)
    loss = restored_loss if restored_loss is not None else jnp.nan
    trace_on = False  # start/stop must pair even if the loop ends early
    t_start = time.perf_counter()
    for epoch in range(start_epoch, cfg.epochs, steps):
        if steps == 1 and (epoch % cfg.neg_every == 0 or neg_l is None):
            # keys derived from (seed, epoch): deterministic across restarts
            # and identical on every host (SURVEY.md §7 hard part 6)
            pairs_t, weights, neg_l, neg_r, boot = interval_negs(
                epoch, params, eager_cond)
            if use_boot:
                cur_boot = boot
        if cfg.profile_dir and epoch == start_epoch + 2:
            jax.profiler.start_trace(cfg.profile_dir)
            trace_on = True
        if steps > 1:
            params, opt_state, loss, aux = train_interval(
                params, opt_state, jnp.int32(epoch)
            )
        else:
            params, opt_state, loss, aux = train_step(
                params, opt_state, pairs_t, weights, neg_l, neg_r,
                jax.random.fold_in(base_key, 2**29 + epoch),
            )
        if trace_on and epoch >= start_epoch + 5:
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()
            trace_on = False
        last_of_chunk = epoch + steps - 1
        # window form (matches the eval condition): with steps > 1 the chunk
        # ends are ≡ steps-1 (mod steps), so an exact `% every == 0` test
        # would never fire
        def _save_ckpt(at_epoch):
            if steps > 1:
                # fused mode: chunks ARE resample intervals, so a resume at
                # the chunk boundary re-mines (and re-proposes) identically;
                # placeholder negs/boot
                nl_s = nr_s = jnp.zeros((s_all, cfg.k_neg), jnp.int32)
                boot_s = boot_placeholder if use_boot else None
            else:
                nl_s, nr_s = neg_l, neg_r
                boot_s = cur_boot
            save_state = {"params": params, "opt_state": opt_state,
                          "neg_l": nl_s, "neg_r": nr_s,
                          "loss": jnp.float32(loss)}
            if use_boot:
                save_state["boot_pairs"], save_state["boot_w"] = boot_s
            ckpt.maybe_save(at_epoch, save_state, force=True)

        hit_window = ckpt.enabled and last_of_chunk > 0 and (
            last_of_chunk % cfg.checkpoint_every < steps)
        if ckpt.enabled and (hit_window or last_of_chunk >= cfg.epochs - 1
                             or ckpt.preempted):
            _save_ckpt(last_of_chunk)
        if cfg.eval_every and (last_of_chunk % cfg.eval_every < steps
                               or last_of_chunk >= cfg.epochs - 1):
            m = hits_at_k(embed(params), jnp.asarray(task.test_pairs),
                          csls_k=cfg.eval_csls_k, approx_k=cfg.eval_approx_k)
            wall = time.perf_counter() - t_start
            rec = {
                "epoch": last_of_chunk,
                "loss": float(loss),
                "wall_s": round(wall, 3),
                "edges_per_s": round(
                    # epochs RUN IN THIS PROCESS (wall covers only those): after
                    # a resume, (last + 1) would overstate by the pre-resume
                    # epochs — up to checkpoint_every× (round-4b trainer review)
                    epoch_edge_ops(nnz) * (last_of_chunk + 1 - start_epoch)
                    / max(wall, 1e-9), 1),
                **{k: round(v, 4) for k, v in m.items()},
            }
            history.append(rec)
            logger.log(rec)
            if verbose:
                print(
                    f"[fit:{cfg.name}] epoch {last_of_chunk} loss {rec['loss']:.4f} "
                    f"hits@1 {m['hits@1']:.3f} hits@10 {m['hits@10']:.3f}"
                )
        if ckpt.preempted:
            # the latch may have fired AFTER the save block above ran its
            # check (e.g. during eval) — save now; idempotent if it did run
            if ckpt.enabled:
                _save_ckpt(last_of_chunk)
            break  # exit cleanly for relaunch
    if trace_on:
        # fewer than 6 epochs remained after the trace started (short run,
        # resume near cfg.epochs, or preemption): stop here or the trace is
        # never written and the profiler keeps running (ADVICE r3 item 2)
        jax.block_until_ready(loss)
        jax.profiler.stop_trace()
        trace_on = False
    ckpt.restore_handler()
    ckpt.close()  # flush async saves (the emergency one especially)
    final_emb = embed(params)  # one forward shared by final eval AND export
    final = hits_at_k(final_emb, jnp.asarray(task.test_pairs), csls_k=cfg.eval_csls_k)
    final["final_loss"] = float(loss)
    if cfg.save_emb_path:  # hand the table to the serving path (tpugraph.serve)
        from tpugraph.serve import save_embeddings

        save_embeddings(cfg.save_emb_path, final_emb)
    logger.close()
    return TrainResult(params=params, metrics=final, history=history, op=op, model=model, task=task)
