"""PyTorch-CPU parity oracle — the stand-in for the absent reference.

The reference mount was empty at survey time (SURVEY.md §0), so this module
is a faithful ~200-LoC PyTorch reimplementation of the reference *family*
(pygcn → GCN-Align lineage: sparse-COO SpMM GraphConvolution, 2-layer GCN
encoder over the merged KG pair, optional highway gates, margin-based
negative-sampling alignment loss, Hits@k evaluation).  BASELINE.json requires
"per-layer activations allclose against the PyTorch reference"; this is that
reference.  Its measured Hits@1/@10 are recorded in BASELINE.md and the JAX
framework must match them.

Deliberately torch-idiomatic (torch.sparse COO + torch.spmm, dense cdist
eval) — this file is the *oracle*, not the product; keep it boring.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tpugraph.sparse.build import coo_from_triples, coo_normalize
from tpugraph.sparse.graph import AlignTask


def build_torch_adj(
    n_ent: int,
    triples: np.ndarray,
    n_rel: int | None = None,
    weighting: str = "uniform",
    norm: str = "sym",
) -> torch.Tensor:
    """Same host-side adjacency pipeline, materialized as torch.sparse COO."""
    src, dst, w = coo_from_triples(n_ent, triples, n_rel=n_rel, weighting=weighting)
    w = coo_normalize(src, dst, w, n_ent, norm=norm)
    idx = torch.from_numpy(np.stack([dst, src]).astype(np.int64))
    val = torch.from_numpy(w.astype(np.float32))
    return torch.sparse_coo_tensor(idx, val, (n_ent, n_ent)).coalesce()


class TorchGraphConvolution(nn.Module):
    """out = act(spmm(adj, x @ W) + b) — the family's layers.py layer."""

    def __init__(self, in_dim: int, out_dim: int, bias: bool = True):
        super().__init__()
        self.weight = nn.Parameter(torch.empty(in_dim, out_dim))
        self.bias = nn.Parameter(torch.zeros(out_dim)) if bias else None
        nn.init.xavier_uniform_(self.weight)

    def forward(self, x: torch.Tensor, adj: torch.Tensor) -> torch.Tensor:
        support = x @ self.weight
        out = torch.spmm(adj, support)
        if self.bias is not None:
            out = out + self.bias
        return out


class TorchHighway(nn.Module):
    """h' = T ⊙ h + (1 − T) ⊙ x,  T = σ(x W_T + b_T)."""

    def __init__(self, dim: int):
        super().__init__()
        self.lin = nn.Linear(dim, dim)
        nn.init.xavier_uniform_(self.lin.weight)
        nn.init.zeros_(self.lin.bias)

    def forward(self, x: torch.Tensor, h: torch.Tensor) -> torch.Tensor:
        t = torch.sigmoid(self.lin(x))
        return t * h + (1.0 - t) * x


class TorchGCN(nn.Module):
    """2-layer GCN encoder over trainable entity embeddings (+ highway opt)."""

    def __init__(self, n_ent: int, dim: int, hidden: int | None = None, highway: bool = False,
                 dropout: float = 0.0):
        super().__init__()
        hidden = hidden or dim
        self.emb = nn.Parameter(torch.empty(n_ent, dim))
        nn.init.normal_(self.emb, std=1.0 / dim**0.5)
        self.gc1 = TorchGraphConvolution(dim, hidden)
        self.gc2 = TorchGraphConvolution(hidden, dim)
        self.highway = highway
        if highway:
            self.hw1 = TorchHighway(hidden)
            self.hw2 = TorchHighway(dim)
        self.dropout = dropout

    def layer_activations(self, adj: torch.Tensor) -> list[torch.Tensor]:
        """Per-layer activations, for the allclose parity harness."""
        acts = [self.emb]
        h = F.relu(self.gc1(self.emb, adj))
        if self.highway and h.shape == self.emb.shape:
            h = self.hw1(self.emb, h)
        acts.append(h)
        h2 = self.gc2(F.dropout(h, self.dropout, self.training), adj)
        if self.highway:
            h2 = self.hw2(h, h2)
        acts.append(h2)
        return acts

    def forward(self, adj: torch.Tensor) -> torch.Tensor:
        return self.layer_activations(adj)[-1]


def margin_align_loss(
    emb: torch.Tensor,
    pairs: torch.Tensor,  # (S, 2) long
    neg_l: torch.Tensor,  # (S, k) long — corruptions of the right side's partner
    neg_r: torch.Tensor,  # (S, k) long — corruptions of the left side's partner
    gamma: float = 3.0,
    weights: torch.Tensor | None = None,  # (S,) per-pair weight; None = uniform
) -> torch.Tensor:
    """Margin ranking loss with k negatives per side (L1 distance).

    ``weights`` mirrors tpugraph.train.losses.margin_align_loss: each side's
    mean becomes Σ w·ReLU / (Σ w · k) (bootstrapped-pair augmentation)."""
    e_l, e_r = emb[pairs[:, 0]], emb[pairs[:, 1]]
    d_pos = (e_l - e_r).abs().sum(-1, keepdim=True)  # (S, 1)
    d_neg_r = (e_l.unsqueeze(1) - emb[neg_r]).abs().sum(-1)  # (S, k)
    d_neg_l = (emb[neg_l] - e_r.unsqueeze(1)).abs().sum(-1)  # (S, k)
    h_r = F.relu(d_pos + gamma - d_neg_r)
    h_l = F.relu(d_pos + gamma - d_neg_l)
    if weights is None:
        return 0.5 * (h_r.mean() + h_l.mean())
    w = weights.unsqueeze(1)
    denom = weights.sum().clamp_min(1e-9) * neg_r.shape[1]
    return 0.5 * ((w * h_r).sum() + (w * h_l).sum()) / denom


def sample_negatives(rng: np.random.Generator, pairs: np.ndarray, n_ent_1: int, n_ent: int,
                     k: int) -> tuple[np.ndarray, np.ndarray]:
    """Corrupt left side within KG1 ids, right side within KG2 global ids."""
    s = len(pairs)
    neg_l = rng.integers(0, n_ent_1, size=(s, k))
    neg_r = rng.integers(n_ent_1, n_ent, size=(s, k))
    return neg_l.astype(np.int64), neg_r.astype(np.int64)


def sample_hard_negatives(emb: torch.Tensor, pairs: np.ndarray, n_ent_1: int, n_ent: int,
                          k: int, csls_k: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Truncated nearest-neighbour negatives (HGCN/RDGCN-style ε-sampling):
    for each seed pair, the k embedding-space-closest non-partner entities of
    the opposite KG.  Dense cdist over the candidate pools (fine on CPU at
    DBP15K scale; the JAX side does this blockwise on device).

    csls_k > 0 ranks by the CSLS-adjusted score 2·d(q,j) − r(j), with r(j) the
    candidate's mean distance to its csls_k nearest queries (hubness computed
    on UNMASKED distances; the per-row query-side term cancels in a row's
    top-k).  Mirrors tpugraph.train.negatives.sample_hard_negatives."""
    with torch.no_grad():
        l = emb[torch.from_numpy(pairs[:, 0].astype(np.int64))]
        r = emb[torch.from_numpy(pairs[:, 1].astype(np.int64))]
        cand_l = emb[:n_ent_1]  # KG1 entities
        cand_r = emb[n_ent_1:n_ent]  # KG2 entities
        # negatives for the right slot: KG2 entities closest to e_l
        d_lr = torch.cdist(l, cand_r, p=1)
        if csls_k > 0:
            hub = d_lr.topk(csls_k, dim=0, largest=False).values.mean(0)
            d_lr = 2.0 * d_lr - hub.unsqueeze(0)
        d_lr[torch.arange(len(pairs)), torch.from_numpy(pairs[:, 1] - n_ent_1).long()] = float("inf")
        neg_r = d_lr.topk(k, largest=False).indices.numpy() + n_ent_1
        # negatives for the left slot: KG1 entities closest to e_r
        d_rl = torch.cdist(r, cand_l, p=1)
        if csls_k > 0:
            hub = d_rl.topk(csls_k, dim=0, largest=False).values.mean(0)
            d_rl = 2.0 * d_rl - hub.unsqueeze(0)
        d_rl[torch.arange(len(pairs)), torch.from_numpy(pairs[:, 0]).long()] = float("inf")
        neg_l = d_rl.topk(k, largest=False).indices.numpy()
    return neg_l.astype(np.int64), neg_r.astype(np.int64)


def propose_mutual_nn_pairs(emb: torch.Tensor, mask1: np.ndarray, mask2: np.ndarray,
                            n1: int, n: int, cap: int, csls_k: int = 0
                            ) -> tuple[np.ndarray, np.ndarray]:
    """BootEA/MRAEA-style stateless mutual-NN pair proposal — mirrors
    tpugraph.train.bootstrap.propose_mutual_nn_pairs (dense cdist oracle).

    Returns (pairs (cap, 2) global ids, weight (cap,) in {0,1})."""
    with torch.no_grad():
        cand1, cand2 = emb[:n1], emb[n1:n]
        d = torch.cdist(cand1, cand2, p=1)  # (n1, n2)
        if csls_k > 0:
            hub2 = d.topk(csls_k, dim=0, largest=False).values.mean(0)  # (n2,)
            hub1 = d.topk(csls_k, dim=1, largest=False).values.mean(1)  # (n1,)
            s12 = 2.0 * d - hub2.unsqueeze(0)
            s21 = 2.0 * d.T - hub1.unsqueeze(0)
        else:
            s12, s21 = d, d.T
        m1 = torch.from_numpy(mask1.astype(bool))
        m2 = torch.from_numpy(mask2.astype(bool))
        s12 = s12.masked_fill(~m2.unsqueeze(0), float("inf"))
        s21 = s21.masked_fill(~m1.unsqueeze(0), float("inf"))
        v12, i12 = s12.min(dim=1)
        i21 = s21.argmin(dim=1)
        mutual = m1 & (i21[i12] == torch.arange(n1))
        score = torch.where(mutual, v12, torch.tensor(float("inf")))
        vals, left = score.topk(min(cap, n1), largest=False)
        left = left[: cap]
        vals = vals[: cap]
        weight = torch.isfinite(vals).float()
        right = i12[left] + n1
        pairs = torch.stack([left, right], dim=1)
        pairs[weight == 0] = torch.tensor([0, n1])
        if cap > n1:  # pad (tiny graphs)
            pad = cap - n1
            pairs = torch.cat([pairs, torch.tensor([[0, n1]]).repeat(pad, 1)], 0)
            weight = torch.cat([weight, torch.zeros(pad)], 0)
    return pairs.numpy().astype(np.int64), weight.numpy().astype(np.float32)


def get_hits(emb: torch.Tensor, test_pairs: np.ndarray, ks=(1, 10), csls_k: int = 0) -> dict:
    """Family-style eval: dense cityblock cdist over test entities, both
    directions; csls_k > 0 applies the CSLS hubness correction (mirrors
    tpugraph.train.eval semantics)."""
    with torch.no_grad():
        l = emb[torch.from_numpy(test_pairs[:, 0].astype(np.int64))]
        r = emb[torch.from_numpy(test_pairs[:, 1].astype(np.int64))]
        d = torch.cdist(l, r, p=1)  # (S, S)
        if csls_k > 0:
            rl = d.topk(csls_k, dim=1, largest=False).values.mean(1)  # left hubness
            rr = d.topk(csls_k, dim=0, largest=False).values.mean(0)  # right hubness
            d = 2.0 * d - rl.unsqueeze(1) - rr.unsqueeze(0)
        out = {}
        for axis, tag in ((1, "l2r"), (0, "r2l")):
            ranks = (d < d.diagonal().unsqueeze(axis)).sum(dim=axis)
            for k in ks:
                out[f"hits@{k}_{tag}"] = float((ranks < k).float().mean())
            out[f"mrr_{tag}"] = float((1.0 / (ranks.float() + 1.0)).mean())
        for k in ks:
            out[f"hits@{k}"] = 0.5 * (out[f"hits@{k}_l2r"] + out[f"hits@{k}_r2l"])
        out["mrr"] = 0.5 * (out["mrr_l2r"] + out["mrr_r2l"])
    return out


def train_oracle(
    task: AlignTask,
    dim: int = 128,
    epochs: int = 400,
    lr: float = 2e-3,
    gamma: float = 10.0,
    k_neg: int = 50,
    neg_every: int = 5,
    weighting: str = "uniform",
    norm: str = "sym",
    highway: bool = False,
    neg_mode: str = "hard",  # 'uniform' | 'hard'
    neg_csls_k: int = 0,  # >0: CSLS hubness-corrected hard mining
    boot_cap: int = 0,  # >0: bootstrapped mutual-NN pair augmentation capacity
    boot_start: int = 100,
    boot_weight: float = 1.0,
    boot_csls_k: int = 0,
    use_sinkhorn: bool = False,  # add the OT alignment NLL on the seed pairs
    sinkhorn_weight: float = 1.0,
    sinkhorn_tau: float = 0.05,
    sinkhorn_iters: int = 20,
    sinkhorn_pairs: int = 0,  # >0: per-interval seed subsample for the OT term
    use_rel_head: bool = False,  # DistMult relation head (mirrors AlignMTL)
    rel_weight: float = 0.25,
    rel_k_neg: int = 10,
    use_attr_head: bool = False,  # categorical attribute head (mirrors AlignMTL)
    attr_weight: float = 0.25,
    lr_schedule: str = "const",  # 'const' | 'cosine' (train/optim.py semantics)
    lr_warmup: int = 0,
    lr_final_frac: float = 0.0,
    seed: int = 0,
    eval_every: int = 50,
    eval_csls_k: int = 0,
    verbose: bool = False,
) -> tuple[TorchGCN, dict]:
    """Full-graph training loop (family train.py shape). Returns model + final metrics."""
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    adj = build_torch_adj(task.n_ent, task.merged_triples, n_rel=task.n_rel,
                          weighting=weighting, norm=norm)
    model = TorchGCN(task.n_ent, dim, highway=highway)
    # auxiliary heads (config[3]) join the shared embeddings and optimizer,
    # mirroring models/align.AlignMTL: per-interval corruptions/batches,
    # joint loss = margin + rel_weight·rel + attr_weight·attr
    rel_head = TorchRelationHead(task.n_rel, dim) if use_rel_head else None
    attr_all = task.merged_attr_triples if use_attr_head else None
    if use_attr_head and (attr_all is None or task.n_attr == 0):
        raise ValueError("attribute head enabled but the task has no attribute triples")
    attr_head = TorchAttributeHead(dim, task.n_attr) if use_attr_head else None
    params = list(model.parameters())
    if rel_head is not None:
        params += list(rel_head.parameters())
    if attr_head is not None:
        params += list(attr_head.parameters())
    opt = torch.optim.Adam(params, lr=lr)
    # LambdaLR(factor(epoch)) stepped after each opt.step() sees the same lr
    # sequence as optax's schedule(count) — tests/test_optim.py pins this
    from tpugraph.train.optim import lr_factor

    lr_sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda t: lr_factor(t, epochs, lr_schedule, lr_warmup, lr_final_frac))
    rel_triples_t = (torch.from_numpy(task.merged_triples.astype(np.int64))
                     if use_rel_head else None)
    attr_bs = min(8192, len(attr_all)) if use_attr_head else 0
    rel_neg_t = rel_neg_h = attr_batch_t = None
    n1 = task.kg1.n_ent
    mask1 = np.ones(n1, bool)
    mask1[task.train_pairs[:, 0]] = False
    mask2 = np.ones(task.n_ent - n1, bool)
    mask2[task.train_pairs[:, 1] - n1] = False
    pairs = torch.from_numpy(task.train_pairs.astype(np.int64))
    w_t = None
    neg_l = neg_r = None
    metrics = {}
    for epoch in range(epochs):
        if epoch % neg_every == 0:
            pairs_np = task.train_pairs
            w_t = None
            ot_pairs_t = torch.from_numpy(task.train_pairs.astype(np.int64))
            if use_sinkhorn and 0 < sinkhorn_pairs < len(task.train_pairs):
                sel = rng.choice(len(task.train_pairs), sinkhorn_pairs,
                                 replace=False)
                ot_pairs_t = torch.from_numpy(
                    task.train_pairs[sel].astype(np.int64))
            if boot_cap > 0 and epoch >= boot_start and epoch > 0:
                with torch.no_grad():
                    bp, bw = propose_mutual_nn_pairs(model(adj), mask1, mask2,
                                                     n1, task.n_ent, boot_cap,
                                                     csls_k=boot_csls_k)
                pairs_np = np.concatenate([task.train_pairs.astype(np.int64), bp], 0)
                w_t = torch.cat([torch.ones(len(task.train_pairs)),
                                 torch.from_numpy(bw) * boot_weight])
            if neg_mode == "hard" and epoch > 0:
                with torch.no_grad():
                    nl, nr = sample_hard_negatives(model(adj), pairs_np,
                                                   task.kg1.n_ent, task.n_ent, k_neg,
                                                   csls_k=neg_csls_k)
            else:
                nl, nr = sample_negatives(rng, pairs_np, task.kg1.n_ent, task.n_ent, k_neg)
            neg_l, neg_r = torch.from_numpy(nl), torch.from_numpy(nr)
            pairs = torch.from_numpy(pairs_np.astype(np.int64))
            if use_rel_head:  # fresh tail/head corruptions per interval
                t = len(task.merged_triples)
                rel_neg_t = torch.from_numpy(
                    rng.integers(0, task.n_ent, (t, rel_k_neg)))
                rel_neg_h = torch.from_numpy(
                    rng.integers(0, task.n_ent, (t, rel_k_neg)))
            if use_attr_head:  # fresh attribute-triple batch per interval
                idx = rng.integers(0, len(attr_all), attr_bs)
                attr_batch_t = torch.from_numpy(attr_all[idx].astype(np.int64))
        opt.zero_grad()
        emb = model(adj)
        loss = margin_align_loss(emb, pairs, neg_l, neg_r, gamma, weights=w_t)
        if use_sinkhorn:
            # mirrors models/align.AlignMTL: OT NLL on the raw seed pairs
            # (not the boot-augmented set; optionally a per-interval
            # subsample), added with its joint weight
            loss = loss + sinkhorn_weight * torch_sinkhorn_align_loss(
                emb, ot_pairs_t, tau=sinkhorn_tau, n_iters=sinkhorn_iters)
        if use_rel_head:
            loss = loss + rel_weight * rel_head(emb, rel_triples_t, rel_neg_t, rel_neg_h)
        if use_attr_head:
            loss = loss + attr_weight * attr_head(emb, attr_batch_t)
        loss.backward()
        opt.step()
        lr_sched.step()
        if verbose and (epoch % eval_every == 0 or epoch == epochs - 1):
            h = get_hits(model(adj), task.test_pairs)
            print(f"[oracle] epoch {epoch} loss {loss.item():.4f} "
                  f"hits@1 {h['hits@1']:.3f} hits@10 {h['hits@10']:.3f}")
    metrics = get_hits(model(adj), task.test_pairs, csls_k=eval_csls_k)
    metrics["final_loss"] = float(loss.item())
    return model, metrics


def export_params(model: TorchGCN) -> dict:
    """Numpy weight dump for injection into the JAX framework (parity tests)."""
    # .copy() is load-bearing: .detach().numpy() returns a VIEW of the live
    # torch storage, and jnp.asarray on the CPU backend may alias it
    # zero-copy — a later in-place torch opt.step() would then silently
    # mutate the "exported" JAX params (cost a debugging session to find).
    def _np(t):
        return t.detach().numpy().copy()

    out = {
        "emb": _np(model.emb),
        "gc1": {"w": _np(model.gc1.weight), "b": _np(model.gc1.bias)},
        "gc2": {"w": _np(model.gc2.weight), "b": _np(model.gc2.bias)},
    }
    if model.highway:
        out["hw1"] = {"w": _np(model.hw1.lin.weight).T, "b": _np(model.hw1.lin.bias)}
        out["hw2"] = {"w": _np(model.hw2.lin.weight).T, "b": _np(model.hw2.lin.bias)}
    return out


class TorchRelationHead(nn.Module):
    """DistMult triple scorer — mirrors models/heads.RelationHead exactly."""

    def __init__(self, n_rel: int, dim: int):
        super().__init__()
        self.rel = nn.Parameter(torch.randn(n_rel, dim) / dim**0.5)

    def forward(self, emb, triples, neg_tails, neg_heads):
        h = emb[triples[:, 0]]
        r = self.rel[triples[:, 1]]
        t = emb[triples[:, 2]]
        pos = (h * r * t).sum(-1)
        neg_t = torch.einsum("td,tkd->tk", h * r, emb[neg_tails])
        neg_h = torch.einsum("td,tkd->tk", r * t, emb[neg_heads])
        return (
            -F.logsigmoid(pos).mean()
            - 0.5 * (F.logsigmoid(-neg_t).mean() + F.logsigmoid(-neg_h).mean())
        )


class TorchAttributeHead(nn.Module):
    """Categorical attribute prediction — mirrors models/heads.AttributeHead."""

    def __init__(self, dim: int, n_attr: int):
        super().__init__()
        self.lin = nn.Linear(dim, n_attr)

    def forward(self, emb, attr_triples):
        logits = self.lin(emb[attr_triples[:, 0]])
        return F.cross_entropy(logits, attr_triples[:, 1])


def torch_sinkhorn_align_loss(emb, pairs, tau=0.05, n_iters=20):
    """Log-domain Sinkhorn OT alignment NLL — mirrors train/ot.py exactly
    (sqeuclidean cost on L2-normalized seed embeddings, uniform marginals)."""
    l = emb[pairs[:, 0]]
    r = emb[pairs[:, 1]]
    l = l / (l.norm(dim=-1, keepdim=True) + 1e-8)
    r = r / (r.norm(dim=-1, keepdim=True) + 1e-8)
    cost = torch.cdist(l, r, p=2) ** 2
    n, m = cost.shape
    log_mu = torch.full((n,), -torch.log(torch.tensor(float(n))))
    log_nu = torch.full((m,), -torch.log(torch.tensor(float(m))))
    f = torch.zeros(n)
    g = torch.zeros(m)
    for _ in range(n_iters):
        f = tau * (log_mu - torch.logsumexp((g[None, :] - cost) / tau, dim=1))
        g = tau * (log_nu - torch.logsumexp((f[:, None] - cost) / tau, dim=0))
    log_p = (f[:, None] + g[None, :] - cost) / tau
    ll = torch.diagonal(log_p) - torch.logsumexp(log_p, dim=1)
    return -ll.mean()
