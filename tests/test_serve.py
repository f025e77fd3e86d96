"""Serving path: top-k alignment queries + export + embedding round-trip."""

import numpy as np
import pytest


def test_topk_alignments_exact():
    import jax.numpy as jnp
    from scipy.spatial.distance import cdist

    from tpugraph.serve import topk_alignments

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((120, 8)).astype(np.float32))
    q_ids = rng.choice(60, 17, replace=False)
    c_ids = 60 + np.arange(60)
    vals, ids = topk_alignments(emb, q_ids, c_ids, k=5, block_c=16)
    d = cdist(np.asarray(emb)[q_ids], np.asarray(emb)[c_ids], metric="cityblock")
    want_idx = np.argsort(d, axis=1)[:, :5]
    np.testing.assert_array_equal(ids, c_ids[want_idx])
    np.testing.assert_allclose(vals, np.take_along_axis(d, want_idx, 1), rtol=1e-5)


def test_export_and_embedding_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tpugraph.serve import export_alignments, load_embeddings, save_embeddings

    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.standard_normal((50, 4)).astype(np.float32))
    n = export_alignments(str(tmp_path / "al.tsv"), emb, np.arange(10), 25 + np.arange(25), k=3)
    assert n == 10
    lines = (tmp_path / "al.tsv").read_text().strip().splitlines()
    assert len(lines) == 10 and len(lines[0].split("\t")) == 4

    save_embeddings(str(tmp_path / "embck"), emb)
    back = load_embeddings(str(tmp_path / "embck"))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(emb))


def test_topk_alignments_csls_matches_eval_ranking():
    """CSLS-rescored serving top-1 == the eval module's CSLS ranking winner."""
    import jax.numpy as jnp
    import numpy as np

    from tpugraph.serve import topk_alignments

    rng = np.random.default_rng(6)
    n1, n2, d = 40, 50, 8
    emb = rng.standard_normal((n1 + n2, d)).astype(np.float32)
    q_ids = np.arange(n1)
    c_ids = n1 + np.arange(n2)
    # dense CSLS oracle
    from scipy.spatial.distance import cdist

    dmat = cdist(emb[:n1], emb[n1:], metric="cityblock")
    hub = np.sort(dmat, axis=0)[:5].mean(0)
    score = 2 * dmat - hub[None, :]
    want_top1 = n1 + score.argmin(1)
    vals, ids = topk_alignments(jnp.asarray(emb), q_ids, c_ids, k=3,
                                block_c=16, csls_k=5)
    np.testing.assert_array_equal(ids[:, 0], want_top1)


def test_serve_cli_main(tmp_path):
    """`python -m tpugraph.serve` surface: n-left split + id-file paths."""
    import jax.numpy as jnp

    from tpugraph.serve import main, save_embeddings

    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.standard_normal((30, 4)).astype(np.float32))
    save_embeddings(str(tmp_path / "emb"), emb)

    out = tmp_path / "al.tsv"
    assert main(["--emb", str(tmp_path / "emb"), "--out", str(out),
                 "--n-left", "12", "--k", "3"]) == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 12 and len(lines[0].split("\t")) == 4
    # every candidate id comes from the right-hand split
    for ln in lines:
        for cell in ln.split("\t")[1:]:
            assert int(cell.split(":")[0]) >= 12

    qf, cf = tmp_path / "q.txt", tmp_path / "c.txt"
    qf.write_text("\n".join(str(i) for i in range(5)))
    cf.write_text("\n".join(str(i) for i in range(20, 30)))
    assert main(["--emb", str(tmp_path / "emb"), "--out", str(out),
                 "--queries", str(qf), "--candidates", str(cf),
                 "--k", "2", "--csls-k", "3"]) == 0
    assert len(out.read_text().strip().splitlines()) == 5


def test_train_to_serve_pipeline(tmp_path):
    """cfg.save_emb_path: fit writes the table; serve CLI consumes it."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.serve import load_embeddings, main
    from tpugraph.train.loop import fit

    task = synthetic_align_task(seed=0, n_ent=150, n_rel=6, n_triples=500,
                                drop_frac=0.0, noise_frac=0.0)
    cfg = get_config("base", dim=16, epochs=20, eval_every=0, k_neg=5,
                     neg_every=5, pad_bucket=1024,
                     save_emb_path=str(tmp_path / "emb"))
    fit(cfg, task=task)
    emb = load_embeddings(str(tmp_path / "emb"))
    assert emb.shape == (task.n_ent, 16)

    out = tmp_path / "al.tsv"
    assert main(["--emb", str(tmp_path / "emb"), "--out", str(out),
                 "--n-left", str(task.kg1.n_ent), "--k", "3"]) == 0
    assert len(out.read_text().strip().splitlines()) == task.kg1.n_ent


def test_distributed_save_emb(tmp_path):
    """save_emb_path gathers the sharded table from the dist trainer."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed
    from tpugraph.serve import load_embeddings

    task = synthetic_align_task(seed=0, n_ent=128, n_rel=6, n_triples=400,
                                drop_frac=0.0, noise_frac=0.0)
    cfg = get_config("base", dim=16, epochs=6, eval_every=0, k_neg=5,
                     neg_every=3, pad_bucket=256, n_shards=4,
                     save_emb_path=str(tmp_path / "emb"))
    fit_distributed(cfg, task=task)
    emb = load_embeddings(str(tmp_path / "emb"))
    assert emb.shape == (task.n_ent, 16)


def test_topk_alignments_approx_tracks_exact():
    """MXU-prefiltered serving (approx_k>0, VERDICT r3 weak #3): the top-k
    id sets track the exact path closely, rows stay sorted best-first, and
    raw-L1 scores for shared ids are the EXACT L1 values (the rerank is
    exact within the shortlist)."""
    import jax.numpy as jnp

    from tpugraph.serve import topk_alignments

    rng = np.random.default_rng(9)
    n1, n2, d = 150, 180, 16
    base = rng.standard_normal((n1, d)).astype(np.float32)
    emb = np.concatenate([base, np.pad(base, ((0, n2 - n1), (0, 0)))
                          + 0.2 * rng.standard_normal((n2, d)).astype(np.float32)])
    q_ids = np.arange(n1)
    c_ids = n1 + np.arange(n2)
    k = 5
    ve, ie = topk_alignments(jnp.asarray(emb), q_ids, c_ids, k=k, block_c=32)
    va, ia = topk_alignments(jnp.asarray(emb), q_ids, c_ids, k=k, approx_k=32)
    assert (np.diff(va, axis=1) >= 0).all()  # sorted best-first
    overlap = np.mean([len(set(a) & set(b)) / k for a, b in zip(ie, ia)])
    assert overlap >= 0.9, overlap
    # shared ids carry identical exact-L1 scores
    for r in range(0, n1, 30):
        m_e = {c: v for c, v in zip(ie[r], ve[r])}
        for c, v in zip(ia[r], va[r]):
            if c in m_e:
                assert v == pytest.approx(m_e[c], rel=1e-5)


def test_topk_alignments_approx_csls_tracks_exact():
    """approx_k + csls_k: sq-CSLS shortlist selection + approx-L1-CSLS
    rerank — hub candidates stay demoted, top-1 tracks the exact CSLS path."""
    import jax.numpy as jnp

    from tpugraph.serve import topk_alignments

    rng = np.random.default_rng(10)
    n1, n2, d = 150, 180, 16
    base = rng.standard_normal((n1, d)).astype(np.float32)
    emb = np.concatenate([base, np.pad(base, ((0, n2 - n1), (0, 0)))
                          + 0.2 * rng.standard_normal((n2, d)).astype(np.float32)])
    emb[n1:n1 + 6] *= 0.05  # hubs
    q_ids = np.arange(n1)
    c_ids = n1 + np.arange(n2)
    k = 5
    _, ie = topk_alignments(jnp.asarray(emb), q_ids, c_ids, k=k, block_c=32,
                            csls_k=5)
    _, ia = topk_alignments(jnp.asarray(emb), q_ids, c_ids, k=k, csls_k=5,
                            approx_k=32)
    top1_match = np.mean(ie[:, 0] == ia[:, 0])
    assert top1_match >= 0.9, top1_match
    overlap = np.mean([len(set(a) & set(b)) / k for a, b in zip(ie, ia)])
    assert overlap >= 0.8, overlap


def test_topk_alignments_approx_small_pool():
    """Candidate pool smaller than k: the approx path must follow the exact
    path's padded convention (inf score marks no-such-candidate) instead of
    crashing in top_k (round-4b review finding: kk clamps to C < k)."""
    import jax.numpy as jnp

    from tpugraph.serve import topk_alignments

    rng = np.random.default_rng(11)
    emb = jnp.asarray(rng.standard_normal((40, 16)).astype(np.float32))
    q_ids = np.arange(8)
    c_ids = 20 + np.arange(6)  # C=6 < k=10
    ve, ie = topk_alignments(emb, q_ids, c_ids, k=10)
    va, ia = topk_alignments(emb, q_ids, c_ids, k=10, approx_k=32)
    # real entries: identical ids and scores, best-first
    assert np.array_equal(ie[:, :6], ia[:, :6])
    np.testing.assert_allclose(ve[:, :6], va[:, :6], rtol=1e-5)
    assert np.all(np.isinf(va[:, 6:])) and np.all(np.isinf(ve[:, 6:]))
    # CSLS branch compiles and returns the same finite set too
    _, iac = topk_alignments(emb, q_ids, c_ids, k=10, csls_k=3, approx_k=32)
    assert np.all(np.isin(iac[:, :6], c_ids))
