"""Synthetic generator + DBP15K reader tests."""

import numpy as np

from tpugraph.data.synthetic import synthetic_align_task


def test_synthetic_deterministic():
    t1 = synthetic_align_task(seed=7, n_ent=300, n_triples=900)
    t2 = synthetic_align_task(seed=7, n_ent=300, n_triples=900)
    np.testing.assert_array_equal(t1.kg1.triples, t2.kg1.triples)
    np.testing.assert_array_equal(t1.kg2.triples, t2.kg2.triples)
    np.testing.assert_array_equal(t1.train_pairs, t2.train_pairs)


def test_synthetic_shapes_and_ranges():
    t = synthetic_align_task(seed=1, n_ent=400, n_rel=10, n_triples=1200)
    assert t.n_ent == 800
    m = t.merged_triples
    assert m[:, [0, 2]].max() < 800 and m[:, 1].max() < t.n_rel
    # pairs: left in kg1 range, right in kg2 global range
    for pairs in (t.train_pairs, t.test_pairs):
        assert pairs[:, 0].max() < 400
        assert 400 <= pairs[:, 1].min() and pairs[:, 1].max() < 800
    # train/test disjoint
    tr = set(map(tuple, t.train_pairs))
    te = set(map(tuple, t.test_pairs))
    assert not (tr & te)
    # attributes exist and are correlated across alignment
    a = t.merged_attr_triples
    assert a is not None and a[:, 0].max() < 800


def test_dbp15k_reader_roundtrip(tmp_path):
    """Write a tiny JAPE-format directory and read it back."""
    from tpugraph.data.dbp15k import load_dbp15k

    d = tmp_path / "zh_en"
    d.mkdir()
    # KG1: global ids 0,1,2 ; KG2: global ids 10,11,12 (DBP15K ids are global)
    (d / "ent_ids_1").write_text("0\te_a\n1\te_b\n2\te_c\n")
    (d / "ent_ids_2").write_text("10\tf_a\n11\tf_b\n12\tf_c\n")
    (d / "triples_1").write_text("0\t5\t1\n1\t5\t2\n")
    (d / "triples_2").write_text("10\t7\t11\n11\t8\t12\n")
    (d / "ref_ent_ids").write_text("0\t10\n1\t11\n2\t12\n")
    task = load_dbp15k(str(tmp_path), "zh_en", train_ratio=0.34, seed=0)
    assert task.kg1.n_ent == 3 and task.kg2.n_ent == 3 and task.n_ent == 6
    np.testing.assert_array_equal(task.kg1.triples, [[0, 0, 1], [1, 0, 2]])
    np.testing.assert_array_equal(task.kg2.triples, [[0, 0, 1], [1, 1, 2]])
    allp = np.concatenate([task.train_pairs, task.test_pairs])
    assert sorted(map(tuple, allp)) == [(0, 3), (1, 4), (2, 5)]
    m = task.merged_triples
    assert m.shape == (4, 3) and m[:, 1].max() == 2  # kg2 rels offset by kg1.n_rel=1


def test_dbp15k_reader_attrs_and_sup(tmp_path):
    """Attribute triples + sup_ent_ids (train split provided by the dataset)."""
    from tpugraph.data.dbp15k import load_dbp15k

    d = tmp_path / "ja_en"
    d.mkdir()
    (d / "ent_ids_1").write_text("0\ta\n1\tb\n")
    (d / "ent_ids_2").write_text("5\tx\n6\ty\n")
    (d / "triples_1").write_text("0\t9\t1\n")
    (d / "triples_2").write_text("5\t3\t6\n")
    (d / "ref_ent_ids").write_text("0\t5\n1\t6\n")
    (d / "sup_ent_ids").write_text("0\t5\n")
    (d / "att_triples_1").write_text("0\t2\n1\t0\n")
    (d / "att_triples_2").write_text("5\t1\n")
    task = load_dbp15k(str(tmp_path), "ja_en")
    # sup file becomes the train split; test = ref MINUS the sup pairs —
    # here sup [[0,5]] is a SUBSET of ref, the GCN-Align-style layout where
    # keeping the full ref as test would leak every training pair into eval
    # (round-4b data review)
    np.testing.assert_array_equal(task.train_pairs, [[0, 2]])
    np.testing.assert_array_equal(task.test_pairs, [[1, 3]])
    assert task.n_attr == 3
    a = task.merged_attr_triples
    assert sorted(map(tuple, a)) == [(0, 2), (1, 0), (2, 1)]


def test_dbp15k_reader_uri_attrs(tmp_path):
    """JAPE-release URI attribute format (training_attrs_*): GCN-Align-style
    top-K shared vocab, entity URIs resolved through ent_ids_*."""
    from tpugraph.data.dbp15k import load_dbp15k

    d = tmp_path / "fr_en"
    d.mkdir()
    (d / "ent_ids_1").write_text("0\thttp://fr/e_a\n1\thttp://fr/e_b\n")
    (d / "ent_ids_2").write_text("5\thttp://en/x\n6\thttp://en/y\n")
    (d / "triples_1").write_text("0\t9\t1\n")
    (d / "triples_2").write_text("5\t3\t6\n")
    (d / "ref_ent_ids").write_text("0\t5\n1\t6\n")
    (d / "training_attrs_1").write_text(
        "http://fr/e_a\thttp://prop/name\thttp://prop/pop\n"
        "http://fr/e_b\thttp://prop/name\n"
        "http://fr/unknown\thttp://prop/name\n")  # unknown entity: skipped
    (d / "training_attrs_2").write_text(
        "http://en/x\thttp://prop/name\thttp://prop/area\n")
    task = load_dbp15k(str(tmp_path), "fr_en", max_attr=2)
    # vocab = top-2 by frequency: name (3), then area/pop tie -> area by URI
    assert task.n_attr == 2
    a = task.merged_attr_triples
    # e_a->name, e_b->name, x(global id 2)->name, x->area
    assert sorted(map(tuple, a)) == [(0, 0), (1, 0), (2, 0), (2, 1)]


def test_dbp15k_uri_attrs_drive_ae_channel(tmp_path):
    """End-to-end: URI attribute files feed the AE channel trainer."""
    from tpugraph.data.dbp15k import load_dbp15k
    from tpugraph.configs import get_config
    from tpugraph.train.driver import run

    d = tmp_path / "zh_en"
    d.mkdir()
    n = 12
    rng = np.random.default_rng(0)
    (d / "ent_ids_1").write_text("".join(f"{i}\tfr{i}\n" for i in range(n)))
    (d / "ent_ids_2").write_text("".join(f"{100+i}\ten{i}\n" for i in range(n)))
    tri1 = "".join(f"{rng.integers(n)}\t0\t{rng.integers(n)}\n" for _ in range(30))
    tri2 = "".join(f"{100+rng.integers(n)}\t0\t{100+rng.integers(n)}\n" for _ in range(30))
    (d / "triples_1").write_text(tri1)
    (d / "triples_2").write_text(tri2)
    (d / "ref_ent_ids").write_text("".join(f"{i}\t{100+i}\n" for i in range(n)))
    (d / "training_attrs_1").write_text(
        "".join(f"fr{i}\tp{rng.integers(4)}\tp{rng.integers(4)}\n" for i in range(n)))
    (d / "training_attrs_2").write_text(
        "".join(f"en{i}\tp{rng.integers(4)}\n" for i in range(n)))
    cfg = get_config("base", dataset="dbp15k", data_root=str(tmp_path), pair="zh_en",
                     use_attr_channel=True, dim=8, epochs=4, neg_every=2, k_neg=3,
                     eval_every=0, neg_mode="uniform", train_ratio=0.5)
    res = run(cfg)
    assert np.isfinite(res.metrics["final_loss"])
    task = load_dbp15k(str(tmp_path), "zh_en")
    assert task.n_attr > 0


def test_openea_reader_roundtrip(tmp_path):
    """Write a tiny OpenEA/BootEA-format (URI TSV) directory and read it back."""
    from tpugraph.data.openea import load_openea

    d = tmp_path / "d_w"
    d.mkdir()
    (d / "rel_triples_1").write_text("A\tr1\tB\nB\tr1\tC\n")
    (d / "rel_triples_2").write_text("X\ts1\tY\nY\ts2\tZ\n")
    (d / "ent_links").write_text("A\tX\nB\tY\nC\tZ\n")
    (d / "attr_triples_1").write_text("A\tp_name\t\"foo\"\nB\tp_name\t\"bar\"\n")
    (d / "attr_triples_2").write_text("X\tp_name\t\"foo\"\nZ\tp_other\t\"1\"\n")

    task = load_openea(str(d), fold=None, train_ratio=0.34, seed=0)
    assert task.kg1.n_ent == 3 and task.kg2.n_ent == 3 and task.n_ent == 6
    assert task.kg1.n_rel == 1 and task.kg2.n_rel == 2
    allp = np.concatenate([task.train_pairs, task.test_pairs])
    assert sorted(map(tuple, allp)) == [(0, 3), (1, 4), (2, 5)]
    # attr vocab is shared and frequency-sorted: p_name (3 uses) gets id 0
    assert task.n_attr == 2
    np.testing.assert_array_equal(task.kg1.attr_triples, [[0, 0], [1, 0]])
    np.testing.assert_array_equal(task.kg2.attr_triples, [[0, 0], [2, 1]])


def test_openea_reader_official_folds(tmp_path):
    """721_5fold/<k>/ split: train = train+valid links, test = test_links."""
    from tpugraph.data.openea import load_openea

    d = tmp_path / "d_w"
    f = d / "721_5fold" / "1"
    f.mkdir(parents=True)
    (d / "rel_triples_1").write_text("A\tr\tB\nC\tr\tA\nD\tr\tB\n")
    (d / "rel_triples_2").write_text("X\ts\tY\nZ\ts\tX\nW\ts\tY\n")
    (d / "ent_links").write_text("A\tX\nB\tY\nC\tZ\nD\tW\n")
    (f / "train_links").write_text("A\tX\n")
    (f / "valid_links").write_text("B\tY\n")
    (f / "test_links").write_text("C\tZ\nD\tW\n")

    task = load_openea(str(d), fold=1)
    assert len(task.train_pairs) == 2 and len(task.test_pairs) == 2
    n1 = task.kg1.n_ent
    assert (task.test_pairs[:, 1] >= n1).all()
    # isolated link-only entities would still get rows; here all appear in triples
    assert task.kg1.n_ent == 4 and task.kg2.n_ent == 4


def test_synthetic_hardness_knobs():
    """Round-2 de-artifacting knobs (VERDICT round-1 "Next" #5): attribute
    coverage thins attr triples per side, hub-skew alpha concentrates degree
    mass, defaults leave the round-1 task byte-identical."""
    import numpy as np

    from tpugraph.data.synthetic import synthetic_align_task

    base = synthetic_align_task(seed=7, n_ent=800, n_rel=20, n_triples=3000)
    hard = synthetic_align_task(seed=7, n_ent=800, n_rel=20, n_triples=3000,
                                attr_noise=0.6, attr_coverage=0.3, alpha=1.3)
    # coverage thins both sides' attribute triples to ~30%
    assert len(hard.kg1.attr_triples) < 0.45 * len(base.kg1.attr_triples)
    assert len(hard.kg2.attr_triples) < 0.45 * len(base.kg2.attr_triples)
    # heavier hub skew: top-10 head entities carry a larger degree share
    def top10_share(t):
        deg = np.bincount(t[:, 0], minlength=800)
        return deg[np.argsort(deg)[-10:]].sum() / max(1, deg.sum())
    assert top10_share(hard.kg1.triples) > top10_share(base.kg1.triples) + 0.05
    # defaults reproduce the round-1 pinned task exactly (regression guard)
    again = synthetic_align_task(seed=7, n_ent=800, n_rel=20, n_triples=3000)
    np.testing.assert_array_equal(base.kg1.triples, again.kg1.triples)
    np.testing.assert_array_equal(base.kg1.attr_triples, again.kg1.attr_triples)
    np.testing.assert_array_equal(base.train_pairs, again.train_pairs)
