"""Full-size ON-DISK data-path rehearsal (VERDICT r2 Next #6).

Real DBP15K/DWY100K cannot be downloaded here (no network, SURVEY.md §2.3),
and until round 3 the dataset READERS had only ever parsed tiny tmp_path
fixtures.  This script proves the production data path at full scale:

  Leg A (JAPE/DBP15K format, zh-en scale — EXACT):
    generator → write the zh-en-scale synthetic task out as a real JAPE
    directory (ent_ids_*, triples_*, ref/sup_ent_ids, att_triples_*) →
    ``load_dbp15k`` → CLI-path training on the chip → metrics must MATCH the
    in-memory run bit-for-bit (the id remap round-trips to the identity).

  Leg B (OpenEA format, DWY100K scale — structural + smoke):
    generator → OpenEA directory (rel_triples_*, ent_links, 721_5fold) →
    ``load_openea`` → structural equivalence asserted under the URI→id maps
    (entity count, triple multiset, link set), then a short training smoke
    on the sharded trainer.  Exact metric equality is NOT expected here:
    OpenEA ids are assigned by first-appearance order, so embedding-init
    rows permute.

    python scripts/disk_rehearsal.py [--out /tmp/disk_rehearsal]
        [--leg a,b] [--epochs 40]

Results recorded in BASELINE.md ("On-disk rehearsal" rows).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def write_jape(task, d):
    """AlignTask → JAPE directory with a GLOBAL id namespace (ids2 offset by
    n1, the DBP15K release convention the reader detects)."""
    os.makedirs(d, exist_ok=True)
    n1 = task.kg1.n_ent

    def lines(path, rows):
        with open(os.path.join(d, path), "w") as f:
            for r in rows:
                f.write("\t".join(str(x) for x in r) + "\n")

    lines("ent_ids_1", ((i, f"http://kg1/e{i}") for i in range(n1)))
    lines("ent_ids_2", ((n1 + j, f"http://kg2/e{j}") for j in range(task.kg2.n_ent)))
    lines("triples_1", task.kg1.triples)
    t2 = task.kg2.triples.copy()
    t2[:, 0] += n1
    t2[:, 2] += n1
    lines("triples_2", t2)
    # sup = train split, ref = test split (reader: sup→train, ref→test)
    lines("sup_ent_ids", task.train_pairs)
    lines("ref_ent_ids", task.test_pairs)
    if task.kg1.attr_triples is not None:
        lines("att_triples_1", task.kg1.attr_triples)
        a2 = task.kg2.attr_triples.copy()
        a2[:, 0] += n1
        lines("att_triples_2", a2)


def write_openea(task, d):
    """AlignTask → OpenEA URI directory + 721_5fold/1 split."""
    os.makedirs(os.path.join(d, "721_5fold", "1"), exist_ok=True)
    n1 = task.kg1.n_ent

    def uri1(i):
        return f"http://kg1/e{i}"

    def uri2(j):
        return f"http://kg2/e{j}"

    def w(path, rows):
        with open(os.path.join(d, path), "w") as f:
            for r in rows:
                f.write("\t".join(r) + "\n")

    w("rel_triples_1", ((uri1(h), f"http://kg1/r{r}", uri1(t))
                        for h, r, t in task.kg1.triples))
    w("rel_triples_2", ((uri2(h), f"http://kg2/r{r}", uri2(t))
                        for h, r, t in task.kg2.triples))
    all_pairs = np.concatenate([task.train_pairs, task.test_pairs], 0)
    w("ent_links", ((uri1(a), uri2(b - n1)) for a, b in all_pairs))
    w(os.path.join("721_5fold", "1", "train_links"),
      ((uri1(a), uri2(b - n1)) for a, b in task.train_pairs))
    w(os.path.join("721_5fold", "1", "test_links"),
      ((uri1(a), uri2(b - n1)) for a, b in task.test_pairs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/disk_rehearsal")
    ap.add_argument("--leg", default="a,b")
    ap.add_argument("--epochs", type=int, default=40)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.driver import run

    legs = args.leg.split(",")

    if "a" in legs:
        # --- Leg A: zh-en-scale JAPE, exact disk ≡ memory -------------------
        task = synthetic_align_task(
            seed=7, n_ent=19000, n_rel=1200, n_triples=70000, n_pairs=15000,
            n_attr=1000, attrs_per_ent=4, name="zh_en")
        d = os.path.join(args.out, "dbp15k")
        t0 = time.time()
        write_jape(task, os.path.join(d, "zh_en"))
        t_write = time.time() - t0

        from tpugraph.data.dbp15k import load_dbp15k

        t0 = time.time()
        loaded = load_dbp15k(d, "zh_en")
        t_read = time.time() - t0
        # the global-id convention round-trips to the identity remap: every
        # array must come back EXACTLY
        np.testing.assert_array_equal(loaded.merged_triples, task.merged_triples)
        np.testing.assert_array_equal(loaded.train_pairs, task.train_pairs)
        np.testing.assert_array_equal(loaded.test_pairs, task.test_pairs)
        np.testing.assert_array_equal(loaded.merged_attr_triples,
                                      task.merged_attr_triples)
        assert loaded.n_attr == task.n_attr and loaded.n_rel == task.n_rel

        kw = dict(dim=128, epochs=args.epochs, eval_every=0, k_neg=50,
                  neg_every=5, neg_mode="hard", neg_approx=True,
                  steps_per_call=5, eval_csls_k=10)
        cfg_disk = get_config("base", dataset="dbp15k", data_root=d,
                              pair="zh_en", **kw)
        t0 = time.time()
        res_disk = run(cfg_disk)  # CLI path: loads from disk itself
        t_disk = time.time() - t0
        res_mem = run(get_config("base", **kw), task=task)
        exact = all(res_disk.metrics[k] == res_mem.metrics[k]
                    for k in res_mem.metrics)
        print(json.dumps({
            "leg": "jape_zh_en_scale", "n_ent": task.n_ent,
            "n_triples": int(len(task.merged_triples)),
            "write_s": round(t_write, 1), "read_s": round(t_read, 1),
            "train_s": round(t_disk, 1),
            "disk_hits@1": round(res_disk.metrics["hits@1"], 4),
            "mem_hits@1": round(res_mem.metrics["hits@1"], 4),
            "disk_eq_mem": exact}), flush=True)
        assert exact, "disk-path metrics diverged from the in-memory run"

    if "b" in legs:
        # --- Leg B: DWY100K-scale OpenEA, structural + smoke ----------------
        task = synthetic_align_task(
            seed=8, n_ent=50000, n_rel=400, n_triples=230000, n_pairs=50000,
            n_attr=0, attrs_per_ent=0, name="dwy")
        d = os.path.join(args.out, "openea")
        t0 = time.time()
        write_openea(task, d)
        t_write = time.time() - t0

        from tpugraph.data.openea import load_openea

        t0 = time.time()
        loaded = load_openea(d, fold=1)
        t_read = time.time() - t0
        assert loaded.n_ent == task.n_ent
        assert len(loaded.merged_triples) == len(task.merged_triples)
        assert len(loaded.train_pairs) == len(task.train_pairs)
        assert len(loaded.test_pairs) == len(task.test_pairs)
        # triple multiset equivalence under the reader's URI→id maps: degree
        # histograms are id-permutation invariants of the triple multiset
        for got, want in ((loaded.merged_triples, task.merged_triples),):
            for col in (0, 2):
                np.testing.assert_array_equal(
                    np.sort(np.bincount(got[:, col], minlength=loaded.n_ent)),
                    np.sort(np.bincount(want[:, col], minlength=task.n_ent)))

        cfg = get_config("dwy100k_dist", dataset="openea", data_root=d,
                         n_shards=1, dim=64, epochs=10, eval_every=0,
                         k_neg=25, neg_every=5, neg_mode="uniform",
                         steps_per_call=5)
        t0 = time.time()
        res = run(cfg)
        t_train = time.time() - t0
        print(json.dumps({
            "leg": "openea_dwy_scale", "n_ent": task.n_ent,
            "n_triples": int(len(task.merged_triples)),
            "write_s": round(t_write, 1), "read_s": round(t_read, 1),
            "train_s": round(t_train, 1),
            "hits@1": round(res.metrics["hits@1"], 4),
            "hits@10": round(res.metrics["hits@10"], 4),
            "final_loss": round(res.metrics["final_loss"], 4)}), flush=True)
        assert np.isfinite(res.metrics["final_loss"])


if __name__ == "__main__":
    main()
