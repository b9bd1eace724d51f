"""Extend the 620k bigrun corpus to reference scale (~1.58M train)
REUSING the existing vocab + scaler, so the round-4 flagship
checkpoints keep training on the bigger corpus with zero remapping
(VERDICT r4 items 1/3/7: the psca validity and pvaetf MAE gaps are
attributed to corpus size — the reference trains on 1.58M MOSES
molecules, /root/reference/README.md:8).

Inputs:
  - _work/bigrun       (existing workdir: raw/, prepared/, utils/)
  - _work/newgen.csv   (gen_corpus_ckpt.py output, seeded with the
                        existing train+test+test_scaffolds so new
                        molecules are disjoint from all three splits)

Output: a new workdir (default _work/bigrun15) with
  - utils/            -> symlink to the EXISTING utils (vocab, scaler,
                         toklen histogram, score tables stay frozen)
  - raw/test*.csv     -> symlinks (held-out splits unchanged)
  - raw/train.csv     = old train + descriptor-annotated new rows
  - prepared/train*.csv = old prepared + scaled new rows
  New molecules whose token set is not closed under the existing
  vocab (or whose scaffold breaks the sep-vocab) are dropped and
  counted — the checkpoint's embedding table must keep its id order.

Descriptor pass is chunk-resumable (~1.08M rows, single core).

Usage: python scripts/prep_extend_corpus.py [workdir] [newgen] [out]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 25000


def main():
    w = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_work/bigrun"
    newgen = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_work/newgen.csv"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/_work/bigrun15"
    t0 = time.time()

    import pandas as pd

    from gctplus_tpu.chem.tokenizer import SmilesTokenizer
    from gctplus_tpu.chem.vocab import Vocab
    from gctplus_tpu.data.preprocess import compute_descriptors
    from gctplus_tpu.data.scaler import RobustScaler

    os.makedirs(out, exist_ok=True)
    for sub in ("raw", "prepared"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    # frozen artifacts: shared by symlink so trainers/evals on the new
    # workdir resolve the identical vocab/scaler files
    if not os.path.lexists(os.path.join(out, "utils")):
        os.symlink(os.path.join(w, "utils"), os.path.join(out, "utils"))
    for name in ("test.csv", "test_scaffolds.csv"):
        dst = os.path.join(out, "raw", name)
        if not os.path.lexists(dst):
            os.symlink(os.path.join(w, "raw", name), dst)
    dst = os.path.join(out, "prepared", "test.csv")
    if not os.path.lexists(dst):
        os.symlink(os.path.join(w, "prepared", "test.csv"), dst)
    dst = os.path.join(out, "prepared", "test_sca.csv")
    if not os.path.lexists(dst) and \
            os.path.exists(os.path.join(w, "prepared", "test_sca.csv")):
        os.symlink(os.path.join(w, "prepared", "test_sca.csv"), dst)

    # ---- 1. new molecules = newgen minus every existing split ----
    seen = set()
    for name in ("train", "test", "test_scaffolds"):
        seen.update(pd.read_csv(os.path.join(w, "raw", f"{name}.csv"))
                    ["smiles"].tolist())
    with open(newgen) as f:
        next(f)
        new = [ln.strip() for ln in f if ln.strip() and ln.strip() not in seen]
    print(f"existing {len(seen)}, new unique {len(new)}", flush=True)

    # ---- 2. chunk-resumable descriptor pass ----
    desc_path = os.path.join(out, "raw", "train_new_desc.csv")
    done = 0
    if os.path.exists(desc_path):
        with open(desc_path) as f:
            done = sum(1 for _ in f) - 1
        print(f"resuming descriptor pass at {done}", flush=True)
    while done < len(new):
        chunk = new[done: done + CHUNK]
        df = compute_descriptors(chunk, ("logP", "tPSA", "QED", "SAS"),
                                 n_jobs=1)
        df.to_csv(desc_path, mode="a" if done else "w",
                  header=(done == 0), index=False)
        done += len(chunk)
        rate = done / max(1e-9, time.time() - t0)
        print(f"descriptors {done}/{len(new)} ({rate:.0f}/s)", flush=True)

    # ---- 3. vocab-closure filter + scaled prepared rows ----
    tok = SmilesTokenizer()
    src_vocab = Vocab.load(os.path.join(w, "utils", "SRC.json"))
    sep_vocab = Vocab.load(os.path.join(w, "utils", "SRC_sep.json"))
    known = set(src_vocab.stoi)
    known_sep = set(sep_vocab.stoi)

    nd = pd.read_csv(desc_path)
    ok = []
    for smi, sca in zip(nd["smiles"], nd["scaffold"].fillna("")):
        toks = tok(smi)
        good = all(t in known for t in toks) and \
            all(t in known_sep for t in toks)
        if good and sca:
            good = all(t in known_sep for t in tok(sca))
        ok.append(good)
    nd = nd[pd.Series(ok, index=nd.index)]
    print(f"vocab-closed new rows: {len(nd)} "
          f"(dropped {len(ok) - len(nd)})", flush=True)

    scaled_props = ("logP", "tPSA", "QED")
    scaler = RobustScaler.load(os.path.join(
        w, "utils", f"scaler_{'-'.join(scaled_props)}.json"))
    scaled = scaler.transform(nd[list(scaled_props)].to_numpy())
    prep = {"src": nd["smiles"], "src_scaffold": nd["scaffold"]}
    for j, p in enumerate(scaled_props):
        prep[f"src_{p}"] = scaled[:, j]
    prep["trg"] = nd["smiles"]
    prep["trg_scaffold"] = nd["scaffold"]
    for j, p in enumerate(scaled_props):
        prep[f"trg_{p}"] = scaled[:, j]
    pdf = pd.DataFrame(prep)

    # ---- 4. concatenated outputs ----
    old_raw = pd.read_csv(os.path.join(w, "raw", "train.csv"), index_col=0)
    raw_all = pd.concat([old_raw, nd], ignore_index=True)
    raw_all.to_csv(os.path.join(out, "raw", "train.csv"))
    print(f"raw/train.csv: {len(raw_all)} rows", flush=True)

    old_sca = pd.read_csv(os.path.join(w, "prepared", "train_sca.csv"))
    sca_all = pd.concat([old_sca, pdf], ignore_index=True)
    sca_all.to_csv(os.path.join(out, "prepared", "train_sca.csv"),
                   index=False)
    sca_all.drop(columns=["src_scaffold", "trg_scaffold"]).to_csv(
        os.path.join(out, "prepared", "train.csv"), index=False)
    print(f"prepared/train.csv: {len(sca_all)} rows; "
          f"total {(time.time() - t0) / 60:.1f} min", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
