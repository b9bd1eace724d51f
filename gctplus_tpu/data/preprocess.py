"""Preprocessing pipeline (reference preprocess.py:55-168).

Steps (same artifact layout, JSON/CSV instead of pickles):
  raw/{train,test,test_scaffolds}.csv   smiles + properties + scaffold
  prepared/{train,test}[_sca].csv       src/trg columns, scaled props
  utils/SRC[_sep].json, TRG[_sep].json  vocabularies
  utils/scaler_<props>.json             RobustScaler params
  utils/toklen_list.csv                 train token lengths

Data source: CSV/“one SMILES per line” files, or the synthetic
generator when none are given (no network egress here; the reference
downloads MOSES instead, preprocess.py:81-83).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

from gctplus_tpu.chem.descriptors import get_property_fn
from gctplus_tpu.chem.mapper import pmap
from gctplus_tpu.chem.sanitize import mol_from_smiles
from gctplus_tpu.chem.scaffold import murcko_scaffold
from gctplus_tpu.chem.tokenizer import SmilesTokenizer
from gctplus_tpu.chem.vocab import Vocab
from gctplus_tpu.data.scaler import RobustScaler


def compute_descriptors(smiles: Sequence[str], property_list: Sequence[str],
                        n_jobs: int = 1, compute_scaffold: bool = True
                        ) -> pd.DataFrame:
    """smiles -> DataFrame[smiles, scaffold?, props...]
    (reference preprocess.py:40-52)."""
    fns = get_property_fn(property_list)

    def _row(smi: str):
        mol = mol_from_smiles(smi)
        if mol is None:
            return None
        return [fn(mol) for fn in fns.values()]

    rows = pmap(_row, smiles, n_jobs)
    data: Dict[str, list] = {"smiles": list(smiles)}
    if compute_scaffold:
        data["scaffold"] = pmap(murcko_scaffold, smiles, n_jobs)
    for j, p in enumerate(property_list):
        data[p] = [r[j] if r is not None else np.nan for r in rows]
    return pd.DataFrame(data)


def build_vocabs(train_smiles: Sequence[str], util_folder: str
                 ) -> Dict[str, Vocab]:
    """SRC/TRG and SRC_sep/TRG_sep vocab quartet (preprocess.py:106-131)."""
    tok = SmilesTokenizer()
    token_lists = [tok(s) for s in train_smiles]
    out = {}
    for add_sep in (False, True):
        suffix = "_sep" if add_sep else ""
        src = Vocab.from_corpus_tokens(token_lists, with_sos_eos=False,
                                       add_sep=add_sep)
        trg = Vocab.from_corpus_tokens(token_lists, with_sos_eos=True,
                                       add_sep=add_sep)
        src.save(os.path.join(util_folder, f"SRC{suffix}.json"))
        trg.save(os.path.join(util_folder, f"TRG{suffix}.json"))
        out[f"SRC{suffix}"] = src
        out[f"TRG{suffix}"] = trg
    return out


def preprocess(save_folder: str,
               train_smiles: Optional[Sequence[str]] = None,
               test_smiles: Optional[Sequence[str]] = None,
               test_scaffolds_smiles: Optional[Sequence[str]] = None,
               property_list: Sequence[str] = ("logP", "tPSA", "QED", "SAS"),
               scaled_properties: Sequence[str] = ("logP", "tPSA", "QED"),
               n_jobs: int = 1, n_synthetic: int = 2000, seed: int = 0,
               score_table_max: Optional[int] = None, log=None) -> Dict:
    raw = os.path.join(save_folder, "raw")
    util = os.path.join(save_folder, "utils")
    prepared = os.path.join(save_folder, "prepared")
    for d in (raw, util, prepared):
        os.makedirs(d, exist_ok=True)

    if train_smiles is None:
        from gctplus_tpu.data.synthetic import generate_dataset
        n = n_synthetic
        allsmi = generate_dataset(int(n * 1.2) + 64, seed=seed,
                                  n_jobs=n_jobs)
        train_smiles = allsmi[:n]
        test_smiles = allsmi[n: n + n // 10]
        test_scaffolds_smiles = allsmi[n + n // 10:]

    frames = {}
    for name, smis in (("train", train_smiles), ("test", test_smiles),
                       ("test_scaffolds", test_scaffolds_smiles)):
        if smis is None:
            continue
        df = compute_descriptors(smis, property_list, n_jobs)
        df.to_csv(os.path.join(raw, f"{name}.csv"))
        frames[name] = df
        if log:
            log.info(f"raw/{name}.csv: {len(df)} rows")

    vocabs = build_vocabs(frames["train"]["smiles"], util)

    # scaler fit on train (preprocess.py:145)
    scaler = RobustScaler().fit(
        frames["train"][list(scaled_properties)].to_numpy(),
        columns=scaled_properties)
    scaler.save(os.path.join(
        util, f"scaler_{'-'.join(scaled_properties)}.json"))

    # token-length histogram (Utils/dataset.py:51-57)
    tok = SmilesTokenizer()
    toklens = [len(tok(s)) for s in frames["train"]["smiles"]]
    pd.DataFrame({"toklen": toklens}).to_csv(
        os.path.join(util, "toklen_list.csv"), index=False)

    # corpus-derived SA fragment table (chem/sa_fragments.py): the
    # offline analog of moses' PubChem fpscores artifact. At MOSES
    # scale a fixed-seed subsample (score_table_max) is statistically
    # equivalent and keeps the single-core preprocess bounded.
    table_smiles = frames["train"]["smiles"]
    if score_table_max is not None and len(table_smiles) > score_table_max:
        table_smiles = table_smiles.sample(
            n=score_table_max, random_state=seed)
    from gctplus_tpu.chem.sa_fragments import (
        build_fragment_scores_v2, save_fragment_scores)
    sa_scores = build_fragment_scores_v2(table_smiles, n_jobs=n_jobs)
    save_fragment_scores(
        sa_scores, os.path.join(util, "sa_fragments_v2.json"))

    # corpus-derived NP contribution table (chem/np_score.py) — the
    # offline analog of moses' NP_Score artifact (single-corpus mode)
    from gctplus_tpu.chem.np_score import (
        build_np_contributions, save_np_contributions)
    np_table = build_np_contributions(table_smiles, n_jobs=n_jobs)
    save_np_contributions(np_table, os.path.join(util,
                                                 "np_contributions.json"))

    # prepared train/test csvs (preprocess.py:135-166)
    for name in ("train", "test"):
        if name not in frames:
            continue
        df = frames[name]
        scaled = scaler.transform(df[list(scaled_properties)].to_numpy())
        prep = {"src": df["smiles"], "src_scaffold": df["scaffold"]}
        for j, p in enumerate(scaled_properties):
            prep[f"src_{p}"] = scaled[:, j]
        prep["trg"] = df["smiles"]
        prep["trg_scaffold"] = df["scaffold"]
        for j, p in enumerate(scaled_properties):
            prep[f"trg_{p}"] = scaled[:, j]
        pdf = pd.DataFrame(prep)
        pdf.to_csv(os.path.join(prepared, f"{name}_sca.csv"), index=False)
        pdf.drop(columns=["src_scaffold", "trg_scaffold"]).to_csv(
            os.path.join(prepared, f"{name}.csv"), index=False)

    return {"vocabs": vocabs, "scaler": scaler, "frames": frames,
            "toklen": np.asarray(toklens)}
