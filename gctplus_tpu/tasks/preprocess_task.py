"""Preprocess task CLI (reference preprocess.py __main__)."""

from __future__ import annotations

import os

import pandas as pd

from gctplus_tpu.data.preprocess import preprocess
from gctplus_tpu.utils import get_logger, set_seed


def _load_smiles(path):
    if path is None:
        return None
    if path.endswith(".csv"):
        df = pd.read_csv(path)
        col = "smiles" if "smiles" in df.columns else df.columns[0]
        return df[col].tolist()
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def main(argv=None):
    import argparse
    from gctplus_tpu.config import preprocess_opts

    parser = argparse.ArgumentParser("gctplus-preprocess")
    preprocess_opts(parser)
    args = parser.parse_args(argv)
    set_seed(0)
    os.makedirs(args.save_folder, exist_ok=True)
    log = get_logger("preprocess",
                     os.path.join(args.save_folder, "record.log"))

    n_syn = 256 if args.debug else args.n_synthetic
    preprocess(
        args.save_folder,
        train_smiles=_load_smiles(args.train_csv),
        test_smiles=_load_smiles(args.test_csv),
        test_scaffolds_smiles=_load_smiles(args.test_scaffolds_csv),
        property_list=args.property_list,
        scaled_properties=args.scaled_properties,
        n_jobs=args.n_jobs, n_synthetic=n_syn, log=log)
    log.info("finished preprocessing")


if __name__ == "__main__":
    main()
