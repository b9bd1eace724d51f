"""Inference CLI with subcommands (reference inference.py:21-116).

    python -m gctplus_tpu.cli uc-sampling -model_type vaetf ...
    python -m gctplus_tpu.cli p-sampling ...
    python -m gctplus_tpu.cli sca-sampling ...
    python -m gctplus_tpu.cli psca-sampling ...
    python -m gctplus_tpu.cli mol-interpolation ...
    python -m gctplus_tpu.cli model-selection ...
    python -m gctplus_tpu.cli visualize-attention ...
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

from gctplus_tpu.config import model_opts
from gctplus_tpu.utils import set_seed


def _common(p: argparse.ArgumentParser):
    model_opts(p)
    p.add_argument("-model_type", type=str, required=True)
    p.add_argument("-model_folder", type=str, required=True)
    p.add_argument("-model_name", type=str, default="model_best.msgpack")
    p.add_argument("-util_folder", type=str, default="./Data/utils")
    p.add_argument("-data_folder", type=str, default="./Data")
    p.add_argument("-save_folder", type=str, default="./Results")
    p.add_argument("-property_list", nargs="+", default=[])
    p.add_argument("-max_strlen", type=int, default=80)
    p.add_argument("-decode_algo", type=str, default="multinomial",
                   choices=["greedy", "multinomial"])
    p.add_argument("-top_k", type=int, default=None)
    p.add_argument("-n_jobs", type=int, default=4)
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-batch_size", type=int, default=512)


def _load_set(args, name):
    path = os.path.join(args.data_folder, "raw", f"{name}.csv")
    if os.path.exists(path):
        return pd.read_csv(path)
    return None


def _molgpt_scaffolds(args):
    """molgpt scaffold list: scaffold_folder/molgpt.csv when present
    (the reference's Data/scaffold-condition/molgpt.csv layout,
    psca_sampling.py:139), else the in-repo fixture."""
    from gctplus_tpu.config import MOLGPT_SCAFFOLDS
    folder = getattr(args, "scaffold_folder", None)
    if folder:
        path = os.path.join(folder, "molgpt.csv")
        if os.path.exists(path):
            df = pd.read_csv(path)
            col = "scaffold" if "scaffold" in df.columns else df.columns[-1]
            return df[col].dropna().tolist()
    return list(MOLGPT_SCAFFOLDS)


def main(argv=None):
    parser = argparse.ArgumentParser("gctplus")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("uc-sampling")
    _common(p)
    p.add_argument("-n_samples", type=int, default=30000)

    p = sub.add_parser("p-sampling")
    _common(p)
    p.add_argument("-n_samples", type=int, default=10000)

    p = sub.add_parser("sca-sampling")
    _common(p)
    p.add_argument("-n_samples", type=int, default=10000)
    p.add_argument("-n_scaffolds", type=int, default=100)
    p.add_argument("-scaffold_source", type=str, default="train",
                   choices=["train", "test_scaffolds"])

    p = sub.add_parser("psca-sampling")
    _common(p)
    p.add_argument("-n_samples", type=int, default=1000)
    p.add_argument("-n_scaffolds", type=int, default=100)
    # 'molgpt' (reference psca_sampling.py:139, config_default.py:15-20)
    # switches to the molgpt scaffold list + 2x2x2 property grid and
    # the sim>=0.8 validity aggregation
    p.add_argument("-scaffold_source", type=str, default="train",
                   choices=["train", "test_scaffolds", "molgpt"])
    p.add_argument("-scaffold_folder", type=str, default=None,
                   help="folder holding molgpt.csv (scaffold column); "
                        "defaults to the in-repo fixture list")

    p = sub.add_parser("mol-interpolation")
    _common(p)
    p.add_argument("-n_pairs", type=int, default=100)
    p.add_argument("-n_interpolations", type=int, default=8)
    p.add_argument("-similarity_threshold", type=float, default=0.5)
    p.add_argument("-same_scaffold", action="store_true")

    p = sub.add_parser("model-selection")
    _common(p)
    p.add_argument("-n_samples", type=int, default=10000)
    p.add_argument("-epoch_list", nargs="+", type=int, default=None)

    p = sub.add_parser("visualize-attention")
    _common(p)
    p.add_argument("-smiles", type=str, required=True)
    p.add_argument("-scaffold", type=str, default=None)

    p = sub.add_parser("latent-analysis")
    _common(p)
    p.add_argument("-n_samples", type=int, default=256)

    args = parser.parse_args(argv)
    set_seed(args.seed)  # inference.py:114 uses set_seed(0)

    train_df = _load_set(args, "train")
    test_df = _load_set(args, "test")
    train = train_df["smiles"].tolist() if train_df is not None else None
    test = test_df["smiles"].tolist() if test_df is not None else None

    if args.cmd == "uc-sampling":
        from gctplus_tpu.tasks.uc_sampling import uc_sampling
        tsf_df = _load_set(args, "test_scaffolds")
        tsf = tsf_df["smiles"].tolist() if tsf_df is not None else None
        uc_sampling(args, train=train, test=test, test_scaffolds=tsf)
    elif args.cmd == "p-sampling":
        from gctplus_tpu.tasks.p_sampling import p_sampling
        p_sampling(args, train=train, train_props=train_df)
    elif args.cmd == "sca-sampling":
        from gctplus_tpu.tasks.sca_sampling import sca_sampling
        src_df = _load_set(args, args.scaffold_source)
        if src_df is None:  # `or` would choke on DataFrame truthiness
            src_df = train_df
        sca_sampling(args, src_df["scaffold"].tolist(), train=train)
    elif args.cmd == "psca-sampling":
        from gctplus_tpu.tasks.psca_sampling import psca_sampling
        if args.scaffold_source == "molgpt":
            # NOTE: pass -property_list axes present in the molgpt
            # grid (logP/tPSA/SAS) that the checkpoint was trained on
            scaffolds = _molgpt_scaffolds(args)
        else:
            src_df = _load_set(args, args.scaffold_source)
            if src_df is None:
                src_df = train_df
            scaffolds = src_df["scaffold"].tolist()
        psca_sampling(args, scaffolds)
    elif args.cmd == "mol-interpolation":
        from gctplus_tpu.tasks.mol_interpolation import mol_interpolation
        mol_interpolation(args, test or train)
    elif args.cmd == "model-selection":
        from gctplus_tpu.tasks.model_selection import model_selection
        model_selection(args, (test or train))
    elif args.cmd == "visualize-attention":
        from gctplus_tpu.tasks.visualize_attention import visualize_attention
        visualize_attention(args, args.smiles, args.scaffold)
    elif args.cmd == "latent-analysis":
        from gctplus_tpu.tasks.latent_analysis import latent_analysis
        latent_analysis(args, test or train)


if __name__ == "__main__":
    main()
