"""Preprocess from an existing raw-SMILES CSV (the CSV drop-in path,
exercised at MOSES scale): splits train/test/test_scaffolds like the
synthetic path (10:1:~1) and runs the full descriptor/vocab/scaler
pipeline.

Usage: python scripts/prep_from_csv.py RAW.csv WORKDIR [n_train]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    raw_csv = sys.argv[1]
    workdir = sys.argv[2]
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else None
    os.makedirs(workdir, exist_ok=True)
    t0 = time.time()

    import pandas as pd
    smis = pd.read_csv(raw_csv)["smiles"].dropna().tolist()
    if n_train is None:
        n_train = int(len(smis) / 1.2)
    train = smis[:n_train]
    test = smis[n_train: n_train + n_train // 10]
    test_sca = smis[n_train + n_train // 10:]
    print(f"{len(train)} train / {len(test)} test / "
          f"{len(test_sca)} test_scaffolds", flush=True)

    from gctplus_tpu.data.preprocess import preprocess
    from gctplus_tpu.utils.logging import get_logger
    log = get_logger("prep_from_csv", os.path.join(workdir, "prep.log"))
    preprocess(workdir, train_smiles=train, test_smiles=test,
               test_scaffolds_smiles=test_sca, n_jobs=1,
               score_table_max=50000, log=log)
    print(f"DONE {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
