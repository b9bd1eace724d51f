"""Generate a large synthetic corpus to a raw CSV (one smiles column).

Decoupled from preprocess() so descriptor/property computation can be
upgraded independently of the (slow, CPU-bound) generation step.

Usage: python scripts/gen_corpus.py OUT.csv N [seed]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1]
    n = int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 21

    import pandas as pd
    from gctplus_tpu.data.synthetic import generate_dataset

    t0 = time.time()
    smis = generate_dataset(n, seed=seed, n_jobs=1)
    pd.DataFrame({"smiles": smis}).to_csv(out_path, index=False)
    print(f"wrote {len(smis)} smiles to {out_path} "
          f"in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
