"""MOSES-scale preprocess driver (round 2): 600k-molecule synthetic
corpus with the extended generator, full descriptor/scaffold pass,
vocabs, scaler, toklen histogram, subsampled SA/NP score tables.

The reference trains on the 1.58M-molecule MOSES set
(/root/reference/README.md:8, preprocess.py:81-83); this environment
has no network egress, so the synthetic generator stands in at the
500k-1.5M scale the round-1 verdict asked for.

Usage: python scripts/prep_bigcorpus.py [workdir] [n] [seed]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/root/bigrun"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 600000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 21
    os.makedirs(workdir, exist_ok=True)
    t0 = time.time()

    from gctplus_tpu.data.preprocess import preprocess
    from gctplus_tpu.utils.logging import get_logger
    log = get_logger("prep_bigcorpus",
                     os.path.join(workdir, "prep.log"))
    log.info(f"preprocess start n={n} seed={seed}")
    preprocess(workdir, n_jobs=1, n_synthetic=n, seed=seed,
               score_table_max=50000, log=log)
    log.info(f"preprocess done in {(time.time() - t0) / 60:.1f} min")
    print(f"DONE {(time.time() - t0) / 60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
