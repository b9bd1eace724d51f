"""Pre-compile the scaffold-protocol decode programs on the real TPU.

With fixed_decode_shapes (samplers.py), the 100-scaffold sca/psca
protocols need one program per 16-wide prefix bucket — {32, 48, 64}
covers both the seen and unseen scaffold sources (measured on the
620k corpus).  Warming them here (~1-2 min of remote compile each)
makes the protocol evals themselves compile-free.

Usage: python scripts/warm_sca_eval.py [workdir] [epoch] [variant]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_work/bigrun"
    epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    variant = sys.argv[3] if len(sys.argv) > 3 else "scavaetf"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.eval_bigrun import _args
    from gctplus_tpu.tasks.common import build_sampler

    import numpy as np

    a = _args(workdir, variant, epoch, use_scaffold=True,
              fixed_decode_shapes=True,
              save_folder=os.path.join(workdir, "warm"))
    sampler = build_sampler(a)
    # one dummy scaffold per bucket: P = len(tokens)+2 rounds up to
    # {32, 48, 64}
    for n_c in (28, 44, 60):
        sca = "C" * n_c  # n_c single-char tokens
        t0 = time.time()
        out, _ = sampler.sample_smiles(512, sca)
        print(f"P_bucket {n_c + 4}: {len(out)} samples in "
              f"{time.time() - t0:.0f}s", flush=True)
    print("WARM_DONE", flush=True)


if __name__ == "__main__":
    main()
