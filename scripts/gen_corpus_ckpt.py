"""Checkpointed synthetic-corpus generator (plan-B / large-scale path).

Unlike data.synthetic.generate_dataset (all-or-nothing, in-memory),
this writes every `chunk` unique molecules to OUT.csv and resumes from
it, so a multi-hour 500k+ generation survives restarts. Diversity
boost: up to 3 substituents per ring and a heavier 3-ring weight push
the unique-molecule space well past MOSES scale, keeping the marginal
unique rate high at 600k+.

Usage: python scripts/gen_corpus_ckpt.py OUT.csv N [seed]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1]
    n = int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 77
    chunk = 20000

    from gctplus_tpu.chem.canonical import canonical_smiles
    from gctplus_tpu.data.synthetic import LINKERS, RINGS, SUBS

    rng = random.Random(seed)
    seen = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            next(f, None)
            for line in f:
                seen.add(line.strip())
        print(f"resumed with {len(seen)} molecules", flush=True)
    else:
        with open(out_path, "w") as f:
            f.write("smiles\n")

    def ring_with_subs():
        ring = rng.choice(RINGS)
        out = []
        n_subs = rng.randint(0, 3)
        atoms = [j for j, ch in enumerate(ring)
                 if ch in "cnosCNOS" and (j + 1 >= len(ring)
                                          or ring[j + 1] != "1")]
        positions = set(rng.sample(atoms, min(n_subs, len(atoms)))) \
            if atoms else set()
        for j, ch in enumerate(ring):
            out.append(ch)
            if j in positions:
                out.append("(" + rng.choice(SUBS) + ")")
        return "".join(out)

    def candidate():
        n_rings = rng.choices([1, 2, 3], weights=[2, 5, 4])[0]
        parts = [ring_with_subs()]
        for _ in range(n_rings - 1):
            parts.append(rng.choice(LINKERS))
            parts.append(ring_with_subs())
        return "".join(parts)

    t0 = time.time()
    buf = []
    n_tried = 0
    while len(seen) < n:
        smi = candidate()
        n_tried += 1
        if len(smi) > 72:
            continue
        can = canonical_smiles(smi)
        if can is None or len(can) > 72 or can in seen:
            continue
        seen.add(can)
        buf.append(can)
        if len(buf) >= chunk or len(seen) >= n:
            with open(out_path, "a") as f:
                f.write("\n".join(buf) + "\n")
            rate = len(seen) / max(1e-9, time.time() - t0)
            print(f"{len(seen)}/{n} uniques "
                  f"({len(seen)/max(1,n_tried):.2f} yield, "
                  f"{rate:.0f}/s avg)", flush=True)
            buf = []
    print(f"DONE {len(seen)} in {(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
