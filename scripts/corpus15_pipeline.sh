#!/bin/bash
# CPU-only pipeline that rebuilds the 1.5M extended corpus after a VM
# wipe (CLAUDE.md recovery recipe): seed _work/newgen.csv with every
# existing split (so generated molecules are disjoint), generate up to
# 1.7M total with the deterministic template generator, then run the
# vocab-frozen extend-prep. Writes prep output to /tmp/prep15.out —
# chain_round5d.sh waits for its final '^DONE' line. Gen output goes
# to /tmp/gen15.out (it also prints DONE..., which must not trip the
# chain's grep early).
set -eu
cd /root/repo
W=_work/bigrun
echo $$ > /tmp/corpus15.pid

if [ ! -f _work/newgen.csv ]; then
  python - <<'EOF'
import pandas as pd
rows = ["smiles"]
seen = set()
for name in ("train", "test", "test_scaffolds"):
    for s in pd.read_csv(f"_work/bigrun/raw/{name}.csv")["smiles"]:
        if s not in seen:
            seen.add(s)
            rows.append(s)
with open("_work/newgen.csv", "w") as f:
    f.write("\n".join(rows) + "\n")
print(f"seeded newgen.csv with {len(seen)} existing molecules", flush=True)
EOF
fi

python scripts/gen_corpus_ckpt.py /root/repo/_work/newgen.csv 1700000 55 \
  > /tmp/gen15.out 2>&1
tail -1 /tmp/gen15.out

python scripts/prep_extend_corpus.py /root/repo/_work/bigrun \
  /root/repo/_work/newgen.csv /root/repo/_work/bigrun15 \
  > /tmp/prep15.out 2>&1
tail -2 /tmp/prep15.out
