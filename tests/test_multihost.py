"""Multi-HOST data-parallel training: 2 jax.distributed processes x 2
virtual CPU devices = a 4-device global mesh, exercising the full
train_task path (initialize_multihost rendezvous, per-process dataset
shards, make_array_from_process_local_data global batches, process-0
checkpoint/CSV gating, epoch resume).

The TPU-native analog of the reference's multi-GPU DDP launch
(train1.py:32-38,158-167; Bashscript/train/train_pscavaetf.sh:10).
"""

import csv
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(workdir, port, start_epoch, num_epoch):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, workdir, str(pid), "2", str(port),
         str(start_epoch), str(num_epoch)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        # 1800s: the two workers share one host core with whatever
        # train/eval host work is live; 900s starved under load once
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
    return procs, outs


@pytest.mark.slow
def test_two_process_train_and_resume(tmp_path):
    workdir = str(tmp_path)
    port = _free_port()

    procs, outs = _launch(workdir, port, 1, 2)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert "WORKER_0_OK processes=2 devices=4" in outs[0] + outs[1]
    assert "WORKER_1_OK processes=2 devices=4" in outs[0] + outs[1]

    run = os.path.join(workdir, "run")
    # process-0-only checkpoint + CSV (rank-0 parity, trainer1.py:225-229)
    assert os.path.exists(os.path.join(run, "model_2.msgpack"))
    for epoch in (1, 2):
        path = os.path.join(run, f"train_{epoch}.csv")
        with open(path) as f:
            rows = list(csv.reader(f))
        losses = [float(r[3]) for r in rows[1:]]  # LOSS column
        assert losses and np.isfinite(losses).all()
        # 96 rows -> 48 per process -> 6 batches of 8 (even shards)
        assert len(losses) == 6

    # resume epoch 3 from the epoch-2 checkpoint across both processes
    port = _free_port()
    procs, outs = _launch(workdir, port, 3, 3)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"resume worker failed:\n{out[-3000:]}"
    assert os.path.exists(os.path.join(run, "model_3.msgpack"))
    with open(os.path.join(run, "record.log")) as f:
        assert "resumed from" in f.read()
