"""Multi-host worker for test_multihost.py — NOT a test file.

Runs the real train_task end-to-end as one process of a 2-process
jax.distributed CPU cluster (2 virtual devices per process -> a
4-device global 'data' mesh). The analog of one DDP rank in the
reference's mp.spawn launch (train1.py:32-38,158-167).

Usage: python tests/mh_worker.py WORKDIR PROCESS_ID NUM_PROCESSES PORT \
           START_EPOCH NUM_EPOCH
"""

import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

workdir = sys.argv[1]
pid = int(sys.argv[2])
nproc = int(sys.argv[3])
port = sys.argv[4]
start_epoch = int(sys.argv[5])
num_epoch = int(sys.argv[6])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
os.environ["GCTPLUS_NO_COMPILE_CACHE"] = "1"  # keep package bootstrap off
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO compile cache: CPU AOT artifacts are machine-feature-sensitive
# and jax refuses mismatched features at load (tried: a shared
# worker cache tripped exactly that between launches)
jax.config.update("jax_compilation_cache_dir", None)

# each process builds its own (deterministic, seed-keyed) tiny corpus
# in a private dir to avoid filesystem races; checkpoints/CSVs go to
# the SHARED workdir (process-0 gated in train_model)
data_dir = os.path.join(workdir, f"data_p{pid}")
if not os.path.exists(os.path.join(data_dir, "prepared", "train.csv")):
    from gctplus_tpu.data.preprocess import preprocess
    preprocess(data_dir, n_jobs=1, n_synthetic=96, seed=3)

args = types.SimpleNamespace(
    seed=0, start_epoch=start_epoch, num_epoch=num_epoch, batch_size=8,
    property_list=[], model_type="vaetf",
    model_folder=os.path.join(workdir, "run"),
    use_scaffold=False, randomize_prob=0.0,
    prepared_folder=os.path.join(data_dir, "prepared"),
    util_folder=os.path.join(data_dir, "utils"), debug=False,
    use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
    KLA_max_beta=1.0, KLA_beg_epoch=1, lr_scheduler="WarmUpDefault",
    lr_WarmUpSteps=100, lr=1e-4, lr_beta1=0.9, lr_beta2=0.98,
    lr_eps=1e-9, n_data_shards=4, n_model_shards=1,
    compute_dtype="float32",
    N=2, H=4, d_ff=64, d_model=32, latent_dim=16, dropout=0.1,
    variational=True, use_cond2dec=False, use_cond2lat=False,
    get_attn=False, skip_valid=True, fixed_seqlen=80,
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc, process_id=pid)

from gctplus_tpu.tasks.train_task import train_task  # noqa: E402

train_task(args)
print(f"WORKER_{pid}_OK processes={jax.process_count()} "
      f"devices={jax.device_count()}", flush=True)
