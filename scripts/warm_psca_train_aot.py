"""AOT-compile the exact pscavaetf (or any variant) big-run train-step
program WITHOUT executing or allocating anything on the chip.

Two jobs:
  1. Prove the program fits HBM before the overnight launch — XLA
     reports OOM at compile time for oversized programs (that is how
     the bs=512 scaffold configs were caught, train_bigrun.py:53-66).
  2. Populate the persistent compile cache so the real launch starts
     stepping immediately instead of spending ~6 min in the remote
     compile service.

Inputs are jax.ShapeDtypeStruct avals (with the same shardings the
real run uses), so this is safe to run while another trainer owns the
chip's HBM.

Usage: python scripts/warm_psca_train_aot.py [variant] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "pscavaetf"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_work/bigrun"
    t0 = time.time()

    import jax
    if os.environ.get("WARM_AOT_CPU"):  # logic test off-chip
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # mirror tasks/train_task.py: rbg PRNG on TPU-like backends
    if jax.default_backend() in ("tpu", "axon"):
        jax.config.update("jax_default_prng_impl", "rbg")

    from gctplus_tpu.models.registry import build_model, init_params
    from gctplus_tpu.parallel import make_mesh
    from gctplus_tpu.parallel.mesh import param_sharding_rules
    from gctplus_tpu.tasks.common import load_vocabs
    from gctplus_tpu.train.schedule import make_optimizer
    from gctplus_tpu.train.trainer import (HISTORY_KEYS, TrainState,
                                           make_history_train_step)

    # exact train_bigrun.py recipe for the variant
    props = 0 if variant in ("vaetf", "scavaetf") else 3
    use_sca = variant in ("scavaetf", "pscavaetf")
    sca_len = 122 if variant == "pscavaetf" else 128
    bsz = 384 if use_sca else 512
    fixed = sca_len if use_sca else 80

    src_vocab, trg_vocab = load_vocabs(
        os.path.join(workdir, "utils"), variant)
    model, cfg = build_model(
        variant, len(src_vocab), len(trg_vocab), N=6, d_model=512,
        d_ff=2048, heads=8, latent_dim=128, dropout=0.1,
        dtype=jnp.bfloat16, use_cond2dec=False)
    tx, sched = make_optimizer(512, 4000, 0.9, 0.98, 1e-9)
    step = make_history_train_step(model, trg_vocab.pad_id, False, sched,
                                   free_bits=0.05)

    mesh = make_mesh(n_data=1, n_model=1)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))

    def shd(path_tuple):
        path = "/" + "/".join(
            k.key if hasattr(k, "key") else str(k) for k in path_tuple)
        spec = param_sharding_rules(path)
        return NamedSharding(mesh, spec)

    # avals only: nothing below touches the device
    state_shape = jax.eval_shape(
        lambda: TrainState.create(
            init_params(model, cfg, jax.random.PRNGKey(0)), tx))

    def aval(path, s):
        # params + Adam moments follow the param sharding rules
        # (TrainState.create inherits shardings from the sharded params
        # in the real run); scalars/steps are replicated
        if s.ndim == 0 or not any(
                getattr(k, "key", None) in ("params", "mu", "nu")
                for k in path):
            return jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl)
        # strip the leading branch label (params/mu/nu share the tree)
        sub = tuple(k for k in path
                    if getattr(k, "key", None) not in ("mu", "nu"))
        try:
            return jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=shd(sub))
        except Exception:
            return jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl)

    state_avals = jax.tree_util.tree_map_with_path(aval, state_shape)

    # rows/batches of the 620k corpus at this batch size (hist length
    # shapes the program): mirror BatchLoader drop_last
    import pandas as pd
    suffix = "_sca" if use_sca else ""
    n_rows = len(pd.read_csv(
        os.path.join(workdir, "prepared", f"train{suffix}.csv"),
        usecols=[0]))
    n_batches = n_rows // bsz
    hist_avals = {k: jax.ShapeDtypeStruct((n_batches,), jnp.float32,
                                          sharding=repl)
                  for k in HISTORY_KEYS}

    batch_avals = {
        "src": jax.ShapeDtypeStruct((bsz, fixed), jnp.int32, sharding=bsh),
        "trg": jax.ShapeDtypeStruct((bsz, fixed + 2), jnp.int32,
                                    sharding=bsh),
    }
    if props:
        batch_avals["econds"] = jax.ShapeDtypeStruct(
            (bsz, props), jnp.float32, sharding=bsh)
        batch_avals["dconds"] = jax.ShapeDtypeStruct(
            (bsz, props), jnp.float32, sharding=bsh)

    key_shape = jax.eval_shape(lambda: jax.random.split(
        jax.random.PRNGKey(0), 2)[0])
    key_aval = jax.ShapeDtypeStruct(key_shape.shape, key_shape.dtype,
                                    sharding=repl)

    print(f"[{time.time()-t0:.0f}s] lowering {variant}: bs={bsz} "
          f"src=(.,{fixed}) hist=({n_batches},) "
          f"vocab={len(src_vocab)}/{len(trg_vocab)}", flush=True)
    # i and beta go through as the concrete types run_epoch uses
    # (np.int32 strong scalar; Python float -> WEAK f32) so lower()
    # abstracts them identically to the real run
    lowered = step.lower(state_avals, hist_avals, np.int32(0),
                         batch_avals, 0.04, key_aval)
    print(f"[{time.time()-t0:.0f}s] compiling (remote service; OOM "
          f"surfaces here)...", flush=True)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    if mem is not None:
        tot = (mem.argument_size_in_bytes + mem.output_size_in_bytes
               + mem.temp_size_in_bytes) / 1e9
        print(f"[{time.time()-t0:.0f}s] COMPILED: args "
              f"{mem.argument_size_in_bytes/1e9:.2f} + temps "
              f"{mem.temp_size_in_bytes/1e9:.2f} + out "
              f"{mem.output_size_in_bytes/1e9:.2f} = {tot:.2f} GB",
              flush=True)
    print(f"WARM_AOT_OK {variant} {(time.time()-t0)/60:.1f} min",
          flush=True)


if __name__ == "__main__":
    main()
