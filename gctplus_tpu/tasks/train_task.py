"""Training task driver (reference train1.py:32-149).

Glues config -> data -> mesh -> epoch loop. One process drives all
local devices; the batch is sharded over the 'data' mesh axis and XLA
inserts the gradient all-reduce (the DDP analog).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gctplus_tpu.data.dataset import BatchLoader, SmilesDataset
from gctplus_tpu.models.registry import build_model, init_params
from gctplus_tpu.parallel import make_mesh, shard_params
from gctplus_tpu.tasks.common import load_vocabs
from gctplus_tpu.train.loop import train_model
from gctplus_tpu.utils import get_logger, set_seed


def _read_prepared(args):
    suffix = "_sca" if args.use_scaffold else ""
    train = pd.read_csv(os.path.join(args.prepared_folder,
                                     f"train{suffix}.csv"))
    valid = pd.read_csv(os.path.join(args.prepared_folder,
                                     f"test{suffix}.csv"))
    if args.debug:  # train1.py:75-78
        train, valid = train[:128], valid[:128]
    return train, valid


def _make_loader(df, args, src_vocab, trg_vocab, shuffle, n_data=1,
                 rank=0, world_size=1):
    props = None
    if args.property_list:
        props = df[[f"src_{p}" for p in args.property_list]].to_numpy()
    scaffolds = df["src_scaffold"].tolist() if args.use_scaffold else None
    ds = SmilesDataset(df["src"].tolist(), src_vocab, trg_vocab,
                       properties=props, scaffolds=scaffolds,
                       randomize_prob=args.randomize_prob, seed=args.seed)
    # fixed_seqlen (default max_strlen=80): one static shape -> one XLA
    # compile for the whole training run; set -fixed_seqlen 0 to use
    # bucketed dynamic lengths instead
    fixed = getattr(args, "fixed_seqlen", 80) or None
    if fixed and args.use_scaffold:
        # scaffold + <sep> + smiles; an explicit scaffold_fixed_len
        # overrides the conservative 2L+1 bound (e.g. the MOSES-scale
        # corpus measures p100=137 / p99.99=128 combined tokens, so 128
        # buys ~25% step time over 161 while truncating ~1e-4 of rows)
        fixed = getattr(args, "scaffold_fixed_len", None) \
            or min(2 * fixed + 1, 178)
    n_local = n_data // world_size if world_size > 1 else n_data
    return BatchLoader(ds, args.batch_size, use_scaffold=args.use_scaffold,
                       shuffle=shuffle, seed=args.seed, drop_last=shuffle,
                       pad_to_multiple=max(n_local, 1), fixed_len=fixed,
                       rank=rank, world_size=world_size)


def train_task(args) -> None:
    # multi-host bring-up FIRST (before any other jax call initializes
    # the backend) — the dist.init_process_group analog
    # (train1.py:34-38); no-op when no coordinator is given
    from gctplus_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(getattr(args, "coordinator_address", None),
                         getattr(args, "num_processes", None),
                         getattr(args, "process_id", None))

    # dropout/latent RNG: the default threefry costs ~26% of the
    # flagship train step on TPU (scripts/probe_rng_cost.py: 331 ->
    # 243 ms/step with 'rbg'). rbg changes the random STREAM only —
    # auto-on for TPU-like backends; -prng_impl threefry2x32 restores
    # the default generator.
    impl = getattr(args, "prng_impl", None)
    if impl is None and jax.default_backend() in ("tpu", "axon"):
        impl = "rbg"
    if impl and impl != "default":
        jax.config.update("jax_default_prng_impl", impl)

    set_seed(args.seed)
    log = get_logger("train", os.path.join(args.model_folder, "record.log")
                     if args.model_folder else None)

    n_model = args.n_model_shards
    n_data = args.n_data_shards or (len(jax.devices()) // n_model)

    # per-host dataset shard — the DistributedSampler(rank, world_size)
    # analog (Utils/dataset.py:304-307); batch_size stays per-process
    # like the reference's per-rank batch, so the global batch is
    # batch_size * process_count
    rank, world = jax.process_index(), jax.process_count()
    if world > 1 and log:
        log.info(f"multi-host: process {rank}/{world}, "
                 f"{jax.local_device_count()} local / "
                 f"{jax.device_count()} global devices")

    src_vocab, trg_vocab = load_vocabs(args.util_folder, args.model_type)
    train_df, valid_df = _read_prepared(args)
    train_loader = _make_loader(train_df, args, src_vocab, trg_vocab, True,
                                n_data, rank=rank, world_size=world)
    valid_loader = None
    if not getattr(args, "skip_valid", False):
        valid_loader = _make_loader(valid_df, args, src_vocab, trg_vocab,
                                    False, n_data, rank=rank,
                                    world_size=world)

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    model, cfg = build_model(
        args.model_type, len(src_vocab), len(trg_vocab), N=args.N,
        d_model=args.d_model, d_ff=args.d_ff, heads=args.H,
        latent_dim=args.latent_dim, dropout=args.dropout, dtype=dtype,
        use_cond2dec=args.use_cond2dec,
        use_fused_ffn=bool(getattr(args, "use_fused_ffn", False)),
        attn_blhd=bool(getattr(args, "attn_blhd", False)))
    params = init_params(model, cfg, jax.random.PRNGKey(args.seed))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n_params > 0  # train1.py:107
    log.info(f"#parameters: {n_params}")

    # fine-tuning: transfer pretrained weights (shape-matched leaves)
    # and optionally freeze modules (molGCT->GCT-Plus recipe;
    # Model/build_model.py:17-39)
    if getattr(args, "use_model_path", None):
        from gctplus_tpu.models.registry import transfer_params
        from gctplus_tpu.tasks.common import load_params_any
        trained = load_params_any(model, cfg, args.use_model_path,
                                  args.model_type)
        params = transfer_params(trained, params, log)
        log.info(f"transferred params from {args.use_model_path}")
    trainable_mask = None
    t_names = getattr(args, "train_params", None)
    f_names = getattr(args, "freeze_params", None)
    if t_names or f_names:
        from gctplus_tpu.models.registry import freeze_mask
        trainable_mask = freeze_mask(params, train_names=t_names,
                                     freeze_names=f_names)
        frozen = [k for k, v in trainable_mask.items()
                  if not any(jax.tree_util.tree_leaves(v))]
        log.info(f"frozen modules: {frozen}")

    # mesh + shardings (the DDP analog; SURVEY.md §2.5)
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    params = shard_params(params, mesh)
    bsh = NamedSharding(mesh, P("data"))

    if world > 1:
        # each process holds only its dataset shard: assemble the
        # global batch from per-process local rows (the collective-
        # free analog of DDP's per-rank batches)
        def device_put_fn(batch):
            return {k: jax.make_array_from_process_local_data(bsh, v)
                    for k, v in batch.items()}
    else:
        def device_put_fn(batch):
            return {k: jax.device_put(v, bsh) for k, v in batch.items()}

    hyper = {"N": args.N, "d_model": args.d_model, "d_ff": args.d_ff,
             "H": args.H, "latent_dim": args.latent_dim,
             "dropout": args.dropout, "use_cond2dec": args.use_cond2dec,
             "use_cond2lat": args.use_cond2lat, "variational": True,
             "nconds": len(args.property_list)}

    profile_dir = getattr(args, "profile_dir", None)
    from gctplus_tpu.utils.profiling import trace
    with trace(profile_dir):
        _run_training(args, model, cfg, params, train_loader, valid_loader,
                      src_vocab, hyper, log, device_put_fn, trainable_mask)
    log.info("training complete")


def _run_training(args, model, cfg, params, train_loader, valid_loader,
                  src_vocab, hyper, log, device_put_fn,
                  trainable_mask=None):
    train_model(
        model, cfg, params, train_loader, valid_loader,
        model_folder=args.model_folder, num_epoch=args.num_epoch,
        start_epoch=args.start_epoch, pad_id=src_vocab.pad_id,
        use_cond2dec=args.use_cond2dec, use_KLA=args.use_KLA,
        KLA_ini_beta=args.KLA_ini_beta, KLA_inc_beta=args.KLA_inc_beta,
        KLA_beg_epoch=args.KLA_beg_epoch, KLA_max_beta=args.KLA_max_beta,
        lr_WarmUpSteps=args.lr_WarmUpSteps, lr_beta1=args.lr_beta1,
        lr_beta2=args.lr_beta2, lr_eps=args.lr_eps, seed=args.seed,
        log=log, device_put_fn=device_put_fn, hyper=hyper,
        trainable_mask=trainable_mask,
        ckpt_backend=getattr(args, "ckpt_backend", "msgpack"),
        ckpt_full_every=getattr(args, "ckpt_full_every", 1),
        free_bits=(0.0 if getattr(args, "exact_reference_objective", False)
                   else getattr(args, "KLA_free_bits", 0.0)))


def main(argv=None):
    import argparse
    from gctplus_tpu.config import train_opts

    parser = argparse.ArgumentParser("gctplus-train")
    train_opts(parser)
    args = parser.parse_args(argv)
    train_task(args)


if __name__ == "__main__":
    main()
