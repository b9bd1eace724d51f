"""MOSES-scale training run (round 2): flagship-size models on the
600k-molecule corpus from scripts/prep_bigcorpus.py.

Variants:
  vaetf     — unconditioned flagship (uc_sampling headline metrics)
  pvaetf    — logP/tPSA/QED-conditioned (27-combo p_sampling protocol)
  scavaetf  — scaffold-conditioned (sca_sampling SSF protocol);
              reference recipe Bashscript/train/train_scavaetf.sh
  pscavaetf — property+scaffold joint (psca_sampling protocol);
              reference recipe Bashscript/train/train_pscavaetf.sh

Scaffold variants use the measured corpus bound scaffold_fixed_len=128
(p99.99 of scaffold+<sep>+smiles tokens; 45/516k rows truncated) — a
~25% step-time saving vs the conservative 2*80+1 default shape.

Reference recipe: N=6, d_model=512, d_ff=2048, latent 128
(Configuration/config.py:2-7), Adam(0.9,0.98,1e-9) + Noam warmup
(trainer1.py:117-127), KL annealing 0.02/epoch (config.py:42-51).
TPU recipe deltas: batch 512 (amortizes tunnel dispatch; the device
step is the bottleneck at ~320 ms/batch), warmup 4000 steps (peak LR
~7e-4 at the 4x-reference tokens/step), bf16 compute, free-bits 0.05
default-on (EVIDENCE.md ablation), fixed 80-token shapes -> one XLA
program per run.

Resumable per-epoch like the demo drivers (kill + rerun safe).

Usage: python scripts/train_bigrun.py [variant] [workdir] [epochs]
"""

from __future__ import annotations

import os
import re
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "vaetf"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_work/bigrun"
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    t0 = time.time()
    assert variant in ("vaetf", "pvaetf", "scavaetf", "pscavaetf"), variant
    assert os.path.exists(os.path.join(workdir, "prepared", "train.csv")), \
        "run scripts/prep_bigcorpus.py first"

    props = ([] if variant in ("vaetf", "scavaetf")
             else ["logP", "tPSA", "QED"])
    use_sca = variant in ("scavaetf", "pscavaetf")
    # pscavaetf shape note: with nconds=3 and use_cond2lat, the decoder
    # cross-attention memory is scaffold_fixed_len + 3 (cond2enc) + 3
    # (cond2lat) tokens.  At 128 that lands on 134 -> XLA pads every
    # attention-logit lane dim 134->256 (2.0x HBM), and the bs=512 train
    # step wants 22.6G of 15.75G HBM (AOT OOM, _work/bigrun/
    # train_pscavaetf.out).  122 puts the memory at exactly 128 lanes;
    # bs=384 leaves co-residency headroom for concurrent protocol evals
    # on the same chip (the step is HBM-bound, so wall-clock/epoch is
    # roughly unchanged).
    # scavaetf at bs=512/L=128 also AOT-OOMs (16.12G of 15.75G,
    # _work/bigrun/train_scavaetf.out 2026-08-17): the f32 attention
    # logits [bs,8,129,128] and d_ff activations scale linearly with
    # bs, so 384 brings the program to ~12G.  HBM-bound step ->
    # tokens/s per wall-clock roughly unchanged.
    sca_len = 122 if variant == "pscavaetf" else 128
    bsz = 384 if use_sca else 512
    # GCT_RUN_SUFFIX names an experiment arm (e.g. "_nofb" for the
    # free-bits-off continuation) so the flagship run dir stays frozen
    suffix = os.environ.get("GCT_RUN_SUFFIX", "")
    args = types.SimpleNamespace(
        seed=0, start_epoch=1, num_epoch=epochs, batch_size=bsz,
        property_list=props, model_type=variant,
        model_folder=os.path.join(workdir, f"run_{variant}512{suffix}"),
        use_scaffold=use_sca, scaffold_fixed_len=sca_len,
        randomize_prob=0.0,
        prepared_folder=os.path.join(workdir, "prepared"),
        util_folder=os.path.join(workdir, "utils"), debug=False,
        use_KLA=True, KLA_ini_beta=0.02, KLA_inc_beta=0.02,
        KLA_max_beta=1.0, KLA_beg_epoch=1,
        # free bits (default 0.05) is the one recipe delta from the
        # reference; GCT_FREE_BITS=0 runs the exact-reference ELBO
        # (round-4 psca-validity root-cause arm)
        KLA_free_bits=float(os.environ.get("GCT_FREE_BITS", "0.05")),
        lr_scheduler="WarmUpDefault", lr_WarmUpSteps=4000, lr=1e-4,
        lr_beta1=0.9, lr_beta2=0.98, lr_eps=1e-9,
        n_data_shards=1, n_model_shards=1, compute_dtype="bfloat16",
        N=6, H=8, d_ff=2048, d_model=512, latent_dim=128, dropout=0.1,
        variational=True, use_cond2dec=False,
        use_cond2lat=(variant in ("pvaetf", "pscavaetf")),
        get_attn=False, skip_valid=True, fixed_seqlen=80,
        # compact per-epoch checkpoints (full blob every 4th + final):
        # the full 533 MB gather+serialize through the tunnel costs
        # ~100 s/epoch — a quarter of the epoch wall
        ckpt_full_every=4,
        # fused-FFN train kernel (ops/fused_ffn.py), env-gated so
        # in-flight runs relaunched by the watchdog keep their program.
        # Default ON since the round-4 on-chip A/B: 234.5 vs 242.7
        # ms/step at the flagship shape (rbg PRNG, bs=512, donation) —
        # a 3.4% win with verified numeric parity (scripts/
        # probe_ffn_ab.py, EVIDENCE.md)
        use_fused_ffn=os.environ.get("GCT_FUSED_FFN", "1") == "1",
        # transpose-free attention layout (models/layers.py::
        # scaled_dot_attention_blhd). On-chip A/B (scripts/
        # probe_blhd_ab.py, EVIDENCE.md round 5): NO step-time delta
        # (234.2 vs 234.8 ms, losses bit-identical) — XLA already
        # fuses the head transposes, so this stays opt-in/off
        attn_blhd=os.environ.get("GCT_ATTN_BLHD", "0") == "1")

    done = 0
    if os.path.isdir(args.model_folder):
        for f in os.listdir(args.model_folder):
            m = re.match(r"model_(\d+)\.msgpack$", f)
            if m:
                done = max(done, int(m.group(1)))
    args.start_epoch = done + 1
    if args.start_epoch > epochs:
        print(f"already trained to epoch {done}", flush=True)
        return
    from gctplus_tpu.tasks.train_task import train_task
    print(f"[{time.time()-t0:.0f}s] {variant}: epochs "
          f"{args.start_epoch}..{epochs}", flush=True)
    train_task(args)
    print(f"BIGRUN_TRAIN_DONE {variant} {epochs} epochs "
          f"{(time.time()-t0)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
